package graft.sources

import graft.GraftError
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** K1/K2 sinks (reference file_dialog.rs:59-278): CSV / JSON-array /
  * NDJSON / Parquet writers.
  *
  * `singleFile = true` reproduces the reference's one-file-per-save
  * viewer semantics via coalesce(1) — correct for viewer parity, wrong
  * for 100 TB output (leave false: one file per partition, written in
  * parallel; commit protocol handles atomicity).
  */
object Writers {

  /** K1: refuse saving to a different format than the original
    * (file_dialog.rs:59-148). */
  def save(df: DataFrame, path: String, originalFormat: Readers.Format,
      delimiter: Char = ','): Unit = {
    val target = Readers.Format.fromPath(path)
    if (target != originalFormat)
      throw GraftError.UnsupportedFileExtension(
        s"refusing to save ${originalFormat} data to a ${target} path: $path")
    saveAs(df, path, delimiter)
  }

  /** K2: format chosen by the target extension. */
  def saveAs(df: DataFrame, path: String, delimiter: Char = ',',
      singleFile: Boolean = false): Unit =
    Readers.Format.fromPath(path) match {
      case Readers.Format.Csv     => writeCsv(df, path, delimiter, singleFile = singleFile)
      case Readers.Format.Json    => writeJsonArray(df, path)
      case Readers.Format.NdJson  => writeNdJson(df, path, singleFile)
      case Readers.Format.Parquet => writeParquet(df, path)
    }

  def writeCsv(df: DataFrame, path: String, delimiter: Char = ',',
      header: Boolean = true, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite)
      .option("sep", delimiter.toString).option("header", header)
      .csv(path)
  }

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def writeNdJson(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).json(path)
  }

  /** JSON as a single array document (reference JsonFormat::Json,
    * file_dialog.rs:221-235). Spark natively writes JSON-lines; the array
    * form is assembled from the serialized rows inside one task — no
    * driver collect. Inherently single-file (array documents don't
    * shard). */
  def writeJsonArray(df: DataFrame, path: String): Unit = {
    import df.sparkSession.implicits._
    df.toJSON.coalesce(1)
      .mapPartitions { it =>
        val sb = new StringBuilder("[")
        var first = true
        it.foreach { row =>
          if (!first) sb.append(",\n") else sb.append("\n")
          sb.append(row); first = false
        }
        sb.append("\n]")
        Iterator(sb.toString)
      }
      .write.mode(SaveMode.Overwrite).text(path)
  }
}
