package graft.sources

import graft.GraftError
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** K1/K2 sinks (reference file_dialog.rs:59-278): CSV / JSON-array /
  * NDJSON / Parquet writers.
  *
  * `singleFile = true` reproduces the reference's one-file-per-save
  * viewer semantics: the dataset is coalesced to one partition, written
  * through Spark's normal commit protocol, and the committed part file
  * is then MOVED to the literal target path — `saveAs("out.csv",
  * singleFile = true)` yields the regular file `out.csv`, exactly what
  * the reference's Save dialog produces (file_dialog.rs:59-148), not a
  * directory `out.csv/part-0000….csv`. Correct for viewer parity, wrong
  * for 100 TB output (leave false: one file per partition, written in
  * parallel; commit protocol handles atomicity).
  */
object Writers {

  /** Run `write` against a temp directory next to `path`, then move its
    * single committed part file to the literal `path`. The heavy write
    * goes through the normal job-commit protocol (task retry safe); the
    * final step is delete-existing + rename — the rename itself is
    * atomic on HDFS, a metadata copy on object stores. Any pre-existing
    * file/directory at `path` is replaced (Overwrite parity with the
    * directory writers).
    *
    * Failure discipline: the tmp directory is cleaned up ONLY while the
    * new output is not yet the sole surviving copy. Once the old target
    * has been deleted, a failed rename must NOT delete tmp — that would
    * destroy both the user's original file and the freshly written data
    * in one "Save"; instead the error names the preserved part file. */
  private def commitAsSingleFile(df: DataFrame, path: String)(write: String => Unit): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(path + ".__graft-single-tmp__")
    val part =
      try {
        write(tmp.toString)
        fs.listStatus(tmp).map(_.getPath)
          .find(_.getName.startsWith("part-"))
          .getOrElse(throw new java.io.IOException(
            s"single-file commit: no part file under $tmp"))
      } catch { case e: Throwable =>
        // the write never completed — tmp holds nothing worth keeping
        try fs.delete(tmp, true) catch { case _: java.io.IOException => () }
        throw e
      }
    if (fs.exists(target) && !fs.delete(target, true)) {
      fs.delete(tmp, true)
      throw new java.io.IOException(s"single-file commit: cannot replace $target")
    }
    // point of no return: the old target is gone, tmp is the only copy
    if (!fs.rename(part, target))
      throw new java.io.IOException(
        s"single-file commit: rename failed — output preserved at $part")
    fs.delete(tmp, true)
    ()
  }

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
      case Readers.Format.Json    => writeJsonArray(df, path, singleFile)
      case Readers.Format.NdJson  => writeNdJson(df, path, singleFile)
      case Readers.Format.Parquet => writeParquet(df, path, singleFile)
      case Readers.Format.Orc     => writeOrc(df, path, singleFile)
    }

  def writeCsv(df: DataFrame, path: String, delimiter: Char = ',',
      header: Boolean = true, singleFile: Boolean = false): Unit = {
    def write(out: DataFrame, p: String): Unit =
      out.write.mode(SaveMode.Overwrite)
        .option("sep", delimiter.toString).option("header", header)
        .csv(p)
    if (singleFile) commitAsSingleFile(df, path)(write(df.coalesce(1), _))
    else write(df, path)
  }

  def writeParquet(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    if (singleFile)
      commitAsSingleFile(df, path)(p =>
        df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(p))
    else df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Bucketed parquet table: rows are hash-distributed into `numBuckets`
    * files per partition BY KEY at write time, and the catalog records
    * the distribution — equi-joins and aggregations on the bucket keys
    * then plan WITHOUT a shuffle exchange (proven in BucketingSpec).
    *
    * This is the 100 TB answer to a repeatedly-joined fact table: pay
    * the distribution once at ingest instead of one shuffle per query.
    * Both join sides must be bucketed the same way (same keys, same
    * `numBuckets`). `sortCols` additionally sorts within each bucket
    * file, letting the sort-merge join skip its per-task sort. */
  def writeBucketed(df: DataFrame, tableName: String,
      bucketCols: Seq[String], numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    // STAGE-AND-SWAP overwrite: the full bucketed output is written under
    // a random staging table name first, and the live table is replaced
    // only after that write has fully committed. A failed write can never
    // destroy the existing table (the old delete-then-write left nothing
    // behind on failure), and a reader racing the writer sees either the
    // old data or the new — never a half-deleted directory. The swap
    // itself (drop old + rename staging) is still not atomic across both
    // steps; two concurrent WRITERS of the same name must be serialized,
    // which is normal for an ingest job.
    // The name is parsed (not wrapped in backticks wholesale) so
    // qualified "db.tbl" resolves db.tbl rather than a literal `db.tbl`.
    val spark = df.sparkSession
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
    val staging = ident.copy(table = ident.table + "_graft_staging_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12))
    val hadoopConf = spark.sessionState.newHadoopConf()
    def locOf(id: org.apache.spark.sql.catalyst.TableIdentifier) =
      new org.apache.hadoop.fs.Path(spark.sessionState.catalog.defaultTablePath(id))
    // Past this flag the OLD table has been destroyed and staging is the
    // ONLY surviving copy — cleanup must then never touch it (the same
    // point-of-no-return discipline as compactParquet/commitAsSingleFile:
    // a failed swap must preserve the data and name where it survived).
    var oldRetired = false
    try {
      val w = df.write.mode(SaveMode.ErrorIfExists).format("parquet")
        .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
        .saveAsTable(staging.quotedString)
      // staging is fully committed — now retire the old table. A table
      // written by a PREVIOUS session (in-memory catalog) has a live
      // warehouse directory but no catalog entry, so the orphaned
      // location must be cleared too or the rename below fails with
      // LOCATION_ALREADY_EXISTS.
      oldRetired = true
      spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
      val target = locOf(ident)
      val fs = target.getFileSystem(hadoopConf)
      if (fs.exists(target)) fs.delete(target, true)
      // managed-table rename moves the data directory along with the
      // catalog entry (one FS rename — atomic on HDFS/POSIX)
      try spark.sql(s"ALTER TABLE ${staging.quotedString} RENAME TO ${ident.quotedString}")
      catch { case e: Throwable =>
        throw new java.io.IOException(
          s"bucketed swap failed after the old table was retired — data preserved " +
            s"under staging table ${staging.quotedString}", e)
      }
    } catch { case e: Throwable =>
      // failure BEFORE the point of no return: the live table is intact,
      // so the staging leftovers are safe (and right) to remove
      if (!oldRetired) {
        try {
          if (spark.sessionState.catalog.tableExists(staging)) {
            spark.sql(s"DROP TABLE IF EXISTS ${staging.quotedString}")
            ()
          }
          val sloc = locOf(staging)
          val sfs = sloc.getFileSystem(hadoopConf)
          if (sfs.exists(sloc)) { sfs.delete(sloc, true); () }
        } catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
      }
      throw e
    }
  }

  /** Range-partitioned, internally-sorted parquet layout: rows are
    * globally range-distributed on `layoutCols` (sampled range exchange),
    * sorted within each partition, and written one file per partition.
    *
    * Why this is a first-class sink at 100 TB: parquet footers carry
    * min/max zone maps per row group, and Spark's scan skips row groups
    * whose stats refute a pushed predicate — but on an unsorted layout
    * every row group spans nearly the full key range and NOTHING skips.
    * After this write, the key ranges of files (and row groups within
    * them) are disjoint, so a selective filter on the layout key reads
    * ~selectivity of the data instead of all of it, with zero read-path
    * configuration. The one-off cost is a single range exchange at write
    * time. LayoutSpec proves the effect on the scan's numOutputRows
    * metric; sizing `numFiles` ≈ data / target-file-size keeps row
    * groups within executor memory at any scale.
    *
    * `maxRecordsPerFile` (0 = off) additionally caps rows per written
    * file WITHOUT another shuffle — the small-files-vs-huge-files knob
    * when the range exchange's partition count can't be known up front
    * (AQE may coalesce). */
  def writeSortedParquet(df: DataFrame, path: String, layoutCols: Seq[String],
      numFiles: Int, maxRecordsPerFile: Long = 0L): Unit = {
    require(layoutCols.nonEmpty, "need at least one layout column")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.repartitionByRange(numFiles, layoutCols.map(col): _*)
      .sortWithinPartitions(layoutCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .parquet(path)
  }

  /** Z-ordered parquet layout: rows are range-distributed and sorted by
    * the bit-interleaved [[graft.functions.ZOrderValue]] of
    * `layoutCols`, so per-file min/max stats stay narrow in EVERY
    * interleaved column — filters on any of them (alone or together)
    * skip files/row groups, where [[writeSortedParquet]] serves only its
    * single sort key. The ordering column is internal and not written.
    *
    * Layout columns may be any integral, date, or timestamp type: each
    * is first normalized to `(value - min) / scale` with `scale` sized
    * so the column's full range fits `bits` bits (one cheap min/max agg
    * job before the write — noise next to the full-shuffle write
    * itself). Without this, any column whose values exceed `2^bits`
    * (epoch days ≈ 20k, epoch micros ≈ 1.8e15) silently clamps to a
    * CONSTANT and contributes nothing to the layout — the degenerate
    * case the normalization exists to kill. Nulls sort together via the
    * z-value's null propagation. */
  def writeZOrderedParquet(df: DataFrame, path: String, layoutCols: Seq[String],
      bits: Int, numFiles: Int): Unit = {
    require(layoutCols.size >= 2, "z-order needs at least 2 layout columns")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    import org.apache.spark.sql.types._
    // monotone long view of each layout column (exactness is irrelevant
    // for layout — only order matters): dates → days, timestamps →
    // epoch seconds, integrals → themselves. Non-orderable types still
    // fail at plan time inside ZOrderValue's type check.
    def asLong(name: String): org.apache.spark.sql.Column = {
      df.schema(name).dataType match {
        case DateType => datediff(col(name), to_date(lit("1970-01-01")))
          .cast(LongType)
        case TimestampType | TimestampNTZType =>
          col(name).cast(TimestampType).cast(LongType)
        case _ => col(name).cast(LongType)
      }
    }
    val longCols = layoutCols.map(asLong)
    val aggs = longCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c).as(s"mn$i"), max(c).as(s"mx$i")) }
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val normalized = longCols.zipWithIndex.map { case (c, i) =>
      if (stats.isNullAt(2 * i)) lit(0L) // all-null/empty column: constant
      else {
        val mn = stats.getLong(2 * i)
        val span = stats.getLong(2 * i + 1) - mn // >= 0
        // power-of-two downscale: drop just enough low bits that the
        // span fits `bits` bits — exact integer ops, <=1 bit of
        // resolution lost vs an arbitrary divisor
        val needBits = 64 - java.lang.Long.numberOfLeadingZeros(span)
        val drop = math.max(0, needBits - bits)
        shiftright(c - lit(mn), drop)
      }
    }
    val z = graft.functions.LayoutFunctions.zValue(bits, normalized: _*)
    df.withColumn("__graft_z", z)
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Compact a parquet directory's many small files into
    * ~`targetFileBytes`-sized ones. The small-files problem is an ingest
    * fact of life at scale: a streaming or per-batch writer leaves
    * thousands of KB-sized files per partition, and every later scan
    * pays one task + one footer-read + one object-store GET per file.
    *
    * Coalesce (narrow, no shuffle) merges existing files into fewer
    * tasks; the rewrite goes to a temp directory through the normal
    * commit protocol and replaces the original only after committing.
    * The swap is RENAME-ONLY (rename(dir → old) + rename(tmp → dir) +
    * delete old — the same discipline as
    * [[graft.streaming.EventStreams.upsertSink]]): at every instant a
    * complete copy of the data exists under some name, so a crash at any
    * point loses nothing, and the entry-time recovery below restores the
    * live path from whichever complete copy survived. A reader racing
    * the compaction sees the old files or the new, except in the
    * sub-rename window between the two renames where the live path is
    * briefly absent — a retrying reader recovers; data never does not.
    * A failed rewrite leaves the original untouched. Returns
    * (filesBefore, filesAfter); a directory already at or below the
    * target count is left untouched (no-op, returns equal counts).
    *
    * Row-group caveat: parquet files merge at ROW level here (decode +
    * re-encode). That re-packs tiny row groups into full ones — the
    * point of compaction — but costs a full read+write of the data;
    * schedule it off the hot path.
    *
    * SINGLE WRITER PER PATH (load-bearing): the staging/retired names
    * are fixed per target, and the entry-time [[FsSwap.recover]] deletes
    * whatever it finds under them. Two concurrent compactions of the
    * same path — or a compaction racing an [[graft.streaming.EventStreams.upsertSink]]
    * swap on the same directory — can delete each other's in-flight
    * staging or promote a stale retired copy. Concurrent invocation on
    * one path is a caller error, not a supported mode; serialize
    * maintenance per table (at scale: one compaction job per table per
    * schedule tick, exactly how table-format maintenance is run).
    *
    * `writeOptions` are applied to the compacted rewrite — a layout
    * whose files carry writer-level metadata the READ side depends on
    * (e.g. the per-column parquet bloom filters of a
    * [[graft.streaming.EventStreams.dedupIngestSink]] corpus) must pass
    * the same options here, or the rewrite silently sheds them and
    * every downstream pruned read degrades to a full scan. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileBytes: Long = 128L << 20,
      writeOptions: Map[String, String] = Map.empty,
      sortCols: Seq[String] = Nil): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(path + ".__graft-compact-tmp__")
    val old = new org.apache.hadoop.fs.Path(path + ".__graft-compact-old__")
    // crash recovery from a previous compaction killed mid-swap — the
    // four-state machine lives in FsSwap (shared with upsertSink)
    FsSwap.recover(fs, dir, tmp, old, "compact")
    val entries = fs.listStatus(dir).filterNot { st =>
      st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith(".")
    }
    // a hive-partitioned layout (date=*/ subdirectories) would otherwise
    // read as "0 files → already compact" and silently no-op — the exact
    // layout most prone to small files. Refuse loudly; compact each
    // partition directory instead.
    val subdirs = entries.filter(_.isDirectory)
    require(subdirs.isEmpty,
      s"compact: $path contains subdirectories (${subdirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
        "partitioned layouts must be compacted per partition directory")
    val parts = entries.filter(_.isFile)
    val before = parts.length
    val totalBytes = parts.map(_.getLen).sum
    val want = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    if (want >= before) return (before, before)

    try {
      // optional in-file re-sort: append-grown stores whose readers
      // rely on row-group stats (a pushed In on a sort key) would
      // otherwise lose that pruning to the compaction's row interleave
      val compacted0 = spark.read.parquet(path).coalesce(want)
      val compacted =
        if (sortCols.isEmpty) compacted0
        else compacted0.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      compacted
        .write.mode(SaveMode.Overwrite).options(writeOptions).parquet(tmp.toString)
    } catch { case e: Throwable =>
      try { fs.delete(tmp, true); () } catch { case _: java.io.IOException => () }
      throw e
    }
    // rename-only swap — the original is never deleted until the
    // compacted copy is live; a crash at any point is undone by the
    // recovery at entry
    FsSwap.swap(fs, dir, tmp, old, "compact")
    val after = fs.listStatus(dir).count { st =>
      st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")
    }
    (before, after)
  }

  def writeOrc(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    if (singleFile)
      commitAsSingleFile(df, path)(p =>
        df.coalesce(1).write.mode(SaveMode.Overwrite).orc(p))
    else df.write.mode(SaveMode.Overwrite).orc(path)

  def writeNdJson(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    if (singleFile)
      commitAsSingleFile(df, path)(p =>
        df.coalesce(1).write.mode(SaveMode.Overwrite).json(p))
    else df.write.mode(SaveMode.Overwrite).json(path)

  /** JSON as a single array document (reference JsonFormat::Json,
    * file_dialog.rs:221-235). Spark natively writes JSON-lines; the array
    * form is assembled from the serialized rows inside one task — no
    * driver collect. Inherently one part (array documents don't shard);
    * `singleFile = true` additionally commits it as the literal file at
    * `path` rather than a one-part directory. */
  def writeJsonArray(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    import df.sparkSession.implicits._
    def write(p: String): Unit = df.toJSON.coalesce(1)
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
      .write.mode(SaveMode.Overwrite).text(p)
    if (singleFile) commitAsSingleFile(df, path)(write) else write(path)
  }
}
