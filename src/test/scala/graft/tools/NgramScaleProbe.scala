package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Demonstrates the exact-Jaccard scale knob the sf100 probe pointed
  * at: full-shingle PPJoin shuffle volume is linear in corpus size but
  * exceeded one box's free disk at sf100 (~47 GB), and
  * `shingleKeepFraction` — the consistent shingle sample that composes
  * soundly with the prefix index (membership is a pure function of the
  * shingle hash, identical across documents) — divides that volume.
  *
  *   sbt "Test/runMain graft.tools.NgramScaleProbe /tmp/sf100 0.25"
  *
  * Prints pair count + wall seconds at the given keep fraction. The
  * result is the sampled-set Jaccard (the documented semantics of the
  * knob), so pair sets across fractions are comparable only in rough
  * magnitude, not row-for-row.
  */
object NgramScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf100"
    val keep = if (args.length > 1) args(1).toDouble else 0.25
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", n = 3, threshold = 0.5,
      shingleKeepFraction = keep)
    val n = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"ngram_keep":$keep,"pairs":$n,"sec":$sec%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
