package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the per-cell compaction job pool
  * (Similarity.compactIndexCells): builds an IVF index with a
  * production-shaped cell count, grows every cell with two append
  * batches, then times `compactIvfIndex` sequential (maxConcurrentCells
  * = 1, the pre-round-14 behavior) vs pooled (default 8) on identical
  * freshly-grown trees. Usage:
  *
  *   sbt "Test/runMain graft.tools.CompactBench /root/testdata/sf0.1 64"
  *
  * The pool's win is driver job-submission latency × numCells, so the
  * gap widens with cell count — the sequential form is O(numCells)
  * serialized Spark jobs regardless of cluster width.
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val numCells = if (args.length > 1) args(1).toInt else 64
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def grow(path: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      graft.operators.Similarity.buildIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        path, numCentroids = numCells, seed = 42L, kmeansIters = 2)
      graft.operators.Similarity.appendToIvfIndex(
        emb.filter(col("vec_id") % 4 === 1), "vec_id", "embedding", path)
      graft.operators.Similarity.appendToIvfIndex(
        emb.filter(col("vec_id") % 4 === 3), "vec_id", "embedding", path)
    }

    def time(label: String, conc: Int): Double = {
      val path = s"/tmp/graft_compactbench_$conc"
      grow(path)
      val t0 = System.nanoTime()
      val (b, a) = graft.operators.Similarity.compactIvfIndex(
        spark, path, maxConcurrentCells = conc)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: $sec%.2f s ($b -> $a files, $numCells cells)")
      sec
    }

    // warm both paths once (JVM/codegen), then measure median of 3
    time("warmup(seq)", 1); time("warmup(pool)", 8)
    val seq = (1 to 3).map(_ => time("sequential", 1)).sorted.apply(1)
    val par = (1 to 3).map(_ => time("pooled    ", 8)).sorted.apply(1)
    println(f"""{"compact_seq_sec":$seq%.2f,"compact_pool_sec":$par%.2f,"speedup":${seq / par}%.2f,"cells":$numCells}""")
    spark.stop()
  }
}
