package graft.tools

import org.apache.spark.sql.functions._

object SemIngestProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(threads = 32, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    val t00 = System.nanoTime()
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s (total ${(System.nanoTime()-t00)/1e9}%.1f)")
    }
    val base = s"/tmp/graft_semprof_${System.nanoTime()}"
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val cfg = graft.operators.Dedup.MinHashConfig(numHashes = 128, bands = 64)
    val corpusPath = s"$base/corpus"
    val sketchPath = s"$base/sketches"
    import graft.operators.{Dedup, SketchSidecar}
    (0 until 3).foreach { b =>
      val batch = docs.filter(pmod(col("doc_id"), lit(3)) === b)
      val exists = new java.io.File(new java.net.URI("file:" + corpusPath)).exists
      if (!exists) t(s"b$b create")(SketchSidecar.create(spark, sketchPath))
      else t(s"b$b tearprobe") {
        val torn = spark.read.parquet(corpusPath).count() >
          SketchSidecar.setsCount(spark, sketchPath)
        assert(!torn)
      }
      var admitted: org.apache.spark.sql.DataFrame = null
      var sketches: org.apache.spark.sql.DataFrame = null
      t(s"b$b admit") {
        val (a, sk) = SketchSidecar.admitAndSketches(
          batch, sketchPath, "doc_id", "text", cfg, 0.5)
        admitted = graft.Materialize.once(a, eager = true)
        sketches = sk
      }
      t(s"b$b corpuswrite") {
        admitted.write.mode(if (exists) "append" else "overwrite").parquet(corpusPath)
      }
      t(s"b$b sketchappend") {
        SketchSidecar.append(sketches, sketchPath, cfg)
      }
    }
    spark.stop()
  }
}
