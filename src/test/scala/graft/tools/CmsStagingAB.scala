package graft.tools

import org.apache.spark.sql.functions._

/** A/B harness for the stream_cms_counts GATE STAGING (dev tool): runs
  * the round-15 staging arm — tercile repartition(8)-rewrite of the
  * corpus into the stream inbox — against the same
  * `EventStreams.cmsAccumulateSink` consumption, so the delta vs the
  * current gate (byte-copy staging, SparkEntry "stream_cms_counts") is
  * pure staging IO. The operator under test is identical in both arms.
  *
  *   Test/runMain graft.tools.CmsStagingAB /tmp/sf100 [shufflePartitions]
  */
object CmsStagingAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val parts = if (args.length > 1) args(1).toInt else 128
    val spark = graft.GraftSession.local(
      threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      shufflePartitions = parts)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()

    val base = s"/tmp/graft_cmsab_${dir.replaceAll("[^A-Za-z0-9._-]", "_")}"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(basePath, true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$base/in"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // --- round-15 staging arm, verbatim shape ---
    val n = docs.agg(max("doc_id")).head().getLong(0) + 1
    val batches = (0 until 3).map(b =>
      docs.filter(col("doc_id") * 3 / n >= b && col("doc_id") * 3 / n < b + 1))
    batches.zipWithIndex.foreach { case (df, b) =>
      val tmp = s"$base/tmp$b"
      df.repartition(8).write.mode("overwrite").parquet(tmp)
      fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).filter(_.getName.startsWith("part-"))
        .zipWithIndex.foreach { case (part, i) =>
          val dest = new org.apache.hadoop.fs.Path(s"$base/in/batch${b}_$i.parquet")
          fs.rename(part, dest)
          fs.setTimes(dest, 60000L * (b + 1), -1)
        }
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    val stageSec = (System.nanoTime() - t0) / 1e9
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "8").parquet(s"$base/in")
    val terms = stream.select(explode(
      filter(split(lower(trim(col("text"))), "\\s+"), w => length(w) > 0))
      .as("term"))
    val q = graft.streaming.EventStreams.cmsAccumulateSink(terms,
      s"$base/sketch", depth = 4, width = 64,
      checkpointDir = Some(s"$base/ckpt"))
    try q.processAllAvailable() finally q.stop()
    val rows = spark.read.parquet(s"$base/sketch").count()
    val total = (System.nanoTime() - t0) / 1e9
    println(f"[cms-ab] OLD staging @ $dir: total $total%.1f s " +
      f"(staging $stageSec%.1f s), sketch rows $rows")
    fs.delete(basePath, true)
    spark.stop()
  }
}
