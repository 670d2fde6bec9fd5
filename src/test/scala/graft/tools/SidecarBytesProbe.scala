package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Round-12 verdict item 3: measure the sketch-sidecar bytes actually
  * read per micro-batch of the `stream_semantic_ingest` flow at a
  * LARGE scale factor, where every batch takes the BULK path (batch
  * docs ≫ [[graft.operators.SketchSidecar.BulkAppendDocs]]) and the
  * admission amortizes one column-pruned set-store scan instead of the
  * trickle In-pushdown.
  *
  *   Test/runMain graft.tools.SidecarBytesProbe /tmp/sf10
  *
  * Replicates the gate exactly (3 file batches = doc_id % 3, pinned
  * mtimes, semanticIngestSink) with a task-metrics listener; per-batch
  * deltas are snapshotted at each StreamingQueryProgress. CAVEAT
  * (measured round 12): on this Spark/Hadoop pairing
  * `inputMetrics.bytesRead` never receives parquet scan bytes — only
  * cached-block (Materialize.once) reads — so `batchBytesRead` is the
  * BATCH-SIDE materialization traffic, and sidecar scan growth shows
  * up in the per-batch WALL time against the printed on-disk store
  * sizes instead. Findings go to BASELINE.md, not an assert: this is
  * a measurement harness, the keep/change decision is recorded
  * prose. */
object SidecarBytesProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = graft.GraftSession.local(
      threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val base = s"/tmp/graft_sidecar_probe"
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(basePath, true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$base/in"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batchBytes = (0 until 3).map { b =>
      val tmp = s"$base/tmp$b"
      docs.filter(pmod(col("doc_id"), lit(3)) === b)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).filter(_.getName.startsWith("part-")).head
      val dest = new org.apache.hadoop.fs.Path(s"$base/in/batch$b.parquet")
      fs.rename(part, dest)
      fs.setTimes(dest, 60000L * (b + 1), -1)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      fs.getFileStatus(dest).getLen
    }

    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(path)) 0L
      else {
        val it = fs.listFiles(path, true)
        var s = 0L
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) s += f.getLen
        }
        s
      }
    }

    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })

    val corpusPath = s"$base/corpus"
    val sketchPath = s"$base/sketches"
    val cfg = graft.operators.Dedup.MinHashConfig(numHashes = 128, bands = 64)
    val snapshots = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var lastBytes = 0L
    var lastWall = System.nanoTime()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        if (e.progress.numInputRows > 0) {
          // listener events race task-end accounting: settle briefly
          var last = -1L
          var spins = 0
          while (bytesRead.get != last && spins < 50) {
            last = bytesRead.get; Thread.sleep(100); spins += 1
          }
          val now = System.nanoTime()
          val cum = bytesRead.get
          snapshots.add(
        f"batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
        f"wallSec=${(now - lastWall) / 1e9}%.1f " +
        f"batchBytesRead=${(cum - lastBytes) / 1e6}%.1f MB " +
        f"bandsOnDisk=${dirBytes(s"$sketchPath/bands") / 1e6}%.1f MB " +
        f"setsOnDisk=${dirBytes(s"$sketchPath/sets") / 1e6}%.1f MB " +
        f"corpusOnDisk=${dirBytes(corpusPath) / 1e6}%.1f MB")
          lastBytes = cum
          lastWall = now
        }
      }
    })

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
    val q = graft.streaming.EventStreams.semanticIngestSink(stream,
      corpusPath, sketchPath, "doc_id", "text", cfg,
      exactThreshold = 0.5, checkpointDir = Some(s"$base/ckpt"))
    try q.processAllAvailable() finally q.stop()
    Thread.sleep(2000)

    println("== sidecar bytes probe ==")
    println(s"sfDir=$dir  batchFileBytes=${batchBytes.map(b => f"${b / 1e6}%.1f MB").mkString(", ")}")
    snapshots.forEach(s => println(s))
    spark.stop()
  }
}
