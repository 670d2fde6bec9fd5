package graft

import graft.operators.{Dedup, SketchSidecar}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSidecarSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = Dedup.MinHashConfig(numHashes = 64, bands = 8)

  /** Diverse texts (splitmix-scrambled words over a 997-word vocab) so
    * signatures — and their LSH buckets — spread; near-dup pairs are
    * introduced explicitly by re-id'ing copies in the tests. */
  private def synthDocs(n: Int, start: Long = 0L) = {
    def mix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until n).map { i =>
      val id = start + i
      val words = (0 until 20).map(j => "w" + math.floorMod(mix(id * 131L + j), 997L))
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def freshPath(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_sidecar_$tag").toString + "/sc"

  test("pairs against the partitioned sidecar ≡ pairs against the flat sketch frame") {
    val path = freshPath("eq")
    val corpus = synthDocs(200)
    val batch = synthDocs(40, start = 1000L)
      .union(corpus.filter($"doc_id" < 10).select(($"doc_id" + 5000L).as("doc_id"), $"text"))
    val sketches = Dedup.dedupSketchColumns(corpus, "doc_id", "text", cfg)
    SketchSidecar.create(spark, path, SketchSidecar.Layout(32, 16))
    SketchSidecar.append(sketches, path, cfg, SketchSidecar.Layout(32, 16))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"id_new", $"id_other", $"other_in_corpus", round($"jaccard", 9).as("j"))
      .as[(Long, Long, Boolean, Double)].collect().toSet
    val viaSidecar = norm(SketchSidecar.minhashExactPairsAgainstSidecar(
      batch, path, "doc_id", "text", cfg, exactThreshold = 0.3))
    val viaFlat = norm(Dedup.minhashExactPairsAgainstSketches(
      batch, sketches, "doc_id", "text", cfg, exactThreshold = 0.3))
    assert(viaSidecar == viaFlat, s"${viaSidecar.size} vs ${viaFlat.size}")
    assert(viaFlat.exists(_._3), "test corpus must produce corpus-side pairs")
  }

  test("probe prunes: bands bytes-read scale with the batch's candidate buckets, not sidecar size") {
    val path = freshPath("prune")
    val layout = SketchSidecar.Layout(bandBuckets = 64, setBuckets = 32)
    SketchSidecar.create(spark, path, layout)
    SketchSidecar.append(
      Dedup.dedupSketchColumns(synthDocs(2000), "doc_id", "text", cfg),
      path, cfg, layout)
    // one-doc batch: ≤ cfg.bands = 8 band rows → ≤ 8 of 64 buckets
    val batch = synthDocs(1, start = 9999L)

    // ---- plan-level: the band scan the probe builds prunes at
    // partition-listing time to the batch's buckets
    val banded = SketchSidecar.bandedBatch(batch, "doc_id", "text", cfg, layout)
    val (buckets, hashesIn) = SketchSidecar.probeKeys(banded)
    assert(buckets.nonEmpty && buckets.length <= cfg.bands)
    assert(hashesIn.isDefined, "a 1-doc batch is trickle-sized → pushed-In expected")
    val scanDf = SketchSidecar.corpusBandScan(spark, path, buckets, hashesIn)
    scanDf.count() // execute so AQE finalizes the scan node
    val scans = scanDf.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "bands scan missing")
    val bandsDir = new java.io.File(new java.net.URI("file:" + path + "/bands"))
    val totalBuckets = bandsDir.listFiles.count(_.getName.startsWith("bucket="))
    val totalBandBytes = bandsDir.listFiles.filter(_.getName.startsWith("bucket="))
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet")).map(_.length).sum
    scans.foreach { f =>
      // (ScanFileListing.totalFileSize reports the pre-prune listing in
      // this Spark version — partitionCount is the post-prune measure,
      // and the listener below asserts actual bytes)
      val selParts = f.selectedPartitions.partitionCount
      assert(selParts <= cfg.bands,
        s"1-doc probe must touch <= ${cfg.bands} buckets, scanned $selParts of $totalBuckets")
      assert(selParts < totalBuckets / 2,
        s"probe must prune most buckets: $selParts of $totalBuckets")
      val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(f.toString).map(_.group(1))
      assert(pf.exists(s => s.contains("bucket")),
        s"bucket filter not in PartitionFilters: $pf")
      assert(f.toString.contains("PushedFilters: [In(band_hash"),
        s"band_hash In must push to the parquet reader:\n${f.toString.take(800)}")
    }

    // ---- behavioral: ACTUAL bytes read by the full probe (all jobs,
    // incl. the eager candidate materialization) stay a fraction of
    // the sidecar — the batch is in-memory, so every input byte below
    // is a sidecar file byte
    val setsDir = new java.io.File(new java.net.URI("file:" + path + "/sets"))
    val totalSidecarBytes = totalBandBytes +
      setsDir.listFiles.filter(_.getName.startsWith("sbucket="))
        .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SketchSidecar.minhashExactPairsAgainstSidecar(
        batch, path, "doc_id", "text", cfg, exactThreshold = 0.3).count()
      // task-end events drain asynchronously; wait for quiescence
      var last = -1L
      var spins = 0
      while (bytesRead.get != last && spins < 50) {
        last = bytesRead.get; Thread.sleep(100); spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(bytesRead.get > 0, "probe must read some sidecar bytes")
    assert(bytesRead.get < totalSidecarBytes / 2,
      s"1-doc probe read ${bytesRead.get} of $totalSidecarBytes sidecar bytes — not pruned")
  }

  test("flat v1 sidecar migrates in place; admission identical after migration") {
    val base = java.nio.file.Files.createTempDirectory("graft_sidecar_mig").toString
    val path = s"$base/sc"
    val corpus = synthDocs(100)
    // write a FLAT (pre-v2) sidecar the way the old sink did
    Dedup.dedupSketchColumns(corpus, "doc_id", "text", cfg)
      .write.mode("overwrite").parquet(path)
    val batch = synthDocs(20, start = 2000L)
      .union(corpus.filter($"doc_id" < 5).select(($"doc_id" + 7000L).as("doc_id"), $"text"))
    val expected = Dedup.admitNewAgainstSketches(batch,
      Dedup.dedupSketchColumns(corpus, "doc_id", "text", cfg),
      "doc_id", "text", cfg, exactThreshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    SketchSidecar.migrateV1IfNeeded(spark, path, cfg, SketchSidecar.Layout(16, 8))
    assert(SketchSidecar.exists(spark, path), "marker must exist after migration")
    assert(SketchSidecar.readLayout(spark, path) == SketchSidecar.Layout(16, 8))
    assert(SketchSidecar.setsCount(spark, path) == 100L)
    // no loose parquet at the root anymore
    val root = new java.io.File(new java.net.URI("file:" + path))
    assert(!root.listFiles.exists(f => f.isFile && f.getName.endsWith(".parquet")),
      "flat part-files must be removed after migration")
    val got = SketchSidecar.admitNew(batch, path, "doc_id", "text", cfg,
      exactThreshold = 0.3).select("doc_id").as[Long].collect().toSet
    assert(got == expected)
    // second call is a no-op
    SketchSidecar.migrateV1IfNeeded(spark, path, cfg, SketchSidecar.Layout(16, 8))
    assert(SketchSidecar.setsCount(spark, path) == 100L)
  }

  test("compaction shrinks per-bucket file counts and preserves probe results") {
    val path = freshPath("compact")
    val layout = SketchSidecar.Layout(8, 4)
    SketchSidecar.create(spark, path, layout)
    // many small appends → many files per bucket
    (0 until 5).foreach { i =>
      SketchSidecar.append(
        Dedup.dedupSketchColumns(synthDocs(40, start = i * 100L), "doc_id", "text", cfg),
        path, cfg, layout)
    }
    val batch = synthDocs(10, start = 9000L)
    val before = SketchSidecar.minhashExactPairsAgainstSidecar(
      batch, path, "doc_id", "text", cfg, exactThreshold = 0.3)
      .select($"id_new", $"id_other").as[(Long, Long)].collect().toSet
    val (nBefore, nAfter) = SketchSidecar.compact(spark, path, targetFileBytes = 128L << 20)
    assert(nAfter < nBefore, s"compaction must shrink files: $nBefore -> $nAfter")
    val after = SketchSidecar.minhashExactPairsAgainstSidecar(
      batch, path, "doc_id", "text", cfg, exactThreshold = 0.3)
      .select($"id_new", $"id_other").as[(Long, Long)].collect().toSet
    assert(after == before, "probe results must survive compaction")
    assert(SketchSidecar.setsCount(spark, path) == 200L)
  }

  test("config drift against the sidecar fails fast") {
    val path = freshPath("cfgdrift")
    val layout = SketchSidecar.Layout(8, 4)
    SketchSidecar.create(spark, path, layout)
    SketchSidecar.append(
      Dedup.dedupSketchColumns(synthDocs(20), "doc_id", "text", cfg), path, cfg, layout)
    val drifted = cfg.copy(seed = 7L)
    val e = intercept[IllegalArgumentException] {
      SketchSidecar.minhashExactPairsAgainstSidecar(
        synthDocs(5, 500L), path, "doc_id", "text", drifted, 0.3)
    }
    assert(e.getMessage.contains("seed"))
  }
}
