package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  def events = Seq(
    Event(1L, ts(0), 100L, "click", 1.0),
    Event(2L, ts(1), 100L, "click", 2.0),
    Event(3L, ts(2), 200L, "view", 3.0),
    Event(4L, ts(20), 100L, "click", 4.0),   // new session for user 100
    Event(5L, ts(21), 200L, "view", 5.0))

  test("windowed aggregation over a stream (watermark + event-time window)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.windowedCounts(input.toDF(), "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("win_out").start()
    input.addData(events: _*)
    // watermark-past event to close the earlier windows
    input.addData(Event(9L, ts(59), 1L, "tick", 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_out")
      .select("window_start", "event_type", "n", "total_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(rows.contains((ts(0), "click", 2L, 3.0)))
    assert(rows.contains((ts(0), "view", 1L, 3.0)))
    assert(rows.contains((ts(20), "click", 1L, 4.0)))
  }

  test("frozen NB quality model scores micro-batches in foreachBatch ≡ batch scoring") {
    // the trained-model curation composition: fit once in batch,
    // score every micro-batch with the FROZEN broadcast model — the
    // streaming counterpart of scoreNbQuality, no retraining, no
    // cross-batch state. Batch and stream scores must be identical
    // floats (same expressions, same model rows).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val train = (0 until 40).map { i =>
      val good = i % 2 == 0
      val words = (if (good) Seq("clean", "prose") else Seq("spam", "junk")) ++
        Seq("common", s"w${i % 5}")
      (i.toLong, words.mkString(" "), good)
    }.toDF("doc_id", "text", "label")
    val model = graft.operators.QualityClassifier
      .trainNbQuality(train, "label", "text")
    // pin the model frames so each micro-batch reuses the fit instead
    // of re-deriving it from the training lineage
    val frozen = graft.operators.QualityClassifier.NbModel(
      Materialize.once(model.termLogProbs, eager = true),
      Materialize.once(model.stats, eager = true))
    val evalRows = Seq((100L, "clean prose common"), (101L, "junk spam spam"),
      (102L, ""), (103L, "unseen words only"))
    val want = graft.operators.QualityClassifier
      .scoreNbQuality(evalRows.toDF("doc_id", "text"), "doc_id", "text", frozen)
      .as[(Long, Long, Double, Boolean)].collect().toSet

    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set[(Long, Long, Double, Boolean)]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.operators.QualityClassifier
          .scoreNbQuality(batch, "doc_id", "text", frozen)
          .as[(Long, Long, Double, Boolean)].collect()
        ()
      }.start()
    input.addData(evalRows.take(2): _*)
    input.addData(evalRows.drop(2): _*)
    q.processAllAvailable(); q.stop()
    assert(got.toSet == want, s"stream scores diverged:\n got=$got\nwant=$want")
    assert(want.exists(r => r._1 == 100L && r._4) &&
      want.exists(r => r._1 == 101L && !r._4))
  }

  test("nbScoreSink: parquet sink union ≡ batch scoring; logit rounded, keep exact") {
    // the packaged sink around the frozen-model foreachBatch pattern
    // the previous test spells out by hand: same model, but scores land
    // in an on-disk parquet sink across multiple micro-batches
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val train = (0 until 40).map { i =>
      val good = i % 2 == 0
      val words = (if (good) Seq("clean", "prose") else Seq("spam", "junk")) ++
        Seq("common", s"w${i % 5}")
      (i.toLong, words.mkString(" "), good)
    }.toDF("doc_id", "text", "label")
    val model = graft.operators.QualityClassifier
      .trainNbQuality(train, "label", "text")
    val frozen = graft.operators.QualityClassifier.NbModel(
      Materialize.once(model.termLogProbs, eager = true),
      Materialize.once(model.stats, eager = true))
    val evalRows = Seq((100L, "clean prose common"), (101L, "junk spam spam"),
      (102L, ""), (103L, "unseen words only"))
    val want = graft.operators.QualityClassifier
      .scoreNbQuality(evalRows.toDF("doc_id", "text"), "doc_id", "text", frozen)
      .select(col("doc_id"), col("n_tokens"),
        round(col("logit"), 6).as("logit"), col("keep"))
      .as[(Long, Long, Double, Boolean)].collect().toSet

    val base = s"/tmp/graft_test_nbsink_${System.nanoTime()}"
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.nbScoreSink(
      input.toDF().toDF("doc_id", "text"), frozen,
      s"$base/scores", "doc_id", "text",
      checkpointDir = Some(s"$base/ckpt"))
    input.addData(evalRows.take(2): _*)
    input.addData(evalRows.drop(2): _*)
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$base/scores")
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(got == want, s"sink scores diverged:\n got=$got\nwant=$want")
    // replay tolerance is BY DEDUP (scores are deterministic): a
    // re-appended batch collapses to the same rows
    val replayed = spark.read.parquet(s"$base/scores")
      .unionAll(spark.read.parquet(s"$base/scores"))
      .dropDuplicates("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(replayed == want)
  }

  test("CMS accumulates across micro-batches: cell-summed stream sketch ≡ batch sketch") {
    // the sketch's mergeability IS its streaming story: per-batch
    // sketches sum cell-wise into the corpus sketch, state bounded at
    // depth×width forever
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      (0 until 120).map(i => s"t${i % 9}"),
      (0 until 80).map(i => s"u${i % 5}"),
      (0 until 50).map(i => s"t${i % 3}"))
    var acc: Option[org.apache.spark.sql.DataFrame] = None
    val input = MemoryStream[String]
    val q = input.toDF().toDF("term").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sk = graft.operators.Cms.cmsSketch(batch, "term", depth = 3, width = 32)
        val merged = acc match {
          case None => sk
          case Some(prev) => prev.unionByName(sk)
            .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
        }
        // pin each accumulated state: the next merge must not re-read
        // closed micro-batch sources
        acc = Some(Materialize.once(merged, eager = true))
        ()
      }.start()
    batches.foreach(b => input.addData(b: _*))
    q.processAllAvailable(); q.stop()
    val streamed = acc.get.as[(Int, Long, Long)].collect().toSet
    val whole = graft.operators.Cms.cmsSketch(
      batches.flatten.toDF("term"), "term", depth = 3, width = 32)
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == whole, "streamed cell-sum diverged from the batch sketch")
  }

  test("cmsAccumulateSink: persisted state ≡ batch sketch; replayed batch folds once; shape refusal") {
    // the PACKAGED persisted version of the accumulation above: state
    // on disk, exactly-once per batch id, crash-safe swap
    import spark.implicits._
    val base = s"/tmp/graft_test_cmsacc_${System.nanoTime()}"
    val path = s"$base/sketch"
    val batches = Seq(
      (0 until 120).map(i => s"t${i % 9}"),
      (0 until 80).map(i => s"u${i % 5}"),
      (0 until 50).map(i => s"t${i % 3}"))
    batches.zipWithIndex.foreach { case (b, i) =>
      EventStreams.applyCmsBatch(b.toDF("term"), path, i.toLong,
        depth = 3, width = 32)
    }
    def state() = spark.read.parquet(path).as[(Int, Long, Long)].collect().toSet
    val whole = graft.operators.Cms.cmsSketch(
      batches.flatten.toDF("term"), "term", depth = 3, width = 32)
      .as[(Int, Long, Long)].collect().toSet
    assert(state() == whole, "persisted cell-sum diverged from the batch sketch")
    // at-least-once delivery replays THE LAST batch with its original
    // id — the marker makes the re-fold a no-op, counts stay exact
    EventStreams.applyCmsBatch(batches(2).toDF("term"), path, 2L,
      depth = 3, width = 32)
    assert(state() == whole, "replayed last batch double-counted")
    // an id BEHIND the marker can't be a replay (one checkpoint only
    // ever re-delivers its last uncommitted batch): it means a fresh
    // checkpoint against existing state, where skipping would silently
    // drop batches — refuse loudly
    val eReset = intercept[IllegalArgumentException] {
      EventStreams.applyCmsBatch(batches(1).toDF("term"), path, 1L,
        depth = 3, width = 32)
    }
    assert(eReset.getMessage.contains("behind"))
    // a NEW batch id still folds
    EventStreams.applyCmsBatch(Seq("t0", "t0").toDF("term"), path, 3L,
      depth = 3, width = 32)
    val afterNew = graft.operators.Cms.cmsSketch(
      (batches.flatten ++ Seq("t0", "t0")).toDF("term"), "term",
      depth = 3, width = 32).as[(Int, Long, Long)].collect().toSet
    assert(state() == afterNew)
    // incompatible geometry refuses loudly instead of corrupting cells
    val e = intercept[IllegalArgumentException] {
      EventStreams.applyCmsBatch(Seq("x").toDF("term"), path, 4L,
        depth = 4, width = 64)
    }
    assert(e.getMessage.contains("shape"))
    // the streaming wrapper rejects multi-column key frames up front
    val e2 = intercept[IllegalArgumentException] {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long)]
      EventStreams.cmsAccumulateSink(
        input.toDF().toDF("term", "junk"), s"$base/other")
    }
    assert(e2.getMessage.contains("single-column"))
  }

  test("cmsAccumulateSink fuzz: random batches with interleaved last-batch replays ≡ one-shot sketch") {
    // the upsert-sink fuzz discipline applied to the sketch state
    // machine: whatever the batch sizes, key skew, or replay pattern,
    // exactly-once folding must leave the state equal to sketching the
    // concatenation once. Deterministic splitmix RNG — reruns are
    // bit-identical.
    import spark.implicits._
    def mix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val path = s"/tmp/graft_test_cmsfuzz_${System.nanoTime()}/sketch"
    val all = scala.collection.mutable.Buffer[String]()
    (0 until 8).foreach { b =>
      val sz = math.floorMod(mix(b * 31L), 120L).toInt + 1
      val batch = (0 until sz).map(i =>
        s"k${math.floorMod(mix(b * 1009L + i), 40L)}")
      all ++= batch
      EventStreams.applyCmsBatch(batch.toDF("term"), path, b.toLong,
        depth = 3, width = 32)
      // ~half the batches get an at-least-once replay of THEMSELVES
      if (math.floorMod(mix(b * 77L + 5), 2L) == 0L)
        EventStreams.applyCmsBatch(batch.toDF("term"), path, b.toLong,
          depth = 3, width = 32)
    }
    val got = spark.read.parquet(path).as[(Int, Long, Long)].collect().toSet
    val want = graft.operators.Cms.cmsSketch(all.toSeq.toDF("term"), "term",
      depth = 3, width = 32).as[(Int, Long, Long)].collect().toSet
    assert(got == want, "fuzzed fold diverged from the one-shot sketch")
  }

  test("cmsAccumulateSink crash states: mid-swap and pre-swap both replay to the exact state") {
    // the two interesting windows of the per-batch swap, constructed
    // literally on disk, each followed by the at-least-once replay the
    // source would deliver after the crash
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val fs = new Path("/tmp").getFileSystem(
      spark.sessionState.newHadoopConf())
    def hp(s: String) = new Path(s)
    val batches = Seq(
      (0 until 90).map(i => s"a${i % 7}"),
      (0 until 60).map(i => s"b${i % 4}"),
      (0 until 40).map(i => s"a${i % 3}"))
    def fold(path: String, upTo: Int): Unit =
      (0 to upTo).foreach(i => EventStreams.applyCmsBatch(
        batches(i).toDF("term"), path, i.toLong, depth = 3, width = 32))
    def state(path: String) =
      spark.read.parquet(path).as[(Int, Long, Long)].collect().toSet
    val base = s"/tmp/graft_test_cmscrash_${System.nanoTime()}"
    fold(s"$base/expect", 2) // the state every recovery must reach

    // crash BETWEEN the swap's renames: target already retired, the
    // committed batch-2 staging not yet promoted. Recovery must finish
    // the swap; the replayed batch must then no-op on the marker.
    val mid = s"$base/mid"
    fold(mid, 2) // produces the post-batch-2 target...
    fs.rename(hp(mid), hp(mid + ".__graft-cms-staging__")) // ...as staging
    fold(mid, 1) // rebuild the PRE-batch-2 target at the live path
    fs.rename(hp(mid), hp(mid + ".__graft-cms-old__")) // first rename done
    EventStreams.applyCmsBatch(batches(2).toDF("term"), mid, 2L,
      depth = 3, width = 32)
    assert(state(mid) == state(s"$base/expect"), "mid-swap recovery diverged")
    assert(!fs.exists(hp(mid + ".__graft-cms-staging__")) &&
      !fs.exists(hp(mid + ".__graft-cms-old__")))

    // crash AFTER the staging write, BEFORE the swap began: recovery
    // discards the orphan staging (the live target is authoritative,
    // marker still 1) and the replayed batch re-folds.
    val pre = s"$base/pre"
    fold(pre, 2)
    fs.rename(hp(pre), hp(pre + ".__graft-cms-staging__"))
    fold(pre, 1)
    EventStreams.applyCmsBatch(batches(2).toDF("term"), pre, 2L,
      depth = 3, width = 32)
    assert(state(pre) == state(s"$base/expect"), "pre-swap recovery diverged")
  }

  test("session windows close after the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionized(input.toDF(), gap = "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    input.addData(events: _*)
    input.addData(Event(9L, ts(59), 1L, "tick", 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess_out")
      .select("user_id", "n_events", "session_value")
      .as[(Long, Long, Double)].collect().toSeq
    // user 100: session of events 1+2 (value 3.0), then separate session (4.0)
    assert(rows.contains((100L, 2L, 3.0)))
    assert(rows.contains((100L, 1L, 4.0)))
    assert(rows.contains((200L, 1L, 3.0)))
  }

  test("stream-stream interval join pairs rows across two live streams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = EventStreams.intervalJoined(
      clicks.toDF().select(col("event_id").as("click_id"),
        col("user_id").as("cu"), col("ts").as("cts")),
      purchases.toDF().select(col("event_id").as("purchase_id"),
        col("user_id").as("pu"), col("ts").as("pts")),
      "cu", "pu", "cts", "pts", within = "5 minutes", watermark = "10 minutes")
    val q = joined.select("click_id", "purchase_id")
      .writeStream.outputMode("append").format("memory").queryName("ij_out").start()
    // user 100 clicks at :00 and :20; purchases at :02 (joins the first
    // click only) and :40 (joins nothing); user 200 purchase at :03 has
    // no click at all
    clicks.addData(Event(1L, ts(0), 100L, "click", 0.0),
      Event(2L, ts(20), 100L, "click", 0.0))
    purchases.addData(Event(10L, ts(2), 100L, "purchase", 5.0),
      Event(11L, ts(40), 100L, "purchase", 6.0),
      Event(12L, ts(3), 200L, "purchase", 7.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ij_out").as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 10L)), s"got $rows")
  }

  test("interval join refuses overlapping column names") {
    import spark.implicits._
    val df = Seq((1L, ts(0))).toDF("id", "ts")
    val e = intercept[IllegalArgumentException] {
      EventStreams.intervalJoined(df, df, "id", "id", "ts", "ts")
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("upsertSink maintains a parquet snapshot across micro-batches; re-applied batch is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val snap = java.nio.file.Files.createTempDirectory("graft_upsert_").toString + "/state"
    val input = MemoryStream[(Long, String, Double, Long, Boolean)]
    val q = EventStreams.upsertSink(
      input.toDF().toDF("k", "name", "price", "v", "is_deleted"),
      snap, Seq("k"), "v")
    // batch 1: two inserts
    input.addData((1L, "a", 10.0, 1L, false), (2L, "b", 20.0, 1L, false))
    q.processAllAvailable()
    assert(spark.read.parquet(snap).count() == 2)
    // batch 2: update 1, delete 2, insert 3
    val batch2 = Seq((1L, "a2", 11.0, 2L, false), (2L, "b", 20.0, 2L, true),
      (3L, "c", 30.0, 2L, false))
    input.addData(batch2: _*)
    q.processAllAvailable()
    val state = spark.read.parquet(snap).select("k", "name", "price", "v")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(state == Set((1L, "a2", 11.0, 2L), (3L, "c", 30.0, 2L)), s"got $state")
    // re-delivery of batch 2 (at-least-once replay) must not change state
    input.addData(batch2: _*)
    q.processAllAvailable(); q.stop()
    val replayed = spark.read.parquet(snap).select("k", "name", "price", "v")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(replayed == state, "idempotent merge must absorb the replay")
  }

  /** (name → size) of every data file under `dir`, recursively — the
    * identity fingerprint the append-only / bucket-pruned sink asserts
    * ride on. */
  private def dataFiles(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val root = new java.io.File(dir)
    if (!root.exists()) Map.empty
    else walk(root).filter(f => f.getName.startsWith("part-"))
      .map(f => f.getAbsolutePath.stripPrefix(root.getAbsolutePath) -> f.length())
      .toMap
  }

  test("upsertSink rewrites only the buckets its batch touches — untouched bucket files survive by identity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val snap = java.nio.file.Files.createTempDirectory("graft_upsert_bkt_").toString + "/state"
    val input = MemoryStream[(Long, String, Double, Long, Boolean)]
    val q = EventStreams.upsertSink(
      input.toDF().toDF("k", "name", "price", "v", "is_deleted"),
      snap, Seq("k"), "v", numBuckets = 16)
    // batch 1: spread keys over many buckets
    input.addData((1L to 40L).map(k => (k, s"n$k", k * 1.0, 1L, false)): _*)
    q.processAllAvailable()
    val before = dataFiles(snap)
    val bucketsBefore = before.keys.map(_.split('/')
      .find(_.startsWith(EventStreams.BucketCol)).get).toSet
    assert(bucketsBefore.size > 4, s"keys should spread buckets: $bucketsBefore")
    // batch 2: touch ONE key
    input.addData((1L, "one!", 99.0, 2L, false))
    q.processAllAvailable(); q.stop()
    val after = dataFiles(snap)
    val changed = before.keySet.filterNot(p => after.get(p).contains(before(p)))
    // only key 1's bucket may differ; every other file survives by identity
    val touchedBuckets = changed.map(_.split('/')
      .find(_.startsWith(EventStreams.BucketCol)).get)
    assert(touchedBuckets.size <= 1,
      s"batch of one key must rewrite at most one bucket, rewrote: $touchedBuckets")
    val untouched = before.filter { case (p, _) =>
      !touchedBuckets.exists(b => p.contains(b)) }
    untouched.foreach { case (p, sz) =>
      assert(after.get(p).contains(sz), s"untouched file $p was rewritten") }
    // and the state is still correct
    val state = spark.read.parquet(snap).select("k", "name")
      .as[(Long, String)].collect().toMap
    assert(state(1L) == "one!" && state(2L) == "n2" && state.size == 40)
  }

  test("rebucket 16→64: content preserved, later batches prune to the NEW layout under the OLD parameter") {
    import spark.implicits._
    val snap = java.nio.file.Files.createTempDirectory("graft_rebkt_").toString + "/state"
    val hfs = new org.apache.hadoop.fs.Path(snap)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // seed 200 keys at 16 buckets via the batch entry point
    EventStreams.applyUpsertBatch(
      (1L to 200L).map(k => (k, s"n$k", 1L, false)).toDF("k", "name", "v", "is_deleted"),
      snap, Seq("k"), "v", "is_deleted", numBuckets = 16)
    val before = spark.read.parquet(snap)
      .select("k", "name", "v").as[(Long, String, Long)].collect().toSet
    def bucketDirs(): Set[String] =
      hfs.listStatus(new org.apache.hadoop.fs.Path(snap)).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith(EventStreams.BucketCol)).toSet
    assert(bucketDirs().forall(_.split('=')(1).toInt < 16))

    EventStreams.rebucket(spark, snap, Seq("k"), 64)
    // content byte-exact (same rows, same values)
    val after = spark.read.parquet(snap)
      .select("k", "name", "v").as[(Long, String, Long)].collect().toSet
    assert(after == before, "rebucket must preserve snapshot content")
    // layout actually moved to 64 buckets (200 keys occupy > 16 of them)
    val dirs64 = bucketDirs()
    assert(dirs64.exists(_.split('=')(1).toInt >= 16),
      s"no bucket above the old count — layout did not change: $dirs64")

    // a later batch arriving with the OLD parameter (16) must bucket by
    // the PERSISTED count: the updated key's live row is found (no
    // duplicate), and only its new-layout bucket is rewritten
    val filesBefore = dataFiles(snap)
    EventStreams.applyUpsertBatch(
      Seq((7L, "seven!", 2L, false)).toDF("k", "name", "v", "is_deleted"),
      snap, Seq("k"), "v", "is_deleted", numBuckets = 16)
    val state = spark.read.parquet(snap).select("k", "name")
      .as[(Long, String)].collect()
    assert(state.length == 200, s"duplicate or lost keys: ${state.length}")
    assert(state.toMap.apply(7L) == "seven!")
    val filesAfter = dataFiles(snap)
    val changed = filesBefore.keySet.filterNot(p =>
      filesAfter.get(p).contains(filesBefore(p)))
    val touchedBuckets = changed.map(_.split('/')
      .find(_.startsWith(EventStreams.BucketCol)).get)
    assert(touchedBuckets.size <= 1,
      s"one-key batch must rewrite at most one NEW-layout bucket: $touchedBuckets")

    // a restart with a DIFFERENT parameter still cannot mis-prune
    EventStreams.applyUpsertBatch(
      Seq((8L, "eight!", 2L, false)).toDF("k", "name", "v", "is_deleted"),
      snap, Seq("k"), "v", "is_deleted", numBuckets = 7)
    val s2 = spark.read.parquet(snap).select("k", "name").as[(Long, String)].collect()
    assert(s2.length == 200 && s2.toMap.apply(8L) == "eight!")
  }

  test("rebucket advisor fires from the batch path once the snapshot outgrows its layout") {
    import spark.implicits._
    val snap = java.nio.file.Files.createTempDirectory("graft_rbadv_").toString + "/state"
    // young snapshot under a generous target: healthy, no advice
    val a1 = EventStreams.applyUpsertBatch(
      (1L to 10L).map(k => (k, s"n$k", 1L, false)).toDF("k", "name", "v", "is_deleted"),
      snap, Seq("k"), "v", "is_deleted", numBuckets = 2,
      targetBucketBytes = 1L << 20)
    assert(!a1.shouldRebucket, a1.reason)
    assert(a1.numBuckets == 2 && a1.snapshotBytes > 0)
    // grow it far past the 4x hysteresis at the 1 MiB target floor
    // (incompressible md5 payload, ~6 MB on disk): the BATCH RETURN
    // VALUE itself must carry the verdict — no separate advisor call
    val bigBatch = spark.range(1, 12001).toDF("k")
      .withColumn("name", concat((0 until 16).map(i =>
        md5(concat_ws("_", col("k"), lit(i)))): _*))
      .withColumn("v", lit(2L)).withColumn("is_deleted", lit(false))
    val a2 = EventStreams.applyUpsertBatch(
      bigBatch, snap, Seq("k"), "v", "is_deleted", numBuckets = 2,
      targetBucketBytes = 1L << 20)
    assert(a2.shouldRebucket, a2.reason)
    assert(a2.numBuckets == 2 && a2.recommendedBuckets >= 8)
    assert((a2.recommendedBuckets & (a2.recommendedBuckets - 1)) == 0,
      s"recommended count must be a power of two: ${a2.recommendedBuckets}")
    // acting on the advice restores health at the same target size
    EventStreams.rebucket(spark, snap, Seq("k"), a2.recommendedBuckets)
    val a3 = EventStreams.shouldRebucket(spark, snap,
      targetBucketBytes = 1L << 20)
    assert(!a3.shouldRebucket, a3.reason)
    assert(a3.numBuckets == a2.recommendedBuckets)
    // over-bucketing never fires (growth-only contract)
    val a4 = EventStreams.shouldRebucket(spark, snap,
      targetBucketBytes = 1L << 30)
    assert(!a4.shouldRebucket, a4.reason)
  }

  test("lookupUpsertKeys: bucket-pruned point lookup, plan-asserted, tracks updates and rebuckets") {
    import spark.implicits._
    val snap = java.nio.file.Files.createTempDirectory("graft_uplook_").toString + "/state"
    EventStreams.applyUpsertBatch(
      (1L to 200L).map(k => (k, s"n$k", 1L, false)).toDF("k", "name", "v", "is_deleted"),
      snap, Seq("k"), "v", "is_deleted", numBuckets = 16)
    def lookup(ks: Long*): (Map[Long, String], String) = {
      val out = EventStreams.lookupUpsertKeys(spark, snap, Seq("k"), ks.toDF("k"))
      (out.select("k", "name").as[(Long, String)].collect().toMap,
        out.queryExecution.executedPlan.toString)
    }
    // the key IN-list must land INSIDE PartitionFilters (a bare
    // contains("PartitionFilters") passes for any partitioned scan)
    val (r1, plan1) = lookup(3L, 7L, 9999L)
    assert(r1 == Map(3L -> "n3", 7L -> "n7"), s"got $r1") // 9999 absent
    val pf1 = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan1).map(_.group(1))
    assert(pf1.exists(f => f.contains(EventStreams.BucketCol) &&
      f.toUpperCase.contains("IN")),
      s"lookup buckets not in PartitionFilters (got: $pf1):\n$plan1")

    // an update is visible; a tombstone removes the row
    EventStreams.applyUpsertBatch(
      Seq((3L, "three!", 2L, false), (7L, "gone", 2L, true))
        .toDF("k", "name", "v", "is_deleted"),
      snap, Seq("k"), "v", "is_deleted", numBuckets = 16)
    assert(lookup(3L, 7L)._1 == Map(3L -> "three!"))

    // after a rebucket the lookup prunes by the NEW layout
    EventStreams.rebucket(spark, snap, Seq("k"), 64)
    val (r2, plan2) = lookup(3L, 11L)
    assert(r2 == Map(3L -> "three!", 11L -> "n11"))
    val pf2 = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan2).map(_.group(1))
    assert(pf2.exists(f => f.contains(EventStreams.BucketCol) &&
      f.toUpperCase.contains("IN")), s"post-rebucket pruning lost: $pf2")

    // a flat (pre-sink) snapshot has no layout: full-scan semi join,
    // same answers
    val flat = java.nio.file.Files.createTempDirectory("graft_uplookf_").toString + "/state"
    (1L to 50L).map(k => (k, s"f$k", 1L)).toDF("k", "name", "v")
      .write.parquet(flat)
    val out = EventStreams.lookupUpsertKeys(spark, flat, Seq("k"), Seq(5L, 60L).toDF("k"))
    assert(out.select("k", "name").as[(Long, String)].collect().toMap ==
      Map(5L -> "f5"))
  }

  test("upsert fuzz: random batches with interleaved rebuckets ≡ plain changeset fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    val snap = java.nio.file.Files.createTempDirectory("graft_upfuzz_").toString + "/state"
    val bucketChoices = Seq(1, 2, 4, 8, 16, 32)
    // the oracle is the UNBUCKETED merge itself: the invariant under
    // test is that the layout machinery (bucket pruning, per-bucket
    // swaps, restart-parameter indifference, rebuckets at arbitrary
    // points) never changes WHAT the snapshot holds
    var oracle = Seq.empty[(Long, String, Long)].toDF("k", "name", "v")
    (0 until 8).foreach { b =>
      val keys = rnd.shuffle((1L to 60L).toList).take(rnd.nextInt(20) + 5)
      val rows = keys.map(k =>
        (k, s"v${b}_$k", rnd.nextInt(1000).toLong, rnd.nextInt(4) == 0))
      val batch = rows.toDF("k", "name", "v", "is_deleted")
      EventStreams.applyUpsertBatch(batch, snap, Seq("k"), "v", "is_deleted",
        numBuckets = bucketChoices(rnd.nextInt(bucketChoices.size)))
      val want = graft.operators.Merge
        .applyChangeset(oracle, batch, Seq("k"), "v", "is_deleted")
        .as[(Long, String, Long)].collect().toSet
      oracle = want.toSeq.toDF("k", "name", "v")
      if (rnd.nextInt(3) == 0)
        EventStreams.rebucket(spark, snap, Seq("k"),
          bucketChoices(rnd.nextInt(bucketChoices.size)))
      val got = spark.read.parquet(snap).select("k", "name", "v")
        .as[(Long, String, Long)].collect().toSet
      assert(got == want, s"batch $b: snapshot diverged from the plain fold\n" +
        s"  missing: ${(want -- got).take(5)}\n  extra: ${(got -- want).take(5)}")
      // the bucket-pruned lookup agrees with the fold on a random key
      // subset (present, tombstoned, and never-seen keys alike), at
      // every layout the fuzz wanders through
      val probe = Seq.fill(10)(rnd.nextLong(80L) + 1L).distinct
      val looked = EventStreams.lookupUpsertKeys(spark, snap, Seq("k"),
          probe.toDF("k"))
        .select("k", "name", "v").as[(Long, String, Long)].collect().toSet
      assert(looked == want.filter(r => probe.contains(r._1)),
        s"batch $b: lookup diverged for keys $probe")
    }
  }

  test("rebucket crash states: mid-swap promotes the committed new layout; pre-swap staging is discarded") {
    import spark.implicits._
    val snap = java.nio.file.Files.createTempDirectory("graft_rebkt_cr_").toString + "/state"
    def P(s: String) = new org.apache.hadoop.fs.Path(s)
    val hfs = P(snap).getFileSystem(spark.sessionState.newHadoopConf())
    EventStreams.applyUpsertBatch(
      (1L to 50L).map(k => (k, s"n$k", 1L, false)).toDF("k", "name", "v", "is_deleted"),
      snap, Seq("k"), "v", "is_deleted", numBuckets = 8)
    val before = spark.read.parquet(snap)
      .select("k", "name").as[(Long, String)].collect().toSet

    // crash BETWEEN the two swap renames: live retired to old, committed
    // staging not yet promoted — the next batch's entry recovery must
    // promote the NEW layout (which carries its own bucket count)
    val tmp = snap + ".__graft-rebucket-tmp__"
    val old = snap + ".__graft-rebucket-old__"
    EventStreams.rebucket(spark, snap, Seq("k"), 32) // a full successful rebucket...
    assert(spark.read.parquet(snap).count() == 50)
    // ...then rewind to the torn state by hand: stage another rebucket
    // (to 16) and stop between the renames
    val live = spark.read.parquet(snap).drop(EventStreams.BucketCol)
    live.withColumn(EventStreams.BucketCol,
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64($"k"),
          org.apache.spark.sql.functions.lit(16L)).cast("int"))
      .write.partitionBy(EventStreams.BucketCol).parquet(tmp)
    val out = hfs.create(P(s"$tmp/${EventStreams.BucketCountFile}"), true)
    out.write("16\n".getBytes("UTF-8")); out.close()
    assert(hfs.rename(P(snap), P(old))) // first rename done, second never ran
    EventStreams.applyUpsertBatch(
      Seq((51L, "new", 1L, false)).toDF("k", "name", "v", "is_deleted"),
      snap, Seq("k"), "v", "is_deleted", numBuckets = 8)
    val healed = spark.read.parquet(snap).select("k", "name")
      .as[(Long, String)].collect().toSet
    assert(healed == before + ((51L, "new")), s"mid-swap heal lost rows: ${healed.size}")
    assert(!hfs.exists(P(tmp)) && !hfs.exists(P(old)))

    // crash BEFORE the swap (committed staging alone): discarded, old
    // layout intact
    spark.read.parquet(snap).write.parquet(tmp) // any committed dir
    EventStreams.applyUpsertBatch(
      Seq((52L, "newer", 1L, false)).toDF("k", "name", "v", "is_deleted"),
      snap, Seq("k"), "v", "is_deleted", numBuckets = 8)
    assert(!hfs.exists(P(tmp)))
    assert(spark.read.parquet(snap).count() == 52)
  }

  test("recoverBucketSwap restores every crash state of the per-bucket swap") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_bkt_rec_").toString
    val snap = s"$base/state"
    val hfs = new org.apache.hadoop.fs.Path(snap)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def P(s: String) = new org.apache.hadoop.fs.Path(s)
    // seed a live snapshot via the batch entry point
    EventStreams.applyUpsertBatch(
      Seq((1L, "a", 1L, false), (2L, "b", 1L, false))
        .toDF("k", "name", "v", "is_deleted"),
      snap, Seq("k"), "v", "is_deleted", numBuckets = 8)
    val liveState = spark.read.parquet(snap).select("k", "name")
      .as[(Long, String)].collect().toSet

    // crash state A: committed staging, swap never started — recovery
    // promotes the staged bucket (replayed batch then re-merges). The
    // staged bucket number is one no live key occupies, so the expected
    // state is exactly liveState + the staged row.
    val staging = snap + ".__graft-upsert-staging__"
    val liveDirs = hfs.listStatus(P(snap)).filter(_.isDirectory)
      .map(_.getPath.getName).toSet
    val freeBucket = (0 until 8)
      .find(b => !liveDirs.contains(s"${EventStreams.BucketCol}=$b")).get
    Seq((9L, "z", 5L)).toDF("k", "name", "v")
      .withColumn(EventStreams.BucketCol, lit(freeBucket))
      .write.partitionBy(EventStreams.BucketCol).parquet(staging)
    EventStreams.recoverBucketSwap(hfs, P(snap), P(staging),
      P(snap + ".__graft-upsert-old__"), "test")
    assert(!hfs.exists(P(staging)), "staging must be consumed")
    val afterA = spark.read.parquet(snap).select("k", "name")
      .as[(Long, String)].collect().toSet
    assert(afterA == liveState + ((9L, "z")), s"staged bucket not promoted: $afterA")

    // crash state B: bucket retired (target dir moved out), staging gone
    // mid-cleanup — retired-only bucket must be restored, not dropped
    val retired = snap + ".__graft-upsert-old__"
    val dirs = hfs.listStatus(P(snap)).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith(EventStreams.BucketCol))
    val victim = dirs.head
    hfs.mkdirs(P(retired))
    assert(hfs.rename(P(s"$snap/$victim"), P(s"$retired/$victim")))
    EventStreams.recoverBucketSwap(hfs, P(snap), P(staging), P(retired), "test")
    val afterB = spark.read.parquet(snap).select("k", "name")
      .as[(Long, String)].collect().toSet
    assert(afterB == afterA, s"retired bucket lost in recovery: $afterB")
    assert(!hfs.exists(P(retired)))

    // crash state C: torn staging (no _SUCCESS) — discarded, state intact
    hfs.mkdirs(P(s"$staging/${EventStreams.BucketCol}=0"))
    val out = hfs.create(P(s"$staging/${EventStreams.BucketCol}=0/part-garbage.parquet"))
    out.write(Array[Byte](1, 2, 3)); out.close()
    EventStreams.recoverBucketSwap(hfs, P(snap), P(staging), P(retired), "test")
    assert(!hfs.exists(P(staging)), "torn staging must be discarded")
    val afterC = spark.read.parquet(snap).select("k", "name")
      .as[(Long, String)].collect().toSet
    assert(afterC == afterB)
  }

  test("dedupIngestSink admits first occurrences only, within and across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = java.nio.file.Files.createTempDirectory("graft_ingest_").toString + "/corpus"
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.dedupIngestSink(
      input.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text")
    // batch 1: A twice (within-batch dup) + B
    input.addData((1L, "aaa"), (2L, "bbb"), (3L, "aaa"))
    q.processAllAvailable()
    val s1 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    assert(s1 == Set(1L, 2L))
    // batch 2: A again (cross-batch dup, higher id) + new C
    val b2 = Seq((10L, "aaa"), (11L, "ccc"))
    input.addData(b2: _*)
    q.processAllAvailable()
    val s2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    assert(s2 == Set(1L, 2L, 11L))
    // replay of batch 2 (at-least-once) must be absorbed
    input.addData(b2: _*)
    q.processAllAvailable(); q.stop()
    val s3 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    assert(s3 == s2, "replayed batch must not re-admit or duplicate")
  }

  test("dedupIngestSink appends survivor files only — corpus files are never rewritten") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = java.nio.file.Files.createTempDirectory("graft_ingest_app_")
      .toString + "/corpus"
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.dedupIngestSink(
      input.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text")
    input.addData((1L to 2000L).map(i =>
      (i, s"document number $i with enough body text that the corpus " +
        s"outweighs a one-row parquet file's fixed footer overhead")): _*)
    q.processAllAvailable()
    val before = dataFiles(corpus)
    assert(before.nonEmpty)
    // batch 2: one fresh doc + one duplicate → exactly one survivor row
    input.addData((9100L, "a brand new document"),
      (9101L, "document number 7 with enough body text that the corpus " +
        "outweighs a one-row parquet file's fixed footer overhead"))
    q.processAllAvailable()
    val after = dataFiles(corpus)
    // APPEND-ONLY: every pre-batch file survives by identity (same path,
    // same size); the batch added files, never rewrote the corpus
    before.foreach { case (p, sz) =>
      assert(after.get(p).contains(sz), s"corpus file $p was rewritten") }
    assert(after.size > before.size, "survivors must land in new files")
    // per-batch bytes ∝ batch: the appended bytes are a sliver of the
    // corpus, not a second copy of it
    val appended = (after.keySet -- before.keySet).toSeq.map(after).sum
    val corpusBytes = before.values.sum
    assert(appended < corpusBytes / 2,
      s"appended $appended bytes vs corpus $corpusBytes — smells like a rewrite")
    // replay-idempotency still holds with the marker discipline in place
    input.addData((9100L, "a brand new document"))
    q.processAllAvailable(); q.stop()
    val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    assert(ids == (1L to 2000L).toSet + 9100L)
    // external-reader marker: committed after the last append
    assert(new java.io.File(corpus,
      graft.sources.FsSwap.CommitMarker).exists, "commit marker missing")
  }

  test("compactIngestCorpus merges append-grown files and keeps the bloom filter + marker") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = java.nio.file.Files.createTempDirectory("graft_ingest_cmp_")
      .toString + "/corpus"
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.dedupIngestSink(
      input.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text")
    // several trickle batches → one small survivor file each
    (0 until 5).foreach { b =>
      input.addData((b * 10 until b * 10 + 5).map(i =>
        (i.toLong, s"ingest document $i body")): _*)
      q.processAllAvailable()
    }
    q.stop()
    val before = dataFiles(corpus)
    assert(before.size >= 5, s"expected append-grown files, got ${before.size}")
    val rowsBefore = spark.read.parquet(corpus)
      .select("doc_id", "text").as[(Long, String)].collect().toSet

    val (nBefore, nAfter) = EventStreams.compactIngestCorpus(
      spark, corpus, targetFileBytes = 1L << 30)
    assert(nBefore == before.size && nAfter < nBefore,
      s"compaction must shrink the file count: $nBefore -> $nAfter")
    val rowsAfter = spark.read.parquet(corpus)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(rowsAfter == rowsBefore, "compaction must not change content")
    // external-reader marker restored after the rewrite
    assert(new java.io.File(corpus,
      graft.sources.FsSwap.CommitMarker).exists, "commit marker missing after compact")

    // the compacted files still carry the parquet bloom filter on the
    // hash column — the property a generic options-less rewrite sheds
    // (and with it, the pruned anti-join's row-group skipping)
    val conf = spark.sessionState.newHadoopConf()
    dataFiles(corpus).keys.foreach { rel =>
      val p = new org.apache.hadoop.fs.Path(corpus + rel)
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        import scala.jdk.CollectionConverters._
        val offsets = rd.getFooter.getBlocks.asScala.map { blk =>
          blk.getColumns.asScala
            .find(_.getPath.toDotString == EventStreams.HashCol)
            .fold(-1L)(_.getBloomFilterOffset)
        }
        assert(offsets.nonEmpty && offsets.forall(_ >= 0),
          s"compacted file $rel lost the ${EventStreams.HashCol} bloom filter")
      } finally rd.close()
    }

    // and the sink keeps working against the compacted corpus: a
    // duplicate is still rejected, a fresh doc admitted
    val input2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.dedupIngestSink(
      input2.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text")
    input2.addData((900L, "ingest document 0 body"), (901L, "genuinely new text"))
    q2.processAllAvailable(); q2.stop()
    val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    assert(ids == rowsBefore.map(_._1) + 901L,
      s"post-compact ingest must dedup against compacted corpus: $ids")
  }

  test("ingestSurvivors pushes the batch's hash set into the corpus scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_prune_")
      .toString + "/corpus"
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .withColumn(EventStreams.HashCol,
        org.apache.spark.sql.functions.xxhash64($"text"))
      .write.parquet(dir)
    val batch = Seq((3L, "alpha"), (4L, "gamma")).toDF("doc_id", "text")
      .withColumn(EventStreams.HashCol,
        org.apache.spark.sql.functions.xxhash64($"text"))
    val survivors = EventStreams.ingestSurvivors(batch, dir, "text")
    // the corpus scan must carry the batch hashes as a PUSHED In filter
    // (bloom/stats row-group skipping at scale — reads ∝ duplicate
    // hits, not corpus size), not scan the corpus unfiltered
    val plan = survivors.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains(s"In(${EventStreams.HashCol}"),
      s"batch-hash In predicate not pushed to the corpus scan:\n$plan")
    assert(survivors.select("doc_id").as[Long].collect().toSet == Set(4L),
      "duplicate of corpus text must not survive; fresh text must")
  }

  test("semanticIngestSink: near-dup rejection against the persisted sketch sidecar") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_nd_ingest_").toString
    val corpus = s"$base/corpus"
    val sketches = s"$base/sketches"
    val cfg = graft.operators.Dedup.MinHashConfig(numHashes = 64, bands = 32)
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.semanticIngestSink(
      input.toDF().toDF("doc_id", "text"), corpus, sketches,
      "doc_id", "text", cfg, exactThreshold = 0.5)
    val a = "the quick brown fox jumps over the lazy dog and runs far away home"
    val b = "completely different content about spark shuffles and partition pruning"
    input.addData((1L, a), (2L, b))
    q.processAllAvailable()
    // batch 2: a near-duplicate of A (one appended word) and a fresh doc
    input.addData((10L, a + " tonight"),
      (11L, "a third document with nothing in common with the others at all"))
    q.processAllAvailable(); q.stop()
    val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 11L), s"near-dup must be rejected, fresh admitted: $ids")
    // the sidecar tracks the corpus exactly — ids match, and the sketch
    // bytes are a small fraction of corpus bytes (the at-scale point)
    val skIds = graft.operators.SketchSidecar.sketchedIds(spark, sketches).select("id").as[Long].collect().toSet
    assert(skIds == ids, s"sketch sidecar out of sync: $skIds vs $ids")
  }

  test("semanticIngestSink heals a torn sketch sidecar before pairing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_nd_heal_").toString
    val corpus = s"$base/corpus"
    val sketches = s"$base/sketches"
    val cfg = graft.operators.Dedup.MinHashConfig(numHashes = 64, bands = 32)
    val a = "the quick brown fox jumps over the lazy dog and runs far away home"
    def run(data: Seq[(Long, String)]): Unit = {
      val input = MemoryStream[(Long, String)]
      val q = EventStreams.semanticIngestSink(
        input.toDF().toDF("doc_id", "text"), corpus, sketches,
        "doc_id", "text", cfg, exactThreshold = 0.5)
      input.addData(data: _*)
      q.processAllAvailable(); q.stop()
    }
    run(Seq((1L, a)))
    // simulate the crash window: docs landed, sketch append lost
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRec)); f.delete(); ()
    }
    deleteRec(new java.io.File(sketches))
    // next batch must re-sketch the orphaned corpus rows and still
    // reject a near-duplicate of the PRE-TEAR doc
    run(Seq((10L, a + " tonight"), (11L, "fresh unrelated content here")))
    val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 11L), s"healed sidecar must still reject near-dups: $ids")
    val skIds = graft.operators.SketchSidecar.sketchedIds(spark, sketches).select("id").as[Long].collect().toSet
    assert(skIds == ids, s"healed sidecar out of sync: $skIds vs $ids")
  }

  test("semanticIngestSink heals a PARTIAL sidecar tear (row-count probe, not full rebuild)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_nd_ptear_").toString
    val corpus = s"$base/corpus"
    val sketches = s"$base/sketches"
    val cfg = graft.operators.Dedup.MinHashConfig(numHashes = 64, bands = 32)
    val a = "the quick brown fox jumps over the lazy dog and runs far away home"
    val b = "completely different second document with its own words entirely"
    def run(data: Seq[(Long, String)]): Unit = {
      val input = MemoryStream[(Long, String)]
      val q = EventStreams.semanticIngestSink(
        input.toDF().toDF("doc_id", "text"), corpus, sketches,
        "doc_id", "text", cfg, exactThreshold = 0.5)
      input.addData(data: _*)
      q.processAllAvailable(); q.stop()
    }
    run(Seq((1L, a)))
    // simulate the exact crash window mid-stream: a later batch's corpus
    // append COMMITTED but its sketch append was lost — doc 2 is in the
    // corpus with no sketch row, doc 1's sketch survives
    Seq((2L, b)).toDF("doc_id", "text")
      .write.mode("append").parquet(corpus)
    // next batch must detect the tear from row counts alone, re-sketch
    // ONLY the orphaned row, and reject near-dups of BOTH prior docs
    run(Seq((10L, a + " tonight"), (11L, b + " again"), (12L, "fresh unrelated content here")))
    val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 12L), s"partial heal must reject dups of both prior docs: $ids")
    val skIds = graft.operators.SketchSidecar.sketchedIds(spark, sketches).select("id").as[Long].collect().toSet
    assert(skIds == ids, s"healed sidecar out of sync: $skIds vs $ids")
    // the heal appended exactly one sketch row (doc 2), not a rebuild
    assert(graft.operators.SketchSidecar.setsCount(spark, sketches) == 3)
  }

  test("upsertSink crash recovery: completed staging is promoted, torn staging is discarded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // scenario: crash BETWEEN the two swap renames — retired dir exists,
    // target missing, staging fully committed (_SUCCESS). Recovery must
    // promote staging, not rebuild from one batch.
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_rec_").toString
    val snap = s"$base/state"
    Seq((1L, "pre", 1.0, 0L)).toDF("k", "name", "price", "v")
      .write.parquet(snap + ".__graft-upsert-staging__")
    new java.io.File(snap + ".__graft-upsert-old__").mkdirs()
    val input = MemoryStream[(Long, String, Double, Long, Boolean)]
    val q = EventStreams.upsertSink(
      input.toDF().toDF("k", "name", "price", "v", "is_deleted"),
      snap, Seq("k"), "v")
    input.addData((2L, "b", 2.0, 1L, false))
    q.processAllAvailable(); q.stop()
    val state = spark.read.parquet(snap).select("k", "name", "price", "v")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(state == Set((1L, "pre", 1.0, 0L), (2L, "b", 2.0, 1L)),
      s"recovered staging rows must survive into the merged state, got $state")
    assert(!new java.io.File(snap + ".__graft-upsert-old__").exists())

    // scenario: torn staging (no _SUCCESS), no target — must be
    // discarded, not promoted as authoritative state
    val snap2 = s"$base/state2"
    val torn = new java.io.File(snap2 + ".__graft-upsert-staging__")
    torn.mkdirs()
    java.nio.file.Files.write(new java.io.File(torn, "part-00000.parquet").toPath,
      Array[Byte](1, 2, 3)) // truncated garbage, and no _SUCCESS marker
    val input2 = MemoryStream[(Long, String, Double, Long, Boolean)]
    val q2 = EventStreams.upsertSink(
      input2.toDF().toDF("k", "name", "price", "v", "is_deleted"),
      snap2, Seq("k"), "v")
    input2.addData((7L, "x", 7.0, 1L, false))
    q2.processAllAvailable(); q2.stop()
    val state2 = spark.read.parquet(snap2).select("k", "name", "price", "v")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(state2 == Set((7L, "x", 7.0, 1L)), s"torn staging must not poison state, got $state2")
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.runningUserTotals(input.toDS(), idleTimeout = None)
      .writeStream.outputMode("append").format("memory").queryName("state_out").start()
    input.addData(events.take(3): _*)
    q.processAllAvailable()
    input.addData(events.drop(3): _*)
    q.processAllAvailable(); q.stop()
    val rows = spark.table("state_out")
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSeq
    // second batch reflects state carried from the first
    assert(rows.contains((100L, 2L, 3.0)))   // after batch 1
    assert(rows.contains((100L, 3L, 7.0)))   // after batch 2 (state kept)
    assert(rows.contains((200L, 2L, 8.0)))
  }

  test("streaming dedup drops repeated keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupedEvents(input.toDF(), Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    input.addData(events.head, events.head, events(1))   // event 1 duplicated
    q.processAllAvailable()
    input.addData(events.head)                            // dup again, later batch
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L))
  }

  test("streaming content dedup collapses identical/word-permuted docs by simhash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.dedupedByContent(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts")
      .writeStream.outputMode("append").format("memory").queryName("cdedup_out").start()
    input.addData(
      (1L, ts(0), "the quick brown fox"),
      (2L, ts(1), "the quick brown fox"),      // exact re-crawl → dropped
      (3L, ts(2), "fox brown quick the"),      // word permutation → same simhash → dropped
      (4L, ts(3), "completely different text"),
      (6L, ts(3), ""),                          // token-free: passes through...
      (7L, ts(3), " \t "))                      // ...and does NOT dedup against other empties
    q.processAllAvailable()
    input.addData((5L, ts(4), "the quick brown fox"))  // later-batch dup → state kept
    q.processAllAvailable(); q.stop()
    val ids = spark.table("cdedup_out").select("doc_id").as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 4L, 6L, 7L), s"kept $ids")
  }

  test("content dedup survivor is MIN id, independent of arrival order") {
    // the round-14 determinism contract: within the first batch that
    // carries a signature, the survivor is the minimum id — not the
    // first arrival — so the batch-mode gate is oracle-expressible
    // (row_number() OVER (PARTITION BY sig ORDER BY id) = 1)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.dedupedByContent(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("cdedup_min_out").start()
    input.addData(
      (9L, ts(0), "alpha beta gamma"),   // larger id arrives FIRST
      (3L, ts(1), "alpha beta gamma"),   // min id arrives later, same batch
      (7L, ts(2), "alpha beta gamma"))
    q.processAllAvailable()
    input.addData((1L, ts(3), "alpha beta gamma"))  // later batch: smaller id
    q.processAllAvailable(); q.stop()
    val ids = spark.table("cdedup_min_out").select("doc_id")
      .as[Long].collect().toSeq
    // batch-1 min (3) survives; the later-batch smaller id (1) is a
    // DUPLICATE of an already-emitted signature (append mode cannot
    // retract), exactly dropDuplicatesWithinWatermark's horizon rule
    assert(ids == Seq(3L), s"kept $ids")
  }

  test("content dedup in BATCH execution = min id per signature group") {
    // unified-semantics check backing the stream_dedup_content oracle:
    // on a batch frame the whole input is one invocation per key, so
    // the emission is exactly min-id per signature group
    import spark.implicits._
    val docs = Seq(
      (10L, ts(0), "the quick brown fox"),
      (2L, ts(1), "the quick brown fox"),   // min of the group, mid-frame
      (6L, ts(2), "fox brown quick the"),   // permutation → same simhash
      (4L, ts(3), "another doc entirely"),
      (8L, ts(4), ""),                       // degenerate: passes through
      (9L, ts(5), null.asInstanceOf[String]))
      .toDF("doc_id", "ts", "text")
    val kept = EventStreams.dedupedByContent(docs, "doc_id", "text", "ts")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(2L, 4L, 8L, 9L), s"kept $kept")
  }

  test("curation expressions run unchanged under Structured Streaming") {
    // the curation tier is stateless column expressions (incl. the
    // native TextStats/WordChunks), so the SAME operators apply to a
    // readStream frame — this pins that no operator silently grew a
    // batch-only dependency (count(), window without watermark, ...)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val curated = graft.operators.Curation.withPii(
      graft.operators.TextAnalysis.withQuality(df, "text"), "text")
      .withColumn("chunks",
        graft.functions.TextFunctions.wordChunks($"text", 4, 3))
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("cur_out").start()
    input.addData((1L, "mail bob@x.io about the 10.0.0.1 box"), (2L, "plain text"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("cur_out")
      .select("doc_id", "n_emails", "n_ipv4", "n_chars", "text_redacted", "chunks")
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getLong(1) == 1L && rows(0).getLong(2) == 1L)
    assert(rows(0).getString(4) == "mail <EMAIL> about the <IP> box")
    assert(rows(0).getSeq[String](5).head == "mail bob@x.io about the")
    assert(rows(1).getLong(1) == 0L)
  }

  test("same windowed-aggregation code runs in batch mode (unified semantics)") {
    import spark.implicits._
    val batch = events.toDF()
    val out = EventStreams.windowedCounts(batch, "5 minutes")
      .select("event_type", "n").as[(String, Long)].collect().toMap
    assert(out("click") == 2L || out("click") == 1L) // per-window rows exist
    assert(EventStreams.sessionized(batch).count() >= 3)
  }

  test("spreadBatch: bulk batch spreads to cluster width, trickle passes through") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_spread").toString
    // incompressible payload, compression off: one ~12 MB file (> the
    // 8 MB bulk threshold) that the file source delivers as ONE
    // partition — the exact shape the fix targets
    spark.range(100000)
      .select($"id", (0 until 4).map(i =>
        md5(concat_ws("_", $"id", lit(i)))).reduce(concat(_, _)).as("s"))
      .coalesce(1)
      .write.option("compression", "uncompressed").parquet(s"$dir/bulk")
    // pin the one-partition arrival shape (the splitter would divide
    // 12 MB by bytesPerCore here; a real micro-batch arrives unsplit)
    val bulk = spark.read.parquet(s"$dir/bulk").coalesce(1)
    assert(bulk.rdd.getNumPartitions == 1)
    val spread = EventStreams.spreadBatch(bulk)
    assert(spread.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // content preserved exactly (round-robin shuffle only)
    assert(spread.count() == 100000L)
    assert(spread.agg(sum(crc32($"s")), sum($"id")).collect().toSeq ==
      bulk.agg(sum(crc32($"s")), sum($"id")).collect().toSeq)

    // trickle: under the byte threshold -> identity, arrival
    // partitioning (and the frame itself) untouched
    spark.range(100).select($"id", md5(concat_ws("_", $"id")).as("s"))
      .coalesce(1).write.parquet(s"$dir/trickle")
    val trickle = spark.read.parquet(s"$dir/trickle")
    assert(EventStreams.spreadBatch(trickle) eq trickle)

    // already-wide bulk frame: no extra shuffle on top
    val wide = bulk.repartition(spark.sparkContext.defaultParallelism)
    assert(EventStreams.spreadBatch(wide) eq wide)
  }
}
