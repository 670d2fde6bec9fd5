package graft

import graft.operators.{Bm25Index, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Bm25IndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/idx"

  /** Deterministic corpus with shared + rare vocabulary, varied dl. */
  private def corpus(n: Int, start: Long = 0L): DataFrame =
    (0 until n).map { i =>
      val id = start + i
      val words = Seq.tabulate(1 + (i % 7))(j => s"w${(i + j) % 11}") ++
        (if (i % 5 == 0) Seq(s"rare$id") else Nil) ++
        (if (i % 3 == 0) Seq("common", "common") else Seq("common"))
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")

  private val queriesDf =
    Seq((10L, "w1 common"), (20L, "rare5 w3"), (30L, "w0 w4 rare10"),
      (40L, "absentterm")).toDF("qid", "q")

  private def collectTopK(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("query_id", "rank", "id", "score")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def assertSameRanking(got: Seq[(Long, Long, Long, Double)],
      want: Seq[(Long, Long, Long, Double)]): Unit = {
    assert(got.map(r => (r._1, r._2, r._3)) == want.map(r => (r._1, r._2, r._3)),
      s"rankings differ:\n got=$got\nwant=$want")
    got.zip(want).foreach { case (g, w) =>
      // shared scoring expressions; only the per-(query,doc) SUM order
      // may differ between plans, so compare to float-noise tolerance
      assert(math.abs(g._4 - w._4) <= math.max(1e-12, math.abs(w._4) * 1e-12),
        s"score drift at ${(g._1, g._3)}: ${g._4} vs ${w._4}")
    }
  }

  test("build + query ≡ the ad-hoc bm25TopK, including rounded-rank mode") {
    val docs = corpus(60)
    val path = tmp("graft_bm25_eq")
    Bm25Index.buildBm25Index(docs, "doc_id", "text", path)
    val want = collectTopK(TextAnalysis.bm25TopK(
      docs, "doc_id", "text", queriesDf, "qid", "q", k = 4, rankRoundDp = 6))
    val got = collectTopK(Bm25Index.queryBm25Index(
      spark, path, queriesDf, "qid", "q", k = 4, rankRoundDp = 6))
    assert(want.nonEmpty)
    assertSameRanking(got, want)
    // unseen-term query yields no rows, not zero-score rows
    assert(!got.exists(_._1 == 40L))
  }

  test("append is EXACT: build(A) + append(B) ≡ build(A ∪ B)") {
    val a = corpus(40)
    val b = corpus(25, start = 1000L)
    val incPath = tmp("graft_bm25_inc")
    val fullPath = tmp("graft_bm25_full")
    Bm25Index.buildBm25Index(a, "doc_id", "text", incPath)
    assert(Bm25Index.appendToBm25Index(b, "doc_id", "text", incPath) == 25L)
    Bm25Index.buildBm25Index(a.unionByName(b), "doc_id", "text", fullPath)
    val inc = collectTopK(Bm25Index.queryBm25Index(
      spark, incPath, queriesDf, "qid", "q", k = 5, rankRoundDp = 6))
    val full = collectTopK(Bm25Index.queryBm25Index(
      spark, fullPath, queriesDf, "qid", "q", k = 5, rankRoundDp = 6))
    assertSameRanking(inc, full)
  }

  test("probe prunes at the row-group level: term In-list pushed, rows decoded ≪ postings") {
    // multi-segment layout: each trickle segment is one sorted bloomed
    // file; the probe term exists in exactly one of them, so every
    // other file's row group fails the bloom/min-max check and decodes
    // nothing (at unit scale a single file is a single row group — the
    // skip unit IS the segment file)
    val path = tmp("graft_bm25_prune")
    Bm25Index.buildBm25Index(corpus(2000), "doc_id", "text", path)
    (0 until 3).foreach { i =>
      Bm25Index.appendToBm25Index(corpus(500, start = 10000L + i * 1000),
        "doc_id", "text", path)
    }
    val out = Bm25Index.queryBm25Index(spark, path,
      Seq((1L, "rare11105")).toDF("qid", "q"), "qid", "q", k = 3)
    // execute THIS frame's QueryExecution, then read its scan metrics.
    // The probe plan has joins → AQE wraps it, and plan.collect does
    // not descend into query stages — recurse explicitly
    out.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match { case f: FileSourceScanExec => Seq(f); case _ => Nil }
      val sub = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      here ++ sub.flatMap(scansOf)
    }
    val scans = scansOf(out.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    // identify the postings scan by its schema (tf column) — scan
    // toStrings truncate the file location
    val postingsScans = scans.filter(_.output.exists(_.name == "tf"))
    assert(postingsScans.nonEmpty, "no postings scan in the probe plan")
    postingsScans.foreach { f =>
      val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(f.toString).map(_.group(1)).getOrElse("")
      // a 1-term In folds to EqualTo — either way the term list reached
      // the parquet reader
      assert(pushed.contains("In(term") || pushed.contains("EqualTo(term"),
        s"term list must push to the parquet reader (got: $pushed)")
    }
    // the build coalesced... corpus(2000) > trickle floor? 2000 docs is
    // under BulkSegmentDocs (16k): one sorted file; min/max + bloom on
    // the sorted layout still skip row groups for a single rare term
    val totalPostings = spark.read.parquet(s"$path/postings").count()
    val decoded = postingsScans.map(_.metrics("numOutputRows").value).sum
    assert(decoded < totalPostings / 2,
      s"1-term probe decoded $decoded of $totalPostings posting rows")
  }

  test("query-term sets over the In cap fall back to the semi join, same answers") {
    val docs = corpus(60)
    val path = tmp("graft_bm25_cap")
    Bm25Index.buildBm25Index(docs, "doc_id", "text", path)
    // > MaxInTerms distinct terms, mostly absent from the corpus
    val wide = (0 until 130).map(i => s"t$i").mkString(" ") + " w1 common"
    val want = collectTopK(TextAnalysis.bm25TopK(
      docs, "doc_id", "text", Seq((7L, wide)).toDF("qid", "q"),
      "qid", "q", k = 4, rankRoundDp = 6))
    val got = collectTopK(Bm25Index.queryBm25Index(
      spark, path, Seq((7L, wide)).toDF("qid", "q"),
      "qid", "q", k = 4, rankRoundDp = 6))
    assertSameRanking(got, want)
  }

  test("fuzz: random corpora and random build/append splits ≡ the ad-hoc scorer") {
    val rnd = new scala.util.Random(20260815L)
    for (round <- 0 until 3) {
      val n = 30 + rnd.nextInt(40)
      val docs = (0 until n).map { i =>
        val words = Seq.fill(1 + rnd.nextInt(12))(s"w${rnd.nextInt(15)}")
        (i.toLong, words.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val cut = 1 + rnd.nextInt(n - 1)
      val path = tmp(s"graft_bm25_fuzz$round")
      Bm25Index.buildBm25Index(df.filter(col("doc_id") < cut), "doc_id", "text", path)
      Bm25Index.appendToBm25Index(df.filter(col("doc_id") >= cut), "doc_id", "text", path)
      val qs = Seq.tabulate(3)(q =>
        (q.toLong, Seq.fill(1 + rnd.nextInt(3))(s"w${rnd.nextInt(18)}").mkString(" ")))
        .toDF("qid", "q") // some query terms absent from the corpus
      val want = collectTopK(TextAnalysis.bm25TopK(
        df, "doc_id", "text", qs, "qid", "q", k = 5, rankRoundDp = 6))
      val got = collectTopK(Bm25Index.queryBm25Index(
        spark, path, qs, "qid", "q", k = 5, rankRoundDp = 6))
      assertSameRanking(got, want)
    }
  }

  test("compaction crash: marker stays down until re-run completes; answers restored") {
    val path = tmp("graft_bm25_crash")
    Bm25Index.buildBm25Index(corpus(40), "doc_id", "text", path)
    (0 until 2).foreach { i =>
      Bm25Index.appendToBm25Index(corpus(10, start = 3000L + i * 100),
        "doc_id", "text", path)
    }
    val before = collectTopK(Bm25Index.queryBm25Index(
      spark, path, queriesDf, "qid", "q", k = 5, rankRoundDp = 6))
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // simulate a compaction killed right after its prologue: sentinel
    // down, commit marker removed, stores untouched
    fs.create(new org.apache.hadoop.fs.Path(root, "_graft_compact_inprogress"), true).close()
    graft.sources.FsSwap.beginArtifact(fs, root)
    // readers must refuse the torn index
    intercept[java.io.IOException] {
      Bm25Index.queryBm25Index(spark, path, queriesDf, "qid", "q", k = 2)
    }
    // re-running compaction (sentinel present → committed check skipped)
    // finishes the job and re-marks
    val (b, a) = Bm25Index.compactBm25Index(spark, path)
    assert(a <= b)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_graft_compact_inprogress")))
    val after = collectTopK(Bm25Index.queryBm25Index(
      spark, path, queriesDf, "qid", "q", k = 5, rankRoundDp = 6))
    assert(after == before, "recovered compaction changed query results")
  }

  test("torn build/append refuses loudly; compaction shrinks files and preserves answers") {
    val docs = corpus(50)
    val path = tmp("graft_bm25_maint")
    Bm25Index.buildBm25Index(docs, "doc_id", "text", path)
    (0 until 3).foreach { i =>
      Bm25Index.appendToBm25Index(corpus(10, start = 2000L + i * 100),
        "doc_id", "text", path)
    }
    val before = collectTopK(Bm25Index.queryBm25Index(
      spark, path, queriesDf, "qid", "q", k = 5, rankRoundDp = 6))
    // torn state: marker absent → reader refuses
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(path, graft.sources.FsSwap.CommitMarker)
    fs.delete(marker, false)
    intercept[java.io.IOException] {
      Bm25Index.queryBm25Index(spark, path, queriesDf, "qid", "q", k = 2)
    }
    // restore (as a finished append would) and compact
    graft.sources.FsSwap.commitArtifact(fs,
      new org.apache.hadoop.fs.Path(path), "restored")
    val (filesBefore, filesAfter) = Bm25Index.compactBm25Index(spark, path)
    assert(filesAfter < filesBefore,
      s"compaction did not shrink files: $filesBefore -> $filesAfter")
    val after = collectTopK(Bm25Index.queryBm25Index(
      spark, path, queriesDf, "qid", "q", k = 5, rankRoundDp = 6))
    assert(after == before, "compaction changed query results")
  }
}
