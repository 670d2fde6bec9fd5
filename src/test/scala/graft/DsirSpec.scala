package graft

import java.security.MessageDigest

import graft.operators.Dsir
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Raw corpus: even docs draw from the "clean" family, odd from the
    * "junk" family, all share filler. */
  private def raw(n: Int): DataFrame =
    (0 until n).map { i =>
      val fam = if (i % 2 == 0) Seq("clean", "prose", "cited")
                else Seq("zzz", "clickbait", "spam")
      (i.toLong, (fam ++ Seq("filler", s"w${i % 7}", "common")).mkString(" "))
    }.toDF("doc_id", "text")

  private def target(n: Int): DataFrame =
    (0 until n).map(i =>
      (1000L + i, s"clean prose cited common w${i % 7}")).toDF("doc_id", "text")

  // ---- plain-Scala reference implementation (exact) ----
  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucketOf(feature: String, buckets: Int): Long = {
    val v = md5hex(feature).take(6).foldLeft(0L)((acc, c) =>
      acc * 16 + Character.digit(c, 16))
    ((v % buckets) + buckets) % buckets
  }

  private def feats(text: String): Seq[String] = {
    val w = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def refWeights(rawRows: Seq[(Long, String)], tgtRows: Seq[(Long, String)],
      buckets: Int, k: Double): Map[Long, (Long, Double)] = {
    def counts(rows: Seq[(Long, String)]): Map[Long, Long] =
      rows.flatMap(r => feats(r._2)).groupBy(bucketOf(_, buckets))
        .map { case (b, fs) => b -> fs.size.toLong }
    val cp = counts(tgtRows); val cq = counts(rawRows)
    val tp = cp.values.sum.toDouble; val tq = cq.values.sum.toDouble
    def llr(b: Long): Double =
      math.log((cp.getOrElse(b, 0L) + k) / (tp + k * buckets)) -
        math.log((cq.getOrElse(b, 0L) + k) / (tq + k * buckets))
    rawRows.map { case (id, t) =>
      val fs = feats(t)
      id -> (fs.size.toLong, fs.map(f => llr(bucketOf(f, buckets))).sum)
    }.toMap
  }

  private def refGumbel(id: Long, tag: String): Double = {
    val b = md5hex(id.toString + tag).take(6).foldLeft(0L)((acc, c) =>
      acc * 16 + Character.digit(c, 16)) % 1048576L
    val u = (b + 0.5) / 1048576.0
    -math.log(-math.log(u))
  }

  test("importance weights match a plain-Scala reference exactly") {
    val rawRows = (0 until 30).map(i =>
      (i.toLong, raw(30).collect()(i).getString(1))) // same synth text
    val rawDf = raw(30)
    val tgtDf = target(10)
    val tgtRows = (0 until 10).map(i => (1000L + i, s"clean prose cited common w${i % 7}"))
    for (buckets <- Seq(64, 4096); k <- Seq(1.0, 0.25)) {
      val got = Dsir.importanceWeights(rawDf, "doc_id", "text", tgtDf, "text",
          buckets = buckets, smoothing = k)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val want = refWeights(rawRows, tgtRows, buckets, k)
      assert(got.keySet == want.keySet)
      got.foreach { case (id, (n, w)) =>
        assert(n == want(id)._1, s"n_features mismatch at $id (B=$buckets)")
        val ww = want(id)._2
        assert(math.abs(w - ww) <= math.max(1e-12, math.abs(ww) * 1e-12),
          s"log_w drift at $id (B=$buckets, k=$k): $w vs $ww")
      }
    }
  }

  test("resample prefers target-like docs; gumbel key matches the reference draw") {
    val rawDf = raw(60)
    val got = Dsir.dsirResample(rawDf, "doc_id", "text", target(12), "text",
      k = 20, buckets = 256).collect()
    assert(got.length == 20)
    val ids = got.map(_.getLong(0)).toSet
    assert(ids.count(_ % 2 == 0) >= 16,
      s"resample should prefer the clean family: $ids")
    // gumbel_key − log_w is exactly the deterministic noise draw
    got.foreach { r =>
      val noise = r.getDouble(3) - r.getDouble(2)
      val want = refGumbel(r.getLong(0), "#dsir")
      assert(math.abs(noise - want) <= math.max(1e-12, math.abs(want) * 1e-12),
        s"noise drift at ${r.getLong(0)}: $noise vs $want")
    }
    // ranks are 1..k, ordered by key desc
    assert(got.map(_.getLong(4)).sorted.toSeq == (1L to 20L))
    val byRank = got.sortBy(_.getLong(4)).map(_.getDouble(3))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("zero-feature docs carry log_w 0 and stay eligible through the noise") {
    val rawDf = Seq((1L, ""), (2L, "   "), (3L, "clean prose"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(rawDf, "doc_id", "text", target(5), "text",
        buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w(1L) == ((0L, 0.0)) && w(2L) == ((0L, 0.0)))
    assert(w(3L)._1 == 3L) // 2 unigrams + 1 bigram
    val picked = Dsir.dsirResample(rawDf, "doc_id", "text", target(5), "text",
      k = 3, buckets = 64).collect()
    assert(picked.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("a different saltTag is an independent draw; same tag is deterministic") {
    val rawDf = raw(40)
    def sel(tag: String): Seq[Long] =
      Dsir.dsirResample(rawDf, "doc_id", "text", target(8), "text",
        k = 10, buckets = 256, saltTag = tag)
        .orderBy("rank").collect().map(_.getLong(0)).toSeq
    val a1 = sel("#a"); val a2 = sel("#a"); val b = sel("#b")
    assert(a1 == a2, "same tag must replay identically")
    assert(a1 != b, "different tags should perturb the selection")
  }

  test("model join broadcasts; no corpus re-join, no cartesian") {
    val plan = Dsir.importanceWeights(raw(30), "doc_id", "text", target(8),
      "text", buckets = 256).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"model join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"scoring must not sort-merge-join the corpus:\n$plan")
  }

  test("bucket/smoothing validation") {
    val e = intercept[IllegalArgumentException] {
      Dsir.importanceWeights(raw(4), "doc_id", "text", target(2), "text",
        buckets = 100)
    }
    assert(e.getMessage.contains("power of two"))
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(raw(4), "doc_id", "text", target(2), "text",
        smoothing = 0.0)
    }
  }
}
