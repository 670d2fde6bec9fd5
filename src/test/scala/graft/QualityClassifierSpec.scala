package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Two vocabularies with some shared words — "good" docs draw from
    * clean tokens, "bad" docs from junk tokens. */
  private def corpus(n: Int): DataFrame =
    (0 until n).map { i =>
      val good = i % 2 == 0
      val base = if (good) Seq("the", "data", "pipeline", "scales")
                 else Seq("zzz", "spam", "click", "xx")
      val shared = Seq("common", s"w${i % 5}")
      (i.toLong, (base ++ shared ++ base.take(1 + i % 3)).mkString(" "), good)
    }.toDF("doc_id", "text", "label")

  /** Plain-Scala reference NB over the same corpus — exact floats. */
  private def referenceLogits(rows: Seq[(Long, String, Boolean)],
      vocabSize: Int, k: Double): Map[Long, (Long, Double)] = {
    def toks(s: String): Seq[String] =
      s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val counts = scala.collection.mutable.Map[String, (Long, Long)]()
    rows.foreach { case (_, t, lbl) =>
      toks(t).foreach { w =>
        val (p, n) = counts.getOrElse(w, (0L, 0L))
        counts(w) = if (lbl) (p + 1, n) else (p, n + 1)
      }
    }
    val vocab = counts.toSeq
      .sortBy { case (w, (p, n)) => (-(p + n), w) }.take(vocabSize)
    val tPos = vocab.map(_._2._1).sum.toDouble
    val tNeg = vocab.map(_._2._2).sum.toDouble
    val v = vocab.size.toDouble
    def lpDiff(p: Long, n: Long): Double =
      math.log((p + k) / (tPos + k * (v + 1))) -
        math.log((n + k) / (tNeg + k * (v + 1)))
    val model = vocab.map { case (w, (p, n)) => w -> lpDiff(p, n) }.toMap
    val oov = lpDiff(0, 0)
    val nPos = rows.count(_._3).toDouble
    val nNeg = rows.size - nPos
    val prior = math.log(nPos / (nPos + nNeg)) - math.log(nNeg / (nPos + nNeg))
    rows.map { case (id, t, _) =>
      val ws = toks(t)
      id -> (ws.size.toLong, prior + ws.map(w => model.getOrElse(w, oov)).sum)
    }.toMap
  }

  test("matches a plain-Scala reference implementation, cap + OOV included") {
    val rows = (0 until 40).map { i =>
      val good = i % 2 == 0
      val words = (if (good) Seq("data", "clean", "text") else Seq("junk", "spam")) ++
        Seq("shared", s"only$i") // per-doc unique words fall out of any small cap
      (i.toLong, words.mkString(" "), good)
    }
    val df = rows.toDF("doc_id", "text", "label")
    for (vocabSize <- Seq(3, 6, 1000); k <- Seq(1.0, 0.5)) {
      val model = QualityClassifier.trainNbQuality(df, "label", "text",
        vocabSize = vocabSize, smoothing = k)
      val got = QualityClassifier.scoreNbQuality(df, "doc_id", "text", model)
        .select("doc_id", "n_tokens", "logit")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val want = referenceLogits(rows, vocabSize, k)
      assert(got.keySet == want.keySet)
      got.foreach { case (id, (n, logit)) =>
        assert(n == want(id)._1, s"n_tokens mismatch at $id (V=$vocabSize)")
        val w = want(id)._2
        assert(math.abs(logit - w) <= math.max(1e-12, math.abs(w) * 1e-12),
          s"logit drift at doc $id (V=$vocabSize, k=$k): $logit vs $w")
      }
    }
  }

  test("separates the classes it was trained on; scoring is deterministic") {
    val df = corpus(60)
    val model = QualityClassifier.trainNbQuality(df, "label", "text")
    val scored = QualityClassifier.scoreNbQuality(df, "doc_id", "text", model)
      .join(df.select("doc_id", "label"), "doc_id")
    val byLabel = scored.groupBy("label").agg(avg("logit").as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(byLabel(true) > 0 && byLabel(false) < 0,
      s"training data should separate: $byLabel")
    val again = QualityClassifier.scoreNbQuality(df, "doc_id", "text", model)
      .select("doc_id", "logit").as[(Long, Double)].collect().sortBy(_._1)
    val first = scored.select("doc_id", "logit")
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(again.sameElements(first))
  }

  test("zero-token and held-out docs: prior-only logit, n_tokens 0; OOV-only docs score") {
    val train = corpus(30)
    val model = QualityClassifier.trainNbQuality(train, "label", "text")
    val score = Seq((100L, ""), (101L, "   "), (102L, "neverseen tokens here"))
      .toDF("doc_id", "text")
    val got = QualityClassifier.scoreNbQuality(score, "doc_id", "text", model)
      .select("doc_id", "n_tokens", "logit")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(100L)._1 == 0L && got(101L)._1 == 0L)
    assert(got(100L)._2 == got(101L)._2) // both exactly the prior
    assert(got(102L)._1 == 3L)
    assert(!got(102L)._2.isNaN && !got(102L)._2.isInfinite)
  }

  test("model joins broadcast; per-doc sum is a two-phase aggregate") {
    val df = corpus(40)
    val model = QualityClassifier.trainNbQuality(df, "label", "text", vocabSize = 8)
    val plan = QualityClassifier.scoreNbQuality(df, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"model join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian allowed:\n$plan")
    // explode_outer keeps zero-token docs through the aggregate — the
    // corpus must never re-join itself (one corpus shuffle total)
    assert(!plan.contains("SortMergeJoin"),
      s"scoring must not sort-merge-join the corpus:\n$plan")
  }

  test("non-boolean label column is rejected at composition time") {
    val df = Seq((1L, "a b", 1)).toDF("doc_id", "text", "label")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.trainNbQuality(df, "label", "text")
    }
    assert(e.getMessage.contains("BOOLEAN"))
  }

  test("null seed labels fail loudly at training time, never count as negatives") {
    val df = Seq((1L, "a b", Option(true)), (2L, "c d", Option.empty[Boolean]))
      .toDF("doc_id", "text", "label")
    // the vocab materialize is eager, so the broken seed fails INSIDE
    // training — before any model frame escapes
    val e = intercept[Exception] {
      QualityClassifier.trainNbQuality(df, "label", "text")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null label")), s"wrong failure: $e")
  }
}
