package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- plain-Scala reference BPE (exact, symbol-LIST level — the
  // ground truth the padded-string replace must equal) ----
  private def refTokens(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  /** Greedy leftmost non-overlapping merge of (x, y) in a symbol list. */
  private def mergeOnce(sy: List[String], x: String, y: String): List[String] = {
    val m = x + y
    val buf = List.newBuilder[String]
    var rest = sy
    while (rest.nonEmpty) {
      rest match {
        case a :: b :: tail if a == x && b == y => buf += m; rest = tail
        case a :: tail => buf += a; rest = tail
        case Nil => ()
      }
    }
    buf.result()
  }

  private def refTrain(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[List[String], Long] = texts.flatMap(refTokens)
      .groupBy(identity).map { case (w, g) =>
        w.map(_.toString).toList -> g.size.toLong
      }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= n && !done) {
      val pairs = scala.collection.mutable.Map[String, Long]()
      words.foreach { case (sy, f) =>
        sy.sliding(2).filter(_.size == 2).foreach { p =>
          val key = p.head + " " + p(1)
          pairs(key) = pairs.getOrElse(key, 0L) + f
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val (bp, bc) = pairs.toSeq.minBy { case (p, c) => (-c, p) }
        val Array(x, y) = bp.split(" ", 2)
        out += ((r, bp, x + y, bc))
        words = words.toSeq.map { case (sy, f) => mergeOnce(sy, x, y) -> f }
          .groupBy(_._1).map { case (sy, g) => sy -> g.map(_._2).sum }
        r += 1
      }
    }
    out.result()
  }

  private def refApply(text: String, merges: Seq[(String, String)]): Seq[String] =
    refTokens(text).flatMap { w =>
      var sy = w.map(_.toString).toList
      merges.foreach { case (p, _) =>
        val Array(x, y) = p.split(" ", 2)
        sy = mergeOnce(sy, x, y)
      }
      sy
    }

  private val texts = Seq(
    "the cat sat on the mat",
    "the hat and the bat",
    "that cat that hat",
    "matter chatter the the the")

  test("trainBpeMerges matches the symbol-list reference merge-for-merge") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(1, 4, 10)) {
      val got = Bpe.trainBpeMerges(df, "text", n)
      val want = refTrain(texts, n)
      assert(got == want, s"merge tables differ at n=$n:\n got=$got\nwant=$want")
    }
    val m = Bpe.trainBpeMerges(df, "text", 6)
    assert(m.map(_._1) == (1 to m.length))
    assert(m.forall(_._4 > 0))
  }

  test("merges are boundary-safe: a pair can never fuse across a symbol boundary") {
    // craft merges (t,h) then (h,e): on word 'the', round 1 yields
    // [th, e]; a substring-level replace of 'h e' would then match
    // inside 'th e' and produce the never-trained symbol 'the'
    val merges = Seq(("t h", "th"), ("h e", "he"))
    val got = Bpe.applyBpeMerges(Seq((1L, "the he them")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().head._2
    assert(got == Seq("th", "e", "he", "th", "e", "m"),
      s"boundary violation: $got")
    // and TRAINING's padded-string replace equals the list semantics on
    // a corpus engineered to expose the same trap: 'xa by' substring
    // match inside 'fooxa byz'-like sequences
    val trap = Seq("oth e", "t h e") // 'oth e'? words are ws-split: craft words
    // words: 'othe' and 'the' — after (t,h): othe=[o,t,h,e]->[o,th,e];
    // the=[th,e]. Pair (h,e) must NOT fire on the 'th' tails.
    val df = Seq((1L, "othe the othe the he he")).toDF("doc_id", "text")
    val m = Bpe.trainBpeMerges(df, "text", 3)
    val want = refTrain(Seq("othe the othe the he he"), 3)
    assert(m == want, s"training diverged from list semantics:\n got=$m\nwant=$want")
  }

  test("applyBpeMerges reproduces the reference tokenization, held-out words included") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.trainBpeMerges(df, "text", 8).map(m => (m._2, m._3))
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

  test("training is deterministic across runs") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m1 = Bpe.trainBpeMerges(df, "text", 3)
    assert(m1.nonEmpty)
    assert(Bpe.trainBpeMerges(df, "text", 3) == m1)
  }

  test("fuzz: random small-alphabet corpora train and apply reference-exact") {
    // alphabet {a,b,c,d} forces heavy pair collisions, repeated chars,
    // and multi-round interactions (merged symbols re-entering pairs)
    val rnd = new scala.util.Random(20260815L)
    for (round <- 0 until 5) {
      val corpus = Seq.fill(20 + rnd.nextInt(20)) {
        Seq.fill(1 + rnd.nextInt(4))(
          (0 to rnd.nextInt(7)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
        ).mkString(" ")
      }
      val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val n = 1 + rnd.nextInt(12)
      val got = Bpe.trainBpeMerges(df, "text", n)
      val want = refTrain(corpus, n)
      assert(got == want, s"fuzz round $round (n=$n) train diverged:\n got=$got\nwant=$want")
      if (got.nonEmpty) {
        val merges = got.map(m => (m._2, m._3))
        val heldOut = (0 until 6).map(_ =>
          (0 to rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString).mkString(" ")
        val applied = Bpe.applyBpeMerges(
            Seq((0L, heldOut)).toDF("doc_id", "text"), "doc_id", "text", merges)
          .as[(Long, Seq[String])].collect().head._2
        assert(applied == refApply(heldOut, merges),
          s"fuzz round $round apply diverged on '$heldOut'")
      }
    }
  }

  test("applyBpeMerges validates pair shape") {
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Bpe.applyBpeMerges(df, "doc_id", "text", Seq(("a b c", "abc")))
    }
    intercept[IllegalArgumentException] {
      Bpe.applyBpeMerges(df, "doc_id", "text", Seq(("a b", "xy")))
    }
  }
}
