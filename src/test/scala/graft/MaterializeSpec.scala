package graft

import graft.operators.{AddRowIndex, Dedup, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `graft.checkpoint.dir` knob: every materialize-once site must
  * produce identical results whether it runs on executor-local
  * checkpoints (default) or reliable checkpoints into a directory
  * (cluster mode), and the reliable mode must actually write there. */
class MaterializeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withCheckpointDir[A](f: java.io.File => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toFile
    spark.conf.set(Materialize.DirKey, dir.getAbsolutePath)
    try f(dir)
    finally {
      spark.conf.unset(Materialize.DirKey)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("once() writes reliable checkpoint files when the dir conf is set") {
    withCheckpointDir { dir =>
      val out = Materialize.once(Seq(1, 2, 3).toDF("x"), eager = true)
      assert(out.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
      def count(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(count).sum).getOrElse(0)
        else 1
      assert(count(dir) > 0, "reliable mode must persist files under the conf dir")
    }
  }

  test("a changed checkpoint dir is honored — no writes to the stale path") {
    def count(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(count).sum).getOrElse(0)
      else 1
    withCheckpointDir { dirA =>
      Materialize.once(Seq(1).toDF("x"), eager = true).collect()
      val before = count(dirA)
      assert(before > 0)
      // re-point the conf mid-session: new writes must land under B
      val dirB = java.nio.file.Files.createTempDirectory("graft_ckpt_b_").toFile
      spark.conf.set(Materialize.DirKey, dirB.getAbsolutePath)
      try {
        Materialize.once(Seq(2).toDF("x"), eager = true).collect()
        assert(count(dirB) > 0, "second materialization must write under the NEW dir")
        assert(count(dirA) == before, "stale dir must receive nothing new")
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dirB)
      }
    }
  }

  test("connectedComponents identical in local and reliable modes") {
    def run(): Map[Long, Long] = {
      val ids = (1L to 8L).toDF("id")
      val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
      Sampling.connectedComponents(ids, pairs)
        .as[(Long, Long)].collect().toMap
    }
    val local = run()
    val reliable = withCheckpointDir(_ => run())
    assert(local == reliable)
    assert(local(3L) == 1L && local(6L) == 5L && local(7L) == 7L)
  }

  test("minhash pairs and row index identical in both modes") {
    def docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "completely different content with no overlap at all whatsoever"))
      .toDF("doc_id", "text")
    def runPairs(): Set[(Long, Long)] =
      Dedup.minhashPairs(docs, "doc_id", "text")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def runIdx(): Seq[(Long, String)] =
      AddRowIndex.withRowIndex(docs.orderBy("doc_id").select("text"), "idx", 1L)
        .select(col("idx"), col("text")).as[(Long, String)].collect().toSeq
    val (lp, li) = (runPairs(), runIdx())
    val (rp, ri) = withCheckpointDir(_ => (runPairs(), runIdx()))
    assert(lp == rp && lp.contains((1L, 2L)))
    assert(li == ri && li.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("bm25 and ngram-jaccard (round-10 materialize sites) identical in both modes") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "alpha beta alpha gamma"), (2L, "alpha delta"),
      (3L, "beta beta gamma"), (4L, "epsilon zeta")).toDF("doc_id", "text")
    def runBm25(): Seq[(Long, Long, Long)] = {
      val qs = Seq((1L, "alpha beta")).toDF("qid", "q")
      TextAnalysis.bm25TopK(docs, "doc_id", "text", qs, "qid", "q", 3)
        .select("query_id", "rank", "id").as[(Long, Long, Long)].collect().toSeq.sorted
    }
    def runNgram(): Set[(Long, Long)] =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.2)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val (lb, ln) = (runBm25(), runNgram())
    val (rb, rn) = withCheckpointDir(_ => (runBm25(), runNgram()))
    assert(lb == rb && lb.nonEmpty)
    assert(ln == rn)
  }
}
