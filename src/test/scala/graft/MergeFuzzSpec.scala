package graft

import graft.operators.Merge
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the changeset merge: random snapshots/changesets
  * are replayed through BOTH the Spark operator and a 20-line in-memory
  * reference model, and the results are diffed. All scenarios ride in
  * ONE DataFrame keyed by (scenario, k) — merge semantics are per-key,
  * so a composite key fuzzes dozens of independent scenarios in a
  * single Spark job instead of one job per case. */
class MergeFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private type SnapRow = (Int, Int, String, Double, Long) // scenario, k, name, price, v
  private type ChRow = (Int, Int, String, Double, Long, Boolean)

  private val payloadName: Gen[String] = Gen.oneOf("a", "b", "c", "", "x y", "é")

  // one scenario: a snapshot (unique keys, version 0..2) + a changeset
  // (keys drawn wider than the snapshot so inserts occur, deduped on
  // (k, v) so the (version, source) winner is unambiguous)
  private def scenario(sid: Int): Gen[(Seq[SnapRow], Seq[ChRow])] = for {
    snapKeys <- Gen.someOf(0 to 8)
    snap <- Gen.sequence[Seq[SnapRow], SnapRow](snapKeys.map(k => for {
      n <- payloadName; p <- Gen.chooseNum(0.0, 100.0); v <- Gen.chooseNum(0L, 2L)
    } yield (sid, k, n, p, v)))
    nCh <- Gen.chooseNum(0, 12)
    chRaw <- Gen.listOfN(nCh, for {
      k <- Gen.chooseNum(0, 12); n <- payloadName
      p <- Gen.chooseNum(0.0, 100.0); v <- Gen.chooseNum(0L, 4L)
      del <- Gen.oneOf(true, false)
    } yield (sid, k, n, p, v, del))
  } yield (snap, chRaw.distinctBy(c => (c._2, c._5)))

  private def refApply(snap: Seq[SnapRow], ch: Seq[ChRow]): Set[SnapRow] =
    (snap.map(r => (r, 0, false)) ++
      ch.map(c => ((c._1, c._2, c._3, c._4, c._5), 1, c._6)))
      .groupBy(t => t._1._2).values.flatMap { rows =>
        val w = rows.maxBy(t => (t._1._5, t._2))
        if (w._3) None else Some(w._1)
      }.toSet

  test("applyChangeset agrees with the reference model over random scenarios") {
    val seed0 = org.scalacheck.rng.Seed(7L)
    val scenarios = Iterator.iterate((0, seed0)) { case (i, s) => (i + 1, s.next) }
      .take(40)
      .map { case (i, s) => scenario(i).pureApply(Gen.Parameters.default, s) }
      .toSeq
    val snapAll = scenarios.flatMap(_._1)
    val chAll = scenarios.flatMap(_._2)
    val out = Merge.applyChangeset(
        snapAll.toDF("scenario", "k", "name", "price", "v"),
        chAll.toDF("scenario", "k", "name", "price", "v", "is_deleted"),
        Seq("scenario", "k"), "v")
      .as[SnapRow].collect().toSet
    val expected = scenarios.flatMap { case (sn, ch) => refApply(sn, ch) }.toSet
    val extra = out -- expected
    val missing = expected -- out
    assert(extra.isEmpty && missing.isEmpty,
      s"merge fuzz diverged: extra=${extra.take(3)} missing=${missing.take(3)}")
  }

  test("diff-then-apply roundtrip holds over random monotone snapshot pairs") {
    val seed0 = org.scalacheck.rng.Seed(11L)
    // old: unique keys at v=0; new: mutate/drop/insert with v=1
    val pairGen: Int => Gen[(Seq[SnapRow], Seq[SnapRow])] = sid => for {
      oldKeys <- Gen.someOf(0 to 8)
      oldRows <- Gen.sequence[Seq[SnapRow], SnapRow](oldKeys.map(k => for {
        n <- payloadName; p <- Gen.chooseNum(0.0, 100.0)
      } yield (sid, k, n, p, 0L)))
      kept <- Gen.someOf(oldRows)
      mutated <- Gen.sequence[Seq[(SnapRow, Boolean)], (SnapRow, Boolean)](
        kept.map(r => Gen.oneOf(true, false).flatMap(change =>
          if (!change) Gen.const((r, false))
          else payloadName.map(n => ((r._1, r._2, n + "!", r._4 + 1.0, 1L), true)))))
      insKeys <- Gen.someOf(9 to 12)
      ins <- Gen.sequence[Seq[SnapRow], SnapRow](insKeys.map(k =>
        payloadName.map(n => (sid, k, n, 1.0, 1L))))
    } yield (oldRows, mutated.map(_._1) ++ ins)
    val pairs = Iterator.iterate((0, seed0)) { case (i, s) => (i + 1, s.next) }
      .take(30)
      .map { case (i, s) => pairGen(i).pureApply(Gen.Parameters.default, s) }
      .toSeq
    val oldDf = pairs.flatMap(_._1).toDF("scenario", "k", "name", "price", "v")
    val newDf = pairs.flatMap(_._2).toDF("scenario", "k", "name", "price", "v")
    val diff = Merge.diffSnapshots(oldDf, newDf, Seq("scenario", "k"), "v")
    val replayed = Merge.applyChangeset(oldDf, diff, Seq("scenario", "k"), "v")
      .as[SnapRow].collect().toSet
    assert(replayed == pairs.flatMap(_._2).toSet,
      "diff-then-apply must replay old into new")
  }

  test("scd2: any version-threshold split applied sequentially equals the one-shot apply") {
    // random change streams (unique versions per key); for each
    // scenario a random threshold T splits the stream into earlier/later
    // batches — the two-batch apply must equal the single apply, which
    // in turn must equal a direct reference chain
    type C = (Int, Int, String, Long, Boolean) // scenario, k, name, v, del
    val gen: Int => Gen[(Seq[C], Long)] = sid => for {
      n <- Gen.chooseNum(0, 14)
      raw <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0, 4); nm <- payloadName
        v <- Gen.chooseNum(0L, 9L); del <- Gen.oneOf(true, false)
      } yield (sid, k, nm, v, del))
      t <- Gen.chooseNum(0L, 9L)
    } yield (raw.distinctBy(c => (c._2, c._4)), t)
    val seed0 = org.scalacheck.rng.Seed(13L)
    val scenarios = Iterator.iterate((0, seed0)) { case (i, s) => (i + 1, s.next) }
      .take(40)
      .map { case (i, s) => gen(i).pureApply(Gen.Parameters.default, s) }
      .toSeq
    val all = scenarios.flatMap(_._1)
    def df(rows: Seq[(Int, Int, String, Long, Boolean)]) =
      rows.toDF("scenario", "k", "name", "v", "is_deleted")
    val empty = df(Nil).select($"scenario", $"k", $"name",
      $"v".as("valid_from"), $"v".as("valid_to"))
    val keys = Seq("scenario", "k")
    val oneShot = Merge.scd2Apply(empty, df(all), keys, "v")
    val batch1 = scenarios.flatMap { case (rows, t) => rows.filter(_._4 < t) }
    val batch2 = scenarios.flatMap { case (rows, t) => rows.filter(_._4 >= t) }
    val twoStep = Merge.scd2Apply(
      Merge.scd2Apply(empty, df(batch1), keys, "v"), df(batch2), keys, "v")
    type H = (Int, Int, String, Long, Option[Long])
    def rows(d: org.apache.spark.sql.DataFrame): Set[H] =
      d.collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    // reference chain computed in memory
    val expected: Set[H] = all.groupBy(c => (c._1, c._2)).values.flatMap { cs =>
      val sorted = cs.sortBy(_._4)
      sorted.zip(sorted.drop(1).map(n => Some(n._4)) :+ None).collect {
        case (c, vto) if !c._5 => (c._1, c._2, c._3, c._4, vto)
      }
    }.toSet
    assert(rows(oneShot) == expected, "one-shot apply diverged from reference")
    assert(rows(twoStep) == expected, "sequential apply diverged from one-shot")

    // idempotent replay: re-applying the FULL stream (and the earlier
    // batch) onto the finished history must change nothing — including
    // scenarios whose latest change is a delete (no open row remains,
    // so the freshness watermark must come from closed rows too)
    val replayFull = Merge.scd2Apply(oneShot, df(all), keys, "v")
    assert(rows(replayFull) == expected, "full-stream replay was not a no-op")
    val replayOld = Merge.scd2Apply(oneShot, df(batch1), keys, "v")
    assert(rows(replayOld) == expected, "stale-batch replay was not a no-op")

    // point-in-time reads at every version boundary (and between): the
    // snapshot must equal the reference rows whose interval covers t
    Seq(0L, 3L, 5L, 9L).foreach { t =>
      val snap = rows(Merge.scd2Snapshot(oneShot,
        org.apache.spark.sql.functions.lit(t)))
      val want = expected.filter { case (_, _, _, vf, vto) =>
        vf <= t && vto.forall(_ > t) }
      assert(snap == want, s"scd2Snapshot at t=$t diverged")
    }
  }
}
