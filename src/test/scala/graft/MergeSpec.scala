package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0, 0L),
    (2L, "b", 20.0, 0L),
    (3L, "c", 30.0, 0L)
  ).toDF("k", "name", "price", "v")

  test("upsert: update, delete, insert, and untouched rows") {
    val changes = Seq(
      (2L, "b2", 22.0, 1L, false), // update
      (3L, "c", 30.0, 1L, true),   // delete
      (9L, "z", 99.0, 1L, false)   // insert
    ).toDF("k", "name", "price", "v", "is_deleted")
    val out = Merge.applyChangeset(snap, changes, Seq("k"), "v")
      .orderBy("k").as[(Long, String, Double, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0, 0L), (2L, "b2", 22.0, 1L), (9L, "z", 99.0, 1L)))
  }

  test("latest version wins regardless of input order; stale delta ignored") {
    val changes = Seq(
      (1L, "new", 11.0, 5L, false),
      (1L, "mid", 10.5, 3L, false),
      (2L, "stale", 0.0, -1L, false) // older than the snapshot's v=0 row
    ).toDF("k", "name", "price", "v", "is_deleted")
    val out = Merge.applyChangeset(snap, changes, Seq("k"), "v")
      .orderBy("k").as[(Long, String, Double, Long)].collect().toSeq
    assert(out.head == ((1L, "new", 11.0, 5L)))
    assert(out(1) == ((2L, "b", 20.0, 0L)), "a stale change must not clobber a newer snapshot row")
  }

  test("idempotent: re-applying the same changeset is a no-op") {
    val changes = Seq(
      (2L, "b2", 22.0, 1L, false),
      (3L, "c", 30.0, 1L, true)
    ).toDF("k", "name", "price", "v", "is_deleted")
    val once = Merge.applyChangeset(snap, changes, Seq("k"), "v")
    val twice = Merge.applyChangeset(once, changes, Seq("k"), "v")
    assert(twice.orderBy("k").collect().toSeq == once.orderBy("k").collect().toSeq)
  }

  test("tombstones are consumed: output carries no delete column, and a deleted key can be re-inserted") {
    val del = Seq((3L, "c", 30.0, 1L, true)).toDF("k", "name", "price", "v", "is_deleted")
    val s1 = Merge.applyChangeset(snap, del, Seq("k"), "v")
    assert(!s1.columns.contains("is_deleted"))
    assert(s1.filter($"k" === 3L).isEmpty)
    val reins = Seq((3L, "c3", 33.0, 2L, false)).toDF("k", "name", "price", "v", "is_deleted")
    val s2 = Merge.applyChangeset(s1, reins, Seq("k"), "v")
    assert(s2.filter($"k" === 3L).as[(Long, String, Double, Long)].head() == ((3L, "c3", 33.0, 2L)))
  }

  test("schema drift fails loudly") {
    val wrong = Seq((1L, "x", 1L, false)).toDF("k", "name", "v", "is_deleted")
    val e = intercept[IllegalArgumentException] {
      Merge.applyChangeset(snap, wrong, Seq("k"), "v")
    }
    assert(e.getMessage.contains("changeset columns"))
  }

  test("diffSnapshots emits the minimal changeset: insert, update, delete, nothing for identical") {
    val newSnap = Seq(
      (1L, "a", 10.0, 0L),   // unchanged → absent from the diff
      (2L, "b2", 22.0, 1L),  // updated
      (9L, "z", 99.0, 1L)    // inserted; key 3 deleted
    ).toDF("k", "name", "price", "v")
    val d = Merge.diffSnapshots(snap, newSnap, Seq("k"), "v")
      .orderBy("k").as[(Long, String, Double, Long, Boolean)].collect().toSeq
    assert(d == Seq(
      (2L, "b2", 22.0, 1L, false),
      (3L, "c", 30.0, 0L, true),
      (9L, "z", 99.0, 1L, false)))
  }

  test("diff-then-apply replays old into new (roundtrip), including null payloads") {
    val oldSnap = Seq(
      (1L, Some("a"), 10.0, 0L),
      (2L, None, 20.0, 0L),     // null payload, unchanged — must not resurface
      (3L, Some("c"), 30.0, 0L)
    ).toDF("k", "name", "price", "v")
    val newSnap = Seq(
      (1L, Some("a1"), 11.0, 1L),
      (2L, None, 20.0, 0L),
      (4L, Some("d"), 40.0, 1L)
    ).toDF("k", "name", "price", "v")
    val diff = Merge.diffSnapshots(oldSnap, newSnap, Seq("k"), "v")
    // the unchanged null-payload row must not appear in the changeset
    assert(diff.filter($"k" === 2L).isEmpty)
    val replayed = Merge.applyChangeset(oldSnap, diff, Seq("k"), "v")
    assert(replayed.orderBy("k").collect().toSeq ==
      newSnap.orderBy("k").collect().toSeq)
  }

  test("plan shape: one shuffle, partial aggregation, no window sort") {
    val changes = Seq((2L, "b2", 22.0, 1L, false)).toDF("k", "name", "price", "v", "is_deleted")
    val plan = Merge.applyChangeset(snap, changes, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    // per-key winner is an aggregate (map-side partial), not a window:
    // a Window over the union would global-sort every partition
    assert(!plan.contains("Window"), s"latest-wins must not plan a Window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based winner:\n$plan")
  }

  // ---- SCD-2 ------------------------------------------------------------

  private def hist(rows: Seq[(Long, String, Long, Option[Long])]) =
    rows.toDF("k", "name", "valid_from", "valid_to")
  private def chg(rows: Seq[(Long, String, Long, Boolean)]) =
    rows.toDF("k", "name", "v", "is_deleted")

  test("scd2: chain within a batch, close across batches, delete gaps") {
    val empty = hist(Nil)
    // batch 1: key 1 changes at v=1 and v=3; key 2 appears at v=2
    val h1 = Merge.scd2Apply(empty,
      chg(Seq((1L, "a1", 1L, false), (1L, "a3", 3L, false), (2L, "b2", 2L, false))),
      Seq("k"), "v")
    val got1 = h1.orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got1 == Seq((1L, "a1", 1L, Some(3L)), (1L, "a3", 3L, None),
      (2L, "b2", 2L, None)))
    // batch 2: key 1 deleted at v=5 then re-created at v=7; key 2 updated
    val h2 = Merge.scd2Apply(h1,
      chg(Seq((1L, "a3", 5L, true), (1L, "a7", 7L, false), (2L, "b9", 9L, false))),
      Seq("k"), "v")
    val got2 = h2.orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got2 == Seq(
      (1L, "a1", 1L, Some(3L)),
      (1L, "a3", 3L, Some(5L)), // closed by the delete — then a gap [5,7)
      (1L, "a7", 7L, None),
      (2L, "b2", 2L, Some(9L)),
      (2L, "b9", 9L, None)))
  }

  test("scd2: stale changes are dropped; re-applying a batch is a no-op") {
    val h1 = Merge.scd2Apply(hist(Nil), chg(Seq((1L, "a5", 5L, false))),
      Seq("k"), "v")
    // same batch again: version 5 is not > open valid_from 5 → dropped
    val h2 = Merge.scd2Apply(h1, chg(Seq((1L, "a5", 5L, false))), Seq("k"), "v")
    assert(h2.collect().toSeq == h1.collect().toSeq)
    // a strictly older change is dropped too, even alongside a fresh one
    val h3 = Merge.scd2Apply(h1,
      chg(Seq((1L, "old", 3L, false), (1L, "a8", 8L, false))), Seq("k"), "v")
    val got = h3.orderBy("valid_from").collect().map(_.getString(1)).toSeq
    assert(got == Seq("a5", "a8"))
  }

  test("scd2: re-applying a batch whose tail is a delete is still a no-op") {
    // the key's latest applied change is a DELETE → no open row remains,
    // so a guard reading only open rows would treat every replayed
    // change as fresh and re-insert the whole chain as duplicates
    val batch = chg(Seq((1L, "a1", 1L, false), (1L, "a3", 3L, false),
      (1L, "gone", 5L, true)))
    val h1 = Merge.scd2Apply(hist(Nil), batch, Seq("k"), "v")
    val h2 = Merge.scd2Apply(h1, batch, Seq("k"), "v")
    assert(h2.orderBy("valid_from").collect().toSeq ==
      h1.orderBy("valid_from").collect().toSeq)
    // and a fresh change after the delete starts cleanly post-gap
    val h3 = Merge.scd2Apply(h2, chg(Seq((1L, "back", 8L, false))), Seq("k"), "v")
    val got = h3.orderBy("valid_from").collect()
      .map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got == Seq(("a1", 1L, Some(3L)), ("a3", 3L, Some(5L)),
      ("back", 8L, None)))
    // replay of the ORIGINAL batch onto the extended history: all stale
    val h4 = Merge.scd2Apply(h3, batch, Seq("k"), "v")
    assert(h4.orderBy("valid_from").collect().toSeq ==
      h3.orderBy("valid_from").collect().toSeq)
  }

  test("scd2Snapshot: as-of read honors intervals and delete gaps") {
    val h = Merge.scd2Apply(hist(Nil), chg(Seq(
      (1L, "a1", 1L, false), (1L, "a1-del", 5L, true), (1L, "a7", 7L, false),
      (2L, "b3", 3L, false))), Seq("k"), "v")
    def at(t: Long) = Merge.scd2Snapshot(h, lit(t))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(at(2L) == Seq((1L, "a1")))            // before key 2 exists
    assert(at(4L) == Seq((1L, "a1"), (2L, "b3")))
    assert(at(6L) == Seq((2L, "b3")))            // key 1 in its delete gap
    assert(at(9L) == Seq((1L, "a7"), (2L, "b3")))
  }

  test("scd2: schema and type drift fail loudly") {
    val h = hist(Seq((1L, "a", 1L, None)))
    assertThrows[IllegalArgumentException] { // missing delete col
      Merge.scd2Apply(h, Seq((1L, "x", 2L)).toDF("k", "name", "v"), Seq("k"), "v")
    }
    assertThrows[IllegalArgumentException] { // version type mismatch
      Merge.scd2Apply(h,
        Seq((1L, "x", 2.0, false)).toDF("k", "name", "v", "is_deleted"),
        Seq("k"), "v")
    }
  }
}
