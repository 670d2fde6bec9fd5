package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changeset application (MERGE/upsert): reconcile a base snapshot with
  * a stream of keyed inserts / updates / deletes into the next snapshot.
  *
  * This is the incremental-ingest primitive of a large training-data
  * pipeline: the 100 TB corpus snapshot is never rewritten from scratch —
  * each run folds in the day's crawl delta (new docs, re-crawled docs,
  * takedown deletes) and republishes.
  *
  * Semantics (latest-wins):
  *   - rows are identified by `keyCols`;
  *   - for each key, the surviving row is the one with the highest
  *     (`versionCol`, source) pair, where a changeset row outranks a
  *     snapshot row at equal version — so re-applying the same changeset
  *     is idempotent;
  *   - a surviving row whose `deleteCol` is true is dropped (tombstone);
  *     tombstones in the CHANGESET delete snapshot rows, and a snapshot
  *     built by a previous merge never carries tombstones forward.
  *
  * Scale shape: ONE hash shuffle on the key columns — the union is
  * narrow, and the per-key winner is a `max_by` aggregate with map-side
  * partial aggregation (no window sort, no join). Schemas must match
  * (same payload columns in both frames); enforced up front so a drifted
  * changeset fails loudly instead of null-padding.
  */
object Merge {

  /** Apply `changes` to `snapshot`, returning the next snapshot (without
    * the delete column — tombstones are consumed, not propagated).
    *
    * @param snapshot   current state; one live row per key (not checked —
    *                   duplicate keys resolve by the same latest-wins rule)
    * @param changes    keyed delta; `deleteCol` (BooleanType) marks
    *                   tombstones; absent keys are inserts
    * @param keyCols    identity columns (non-empty)
    * @param versionCol monotone change ordinal (commit ts, crawl id, …);
    *                   rows compare by it FIRST, so a stale late delta
    *                   cannot clobber a newer snapshot row
    */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], versionCol: String,
      deleteCol: String = "is_deleted"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val payload = snapshot.columns.filterNot(keyCols.contains).toSeq
    require(payload.contains(versionCol),
      s"snapshot must carry the version column '$versionCol'")
    require(!snapshot.columns.contains(deleteCol),
      s"snapshot must not carry tombstones ('$deleteCol') — a merged snapshot consumes them")
    val expected = (keyCols ++ payload :+ deleteCol).sorted
    require(changes.columns.sorted.sameElements(expected),
      s"changeset columns ${changes.columns.sorted.mkString(",")} must be snapshot columns + '$deleteCol' (${expected.mkString(",")})")

    val unified = snapshot
      .withColumn(deleteCol, lit(false)).withColumn("__src", lit(0))
      .select((keyCols ++ payload :+ deleteCol :+ "__src").map(col): _*)
      .unionByName(changes.withColumn("__src", lit(1))
        .select((keyCols ++ payload :+ deleteCol :+ "__src").map(col): _*))

    val carried: Seq[Column] = (payload :+ deleteCol).map(col)
    unified
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(carried: _*), struct(col(versionCol), col("__src"))).as("__w"))
      .select(keyCols.map(col) ++ (payload :+ deleteCol).map(c => col(s"__w.$c")): _*)
      .filter(!col(deleteCol))
      .drop(deleteCol)
  }

  /** Apply a changeset to an SCD-2 (validity-interval) HISTORY table:
    * where [[applyChangeset]] overwrites a key's row (SCD-1), this
    * preserves lineage — every change CLOSES the key's open interval
    * and opens a new one, so any past state of the corpus is
    * reconstructible with `WHERE valid_from <= t AND (valid_to IS NULL
    * OR valid_to > t)`. That point-in-time queryability is what a
    * training pipeline needs to answer "exactly which document versions
    * did run X train on".
    *
    * Layout: history rows carry the payload plus `validFromCol` and
    * `validToCol` (null = open/current; at most one open row per key).
    * `changes` carries the same payload plus `versionCol` (the change's
    * effective ordinal — it becomes the new row's valid_from) and the
    * `deleteCol` tombstone flag.
    *
    * Per key, with the batch's fresh changes ordered by version:
    *   - the pre-existing open row closes at the first change's version;
    *   - each non-delete change opens [its version, next change's
    *     version); the last stays open;
    *   - a delete inserts nothing but its version still closes its
    *     predecessor — a validity gap means the key did not exist;
    *   - STALE changes (version ≤ the key's freshness watermark —
    *     the highest version the history has already absorbed,
    *     `max(coalesce(valid_to, valid_from))` over the key's rows)
    *     are dropped before any of the above: the history's knowledge
    *     wins, mirroring [[applyChangeset]]'s stale-delta protection,
    *     and re-applying an already-applied batch is a no-op. The
    *     watermark reads ALL of the key's rows, not just the open
    *     one: when the latest applied change was a delete the key has
    *     no open row, but its closed predecessor's `valid_to` still
    *     records the delete's version — guarding on the open row
    *     alone would let a replayed batch re-insert the whole chain
    *     as duplicate overlapping intervals;
    *   - closed history rows pass through untouched.
    *
    * Versions must be UNIQUE per key within a batch (they are change
    * ordinals — commit timestamps, crawl ids): two changes to one key
    * at the same version have no defined order, and the chain window
    * would pick one nondeterministically. Dedupe on (key, version)
    * upstream (e.g. [[graft.operators.Dedup.exact]]) if a source can
    * emit such collisions.
    *
    * Scale shape: the window and the key joins touch only the CHANGES
    * and the OPEN rows (one live row per key) — the closed bulk of a
    * 100 TB history table is never shuffled, only unioned through.
    * The freshness watermark needs closed rows too, but only for keys
    * IN the batch: history is first narrowed by a broadcast left-semi
    * join on the batch's keys (no shuffle of history; the scan prunes
    * with the broadcast hash), and the watermark aggregate then runs
    * on that small survivor set. Changes are a batch delta, presumed
    * small enough to broadcast — the hints below assume that. */
  def scd2Apply(history: DataFrame, changes: DataFrame,
      keyCols: Seq[String], versionCol: String,
      deleteCol: String = "is_deleted",
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "need at least one key column")
    val histCols = history.columns.toSeq
    require(histCols.contains(validFromCol) && histCols.contains(validToCol),
      s"history must carry '$validFromCol' and '$validToCol'")
    require(!histCols.contains(deleteCol),
      s"history must not carry tombstones ('$deleteCol') — scd2Apply consumes them")
    val payload = histCols.filterNot(c =>
      keyCols.contains(c) || c == validFromCol || c == validToCol)
    val expected = (keyCols ++ payload :+ versionCol :+ deleteCol).sorted
    require(changes.columns.sorted.sameElements(expected),
      s"changeset columns ${changes.columns.sorted.mkString(",")} must be " +
        s"key + payload + '$versionCol' + '$deleteCol' (${expected.mkString(",")})")
    require(history.schema(validFromCol).dataType ==
      changes.schema(versionCol).dataType,
      s"'$validFromCol' (${history.schema(validFromCol).dataType}) and " +
        s"'$versionCol' (${changes.schema(versionCol).dataType}) must share a type")

    val outCols = (keyCols ++ payload :+ validFromCol :+ validToCol).map(col)
    val open = history.filter(col(validToCol).isNull)
    // stale guard BEFORE the chain window, so a dropped stale change
    // cannot close a fresh neighbor's interval either. Watermark over
    // ALL of the key's history rows (closed rows included — a
    // delete-tail key has no open row but its closed predecessor's
    // valid_to records the delete's version), narrowed to the batch's
    // keys by broadcast semi-join so the history bulk never shuffles.
    val changeKeys = changes.select(keyCols.map(col): _*).distinct()
    val wm = history.join(broadcast(changeKeys), keyCols, "left_semi")
      .groupBy(keyCols.map(col): _*)
      .agg(max(coalesce(col(validToCol), col(validFromCol))).as("__wm"))
    val fresh = changes.join(broadcast(wm), keyCols, "left")
      .filter(col("__wm").isNull || col(versionCol) > col("__wm"))
      .drop("__wm")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    val chained = fresh
      .withColumn("__vto", lead(col(versionCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
    val firstPerKey = chained.filter(col("__rn") === 1)
      .select(keyCols.map(col) :+ col(versionCol).as("__close_at"): _*)
    val closedNow = open.join(broadcast(firstPerKey), keyCols, "left")
      .withColumn(validToCol,
        when(col("__close_at").isNotNull, col("__close_at"))
          .otherwise(col(validToCol)))
      .select(outCols: _*)
    val inserts = chained.filter(!col(deleteCol))
      .select(keyCols.map(col) ++ payload.map(col) :+
        col(versionCol).as(validFromCol) :+ col("__vto").as(validToCol): _*)
    history.filter(col(validToCol).isNotNull).select(outCols: _*)
      .unionByName(closedNow)
      .unionByName(inserts)
  }

  /** Point-in-time read of an [[scd2Apply]] history: the rows valid AT
    * `at` — the question the history exists to answer. A key inside a
    * delete gap (valid_to ≤ at < next valid_from) correctly returns no
    * row. Pure filter, no shuffle or join: with the history table
    * range-partitioned or z-ordered on the validity columns
    * ([[graft.sources.Writers.writeSortedParquet]] /
    * `writeZOrderedParquet`), the scan prunes to the files whose
    * interval stats straddle `at`. */
  def scd2Snapshot(history: DataFrame, at: Column,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame =
    history.filter(col(validFromCol) <= at &&
      (col(validToCol).isNull || col(validToCol) > at))

  /** The inverse of [[applyChangeset]]: diff two snapshots into the
    * minimal changeset that replays one into the other —
    * `applyChangeset(oldSnap, diffSnapshots(oldSnap, newSnap, …), …)`
    * row-equals `newSnap` whenever versions are monotone (a key's
    * version never decreases between snapshots; tombstones reuse the
    * old row's version and win the equal-version tie as changeset rows).
    *
    * Emitted per key: nothing when the row is null-safely identical in
    * both; the new row (insert/update) when added or changed; the OLD
    * row flagged `deleteCol = true` when the key disappeared. One full
    * outer join on the keys — a single co-partitioned shuffle, which at
    * snapshot scale is the floor for any exact diff. This is how a
    * 100 TB pipeline publishes an incremental delta (to downstream
    * consumers, or for audit) instead of re-shipping the snapshot. */
  def diffSnapshots(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], versionCol: String,
      deleteCol: String = "is_deleted"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(oldSnap.columns.sorted.sameElements(newSnap.columns.sorted),
      s"snapshots must share one schema (old: ${oldSnap.columns.sorted.mkString(",")}, new: ${newSnap.columns.sorted.mkString(",")})")
    require(!oldSnap.columns.contains(deleteCol),
      s"snapshots must not carry '$deleteCol' — the diff introduces it")
    val payload = oldSnap.columns.filterNot(keyCols.contains).toSeq
    require(payload.contains(versionCol),
      s"snapshots must carry the version column '$versionCol'")
    val cols = keyCols ++ payload
    val o = oldSnap.select(cols.map(col): _*)
      .withColumn("__o", struct(payload.map(col): _*))
      .select((keyCols.map(col) :+ col("__o")): _*)
    val nw = newSnap.select(cols.map(col): _*)
      .withColumn("__n", struct(payload.map(col): _*))
      .select((keyCols.map(col) :+ col("__n")): _*)
    o.join(nw, keyCols, "full_outer")
      // <=> is null-safe on the whole payload struct: an unchanged row
      // with nulls in it must NOT resurface as a spurious update
      .filter(!(col("__o") <=> col("__n")))
      .select(
        keyCols.map(col) ++
          payload.map(c =>
            when(col("__n").isNotNull, col(s"__n.$c")).otherwise(col(s"__o.$c")).as(c)) :+
          col("__n").isNull.as(deleteCol): _*)
  }
}
