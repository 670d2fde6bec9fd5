package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events schema
  * (event_id, ts, user_id, event_type, value).
  *
  * Beyond-reference scope: the reference's "streaming" is only
  * out-of-core batch execution (SURVEY §1.1); these are true unbounded
  * stream semantics — watermarks, event-time windows, session windows,
  * and custom keyed state — expressed Spark-first so the SAME code runs
  * on a batch DataFrame (Spark's unified semantics) and a readStream.
  *
  * Scale notes: all three are keyed stateful aggregations; state lives in
  * the state store partitioned by key (user_id / window), so they scale
  * horizontally with executors. Watermarks bound state size — without
  * one, a 100 TB/day stream accumulates state forever.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class UserActivity(user_id: Long, n_events: Long, total_value: Double)

  /** Tumbling/sliding event-time window aggregate with a watermark for
    * late-data expiry. */
  def windowedCounts(events: DataFrame, windowDur: String = "5 minutes",
      slide: Option[String] = None, watermark: String = "10 minutes"): DataFrame = {
    val w = slide.map(s => window(col("ts"), windowDur, s))
      .getOrElse(window(col("ts"), windowDur))
    events
      .withWatermark("ts", watermark)
      .groupBy(w.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Per-user session aggregation using the built-in session_window
    * (gap-based; closes `gap` after the last event). */
  def sessionized(events: DataFrame, gap: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("s.start").as("session_start"), col("s.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming deduplication: drop events whose key was already seen
    * within the watermark horizon — the unbounded-input counterpart of
    * [[graft.operators.Dedup.exact]]. State per key is bounded by the
    * watermark (without it, dedup state grows forever on an unbounded
    * stream). */
  def dedupedEvents(events: DataFrame, keys: Seq[String] = Seq("event_id"),
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming CONTENT dedup for a document stream: the dedup key is the
    * fused 64-bit SimHash of the text (identical content — and identical
    * token multisets, since simhash is order-free — collapses to one
    * signature computed map-side), deduped within the watermark horizon.
    * The streaming-ingest counterpart of [[graft.operators.Dedup]]'s
    * batch operators: a training-data pipeline drops exact/trivial
    * near-dup re-crawls at ingest with per-key state bounded by the
    * watermark, and the full LSH near-dup pass runs in batch behind it.
    *
    * Token-free (empty/whitespace/null) texts all hash to the same
    * degenerate signature — the batch operators exclude them from
    * pairing for exactly this reason — so such rows are keyed by their
    * OWN `idCol` value instead and pass through (dropping a failed
    * fetch as a "duplicate" of an unrelated failed fetch would silently
    * lose rows and their metadata). `idCol` must be NON-NULL: null-id
    * degenerate rows would share one key and collapse. A degenerate
    * re-crawl with the SAME id does dedup — same id means same row
    * identity.
    *
    * Signature collisions across genuinely different docs are possible
    * (64-bit) but need adversarial content; use a keccak/md5 fingerprint
    * column as the key instead where cryptographic certainty matters. */
  def dedupedByContent(docs: DataFrame, idCol: String, textCol: String, tsCol: String,
      watermark: String = "10 minutes", seed: Long = 42L): DataFrame = {
    // collision-safe temp name: never clobber a caller column (e.g. a
    // signature persisted by an upstream ingest stage)
    val sigCol = graft.operators.AddRowIndex.resolveUniqueName("__sig", docs.columns.toSeq)
    docs
      .withColumn(sigCol, struct(
        // (isDegenerate, signature, id-for-degenerate) — degenerate rows
        // can never collide with real signatures (different first
        // field), and each keys to its own id VALUE (xxhash64(NULL id)
        // would be the constant seed, collapsing all null-id rows; the
        // raw value keeps distinct ids distinct for any id type)
        col(textCol).isNull || !col(textCol).rlike("\\S"),
        when(col(textCol).isNotNull && col(textCol).rlike("\\S"),
          graft.functions.HashFunctions.simhashFromText(col(textCol), seed)),
        when(col(textCol).isNull || !col(textCol).rlike("\\S"),
          col(idCol).cast("string"))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(sigCol)
      .drop(sigCol)
  }

  /** Watermarked stream-stream interval join: each left row pairs with
    * right rows of the same key whose timestamp falls in
    * `[leftTs, leftTs + within)` — e.g. purchases attributed to the
    * click that preceded them by < 5 minutes.
    *
    * Unbounded-join state discipline: BOTH sides carry a watermark and
    * the join condition bounds `rightTs` relative to `leftTs` in both
    * directions, so Spark can expire buffered rows once the watermark
    * passes `ts + within` — without the two-sided time bound a
    * stream-stream join must buffer one side forever. Batch frames run
    * the identical code (watermarks are a no-op there), which is what
    * the oracle gate compares.
    *
    * Column names of the two frames must be disjoint (rename before
    * joining) — positional disambiguation of duplicate names inside a
    * generic operator would silently bind the wrong side. */
  def intervalJoined(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      within: String = "5 minutes", watermark: String = "10 minutes"): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint (both have: ${overlap.toSeq.sorted.mkString(", ")})")
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) < col(leftTs) + expr(s"INTERVAL $within"))
  }

  /** Maintain a parquet SNAPSHOT from an unbounded changeset stream:
    * each micro-batch folds into the on-disk state via
    * [[graft.operators.Merge.applyChangeset]] (latest-wins by
    * (version, source), tombstones consumed) and the result replaces the
    * snapshot through a staged write + atomic-ish swap.
    *
    * Exactly-once effect without a transactional table format: the
    * merge itself is IDEMPOTENT (MergeSpec/MergeFuzzSpec pin it), so a
    * batch re-delivered after a crash re-applies harmlessly — the
    * at-least-once contract of foreachBatch composes with an idempotent
    * apply into exactly-once state. The swap preserves the old snapshot
    * until the new one is fully committed (same point-of-no-return
    * discipline as the writers in [[graft.sources.Writers]]).
    *
    * Scale: each batch costs one key-shuffle over (snapshot + batch) —
    * the same floor as any snapshot-maintenance job; at 100 TB the
    * snapshot side would come from a bucketed/sorted layout so the
    * shuffle is one-sided. Returns the started query. */
  def upsertSink(changes: DataFrame, snapshotPath: String,
      keyCols: Seq[String], versionCol: String,
      deleteCol: String = "is_deleted",
      checkpointDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val target = new org.apache.hadoop.fs.Path(snapshotPath)
        val staging = new org.apache.hadoop.fs.Path(
          snapshotPath + ".__graft-upsert-staging__")
        val retired = new org.apache.hadoop.fs.Path(
          snapshotPath + ".__graft-upsert-old__")
        val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
        // CRASH RECOVERY before reading state — the four-state
        // rename-only machine lives in FsSwap (shared with
        // compactParquet). The committed-staging-alone discard is safe
        // HERE because the source replays the batch and the merge is
        // idempotent.
        graft.sources.FsSwap.recover(fs, target, staging, retired, "upsertSink")

        val exists = fs.exists(target)
        val next =
          if (!exists)
            graft.operators.Merge.applyChangeset(
              // empty snapshot with the batch's schema minus the tombstone
              batch.sparkSession.createDataFrame(
                new java.util.ArrayList[org.apache.spark.sql.Row](),
                org.apache.spark.sql.types.StructType(
                  batch.schema.filterNot(_.name == deleteCol))),
              batch.toDF(), keyCols, versionCol, deleteCol)
          else
            graft.operators.Merge.applyChangeset(
              spark.read.parquet(snapshotPath), batch.toDF(),
              keyCols, versionCol, deleteCol)
        // stage-and-swap: the snapshot being replaced is also an INPUT of
        // this plan, so writing in place would read-while-overwrite;
        // materialize to staging, then swap via RENAMES ONLY (a recursive
        // delete of the live target could be half-done at a crash, and
        // no recovery can distinguish a mutilated directory from a
        // complete one — renames are atomic per directory).
        next.write.mode("overwrite").parquet(staging.toString)
        graft.sources.FsSwap.swap(fs, target, staging, retired, "upsertSink")
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d)).start()
  }

  /** Streaming corpus ingest with duplicate rejection — the ingest
    * front door of a training pipeline: re-crawls and mirror copies
    * never enter the corpus. Each micro-batch is deduplicated WITHIN
    * itself (first occurrence by `idCol` wins —
    * [[graft.operators.Dedup.exactByHash]], grouping on the 8-byte
    * xxhash64 with the full text kept only to break hash collisions)
    * and then against everything already admitted, and the survivors
    * are appended to the corpus snapshot through the same crash-safe
    * rename-only swap as [[upsertSink]] (batch replay after a crash is
    * idempotent: replayed rows anti-join away against the corpus).
    *
    * The admitted corpus persists a `__graft_text_h` column, so the
    * per-batch against-corpus anti-join scans only (hash, text) —
    * payload columns prune away. Semantic (MinHash) admission is the
    * batch operator family ([[graft.operators.Dedup.admitNew]] /
    * `minhashExactPairsAgainstSketches`) composed in a custom
    * foreachBatch; this sink's contract is EXACT identity, which keeps
    * it SQL-oracle-checkable end-to-end. */
  def dedupIngestSink(docs: DataFrame, corpusPath: String,
      idCol: String, textCol: String,
      checkpointDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val HashCol = "__graft_text_h"
    val writer = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val target = new org.apache.hadoop.fs.Path(corpusPath)
        val staging = new org.apache.hadoop.fs.Path(
          corpusPath + ".__graft-ingest-staging__")
        val retired = new org.apache.hadoop.fs.Path(
          corpusPath + ".__graft-ingest-old__")
        val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
        graft.sources.FsSwap.recover(fs, target, staging, retired, "dedupIngestSink")
        val withinBatch = graft.operators.Dedup
          .exactByHash(batch.toDF(), textCol, idCol)
          .drop("n_dups")
          .withColumn(HashCol, xxhash64(col(textCol)))
        val next =
          if (!fs.exists(target)) withinBatch
          else {
            val corpus = spark.read.parquet(corpusPath)
            val seen = corpus.select(col(HashCol), col(textCol)).distinct()
            corpus.unionByName(
              withinBatch.join(seen, Seq(HashCol, textCol), "left_anti"))
          }
        next.write.mode("overwrite").parquet(staging.toString)
        graft.sources.FsSwap.swap(fs, target, staging, retired, "dedupIngestSink")
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d)).start()
  }

  /** Custom keyed state via flatMapGroupsWithState: running per-user
    * totals emitted on every update (the escape hatch for semantics
    * session_window/window can't express).
    *
    * `idleTimeout = Some(d)` (the production default) evicts state for
    * users idle longer than d — on an unbounded churning key space the
    * state store would otherwise grow forever. Pass `None` for
    * bounded-key jobs and for synchronous test harnesses
    * (processing-time timeouts keep scheduling no-data batches, which
    * `processAllAvailable` never sees quiesce). */
  def runningUserTotals(events: Dataset[Event],
      idleTimeout: Option[String] = Some("1 hour")): Dataset[UserActivity] = {
    implicit val enc = Encoders.product[UserActivity]
    val timeoutConf = idleTimeout.map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[UserActivity, UserActivity](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserActivity]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserActivity(userId, 0L, 0.0))
            var n = prev.n_events
            var tot = prev.total_value
            rows.foreach { e => n += 1; tot += e.value }
            val next = UserActivity(userId, n, tot)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator(next)
          }
      }
  }
}
