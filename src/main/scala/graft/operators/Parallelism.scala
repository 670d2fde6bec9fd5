package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-width floor for CPU-bound per-row passes (optimization guide
  * §2.5 "input skew": one unsplittable input → one task → the whole
  * stage runs on a single core while the rest of the box idles).
  *
  * A parquet source parallelizes at row-group granularity, so a corpus
  * that arrives as few files with few row groups caps every downstream
  * map pass at that file count regardless of cluster width. For
  * IO-light stages that's irrelevant; for the engine's compute-heavy
  * per-row passes (per-feature md5 folds, shingle + hash pipelines,
  * centroid assignment over wide vectors, n-gram probes) it is the
  * difference between one core and the cluster — the same phenomenon
  * [[graft.streaming.EventStreams]].spreadBatch measured on the ingest
  * path (~36 s/batch single-core vs ~14 s well-partitioned, round 12).
  *
  * [[widen]] is the batch-side counterpart: round-robin repartition to
  * `defaultParallelism`, applied ONLY when the frame's realized
  * partitioning is narrower. Scale-adaptive by construction — a 100 TB
  * corpus scan already carries thousands of splits, so the guard
  * no-ops and the plan is unchanged; the repartition fires exactly in
  * the few-big-files / tiny-corpus regimes where one shuffle of the
  * rows (cheap: the frame is about to be exploded/hashed anyway, and
  * shuffle write is sequential) buys full-width compute. Callers put
  * it immediately before the expensive map work, never after a keyed
  * exchange (which already spreads).
  *
  * Determinism: round-robin repartition is retry-deterministic
  * (sortBeforeRepartition, SPARK-23207) and every downstream consumer
  * in this engine is either keyed (aggregates, joins) or ends in a
  * total order, so results are partitioning-invariant — the same
  * invariant the local-cluster oracle run (round 17 build) already
  * exercises.
  */
object Parallelism {

  /** `df` repartitioned round-robin to the session's default
    * parallelism when (and only when) its current partitioning is
    * narrower; `df` unchanged otherwise. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions materializes the physical RDD handle (no job)
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
