package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** Single switch for every "compute this subplan once" site in the
  * engine (LSH signature frames, candidate-pair DAGs, connected-
  * components supersteps, the row-index snapshot).
  *
  * Spark does not share common subplans across union arms or self-join
  * sides, so an expensive DAG consumed N times executes N times unless
  * materialized. The default materialization is `localCheckpoint` —
  * executor-memory(+disk)-resident, cheap, but LOST on executor death,
  * which on a real cluster means recomputation is impossible (the
  * lineage was truncated) and the job fails.
  *
  * Setting the runtime conf `graft.checkpoint.dir` to a reliable
  * filesystem path (HDFS/S3/…) swaps every site to reliable
  * `Dataset.checkpoint`, which persists to that directory and survives
  * executor loss — the cluster-grade mode. The sandbox and unit tests
  * run the default local mode; `MaterializeSpec` runs the gate
  * operators both ways.
  *
  * RETENTION in reliable mode: Spark never deletes non-streaming
  * reliable checkpoints at job end (and
  * `spark.cleaner.referenceTracking.cleanCheckpoints` defaults to
  * false, covering only GC'd RDDs while the app runs). An iterative
  * operator like connectedComponents writes one rep-frame checkpoint
  * per round. Point `graft.checkpoint.dir` at a per-run path (or an
  * object-store prefix with a TTL/lifecycle rule) and purge it after
  * the pipeline completes, or enable cleanCheckpoints for best-effort
  * in-run cleanup.
  */
object Materialize {
  /** Runtime conf key: when set (non-empty), materialize via reliable
    * checkpoints into this directory instead of `localCheckpoint`. */
  val DirKey = "graft.checkpoint.dir"

  /** Materialize `ds` once and truncate lineage.
    *
    * @param eager materialize immediately (runs a job now) vs on first
    *              downstream use. Eager is required when a side effect
    *              of the materialization job is read right after (e.g.
    *              an accumulator-folded convergence count) or when the
    *              first consumer would otherwise run the upstream inside
    *              a BroadcastExchange (subject to broadcastTimeout).
    */
  def once[T](ds: Dataset[T], eager: Boolean = false): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // follow the conf on every call — a once-only set would silently
        // keep writing "durable" checkpoints to a stale (possibly
        // decommissioned) path after the conf changes. setCheckpointDir
        // nests a per-session UUID subdir under `dir` (and may qualify
        // the scheme), hence the substring test.
        if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
        // persist-before-checkpoint: reliable checkpoint materializes the
        // RDD in a SEPARATE job that re-runs the lineage — without the
        // persist every site would compute its expensive upstream twice
        // (and side-effect jobs, e.g. accumulator-folded convergence
        // counts, would double-fire)
        ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cp = ds.checkpoint(eager = eager)
        // eager: checkpoint files exist, the hot cache is no longer
        // needed (blocking=false, so no extra job). Lazy: the persist
        // must survive until first materialization — it is released when
        // the session ends; callers on the lazy path trade that small
        // cache residue for the single-compute guarantee.
        if (eager) { ds.unpersist(blocking = false); () }
        cp
      case None =>
        ds.localCheckpoint(eager = eager)
    }
  }
}
