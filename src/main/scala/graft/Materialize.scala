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

  /** The exact `DirKey` value most recently applied per SparkContext.
    * `sc.getCheckpointDir` cannot be compared against the conf value
    * directly — setCheckpointDir nests a per-session UUID subdir and may
    * qualify the scheme — and a substring test is wrong the other way:
    * changing the conf from `/ckpt/run-2` to `/ckpt` would match the
    * stale path and silently keep checkpointing into run-2. Weak keys so
    * a stopped context doesn't pin the entry. */
  private val appliedDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.SparkContext, String]())

  /** Materialize `ds` once and truncate lineage.
    *
    * @param eager materialize immediately (runs a job now) vs on first
    *              downstream use. Eager is required when a side effect
    *              of the materialization job is read right after (e.g.
    *              an accumulator-folded convergence count) or when the
    *              first consumer would otherwise run the upstream inside
    *              a BroadcastExchange (subject to broadcastTimeout).
    *              Reliable mode ignores `eager=false` and always
    *              materializes now — see the in-method rationale.
    */
  def once[T](ds: Dataset[T], eager: Boolean = false): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // follow the conf on every call — a once-only set would silently
        // keep writing "durable" checkpoints to a stale (possibly
        // decommissioned) path after the conf changes. Two checks, both
        // needed: the exact value last APPLIED BY US (sc.getCheckpointDir
        // is dir + a session UUID subdir, so it never equals dir — and a
        // bare substring test would let /ckpt/run-2 → /ckpt pass as
        // "already applied"), plus a containment probe of the LIVE
        // sc.getCheckpointDir to catch external sc.setCheckpointDir
        // calls made after ours, which would otherwise silently divert
        // "durable" checkpoints outside the configured directory.
        val applied = Option(appliedDir.get(sc)).contains(dir)
        val live = sc.getCheckpointDir.exists(_.contains(dir))
        if (!applied || !live) {
          sc.setCheckpointDir(dir); appliedDir.put(sc, dir); ()
        }
        // persist-before-checkpoint: reliable checkpoint materializes the
        // RDD in a SEPARATE job that re-runs the lineage — without the
        // persist every site would compute its expensive upstream twice
        // (and side-effect jobs, e.g. accumulator-folded convergence
        // counts, would double-fire). SERIALIZED level: a deserialized
        // cache of a corpus-scale frame unrolls java objects faster
        // than G1 can evict (humongous-allocation + GCLocker stalls →
        // heap OOM long before the disk tier engages — the round-15
        // sf100 sweep died exactly this way in pipeline_e2e's row-index
        // snapshot); serialized blocks are compact and stream to disk.
        ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        // Reliable mode is always EAGER, even when the caller asked for
        // lazy: the persist can only be released once the checkpoint has
        // materialized, and a lazy reliable checkpoint would pin a
        // corpus-scale MEMORY_AND_DISK frame per call site for the whole
        // session (evicting useful blocks on a long-running cluster).
        // Every engine site consumes its frame immediately, so eager
        // merely moves the same job a moment earlier.
        val cp = ds.checkpoint(eager = true)
        // checkpoint files exist; the hot cache is no longer needed
        // (blocking=false, so no extra job)
        ds.unpersist(blocking = false)
        cp
      case None =>
        // same serialized rationale as the reliable arm: the default
        // deserialized MEMORY_AND_DISK is the level that heap-OOMed the
        // 48g sf100 sweep; serialized snapshots spill instead of dying
        ds.localCheckpoint(
          eager, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    }
  }
}
