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
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        ds.checkpoint(eager = eager)
      case None =>
        ds.localCheckpoint(eager = eager)
    }
  }
}
