package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap tuned for the graft engine.
  *
  * Scale notes (100 TB / 1000-executor design):
  *   - AQE on: runtime coalescing of shuffle partitions, skew-join
  *     splitting, and dynamic broadcast-join demotion all matter far more
  *     at cluster scale than in local[32].
  *   - `spark.sql.shuffle.partitions` is a *local* default (32); on a real
  *     cluster AQE's coalescing makes the initial number mostly a ceiling —
  *     set it to ~2-3x total cores there.
  *   - Timezone pinned to UTC so timestamp semantics match the DuckDB
  *     oracle and are cluster-invariant.
  */
object GraftSession {

  /** Apply graft's standard configuration to a builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    .config("spark.sql.parquet.aggregatePushdown", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    // bucketed tables (Writers.writeBucketed) need a writable warehouse;
    // keep it out of the working tree and per-user (a fixed shared /tmp
    // path would let concurrent users overwrite — and pre-own — each
    // other's table data). Real deployments override this.
    .config("spark.sql.warehouse.dir",
      s"/tmp/graft_warehouse_${sys.props.getOrElse("user.name", "anon")}")
    .config("spark.ui.enabled", "false")

  /** Local session for tests / CLI use. */
  def local(threads: Int = 4, shufflePartitions: Int = 32): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$threads]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
