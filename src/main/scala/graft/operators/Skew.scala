package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key joins and aggregations.
  *
  * AQE's skew-join splitting handles most cases at runtime; salting is
  * the explicit tool for the pathological ones (one key = 30% of a
  * 100 TB fact table) and for aggregations, which AQE does not split.
  */
object Skew {

  /** Salted inner equi-join: each row of the skewed (big) side gets a
    * per-row salt; the small side is replicated `saltFactor` times. Hot
    * keys spread over `saltFactor` reducers at the cost of replicating
    * the build side — the classic trade. The salt comes from
    * `monotonically_increasing_id` (per-row, never constant), NOT from
    * payload columns — identical payloads on a hot key would otherwise
    * hash to one salt and re-funnel the key through a single reducer.
    * Result is row-identical to `big.join(small, keys)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key. Exact for decomposable
    * aggregates (sum/count/min/max). Salt is per-row (not value-derived —
    * a hot key whose rows all carry the same value would otherwise
    * collapse into one salt and stay skewed). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as("sum"), sum("__pcnt").as("count"))
  }
}
