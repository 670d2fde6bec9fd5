package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join — the other classic
  * operator Spark's join zoo lacks. A naive `ON p BETWEEN s AND e` plans
  * as a broadcast nested-loop / cartesian filter: O(|points|·|intervals|).
  *
  * The scalable shape is bucketization: intervals are exploded onto the
  * fixed-width buckets they cover, points map to one bucket, and the join
  * becomes an equi-join on bucket id + an exact residual filter. Cost is
  * O(|points| + Σ interval_width/bucketWidth) with a uniform hash key —
  * pick `bucketWidth` near the median interval width so most intervals
  * explode to ~2 buckets.
  */
object RangeJoin {

  /** Join each point row to every interval row whose [startCol, endCol]
    * contains it (inclusive). Numeric (long-castable) domains; for
    * timestamps pass epoch seconds. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must have disjoint column names (shared: ${shared.mkString(", ")}) — rename before joining")
    val p = points.withColumn("__bucket",
      floor(col(pointCol).cast("long") / bucketWidth))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol).cast("long") / bucketWidth),
        floor(col(endCol).cast("long") / bucketWidth))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol).cast("long").between(
        col(startCol).cast("long"), col(endCol).cast("long")))
      .drop("__bucket")
  }
}
