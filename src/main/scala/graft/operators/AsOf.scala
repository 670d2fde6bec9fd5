package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (backward-looking) join: each left row picks the
  * most recent right row with the same key and right.ts <= left.ts —
  * the canonical event-enrichment operator (trades↔quotes,
  * event↔latest-profile) that Spark's join zoo lacks.
  *
  * Implementation is the union-and-carry pattern, the scalable shape:
  * both sides are tagged and unioned, hash-partitioned by key ONCE, and
  * sorted within each key by (ts, side); a running `last(right payload,
  * ignoreNulls)` window then carries the latest right row forward into
  * every left row. One shuffle + one sort — same cost as a single
  * sort-merge join, no range explosion, no per-key driver loop. Skewed
  * keys are split by AQE like any other sort; the window is
  * partition-local after the exchange.
  *
  * Tie semantics: a right row at exactly left.ts matches (>=). Right
  * rows must be unique per (key, ts) for a deterministic result —
  * pre-aggregate duplicates (see the asof gate query) as with any as-of
  * engine.
  */
object AsOf {

  /** Left as-of join. Output: all left columns plus the matched right
    * columns (null when no earlier right row exists). Right columns that
    * collide with left names get `rightPrefix`. */
  def joinAsOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPrefix: String = "r_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayloadCols = right.columns.toSeq.filterNot(c => c == rightKey)
    val outRightNames = rightPayloadCols.map(c =>
      if (leftCols.contains(c)) rightPrefix + c else c)

    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"), lit(true).as("__isL"),
      struct(leftCols.map(col): _*).as("__lp"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        right.select(rightPayloadCols.map(col): _*).schema.fields)).as("__rp"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__t"), lit(false).as("__isL"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("__lp"),
      struct(rightPayloadCols.map(col): _*).as("__rp"))

    // right rows sort BEFORE left rows at equal ts → `>=` match semantics
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__isL").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__isL"))
      .select(
        leftCols.map(c => col(s"__lp.$c").as(c)) ++
          rightPayloadCols.zip(outRightNames).map { case (c, out) =>
            col(s"__m.$c").as(out)
          }: _*)
  }
}
