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
  * sort-merge join, no range explosion, no per-key driver loop.
  *
  * Skew caveat: the window requires each key wholly in one partition, so
  * a single pathologically hot key IS a straggler (AQE splits skewed
  * joins, not window exchanges). For such keys, pre-split by coarse time
  * range and as-of join range-locally, seeding each range with the last
  * right row of the previous one.
  *
  * Null semantics match SQL joins: a NULL key or NULL timestamp never
  * matches — such left rows surface with null right columns; such right
  * rows are ignored.
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
    val outRightNames = {
      val taken = scala.collection.mutable.Set(leftCols: _*)
      rightPayloadCols.map { c =>
        var out = c
        while (taken.contains(out)) out = rightPrefix + out
        taken += out
        out
      }
    }

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

    def project(df: DataFrame, matched: Column): DataFrame =
      df.select(
        leftCols.map(c => col(s"__lp.$c").as(c)) ++
          rightPayloadCols.zip(outRightNames).map { case (c, out) =>
            matched.getField(c).as(out)
          }: _*)

    val validKey = col("__k").isNotNull && col("__t").isNotNull
    val carried = l.filter(validKey)
      .unionByName(r.filter(validKey))
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__isL"))
    // SQL null semantics: left rows with null key/ts never match
    val unmatchable = l.filter(!validKey)
      .withColumn("__m", col("__rp"))
    project(carried, col("__m")).unionByName(project(unmatchable, col("__m")))
  }
}
