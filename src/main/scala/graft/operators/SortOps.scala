package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O1 — multi-column sort with per-column direction AND per-column null
  * placement, plus the reference's 5-state header-click cycle
  * (reference sort.rs:10-61, data_container.rs:247-309).
  *
  * Scale notes: Spark's distributed sort is range-partitioned (sampled
  * boundaries) — no single-reducer bottleneck. It is NOT stable; the
  * reference sorts with `maintain_order(true)`, so [[stableSort]] appends
  * `monotonically_increasing_id()` as the final tiebreaker key: it is
  * partition-prefixed (partitionId << 33 | offset), so it preserves the
  * frame's current row order — which is all a tiebreaker needs — with
  * zero extra jobs, staying inside Tungsten. (Contiguity would require
  * the zipWithIndex round-trip; only T6's user-facing row index needs
  * that.)
  */
object SortOps {

  final case class SortBy(column: String, ascending: Boolean, nullsLast: Boolean)

  def sortCol(s: SortBy): Column = (s.ascending, s.nullsLast) match {
    case (true, true)   => col(s.column).asc_nulls_last
    case (true, false)  => col(s.column).asc_nulls_first
    case (false, true)  => col(s.column).desc_nulls_last
    case (false, false) => col(s.column).desc_nulls_first
  }

  /** Plain distributed sort (not stable). */
  def sort(df: DataFrame, criteria: Seq[SortBy]): DataFrame =
    if (criteria.isEmpty) df else df.orderBy(criteria.map(sortCol): _*)

  /** Stable sort honoring the reference's maintain_order semantics: equal
    * keys keep their pre-sort relative order. */
  def stableSort(df: DataFrame, criteria: Seq[SortBy]): DataFrame = {
    if (criteria.isEmpty) return df
    val tie = AddRowIndex.resolveUniqueName("__graft_order", df.columns.toSeq)
    df.withColumn(tie, monotonically_increasing_id())
      .orderBy(criteria.map(sortCol) :+ col(tie).asc: _*)
      .drop(tie)
  }

  // ---- 5-state header-click cycle (sort.rs:39-61, README.md:21-29) ------

  sealed trait SortState
  case object NotSorted extends SortState
  final case class Sorted(ascending: Boolean, nullsLast: Boolean) extends SortState

  /** NotSorted → Desc/NullsFirst → Asc/NullsFirst → Desc/NullsLast →
    * Asc/NullsLast → NotSorted. */
  def nextState(s: SortState): SortState = s match {
    case NotSorted             => Sorted(ascending = false, nullsLast = false)
    case Sorted(false, false)  => Sorted(ascending = true, nullsLast = false)
    case Sorted(true, false)   => Sorted(ascending = false, nullsLast = true)
    case Sorted(false, true)   => Sorted(ascending = true, nullsLast = true)
    case Sorted(true, true)    => NotSorted
  }

  /** Fold a header click on `column` into the cumulative criteria list:
    * the clicked column moves to (or leaves) the list, preserving the
    * precedence order of the others (data_container.rs:351-449). */
  def applyClick(criteria: Seq[SortBy], column: String): Seq[SortBy] = {
    val current: SortState = criteria.find(_.column == column)
      .map(s => Sorted(s.ascending, s.nullsLast): SortState).getOrElse(NotSorted)
    val rest = criteria.filterNot(_.column == column)
    nextState(current) match {
      case NotSorted      => rest
      case Sorted(a, n)   => rest :+ SortBy(column, a, n)
    }
  }
}
