package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** `z_value(c1, c2, …)` → long: bit-interleaved Z-order (Morton) value
  * of 2+ non-negative integer columns, `bits` low bits each (LSB-first
  * interleave, so the HIGH bits of every column land in the HIGH bits of
  * the z-value — the property that makes a range over the z-value
  * correlate with ranges over each input column).
  *
  * The multi-column counterpart of single-key sorted layout: sorting by
  * one key makes its zone maps selective and every other column's
  * useless, while sorting by the z-value keeps per-file min/max ranges
  * narrow in ALL interleaved columns at once (each at ~sqrt of the
  * single-key selectivity for two columns — the standard Z-order trade).
  *
  * Inputs must be non-negative and fit in `bits` bits; values are
  * clamped into range (negatives to 0), because a silent two's-complement
  * interleave would order negatives ABOVE positives and destroy the
  * correlation the layout exists for. Null in any column → null (the
  * range partitioner groups nulls together first). Bucket/rank wider or
  * signed columns before interleaving. */
case class ZOrderValue(children: Seq[Expression], bits: Int)
    extends Expression with CodegenFallback {
  require(children.size >= 2, "z_value needs at least 2 columns")
  require(bits >= 1 && bits * children.size <= 63,
    s"need 1 <= bits and bits*cols <= 63 (got $bits x ${children.size})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  // plan-time rejection of non-interleavable layout columns — without
  // this a string/decimal column passes analysis and fails per-row at
  // execution, after the write job has already shuffled data. Date IS
  // interleavable (Int days, ~15 bits — fits the <=31-bit budget);
  // raw timestamps are NOT: they evaluate to epoch MICROS (~2^60),
  // which can never fit the <=31 representable bits, so every realistic
  // value clamps to the max — a silently degenerate constant layout.
  // Writers.writeZOrderedParquet min-subtracts and rescales all layout
  // columns (timestamps included) before interleaving; anyone calling
  // z_value directly must do the same.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    children.zipWithIndex.collectFirst {
      case (c, i) if c.dataType == TimestampType || c.dataType == TimestampNTZType =>
        TypeCheckResult.TypeCheckFailure(
          s"z_value: argument ${i + 1} is ${c.dataType.simpleString} — epoch " +
            "microseconds never fit the interleave bit budget and would clamp " +
            "to a constant; rescale first (Writers.writeZOrderedParquet does " +
            "this automatically, or cast to date / min-subtract and bucket)")
      case (c, i) if !(c.dataType match {
        case ByteType | ShortType | IntegerType | LongType | DateType => true
        case _ => false
      }) =>
        TypeCheckResult.TypeCheckFailure(
          s"z_value requires integral columns; argument ${i + 1} is " +
            s"${c.dataType.simpleString} (bucket/rank non-integer columns " +
            "before interleaving)")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      val x = v match {
        case l: Long => l
        case j: Int => j.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case other => throw new IllegalArgumentException(
          s"z_value: integer column required, got $other (${children(i).dataType})")
      }
      val max = (1L << bits) - 1
      vals(i) = if (x < 0) 0L else if (x > max) max else x
      i += 1
    }
    var z = 0L
    var b = 0
    while (b < bits) {
      var c = 0
      while (c < n) {
        z |= ((vals(c) >>> b) & 1L) << (b * n + c)
        c += 1
      }
      b += 1
    }
    z
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderValue =
    copy(children = newChildren)
}

object LayoutFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def zValue(bits: Int, cols: Column*): Column =
    toCol(ZOrderValue(cols.map(toExpr), bits))
}
