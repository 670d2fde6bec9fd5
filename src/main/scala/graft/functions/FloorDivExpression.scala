package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types._

/** Polars' `//` floor division as a native Catalyst expression, exact
  * over the FULL int64 range.
  *
  * The SQL-dialect rewrite used to emit `FLOOR(l / r)`: Spark's `/`
  * promotes integers to double, so for |operands| ≥ 2^53 the quotient
  * silently loses ulps and the floor diverges from Polars' exact int64
  * `//` (reference: polars `Expr::floor_div`, exercised via the SQL
  * `//` operator — src/sql.rs query surface). This expression
  * dispatches on the RESOLVED input types instead — which a text-level
  * SQL rewrite cannot do:
  *
  *   - both integral → inputs coerce to LONG, result is
  *     `Math.floorDiv(l, r)` — bit-exact for every int64 pair
  *     (`Long.MinValue // -1` overflows to Long.MinValue, same as
  *     Java/Polars wrapping semantics);
  *   - anything else (float/double/decimal) → inputs coerce to DOUBLE
  *     and the result is `floor(l / r)` cast to long, byte-identical
  *     to the previous FLOOR(l/r) form for doubles (NaN → 0,
  *     ±Infinity saturates, the IEEE cases included);
  *   - divisor 0 → NULL in both paths, matching Spark's own non-ANSI
  *     division and DuckDB/Polars `//`.
  *
  * Registered per-session as the SQL function `GRAFT_FLOORDIV` by
  * [[graft.sql.GraftSql]]; [[graft.sql.SqlRewriter.rewriteFloorDiv]]
  * rewrites `a // b` into calls of it. Real `doGenCode` (two branch-free
  * intrinsics), so `//`-heavy projections stay inside one
  * WholeStageCodegen span.
  */
case class FloorDiv(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  }
  private def bothIntegral: Boolean =
    isIntegral(left.dataType) && isIntegral(right.dataType)

  // Seq is covariant, so Seq[DataType] satisfies ExpectsInputTypes'
  // Seq[AbstractDataType] without naming the private[sql] supertype
  override def inputTypes: Seq[DataType] =
    if (bothIntegral) Seq(LongType, LongType) else Seq(DoubleType, DoubleType)

  override def dataType: DataType = LongType

  // divisor 0 yields NULL even for non-null inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    if (bothIntegral) {
      val rl = r.asInstanceOf[Long]
      if (rl == 0L) null else Math.floorDiv(l.asInstanceOf[Long], rl)
    } else {
      val rd = r.asInstanceOf[Double]
      if (rd == 0.0) null
      else Math.floor(l.asInstanceOf[Double] / rd).toLong
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      if (bothIntegral) {
        s"""
           |if ($r == 0L) { ${ev.isNull} = true; }
           |else { ${ev.value} = java.lang.Math.floorDiv($l, $r); }
         """.stripMargin
      } else {
        s"""
           |if ($r == 0.0D) { ${ev.isNull} = true; }
           |else { ${ev.value} = (long) java.lang.Math.floor($l / $r); }
         """.stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloorDiv =
    copy(left = newLeft, right = newRight)
}
