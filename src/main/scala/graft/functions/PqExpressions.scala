package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for product quantization (PQ) — the
  * memory-bound ANN scale path: a d-dim vector is split into `m`
  * subvectors, each quantized to one of `k` per-subspace centroids, so a
  * 64-dim float vector (256 B) compresses to m bytes of codes + one
  * norm. Query scoring never touches the original vectors: an
  * asymmetric-distance (ADC) lookup table of m×k partial dot products is
  * built once per query, and each corpus row costs m table lookups.
  *
  * Expressions, not UDFs, for the same reasons as [[Hashing]]: they
  * serialize into the plan with the codebooks as literals (broadcast
  * with the task binary — model-params-sized), avoid per-row closure
  * SerDe, and keep null propagation Catalyst-native. Like
  * [[HashEval]]'s expressions, each implements `doGenCode` as a static
  * call into the same helper `nullSafeEval` uses (codebooks ride along
  * via `addReferenceObj`), so the ADC scan stays inside whole-stage
  * codegen; array results are `UnsafeArrayData.fromPrimitiveArray` —
  * no per-element boxing.
  *
  * Shared conventions (match [[NearestCentroids]]): null vector or null
  * element → null; any NaN element → null (a NaN subvector would
  * otherwise quantize to an arbitrary cell); a dimension mismatch with
  * the codebook throws — that is a CONFIG error, not a data condition,
  * and nulling it would silently drop the corpus.
  */
private[graft] object PqShared {
  /** Read a numeric array column into doubles, or null on null/NaN. */
  def readVec(arr: ArrayData, isFloat: Boolean, mayHoldNull: Boolean): Array[Double] = {
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (mayHoldNull && arr.isNullAt(i)) return null
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (java.lang.Double.isNaN(x)) return null
      out(i) = x
      i += 1
    }
    out
  }

  def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  def elemMayBeNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull
}

/** Static-forwarder eval bodies for the PQ expressions — the
  * interpreted and generated paths share them (see [[HashEval]]). */
object PqEval {
  /** null when the vector has a null/NaN element. */
  def pqEncode(input: ArrayData, codebooks: Array[Array[Array[Double]]],
      halfNormSq: Array[Array[Double]], subDim: Int,
      isFloat: Boolean, mayNull: Boolean): ArrayData = {
    val m = codebooks.length
    val v = PqShared.readVec(input, isFloat, mayNull)
    if (v == null) return null
    if (v.length != m * subDim)
      throw new IllegalArgumentException(
        s"PqEncode: vector dim ${v.length} != m*subDim = ${m * subDim}")
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * subDim
      val cb = codebooks(mi)
      val hn = halfNormSq(mi)
      var best = 0
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var s = hn(j)
        var d = 0
        while (d < subDim) { s += v(off + d) * c(d); d += 1 }
        if (s > bestScore) { bestScore = s; best = j }
        j += 1
      }
      codes(mi) = best
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  /** null when the vector has a null/NaN element. */
  def pqLut(input: ArrayData, codebooks: Array[Array[Array[Double]]],
      k: Int, subDim: Int, isFloat: Boolean, mayNull: Boolean): ArrayData = {
    val m = codebooks.length
    val v = PqShared.readVec(input, isFloat, mayNull)
    if (v == null) return null
    if (v.length != m * subDim)
      throw new IllegalArgumentException(
        s"PqLut: vector dim ${v.length} != m*subDim = ${m * subDim}")
    val lut = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      val off = mi * subDim
      val cb = codebooks(mi)
      var j = 0
      while (j < k) {
        val c = cb(j)
        var s = 0.0
        var d = 0
        while (d < subDim) { s += v(off + d) * c(d); d += 1 }
        lut(mi * k + j) = s
        j += 1
      }
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(lut)
  }

  def pqAdcDot(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    if (lut.numElements() != m * k)
      throw new IllegalArgumentException(
        s"PqAdcDot: lut length ${lut.numElements()} != m*k = ${m * k}")
    var s = 0.0
    var mi = 0
    while (mi < m) {
      s += lut.getDouble(mi * k + codes.getInt(mi))
      mi += 1
    }
    s
  }
}

/** `pq_encode(vec)` → `array<int>` of `m` codebook indices: per
  * subspace, the centroid minimizing squared L2 distance (argmin over
  * ‖x−c‖² = argmax over dot(x,c) − ‖c‖²/2 — centroid norms are
  * precomputed once). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "PqEncode needs non-empty codebooks")
  private val m = codebooks.length
  private val subDim = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == subDim)),
    "all codebook centroids must share one subspace dimension")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  // −‖c‖²/2 per (subspace, centroid), folded into the argmax
  private lazy val halfNormSq: Array[Array[Double]] =
    codebooks.map(_.map(c => -0.5 * c.map(x => x * x).sum))
  private lazy val isFloat = PqShared.elemIsFloat(child)
  private lazy val mayNull = PqShared.elemMayBeNull(child)

  override protected def nullSafeEval(input: Any): Any =
    PqEval.pqEncode(input.asInstanceOf[ArrayData], codebooks, halfNormSq,
      subDim, isFloat, mayNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val hn = ctx.addReferenceObj("halfNormSq", halfNormSq, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("pqCodes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.PqEval.pqEncode($c, $cb, $hn, $subDim, $isFloat, $mayNull);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_lut(query_vec)` → `array<double>` of length m·k: entry
  * `mi·k + j` is dot(query_sub(mi), codebook(mi)(j)) — the per-query ADC
  * table. Built ONCE per query row; every corpus row then scores with m
  * lookups via [[PqAdcDot]]. */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "PqLut needs non-empty codebooks")
  private val m = codebooks.length
  private val k = codebooks(0).length
  private val subDim = codebooks(0)(0).length
  require(codebooks.forall(cb => cb.length == k && cb.forall(_.length == subDim)),
    "PqLut needs a rectangular m×k×subDim codebook")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val isFloat = PqShared.elemIsFloat(child)
  private lazy val mayNull = PqShared.elemMayBeNull(child)

  override protected def nullSafeEval(input: Any): Any =
    PqEval.pqLut(input.asInstanceOf[ArrayData], codebooks, k, subDim,
      isFloat, mayNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("pqLut")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.PqEval.pqLut($c, $cb, $k, $subDim, $isFloat, $mayNull);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** `pq_adc_dot(codes, lut)` → double: Σ_mi lut[mi·k + codes[mi]] — the
  * approximate dot product of the encoded corpus vector with the query
  * whose table this is. */
case class PqAdcDot(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, s"PqAdcDot needs k >= 1 (got $k)")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(codesAny: Any, lutAny: Any): Any =
    java.lang.Double.valueOf(PqEval.pqAdcDot(
      codesAny.asInstanceOf[ArrayData], lutAny.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PqEval.pqAdcDot($a, $b, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    toCol(PqEncode(toExpr(vec), codebooks))
  def pqLut(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    toCol(PqLut(toExpr(vec), codebooks))
  def pqAdcDot(codes: Column, lut: Column, k: Int): Column =
    toCol(PqAdcDot(toExpr(codes), toExpr(lut), k))
}
