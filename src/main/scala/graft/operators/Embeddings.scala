package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage/shaping operators: L2 normalization and symmetric
  * int8 quantization. At corpus scale the embedding table is the
  * largest artifact after raw text (e.g. 1024-dim float32 = 4 KiB/row);
  * int8 cuts it 4× and is the standard serving/index format.
  *
  * All math follows the engine-parity discipline of
  * [[graft.functions.VectorFunctions]]: element casts widen float→double
  * (exact), per-element ops are IEEE double, and rounding is the
  * explicit `floor(x + 0.5)` (half-toward-+inf) — `round()` half-mode
  * conventions differ between engines, `floor` is exact everywhere.
  */
object Embeddings {

  private def asDouble(vec: Column): Column = transform(vec, _.cast("double"))

  /** Symmetric per-vector int8 quantization: scale = max|v|/127,
    * q_i = floor(v_i/scale + 0.5) ∈ [−127, 127]. All-zero (or empty)
    * vectors quantize to zeros with scale 0 — the division guard, not a
    * data error. Dequantization is q_i · scale with max error scale/2. */
  def quantizeInt8Columns(vec: Column): (Column, Column) = {
    val v = asDouble(vec)
    val maxabs = array_max(transform(v, abs(_)))
    val scale = when(maxabs > 0.0, maxabs / 127.0).otherwise(lit(0.0))
    // the scale must reach the per-element division WITHOUT sitting
    // inside the lambda body: any non-bound subtree in a HOF lambda is
    // re-evaluated per ELEMENT (O(d²) here — the kgrams/chunk trap).
    // zip_with evaluates both array arguments once; array_repeat carries
    // the scalar in as a bound variable.
    val q = when(maxabs > 0.0,
      zip_with(v, array_repeat(scale, size(v)),
        (x, s) => floor(x / s + 0.5).cast("int")))
      .otherwise(transform(v, _ => lit(0)))
    (scale, q)
  }

  /** One row per vector: (idCol, scale, q). */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (scale, q) = quantizeInt8Columns(col(vecCol))
    df.select(col(idCol), scale.as("scale"), q.as("q"))
  }

  /** L2-normalized copy of the vector (zero vectors pass through as
    * zeros rather than NaN). Same zip_with/array_repeat shape as
    * [[quantizeInt8Columns]]: the norm inside a `transform` lambda
    * would re-run the whole sum-of-squares per ELEMENT (O(d²)/row). */
  def l2Normalize(vec: Column): Column = {
    val v = asDouble(vec)
    val n = sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))
    when(n > 0.0,
      zip_with(v, array_repeat(n, size(v)), (x, nn) => x / nn))
      .otherwise(v)
  }
}
