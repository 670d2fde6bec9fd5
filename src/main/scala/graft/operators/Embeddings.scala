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

  /** Deterministic Johnson–Lindenstrauss random projection: compress a
    * `inDim`-dim embedding column to `outDim` dims with a Rademacher
    * (±1) sign matrix, y_k = (1/√outDim)·Σ_i x_i·s(i,k) — the standard
    * dimensionality cut BEFORE sign-LSH / IVF / brute-force cosine at
    * corpus scale (a 4× dim cut is a 4× cut in every downstream ANN
    * scan's bytes and FLOPs, at a distance distortion JL bounds).
    *
    * The sign matrix is never sampled: s(i,k) is the low bit of an md5
    * fold of "rp#salt#i#k" (the [[Sampling.fineBucket]] engine-portable
    * idiom), so projections replay bit-identically anywhere, reruns are
    * reproducible, and a SQL oracle can re-derive the entire matrix.
    * A different `salt` is an independent draw.
    *
    * Scale shape: the outDim×inDim matrix is ONE nested-array literal
    * expression evaluated once in a 1-row frame and broadcast —
    * projection itself is a pure map-side zip_with/aggregate pass, no
    * shuffle, no explode (corpus rows never leave their partitions).
    * Vectors whose length ≠ inDim project to NULL (zip_with pads with
    * null and the sum propagates it) rather than silently mis-scaling. */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int, salt: String = "rp"): DataFrame = {
    require(inDim >= 1, s"inDim must be >= 1 (got $inDim)")
    require(outDim >= 1 && outDim <= inDim,
      s"outDim must be in [1, inDim=$inDim] (got $outDim)")
    val spark = df.sparkSession
    // ±1 from the low bit of md5's first hex digit — one digit is
    // enough for a single fair bit and keeps the oracle expression
    // short; the digit decode is the shared HashFunctions idiom
    def sign(i: Column, k: Column): Column = {
      val hv = graft.functions.HashFunctions.md5HexDigit(
        md5(concat_ws("#", lit("rp"), lit(salt),
          i.cast("string"), k.cast("string"))), 1)
      (pmod(hv, lit(2)) * 2 - 1).cast("double")
    }
    val matrix = spark.range(1).select(
      transform(sequence(lit(0), lit(outDim - 1)),
        k => transform(sequence(lit(0), lit(inDim - 1)), i => sign(i, k)))
        .as("rp_rows"))
    val invSqrtM = lit(1.0 / math.sqrt(outDim.toDouble))
    df.crossJoin(broadcast(matrix))
      // the double-cast is hoisted to its own projection so the lambda
      // below references a BOUND attribute — casting inside the
      // transform would re-cast the whole vector once per output dim
      // (the O(d²) HOF trap quantizeInt8Columns documents)
      .select(col(idCol), asDouble(col(vecCol)).as("__vd"), col("rp_rows"))
      .select(col(idCol),
        when(size(col("__vd")) === inDim,
          transform(col("rp_rows"), rk =>
            aggregate(zip_with(col("__vd"), rk, (x, s) => x * s),
              lit(0.0), (acc, x) => acc + x, s => s * invSqrtM)))
          .as("proj"))
  }
}
