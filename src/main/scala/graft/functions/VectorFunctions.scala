package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns,
  * built from codegen'd higher-order functions (`zip_with`, `aggregate`,
  * `transform`) — no UDFs, so the expressions stay inside whole-stage
  * codegen and survive column pruning / filter pushdown around them.
  *
  * All accumulation is forced to DoubleType in index order, which makes
  * results bit-deterministic for a given array (needed for oracle
  * hash-parity and for reproducible ANN results across retries at scale).
  */
object VectorFunctions {

  /** Elementwise product then ordered double-precision sum. Evaluated by
    * the native [[graft.functions.DotProduct]] expression — identical
    * accumulation order (and therefore bit-identical results) to the
    * equivalent `aggregate(zip_with(...))` composition, minus the
    * per-element lambda overhead. */
  def dot(a: Column, b: Column): Column = HashFunctions.dotProduct(a, b)

  def norm2(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(norm2(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given pre-computed norms (saves recomputing the per-row norm
    * in a top-k scan — at 100 TB the norm column is computed once and
    * stored, not recomputed per query). */
  def cosinePrenormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, x) => acc + x))
}
