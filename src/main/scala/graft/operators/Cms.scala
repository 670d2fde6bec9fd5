package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Count–min sketch (Cormode & Muthukrishnan 2005) over a key column —
  * BOUNDED-MEMORY frequency estimation for cardinality-explosive keys
  * (raw web-corpus vocabulary, URL hosts, n-grams) where the exact
  * two-phase count's reducer state is itself the problem. The sketch
  * is depth × width counters: est(k) = min over rows r of
  * counter[r][h_r(k)], never an underestimate, and over the true count
  * by more than εN only with probability δ (ε = e/width,
  * δ = e^-depth).
  *
  * Spark-first shape: the sketch IS a (row, bucket, cnt) DataFrame of
  * at most depth·width rows — built by one explode(depth) + two-phase
  * count whose SHUFFLE KEY SPACE is depth·width regardless of key
  * cardinality (the whole point: a 10-billion-term vocabulary still
  * reduces into 4×65536 cells, combiner-collapsed map-side), and
  * MERGEABLE by construction: sketches of two corpus halves sum
  * cell-wise into the sketch of the union (CmsSpec pins it). Row
  * hashes are disjoint windows of the engine-portable md5 hex fold
  * ([[HashFunctions.md5HexFoldAt]]), so estimates replay
  * bit-identically in a SQL oracle and across reruns.
  *
  * Estimation joins the probe terms' (row, bucket) cells against the
  * broadcast sketch (≤ depth·width rows, bounded by construction) and
  * takes the per-term min — map-side except one bounded-key shuffle.
  *
  * Hashing: row r folds hex digits [6r+1, 6r+6] of md5(key#cms)
  * (depth ≤ 5 fits the 32 digits) through the NATIVE
  * [[graft.functions.Md5HexFold]] expression — one in-expression
  * digest per (row, occurrence), no hex-string materialization, no
  * per-digit substring/ascii trees. Value-identical to the original
  * declarative fold (HashCodegenSpec pins it); the declarative form's
  * history is instructive: inlining md5 into the fold re-evaluated it
  * 6× per digit (measured 15 s → ~3 s on the sf0.1 sketch when first
  * hoisted to its own projection), and the native expression removes
  * the remaining per-digit tree cost as well (round 17). */
object Cms {

  /** The salted key every row's fold digests. */
  private def cmsKey(key: Column): Column =
    concat(key.cast("string"), lit("#cms"))

  /** Row r's bucket: the [6r+1, 6r+6] hex window of md5(key#cms) —
    * value-identical to the original declarative
    * `md5HexFoldAt(md5(key#cms), 1+6r, width)` (HashCodegenSpec pins
    * the fold identity); native per-row digest, so the depth×6
    * substring/ascii trees over a materialized hex attribute are gone
    * (r17 — the fold was the sketch build's dominant per-row cost). */
  private[operators] def cmsCell(key: Column, row: Int, width: Int): Column =
    HashFunctions.md5FoldAt(cmsKey(key), 1 + 6 * row, width.toLong)

  private def requireShape(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 5,
      s"depth must be in [1,5] (got $depth) — rows fold disjoint 6-digit windows of one md5")
    require(width >= 2 && width <= (1 << 20) && (width & (width - 1)) == 0,
      s"width must be a power of two in [2, 2^20] (got $width) — " +
        "the md5 fold is unbiased only for divisors of 16^6")
  }

  /** Build the sketch over `keyCol` occurrences (one increment per
    * row; null keys are skipped — they have no frequency to estimate).
    * Output: (row, bucket, cnt), at most depth·width rows. */
  def cmsSketch(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 4096): DataFrame = {
    requireShape(depth, width)
    val k = col(keyCol)
    df.filter(k.isNotNull)
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("row"), cmsCell(k, r, width).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each distinct key in `probes`:
    * (key, est) with est = min over rows of the key's cell counter
    * (0 when a cell was never touched). Never underestimates. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 4096): DataFrame = {
    requireShape(depth, width)
    val k = col(keyCol)
    val cells = probes.select(k.as("key")).filter(col("key").isNotNull).distinct()
      .select(col("key"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("row"), cmsCell(col("key"), r, width).as("bucket"))): _*)).as("c"))
      .select(col("key"), col("c.row").as("row"), col("c.bucket").as("bucket"))
    cells.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .withColumnRenamed("key", keyCol)
  }
}
