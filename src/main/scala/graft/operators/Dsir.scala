package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose hashed n-gram
  * distribution looks like a small high-quality TARGET corpus — the
  * published, deterministic alternative to a trained quality
  * classifier for "make my crawl look like Wikipedia" selection.
  *
  * Method, exactly as published, re-expressed Spark-first:
  *   1. Features: unigrams + word bigrams hashed into `buckets`
  *      cells (the paper's hashed n-gram generative model).
  *   2. Fit smoothed bucket distributions p̂ (target) and q̂ (raw):
  *      p̂(b) = (c_p(b) + k) / (T_p + k·B).
  *   3. Per-doc importance weight:
  *      log w(d) = Σ_features [ln p̂(b(f)) − ln q̂(b(f))].
  *   4. Gumbel top-k resample: keep the k docs maximizing
  *      log w(d) + g(d) — sampling WITHOUT replacement from the
  *      softmax of weights. The paper draws g ~ Gumbel(0,1); here g
  *      is DETERMINISTIC: u(d) = (md5-bucket(id) + 0.5) / 2^20,
  *      g = −ln(−ln u) — the [[Sampling.fineBucket]] engine-portable
  *      hash idiom, so the "random" draw replays bit-identically in
  *      any SQL engine and reruns are reproducible.
  *
  * Scale shape at 100 TB: the two distribution fits are one explode +
  * two-phase count each, reduced to EXACTLY `buckets` rows by the
  * hash — the whole model is B-row bounded BY CONSTRUCTION (the
  * paper's point: feature hashing caps model size regardless of
  * vocabulary), so it broadcasts safely. Per-doc weights are map-side
  * lookups plus one corpus-sized two-phase sum keyed by id
  * (explode_outer carries zero-feature docs, the
  * [[QualityClassifier]] discipline). The resample is
  * partial-then-final top-k ([[Similarity.topKPerKey]] with no keys):
  * ≤ k rows per partition reach the final rank, never the corpus. */
object Dsir {

  /** 2^20 — the fineBucket domain the Gumbel uniform draws from. */
  private val NoiseBuckets = 1048576.0

  /** First 6 md5 hex digits mod `buckets` — uniform exactly when
    * buckets divides 2^24 (hence the power-of-two requirement), and
    * verbatim-reproducible in any engine with md5 + ascii (the shared
    * [[graft.functions.HashFunctions.md5Fold6]] idiom). */
  private[operators] def hashBucket(key: Column, buckets: Int): Column =
    graft.functions.HashFunctions.md5Fold6(key, buckets.toLong)

  /** Unigrams ++ word bigrams over an ALREADY-TOKENIZED words column
    * (the DSIR feature set); tokenizer shared with the BM25/NB family,
    * bigram shape shared with [[TextAnalysis.bigramLmScore]]. Callers
    * stage `bm25Words(text)` in its OWN projection and pass the
    * attribute: this tree references the words array ~6× (the zip_with
    * slices plus the size guards), and an inlined words TREE would be
    * re-tokenized per reference — the bm25TopK two-step-select rule. */
  private[operators] def docFeaturesFromWords(w: Column): Column = {
    val bi = when(size(w) < 2, array().cast("array<string>"))
      .otherwise(slice(
        zip_with(w, slice(w, lit(2), size(w)), (a, b) => concat(a, lit(" "), b)),
        lit(1), size(w) - 1))
    concat(w, bi)
  }

  /** [[docFeaturesFromWords]] over raw text — TEST/SPEC convenience
    * only; hot paths stage the words array first. */
  private[operators] def docFeatures(text: Column): Column =
    docFeaturesFromWords(TextAnalysis.bm25Words(text))

  private def requirePow2(buckets: Int): Unit =
    require(buckets >= 2 && buckets <= (1 << 20) &&
        (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two in [2, 2^20] (got $buckets) — " +
        "non-divisors of 16^6 bias the hash fold")

  /** Per-document importance weights: (idCol, n_features, log_w).
    * Zero-feature docs get log_w = 0 (no evidence either way).
    *
    * The raw corpus is tokenized + hashed ONCE: the (id, bucket) frame
    * is materialized and feeds both the q̂ distribution fit and the
    * per-doc weight sum (the [[TextAnalysis.bigramLmScore]] docBi
    * discipline) — re-deriving it would pay the explode + per-feature
    * md5, the dominant cost, twice. */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 4096, smoothing: Double = 1.0): DataFrame = {
    requirePow2(buckets)
    require(smoothing > 0, s"smoothing must be positive (got $smoothing)")
    val spark = raw.sparkSession
    import spark.implicits._
    val id = col(idCol)
    // explode_OUTER: zero-feature docs ride as a null-bucket row so no
    // corpus re-join is needed downstream; the count frames filter the
    // sentinel out via count(bucket)/non-null grouping semantics.
    // widen BEFORE the explode: the per-feature md5 fold is the
    // operator's dominant per-row cost, and an unsplittable source
    // would otherwise run it on one core (Parallelism scaladoc)
    val feats = graft.Materialize.once(
      Parallelism.widen(raw.select(id, col(textCol)))
        .select(id, TextAnalysis.bm25Words(col(textCol)).as("__ws"))
        .select(id, explode_outer(docFeaturesFromWords(col("__ws"))).as("f"))
        .select(id, hashBucket(col("f"), buckets).as("bucket")))
    val k = lit(smoothing)
    val b = lit(buckets.toDouble)
    // explode_outer here too (r17): the inner form's inferred
    // size-filter would re-inline the feature tree below the exchange
    // (guide §4.4 duplication class); the explicit null filter on the
    // GENERATED attribute restores exactly the inner explode's row set.
    val p = Parallelism.widen(target.select(col(targetTextCol)))
      .select(TextAnalysis.bm25Words(col(targetTextCol)).as("__ws"))
      .select(explode_outer(docFeaturesFromWords(col("__ws"))).as("f"))
      .where(col("f").isNotNull)
      .select(hashBucket(col("f"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c_p"))
    val q = feats.filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("c_q"))
    // B-row model over the FULL [0, buckets) domain — empty cells carry
    // the smoothing floor, so scoring needs no out-of-model path.
    // Totals fold over the SAME B-row frame as a global window instead
    // of separate p.agg/q.agg scalar frames: each count frame (and with
    // it the full tokenize+hash fit behind it — the target pass, and a
    // corpus-sized re-aggregation of feats) used to execute TWICE, once
    // for its counts join and once for its total. Sum-of-longs over the
    // full domain is value-identical to the old scalar aggregates, and
    // the single-partition window is B-row bounded by construction
    // (requirePow2 caps buckets at 2^20).
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val model = spark.range(buckets).toDF("bucket")
      .join(p, Seq("bucket"), "left")
      .join(q, Seq("bucket"), "left")
      .withColumn("t_p", sum(coalesce(col("c_p"), lit(0L))).over(whole).cast("double"))
      .withColumn("t_q", sum(coalesce(col("c_q"), lit(0L))).over(whole).cast("double"))
      .select(col("bucket"),
        (log((coalesce(col("c_p"), lit(0L)).cast("double") + k) / (col("t_p") + k * b)) -
          log((coalesce(col("c_q"), lit(0L)).cast("double") + k) / (col("t_q") + k * b)))
          .as("llr"))
    // the model covers the full domain, so the left join misses ONLY
    // the null-feature sentinel rows explode_outer added for empty docs
    feats.join(broadcast(model), Seq("bucket"), "left")
      .groupBy(id)
      .agg(count(col("bucket")).as("n_features"),
        sum(when(col("bucket").isNull, lit(0.0)).otherwise(col("llr"))).as("log_w"))
  }

  /** Gumbel top-k importance resample: the `k` raw docs maximizing
    * log_w + deterministic Gumbel noise. Output (id, n_features,
    * log_w, gumbel_key, rank), rank 1..k. `rankRoundDp >= 0` ranks on
    * the ROUNDED key (id tiebreak) — the drift-free cross-engine rank
    * policy shared with [[TextAnalysis.bm25TopK]]. `saltTag` varies
    * the noise draw (two selections with different tags are
    * independent samples). */
  def dsirResample(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      buckets: Int = 4096, smoothing: Double = 1.0,
      saltTag: String = "#dsir", rankRoundDp: Int = -1): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val w = importanceWeights(raw, idCol, textCol, target, targetTextCol,
      buckets, smoothing)
    val u = (Sampling.fineBucket(concat(col(idCol).cast("string"), lit(saltTag)))
      .cast("double") + lit(0.5)) / lit(NoiseBuckets)
    val keyed = w
      .withColumn("gumbel_key", col("log_w") - log(-log(u)))
      .withColumnRenamed(idCol, "id")
    val rankKey = if (rankRoundDp >= 0) round(col("gumbel_key"), rankRoundDp)
                  else col("gumbel_key")
    Similarity.topKPerKey(keyed, Seq.empty, rankKey.desc, k)
      .select(col("id").as(idCol), col("n_features"), col("log_w"),
        col("gumbel_key"), col("rank").cast("long").as("rank"))
  }
}
