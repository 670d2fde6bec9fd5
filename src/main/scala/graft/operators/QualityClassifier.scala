package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

import graft.Materialize

/** Corpus-trained document quality classifier — the fastText-style
  * "does this look like reference text?" gate from the CCNet / GPT-3 /
  * LLaMA data pipelines, expressed as distributed multinomial Naive
  * Bayes over unigram counts (the linear log-count model those
  * classifiers reduce to; training is pure counting, so the fit is
  * deterministic and engine-reproducible — no SGD order-dependence).
  *
  * Train: label a seed set (curated reference text = true, raw crawl =
  * false), fit log-probabilities per token; score: every document gets
  * the log-odds `logit = ln P(pos|d) − ln P(neg|d)` and a keep/drop
  * decision at logit > 0. The reference app has no trained classifier
  * (its curation is heuristic); this is the scale-tier counterpart to
  * [[graft.operators.Curation.withQualityPolicy]]'s rule-based gate,
  * the way `bigramLmScore` is the trained counterpart to the TextStats
  * heuristics.
  *
  * Model (add-k multinomial NB, binary labels, OOV-reserving vocab):
  *   - Vocabulary = top `vocabSize` tokens by total count (count desc,
  *     token asc — a TOTAL order, so the cap is deterministic).
  *   - For t in V: lp_c(t) = ln((c_c(t) + k) / (T_c + k·(|V|+1)))
  *     with T_c = Σ_{t∈V} c_c(t); the +1 reserves one OOV slot, so
  *     out-of-vocabulary tokens score lp_oov_c = ln(k / (T_c + k·(|V|+1))).
  *   - Priors from document counts: lp_prior_c = ln(n_c / n).
  *
  * Per-token contributions are assembled as a single `lp_diff =
  * lp_pos − lp_neg` column at TRAIN time — both from exact integer
  * counts, so lp_diff is a pure bit-reproducible function of the
  * counts; scoring sums lp_diff per document (the only
  * order-sensitive float fold, absorbed by emitting scores rounded).
  *
  * Scale shape at 100 TB: training is one explode + one two-phase
  * conditional count keyed by token (combiner-reduced), a top-V
  * TakeOrdered (V·partitions fan-in, never a global sort), and 1-row
  * total/prior frames riding as broadcasts. The CAPPED model is ≤ V
  * rows by construction — the one vocab-shaped frame that is SAFE to
  * broadcast-hint (contrast `bigramLmScore`'s uncapped model, which
  * deliberately carries no hint). Scoring is map-side against that
  * broadcast plus one corpus-sized two-phase sum keyed by doc id —
  * the same single-shuffle shape as `text_lm_score`.
  *
  * Tokenizer is [[TextAnalysis.bm25Words]] — shared with the BM25
  * scorer/index so retrieval and classification can never tokenize
  * differently. */
object QualityClassifier {

  /** A fitted binary NB model: `termLogProbs` is the ≤ vocabSize-row
    * (term, lp_diff) frame; `stats` is ONE row carrying
    * (lp_oov_diff, lp_prior_diff) — both stay lazy DataFrames so
    * training composes into the caller's plan like every other
    * operator (nothing executes until the scored frame does). */
  final case class NbModel(termLogProbs: DataFrame, stats: DataFrame)

  /** Fit the classifier on `docs` where `labelCol` is a non-null
    * BOOLEAN seed label (true = quality/positive). */
  def trainNbQuality(docs: DataFrame, labelCol: String, textCol: String,
      vocabSize: Int = 1 << 16, smoothing: Double = 1.0): NbModel = {
    require(vocabSize >= 1, s"vocabSize must be >= 1 (got $vocabSize)")
    require(smoothing > 0, s"smoothing must be positive (got $smoothing)")
    require(docs.schema(labelCol).dataType == BooleanType,
      s"label column '$labelCol' must be BOOLEAN (true = positive class), " +
        s"got ${docs.schema(labelCol).dataType.simpleString}")
    // a NULL label is a broken seed set, not a negative example — the
    // otherwise(...) branches below would silently count it as class
    // false and bias the fit. raise_error keeps the check lazy (fires
    // on the first null row at training time) — same loud-failure
    // philosophy as the ln(0) prior note below.
    val lbl = coalesce(when(col(labelCol).isNotNull, col(labelCol)),
      raise_error(concat(lit(s"trainNbQuality: null label in '$labelCol' — " +
        "seed labels must be non-null booleans"))).cast(BooleanType))
    // explode_OUTER + null filter above the Generate: an inner explode
    // makes the optimizer infer `size(words) > 0` and push the full
    // tokenizer tree into a per-row scan filter — every training doc
    // would tokenize twice (TextAnalysis.bm25TopK documents the class)
    val toks = docs.select(lbl.as("label"),
      explode_outer(TextAnalysis.bm25Words(col(textCol))).as("term"))
      .where(col("term").isNotNull)
    val counts = toks.groupBy("term").agg(
      sum(when(col("label"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(col("label"), 0L).otherwise(1L)).as("c_neg"))
    // deterministic cap: (total desc, term asc) is a total order
    val vocab = Materialize.once( // consumed twice: totals AND the model
      counts.orderBy((col("c_pos") + col("c_neg")).desc, col("term"))
        .limit(vocabSize))
    val k = lit(smoothing)
    val totals = vocab.agg(
      sum("c_pos").cast("double").as("t_pos"),
      sum("c_neg").cast("double").as("t_neg"),
      count(lit(1)).cast("double").as("v_size"))
      // all-empty-docs corpus: no vocab rows → sums are NULL; zero
      // totals keep the smoothed model well-defined (everything OOV)
      .select(coalesce(col("t_pos"), lit(0.0)).as("t_pos"),
        coalesce(col("t_neg"), lit(0.0)).as("t_neg"),
        col("v_size"))
    def denomPos = col("t_pos") + k * (col("v_size") + lit(1.0))
    def denomNeg = col("t_neg") + k * (col("v_size") + lit(1.0))
    val termLp = vocab.crossJoin(broadcast(totals))
      .select(col("term"),
        (log((col("c_pos").cast("double") + k) / denomPos) -
          log((col("c_neg").cast("double") + k) / denomNeg)).as("lp_diff"))
    val priors = docs.agg(
      sum(when(lbl, 1L).otherwise(0L)).cast("double").as("n_pos"),
      sum(when(lbl, 0L).otherwise(1L)).cast("double").as("n_neg"))
    // ln(0) = -Inf when a class has no seed docs — the caller's seed
    // set is broken and every logit becomes ±Inf/NaN, loudly visible;
    // a silent epsilon here would hide the bad seed instead.
    val stats = totals.crossJoin(broadcast(priors))
      .select(
        (log(k / denomPos) - log(k / denomNeg)).as("lp_oov_diff"),
        (log(col("n_pos") / (col("n_pos") + col("n_neg"))) -
          log(col("n_neg") / (col("n_pos") + col("n_neg")))).as("lp_prior_diff"))
    NbModel(termLp, stats)
  }

  /** Score documents: (idCol, n_tokens, logit, keep) with
    * logit = lp_prior_diff + Σ_tokens lp_diff(token) (OOV tokens take
    * lp_oov_diff) and keep = logit > 0. Zero-token docs score the
    * prior alone — explode_OUTER keeps them as a null-term row through
    * the per-doc aggregate, so the whole scoring pass is broadcast
    * joins plus EXACTLY ONE corpus-sized shuffle (the two-phase sum
    * keyed by id); a plain explode would need a corpus-sized re-join
    * with `docs` just to resurrect the empty documents. Emit
    * `round(logit, dp)` for cross-engine comparison — the per-doc sum
    * is the one order-sensitive fold. */
  def scoreNbQuality(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame = {
    val id = col(idCol)
    val toks = docs.select(id, explode_outer(
      TextAnalysis.bm25Words(col(textCol))).as("term"))
    // the capped model is ≤ vocabSize rows — the broadcast hint is the
    // point of the cap (see scaladoc; uncapped models must not do this)
    toks
      .join(broadcast(model.termLogProbs), Seq("term"), "left")
      .crossJoin(broadcast(model.stats))
      .groupBy(id)
      .agg(
        count(col("term")).as("n_tokens"), // null sentinel not counted
        sum(when(col("term").isNull, lit(0.0))
          .otherwise(coalesce(col("lp_diff"), col("lp_oov_diff")))).as("sum_lp"),
        first(col("lp_prior_diff")).as("lp_prior_diff"))
      .select(id, col("n_tokens"),
        (col("sum_lp") + col("lp_prior_diff")).as("logit"))
      .withColumn("keep", col("logit") > lit(0.0))
  }
}
