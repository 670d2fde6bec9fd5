package graft.operators

import graft.Materialize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators for training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All pure
  * column expressions (codegen'd, shuffle-free, pushdown-transparent) —
  * a 100 TB corpus pass is a single map stage.
  *
  * Determinism notes: ratios are emitted as IEEE divisions of exact
  * integer counts (bit-reproducible everywhere); fingerprints are md5
  * over a canonical whitespace-collapsed form.
  */
object TextAnalysis {

  /** The fused single-pass counter struct behind every function below —
    * one byte scan replaces five regex passes and a split/filter
    * pipeline (see [[graft.functions.TextStats]] for the exact
    * semantics equivalence). */
  private def stats(text: Column): Column =
    graft.functions.TextFunctions.textStats(text)

  /** Whitespace token count (long). */
  def wsTokenCount(text: Column): Column = stats(text).getField("n_ws_tokens")

  /** BPE-ish token count: letter runs, digit runs, single punctuation
    * (ASCII classes to stay engine-portable). */
  def bpeTokenCount(text: Column): Column = stats(text).getField("n_bpe_tokens")

  /** Quality features: exact counts + IEEE-division ratios. Every ratio
    * is NULL when its denominator is zero (empty / whitespace-only
    * text): Spark 4 runs ANSI by default, where an unguarded divide by
    * zero THROWS — one empty doc must not kill a corpus-wide job. The
    * guards are mirrored in the DuckDB oracle. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val st = stats(text)
    val n = st.getField("n_chars")
    val alpha = st.getField("n_alpha")
    val punct = st.getField("n_punct")
    val ws = st.getField("n_ws")
    val toks = st.getField("n_ws_tokens")
    def ratio(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double"))
    Seq(
      "n_chars" -> n,
      "n_tokens" -> toks,
      "alpha_ratio" -> ratio(alpha, n),
      "punct_ratio" -> ratio(punct, n),
      "ws_ratio" -> ratio(ws, n),
      "mean_token_len" -> ratio(n - ws, toks))
  }

  def withQuality(df: DataFrame, textCol: String): DataFrame =
    qualityColumns(col(textCol)).foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(name, c)
    }

  /** Tiny per-language function-word sets for the n-gram-free stopword
    * language heuristic. Deliberately small and ASCII so the same lists
    * can be re-stated in an oracle SQL dialect. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "un", "una", "que", "en"),
    "pt" -> Seq("o", "os", "as", "um", "uma", "que", "em", "para"))

  def stopwordHits(text: Column, wordsList: Seq[String]): Column =
    // native tokenizer + membership filter: lowerWsTokens drops the
    // empty boundary tokens the raw split carried, which can never be
    // stopwords — same count (the length>0 filter was simply implicit)
    size(filter(graft.functions.TextFunctions.lowerWsTokens(text),
      w => w.isin(wordsList.map(lit): _*))).cast("long")

  /** Predicted language = argmax of stopword hits; ties and all-zero →
    * first-listed language order ("en" priority), "und" when no hits.
    *
    * A token sitting in SEVERAL languages' lists (e.g. "un" in both fr
    * and es) counts for each — first-match would diverge from the
    * documented argmax and the oracle. Delegates to the fused native
    * expression [[graft.functions.StopwordLangId]]: one byte pass with
    * per-language counters, replacing a transform/isin/size(filter)
    * pipeline whose per-row lambda machinery measured ~6× slower at
    * sf0.1. */
  def langId(text: Column): Column =
    graft.functions.TextFunctions.stopwordLangId(text, stopwords)

  /** Stopword ratio against the union of all language lists. */
  def stopwordRatio(text: Column): Column = {
    val all = stopwords.flatMap(_._2).distinct
    stopwordHits(text, all).cast("double") / wsTokenCount(text).cast("double")
  }

  /** Corpus vocabulary: the `k` most frequent lowercased whitespace
    * tokens with counts, ties broken by token text for determinism.
    *
    * Shuffle shape at 100 TB: explode feeds a two-phase count (map-side
    * partial HashAggregate combines within each scan task, so the
    * exchange carries one row per distinct token per partition — vocab
    * cardinality, not corpus cardinality) and the top-k is
    * TakeOrderedAndProject (per-partition heaps, never a global sort). */
  // NO Parallelism.widen here (measured r17): the word-keyed partial
  // aggregate collapses map-side, so widening a narrow source
  // multiplies the combiner output by the partition count (32× the
  // vocab-sized partials into the exchange) and measured ~2× slower
  // at sf0.1 — the opposite trade from the per-row-heavy operators.
  def topKWords(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode_outer(bm25Words(col(textCol))).as("word"))
      // outer explode + null filter above the Generate — an inner
      // explode would push the tokenizer tree into a per-row scan
      // filter (see bm25TopK); the filter restores the inner row set
      .where(col("word").isNotNull)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(k)

  /** Per-document TF-IDF top terms: for each doc, the `k` highest
    * tf·idf tokens (keyword extraction / quality-signal step).
    *
    * tf = term count in doc; idf = ln(N / df) with df = number of docs
    * containing the term. Ties break on token text; ln is IEEE double
    * (`ln` in DuckDB) so scores are engine-reproducible given exact
    * integer tf/df/N.
    *
    * Shuffle shape at 100 TB: (doc, term, tf) comes from one explode +
    * two-phase count keyed by (doc, term) — combiner-reduced, uniform
    * keys. df is vocab-cardinality (second two-phase count over the
    * distinct (doc, term) pairs already in hand) and joins back with
    * NO broadcast hint: a clean vocabulary is MBs and AQE's runtime
    * stats will broadcast it, but a raw 100 TB web corpus's vocabulary
    * (typos, numbers, junk tokens) reaches hundreds of millions of
    * rows, where a forced broadcast hint would OOM every executor —
    * same policy as [[bigramLmScore]]'s model joins. The per-doc top-k
    * is a window rank over (doc, score) — partitioned by doc, never a
    * global sort. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col(idCol)
    // explode_outer + null filter so the tokenizer tree is not
    // duplicated into an inferred scan-side filter (see bm25TopK);
    // no widen — measured a wash-to-loss here (topKWords note)
    val toks = df.select(id,
      explode_outer(bm25Words(col(textCol))).as("term"))
      .where(col("term").isNotNull)
    val tf = toks.groupBy(id, col("term")).agg(count(lit(1)).as("tf"))
      .transform(Materialize.once(_)) // consumed twice: df source + score join
    // N rides the plan as a broadcast 1-row frame — a driver-side
    // count() here would eagerly scan the corpus at COMPOSITION time
    // (every other operator stays lazy until the caller executes)
    val nDocs = df.select(countDistinct(id).cast("double").as("n_docs"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") * log(col("n_docs") / col("df").cast("double")))
    val w = Window.partitionBy(id).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(id, col("rank").cast("long").as("rank"), col("term"),
        col("tf"), col("df"), col("tfidf"))
  }

  /** Corpus-trained bigram LM score per document (the CCNet/KenLM-style
    * quality signal, at bigram order): score = mean over a doc's
    * bigrams of ln P(b|a), with add-k smoothing
    * P(b|a) = (C(a,b) + k) / (C(a) + k·V).
    *
    * Output: (idCol, n_bigrams, avg_logp) — avg_logp is NULL for docs
    * with fewer than two tokens. Near-zero scores = predictable text;
    * large negative = rare transitions (gibberish, wrong language).
    *
    * Scale shape: the "training pass" is two two-phase counts (bigrams,
    * unigrams) over one explode of the corpus; V rides as a broadcast
    * 1-row frame. The model (bigram → logp) assembles at DISTINCT-BIGRAM
    * cardinality — biCounts joins uniCounts on the bigram's first word —
    * and the full exploded corpus is then joined exactly once, so only
    * ONE corpus-sized shuffle exists beyond the counts themselves. The
    * model-side joins carry NO broadcast hint — Catalyst stats + AQE
    * pick broadcast when the vocab fits and shuffle when it doesn't (a
    * forced hint would OOM the driver on a 100 TB vocabulary). No
    * driver collect anywhere; the model IS a DataFrame. */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5, carryCols: Seq[String] = Seq.empty): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val reserved = Seq("n_bigrams", "avg_logp", idCol)
    require(carryCols.intersect(reserved).isEmpty,
      s"carryCols may not collide with the output columns $reserved " +
        s"(got ${carryCols.mkString(", ")})")
    val id = col(idCol)
    // the words array is STAGED as its own projected attribute (r17):
    // the bigram tree below references the array ~6× (zip_with slices
    // plus size guards), and an inlined words TREE would re-tokenize
    // per reference — the bm25TopK two-step-select rule. `w` is the
    // staged attribute everywhere below.
    val w = col("__ws")
    // bigrams via the zip_with shape (arguments bind once per row —
    // never put the words tree inside a transform lambda)
    val bigrams2 = when(size(w) < 2, array().cast("array<string>"))
      .otherwise(slice(
        zip_with(w, slice(w, lit(2), size(w)), (a, b) => concat(a, lit(" "), b)),
        lit(1), size(w) - 1))
    // feeds training counts AND scoring — but do NOT Materialize.
    // (Not via ReuseExchange: the two bigram-keyed exchanges have
    // different children — partial-aggregate vs bare projection — so
    // Catalyst cannot share them, and the formatted plan confirms the
    // explode lineage executes twice.) The measured reason (sf100 A/B
    // in BASELINE.md, 181.7→98.6 s): re-running the map-side
    // explode+hash pass per consumer is strictly cheaper than writing
    // and re-reading the one frame guaranteed BIGGER than the corpus
    // text — the snapshot fits the page cache at sf10 and becomes real
    // disk IO at 15 GB.
    val wtext = df.select(id, bm25Words(col(textCol)).as("__ws"))
    // explode_OUTER + null filter ABOVE the Generate: an inner explode
    // infers `size(bigrams) > 0` and pushes the whole zip_with bigram
    // tree below the exchange into a per-row scan filter — every doc
    // would build its bigram array twice (guide §4.4). The filter on
    // the GENERATED attribute cannot be pushed below the Generate, so
    // the array is built exactly once; the dropped null rows are the
    // rows the inner explode never emitted.
    val docBi = wtext.select(id, explode_outer(bigrams2).as("bigram"))
      .where(col("bigram").isNotNull)
    val biCounts = docBi.groupBy("bigram").agg(count(lit(1)).as("c_bi"))
    val uniCounts = wtext
      .select(explode_outer(w).as("w1")).where(col("w1").isNotNull)
      .groupBy("w1").agg(count(lit(1)).as("c_uni"))
      .transform(Materialize.once(_)) // consumed twice: V and the model join
    val vocab = uniCounts.select(count(lit(1)).cast("double").as("v_size"))
    // no broadcast hint on the count frames: vocab-sized is usually
    // broadcastable but can reach hundreds of millions of rows at
    // 100 TB — let Catalyst stats + AQE decide (a hint would force a
    // driver OOM at that size); the 1-row V frame is always safe.
    // logp is a pure function of the bigram, so the model assembles at
    // DISTINCT-BIGRAM cardinality (biCounts ⋈ uniCounts) and the full
    // exploded corpus is joined exactly ONCE — joining docBi to both
    // count frames would shuffle the corpus twice for the same numbers
    val biModel = biCounts
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(uniCounts, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("logp", log(
        (col("c_bi").cast("double") + lit(k)) /
          (col("c_uni").cast("double") + lit(k) * col("v_size"))))
      .select("bigram", "logp")
    val scored = docBi.join(biModel, "bigram")
    val perDoc = scored.groupBy(id).agg(
      count(lit(1)).as("n_bigrams"), avg(col("logp")).as("avg_logp"))
    // carryCols ride the resurrection join for free — a caller that
    // needs (lang, source, ...) beside the score would otherwise pay a
    // SECOND corpus-sized join against df just to get them back
    df.select(id +: carryCols.map(col): _*).join(perDoc, Seq(idCol), "left")
      .select((id +: carryCols.map(col)) ++ Seq(
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logp")): _*)
  }

  /** Per-source corpus report (the "datasheet" summary of a curation
    * run): doc count, token total, mean doc length, distinct predicted
    * languages. One two-phase aggregation over a single map pass —
    * group count is source-cardinality (tiny), so the report is free at
    * any corpus size. */
  def corpusReport(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val st = stats(col(textCol))
    df.select(col(sourceCol).as("source"),
        st.getField("n_ws_tokens").as("toks"),
        st.getField("n_chars").as("chars"),
        langId(col(textCol)).as("lang"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        (sum(col("chars")).cast("double") / count(lit(1))).as("mean_chars"),
        countDistinct(col("lang")).as("n_langs"))
  }

  /** Canonical-form md5 document fingerprint. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Polynomial rolling hash over words (Rabin-Karp style) — the
    * order-sensitive cousin of [[fingerprint]]: same word multiset in a
    * different order → different value. */
  def rollingHash(text: Column): Column =
    aggregate(
      graft.functions.TextFunctions.lowerWsTokens(text),
      lit(0L),
      // rotate-left-7 then xor: order-sensitive mixing with no Long
      // overflow (ANSI-safe, unlike multiply-add polynomial hashing)
      (acc, w) => shiftleft(acc, 7).bitwiseOR(shiftrightunsigned(acc, 57)).bitwiseXOR(xxhash64(w)))

  /** BM25 retrieval: top-k documents per query (Okapi BM25,
    * Robertson/Spärck Jones idf with the +1 smoothing every modern
    * engine ships) — the retrieval sibling of [[tfidfTopTerms]], and
    * the lexical half of a training-data stack's search tier (the
    * embedding half is `Similarity`'s ANN family):
    *
    *   score(q, d) = Σ_{t ∈ terms(q)} idf(t) · tf·(k1+1) /
    *                 (tf + k1·(1 − b + b·dl/avgdl)),
    *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * with tf = t's count in d, dl = d's token count, avgdl the corpus
    * mean. Repeated query terms score once (the ubiquitous
    * qtf-saturated simplification). Output: (query_id, rank, id,
    * score), ranks 1..k, ties broken by id.
    *
    * Shuffle shape at 100 TB — the posting frame NEVER shuffles, and
    * nothing corpus-sized ever aggregates:
    *   - the query term set (caller-bounded, like the ANN query
    *     batches) broadcasts, and postings are FILTERED to query terms
    *     map-side BEFORE any aggregate — tf, df, and the score join
    *     all run over query-term postings only (a vanishing fraction
    *     of the corpus), so their shuffles are query-sized;
    *   - dl (doc token count) is a per-row column expression computed
    *     alongside the explode, not a corpus-wide re-aggregate of tf —
    *     no O(corpus) (doc → length) join;
    *   - N and avgdl fold map-side into a broadcast 1-row frame (avgdl
    *     as exact integer sum ÷ count — order-independent, hence
    *     engine-reproducible; a double-avg's summation order is not);
    *   - per-(query, doc) partial sums combine map-side and the only
    *     wide exchange after scoring is the top-k's, carrying ≤ k rows
    *     per partition per query ([[Similarity.topKPerKey]]).
    * The trade is one corpus text scan per call (N/avgdl + postings
    * read the text column twice, both map-side) — the ad-hoc shape.
    * Repeated query workloads should persist the exploded posting
    * frame once and reuse it; every step below composes unchanged on
    * top of a stored (id, term, tf, dl) table. */
  /** The one BM25 tokenizer — lowercased whitespace tokens. Shared by
    * the ad-hoc scorer and [[Bm25Index]] so a persisted index can
    * never tokenize differently from the query side. Native
    * [[graft.functions.LowerWsTokens]] (r17) — value-identical to the
    * original `filter(split(lower(trim(text)), "\\s+"), length > 0)`
    * chain (fuzz-pinned), ~10–30× cheaper per row. */
  private[operators] def bm25Words(text: Column): Column =
    graft.functions.TextFunctions.lowerWsTokens(text)

  /** The one BM25 scoring expression over a joined frame carrying
    * (tf, dl, df, n_docs, avgdl): appends `idf` and the per-(term,doc)
    * partial `s`. Shared with [[Bm25Index]] — identical floats by
    * construction. */
  private[operators] def bm25Scored(j: DataFrame, k1: Double, b: Double): DataFrame =
    j.withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("s", col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))

  /** The one per-query top-k epilogue over scored partials (see
    * [[bm25TopK]] for the rankRoundDp contract). */
  private[operators] def bm25TopKFromScored(scored: DataFrame, k: Int,
      rankRoundDp: Int): DataFrame = {
    val perDoc = scored.groupBy("query_id", "id").agg(sum("s").as("score"))
    val rankKey = if (rankRoundDp >= 0) round(col("score"), rankRoundDp)
                  else col("score")
    Similarity.topKPerKey(perDoc, Seq("query_id"), rankKey.desc, k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id"), col("score"))
  }

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75, rankRoundDp: Int = -1): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    def words(text: Column): Column = bm25Words(text)
    val qterms = queries.select(col(qidCol).as("query_id"), explode(
      array_distinct(words(col(qtextCol)))).as("term"))
    val qset = qterms.select("term").distinct()
    // postings restricted to query terms at the scan: explode + map-side
    // broadcast semi-filter; dl rides each row as a column expression.
    // The two-step select evaluates the non-cheap words() array ONCE per
    // row (CollapseProject keeps multiply-referenced expensive
    // expressions in their own projection instead of inlining them
    // twice)
    val wdocs = docs.select(col(idCol).as("id"), col(textCol).as("__t"))
    // explode_OUTER, not explode: an inner explode makes the optimizer
    // infer `size(ws) > 0` and push it below the exchange to the scan
    // — re-inlining the full tokenizer tree into a per-row scan filter,
    // so every doc tokenizes TWICE (plan-verified; the guide §4.4
    // duplication class). The outer explode's null-term row for empty
    // docs is dropped by the query-term join, so results are identical.
    val toks = wdocs.select(col("id"), words(col("__t")).as("ws"))
      .select(col("id"), size(col("ws")).as("dl"), explode_outer(col("ws")).as("term"))
      .join(broadcast(qset), Seq("term"))
    // dl is functionally dependent on id — grouping by it too keeps the
    // aggregate single-pass without a first()/max() accessor
    val tf = toks.groupBy(col("id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .transform(Materialize.once(_)) // consumed twice: df + scores
    // tf is unique per (id, term): row count per term = doc frequency
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus-level stats over ALL docs with >= 1 token (not just
    // query-term matches): one map-side-partial agg over the text scan.
    // CONDITIONAL aggregation instead of `.filter(dl0 > 0)` — the
    // pushed-down form of that filter substitutes the alias and lands
    // the full tokenizer tree in a per-row scan filter below the
    // exchange (the same §4.4 duplication class as the inner-explode
    // inference above, plan-verified r17); `when(dl0 > 0, …)` inside
    // the aggregate is value-identical (dl0 is never negative and a
    // null dl0 — null text — is skipped by both forms) and dl0 stays a
    // multiply-referenced non-cheap alias, which CollapseProject
    // leaves evaluated once in its own projection.
    val stats = wdocs.select(size(words(col("__t"))).as("dl0"))
      .agg(count(when(col("dl0") > 0, lit(1))).cast("double").as("n_docs"),
        (sum(when(col("dl0") > 0, col("dl0"))).cast("double") /
          count(when(col("dl0") > 0, lit(1))).cast("double")).as("avgdl"))
    val scored = tf.join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term")) // ≤ |query terms| rows
      .crossJoin(broadcast(stats))
      .transform(bm25Scored(_, k1, b))
    // rankRoundDp >= 0: rank on the ROUNDED score (id tiebreak) — a
    // drift-free rank key for cross-engine comparison. Full-precision
    // ranking leaves two near-equal scores free to rank-flip when the
    // other engine's ln() differs in the last ulp; ranking on the same
    // 10^-dp grid both engines emit removes that freedom (a true score
    // would have to sit within ~1 ulp of a rounding boundary to differ,
    // and rounded ties resolve by id deterministically).
    bm25TopKFromScored(scored, k, rankRoundDp)
  }
}
