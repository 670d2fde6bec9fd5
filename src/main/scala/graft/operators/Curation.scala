package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and dedup: PII detection/redaction, repetition ("Gopher
  * rule") quality metrics, benchmark decontamination, and URL
  * canonicalization.
  *
  * Scale shapes (the design constraint for every member):
  *   - PII / repetition / URL ops are pure column expressions — a
  *     100 TB pass is one map stage, codegen'd, no shuffle, pushdown
  *     transparent.
  *   - Decontamination joins the corpus against a benchmark n-gram set.
  *     Benchmarks are tiny relative to a corpus (MBs vs TBs), so the
  *     gram set is broadcast and the corpus side never shuffles rows —
  *     only the per-doc overlap counts (≤ one long per doc) move.
  *
  * Engine-parity note (the oracle gates hash-compare against DuckDB):
  * every regex here sticks to the Java-regex ∩ RE2 common subset —
  * character classes, bounded/greedy quantifiers, `\b` — and avoids
  * alternation between same-prefix branches, where Java's
  * leftmost-first and RE2's automaton could disagree.
  */
object Curation {

  // ---- PII ------------------------------------------------------------

  /** Detection patterns. Deliberately simple, anchored on unambiguous
    * structure; precision-tuned variants slot in per-deployment. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"

  /** Per-document PII hit counts (all long, exact). */
  def piiColumns(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailRe)).cast("long"),
    "n_ipv4" -> regexp_count(text, lit(Ipv4Re)).cast("long"),
    "n_phones" -> regexp_count(text, lit(PhoneRe)).cast("long"))

  /** Replace every PII span with a typed placeholder token. Order is
    * fixed (email, then IP, then phone) so a span matching two patterns
    * redacts deterministically as the most specific one; an IP-hosted
    * address (`joe@10.0.0.1`) is not an email under [[EmailRe]] (numeric
    * TLD) and gets its host IP-redacted instead. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  def withPii(df: DataFrame, textCol: String): DataFrame = {
    val withCounts = piiColumns(col(textCol)).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    withCounts.withColumn("text_redacted", redactPii(col(textCol)))
  }

  // ---- repetition (Gopher-style quality rules) ------------------------

  /** Lower-cased whitespace words — the shared tokenization of every
    * operator in this file (and of [[TextAnalysis]] / [[Dedup]]).
    * Native [[graft.functions.LowerWsTokens]] (r17) — value-identical
    * to the original split/filter chain (fuzz-pinned). */
  private def words(text: Column): Column =
    graft.functions.TextFunctions.lowerWsTokens(text)

  /** Word k-grams as strings, built by zipping `w` with its own
    * k−1 shifted copies.
    *
    * The obvious formulation — `transform(sequence(1, n−k+1),
    * i => concat_ws(" ", slice(w, i, k)))` — is a performance trap:
    * `w` appears INSIDE the lambda, and Spark's higher-order-function
    * evaluation re-computes every non-bound subtree per ELEMENT, so the
    * split+filter words-tree runs O(words²) times per row (measured 40×
    * slower at sf0.1). `zip_with` evaluates both array arguments once
    * per row and its lambda touches only the bound variables.
    *
    * The raw zip has length `size(w)` (zip_with null-pads the shorter
    * side, and `concat` null-propagates), so the final slice keeps the
    * `size(w)−k+1` valid grams. Short docs short-circuit to an empty
    * array — `slice` rejects negative lengths. */
  private def kgrams(w: Column, k: Int): Column = {
    val raw = (2 to k).foldLeft(w) { (acc, j) =>
      zip_with(acc, slice(w, lit(j), size(w)), (a, b) => concat(a, lit(" "), b))
    }
    if (k == 1) w
    else
      when(size(w) < k, array().cast("array<string>"))
        .otherwise(slice(raw, lit(1), size(w) - (k - 1)))
  }

  /** Duplicate-k-gram fraction: 1 − distinct/total, 0 for docs shorter
    * than k words. The Gopher repetition signals (Rae et al. 2021,
    * §A1.1) at word granularity — the synthetic corpus has no newlines,
    * and at 100 TB the line-level variants are the same expression over
    * a `split(text, '\n')` array. */
  /** [[dupKgramFrac]] over an already-tokenized words column — the
    * staged form [[withRepetition]] uses so the three signals share
    * ONE tokenize per row (each signal's tree references the words
    * array ~2k+3 times; an inlined words TREE re-tokenizes per
    * reference — the bm25TopK two-step-select rule, r17). */
  private def dupKgramFracFromWords(w: Column, k: Int): Column = {
    // denominator by arithmetic, not size(g): the gram array is the
    // expensive subtree and must be evaluated once per row, not twice
    val total = size(w) - (k - 1)
    when(total <= 0, lit(0.0d))
      .otherwise(lit(1.0d) -
        size(array_distinct(kgrams(w, k))).cast("double") / total.cast("double"))
  }

  def dupKgramFrac(text: Column, k: Int): Column =
    dupKgramFracFromWords(words(text), k)

  def repetitionColumns(text: Column): Seq[(String, Column)] = Seq(
    "dup_word_frac" -> dupKgramFrac(text, 1),
    "dup_2gram_frac" -> dupKgramFrac(text, 2),
    "dup_3gram_frac" -> dupKgramFrac(text, 3))

  def withRepetition(df: DataFrame, textCol: String): DataFrame = {
    // stage the words array ONCE as its own projected attribute: the
    // three signal trees reference it ~25 times combined, and
    // CollapseProject keeps a multiply-referenced non-cheap alias in
    // its own projection instead of inlining the tokenizer per
    // reference
    val staged = df.withColumn("__graft_rep_ws", words(col(textCol)))
    Seq("dup_word_frac" -> 1, "dup_2gram_frac" -> 2, "dup_3gram_frac" -> 3)
      .foldLeft(staged) { case (d, (name, k)) =>
        d.withColumn(name, dupKgramFracFromWords(col("__graft_rep_ws"), k))
      }
      .drop("__graft_rep_ws")
  }

  // ---- benchmark decontamination --------------------------------------

  /** Flag training documents sharing any word `n`-gram with a benchmark
    * corpus (the GPT-3/PaLM decontamination scheme, at a configurable
    * `n`).
    *
    * Returns one row per `docs` row: (idCol, n_overlap, contaminated)
    * where n_overlap counts the doc's DISTINCT n-grams that appear
    * anywhere in the benchmark.
    *
    * 100 TB shape: `benchmark` is the tiny side (evaluation sets are
    * MBs) — its distinct gram set is broadcast, so the corpus scan
    * stays shuffle-free up to the per-doc count aggregation, which
    * carries one (id, long) pair per doc with map-side combine. The
    * corpus-side gram explode is bounded per task, never collected.
    */
  def contaminationReport(
      docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 5): DataFrame = {
    val id = col(idCol)
    // widen BEFORE the gram build: the per-doc tokenize + n-gram
    // assembly is the operator's dominant per-row cost and an
    // unsplittable source would run it one-core (Parallelism scaladoc);
    // the resurrection join below keeps reading `docs` directly — it
    // only needs ids
    // the words array is staged as its own projected attribute: the
    // kgram tree references it ~2(n−1)+2 times (zip_with slices + size
    // guards), and an inlined words TREE would re-tokenize per
    // reference (the bm25TopK two-step-select rule)
    val docGrams = Parallelism.widen(docs.select(id, col(textCol)))
      .select(id, words(col(textCol)).as("__ws"))
      .select(id, array_distinct(kgrams(col("__ws"), n)).as("grams"))
    // explode_OUTER on both gram streams: an inner explode makes the
    // optimizer infer `size(grams) > 0` and push the full kgram tree
    // below the exchange into a per-row scan filter, so every doc
    // builds its gram array twice (plan-verified r17; guide §4.4). The
    // outer form's null-gram rows never survive the inner gram join /
    // the explicit null filter, so the row set is unchanged.
    val benchGrams = Parallelism.widen(benchmark.select(col(benchTextCol)))
      .select(words(col(benchTextCol)).as("__ws"))
      .select(explode_outer(kgrams(col("__ws"), n)).as("gram"))
      .where(col("gram").isNotNull)
      .distinct()
    val overlaps = docGrams
      .select(id, explode_outer(col("grams")).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(id).agg(count(lit(1)).as("n_overlap"))
    docs.select(id)
      .join(overlaps, Seq(idCol), "left")
      .select(id,
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }

  // ---- document chunking ----------------------------------------------

  /** Split each document into word windows of `chunkLen` tokens whose
    * starts are `stride` apart (overlap = chunkLen − stride): the
    * context-window shaping step of a training pipeline. Output: one row
    * per (idCol, chunk_id, chunk_text, n_tokens); the final chunk may be
    * short; empty documents yield no rows.
    *
    * Scale/plan shape: chunk building is the native
    * [[graft.functions.WordChunks]] expression — one tokenize pass per
    * doc. The composed formulation (`transform(sequence(…),
    * i => slice(words, …))`) is an optimizer trap: even with the words
    * array staged in its own projection, CollapseProject inlines the
    * split+filter tree back into the lambda and re-runs it per CHUNK
    * (measured: 6 copies of the words tree in the physical plan, 2×
    * slower at sf0.1). The chunk array is built per row and exploded —
    * the Generate never duplicates the words array per output row. One
    * narrow map stage, no shuffle.
    */
  def chunkDocuments(
      docs: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen > 0 && stride > 0 && stride <= chunkLen,
      s"need 0 < stride <= chunkLen, got chunkLen=$chunkLen stride=$stride")
    import graft.functions.TextFunctions
    docs.select(col(idCol),
        posexplode(TextFunctions.wordChunks(col(textCol), chunkLen, stride))
          .as(Seq("chunk_id", "chunk_text")),
        TextFunctions.textStats(col(textCol)).getField("n_ws_tokens").as("n_words"))
      .select(col(idCol), col("chunk_id"), col("chunk_text"),
        least(lit(chunkLen), col("n_words") - col("chunk_id") * stride).cast("long")
          .as("n_tokens"))
  }

  // ---- blocklist filtering --------------------------------------------

  /** Count of tokens present in `blocklist` (banned-term filtering —
    * matched ASCII-case-insensitively on whole whitespace tokens, the
    * same tokenization as everything else here). Pure expression; the
    * list rides the plan as a literal array (wordlists are hundreds of
    * entries, not corpus-sized). */
  def blocklistHits(text: Column, blocklist: Seq[String]): Column = {
    // Locale.ROOT: a Turkish-locale JVM lowers "INDEX" to dotless
    // "ındex", which would never match the locale-independent lower()
    // applied to the tokens
    val lowered = blocklist.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    size(filter(words(text), w => w.isin(lowered.map(lit): _*))).cast("long")
  }

  // ---- quality policy (Gopher-style keep/drop) ------------------------

  /** Filtering thresholds in the spirit of Gopher rule 1 (Rae et al.
    * 2021 §A1.1): token-count window, mean token length window, max
    * duplicate-word fraction, min alpha ratio. */
  final case class QualityPolicy(
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minMeanTokenLen: Double = 2.0,
      maxMeanTokenLen: Double = 12.0,
      maxDupWordFrac: Double = 0.9,
      minAlphaRatio: Double = 0.6)

  /** Apply `policy` → (…, keep, violations) where `violations` is the
    * ordered comma-joined list of failed rule names (empty when kept).
    * One map pass: every signal comes from [[TextAnalysis
    * .qualityColumns]] (the SINGLE definition of the quality math and
    * its zero-denominator guards) plus one dup-word array pass — the
    * whole policy is a single projection, no shuffle.
    *
    * Degenerate docs drop, never crash or slip through: NULL text and
    * empty/whitespace-only text both resolve to 0 tokens (the
    * `coalesce`) and fail `too_few_tokens`; their undefined ratios are
    * NULL, whose comparisons are NULL → no spurious extra flags. */
  def withQualityPolicy(df: DataFrame, textCol: String,
      policy: QualityPolicy = QualityPolicy()): DataFrame = {
    val sig = TextAnalysis.qualityColumns(col(textCol)).toMap
    val toks = coalesce(sig("n_tokens"), lit(0L))
    val meanLen = sig("mean_token_len")
    val alphaRatio = sig("alpha_ratio")
    val dupFrac = dupKgramFrac(col(textCol), 1)
    val checks: Seq[(String, Column)] = Seq(
      "too_few_tokens" -> (toks < policy.minTokens),
      "too_many_tokens" -> (toks > policy.maxTokens),
      "mean_token_len" ->
        (meanLen < policy.minMeanTokenLen || meanLen > policy.maxMeanTokenLen),
      "dup_word_frac" -> (dupFrac > policy.maxDupWordFrac),
      "alpha_ratio" -> (alphaRatio < policy.minAlphaRatio))
    val violations = array_compact(array(checks.map { case (name, failed) =>
      when(failed, lit(name)).otherwise(lit(null).cast("string"))
    }: _*))
    df.withColumn("violations", array_join(violations, ","))
      .withColumn("keep", (col("violations") === "").cast("int"))
  }

  // ---- boilerplate line removal ---------------------------------------

  /** Strip lines that appear in at least `minDocFreq` DISTINCT documents
    * (site chrome, footers, cookie banners — the CCNet/FineWeb
    * boilerplate-removal step). Returns (idCol, text_clean) with the
    * surviving lines rejoined in original order; a document whose every
    * line is boilerplate comes back as the empty string.
    *
    * Scale shape: line doc-frequency is a two-phase count over the
    * exploded distinct (doc, line) pairs; the boilerplate set feeds an
    * anti-join against the exploded lines with NO broadcast hint — at
    * sane thresholds it is heavy-hitters-only (≤ total-lines/minDocFreq
    * rows) and AQE's runtime stats broadcast it, keeping the corpus
    * from shuffling for the membership test; but the bound is
    * caller-controlled (minDocFreq=2 admits half the distinct lines of
    * a 100 TB corpus), so a forced hint could OOM executors where AQE
    * degrades gracefully to a shuffle join. Documents are rebuilt by a
    * doc-keyed aggregation whose order is restored via `array_sort`
    * over (pos, line) structs (collect_list order is not deterministic
    * under retries; the sort makes the rebuild retry-stable); the
    * rebuild shuffle carries surviving lines once — unavoidable for
    * reconstruction. */
  def removeBoilerplateLines(
      docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Long): DataFrame = {
    val id = col(idCol)
    val lines = docs.select(id,
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val common = lines.select(id, col("line")).distinct()
      .groupBy("line").agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") >= minDocFreq)
      .select("line")
    val kept = lines.join(common, Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(id).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")),
        "\n").as("text_clean"))
    docs.select(id).join(rebuilt, Seq(idCol), "left")
      .select(id, coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  // ---- URL canonicalization -------------------------------------------

  /** Canonicalize a URL for URL-level dedup (the RefinedWeb/CCNet
    * pre-dedup step): drop the fragment, lowercase scheme and host,
    * strip a leading `www.`, and remove `utm_*` tracking parameters
    * (renormalizing the `?`/`&` separators so parameter removal never
    * leaves a dangling delimiter). Pure expression — no UDF, no parse
    * tree; malformed URLs degrade to lowercased trimmed strings. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    // authority → host: drop userinfo (".*@" is greedy → up to the LAST
    // @, so "good.com@evil.com" keys as evil.com — the spoof-resistant
    // reading), split off the port, strip a leading www.
    val hostPort = regexp_replace(auth, "^.*@", "")
    val port = regexp_extract(hostPort, "(:[0-9]+)$", 1)
    val host = regexp_replace(regexp_replace(hostPort, ":[0-9]*$", ""), "^www\\.", "")
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
    // Tracking-param removal in three deterministic steps (each pattern
    // matches a RUN of consecutive utm params, so a single left-to-right
    // non-overlapping pass — identical scan semantics in Java regex and
    // RE2 — removes them all):
    //  1. drop "utm_*=v&[utm_*=v&…]" runs followed by a kept param,
    //     preserving that param's leading separator;
    //  2. drop a trailing "?utm_*=v[&utm_*=v…]" / "&utm_*=v[…]" run;
    //  3. a query string reduced to nothing leaves no dangling "?".
    val rest1 = regexp_replace(rest, "([?&])(utm_[A-Za-z0-9_]*=[^&#]*&)+", "$1")
    val rest2 = regexp_replace(rest1,
      "[?&]utm_[A-Za-z0-9_]*=[^&#]*(&utm_[A-Za-z0-9_]*=[^&#]*)*$", "")
    val restClean = regexp_replace(rest2, "\\?$", "")
    // canonical form drops userinfo (never a dedup signal) but KEEPS an
    // explicit port — a non-default port addresses a different resource
    when(auth === "", lower(noFrag))
      .otherwise(concat(scheme, lit("://"), host, port, restClean))
  }

  /** Hostname of a URL (post-normalization key for per-domain stats and
    * robots/blocklist joins): lowercased, userinfo and port stripped,
    * leading `www.` removed. Empty string when there is no authority. */
  def urlHost(url: Column): Column = {
    val auth = lower(regexp_extract(trim(url), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    regexp_replace(
      regexp_replace(regexp_replace(auth, "^.*@", ""), ":[0-9]*$", ""),
      "^www\\.", "")
  }

  /** Per-group quantile bucketing — the CCNet shape: label each row
    * head/middle/tail (or any label list) by where its score falls in
    * its GROUP's score distribution. The canonical use is perplexity
    * terciles per language (compose with
    * [[TextAnalysis.bigramLmScore]]: bucket on avg_logp per lang, keep
    * "head" for the highest-quality third, route "middle" to a
    * classifier, drop "tail"); the operator is score-generic.
    *
    * Rows land in `labels(i)` when score ≤ the group's `probs(i)`
    * quantile (interpolated, quantile_cont semantics), `labels.last`
    * above every threshold. Null scores get a null bucket; rows with a
    * NULL group are dropped (join keys never match null — same
    * contract as every keyed operator here). Only the label column
    * (`bucketCol`) is added.
    *
    * Scale shape: one combiner-mergeable aggregate keyed by group
    * computes every threshold (the DEFAULT is `percentile_approx` — a
    * mergeable Greenwald-Khanna sketch, so a 100 TB group folds
    * map-side and no reducer ever sees raw values; `exact = true`
    * switches to exact interpolated percentile for oracle parity and
    * small frames — exact percentile buffers each group's values on
    * one reducer, which is precisely what does NOT survive a billion-
    * row language), then the thresholds frame (|groups| rows)
    * broadcast-joins back and labeling is a map-side when-chain. */
  def quantileBuckets(df: DataFrame, groupCol: String, scoreCol: String,
      probs: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      labels: Seq[String] = Seq("head", "middle", "tail"),
      bucketCol: String = "bucket",
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(labels.length == probs.length + 1,
      s"need one label per bucket: ${probs.length} probs -> ${probs.length + 1} labels " +
        s"(got ${labels.length})")
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p < 1.0) &&
      probs.sliding(2).forall(s => s.length < 2 || s(0) < s(1)),
      s"probs must be strictly increasing within (0, 1): $probs")
    // typed Column API (not string-interpolated expr), with the names
    // quote-escaped for col()'s multi-part parser: a scoreCol carrying a
    // backtick / dot / quote resolves as the literal column name instead
    // of breaking the parser (or silently splitting on the dot)
    def exactCol(name: String): Column = col("`" + name.replace("`", "``") + "`")
    val score = exactCol(scoreCol)
    val probsArr = typedlit(probs)
    val agg =
      if (exact) percentile(score, probsArr)
      else percentile_approx(score, probsArr, lit(accuracy))
    val th = df.groupBy(exactCol(groupCol)).agg(agg.as("__qs"))
    val bucket = probs.indices.foldRight(
      when(score.isNull, lit(null).cast("string")).otherwise(lit(labels.last))) {
      (i, acc) =>
        when(score.isNotNull &&
          score.cast("double") <= element_at(col("__qs"), i + 1), lit(labels(i)))
          .otherwise(acc)
    }
    df.join(broadcast(th), Seq(groupCol))
      .withColumn(bucketCol, bucket)
      .drop("__qs")
  }
}
