package graft.operators

import graft.Materialize
import graft.functions.{HashFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Large-scale document deduplication operators (training-data pipeline
  * tier). All designed shuffle-minimal for the 100 TB case:
  *
  *   - signatures (MinHash/SimHash) are computed MAP-SIDE via native
  *     Catalyst expressions — the only shuffle is the bucket groupBy,
  *     keyed on (band, bandHash) whose cardinality is ~num docs × bands,
  *     uniformly hash-distributed (no skew by construction);
  *   - candidate pairs are verified by joining signatures back on doc id
  *     — a key join AQE can plan as broadcast when the candidate set is
  *     small (the common case: candidates << corpus);
  *   - nothing ever collects to the driver.
  */
object Dedup {

  // Tokenization lives in the fused native expressions
  // (graft.functions.TextShingleHashes / MinHashFromText / SimHashFromText)
  // — a single byte pass per document; see ARCHITECTURE.md.

  // ---- exact dedup ------------------------------------------------------

  /** Exact dedup, deterministic representative: keeps, per key group, the
    * row with the smallest `orderCol`. One hash-partitioned aggregate;
    * map-side partial min(struct) keeps the shuffle at one struct per
    * (partition, key). */
  def exact(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    // orderCol may itself be a key (then it's constant within each group
    // and already projected from the keys — re-projecting it from __rep
    // would duplicate the column)
    val packedFields =
      if (keys.contains(orderCol)) payload.toSeq
      else orderCol +: payload.filterNot(_ == orderCol).toSeq
    val packed = struct((col(orderCol) +: packedFields.filterNot(_ == orderCol).map(col)): _*)
    val agg = df.groupBy(keys.map(col): _*)
      .agg(min(packed).as("__rep"), count(lit(1)).as("__n_dups"))
    val restored = (keys.map(col) :+ col("__n_dups").as("n_dups")) ++
      packedFields.map(c => col(s"__rep.$c").as(c))
    agg.select(restored: _*)
  }

  /** Exact dedup by content hash — at 100 TB, group on xxhash64(text)
    * first so the shuffle key is 8 bytes, with the full key kept only to
    * disambiguate hash collisions. */
  def exactByHash(df: DataFrame, textCol: String, orderCol: String): DataFrame =
    exact(df.withColumn("__h", xxhash64(col(textCol))), Seq("__h", textCol), orderCol)
      .drop("__h")

  /** Cross-corpus PARAGRAPH dedup (the Dolma pipeline's sub-document
    * exact pass): each distinct paragraph string survives only at its
    * FIRST occurrence — smallest (idCol, position) lexicographically —
    * and every later copy is excised; documents are rebuilt from their
    * surviving paragraphs in original order. Catches the shared
    * footers/headers/templates that whole-document dedup leaves
    * verbatim, at exact-match cost (the fuzzy counterpart is the
    * repeated-span machinery).
    *
    * Output: (idCol, n_paras, n_kept, text_dedup) — one row per input
    * doc, `text_dedup` empty when every paragraph was a later copy,
    * null-text docs (0, 0, ""). ALL `sep`-split segments participate,
    * empty segments included — consecutive separators carry layout
    * information and dedup like any other string.
    *
    * Scale shape: posexplode_outer (order + empty-doc retention) → one
    * window keyed by paragraph (two-phase min; paragraph-cardinality,
    * uniform keys — web-scale hot paragraphs are exactly the
    * duplicates being excised, and min is a combiner so the skew
    * collapses map-side) → one groupBy(id) rebuild. Two shuffles, no
    * joins, nothing corpus-sized ever re-joins itself. */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(sep.nonEmpty, "sep must be non-empty")
    val id = col(idCol)
    val paras = df
      .select(id, posexplode_outer(
        split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF(idCol, "pos", "para")
    val w = Window.partitionBy("para")
    paras
      .withColumn("__f", min(struct(id, col("pos"))).over(w))
      .withColumn("__keep", col("para").isNotNull &&
        col(s"__f.$idCol") === id && col("__f.pos") === col("pos"))
      .groupBy(id)
      .agg(
        count(col("para")).as("n_paras"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the nulls the non-kept rows produce; sort
        // restores document order (pos is unique per doc)
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("pos"), col("para"))))),
          s => s.getField("para")), sep).as("text_dedup"))
  }

  // ---- MinHash + LSH ----------------------------------------------------

  final case class MinHashConfig(
      shingleSize: Int = 3,        // word 3-grams
      numHashes: Int = 128,
      bands: Int = 32,             // rows-per-band = numHashes / bands
      seed: Long = 42L,
      threshold: Double = 0.7)

  /** doc id + minhash signature (map-side only; fused native expression —
    * one byte pass per document, no intermediate shingle arrays). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig): DataFrame =
    df.select(
      col(idCol).as("id"),
      HashFunctions.minhashFromText(
        col(textCol), cfg.shingleSize, cfg.numHashes, cfg.seed)
        .as("sig"))

  /** Materialized (id, sig) frame: fused signatures with token-free docs
    * (all-MaxValue signature) excluded. Shared by every LSH path so the
    * filter can never diverge between batch and incremental dedup. */
  private[operators] def sigFrame(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig): DataFrame =
    minhashSignatures(df, idCol, textCol, cfg)
      .filter(col("sig").getItem(0) =!= Long.MaxValue)
      .transform(Materialize.once(_))

  /** Materialized (id, sh) shingle-set frame (empty sets excluded). */
  private[operators] def setFrame(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig): DataFrame =
    df.select(col(idCol).as("id"),
      HashFunctions.textShingleHashes(col(textCol), cfg.shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .transform(Materialize.once(_))

  /** (band, band_hash, id) LSH bucket rows of a signature frame — THE
    * banding definition; batch and incremental candidate joins both use
    * it, so the band hash can never silently drift between them.
    * Values are the original declarative form's —
    * `xxhash64(slice(sig, b*r+1, r), b)` — computed by the fused
    * [[graft.functions.HashFunctions.lshBandHashes]] expression (the
    * declarative form evaluated interpreted with a per-band array
    * copy; BandedSigsSpec pins value equality). */
  private[operators] def bandedSigs(sigs: DataFrame, cfg: MinHashConfig): DataFrame = {
    val r = cfg.numHashes / cfg.bands
    sigs.select(
      col("id"),
      posexplode(HashFunctions.lshBandHashes(col("sig"), cfg.bands, r)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
  }

  /** Candidate near-duplicate pairs via banded LSH, verified by exact
    * signature agreement (estimated Jaccard), filtered at cfg.threshold.
    * Output: (id_a, id_b, est_jaccard) with id_a < id_b, distinct.
    *
    * EMPTY documents (no words → all-MaxValue signature) are excluded —
    * otherwise every pair of empty documents would collide in every band.
    * Short-but-nonempty documents use a whole-text fallback shingle (see
    * MinHashFromText), so identical short docs still pair at 1.0 while
    * unrelated short docs don't.
    *
    * NOT a pure lazy plan builder: Auto salting runs ONE bounded
    * bucket-occupancy Spark job at call time to size the hot-bucket
    * split (see [[bucketSelfJoinPairs]]); nothing stays cached after
    * the call returns.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    // signatures are consumed three times (LSH self-join left + right,
    // then the sig_a/sig_b verification joins) and Spark re-executes the
    // whole tokenize+hash DAG per consumer — materialize once. Signature
    // frames are ~1-2% of corpus bytes, the standard cache-vs-recompute
    // trade for LSH dedup at scale.
    val sigs = sigFrame(df, idCol, textCol, cfg)
    val candidates = lshCandidates(sigs, cfg)

    val withSigs = candidates
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))

    // estimated Jaccard = fraction of agreeing signature positions
    withSigs.select(
      col("id_a"), col("id_b"),
      (aggregate(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / cfg.numHashes)
        .as("est_jaccard"))
      .filter(col("est_jaccard") >= cfg.threshold)
  }

  /** Banded-LSH candidate pairs from a signature frame (id, sig):
    * band → hash of the signature slice, bucket equi-join on
    * (band, bandHash), deduped bare (id_a, id_b) with id_a < id_b.
    * Signatures are NOT carried through the pair shuffle (128 longs ×
    * pairs would dominate the exchange); callers join whatever they need
    * back by id.
    *
    * Pair generation rides [[bucketSelfJoinPairs]] with Auto salting: a
    * corpus with millions of byte-identical documents collides in EVERY
    * band — the same hot-bucket exposure as the SimHash/embedding paths,
    * and the same per-occupancy triangle split fixes it. */
  private def lshCandidates(sigs: DataFrame, cfg: MinHashConfig): DataFrame =
    bucketSelfJoinPairs(bandedSigs(sigs, cfg), Seq("band", "band_hash"),
      "id", Seq.empty, Auto)
      .distinct()

  /** LSH-candidates-then-EXACT-verify near-dup pairs: candidate pairs
    * from banded MinHash-LSH (every bucket collision, no estimated-
    * Jaccard filter), each verified by exact shingle-set Jaccard
    * (two-pointer sorted intersect over the fused-expression hash sets).
    * Output: (id_a, id_b, jaccard EXACT) with jaccard >= exactThreshold.
    *
    * The production dedup pattern at 100 TB: LSH bounds the candidate
    * set (never all-pairs), the exact verify makes precision 1.0, and
    * recall is the band-collision probability 1-(1-J^r)^b — driven to
    * ~1 at the target threshold by config (e.g. numHashes=128, bands=64
    * → r=2: a J=0.5 pair is missed with probability 0.75^64 ≈ 1e-8).
    * Value-exact against an all-pairs Jaccard oracle at such configs.
    * Docs with fewer than shingleSize words have no shingle set and are
    * excluded (the short-doc fallback only affects estimated pairs). */
  def minhashExactPairs(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): DataFrame = {
    // both per-doc hash frames are self-joined downstream (LSH left+right;
    // sh_a/sh_b verify joins) — materialize each once instead of
    // re-running the fused tokenize+hash expressions per consumer
    val sigs = sigFrame(df, idCol, textCol, cfg)
    val candidates = lshCandidates(sigs, cfg)
    val sets = setFrame(df, idCol, textCol, cfg)
    val joined = candidates
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", HashFunctions.sortedIntersectCount(col("sh_a"), col("sh_b")))
    joined.select(col("id_a"), col("id_b"),
      (col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= exactThreshold)
  }

  /** INCREMENTAL near-dup detection: pairs between a NEW batch and an
    * EXISTING corpus (plus new-vs-new pairs), without re-pairing the
    * corpus against itself — the production shape for a growing corpus,
    * where each ingest increment is deduped against everything already
    * accepted. Candidates come from joining the new batch's LSH band
    * buckets against the union's buckets, so corpus×corpus bucket
    * collisions never enter the pair join at all; each candidate is
    * verified by exact shingle-set Jaccard (precision 1.0, like
    * [[minhashExactPairs]]). Output: (new_id, other_id, jaccard) where
    * other_id is a corpus id or a smaller new id.
    *
    * Requires globally unique ids across corpus ∪ batch. Note the
    * greedy admit semantics of [[admitNew]]: within a new-only dup
    * CHAIN (n1~n2~n3, n1!~n3) every non-minimal member is dropped even
    * though its dropped partner was itself not admitted — the standard
    * conservative incremental-ingest choice (batch-global CC dedup is
    * [[minhashDedup]]).
    *
    * At 100 TB: corpus signatures/shingle sets are computed once per
    * increment here — persist them (or write them as columns at ingest)
    * and the per-increment cost is one scan of the increment plus a
    * bucket join against stored corpus signatures. */
  def minhashExactPairsAgainst(newDf: DataFrame, corpusDf: DataFrame,
      idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): DataFrame =
    minhashExactPairsAgainstSketches(newDf,
      dedupSketchColumns(corpusDf, idCol, textCol, cfg), idCol, textCol,
      cfg, exactThreshold)

  /** The (id, sig, sh) dedup sketch of a corpus — minhash signature +
    * sorted shingle-hash set per document, both map-side fused
    * expressions. WRITE THIS AT INGEST (it's ~1-2% of corpus bytes):
    * [[minhashExactPairsAgainstSketches]] then dedups every future
    * increment against the stored sketch without touching corpus text.
    *
    * The full MinHashConfig rides along as metadata on the `sig` column
    * (Spark persists column metadata through parquet round-trips), so a
    * later increment can validate seed/shingleSize too — fields that are
    * NOT detectable from the data and whose drift silently loses recall. */
  def dedupSketchColumns(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig(numHashes = 128, bands = 64)): DataFrame = {
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(SketchMetaShingleSize, cfg.shingleSize.toLong)
      .putLong(SketchMetaNumHashes, cfg.numHashes.toLong)
      .putLong(SketchMetaSeed, cfg.seed)
      .build()
    df.select(col(idCol).as("id"),
      HashFunctions.minhashFromText(col(textCol), cfg.shingleSize,
        cfg.numHashes, cfg.seed).as("sig", md),
      HashFunctions.textShingleHashes(col(textCol), cfg.shingleSize).as("sh"))
  }

  private[graft] val SketchMetaShingleSize = "graft.minhash.shingleSize"
  private[graft] val SketchMetaNumHashes = "graft.minhash.numHashes"
  private[graft] val SketchMetaSeed = "graft.minhash.seed"

  /** Fail fast on a config/sketch mismatch: a sketch written with a
    * different numHashes would make bandedSigs slice past the stored
    * signature, and seed/shingleSize drift silently loses recall
    * (missed duplicates admitted to the corpus). Sketches written by
    * [[dedupSketchColumns]] carry the FULL config as column metadata
    * (survives parquet) — validate every field schema-side, zero Spark
    * jobs. A metadata-less sketch (foreign writer / metadata stripped)
    * falls back to the one-row signature-length probe, which can only
    * see numHashes. The metadata branch needs ALL config keys — a
    * partially-stripped sketch carrying only one key must fall back to
    * the probe, not crash on the missing getLong. */
  private[operators] def validateSketchConfig(corpusSketches: DataFrame,
      cfg: MinHashConfig): Unit = {
    val sigMeta = corpusSketches.schema.find(_.name == "sig").map(_.metadata)
    val hasMeta = sigMeta.exists(m => m.contains(SketchMetaNumHashes) &&
      m.contains(SketchMetaShingleSize) && m.contains(SketchMetaSeed))
    if (hasMeta) {
      val m = sigMeta.get
      def check(key: String, expected: Long, label: String): Unit =
        require(m.getLong(key) == expected,
          s"corpus sketch was written with $label=${m.getLong(key)} but cfg.$label=$expected — " +
            "sketches must be produced with the SAME MinHashConfig")
      check(SketchMetaNumHashes, cfg.numHashes.toLong, "numHashes")
      check(SketchMetaShingleSize, cfg.shingleSize.toLong, "shingleSize")
      check(SketchMetaSeed, cfg.seed, "seed")
    } else {
      corpusSketches.select(size(col("sig")).as("n")).limit(1).collect()
        .foreach { r =>
          require(r.getInt(0) == cfg.numHashes,
            s"corpus sketch has numHashes=${r.getInt(0)} but cfg.numHashes=${cfg.numHashes} — " +
              "sketches must be produced with the SAME MinHashConfig")
        }
    }
  }

  /** [[minhashExactPairsAgainst]] with the corpus side PRECOMPUTED as a
    * [[dedupSketchColumns]] frame (typically read back from parquet):
    * the per-increment cost is one scan of the increment plus bucket
    * joins against the stored sketches — corpus text is never re-read,
    * re-tokenized, or re-hashed. The sketch must have been produced
    * with the SAME MinHashConfig (seed/hashes/bands/shingle size). */
  def minhashExactPairsAgainstSketches(newDf: DataFrame, corpusSketches: DataFrame,
      idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): DataFrame = {
    validateSketchConfig(corpusSketches, cfg)
    val newSigs = sigFrame(newDf, idCol, textCol, cfg)
    val corpusSigs = corpusSketches.select(col("id"), col("sig"))
      .filter(col("sig").getItem(0) =!= Long.MaxValue)
      .transform(Materialize.once(_))
    // one side of the bucket join is ONLY the new batch; the other is
    // corpus ∪ new (so new-vs-new dups are caught too), tagged so a
    // corpus partner is recognized regardless of how the two id spaces
    // compare numerically
    val l = bandedSigs(newSigs, cfg).select(col("band"), col("band_hash"), col("id").as("id_new"))
    val rt = bandedSigs(corpusSigs, cfg).withColumn("other_in_corpus", lit(true))
      .union(bandedSigs(newSigs, cfg).withColumn("other_in_corpus", lit(false)))
      .select(col("band"), col("band_hash"), col("id").as("id_other"), col("other_in_corpus"))
    val candidates = l.join(rt, Seq("band", "band_hash"))
      // corpus partner: any id; new partner: only SMALLER new ids, so
      // each new-vs-new pair is emitted once and never as a self-pair
      .filter(col("other_in_corpus") || col("id_other") < col("id_new"))
      .select("id_new", "id_other", "other_in_corpus").distinct()

    val newSets = setFrame(newDf, idCol, textCol, cfg)
    val corpusSets = corpusSketches.select(col("id"), col("sh"))
      .filter(size(col("sh")) > 0)
      .transform(Materialize.once(_))
    val allSets = corpusSets.union(newSets)
    val joined = candidates
      .join(newSets.select(col("id").as("id_new"), col("sh").as("sh_a")), Seq("id_new"))
      .join(allSets.select(col("id").as("id_other"), col("sh").as("sh_b")), Seq("id_other"))
      .withColumn("inter", HashFunctions.sortedIntersectCount(col("sh_a"), col("sh_b")))
    joined.select(col("id_new"), col("id_other"), col("other_in_corpus"),
      (col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= exactThreshold)
  }

  /** New-batch rows that survive incremental dedup: everything in
    * `newDf` that near-duplicates NEITHER the corpus NOR a smaller-id
    * member of its own batch (the min-id representative of each
    * new-only dup group is admitted). Any pair at all dooms its
    * id_new — corpus partners always, new partners by construction
    * only when smaller. */
  def admitNew(newDf: DataFrame, corpusDf: DataFrame,
      idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): DataFrame = {
    val doomed =
      minhashExactPairsAgainst(newDf, corpusDf, idCol, textCol, cfg, exactThreshold)
        .select(col("id_new").as(idCol)).distinct()
    newDf.join(doomed, Seq(idCol), "left_anti")
  }

  /** [[admitNew]] with the corpus side given as a PRECOMPUTED
    * [[dedupSketchColumns]] frame — the ingest-loop shape at scale: the
    * corpus text is never re-read or re-hashed; each increment costs
    * one scan of the increment plus bucket joins against the stored
    * sketches (~1-2% of corpus bytes). Same admission semantics as
    * [[admitNew]] (sketches are a deterministic function of the text).
    * The caller maintains the sketch sidecar by appending
    * `dedupSketchColumns(admitted)` alongside each admitted batch. */
  def admitNewAgainstSketches(newDf: DataFrame, corpusSketches: DataFrame,
      idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): DataFrame = {
    val doomed =
      minhashExactPairsAgainstSketches(newDf, corpusSketches, idCol, textCol,
        cfg, exactThreshold)
        .select(col("id_new").as(idCol)).distinct()
    newDf.join(doomed, Seq(idCol), "left_anti")
  }

  /** Corpus with the near-duplicate groups of `pairs` collapsed to their
    * min-id representative: exact fixpoint connected components over the
    * pair graph ([[Sampling.connectedComponents]] — a chain a-b, b-c
    * keeps only a, however long the chain), then every non-representative
    * member is dropped via one anti join. The component computation runs
    * over the pair MEMBERS only (the near-dup subgraph, typically a tiny
    * fraction of the corpus), not the corpus.
    *
    * The pair DAG is materialized once — it is consumed four times
    * (members union + undirected edge union) and Spark shares no common
    * subplans across union branches. */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("id_a"), col("id_b")).transform(Materialize.once(_))
    val members = p.select(col("id_a").as("id"))
      .union(p.select(col("id_b").as("id"))).distinct()
    val doomed = Sampling.connectedComponents(members, p)
      .filter(col("rep") =!= col("id"))
      .select(col("id").as(idCol))
    df.join(doomed, Seq(idCol), "left_anti")
  }

  /** Corpus with MinHash near-duplicates removed. */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame =
    dropNearDuplicates(df, idCol, minhashPairs(df, idCol, textCol, cfg))

  /** Corpus with SimHash near-duplicates (Hamming ≤ maxHamming) removed. */
  def simhashDedup(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, seed: Long = 42L, chunks: Int = Auto,
      agreeChunks: Int = Auto): DataFrame =
    dropNearDuplicates(df, idCol,
      simhashPairs(df, idCol, textCol, maxHamming, seed, chunks, agreeChunks))

  /** Corpus with exact n-gram-Jaccard near-duplicates (J ≥ threshold)
    * removed. */
  def ngramJaccardDedup(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame =
    dropNearDuplicates(df, idCol, ngramJaccardPairs(df, idCol, textCol, n, threshold))

  /** Corpus with embedding-cosine near-duplicates (cos ≥ threshold)
    * removed. */
  def embeddingDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, signBits: Int = Auto, seed: Long = 42L,
      dim: Int = 64): DataFrame =
    dropNearDuplicates(df, idCol,
      embeddingNearDupPairs(df, idCol, vecCol, threshold, signBits, seed, dim))

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    * Candidate generation: the 64-bit hash is split into `chunks` equal
    * bit ranges and bucketed on every `agreeChunks`-combination of them
    * (pigeonhole-exact for maxHamming ≤ chunks - agreeChunks). Billion-
    * doc corpora use (chunks=8, agreeChunks=4): 32-bit bucket keys →
    * ~3,700× fewer expected candidates at radius ≤ 4; see
    * [[simhashPairsFromSigs]] for the trade table.
    *
    * NOT a pure lazy plan builder with `saltBuckets = Auto` (default):
    * one bounded bucket-occupancy job runs at call time (see
    * [[bucketSelfJoinPairs]]); nothing stays cached after the call. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, seed: Long = 42L, chunks: Int = Auto,
      agreeChunks: Int = Auto, saltBuckets: Int = Auto): DataFrame = {
    // exclude token-free documents (mirrors minhashPairs' empty-doc
    // exclusion): every no-word doc simhashes to the degenerate all-zero
    // signature, so empties would pair with each other O(n²) at hamming 0
    // and with sparse real docs. \S matches exactly the tokenizer's
    // non-whitespace classes (Tokenize.isWs = Java regex \s).
    val hashed = df.filter(col(textCol).rlike("\\S"))
      .select(col(idCol).as("id"),
        HashFunctions.simhashFromText(col(textCol), seed).as("sh"))
    simhashPairsFromSigs(hashed, maxHamming, chunks, agreeChunks, saltBuckets)
  }

  /** Pair generation over PRE-COMPUTED 64-bit signatures (id, sh) —
    * the candidate machinery of [[simhashPairs]] with the hash function
    * pluggable (e.g. an engine-portable md5-derived signature whose
    * values an external oracle can reproduce).
    *
    * `chunks` splits the 64-bit signature into that many equal bit
    * ranges, and the bucket key is every COMBINATION of `agreeChunks`
    * of them — pigeonhole-EXACT for maxHamming ≤ chunks - agreeChunks
    * (≤ maxHamming chunks can differ, so some agreeChunks-subset of
    * the rest is untouched and its concatenated value matches).
    *
    * The two knobs trade radius against candidate volume, which is
    * combos × n² / 2^(agreeChunks·64/chunks):
    *   - (4, 1) — default: radius ≤ 3, 16-bit keys, 4 entries/doc.
    *   - (8, 1): radius ≤ 7 — wider radius, but 8-bit keys → 256
    *     bucket values → occupancy n/256: MORE candidates, never use
    *     for scale, only for radius.
    *   - (8, 4): radius ≤ 4, 32-bit keys, C(8,4)=70 entries/doc →
    *     ~70/4 × 2⁻¹⁶ ≈ 3,700× fewer expected candidates than the
    *     default — the billion-doc configuration (the "second-level
    *     band" fix for bucket occupancy).
    * 64 must divide evenly into `chunks` ranges. */
  def simhashPairsFromSigs(hashed: DataFrame, maxHamming: Int = 3,
      chunks: Int = Auto, agreeChunks: Int = Auto,
      saltBuckets: Int = Auto): DataFrame = {
    require(chunks != Auto || agreeChunks == Auto,
      "agreeChunks without chunks is ambiguous: pass chunks too (or leave both Auto)")
    // validate BEFORE any job runs: in reliable-checkpoint mode the
    // materialization below eagerly computes and checkpoints the whole
    // signature frame — bad parameters must fail in microseconds, not
    // after a corpus-scale job (and its orphaned checkpoint files)
    def validate(c: Int, a: Int): Unit = {
      require(c >= 2 && 64 % c == 0,
        s"chunks must divide 64 evenly and be >= 2 (got $c)")
      require(a >= 1 && a <= c,
        s"agreeChunks must be in [1, chunks] (got $a)")
      require(maxHamming <= c - a,
        s"pigeonhole candidate generation is exact only for maxHamming <= chunks - agreeChunks " +
          s"(got maxHamming=$maxHamming, chunks=$c, agreeChunks=$a)")
      require(a * (64 / c) <= 60,
        s"combined bucket key needs ${a * (64 / c)} bits (> 60): lower agreeChunks")
    }
    if (chunks == Auto)
      // both Auto outcomes are valid by construction; only the radius
      // bound can fail, and it fails the same way for either outcome
      require(maxHamming <= 4,
        s"auto-banding supports maxHamming <= 4 (got $maxHamming): every exact banding at " +
          "radius >= 5 has catastrophic bucket occupancy — pass chunks/agreeChunks explicitly")
    else validate(chunks, if (agreeChunks == Auto) 1 else agreeChunks)
    // the signature frame feeds both sides of the chunk-bucket self-join;
    // materialize once so the per-doc hash expression doesn't run twice
    val sigs = hashed.transform(Materialize.once(_))
    // Auto: one count over the materialized signatures (a pass the join
    // pays anyway) sizes the banding to the corpus — both configurations
    // are exact at the requested radius, so this never changes results.
    // Explicit chunks with Auto agreeChunks keeps the single-chunk bands.
    val (ch, ag) =
      if (chunks == Auto) resolveSimhashBanding(sigs.count(), maxHamming)
      else (chunks, if (agreeChunks == Auto) 1 else agreeChunks)
    validate(ch, ag)
    val bits = 64 / ch
    val mask = if (bits == 64) -1L else (1L << bits) - 1L
    val combos = (0 until ch).combinations(ag).toSeq
    require(combos.length <= 512,
      s"C($ch, $ag) = ${combos.length} bucket entries per doc is impractical")
    // one bucket entry per combo: key = the combo's chunk values packed
    // into one long (combo identity rides in the posexplode position)
    val comboVals = combos.map { combo =>
      combo.zipWithIndex.map { case (chunkIdx, slot) =>
        shiftleft(
          shiftrightunsigned(col("sh"), chunkIdx * bits).bitwiseAND(lit(mask)),
          slot * bits)
      }.reduce[Column](_ + _)
    }
    val chunked = sigs.select(col("id"), col("sh"),
      posexplode(array(comboVals: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    bucketSelfJoinPairs(chunked, Seq("chunk", "chunk_val"), "id", Seq("sh"), saltBuckets)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Every unordered intra-bucket pair, generated exactly once.
    *
    * `salt = 1` is the plain bucket self-join: correct, but a HOT bucket
    * (adversarial corpus: millions of identical documents → one
    * signature) funnels all of its B²/2 pairs through the single task
    * that owns that join key. `salt = g > 1` triangle-splits each
    * bucket: rows are hashed into g groups and every group-pair (i ≤ j)
    * becomes its own join key — the left side replicates a row into
    * cells (s, s..g-1), the right side into cells (0..s, s) — so the hot
    * bucket becomes g(g+1)/2 independent cells of ≈ (B/g)² pairs each,
    * at the cost of replicating each bucket entry ~g times. Every pair
    * still appears exactly once: off-diagonal cells pair distinct salt
    * groups (orientation then normalized to id_a < id_b, payloads
    * following their ids); diagonal cells filter id_a < id_b directly.
    *
    * `salt = Auto` (the default everywhere) derives g PER BUCKET from
    * observed occupancy: one partial-aggregated count over the bucket
    * keys (map-side combine — a hot key collapses to one row per
    * partition, so the stats pass itself cannot hot-spot), then only
    * buckets over [[SaltOccupancyFloor]] get g = ceil(B /
    * floor) (capped at [[MaxAutoSalt]]), broadcast-joined back onto the
    * entries; everything else keeps g = 1. A uniform g would replicate
    * the WHOLE corpus ~g× to fix one adversarial bucket — per-bucket
    * sizing makes only the hot buckets pay, which is what survives both
    * the 100 TB benign corpus (zero replication) and the million-
    * identical-docs attack (bounded cells) with one default. The
    * triangle proof is untouched: g is constant within a bucket, and
    * pairs only form within buckets.
    *
    * `payload` columns are emitted twice as `<c>_a` / `<c>_b`. */
  private def bucketSelfJoinPairs(entries: DataFrame, bucketCols: Seq[String],
      idCol: String, payload: Seq[String], salt: Int): DataFrame = {
    require(salt == Auto || salt >= 1, s"salt must be >= 1 or Auto (got $salt)")
    val keys = bucketCols.map(col)
    def plainJoin: DataFrame = {
      val l = entries.select((keys :+ col(idCol).as("id_a")) ++
        payload.map(c => col(c).as(s"${c}_a")): _*)
      val r = entries.select((keys :+ col(idCol).as("id_b")) ++
        payload.map(c => col(c).as(s"${c}_b")): _*)
      l.join(r, bucketCols)
        .filter(col("id_a") < col("id_b"))
        .select((Seq(col("id_a"), col("id_b")) ++
          payload.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b")))): _*)
    }
    if (salt == 1) plainJoin
    else {
      // per-row salt-group count __g: Auto sizes it from the bucket's
      // observed occupancy (hot buckets only — the broadcast side holds
      // just buckets over the floor, bounded by n/floor rows); explicit
      // salt applies uniformly
      val withG =
        if (salt == Auto) {
          val floor = sessionSaltFloor(entries.sparkSession)
          // EAGER: Auto runs the occupancy probe as ONE Spark job here,
          // at plan-construction time (documented on the public pair
          // operators). The probe is BOUNDED: it collects at most
          // LocalHotRelationCap+1 hot buckets to the driver
          val hotPlan = entries.groupBy(keys: _*)
            .agg(count(lit(1)).as("__bcnt"))
            .filter(col("__bcnt") > floor)
            .select((keys :+
              least(ceil(col("__bcnt") / floor.toDouble),
                lit(MaxAutoSalt.toLong)).cast("int").as("__g")): _*)
          val localHotCap = sessionLocalHotCap(entries.sparkSession)
          val hotRows = hotPlan.limit(localHotCap + 1).collect()
          // benign corpus (no bucket over the floor): keep the plain
          // explode-free join — Auto's only cost is this one
          // partial-aggregated probe (a hot key collapses map-side, so
          // the probe itself cannot skew)
          if (hotRows.isEmpty) return plainJoin
          if (hotRows.length <= localHotCap) {
            // the common corpus: a bounded hot set rides a LOCAL
            // relation — nothing stays persisted or checkpoint-pinned
            // after the call, and the pair join never re-runs the
            // aggregation
            val hot = entries.sparkSession.createDataFrame(
              java.util.Arrays.asList(hotRows: _*), hotPlan.schema)
            entries.join(broadcast(hot), bucketCols, "left")
              .withColumn("__g", coalesce(col("__g"), lit(1)))
          } else {
            // MANY hot buckets (a low session floor, or degenerate
            // duplicate mass): a LocalRelation this size serializes
            // into EVERY task closure — the round-17 sf100 sweep
            // measured 58 MB tasks and a heap OOM from exactly this
            // (the forced-salting gate's floor=1 turns every
            // ≥2-occupant bucket hot, ~n/floor rows stops being
            // small). Keep the hot frame DISTRIBUTED and let the
            // broadcast exchange ship it once per executor instead of
            // once per task; the occupancy agg re-runs one map-side-
            // combined pass to build the broadcast — the honest price
            // of not holding corpus-scale state on the driver.
            entries.join(broadcast(hotPlan), bucketCols, "left")
              .withColumn("__g", coalesce(col("__g"), lit(1)))
          }
        } else entries.withColumn("__g", lit(salt))
      val salted = withG.withColumn("__salt",
        pmod(xxhash64(col(idCol)), col("__g").cast("long")).cast("int"))
      val l = salted.select((keys :+ col("__salt").as("__ci") :+
        explode(sequence(col("__salt"), col("__g") - 1)).as("__cj") :+
        col(idCol).as("id_a")) ++ payload.map(c => col(c).as(s"${c}_a")): _*)
      val r = salted.select((keys :+
        explode(sequence(lit(0), col("__salt"))).as("__ci") :+
        col("__salt").as("__cj") :+
        col(idCol).as("id_b")) ++ payload.map(c => col(c).as(s"${c}_b")): _*)
      val ordered = col("id_a") < col("id_b")
      l.join(r, bucketCols ++ Seq("__ci", "__cj"))
        .filter(col("id_a") =!= col("id_b"))
        // off-diagonal cells hold each pair once (salts differ); diagonal
        // cells hold both orientations — keep the ordered one
        .filter(col("__ci") < col("__cj") || ordered)
        .select((Seq(
          least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b")) ++
          payload.flatMap(c => Seq(
            when(ordered, col(s"${c}_a")).otherwise(col(s"${c}_b")).as(s"${c}_a"),
            when(ordered, col(s"${c}_b")).otherwise(col(s"${c}_a")).as(s"${c}_b")))): _*)
    }
  }

  // ---- exact n-gram Jaccard ---------------------------------------------

  /** Exact Jaccard similarity over word n-gram shingle SETS for all pairs
    * with similarity ≥ threshold.
    *
    * `candidateGen` routes CANDIDATE GENERATION (verification is exact
    * shingle Jaccard either way, so precision is always 1.0):
    * "prefix" — the sound PPJoin index below — is the default ("auto"
    * resolves to it at every threshold); "lsh" replaces it with
    * single-hash-band MinHash bucketing whose per-pair miss bound
    * (1−J)^b is sized ≤ 1e-12 at the requested threshold. MEASURED
    * (round 11, synthetic docs, t=0.2, same box): the LSH route is
    * SLOWER at every scale — sf0.1 5.9 s vs 2.8 s, sf1.0 18.3 s vs
    * 8.5 s, sf10 247 s vs 125 s — because recall 1−1e-12 at J ≥ 0.2
    * forces single-hash bands that also catch the corpus's J ≈ 0.005
    * background (1−(1−J)^128 ≈ 0.5): 7.5M candidates at sf1.0 vs the
    * rarity-ranked prefix index's far fewer (common-shingle overlap
    * never enters a rare prefix). r=2 banding cuts candidates 10× but
    * its 5× band-row volume costs more than the verify it saves. The
    * "lsh" opt-in remains for corpora whose background overlap is
    * genuinely near zero (disjoint vocabularies), where its candidate
    * count collapses to true pairs. For low-threshold NEAR-DUP intent
    * (not exact-J output), [[minhashDedup]]'s estimated-threshold
    * contract stays the at-scale answer.
    *
    * Scale shape (PPJoin-style prefix filtering, lossless for J ≥ t):
    * two shingle sets with Jaccard ≥ t must share at least one of each
    * set's (|S| - ⌈t·|S|⌉ + 1) globally-RAREST shingles, so only that
    * prefix is indexed. The inverted-index join then explodes on rare
    * shingles instead of stop-shingles — Σ count(g)² collapses by orders
    * of magnitude on natural-language corpora. PPJoin's POSITIONAL
    * filter prunes further before the verify join: at a pair's FIRST
    * shared prefix shingle (in the global rarity order every document's
    * list shares), all shared shingles sit at or after ranks (r_a, r_b)
    * — any earlier shared shingle would itself be in both prefixes,
    * contradicting firstness — so the overlap is bounded by
    * 1 + min(|A|−r_a, |B|−r_b), and J ≥ t needs overlap ≥
    * t·(|A|+|B|)/(1+t); candidates whose best (first-match) bound falls
    * short are dropped with zero loss (the bound is checked per shared
    * occurrence and is loosest at the first, so "any occurrence passes"
    * ≡ "the sound first-occurrence bound passes"). Candidate pairs
    * travel as bare (id_a, id_b); exact intersection is computed once
    * per candidate from the two full arrays (array_intersect), not by
    * re-aggregating the inverted index.
    *
    * `shingleKeepFraction < 1` is the EXPLICIT approximate opt-in for
    * corpora where even prefix-filtered exact joins explode (huge docs ×
    * huge corpus): every document keeps the same hash-selected fraction
    * of the shingle universe (consistent sampling — a shingle is kept in
    * either every document or none), so the Jaccard of the sampled sets
    * is a consistent estimator of the true Jaccard, shrinking shingle
    * volume (index size, candidate verify cost) by ~1/fraction. Identical
    * documents still score exactly 1.0 (identical sets sample
    * identically); near-dup scores carry sampling noise, so borderline
    * pairs can cross the threshold in either direction. Never the
    * default.
    *
    * `spillPolicy` decides what happens when the pre-flight estimate of
    * the prefix index's shuffle volume exceeds the session budget
    * ([[NgramSpillBudgetKey]]): "advise" (default) warns and proceeds
    * exact; "sample" auto-composes the keep fraction that fits — the
    * caller's opt-in to the sampled-set contract above at whatever
    * scale trips the budget, announced loudly when it fires; "fail"
    * refuses up front naming the knobs. At bench scales the budget
    * never trips, so all three are the exact route.
    *
    * The estimate runs in TWO stages (round-17): stage 1 gates on the
    * linear occurrence term (plus a measured prior for candidates)
    * before any index exists; stage 2 re-gates on the EXACT candidate
    * count — Σ_g c·(c−1)/2 over the materialized prefix index — and
    * under "sample" can tighten (rebuild at a smaller fraction) or
    * relax a stage-1 fraction the prior over-tightened, never past the
    * caller's own fraction. EAGERNESS: constructing the returned
    * DataFrame runs real jobs on the prefix route (the set-count agg,
    * the prefix-index materialization, and the stage-2 count) — plan-
    * only consumers (explain, dry planning) pay them; this has been
    * true of the set materialization since round 14 and is the price
    * of a pre-flight that can see real volumes. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5,
      shingleKeepFraction: Double = 1.0,
      candidateGen: String = "auto",
      spillPolicy: String = "advise"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shingleKeepFraction > 0.0 && shingleKeepFraction <= 1.0,
      s"shingleKeepFraction must be in (0, 1] (got $shingleKeepFraction)")
    require(Set("auto", "prefix", "lsh").contains(candidateGen),
      s"candidateGen must be auto|prefix|lsh (got $candidateGen)")
    require(Set("advise", "sample", "fail").contains(spillPolicy),
      s"spillPolicy must be advise|sample|fail (got $spillPolicy)")
    // the LSH route's ≤1e-12 miss bound is stated against FULL-shingle
    // Jaccard (signatures hash the full stream), but the verify Jaccard
    // under shingleKeepFraction < 1 is over the SAMPLED sets — the two
    // quantities differ by sampling noise, so no sound bound would
    // apply to the output. Refuse the combination loudly rather than
    // ship an unbounded "bounded" mode; the prefix index composes with
    // sampling soundly (it indexes the sampled sets themselves).
    require(candidateGen != "lsh" || shingleKeepFraction == 1.0,
      "candidateGen=lsh requires shingleKeepFraction=1.0: its recall " +
        "bound is against full-shingle Jaccard and does not transfer " +
        "to sampled-set Jaccard (use prefix with sampling instead)")
    // 64-bit shingle hashes stand in for shingle strings: distinct/
    // intersect/frequency semantics are preserved (collisions negligible),
    // and the fused native expression computes each document's set in one
    // byte pass.
    // the shingle-set frame is consumed three times (inverted index +
    // sh_a/sh_b verify joins) and the prefix index twice (candidate
    // self-join) — materialize each once
    val keepDen = 1L << 20
    val keepNum = math.max(1L, math.round(shingleKeepFraction * keepDen))
    val rawSets = df.select(col(idCol).as("id"),
      HashFunctions.textShingleHashes(col(textCol), n).as("sh"))
    val sampled =
      if (keepNum >= keepDen) rawSets
      // consistent sample on the shingle HASH value: membership is a pure
      // function of the shingle, identical across documents (pmod handles
      // the sign of the 64-bit hash)
      else rawSets.withColumn("sh",
        filter(col("sh"), g => pmod(g, lit(keepDen)) < lit(keepNum)))
    val sets0 = sampled
      .filter(size(col("sh")) > 0)
      .transform(Materialize.once(_))

    // pre-flight spill check, STAGE 1 of 2 (prefix route): the index
    // pipeline's shuffle volume has a LINEAR term (occurrence rows
    // shuffled by the explode → document-frequency join → rarity-rank
    // window passes) and a CANDIDATE term (self-join output rows) —
    // linear × 100 TB exhausts a box (the round-14 sf100 probe died on
    // disk with zero warning). Stage 1 gates on the linear term alone
    // from one cheap agg over the just-materialized sets; stage 2
    // (below, after the prefix index materializes) gates on the EXACT
    // candidate count. `spillPolicy` decides what an over-budget
    // estimate DOES (the budget is conf-tunable — aggregate cluster
    // shuffle disk is the real limit and only the session operator
    // knows it):
    //   "advise" (default) — warn LOUDLY with the composable knobs and
    //     proceed exact; the round-14/15 behavior.
    //   "sample" — auto-compose the shingleKeepFraction that fits the
    //     budget (floor 0.01). The output contract CHANGES when the
    //     route fires: jaccard becomes consistent sampled-set Jaccard
    //     (identical docs still score exactly 1.0; borderline pairs
    //     carry sampling noise) — an explicit caller opt-in, announced
    //     on stderr with the chosen fraction, never a silent downgrade.
    //     Sampling composes on the MATERIALIZED sets (membership is a
    //     pure function of the shingle hash, so a tighter pmod filter
    //     on the snapshot ≡ sampling at the product fraction — no
    //     re-hash of the corpus).
    //   "fail" — refuse up front naming the knobs, for pipelines that
    //     would rather schedule a minhash pass than approximate here.
    val budget = ngramSpillBudget(df.sparkSession)
    var occEff = 0L // stage-1 occurrence count scaled to the fraction in force
    var fracEff = shingleKeepFraction
    val sets: DataFrame = if (candidateGen == "lsh") sets0 else {
      val st = sets0.agg(count(lit(1)), sum(size(col("sh")))).head()
      val totalShingles = if (st.isNullAt(1)) 0L else st.getLong(1)
      occEff = totalShingles
      val est = totalShingles * NgramLinearBytesPerShingle
      if (est <= budget) sets0
      else spillPolicy match {
        case "advise" =>
          System.err.println(ngramSpillMessage(totalShingles, st.getLong(0),
            shingleKeepFraction, est, budget, "ADVISORY"))
          sets0
        case "fail" =>
          throw new IllegalStateException(ngramSpillMessage(totalShingles,
            st.getLong(0), shingleKeepFraction, est, budget, "REFUSED " +
              "(spillPolicy=fail)"))
        case "sample" =>
          // ADVICE r16: the 1% floor can EXCEED a caller fraction that
          // was already tighter — clamp so the announcement never
          // claims a larger fraction than the data actually carries,
          // and skip the no-op filter when nothing changes
          val fit = math.min(shingleKeepFraction,
            ngramFitKeepFraction(shingleKeepFraction, est, budget))
          val fitNum = math.max(1L, math.round(fit * keepDen))
          if (fitNum >= keepNum) {
            System.err.println(ngramSpillMessage(totalShingles, st.getLong(0),
              shingleKeepFraction, est, budget,
              "OVER BUDGET but fraction unchanged (spillPolicy=sample; " +
                f"in-force shingleKeepFraction=$shingleKeepFraction%.3f is " +
                "already at or below the fitting fraction)"))
            sets0
          } else {
            occEff = math.round(totalShingles * (fit / shingleKeepFraction))
            fracEff = fit
            System.err.println(ngramSpillMessage(totalShingles, st.getLong(0),
              shingleKeepFraction, est, budget,
              f"AUTO-SAMPLING at shingleKeepFraction=$fit%.3f " +
                "(spillPolicy=sample; output is sampled-set Jaccard)"))
            sets0.withColumn("sh",
              filter(col("sh"), g => pmod(g, lit(keepDen)) < lit(fitNum)))
              .filter(size(col("sh")) > 0)
          }
      }
    }

    // ---- candidate generation: two routes with the same exact verify.
    //
    // PREFIX (the exact PPJoin index) is sound at any threshold; LSH
    // (single-hash bands, r=1) bounds candidates by bucket collisions
    // instead: a true pair at J ≥ t is missed with probability (1−J)^b,
    // and b is sized so that bound is ≤ 1e-12 at the requested
    // threshold (b = −ln(1e-12) / −ln(1−t), clamped to [128, 1024] —
    // 128 covers t ≥ 0.194; below t ≈ 0.024 the clamp binds and the
    // miss bound loosens, printed in the bound formula, never
    // silently). AUTO resolves to prefix — measured slower for LSH at
    // every scale on corpora with normal background vocabulary overlap
    // (see scaladoc); "lsh" is the explicit opt-in.
    val useLsh = candidateGen == "lsh"
    // the prefix index from a given (possibly resampled) sets frame;
    // materialized because the candidate self-join consumes it twice
    // and the stage-2 gate reads it once
    def buildRanked(s: DataFrame): DataFrame = {
      val inv = s.select(col("id"), size(col("sh")).as("nsh"), explode(col("sh")).as("g"))
      // global shingle document-frequency; rare-first ordering
      val freq = inv.groupBy("g").agg(count(lit(1)).as("gdf"))
      inv.join(freq, Seq("g"))
        .withColumn("r", row_number().over(
          Window.partitionBy("id").orderBy(col("gdf"), col("g"))))
        .filter(col("r") <= col("nsh") - ceil(col("nsh") * threshold) + 1)
        .select("g", "id", "nsh", "r")
        .transform(Materialize.once(_))
    }
    val (setsF: DataFrame, rankedF: Option[DataFrame]) = if (useLsh) (sets, None) else {
      // pre-flight spill check, STAGE 2: the prefix index exists now,
      // so the candidate self-join's output volume is no longer a
      // prior — Σ_g c·(c−1)/2 over the index's per-shingle entry
      // counts IS the join's output row count (the size-ratio and
      // positional filters only prune below it). One cheap agg over
      // the just-materialized snapshot replaces the round-14..16 blunt
      // half-budget safety factor with a measured second term; the fit
      // can TIGHTEN (rebuild at a smaller fraction — the emergency the
      // gate exists for) or RELAX a stage-1 fraction that the prior
      // over-tightened (never past the caller's own fraction). The
      // superseded snapshot after a rebuild is released by Spark's
      // ContextCleaner once unreachable.
      val ranked0 = buildRanked(sets)
      val candPairs0 = rankedCandidatePairs(ranked0)
      val spent = occEff * NgramLinearBytesPerShingle
      val candTerm = candPairs0 * NgramCandidateBytesPerPair
      val est2 = spent + candTerm
      if (est2 <= budget && fracEff >= shingleKeepFraction) (sets, Some(ranked0))
      else {
        // single direction-agnostic fit: m× the in-force fraction such
        // that already-spent + m×(linear rebuild + candidate join)
        // targets the headroom'd budget; m>1 relaxes, m<1 tightens
        val m =
          if (spent + candTerm <= 0) 1.0
          else (NgramFitHeadroom * budget - spent) / (spent + candTerm).toDouble
        val fitAbs = math.min(shingleKeepFraction,
          math.max(math.min(0.01, fracEff), fracEff * m))
        def announce(verdict: String): Unit =
          System.err.println(ngramCandidateSpillMessage(candPairs0, spent,
            candTerm, budget, fracEff, verdict))
        if (est2 <= budget) {
          // under budget with room to spare: relax a stage-1 fraction
          // the prior over-tightened, when the gain is worth a rebuild
          if (fitAbs > fracEff * NgramRelaxMinGain) {
            announce(f"RELAXING stage-1 fraction to " +
              f"shingleKeepFraction=$fitAbs%.3f (measured candidate " +
              "volume came in under the stage-1 prior)")
            val s = resampleSets(sets0, fitAbs, keepDen)
            fracEff = fitAbs
            (s, Some(buildRanked(s)))
          } else (sets, Some(ranked0))
        } else spillPolicy match {
          case "advise" =>
            announce("ADVISORY"); (sets, Some(ranked0))
          case "fail" =>
            val msg = ngramCandidateSpillMessage(candPairs0, spent, candTerm,
              budget, fracEff, "REFUSED (spillPolicy=fail)")
            System.err.println(msg)
            throw new IllegalStateException(msg)
          case "sample" =>
            if (fitAbs >= fracEff) {
              announce("OVER BUDGET but fraction unchanged " +
                "(spillPolicy=sample; the in-force fraction is already " +
                "at or below the fitting fraction)")
              (sets, Some(ranked0))
            } else {
              announce(f"AUTO-SAMPLING at shingleKeepFraction=$fitAbs%.3f " +
                "(spillPolicy=sample; output is sampled-set Jaccard)")
              val s = resampleSets(sets0, fitAbs, keepDen)
              fracEff = fitAbs
              (s, Some(buildRanked(s)))
            }
        }
      }
    }
    val candidates: DataFrame = if (useLsh) {
      val b = math.min(1024, math.max(128,
        math.ceil(-math.log(1e-12) / -math.log1p(-threshold)).toInt))
      val sigCfg = MinHashConfig(shingleSize = n, numHashes = b, bands = b)
      lshCandidates(sigFrame(df, idCol, textCol, sigCfg), sigCfg)
    } else {
      val ranked = rankedF.get
      // minimum overlap for J ≥ t: I/(n_a+n_b-I) ≥ t ⟺ I ≥ t(n_a+n_b)/(1+t);
      // the slack keeps double rounding from tightening the integer bound
      // at exact-threshold edges (a dropped candidate is never re-verified,
      // so the prune must only ever be loose). Rounding error of the
      // product SCALES with (n_a+n_b) (~ulps of the sum — ≥ 1e-9 absolute
      // already at a few million shingles), so the slack carries a
      // relative term alongside the absolute one: (n_a+n_b)·1e-12 is
      // ~4,000× the worst-case 2-ulp error yet loosens the bound by < 1
      // until sets reach 10^12 shingles.
      val minOverlap = ceil((col("n_a") + col("n_b")) * (threshold / (1 + threshold))
        - lit(1e-9) - (col("n_a") + col("n_b")) * lit(1e-12))
      ranked.select(col("g"), col("id").as("id_a"), col("nsh").as("n_a"), col("r").as("r_a"))
        .join(ranked.select(col("g"), col("id").as("id_b"), col("nsh").as("n_b"), col("r").as("r_b")), Seq("g"))
        .filter(col("id_a") < col("id_b") &&
          // size-ratio pruning: J ≥ t ⇒ t·|B| ≤ |A| ≤ |B|/t
          col("n_a") >= col("n_b") * threshold && col("n_b") >= col("n_a") * threshold &&
          // positional filter: overlap ≤ 1 + min(n−r) at the first shared
          // prefix shingle (see scaladoc — sound there, loosest there)
          lit(1) + least(col("n_a") - col("r_a"), col("n_b") - col("r_b")) >= minOverlap)
        .select("id_a", "id_b").distinct()
    }

    val joined = candidates
      .join(setsF.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(setsF.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      // two-pointer merge over the sorted hash arrays — no per-row hash set
      .withColumn("inter", HashFunctions.sortedIntersectCount(col("sh_a"), col("sh_b")))

    joined.select(col("id_a"), col("id_b"),
      (col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Runtime conf key: shuffle-spill budget (bytes) for the exact
    * n-gram prefix index's pre-flight advisory. Default
    * [[NgramSpillBudgetDefault]] — sized for a single large box; a
    * cluster deployment should raise it to its aggregate shuffle
    * disk. */
  val NgramSpillBudgetKey = "graft.dedup.ngram.spillBudgetBytes"

  /** 32 GiB: under the ~47 GB free disk that the round-14 sf100 probe
    * exhausted, over anything the bench scales reach. */
  val NgramSpillBudgetDefault: Long = 32L << 30

  /** Estimated LOCAL-DISK bytes per shingle OCCURRENCE across the
    * LINEAR passes of the prefix pipeline (inverted-list explode →
    * document-frequency join → per-doc rarity-rank window — each pass
    * shuffles the occurrence rows once, ~28-36 B serialized each, and
    * shuffle files ACCUMULATE until the job ends rather than streaming
    * away, so the estimate covers their SUM plus the materialized set
    * and index snapshots). Calibration: the round-16 sf100 re-run
    * measured 260M occurrences writing 30+ GB cumulative BY THE RANK
    * STAGE (i.e. the linear passes alone) — ≥124 B/occ. 128 carries
    * that measurement; the round-14..16 single blunt constant (192,
    * then halved again by a 0.5 safety factor) bundled the candidate
    * self-join into this number, which stage 2 now prices from the
    * EXACT per-shingle entry counts instead. */
  private[graft] val NgramLinearBytesPerShingle = 128L

  /** Estimated LOCAL-DISK bytes per CANDIDATE PAIR: one self-join
    * output row through the map-side filters into the distinct
    * exchange, plus the surviving pairs' two verify-join shuffles,
    * amortized. Round-16 reference point: the sampled sf100 run's
    * candidate stages wrote 36.7 GB — same order as its linear passes
    * at t=0.2. Provisional until this round's healthy-disk sf100
    * calibration; an over-estimate merely samples a little early. */
  private[graft] val NgramCandidateBytesPerPair = 64L

  /** Stage-1 PRIOR for the candidate-to-linear byte ratio, used only
    * before the prefix index exists. Round-16 measurement at the
    * worst-case bench threshold (t=0.2): candidate stages ≈ 1.2× the
    * linear passes; 1.25 carries it. Stage 2 replaces the prior with
    * the exact count and can relax an over-tightened stage-1 fit. */
  private[graft] val NgramCandidatePriorRatio = 1.25

  /** Fits target this share of the budget — headroom for the residual
    * error of the calibrated per-row constants (±~30% observed), NOT
    * the retired 0.5 blanket factor that also had to absorb a fully
    * unmodeled candidate term. */
  private[graft] val NgramFitHeadroom = 0.8

  /** Stage 2 relaxes a stage-1-tightened fraction only when the fitted
    * fraction exceeds the in-force one by this factor — a rebuild of
    * the linear passes has to buy a material fidelity gain. Ceiling on
    * the possible gain: the fit counts the stage-1 pass's shuffle
    * files as sunk (they persist until their RDDs GC), so with zero
    * measured candidates m = (H·B − spent)/spent = exactly the stage-1
    * prior (1.25) — the threshold must sit below that for relax to
    * ever fire. */
  private[graft] val NgramRelaxMinGain = 1.15

  /** The session's shuffle-spill budget for the prefix route. */
  private[graft] def ngramSpillBudget(
      spark: org.apache.spark.sql.SparkSession): Long = {
    val budget = spark.conf.getOption(NgramSpillBudgetKey)
      .map(_.trim).filter(_.nonEmpty).map(_.toLong)
      .getOrElse(NgramSpillBudgetDefault)
    require(budget >= 1, s"$NgramSpillBudgetKey must be >= 1 (got $budget)")
    budget
  }

  /** Stage-1 fitted keep fraction: targets [[NgramFitHeadroom]] of the
    * budget under the linear estimate plus the [[NgramCandidatePriorRatio]]
    * prior for the not-yet-measurable candidate term, composed with
    * whatever sampling is already in force (floored to 1% so the route
    * stays meaningful). Pure (exposed for tests). */
  private[graft] def ngramFitKeepFraction(shingleKeepFraction: Double,
      est: Long, budget: Long): Double =
    math.max(0.01, shingleKeepFraction * NgramFitHeadroom /
      (1.0 + NgramCandidatePriorRatio) * budget.toDouble / est.toDouble)

  /** Consistent shingle sample at an ABSOLUTE fraction: membership is a
    * pure function of the shingle hash, so filtering the full-set
    * snapshot at fraction f ≡ having sampled at f from the start —
    * tightening AND relaxing both derive from the same snapshot. */
  private def resampleSets(sets0: DataFrame, fraction: Double,
      keepDen: Long): DataFrame = {
    val num = math.max(1L, math.round(fraction * keepDen))
    sets0.withColumn("sh",
      filter(col("sh"), g => pmod(g, lit(keepDen)) < lit(num)))
      .filter(size(col("sh")) > 0)
  }

  /** EXACT candidate self-join output rows for a materialized prefix
    * index: Σ_g c·(c−1)/2 over per-shingle entry counts (`id_a < id_b`
    * keeps each unordered pair once; the size-ratio and positional
    * filters prune below this, never above). One cheap two-level agg
    * over the snapshot. */
  private[graft] def rankedCandidatePairs(ranked: DataFrame): Long = {
    val r = ranked.groupBy("g").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * (col("c") - lit(1L)) / lit(2.0))).head()
    if (r.isNullAt(0)) 0L else math.round(r.getDouble(0))
  }

  /** The stage-1 over-budget message, parameterized by what the policy
    * DID (`verdict`: advisory, refusal, or the auto-chosen fraction). */
  private[graft] def ngramSpillMessage(totalShingles: Long, docCount: Long,
      shingleKeepFraction: Double, est: Long, budget: Long,
      verdict: String): String = {
    val fit = ngramFitKeepFraction(shingleKeepFraction, est, budget)
    f"[graft] ngramJaccardPairs $verdict: exact prefix-index dedup over " +
      f"$docCount%,d docs / $totalShingles%,d shingle occurrences will shuffle " +
      f"~${est / (1L << 30)}%,d GiB in its linear passes plus a candidate " +
      f"join priced at ${NgramCandidatePriorRatio}%.2fx that until the index " +
      f"exists (budget ${budget / (1L << 30)}%,d GiB, $NgramSpillBudgetKey). " +
      f"The volume is linear in corpus size, not a plan " +
      f"defect, but it can exhaust local shuffle disk. Options that compose " +
      f"soundly: shingleKeepFraction=$fit%.2f (consistent sampled-set Jaccard, " +
      f"divides the volume), or minhashPairs/minhashDedup (estimated-threshold " +
      f"near-dup contract, the documented route at corpus scale); " +
      f"spillPolicy=sample auto-applies the fitting fraction."
  }

  /** The stage-2 message: exact candidate count, spent linear bytes,
    * and what the policy did about it. */
  private[graft] def ngramCandidateSpillMessage(candPairs: Long, spent: Long,
      candTerm: Long, budget: Long, fracInForce: Double,
      verdict: String): String =
    f"[graft] ngramJaccardPairs stage-2 $verdict: the materialized prefix " +
      f"index yields EXACTLY $candPairs%,d candidate pairs — " +
      f"~${candTerm >> 30}%,d GiB of self-join/verify shuffle on top of " +
      f"~${spent >> 30}%,d GiB already written by the linear passes " +
      f"(budget ${budget >> 30}%,d GiB, $NgramSpillBudgetKey; in-force " +
      f"shingleKeepFraction=$fracInForce%.3f). Knobs: a higher threshold " +
      f"shrinks prefixes quadratically in candidates; " +
      f"minhashPairs/minhashDedup bounds candidates by banding; " +
      f"spillPolicy=sample auto-fits the fraction."

  /** The advisory message when the estimated prefix-index shuffle
    * volume exceeds the session's spill budget; None when it fits.
    * Pure function of the stage-1 estimate (exposed for tests). */
  private[graft] def ngramSpillAdvisory(spark: org.apache.spark.sql.SparkSession,
      totalShingles: Long, docCount: Long,
      shingleKeepFraction: Double): Option[String] = {
    val budget = ngramSpillBudget(spark)
    val est = totalShingles * NgramLinearBytesPerShingle
    if (est <= budget) None
    else Some(ngramSpillMessage(totalShingles, docCount, shingleKeepFraction,
      est, budget, "ADVISORY"))
  }

  // ---- corpus-size-driven LSH parameter heuristics -----------------------

  /** Sign-LSH width for [[embeddingNearDupPairs]] sized to the corpus:
    * enough bits that EXPECTED bucket occupancy ≈ `targetPerBucket`
    * (each bit halves it), clamped to [4, 24]. Per-bucket verify work is
    * then ~targetPerBucket²/2 cosines regardless of corpus size — the
    * knob a 100 TB pipeline should derive, not hard-code. Recall per
    * bucket width is a separate trade (more bits split true near-dup
    * pairs more often); production pipelines typically run several
    * independent hyperplane seeds and union candidates when signBits is
    * pushed high. */
  def recommendedSignBits(corpusCount: Long, targetPerBucket: Long = 1024L): Int = {
    require(corpusCount >= 0 && targetPerBucket >= 1)
    val ratio = math.max(1.0, corpusCount.toDouble / targetPerBucket)
    math.min(24, math.max(4, math.ceil(math.log(ratio) / math.log(2.0)).toInt))
  }

  /** (chunks, agreeChunks) for [[simhashPairs]] sized to the corpus at
    * the default radius 3. Both configurations are EXACT at radius ≤ 3,
    * so the switch is purely a cost model:
    *
    *   - (4, 1): 16-bit keys, 4 entries/doc. Expected CANDIDATES per
    *     doc = 4 · n/2^16 — grows linearly with n, so total join
    *     volume is quadratic. Right while candidates/doc stay under
    *     the alternative's fixed explode factor.
    *   - (8, 4): 32-bit keys, C(8,4) = 70 entries/doc. Candidates per
    *     doc = 70 · n/2^32 ≈ 0 until n ~ 100M; the cost is the
    *     constant 70× bucket-entry shuffle.
    *
    * Crossover where 4 · n/2^16 = 70 → n ≈ 1.1M docs; the default
    * threshold sits there (2^21 ≈ 2.1M keeps a margin for the cheaper
    * join-side rows vs explode-side rows). The previous 64M default
    * was mis-calibrated by ~30×: the round-14 sf100 probe (5M docs)
    * spilled a ~760M-candidate self-join to disk exhaustion under
    * (4, 1), while (8, 4) generates ~200k candidates from an 11 GB
    * bucket shuffle at the same scale. */
  def recommendedSimhashBanding(corpusCount: Long,
      bandingThreshold: Long = 2L << 20): (Int, Int) =
    if (corpusCount <= bandingThreshold) (4, 1) else (8, 4)

  /** Sentinel default for LSH parameters: derive from the corpus count
    * at run time (one count over an already-materialized frame) instead
    * of a hard-coded value. A user processing 1B docs with defaults then
    * gets parameters that survive that scale, not the toy-corpus ones. */
  val Auto: Int = Int.MinValue

  /** Pairs-per-cell budget behind [[Auto]] salting: a cell of
    * ≈ floor² / 2 ≈ 16M candidate pairs is seconds of work for either
    * verifier (bit_count XOR, or a dim-wide dot), far under task-skew
    * territory. */
  val AutoSaltTargetPairsPerCell: Long = 16L << 20

  /** Bucket occupancy above which Auto salting kicks in:
    * √(2 · targetPairs) ≈ 5792 rows — a bucket at the floor generates
    * exactly the per-cell pair budget unsalted. Overridable per session
    * via [[SaltFloorKey]] (tune the pairs-per-task budget to the
    * cluster; also the unit-test hook). */
  val SaltOccupancyFloor: Long =
    math.sqrt(2.0 * AutoSaltTargetPairsPerCell).toLong

  /** Runtime conf key overriding [[SaltOccupancyFloor]]. */
  val SaltFloorKey = "graft.dedup.autoSalt.floor"

  private def sessionSaltFloor(spark: org.apache.spark.sql.SparkSession): Long = {
    val f = spark.conf.getOption(SaltFloorKey).map(_.trim).filter(_.nonEmpty)
      .map(_.toLong).getOrElse(SaltOccupancyFloor)
    require(f >= 1, s"$SaltFloorKey must be >= 1 (got $f)")
    f
  }

  /** Replication cap for Auto salting: each hot-bucket row is
    * replicated ~(g+1)× across cells, so an unbounded g would turn a
    * pathological bucket into a pathological shuffle instead. At the
    * cap, a bucket needs > 64·floor ≈ 370k identical signatures before
    * cells exceed the pair budget — at that point the corpus needs
    * exact dedup first, not a finer salt. */
  val MaxAutoSalt: Int = 64

  /** Largest hot-bucket set the Auto-salt probe re-emits as a driver
    * LocalRelation (rows; session-tunable via [[LocalHotCapKey]]).
    * Below this the collected probe result is reused directly (zero
    * recompute, plan-local); above it the hot frame stays distributed
    * behind a broadcast exchange — a LocalRelation serializes into
    * every task closure, so a large one multiplies by task count (the
    * round-17 sf100 sweep: 58 MB × 128 tasks under the forced-salting
    * gate's floor=1) while a broadcast ships once per executor. 64k
    * rows × a few key columns ≈ low MBs — comfortably inside every
    * driver. */
  val LocalHotRelationCap: Int = 65536

  /** Session override for [[LocalHotRelationCap]] (tests force the
    * distributed-hot-frame branch at unit scale with it). */
  val LocalHotCapKey = "graft.dedup.autoSalt.localHotCap"

  private def sessionLocalHotCap(spark: org.apache.spark.sql.SparkSession): Int = {
    val c = spark.conf.getOption(LocalHotCapKey).map(_.trim).filter(_.nonEmpty)
      .map(_.toInt).getOrElse(LocalHotRelationCap)
    require(c >= 0, s"$LocalHotCapKey must be >= 0 (got $c)")
    c
  }

  /** [[Auto]] salt resolution for one bucket's observed occupancy —
    * the scalar mirror of the plan-side formula in the salted self-join:
    * at/below the floor → 1 (no replication); above → ceil(B / floor),
    * capped. */
  def resolveSaltBuckets(bucketCount: Long,
      floor: Long = SaltOccupancyFloor): Int =
    if (bucketCount <= floor) 1
    else math.min(MaxAutoSalt.toLong, (bucketCount + floor - 1) / floor).toInt

  /** [[Auto]] resolution for [[embeddingNearDupPairs]]'s `signBits`:
    * corpora at or under `bruteFloor` run the EXACT all-pairs path
    * (signBits=0 — a few thousand vectors verify faster than LSH
    * bucketing recalls, and exactness is free); larger corpora get
    * occupancy-targeted [[recommendedSignBits]]. 2^31 docs → 21 bits. */
  def resolveSignBits(corpusCount: Long, bruteFloor: Long = 2048L): Int =
    if (corpusCount <= bruteFloor) 0 else recommendedSignBits(corpusCount)

  /** [[Auto]] resolution for [[simhashPairsFromSigs]]' banding. Both
    * candidate configurations are pigeonhole-EXACT at their admitted
    * radius, so auto-banding never changes RESULTS — only candidate
    * volume: ≤ 64M docs → (4, 1) (radius ≤ 3); larger → (8, 4) (radius
    * ≤ 4, the billion-doc banding). maxHamming == 4 forces (8, 4) at
    * any size ((4, 1) cannot express radius 4); beyond 4 there is no
    * scale-safe exact banding of a 64-bit signature — callers must pick
    * their own recall/volume trade explicitly. */
  def resolveSimhashBanding(corpusCount: Long, maxHamming: Int): (Int, Int) = {
    require(maxHamming <= 4,
      s"auto-banding supports maxHamming <= 4 (got $maxHamming): every exact banding at " +
        "radius >= 5 has catastrophic bucket occupancy — pass chunks/agreeChunks explicitly")
    if (maxHamming == 4) (8, 4) else recommendedSimhashBanding(corpusCount)
  }

  // ---- embedding cosine near-dup ----------------------------------------

  /** Near-duplicate pairs by embedding cosine ≥ threshold. Candidates via
    * random-hyperplane LSH (signBits-bit signature buckets), then exact
    * cosine verification inside buckets. Deterministic hyperplanes from
    * `seed`.
    *
    * The default `signBits = Auto` sizes the signature to the corpus via
    * [[resolveSignBits]]: tiny corpora (≤ 2048 vectors) run the exact
    * all-pairs path, larger ones get occupancy-targeted LSH — defaults
    * that survive a 1B-vector corpus instead of 2^8 buckets. Pass
    * signBits=0 explicitly to force exact all-pairs at any size (the
    * oracle-parity opt-in), or a positive width to pin the recall/volume
    * trade.
    *
    * NOT a pure lazy plan builder: `signBits = Auto` counts the corpus,
    * and `saltBuckets = Auto` runs one bounded bucket-occupancy job at
    * call time (see [[bucketSelfJoinPairs]]); nothing stays cached
    * after the call. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, signBits: Int = Auto, seed: Long = 42L,
      dim: Int = 64, saltBuckets: Int = Auto): DataFrame = {
    val base0 = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.norm(col(vecCol)).as("nrm"))
    // Auto: materialize the projected frame once (both join sides read it
    // anyway) and size the signature from its count
    val (base, bits) =
      if (signBits == Auto) {
        val m = base0.transform(Materialize.once(_))
        (m, resolveSignBits(m.count()))
      } else (base0, signBits)
    val paired =
      if (bits <= 0) {
        // exact all-pairs: a broadcast nested-loop cross join parallelizes
        // over the left side's partitions (a constant-key equi-join would
        // funnel EVERY pair through one task)
        val l = base.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a"))
        val r = base.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b"))
        l.crossJoin(broadcast(r)).filter(col("id_a") < col("id_b"))
      } else {
        val planes = Similarity.hyperplanes(bits, dim, seed)
        val bucketed = base.withColumn("bucket", Similarity.signBucket(col("v"), planes))
        bucketSelfJoinPairs(bucketed, Seq("bucket"), "id", Seq("v", "nrm"), saltBuckets)
      }
    verifiedCosinePairs(paired, threshold)
  }

  /** Shared exact-verification tail of the embedding pair generators:
    * candidate (id_a, id_b, v_a, v_b, nrm_a, nrm_b) rows → exact cosine,
    * threshold filter, one-row-per-pair. */
  private def verifiedCosinePairs(paired: DataFrame, threshold: Double): DataFrame =
    paired
      .select(col("id_a"), col("id_b"),
        (VectorFunctions.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("id_a", "id_b")

  // ---- semantic (cluster-then-prune) dedup ------------------------------

  /** [[Auto]] resolution for [[semanticDedupPairs]]' cluster count:
    * corpora at or under `bruteFloor` take the exact all-pairs path
    * (clustering a few thousand vectors costs more than it prunes);
    * larger corpora get occupancy-targeted k = ceil(N / target), capped
    * at `maxClusters` — the centroid fit is a bounded driver collect and
    * the fitted array broadcasts to every task, so k must stay
    * model-params-sized (65536 × 64 dims × 8 B = 32 MB). Past the cap,
    * occupancy grows linearly with the corpus and within-cluster pair
    * cost quadratically — at that scale pass an explicit precomputed
    * cluster column ([[semanticDedupPairsByCluster]]) from a clustering
    * fit at the scale the corpus needs (e.g. the persisted IVF index's
    * cell assignment). */
  def resolveSemanticClusters(corpusCount: Long, targetPerCluster: Long = 1024L,
      maxClusters: Int = 65536, bruteFloor: Long = 2048L): Int =
    if (corpusCount <= bruteFloor) 1
    else math.min(maxClusters.toLong,
      (corpusCount + targetPerCluster - 1) / targetPerCluster).toInt

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, then find
    * pairs with cosine ≥ `threshold` WITHIN each cluster only — the
    * clustering prunes the candidate space from all-pairs to
    * within-Voronoi-cell pairs, which is the paper's entire scale
    * argument. Complements [[embeddingNearDupPairs]] (random-hyperplane
    * LSH buckets): centroids adapt to the corpus distribution, so on
    * clustered real-world embeddings a semantic cell captures near-dup
    * pairs that fixed random hyperplanes split; on structureless data
    * the adaptivity buys nothing (the gate's recall floor is measured
    * on that worst case).
    *
    * `nprobe > 1` assigns each vector to its `nprobe` nearest centroids
    * (overlapping clusters) — recall against the exact pair set rises
    * because a boundary-straddling pair only needs ONE shared cell, at
    * the cost of ~nprobe× candidate replication. `nprobe = 1` is the
    * paper's exact shape.
    *
    * Scale shape: the fit is a bounded driver collect
    * ([[Similarity.fitCentroids]] — sampled, Lloyd-refined, broadcast);
    * assignment is one map-side native expression against the broadcast
    * centroids (no shuffle); the only shuffles are the per-cell
    * self-join (hot cells auto-salted, [[bucketSelfJoinPairs]]) and the
    * final pair dedup. Verification is exact cosine — clustering only
    * ever affects RECALL (which pairs are candidates), never precision.
    *
    * NOT a pure lazy plan builder: the centroid fit runs at call time;
    * `numClusters = Auto` additionally counts the corpus. */
  def semanticDedupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numClusters: Int = Auto, kmeansIters: Int = 3,
      nprobe: Int = 1, seed: Long = 42L, saltBuckets: Int = Auto): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1 (got $nprobe)")
    val base0 = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.norm(col(vecCol)).as("nrm"))
    val (base, k) =
      if (numClusters == Auto) {
        val m = base0.transform(Materialize.once(_))
        (m, resolveSemanticClusters(m.count()))
      } else (base0, numClusters)
    val paired =
      if (k <= 1) {
        // exact all-pairs (see embeddingNearDupPairs: broadcast nested-
        // loop, parallel over the left side's partitions)
        val l = base.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a"))
        val r = base.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b"))
        l.crossJoin(broadcast(r)).filter(col("id_a") < col("id_b"))
      } else {
        val cents = Similarity.fitCentroids(base, "id", "v", k, seed, kmeansIters)
        val clustered = base.withColumn("cluster",
          explode(HashFunctions.nearestCentroids(col("v"), cents, math.min(nprobe, k))))
          .filter(col("cluster").isNotNull)
        bucketSelfJoinPairs(clustered, Seq("cluster"), "id", Seq("v", "nrm"), saltBuckets)
      }
    verifiedCosinePairs(paired, threshold)
  }

  /** [[semanticDedupPairs]] with caller-provided cluster assignments —
    * the unbounded-scale path: when the corpus outgrows the driver-fit
    * cluster cap, any external clustering (a persisted IVF index's cell
    * column, a hierarchical k-means, a taxonomy) supplies `clusterCol`
    * and this is pure lazy plan: one salted per-cell self-join + exact
    * cosine verify, no fit, no count, no collect. Rows with a null
    * cluster are excluded (unassignable vectors pair with nothing). */
  def semanticDedupPairsByCluster(df: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, threshold: Double = 0.95,
      saltBuckets: Int = Auto): DataFrame = {
    val entries = df.select(col(clusterCol).as("cluster"), col(idCol).as("id"),
      col(vecCol).as("v"), VectorFunctions.norm(col(vecCol)).as("nrm"))
      .filter(col("cluster").isNotNull)
    verifiedCosinePairs(
      bucketSelfJoinPairs(entries, Seq("cluster"), "id", Seq("v", "nrm"), saltBuckets),
      threshold)
  }

  /** Keep-one semantic dedup: [[semanticDedupPairs]] + min-id survivor
    * per dup group (the library-wide keep convention; the paper keeps
    * the member farthest from its centroid — a policy, not a semantics,
    * difference). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numClusters: Int = Auto, kmeansIters: Int = 3,
      nprobe: Int = 1, seed: Long = 42L): DataFrame =
    dropNearDuplicates(df, idCol,
      semanticDedupPairs(df, idCol, vecCol, threshold, numClusters, kmeansIters,
        nprobe, seed))

  // ---- cross-document repeated-span dedup (ExactSubstr-style) -----------

  /** Every occurrence of a token window repeated across documents:
    * (idCol, pos, n_docs, first_id) — one row per (document, token
    * position) whose `windowTokens`-word window also occurs in at least
    * `minDocs - 1` OTHER documents. `n_docs` is the window's distinct
    * document count, `first_id` the smallest id containing it (the
    * keep-first representative [[stripRepeatedWindows]] uses). Windows
    * are hashed positionally in one fused byte pass per document
    * ([[graft.functions.PositionalShingleHashes]]); hash identity
    * stands in for window identity (64-bit collisions negligible at any
    * realistic window count).
    *
    * This is the span-level complement of the whole-document family
    * above: whole-doc exact/near dedup leaves boilerplate, licenses,
    * and templated passages REPEATED VERBATIM across otherwise-distinct
    * documents — the duplication that measurably degrades LM training
    * (the ExactSubstr observation; same motivation at window-not-suffix
    * granularity, which distributes). Within-document repetition is
    * deliberately NOT flagged (that is [[Curation.dupKgramFrac]]'s
    * Gopher signal); a window must span `minDocs` distinct documents.
    *
    * Scale shape: the exploded (id, pos, hash) frame has one row per
    * corpus token — the honest cost of exact-substring matching, linear
    * and map-side until the single hash-keyed shuffle. The frame is NOT
    * snapshotted: both consumers (the occurrence-count groupBy and the
    * join-back) re-run the fused hash pass, which is cheaper than
    * writing + reading the one frame guaranteed bigger than the corpus
    * text (sf100 A/B in BASELINE.md). The aggregate is two-phase
    * (partial distinct counts map-side). At 100 TB the repeated-hash
    * side is a small fraction of windows (boilerplate, not body), and
    * AQE broadcast-sizes the join-back against it from measured bytes. */
  def repeatedWindowMatches(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 50, minDocs: Int = 2, seed: Long = 42L): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    require(minDocs >= 2, s"minDocs must be >= 2 (cross-document), got $minDocs")
    // one row per corpus TOKEN — do NOT Materialize: both consumers
    // (the occurrence-count groupBy and the join-back) shuffle on __h,
    // and the snapshot is the one frame here guaranteed BIGGER than
    // the corpus text, so writing+reading it costs more than running
    // the fused hash pass once per consumer. Measured at sf100 the
    // snapshot was the over-linear term: it fits the page cache at
    // sf10 and becomes real disk IO at 15 GB (A/B in BASELINE.md).
    val pos = df
      .select(col(idCol), posexplode(
        HashFunctions.positionalShingleHashes(col(textCol), windowTokens, seed)))
      .toDF(idCol, "pos", "__h")
    val repeated = pos.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("n_docs"), min(col(idCol)).as("first_id"))
      .filter(col("n_docs") >= minDocs)
    pos.join(repeated, Seq("__h"))
      .select(col(idCol), col("pos"), col("n_docs"), col("first_id"))
  }

  /** Corpus with cross-document repeated spans EXCISED from the text:
    * every token covered by a window [[repeatedWindowMatches]] flags is
    * removed and the survivors are rejoined with single spaces.
    * `keepFirst = true` (the ExactSubstr-shaped policy) leaves the
    * smallest-id document's copy intact and strips the repetitions
    * elsewhere; `keepFirst = false` removes every copy (the
    * C4-boilerplate shape — for license walls and navigation chrome
    * nobody wants even once).
    *
    * Text contract: documents with NO flagged span pass through
    * byte-identical (including null/short texts — they produce no
    * windows). A stripped document is rebuilt from its whitespace
    * tokens, so its whitespace is canonicalized — same canonical form
    * as [[TextAnalysis.fingerprint]]; a fully-covered document becomes
    * the empty string (drop or keep downstream is policy, so rows are
    * never silently deleted here). Coverage is tested per token
    * directly against the document's flagged window starts
    * (`exists` over ≤ span-count entries — per-row array work, no
    * extra shuffle beyond [[repeatedWindowMatches]]' own).
    *
    * Rebuild-join shape (the round-16 fix for the sf100 over-linear
    * residual): boilerplate is a small doc fraction, so the corpus
    * must not shuffle for a join that touches few documents — but the
    * spans frame (id → start list) is too wide to broadcast at scale
    * (hundreds of MB compressed at 5M docs), which made the old
    * single left-join a full-corpus sort-merge. Instead the corpus is
    * split by a SLIM matched-ids frame (8 bytes/doc — AQE
    * broadcast-sizes it from measured bytes long after the spans
    * frame stops qualifying): untouched docs pass through an anti
    * join map-side, touched docs are pruned map-side by a semi join
    * and only that minority enters the spans join's exchange. When
    * even the id frame outgrows broadcast, AQE degrades every join
    * here to shuffles and the corpus pays two exchanges instead of
    * one — the price of the split — but at that matched fraction the
    * rebuild join was corpus-sized anyway.
    *
    * EAGERNESS (ADVICE r16): constructing the returned DataFrame runs
    * the full [[repeatedWindowMatches]] job immediately and pins its
    * spans localCheckpoint — the matched-ids split needs the spans
    * frame materialized before the plan exists. Plan-only consumers
    * (explain, dry planning) pay that job; callers that may never
    * execute the result should defer calling this operator. */
  def stripRepeatedWindows(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 50, minDocs: Int = 2, keepFirst: Boolean = false,
      seed: Long = 42L): DataFrame = {
    val matches = repeatedWindowMatches(df, idCol, textCol, windowTokens, minDocs, seed)
    val toStrip = if (keepFirst) matches.filter(col(idCol) =!= col("first_id")) else matches
    // three consumers (anti/semi id joins + the spans join), each of
    // which would otherwise re-run the whole match DAG; the frame is
    // small relative to its compute (matched docs only). EAGER: the
    // first consumer is a broadcast build, and materializing the match
    // DAG inside a BroadcastExchange would race spark.sql.broadcastTimeout
    val spans = Materialize.once(
      toStrip.groupBy(col(idCol))
        .agg(collect_list(col("pos")).as("__starts")),
      eager = true)
    val matchedIds = spans.select(col(idCol))
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    // token i is covered iff SOME flagged window [p, p+w) contains it —
    // exists over the ~spans-count starts beats materializing the
    // window-expanded covered-index array (w× larger) per document
    val rebuilt = concat_ws(" ", filter(toks, (t, i) =>
      !exists(col("__starts"),
        p => i >= p && i < p + lit(windowTokens))))
    val untouched = df.join(matchedIds, Seq(idCol), "left_anti")
    val touched = df.join(matchedIds, Seq(idCol), "left_semi")
      .join(spans, Seq(idCol))
      .withColumn(textCol, rebuilt)
      .drop("__starts")
    untouched.unionByName(touched)
  }
}
