package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Materialize

/** Persisted BM25 retrieval index — the repeated-query counterpart of
  * [[TextAnalysis.bm25TopK]] (whose scaladoc promises exactly this:
  * "persist the exploded posting frame once and reuse it"). The ad-hoc
  * scorer pays one corpus text scan per call; the index pays the scan
  * ONCE at build and answers every query from term-pruned parquet
  * reads — the [[Similarity]] persisted-ANN discipline applied to
  * lexical retrieval.
  *
  * Layout under `path` (all stores parquet, term-keyed stores sorted
  * by `term` with a parquet bloom on it — the [[SketchSidecar]]
  * pruning discipline):
  *   - `postings/` — one row per (term, doc): (term, id, tf, dl).
  *   - `terms/`    — per-term document-frequency DELTA rows
  *     (term, df); readers SUM df per term across segments.
  *   - `stats/`    — corpus DELTA rows (n_docs, sum_dl) over docs with
  *     ≥ 1 token; readers sum and derive avgdl = Σsum_dl / Σn_docs as
  *     exact integer sums divided once (order-independent, hence
  *     engine-reproducible).
  *
  * Because df and the corpus stats are ADDITIVE, [[appendToBm25Index]]
  * is EXACT: build(A) then append(B) answers every query with floats
  * identical to build(A ∪ B) — no frozen-model drift, no rebuild
  * advisor needed (contrast the ANN indexes, whose centroids freeze).
  * The one growth cost is small-file accumulation, which
  * [[compactBm25Index]] repairs in place (sort + bloom re-applied).
  *
  * Scale shape at 100 TB: queries broadcast; a query's term list
  * (≤ [[MaxInTerms]]) pushes into both term-keyed scans as an In
  * predicate, so bloom/min-max row-group skipping makes bytes-read
  * track the query's postings, not the corpus; larger term sets fall
  * back to one column-pruned scan with the broadcast semi join (still
  * never a corpus-text read). Nothing corpus-sized ever shuffles at
  * query time — the only wide exchange is the per-query top-k's.
  *
  * Crash safety: the [[graft.sources.FsSwap]] commit-marker protocol —
  * the marker drops before a build/append's first part write and
  * returns after its last, so readers racing a torn write refuse
  * loudly instead of scoring a half-written segment.
  *
  * SINGLE WRITER per index path (the FsSwap discipline); `idCol`
  * values appended must be NEW docs — re-appending an id would double
  * its postings, same contract as the ANN appends. */
object Bm25Index {
  private val PostingsDir = "postings"
  private val TermsDir = "terms"
  private val StatsDir = "stats"

  /** In-pushdown cap for the query-term list — same rationale as
    * [[SketchSidecar.MaxInValues]] (Spark lowers a pushed In to a
    * per-value or-chain; bloom selectivity decays with list length). */
  private[operators] val MaxInTerms = 100

  /** Docs-per-segment above which writes range-split by term instead
    * of coalescing to one sorted file per store. */
  val BulkSegmentDocs: Long = 16000L

  private def bloomOpts(c: String) = Map(
    s"parquet.bloom.filter.enabled#$c" -> "true",
    "parquet.bloom.filter.adaptive.enabled" -> "true",
    s"parquet.bloom.filter.fpp#$c" -> "0.00001",
    "parquet.bloom.filter.max.bytes" -> (256 << 10).toString)

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Build (or overwrite) the index at `path` from the corpus — one
    * tokenize + one (id, term) aggregate, everything else rides that
    * shuffle. */
  def buildBm25Index(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = docs.sparkSession
    val fs = fsOf(spark, path)
    val dir = new Path(path)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    graft.sources.FsSwap.beginArtifact(fs, dir)
    val n = writeSegment(docs, idCol, textCol, path)
    graft.sources.FsSwap.commitArtifact(fs, dir, s"bm25 build: $n docs")
  }

  /** Append NEW docs as one segment. EXACT: df/stats deltas sum at
    * read time, so post-append queries equal a fresh full build
    * float-for-float (Bm25IndexSpec pins it). Returns docs appended. */
  def appendToBm25Index(batch: DataFrame, idCol: String, textCol: String,
      path: String): Long = {
    val spark = batch.sparkSession
    val fs = fsOf(spark, path)
    val dir = new Path(path)
    graft.sources.FsSwap.requireCommitted(fs, dir, "appendToBm25Index")
    graft.sources.FsSwap.beginArtifact(fs, dir)
    val n = writeSegment(batch, idCol, textCol, path)
    graft.sources.FsSwap.commitArtifact(fs, dir, s"bm25 append: $n docs")
    n
  }

  private def writeSegment(docs: DataFrame, idCol: String, textCol: String,
      path: String): Long = {
    val spark = docs.sparkSession
    // ONE materialization, of the (doc, term) frame — NOT of the
    // corpus-sized exploded token stream: postings, terms, stats and
    // the doc count all derive from this single frame, so a
    // non-deterministic source still cannot write postings for one
    // realization and stats for another (stronger than the previous
    // shape, which checkpointed the raw token explosion as well — a
    // corpus-scale storage burden that throttled the sf100 probe; the
    // token stream has exactly one consumer and pipelines into the tf
    // aggregation without ever being stored)
    // no Parallelism.widen here (r17): with the tokenizer native
    // (LowerWsTokens) the per-row cost no longer justifies the extra
    // exchange — measured a wash at sf0.1, and corpus-scale inputs are
    // already wide (the widen would no-op)
    val toks = docs.select(col(idCol).as("id"), col(textCol).as("__t"))
      .select(col("id"), TextAnalysis.bm25Words(col("__t")).as("ws"))
      // explode_outer + null filter above the Generate: an inner
      // explode pushes an inferred `size(ws) > 0` (the full tokenizer
      // tree) into a per-row scan filter — every doc would tokenize
      // twice (TextAnalysis.bm25TopK documents the class); the filter
      // restores exactly the inner explode's row set
      .select(col("id"), size(col("ws")).as("dl"), explode_outer(col("ws")).as("term"))
      .where(col("term").isNotNull)
    val tf = Materialize.once(
      toks.groupBy("id", "term", "dl").agg(count(lit(1)).as("tf")),
      eager = true)
    // ONE aggregate job yields the segment's corpus-stat DELTA *and*
    // the doc count (r18; the count used to be its own
    // distinct().count() pass over tf — the stats aggregation below
    // already grouped by id and counted the same thing). The stats
    // row is written back from the driver: one row, value-identical
    // (count of the id groups = distinct ids; sum of their dl), and
    // the zero-token-docs convention is unchanged (they never reach
    // tf, so they contribute to neither count nor sum; an EMPTY
    // segment still writes the (0, null) row the aggregate produced).
    val statRow = tf.groupBy("id").agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .head()
    val nDocs = statRow.getLong(0)
    val nParts = spark.sessionState.conf.numShufflePartitions
    // trickle segments coalesce to ONE sorted file per store (no
    // shuffle, dictionary-tight row groups); bulk segments range-split
    // by the probe key so files carry disjoint term ranges and min/max
    // stats prune alongside the bloom
    def shaped(df: DataFrame): DataFrame =
      if (nDocs > BulkSegmentDocs)
        df.repartitionByRange(nParts, col("term")).sortWithinPartitions("term")
      else df.coalesce(1).sortWithinPartitions("term")
    shaped(tf.select("term", "id", "tf", "dl"))
      .write.mode("append").options(bloomOpts("term"))
      .parquet(new Path(path, PostingsDir).toString)
    shaped(tf.groupBy("term").agg(count(lit(1)).as("df")))
      .write.mode("append").options(bloomOpts("term"))
      .parquet(new Path(path, TermsDir).toString)
    // exact integer corpus deltas (collected above; re-created here as
    // a 1-row local frame so the write is a driver-local job, not a
    // re-aggregation); docs with zero tokens contribute to neither
    // store (the bm25TopK convention — explode drops them from tf
    // exactly as it dropped them from the token stream)
    spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](statRow),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_docs",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("sum_dl",
          org.apache.spark.sql.types.LongType, nullable = true))))
      .coalesce(1).write.mode("append")
      .parquet(new Path(path, StatsDir).toString)
    nDocs
  }

  /** Top-k BM25 retrieval against a persisted index — same output
    * contract and identical floats as [[TextAnalysis.bm25TopK]] over
    * the same corpus (shared tokenizer + scoring expressions;
    * Bm25IndexSpec pins the equivalence). */
  def queryBm25Index(spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75, rankRoundDp: Int = -1): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    graft.sources.FsSwap.requireCommitted(fsOf(spark, path), new Path(path),
      "queryBm25Index")
    val qterms = Materialize.once(
      queries.select(col(qidCol).as("query_id"), explode(
        array_distinct(TextAnalysis.bm25Words(col(qtextCol)))).as("term")))
    val qset = qterms.select("term").distinct()
    // ≤ MaxInTerms+1 strings on the driver — the SketchSidecar probe
    // discipline; over the cap, the broadcast semi join alone prunes
    val termList = qset.limit(MaxInTerms + 1).collect()
      .map(_.getString(0)).toSeq
    def scan(dirName: String): DataFrame = {
      val df0 = spark.read.parquet(new Path(path, dirName).toString)
      if (termList.length <= MaxInTerms)
        df0.filter(col("term").isin(termList: _*))
      else df0
    }
    // the semi join is ALWAYS applied (the In list is a pruning hint,
    // capped; correctness never depends on it)
    val postings = scan(PostingsDir).join(broadcast(qset), Seq("term"))
    val dfreq = scan(TermsDir).join(broadcast(qset), Seq("term"))
      .groupBy("term").agg(sum("df").as("df")) // sum segment deltas
    val stats = spark.read.parquet(new Path(path, StatsDir).toString)
      .agg(sum(col("n_docs")).cast("double").as("n_docs"),
        (sum(col("sum_dl")).cast("double") /
          sum(col("n_docs")).cast("double")).as("avgdl"))
    val scored = postings.join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .transform(TextAnalysis.bm25Scored(_, k1, b))
    TextAnalysis.bm25TopKFromScored(scored, k, rankRoundDp)
  }

  /** Compact append-grown segments in place: both term-keyed stores
    * re-sort by `term` and re-apply their blooms (a generic compaction
    * would silently shed both and probes would read every row group);
    * stats rows merge file-wise. Row-preserving, so every query is
    * identical before and after. Single maintainer, between writes.
    *
    * Crash-safe via the [[Similarity.compactIvfIndex]] protocol: the
    * in-progress sentinel drops first, THEN the commit marker — a
    * crash mid-compaction leaves the marker down, so readers refuse
    * loudly instead of scanning a half-swapped store, and re-running
    * this method (sentinel present → skip the committed check) lets
    * each store's own compactParquet swap recovery finish the job
    * before the index re-marks. Returns (files before, files after)
    * summed over stores. */
  def compactBm25Index(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): (Int, Int) = {
    val fs = fsOf(spark, path)
    val dir = new Path(path)
    val sentinel = new Path(dir, "_graft_compact_inprogress")
    if (!fs.exists(sentinel)) {
      graft.sources.FsSwap.requireCommitted(fs, dir, "compactBm25Index")
      fs.create(sentinel, true).close()
      graft.sources.FsSwap.beginArtifact(fs, dir)
    }
    // else: a previous compaction died with the marker down — fall
    // through; compactParquet's FsSwap.recover finishes each store's
    // interrupted swap, then the rewrite re-runs and the index re-marks
    var before = 0
    var after = 0
    def one(store: String, sortCols: Seq[String], opts: Map[String, String]): Unit = {
      val p = new Path(path, store)
      // the store may exist only under its swap names after a crash —
      // compactParquet's recover promotes/restores before listing
      val tmp = new Path(path, store + ".__graft-compact-tmp__")
      val old = new Path(path, store + ".__graft-compact-old__")
      if (fs.exists(p) || fs.exists(tmp) || fs.exists(old)) {
        val (bN, aN) = graft.sources.Writers.compactParquet(
          spark, p.toString, targetFileBytes, opts, sortCols = sortCols)
        before += bN; after += aN
      }
    }
    one(PostingsDir, Seq("term"), bloomOpts("term"))
    one(TermsDir, Seq("term"), bloomOpts("term"))
    one(StatsDir, Seq.empty, Map.empty)
    graft.sources.FsSwap.commitArtifact(fs, dir,
      s"bm25 compact: $before -> $after files")
    fs.delete(sentinel, false)
    (before, after)
  }
}
