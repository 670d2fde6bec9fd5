package graft.operators

import graft.Materialize
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Two-store on-disk layout for a MinHash dedup-sketch sidecar — the
  * state store behind
  * [[graft.streaming.EventStreams.semanticIngestSink]].
  *
  * The round-10 flat layout ([[Dedup.dedupSketchColumns]] rows in one
  * parquet directory) forced every micro-batch admission to SCAN THE
  * WHOLE SIDECAR — correct, but 1–2 TB read per trickle batch at a
  * 100 TB corpus. This layout splits the sketch by ACCESS PATTERN and
  * prunes each store with the discipline
  * [[graft.streaming.EventStreams.dedupIngestSink]] already uses for
  * its corpus (parquet bloom filters on the probe key + a pushed In
  * for trickle batches):
  *
  * {{{
  * <path>/_graft_sidecar_v2.json   version marker
  * <path>/bands/part-….parquet     (band_hash long, id long)  bloom(band_hash)
  * <path>/sets/part-….parquet      (id long, sig arr<long> [cfg meta], sh arr<long>)  bloom(id)
  * }}}
  *
  * `bands` holds the exploded LSH bucket rows — the candidate-join
  * key store. Each append lands as ONE file (micro-batches; bulk
  * loads split by size), sorted by `band_hash`, every file carrying
  * an adaptive parquet bloom on `band_hash` at fpp 1e-5. A batch
  * probing ≤ [[MaxInValues]] distinct band hashes pushes the hash
  * list into the scan: row groups holding none of the batch's hashes
  * are skipped by the bloom (uniform hashes make min/max useless —
  * the bloom IS the pruning), so candidate-scan bytes track the
  * batch's true collisions, not sidecar size. Larger batches fall
  * back to one column-pruned full scan of the (skinny) band store,
  * amortized over the batch — the same trickle/bulk split as the
  * exact ingest sink. `sets` holds one row per admitted doc (the
  * verify payload), pruned identically by an `id` bloom + the
  * candidate-id In list.
  *
  * Write protocol (one maintainer, the ingest sink): corpus docs
  * append FIRST, then `bands`, then `sets` — the `sets` row count is
  * the sidecar's commit point (sets rows == corpus rows when healthy;
  * both counts fold parquet footer metadata, no data scan). A crash
  * between the bands and sets appends can leave duplicate band rows
  * after the heal re-appends them — harmless: the candidate join is
  * `.distinct()`ed, and compaction rewrites the store wholesale.
  * File counts grow one per batch per store; run [[compact]] on the
  * maintenance schedule (crash-safe rename swap, re-sorts and
  * re-blooms).
  */
object SketchSidecar {
  val MetaFile = "_graft_sidecar_v2.json"
  val BandsDir = "bands"
  val SetsDir = "sets"

  /** Per-scan In-predicate cap: a pushed In of ≤ this many values
    * drives bloom/stats row-group skipping — mirrors the session's
    * `spark.sql.parquet.pushdown.inFilterThreshold` (Spark lowers a
    * pushed In to a per-value or-chain; a 1250-value chain overflowed
    * an executor stack, and bloom selectivity decays as
    * 1-(1-fpp)^K anyway). */
  private[graft] val MaxInValues = 100

  /** Probe lists longer than [[MaxInValues]] split into up to this
    * many ≤[[MaxInValues]]-value chunks, each its own pushed-In scan
    * of the store, unioned — one shared file index, K scan nodes.
    * Raises the bloom-pruned probe ceiling from [[MaxInValues]] to
    * MaxInValues×MaxProbeChunks values (≈100 docs at 64 bands) before
    * the full-scan arm takes over; past that a probe is touching most
    * row groups anyway (uniform 64-bit hashes: m probes over G row
    * groups hit ≈ min(m, G) of them) and K more footer passes would
    * only add metadata cost. */
  private[graft] val MaxProbeChunks = 64

  /** Band-store bytes below which the probe skips ALL verify-side
    * pruning and runs the candidate+verify DAG as ONE fused lazy
    * pipeline (the pre-round-15 shape): against a small sidecar the
    * whole verify is cheaper than the 2-3 extra job waves the pruning
    * probes cost (measured: +1 s/batch at sf0.1 where the full gate
    * is ~3 s/batch). Past this size the probes repay themselves —
    * they bound the fat `sh` bytes entering the verify join by the
    * batch's true candidates instead of the corpus. */
  private[graft] val PruneMinStoreBytes = 64L << 20

  /** Candidate-row ceiling for the DRIVER-SIDE verify prune: a
    * candidate frame with ≤ this many rows is collected once and its
    * three id projections (batch ids, sibling ids, corpus ids) become
    * InSet filters on the verify inputs — map-side row drops with
    * ZERO extra Spark jobs (no broadcast exchanges, no counts; at
    * micro-batch scale those fixed per-job costs dominated the whole
    * gate). ~20 MB of driver heap at the cap. */
  private[graft] val CandProbeMaxRows = 100 * 1000

  /** Candidate-row ceiling for the BROADCAST verify prune (the tier
    * above [[CandProbeMaxRows]]): the id projections are broadcast as
    * left-semi prunes, so fat `sh` rows still never reach a shuffle
    * (8M ids ≈ 64 MB broadcast — bounded; the handful of extra
    * broadcast-build jobs is noise at the scale that reaches this
    * tier). A degenerate batch whose candidates exceed even this
    * (near-everything collides) falls back to the unpruned verify
    * join rather than risk an unbounded broadcast. */
  private[graft] val SemiPruneMaxRows = 8L * 1000 * 1000

  /** Write options for the band store's bloom on `band_hash` and the
    * set store's bloom on `id` — adaptive sizing (a 2-row trickle
    * file costs bytes, a full row group gets a properly sized
    * filter), fpp 1e-5 so a [[MaxInValues]]-hash probe falsely reads
    * ~0.1 % of clean row groups. */
  private def bloomOpts(col: String) = Map(
    s"parquet.bloom.filter.enabled#$col" -> "true",
    "parquet.bloom.filter.adaptive.enabled" -> "true",
    s"parquet.bloom.filter.fpp#$col" -> "0.00001",
    "parquet.bloom.filter.max.bytes" -> (256 << 10).toString)

  private[graft] def bandBloomOpts: Map[String, String] = bloomOpts("band_hash")
  private[graft] def setBloomOpts: Map[String, String] = bloomOpts("id")

  /** Docs-per-append above which the store writes split into
    * size-targeted files instead of the micro-batch single file. */
  val BulkAppendDocs: Long = 16000L

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, path: String): Boolean =
    fsOf(spark, path).exists(new Path(path, MetaFile))

  /** Create (or reset) the sidecar directory. */
  def create(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val dir = new Path(path)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    writeMeta(spark, path)
  }

  private def writeMeta(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val out = fs.create(new Path(path, MetaFile), true)
    try out.write("""{"version": 2}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Append one batch of [[Dedup.dedupSketchColumns]] rows (id, sig,
    * sh). Bands first, sets second — sets is the commit point (see
    * object doc). Micro-batches (≤ [[BulkAppendDocs]] docs) write ONE
    * file per store via coalesce(1) — no shuffle, no per-bucket
    * file-count blowup; bulk loads range-split by the sort key. Files
    * are sorted by their probe key so row groups stay bloom-prunable
    * and dictionary-tight. */
  def append(sketches: DataFrame, path: String, cfg: Dedup.MinHashConfig): Unit = {
    val skM = Materialize.once(sketches, eager = true) // consumed twice
    val bulk = skM.count() > BulkAppendDocs // cheap: counts the materialized blocks
    // micro-batches coalesce to ONE sorted file per store (the sort
    // keeps trickle-read row groups dictionary-tight); bulk loads
    // write with their existing partitioning — NO shuffle, no sort:
    // the bloom prunes per row group regardless of order, and a
    // full range-sort of millions of exploded band rows per bulk
    // batch bought nothing the bloom doesn't already provide
    def shaped(df: DataFrame, sortCol: String): DataFrame =
      if (bulk) df
      else df.coalesce(1).sortWithinPartitions(col(sortCol))
    // the band INDEX is already folded into band_hash (bandedSigs
    // seeds the xxhash with it), so the store keeps only
    // (band_hash, id): cross-band equality needs a real 64-bit
    // collision, which the exact verify absorbs as one extra candidate
    val bands = Dedup.bandedSigs(
      skM.select(col("id"), col("sig"))
        .filter(col("sig").getItem(0) =!= Long.MaxValue), cfg)
      .select(col("band_hash"), col("id"))
    shaped(bands, "band_hash")
      .write.mode("append").options(bandBloomOpts)
      .parquet(new Path(path, BandsDir).toString)
    shaped(skM, "id")
      .write.mode("append").options(setBloomOpts)
      .parquet(new Path(path, SetsDir).toString)
  }

  /** Sidecar row count (== corpus rows when healthy) — folds parquet
    * footer metadata, a file listing in steady state, never a scan. */
  def setsCount(spark: SparkSession, path: String): Long = {
    val sets = new Path(path, SetsDir)
    if (!fsOf(spark, path).exists(sets)) 0L
    else spark.read.parquet(sets.toString).count()
  }

  /** All (id) rows currently sketched — the heal probe's anti-join
    * side (column-pruned; read only on the heal path, zero cost when
    * healthy). */
  def sketchedIds(spark: SparkSession, path: String): DataFrame = {
    val sets = new Path(path, SetsDir)
    if (!fsOf(spark, path).exists(sets))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("id", LongType))))
    else spark.read.parquet(sets.toString).select(col("id"))
  }

  private def emptyBands(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("band_hash", LongType), StructField("id", LongType))))

  private def emptySets(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("id", LongType),
        StructField("sh", ArrayType(LongType)))))

  /** `base` filtered to `vals` ∈ `keyCol` as a UNION of
    * ≤[[MaxInValues]]-value pushed-In scans — every union arm shares
    * `base`'s file index, and each arm's In pushes to the parquet
    * reader for bloom/stats row-group skipping (one big In would stop
    * pushing past the or-chain cap and the whole store would decode). */
  private def chunkedInScan(base: DataFrame, keyCol: String,
      vals: Seq[Long]): DataFrame = {
    if (vals.isEmpty) base.filter(lit(false))
    else vals.grouped(MaxInValues).map(chunk =>
        base.filter(col(keyCol).isin(chunk.map(java.lang.Long.valueOf): _*)))
      .reduce(_ union _)
  }

  /** The pruned corpus-side band scan for a batch probing
    * `bandHashes` (exposed for plan/metrics tests): a defined hash
    * list (≤ [[MaxInValues]]×[[MaxProbeChunks]]) is pushed into the
    * scan in ≤MaxInValues chunks — parquet skips every row group
    * whose `band_hash` bloom holds none of them; None (bulk batch)
    * reads the full skinny pre-exploded store once, amortized over
    * the batch. */
  private[graft] def corpusBandScan(spark: SparkSession, path: String,
      bandHashes: Option[Seq[Long]]): DataFrame = {
    val bands = new Path(path, BandsDir)
    if (!fsOf(spark, path).exists(bands)) emptyBands(spark)
    else {
      val base = spark.read.parquet(bands.toString)
      bandHashes.fold(base)(chunkedInScan(base, "band_hash", _))
        .select(col("band_hash"), col("id"))
    }
  }

  /** The pruned corpus-side shingle-set scan for candidate `ids`
    * (exposed for plan/metrics tests) — same chunked-In/full split
    * keyed on the set store's `id` bloom. */
  private[graft] def corpusSetScan(spark: SparkSession, path: String,
      ids: Option[Seq[Long]]): DataFrame = {
    val sets = new Path(path, SetsDir)
    if (!fsOf(spark, path).exists(sets)) emptySets(spark)
    else {
      val base = spark.read.parquet(sets.toString)
      ids.fold(base)(chunkedInScan(base, "id", _))
        .filter(size(col("sh")) > 0)
        .select(col("id"), col("sh"))
    }
  }

  /** Validate that the sidecar's stored sketches were produced with
    * `cfg` — schema-side via the sig column metadata (zero jobs); a
    * missing sets store (fresh sidecar) validates vacuously. */
  def validateConfig(spark: SparkSession, path: String,
      cfg: Dedup.MinHashConfig): Unit = {
    val sets = new Path(path, SetsDir)
    if (fsOf(spark, path).exists(sets))
      Dedup.validateSketchConfig(spark.read.parquet(sets.toString), cfg)
  }

  /** [[Dedup.minhashExactPairsAgainstSketches]] with the corpus side
    * read from the sidecar's stores: identical output — (id_new,
    * id_other, other_in_corpus, jaccard ≥ exactThreshold) — but the
    * sidecar reads are pruned to the batch's candidates wherever the
    * probe permits (see [[pairsAndSketches]]). */
  def minhashExactPairsAgainstSidecar(newDf: DataFrame, path: String,
      idCol: String, textCol: String,
      cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): DataFrame =
    pairsAndSketches(newDf, path, idCol, textCol, cfg, exactThreshold)._1

  /** The pairing core, returning (pairs, batch sketch frame). The
    * sketch frame ([[Dedup.dedupSketchColumns]] of the batch) is
    * materialized ONCE — a single text pass evaluates both sketch
    * expressions — and shared by candidate generation, verification,
    * and the caller's sidecar append via [[admitAndSketches]] (the
    * sink previously re-hashed every admitted document's text a
    * second time to build the append rows).
    *
    * Corpus-side reads per batch, by probe size:
    *  - ≤ [[MaxInValues]]×[[MaxProbeChunks]] distinct band hashes
    *    (≈100 docs at 64 bands): chunked pushed-In band-store scans —
    *    parquet blooms skip every clean row group, bytes track the
    *    batch's true collisions, not sidecar size.
    *  - larger (bulk) batches: ONE full scan of the skinny
    *    pre-exploded (band_hash, id) store, amortized over the batch.
    *    Scan-side pruning is information-theoretically out for this
    *    arm: band hashes are uniform over 2^64, so a bulk batch's m
    *    probe values intersect ≈ min(m, G) of the store's G row
    *    groups regardless of file layout — at m ≫ G no range
    *    partitioning or bloom can skip anything. What CAN be bounded
    *    is everything after the scan: the store is the narrowest
    *    possible projection (two longs — reading the sig column to
    *    re-derive bands, as this arm used to, costs the same bytes
    *    PLUS 64 xxhashes and an explode per corpus doc per batch),
    *    and the verify inputs below are candidate-pruned.
    *  - the verify (fat `sh`) inputs are pruned on BOTH paths, tiered
    *    by candidate volume: ≤ [[CandProbeMaxRows]] candidate rows
    *    collect once and prune via driver-side InSet filters (zero
    *    extra jobs; corpus ids additionally push into the set store
    *    as chunked Ins when they fit), ≤ [[SemiPruneMaxRows]] prune
    *    via broadcast left-semi, beyond that unpruned — so corpus-
    *    sized `sh` rows never reach a shuffle outside the degenerate
    *    all-collides case. */
  private[graft] def pairsAndSketches(newDf: DataFrame, path: String,
      idCol: String, textCol: String, cfg: Dedup.MinHashConfig,
      exactThreshold: Double): (DataFrame, DataFrame, Boolean) = {
    val spark = newDf.sparkSession
    require(exists(spark, path), s"no sketch sidecar at $path (missing $MetaFile)")
    validateConfig(spark, path, cfg)
    val sk = Materialize.once(
      Dedup.dedupSketchColumns(newDf, idCol, textCol, cfg))
    val newSigs = sk.select(col("id"), col("sig"))
      .filter(col("sig").getItem(0) =!= Long.MaxValue)
    val newBanded = Materialize.once(Dedup.bandedSigs(newSigs, cfg))
    val hashesIn = probeHashes(newBanded)
    val corpusBands = corpusBandScan(spark, path, hashesIn)
    val l = newBanded.select(col("band_hash"), col("id").as("id_new"))
    val rt = corpusBands.withColumn("other_in_corpus", lit(true))
      .select(col("band_hash"), col("id").as("id_other"), col("other_in_corpus"))
      .union(newBanded
        .select(col("band_hash"), col("id").as("id_other"))
        .withColumn("other_in_corpus", lit(false)))
    // corpus partner: any id; new partner: only SMALLER new ids, so
    // each new-vs-new pair is emitted once and never as a self-pair.
    // distinct() also absorbs duplicate band rows from a torn-append
    // heal (object doc)
    val candidates0 = l.join(rt, Seq("band_hash"))
      .filter(col("other_in_corpus") || col("id_other") < col("id_new"))
      .select("id_new", "id_other", "other_in_corpus").distinct()
    val newSets = sk.select(col("id"), col("sh")).filter(size(col("sh")) > 0)
    // a SMALL sidecar skips pruning entirely: lazy candidates, the
    // full (cheap) verify, one fused pipeline — the probe jobs below
    // would cost more than they save (see [[PruneMinStoreBytes]])
    if (!pruneWorthwhile(spark, path)) {
      val allSets = corpusSetScan(spark, path, None).union(newSets)
      return (verifyJoin(candidates0, newSets, allSets, exactThreshold),
        sk, false)
    }
    // the candidate DAG is materialized (trickle and bulk): it feeds
    // the bounded probe collect, the verify-side prunes, and the
    // caller's doomed projection — candidate rows are near-dup pairs
    // plus rare 64-bit collisions, a tiny fraction of the join volume
    // that produced them. Lazy: the probe collect below is the job
    // that both materializes and reads it.
    val candidates = Materialize.once(candidates0)
    // verify-side prune, tiered by candidate volume: every fat `sh`
    // input is filtered to the ids the candidate frame can actually
    // reference BEFORE any join, so corpus- or batch-sized `sh` rows
    // never reach the verify join's shuffle.
    val probe = candidates.limit(CandProbeMaxRows + 1).collect()
    val inCap = MaxInValues * MaxProbeChunks
    def inSet(df: DataFrame, keyCol: String, ids: Array[Long]): DataFrame =
      if (ids.isEmpty) df.filter(lit(false))
      else df.filter(col(keyCol).isInCollection(
        ids.map(java.lang.Long.valueOf).toSeq))
    val (shAInput, allSets) =
      if (probe.length <= CandProbeMaxRows) {
        // small tier: ids fit the driver — InSet filters, zero extra
        // jobs; corpus ids additionally push into the set-store scan
        // as chunked Ins when they fit (bloom row-group skipping)
        val corpusIds = probe.iterator.filter(_.getBoolean(2))
          .map(_.getLong(1)).toArray.distinct
        val newIds = probe.iterator.map(_.getLong(0)).toArray.distinct
        val sibIds = probe.iterator.filterNot(_.getBoolean(2))
          .map(_.getLong(1)).toArray.distinct
        val corpusSets =
          if (corpusIds.length <= inCap)
            corpusSetScan(spark, path, Some(corpusIds.toSeq))
          else inSet(corpusSetScan(spark, path, None), "id", corpusIds)
        (inSet(newSets, "id", newIds),
          corpusSets.union(inSet(newSets, "id", sibIds)))
      } else {
        // big tier: candidates stay distributed; ≤ SemiPruneMaxRows
        // prunes via broadcast left-semi, beyond that unpruned (a
        // degenerate all-collides batch — bounded memory beats a
        // corpus-sized broadcast)
        val candRows = candidates.count()
        val corpusSets0 = corpusSetScan(spark, path, None)
        if (candRows <= SemiPruneMaxRows) {
          val corpusCandIds = candidates.filter(col("other_in_corpus"))
            .select(col("id_other").as("id")).distinct()
          val newIds = candidates.select(col("id_new").as("id")).distinct()
          val siblingIds = candidates.filter(!col("other_in_corpus"))
            .select(col("id_other").as("id")).distinct()
          (newSets.join(broadcast(newIds), Seq("id"), "left_semi"),
            corpusSets0.join(broadcast(corpusCandIds), Seq("id"), "left_semi")
              .union(newSets.join(broadcast(siblingIds), Seq("id"), "left_semi")))
        } else (newSets, corpusSets0.union(newSets))
      }
    (verifyJoin(candidates, shAInput, allSets, exactThreshold), sk, true)
  }

  /** Exact-Jaccard verification of a candidate frame against the
    * `sh_a` (id_new) and `sh_b` (id_other) shingle-set inputs. */
  private def verifyJoin(candidates: DataFrame, shAInput: DataFrame,
      allSets: DataFrame, exactThreshold: Double): DataFrame = {
    val joined = candidates
      .join(shAInput.select(col("id").as("id_new"), col("sh").as("sh_a")), Seq("id_new"))
      .join(allSets.select(col("id").as("id_other"), col("sh").as("sh_b")), Seq("id_other"))
      .withColumn("inter",
        graft.functions.HashFunctions.sortedIntersectCount(col("sh_a"), col("sh_b")))
    joined.select(col("id_new"), col("id_other"), col("other_in_corpus"),
      (col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= exactThreshold)
  }

  /** True when the band store is big enough that the pruning probes'
    * extra job waves repay themselves (one bounded file listing). The
    * crossover is overridable via the runtime conf
    * `graft.sidecar.pruneMinStoreBytes` (tests force the pruned tiers
    * on small fixtures; a deployment can re-tune for its storage). */
  private def pruneWorthwhile(spark: SparkSession, path: String): Boolean = {
    val threshold = spark.conf.getOption("graft.sidecar.pruneMinStoreBytes")
      .map(_.trim.toLong).getOrElse(PruneMinStoreBytes)
    val fs = fsOf(spark, path)
    val bands = new Path(path, BandsDir)
    fs.exists(bands) &&
      fs.listStatus(bands).iterator.filter(_.isFile).map(_.getLen).sum >=
        threshold
  }

  /** The exploded LSH band rows of a batch — the probe side of the
    * candidate join (exposed with [[probeHashes]] for plan tests). */
  private[graft] def bandedBatch(newDf: DataFrame, idCol: String, textCol: String,
      cfg: Dedup.MinHashConfig): DataFrame =
    Dedup.bandedSigs(Dedup.sigFrame(newDf, idCol, textCol, cfg), cfg)

  /** A batch's distinct band hashes when they fit the chunked probe
    * ceiling ([[MaxInValues]]×[[MaxProbeChunks]]; one bounded job;
    * None for bulk batches). Exposed for the pruning tests. */
  private[graft] def probeHashes(newBanded: DataFrame): Option[Seq[Long]] = {
    val cap = MaxInValues * MaxProbeChunks
    val hs = newBanded.select(col("band_hash")).distinct()
      .limit(cap + 1).collect().map(_.getLong(0)).toSeq
    if (hs.length <= cap) Some(hs) else None
  }

  /** [[Dedup.admitNewAgainstSketches]] against the sidecar: batch
    * rows that near-duplicate neither a sketched corpus doc nor a
    * smaller-id sibling of their own batch. */
  def admitNew(newDf: DataFrame, path: String, idCol: String, textCol: String,
      cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): DataFrame =
    admitAndSketches(newDf, path, idCol, textCol, cfg, exactThreshold)._1

  /** [[admitNew]] plus the admitted rows' READY-TO-APPEND sketch frame
    * ([[Dedup.dedupSketchColumns]] rows, config metadata attached) —
    * derived from the SAME materialized sketch pass that drove
    * admission, so an ingest sink appends without re-reading or
    * re-hashing the admitted documents' text (previously the second
    * full sketch pass per batch). The doomed-id frame is materialized
    * once at call time and broadcast into both anti joins, so neither
    * the batch docs nor the sketch frame is shuffled. */
  def admitAndSketches(newDf: DataFrame, path: String, idCol: String,
      textCol: String,
      cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): (DataFrame, DataFrame) = {
    val (pairs, sk, pruned) = pairsAndSketches(newDf, path, idCol, textCol,
      cfg, exactThreshold)
    val doomed = Materialize.once(pairs.select(col("id_new")).distinct())
    if (!pruned) {
      // small-sidecar fused path: keep everything lazy — the doomed
      // frame materializes inside the caller's first action and the
      // second consumer reuses the checkpoint; extra probe jobs here
      // would cost more than the whole verify does at this size
      val admitted = newDf.join(
        doomed.withColumnRenamed("id_new", idCol), Seq(idCol), "left_anti")
      val sketches = sk.join(
        doomed.withColumnRenamed("id_new", "id"), Seq("id"), "left_anti")
      (admitted, sketches)
    } else {
      // big sidecar: doomed ids ⊆ batch ids — usually tiny (near-dup
      // id_news), so the common tier collects them once and rejects
      // map-side with a NOT-InSet filter (no join, no shuffle, no
      // broadcast build); a heavily duplicated bulk load that
      // overflows the driver cap keeps the ids distributed and
      // anti-joins, broadcast when bounded
      val dProbe = doomed.limit(CandProbeMaxRows + 1).collect()
      if (dProbe.length <= CandProbeMaxRows) {
        val ids = dProbe.map(_.getLong(0)).map(java.lang.Long.valueOf).toSeq
        // coalesce(…, true): a NULL id never matches an anti join's
        // key, so the filter must KEEP it too, not let three-valued
        // IN drop it
        def keep(df: DataFrame, keyCol: String): DataFrame =
          if (ids.isEmpty) df
          else df.filter(coalesce(!col(keyCol).isInCollection(ids), lit(true)))
        (keep(newDf, idCol), keep(sk, "id"))
      } else {
        val hint: DataFrame => DataFrame =
          if (doomed.count() <= SemiPruneMaxRows) broadcast(_) else identity
        val admitted = newDf.join(
          hint(doomed.withColumnRenamed("id_new", idCol)), Seq(idCol), "left_anti")
        val sketches = sk.join(
          hint(doomed.withColumnRenamed("id_new", "id")), Seq("id"), "left_anti")
        (admitted, sketches)
      }
    }
  }

  /** One-time in-place migration of a FLAT (round-10) sidecar
    * directory — [[Dedup.dedupSketchColumns]] rows as loose parquet
    * files at the root — into the two-store layout: the root rows
    * become the set store (rewritten sorted + bloomed) and the band
    * store is derived from their signatures. No-op when the marker
    * already exists or the directory is absent/empty. Root files are
    * deleted only after both stores are fully written; the marker is
    * written LAST, so a crash mid-migration re-runs wholesale (the
    * fresh run clears partial stores first). */
  def migrateV1IfNeeded(spark: SparkSession, path: String,
      cfg: Dedup.MinHashConfig): Unit = {
    val fs = fsOf(spark, path)
    val dir = new Path(path)
    if (!fs.exists(dir) || fs.exists(new Path(dir, MetaFile))) return
    val rootParts = fs.listStatus(dir).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    if (rootParts.isEmpty) return
    val flat = spark.read.parquet(rootParts.map(_.getPath.toString).toIndexedSeq: _*)
    Dedup.validateSketchConfig(flat, cfg)
    val staged = Materialize.once(flat, eager = true)
    fs.delete(new Path(dir, BandsDir), true)
    fs.delete(new Path(dir, SetsDir), true)
    append(staged, path, cfg)
    rootParts.foreach(st => fs.delete(st.getPath, false))
    fs.delete(new Path(dir, "_SUCCESS"), false)
    writeMeta(spark, path)
  }

  /** Compact both stores ([[graft.sources.Writers.compactParquet]]'s
    * crash-safe rename swap), re-sorting by the probe key and
    * re-applying the blooms — a generic compaction would silently
    * shed both and the trickle fast path would quietly read every row
    * group. Single maintainer: run between batches, never
    * concurrently with the ingest sink. Returns (filesBefore,
    * filesAfter) summed over stores. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): (Int, Int) = {
    val fs = fsOf(spark, path)
    var before = 0
    var after = 0
    def one(store: String, sortCol: String, opts: Map[String, String]): Unit = {
      val p = new Path(path, store)
      if (fs.exists(p)) {
        val (b, a) = graft.sources.Writers.compactParquet(
          spark, p.toString, targetFileBytes, opts, sortCols = Seq(sortCol))
        before += b; after += a
      }
    }
    one(BandsDir, "band_hash", bandBloomOpts)
    one(SetsDir, "id", setBloomOpts)
    (before, after)
  }
}
