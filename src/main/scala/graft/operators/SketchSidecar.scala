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

  /** Trickle-batch fast path: when the batch probes ≤ this many
    * distinct band hashes (resp. candidate ids), the values are
    * pushed into the scan as an In predicate for bloom/stats
    * row-group skipping — mirrors the session's
    * `spark.sql.parquet.pushdown.inFilterThreshold` (Spark lowers a
    * pushed In to a per-value or-chain; a 1250-value chain overflowed
    * an executor stack, and bloom selectivity decays as
    * 1-(1-fpp)^K anyway). */
  private[graft] val MaxInValues = 100

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

  /** The pruned corpus-side band scan for a batch probing
    * `bandHashes` (exposed for plan/metrics tests): a defined hash
    * list (trickle batch, ≤ [[MaxInValues]]) is pushed into the scan
    * — parquet skips every row group whose `band_hash` bloom holds
    * none of them; None (bulk batch) reads the full skinny store
    * once, amortized over the batch. */
  private[graft] def corpusBandScan(spark: SparkSession, path: String,
      bandHashes: Option[Seq[Long]]): DataFrame = {
    val bands = new Path(path, BandsDir)
    if (!fsOf(spark, path).exists(bands)) emptyBands(spark)
    else {
      val base = spark.read.parquet(bands.toString)
      bandHashes.fold(base)(hs =>
          base.filter(col("band_hash").isin(hs.map(java.lang.Long.valueOf): _*)))
        .select(col("band_hash"), col("id"))
    }
  }

  /** The pruned corpus-side shingle-set scan for candidate `ids`
    * (exposed for plan/metrics tests) — same trickle/bulk split keyed
    * on the set store's `id` bloom. */
  private[graft] def corpusSetScan(spark: SparkSession, path: String,
      ids: Option[Seq[Long]]): DataFrame = {
    val sets = new Path(path, SetsDir)
    if (!fsOf(spark, path).exists(sets)) emptySets(spark)
    else {
      val base = spark.read.parquet(sets.toString)
      ids.fold(base)(is =>
          base.filter(col("id").isin(is.map(java.lang.Long.valueOf): _*)))
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
    * id_other, other_in_corpus, jaccard ≥ exactThreshold) — but for
    * trickle batches the sidecar reads are bloom-pruned to the
    * batch's candidate row groups, so per-batch sidecar bytes-read
    * track the batch, not the corpus. The two bounded driver collects
    * (≤ [[MaxInValues]]+1 rows each) size the pruning. */
  def minhashExactPairsAgainstSidecar(newDf: DataFrame, path: String,
      idCol: String, textCol: String,
      cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): DataFrame = {
    val spark = newDf.sparkSession
    require(exists(spark, path), s"no sketch sidecar at $path (missing $MetaFile)")
    validateConfig(spark, path, cfg)
    val newSigs = Dedup.sigFrame(newDf, idCol, textCol, cfg)
    val newBanded = Materialize.once(Dedup.bandedSigs(newSigs, cfg))
    val hashesIn = probeHashes(newBanded)
    val corpusBands = hashesIn match {
      case Some(_) =>
        // trickle: bloom-pruned band-store read — bytes track the
        // batch's true collisions
        corpusBandScan(spark, path, hashesIn)
      case None =>
        // bulk: band from the SET store's signature column in one
        // column-pruned scan — the pre-exploded band store stores
        // strictly more bytes than the sig column it derives from, so
        // a full scan of it would only cost more (the band store
        // exists for the trickle path's bloom granularity)
        val sets = new Path(path, SetsDir)
        if (!fsOf(spark, path).exists(sets)) emptyBands(spark)
        else Dedup.bandedSigs(
          spark.read.parquet(sets.toString).select(col("id"), col("sig"))
            .filter(col("sig").getItem(0) =!= Long.MaxValue), cfg)
          .select(col("band_hash"), col("id"))
    }
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
    // verify-side pruning applies on the TRICKLE path only: the
    // candidate DAG is materialized once (it then feeds the bounded
    // id-probe collect AND the verify join) and the candidate corpus
    // ids push into the set-store scan when they fit the In cap. A
    // bulk batch skips both — its candidates won't fit any In list,
    // so the lazy DAG flows straight into the verify join (single
    // consumer, no materialization write) against the full
    // column-pruned set store.
    val (candidates, idsIn) = hashesIn match {
      case None => (candidates0, None)
      case Some(_) =>
        val c = Materialize.once(candidates0, eager = true)
        val candIds = c.filter(col("other_in_corpus"))
          .select(col("id_other")).distinct()
          .limit(MaxInValues + 1).collect().map(_.getLong(0)).toSeq
        (c, if (candIds.length <= MaxInValues) Some(candIds) else None)
    }
    val corpusSets = corpusSetScan(spark, path, idsIn)
    val newSets = Dedup.setFrame(newDf, idCol, textCol, cfg)
    val allSets = corpusSets.union(newSets)
    val joined = candidates
      .join(newSets.select(col("id").as("id_new"), col("sh").as("sh_a")), Seq("id_new"))
      .join(allSets.select(col("id").as("id_other"), col("sh").as("sh_b")), Seq("id_other"))
      .withColumn("inter",
        graft.functions.HashFunctions.sortedIntersectCount(col("sh_a"), col("sh_b")))
    joined.select(col("id_new"), col("id_other"), col("other_in_corpus"),
      (col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= exactThreshold)
  }

  /** The exploded LSH band rows of a batch — the probe side of the
    * candidate join (exposed with [[probeHashes]] for plan tests). */
  private[graft] def bandedBatch(newDf: DataFrame, idCol: String, textCol: String,
      cfg: Dedup.MinHashConfig): DataFrame =
    Dedup.bandedSigs(Dedup.sigFrame(newDf, idCol, textCol, cfg), cfg)

  /** A batch's distinct band hashes when they fit the In cap (one
    * bounded job; None for bulk batches). Exposed for the pruning
    * tests. */
  private[graft] def probeHashes(newBanded: DataFrame): Option[Seq[Long]] = {
    val hs = newBanded.select(col("band_hash")).distinct()
      .limit(MaxInValues + 1).collect().map(_.getLong(0)).toSeq
    if (hs.length <= MaxInValues) Some(hs) else None
  }

  /** [[Dedup.admitNewAgainstSketches]] against the sidecar: batch
    * rows that near-duplicate neither a sketched corpus doc nor a
    * smaller-id sibling of their own batch. */
  def admitNew(newDf: DataFrame, path: String, idCol: String, textCol: String,
      cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): DataFrame = {
    val doomed = minhashExactPairsAgainstSidecar(newDf, path, idCol, textCol,
      cfg, exactThreshold)
      .select(col("id_new").as(idCol)).distinct()
    newDf.join(doomed, Seq(idCol), "left_anti")
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
