package graft.operators

import graft.Materialize
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Band-partitioned on-disk layout for a MinHash dedup-sketch sidecar —
  * the state store behind
  * [[graft.streaming.EventStreams.semanticIngestSink]].
  *
  * The flat layout ([[Dedup.dedupSketchColumns]] rows appended to one
  * parquet directory) forces every micro-batch admission to SCAN THE
  * WHOLE SIDECAR: correct, and only ~1–2 % of corpus bytes, but at a
  * 100 TB corpus that is still 1–2 TB read per trickle batch. The LSH
  * band keys the admission join computes anyway are a natural partition
  * key, so this layout splits the sketch into two hive-partitioned
  * stores, each pruned by exactly the values a batch probes — the same
  * discipline as [[Similarity.queryIvfIndex]]'s cell pruning:
  *
  * {{{
  * <path>/_graft_sidecar_v2.json           layout marker {bandBuckets, setBuckets}
  * <path>/bands/bucket=<k>/part-….parquet  (band int, band_hash long, id long)
  * <path>/sets/sbucket=<k>/part-….parquet  (id long, sig arr<long> [cfg metadata], sh arr<long>)
  * }}}
  *
  * `bands` holds the exploded LSH bucket rows, partitioned by
  * `bucket = pmod(xxhash64(band_hash, band), bandBuckets)` — a batch
  * doc with B bands probes ≤ B bucket directories, so candidate-scan
  * bytes scale with BATCH band rows, not sidecar size. Rows are written
  * sorted by `band_hash` within each file so the probe's pushed-In
  * predicate (trickle batches) also skips row groups via parquet
  * column stats. `sets` holds one row per admitted doc (signature +
  * sorted shingle hashes — the verify payload), partitioned by
  * `sbucket = pmod(xxhash64(id, salt), setBuckets)` and pruned to the
  * candidate ids' buckets at verify time.
  *
  * Write protocol (one maintainer, the ingest sink): corpus docs
  * append FIRST, then `bands`, then `sets` — the `sets` row count is
  * the sidecar's commit point (sets rows == corpus rows when healthy;
  * both counts fold parquet footer metadata, no data scan). A crash
  * between the bands and sets appends can leave duplicate band rows
  * after the heal re-appends them — harmless: the candidate join is
  * `.distinct()`ed, and compaction rewrites buckets wholesale.
  *
  * Sizing the layout: each batch append writes ≤ min(bandBuckets,
  * batchBands) band files, so more buckets = better probe pruning but
  * faster small-file accumulation (run [[compact]] on the maintenance
  * schedule, between batches). The 256-bucket default keeps a
  * 1000-batch-day at ~256k small files pre-compaction while pruning a
  * 64-band single-doc probe to ≤ 25 % of band bytes — and the
  * band_hash row-group pushdown inside surviving buckets does the
  * rest. Buckets are FROZEN at creation (the marker file); changing
  * them requires a rebuild.
  */
object SketchSidecar {
  val MetaFile = "_graft_sidecar_v2.json"
  val BandsDir = "bands"
  val SetsDir = "sets"

  /** Decorrelates the sets partitioner from xxhash64(id) uses elsewhere. */
  private val SetBucketSalt = 0x5ca1ab1eL

  /** Bucket counts, frozen into the marker file at creation. */
  final case class Layout(bandBuckets: Int = 256, setBuckets: Int = 256) {
    require(bandBuckets >= 1 && setBuckets >= 1,
      s"bucket counts must be >= 1 (got $bandBuckets, $setBuckets)")
  }

  /** Trickle-batch fast path: when the batch probes ≤ this many
    * distinct band hashes (resp. candidate ids), the values are ALSO
    * pushed into the scan as an In predicate for parquet row-group
    * skipping inside surviving buckets — same bound discipline as
    * [[graft.streaming.EventStreams]]'s MaxInHashes (Spark lowers
    * pushed Ins to a per-value or-chain; keep it small). */
  private[graft] val MaxInValues = 100

  def bandBucket(band: Column, bandHash: Column, buckets: Int): Column =
    pmod(xxhash64(bandHash, band), lit(buckets.toLong))

  def setBucket(id: Column, buckets: Int): Column =
    pmod(xxhash64(id, lit(SetBucketSalt)), lit(buckets.toLong))

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, path: String): Boolean =
    fsOf(spark, path).exists(new Path(path, MetaFile))

  /** Create (or reset) the sidecar directory with a frozen layout. */
  def create(spark: SparkSession, path: String, layout: Layout): Unit = {
    val fs = fsOf(spark, path)
    val dir = new Path(path)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    val meta = new Path(dir, MetaFile)
    val out = fs.create(meta, true)
    try out.write(
      s"""{"bandBuckets": ${layout.bandBuckets}, "setBuckets": ${layout.setBuckets}}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  def readLayout(spark: SparkSession, path: String): Layout = {
    val fs = fsOf(spark, path)
    val meta = new Path(path, MetaFile)
    require(fs.exists(meta), s"no sketch sidecar at $path (missing $MetaFile)")
    val in = fs.open(meta)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    def field(name: String): Int = {
      val m = ("\"" + name + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(text)
      require(m.isDefined, s"malformed $MetaFile at $path: $text")
      m.get.group(1).toInt
    }
    Layout(field("bandBuckets"), field("setBuckets"))
  }

  /** Append one batch of [[Dedup.dedupSketchColumns]] rows (id, sig,
    * sh). Bands first, sets second — sets is the commit point (see
    * object doc). The `repartition(bucket)` before each partitioned
    * write keeps file counts at one per TOUCHED bucket per batch
    * instead of tasks × buckets, and the in-file `band_hash` sort
    * gives the probe's pushed-In tight row-group stats. */
  def append(sketches: DataFrame, path: String, cfg: Dedup.MinHashConfig,
      layout: Layout): Unit = {
    val skM = Materialize.once(sketches, eager = true) // consumed twice
    val bands = Dedup.bandedSigs(
        skM.select(col("id"), col("sig"))
          .filter(col("sig").getItem(0) =!= Long.MaxValue), cfg)
      .withColumn("bucket", bandBucket(col("band"), col("band_hash"), layout.bandBuckets))
    bands.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("band_hash"))
      .write.partitionBy("bucket").mode("append")
      .parquet(new Path(path, BandsDir).toString)
    skM.withColumn("sbucket", setBucket(col("id"), layout.setBuckets))
      .repartition(col("sbucket"))
      .sortWithinPartitions(col("sbucket"), col("id"))
      .write.partitionBy("sbucket").mode("append")
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
      StructType(Seq(StructField("band", IntegerType),
        StructField("band_hash", LongType), StructField("id", LongType))))

  private def emptySets(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("id", LongType),
        StructField("sh", ArrayType(LongType)))))

  /** A batch's band-store probe keys: its distinct bucket values (≤
    * bandBuckets — the partition-pruning IN list) and, when
    * trickle-sized, its distinct band hashes (≤ [[MaxInValues]] — the
    * row-group pushdown list; None past the cap). Two bounded driver
    * collects. Exposed for the pruning plan tests. */
  private[graft] def probeKeys(newBanded: DataFrame): (Seq[Long], Option[Seq[Long]]) = {
    val buckets = newBanded.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val batchHashes = newBanded.select(col("band_hash")).distinct()
      .limit(MaxInValues + 1).collect().map(_.getLong(0)).toSeq
    (buckets, if (batchHashes.length <= MaxInValues) Some(batchHashes) else None)
  }

  /** The exploded, bucket-stamped LSH band rows of a batch — the probe
    * side of the candidate join (exposed with [[probeKeys]] for plan
    * tests). */
  private[graft] def bandedBatch(newDf: DataFrame, idCol: String, textCol: String,
      cfg: Dedup.MinHashConfig, layout: Layout): DataFrame =
    Dedup.bandedSigs(Dedup.sigFrame(newDf, idCol, textCol, cfg), cfg)
      .withColumn("bucket", bandBucket(col("band"), col("band_hash"), layout.bandBuckets))

  /** The pruned corpus-side band scan for a batch probing `buckets`
    * (exposed for plan/metrics tests): partition pruning on the hive
    * `bucket` column cuts the read to the batch's candidate buckets,
    * and when the batch's distinct band hashes are ≤ [[MaxInValues]]
    * the hash list is ALSO pushed into the scan for row-group skipping
    * inside surviving buckets. */
  private[graft] def corpusBandScan(spark: SparkSession, path: String,
      buckets: Seq[Long], bandHashes: Option[Seq[Long]]): DataFrame = {
    val bands = new Path(path, BandsDir)
    if (buckets.isEmpty || !fsOf(spark, path).exists(bands)) emptyBands(spark)
    else {
      val base = spark.read.parquet(bands.toString)
        .filter(col("bucket").isin(buckets: _*))
      bandHashes.fold(base)(hs =>
          base.filter(col("band_hash").isin(hs.map(java.lang.Long.valueOf): _*)))
        .select(col("band"), col("band_hash"), col("id"))
    }
  }

  /** The pruned corpus-side shingle-set scan for candidate ids hashed
    * into `sbuckets` (exposed for plan/metrics tests). */
  private[graft] def corpusSetScan(spark: SparkSession, path: String,
      sbuckets: Seq[Long], ids: Option[Seq[Long]]): DataFrame = {
    val sets = new Path(path, SetsDir)
    if (sbuckets.isEmpty || !fsOf(spark, path).exists(sets)) emptySets(spark)
    else {
      val base = spark.read.parquet(sets.toString)
        .filter(col("sbucket").isin(sbuckets: _*))
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
    * read from a partitioned sidecar: identical output — (id_new,
    * id_other, other_in_corpus, jaccard ≥ exactThreshold) — but the
    * sidecar reads are PRUNED to the batch's candidate buckets, so
    * per-batch sidecar bytes-read scale with the batch, not the
    * corpus. Two bounded driver collects size the pruning (≤
    * bandBuckets band-bucket keys, ≤ setBuckets set-bucket keys — the
    * same bounded-model shape as the IVF probes). */
  def minhashExactPairsAgainstSidecar(newDf: DataFrame, path: String,
      idCol: String, textCol: String,
      cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): DataFrame = {
    val spark = newDf.sparkSession
    val layout = readLayout(spark, path)
    validateConfig(spark, path, cfg)
    val newSigs = Dedup.sigFrame(newDf, idCol, textCol, cfg)
    val newBanded = Materialize.once(
      Dedup.bandedSigs(newSigs, cfg)
        .withColumn("bucket", bandBucket(col("band"), col("band_hash"), layout.bandBuckets)))
    val (buckets, hashesIn) = probeKeys(newBanded)
    val corpusBands = corpusBandScan(spark, path, buckets, hashesIn)
    val l = newBanded.select(col("band"), col("band_hash"), col("id").as("id_new"))
    val rt = corpusBands.withColumn("other_in_corpus", lit(true))
      .select(col("band"), col("band_hash"), col("id").as("id_other"), col("other_in_corpus"))
      .union(newBanded
        .select(col("band"), col("band_hash"), col("id").as("id_other"))
        .withColumn("other_in_corpus", lit(false)))
    // corpus partner: any id; new partner: only SMALLER new ids, so
    // each new-vs-new pair is emitted once and never as a self-pair.
    // distinct() also absorbs duplicate band rows from a torn-append
    // heal (object doc)
    val candidates = Materialize.once(
      l.join(rt, Seq("band", "band_hash"))
        .filter(col("other_in_corpus") || col("id_other") < col("id_new"))
        .select("id_new", "id_other", "other_in_corpus").distinct(),
      eager = true) // consumed twice: sbucket probe collect + verify join
    // verify-side pruning: candidate corpus ids → their set buckets
    val sbuckets = candidates.filter(col("other_in_corpus"))
      .select(setBucket(col("id_other"), layout.setBuckets).as("b")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val candIds = candidates.filter(col("other_in_corpus"))
      .select(col("id_other")).distinct()
      .limit(MaxInValues + 1).collect().map(_.getLong(0)).toSeq
    val idsIn = if (candIds.length <= MaxInValues) Some(candIds) else None
    val corpusSets = corpusSetScan(spark, path, sbuckets, idsIn)
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

  /** [[Dedup.admitNewAgainstSketches]] against a partitioned sidecar:
    * batch rows that near-duplicate neither a sketched corpus doc nor
    * a smaller-id sibling of their own batch. */
  def admitNew(newDf: DataFrame, path: String, idCol: String, textCol: String,
      cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(numHashes = 128, bands = 64),
      exactThreshold: Double = 0.5): DataFrame = {
    val doomed = minhashExactPairsAgainstSidecar(newDf, path, idCol, textCol,
      cfg, exactThreshold)
      .select(col("id_new").as(idCol)).distinct()
    newDf.join(doomed, Seq(idCol), "left_anti")
  }

  /** One-time in-place migration of a FLAT (pre-v2) sidecar directory
    * — [[Dedup.dedupSketchColumns]] rows as loose parquet files at the
    * root — into the partitioned layout. No-op when the marker already
    * exists or the directory is absent/empty. The root part-files are
    * deleted only after both partitioned stores are fully written; a
    * crash mid-migration is re-entrant (the marker is written LAST, so
    * a torn migration re-runs wholesale — appends before the marker
    * are clobbered by the fresh [[create]]). */
  def migrateV1IfNeeded(spark: SparkSession, path: String,
      cfg: Dedup.MinHashConfig, layout: Layout): Unit = {
    val fs = fsOf(spark, path)
    val dir = new Path(path)
    if (!fs.exists(dir) || fs.exists(new Path(dir, MetaFile))) return
    val rootParts = fs.listStatus(dir).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    if (rootParts.isEmpty) return
    val flat = spark.read.parquet(rootParts.map(_.getPath.toString).toIndexedSeq: _*)
    Dedup.validateSketchConfig(flat, cfg)
    val staged = Materialize.once(flat, eager = true)
    // clear any torn previous migration's partitioned remnants, then
    // write stores, then root cleanup, then the marker (commit point)
    fs.delete(new Path(dir, BandsDir), true)
    fs.delete(new Path(dir, SetsDir), true)
    append(staged, path, cfg, layout)
    rootParts.foreach(st => fs.delete(st.getPath, false))
    fs.delete(new Path(dir, "_SUCCESS"), false)
    val out = fs.create(new Path(dir, MetaFile), true)
    try out.write(
      s"""{"bandBuckets": ${layout.bandBuckets}, "setBuckets": ${layout.setBuckets}}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** Compact both partitioned stores, one crash-safe rename-only swap
    * per bucket directory ([[graft.sources.Writers.compactParquet]]'s
    * FsSwap state machine), re-sorting band files by `band_hash` so
    * row-group stats stay tight for the probe's pushed-In. Single
    * maintainer: run between batches, never concurrently with the
    * ingest sink. Returns (filesBefore, filesAfter) summed over
    * buckets. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): (Int, Int) = {
    val fs = fsOf(spark, path)
    var before = 0
    var after = 0
    def compactStore(store: String, sortCols: Seq[String]): Unit = {
      val storePath = new Path(path, store)
      if (fs.exists(storePath)) {
        fs.listStatus(storePath).filter(_.isDirectory).foreach { bucketDir =>
          val (b, a) = graft.sources.Writers.compactParquet(
            spark, bucketDir.getPath.toString, targetFileBytes,
            sortCols = sortCols)
          before += b; after += a
        }
      }
    }
    compactStore(BandsDir, Seq("band_hash"))
    compactStore(SetsDir, Seq("id"))
    (before, after)
  }
}
