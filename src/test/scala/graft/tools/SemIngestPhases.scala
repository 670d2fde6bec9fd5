package graft.operators

import org.apache.spark.sql.functions._

/** Phase-attribution profiler for the semantic-ingest bulk arm
  * (round-15 weak item): times each sub-DAG of
  * [[SketchSidecar.minhashExactPairsAgainstSidecar]] in isolation per
  * batch, against a growing sidecar, so the sf100 over-linearity
  * (stream_semantic_ingest 66 -> 854.5 s for 10x, BASELINE.md round-14
  * wave 2) is attributed to a phase instead of guessed at.
  *
  *   Test/runMain graft.operators.SemIngestPhases /tmp/sf10
  *
  * Sub-DAGs are forced with a noop write (count() would let parquet
  * aggregate pushdown skip the scan entirely). Attribution double-pays
  * shared upstreams (each phase re-derives its inputs); the REAL
  * per-batch wall is the separately-timed admit+append line.
  */
object SemIngestPhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = graft.GraftSession.local(threads = 32, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, SketchSidecar}
    val cfg = Dedup.MinHashConfig(numHashes = 128, bands = 64)
    val base = s"/tmp/graft_semphase_${System.nanoTime()}"
    val sketchPath = s"$base/sketches"
    val corpusPath = s"$base/corpus"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (0 until 3).foreach { b =>
      val batch = docs.filter(pmod(col("doc_id"), lit(3)) === b)
      if (b == 0) SketchSidecar.create(spark, sketchPath)
      println(s"== batch $b (sidecar sets rows: ${SketchSidecar.setsCount(spark, sketchPath)})")
      // phase 1: batch signature frame (map-side minhash over batch text)
      t(s"b$b sig") { noop(Dedup.sigFrame(batch, "doc_id", "text", cfg)) }
      // phase 2: batch banded rows
      t(s"b$b banded_batch") {
        noop(Dedup.bandedSigs(Dedup.sigFrame(batch, "doc_id", "text", cfg), cfg))
      }
      // phase 3a: corpus bands via the OLD bulk source (sets-store
      // sig column re-derive + explode) — kept for A/B against 3b
      if (b > 0) t(s"b$b corpusbands_rederive") {
        val sets = new org.apache.hadoop.fs.Path(sketchPath, SketchSidecar.SetsDir)
        noop(Dedup.bandedSigs(
          spark.read.parquet(sets.toString).select(col("id"), col("sig"))
            .filter(col("sig").getItem(0) =!= Long.MaxValue), cfg)
          .select(col("band_hash"), col("id")))
      }
      // phase 3b: corpus bands via the PRE-EXPLODED skinny band store
      // (what the bulk arm reads since round 15)
      if (b > 0) t(s"b$b corpusbands_store") {
        noop(SketchSidecar.corpusBandScan(spark, sketchPath, None))
      }
      // phase 4: candidate join (batch bands vs band store union
      // batch) + distinct — the shape pairsAndSketches builds for a
      // bulk batch
      t(s"b$b candidates") {
        val newBanded = graft.Materialize.once(
          Dedup.bandedSigs(Dedup.sigFrame(batch, "doc_id", "text", cfg), cfg))
        val corpusBands = SketchSidecar.corpusBandScan(spark, sketchPath, None)
        val l = newBanded.select(col("band_hash"), col("id").as("id_new"))
        val rt = corpusBands.withColumn("other_in_corpus", lit(true))
          .select(col("band_hash"), col("id").as("id_other"), col("other_in_corpus"))
          .union(newBanded
            .select(col("band_hash"), col("id").as("id_other"))
            .withColumn("other_in_corpus", lit(false)))
        val cand = l.join(rt, Seq("band_hash"))
          .filter(col("other_in_corpus") || col("id_other") < col("id_new"))
          .select("id_new", "id_other", "other_in_corpus").distinct()
        val n = cand.count()
        println(s"[phase] b$b candidate rows: $n")
      }
      // phase 5: full pair derivation (candidates + sh verify join)
      t(s"b$b pairs_full") {
        noop(SketchSidecar.minhashExactPairsAgainstSidecar(
          batch, sketchPath, "doc_id", "text", cfg, 0.5))
      }
      // the REAL per-batch wall, as the sink runs it
      var admitted: org.apache.spark.sql.DataFrame = null
      var sketches: org.apache.spark.sql.DataFrame = null
      t(s"b$b admit_real") {
        val (a, sk) = SketchSidecar.admitAndSketches(
          batch, sketchPath, "doc_id", "text", cfg, 0.5)
        admitted = graft.Materialize.once(a, eager = true)
        sketches = sk
      }
      t(s"b$b appends") {
        admitted.write.mode(if (b == 0) "overwrite" else "append").parquet(corpusPath)
        SketchSidecar.append(sketches, sketchPath, cfg)
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // decoupling witness: a 100-doc micro-batch against the fully
    // grown sidecar takes the chunked pushed-In probe — its wall must
    // track the batch, not the millions of sketched docs
    val trickle = docs.limit(100)
      .select((col("doc_id") + 10000000000L).as("doc_id"), col("text"))
    t("trickle100 admit") {
      val (a, _) = SketchSidecar.admitAndSketches(
        trickle, sketchPath, "doc_id", "text", cfg, 0.5)
      println(s"[phase] trickle100 admitted: ${a.count()}")
    }
    spark.stop()
  }
}
