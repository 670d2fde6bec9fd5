package graft.tools

/** One-off measurement harness (optimization round 17): phase-level
  * wall timings of the persisted-index ANN gates — build / append /
  * compact / probe / recall — so optimization targets the real phase
  * instead of the gate total. Run via test:runMain (kept out of the
  * main jar; measurement only, never part of any artifact). */
object AnnPhases {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.operators.{Similarity, Pq}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // warmup
    graft.SparkEntry.queries("q1_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queriesDf = emb.filter(col("vec_id") < 5)

    for (rd <- 1 to 2) {
      println(s"== round $rd ==")
      val brute = t("brute force + materialize") {
        val b = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          queriesDf, "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("rank").cast("long").as("rank"),
            col("id").as("neighbor_id"), round(col("cosine"), 4).as("cosine"))
        graft.Materialize.once(b, eager = true)
      }
      val path = s"/tmp/graft_annphase_$rd"
      t("buildIvfIndex (half corpus)") {
        Similarity.buildIvfIndex(emb.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", path, numCentroids = 16, seed = 42L, kmeansIters = 2)
      }
      t("appendToIvfIndex (other half)") {
        Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 2 =!= 0),
          "vec_id", "embedding", path)
      }
      val ivf = t("queryIvfIndex") {
        Similarity.queryIvfIndex(spark, path, queriesDf,
          "vec_id", "embedding", k = 10, nprobe = 8)
          .select(col("query_id"), col("id").as("neighbor_id"))
      }
      t("recall joins (2 counts)") {
        val hits = brute.join(ivf, Seq("query_id", "neighbor_id"), "left_semi").count()
        val recall = hits.toDouble / brute.count()
        require(recall >= 0.5, s"recall $recall")
      }
      t("final orderBy noop") {
        brute.orderBy("query_id", "rank")
          .write.format("noop").mode("overwrite").save()
      }
      // pq flavor
      val pqPath = s"/tmp/graft_annphase_pq_$rd"
      t("buildIvfPqIndex (full)") {
        Pq.buildIvfPqIndex(emb, "vec_id", "embedding", pqPath,
          numCentroids = 16, m = 16, k = 32, seed = 42L, kmeansIters = 2)
      }
      t("queryIvfPqIndex + rerank") {
        Pq.queryIvfPqIndex(spark, pqPath, queriesDf, "vec_id", "embedding",
          k = 10, rerankWith = Some((emb, "vec_id", "embedding")))
          .write.format("noop").mode("overwrite").save()
      }
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
      new Directory(new java.io.File(pqPath)).deleteRecursively()
    }
    spark.stop()
  }
}
