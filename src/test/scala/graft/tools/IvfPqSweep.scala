package graft.tools

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off recall sweep for choosing the ann_ivfpq gate configs:
  * prints recall@10 vs brute for the in-memory composition and the
  * persisted index across (nprobe, rerankFactor). */
object IvfPqSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("id").as("neighbor_id")).cache()
    val total = brute.count()
    val model = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 32,
      seed = 42L, iters = 10)
    val nps = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(8, 12, 13, 14))
    for (np <- nps; rf <- Seq(8, 16)) {
      val ivfpq = Pq.ivfPqTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10, model,
        numCentroids = 16, nprobe = np, rerankFactor = rf)
        .select(col("query_id"), col("id").as("neighbor_id"))
      val hits = brute.join(ivfpq, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[sweep] $dir ivfPqTopK nprobe=$np rerank=$rf recall=${hits.toDouble / total}%.3f")
    }
    val path = s"/tmp/graft_ivfpq_sweep_${math.abs(dir.hashCode)}"
    Pq.buildIvfPqIndex(emb, "vec_id", "embedding", path,
      numCentroids = 16, m = 16, k = 32, seed = 42L, kmeansIters = 2)
    for (np <- nps; rf <- Seq(8, 16)) {
      val idx = Pq.queryIvfPqIndex(spark, path, queries,
        "vec_id", "embedding", k = 10, nprobe = np,
        rerankWith = Some((emb, "vec_id", "embedding")), rerankFactor = rf)
        .select(col("query_id"), col("id").as("neighbor_id"))
      val hits = brute.join(idx, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[sweep] $dir queryIvfPqIndex nprobe=$np rerank=$rf recall=${hits.toDouble / total}%.3f")
    }
    spark.stop()
  }
}
