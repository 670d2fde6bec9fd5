package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off recall sweep for choosing the ann_ivf_topk gate config:
  * prints recall@10 vs brute for (bits, probeHamming) combinations. */
object IvfSweep {
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
    for (bits <- Seq(3, 4, 5, 6); ph <- Seq(1, 2)) {
      val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10, bits = bits, probeHamming = ph)
        .select(col("query_id"), col("id").as("neighbor_id"))
      val hits = brute.join(ivf, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[sweep] $dir bits=$bits probe=$ph recall=${hits.toDouble / total}%.3f")
    }
    for (nc <- Seq(16, 32, 64); np <- Seq(2, 4, 8)) {
      val ivf = Similarity.ivfCentroidTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10, numCentroids = nc, nprobe = np)
        .select(col("query_id"), col("id").as("neighbor_id"))
      val hits = brute.join(ivf, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[sweep] $dir centroids=$nc nprobe=$np recall=${hits.toDouble / total}%.3f")
    }
    spark.stop()
  }
}
