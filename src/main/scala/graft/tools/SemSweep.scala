package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object SemSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(1500)
      val emb = emb0.cache(); val n = emb.count()
      for (th <- Seq(0.3, 0.35)) {
        val exact = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
          threshold = th, signBits = 0).select("id_a", "id_b").cache()
        val total = exact.count()
        for (k <- Seq(4, 8, 16); np <- Seq(1, 2)) {
          val cl = Dedup.semanticDedupPairs(emb, "vec_id", "embedding",
            threshold = th, numClusters = k, kmeansIters = 3, nprobe = np)
            .select("id_a", "id_b")
          val hits = exact.join(cl, Seq("id_a", "id_b"), "left_semi").count()
          println(f"SWEEP dir=$dir n=$n th=$th k=$k nprobe=$np total=$total hits=$hits recall=${if (total>0) hits.toDouble/total else 1.0}%.3f")
        }
        exact.unpersist()
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
