package graft.tools

import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch profiler for operator stages (dev tool, not part of the
  * driver contract). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, 32)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.cache().count()

    val sets = docs.select(col("doc_id").as("id"),
      graft.functions.HashFunctions.textShingleHashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)

    time("sets materialize")(sets.write.format("noop").mode("overwrite").save())

    val inv = sets.select(col("id"), size(col("sh")).as("nsh"), explode(col("sh")).as("g"))
    time("inv")(inv.write.format("noop").mode("overwrite").save())

    val freq = inv.groupBy("g").agg(count(lit(1)).as("gdf"))
    time("freq")(freq.write.format("noop").mode("overwrite").save())

    import org.apache.spark.sql.expressions.Window
    val ranked = inv.join(freq, Seq("g"))
      .withColumn("r", row_number().over(Window.partitionBy("id").orderBy(col("gdf"), col("g"))))
      .filter(col("r") <= col("nsh") - ceil(col("nsh") * 0.2) + 1)
      .select("g", "id", "nsh")
    time("ranked prefix")(ranked.write.format("noop").mode("overwrite").save())

    val candidates = ranked.select(col("g"), col("id").as("id_a"), col("nsh").as("n_a"))
      .join(ranked.select(col("g"), col("id").as("id_b"), col("nsh").as("n_b")), Seq("g"))
      .filter(col("id_a") < col("id_b") &&
        col("n_a") >= col("n_b") * 0.2 && col("n_b") >= col("n_a") * 0.2)
      .select("id_a", "id_b").distinct()
    time("candidates")(candidates.write.format("noop").mode("overwrite").save())
    println("candidate count: " + time("count")(candidates.count()))

    val joined = candidates
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
    time("intersect+join")(joined.write.format("noop").mode("overwrite").save())

    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
    time("full op")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
