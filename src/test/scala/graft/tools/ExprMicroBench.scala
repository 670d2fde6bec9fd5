package graft.tools

import org.apache.spark.sql.functions._

/** Micro-bench for the round-12 codegen conversion: times JUST the
  * expression evaluation (sum(size(...)) — no explode, no shuffle) and
  * the gate-shaped posexplode consumption, per expression, on the
  * documents table of the given sf dir. Used to attribute the
  * text_repeated_spans before/after delta to the expression vs the
  * surrounding plan. */
object ExprMicroBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = graft.GraftSession.local(
      threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    import graft.functions.HashFunctions._

    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    time("posShingle sum(size) [eval only]") {
      docs.select(sum(size(positionalShingleHashes(col("text"), 50))).as("s"))
        .collect()
    }
    time("posShingle posexplode count [gate shape]") {
      docs.select(col("doc_id"),
          posexplode(positionalShingleHashes(col("text"), 50)))
        .write.format("noop").mode("overwrite").save()
    }
    time("textShingle sum(size) [eval only]") {
      docs.select(sum(size(textShingleHashes(col("text"), 5))).as("s"))
        .collect()
    }
    time("minhash sum(size) [eval only]") {
      docs.select(sum(size(minhashFromText(col("text"), 5, 128, 42L))).as("s"))
        .collect()
    }
    spark.stop()
  }
}
