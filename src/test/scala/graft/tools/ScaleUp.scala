package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale factor from an existing testdata dir by
  * key-offset replication, for SCALING BENCHMARKS only (correctness
  * gates keep using the driver-generated data untouched).
  *
  *   Test/runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1.0 10
  *
  * Design choices that keep the workload's CHARACTER at the new scale
  * instead of planting artifacts:
  *   - fact tables (orders/lineitem/customer/events/documents/
  *     embeddings) get per-replica key offsets of (max key + 1), so
  *     join relationships hold and keys stay globally unique;
  *   - dimensions (region/nation/part/supplier) are copied as-is —
  *     lineitem part/supp keys still resolve;
  *   - document TEXT in replica i>0 suffixes every word with `_ri`:
  *     replicas share no shingles with the original corpus, so the
  *     near-duplicate pair structure scales LINEARLY (naive copies
  *     would make every doc a 10-clique of near-dups — quadratic
  *     candidate blowup the real generator would never produce);
  *   - embeddings get deterministic per-element jitter (±0.3, xxhash64
  *     of (vec_id, index, replica)) — replica vectors land ~cos 0.6
  *     from their source, far below near-dup thresholds, while the
  *     intra-replica neighbor structure stays realistic.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession.local(
      threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt,
      shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def rd(t: String): DataFrame = spark.read.parquet(s"$in/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // dimensions: verbatim copies
    Seq("region", "nation", "part", "supplier").foreach(t => wr(rd(t), t))

    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    def replicate(df: DataFrame, shifts: Map[String, Long],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (k, o)) =>
          d.withColumn(k, col(k) + lit(o * i)) }
        extra(shifted, i)
      }.reduce(_ unionAll _)

    val orders = rd("orders"); val lineitem = rd("lineitem")
    val customer = rd("customer"); val events = rd("events")
    val documents = rd("documents"); val embeddings = rd("embeddings")

    val oOrd = off(orders, "o_orderkey")
    val oCust = off(customer, "c_custkey")
    wr(replicate(customer, Map("c_custkey" -> oCust)), "customer")
    wr(replicate(orders, Map("o_orderkey" -> oOrd, "o_custkey" -> oCust)), "orders")
    wr(replicate(lineitem, Map("l_orderkey" -> oOrd)), "lineitem")

    val oEv = off(events, "event_id")
    val oUser = off(events, "user_id")
    wr(replicate(events, Map("event_id" -> oEv, "user_id" -> oUser)), "events")

    val oDoc = off(documents, "doc_id")
    wr(replicate(documents, Map("doc_id" -> oDoc), (d, i) =>
      if (i == 0) d
      else d
        .withColumn("text", expr(
          s"concat_ws(' ', transform(split(text, ' '), w -> concat(w, '_r$i')))"))
        .withColumn("n_chars", length(col("text")).cast("long"))), "documents")

    val oVec = off(embeddings, "vec_id")
    wr(replicate(embeddings, Map("vec_id" -> oVec), (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding", expr(
        s"""transform(embedding, (x, j) -> CAST(x +
           |  (CAST(((xxhash64(vec_id, j, $i) % 1001) + 1001) % 1001 AS DOUBLE)
           |   / 1000.0 - 0.5) * 0.6 AS FLOAT))""".stripMargin))), "embeddings")

    println(s"[scaleup] wrote $out at ${factor}x of $in")
    spark.stop()
  }
}
