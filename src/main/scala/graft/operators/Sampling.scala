package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-splitting and sequence-packing operators for training-data
  * pipelines.
  *
  * Splits must be DETERMINISTIC (reproducible across runs/clusters) and,
  * for near-duplicate corpora, LEAKAGE-SAFE: two near-duplicate documents
  * must land in the same split or the eval set is contaminated.
  */
object Sampling {

  /** Deterministic percentage bucket 0..99 from an id column, via md5 of
    * the id's decimal string — engine-portable (md5 is identical
    * everywhere) and structure-free: pure modular arithmetic like
    * `(id*k) % 100` collapses to a permutation of `id % 100`, which
    * degenerates on block-allocated id schemes (all multiples of 100 →
    * one bucket → empty eval split). Three hex chars give 16^3 = 4096
    * uniform states folded to 0..99. */
  def pctBucket(id: Column): Column = {
    val hex = md5(id.cast("string"))
    pmod(
      ascii(substring(hex, 1, 1)) * 10007 +
        ascii(substring(hex, 2, 1)) * 131 +
        ascii(substring(hex, 3, 1)),
      lit(100)).cast("long")
  }

  /** Deterministic train/eval split: train = bucket < trainPct. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame =
    df.withColumn("split",
      when(pctBucket(col(idCol)) < trainPct, "train").otherwise("eval"))

  /** Leakage-safe split: members of a near-duplicate group (edges from
    * e.g. [[Dedup.minhashPairs]]) follow their group representative.
    *
    * Group id = minimum id reachable over the edge set, computed by
    * iterative min-propagation (`rounds` supersteps of join+min — each a
    * key-partitioned shuffle; rounds=3 closes chains of length 2^3).
    * Exact connected components needs iteration to fixpoint; near-dup
    * clusters are overwhelmingly tiny cliques, so a small constant rounds
    * is the right scale trade. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int, rounds: Int = 3): DataFrame = {
    val edges = pairs.select(col("id_a"), col("id_b"))
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    var rep = df.select(col(idCol).as("id")).distinct()
      .withColumn("rep", col("id"))
    var i = 0
    while (i < rounds) {
      // superstep 1: take the min over neighbors' representatives (1 hop)
      val viaNeighbor = edges
        .join(rep.select(col("id").as("id_b"), col("rep").as("nrep")), Seq("id_b"))
        .groupBy(col("id_a").as("id")).agg(min("nrep").as("nrep"))
      val hopped = rep.join(viaNeighbor, Seq("id"), "left")
        .select(col("id"), least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
      // superstep 2: pointer jumping — rep(v) := rep(rep(v)), which
      // doubles the closed chain length per round (so `rounds` rounds
      // close chains of length ~2^rounds, as documented)
      rep = hopped.alias("h")
        .join(hopped.select(col("id").as("rid"), col("rep").as("rrep")), col("rep") === col("rid"), "left")
        .select(col("id"), least(col("rep"), coalesce(col("rrep"), col("rep"))).as("rep"))
        // cut lineage each round: without this the plan doubles per
        // iteration and optimizer time dominates (standard iterative-
        // algorithm checkpointing; swap for checkpoint() on a real
        // cluster with a reliable checkpoint dir)
        .localCheckpoint()
      i += 1
    }
    df.join(rep.withColumnRenamed("id", idCol), Seq(idCol))
      .withColumn("split",
        when(pctBucket(col("rep")) < trainPct, "train").otherwise("eval"))
      .drop("rep")
  }

  /** Cumulative budget packing: stream documents in `orderCol` order;
    * `pack_id` = whole budgets the running token total has filled.
    * APPROXIMATION: a document straddling a budget boundary lets the next
    * pack accumulate up to ~2× budget — use [[nextFitPackExact]] when the
    * budget is a hard ceiling. The upside is a pure windowed expression
    * (SQL-expressible, oracle-checkable).
    *
    * Scale note: pass `shardCol` on large frames — without it the ordered
    * window has no partitioning and Spark moves ALL rows through one task
    * (global sequential packing is inherently so; shards are the parallel
    * unit). */
  def nextFitPack(df: DataFrame, countCol: String, orderCol: String,
      budget: Long, shardCol: Option[String] = None): DataFrame = {
    val w = shardCol.map(s => Window.partitionBy(s)).getOrElse(Window.partitionBy())
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(countCol)).over(w))
      .withColumn("pack_id", ceil(col("__cum") / lit(budget.toDouble)).cast("long") - 1)
      .drop("__cum")
  }

  /** TRUE next-fit packing: a new pack opens exactly when adding the next
    * document would exceed `budget`, so no pack exceeds it (oversized
    * single documents get a pack of their own). Sequential within each
    * shard via sorted per-group iteration — shards are the parallelism
    * unit, matching how context-window packing is sharded in practice. */
  def nextFitPackExact(df: DataFrame, countCol: String, orderCol: String,
      budget: Long, shardCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val rows = df.select(col(shardCol).cast("string").as("shard"),
      col(orderCol).cast("long").as("ord"), col(countCol).cast("long").as("cnt"))
      .as[(String, Long, Long)]
    rows.groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val sorted = it.toSeq.sortBy(_._2)
        var pack = 0L
        var used = 0L
        sorted.iterator.map { case (_, ord, cnt) =>
          if (used > 0L && used + cnt > budget) { pack += 1; used = 0L }
          used += cnt
          (shard, ord, cnt, pack)
        }
      }
      .toDF(shardCol, orderCol, countCol, "pack_id")
  }
}
