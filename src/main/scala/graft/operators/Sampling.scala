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

  /** Deterministic percentage bucket 0..99 from an id column. Plain
    * integer arithmetic (Weyl-style multiplicative striping) so the same
    * expression is reproducible in any engine; swap for
    * `pmod(xxhash64(id), 100)` when cross-engine parity isn't needed.
    * The inner pmod bounds the multiplicand so hash-scale ids (|id| up to
    * 2^63) cannot overflow under ANSI mode: 1e8 × 48271 ≪ Long.Max. */
  def pctBucket(id: Column): Column =
    pmod(pmod(id, lit(100000007L)) * 48271L, lit(100L))

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

  /** Sequential budget packing: stream documents in `orderCol` order;
    * `pack_id` = how many whole budgets the running token total has
    * filled — i.e. contiguous runs of documents whose cumulative count
    * spans one `budget`. A deterministic, single-window approximation of
    * bin packing (true first-fit-decreasing is inherently sequential and
    * not worth distributing).
    *
    * Scale note: the running sum is a single ordered window — one range
    * shuffle. For 100 TB, pack within partitions (partitionBy a shard
    * key) to keep the window distributed; global packing of a corpus
    * that size is not meaningful anyway. */
  def nextFitPack(df: DataFrame, countCol: String, orderCol: String,
      budget: Long, shardCol: Option[String] = None): DataFrame = {
    val w = shardCol.map(s => Window.partitionBy(s)).getOrElse(Window.partitionBy())
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(countCol)).over(w))
      .withColumn("pack_id", ceil(col("__cum") / lit(budget.toDouble)).cast("long") - 1)
      .drop("__cum")
  }
}
