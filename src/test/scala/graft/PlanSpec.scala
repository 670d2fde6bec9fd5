package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that make queries
  * scale (pushdown, pruning, broadcast, partial aggregation) asserted on
  * the actual optimized plans, so a refactor can't silently trade them
  * away. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q2_filter: predicates push to the parquet scan; projection prunes columns") {
    val p = planOf("q2_filter")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "range filter not pushed")
    assert(p.contains("LessThan(l_quantity,24.0)"), "quantity filter not pushed")
    // scan must NOT read the full 11-column lineitem schema
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_partkey"), "column pruning failed")
  }

  test("q16_join_agg: dimension joins broadcast; aggregation is two-phase") {
    val p = planOf("q16_join_agg")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
    assert(!p.contains("CartesianProduct"))
    // partial + final HashAggregate pair = map-side combine
    assert("HashAggregate".r.findAllIn(p).length >= 2, "no partial aggregation")
  }

  test("q1_agg: scan reads only the aggregated columns") {
    val p = planOf("q1_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_partkey"))
  }

  test("q4_topk plans as TakeOrderedAndProject (no global sort of the table)") {
    val p = planOf("q4_topk")
    assert(p.contains("TakeOrderedAndProject"), s"got:\n$p")
  }

  test("t1_drop/t3_replace stay whole-stage-codegen narrow plans (no exchange before sort)") {
    val p = planOf("t3_replace_null")
    // exactly one exchange: the final orderBy's range partitioning
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"unexpected shuffles:\n$p")
    assert(p.contains("WholeStageCodegen") || p.contains("Scan parquet"))
  }

  test("ann_brute_topk: corpus side is not shuffled before scoring (queries broadcast)") {
    val p = planOf("ann_brute_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"queries not broadcast:\n$p")
  }

  test("t6_row_index: no Row round-trip, no prefix join — literal lookup over the pinned sort") {
    val p = planOf("t6_row_index")
    // The zipWithIndex formulation round-tripped through df.rdd (Row
    // serialization, its ExistingRDD scan showed no provenance). The
    // current formulation's only ExistingRDD scans must be the
    // partition-space-pinning localCheckpoint — anything else means the
    // Row round-trip came back.
    val rddScans = p.linesIterator.filter(_.contains("ExistingRDD,")).toSeq
    assert(rddScans.forall(_.contains("localCheckpoint")),
      s"non-checkpoint RDD scan in row-index plan:\n$p")
    // prefix offsets are a driver-collected array literal, not a join:
    // the output pass must be join-free and exchange-free (the sort's
    // exchange happened before the pin)
    assert(!p.contains("Join"), s"prefix offsets should not join:\n$p")
    assert(!p.contains("+- Exchange"), s"output pass should be narrow:\n$p")
    // the gate upstream ends in orderBy (a Sort) — NOT rescan-safe, so
    // the partition-space pin must be present
    assert(p.contains("localCheckpoint"), s"sorted upstream must stay pinned:\n$p")
  }

  test("row index: wide upstream keeps the pin, bare/cached scans skip it") {
    import org.apache.spark.sql.functions._
    val scan = spark.read.parquet(s"$dir/orders.parquet")
    assert(graft.operators.AddRowIndex.rescanSafe(
      scan.select(col("o_orderkey")).filter(col("o_orderkey") > 10).queryExecution.optimizedPlan,
      localMaster = true))
    // a shuffle (aggregate) means AQE can re-coalesce: NOT rescan-safe
    val wide = scan.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(!graft.operators.AddRowIndex.rescanSafe(wide.queryExecution.optimizedPlan, localMaster = true))
    val p = graft.operators.AddRowIndex.withRowIndex(wide, "Row Number", 1L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("localCheckpoint"), s"wide upstream must pin:\n$p")
    // nondeterministic projection is pinned too
    assert(!graft.operators.AddRowIndex.rescanSafe(
      scan.select(rand().as("r")).queryExecution.optimizedPlan, localMaster = true))
    // the pin-skipping path: no checkpoint in the plan, still contiguous
    val idx = graft.operators.AddRowIndex.withRowIndex(scan.select("o_orderkey"), "rn", 1L)
    val pIdx = idx.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!pIdx.contains("localCheckpoint"), s"bare scan should not pin:\n$pIdx")
    import spark.implicits._
    val rns = idx.select("rn").as[Long].collect().sorted
    assert(rns.toSeq == (1L to rns.length).toSeq, "non-contiguous row index")
  }

  test("scd2Apply: open-set joins broadcast the changes side — history never shuffles") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // history = the live corpus (large); changes = a batch delta (small).
    // Every join that touches history (watermark semi-join, close join)
    // must build its hash side from the CHANGES-derived frame, or the
    // whole corpus shuffles per batch.
    val hist = spark.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey".as("k"), $"o_orderstatus".as("name"),
        $"o_orderkey".cast("long").as("valid_from"),
        lit(null).cast("long").as("valid_to"))
    val ch = Seq((1L, "x", 99999L, false), (2L, "y", 99999L, true))
      .toDF("k", "name", "v", "is_deleted")
    val p = graft.operators.Merge.scd2Apply(hist, ch, Seq("k"), "v")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"watermark semi-join and close join must both broadcast:\n$p")
    // the history side must never hash-shuffle: the only exchanges
    // allowed are broadcasts and the window shuffle over the small
    // changes frame (hashpartitioning on the key of a frame whose
    // source is the local changes relation)
    assert(!p.contains("SortMergeJoin"),
      s"history side shuffled into a sort-merge join:\n$p")
  }

  test("mm_resize: narrow plan — no shuffle anywhere in the decode stage") {
    val p = planOf("mm_resize")
    // decode/re-encode is the canonical narrow transform. FormattedMode
    // renders partitioning only in the details ("Arguments:
    // hashpartitioning(...)"), so grep that — the ONLY Exchange allowed
    // is the final orderBy's range partitioning
    assert(!p.contains("hashpartitioning"),
      s"unexpected hash shuffle in the decode stage:\n$p")
    assert("\\+- Exchange ".r.findAllIn(p).length == 1,
      s"expected only the orderBy exchange:\n$p")
  }

  test("text_vocab: two-phase count, top-k never globally sorts") {
    val p = planOf("text_vocab")
    // map-side combine: the exchange carries vocab cardinality, not
    // corpus token cardinality
    assert("HashAggregate".r.findAllIn(p).length >= 2, "no partial aggregation")
    assert(p.contains("TakeOrderedAndProject"), "top-k fell back to a global sort")
  }

  test("text_chunk: words tree evaluated once, no shuffle before the sort") {
    val p = planOf("text_chunk")
    // chunking must ride the native one-pass expression — a composed
    // transform/slice formulation re-runs the split+filter words tree
    // per chunk once CollapseProject inlines it into the lambda (the
    // O(n²/stride) trap chunkDocuments documents)
    assert(p.toLowerCase.contains("wordchunks"), s"native WordChunks missing:\n$p")
    assert(!p.contains("split("), s"composed words tree crept back in:\n$p")
    // narrow until the final presentation sort: generate, no exchange
    assert(p.contains("Generate"), "chunk explode missing")
    assert("Exchange".r.findAllIn(p).length <= 2, "unexpected extra shuffle")
  }

  test("nextFitPackExact: exactly one shuffle (by shard), non-global sort") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"s${i % 4}", 100L)).toDF("id", "shard", "toks")
    val out = graft.operators.Sampling.nextFitPackExact(df, "toks", "id", 1000L, "shard")
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // FormattedMode: tree lists "Exchange (n)", partitioning is in the
    // details ("Arguments: hashpartitioning(...)")
    assert("\\+- Exchange ".r.findAllIn(p).length == 1,
      s"expected exactly one shard shuffle:\n$p")
    assert(p.contains("hashpartitioning(shard"), s"shuffle not keyed by shard:\n$p")
    // the Sort node must be partition-local (external, spilling) — a
    // global sort would add a range-partitioning exchange
    assert(!p.contains("rangepartitioning"), s"global sort crept in:\n$p")
  }

  test("bm25TopK: the corpus posting frame never shuffles on term — every term exchange is query-sized") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val qs = Seq((1L, "table scan"), (2L, "window merge")).toDF("qid", "q")
    val out = graft.operators.TextAnalysis.bm25TopK(
      docs, "doc_id", "text", qs, "qid", "q", 10)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the query term set must broadcast into the posting scan (the
    // map-side semi-filter BEFORE any aggregate) — every join in this
    // plan is broadcast, nothing corpus-sized sort-merges
    assert(p.contains("BroadcastHashJoin"), s"query-term broadcast missing:\n$p")
    assert(!p.contains("SortMergeJoin"), s"a corpus-sized join crept in:\n$p")
    // the tf aggregate runs inside Materialize.once at call time (the
    // plan here consumes its checkpoint); what remains downstream must
    // key only on query-sized attributes: the per-(query, doc) sum …
    assert(p.contains("hashpartitioning(query_id"),
      s"per-(query, doc) partial sum missing:\n$p")
    // … and any term-keyed exchange is the tiny query-side distinct —
    // whose subtree is a LocalTableScan, never the corpus checkpoint
    val termEx = "hashpartitioning\\(term".r.findAllIn(p).length
    assert(termEx <= 2, s"unexpected term-keyed exchanges ($termEx):\n$p")
    assert(p.contains("LocalTableScan"), s"query side should be a local relation:\n$p")
    // partial aggregation everywhere that aggregates (map-side combine)
    assert("HashAggregate".r.findAllIn(p).length >= 4, "no partial aggregation")
  }

  test("mixToWeights default path: map-side filter only — zero exchanges before the caller's action") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "src")
    val out = graft.operators.Sampling.mixToWeights(df, "id", "src",
      Map("a" -> 1.0, "b" -> 1.0))
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the plan the caller composes on is filter + explode(1) + project —
    // the count job already ran at call time; NOTHING here shuffles
    assert(!p.contains("Exchange"), s"mixToWeights output plan must be narrow:\n$p")
  }

  test("tokenBudgetSample sharded: single shard exchange, window is not a global sort") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"s${i % 4}", 10L)).toDF("id", "shard", "toks")
    val out = graft.operators.Sampling.tokenBudgetSample(df, "id", "toks", 100L, Some("shard"))
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("hashpartitioning(shard"), s"window not partitioned by shard:\n$p")
    assert(!p.contains("SinglePartition"), s"sharded form must not funnel to one task:\n$p")
  }

  test("tokenBudgetSample global: no single-partition window — boundary cumsum keyed by pid") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // budget straddles mid-corpus so the boundary-partition branch (the
    // only windowed one) is IN the plan being asserted
    val df = (0L until 400L).map(i => (i, 10L)).toDF("id", "toks")
    val out = graft.operators.Sampling.tokenBudgetSample(df, "id", "toks", 2000L)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("Window"), s"boundary branch must be present:\n$p")
    assert(!p.contains("SinglePartition"),
      s"global token budget must never funnel the corpus through one task:\n$p")
    assert(p.contains("hashpartitioning(__pid"),
      s"boundary cumsum must be keyed by the stamped partition id:\n$p")
    // the selection-order bucket is a row-value md5-prefix function, NOT
    // a range exchange — RangePartitioner's reservoir seed folds in
    // rdd.id, so two jobs over a live range exchange can disagree on
    // bounds; a range partitioning in this plan would reintroduce that
    assert(!p.toLowerCase.contains("rangepartitioning"),
      s"global token budget must not depend on a range exchange:\n$p")
  }

  test("nextFitPack global: windows keyed by pid, no single-partition exchange") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, 100L)).toDF("id", "toks")
    val out = graft.operators.Sampling.nextFitPack(df, "toks", "id", 2048L)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("SinglePartition"),
      s"global packing must never funnel the corpus through one task:\n$p")
    assert(p.contains("hashpartitioning(__pid"),
      s"per-partition cumsum must be keyed by the stamped partition id:\n$p")
  }

  test("quantileBuckets approx path: mergeable sketch aggregate, thresholds broadcast back") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"g${i % 3}", (i % 97).toDouble)).toDF("id", "g", "score")
    val out = graft.operators.Curation.quantileBuckets(df, "g", "score")
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // percentile_approx is a typed-imperative aggregate → ObjectHashAggregate,
    // and it MUST run partial-then-final (two nodes) so a 100 TB group
    // folds map-side instead of shipping raw values
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"approx percentile must be a two-phase object aggregate:\n$p")
    assert(p.contains("BroadcastExchange"), s"thresholds must broadcast back:\n$p")
    // round-17 (verdict item 4): the operator itself adds NO sort-merge
    // join — text_ccnet_buckets' 2 SMJs are bigramLmScore's inherited
    // doc_id resurrection join appearing once per consumer of the
    // un-snapshotted scored frame, not a tercile join gone sort-merge
    assert(!p.contains("SortMergeJoin"),
      s"quantileBuckets must not sort-merge anything on a plain input:\n$p")
  }

  test("semanticDedupPairsByCluster: pure lazy plan — no count job, no fit, cluster-keyed self-join only") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (0L until 100L).map(i =>
      (i, Array.tabulate(4)(d => (i * 4 + d).toFloat), s"c${i % 5}"))
      .toDF("id", "vec", "cell")
    val out = graft.operators.Dedup.semanticDedupPairsByCluster(
      df, "id", "vec", "cell", threshold = 0.9, saltBuckets = 1)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // with salt pinned to 1 there is no occupancy probe; the join keys
    // on the cluster column and nothing else corpus-sized moves
    assert(p.contains("cluster"), s"cluster key missing from plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept into the cell join:\n$p")
  }

  test("stripRepeatedWindows: corpus splits on broadcast anti/semi — no corpus sort-merge") {
    // the round-16 rebuild shape: untouched docs pass through a
    // broadcast ANTI join, touched docs are pruned by a broadcast SEMI
    // before the spans join — the corpus text never enters a sort-merge
    // join (the old single left-join sort-merged the whole corpus at
    // sf100 once the spans frame stopped broadcasting)
    val p = planOf("text_strip_repeated")
    assert(p.contains("BroadcastHashJoin LeftAnti"),
      s"untouched docs must pass through a broadcast anti join:\n$p")
    assert(p.contains("BroadcastHashJoin LeftSemi"),
      s"touched docs must be pruned by a broadcast semi join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus text must never sort-merge in the strip plan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }
}
