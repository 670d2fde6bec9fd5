package graft

/** Side-channel for gate-level SCALE metrics that belong in the bench
  * artifact but are not wall seconds — e.g. stream_semantic_ingest's
  * sidecar-to-batch byte ratio, whose documented ~50× crossover to a
  * band-partitioned sidecar layout (BASELINE.md round-11 decision)
  * should be tracked by data in every artifact rather than remembered.
  *
  * Gates `put` during their run; [[Bench]] renders the snapshot into
  * the FULL json line (stderr + bench_full_latest.json) as
  * `"gate_metrics"` — never the tight stdout line, whose 1750-char
  * budget is reserved for per-query seconds. Verify runs ignore it. */
object GateMetrics {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Double]]()

  def put(gate: String, metric: String, value: Double): Unit = {
    m.compute(gate, (_, prev) =>
      (if (prev == null) Map.empty[String, Double] else prev) + (metric -> value))
    ()
  }

  def snapshot: Map[String, Map[String, Double]] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toMap
  }

  def clear(): Unit = m.clear()
}
