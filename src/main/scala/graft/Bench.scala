package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Timing forces FULL materialization through the noop sink (count()
  * would let Catalyst prune the projected columns away and under-report
  * per-row compute).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", "32")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup so the first measured query isn't charged for it
    SparkEntry.queries("q1_agg")(spark, sfDir).write.format("noop")
      .mode("overwrite").save()

    // single-shot numbers on shared sandboxes carry large variance
    // (observed ±20 s across one full run); SPARK_GRAFT_REPEAT=N>1
    // reports the per-query MEDIAN of the successful runs. A query is
    // failed only when a MAJORITY of its runs threw — repeats exist to
    // smooth environmental flakes, so one transient error must not
    // discard N-1 valid timings (while a deterministic bug still fails
    // every run and lands in failed:[]).
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT")
      .map(s => s.trim.toIntOption.getOrElse(
        sys.error(s"SPARK_GRAFT_REPEAT must be an integer, got '$s'")))
      .getOrElse(1).max(1)
    // SPARK_GRAFT_ONLY=q1_agg,t6_row_index — run a subset while
    // iterating locally; the driver never sets it (full run). Unknown
    // names are a hard error — a typo must not silently bench nothing.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          // a failed run records -1 — a fast failure must not masquerade
          // as a fast pass in BENCH_r* diffs
          -1.0
        }
      }
      val good = times.filter(_ >= 0)
      val ok = good.length * 2 > times.length
      val t = if (!ok) -1.0 else good.sorted.apply(good.length / 2)
      (name, t, ok, times.length - good.length)
    }
    val (full, out) = render(results, sfDir)
    System.err.println(full)
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_full_latest.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // best-effort; stdout line is canonical
    println(out)
    spark.stop()
  }

  /** Render (full, stdout) JSON lines from per-query results
    * `(name, medianSec, ok, failedRuns)`.
    *
    * The harness that records the bench keeps only the last ~2000
    * characters of stdout (observed: BENCH_r04/r05 both carried a
    * 2000-char tail whose head cut into the middle of the JSON line →
    * `parsed:null`). The canonical stdout line must therefore fit well
    * under that cap, leaving room for the ~80-char sbt "[success] ..."
    * trailer that follows it. When the full per-query map is too long,
    * the stdout line sheds the FASTEST queries first (they are
    * noise-dominated at sf0.1 anyway) and records
    * `queries_omitted`/`omitted_sec` so the total stays reconstructible;
    * the complete map always goes to stderr and bench_full_latest.json. */
  private[graft] def render(results: Seq[(String, Double, Boolean, Int)],
      sfDir: String, budget: Int = 1750): (String, String) = {
    val failedNames = results.collect { case (k, _, false, _) => k }
    // the failed list cannot be shed like the queries map, so a
    // mass-failure run (the run whose record matters most) must not blow
    // the stdout line through the tail cap on failure names alone: cap
    // the listed names and carry the true total alongside
    val FailedCap = 16
    val failed = failedNames.take(FailedCap).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val failedTotal =
      if (failedNames.length > FailedCap) s""","failed_total":${failedNames.length}"""
      else ""
    // A query that failed a MINORITY of its repeats still reports a
    // median pass — surface it here so an intermittent in-query gate
    // failure (e.g. a flaky recall require) is recorded in the BENCH_r*
    // JSON, not just a stderr line. Format: name → failed runs.
    val flakyEntries = results.collect { case (k, _, true, nf) if nf > 0 =>
      "\"" + k + "\":" + nf }
    val flaky = flakyEntries.take(FailedCap).mkString("{", ",", "}")
    // mirror failed_total: when the flaky map is truncated, the true
    // count must survive in the canonical stdout record
    val flakyTotal =
      if (flakyEntries.length > FailedCap) s""","flaky_total":${flakyEntries.length}"""
      else ""
    val total = results.collect { case (_, v, true, _) => v }.sum

    // Locale.ROOT: an f"%.3f" interpolation follows the JVM default
    // locale, and a comma-decimal locale would print 1,235 — invalid
    // JSON, resurrecting the parsed:null failure this line exists to fix
    def fmt(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def line(entries: Seq[(String, Double)], extra: String): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failed$failedTotal,"flaky":$flaky$flakyTotal$extra,"sf":"$sfDir"}"""
    }

    val all = results.map { case (k, v, _, _) => (k, v) }
    val full = line(all, "")
    val out =
      if (full.length <= budget) full
      else {
        val byTime = all.sortBy { case (_, v) => -v }
        // linear prefix scan is fine at n≈90
        var keep = byTime
        var dropped = 0
        var droppedSec = 0.0
        while (keep.nonEmpty && {
          val extra = s""","queries_omitted":$dropped,"omitted_sec":${fmt(droppedSec)}"""
          line(keep.sortBy(_._1), extra).length > budget
        }) {
          val (_, v) = keep.last
          if (v > 0) droppedSec += v
          dropped += 1
          keep = keep.init
        }
        val extra = s""","queries_omitted":$dropped,"omitted_sec":${fmt(droppedSec)}"""
        line(keep.sortBy(_._1), extra)
      }
    (full, out)
  }
}
