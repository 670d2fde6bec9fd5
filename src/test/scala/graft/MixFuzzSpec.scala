package graft

import graft.operators.Sampling
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the data-mixing sampler: over random corpora and
  * random weight maps, the realized mixture must hit its targets
  * within binomial noise, the binding source must keep everything,
  * replication must be exactly the full-pass/fractional-pass shape the
  * rate demands, and everything must be run-to-run deterministic.
  * Scenarios are generated from a fixed-seed splitmix so the spec is
  * reproducible; each scenario is one Spark job per path.
  */
class MixFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def scenarios(n: Int): Seq[(Map[String, Int], Map[String, Double])] = {
    var s = 42L
    def next(lo: Int, hi: Int): Int = { s = splitmix(s); (Math.floorMod(s, hi - lo + 1) + lo) }
    (1 to n).map { _ =>
      val nSrc = next(2, 4)
      val names = (0 until nSrc).map(i => s"src$i")
      val counts = names.map(_ -> next(50, 400)).toMap
      val weights = names.map(_ -> (next(1, 50) / 10.0)).toMap
      (counts, weights)
    }
  }

  private def corpus(counts: Map[String, Int]) = {
    var id = 0L
    counts.toSeq.sortBy(_._1).flatMap { case (src, n) =>
      (0 until n).map { _ => id += 1; (id, src) }
    }.toDF("id", "src")
  }

  test("downsample-only: binding source keeps all, others within binomial noise of w*T") {
    scenarios(8).foreach { case (counts, weights) =>
      val df = corpus(counts)
      val out = Sampling.mixToWeights(df, "id", "src", weights)
        .select("id", "src", "copy").as[(Long, String, Long)].collect()
      assert(out.forall(_._3 == 0L), "downsample-only output must be copy 0")
      // ids are a subset of the input (no replication, no invention)
      assert(out.map(_._1).distinct.length == out.length)
      val tUnits = weights.map { case (s2, w) => counts(s2).toDouble / w }.min
      val by = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      weights.foreach { case (src, w) =>
        val expected = w * tUnits
        val got = by.getOrElse(src, 0L).toDouble
        val tol = math.max(5.0 * math.sqrt(expected), 12.0)
        assert(math.abs(got - expected) <= tol,
          s"$src: got $got expected $expected ± $tol ($counts / $weights)")
      }
      // the binding source's rate is 1.0: every row survives
      val binding = weights.minBy { case (s2, w) => counts(s2).toDouble / w }._1
      assert(by(binding) == counts(binding).toLong,
        s"binding source $binding must keep all ${counts(binding)} rows, kept ${by.get(binding)}")
      // determinism
      val again = Sampling.mixToWeights(df, "id", "src", weights)
        .select("id", "copy").as[(Long, Long)].collect().toSet
      assert(again == out.map(t => (t._1, t._3)).toSet)
    }
  }

  test("targetRows: (id, copy) unique, full passes complete, fractional pass binomial, cap honored") {
    scenarios(6).foreach { case (counts, weights) =>
      val df = corpus(counts)
      val sumW = weights.toSeq.sortBy(_._1).map(_._2).sum
      // a target that forces SOME source above 1 epoch but none past 6:
      // T = target/Σw; rate_s = w_s·T/n_s ≤ 6 ⟺ target ≤ 6·n_s·Σw/w_s
      val target = weights.map { case (s2, w) => (6.0 * counts(s2) * sumW / w).toLong }.min - 1
      val out = Sampling.mixToWeights(df, "id", "src", weights,
        targetRows = Some(target), maxEpochs = 6.0)
        .select("id", "src", "copy").as[(Long, String, Long)].collect()
      // exactly-once per (id, copy)
      assert(out.map(t => (t._1, t._3)).distinct.length == out.length)
      val tUnits = target.toDouble / sumW
      val byIdSrc = out.groupBy(_._2)
      weights.foreach { case (src, w) =>
        val r = (w * tUnits) / counts(src).toDouble
        val rows = byIdSrc.getOrElse(src, Array.empty[(Long, String, Long)])
        // every copy index below floor(r) is a FULL pass: n_src rows each
        val full = math.floor(r).toLong
        (0L until full).foreach { c =>
          assert(rows.count(_._3 == c) == counts(src),
            s"$src copy $c must be a full pass of ${counts(src)}")
        }
        // no copy index at or past ceil(r)
        assert(rows.forall(_._3 <= full), s"$src has copies past the rate ceiling")
        // fractional tail within binomial noise
        val fracExpected = (r - full) * counts(src)
        val got = rows.count(_._3 == full).toDouble
        val tol = math.max(5.0 * math.sqrt(math.max(fracExpected, 1.0)), 12.0)
        assert(math.abs(got - fracExpected) <= tol,
          s"$src fractional pass: got $got expected $fracExpected ± $tol")
      }
      // total lands near the target
      assert(math.abs(out.length - target.toDouble) <=
        math.max(5.0 * math.sqrt(target.toDouble), 20.0),
        s"total ${out.length} vs target $target")
    }
  }

  test("high source cardinality takes the broadcast-rates path with identical semantics") {
    // 100 sources of 30 rows, uniform weights → every source is
    // binding (rate 1.0) → the ENTIRE corpus survives — an exact
    // invariant that holds only if the join-branch rate attach is
    // value-identical to the when-chain's
    val counts = (0 until 100).map(i => f"s$i%03d" -> 30).toMap
    val df = corpus(counts)
    val weights = counts.keys.map(_ -> 1.0).toMap
    val out = Sampling.mixToWeights(df, "id", "src", weights)
    assert(out.count() == 3000L, "uniform mixture over equal sources must keep everything")
    // and a skewed weight still downsamples only the over-weighted rest
    val skew = counts.keys.map(k => k -> (if (k == "s000") 2.0 else 1.0)).toMap
    val kept = Sampling.mixToWeights(df, "id", "src", skew)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept("s000") == 30L, "the binding (most-demanded) source keeps all rows")
    val others = kept.filter(_._1 != "s000").values
    // expected 15 each (rate 0.5), binomial noise; sum is tighter
    assert(math.abs(others.sum - 99 * 15.0) < 5.0 * math.sqrt(99 * 30 * 0.25) + 10,
      s"sum of downsampled sources off: ${others.sum}")
  }
}
