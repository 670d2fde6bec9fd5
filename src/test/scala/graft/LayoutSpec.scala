package graft

import graft.sources.Writers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-layout effectiveness proof: a sorted, range-partitioned parquet
  * layout must let a selective filter on the layout key skip most of the
  * data AT THE SCAN (row-group zone maps + file pruning), not merely
  * filter it afterwards. Asserted on the scan's own numOutputRows
  * metric, so the claim is about bytes/rows actually surfaced by the
  * reader — the property that decides whether a 100 TB point lookup
  * reads 100 TB or 100 GB. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Rows surfaced by the (single) parquet scan of `df` after running it. */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n${df.queryExecution.executedPlan}")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("sorted layout: selective key filter surfaces ~selectivity of rows; unsorted surfaces all") {
    val n = 100000
    // key arrives in hash-scrambled (maximally unsorted) order
    val data = spark.range(n.toLong)
      .select((col("id") * 2654435761L % n).as("k"), col("id").as("payload"))
    val base = java.nio.file.Files.createTempDirectory("graft_layout_").toString

    Writers.writeSortedParquet(data, s"$base/sorted", Seq("k"), numFiles = 8)
    data.repartition(8).write.parquet(s"$base/unsorted")

    // ~1% selectivity window on the layout key
    def filtered(path: String) =
      spark.read.parquet(path).filter(col("k") >= 1000 && col("k") < 2000)

    val sortedRows = scanOutputRows(filtered(s"$base/sorted"))
    val unsortedRows = scanOutputRows(filtered(s"$base/unsorted"))
    val expected = filtered(s"$base/sorted").count()

    // every run must agree on the ANSWER...
    assert(filtered(s"$base/unsorted").count() == expected)
    // ...but the sorted layout's scan reads ~one range partition — 1/8 of
    // the data, plus slack because repartitionByRange SAMPLES its
    // boundaries and partitions come out unequal — while the unsorted
    // layout surfaces everything
    assert(sortedRows <= n / 5,
      s"sorted layout surfaced $sortedRows rows — zone-map skipping not effective")
    assert(unsortedRows == n,
      s"unsorted control surfaced $unsortedRows rows, expected all $n (test premise broken)")
    assert(sortedRows >= expected, "scan cannot surface fewer rows than the answer")
  }

  test("z-order layout: filters on EITHER column skip; single-key sort serves only its own key") {
    val n = 100000
    // two independent, hash-scrambled keys in [0, 1024)
    val data = spark.range(n.toLong).select(
      (col("id") * 2654435761L % 1024).as("k1"),
      (col("id") * 1099511628211L % 1024).as("k2"),
      col("id").as("payload"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    Writers.writeZOrderedParquet(data, s"$base/z", Seq("k1", "k2"), bits = 10, numFiles = 32)
    Writers.writeSortedParquet(data, s"$base/k1sorted", Seq("k1"), numFiles = 32)

    def surfaced(path: String, c: String): Double =
      scanOutputRows(spark.read.parquet(path)
        .filter(col(c) >= 100 && col(c) < 120)).toDouble / n

    // content identical either way
    assert(spark.read.parquet(s"$base/z").agg(sum("payload")).head() ==
      spark.read.parquet(s"$base/k1sorted").agg(sum("payload")).head())
    // z-layout: BOTH columns' zone maps are selective (32 files = 5
    // z-bits; each column owns >= 2 of them → >= 4x skip, plus row-group
    // slop). Single-key layout: its own key skips hard, the other reads
    // everything — the failure mode z-order exists to fix.
    assert(surfaced(s"$base/z", "k1") <= 0.45, s"z k1: ${surfaced(s"$base/z", "k1")}")
    assert(surfaced(s"$base/z", "k2") <= 0.45, s"z k2: ${surfaced(s"$base/z", "k2")}")
    assert(surfaced(s"$base/k1sorted", "k1") <= 0.15)
    // repartitionByRange samples its boundaries with a run-varying seed,
    // so a file's k2 min/max can ACCIDENTALLY exclude the narrow probe
    // window and skip a sliver — the premise is "no systematic skipping
    // on the other column", not "never a lucky row group"
    assert(surfaced(s"$base/k1sorted", "k2") >= 0.90,
      "test premise: single-key layout cannot systematically skip on the other column")
  }

  test("compaction merges small files to the target size and preserves content") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val path = s"$base/many"
    val data = spark.range(50000L).select(col("id").as("k"), md5(col("id").cast("string")).as("h"))
    data.repartition(40).write.parquet(path)
    val expected = spark.read.parquet(path).agg(sum("k"), count(lit(1))).head()

    val nSmall = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nSmall == 40)
    val small = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.length()).sum
    // target = half the total → expect 2 files
    val (before, after) = Writers.compactParquet(spark, path, targetFileBytes = small / 2 + 1)
    assert(before == 40 && after <= 3, s"before=$before after=$after")
    val got = spark.read.parquet(path).agg(sum("k"), count(lit(1))).head()
    assert(got == expected, "compaction must not change content")
    // compaction never INCREASES file count: a tiny target that would
    // want more files than exist is a no-op
    val (b2, a2) = Writers.compactParquet(spark, path, targetFileBytes = 1L)
    assert(b2 == a2)
  }

  test("compaction refuses a hive-partitioned directory instead of silently no-opping") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_part_").toString
    spark.range(100L).select(col("id"), (col("id") % 3).as("p"))
      .write.partitionBy("p").parquet(s"$base/t")
    val e = intercept[IllegalArgumentException] {
      Writers.compactParquet(spark, s"$base/t", targetFileBytes = 1L << 20)
    }
    assert(e.getMessage.contains("subdirectories"))
  }

  test("maxRecordsPerFile caps file size without an extra shuffle") {
    val base = java.nio.file.Files.createTempDirectory("graft_layout_").toString
    val data = spark.range(10000L).select(col("id").as("k"), col("id").as("v"))
    Writers.writeSortedParquet(data, s"$base/capped", Seq("k"),
      numFiles = 2, maxRecordsPerFile = 1000L)
    val files = new java.io.File(s"$base/capped").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 10, s"expected >=10 capped files, got ${files.length}")
    // layout contract survives the split: per-file key ranges are disjoint
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getPath).agg(min("k"), max("k")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, "file key ranges overlap")
      case _ => ()
    }
  }

  test("z_value rejects a non-integral layout column at analysis time, before any shuffle") {
    val df = spark.range(10L).select(col("id"), col("id").cast("string").as("s"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.LayoutFunctions.zValue(8, col("id"), col("s")))
    }
    assert(e.getMessage.toLowerCase.contains("integral"), e.getMessage)
  }

  test("z_value accepts date layout columns but rejects raw timestamps at plan time") {
    // z-ordering by (event_date, key) is the canonical layout — dates
    // (Int days, ~15 bits) genuinely fit the bit budget and stay
    // accepted…
    val df = spark.range(10L).select(col("id"),
      date_add(lit(java.sql.Date.valueOf("2026-01-01")), col("id").cast("int")).as("d"),
      (lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))).as("ts"))
    val out = df.select(
      graft.functions.LayoutFunctions.zValue(16, col("d"), col("id")).as("zd"))
      .collect()
    assert(out.length == 10 && out.forall(r => !r.isNullAt(0)))
    // …but raw timestamps are epoch MICROS: they can never fit <=31
    // bits, so every realistic value would clamp to a constant — the
    // silently degenerate layout must be a plan-time error instead
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.LayoutFunctions.zValue(16, col("ts"), col("id")))
    }
    assert(e.getMessage.contains("rescale"), e.getMessage)
  }

  test("z-ordered write normalizes timestamps: both columns spread across files") {
    // the degenerate failure this pins: pre-normalization, every epoch
    // micro clamped to (1<<bits)-1 and the timestamp contributed a
    // CONSTANT to the z-value — file ranges stayed wide in ts and the
    // layout silently served only the other column
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_ts_").toString
    val df = spark.range(4000L).select(
      (lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).cast("long") +
        (col("id") % 1000) * 60).cast("timestamp").as("ts"),
      pmod(col("id") * 2654435761L, lit(1000)).as("k"))
    Writers.writeZOrderedParquet(df, s"$dir/t", Seq("ts", "k"), bits = 10, numFiles = 8)
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length == 8, s"expected 8 files, got ${files.length}")
    // per-file ts spans must be narrow: a constant-contribution ts
    // would leave every file covering the FULL 1000-minute range
    val fullSpanSec = 1000L * 60
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg((max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("span"))
        .head()
      r.getLong(0)
    }
    val narrow = spans.count(_ <= fullSpanSec * 3 / 4)
    assert(narrow >= files.length / 2,
      s"z-order gave no ts locality: per-file spans ${spans.toSeq} vs full $fullSpanSec")
    // content fidelity: normalization must not alter the rows written
    val got = spark.read.parquet(s"$dir/t")
    assert(got.count() == 4000L)
    assert(got.agg(sum(col("k")), sum(col("ts").cast("long"))).head() ==
      df.agg(sum(col("k")), sum(col("ts").cast("long"))).head())
  }

  test("compaction recovers every crash-swap state without losing data") {
    import org.apache.hadoop.fs.Path
    def freshDir(): (String, org.apache.spark.sql.Row) = {
      val base = java.nio.file.Files.createTempDirectory("graft_compact_rec_").toString
      val path = s"$base/t"
      spark.range(5000L).select(col("id").as("k")).repartition(10).write.parquet(path)
      (path, spark.read.parquet(path).agg(sum("k"), count(lit(1))).head())
    }
    val fs = new Path("/").getFileSystem(spark.sessionState.newHadoopConf())

    // state: old alone (crash right after rename(dir -> old)) → restored
    locally {
      val (path, expected) = freshDir()
      fs.rename(new Path(path), new Path(path + ".__graft-compact-old__"))
      val (b, a) = Writers.compactParquet(spark, path, targetFileBytes = 1L << 30)
      assert(b == 10 && a < 10)
      assert(spark.read.parquet(path).agg(sum("k"), count(lit(1))).head() == expected)
    }
    // state: old + committed tmp (crash between the renames) → swap finished;
    // the tmp copy (distinguishable content) is the one that goes live
    locally {
      val (path, _) = freshDir()
      spark.range(100L).select((col("id") + 1000000L).as("k"))
        .coalesce(1).write.parquet(path + ".__graft-compact-tmp__")
      fs.rename(new Path(path), new Path(path + ".__graft-compact-old__"))
      val tmpExpected = spark.read.parquet(path + ".__graft-compact-tmp__")
        .agg(sum("k"), count(lit(1))).head()
      Writers.compactParquet(spark, path, targetFileBytes = 1L << 30)
      assert(spark.read.parquet(path).agg(sum("k"), count(lit(1))).head() == tmpExpected)
      assert(!fs.exists(new Path(path + ".__graft-compact-old__")))
      assert(!fs.exists(new Path(path + ".__graft-compact-tmp__")))
    }
    // state: old + dir (crash after the second rename) → old dropped, dir kept
    locally {
      val (path, expected) = freshDir()
      spark.range(7L).select(col("id").as("k"))
        .write.parquet(path + ".__graft-compact-old__")
      val (b, a) = Writers.compactParquet(spark, path, targetFileBytes = 1L << 30)
      assert(b == 10 && a < 10)
      assert(spark.read.parquet(path).agg(sum("k"), count(lit(1))).head() == expected)
      assert(!fs.exists(new Path(path + ".__graft-compact-old__")))
    }
    // state: torn tmp without _SUCCESS → discarded, dir authoritative
    locally {
      val (path, expected) = freshDir()
      spark.range(9L).select(col("id").as("k"))
        .coalesce(1).write.parquet(path + ".__graft-compact-tmp__")
      fs.delete(new Path(path + ".__graft-compact-tmp__/_SUCCESS"), false)
      val (b, a) = Writers.compactParquet(spark, path, targetFileBytes = 1L << 30)
      assert(b == 10 && a < 10)
      assert(spark.read.parquet(path).agg(sum("k"), count(lit(1))).head() == expected)
      assert(!fs.exists(new Path(path + ".__graft-compact-tmp__")))
    }
  }
}
