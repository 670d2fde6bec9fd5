package graft

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("fit is deterministic and rectangular; encode yields m in-range codes") {
    val m1 = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 32, seed = 7L)
    val m2 = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 32, seed = 7L)
    assert(m1.codebooks.flatten.flatten.toSeq == m2.codebooks.flatten.flatten.toSeq)
    assert(m1.m == 16 && m1.k == 32 && m1.subDim == 4)
    val codes = Pq.encode(emb, "vec_id", "embedding", m1)
      .select("code").as[Seq[Int]].collect()
    assert(codes.length == emb.count())
    assert(codes.forall(c => c.length == 16 && c.forall(x => x >= 0 && x < 32)))
  }

  test("ADC approximates the true dot: reconstruction beats the zero-vector baseline everywhere") {
    val model = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 32, seed = 7L)
    import graft.functions.PqFunctions._
    import graft.functions.VectorFunctions._
    // self-ADC: score every vector against ITS OWN lut — the ADC dot of
    // v with v must land near ||v||^2, within the quantization error
    val withSelf = emb.select(col("embedding").as("v"))
      .withColumn("code", pqEncode(col("v"), model.codebooks))
      .withColumn("lut", pqLut(col("v"), model.codebooks))
      .select((pqAdcDot(col("code"), col("lut"), model.k) / norm2(col("v"))).as("ratio"))
      .as[Double].collect()
    // quantized self-similarity: cos(v, q(v)) scaled by |q(v)|/|v| — loose
    // bounds, but far from 0 and far from wild overshoot for every vector
    assert(withSelf.forall(r => r > 0.5 && r < 1.5),
      s"worst ratios: ${withSelf.sorted.take(3).mkString(",")} / ${withSelf.sorted.takeRight(3).mkString(",")}")
  }

  test("pqTopK with re-rank reaches high recall vs brute force on the embeddings corpus") {
    val model = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 32, seed = 42L)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("id").as("neighbor_id"))
    val pq = Pq.pqTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, model, rerankFactor = 8)
      .select(col("query_id"), col("id").as("neighbor_id"))
    val hits = brute.join(pq, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / brute.count()
    assert(recall >= 0.8, f"PQ recall@10 too low: $recall%.3f")
    // exact re-rank means emitted cosines are TRUE cosines: the top-1
    // neighbor per query must match brute exactly
    val b1 = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 1).select("query_id", "id").as[(Long, Long)].collect().toSet
    val p1 = Pq.pqTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 1, model, rerankFactor = 80)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    assert(p1 == b1, s"top-1 after wide re-rank must be exact: $p1 vs $b1")
  }

  test("resolveRerankFactor: floor at bench scales, linear growth, cap at the far end") {
    // the round-15 sf100 finding: a fixed factor 8 holds recall through
    // 500k vectors and measured 0.76-0.78 against 0.8 floors at 5M —
    // ADC leapfrog noise grows linearly with corpus size, so the pool
    // must too. Floor keeps every sub-500k scale bit-identical to the
    // old fixed-8 behavior (oracle gates unchanged by construction).
    assert(Pq.resolveRerankFactor(0L) == 8)
    assert(Pq.resolveRerankFactor(5_000L) == 8)       // sf0.01
    assert(Pq.resolveRerankFactor(50_000L) == 8)      // sf0.1
    assert(Pq.resolveRerankFactor(400_000L) == 8)     // at the floor edge
    assert(Pq.resolveRerankFactor(500_000L) == 10)    // sf10
    assert(Pq.resolveRerankFactor(5_000_000L) == 100) // sf100 → top k·100
    assert(Pq.resolveRerankFactor(1_000_000_000L) == 512, "cap bounds the pool")
    intercept[IllegalArgumentException](Pq.resolveRerankFactor(-1L))
    // Auto flows through the public paths: a small corpus with Auto is
    // identical to the old explicit factor 8
    val model = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 32, seed = 42L)
    val queries = emb.filter(col("vec_id") < 3)
    val auto = Pq.pqTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, model)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val fixed = Pq.pqTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, model, rerankFactor = 8)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    assert(auto == fixed, "Auto at small n must equal the fixed floor")
  }

  test("IVF-PQ composition keeps useful recall while scanning a fraction at code-width") {
    val model = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 32, seed = 42L)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("id").as("neighbor_id"))
    val ivfpq = Pq.ivfPqTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, model,
      numCentroids = 16, nprobe = 8, rerankFactor = 8)
      .select(col("query_id"), col("id").as("neighbor_id"))
    val hits = brute.join(ivfpq, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / brute.count()
    // recall is bounded by the IVF probe (nprobe=8 of 16 cells) times the
    // ADC candidate quality — well above chance, below the PQ-only path
    assert(recall >= 0.5, f"IVF-PQ recall@10 too low: $recall%.3f")
  }

  test("persisted PQ index: reload matches fit, codes-only scan ranks, re-rank restores exact order") {
    val base = java.nio.file.Files.createTempDirectory("graft_pq_").toString
    val model = Pq.buildPqIndex(emb, "vec_id", "embedding", base, m = 16, k = 32, seed = 42L)
    val loaded = Pq.loadPqModel(spark, base)
    assert(loaded.m == model.m && loaded.k == model.k && loaded.subDim == model.subDim)
    assert(loaded.codebooks.flatten.flatten.toSeq == model.codebooks.flatten.flatten.toSeq)
    // the persisted artifact is codes-only: no raw vector column on disk
    assert(!spark.read.parquet(s"$base/codes").columns.contains("v"))

    val queries = emb.filter(col("vec_id") < 5)
    // codes-only query must equal the in-memory ADC ranking (same model)
    val fromIndex = Pq.queryPqIndex(spark, base, queries, "vec_id", "embedding", k = 10)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val inMem = Pq.pqTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, model, rerankFactor = 1)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    assert(fromIndex == inMem)
    // re-rank against the original vector frame gives exact top-1
    val reranked = Pq.queryPqIndex(spark, base, queries, "vec_id", "embedding",
      k = 1, rerankWith = Some((emb, "vec_id", "embedding")), rerankFactor = 80)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 1)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    assert(reranked == brute)
  }

  test("queryPqIndex fails loudly when the re-rank frame misses candidate ids") {
    val base = java.nio.file.Files.createTempDirectory("graft_pq_gap_").toString
    Pq.buildPqIndex(emb, "vec_id", "embedding", base, m = 16, k = 32)
    val queries = emb.filter(col("vec_id") < 2)
    val partial = emb.filter(col("vec_id") % 2 === 0) // half the corpus
    val e = intercept[IllegalArgumentException] {
      Pq.queryPqIndex(spark, base, queries, "vec_id", "embedding", k = 5,
        rerankWith = Some((partial, "vec_id", "embedding"))).collect()
    }
    assert(e.getMessage.contains("missing"))
  }

  test("queryPqIndex fails loudly when the re-rank frame repeats candidate ids") {
    // a store with duplicate primary ids would silently inflate the
    // candidate set through the fetch join — the coverage count must
    // catch the corruption in the other direction too
    val base = java.nio.file.Files.createTempDirectory("graft_pq_dup_").toString
    Pq.buildPqIndex(emb, "vec_id", "embedding", base, m = 16, k = 32)
    val queries = emb.filter(col("vec_id") < 2)
    val dup = emb.unionByName(emb) // every id twice: all candidates repeat
    val e = intercept[IllegalArgumentException] {
      Pq.queryPqIndex(spark, base, queries, "vec_id", "embedding", k = 5,
        rerankWith = Some((dup, "vec_id", "embedding"))).collect()
    }
    assert(e.getMessage.contains("repeats"))
  }

  test("null and NaN vectors drop out of encode; dim mismatch fails loudly") {
    val model = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 32)
    val bad = Seq(
      (1L, Array.fill(64)(1.0)),
      (2L, null.asInstanceOf[Array[Double]]),
      (3L, Array.fill(64)(Double.NaN))
    ).toDF("id", "v")
    val enc = Pq.encode(bad, "id", "v", model)
    assert(enc.select("id").as[Long].collect().toSeq == Seq(1L))
    val short = Seq((1L, Array.fill(32)(1.0))).toDF("id", "v")
    val e = intercept[Exception] {
      Pq.encode(short, "id", "v", model).collect()
    }
    assert(e.getMessage != null)
  }

  test("empty codebooks fail construction with a clear config error, not an index crash") {
    import graft.functions.PqFunctions._
    val c = col("v")
    val eLut = intercept[IllegalArgumentException] {
      pqLut(c, Array.empty[Array[Array[Double]]])
    }
    assert(eLut.getMessage.contains("non-empty codebooks"))
    val eLutInner = intercept[IllegalArgumentException] {
      pqLut(c, Array(Array.empty[Array[Double]]))
    }
    assert(eLutInner.getMessage.contains("non-empty codebooks"))
    val eEnc = intercept[IllegalArgumentException] {
      pqEncode(c, Array.empty[Array[Array[Double]]])
    }
    assert(eEnc.getMessage.contains("non-empty codebooks"))
  }
}
