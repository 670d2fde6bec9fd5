package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12: the hash/ANN expressions dropped CodegenFallback for real
  * `doGenCode` (static calls into HashEval/PqEval — the same bodies
  * `nullSafeEval` delegates to). This spec pins both halves of that
  * contract:
  *   - the generated code COMPILES and evaluates under CODEGEN_ONLY
  *     (factoryMode makes a Janino failure a hard error, not a silent
  *     interpreted fallback);
  *   - CODEGEN_ONLY and NO_CODEGEN produce IDENTICAL results row for
  *     row, including the null conventions (zero-token md5 simhash,
  *     dimension-mismatch / null-element dots, NaN vectors).
  */
class HashCodegenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bothModes(f: => Seq[Row]): (Seq[Row], Seq[Row]) = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "CODEGEN_ONLY")
      val gen = f
      spark.conf.set(key, "NO_CODEGEN")
      val interp = f
      (gen, interp)
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("text-hash expressions: codegen compiles; results match interpreted exactly") {
    import graft.functions.HashFunctions._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "THE QUICK brown\tfox", "one", "", "  \t \n ",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "répété répété répété unicode wörds").toDF("text")
    def q = docs.select(
        textShingleHashes($"text", 3).as("sh"),
        positionalShingleHashes($"text", 3).as("psh"),
        minhashFromText($"text", 3, 16, 42L).as("mh"),
        simhashFromText($"text").as("simh"),
        simhashMd5FromText($"text").as("md5h"))
      .collect().toSeq
    val (gen, interp) = bothModes(q)
    assert(gen == interp)
    // the zero-token null convention survives codegen
    assert(gen.count(_.isNullAt(4)) == 2, "empty + whitespace docs → null md5 simhash")
  }

  test("array-input hash expressions: signature/simhash64/intersect/dot under both modes") {
    import graft.functions.HashFunctions._
    val df = Seq(
      (Seq("a", "b", "c"), Seq(1L, 3L, 9L), Seq(3L, 9L, 11L), Seq(1.0f, 2.0f), Seq(0.5f, 0.25f)),
      (Seq.empty[String], Seq.empty[Long], Seq(1L), Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f, 1.0f)))
      .toDF("toks", "sa", "sb", "va", "vb")
    def q = df.select(
        minhashSignature($"toks", 8).as("sig"),
        simhash64($"toks").as("sh64"),
        sortedIntersectCount($"sa", $"sb").as("inter"),
        dotProduct($"va", $"vb").as("dot"))
      .collect().toSeq
    val (gen, interp) = bothModes(q)
    assert(gen == interp)
    assert(gen.head.getInt(2) == 2 && gen.head.getDouble(3) == 1.0)
    // dimension mismatch → null, under codegen too
    def mism = Seq((Seq(1.0f, 2.0f), Seq(1.0f)))
      .toDF("a", "b").select(dotProduct($"a", $"b")).collect().toSeq
    val (g2, i2) = bothModes(mism)
    assert(g2 == i2 && g2.head.isNullAt(0))
  }

  test("nearest_centroids: reference-object model rides into generated code; NaN → null") {
    import graft.functions.HashFunctions._
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0))
    val df = Seq(Seq(0.9f, 0.1f), Seq(0.1f, 0.9f), Seq(Float.NaN, 1.0f))
      .toDF("v")
    def q = df.select(nearestCentroids($"v", cents, 2).as("cells")).collect().toSeq
    val (gen, interp) = bothModes(q)
    assert(gen == interp)
    assert(gen(0).getSeq[Int](0).head == 0 && gen(1).getSeq[Int](0).head == 1)
    assert(gen(2).isNullAt(0), "NaN vector must null, not mis-assign")
  }

  test("pq expressions: encode/lut/adc under both modes; ADC equals explicit sum") {
    import graft.functions.PqFunctions._
    // m=2 subspaces, k=2 centroids each, subDim=2 → 4-dim vectors
    val cb = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 1.0), Array(-1.0, -1.0)))
    val df = Seq(
      Seq(0.9f, 0.1f, 0.7f, 0.7f),
      Seq(0.0f, 1.0f, -0.5f, -0.5f),
      Seq(Float.NaN, 0f, 0f, 0f)).toDF("v")
    def q = df.select(
        pqEncode($"v", cb).as("codes"),
        pqLut($"v", cb).as("lut"),
        pqAdcDot(pqEncode($"v", cb), pqLut($"v", cb), 2).as("adc"))
      .collect().toSeq
    val (gen, interp) = bothModes(q)
    assert(gen == interp)
    assert(gen(0).getSeq[Int](0) == Seq(0, 0) && gen(1).getSeq[Int](0) == Seq(1, 1))
    assert(gen(2).isNullAt(0) && gen(2).isNullAt(1) && gen(2).isNullAt(2))
    // ADC of a row with itself-as-query: lut[mi*k+code] summed
    val r = gen(0)
    val codes = r.getSeq[Int](0); val lut = r.getSeq[Double](1)
    assert(r.getDouble(2) == lut(0 * 2 + codes(0)) + lut(1 * 2 + codes(1)))
  }

  test("lsh_band_hashes: value-identical to the declarative slice/xxhash64 banding") {
    import graft.functions.HashFunctions._
    // random-ish signatures via the fused minhash (64 hashes); 8 bands
    // of 8 rows — the EXACT declarative form bandedSigs used before
    // round 15 must reproduce bit for bit, or every persisted sketch
    // sidecar and minhash gate would silently change candidates
    val docs = (0 until 50).map(i =>
      (0 until 30).map(j => s"w${(i * 37 + j * 11) % 500}").mkString(" "))
      .toDF("text")
    val sigs = docs.select(minhashFromText($"text", 3, 64, 42L).as("sig"))
    def q = sigs.select(
        lshBandHashes($"sig", 8, 8).as("fused"),
        transform(sequence(lit(0), lit(7)),
          b => xxhash64(slice($"sig", b * 8 + 1, lit(8)), b)).as("declarative"))
      .collect().toSeq
    val (gen, interp) = bothModes(q)
    assert(gen == interp, "codegen and interpreted banding must agree")
    gen.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"fused banding diverged from the declarative form: $r")
    }
    // short signature (fewer elements than bands×rows): fused clamps,
    // declarative slice truncates the same way
    val shortSig = Seq(Seq(1L, 2L, 3L)).toDF("sig")
    val sr = shortSig.select(
      lshBandHashes($"sig", 4, 2).as("fused"),
      transform(sequence(lit(0), lit(3)),
        b => xxhash64(slice($"sig", b * 2 + 1, lit(2)), b)).as("decl")).head()
    assert(sr.getSeq[Long](0) == sr.getSeq[Long](1))
  }

  test("md5_fold6: value-identical to the declarative ascii-digit fold (r17 native form)") {
    import graft.functions.HashFunctions._
    // every deterministic draw in the library (DSIR features, Gumbel
    // keys, mix thresholds, weighted sampling) rides md5Fold6 — the
    // round-17 native single-digest expression must replay the
    // declarative md5HexFoldAt(md5(key), 1, B) tree bit for bit, or
    // every md5-bucketed gate's oracle hash would silently change
    val keys = (0 until 500).map(i => s"doc_$i#salt") ++
      Seq("", " ", "ünïcødé wörds ☃", "a\tb\nc", "0", "#dsir",
        (0 until 100).map(_ => "x").mkString)
    val df = keys.toDF("k")
    for (b <- Seq(2L, 256L, 4096L, 1048576L, 16777216L)) {
      def q = df.select(
          md5Fold6($"k", b).as("fused"),
          md5HexFoldAt(md5($"k"), 1, b).as("declarative"))
        .collect().toSeq
      val (gen, interp) = bothModes(q)
      assert(gen == interp, s"codegen and interpreted md5Fold6 must agree (B=$b)")
      gen.foreach { r =>
        assert(r.getLong(0) == r.getLong(1),
          s"native fold diverged from the declarative form at B=$b: $r")
      }
    }
    // null propagates
    val nr = Seq[Option[String]](None, Some("x")).toDF("k")
      .select(md5Fold6($"k", 256L)).collect()
    assert(nr(0).isNullAt(0) && !nr(1).isNullAt(0))
  }
}
