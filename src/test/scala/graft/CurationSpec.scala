package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- PII -------------------------------------------------------------

  test("PII counts and redaction: email, IPv4, phone, zero-hit") {
    val df = Seq(
      (1L, "write to alice.smith+tag@sub.example.co.uk or bob@x.io today"),
      (2L, "server at 192.168.0.1 and 10.0.0.255, call +1-555-0199"),
      (3L, "no pii here at all"),
      (4L, "v1.2.3.4 is a version but 1.2.3.4 alone is an ip")).toDF("id", "text")
    val out = Curation.withPii(df, "text")
      .select("id", "n_emails", "n_ipv4", "n_phones", "text_redacted")
      .orderBy("id").as[(Long, Long, Long, Long, String)].collect()

    assert(out(0) == ((1L, 2L, 0L, 0L, "write to <EMAIL> or <EMAIL> today")))
    assert(out(1) == ((2L, 0L, 2L, 1L, "server at <IP> and <IP>, call <PHONE>")))
    assert(out(2) == ((3L, 0L, 0L, 0L, "no pii here at all")))
    // "v1.2.3.4": \b between "v1" digits? 'v' is a word char so the
    // boundary before '1' fails — but the match can START at "2.3.4."…
    // there are only 3 octets from there, so no match; the bare ip hits.
    assert(out(3)._3 == 1L)
    assert(out(3)._5.contains("<IP> alone"))
  }

  test("redaction order: email pass runs before IP/phone passes") {
    // an IP-hosted address has no alphabetic TLD → NOT an email by the
    // pattern; the IP pass then redacts just the host part
    val df = Seq(
      (1L, "mail me at joe@10.0.0.1 ok"),
      (2L, "digits in host: a@mail2.example.com stays an email")).toDF("id", "text")
    val red = Curation.withPii(df, "text")
      .orderBy("id").select("text_redacted").as[String].collect()
    assert(red(0) == "mail me at joe@<IP> ok")
    assert(red(1) == "digits in host: <EMAIL> stays an email")
  }

  // ---- repetition ------------------------------------------------------

  test("dup-kgram fractions: exact values, short-doc and empty guards") {
    val df = Seq(
      (1L, "a a a a"),            // 4 words 1 distinct; 3 2-grams 1 distinct
      (2L, "a b c d"),            // all distinct
      (3L, "ab"),                 // shorter than 2 → 2/3-gram frac 0
      (4L, ""),                   // empty → all 0 (div-by-zero guard)
      (5L, "x y x y x y")).toDF("id", "text")
    val out = Curation.withRepetition(df, "text")
      .select("id", "dup_word_frac", "dup_2gram_frac", "dup_3gram_frac")
      .orderBy("id").as[(Long, Double, Double, Double)].collect()

    assert(out(0) == ((1L, 0.75, 1.0 - 1.0 / 3.0, 0.5)))
    assert(out(1) == ((2L, 0.0, 0.0, 0.0)))
    assert(out(2) == ((3L, 0.0, 0.0, 0.0)))
    assert(out(3) == ((4L, 0.0, 0.0, 0.0)))
    // 6 words 2 distinct; 5 2-grams 2 distinct; 4 3-grams 2 distinct
    assert(out(4) == ((5L, 1.0 - 2.0 / 6.0, 0.6, 0.5)))
  }

  // ---- decontamination -------------------------------------------------

  test("contaminationReport: overlap counts, zero rows kept, bench excluded") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // shares 5-grams
      (2L, "an entirely unrelated document about spark plans"),
      (3L, "quick brown fox jumps over me")).toDF("doc_id", "text") // 4-word overlap only
    val bench = Seq(
      "the quick brown fox jumps over a fence").toDF("text")
    val out = Curation.contaminationReport(train, "doc_id", "text", bench, "text", n = 5)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect()
    // bench 5-grams: "the quick brown fox jumps", "quick brown fox jumps over",
    // "brown fox jumps over a", "fox jumps over a fence"
    assert(out(0) == ((1L, 2L, true)))
    assert(out(1) == ((2L, 0L, false)))
    assert(out(2) == ((3L, 1L, true))) // only "quick brown fox jumps over"
  }

  test("contamination plan: benchmark gram set broadcasts") {
    val train = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val bench = Seq("a b c d e").toDF("text")
    val plan = Curation.contaminationReport(train, "doc_id", "text", bench, "text", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side must broadcast:\n$plan")
  }

  // ---- chunking --------------------------------------------------------

  test("chunkDocuments: windows, overlap, short tail, empty-doc drop") {
    val df = Seq(
      (1L, "a b c d e f g"),  // 7 words, len 3 stride 2 → starts 0,2,4,6
      (2L, "x y"),            // single short chunk
      (3L, ""),               // no rows
      (4L, "  ")).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, "doc_id", "text", chunkLen = 3, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0, "a b c", 3L), (1L, 1, "c d e", 3L),
      (1L, 2, "e f g", 3L), (1L, 3, "g", 1L),
      (2L, 0, "x y", 2L)))
  }

  test("chunkDocuments: stride == chunkLen is non-overlapping cover") {
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, "doc_id", "text", chunkLen = 4, stride = 4)
      .orderBy("chunk_id").as[(Long, Int, String, Long)].collect().toSeq
    assert(out.map(_._3) == Seq("w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
    assert(out.map(_._4) == Seq(4L, 4L, 2L))
    // every word appears exactly once across chunks
    assert(out.flatMap(_._3.split(" ")).toSeq == (1 to 10).map(i => s"w$i"))
  }

  test("chunkDocuments rejects stride > chunkLen (would drop words)") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      Curation.chunkDocuments(df, "doc_id", "text", chunkLen = 2, stride = 3)
    }
  }

  // ---- blocklist + quality policy --------------------------------------

  test("blocklistHits: whole-token case-insensitive matches only") {
    val df = Seq(
      (1L, "Spark and sparkle and SPARK"),  // sparkle must NOT match
      (2L, "nothing banned here")).toDF("id", "text")
    val out = df.select(col("id"),
      Curation.blocklistHits(col("text"), Seq("spark", "Vector")).as("n"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 0L)))
  }

  test("withQualityPolicy: violations accumulate in rule order, keep flag") {
    // all-alphabetic tokens: digits would sink alpha_ratio below 0.6
    val longOk = (1 to 60).map(i => "word" + ('a' + i % 26).toChar).mkString(" ")
    val df = Seq(
      (1L, longOk),                               // clean → keep
      (2L, "short doc"),                          // too few tokens
      (3L, (1 to 60).map(_ => "a").mkString(" ")), // dup words + short mean len... tokens ok
      (4L, (1 to 60).map(_ => "!!##$$").mkString(" "))) // alpha ratio fail
      .toDF("doc_id", "text")
    val out = Curation.withQualityPolicy(df, "text")
      .select("doc_id", "keep", "violations")
      .orderBy("doc_id").as[(Long, Int, String)].collect().toSeq
    assert(out(0) == ((1L, 1, "")))
    assert(out(1)._2 == 0 && out(1)._3.contains("too_few_tokens"))
    // doc 3: 60 copies of "a" → mean len 1 < 2, dup frac 59/60 > 0.9,
    // and alpha ratio 60/119 < 0.6 (spaces count toward chars)
    assert(out(2)._2 == 0)
    assert(out(2)._3 == "mean_token_len,dup_word_frac,alpha_ratio")
    assert(out(3)._2 == 0 && out(3)._3.contains("alpha_ratio"))
  }

  test("withQualityPolicy: degenerate docs drop, never crash (ANSI div-by-zero)") {
    // Spark 4 runs ANSI by default — unguarded 0/0 would THROW here
    val df = Seq(
      (1L, ""),                       // empty
      (2L, "   \t  "),                // whitespace-only
      (3L, null: String)).toDF("doc_id", "text")
    val out = Curation.withQualityPolicy(df, "text")
      .select("doc_id", "keep", "violations")
      .orderBy("doc_id").as[(Long, Int, String)].collect().toSeq
    // empty/null: every ratio is undefined (NULL) → only the token rule
    assert(out(0) == ((1L, 0, "too_few_tokens")))
    assert(out(2) == ((3L, 0, "too_few_tokens")))
    // whitespace-only: n_chars > 0, so alpha_ratio is DEFINED (0.0) and
    // legitimately fails alongside the token rule
    assert(out(1) == ((2L, 0, "too_few_tokens,alpha_ratio")))
  }

  // ---- boilerplate removal ---------------------------------------------

  test("removeBoilerplateLines: strips common lines, keeps order, empty-doc case") {
    val docs = Seq(
      (1L, "unique alpha\nFOOTER\nunique beta"),
      (2L, "FOOTER\nmiddle line\nFOOTER"),     // dup common line in one doc
      (3L, "FOOTER"),                          // all-boilerplate → empty
      (4L, "only original content")).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateLines(docs, "doc_id", "text", minDocFreq = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "unique alpha\nunique beta"),
      (2L, "middle line"),
      (3L, ""),
      (4L, "only original content")))
  }

  test("removeBoilerplateLines: doc-frequency counts distinct docs, not occurrences") {
    // "x" appears 3 TIMES but in only 2 docs — below minDocFreq=3, kept
    val docs = Seq(
      (1L, "x\nx\na"), (2L, "x\nb"), (3L, "c")).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateLines(docs, "doc_id", "text", minDocFreq = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "x\nx\na"), (2L, "x\nb"), (3L, "c")))
  }

  // ---- embeddings ------------------------------------------------------

  test("quantizeInt8: range, zero-vector guard, dequantization error bound") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f)),             // zero vector → scale 0, q zeros
      (3L, Seq(-2.0f))).toDF("vec_id", "embedding")
    val out = graft.operators.Embeddings.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("vec_id").as[(Long, Double, Seq[Int])].collect()
    assert(out(0)._2 == 1.0 / 127.0)
    assert(out(0)._3 == Seq(127, -63, 32, 0)) // floor(-63.5+0.5) = -63
    assert(out(1) == ((2L, 0.0, Seq(0, 0))))
    assert(out(2)._3 == Seq(-127))
    // dequantization error ≤ scale/2 for every element
    out.filter(_._2 > 0).foreach { case (id, scale, q) =>
      val orig = Map(1L -> Seq(1.0, -0.5, 0.25, 0.0), 3L -> Seq(-2.0))(id)
      q.zip(orig).foreach { case (qi, x) =>
        assert(math.abs(qi * scale - x) <= scale / 2 + 1e-12, s"vec $id elem $x")
      }
    }
  }

  test("l2Normalize: unit norm, zero vector passthrough") {
    val df = Seq(Seq(3.0f, 4.0f), Seq(0.0f, 0.0f)).toDF("v")
    val out = df.select(graft.operators.Embeddings.l2Normalize(col("v")).as("n"))
      .as[Seq[Double]].collect()
    assert(out(0) == Seq(0.6, 0.8))
    assert(out(1) == Seq(0.0, 0.0))
  }

  test("jlProject: matches a plain-Scala reference exactly; salts are independent draws") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def sign(i: Int, k: Int, salt: String): Double = {
      val hv = Character.digit(md5hex(s"rp#$salt#$i#$k").head, 16)
      (math.floorMod(hv, 2) * 2 - 1).toDouble
    }
    val d = 8; val m = 4
    val rows = (0 until 10).map(id =>
      (id.toLong, Seq.tabulate(d)(i => ((id * 31 + i * 7) % 13 - 6).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    def ref(v: Seq[Float], salt: String): Seq[Double] =
      (0 until m).map(k =>
        v.zipWithIndex.map { case (x, i) => x.toDouble * sign(i, k, salt) }.sum
          * (1.0 / math.sqrt(m.toDouble)))
    val got = graft.operators.Embeddings.jlProject(df, "vec_id", "embedding", d, m)
      .as[(Long, Seq[Double])].collect().toMap
    rows.foreach { case (id, v) =>
      val want = ref(v, "rp")
      got(id).zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) <= math.max(1e-12, math.abs(w) * 1e-12),
          s"proj drift at vec $id: ${got(id)} vs $want")
      }
    }
    val other = graft.operators.Embeddings.jlProject(df, "vec_id", "embedding",
      d, m, salt = "other").as[(Long, Seq[Double])].collect().toMap
    assert(rows.exists { case (id, _) => other(id) != got(id) },
      "a different salt must be a different draw")
  }

  test("jlProject: norm preservation on the testdata embeddings; bad-length → null; no shuffle") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = graft.operators.Embeddings.jlProject(df, "vec_id", "embedding", 64, 16)
      .join(df, "vec_id")
      .select(
        sqrt(aggregate(transform(col("proj"), x => x * x), lit(0.0), _ + _)).as("pn"),
        sqrt(aggregate(transform(col("embedding"),
          x => x.cast("double") * x.cast("double")), lit(0.0), _ + _)).as("vn"))
      .filter(col("vn") > 0).select((col("pn") / col("vn")).as("r"))
      .as[Double].collect()
    assert(out.nonEmpty)
    // E[r²]=1; for m=16 the observed spread for THIS deterministic draw
    // stays well inside [0.4, 1.8] — JL at work, loose enough to be stable
    assert(out.forall(r => r > 0.4 && r < 1.8),
      s"norm distortion out of band: min=${out.min} max=${out.max}")
    // wrong-length vectors must project to NULL, not mis-scale
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val nulls = graft.operators.Embeddings.jlProject(bad, "vec_id", "embedding", 64, 16)
      .filter(col("proj").isNull).count()
    assert(nulls == 1L)
    // pure map-side: broadcast the 1-row matrix, no exchange on the corpus
    val plan = graft.operators.Embeddings.jlProject(df, "vec_id", "embedding", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("SortMergeJoin"),
      s"projection must not shuffle the corpus:\n$plan")
  }

  test("tfidfTopTerms: exact tf/df, score ordering, deterministic ties") {
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry durian")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.tfidfTopTerms(df, "doc_id", "text", 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Long, String, Long, Long, Double)].collect().toSeq
    val n = 3.0
    // tfidf asserted within 1 ulp-scale tolerance: Spark's log() may be
    // Math.log or StrictMath.log depending on JVM intrinsics, and the
    // two are allowed to differ in the last ulp (the gate itself rounds
    // to 6dp for exactly this reason)
    def close(a: Double, b: Double) = math.abs(a - b) <= math.ulp(b) * 2
    assert(out(0)._1 == 1L && out(0)._2 == 1L && out(0)._3 == "apple" &&
      out(0)._4 == 2L && out(0)._5 == 1L && close(out(0)._6, 2.0 * StrictMath.log(n / 1)))
    assert(out(1)._3 == "banana" && close(out(1)._6, StrictMath.log(n / 2)))
    // doc 2: banana and cherry both tf=1 df=2 — equal scores, term tiebreak
    assert(out(2)._3 == "banana" && out(3)._3 == "cherry")
    // doc 3: cherry tf=3 beats durian (df=1, tf=1)
    assert(out(4)._3 == "cherry" && out(4)._4 == 3L && out(4)._5 == 2L &&
      close(out(4)._6, 3.0 * StrictMath.log(n / 2)))
    assert(out(5)._3 == "durian" && close(out(5)._6, StrictMath.log(n / 1)))
  }

  test("curation ops propagate null text as null, never throw") {
    val df = Seq((1L, null: String), (2L, "ok text")).toDF("doc_id", "text")
    val pii = Curation.withPii(df, "text").orderBy("doc_id").collect()
    assert(pii(0).isNullAt(pii(0).fieldIndex("n_emails")))
    assert(pii(0).isNullAt(pii(0).fieldIndex("text_redacted")))
    val rep = Curation.withRepetition(df, "text").orderBy("doc_id").collect()
    assert(rep(0).isNullAt(rep(0).fieldIndex("dup_2gram_frac")))
    // chunking: null text yields no chunk rows (like empty text)
    val ch = Curation.chunkDocuments(df, "doc_id", "text", 3, 2)
    assert(ch.select("doc_id").as[Long].collect().toSet == Set(2L))
    // stats-backed quality: null in → null counters
    val q = graft.operators.TextAnalysis.withQuality(df, "text").orderBy("doc_id").collect()
    assert(q(0).isNullAt(q(0).fieldIndex("n_chars")))
  }

  test("bigramLmScore: exact smoothed probabilities on a tiny corpus") {
    val df = Seq(
      (1L, "a b a b"),   // bigrams: "a b","b a","a b"
      (2L, "a b"),       // bigram: "a b"
      (3L, "c")).toDF("doc_id", "text") // no bigrams
    val out = graft.operators.TextAnalysis.bigramLmScore(df, "doc_id", "text", k = 0.5)
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect().toSeq
    // corpus: C(a b)=3, C(b a)=1; C(a)=3, C(b)=3, C(c)=1; V=3
    val pAB = (3 + 0.5) / (3 + 0.5 * 3) // P(b|a)
    val pBA = (1 + 0.5) / (3 + 0.5 * 3) // P(a|b)
    def close(x: Double, y: Double) = math.abs(x - y) < 1e-12
    assert(out(0)._2 == 3L &&
      close(out(0)._3.get, (2 * math.log(pAB) + math.log(pBA)) / 3))
    assert(out(1)._2 == 1L && close(out(1)._3.get, math.log(pAB)))
    assert(out(2) == ((3L, 0L, None)))
  }

  test("topKWords: count ordering with deterministic ties") {
    val df = Seq("b a a", "c b A", "").toDF("text")
    val out = graft.operators.TextAnalysis.topKWords(df, "text", 2)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 3L), ("b", 2L))) // "A" lowercases into a
  }

  // ---- audio (RIFF/WAVE) -----------------------------------------------

  test("audioMeta: real WAV parse, stub fallback for junk and truncation") {
    import graft.operators.Multimodal
    val wavs = Multimodal.synthesizeWavs(Seq(1L, 2L, 7L).toDF("id"), "id")
    val metas = Multimodal.audioMeta(wavs, "id", "content").collect()
      .map(m => m.id -> m).toMap
    // id=1 → 2*800 samples = 200ms; id=7 → 3*800 = 300ms
    assert(metas(1L).n_samples == 1600L && metas(1L).duration_ms == 200L)
    assert(metas(7L).n_samples == 2400L && metas(7L).duration_ms == 300L)
    assert(metas.values.forall(m =>
      m.format == "wav" && m.sample_rate == 8000L && m.channels == 1L &&
        m.bits_per_sample == 8L))
    // junk text and a truncated header fall through to the stub
    val junk = Seq(
      (10L, "RIFFnot really a wav at all".getBytes),
      (11L, "plain text".getBytes),
      (12L, Array[Byte](82, 73, 70, 70))).toDF("id", "content")
    val stubbed = Multimodal.audioMeta(junk, "id", "content").collect()
    assert(stubbed.forall(_.format != "wav"))
  }

  test("audioMeta rejects insane declared parameters (hostile headers)") {
    import graft.operators.Multimodal
    // well-formed containers with insane fmt parameters — built by the
    // SAME wavBytes layout the synthesizer uses, so the test cannot
    // drift from the real byte format
    val zeroChannels = Multimodal.wavBytes(channels = 0, rate = 8000, bits = 8,
      new Array[Byte](8))
    val absurdRate = Multimodal.wavBytes(channels = 1, rate = 2000000, bits = 8,
      new Array[Byte](8))
    // hostile chunk: rename the data chunk to "junk" AND declare size
    // 0xFFFFFFF8 (≈2^32) — an Int-truncating parser would spin forever
    // (advance 8 + (-8)) or index negative; the Long-cursor walk must
    // skip past the end and fall back to the stub (no data chunk found).
    // (An over-declared size on the DATA chunk itself is legitimate
    // truncation and clamps — covered by the roundtrip test.)
    val huge = Multimodal.wavBytes(1, 8000, 8, new Array[Byte](8))
    "junk".getBytes.zipWithIndex.foreach { case (b, k) => huge(36 + k) = b }
    for (k <- 0 until 4) huge(40 + k) = (if (k < 1) 0xf8 else 0xff).toByte
    val df = Seq((1L, zeroChannels), (2L, absurdRate), (3L, huge))
      .toDF("id", "content")
    val out = Multimodal.audioMeta(df, "id", "content").collect()
    assert(out.forall(_.format != "wav"),
      s"hostile headers must not parse as wav: ${out.mkString(", ")}")
  }

  test("chunkAudioWindows: exact windows, short tail, non-wav drops") {
    import graft.operators.Multimodal
    val wavs = Multimodal.synthesizeWavs(Seq(4L).toDF("id"), "id") // 5*100 = 500ms
    val out = Multimodal.chunkAudioWindows(wavs, "id", "content", 150L, 100L)
      .orderBy("chunk_id").as[(Long, Int, Long, Long)].collect().toSeq
    assert(out == Seq(
      (4L, 0, 0L, 150L), (4L, 1, 100L, 250L), (4L, 2, 200L, 350L),
      (4L, 3, 300L, 450L), (4L, 4, 400L, 500L)))
    val junk = Seq((9L, "not audio".getBytes)).toDF("id", "content")
    assert(Multimodal.chunkAudioWindows(junk, "id", "content", 150L, 100L).count() == 0)
  }

  // ---- URL normalization -----------------------------------------------

  private def norm(u: String): String = {
    val df = Seq(u).toDF("url")
    df.select(Curation.normalizeUrl(col("url")).as("n")).as[String].head()
  }

  test("normalizeUrl: case, www, utm runs, fragments") {
    assert(norm("HTTPS://WWW.Example.COM/Path/X?id=3#frag") ==
      "https://example.com/Path/X?id=3")
    // path/query case is PRESERVED (paths are case-sensitive)
    assert(norm("http://example.com/CaseSensitive") ==
      "http://example.com/CaseSensitive")
    // leading utm run before a kept param
    assert(norm("http://a.com/p?utm_source=x&utm_medium=y&id=5") ==
      "http://a.com/p?id=5")
    // kept param first, trailing utm run
    assert(norm("http://a.com/p?id=5&utm_source=x&utm_campaign=z") ==
      "http://a.com/p?id=5")
    // utm params surrounding a kept param
    assert(norm("http://a.com/p?utm_a=1&id=5&utm_b=2") == "http://a.com/p?id=5")
    // only utm params → no dangling '?'
    assert(norm("http://a.com/p?utm_source=x") == "http://a.com/p")
    assert(norm("http://a.com/p?utm_a=1&utm_b=2") == "http://a.com/p")
  }

  test("normalizeUrl: schemeless input degrades to lowercased trim") {
    assert(norm("  Example.COM/Path  ") == "example.com/path")
  }

  test("normalizeUrl: userinfo dropped, explicit port kept") {
    assert(norm("http://user:pw@Example.com/x") == "http://example.com/x")
    assert(norm("http://Example.com:8080/x?utm_a=1") == "http://example.com:8080/x")
    // spoofed userinfo cannot masquerade as the host
    assert(norm("http://good.com@evil.com/x") == "http://evil.com/x")
  }

  test("urlHost strips www/userinfo/port and lowercases; empty on schemeless") {
    val df = Seq("HTTP://WWW.Sub.Example.COM/x", "nota url",
      "http://good.com@evil.com/x", "https://a.com:8443/p",
      "http://u@www.B.com:80/").toDF("url")
    val hosts = df.select(Curation.urlHost(col("url")).as("h"))
      .as[String].collect().toSeq
    assert(hosts == Seq("sub.example.com", "", "evil.com", "a.com", "b.com"))
  }

  test("quantileBuckets: terciles per group, exact ≡ approx on small frames, nulls handled") {
    // group a: scores 1..9 → terciles at q(1/3)=3.67, q(2/3)=6.33
    // (quantile_cont interpolation): head {1,2,3}, middle {4,5,6}, tail {7,8,9}
    // group b: constant scores → every threshold equals the score → all head
    val rows = (1 to 9).map(i => ("a", i.toDouble, i.toLong)) ++
      (1 to 3).map(i => ("b", 5.0, 100L + i))
    val df = rows.toDF("g", "score", "id")
    def buckets(exact: Boolean) =
      Curation.quantileBuckets(df, "g", "score", exact = exact)
        .select("id", "bucket").as[(Long, String)].collect().toMap
    val ex = buckets(exact = true)
    assert((1L to 3L).forall(ex(_) == "head") && (4L to 6L).forall(ex(_) == "middle") &&
      (7L to 9L).forall(ex(_) == "tail"), s"unexpected: $ex")
    assert((101L to 103L).forall(ex(_) == "head"))
    // GK with default accuracy is exact at this size
    assert(buckets(exact = false) == ex)
    // null score → null bucket; null group dropped by the key join
    val withNulls = Seq(("a", Some(1.0), 1L), ("a", Some(9.0), 2L),
      ("a", None, 999L), (null.asInstanceOf[String], Some(5.0), 998L))
      .toDF("g", "score", "id")
    val nb = Curation.quantileBuckets(withNulls, "g", "score", exact = true)
      .select("id", "bucket").as[(Long, Option[String])].collect().toMap
    assert(nb(999L).isEmpty, "null score must bucket to null")
    assert(!nb.contains(998L), "null group must be dropped")
    val custom = Curation.quantileBuckets(df, "g", "score",
      probs = Seq(0.5), labels = Seq("keep", "drop"), bucketCol = "verdict")
    assert(custom.columns.contains("verdict"))
    intercept[IllegalArgumentException] {
      Curation.quantileBuckets(df, "g", "score", probs = Seq(0.5), labels = Seq("only"))
    }
  }

  test("quantileBuckets: metacharacter column names resolve via the typed API") {
    // the aggregate is built from Columns, not interpolated SQL — a
    // score column whose name carries a backtick (or spaces/quotes)
    // must bucket identically to a plain name, not break the parser
    val rows = (1 to 9).map(i => ("a", i.toDouble, i.toLong))
    val weird = "sc`ore it\"self"
    val df = rows.toDF("g", weird, "id")
    val out = Curation.quantileBuckets(df, "g", weird, exact = true)
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert((1L to 3L).forall(out(_) == "head") &&
      (7L to 9L).forall(out(_) == "tail"), s"unexpected: $out")
  }
}
