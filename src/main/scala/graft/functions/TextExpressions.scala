package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `stopword_lang_id(text)` → predicted language code: argmax of
  * function-word hits per language, earlier-listed language wins ties,
  * "und" when no token matches any list.
  *
  * Fuses tokenize → per-language membership → counters in ONE byte pass
  * over the UTF8String — replaces a transform/isin/size(filter) pipeline
  * whose per-row lambda machinery profiled 10–30× slower (same cure as
  * TextShingleHashes/MinHashFromText). Semantics are identical to the
  * column-function formulation: tokens are maximal runs of
  * non-whitespace (Java `\s` classes, same as [[Tokenize.wordHashes]]),
  * matched ASCII-case-insensitively, and a token sitting in SEVERAL
  * languages' lists (e.g. "un" in both fr and es) counts for each.
  * Unicode-vs-ASCII lowercasing cannot change membership because every
  * stopword is pure ASCII.
  */
case class StopwordLangId(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  private val nLangs = langs.length
  require(nLangs <= 31, "language bitmask is an Int")

  @transient private lazy val langNames: Array[UTF8String] =
    langs.map(l => UTF8String.fromString(l._1)).toArray

  // stopword lookup: FNV hash of the lowercased word → (word bytes, lang
  // bitmask); hash hit is verified by byte compare, so collisions with
  // arbitrary tokens cannot miscount
  @transient private lazy val table: java.util.HashMap[java.lang.Long, (Array[Byte], Int)] = {
    val m = new java.util.HashMap[java.lang.Long, (Array[Byte], Int)]()
    langs.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val bytes = w.toLowerCase.getBytes("UTF-8")
        val h = Hashing.fnv1a64(bytes, 0L)
        val prev = m.get(h)
        val mask = (if (prev == null) 0 else prev._2) | (1 << i)
        m.put(h, (bytes, mask))
      }
    }
    m
  }

  // the single shared tokenizer whitespace class — see Tokenize.isWs
  @inline private def isWs(b: Byte): Boolean = Tokenize.isWs(b)

  private def sameLowered(w: Array[Byte], bytes: Array[Byte], start: Int, end: Int): Boolean = {
    if (w.length != end - start) return false
    var k = 0
    while (k < w.length) {
      var b = bytes(start + k)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if (b != w(k)) return false
      k += 1
    }
    true
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val counts = new Array[Int](nLangs)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        var h = 0xcbf29ce484222325L
        while (i < n && !isWs(bytes(i))) {
          var b = bytes(i)
          if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
          h ^= (b & 0xffL)
          h *= 0x100000001b3L
          i += 1
        }
        val hit = table.get(h)
        if (hit != null && sameLowered(hit._1, bytes, start, i)) {
          val mask = hit._2
          var l = 0
          while (l < nLangs) {
            if ((mask & (1 << l)) != 0) counts(l) += 1
            l += 1
          }
        }
      }
    }
    var best = 0
    var bestIdx = -1
    var l = 0
    while (l < nLangs) {
      // strict > keeps the FIRST language reaching the max — the
      // documented earlier-listed-wins tie rule
      if (counts(l) > best) { best = counts(l); bestIdx = l }
      l += 1
    }
    if (bestIdx < 0) UTF8String.fromString("und") else langNames(bestIdx)
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordLangId =
    copy(child = newChild)
}

/** `text_stats(text)` → struct of the six exact counters every quality
  * / token query derives from:
  * (n_chars, n_alpha, n_punct, n_ws, n_ws_tokens, n_bpe_tokens).
  *
  * Fuses what the column-function formulation spells as FIVE regex
  * passes plus a split/filter pipeline ([[graft.operators.TextAnalysis
  * .qualityColumns]]) into ONE byte pass over the UTF8String — the
  * text-quality scan is a pure map stage, so at corpus scale this is
  * the whole cost of the operator.
  *
  * Semantics are bit-identical to the regex formulation (the DuckDB
  * oracle gates prove it):
  *   - counts are per CODE POINT: a continuation byte (10xxxxxx)
  *     advances no counter, so `n_chars` = `length()`;
  *   - alpha = ASCII `[A-Za-z]`, ws = Java `\s` (ASCII incl. 0x0B —
  *     [[Tokenize.isWs]]), punct = any other code point INCLUDING
  *     non-ASCII (exactly `[^A-Za-z0-9\s]`, which is what the regex
  *     counts: 'é' is "punct" there too);
  *   - ws tokens = maximal non-ws runs (split + non-empty filter);
  *   - bpe tokens = `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` matches: letter
  *     runs and digit runs count once, every other non-ws code point
  *     counts alone.
  */
case class TextStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: DataType = TextStats.schema
  override def nullable: Boolean = child.nullable

  /** Real `doGenCode` (not CodegenFallback): the byte loop is emitted as
    * a generated-class method, so a projection over TextStats stays one
    * WholeStageCodegen span with no interpreted-eval call per row. The
    * hash/ANN expressions got the same treatment in round 12 (static
    * calls into HashEval/PqEval — BASELINE.md carries the sf10
    * measurements); [[StopwordLangId]] and [[WordChunks]] keep
    * CodegenFallback because their gates cost <2 s even at sf10 —
    * conversion would be unmeasurable. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val rowCls = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
      val fn = ctx.freshName("textStats")
      val method = ctx.addNewFunction(fn,
        s"""
           |private InternalRow $fn(UTF8String s) {
           |  byte[] bytes = s.getBytes();
           |  int n = bytes.length;
           |  long chars = 0L, alpha = 0L, punct = 0L, ws = 0L, wsToks = 0L, bpeToks = 0L;
           |  int prev = 0; // 0=ws/start, 1=alpha, 2=digit, 3=other
           |  for (int i = 0; i < n; i++) {
           |    byte b = bytes[i];
           |    if ((b & 0xc0) == 0x80) continue; // continuation byte
           |    chars++;
           |    if (b >= 0) {
           |      if (b == 32 || b == 9 || b == 10 || b == 11 || b == 12 || b == 13) {
           |        ws++; prev = 0;
           |      } else if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
           |        alpha++;
           |        if (prev == 0) wsToks++;
           |        if (prev != 1) bpeToks++;
           |        prev = 1;
           |      } else if (b >= '0' && b <= '9') {
           |        if (prev == 0) wsToks++;
           |        if (prev != 2) bpeToks++;
           |        prev = 2;
           |      } else {
           |        punct++;
           |        if (prev == 0) wsToks++;
           |        bpeToks++;
           |        prev = 3;
           |      }
           |    } else { // lead byte of a multi-byte code point
           |      punct++;
           |      if (prev == 0) wsToks++;
           |      bpeToks++;
           |      prev = 3;
           |    }
           |  }
           |  Object[] vals = new Object[]{chars, alpha, punct, ws, wsToks, bpeToks};
           |  return new $rowCls(vals);
           |}
         """.stripMargin)
      s"${ev.value} = $method($c);"
    })

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    var chars = 0L; var alpha = 0L; var punct = 0L; var ws = 0L
    var wsToks = 0L; var bpeToks = 0L
    // prev byte class for run detection: 0=ws/start, 1=alpha, 2=digit, 3=other
    var prev = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0xc0) == 0x80) {
        // continuation byte of a code point already classified at its
        // lead byte: no counter moves, run state unchanged
      } else {
        chars += 1
        if (b >= 0) { // ASCII
          if (Tokenize.isWs(b)) {
            ws += 1; prev = 0
          } else if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
            alpha += 1
            if (prev == 0) wsToks += 1
            if (prev != 1) bpeToks += 1
            prev = 1
          } else if (b >= '0' && b <= '9') {
            if (prev == 0) wsToks += 1
            if (prev != 2) bpeToks += 1
            prev = 2
          } else {
            punct += 1
            if (prev == 0) wsToks += 1
            bpeToks += 1 // every other char is its own BPE-ish token
            prev = 3
          }
        } else { // lead byte of a multi-byte code point → "other" class
          punct += 1
          if (prev == 0) wsToks += 1
          bpeToks += 1
          prev = 3
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(chars, alpha, punct, ws, wsToks, bpeToks)
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_ws", LongType, nullable = false),
    StructField("n_ws_tokens", LongType, nullable = false),
    StructField("n_bpe_tokens", LongType, nullable = false)))
}

/** `word_chunks(text, chunkLen, stride)` → array of chunk strings:
  * lowercased whitespace tokens joined by single spaces, in windows of
  * `chunkLen` tokens whose starts are `stride` apart; the last window
  * may be short; no tokens → empty array.
  *
  * Native rather than composed because the composition is an optimizer
  * hazard: `transform(sequence(…), i => slice(words, …))` re-evaluates
  * the words tree per chunk even when the words array is staged in its
  * own projection — CollapseProject inlines it back into the lambda, and
  * an n-word doc costs O(n²/stride). Here: one `toLowerCase` (the exact
  * `lower()` semantics), one span scan, and per-chunk byte concatenation
  * — O(n · chunkLen/stride) bytes, no re-tokenization.
  */
case class WordChunks(child: Expression, chunkLen: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.ArrayType

  require(chunkLen > 0 && stride > 0 && stride <= chunkLen,
    s"need 0 < stride <= chunkLen, got chunkLen=$chunkLen stride=$stride")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[UTF8String].toLowerCase
    val bytes = lowered.getBytes
    val n = bytes.length
    // token spans [start, end) over the lowered bytes
    val starts = new scala.collection.mutable.ArrayBuffer[Int](32)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](32)
    var i = 0
    while (i < n) {
      while (i < n && Tokenize.isWs(bytes(i))) i += 1
      if (i < n) {
        starts += i
        while (i < n && !Tokenize.isWs(bytes(i))) i += 1
        ends += i
      }
    }
    val nWords = starts.length
    if (nWords == 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val nChunks = (nWords - 1) / stride + 1
      val out = new Array[Any](nChunks)
      var c = 0
      while (c < nChunks) {
        val from = c * stride
        val until = math.min(from + chunkLen, nWords)
        var len = 0
        var w = from
        while (w < until) { len += ends(w) - starts(w) + 1; w += 1 }
        val buf = new Array[Byte](len - 1) // single-space joins, no trailing
        var pos = 0
        w = from
        while (w < until) {
          if (w > from) { buf(pos) = ' '; pos += 1 }
          val l = ends(w) - starts(w)
          System.arraycopy(bytes, starts(w), buf, pos, l)
          pos += l
          w += 1
        }
        out(c) = UTF8String.fromBytes(buf)
        c += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)
}

/** `unicode_normalize(text, form)` — Unicode normalization (NFC / NFD /
  * NFKC / NFKD via `java.text.Normalizer`), the canonicalization step
  * a multilingual corpus needs before dedup and fingerprinting:
  * "café" spelled e+COMBINING ACUTE and as the precomposed é are
  * DIFFERENT byte strings (different hashes, different shingles,
  * different exact-dedup keys) until normalized.
  *
  * Scale shape: pure per-row expression — one map stage, no shuffle.
  * The hot path never leaves the UTF8String: a byte scan detects pure
  * ASCII (always normalized in every form) and returns the INPUT
  * object, so the String round-trip + Normalizer call is paid only by
  * rows that can actually change — on mostly-ASCII web corpora the
  * common case is a read-only scan. Codegen'd via a static helper so a
  * projection over it stays one WholeStageCodegen span.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  require(UnicodeNormalize.Forms.contains(form),
    s"form must be one of ${UnicodeNormalize.Forms.mkString(", ")} (got '$form')")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String],
      java.text.Normalizer.Form.valueOf(form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UnicodeNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.normalize($c, java.text.Normalizer.Form.$form);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** ASCII fast path + Normalizer slow path; returns the input object
    * unchanged (no copy) when no byte ≥ 0x80. */
  def normalize(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) {
        return UTF8String.fromString(
          java.text.Normalizer.normalize(s.toString, form))
      }
      i += 1
    }
    s
  }
}

/** Apply a trained BPE merge list to an array of words — each merge
  * applied fully (greedy leftmost non-overlapping, at the SYMBOL-LIST
  * level, so boundary safety holds by construction) before the next,
  * exactly [[graft.operators.Bpe]]'s training semantics. Native rather
  * than composed because a per-merge expression layer makes Catalyst
  * plan depth O(merge count) — a real tokenizer's ~30k merges would
  * stack-overflow analysis long before execution; here the merge list
  * lives in the expression and the plan stays O(1) deep.
  *
  * `pairs` are rank-ordered "x y" strings (two space-free symbols).
  * Symbols are Unicode code points at initialization — the same unit
  * as the training side's `substr(word, i, 1)`. Per-word cost is
  * O(merges × symbols); the classic rank-map tokenizer trick would
  * make it O(symbols² log) independent of vocabulary size, but its
  * iterate-until-no-pair order can differ from apply-in-rank-order on
  * held-out text — this expression keeps the order that provably
  * reproduces training segmentations. */
case class BpeSegmentWords(child: Expression, pairs: Seq[String])
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.ArrayType

  pairs.foreach(p => require(p.split(" ", -1).length == 2 && !p.contains("  "),
    s"BPE pair must be two space-separated symbols (got '$p')"))

  private lazy val mergeSeq: Array[(String, String, String)] =
    pairs.map { p =>
      val i = p.indexOf(' ')
      val x = p.substring(0, i); val y = p.substring(i + 1)
      (x, y, x + y)
    }.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val out = new scala.collection.mutable.ArrayBuffer[Any](words.numElements())
    var wi = 0
    while (wi < words.numElements()) {
      val w = words.getUTF8String(wi).toString
      // initial symbols: one per Unicode code point (= substr semantics)
      var sy = new Array[String](w.codePointCount(0, w.length))
      var ci = 0; var si = 0
      while (ci < w.length) {
        val cp = w.codePointAt(ci)
        sy(si) = new String(Character.toChars(cp))
        si += 1; ci += Character.charCount(cp)
      }
      var mi = 0
      while (mi < mergeSeq.length) {
        val (x, y, m) = mergeSeq(mi)
        if (sy.length >= 2) {
          var changed = false
          val buf = new scala.collection.mutable.ArrayBuffer[String](sy.length)
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == x && sy(i + 1) == y) {
              buf += m; i += 2; changed = true
            } else { buf += sy(i); i += 1 }
          }
          if (changed) sy = buf.toArray
        }
        mi += 1
      }
      var k = 0
      while (k < sy.length) { out += UTF8String.fromString(sy(k)); k += 1 }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentWords =
    copy(child = newChild)
}

/** `lower_ws_tokens(text)` → `array<string>`: THE engine's shared
  * declarative tokenizer
  * `filter(split(lower(trim(text)), "\\s+"), w => length(w) > 0)`
  * as one native expression. Value-identical by construction
  * (TextExpressionFuzzSpec pins it on adversarial unicode):
  *
  *   - `trim` removes ASCII space (0x20) from both ends —
  *     `UTF8String.trim()` is exactly SQL trim's default;
  *   - `lower` is `UTF8String.toLowerCase` on the WHOLE trimmed string
  *     (Lower's own implementation), so contextual mappings (Greek
  *     final sigma) agree with the declarative order lower(trim(x));
  *   - tokens are maximal runs of non-`\s` bytes (Java-regex `\s` =
  *     the [[Tokenize.isWs]] set; UTF-8 continuation bytes are ≥ 0x80
  *     and can never collide), which is what regex-split-on-`\s+`
  *     plus the length>0 filter leaves: consecutive separators yield
  *     no empty tokens, and the boundary empties the split emits are
  *     exactly the ones the filter drops;
  *   - null text → null (the declarative chain's null propagation).
  *
  * Why it exists (r17): the regex split + lambda filter chain measured
  * 10–30× slower per row than the native byte passes (sf10 same-run
  * ladder: text_tokens' fused TextStats tokenize-count 0.8 s vs a
  * single bm25Words corpus pass 29 s over identical documents) — the
  * same cure as [[StopwordLangId]]/[[TextStats]], applied to the
  * token-STRING paths (BM25 postings, NB training, BPE word types,
  * vocab, tfidf, bigram LM, k-gram curation) that the hash-path
  * natives ([[Tokenize]]) deliberately bypassed. Token slices share
  * the lowered string's byte array — no per-token copy. */
case class LowerWsTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    LowerWsTokens.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LowerWsTokens.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): LowerWsTokens =
    copy(child = newChild)
}

object LowerWsTokens {
  def tokens(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val lowered = s.trim().toLowerCase()
    val bytes = lowered.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](16)
    var i = 0
    while (i < n) {
      while (i < n && Tokenize.isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Tokenize.isWs(bytes(i))) i += 1
        out += UTF8String.fromBytes(bytes, start, i - start)
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def stopwordLangId(text: Column, langs: Seq[(String, Seq[String])]): Column =
    toCol(StopwordLangId(toExpr(text), langs))

  /** Lower-cased whitespace tokens — the shared tokenizer of the BM25 /
    * NB / BPE / curation family as a native expression (see
    * [[LowerWsTokens]] for the value-identity argument). */
  def lowerWsTokens(text: Column): Column = toCol(LowerWsTokens(toExpr(text)))

  def textStats(text: Column): Column = toCol(TextStats(toExpr(text)))

  def wordChunks(text: Column, chunkLen: Int, stride: Int): Column =
    toCol(WordChunks(toExpr(text), chunkLen, stride))

  /** Unicode-normalize a string column (default NFC). */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    toCol(UnicodeNormalize(toExpr(text), form))

  /** BPE-segment an array-of-words column with rank-ordered merges. */
  def bpeSegmentWords(words: Column, pairs: Seq[String]): Column =
    toCol(BpeSegmentWords(toExpr(words), pairs))
}
