package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hashing primitives behind
  * MinHash-LSH and SimHash dedup. Implemented as expressions (not UDFs)
  * so they serialize into the plan, avoid SerDe of Scala closures per
  * row, and keep null semantics Catalyst-native. They evaluate directly
  * over `UTF8String` bytes — no String allocation per shingle.
  *
  * Each expression implements `doGenCode` as a static call into
  * [[HashEval]] (the same helpers `nullSafeEval` delegates to — one
  * code path for both modes), so the containing stage stays inside
  * whole-stage codegen instead of detouring through the interpreted
  * `eval` fallback per row, and array results are built with
  * `UnsafeArrayData.fromPrimitiveArray` — no per-element boxing the way
  * `GenericArrayData(Array[Long])` boxes. Round-12 sf10 measurement of
  * the switch is recorded in BASELINE.md.
  */
object Hashing {
  /** 64-bit FNV-1a over UTF-8 bytes — deterministic across JVMs and
    * partitions (unlike Object.hashCode), cheap, good avalanche for
    * shingle text. */
  def fnv1a64(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Cheap 2-universal-ish remix for the i-th MinHash permutation. */
  @inline def permute(h: Long, i: Int): Long = {
    // odd multipliers derived from splitmix64 of i — deterministic
    var z = (i.toLong + 0x9e3779b97f4a7c15L) * 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL; z ^= (z >>> 31)
    val a = z | 1L
    val b = java.lang.Long.rotateLeft(z, 17)
    a * h + b
  }
}

/** Shared single-pass tokenizer over UTF8String bytes: whitespace-split,
  * ASCII-lowercased word FNV hashes — no String allocation per token. */
object Tokenize {
  def wordHashes(s: UTF8String, seed: Long): Array[Long] = {
    val bytes = s.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Long](32)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        var h = 0xcbf29ce484222325L ^ seed
        while (i < n && !isWs(bytes(i))) {
          var b = bytes(i)
          if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
          h ^= (b & 0xffL)
          h *= 0x100000001b3L
          i += 1
        }
        out += h
      }
    }
    out.toArray
  }

  /** THE byte-level whitespace class for every tokenizing expression in
    * this package — exactly the Java-regex `\s` set, so byte-level
    * tokenization matches `split("\\s+")` (UTF-8 continuation bytes are
    * ≥ 0x80 and can never be mistaken for these). One definition: the
    * cross-formulation equalities the oracle gates pin (fused expression
    * == explode/split SQL) depend on every expression agreeing on it. */
  @inline def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** Order-sensitive combine of the word-hash window [i, i+n). */
  def shingleHash(wh: Array[Long], i: Int, n: Int): Long = {
    var h = 0x9e3779b97f4a7c15L
    var k = i
    while (k < i + n) {
      h = java.lang.Long.rotateLeft(h, 13) ^ wh(k)
      h *= 0x100000001b3L
      k += 1
    }
    h
  }

  /** Distinct sorted shingle hashes of a text. */
  def shingleHashes(s: UTF8String, n: Int, seed: Long): Array[Long] = {
    val wh = wordHashes(s, seed)
    if (wh.length < n) return Array.empty
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + n <= wh.length) { set.add(shingleHash(wh, i, n)); i += 1 }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }
}

/** Shared evaluation bodies for the expressions in this file — plain
  * methods on a plain object so the Scala compiler emits STATIC
  * FORWARDERS, letting generated (Janino) code call them directly:
  * `graft.functions.HashEval.m(...)`. Every expression's
  * `nullSafeEval` delegates to the same method its `doGenCode` emits a
  * call to, so interpreted and codegen modes cannot diverge. Array
  * results are `UnsafeArrayData.fromPrimitiveArray` — one flat byte
  * buffer, no per-element boxing, and downstream unsafe writers copy
  * it bytewise. */
object HashEval {
  def shingleArray(s: UTF8String, n: Int, seed: Long): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Tokenize.shingleHashes(s, n, seed))

  def positionalShingleArray(s: UTF8String, n: Int, seed: Long): ArrayData = {
    val wh = Tokenize.wordHashes(s, seed)
    if (wh.length < n) UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    else {
      val out = new Array[Long](wh.length - n + 1)
      var i = 0
      while (i + n <= wh.length) { out(i) = Tokenize.shingleHash(wh, i, n); i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  def minhashFromText(s: UTF8String, n: Int, numHashes: Int, seed: Long): ArrayData = {
    val wh = Tokenize.wordHashes(s, seed)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    @inline def absorb(base: Long): Unit = {
      var k = 0
      while (k < numHashes) {
        val h = Hashing.permute(base, k)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
    }
    if (wh.length > 0 && wh.length < n) {
      // short-document fallback: one shingle spanning all words (see
      // MinHashFromText doc)
      absorb(Tokenize.shingleHash(wh, 0, wh.length))
    } else {
      var i = 0
      while (i + n <= wh.length) {
        absorb(Tokenize.shingleHash(wh, i, n))
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** All `bands` LSH band hashes of a minhash signature in ONE pass,
    * value-identical to the declarative form it replaces —
    * `xxhash64(slice(sig, b*rowsPerBand+1, rowsPerBand), b)` — which
    * Spark evaluates INTERPRETED (Slice allocates a GenericArrayData
    * copy per band per row inside a non-codegen ArrayTransform; at 64
    * bands × millions of docs that eval dominated ingest batches).
    * Spark's xxhash64 over (array<long>, int) folds left to right:
    * acc starts at the expression seed 42, each array element folds
    * via XXH64.hashLong, then the band index folds via XXH64.hashInt
    * — replicated here exactly, pinned by a spec against the
    * declarative original. */
  def lshBandHashes(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = sig.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var i = b * rowsPerBand
      val end = math.min(n, i + rowsPerBand)
      while (i < end) { acc = XXH64.hashLong(sig.getLong(i), acc); i += 1 }
      out(b) = XXH64.hashInt(b, acc)
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def simhashFromText(s: UTF8String, seed: Long): Long = {
    val wh = Tokenize.wordHashes(s, seed)
    val votes = new Array[Int](64)
    var j = 0
    while (j < wh.length) {
      val h = wh(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** null (boxed) when the document has zero tokens — see
    * [[SimHashMd5FromText]]. */
  def simhashMd5(input: UTF8String): java.lang.Long = {
    val bytes = input.toLowerCase.getBytes
    val md = SimHashMd5FromText.digests.get()
    val votes = new Array[Int](60)
    var any = false
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && Tokenize.isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Tokenize.isWs(bytes(i))) i += 1
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // first 15 hex nibbles = bytes 0..6 + the high nibble of byte 7
        var h = 0L
        var k = 0
        while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        h = (h << 4) | ((d(7) & 0xffL) >>> 4)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        any = true
      }
    }
    if (!any) null
    else {
      var out = 0L
      var b = 0
      while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
  }

  /** Six-hex-digit fold of md5(UTF-8 bytes of `s`), 1-based hex window
    * `[start, start+5]`, mod `buckets` — the native form of the
    * declarative `pmod(fold(ascii digits of md5(key)), buckets)` idiom
    * ([[HashFunctions.md5Fold6]]). Value-identical by construction: hex
    * digit `i` of an md5 string IS nibble `i-1` of the digest, and the
    * ascii arithmetic decodes exactly that nibble, so the fold is the
    * 24-bit digest window mod buckets (non-negative, so `%` == pmod).
    * One digest per row via the shared thread-local — the Column-tree
    * form re-evaluated the full md5 once per digit reference (12× per
    * key: 6 digits × the two ascii comparisons), which made the fold
    * the dominant per-row cost of every md5-bucketed operator. */
  def md5HexFold(s: UTF8String, start: Int, buckets: Long): Long = {
    val md = SimHashMd5FromText.digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var k = start - 1 // 0-based nibble index
    val end = start + 5
    while (k < end) {
      val b = d(k >> 1) & 0xff
      v = (v << 4) | (if ((k & 1) == 0) b >>> 4 else b & 0xf)
      k += 1
    }
    v % buckets
  }

  def sortedIntersectCount(x: ArrayData, y: ArrayData): Int = {
    var i = 0; var j = 0; var n = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  /** null (boxed) on dimension mismatch or a null element — see
    * [[DotProduct]]. */
  def dotProduct(x: ArrayData, y: ArrayData, leftFloat: Boolean,
      rightFloat: Boolean, leftMayHoldNull: Boolean,
      rightMayHoldNull: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if ((leftMayHoldNull && x.isNullAt(i)) ||
          (rightMayHoldNull && y.isNullAt(i))) return null
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** null when an element is null or a dot comes out NaN — see
    * [[NearestCentroids]]. */
  def nearestCentroids(v: ArrayData, centroids: Array[Array[Double]], n: Int,
      childFloat: Boolean, childMayHoldNull: Boolean): ArrayData = {
    val dim = v.numElements()
    val m = math.min(n, centroids.length)
    val bestIdx = Array.tabulate(m)(identity)
    val bestDot = new Array[Double](m)
    java.util.Arrays.fill(bestDot, Double.NegativeInfinity)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var acc = 0.0
      var i = 0
      val lim = math.min(dim, cent.length)
      while (i < lim) {
        if (childMayHoldNull && v.isNullAt(i)) return null
        val xv = if (childFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += xv * cent(i)
        i += 1
      }
      if (acc != acc) return null
      if (acc > bestDot(m - 1)) {
        var p = m - 1
        while (p > 0 && bestDot(p - 1) < acc) {
          bestDot(p) = bestDot(p - 1); bestIdx(p) = bestIdx(p - 1); p -= 1
        }
        bestDot(p) = acc; bestIdx(p) = c
      }
      c += 1
    }
    // distinctness fixup (see NearestCentroids doc)
    val seen = new java.util.HashSet[Integer]()
    var q = 0
    var nextFree = 0
    while (q < m) {
      if (!seen.add(bestIdx(q))) {
        while (seen.contains(nextFree)) nextFree += 1
        bestIdx(q) = nextFree
        seen.add(nextFree)
      }
      q += 1
    }
    UnsafeArrayData.fromPrimitiveArray(bestIdx)
  }

  def minhashSignature(arr: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val base = Hashing.fnv1a64(s.getBytes, seed)
        var i = 0
        while (i < numHashes) {
          val h = Hashing.permute(base, i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  def simhash64(arr: ArrayData, seed: Long): Long = {
    val votes = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = Hashing.fnv1a64(arr.getUTF8String(j).getBytes, seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** `text_shingle_hashes(text)` → distinct sorted `array<long>` of word
  * n-gram shingle hashes. Fused tokenize+shingle+hash in one byte pass —
  * replaces a split/transform/slice/concat_ws higher-order pipeline that
  * profiled ~30× slower (per-element array allocs). Hash identity stands
  * in for string identity; 64-bit collisions are negligible at any
  * per-document shingle count. */
case class TextShingleHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    HashEval.shingleArray(input.asInstanceOf[UTF8String], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashEval.shingleArray($c, $n, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): TextShingleHashes =
    copy(child = newChild)
}

/** `positional_shingle_hashes(text)` → `array<long>` where element `i`
  * is the order-sensitive hash of the word window `[i, i+n)` — the
  * POSITIONAL counterpart of [[TextShingleHashes]] (which collapses to
  * a distinct sorted set and so cannot say WHERE a shingle occurred).
  * Texts with fewer than `n` words yield an empty array. Same fused
  * single-byte-pass tokenizer ([[Tokenize.wordHashes]]) and window
  * combine ([[Tokenize.shingleHash]]) as every other text-hash
  * expression here, so position `i` of this array and member
  * membership in `TextShingleHashes` agree by construction. Feeds
  * [[graft.operators.Dedup.repeatedWindowMatches]], which needs
  * (position, hash) to locate cross-document repeated spans, not just
  * detect them. */
case class PositionalShingleHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    HashEval.positionalShingleArray(input.asInstanceOf[UTF8String], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashEval.positionalShingleArray($c, $n, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): PositionalShingleHashes =
    copy(child = newChild)
}

/** `lsh_band_hashes(sig)` → `array<long>` of the signature's `bands`
  * LSH band hashes (see [[HashEval.lshBandHashes]] for the exact
  * value contract vs the declarative slice/xxhash64 form). */
case class LshBandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    HashEval.lshBandHashes(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashEval.lshBandHashes($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): LshBandHashes =
    copy(child = newChild)
}

/** `minhash_from_text(text)` → `array<long>` signature, fusing tokenize →
  * shingle-hash → permute-min in a single pass (no shingle strings, no
  * intermediate arrays). */
case class MinHashFromText(child: Expression, n: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  // short documents (0 < words < n) absorb ONE shingle spanning all
  // words, so IDENTICAL short docs still collide (est_jaccard 1.0)
  // while different short docs get unrelated signatures — without
  // this, either every short-doc pair scores a spurious 1.0
  // (all-MaxValue signatures) or exact short duplicates go undetected
  override protected def nullSafeEval(input: Any): Any =
    HashEval.minhashFromText(input.asInstanceOf[UTF8String], n, numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashEval.minhashFromText($c, $n, $numHashes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashFromText =
    copy(child = newChild)
}

/** `simhash_from_text(text)` → 64-bit SimHash, fused with tokenization
  * (single byte pass; same token hashing as [[Tokenize.wordHashes]]). */
case class SimHashFromText(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      HashEval.simhashFromText(input.asInstanceOf[UTF8String], seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashEval.simhashFromText($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): SimHashFromText =
    copy(child = newChild)
}

/** `simhash_md5_from_text(text)` → ENGINE-PORTABLE 60-bit SimHash, fused
  * into one pass per document: tokens are the non-whitespace runs of
  * `lower(text)` (byte-level walk — UTF-8 continuation bytes are ≥ 0x80,
  * so splitting on ASCII `\s` bytes is exactly the regex `\s+` split),
  * each token's hash is the first 15 hex chars of md5(token) parsed
  * base-16 (60 bits, big-endian nibbles — bit-for-bit what DuckDB's
  * `('0x' || substr(md5(w),1,15))::BIGINT` computes), per-bit ±1 majority
  * vote over bits 0..59, sign → bit.
  *
  * Returns NULL for documents with zero tokens — the explode-based
  * formulation drops such docs (no rows to aggregate), so callers filter
  * `isNotNull` to keep identical semantics (and empty docs must be
  * excluded from pairing anyway: they'd all collide at hamming 0).
  *
  * Replaces the gate query's explode + 60-column vote aggregate, which
  * cost a full shuffle on id plus a wide-agg plan (~5-6 s at sf0.1 and a
  * "plan too large" warning) for what is one map-side byte pass. */
case class SimHashMd5FromText(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  // null input OR zero-token input → null
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HashEval.simhashMd5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("simhashMd5")
      s"""
         |java.lang.Long $r = graft.functions.HashEval.simhashMd5($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5FromText =
    copy(child = newChild)
}

object SimHashMd5FromText {
  // MessageDigest is stateful and not thread-safe; local-mode tasks share
  // the JVM, so keep one instance per thread
  private[functions] val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** `md5_hex_fold(key)` → long: six-hex-digit fold of md5(key), window
  * starting at 1-based hex position `start`, mod `buckets` — the native
  * single-digest form of the engine-portable md5 bucket idiom (see
  * [[HashEval.md5HexFold]] for the value-identity argument, and
  * [[HashFunctions.md5Fold6]] for the oracle-side SQL it replays).
  * Null input → null. Input is the KEY string (not a precomputed hex
  * digest — [[HashFunctions.md5HexFoldAt]] keeps the declarative fold
  * for callers that digest once and fold several windows). */
case class Md5HexFold(child: Expression, start: Int, buckets: Long)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_hex_fold needs a string key, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    HashEval.md5HexFold(input.asInstanceOf[UTF8String], start, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashEval.md5HexFold($c, $start, ${buckets}L)")

  override protected def withNewChildInternal(newChild: Expression): Md5HexFold =
    copy(child = newChild)
}

/** `sorted_intersect_count(a, b)` → int: size of the intersection of two
  * SORTED long arrays via a two-pointer merge — O(n+m) with zero
  * allocation, vs array_intersect's per-row hash-set build. Inputs must
  * be sorted ascending and duplicate-free (TextShingleHashes guarantees
  * both). */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(HashEval.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HashEval.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongIntersectCount =
    copy(left = l, right = r)
}

/** `dot_product(a, b)` → double: strict left-to-right double-precision
  * accumulation — bit-identical to `aggregate(zip_with(a,b,*),0d,+)` but
  * a plain loop instead of per-element lambda machinery (~10× faster in
  * the ANN scan). Accepts float or double arrays. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // also null on array-dimension mismatch (matching zip_with's
  // null-padding semantics) or a null ELEMENT (matching the
  // documented-equivalent aggregate(zip_with(a,b,*),0d,+) null
  // propagation), independent of child nullability
  override def nullable: Boolean = true

  private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val leftMayHoldNull =
    left.dataType.asInstanceOf[ArrayType].containsNull
  private lazy val rightMayHoldNull =
    right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashEval.dotProduct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat, leftMayHoldNull, rightMayHoldNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotProduct")
      s"""
         |java.lang.Double $r = graft.functions.HashEval.dotProduct(
         |  $a, $b, $leftFloat, $rightFloat, $leftMayHoldNull, $rightMayHoldNull);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** `nearest_centroids(vec)` → `array<int>` of the `n` centroid indices
  * with the highest dot product against the (unit-normalized) centroid
  * set — the cell-assignment / probe-selection primitive for true
  * (centroid-based) IVF. With unit centroids, argmax dot == argmax
  * cosine, so the query vector's own norm never needs computing here.
  * One tight loop per row; `n` is tiny (1 for assignment, nprobe for
  * probing) so selection is insertion into a fixed-size top list. */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression {
  require(n >= 1, s"NearestCentroids needs n >= 1 (got $n)")
  require(centroids.nonEmpty, "NearestCentroids needs a non-empty centroid set")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // null input OR null array element OR NaN dot → null (same
  // propagation as DotProduct: reading a null slot uninspected would
  // silently assign the vector to a garbage cell; NaN comparisons are
  // all false, so without the NaN check the seed/fixup path would
  // silently assign arbitrary cells 0..m-1). The top-m list is
  // pre-seeded with DISTINCT indices and duplicate-fixed after, so the
  // result is always n distinct cells — the caller's
  // each-pair-at-most-once invariant via explode depends on it.
  override def nullable: Boolean = true

  private lazy val childFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val childMayHoldNull =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any =
    HashEval.nearestCentroids(input.asInstanceOf[ArrayData], centroids, n,
      childFloat, childMayHoldNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the centroid model rides along as a referenced object — codegen
    // closes over the same array the interpreted path uses
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("nearestCells")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.HashEval.nearestCentroids(
         |    $c, $cents, $n, $childFloat, $childMayHoldNull);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** `minhash_signature(shingles)` → `array<long>` of length `numHashes`.
  * Empty/null arrays → array of Long.MaxValue (no shingle evidence).
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    HashEval.minhashSignature(input.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashEval.minhashSignature($c, $numHashes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `simhash64(tokens)` → 64-bit SimHash of an `array<string>` token
  * column: per-token FNV hash, per-bit ±1 vote, sign → bit. */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      HashEval.simhash64(input.asInstanceOf[ArrayData], seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashEval.simhash64($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Column-level entry points. */
object HashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def minhashSignature(shingles: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    toCol(MinHashSignature(toExpr(shingles), numHashes, seed))

  def minhashFromText(text: Column, shingleSize: Int, numHashes: Int, seed: Long): Column =
    toCol(MinHashFromText(toExpr(text), shingleSize, numHashes, seed))

  def textShingleHashes(text: Column, n: Int, seed: Long = 42L): Column =
    toCol(TextShingleHashes(toExpr(text), n, seed))

  def positionalShingleHashes(text: Column, n: Int, seed: Long = 42L): Column =
    toCol(PositionalShingleHashes(toExpr(text), n, seed))

  def lshBandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    toCol(LshBandHashes(toExpr(sig), bands, rowsPerBand))

  def simhash64(tokens: Column, seed: Long = 42L): Column =
    toCol(SimHash64(toExpr(tokens), seed))

  def simhashFromText(text: Column, seed: Long = 42L): Column =
    toCol(SimHashFromText(toExpr(text), seed))

  def simhashMd5FromText(text: Column): Column =
    toCol(SimHashMd5FromText(toExpr(text)))

  def dotProduct(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    toCol(SortedLongIntersectCount(toExpr(a), toExpr(b)))

  def nearestCentroids(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    toCol(NearestCentroids(toExpr(vec), centroids, n))

  /** Value of the 1-based i-th hex digit of a lowercase-hex string
    * column (md5 output) — THE engine-portable digit decode every
    * md5-derived deterministic draw in the library shares; the exact
    * ascii arithmetic replays verbatim in any SQL engine's oracle. */
  def md5HexDigit(hexCol: Column, i: Int): Column = {
    import org.apache.spark.sql.functions._
    val a = ascii(substring(hexCol, i, 1))
    a - when(a >= 97, lit(87)).otherwise(lit(48))
  }

  /** First-6-hex-digit fold of md5(key), mod `buckets` — PERFECTLY
    * uniform exactly when buckets divides 16^6 (hence the require).
    * The single shared md5 bucket idiom behind mixing thresholds, DSIR
    * feature hashing, Gumbel/A-ES draws and the JL sign matrix —
    * one definition, so cross-engine parity cannot drift per caller. */
  def md5Fold6(key: Column, buckets: Long): Column = {
    require(buckets >= 2 && 16777216L % buckets == 0,
      s"buckets must divide 16^6 for an unbiased fold (got $buckets)")
    // native single-digest expression — the declarative
    // md5HexFoldAt(md5(key), …) tree re-evaluates the md5 per digit
    // reference (12× per key); Md5HexFold is value-identical
    // (HashCodegenSpec pins it against the declarative original)
    toCol(Md5HexFold(toExpr(key), 1, buckets))
  }

  /** [[md5Fold6]] with a caller-chosen 1-based hex window start — the
    * native form of `md5HexFoldAt(md5(key), start, buckets)` for
    * callers that draw SEVERAL independent buckets from one key (CMS
    * rows). Each draw digests the key once natively, which measures
    * cheaper than one declarative digest plus per-digit substring/ascii
    * trees over the materialized hex attribute. */
  def md5FoldAt(key: Column, start: Int, buckets: Long): Column = {
    require(buckets >= 2 && 16777216L % buckets == 0,
      s"buckets must divide 16^6 for an unbiased fold (got $buckets)")
    require(start >= 1 && start + 5 <= 32,
      s"fold window [$start, ${start + 5}] must sit inside the 32 md5 hex digits")
    toCol(Md5HexFold(toExpr(key), start, buckets))
  }

  /** Six-hex-digit fold of an ALREADY-COMPUTED digest column, starting
    * at 1-based position `start`, mod `buckets`. Callers that need
    * several independent draws from one key (CMS rows) or that fold in
    * a hot loop should md5 ONCE into its own projection and fold from
    * the attribute — the inline fold re-evaluates the digest per digit
    * (6×; measured 15 s → 3 s on the CMS sketch build at sf0.1). */
  def md5HexFoldAt(hexCol: Column, start: Int, buckets: Long): Column = {
    import org.apache.spark.sql.functions._
    require(buckets >= 2 && 16777216L % buckets == 0,
      s"buckets must divide 16^6 for an unbiased fold (got $buckets)")
    require(start >= 1 && start + 5 <= 32,
      s"fold window [$start, ${start + 5}] must sit inside the 32 md5 hex digits")
    val v = (start until start + 6).map(md5HexDigit(hexCol, _))
      .reduce((acc, h) => acc * 16 + h)
    pmod(v, lit(buckets)).cast("long")
  }
}
