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

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def stopwordLangId(text: Column, langs: Seq[(String, Seq[String])]): Column =
    toCol(StopwordLangId(toExpr(text), langs))
}
