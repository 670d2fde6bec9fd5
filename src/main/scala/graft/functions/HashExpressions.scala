package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hashing primitives behind
  * MinHash-LSH and SimHash dedup. Implemented as expressions (not UDFs)
  * so they serialize into the plan, avoid SerDe of Scala closures per
  * row, and keep null semantics Catalyst-native. They evaluate directly
  * over `UTF8String` bytes — no String allocation per shingle.
  *
  * CodegenFallback is deliberate: the per-row work is a tight JVM loop
  * over the array already; codegen would only inline the loop head.
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

/** `minhash_signature(shingles)` → `array<long>` of length `numHashes`.
  * Empty/null arrays → array of Long.MaxValue (no shingle evidence).
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
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
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `simhash64(tokens)` → 64-bit SimHash of an `array<string>` token
  * column: per-token FNV hash, per-bit ±1 vote, sign → bit. */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
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
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Column-level entry points. */
object HashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def minhashSignature(shingles: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    toCol(MinHashSignature(toExpr(shingles), numHashes, seed))

  def simhash64(tokens: Column, seed: Long = 42L): Column =
    toCol(SimHash64(toExpr(tokens), seed))
}
