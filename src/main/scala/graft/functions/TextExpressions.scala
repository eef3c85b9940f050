package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the sketch primitives Spark lacks —
  * single-pass, allocation-light, evaluated on InternalRow (no UDF
  * serialization). Used by graft.operators.Dedup / Text.
  *
  * Determinism: all seeds are compile-time constants derived via
  * splitmix64, so signatures are reproducible across runs/engines.
  */
object Hashing {
  /** splitmix64 — public-domain seed expander (Steele et al., JDK
    * SplittableRandom). */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def xx64(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
}

/** MinHash signature of a shingle set: k minimums of pairwise-independent
  * affine transforms of one base xxhash64 per shingle. O(n·k), one pass.
  * (Broder's minwise hashing; k=128 default per common MinHash-LSH use.)
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val as: Array[Long] =
    Array.tabulate(k)(j => Hashing.splitmix64(2L * j) | 1L) // odd → bijective
  private lazy val bs: Array[Long] =
    Array.tabulate(k)(j => Hashing.splitmix64(2L * j + 1))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h = Hashing.xx64(arr.getUTF8String(i), 42L)
      var j = 0
      while (j < k) {
        val v = as(j) * h + bs(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** DISTINCT hashed word n-gram shingles of a text in ONE primitive pass:
  * whitespace-tokenize the UTF-8 bytes, xxhash64 each token in place
  * (no substring allocation), combine n consecutive token hashes.
  * Equivalent as a SET to hashing the joined shingle strings (two
  * shingles collide iff their token sequences match, modulo 2^-64
  * hash collisions). Docs with ≤ n tokens yield one whole-doc shingle.
  * Replaces a split+transform+slice+concat_ws HOF chain that was ~10×
  * slower (interpreted closure per element). */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    // token boundaries over ASCII whitespace (UTF-8 safe: multibyte
    // chars never contain 0x09-0x20 bytes)
    val tokHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    var start = -1
    while (i <= len) {
      val isWs = i == len || {
        val b = org.apache.spark.unsafe.Platform.getByte(bytes, off + i)
        b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'
      }
      if (isWs) {
        if (start >= 0) {
          tokHashes += XXH64.hashUnsafeBytes(bytes, off + start, i - start, 42L)
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    val m = tokHashes.length
    val out =
      if (m == 0) Array.empty[Long]
      else if (m <= n) {
        var h = 1125899906842597L
        var j = 0
        while (j < m) { h = h * 31 + tokHashes(j); j += 1 }
        Array(h)
      } else {
        val res = new Array[Long](m - n + 1)
        var j = 0
        while (j <= m - n) {
          var h = 1125899906842597L
          var t = j
          while (t < j + n) { h = h * 31 + tokHashes(t); t += 1 }
          res(j) = h
          j += 1
        }
        res
      }
    val set = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j < out.length) { set.add(out(j)); j += 1 }
    val distinct = new Array[Long](set.size)
    val it = set.iterator()
    var idx = 0
    while (it.hasNext) { distinct(idx) = it.next(); idx += 1 }
    new GenericArrayData(distinct)
  }

  override protected def withNewChildInternal(c: Expression): HashedShingles =
    copy(child = c)
}

/** MinHash signature over pre-hashed shingles (see [[HashedShingles]]):
  * skips the per-shingle string hash of [[MinHashSig]]. */
case class MinHashSigFromHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_hashed"

  private lazy val as: Array[Long] =
    Array.tabulate(k)(j => Hashing.splitmix64(2L * j) | 1L)
  private lazy val bs: Array[Long] =
    Array.tabulate(k)(j => Hashing.splitmix64(2L * j + 1))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = as(j) * h + bs(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigFromHashes =
    copy(child = c)
}

/** 64-bit SimHash of a token multiset (Charikar 2002): per-bit vote of
  * each token's xxhash64, sign → bit. One pass, O(n·64). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = Hashing.xx64(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Winnowed rolling-hash document fingerprint (Schleimer et al., MOSS,
  * SIGMOD'03): hash every `gram`-char window, keep the minimum of each
  * `window`-hash sliding window (rightmost on ties), distinct + sorted.
  * Robust to local edits; sub-linear output size. */
case class WinnowFingerprint(child: Expression, gram: Int, window: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < gram) return new GenericArrayData(Array.empty[Long])
    // polynomial rolling hashes of all grams
    val m = n - gram + 1
    val hs = new Array[Long](m)
    var h = 0L
    var pow = 1L
    val B = 1000003L
    var i = 0
    while (i < gram) { h = h * B + s.charAt(i); if (i < gram - 1) pow *= B; i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + gram - 1)
      hs(i) = h
      i += 1
    }
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    if (m <= window) selected += hs.min
    else {
      var start = 0
      while (start <= m - window) {
        var best = start
        var j = start
        while (j < start + window) { if (hs(j) <= hs(best)) best = j; j += 1 }
        selected += hs(best)
        start += 1
      }
    }
    new GenericArrayData(selected.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprint =
    copy(child = c)
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhashSig(shingles: Column, k: Int = 128): Column =
    column(MinHashSig(expression(shingles), k))

  def hashedShingles(text: Column, n: Int = 3): Column =
    column(HashedShingles(expression(text), n))

  def minhashSigFromHashes(shingleHashes: Column, k: Int = 128): Column =
    column(MinHashSigFromHashes(expression(shingleHashes), k))

  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))

  def winnowFingerprint(text: Column, gram: Int = 8, window: Int = 16): Column =
    column(WinnowFingerprint(expression(text), gram, window))
}
