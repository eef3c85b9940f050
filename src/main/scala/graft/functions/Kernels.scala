package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel bodies for the custom expressions.
  *
  * Scala `object` methods get static forwarders, so generated
  * whole-stage-codegen Java can call `graft.functions.Kernels.xxx(...)`
  * directly — the expressions implement `doGenCode` as a static call
  * instead of `CodegenFallback`, keeping the enclosing codegen stage
  * intact (no InternalRow boxing round trip per row).
  */
object Kernels {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnowed rolling-hash fingerprint body (Schleimer et al., MOSS,
    * SIGMOD'03): hash every `gram`-char window, keep each `window`-hash
    * sliding window's minimum (rightmost on ties), distinct + sorted. */
  def winnowFingerprint(input: UTF8String, gram: Int, window: Int): ArrayData = {
    val s = input.toString
    val n = s.length
    if (n < gram) return new GenericArrayData(Array.empty[Long])
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

  def hashedShingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    val tokHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    var start = -1
    while (i <= len) {
      val isWs = i == len || {
        val b = Platform.getByte(bytes, off + i)
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

  private val seedCache = new ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def seeds(k: Int): (Array[Long], Array[Long]) =
    seedCache.computeIfAbsent(k, k => (
      Array.tabulate(k)(j => Hashing.splitmix64(2L * j) | 1L),
      Array.tabulate(k)(j => Hashing.splitmix64(2L * j + 1))))

  def minhashFromHashes(arr: ArrayData, k: Int): ArrayData = {
    val (as, bs) = seeds(k)
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

  def minhashFromStrings(arr: ArrayData, k: Int): ArrayData = {
    val (as, bs) = seeds(k)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
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

  private val planeCache = new ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()
  private def planes(tables: Int, bits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((tables, bits, dim), { case (t, b, d) =>
      Array.tabulate(t * b)(p => Array.tabulate(d)(c =>
        Hashing.splitmix64(p.toLong * d + c).toDouble / Long.MaxValue.toDouble))
    })

  /** Index of the max-dot-product centroid (== nearest on unit vectors).
    * `cents` is the row-major flattened nlist×dim centroid matrix (a plan
    * literal — KB-scale model state shipped once per task, not per row).
    * Ties break to the lowest cell index. */
  def nearestCentroid(v: ArrayData, cents: ArrayData, dim: Int): Long = {
    val x = v.toDoubleArray()
    val n = math.min(x.length, dim)
    val nlist = cents.numElements() / dim
    var best = 0L
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < nlist) {
      val base = c * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += x(i) * cents.getDouble(base + i); i += 1 }
      if (s > bestDot) { bestDot = s; best = c.toLong }
      c += 1
    }
    best
  }

  def lshBuckets(input: ArrayData, tables: Int, bits: Int, dim: Int): ArrayData = {
    val v = input.toDoubleArray()
    val n = math.min(v.length, dim)
    val ps = planes(tables, bits, dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bits) {
        val plane = ps(t * bits + b)
        var d = 0.0
        var c = 0
        while (c < n) { d += v(c) * plane(c); c += 1 }
        if (d >= 0.0) key |= (1L << b)
        b += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }
}
