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

  // --- text quality / language-ID kernels -------------------------------
  //
  // Single-pass replacements for the Column-composed heuristics in
  // [[TextFunctions]] (kept there as `*Composed` reference restatements).
  // The composed trees evaluate INTERPRETED (higher-order `filter`/
  // `aggregate` lambdas have no codegen) and re-run the `split` regex
  // per sub-score — measured ~0.6 ms/doc, which made corpus scoring the
  // single most expensive stage of `Curate.corpus`. Semantics are
  // replicated bit-exactly (same trim-space + `\s+` split with limit -1,
  // codepoint lengths, ASCII \p{Punct} class, identical double-op
  // order), which the equivalence spec and the unchanged DuckDB oracle
  // hashes both pin.

  private val wsSplit = java.util.regex.Pattern.compile("\\s+")

  /** Spark `trim(col)` semantics: strip only ' ' (0x20), both ends. */
  private def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Spark `TextFunctions.tokens` semantics: empty-after-trim → empty
    * array; otherwise Java-regex `\s+` split with limit -1 (so a
    * leading non-space whitespace char yields a leading "" token). */
  private def splitTokens(s: String): Array[String] = {
    val t = trimSpaces(s)
    if (t.isEmpty) Array.empty[String] else wsSplit.split(t, -1)
  }

  /** English stopword list — single source of truth shared with the
    * Column-composed restatements in TextFunctions. */
  val stopwordsEnList: Seq[String] = Seq("the", "a", "an", "of", "to",
    "and", "in", "is", "that", "it", "was", "for", "on", "with", "as")

  private val stopwordsEn: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwordsEnList.foreach(s.add)
    s
  }

  @inline private def isAsciiPunct(cp: Int): Boolean =
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)

  /** Composite quality score in [0,1] — C4/Gopher-style cheap
    * heuristics; exact semantics of `TextFunctions.qualityScoreComposed`
    * in one pass over tokens + one codepoint scan. */
  def textQuality(input: UTF8String): Double = {
    val s = input.toString
    val toks = splitTokens(s)
    val nTok = toks.length
    var nsw = 0
    var sumLen = 0L
    var j = 0
    while (j < nTok) {
      val t = toks(j)
      if (stopwordsEn.contains(t)) nsw += 1
      sumLen += t.codePointCount(0, t.length)
      j += 1
    }
    // length(text) and punctCount both count CODEPOINTS (UTF8String
    // numChars semantics), not UTF-16 units.
    var i = 0
    var nChars = 0
    var nPunct = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (isAsciiPunct(cp)) nPunct += 1
      i += Character.charCount(cp)
    }
    val nTokD = nTok.toDouble
    val lenScore = math.min(nTokD / 64.0, 1.0)
    val swRatio = if (nTok == 0) 0.0 else nsw.toDouble / nTokD
    val swScore = math.min(swRatio * 4.0, 1.0)
    val punctRatio = nPunct.toDouble / math.max(nChars.toDouble, 1.0)
    val punctScore = math.max(0.0, 1.0 - punctRatio * 4.0)
    val mtl = if (nTok == 0) 0.0 else sumLen.toDouble / nTokD
    val mtlScore = if (mtl >= 3.0 && mtl <= 10.0) 1.0 else 0.5
    (lenScore + swScore + punctScore + mtlScore) / 4.0
  }

  /** Per-language function-word profiles (textcat-style closed-class
    * lists) — single source of truth shared with TextFunctions. Order
    * matters: earlier profiles win score ties. */
  val langProfilesList: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est", "dans", "que", "pour"),
    "es" -> Seq("el", "los", "de", "y", "en", "un", "que", "por", "con", "para"))

  /** Duplicate word-n-gram fraction (Gopher-style repetition signal):
    * 1 − distinct/total over the doc's token n-grams; docs with ≤ n
    * tokens score 0.0 (no repetition evidence). Bit-exact semantics of
    * `TextFunctions.dupGramFractionComposed` — grams are the
    * space-joined token strings, distinct as STRINGS (not hashes, so
    * equality exactly matches `array_distinct`). */
  def dupGramFraction(input: UTF8String, n: Int): Double = {
    val toks = splitTokens(input.toString)
    val m = toks.length
    if (m <= n) return 0.0
    val total = m - n + 1
    val seen = new java.util.HashSet[String](total * 2)
    val sb = new java.lang.StringBuilder()
    var i = 0
    var distinct = 0
    while (i < total) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      if (seen.add(sb.toString)) distinct += 1
      i += 1
    }
    1.0 - distinct.toDouble / total
  }

  private val langProfiles: Array[(UTF8String, java.util.HashSet[String])] =
    langProfilesList.map { case (lang, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      UTF8String.fromString(lang) -> s
    }.toArray
  private val langUnd = UTF8String.fromString("und")
  private val langZh = UTF8String.fromString("zh")

  /** Language ID — exact semantics of `TextFunctions.langIdComposed`:
    * CJK codepoint presence → zh; else argmax of function-word hits over
    * the lowercased tokens (ties break to profile order); no hits → und.
    * Lowercasing delegates to UTF8String.toLowerCase — the SAME code the
    * `lower()` expression runs, so exotic case mappings cannot drift. */
  def langId(input: UTF8String): UTF8String = {
    val s = input.toString
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp >= 0x4e00 && cp <= 0x9fff) return langZh
      i += Character.charCount(cp)
    }
    val toks = splitTokens(input.toLowerCase().toString)
    val counts = new Array[Int](langProfiles.length)
    var j = 0
    while (j < toks.length) {
      val t = toks(j)
      var p = 0
      while (p < langProfiles.length) {
        if (langProfiles(p)._2.contains(t)) counts(p) += 1
        p += 1
      }
      j += 1
    }
    var best = 0
    var p = 0
    while (p < counts.length) {
      if (counts(p) > best) best = counts(p)
      p += 1
    }
    if (best == 0) return langUnd
    p = 0
    while (counts(p) != best) p += 1
    langProfiles(p)._1
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

  /** k-means argmin: POSITION (row index into the flattened
    * centroid matrix) of the centroid with the smallest squared L2 —
    * accumulation strictly ascending in j with a 0.0 seed and a
    * strict `<` comparison, so the result (and every intermediate
    * double) is bit-identical to the `aggregate(zip_with(...))` left
    * fold AND DuckDB's `list_reduce`, with the first minimum (=
    * lowest centroid position) winning ties — the `ORDER BY d2, cid`
    * contract the q_cluster_kmeans oracle restates. */
  def nearestCentroidL2(v: ArrayData, cents: ArrayData, dim: Int): Long = {
    val x = v.toDoubleArray()
    val n = math.min(x.length, dim)
    val nlist = cents.numElements() / dim
    var best = 0L
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < nlist) {
      val base = c * dim
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = x(i) - cents.getDouble(base + i)
        s += d * d
        i += 1
      }
      if (s < bestD) { bestD = s; best = c.toLong }
      c += 1
    }
    best
  }

  /** The minimum squared L2 itself — same fold, same tie semantics as
    * [[nearestCentroidL2]] (strict `<`, so both kernels agree on the
    * winning centroid). */
  def nearestCentroidL2Dist(v: ArrayData, cents: ArrayData, dim: Int): Double = {
    val x = v.toDoubleArray()
    val n = math.min(x.length, dim)
    val nlist = cents.numElements() / dim
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < nlist) {
      val base = c * dim
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = x(i) - cents.getDouble(base + i)
        s += d * d
        i += 1
      }
      if (s < bestD) bestD = s
      c += 1
    }
    bestD
  }

  /** Whole bloom-decontamination probe for one document in one call:
    * trim (ASCII space only — Spark/DuckDB `trim` semantics) → regex
    * `\\s+` split (java.util.regex, the engine Spark's `split` uses,
    * with the same leading-empty-token edge) → distinct word n-grams
    * (whole-text gram at ≤ n tokens — [[graft.operators.Bloom
    * .gramStrings]] restated imperatively) → per-gram k-slice md5
    * probe against the packed words. Returns [distinctGramCount,
    * containedCount]. The Column-composed probe builds every gram
    * through interpreted `transform`/`array_join` lambdas — measured
    * 3.4s vs 0.5s for the whole q_decontaminate_bloom key at sf0.1;
    * this kernel is that cost collapsed into codegen. Parity with the
    * Column form is BloomSpec-pinned. */
  def bloomContamination(text: UTF8String, words: ArrayData, n: Int,
      mBits: Int, k: Int, suffix: Array[Byte]): ArrayData = {
    val s = text.toString
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    val toks: Array[String] = s.substring(a, b).split("\\s+", -1)
    val grams = new java.util.LinkedHashSet[String]()
    if (toks.length <= n) grams.add(toks.mkString(" "))
    else {
      var i = 0
      val sb = new java.lang.StringBuilder()
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        grams.add(sb.toString)
        i += 1
      }
    }
    val md = md5Local.get()
    var contained = 0L
    val it = grams.iterator()
    while (it.hasNext) {
      val g = it.next()
      md.reset()
      md.update(g.getBytes("UTF-8"))
      md.update(suffix)
      val dig = md.digest()
      var ok = true
      var j = 0
      while (ok && j < k) {
        val o = 4 * j
        val p = (((dig(o) & 0xffL) << 24) | ((dig(o + 1) & 0xffL) << 16) |
          ((dig(o + 2) & 0xffL) << 8) | (dig(o + 3) & 0xffL)) % mBits
        ok = ((words.getLong((p >> 6).toInt) >>> (p & 63L).toInt) & 1L) == 1L
        j += 1
      }
      if (ok) contained += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(grams.size.toLong, contained))
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Bloom probe over a gram array in ONE kernel call per row: for
    * each gram, the i-th bit position is the i-th 4-byte big-endian
    * slice of md5(gram ++ suffix) mod mBits — numerically IDENTICAL
    * to `conv(substr(md5hex, 8i+1, 8), 16, 10) % mBits` (8 hex chars
    * = 4 digest bytes) — and the gram counts iff all k bits are set
    * in the packed word array. The Column-composed form of the same
    * arithmetic runs interpreted inside `filter`'s lambda (4 md5 hex
    * round-trips per gram) and measured ~8× slower on the bench.
    * NULL grams (impossible from gramStrings; defensive) don't
    * count. */
  def bloomContainedCount(grams: ArrayData, words: ArrayData,
      mBits: Int, k: Int, suffix: Array[Byte]): Long = {
    val n = grams.numElements()
    val md = md5Local.get()
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        md.reset()
        md.update(grams.getUTF8String(i).getBytes)
        md.update(suffix)
        val dig = md.digest()
        var ok = true
        var j = 0
        while (ok && j < k) {
          val b = 4 * j
          val p = (((dig(b) & 0xffL) << 24) | ((dig(b + 1) & 0xffL) << 16) |
            ((dig(b + 2) & 0xffL) << 8) | (dig(b + 3) & 0xffL)) % mBits
          ok = ((words.getLong((p >> 6).toInt) >>> (p & 63L).toInt) & 1L) == 1L
          j += 1
        }
        if (ok) cnt += 1
      }
      i += 1
    }
    cnt
  }

  /** PQ asymmetric-distance-computation sum: `codes(j)` indexes a
    * per-subspace lookup row in the flattened `m×k` table (row-major,
    * one row per subspace), so the approximate dot product is
    * `Σ_j tab(j·k + codes(j))` — m adds per corpus row, no vector math
    * at serve time. Out-of-range codes contribute 0 (defensive; the
    * encoder can't emit them). */
  def adcSum(codes: ArrayData, tab: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getLong(j).toInt
      if (c >= 0 && c < k) s += tab.getDouble(j * k + c)
      j += 1
    }
    s
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

  /** Text-hygiene normalization: strip C0/C1 control characters
    * (keeping `\n` and `\t`), Unicode-NFC-normalize, then trim
    * leading/trailing whitespace (space/`\n`/`\t` — `\r` is already
    * stripped as a control). Strip-then-normalize order is mirrored by
    * the DuckDB oracle (`nfc_normalize(regexp_replace(...))`). The
    * fast path: a pure-ASCII string with nothing to strip or trim
    * returns the input untouched (no allocation) — at 100 TB most of
    * a web corpus takes it. */
  def normalizeClean(input: UTF8String): UTF8String = {
    val s = input.toString
    var needsWork = false
    var i = 0
    while (i < s.length && !needsWork) {
      val c = s.charAt(i)
      needsWork = (c < 0x20 && c != '\n' && c != '\t') ||
        (c >= 0x7f && c <= 0x9f) || c > 0x7f
      i += 1
    }
    if (!needsWork) {
      val t = trimWs(s)
      return if (t eq s) input else UTF8String.fromString(t)
    }
    val sb = new java.lang.StringBuilder(s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val strip = (c < 0x20 && c != '\n' && c != '\t') ||
        (c >= 0x7f && c <= 0x9f)
      if (!strip) sb.append(c)
      i += 1
    }
    val nfc = java.text.Normalizer.normalize(sb, java.text.Normalizer.Form.NFC)
    UTF8String.fromString(trimWs(nfc))
  }

  /** Raw-DEFLATE compression ratio of the text's UTF-8 bytes at
    * level 6: compressed/raw — the classic gibberish/repetition
    * signal (highly repetitive spam compresses far below natural
    * text; random word-salad barely compresses). Raw deflate (nowrap)
    * so the 2-byte zlib header + 4-byte adler don't dominate short
    * docs. JVM-deterministic (java.util.zip wraps the bundled zlib at
    * a fixed level/strategy) but NOT engine-restatable — DuckDB has
    * no deflate-length function — so the driver row gates
    * restatable INVARIANTS (bound + doubled-text monotonicity) and
    * CompressSpec pins the discriminative behavior. Empty text → 1.0
    * (nothing to compress, neutral). */
  def deflateRatio(input: UTF8String): Double = {
    val bytes = input.getBytes
    if (bytes.length == 0) 1.0
    else {
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(bytes)
        d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        total.toDouble / bytes.length
      } finally d.end()
    }
  }

  private def trimWs(s: String): String = {
    var a = 0
    var b = s.length
    @inline def ws(c: Char) = c == ' ' || c == '\n' || c == '\t'
    while (a < b && ws(s.charAt(a))) a += 1
    while (b > a && ws(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }
}
