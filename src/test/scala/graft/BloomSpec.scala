package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bloom

/** Bloom-filter decontamination: packed-bitmap membership must equal
  * position-SET membership (the oracle's restatement level — DuckDB
  * cannot build the packed words, so this parity is what licenses the
  * set-form oracle), no false negatives ever, gram semantics pinned,
  * and end-to-end flagging of a planted leak. Engine-vs-oracle value
  * equality runs in the `q_decontaminate_bloom` driver row. */
class BloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val K = 4
  private val M = 1 << 12 // small bitmap → real collisions in-play
  private val Seed = "spec"

  private def items: Seq[String] = (1 to 300).map(i => s"item $i alpha")
  private def absent: Seq[String] = (1 to 300).map(i => s"other $i beta")

  /** Scala reference: the k md5-slice positions of an item. */
  private def refPositions(g: String): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest((g + ":" + Seed).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (0 until K).map(i =>
      java.lang.Long.parseLong(md.substring(i * 8, i * 8 + 8), 16) % M)
  }

  test("packed-bitmap membership == position-set membership, member and non-member") {
    val words = Bloom.build(items.toDF("g"), "g", K, M, Seed)
    val posSet: Set[Long] = items.flatMap(refPositions).toSet
    // packed words must encode exactly the reference position set
    val packedSet = (0L until M.toLong)
      .filter(p => ((words((p >> 6).toInt) >> (p & 63).toInt) & 1L) == 1L)
      .toSet
    assert(packedSet === posSet)
    // and the probe expression must agree with set semantics on both
    // planted members and absent probes (absent may false-positive —
    // but only when ALL its positions are in the set, same as the set form)
    val probes = (items ++ absent).toDF("g")
    val got = probes
      .select(col("g"), Bloom.mightContain(words, col("g"), K, M, Seed).as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    (items ++ absent).foreach { g =>
      val want = refPositions(g).forall(posSet.contains)
      assert(got(g) === want, s"probe '$g'")
    }
    // no false negatives, by construction
    items.foreach(g => assert(got(g), s"false negative on '$g'"))
  }

  test("containedCount kernel == per-gram mightContain (the probe Bloom.flag ships)") {
    val words = Bloom.build(items.toDF("g"), "g", K, M, Seed)
    // documents whose gram arrays mix members, absentees, and empties
    val df = Seq(
      (1L, items.take(5) ++ absent.take(3)),
      (2L, absent.take(4)),
      (3L, Seq.empty[String])
    ).toDF("id", "gs")
    val got = df.select(col("id"),
      graft.functions.BloomFunctions.containedCount(col("gs"),
        typedlit(words.toSeq), M, K, Seed).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.select(col("id"),
      size(filter(col("gs"),
        g => Bloom.mightContain(words, g, K, M, Seed))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got === want)
    assert(got(1L) >= 5L) // members always count
    assert(got(3L) === 0L)
  }

  test("fused contamination kernel == Column-composed grams + mightContain") {
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val evalGrams = eval
      .select(explode(Bloom.gramStrings(col("text"), 3)).as("g")).distinct()
    val words = Bloom.build(evalGrams, "g", K, M, Seed)
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "unrelated words entirely different from the probe text"),
      (3L, "  leading and trailing spaces  "),
      (4L, "short"),
      (5L, "a\tb\tc tab separated tokens and more of them here"),
      (6L, "x y x y x y repeated grams collapse to distinct")
    ).toDF("doc_id", "text")
    val fused = corpus.select(col("doc_id"),
      graft.functions.BloomFunctions.contamination(col("text"),
        typedlit(words.toSeq), 3, M, K, Seed).as("sc"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val composed = corpus.select(col("doc_id"),
      Bloom.gramStrings(col("text"), 3).as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("sz"),
        size(filter(col("gs"),
          g => Bloom.mightContain(words, g, K, M, Seed))).cast("long").as("nm"))
      .collect()
      .map(r => r.getLong(0) -> List(r.getLong(1), r.getLong(2))).toMap
    assert(fused === composed)
    assert(fused(1L)(0) === fused(1L)(1)) // verbatim leak: all grams hit
  }

  test("gramStrings: whole-text gram at <= n tokens, sliding distinct above") {
    val df = Seq(
      (1L, "a b"),              // 2 toks <= 3 → one whole-text gram
      (2L, "a b c d"),          // 2 sliding grams
      (3L, "x y x y x y x y")   // repeats collapse via distinct
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Bloom.gramStrings(col("text"), 3).as("gs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1L) === List("a b"))
    assert(got(2L) === List("a b c", "b c d"))
    assert(got(3L) === List("x y x", "y x y"))
  }

  test("flag: planted leak flagged at contamination 1.0; disjoint doc usually clean") {
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // verbatim leak
      (2L, "entirely unrelated sentence with different words here")
    ).toDF("doc_id", "text")
    val got = Bloom.flag(corpus, eval, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got(1L)._2 === 1.0 && got(1L)._3)
    // doc 2 shares no grams; with m=2^16 and ~7 eval grams the FPR is
    // ~(28/65536)^4 — astronomically below flagging threshold
    assert(!got(2L)._3)
    assert(got(2L)._2 < 0.5)
  }

  test("flag never undercounts the exact containment (no false negatives end-to-end)") {
    val eval = Seq((100L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "one two three unrelated padding words go here now"), // shares "one two three"
      (2L, "four five six seven and then something else entirely")
    ).toDF("doc_id", "text")
    val bloom = Bloom.flag(corpus, eval)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = graft.operators.Decontaminate
      .flag(corpus, eval)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (id, n) =>
      assert(bloom(id) >= n, s"doc $id: bloom ${bloom(id)} < exact $n")
    }
  }

  test("build rejects bad configs") {
    intercept[IllegalArgumentException](Bloom.build(items.toDF("g"), "g", 5, M, Seed))
    intercept[IllegalArgumentException](Bloom.build(items.toDF("g"), "g", 2, 100, Seed))
  }
}
