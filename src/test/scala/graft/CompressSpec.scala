package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Kernels, TextFunctions}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-ratio quality signal: the discriminative spread the gate
  * cannot restate (repetitive << natural << word-salad), determinism,
  * edge semantics, and kernel==expression parity through codegen. */
class CompressSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def k(s: String): Double =
    Kernels.deflateRatio(UTF8String.fromString(s))

  private val repetitive = "buy now click here " * 100
  private val natural =
    ("the quick brown fox jumps over the lazy dog while a curious " +
      "reader wonders what makes language compress the way it does " +
      "and whether entropy alone explains it ") * 5
  // deterministic "salad": no repeated words, no shared stems
  private val salad = (1 to 400)
    .map(i => s"w${i}x${i * 7919 % 104729}").mkString(" ")

  test("discriminative spread: repetitive << natural << salad") {
    assert(k(repetitive) < k(natural), s"${k(repetitive)} !< ${k(natural)}")
    assert(k(natural) < k(salad), s"${k(natural)} !< ${k(salad)}")
    assert(k(repetitive) < 0.1) // 100 copies collapse to back-references
  }

  test("determinism, bounds, edges") {
    assert(k(natural) === k(natural))
    assert(k("") === 1.0)
    // zlib worst case: tiny incompressible input may exceed 1.0 but
    // never by more than the block overhead
    val tiny = k("z")
    assert(tiny > 0.0 && tiny <= 65.0)
    val n = k(natural)
    assert(n > 0.0 && n < 1.0)
  }

  test("doubled text compresses strictly better (the gate invariant)") {
    Seq(natural, salad, repetitive).foreach { s =>
      assert(k(s + s) < k(s), s"doubling failed on len ${s.length}")
    }
  }

  test("expression matches kernel through whole-stage codegen; null -> null") {
    val df = Seq(
      (1L, Some(natural)), (2L, Some(repetitive)), (3L, Some("")),
      (4L, None: Option[String])
    ).toDF("id", "text")
    val got = df.select(col("id"),
      TextFunctions.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L) === Some(k(natural)))
    assert(got(2L) === Some(k(repetitive)))
    assert(got(3L) === Some(1.0))
    assert(got(4L) === None)
  }
}
