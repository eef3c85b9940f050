package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Cross-document boilerplate removal (Dedup.boilerplate). */
class BoilerplateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val header = "ACCEPT COOKIES"
  private val footer = "(c) example.com"

  private def fixture = Seq(
    (1L, s"$header\nalpha one\n\nbeta two\n$footer"),
    (2L, s"$header\ngamma three\n$footer"),
    (3L, s"$header\ndelta four\n$footer"),
    (4L, s"$header\n$footer"),                  // fully boilerplate
    (5L, "echo five\necho five\necho five"))    // self-repeats: df=1
    .toDF("doc_id", "text")

  test("corpus-frequent lines strip; order, blanks, self-repeats survive") {
    val out = Dedup.boilerplate(fixture, minDf = 3L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_dropped"))).toMap

    // header+footer (df=4 >= 3) stripped everywhere; body intact
    assert(out(1L)._1 == "alpha one\n\nbeta two") // blank line preserved
    assert(out(1L) == ("alpha one\n\nbeta two", 5L, 2L))
    assert(out(2L) == ("gamma three", 3L, 2L))
    assert(out(3L) == ("delta four", 3L, 2L))
    // a doc made entirely of boilerplate keeps its row, empty text
    assert(out(4L) == ("", 2L, 2L))
    // df is per-DOCUMENT: repeating your own line never promotes it
    assert(out(5L) == ("echo five\necho five\necho five", 3L, 0L))
  }

  test("threshold is inclusive and blank lines are never candidates") {
    // header df=4: minDf=5 keeps it, minDf=4 strips it
    val kept = Dedup.boilerplate(fixture, minDf = 5L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_dropped")).toMap
    assert(kept.values.forall(_ == 0L))
    val cut = Dedup.boilerplate(fixture, minDf = 4L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_dropped")).toMap
    assert(cut(1L) == 2L && cut(4L) == 2L && cut(5L) == 0L)
    // many docs share blank lines (doc 1 has one; plant more) — blanks
    // must never strip even at minDf=2
    val blanky = Seq((1L, "a\n\nx"), (2L, "b\n\ny"), (3L, "c\n\nz"))
      .toDF("doc_id", "text")
    val b = Dedup.boilerplate(blanky, minDf = 2L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_dropped"))).toMap
    assert(b(1L) == ("a\n\nx", 0L))
  }

  test("NULL-text docs survive with NULL text and zero counts") {
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, s"$header\nalpha"),
        org.apache.spark.sql.Row(2L, s"$header\nbeta"),
        org.apache.spark.sql.Row(3L, null))),
      fixture.schema)
    val out = Dedup.boilerplate(withNull, minDf = 2L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_dropped"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))     // the doc row survives
    assert(out(3L) == (null, 0L, 0L))         // NULL through, counts 0
    assert(out(1L) == ("alpha", 2L, 1L))      // others unaffected
  }

  test("code detection separates planted code from prose") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.operators.ExtQueries.queries("q_text_code_detect")
    // sanity on the real fixture: runs, total rows, no NaN
    val rows = q(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getDouble(4).isNaN))
    // planted contrast on a hand frame through the same expressions
    import org.apache.spark.sql.functions._
    val code = "def f(x):\n  y = x + 1;\n  return (y);\n}"
    val prose = "The quick brown fox jumps over the lazy dog in the sun."
    val df = Seq((1L, code), (2L, prose)).toDF("doc_id", "text")
    df.createOrReplaceTempView("documents_tmp")
    val t = col("text")
    val nLines = size(split(t, "\n", -1)).cast("double")
    val symFrac = size(regexp_extract_all(t,
      lit("[{}()\\[\\];=<>]"), lit(0))).cast("double") /
      greatest(length(t).cast("double"), lit(1.0))
    val indentFrac = size(regexp_extract_all(t,
      lit("(?m)^(?: {2,}|\\t)"), lit(0))).cast("double") / nLines
    val eolFrac = size(regexp_extract_all(t,
      lit("(?m)[;{}][ \\t]*$"), lit(0))).cast("double") / nLines
    val score = symFrac + lit(0.5) * indentFrac + lit(0.5) * eolFrac
    val s = df.select(col("doc_id"), (score > lit(0.05)).as("is_code"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(s(1L) && !s(2L))
  }
}
