package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-facing function registration via SparkSessionExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  // `withExtensions` only takes effect when getOrCreate CONSTRUCTS the
  // session — if another suite's shared session is already the default,
  // the builder silently reuses it and no function gets registered
  // (suite-ordering flake). Clearing active+default forces a fresh
  // SparkSession (same SparkContext, new sessionState WITH extensions).
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("custom expressions are callable from SQL") {
    val row = spark.sql(
      """SELECT
        |  simhash64(split('the quick brown fox', ' ')) AS sh,
        |  size(hashed_shingles('a b c d e', 3)) AS nsh,
        |  size(minhash_sig(split('a b c d e', ' '), 16)) AS nmh,
        |  size(winnow_fingerprint('abcdefghijklmnopqrstuvwxyz', 8, 16)) AS nwf,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  size(lsh_buckets(array(0.1d, 0.2d), 4, 4, 2)) AS nlsh,
        |  text_quality('the quick brown fox was in the box') AS tq,
        |  text_langid('der hund und die katze ist nicht da') AS tl,
        |  dup_gram_fraction('a b c a b c a b c a b c', 3) AS dg
        |""".stripMargin).head()
    assert(row.getAs[Long]("sh") != 0L)
    assert(row.getAs[Int]("nsh") == 3)
    assert(row.getAs[Int]("nmh") == 16)
    assert(row.getAs[Int]("nwf") >= 1)
    assert(row.getAs[Double]("dp") == 11.0)
    assert(row.getAs[Int]("nlsh") == 4)
    assert(row.getAs[Double]("tq") > 0.0 && row.getAs[Double]("tq") <= 1.0)
    assert(row.getAs[String]("tl") == "de")
    assert(row.getAs[Double]("dg") > 0.5)
  }

  test("non-literal size arguments fail with a clear analysis-time message") {
    // BIGINT literal converts; a column reference must be rejected with
    // an explanatory error, not a ClassCastException/NPE at eval time
    assert(spark.sql("SELECT size(hashed_shingles('a b c d', 3L)) AS n")
      .head().getInt(0) == 2)
    val e = intercept[Exception] {
      spark.sql("SELECT hashed_shingles('a b c', id) FROM range(1)").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("must be a literal integer")),
      s"got: ${messages(e)}")
  }

  test("SQL and DataFrame APIs produce identical sketches") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextExpressions
    val viaSql = spark.sql(
      "SELECT simhash64(split('hello world foo bar', ' ')) AS s").head().getLong(0)
    val viaDf = spark.range(1).select(
      TextExpressions.simhash64(split(lit("hello world foo bar"), " ")).as("s"))
      .head().getLong(0)
    assert(viaSql == viaDf)
  }
}
