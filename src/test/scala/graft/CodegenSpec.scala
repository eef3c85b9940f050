package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextExpressions => TE, VectorExpressions => VE}

/** Regression guard: every custom expression must evaluate under
  * CODEGEN_ONLY (i.e. its doGenCode compiles and runs) — a silent
  * fallback would break whole-stage fusion in the hot paths. */
class CodegenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("custom expressions evaluate under forced codegen") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((1L, "the quick brown fox jumps over the lazy dog",
        Array(0.1, 0.2, 0.3, 0.4))).toDF("id", "text", "vec")
      val row = df.select(
        size(TE.hashedShingles(col("text"))).as("nsh"),
        size(TE.minhashSigFromHashes(TE.hashedShingles(col("text")), 16)).as("nmh"),
        size(TE.minhashSig(split(col("text"), " "), 16)).as("nms"),
        TE.simhash64(split(col("text"), " ")).as("sim"),
        size(TE.winnowFingerprint(col("text"))).as("nwf"),
        TE.textQuality(col("text")).as("tq"),
        TE.textLangId(col("text")).as("tl"),
        TE.dupGramFraction(col("text")).as("dg"),
        size(VE.lshBuckets(col("vec"), 4, 4, 4)).as("nlsh"),
        VE.dotFast(col("vec"), col("vec")).as("dp"),
        // two centroids: (1,0,0,0) and the vector's own direction —
        // argmax dot must pick cell 1
        VE.nearestCentroid(col("vec"),
          Array(1.0, 0.0, 0.0, 0.0, 0.1, 0.2, 0.3, 0.4), 4).as("cell")).head()
      assert(row.getAs[Int]("nsh") == 7)
      assert(row.getAs[Int]("nmh") == 16 && row.getAs[Int]("nms") == 16)
      assert(row.getAs[Long]("sim") != 0L)
      assert(row.getAs[Int]("nwf") >= 1 && row.getAs[Int]("nlsh") == 4)
      assert(math.abs(row.getAs[Double]("dp") - 0.3) < 1e-12)
      assert(row.getAs[Long]("cell") == 1L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
  }

  test("Bench.consume handles plain, nested, and map schemas") {
    import spark.implicits._
    // checksum path: plain + nested array/struct columns
    Bench.consume(Seq((1L, "a", Array(1.0, 2.0)), (2L, "b", Array(3.0)))
      .toDF("id", "s", "arr")
      .withColumn("st", struct(col("id"), col("s"))))
    // map fallback path: xxhash64 rejects MapType — consume must fall
    // back to count() instead of erroring the bench key
    Bench.consume(Seq((1L, Map("k" -> 1)), (2L, Map("j" -> 2)))
      .toDF("id", "m"))
    // empty frame: sum is NULL — head() on the single agg row is safe
    Bench.consume(Seq.empty[(Long, String)].toDF("id", "s"))
  }

  test("bloom probe equality is content-based, not array-reference") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.util.sketch.BloomFilter
    import graft.functions.BloomMightContainLong
    def mk(seed: Long): BloomMightContainLong = {
      val bf = BloomFilter.create(100, 0.01)
      (seed until seed + 50).foreach(bf.putLong)
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      BloomMightContainLong(Literal(7L), out.toByteArray)
    }
    // two independently serialized but identical sketches: equal,
    // same hash, and semanticEquals (so canonicalization/CSE can fire)
    val (a, b) = (mk(1L), mk(1L))
    assert(a == b, "identical probes must compare equal")
    assert(a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    // a different sketch must not compare equal
    assert(a != mk(1000L))
  }
}
