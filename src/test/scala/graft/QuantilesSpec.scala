package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Quantiles
import graft.operators.FeatureQueries
import graft.quality.{Drift, Outliers}

/** THE shared ε-contract for the exact/approx percentile switch
  * ([[graft.functions.Quantiles]]): one spec pins the GK rank
  * guarantee and the threshold-tolerance of every operator routed
  * through the switch, so no operator carries a private, untested
  * notion of what "approx" means (VERDICT r16 ask #6; the winsorize
  * approx path is r16 ask #4).
  */
class QuantilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  // Deterministic heavy-tailed sample: ranks and values diverge hard
  // in the tail, which is exactly where a |value| contract would lie
  // and the rank contract is the honest one. LCG avoids the banned
  // Math.random; cube stretches the tail.
  private val n = 4000
  private lazy val values: Vector[Double] = {
    var s = 0x2545F4914F6CDD1DL
    Vector.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val u = ((s >>> 11).toDouble / (1L << 53).toDouble)
      u * u * u * 1e6
    }
  }
  private lazy val df = values.zipWithIndex
    .map { case (v, i) => (i.toLong, if (i % 3 == 0) "a" else "b", v) }
    .toDF("id", "g", "v")

  private def rankOf(x: Double, in: Seq[Double]): Int = in.count(_ <= x)

  test("ε rank contract: approx value's rank within ε·n + 1 of target") {
    val ps = Seq(0.05, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
    for (accuracy <- Seq(100, Quantiles.DefaultAccuracy)) {
      val got = df.agg(Quantiles.of("v", ps, approx = true,
        accuracy = accuracy)).head().getSeq[Double](0)
      val eps = 1.0 / accuracy
      ps.zip(got).foreach { case (p, x) =>
        val r = rankOf(x, values)
        assert(math.abs(r - p * n) <= eps * n + 1,
          s"p=$p accuracy=$accuracy: rank $r vs target ${p * n}")
      }
    }
  }

  test("GkSketch: partitioned sketch + merge honors the same ε rank " +
      "contract; bytes round-trip; nulls and string-column NULL " +
      "sketches fold away") {
    import graft.functions.GkSketch
    val eps = GkSketch.DefaultEps
    val ps = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    // partition the sample into 16 'buckets', sketch each, MERGE —
    // the IncrementalProfile shape — and query the union
    val perBucket = df.withColumn("bkt", pmod(col("id"), lit(16)))
      .groupBy("bkt").agg(GkSketch.sketchAgg(col("v")).as("qsk"))
    val got = perBucket.agg(GkSketch.quantilesOf(
      GkSketch.mergeAgg(col("qsk")), ps)).head().getSeq[Double](0)
    ps.zip(got).foreach { case (p, x) =>
      val r = rankOf(x, values)
      assert(math.abs(r - p * n) <= eps * n + 1,
        s"merged sketch p=$p: rank $r vs target ${p * n}")
      assert(values.contains(x), "GK returns column elements")
    }
    // byte round-trip is exact (stable layout, parquet-storable)
    val one = df.agg(GkSketch.sketchAgg(col("v"))).head()
      .getAs[Array[Byte]](0)
    val rt = GkSketch.toBytes(GkSketch.fromBytes(one))
    assert(one.sameElements(rt))
    // nulls skipped like any SQL agg; all-null + NULL sketches merge
    // to NULL; an empty sketch queries NaN
    val withNulls = df.select(when(col("id") % 2 === 0, col("v")).as("v"))
    val sk = withNulls.agg(GkSketch.sketchAgg(col("v"))).head()
      .getAs[Array[Byte]](0)
    assert(GkSketch.fromBytes(sk).count == n / 2)
    val allNull = df.select(lit(null).cast("binary").as("qsk"))
    assert(allNull.agg(GkSketch.mergeAgg(col("qsk"))).head().isNullAt(0))
    val empty = df.limit(0).agg(GkSketch.sketchAgg(col("v"))).head()
      .getAs[Array[Byte]](0)
    assert(spark.range(1).select(GkSketch.quantilesOf(lit(empty),
      Seq(0.5)).as("q")).head().getSeq[Double](0).head.isNaN)
  }

  test("exact form interpolates; approx form returns column elements") {
    val two = Seq(1.0, 2.0).toDF("v")
    val exact = two.agg(Quantiles.one("v", 0.5, approx = false))
      .head().getDouble(0)
    val approx = two.agg(Quantiles.one("v", 0.5, approx = true))
      .head().getDouble(0)
    assert(exact == 1.5) // interpolated — the DuckDB quantile_cont form
    assert(approx == 1.0 || approx == 2.0) // GK picks an element
  }

  test("winsorize(approx): thresholds rank-ε of exact, clamp agrees off-boundary") {
    val exact = FeatureQueries.winsorize(df, Seq("g"), "v")
      .select("id", "lo", "hi", "winsorized", "clipped")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    val approx = FeatureQueries.winsorize(df, Seq("g"), "v", approx = true)
      .select("id", "g", "v", "lo", "hi", "winsorized", "clipped")
      .collect()
    val byGroup = values.zipWithIndex.groupBy { case (_, i) =>
      if (i % 3 == 0) "a" else "b" }
      .view.mapValues(_.map(_._1)).toMap
    approx.foreach { r =>
      val (id, g, v) = (r.getLong(0), r.getString(1), r.getDouble(2))
      val (aLo, aHi) = (r.getDouble(3), r.getDouble(4))
      val gvs = byGroup(g)
      val eps = 1.0 / Quantiles.DefaultAccuracy
      // approx thresholds obey the rank contract per group
      assert(math.abs(rankOf(aLo, gvs) - 0.05 * gvs.size) <= eps * gvs.size + 1)
      assert(math.abs(rankOf(aHi, gvs) - 0.95 * gvs.size) <= eps * gvs.size + 1)
      // off the threshold boundary the two forms clamp identically
      val (eLo, eHi, eW, eC) = exact(id)
      val onBoundary = (math.min(eLo, aLo) <= v && v <= math.max(eLo, aLo)) ||
        (math.min(eHi, aHi) <= v && v <= math.max(eHi, aHi))
      if (!onBoundary) {
        assert(r.getBoolean(6) == eC, s"id=$id clipped flag diverged")
        if (!eC) assert(r.getDouble(5) == eW, s"id=$id interior value moved")
      }
    }
  }

  test("Outliers.flag(approx=true) ≡ flagApprox; flips only near fences") {
    val rows = df.select(col("g"), col("v"))
    val viaSwitch = Outliers.flag(rows, "v", Seq("g"), approx = true)
      .orderBy("v").collect().toSeq
    val viaLegacy = Outliers.flagApprox(rows, "v", Seq("g"))
      .orderBy("v").collect().toSeq
    assert(viaSwitch == viaLegacy) // one switch, not two builders
    // and the approx fences flag the same extreme rows as exact
    val exactHigh = Outliers.flag(rows, "v", Seq("g"))
      .where(col("is_high")).agg(min("v")).head().getDouble(0)
    val approxHigh = viaSwitch.filter(_.getBoolean(3)).map(_.getDouble(1)).min
    assert(math.abs(rankOf(approxHigh, values) - rankOf(exactHigh, values))
      <= n / Quantiles.DefaultAccuracy + 2)
  }

  test("Drift.breaks(approx) honors the rank contract; int columns read back") {
    val eps = 1.0 / Quantiles.DefaultAccuracy
    val bs = Drift.breaks(df, "v", buckets = 10, approx = true)
    bs.zipWithIndex.foreach { case (b, i) =>
      val p = (i + 1) / 10.0
      assert(math.abs(rankOf(b, values) - p * n) <= eps * n + 1,
        s"break $i: $b")
    }
    // GK on an integer column returns ints — breaks must still be doubles
    val ints = (1 to 100).map(_.toLong).toDF("v")
    val ib = Drift.breaks(ints, "v", buckets = 4, approx = true)
    assert(ib.length == 3 && ib.forall(b => b >= 1.0 && b <= 100.0))
  }
}
