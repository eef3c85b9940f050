package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DistinctSketch

/** Mergeable HLL distinct sketches: the incremental algebra the
  * `q_agg_hll_incremental` gate asserts end-to-end, pinned here on
  * controlled cardinalities — union across disjoint batches equals the
  * one-shot sketch EXACTLY (same lgK), estimates sit inside the
  * published error bound, and sketch bytes survive a TableStore
  * persist/reload (the build-once/roll-up-forever lifecycle). */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("union over batch sketches == one-shot sketch; error in bound") {
    val n = 20000L
    val df = spark.range(n).select(
      (org.apache.spark.sql.functions.col("id") % 10).as("batch"),
      org.apache.spark.sql.functions.col("id").as("user"))
    val batched = DistinctSketch.build(df, "user", Seq("batch"))
    val merged = DistinctSketch.rollup(batched)
      .as[Double].head()
    val oneShot = DistinctSketch.rollup(
      DistinctSketch.build(df, "user", Nil)).as[Double].head()
    assert(merged == oneShot,
      s"HLL union at equal lgK must be lossless: $merged vs $oneShot")
    // 1.04/sqrt(2^12) ≈ 1.6%; allow 3 sigma
    assert(math.abs(merged - n) <= n * 0.05, s"estimate $merged for $n")
  }

  test("sketch table persists through a TableStore and still rolls up") {
    val df = spark.range(5000).select(
      (org.apache.spark.sql.functions.col("id") % 4).as("part"),
      org.apache.spark.sql.functions.col("id").as("user"))
    val sketches = DistinctSketch.build(df, "user", Seq("part"))
    val dir = java.nio.file.Files.createTempDirectory("sketchstore").toString
    val store = new graft.cdc.TableStore(spark, s"$dir/sketches")
    store.write(sketches)
    val reloaded = store.read().get
    val est = DistinctSketch.rollup(reloaded).as[Double].head()
    val direct = DistinctSketch.rollup(sketches).as[Double].head()
    assert(est == direct, "persisted sketch bytes must round-trip exactly")
  }

  test("incremental append: new batch's sketch unions into old rollup") {
    val old = spark.range(0, 1000).select(
      org.apache.spark.sql.functions.lit(0L).as("batch"),
      org.apache.spark.sql.functions.col("id").as("user"))
    val fresh = spark.range(500, 1500).select( // 50% overlap
      org.apache.spark.sql.functions.lit(1L).as("batch"),
      org.apache.spark.sql.functions.col("id").as("user"))
    val both = DistinctSketch.build(old.unionByName(fresh), "user", Seq("batch"))
    val est = DistinctSketch.rollup(both).as[Double].head()
    assert(math.abs(est - 1500.0) <= 1500 * 0.05,
      s"overlapping-batch union must estimate the true 1500: $est")
  }

  test("Misra-Gries: exact below capacity; bound + recall under skew") {
    import org.apache.spark.sql.functions._
    import graft.operators.HeavyHitters
    // distinct items <= capacity: no trim ever fires -> exact counts
    val small = (1 to 300).map(i => s"item${i % 20}").toDF("x")
    val exactly = HeavyHitters.summary(small, "x", capacity = 32)
      .as[(String, Long)].collect().toMap
    assert(exactly == (0 until 20).map(i => s"item$i" -> 15L).toMap,
      s"below capacity the summary IS the exact histogram: $exactly")

    // Zipf-ish skew over a domain >> capacity: planted heavies must be
    // present with the MG bound, regardless of partition layout
    val cap = 16
    val rows = (0 until 8).flatMap(h =>
      Seq.fill(1000 - h * 50)(s"heavy$h")) ++
      (0 until 4000).map(i => s"tail$i")
    val n = rows.size.toLong
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("x").repartition(parts)
      val sk = HeavyHitters.summary(df, "x", cap)
        .as[(String, Long)].collect().toMap
      assert(sk.size <= cap)
      (0 until 8).foreach { h =>
        val truth = 1000L - h * 50
        assert(truth * (cap + 1) > n,
          "fixture precondition: every heavy exceeds n/(cap+1)")
        val est = sk.get(s"heavy$h")
        assert(est.isDefined,
          s"heavy$h (true $truth > n/${cap + 1}) missing at parts=$parts: $sk")
        assert(est.get <= truth && (truth - est.get) * (cap + 1) <= n,
          s"heavy$h bound violated at parts=$parts: est=${est.get} true=$truth")
      }
    }

    // incremental rollup: per-batch summaries merged through the same
    // trim keep the mergeable-summaries bound against the TOTAL stream
    val batched = (0 until 4).map { b =>
      HeavyHitters.summary(
        rows.zipWithIndex.filter(_._2 % 4 == b).map(_._1).toDF("x"),
        "x", cap)
    }
    val merged = HeavyHitters.merge(
      batched.reduce(_ unionByName _), cap)
      .as[(String, Long)].collect().toMap
    assert(merged.size <= cap)
    (0 until 8).foreach { h =>
      val truth = 1000L - h * 50
      val est = merged.get(s"heavy$h")
      assert(est.isDefined, s"heavy$h missing after batch merge: $merged")
      assert(est.get <= truth && (truth - est.get) * (cap + 1) <= n,
        s"heavy$h merge bound violated: est=${est.get} true=$truth n=$n")
    }

    // per-group variant: each group's heavies recovered independently
    val grouped = Seq("a", "b").flatMap(g =>
      Seq.fill(500)((g, s"$g-hot")) ++ (0 until 800).map(i => (g, s"$g-t$i")))
      .toDF("g", "x")
    val pg = HeavyHitters.summaryPerGroup(grouped, Seq("g"), "x", 16)
      .as[(String, String, Long)].collect()
    assert(pg.exists(r => r._1 == "a" && r._2 == "a-hot") &&
      pg.exists(r => r._1 == "b" && r._2 == "b-hot"))
  }
}
