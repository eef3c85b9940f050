package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.DedupLatest

/** Latest-per-key argmax contender harness — the measured basis for
  * [[graft.cdc.DedupLatest]]'s default (SCALE.md "Latest-per-key
  * argmax — contenders"). Times the shipped max-struct sort-aggregate
  * against the window `row_number()` form on three shapes, matched
  * in-JVM and interleaved so cold-JVM costs can't bias a contender
  * (comparing across separate filtered bench runs did exactly that
  * during round 14 and briefly reversed the verdict):
  *
  *   1. raw scan — lineitem with its natural ~4 versions per key
  *      (the `q_dedup_latest_per_key` shape);
  *   2. composite upstream — the C2 anti-join + union feeding the
  *      dedup (the `q_cdc_upsert_dedup` shape), where any contender
  *      that evaluates its input twice (e.g. join-on-max) loses the
  *      whole upstream's cost again;
  *   3. hot key — a 7.8M-row frame with ONE key holding ~50% of the
  *      rows: the window funnels that key's every row into one
  *      unsplittable sort task, while the aggregate's map-side partial
  *      combine ships ≤ one candidate per input partition.
  *
  * Checksum equality between contenders is REQUIRED on every shape
  * (the tie-break is total, so the forms must agree row-for-row).
  *
  * Usage: `sbt "runMain graft.ArgmaxBench"` — prints one JSON line.
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_BENCH_RUNS (default 5), SPARK_GRAFT_CPUS (default 32).
  */
object ArgmaxBench {

  /** Full-row consume: count + order-independent 32-bit-masked
    * xxhash64 over every column — forces real execution and doubles as
    * the equality witness (see SkewBench's scaladoc for why a bare
    * count() would measure a pruned plan). */
  private def checksum(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      sum(xxhash64(struct(df.columns.map(col).toSeq: _*))
        .bitwiseAND(lit(0xffffffffL)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def timeMin(runs: Int)(df: => DataFrame): (Double, (Long, Long)) = {
    checksum(df) // untimed warmup
    var best = Double.MaxValue
    var cs = (0L, 0L)
    (1 to runs).foreach { _ =>
      val t0 = System.nanoTime()
      cs = checksum(df)
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    (best, cs)
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tieBreak = Seq("l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus")
    def li = Tables(spark, sf, "lineitem")

    // the q_cdc_upsert_dedup upstream: anti-join + union (C1) before dedup
    def composite = {
      val incoming = li
        .where(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
        .withColumn("l_quantity", col("l_quantity") + 100.0)
      val incKeys = incoming.select(col("l_orderkey")).distinct()
      li.join(incKeys, Seq("l_orderkey"), "left_anti")
        .unionByName(incoming.select(li.columns.map(col).toSeq: _*))
    }

    def win(df: DataFrame) =
      DedupLatest.byWindow(df, Seq("l_orderkey"), "l_shipdate", tieBreak)
    def agg(df: DataFrame) =
      DedupLatest.bySortAggregate(df, Seq("l_orderkey"), "l_shipdate", tieBreak)

    // interleaved same-JVM measurement; orderBy matches the benched keys
    val (scanWin, csSw) = timeMin(runs)(win(li).orderBy("l_orderkey"))
    val (scanAgg, csSa) = timeMin(runs)(agg(li).orderBy("l_orderkey"))
    val (compWin, csCw) = timeMin(runs)(win(composite).orderBy("l_orderkey"))
    val (compAgg, csCa) = timeMin(runs)(agg(composite).orderBy("l_orderkey"))
    require(csSw == csSa, s"scan contenders diverge: $csSw vs $csSa")
    require(csCw == csCa, s"composite contenders diverge: $csCw vs $csCa")

    // hot-key fixture: ~50% of an ~8M-row frame lands on key 1
    // (13 deterministic copies of lineitem, half the keys collapsed),
    // localCheckpointed so both contenders read one materialization
    val hot = li.select(
        when(pmod(xxhash64(col("l_orderkey"), lit(7)), lit(2)) === 0, lit(1L))
          .otherwise(pmod(xxhash64(col("l_orderkey")), lit(1000000L)) + 10L)
          .as("l_orderkey"),
        col("l_shipdate"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"))
      .crossJoin(spark.range(13).select(col("id").as("__c")))
      .withColumn("l_linenumber", col("l_linenumber") + col("__c") * 10)
      .drop("__c")
      .localCheckpoint(true)
    val (hotWin, csHw) = timeMin(math.min(runs, 3))(
      DedupLatest.byWindow(hot, Seq("l_orderkey"), "l_shipdate", tieBreak))
    val (hotAgg, csHa) = timeMin(math.min(runs, 3))(
      DedupLatest.bySortAggregate(hot, Seq("l_orderkey"), "l_shipdate", tieBreak))
    require(csHw == csHa, s"hot-key contenders diverge: $csHw vs $csHa")

    def f(d: Double) = f"$d%.2f"
    println(s"""{"metric":"argmax_contenders","rows_hot":${hot.count()},""" +
      s""""scan_window":${f(scanWin)},"scan_sortagg":${f(scanAgg)},""" +
      s""""composite_window":${f(compWin)},"composite_sortagg":${f(compAgg)},""" +
      s""""hot_window":${f(hotWin)},"hot_sortagg":${f(hotAgg)},"runs":$runs}""")
    spark.stop()
  }
}
