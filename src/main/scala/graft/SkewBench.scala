package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Funnel, Skew, TopKPerKey}

/** Skew proof harness — the measured evidence behind the hot-key
  * variants ([[graft.operators.AsOfJoin.backwardBucketed]],
  * [[graft.operators.Skew.saltedLeftJoin]]). The shipped testdata has
  * uniform keys (TESTDATA.md), so the declared `q_join_asof_bucketed` /
  * `q_join_skew_salted` keys pin RESULTS but can never show the
  * variants winning; this main builds the distribution they exist for —
  * ONE key holding ~50% of both sides — and times plain vs variant on
  * it. Numbers land in SCALE.md's "skew proof" table; result equality
  * on the same distribution is spec-pinned (PropertySpec).
  *
  * Usage: `sbt "runMain graft.SkewBench"` — prints one JSON line.
  */
object SkewBench {

  /** Full-row checksum action: count + order-independent hash over
    * EVERY column. A bare count() lets column pruning delete the very
    * work under test (the as-of window and its payloads are unused by
    * count(1), so Catalyst drops them and the "timing" measures a
    * union+filter); hashing the whole row forces the real operator AND
    * doubles as the equality witness between plain and variant. */
  private def checksum(df: DataFrame): (Long, Long) = {
    // hash masked to 32 bits so an 8M-row sum stays far from Long
    // overflow (ANSI mode throws on wrap)
    val r = df.agg(count(lit(1)),
      sum(xxhash64(struct(df.columns.map(col): _*))
        .bitwiseAND(lit(0xffffffffL)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def timeMin(runs: Int)(df: => DataFrame): (Double, (Long, Long)) = {
    checksum(df) // untimed warmup (page cache, codegen)
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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt

    // ---- fixture: one hot key carries HALF of both sides ------------------
    // Deterministic (id-derived, no RNG). Left 8M facts, right ~800k
    // quotes, 5000 cold keys — sized so the hot key's single window
    // task dominates plain-variant wall clock on a 16-core box. Written to parquet so every timed plan
    // starts from a real scan, like the declared bench keys.
    val nLeft = 8000000L
    val nRight = 800000L
    val coldKeys = 5000
    val base = 1700000000L
    val span = 2592000L // 30 days of seconds
    def keyed(n: Long): DataFrame =
      spark.range(n).select(
        when(col("id") % 2 === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(coldKeys)) + 1)
          .as("key"),
        col("id"))
    val dir = Files.createTempDirectory("skewbench").toString
    keyed(nLeft)
      .select(col("key"),
        timestamp_seconds(lit(base) + pmod(xxhash64(col("id"), lit(1)), lit(span)))
          .as("ts"),
        (col("id") % 97).as("v"))
      .write.mode("overwrite").parquet(s"$dir/left")
    // right: unique (key, ts) per the as-of determinism precondition —
    // collapse collisions with a skew-safe partial aggregate
    keyed(nRight)
      .select(col("key"),
        timestamp_seconds(lit(base) + pmod(xxhash64(col("id"), lit(2)), lit(span)))
          .as("rts"),
        (col("id") % 1013).cast("double").as("quote"))
      .groupBy("key", "rts").agg(max("quote").as("quote"))
      .write.mode("overwrite").parquet(s"$dir/right")
    spark.range(coldKeys + 1).select(col("id").as("key"),
      concat(lit("dim_"), col("id")).as("label"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val left = spark.read.parquet(s"$dir/left")
    val right = spark.read.parquet(s"$dir/right")
    val dim = spark.read.parquet(s"$dir/dim")

    // ---- as-of: plain window (hot key = one task) vs bucketed -------------
    val (tPlain, csPlain) = timeMin(runs) {
      AsOfJoin.backward(left, right, "key", "ts", "rts", Seq("quote"))
    }
    val (tBucketed, csBucketed) = timeMin(runs) {
      AsOfJoin.backwardBucketed(left, right, "key", "ts", "rts", Seq("quote"),
        bucketSeconds = 86400L)
    }

    // ---- join: single hot shuffle partition vs salted ---------------------
    // Broadcast disabled: the salted variant exists for builds too big
    // to broadcast (a broadcast join has no shuffle to skew). Measured
    // both with AQE's own skew splitting on and off: salting is the
    // insurance for the beyond-AQE regime (one key > what split tasks
    // absorb), so the honest table shows all three.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (tJoinAqe, csJoinAqe) = timeMin(runs) {
      left.join(dim, Seq("key"), "left")
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (tJoinNoAqe, _) = timeMin(runs) {
      left.join(dim, Seq("key"), "left")
    }
    val (tSalted, csSalted) = timeMin(runs) {
      // salted emits the same columns in the same order (salt dropped)
      Skew.saltedLeftJoin(left, dim, "key")
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    // ---- top-k per key under a hot key ------------------------------------
    // The 4M-row hot key is the case TopKPerKey exists for. Three
    // contenders on identical input: the shipped hybrid aggregator
    // (unsorted below capacity, O(1) min-reject once full), the r12
    // re-sort-per-element aggregator (kept below as the measured
    // baseline — O(k log k) per input row once full), and the textbook
    // `row_number().over(window) <= k` (full per-key sort after the
    // shuffle — the single hot-key task sorts 4M rows alone).
    val topkK = 200
    val scored = left.select(col("key"),
      pmod(xxhash64(col("ts"), col("v")), lit(1000000L)).cast("double")
        .as("score"),
      xxhash64(col("key"), col("ts"), col("v")).as("payload"))
    val (tTopkHybrid, csTopkHybrid) = timeMin(runs) {
      TopKPerKey(scored, "key", "score", "payload", topkK)
    }
    val (tTopkResort, csTopkResort) = timeMin(runs) {
      import org.apache.spark.sql.functions.udaf
      val agg = udaf(new ResortTopKAgg(topkK))
      scored.groupBy("key")
        .agg(agg(col("score"), col("payload")).as("top"))
        .select(col("key"), posexplode(col("top")).as(Seq("idx", "row")))
        .select(col("key"), (col("idx") + 1).cast("long").as("rank"),
          col("row.score").as("score"), col("row.payload").as("payload"))
    }
    val (tTopkWindow, csTopkWindow) = timeMin(runs) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("key")
        .orderBy(col("score").desc, col("payload").desc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= topkK)
        .select("key", "rank", "score", "payload")
    }
    require(csTopkHybrid == csTopkResort && csTopkHybrid == csTopkWindow,
      s"top-k variants diverge on the skewed fixture: " +
        s"$csTopkHybrid vs $csTopkResort vs $csTopkWindow")

    // ---- funnel: bot user (quadratic greedy) vs time-bucketed -------------
    // One user carries 40k participating events across 30 days — the
    // plain per-user collect runs its greedy as starts × events ≈
    // 13k × 40k state steps in ONE task; levelsBucketed splits the
    // same user over ~720 hour buckets. Normal users ride along so the
    // dispatch-independent result covers both populations.
    val nBot = 40000L
    val nNormal = 100000L
    spark.range(nBot).select(
        lit(0L).as("user_id"),
        timestamp_seconds(lit(base) + pmod(xxhash64(col("id"), lit(3)), lit(span)))
          .as("ts"),
        pmod(xxhash64(col("id"), lit(4)), lit(3)).cast("int").as("step"))
      .unionByName(spark.range(nNormal).select(
        (pmod(xxhash64(col("id"), lit(5)), lit(2000)) + 1).as("user_id"),
        timestamp_seconds(lit(base) + pmod(xxhash64(col("id"), lit(6)), lit(span)))
          .as("ts"),
        pmod(xxhash64(col("id"), lit(7)), lit(3)).cast("int").as("step")))
      .write.mode("overwrite").parquet(s"$dir/funnel")
    val fev = spark.read.parquet(s"$dir/funnel")
    val fConds = (0 until 3).map(i => col("step") === i)
    val (tFunnelPlain, csFunnelPlain) = timeMin(runs) {
      Funnel.levels(fev, fConds, windowSec = 3600L)
    }
    val (tFunnelBucketed, csFunnelBucketed) = timeMin(runs) {
      Funnel.levelsBucketed(fev, fConds, windowSec = 3600L)
    }
    require(csFunnelPlain == csFunnelBucketed,
      s"funnel variants diverge on the bot fixture: " +
        s"$csFunnelPlain vs $csFunnelBucketed")

    // result equality on the skewed distribution: same row count AND
    // same order-independent full-row checksum
    require(csPlain == csBucketed,
      s"asof variants diverge on the skewed fixture: $csPlain vs $csBucketed")
    require(csJoinAqe == csSalted,
      s"join variants diverge on the skewed fixture: $csJoinAqe vs $csSalted")

    def f(d: Double) = f"$d%.2f"
    println(s"""{"metric":"skew_proof","left_rows":${csPlain._1},"hot_share":0.5,""" +
      s""""asof_plain":${f(tPlain)},"asof_bucketed":${f(tBucketed)},""" +
      s""""join_plain_aqe_skew":${f(tJoinAqe)},""" +
      s""""join_plain_no_aqe_skew":${f(tJoinNoAqe)},""" +
      s""""join_salted":${f(tSalted)},""" +
      s""""topk_k":$topkK,"topk_hybrid":${f(tTopkHybrid)},""" +
      s""""topk_resort":${f(tTopkResort)},"topk_window":${f(tTopkWindow)},""" +
      s""""funnel_bot_events":$nBot,"funnel_plain":${f(tFunnelPlain)},""" +
      s""""funnel_bucketed":${f(tFunnelBucketed)},""" +
      s""""runs":$runs}""")
    spark.stop()
  }

  /** The r12 [[TopKPerKey.TopKAgg]] form, kept ONLY as [[SkewBench]]'s
    * measured baseline: correct and map-side-bounded, but once the
    * buffer is full every input row pays a full `(a +: b).sorted`
    * (O(k log k)) — the constant the hybrid's O(1) min-reject removes. */
  private final class ResortTopKAgg(k: Int) extends
      org.apache.spark.sql.expressions.Aggregator[
        TopKPerKey.ScoredRow, Seq[TopKPerKey.ScoredRow], Seq[TopKPerKey.ScoredRow]] {
    import TopKPerKey.ScoredRow
    private implicit val ord: Ordering[ScoredRow] =
      Ordering.by((r: ScoredRow) => (r.score, r.payload))
    override def zero: Seq[ScoredRow] = Nil
    private def bound(xs: Seq[ScoredRow]): Seq[ScoredRow] =
      if (xs.size <= k) xs else xs.sorted.takeRight(k)
    override def reduce(b: Seq[ScoredRow], a: ScoredRow): Seq[ScoredRow] =
      bound(a +: b)
    override def merge(b1: Seq[ScoredRow], b2: Seq[ScoredRow]): Seq[ScoredRow] =
      bound(b1 ++ b2)
    override def finish(b: Seq[ScoredRow]): Seq[ScoredRow] = b.sorted.reverse
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[ScoredRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[ScoredRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
