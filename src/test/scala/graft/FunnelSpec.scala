package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

/** windowFunnel semantics: hand cases (ordering, window expiry, the
  * later-start-rescues case that breaks first-start-only
  * implementations, no-step-1 zero), plus a randomized parity sweep
  * against an independent DFS exists-reference (brute force over all
  * chains — NOT the greedy the operator uses, so a greedy-optimality
  * bug cannot hide). End-to-end oracle gate: `q_funnel_window`. */
class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** events: (user, sec, stepIdx). Three steps: 0, 1, 2. */
  private def run(events: Seq[(Long, Long, Int)], nSteps: Int,
      winSec: Long): Map[Long, Long] = {
    val df = events.map { case (u, s, st) => (u, ts(s), st) }
      .toDF("user_id", "ts", "step")
    Funnel.levels(df,
      (0 until nSteps).map(i => col("step") === i), winSec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** DFS exists-reference: max chain length over ALL strictly-
    * increasing chains within the first event's window. */
  private def truth(events: Seq[(Long, Long, Int)], nSteps: Int,
      winSec: Long): Map[Long, Long] = {
    events.groupBy(_._1).flatMap { case (u, evs0) =>
      val evs = evs0.map(e => (e._2, e._3)).sortBy(identity)
      if (evs.isEmpty) None
      else {
        def chains(anchor: Long, lvl: Int, last: Long): Int =
          if (lvl == nSteps) lvl
          else {
            val nexts = evs.filter(e =>
              e._2 == lvl && e._1 > last && e._1 <= anchor + winSec)
            if (nexts.isEmpty) lvl
            else nexts.map(e => chains(anchor, lvl + 1, e._1)).max
          }
        val starts = evs.filter(_._2 == 0)
        Some(u -> (if (starts.isEmpty) 0L
          else starts.map(s => chains(s._1, 1, s._1)).max.toLong))
      }
    }
  }

  test("ordering, expiry, and zero-level hand cases") {
    val events = Seq(
      // u1: full chain in order within the 3600s window -> 3
      (1L, 0L, 0), (1L, 100L, 1), (1L, 200L, 2),
      // u2: purchase BEFORE click -> chain stops at 2
      (2L, 0L, 0), (2L, 50L, 2), (2L, 100L, 1),
      // u3: click outside the window of the only view -> 1
      (3L, 0L, 0), (3L, 4000L, 1),
      // u4: only clicks/purchases, no step-1 -> 0
      (4L, 0L, 1), (4L, 10L, 2))
    val got = run(events, 3, 3600L)
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L), s"$got")
    assert(got == truth(events, 3, 3600L))
  }

  test("a later start rescues the chain the first start cannot finish") {
    // greedy from v@0 reaches c@3000 but p@5400 is outside 0+3600;
    // the v@2400 start completes the chain — first-start-only = 2
    val events = Seq(
      (1L, 0L, 0), (1L, 2400L, 0), (1L, 3000L, 1), (1L, 5400L, 2))
    val got = run(events, 3, 3600L)
    assert(got == Map(1L -> 3L), s"later start must rescue: $got")
    assert(got == truth(events, 3, 3600L))
  }

  test("strictly increasing: same-timestamp step events do not chain") {
    val events = Seq((1L, 100L, 0), (1L, 100L, 1), (1L, 200L, 2))
    val got = run(events, 3, 3600L)
    assert(got == Map(1L -> 1L),
      s"t2 > t1 is strict, and step order cannot restart mid-chain: $got")
    assert(got == truth(events, 3, 3600L))
  }

  test("retention: anchor gates every later flag; unordered within cohort") {
    val df = Seq(
      (1L, ts(10), 0), (1L, ts(500), 2),           // anchored, did c2, no c1
      (2L, ts(20), 1), (2L, ts(30), 2),            // never anchored -> all false
      (3L, ts(40), 0), (3L, ts(5), 1))             // c1 BEFORE anchor still counts
      .toDF("user_id", "ts", "step")
    val got = Funnel.retention(df, Seq(col("step") === 0,
        col("step") === 1, col("step") === 2))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      1L -> ((true, false, true)),
      2L -> ((false, false, false)),
      3L -> ((true, true, false))),
      s"retention flags wrong: $got")
  }

  test("randomized parity vs the DFS exists-reference") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 20) {
      val n = 2 + rnd.nextInt(3) // 2..4 steps
      val win = 50L + rnd.nextInt(200)
      val events = (0 until 200).map { _ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(500).toLong, rnd.nextInt(n))
      }.distinct
      val got = run(events, n, win)
      val want = truth(events, n, win)
      assert(got == want,
        s"trial $trial (n=$n win=$win): ${got.toSet.diff(want.toSet)} vs ${
          want.toSet.diff(got.toSet)}")
    }
  }

  private def runBucketed(events: Seq[(Long, Long, Int)], nSteps: Int,
      winSec: Long, bucketSec: Long = 0L): Map[Long, Long] = {
    val df = events.map { case (u, s, st) => (u, ts(s), st) }
      .toDF("user_id", "ts", "step")
    Funnel.levelsBucketed(df,
      (0 until nSteps).map(i => col("step") === i), winSec,
      bucketSec = bucketSec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("levelsBucketed == levels: boundary-crossing chains, all hand cases") {
    // chains placed to straddle a bucket boundary (win = bucket = 100):
    // u1 anchors at 95, finishes at 180 — entirely in bucket 0's group
    // only via the overlap copies of bucket-1 events; u2's anchor at
    // 100 is native to bucket 1 (no double count from the overlap
    // copy into bucket 0, whose step-1 bit is stripped); u3's rescue
    // anchor and u4's no-step-1 zero carry over unchanged.
    val events = Seq(
      (1L, 95L, 0), (1L, 120L, 1), (1L, 180L, 2),
      (2L, 100L, 0), (2L, 150L, 1), (2L, 260L, 2),
      (3L, 0L, 0), (3L, 60L, 0), (3L, 90L, 1), (3L, 140L, 2),
      (4L, 5L, 1), (4L, 10L, 2))
    val plain = run(events, 3, 100L)
    val bucketed = runBucketed(events, 3, 100L)
    assert(bucketed == plain && plain == truth(events, 3, 100L),
      s"bucketed $bucketed vs plain $plain")
    // a wider bucket (bucketSec > windowSec) must not change results
    assert(runBucketed(events, 3, 100L, bucketSec = 250L) == plain)
    // bucketSec < windowSec is rejected: a chain could escape j+1
    intercept[IllegalArgumentException] {
      runBucketed(events, 3, 100L, bucketSec = 50L)
    }
  }

  test("levelsBucketed randomized dispatch independence vs levels") {
    val rnd = new scala.util.Random(43)
    for (trial <- 0 until 10) {
      val n = 2 + rnd.nextInt(3)
      val win = 50L + rnd.nextInt(200)
      val events = (0 until 300).map { _ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(n))
      }.distinct
      val plain = run(events, n, win)
      val bucketed = runBucketed(events, n, win)
      assert(bucketed == plain,
        s"trial $trial (n=$n win=$win): ${bucketed.toSet.diff(plain.toSet)}" +
          s" vs ${plain.toSet.diff(bucketed.toSet)}")
    }
  }

  test("bucketing is exact past 2^53 micros (double rounding regime)") {
    // Year-9999 timestamps: unix micros ~2.53e17, where a double has
    // ulp 32 us — casting __us to double rounds boundary-1 events
    // into the next bucket. The integer floor-div bucket must keep
    // levelsBucketed row-identical to levels with chains planted AT
    // bucket boundaries +-1 micro.
    val baseSec = 253402300000L // 9999-12-31 territory
    val winSec = 10L            // bUs = 1e7; boundary-straddling below
    def tsMicro(sec: Long, micro: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(sec * 1000L)
      t.setNanos((micro * 1000L).toInt)
      t
    }
    // u1: anchor one micro before a bucket boundary, chain completing
    // exactly at window end (the rounding-sensitive placement); u2: a
    // clean in-bucket chain; u3: expiry one micro past the window.
    val rows = Seq(
      (1L, tsMicro(baseSec + 9, 999999L), 0),
      (1L, tsMicro(baseSec + 12, 0L), 1),
      (1L, tsMicro(baseSec + 19, 999999L), 2),
      (2L, tsMicro(baseSec + 20, 0L), 0),
      (2L, tsMicro(baseSec + 21, 1L), 1),
      (3L, tsMicro(baseSec + 30, 0L), 0),
      (3L, tsMicro(baseSec + 40, 1L), 1))
    val df = rows.toDF("user_id", "ts", "step")
    val conds = (0 until 3).map(i => col("step") === i)
    val plain = Funnel.levels(df, conds, winSec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketed = Funnel.levelsBucketed(df, conds, winSec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain == Map(1L -> 3L, 2L -> 2L, 3L -> 1L), s"plain $plain")
    assert(bucketed == plain, s"bucketed $bucketed vs plain $plain")
  }

  test("levelsAuto: probe dispatches on the hottest user, results identical") {
    // u1 is a planted bot: many participating events; u2 is normal.
    val events = (0 until 400).map(i => (1L, i.toLong * 3, i % 3)) ++
      Seq((2L, 0L, 0), (2L, 10L, 1))
    val df = events.map { case (u, s, st) => (u, ts(s), st) }
      .toDF("user_id", "ts", "step")
    val conds = (0 until 3).map(i => col("step") === i)
    val probe = Funnel.maxUserEvents(
      df.select(col("user_id"), col("ts"),
        (col("step") >= 0).as("__keep")).where(col("__keep"))
        .select(col("user_id")))
    assert(probe == 400L, s"probe must see the bot user's count: $probe")
    val viaPlain = Funnel.levelsAuto(df, conds, 3600L,
        hotUserEvents = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBucketed = Funnel.levelsAuto(df, conds, 3600L,
        hotUserEvents = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPlain == viaBucketed,
      s"dispatch must be result-invisible: $viaPlain vs $viaBucketed")
    assert(viaPlain(2L) == 2L)
  }
}
