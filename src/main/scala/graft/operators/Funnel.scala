package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence funnel analysis — the `windowFunnel` of the
  * reference's own engine family (ClickHouse's signature behavioral
  * aggregate; the reference stores click-style events in ClickHouse
  * but never funnels them — this is the natural next query its users
  * run): per user, the deepest prefix of an ordered step list
  * (view → click → purchase) completed as a STRICTLY time-increasing
  * chain whose whole span fits inside `windowSec` of the chain's
  * FIRST event.
  *
  * Semantics (deterministic, oracle-gated `q_funnel_window`): level =
  * max k such that events e₁ < e₂ < … < e_k exist with
  * `conds(i)(e_i)` and `ts_k − ts_1 ≤ windowSec`. Computed as a
  * greedy scan from every step-1 candidate: for a FIXED first event,
  * always taking the earliest qualifying next step is optimal (any
  * later choice only shrinks the remaining window), so max-over-
  * starts of the greedy equals the exists-semantics — which is what
  * the DuckDB oracle restates directly as k-way self-join EXISTS
  * tests, making the two formulations check each other.
  *
  * Scale shape: step predicates are evaluated BEFORE the shuffle and
  * non-participating events dropped, so the per-user collect carries
  * only funnel-relevant rows (bit-packed: one long ts + one int mask
  * per event). One shuffle (the per-user groupBy, map-side partially
  * aggregated by Spark's collect_list buffers), then a map-only
  * higher-order-function automaton — no UDF, no second pass. The
  * per-user array is bounded by that user's PARTICIPATING event
  * count; the greedy-over-starts is O(starts × events) per user — a
  * pathological bot user is a single-task quadratic stall, which
  * [[levelsBucketed]] cures by overlap-by-window time bucketing
  * (funnel windows are hours/days; a chain never crosses a bucket
  * boundary by more than one window, so each `(user, bucket)` group
  * sees at most 2×bucket events) and [[levelsAuto]] dispatches to
  * automatically off a cheap per-user histogram probe, the same
  * pattern as [[AsOfJoin.backwardAuto]].
  */
object Funnel {

  /** Participating events only, bit-packed: `(user_id, __us, __b)`
    * with `__b` the mask of step predicates the event satisfies —
    * the pre-shuffle pruning both variants share. */
  private def participating(events: DataFrame, conds: Seq[Column],
      userCol: String, tsCol: String): DataFrame = {
    val bits = conds.zipWithIndex
      .map { case (c, i) => when(c, lit(1 << i)).otherwise(lit(0)) }
      .reduce(_ + _)
    events
      .select(col(userCol).as("user_id"),
        unix_micros(col(tsCol)).as("__us"), bits.cast("long").as("__b"))
      .where(col("__b") =!= 0)
  }

  /** The greedy automaton over a sorted `__evs` array column. State:
    * (lvl, need = bit value of the NEXT step, last = ts of the
    * chain's latest event); `s` is the fixed first event, so the
    * window anchor s.__us rides the outer lambda. `need` starts at 2
    * and only ever doubles — bit 0 is consulted ONLY for anchors,
    * which is what lets [[levelsBucketed]]'s overlap copies strip it. */
  private def greedyLevel(n: Int, winUs: Long): Column =
    coalesce(array_max(transform(
      filter(col("__evs"),
        e => e.getField("__b").bitwiseAND(lit(1L)) =!= 0L),
      s => aggregate(
        col("__evs"),
        struct(lit(1).as("lvl"), lit(2L).as("need"),
          s.getField("__us").as("last")),
        (st, e) => when(
          st.getField("lvl") < n &&
            e.getField("__us") > st.getField("last") &&
            e.getField("__us") <= s.getField("__us") + winUs &&
            e.getField("__b").bitwiseAND(st.getField("need")) =!= 0L,
          struct((st.getField("lvl") + 1).as("lvl"),
            (st.getField("need") * 2L).as("need"),
            e.getField("__us").as("last")))
          .otherwise(st),
        st => st.getField("lvl")))), lit(0))

  private def checkArgs(conds: Seq[Column], windowSec: Long): Unit = {
    require(conds.nonEmpty && conds.size <= 30, "need 1..30 steps")
    require(windowSec > 0, "windowSec must be positive")
  }

  /** Per-user funnel depth: `(user_id, level)` over ALL users that
    * produced at least one participating event (level ≥ 1 requires a
    * step-1 event; users with only later-step events report 0). */
  def levels(events: DataFrame, conds: Seq[Column], windowSec: Long,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    checkArgs(conds, windowSec)
    val perUser = participating(events, conds, userCol, tsCol)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("__us"), col("__b"))))
        .as("__evs"))
    perUser.select(col("user_id"),
      greedyLevel(conds.size, windowSec * 1000000L).cast("long").as("level"))
  }

  /** [[levels]] for the HOT-USER case — row-identical output
    * (spec-pinned), bounded per-task work. Events are grouped by
    * `(user, time bucket)` with `bucketSec ≥ windowSec` (default:
    * exactly the window), each event overlap-copied into the PREVIOUS
    * bucket so a chain anchored anywhere in bucket j — whose span is
    * ≤ windowSec ≤ bucketSec, hence entirely inside [j·B, (j+2)·B) —
    * is fully visible in j's group. The overlap copy has the step-1
    * bit STRIPPED (and is dropped when nothing else remains): the
    * automaton's `need` starts at 2 and only doubles, so bit 0 is
    * consulted only for anchors — stripping it means every anchor is
    * counted in exactly its native bucket, no double counting, and
    * the unchanged greedy kernel runs per group. Per-user level is
    * then `max` over buckets.
    *
    * Cost vs [[levels]]: ≤ 2× the shuffled participating rows and one
    * extra count-shaped aggregate; per-task work drops from
    * O(user-events²) to O(bucket-events²), and a bot user's buckets
    * spread across tasks instead of serializing in one. */
  def levelsBucketed(events: DataFrame, conds: Seq[Column],
      windowSec: Long, userCol: String = "user_id", tsCol: String = "ts",
      bucketSec: Long = 0L): DataFrame = {
    checkArgs(conds, windowSec)
    val bSec = if (bucketSec <= 0L) windowSec else bucketSec
    require(bSec >= windowSec,
      s"bucketSec ($bSec) must cover windowSec ($windowSec): a chain " +
        "may span one full window past its anchor's bucket")
    val bUs = bSec * 1000000L
    // Floor-div in pure Long arithmetic: (us - pmod(us, b)) is the
    // largest multiple of b that is <= us (pmod is non-negative), and
    // `div` on an exact multiple is exact — so bucketing never rounds,
    // even past |us| = 2^53 micros (~year 2255) where the double path
    // could push an end-of-bucket event into the next bucket.
    val p = participating(events, conds, userCol, tsCol)
      .withColumn("__bkt",
        expr(s"(__us - pmod(__us, ${bUs}L)) div ${bUs}L"))
    val overlap = p
      .withColumn("__bkt", col("__bkt") - 1)
      .withColumn("__b", col("__b").bitwiseAND(lit(~1L)))
      .where(col("__b") =!= 0)
    val perBucket = p.unionByName(overlap)
      .groupBy("user_id", "__bkt")
      .agg(sort_array(collect_list(struct(col("__us"), col("__b"))))
        .as("__evs"))
      .select(col("user_id"),
        greedyLevel(conds.size, windowSec * 1000000L).as("__lvl"))
    perBucket.groupBy("user_id")
      .agg(max(col("__lvl")).cast("long").as("level"))
  }

  /** Auto-dispatching [[levels]]: one cheap per-user histogram over
    * the PARTICIPATING rows (two-level aggregate, map-side partials —
    * safe under any skew) picks the plain per-user collect when every
    * user is small and [[levelsBucketed]] when any user carries
    * ≥ `hotUserEvents` participating events (the greedy is quadratic
    * in that count, so the threshold bounds per-task work at
    * ~hotUserEvents² ops). Use the explicit variants when the user
    * distribution is known at build time. */
  def levelsAuto(events: DataFrame, conds: Seq[Column], windowSec: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      hotUserEvents: Long = 5000L, bucketSec: Long = 0L): DataFrame = {
    checkArgs(conds, windowSec)
    if (maxUserEvents(participating(events, conds, userCol, tsCol))
        >= hotUserEvents)
      levelsBucketed(events, conds, windowSec, userCol, tsCol, bucketSec)
    else levels(events, conds, windowSec, userCol, tsCol)
  }

  /** Largest single-user participating-event count — the dispatch
    * statistic (exposed for specs). 0 on an empty frame. */
  private[graft] def maxUserEvents(p: DataFrame): Long = {
    val r = p.groupBy(col("user_id")).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Cohort retention (the ClickHouse `retention` aggregate, funnel's
    * unordered sibling): per user, `r_0 = did cond_0 ever` (the cohort
    * anchor — e.g. "signed up in week 0") and `r_i = r_0 AND did
    * cond_i ever` ("…and returned in week i"). Column-per-condition
    * output; the cohort curve is one `avg(r_i)` away. Pure partial
    * aggregate — ONE map-side-combined shuffle carrying |conds|
    * booleans per user, no collect, no window; at any corpus size
    * this is a count-shaped aggregation. Oracle `q_funnel_retention`
    * restates it directly. */
  def retention(events: DataFrame, conds: Seq[Column],
      userCol: String = "user_id"): DataFrame = {
    require(conds.nonEmpty, "need at least the anchor condition")
    val flags = conds.zipWithIndex.map { case (c, i) =>
      max(when(c, lit(1)).otherwise(lit(0))).as(s"__c$i")
    }
    val anchored = col("__c0") === 1
    events.groupBy(col(userCol).as("user_id"))
      .agg(flags.head, flags.tail: _*)
      .select(col("user_id") +: conds.indices.map(i =>
        (if (i == 0) anchored else anchored && col(s"__c$i") === 1)
          .as(s"r_$i")): _*)
  }
}
