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
  * count; the greedy-over-starts is O(starts × events) per user —
  * for a pathological bot user, pre-bucket by coarse time (funnel
  * windows are hours/days; a chain never crosses a bucket boundary
  * by more than one window, so overlap-by-window bucketing bounds
  * the array at 2×bucket) before handing events in.
  */
object Funnel {

  /** Per-user funnel depth: `(user_id, level)` over ALL users that
    * produced at least one participating event (level ≥ 1 requires a
    * step-1 event; users with only later-step events report 0). */
  def levels(events: DataFrame, conds: Seq[Column], windowSec: Long,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(conds.nonEmpty && conds.size <= 30, "need 1..30 steps")
    require(windowSec > 0, "windowSec must be positive")
    val n = conds.size
    val winUs = windowSec * 1000000L
    val bits = conds.zipWithIndex
      .map { case (c, i) => when(c, lit(1 << i)).otherwise(lit(0)) }
      .reduce(_ + _)
    val perUser = events
      .select(col(userCol).as("user_id"),
        unix_micros(col(tsCol)).as("__us"), bits.cast("long").as("__b"))
      .where(col("__b") =!= 0)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("__us"), col("__b"))))
        .as("__evs"))
    // greedy automaton state: (lvl, need = bit value of the NEXT step,
    // last = ts of the chain's latest event); `s` is the fixed first
    // event, so the window anchor s.__us rides the outer lambda.
    val level = coalesce(array_max(transform(
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
    perUser.select(col("user_id"), level.cast("long").as("level"))
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
