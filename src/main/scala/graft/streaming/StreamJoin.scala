package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — Structured Streaming's
  * flagship stateful binary operator, wrapped with the constraints
  * that make it correct and bounded stated once: real-time enrichment
  * (impressions ⋈ clicks, events ⋈ quotes) where BOTH sides arrive as
  * streams and a match means "same key, right event within
  * `[left.ts − beforeSec, left.ts + afterSec]`".
  *
  * Why a wrapper: the raw API compiles happily with missing
  * watermarks or an unbounded time condition — and then state grows
  * forever (the join buffers every unmatched row until the watermark
  * proves no future match can arrive). This surface makes the two
  * watermarks and the two-sided interval part of the signature, so
  * every call site gets bounded state by construction: each side
  * buffers only rows younger than
  * `watermark + beforeSec/afterSec` — a sliding horizon, independent
  * of stream length. That is the 100 TB/day story: state ∝ rate ×
  * horizon, not history.
  *
  * Results match the batch interval join on the same data once the
  * watermark passes (StreamSpec pins streamed == [[batch]] on an
  * out-of-order two-batch replay, inner and left_outer). Late rows
  * beyond the watermark are dropped — same contract as every
  * watermarked op in this package.
  *
  * Batch analog for backfill: [[batch]] (identical predicate on
  * static frames; for very large static-static interval joins prefer
  * [[graft.operators.RangeJoin]]'s bucketed kernel).
  *
  * Reference anchor: none (the reference has no streaming surface) —
  * SURVEY §2.10 extension set.
  */
object StreamJoin {

  private def cond(beforeSec: Long, afterSec: Long, key: String,
      leftTs: String, rightTs: String) =
    expr(s"l.$key = r.$key") &&
      expr(s"r.$rightTs >= l.$leftTs - INTERVAL $beforeSec SECONDS") &&
      expr(s"r.$rightTs <= l.$leftTs + INTERVAL $afterSec SECONDS")

  /** Join two STREAMING frames. `watermarkDelay` (e.g. "2 seconds")
    * bounds out-of-order arrival on both sides; `joinType` supports
    * `inner` and `left_outer` (outer rows emit only once the
    * watermark proves no match can arrive — expect them on a LATER
    * trigger than their inputs). Output columns: all left columns,
    * then right's ts + payload columns suffixed `_r` on name clashes. */
  def interval(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, beforeSec: Long, afterSec: Long,
      watermarkDelay: String, joinType: String = "inner"): DataFrame = {
    require(beforeSec >= 0 && afterSec >= 0,
      "interval bounds must be non-negative")
    require(Set("inner", "left_outer")(joinType),
      s"unsupported joinType $joinType (inner | left_outer)")
    val (r0, rTs) = disambiguate(left, right, key, rightTs)
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = r0.withWatermark(rTs, watermarkDelay).alias("r")
    l.join(r, cond(beforeSec, afterSec, key, leftTs, rTs), joinType)
      .drop(col(s"r.$key"))
  }

  /** The SAME join on static frames — the backfill/parity analog. */
  def batch(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, beforeSec: Long, afterSec: Long,
      joinType: String = "inner"): DataFrame = {
    val l = left.alias("l")
    val (r0, rTs) = disambiguate(left, right, key, rightTs)
    val r = r0.alias("r")
    l.join(r, cond(beforeSec, afterSec, key, leftTs, rTs), joinType)
      .drop(col(s"r.$key"))
  }

  /** Suffix right-side columns (except the join key, which is dropped
    * after the join) that clash with left-side names, so the joined
    * frame is unambiguous without callers pre-renaming. `rightTs` is
    * IN the rename set — the natural call has the same ts name on both
    * sides (leftTs = rightTs = "ts"), and leaving it unrenamed would
    * emit two identically-named columns. Returns the renamed frame and
    * the effective right-ts name (`<rightTs>_r` on clash). */
  private def disambiguate(left: DataFrame, right: DataFrame,
      key: String, rightTs: String): (DataFrame, String) = {
    val clash = right.columns.toSet.intersect(left.columns.toSet) - key
    val renamed =
      clash.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"${c}_r"))
    (renamed, if (clash(rightTs)) s"${rightTs}_r" else rightTs)
  }
}
