package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters — the bounded-memory, single-pass,
  * MERGEABLE frequent-items summary (Misra & Gries 1982; mergeability
  * per Agarwal et al., PODS'12 "Mergeable Summaries"): the
  * approximate counterpart of the exact `q_text_top_tokens` aggregate
  * for the regime where the DISTINCT-item domain itself doesn't fit —
  * corpus-wide token/hostname/shingle frequencies at 100 TB, where an
  * exact groupBy shuffles one row per distinct item but a capacity-C
  * summary ships C counters per map partition.
  *
  * Guarantee (what the driver gate `q_text_heavy_hitters` asserts as
  * integer arithmetic, partition-layout-independent): for total
  * weight n and capacity C, every item with true count > n/(C+1) is
  * IN the summary, and each summary estimate `est` satisfies
  * `est ≤ true ≤ est + n/(C+1)` — the classic MG lower-bound with
  * additive error n/(C+1). The trim step subtracts the (C+1)-th
  * largest counter from all and drops non-positives, both per-row
  * (where it degenerates to subtract-the-min) and at merge; total
  * subtracted weight telescopes to ≤ n/(C+1) for ANY merge order, so
  * map-side partial aggregation is safe — the raw counter VALUES are
  * merge-order-dependent (inherent to MG), the error bound is not,
  * which is why the gate pins the theorem, not the counters.
  *
  * Scale shape: one pass, no shuffle of item rows beyond the C-sized
  * partial buffers (Spark's partial aggregation combines map-side);
  * trim is O(C) amortized per overflow. For exact counts of a SMALL
  * known domain use the plain groupBy; for distinct-count (not
  * frequency) use [[DistinctSketch]].
  */
object HeavyHitters {

  /** Weighted MG summary aggregator over (item, weight) pairs.
    * Buffer/result: item → lower-bound count, ≤ capacity entries. */
  final class MgAgg(capacity: Int)
      extends Aggregator[(String, Long), Map[String, Long], Map[String, Long]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Map[String, Long] = Map.empty

    /** Subtract the (capacity+1)-th largest value, drop non-positive.
      * On the per-ROW path the buffer has exactly capacity+1 entries,
      * so the (C+1)-th largest IS the minimum — O(C), no sort; only
      * the (rare, per-merge) >C+1 case pays a selection sort. */
    private def trim(b: Map[String, Long]): Map[String, Long] =
      if (b.size <= capacity) b
      else {
        val d =
          if (b.size == capacity + 1) b.valuesIterator.min
          else b.valuesIterator.toArray.sortBy(-_).apply(capacity)
        b.flatMap { case (k, v) =>
          if (v - d > 0L) Some(k -> (v - d)) else None
        }
      }

    override def reduce(b: Map[String, Long], a: (String, Long)): Map[String, Long] =
      if (a._2 <= 0L) b
      else trim(b + (a._1 -> (b.getOrElse(a._1, 0L) + a._2)))

    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
      if (b1.isEmpty) b2
      else if (b2.isEmpty) b1
      else trim(b2.foldLeft(b1) { case (acc, (k, v)) =>
        acc + (k -> (acc.getOrElse(k, 0L) + v))
      })

    override def finish(b: Map[String, Long]): Map[String, Long] = b

    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Corpus-wide summary of `itemCol` (weighted by `weight`), exploded
    * to `(item, est)` rows, largest first (ties by item). `est` is the
    * MG lower bound — merge-order-dependent in its exact value, bound
    * by the class guarantee; treat it as a ranking/screening signal
    * and re-count the survivors exactly when exact counts matter
    * (they are ≤ capacity items — a broadcast-semi-join re-count). */
  def summary(df: DataFrame, itemCol: String, capacity: Int,
      weight: Column = lit(1L)): DataFrame = {
    val agg = udaf(new MgAgg(capacity))
    // NULL weights coalesce to 0 (skipped by the aggregator's w<=0
    // guard) — a raw NULL would fail the primitive-Long input decode
    df.select(col(itemCol).cast("string").as("__i"),
        coalesce(weight.cast("long"), lit(0L)).as("__w"))
      .where(col("__i").isNotNull)
      .agg(agg(col("__i"), col("__w")).as("__mg"))
      .select(explode(col("__mg")).as(Seq("item", "est")))
      .orderBy(col("est").desc, col("item"))
  }

  /** Merge previously-computed summaries — the incremental/rollup
    * form ([[DistinctSketch]]'s lifecycle, for frequencies): persist
    * one C-row [[summary]] per ingest batch, then roll up by
    * re-aggregating their `(item, est)` rows through the same MG trim
    * with `est` as the weight. Mergeable-summaries guarantee (Agarwal
    * et al., PODS'12): the result is a valid capacity-C summary of
    * the CONCATENATED input — presence above n_total/(C+1), same
    * additive bound — so history is never rescanned and any rollup
    * costs O(batches · C) rows. */
  def merge(summaries: DataFrame, capacity: Int): DataFrame =
    summary(summaries, "item", capacity, weight = col("est"))

  /** [[summary]] per group: `(groupCols*, item, est)`. */
  def summaryPerGroup(df: DataFrame, groupCols: Seq[String],
      itemCol: String, capacity: Int,
      weight: Column = lit(1L)): DataFrame = {
    val agg = udaf(new MgAgg(capacity))
    df.select((groupCols.map(col) :+
        col(itemCol).cast("string").as("__i") :+
        coalesce(weight.cast("long"), lit(0L)).as("__w")): _*)
      .where(col("__i").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("__i"), col("__w")).as("__mg"))
      .select((groupCols.map(col) :+
        explode(col("__mg")).as(Seq("item", "est"))): _*)
  }
}
