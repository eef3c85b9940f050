package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — Apache DataSketches HLL via
  * Spark's built-in `hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate` (codegen'd, no UDFs): the incremental-
  * analytics primitive for "distinct users per <anything>" at 100 TB.
  *
  * The point is the ALGEBRA, not the single query: a plain
  * `count(DISTINCT user)` is a full shuffle of every occurrence and
  * answers exactly one grouping, once. A sketch table built per
  * ingest partition (day, batch, source) is a few KB per group,
  * persists like any other table ([[graft.cdc.TableStore]] /
  * [[graft.cdc.AppendStore]] alongside the CDC surfaces), and every
  * later rollup — any date range, any group union, cross-table
  * overlap-free unions — is a tiny union-of-registers aggregate over
  * the SKETCH table. History is never rescanned; the error bound
  * (~1.04/√2^lgK ≈ 1.6% at the default lgK=12) is fixed at build
  * time and survives arbitrary merging (HLL union is lossless at the
  * same lgK — `q_agg_hll_incremental` pins merged == one-shot as an
  * EQUALITY, not a tolerance).
  *
  * Reference anchor: the reference's dashboards recompute distinct
  * counts per load (dbt models over the full table); this is the
  * beyond-reference incremental form of the same answers.
  */
object DistinctSketch {

  /** Per-group sketch table: `groupCols` ++ one binary `sketch`
    * column. One shuffle on the group key, map-side partial sketches
    * (each partition contributes registers, not rows). */
  def build(df: DataFrame, keyCol: String, groupCols: Seq[String],
      lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK $lgK outside DataSketches [4,21]")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))
  }

  /** Roll sketches up to a coarser grouping (empty `groupCols` = one
    * global row): union-of-registers aggregate + estimate. Input is
    * the (tiny) sketch table, so this touches no base data. */
  def rollup(sketches: DataFrame, groupCols: Seq[String] = Nil)
      : DataFrame = {
    val merged = hll_sketch_estimate(
      hll_union_agg(col("sketch"), lit(false))).as("estimate")
    if (groupCols.isEmpty) sketches.agg(merged)
    else sketches.groupBy(groupCols.map(col): _*).agg(merged)
  }

  /** Per-group estimates straight off a sketch table (no merge). */
  def estimate(sketches: DataFrame): DataFrame =
    sketches.withColumn("estimate",
      hll_sketch_estimate(col("sketch"))).drop("sketch")
}
