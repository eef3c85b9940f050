package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust numeric outlier detection (Tukey fences) — the distribution
  * check a pipeline runs on a metric column before trusting a load:
  * values outside `[q1 − k·IQR, q3 + k·IQR]` within their group are
  * flagged. Quartiles (not mean/stddev) keep the fences themselves
  * stable under the very outliers being hunted — one corrupt 1e300
  * row shifts a mean-based z-score past usefulness but moves an exact
  * quartile by at most one rank. The reference has no analog (its
  * validation stops at dbt not_null/unique tests, schema.yml:9-37);
  * this extends [[Check]]'s rule-based gate with a distribution-based
  * one, the same relationship [[graft.operators.Curate.topFraction]]
  * has to fixed-threshold curation.
  *
  * Scale shape: one aggregate pass computes per-group quartiles, the
  * tiny per-group fence table (|groups| rows) broadcast-joins back,
  * flagging is map-only — two jobs, one shuffle of group-partials, no
  * sort of the data. `fences`/`summary`/`flag` use EXACT
  * `percentile`, whose ObjectHashAggregate buffers each group's
  * values — right for oracle-pinned parity and any group that fits an
  * executor (≲10⁸ values), wrong for a 100 TB single group; there
  * [[flagApprox]] swaps in `approx_percentile` (GK sketch, bounded
  * memory, map-side partials) at a caller-chosen accuracy —
  * spec-tested against the exact fences, not oracle-pinnable
  * (engine-specific sketch).
  */
object Outliers {

  /** Per-group fence table: `(groupCols*, q1, q3, lo, hi)`. The
    * quartile form comes from [[graft.functions.Quantiles]] — exact
    * for oracle parity, GK sketch under its ε rank contract for the
    * 100 TB path. */
  def fences(df: DataFrame, valueCol: String, groupCols: Seq[String],
      k: Double = 1.5, approx: Boolean = false,
      accuracy: Int = graft.functions.Quantiles.DefaultAccuracy): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.Quantiles.one(valueCol, 0.25, approx, accuracy)
          .as("q1"),
        graft.functions.Quantiles.one(valueCol, 0.75, approx, accuracy)
          .as("q3"))
      .withColumn("lo", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(k) * (col("q3") - col("q1")))

  /** Null-safe (`<=>`) equi-join on the group columns: `groupBy`
    * produces a fence row for the NULL group, and a plain equi-join
    * would silently drop every input row in it — the flagged frame
    * must keep exactly the input's rows. */
  private def flagged(df: DataFrame, valueCol: String,
      groupCols: Seq[String], f: DataFrame): DataFrame = {
    val da = df.alias("__d")
    val fa = broadcast(f.alias("__f"))
    val cond = groupCols.map(c => col(s"__d.$c") <=> col(s"__f.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val joined = groupCols.foldLeft(da.join(fa, cond))(
      (j, c) => j.drop(col(s"__f.$c")))
    joined
      .withColumn("is_low", col(valueCol).isNotNull && col(valueCol) < col("lo"))
      .withColumn("is_high", col(valueCol).isNotNull && col(valueCol) > col("hi"))
  }

  /** Row-level flags: input columns + `(is_low, is_high)`. NULL values
    * are never outliers (they are [[Check]]'s business). */
  def flag(df: DataFrame, valueCol: String, groupCols: Seq[String],
      k: Double = 1.5, approx: Boolean = false,
      accuracy: Int = graft.functions.Quantiles.DefaultAccuracy): DataFrame =
    flagged(df, valueCol, groupCols,
      fences(df, valueCol, groupCols, k, approx, accuracy))
      .drop("q1", "q3", "lo", "hi")

  /** Per-group summary: `(groupCols*, n_vals, n_low, n_high, q1, q3)`. */
  def summary(df: DataFrame, valueCol: String, groupCols: Seq[String],
      k: Double = 1.5): DataFrame =
    flagged(df, valueCol, groupCols, fences(df, valueCol, groupCols, k))
      .groupBy(groupCols.map(col): _*)
      .agg(count(col(valueCol)).as("n_vals"),
        sum(when(col("is_low"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("is_high"), 1L).otherwise(0L)).as("n_high"),
        first(col("q1")).as("q1"), first(col("q3")).as("q3"))

  /** [[flag]] with GK-sketch quartiles — the 100 TB path: bounded
    * memory per group at `accuracy` (ε ≈ 1/accuracy rank error), so a
    * value within ε·n ranks of a fence may flip relative to exact.
    * Kept as a named entry point; since r17 it IS `flag(approx =
    * true)` — one switch ([[graft.functions.Quantiles]]), not two
    * hand-rolled expression builders that can drift. */
  def flagApprox(df: DataFrame, valueCol: String, groupCols: Seq[String],
      k: Double = 1.5,
      accuracy: Int = graft.functions.Quantiles.DefaultAccuracy): DataFrame =
    flag(df, valueCol, groupCols, k, approx = true, accuracy = accuracy)

  /** [[flag]] with CALLER-SUPPLIED fences — the maintained-profile
    * path: [[IncrementalProfile.fences]] derives `(lo, hi)` from the
    * store's churn-maintained GK sketches, so flagging a fresh load
    * pays NO quantile pass over history at all (the only scan is the
    * map-only flagging of the rows being checked — fences broadcast).
    * `fences` must carry the group columns plus `lo`/`hi`; the fence
    * values inherit whatever contract produced them (maintained
    * sketches: the [[graft.functions.Quantiles]] ε-rank contract, so a
    * value within ε·n ranks of a fence may flip vs exact — the same
    * tolerance as [[flagApprox]]). Rows in groups absent from
    * `fences` are dropped by the join — supply a complete fence
    * table. */
  def flagWith(df: DataFrame, valueCol: String, groupCols: Seq[String],
      fences: DataFrame): DataFrame = {
    require(fences.columns.contains("lo") && fences.columns.contains("hi"),
      "fences must carry lo/hi columns (Outliers.fences' shape)")
    flagged(df, valueCol, groupCols, fences)
      .drop(fences.columns.filterNot(groupCols.contains): _*)
  }
}
