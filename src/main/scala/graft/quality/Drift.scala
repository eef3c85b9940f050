package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a numeric
  * column — the Population Stability Index, the standard
  * "did this feed change shape since yesterday" monitor a pipeline
  * runs next to [[graft.cdc.Diff]] (Diff answers WHICH rows changed;
  * PSI answers whether the DISTRIBUTION moved even when row counts
  * look fine — a silently drifting upstream unit, a truncated feed, a
  * re-denominated price column). Convention: PSI < 0.1 stable,
  * 0.1–0.25 moderate shift, > 0.25 investigate.
  *
  * Method: bucket boundaries are the OLD snapshot's exact interpolated
  * quantiles at i/buckets (so expected p_old ≈ 1/buckets per bucket by
  * construction — the classic equal-population banding), both
  * snapshots histogram into those FIXED breaks, shares are
  * Laplace-smoothed ((n+1)/(total+buckets), so empty buckets
  * contribute finitely instead of ±∞), and
  * `psi_contrib = (p_new − p_old) · ln(p_new / p_old)` per bucket —
  * `PSI = Σ contribs` ([[psiTotal]]).
  *
  * Scale shape: one exact-percentile aggregate over the old snapshot
  * (ObjectHashAggregate — for a 100 TB snapshot swap in
  * `approx_percentile` breaks; the declared key uses exact for
  * DuckDB `quantile_cont` parity, the same equivalence
  * `q_quality_outliers` pins), then two count-shaped histogram
  * aggregates with the breaks as plan literals — map-side partials,
  * one tiny shuffle each, nothing row-expanding. The old snapshot's
  * lineage runs twice (breaks + histogram) — pass a materialized
  * frame if it is expensive to recompute.
  *
  * Determinism: bucket counts are exact longs; shares are single
  * correctly-rounded double ops in a fixed order; `psi_contrib`
  * rounds to 6 decimals so the one non-correctly-rounded step (`ln`)
  * is engine-portable — the oracle restates the whole derivation.
  */
object Drift {

  /** Per-bucket drift rows `(bucket, n_old, n_new, psi_contrib)`,
    * bucket 0..buckets−1 (every bucket present, empty ones at 0). */
  def psi(oldSnap: DataFrame, newSnap: DataFrame, valueCol: String,
      buckets: Int = 10): DataFrame =
    withBreaks(oldSnap, newSnap, valueCol, buckets,
      breaks(oldSnap, valueCol, buckets))

  /** The baseline's exact interpolated-quantile breaks (i/buckets,
    * i = 1..buckets−1) — THE break rule of [[psi]], exposed as the
    * single source so the streaming monitor
    * ([[graft.streaming.DriftStream]]) freezes the identical breaks
    * the batch computation would use; a second copy of this derivation
    * is a parity bug waiting to drift. */
  def breaks(oldSnap: DataFrame, valueCol: String, buckets: Int = 10,
      approx: Boolean = false,
      accuracy: Int = graft.functions.Quantiles.DefaultAccuracy)
      : Seq[Double] = {
    require(buckets >= 2, s"need at least 2 buckets: $buckets")
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val row = oldSnap.where(col(valueCol).isNotNull)
      .agg(graft.functions.Quantiles.of(valueCol, ps, approx, accuracy)
        .as("__b"))
      .head()
    require(!row.isNullAt(0), "old snapshot has no non-null values")
    // GK returns column elements (ints stay ints); the break contract
    // is doubles either way.
    row.getSeq[Any](0).map {
      case d: Double => d
      case n: Number => n.doubleValue()
    }
  }

  /** The scalar PSI (driver action): Σ psi_contrib. */
  def psiTotal(oldSnap: DataFrame, newSnap: DataFrame, valueCol: String,
      buckets: Int = 10): Double =
    psi(oldSnap, newSnap, valueCol, buckets)
      .agg(sum("psi_contrib")).head().getDouble(0)

  /** [[psi]] with GK-sketch breaks — the 100 TB path (the
    * [[Outliers.flagApprox]] relationship): `approx_percentile` is a
    * mergeable bounded-memory sketch with map-side partials, so the
    * break computation never funnels the column through one task the
    * way exact interpolated percentile must. A value within ε·n ranks
    * of a break (ε ≈ 1/accuracy) may land one bucket over relative to
    * [[psi]] — spec-tested against the exact bucketing, not
    * oracle-pinnable (engine-specific sketch). */
  def psiApprox(oldSnap: DataFrame, newSnap: DataFrame, valueCol: String,
      buckets: Int = 10,
      accuracy: Int = graft.functions.Quantiles.DefaultAccuracy): DataFrame =
    withBreaks(oldSnap, newSnap, valueCol, buckets,
      breaks(oldSnap, valueCol, buckets, approx = true, accuracy = accuracy))

  /** Bucket index of a value against fixed `breaks` (count of breaks
    * it exceeds — bucket 0..breaks.size). Codegen'd comparison chain
    * with the breaks as plan literals; shared with the streaming
    * monitor ([[graft.streaming.DriftStream]]), which must bucket with
    * the EXACT expression the batch histogram uses or the parity
    * contract is vacuous. */
  def bucketExpr(c: Column, breaks: Seq[Double]): Column =
    breaks.foldLeft(lit(0)) { (acc, b) =>
      acc + when(c > lit(b), 1).otherwise(0)
    }

  /** Smoothing + contribution over two already-bucketed histograms
    * `(bucket, n_old)` / `(bucket, n_new)` (missing buckets = 0) — the
    * shared tail of [[psi]]/[[psiApprox]] and the streaming monitor's
    * per-batch report. K-row inputs; the checkpoint pins the (possibly
    * snapshot-scan) lineage so totals + output read it once. */
  def psiFromHistograms(oldHist: DataFrame, newHist: DataFrame,
      buckets: Int): DataFrame = {
    val base = oldHist.sparkSession.range(buckets)
      .select(col("id").cast("int").as("bucket"))
    val joined = base
      .join(oldHist.select(col("bucket").cast("int").as("bucket"),
        col("n_old")), Seq("bucket"), "left")
      .join(newHist.select(col("bucket").cast("int").as("bucket"),
        col("n_new")), Seq("bucket"), "left")
      .na.fill(0L, Seq("n_old", "n_new"))
      .localCheckpoint(true)
    val tot = joined.agg(sum("n_old").as("__to"), sum("n_new").as("__tn"))
    val pOld = (col("n_old") + 1).cast("double") / (col("__to") + buckets)
    val pNew = (col("n_new") + 1).cast("double") / (col("__tn") + buckets)
    joined.crossJoin(broadcast(tot))
      .select(col("bucket").cast("long").as("bucket"),
        col("n_old"), col("n_new"),
        round((pNew - pOld) * log(pNew / pOld), 6).as("psi_contrib"))
  }

  /** Histogram of `valueCol` against fixed breaks: `(bucket, <name>)`
    * count rows, map-side partials, one tiny shuffle. */
  def histogram(df: DataFrame, valueCol: String, breaks: Seq[Double],
      name: String): DataFrame =
    df.where(col(valueCol).isNotNull)
      .groupBy(bucketExpr(col(valueCol).cast("double"), breaks).as("bucket"))
      .agg(count(lit(1)).as(name))

  /** Histogram + smoothing + contribution over given breaks — the
    * shared tail of [[psi]] and [[psiApprox]]. */
  private def withBreaks(oldSnap: DataFrame, newSnap: DataFrame,
      valueCol: String, buckets: Int, breaks: Seq[Double]): DataFrame =
    psiFromHistograms(
      histogram(oldSnap, valueCol, breaks, "n_old"),
      histogram(newSnap, valueCol, breaks, "n_new"), buckets)

  /** [[psi]] for a CATEGORICAL column: buckets are the old snapshot's
    * `topK` most frequent categories (ties by category — a bounded,
    * deterministic driver collect, the Ivf-centroids pattern) plus one
    * `__other__` catch-all, so a new category appearing in the new
    * snapshot surfaces as `__other__` growth instead of being
    * invisible. Same smoothing and contribution formula; rows are
    * `(category, n_old, n_new, psi_contrib)`. NULL categories count
    * into `__other__` (a feed that starts emitting NULLs is drift),
    * and so does a category literally NAMED `__other__` — it is
    * excluded from the top-K by construction so the catch-all bucket
    * can never collide with (and double-count against) a real one. */
  def psiCategorical(oldSnap: DataFrame, newSnap: DataFrame,
      catCol: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be positive: $topK")
    val top = oldSnap
      .groupBy(col(catCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__c").isNotNull && col("__c") =!= "__other__")
      .orderBy(col("__n").desc, col("__c"))
      .limit(topK)
      .select("__c").collect().map(_.getString(0)).toSeq
    val nCats = top.size + 1 // + __other__
    def catOf(c: Column): Column =
      when(c.isNull || !c.isin(top: _*), lit("__other__"))
        .otherwise(c.cast("string"))
    def hist(df: DataFrame, name: String): DataFrame =
      df.groupBy(catOf(col(catCol)).as("category"))
        .agg(count(lit(1)).as(name))
    val spark = oldSnap.sparkSession
    import spark.implicits._
    val base = (top :+ "__other__").toDF("category")
    val joined = base
      .join(hist(oldSnap, "n_old"), Seq("category"), "left")
      .join(hist(newSnap, "n_new"), Seq("category"), "left")
      .na.fill(0L, Seq("n_old", "n_new"))
      .localCheckpoint(true) // see psi: K rows, snapshot-scan lineage
    val tot = joined.agg(sum("n_old").as("__to"), sum("n_new").as("__tn"))
    val pOld = (col("n_old") + 1).cast("double") / (col("__to") + nCats)
    val pNew = (col("n_new") + 1).cast("double") / (col("__tn") + nCats)
    joined.crossJoin(broadcast(tot))
      .select(col("category"), col("n_old"), col("n_new"),
        round((pNew - pOld) * log(pNew / pOld), 6).as("psi_contrib"))
  }
}
