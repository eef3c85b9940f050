package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.quality.Drift

/** Streaming distribution-drift monitor — the online half of
  * [[graft.quality.Drift]] (the reference reconciles snapshots in
  * batch; a live feed wants "did this column's shape move?" answered
  * per micro-batch, without rescanning history).
  *
  * Split of labor, mirroring every streaming twin here (frozen model,
  * incremental state):
  *  - the BASELINE is frozen up front: breaks from the old snapshot's
  *    quantiles ([[breaksOf]] — exact or sketch, the
  *    [[Drift.psiApprox]] relationship) and its histogram over those
  *    breaks, both computed ONCE in batch;
  *  - the STREAM carries only a cumulative per-bucket count of the new
  *    feed — a native Complete-mode streaming aggregation, no custom
  *    state operator at all. State is at most `buckets` rows of longs
  *    regardless of stream length: the same constant-state discipline
  *    as [[BudgetStream]]/[[Scd2Stream]], enforced here by Spark's own
  *    aggregation state store.
  *  - PSI itself is K-row arithmetic — [[Drift.psiFromHistograms]] on
  *    (frozen baseline hist × current counts), run per batch by the
  *    caller (e.g. inside foreachBatch) where it costs nothing.
  *
  * Bucketing uses [[Drift.bucketExpr]] — the EXACT expression the
  * batch histogram compiles — so after draining the whole new
  * snapshot, the cumulative counts are row-identical to
  * [[Drift.psi]]'s `n_new` column and the per-bucket `psi_contrib`
  * matches to the bit (DriftStreamSpec pins both, plus monotone growth
  * of the counts across batches).
  */
object DriftStream {

  /** Frozen baseline breaks — [[Drift.breaks]] itself (one derivation,
    * both halves of the parity contract); swap in `approx_percentile`
    * via [[Drift.psiApprox]]'s accuracy arm when the baseline itself
    * is huge. */
  def breaksOf(oldSnap: DataFrame, valueCol: String,
      buckets: Int = 10): Seq[Double] =
    Drift.breaks(oldSnap, valueCol, buckets)

  /** Cumulative per-bucket counts of the (streaming) new feed against
    * frozen `breaks` — a plain streaming groupBy/count: run it in
    * Complete output mode (the result set is `<= buckets` rows, the
    * one case Complete mode is designed for). Each emitted snapshot is
    * the counts-so-far; feed it to [[Drift.psiFromHistograms]] with
    * the frozen baseline histogram for the live PSI. */
  def bucketCounts(newStream: DataFrame, valueCol: String,
      breaks: Seq[Double]): DataFrame =
    newStream
      .where(col(valueCol).isNotNull)
      .groupBy(Drift.bucketExpr(col(valueCol).cast("double"), breaks)
        .as("bucket"))
      .agg(count(lit(1)).as("n_new"))
}
