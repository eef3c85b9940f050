package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

/** Mergeable Greenwald–Khanna quantile sketch as a COLUMN VALUE — the
  * missing piece that lets [[graft.quality.IncrementalProfile]] carry
  * percentiles at churn cost (VERDICT r18 "what's missing" #3:
  * count/nulls/min-max/HLL all ride mergeable per-bucket state, but
  * `approx_percentile` never EXPOSES its sketch, so quantiles were the
  * one profile statistic that still needed a table rescan).
  *
  * The sketch IS Spark's own `QuantileSummaries` (the GK [Greenwald &
  * Khanna, SIGMOD '01] summary behind `approx_percentile` /
  * `ApproximatePercentile`), serialized to a stable byte layout
  * `(relativeError, count, n, [value, g, delta]×n)` so it can live in
  * a parquet BINARY column, survive a [[graft.cdc.CowStore]] round
  * trip, and union across disjoint row sets. Merging GK summaries of a
  * PARTITION of the data preserves the ε-rank guarantee (the paper's
  * merge bound; also exactly what Spark's partial aggregation of
  * `approx_percentile` does internally), so the contract here is the
  * same one [[Quantiles]] documents for the approx switch: a queried
  * element's RANK is within ε·n of the requested rank — nothing about
  * value distance. QuantilesSpec pins the contract for the merged
  * form; `q_profile_incremental_quantiles` gates it over the full
  * store lifecycle.
  *
  * The aggregates are native `TypedImperativeAggregate`s
  * ([[GkSketchAgg]]/[[GkMergeAgg]] — VERDICT r19 ask #6 retired the
  * r19 `Aggregator` UDAF whose shuffle buffers rode
  * `Encoders.javaSerialization`): the buffer is a plain JVM
  * `QuantileSummaries` within a partition and only exchange/spill
  * boundaries serialize, through the same compact byte layout the
  * output column carries — per-corpus-row use is no longer a trap.
  */
object GkSketch {

  /** ε shared with [[Quantiles.DefaultAccuracy]] (1/accuracy). */
  val DefaultEps: Double = 1.0 / Quantiles.DefaultAccuracy

  private[graft] def toBytes(qs0: QuantileSummaries): Array[Byte] = {
    val qs = qs0.compress()
    val n = qs.sampled.length
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 4 + n * 24)
    bb.putDouble(qs.relativeError).putLong(qs.count).putInt(n)
    qs.sampled.foreach { st =>
      bb.putDouble(st.value).putLong(st.g).putLong(st.delta)
    }
    bb.array()
  }

  private[graft] def fromBytes(b: Array[Byte]): QuantileSummaries = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val eps = bb.getDouble
    val count = bb.getLong
    val n = bb.getInt
    val st = Array.fill(n)(
      QuantileSummaries.Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      eps, st, count, true)
  }

  /** Aggregate a numeric column into GK sketch bytes (nulls skipped —
    * the profile's n_nulls counts them separately; an empty group
    * yields an EMPTY sketch's bytes, never NULL). The cast is applied
    * HERE because the aggregate's update does a raw Double unbox and
    * `ExpectsInputTypes` is private[sql] — without it an int/long
    * column would throw ClassCastException at executor runtime (the
    * r19 udaf form upcast via its input encoder). */
  def sketchAgg(value: Column, eps: Double = DefaultEps): Column =
    column(GkSketchAgg(expression(value.cast("double")), eps)
      .toAggregateExpression())

  /** Aggregate sketch-byte values into their union (NULL sketches
    * skipped — string columns carry none; empty input → NULL, like
    * every SQL agg). */
  def mergeAgg(sketch: Column): Column =
    column(GkMergeAgg(expression(sketch)).toAggregateExpression())

  /** Scalar: query `ps` from sketch bytes → array<double> (NaN per
    * entry for an empty sketch; NULL sketch → NULL). A udf is fine
    * here — it runs on the FOLDED rows (≤ nCols per [[mergeAgg]]
    * output), never per corpus row. */
  def quantilesOf(sketch: Column, ps: Seq[Double]): Column = {
    require(ps.nonEmpty, "need at least one percentage")
    ps.foreach(p => require(p >= 0.0 && p <= 1.0, s"p out of [0,1]: $p"))
    val f = udf((b: Array[Byte]) =>
      if (b == null) null
      else {
        val qs = fromBytes(b)
        ps.map(p => qs.query(p).getOrElse(Double.NaN)).toArray
      })
    f(sketch)
  }
}
