package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}

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
  * Why an `Aggregator` UDAF and not a Catalyst expression: the sketch
  * column is maintenance-path state (one row per bucket×column, ≤
  * config-bounded thousands of rows; the global fold reads ≤
  * nBuckets×nCols sketches) — never a per-corpus-row hot path, so
  * typed-UDAF ser/de overhead is irrelevant while the builtin
  * `percentile_approx` stays the operator-level answer for one-shot
  * queries.
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

  /** Nulls are skipped (SQL aggregate convention — the profile's
    * n_nulls counts them separately). */
  private class SketchAgg(eps: Double)
      extends Aggregator[java.lang.Double, QuantileSummaries, Array[Byte]] {
    def zero: QuantileSummaries =
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)
    def reduce(b: QuantileSummaries, a: java.lang.Double): QuantileSummaries =
      if (a == null) b else b.insert(a.doubleValue())
    def merge(b1: QuantileSummaries, b2: QuantileSummaries)
        : QuantileSummaries =
      b1.compress().merge(b2.compress())
    def finish(b: QuantileSummaries): Array[Byte] = toBytes(b)
    def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.javaSerialization[QuantileSummaries]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union of already-built sketches (NULL sketches skipped — string
    * columns carry none). Empty input → NULL, like every SQL agg. */
  private class MergeAgg
      extends Aggregator[Array[Byte], Option[QuantileSummaries],
        Array[Byte]] {
    def zero: Option[QuantileSummaries] = None
    def reduce(b: Option[QuantileSummaries], a: Array[Byte])
        : Option[QuantileSummaries] =
      if (a == null) b
      else Some(b.fold(fromBytes(a))(_.merge(fromBytes(a))))
    def merge(b1: Option[QuantileSummaries], b2: Option[QuantileSummaries])
        : Option[QuantileSummaries] =
      (b1, b2) match {
        case (Some(x), Some(y)) => Some(x.merge(y))
        case _ => b1.orElse(b2)
      }
    def finish(b: Option[QuantileSummaries]): Array[Byte] =
      b.map(toBytes).orNull
    def bufferEncoder: Encoder[Option[QuantileSummaries]] =
      Encoders.javaSerialization[Option[QuantileSummaries]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a double column into GK sketch bytes. */
  def sketchAgg(value: Column, eps: Double = DefaultEps): Column =
    udaf(new SketchAgg(eps), Encoders.DOUBLE).apply(value)

  /** Aggregate sketch-byte values into their union. */
  def mergeAgg(sketch: Column): Column =
    udaf(new MergeAgg, Encoders.BINARY).apply(sketch)

  /** Scalar: query `ps` from sketch bytes → array<double> (NaN per
    * entry for an empty sketch; NULL sketch → NULL). */
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
