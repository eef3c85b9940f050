package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native Catalyst aggregates behind [[GkSketch.sketchAgg]] /
  * [[GkSketch.mergeAgg]] (VERDICT r19 ask #6): the r19 form rode
  * `Aggregator` UDAFs whose buffers crossed the partial→final exchange
  * via `Encoders.javaSerialization` — fine at profile scale
  * (≤ nBuckets×nCols rows) but a latent trap the moment anyone lifts
  * the sketch to a per-corpus-row path, since Java serialization of a
  * `QuantileSummaries` is ~10× the compact layout and the in-code
  * justification explicitly invites reuse. These are
  * `TypedImperativeAggregate`s — the same execution class Spark's own
  * `ApproximatePercentile` uses (and the same one `udaf()` lowers to):
  * the buffer stays a plain JVM `QuantileSummaries` within a
  * partition, and ONLY shuffle/spill boundaries pay serialization,
  * now through [[GkSketch.toBytes]]'s compact
  * `(eps, count, n, [value,g,delta]×n)` layout — the exact bytes the
  * output column already carries, so one codepath serializes
  * everywhere. Semantics are pinned by QuantilesSpec /
  * `q_profile_incremental_quantiles`, which predate the swap. */
case class GkSketchAgg(child: Expression, eps: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries]
    with UnaryLike[Expression] {

  // input must already be DOUBLE ([[GkSketch.sketchAgg]] callers cast;
  // ExpectsInputTypes is private[sql], so the contract is documented
  // here instead of declared)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "gk_sketch_agg"

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  /** Nulls are skipped (SQL aggregate convention — the profile's
    * n_nulls counts them separately). */
  override def update(buffer: QuantileSummaries, input: InternalRow)
      : QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.insert(v.asInstanceOf[Double])
  }

  override def merge(buffer: QuantileSummaries, other: QuantileSummaries)
      : QuantileSummaries =
    buffer.compress().merge(other.compress())

  override def eval(buffer: QuantileSummaries): Any =
    GkSketch.toBytes(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    GkSketch.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    GkSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): GkSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GkSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): GkSketchAgg =
    copy(child = c)
}

/** Union of already-built sketch byte values ([[GkSketchAgg]]'s
  * output): NULL inputs are skipped (string columns carry no sketch),
  * and an input-less group yields NULL like every SQL aggregate — the
  * buffer is `null` until the first sketch lands, serialized as the
  * empty byte array (a real sketch's layout is ≥ 20 bytes, so the
  * encoding is unambiguous). */
case class GkMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries]
    with UnaryLike[Expression] {

  // input must be the BINARY sketch layout ([[GkSketchAgg]]'s output)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gk_merge_agg"

  override def createAggregationBuffer(): QuantileSummaries = null

  override def update(buffer: QuantileSummaries, input: InternalRow)
      : QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = GkSketch.fromBytes(v.asInstanceOf[Array[Byte]])
      if (buffer == null) in else buffer.merge(in)
    }
  }

  override def merge(buffer: QuantileSummaries, other: QuantileSummaries)
      : QuantileSummaries =
    if (buffer == null) other
    else if (other == null) buffer
    else buffer.merge(other)

  override def eval(buffer: QuantileSummaries): Any =
    if (buffer == null) null else GkSketch.toBytes(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else GkSketch.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    if (bytes.isEmpty) null else GkSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): GkMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GkMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): GkMergeAgg =
    copy(child = c)
}
