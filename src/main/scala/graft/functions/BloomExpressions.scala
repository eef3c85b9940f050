package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Explicit broadcast-bloom probe — the map-side pre-filter a
  * batch-vs-index join needs when Spark's own runtime-filter injection
  * can't fire (InjectRuntimeFilter only targets shuffle joins, and the
  * batch side of the signature-index probe broadcasts, so the index
  * scan would otherwise feed EVERY row into the join).
  *
  * Same execution shape as Spark's internal `BloomFilterMightContain`
  * (the application side of `spark.sql.optimizer.runtime.bloomFilter`):
  * the deserialized sketch is attached to the generated code as a
  * reference object and probed with one `mightContainLong` per row —
  * stays inside whole-stage codegen, no row boxing. The sketch is
  * built driver-side from the BATCH (bounded by the batch, KBs–MBs),
  * so shipping it as a plan literal is the broadcast.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef =
      ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bfRef.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
    copy(child = c)

  // Case-class equality on Array[Byte] is reference equality, which
  // would make two semantically identical probes never compare equal —
  // defeating expression canonicalization / semanticEquals (and any
  // future plan caching over this node). Compare the serialized sketch
  // by content, the same way Spark's Literal handles binary values.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContainLong =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)
}

object BloomFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Serialize once at plan-build time; executors deserialize lazily. */
  def mightContainLong(bf: BloomFilter, value: Column): Column = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    column(BloomMightContainLong(expression(value), out.toByteArray))
  }
}
