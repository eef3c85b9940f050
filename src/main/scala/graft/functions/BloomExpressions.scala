package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
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

/** Count of grams whose k md5-slice bloom bits are ALL set — the
  * map-side probe of [[graft.operators.Bloom.flag]] as one codegen'd
  * kernel call per row (see [[Kernels.bloomContainedCount]]; the
  * packed word array rides as the right child, an array<long>
  * literal). */
case class BloomContainedCount(left: Expression, right: Expression,
    mBits: Int, kHashes: Int, seed: String) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_contained_count"

  @transient private lazy val suffixBytes: Array[Byte] =
    (":" + seed).getBytes("UTF-8")

  override def nullSafeEval(grams: Any, words: Any): Any =
    java.lang.Long.valueOf(Kernels.bloomContainedCount(
      grams.asInstanceOf[ArrayData], words.asInstanceOf[ArrayData],
      mBits, kHashes, suffixBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomSuffix", suffixBytes, "byte[]")
    defineCodeGen(ctx, ev, (g, w) =>
      s"graft.functions.Kernels.bloomContainedCount($g, $w, $mBits, $kHashes, $ref)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : BloomContainedCount = copy(left = l, right = r)
}

/** The whole per-document bloom-decontamination probe —
  * [distinctGramCount, containedCount] in one codegen'd call; see
  * [[Kernels.bloomContamination]]. `left` = text, `right` = the
  * packed word array literal. */
case class BloomContamination(left: Expression, right: Expression,
    n: Int, mBits: Int, kHashes: Int, seed: String) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_contamination"

  @transient private lazy val suffixBytes: Array[Byte] =
    (":" + seed).getBytes("UTF-8")

  override def nullSafeEval(text: Any, words: Any): Any =
    Kernels.bloomContamination(text.asInstanceOf[UTF8String],
      words.asInstanceOf[ArrayData], n, mBits, kHashes, suffixBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomSuffix", suffixBytes, "byte[]")
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.Kernels.bloomContamination($t, $w, $n, $mBits, $kHashes, $ref)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : BloomContamination = copy(left = l, right = r)
}

object BloomFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Serialize once at plan-build time; executors deserialize lazily. */
  def mightContainLong(bf: BloomFilter, value: Column): Column = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    column(BloomMightContainLong(expression(value), out.toByteArray))
  }

  def containedCount(grams: Column, words: Column, mBits: Int, k: Int,
      seed: String): Column =
    column(BloomContainedCount(expression(grams), expression(words),
      mBits, k, seed))

  def contamination(text: Column, words: Column, n: Int, mBits: Int,
      k: Int, seed: String): Column =
    column(BloomContamination(expression(text), expression(words),
      n, mBits, k, seed))
}
