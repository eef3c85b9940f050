package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel behind [[BpeEncode]]: apply an ordered byte-pair-
  * encoding merge list to a pre-token array. Lives OUTSIDE any
  * Expression companion so the generated Java resolves the static call
  * (see the forwarder note on `WinnowFingerprint.doGenCode`).
  *
  * The merge list arrives per row as the same `Literal` `ArrayData`
  * instance (codegen holds the literal in a member field), so the
  * compiled model — ordered pair list + a bounded word→tokens memo —
  * is cached per literal IDENTITY: one compile per executor per model,
  * O(1) lookup per row. The memo is the same trick real tokenizers
  * use: natural-language word frequency is Zipfian, so encoding each
  * DISTINCT word once covers almost every occurrence.
  *
  * Encoding applies each merge fully, in training order (Sennrich et
  * al. 2016's original procedure — the same order training itself
  * applied while learning, so train(corpus).encode(corpus) is
  * self-consistent by construction; the spec pins parity against an
  * independent reference implementation).
  */
object BpeKernel {

  private final class IdKey(val ref: AnyRef) {
    override def hashCode: Int = System.identityHashCode(ref)
    override def equals(o: Any): Boolean = o match {
      case k: IdKey => k.ref eq ref
      case _ => false
    }
  }

  private final class Compiled(val pairs: Array[(String, String)]) {
    // bounded memo: stop inserting past the cap instead of evicting —
    // the Zipf head is what matters and arrives first in practice
    val memo = new ConcurrentHashMap[String, Array[String]]()
    val memoCap = 1 << 17
  }

  private val models = new ConcurrentHashMap[IdKey, Compiled]()

  private def compile(merges: ArrayData): Compiled =
    models.computeIfAbsent(new IdKey(merges), _ => {
      val n = merges.numElements()
      require(n % 2 == 0, s"flat merge list must have even length, got $n")
      val pairs = new Array[(String, String)](n / 2)
      var i = 0
      while (i < n / 2) {
        pairs(i) = (merges.getUTF8String(2 * i).toString,
          merges.getUTF8String(2 * i + 1).toString)
        i += 1
      }
      new Compiled(pairs)
    })

  /** One word through the ordered merge list. Left-to-right within
    * each merge: a merged symbol is immediately eligible as the LEFT
    * side of the next adjacency in the same pass ("aaa" + merge (a,a)
    * -> ["aa","a"], not ["a","aa"]). */
  private[graft] def encodeWord(word: String,
      pairs: Array[(String, String)]): Array[String] = {
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var m = 0
    while (m < pairs.length && syms.length > 1) {
      val (a, b) = pairs(m)
      // fast containment probe before allocating the merge pass
      var hit = false
      var j = 0
      while (!hit && j < syms.length - 1) {
        hit = syms(j) == a && syms(j + 1) == b; j += 1
      }
      if (hit) {
        val out = new collection.mutable.ArrayBuffer[String](syms.length)
        var p = 0
        while (p < syms.length) {
          if (p < syms.length - 1 && syms(p) == a && syms(p + 1) == b) {
            out += a + b; p += 2
          } else { out += syms(p); p += 1 }
        }
        syms = out.toArray
      }
      m += 1
    }
    syms
  }

  private def encodeCached(word: String, c: Compiled): Array[String] = {
    val got = c.memo.get(word)
    if (got != null) return got
    val toks = encodeWord(word, c.pairs)
    if (c.memo.size < c.memoCap) c.memo.put(word, toks)
    toks
  }

  /** Encode a pre-token array: per-word BPE, flattened in order. */
  def encode(words: ArrayData, merges: ArrayData): ArrayData = {
    val c = compile(merges)
    val out = new collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    while (i < words.numElements()) {
      val toks = encodeCached(words.getUTF8String(i).toString, c)
      var j = 0
      while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Token COUNT only — skips materializing the token array (the
    * packing/budgeting primitive: at 100 TB most callers want the
    * number, not the strings). */
  def countTokens(words: ArrayData, merges: ArrayData): Int = {
    val c = compile(merges)
    var n = 0
    var i = 0
    while (i < words.numElements()) {
      n += encodeCached(words.getUTF8String(i).toString, c).length
      i += 1
    }
    n
  }
}

/** Apply a trained BPE merge list (right operand: flat string-array
  * literal `[a1,b1,a2,b2,…]`) to a pre-token array (left operand),
  * yielding the flattened subword token array. Codegen'd as a static
  * call (model compile + word memo cached per literal identity in
  * [[BpeKernel]]). */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(words: Any, merges: Any): Any =
    BpeKernel.encode(words.asInstanceOf[ArrayData],
      merges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, m) =>
      s"graft.functions.BpeKernel.encode($w, $m)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : BpeEncode = copy(left = l, right = r)
}

/** [[BpeEncode]]'s count-only twin. */
case class BpeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(words: Any, merges: Any): Any =
    java.lang.Integer.valueOf(BpeKernel.countTokens(
      words.asInstanceOf[ArrayData], merges.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, m) =>
      s"graft.functions.BpeKernel.countTokens($w, $m)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : BpeCount = copy(left = l, right = r)
}

object BpeExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  private def mergesLiteral(merges: Seq[(String, String)]): Expression =
    Literal.create(merges.flatMap(p => Seq(p._1, p._2)),
      ArrayType(StringType, containsNull = false))

  def bpeEncode(words: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncode(expression(words), mergesLiteral(merges)))

  def bpeCount(words: Column, merges: Seq[(String, String)]): Column =
    column(BpeCount(expression(words), mergesLiteral(merges)))
}
