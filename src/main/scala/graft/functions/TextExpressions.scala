package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the sketch primitives Spark lacks —
  * single-pass primitive loops over InternalRow data (bodies in
  * [[Kernels]]), with `doGenCode` emitting a static call so the
  * enclosing whole-stage-codegen span stays intact (no CodegenFallback
  * row boxing).
  *
  * Determinism: all seeds are compile-time constants derived via
  * splitmix64, so signatures are reproducible across runs/engines.
  */
object Hashing {
  /** splitmix64 — public-domain seed expander (Steele et al., JDK
    * SplittableRandom). */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** MinHash signature of a string-shingle set (Broder minwise hashing):
  * k minimums of pairwise-independent affine transforms of one base
  * xxhash64 per shingle. O(n·k), one pass. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    Kernels.minhashFromStrings(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Kernels.minhashFromStrings($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** MinHash signature over pre-hashed shingles (see [[HashedShingles]]). */
case class MinHashSigFromHashes(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_hashed"
  override def nullSafeEval(input: Any): Any =
    Kernels.minhashFromHashes(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Kernels.minhashFromHashes($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSigFromHashes =
    copy(child = c)
}

/** DISTINCT hashed word n-gram shingles of a text in ONE primitive
  * pass: whitespace-tokenize the UTF-8 bytes, xxhash64 each token in
  * place (no substring allocation), combine n consecutive token hashes.
  * Equivalent as a SET to hashing the joined shingle strings. Docs with
  * ≤ n tokens yield one whole-doc shingle. Replaces a split+transform+
  * slice+concat_ws HOF chain that was ~10× slower (interpreted closure
  * per element). */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"
  override def nullSafeEval(input: Any): Any =
    Kernels.hashedShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Kernels.hashedShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): HashedShingles =
    copy(child = c)
}

/** 64-bit SimHash of a token multiset (Charikar 2002): per-bit vote of
  * each token's xxhash64, sign → bit. One pass, O(n·64). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Kernels.simhash64(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Winnowed rolling-hash document fingerprint (Schleimer et al., MOSS,
  * SIGMOD'03): hash every `gram`-char window, keep the minimum of each
  * `window`-hash sliding window (rightmost on ties), distinct + sorted.
  * Robust to local edits; sub-linear output size. */
case class WinnowFingerprint(child: Expression, gram: Int, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override def nullSafeEval(input: Any): Any =
    Kernels.winnowFingerprint(input.asInstanceOf[UTF8String], gram, window)

  // The static body MUST live in Kernels, not in this class's companion:
  // a companion of a class that inherits `eval(InternalRow)` gets NO
  // static forwarder for an `eval` overload (Scala skips forwarders on
  // name clash), so generated Java couldn't resolve the call and the
  // whole stage silently fell back to interpreted execution.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Kernels.winnowFingerprint($c, $gram, $window)")

  override protected def withNewChildInternal(c: Expression): WinnowFingerprint =
    copy(child = c)
}

/** Composite text-quality score (C4/Gopher-style heuristics) in one
  * primitive pass — bit-exact semantics of the Column-composed
  * [[TextFunctions.qualityScoreComposed]], whose interpreted HOF tree
  * cost ~0.6 ms/doc and dominated `Curate.corpus`. */
case class TextQualityScore(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "text_quality"
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(Kernels.textQuality(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.textQuality($c)")
  override protected def withNewChildInternal(c: Expression): TextQualityScore =
    copy(child = c)
}

/** Function-word-profile language ID — bit-exact semantics of
  * [[TextFunctions.langIdComposed]] in one pass. */
case class TextLangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "text_langid"
  override def nullSafeEval(input: Any): Any =
    Kernels.langId(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.langId($c)")
  override protected def withNewChildInternal(c: Expression): TextLangId =
    copy(child = c)
}

/** Duplicate word-n-gram fraction (Gopher repetition filter) in one
  * pass — bit-exact semantics of
  * [[TextFunctions.dupGramFractionComposed]]. */
case class DupGramFraction(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dup_gram_fraction"
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(
      Kernels.dupGramFraction(input.asInstanceOf[UTF8String], n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.dupGramFraction($c, $n)")
  override protected def withNewChildInternal(c: Expression): DupGramFraction =
    copy(child = c)
}

/** Corpus-hygiene normalization: control-strip + Unicode NFC + trim in
  * one primitive pass with a no-allocation ASCII fast path (see
  * [[Kernels.normalizeClean]]). */
case class TextNormalizeClean(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "text_normalize_clean"
  override def nullSafeEval(input: Any): Any =
    Kernels.normalizeClean(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.normalizeClean($c)")
  override protected def withNewChildInternal(c: Expression): TextNormalizeClean =
    copy(child = c)
}

/** Deflate-compression ratio — one kernel call per row; see
  * [[Kernels.deflateRatio]] for semantics and determinism notes. */
case class TextDeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "text_deflate_ratio"
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(Kernels.deflateRatio(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.deflateRatio($c)")
  override protected def withNewChildInternal(c: Expression): TextDeflateRatio =
    copy(child = c)
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def textNormalizeClean(text: Column): Column =
    column(TextNormalizeClean(expression(text)))

  def minhashSig(shingles: Column, k: Int = 128): Column =
    column(MinHashSig(expression(shingles), k))

  def hashedShingles(text: Column, n: Int = 3): Column =
    column(HashedShingles(expression(text), n))

  def minhashSigFromHashes(shingleHashes: Column, k: Int = 128): Column =
    column(MinHashSigFromHashes(expression(shingleHashes), k))

  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))

  def winnowFingerprint(text: Column, gram: Int = 8, window: Int = 16): Column =
    column(WinnowFingerprint(expression(text), gram, window))

  def textQuality(text: Column): Column =
    column(TextQualityScore(expression(text)))

  def textLangId(text: Column): Column = column(TextLangId(expression(text)))

  def dupGramFraction(text: Column, n: Int = 3): Column =
    column(DupGramFraction(expression(text), n))

  def deflateRatio(text: Column): Column =
    column(TextDeflateRatio(expression(text)))
}
