package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions hook: registers the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same
  * kernels as the DataFrame API:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *   spark.sql("SELECT simhash64(split(text, ' ')) FROM docs")
  * }}}
  *
  * No custom optimizer rules or strategies are injected — SURVEY §4:
  * every optimization the reference relies on is native Catalyst; the
  * extension surface here is function registration only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  /** Resolution-time literal-int argument: a non-foldable or non-integral
    * argument must fail with a clear analysis-time message, not a
    * ClassCastException/NPE from a raw eval(). */
  private def intArg(fn: String, pos: Int, e: Expression): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument $pos must be a literal integer, got non-foldable ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument $pos must be a literal integer, got $other (${e.sql})")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens ARRAY<STRING>) - 64-bit SimHash"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((FunctionIdentifier("hashed_shingles"),
      info("hashed_shingles",
        "hashed_shingles(text, n) - distinct hashed word n-gram shingles"),
      (args: Seq[Expression]) => HashedShingles(args.head,
        intArg("hashed_shingles", 1, args(1)))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles ARRAY<STRING>, k) - MinHash signature"),
      (args: Seq[Expression]) => MinHashSig(args.head,
        intArg("minhash_sig", 1, args(1)))))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprint"),
      info("winnow_fingerprint",
        "winnow_fingerprint(text, gram, window) - winnowed rolling-hash fingerprints"),
      (args: Seq[Expression]) => WinnowFingerprint(args.head,
        intArg("winnow_fingerprint", 1, args(1)),
        intArg("winnow_fingerprint", 2, args(2)))))
    ext.injectFunction((FunctionIdentifier("text_quality"),
      info("text_quality",
        "text_quality(text) - composite C4/Gopher-style quality score in [0,1]"),
      (args: Seq[Expression]) => TextQualityScore(args.head)))
    ext.injectFunction((FunctionIdentifier("text_langid"),
      info("text_langid",
        "text_langid(text) - function-word-profile language ID (en/de/fr/es/zh/und)"),
      (args: Seq[Expression]) => TextLangId(args.head)))
    ext.injectFunction((FunctionIdentifier("dup_gram_fraction"),
      info("dup_gram_fraction",
        "dup_gram_fraction(text, n) - duplicate word n-gram fraction (repetition signal)"),
      (args: Seq[Expression]) => DupGramFraction(args.head,
        intArg("dup_gram_fraction", 1, args(1)))))
    ext.injectFunction((FunctionIdentifier("text_normalize_clean"),
      info("text_normalize_clean",
        "text_normalize_clean(text) - control-strip + Unicode NFC + trim"),
      (args: Seq[Expression]) => TextNormalizeClean(args.head)))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets",
        "lsh_buckets(vec ARRAY<DOUBLE>, tables, bits, dim) - sign-random-projection buckets"),
      (args: Seq[Expression]) => LshBuckets(args.head,
        intArg("lsh_buckets", 1, args(1)), intArg("lsh_buckets", 2, args(2)),
        intArg("lsh_buckets", 3, args(3)))))
  }
}
