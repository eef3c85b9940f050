package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines — language ID,
  * quality scoring, token counting, shingling. All native Column
  * expressions (codegen'd; no UDFs in the hot path).
  */
object TextFunctions {

  /** Whitespace tokens (empty string → empty array). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alternating letter-runs / digit-runs /
    * single punctuation, the shape of a byte-level BPE pre-tokenizer. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))

  private def stopwordsEn = Kernels.stopwordsEnList

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    val sw = filter(t, x => x.isInCollection(stopwordsEn))
    when(size(t) === 0, 0.0).otherwise(size(sw).cast("double") / size(t))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, 0.0).otherwise(
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t))
  }

  /** Composite quality score in [0,1] — the C4/Gopher-style cheap
    * heuristics: reasonable length, some stopwords, not punctuation
    * soup, sane mean word length. Deterministic integer/exact-division
    * arithmetic only (oracle-parity safe).
    *
    * Evaluates via the single-pass [[Kernels.textQuality]] custom
    * expression: the Column-composed tree ([[qualityScoreComposed]])
    * re-runs the `\s+` split per sub-score and its `filter`/`aggregate`
    * lambdas are interpreted (HOFs have no codegen) — measured
    * ~0.6 ms/doc, the most expensive stage of `Curate.corpus`. The
    * equivalence spec asserts the two agree bit-exactly. */
  def qualityScore(text: Column): Column = TextExpressions.textQuality(text)

  /** Deflate-compression ratio (compressed/raw bytes, level-6 raw
    * deflate) — the gibberish/repetition quality signal; see
    * [[Kernels.deflateRatio]]. */
  def compressionRatio(text: Column): Column =
    TextExpressions.deflateRatio(text)

  /** Column-composed restatement of [[qualityScore]] — the readable
    * reference the kernel is tested against (and the shape the DuckDB
    * oracle restates). Not for hot paths. */
  def qualityScoreComposed(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 64.0, lit(1.0))
    val swScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctRatio = punctCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio * 4.0)
    val mtl = meanTokenLen(text)
    val mtlScore = when(mtl >= 3.0 && mtl <= 10.0, 1.0).otherwise(0.5)
    (lenScore + swScore + punctScore + mtlScore) / 4.0
  }

  // Per-language function-word profiles for the n-gram/stopword
  // language-ID heuristic (textcat-style) — shared with the kernel.
  private def langProfiles = Kernels.langProfilesList

  /** Language ID: CJK codepoint presence → zh; otherwise argmax of
    * function-word hits (ties broken by profile order); no hits → und.
    * Evaluates via the single-pass [[Kernels.langId]] custom expression
    * (see [[qualityScore]] for why); [[langIdComposed]] is the tested
    * reference restatement. */
  def langId(text: Column): Column = TextExpressions.textLangId(text)

  /** Column-composed restatement of [[langId]] — the readable reference
    * the kernel is tested against. Not for hot paths. */
  def langIdComposed(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, x => x.isInCollection(words)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight nests en's `when` outermost → earlier profiles win ties.
    val firstWins = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(firstWins)
  }

  /** Duplicate word-n-gram fraction — the Gopher-style within-document
    * repetition signal (1 − distinct/total n-grams; ≤ n tokens → 0.0).
    * Evaluates via the single-pass [[Kernels.dupGramFraction]] custom
    * expression; [[dupGramFractionComposed]] is the tested reference. */
  def dupGramFraction(text: Column, n: Int = 3): Column =
    TextExpressions.dupGramFraction(text, n)

  /** Column-composed restatement of [[dupGramFraction]] — the readable
    * reference the kernel is tested against (and the shape the DuckDB
    * oracle restates). Not for hot paths. */
  def dupGramFractionComposed(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    val grams = transform(sequence(lit(0), size(t) - n),
      i => concat_ws(" ", slice(t, i + lit(1), lit(n))))
    when(size(t) <= n, 0.0).otherwise(
      lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams))
  }

  /** PII redaction patterns, applied in order (URLs first so their
    * digits/at-signs can't half-match later patterns). Every pattern is
    * restricted to the Java-regex ∩ RE2 common dialect — no lookaround,
    * no backrefs, ASCII classes only — so the DuckDB oracle restates
    * them verbatim and both engines replace identical spans. The phone
    * pattern is deliberately aggressive (C4-style corpus hygiene beats
    * precision): any plausible 8-to-13-digit grouping redacts. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "https?://[^ \\t\\n\\r]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d{1,3}[-. ]?\\(?\\d{2,4}\\)?[-. ]?\\d{3,4}[-. ]?\\d{3,4}" -> "<PHONE>")

  /** Redact emails, URLs, IPv4s and phone-shaped digit groups — the
    * C4/RefinedWeb-style safety pass before a corpus ships. Chained
    * native `regexp_replace` (codegen'd, map-only, zero shuffles). */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Word n-gram shingles from an already-projected token ARRAY column.
    *
    * IMPORTANT: pass an attribute (a column projected in a previous
    * select), not an inline `split(...)` expression — a non-attribute
    * referenced inside the `transform` lambda is re-evaluated per
    * element (O(tokens²) splits per row; measured 6.7s → 0.3s on 5k
    * docs). [[wordShingles]] wraps this for convenience at small scale.
    */
  def wordShinglesFromTokens(toks: Column, n: Int = 3): Column =
    when(size(toks) <= n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))

  /** Word n-gram shingles: ["a b c", "b c d", ...]; documents shorter
    * than n words get a single whole-text shingle. Prefer projecting
    * [[tokens]] first and calling [[wordShinglesFromTokens]] (see
    * perf note there). */
  def wordShingles(text: Column, n: Int = 3): Column =
    wordShinglesFromTokens(tokens(text), n)

  /** Character n-gram shingles via substring sweep. */
  def charShingles(text: Column, n: Int = 5): Column =
    when(length(text) <= n, array(text)).otherwise(
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** The HTML entities [[htmlExtract]] decodes, applied in order —
    * `&amp;` LAST, so `&amp;lt;` single-decodes to the literal text
    * `&lt;` (the correct one-level decode) instead of `<`. */
  private val htmlEntities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML → text extraction (the WET-file stage of a crawl pipeline:
    * CommonCrawl ships exactly this transform as its WET extracts).
    * Order matters and is part of the contract:
    *   1. strip comments `<!-- -->` (dot-all — comments span lines);
    *   2. strip `<script>`/`<style>` BLOCKS including content
    *      (case-insensitive + dot-all; script bodies may contain bare
    *      `<` that would otherwise corrupt step 3);
    *   3. replace every remaining tag `<[^>]*>` with a space (space,
    *      not empty — `a</p><p>b` must not fuse into `ab`);
    *   4. decode the common entities (after tag-strip, so text-level
    *      `&lt;b&gt;` becomes literal `<b>` TEXT and is not re-stripped);
    *   5. collapse whitespace runs and trim.
    * Chained native regexp/replace — codegen'd, map-only, zero
    * shuffles; the regexes live in the Java∩RE2 common dialect so the
    * DuckDB oracle replays the identical chain (`q_text_html_extract`).
    * This is a text-extraction heuristic, not an HTML5 parser — no
    * entity table beyond the common six, no CDATA; a production
    * pipeline swaps in a real parser behind the same column contract. */
  def htmlExtract(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComments, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = htmlEntities.foldLeft(noTags) {
      case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
