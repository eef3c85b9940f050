package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination — the 100 TB-scale complement of
  * [[Decontaminate]].
  *
  * [[Decontaminate.flag]] broadcasts the eval set's EXACT distinct-gram
  * dictionary and joins — right when the eval set is benchmarks (KBs to
  * MBs). Corpus-vs-corpus decontamination (a held-out split of millions
  * of documents, the GPT-3 §4 / Dodge 2021 concern applied at corpus
  * scale) breaks that: the exact dictionary is tens of GB and neither
  * broadcasts nor joins cheaply. The classic answer (Bloom 1970; the
  * shape Dolma/RedPajama-class pipelines use for URL and n-gram
  * blocklists) is a BITMAP: m bits, k hash functions, an item is
  * "maybe present" iff all k of its bits are set. False-positive rate
  * ≈ (1 − e^{−kn/m})^k is a CONFIG choice (size m to the eval-gram
  * count), false negatives are impossible — so a doc flagged clean is
  * GUARANTEED clean, the direction decontamination needs.
  *
  * Determinism & oracle: the k bit positions of a gram are md5-derived
  * — `p_i(g) = int(md5(g ":seed")[8i : 8i+8]) mod m`, the i-th 8-hex
  * slice of ONE md5 — a pure function of the gram string, so the
  * ENTIRE filter (which positions are set) and every probe verdict are
  * engine-restatable. The `q_decontaminate_bloom` oracle restates
  * membership at the position-SET level (`p ∈ {eval positions}` for
  * all k slices) — semantically identical to the packed bitmap, which
  * is just an encoding of that set (BloomSpec pins packed == set on a
  * planted fixture; DuckDB itself cannot build the packed words — its
  * `<<` refuses the sign-bit shift `1::BIGINT << 63`).
  *
  * Scale shape: the bitmap is O(m) — a CONFIG bound, independent of
  * corpus size — built by one pass over eval grams (k-way position
  * explode → ≤ m/64-key partial-aggregated `bit_or`) and collected as
  * ≤ m/64 longs (the one driver materialization, KBs). The corpus
  * probe is then PURELY map-side: the bitmap rides the plan as an
  * array literal and the whole per-doc probe (trim → split → grams →
  * distinct → k-slice md5 test → count) is ONE fused codegen'd kernel
  * call per row ([[graft.functions.BloomFunctions.contamination]];
  * measured 3.4 s → 0.5 s vs the interpreted `transform`/`filter`/
  * `size` lambda composition, which survives only as BloomSpec's
  * parity reference), no explode, no join, no shuffle — the only
  * exchange in the whole query is the final presentation sort. At
  * 1000 executors that is the plan you want: a few-MB broadcast and
  * an embarrassingly parallel scan.
  *
  * Cf. reference `base_loader.py` incremental-hygiene framing; the
  * reference has no corpus-scale decontamination — extension scope.
  */
object Bloom {

  /** Distinct word n-grams of `text` as STRINGS (whitespace tokens,
    * space-joined) — docs with ≤ n tokens contribute one whole-text
    * gram, the [[graft.functions.HashedShingles]] convention. String
    * grams (not hashes) because the bloom positions must be md5(gram)
    * so DuckDB can restate them; built entirely from codegen'd
    * higher-order array ops. DuckDB restatement:
    * `list_distinct(CASE WHEN len(t) <= n THEN [array_to_string(t,' ')]
    *  ELSE list_transform(range(1, len(t)-n+2), i -> t[i]||' '||…) END)`. */
  def gramStrings(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(
      when(size(toks) <= n, array(array_join(toks, " ")))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + lit(1), lit(n)), " "))))
  }

  /** The i-th bit position of item `g`: `int(md5(g ":seed")[8i:8i+8])
    * mod mBits` — slice i of one md5, so k ≤ 4 (32 hex chars / 8).
    * DuckDB: `CAST('0x' || substr(md5(g || ':seed'), i*8+1, 8) AS
    * BIGINT) % mBits`. */
  def position(g: Column, i: Int, mBits: Int, seed: String): Column =
    conv(substring(md5(concat(g, lit(":" + seed)).cast("binary")),
      i * 8 + 1, 8), 16, 10).cast("long") % mBits

  /** Build the packed bitmap over `items(itemCol)`: Array of m/64
    * longs, bit p set iff some item hashed there under some slice.
    * One k-way explode → `bit_or` partial-agg on ≤ m/64 word keys →
    * bounded driver collect (the bitmap IS driver state, like Ivf
    * centroids — O(config), not O(data)). */
  def build(items: DataFrame, itemCol: String, k: Int, mBits: Int,
      seed: String): Array[Long] = {
    require(k >= 1 && k <= 4, s"k must be in [1,4] (md5 has 4 8-hex slices): $k")
    require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a positive multiple of 64: $mBits")
    val words = new Array[Long](mBits / 64)
    items.where(col(itemCol).isNotNull)
      .select(explode(array((0 until k).map(i =>
        position(col(itemCol), i, mBits, seed)): _*)).as("__p"))
      .groupBy(shiftright(col("__p"), 6).as("__w"))
      .agg(expr("bit_or(shiftleft(1L, cast(__p & 63 as int)))").as("__word"))
      .collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Map-side membership probe of `g` against the packed bitmap: all k
    * bits set. The bitmap rides as ONE array literal (codegen
    * references the object, it is not unrolled); per slice the test is
    * `(words[p>>6] >> (p&63)) & 1 = 1` — arithmetic shift is fine, the
    * `& 1` masks to the one bit either way. */
  def mightContain(words: Array[Long], g: Column, k: Int, mBits: Int,
      seed: String): Column = {
    val wl = typedlit(words.toSeq)
    (0 until k).map { i =>
      val p = position(g, i, mBits, seed)
      // variable-amount shift → call_function (the Scala shiftright
      // only takes a literal Int shift)
      call_function("shiftright",
        element_at(wl, shiftright(p, 6).cast("int") + 1),
        p.bitwiseAND(lit(63L)).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Per-doc bloom contamination of `docs` against `evalDocs` — the
    * [[Decontaminate.flag]] output shape (`n_maybe` may overcount by
    * the FPR, never undercount): `(idCol, n_maybe, contamination,
    * flagged)`. Builds the bitmap from eval grams (one bounded pass),
    * then ONE map-only corpus pass — grams built, probed, and counted
    * per row by higher-order ops, zero shuffle. */
  def flag(docs: DataFrame, evalDocs: DataFrame, n: Int = 3,
      threshold: Double = 0.5, mBits: Int = 1 << 16, k: Int = 4,
      seed: String = "bl", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(gramStrings(col(textCol), n)).as("__g")).distinct()
    val words = build(evalGrams, "__g", k, mBits, seed)
    docs
      // the whole probe (trim→split→grams→distinct→k-slice md5 test)
      // is ONE codegen'd kernel call per doc: the Column-composed form
      // builds every gram through interpreted transform/array_join
      // lambdas and its 4 md5s per gram re-derive hex strings —
      // measured 3.4s vs 0.5s for this key at sf0.1 (BloomSpec pins
      // kernel == Column-form parity)
      .select(col(idCol),
        graft.functions.BloomFunctions.contamination(col(textCol),
          typedlit(words.toSeq), n, mBits, k, seed).as("__sc"))
      .select(col(idCol), element_at(col("__sc"), 1).as("__sz"),
        element_at(col("__sc"), 2).as("n_maybe"))
      .withColumn("contamination",
        when(col("__sz") === 0, 0.0)
          .otherwise(col("n_maybe").cast("double") / col("__sz")))
      .withColumn("flagged", col("contamination") >= threshold)
      .select(col(idCol), col("n_maybe").cast("long").as("n_maybe"),
        col("contamination"), col("flagged"))
  }
}
