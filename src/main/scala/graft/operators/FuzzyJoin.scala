package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join — entity resolution over name/title-length
  * strings (near-identical customer names, product titles, source
  * aliases) with EXACT recall: partition-based segment-signature
  * blocking in the PassJoin family (Li, Deng, Feng: "PassJoin: a
  * partition-based method for similarity joins", PVLDB 5(3), 2011 —
  * public algorithm) verified by the codegen'd `levenshtein`.
  *
  * Pigeonhole: split every string into `maxDist + 1` contiguous
  * segments. At most `maxDist` edits separate a matching pair, so at
  * least one segment survives UNTOUCHED and appears verbatim in the
  * other string, shifted by at most `maxDist`. Candidates are
  * therefore an EQUI-join of index-side segments against probe-side
  * substrings on `(text, segment idx, partitioned length)` — recall 1
  * by construction (the oracle's all-pairs restatement would catch a
  * miss), never an all-pairs comparison.
  *
  * Scale shape: the index side emits `maxDist + 1` rows per string;
  * the probe side at most `(2·maxDist + 1)` candidate lengths ×
  * `(maxDist + 1)` segments × `(2·maxDist + 1)` shifts — constants
  * (18 rows/string at maxDist=1), not data-dependent. The candidate
  * join is a plain key shuffle on the segment text. CANDIDATE volume,
  * however, IS data-dependent: Σ over buckets of |idx|·|probe|. A
  * population sharing a constant ALIGNED window — e.g. the fixture's
  * `Customer#` name prefix, which is exactly one whole segment at
  * maxDist=1 — degenerates that bucket toward all-pairs, and the
  * bucket is load-bearing (for a pair whose edit falls in the other
  * segment, the constant segment is the untouched one), so it cannot
  * be dropped without losing recall. Mitigations, in order: strip
  * known-constant prefixes/templates before joining (standard ER
  * normalization — the blocking then discriminates on the informative
  * remainder); the thresholded banded `levenshtein` verify below
  * (O(maxDist·L) per candidate instead of O(L²)); AQE skew-split on
  * the bucket join. Strings ride the exploded rows (this operator
  * targets name-length values; for document-length text use
  * [[Dedup]]'s shingle machinery instead). One distinct + one
  * codegen'd verify; no sort, no window.
  */
object FuzzyJoin {

  /** Unordered pairs `(id_a, id_b, dist)` with `id_a < id_b` and
    * `dist = levenshtein(strA, strB) <= maxDist`. Identical strings
    * pair at dist 0. Null/empty strings: null never pairs (length is
    * null); empty strings pair with strings of length <= maxDist. */
  def selfPairs(df: DataFrame, strCol: String, idCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val d = maxDist
    val n = d + 1

    // Even partition of a length-L string into n segments; the LAST
    // (L mod n) segments take the extra character. All arithmetic is
    // Column-level — L and i are data.
    def nLong(L: Column): Column = pmod(L, lit(n)).cast("int")
    def segLen(L: Column, i: Column): Column =
      (floor(L / n).cast("int") +
        when(i >= lit(n) - nLong(L), 1).otherwise(0)).cast("int")
    def segStart(L: Column, i: Column): Column =
      (floor(L / n).cast("int") * i +
        greatest(lit(0), i - (lit(n) - nLong(L)))).cast("int")

    // Repartition the narrow (id, string) base ONCE, with an EXPLICIT
    // partition count: the exploded index/probe sides inherit the
    // input's partitioning, and a filtered scan can collapse to a
    // handful of splits — which would serialize the candidate join's
    // output (and every levenshtein) into those few tasks. The
    // explicit count matters: a bare `repartition(col)` participates
    // in AQE partition coalescing, which sizes partitions by INPUT
    // bytes — a KB-sized name table collapses straight back to one
    // partition even though its join fan-out is millions of rows.
    // Measured on q_join_fuzzy (degenerate-prefix fixture, 4M
    // candidates from 2000 names in ~1 scan split): 6.8s single-task
    // → 1.2s with the explicit count; a bare repartition(col) changed
    // NOTHING because AQE coalesced it straight back
    // (see SCALE.md "Fuzzy join" note).
    val shufflePartitions =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).cast("int").as("__len"))
      .where(col("__s").isNotNull)
      .repartition(shufflePartitions, col("__id"))

    // Index side: the n segments of each string at its own length.
    val idx = base
      .select(col("__id").as("id_a"), col("__s").as("s_a"),
        col("__len").as("len_a"),
        explode(array((0 until n).map(lit): _*)).as("__i"))
      .select(col("id_a"), col("s_a"), col("len_a"), col("__i"),
        col("s_a").substr(segStart(col("len_a"), col("__i")) + 1,
          segLen(col("len_a"), col("__i"))).as("__seg"))

    // Probe side: for every candidate partitioned length La within
    // ±maxDist of the probe's own length, the substrings that could
    // equal segment i of an La-partition, shifted by at most maxDist
    // and clamped to the probe's bounds.
    val probe = base
      .select(col("__id").as("id_b"), col("__s").as("s_b"),
        col("__len").as("len_b"),
        explode(sequence(greatest(col("__len") - d, lit(0)),
          col("__len") + lit(d))).as("__la"))
      .select(col("id_b"), col("s_b"), col("len_b"), col("__la").cast("int").as("__la"),
        explode(array((0 until n).map(lit): _*)).as("__i"))
      .select(col("id_b"), col("s_b"), col("len_b"), col("__la"), col("__i"),
        explode(array((-d to d).map(lit): _*)).as("__shift"))
      .select(col("id_b"), col("s_b"), col("len_b"), col("__la"), col("__i"),
        (segStart(col("__la"), col("__i")) + col("__shift")).as("__p0"),
        segLen(col("__la"), col("__i")).as("__sl"))
      .where(col("__p0") >= 0 && col("__p0") + col("__sl") <= col("len_b"))
      .select(col("id_b"), col("s_b"), col("__la"), col("__i"),
        col("s_b").substr(col("__p0") + 1, col("__sl")).as("__sub"))
      .distinct() // shifts can generate the same substring twice

    val cand = idx.join(probe,
        idx("__seg") === probe("__sub") && idx("__i") === probe("__i") &&
          idx("len_a") === probe("__la") && idx("id_a") < probe("id_b"))
      .select(col("id_a"), col("s_a"), col("id_b"), col("s_b"))

    // VERIFY, then distinct: a candidate pair can surface through a
    // few (segment, shift) routes (small constant), so verifying the
    // duplicates costs a few extra banded comparisons — while
    // distinct-ing candidates BEFORE the verify shuffles the full
    // candidate volume (quadratic on a degenerate population) with
    // both strings aboard; survivors are output-sized and their
    // distinct is cheap. On local[32] the orders measure CLOSE
    // (matched interleaved min-of-3 on the degenerate fixture:
    // distinct-first 0.67s vs verify-first 0.94s — memory-speed
    // shuffle makes the 4M-row distinct cheap); verify-first is kept
    // because on a real cluster the shuffle is a network, and
    // shuffling 28k survivors beats shuffling 4M candidate rows. The
    // thresholded levenshtein is the banded O(maxDist·L) early-exit
    // form (-1 above the bound; measured 0.94 vs 1.10s unthresholded
    // on the same fixture). SCALE.md "Fuzzy join" has the full
    // attribution (11.1s → 1.2s across the three changes).
    cand
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), d).cast("long"))
      .where(col("dist") >= 0)
      .select("id_a", "id_b", "dist")
      .distinct()
  }
}
