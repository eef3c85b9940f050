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
  * join is a plain key shuffle on the segment text; a degenerate
  * shared window (every row agreeing on one aligned substring) is the
  * skew to watch — AQE's skew-join split applies, and the verify
  * filter bounds the output. Strings ride the exploded rows (this
  * operator targets name-length values; for document-length text use
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

    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).cast("int").as("__len"))
      .where(col("__s").isNotNull)

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

    val pairs = idx.join(probe,
        idx("__seg") === probe("__sub") && idx("__i") === probe("__i") &&
          idx("len_a") === probe("__la") && idx("id_a") < probe("id_b"))
      .select(col("id_a"), col("s_a"), col("id_b"), col("s_b"))
      .distinct()

    pairs
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("dist") <= d)
      .select("id_a", "id_b", "dist")
  }
}
