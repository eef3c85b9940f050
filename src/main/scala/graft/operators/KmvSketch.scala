package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-minimum-values sketches for corpus OVERLAP estimation — "how much
  * does crawl X overlap crawl Y" (by shared shingles, urls, doc
  * hashes…) answered from two KB-sized sketches instead of a
  * corpus×corpus distinct-intersection join. Beyer et al. (PODS'07)
  * KMV synopses: the k smallest hash values of a set are a uniform
  * sample of its hash space, so for two sets the fraction of the
  * union-sketch's k smallest values that lie in BOTH input sketches
  * estimates Jaccard with ~1/√k error. HLL ([[DistinctSketch]]) can
  * union but cannot INTERSECT; KMV is the mergeable sketch that can.
  *
  * Determinism is the design driver (same reason [[Sampling]] uses
  * md5): the hash is the first 13 hex chars of md5 — 52 bits, so it
  * rides a double score EXACTLY (< 2^53) through [[TopKPerKey]] and
  * is restatable verbatim in the DuckDB oracle
  * (`CAST('0x' || substr(md5(x), 1, 13) AS BIGINT)`); the estimate is
  * therefore hash-compared as an exact VALUE, not gated by a
  * tolerance boolean.
  *
  * Scale shape: one corpus-sized `(group, hash)` distinct (narrow —
  * two columns, map-side partial dedup), then [[TopKPerKey]]'s
  * bounded buffer keeps k per group (shuffle carries ≤ k rows per
  * group per partition). Everything pairwise happens on sketch tables
  * (≤ k rows per group) — estimation cost is independent of corpus
  * size, and persisted sketches compare against every future corpus
  * without rescanning this one.
  */
object KmvSketch {

  /** 52-bit md5-prefix hash (double-exact, oracle-restatable). */
  def hash52(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 13), 16, 10).cast("long")

  /** Per-group KMV sketch: the `k` smallest DISTINCT element hashes,
    * as `(group, h)` rows. */
  def sketch(df: DataFrame, groupCol: String, elem: Column, k: Int)
      : DataFrame = {
    require(k > 0, "k must be positive")
    val hashed = df
      .select(col(groupCol).as("group"), hash52(elem).as("__h"))
      .distinct()
    TopKPerKey(hashed.withColumn("__s", -col("__h").cast("double")),
        keyCol = "group", scoreCol = "__s", payloadCol = "__h", k = k)
      .select(col("key").as("group"), col("payload").as("h"))
  }

  /** Jaccard estimates for the given group pairs from a sketch table:
    * `(src_a, src_b, jaccard_kmv)`. For each pair, the k smallest
    * values of the two sketches' union form the combined synopsis U;
    * the estimate is |{v ∈ U : v in both sketches}| / |U| (|U| =
    * min(k, union size) — the standard small-set correction). Runs
    * entirely on sketch rows: ≤ 2k per pair. */
  def pairJaccard(sketches: DataFrame, pairs: Seq[(String, String)],
      k: Int): DataFrame = {
    require(pairs.nonEmpty, "need at least one group pair")
    val spark = sketches.sparkSession
    import spark.implicits._
    val p = pairs.toDF("src_a", "src_b")
    val flagged = p.join(sketches,
        col("group") === col("src_a") || col("group") === col("src_b"))
      .groupBy("src_a", "src_b", "h")
      .agg(max(when(col("group") === col("src_a"), 1).otherwise(0)).as("__ia"),
        max(when(col("group") === col("src_b"), 1).otherwise(0)).as("__ib"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src_a", "src_b").orderBy("h")
    flagged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k) // per-pair partitions hold ≤ 2k rows
      .groupBy("src_a", "src_b")
      .agg((sum(col("__ia") * col("__ib")).cast("double") / count(lit(1)))
        .as("jaccard_kmv"))
  }

  /** EXACT Jaccard over the full distinct hash sets — the truth leg of
    * the `q_sketch_overlap` gate. Deliberately NOT part of the raw
    * operator: it is the corpus-sized intersection the sketch exists
    * to avoid (same raw/gate split as the near-dup recall gates). */
  private[graft] def pairJaccardExact(df: DataFrame, groupCol: String,
      elem: Column, pairs: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = df.select(col(groupCol).as("group"), hash52(elem).as("h"))
      .distinct()
    val p = pairs.toDF("src_a", "src_b")
    p.join(d, col("group") === col("src_a") || col("group") === col("src_b"))
      .groupBy("src_a", "src_b", "h")
      .agg(max(when(col("group") === col("src_a"), 1).otherwise(0)).as("__ia"),
        max(when(col("group") === col("src_b"), 1).otherwise(0)).as("__ib"))
      .groupBy("src_a", "src_b")
      .agg((sum(col("__ia") * col("__ib")).cast("double") / count(lit(1)))
        .as("jaccard_exact"))
  }
}
