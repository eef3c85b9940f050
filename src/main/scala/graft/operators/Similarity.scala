package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; O(|Q|·|N|) dots — the
  * right plan when the query set is small and broadcastable). Scale
  * path: random-hyperplane LSH bucketing (Charikar 2002) — candidates
  * only within matching buckets, probed across `tables` independent
  * hash tables; recall tunable via (tables, bits).
  */
object Similarity {

  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get(
      "spark.sql.shuffle.partitions", "32").toInt)

  /** Exact top-k neighbors for each query vector by cosine, brute
    * force. `queries` is expected to be small — it is broadcast, so the
    * corpus never shuffles: one map-side pass + per-query top-k heap
    * (TakeOrdered via window on a bounded set). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    bruteForceTopKScored(corpus, queries, k, vecCol, idCol)
      .select("query_id", "rank", "nbr_id")

  /** [[bruteForceTopK]] with the cosine attached — the optimality bound
    * the ANN gate keys compare against (ANN's rank-r cosine can never
    * exceed the exact rank-r cosine). */
  def bruteForceTopKScored(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = spread(corpus).select(col(idCol).as("nbr_id"),
      l2Normalize(toDouble(col(vecCol))).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"),
      l2Normalize(toDouble(col(vecCol))).as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", graft.functions.VectorExpressions.dotFast(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cos")
  }

  /** ANN top-k: candidates = corpus rows sharing an LSH bucket with the
    * query in any of `tables` tables; exact cosine + top-k only within
    * candidates. Bucket keys come from the [[graft.functions.LshBuckets]]
    * custom expression (all tables' sign-random-projections in one
    * primitive pass per row). Probabilistic recall (checked ≥ threshold
    * in tests against [[bruteForceTopK]]). */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      dim: Int = 64, tables: Int = 8, bits: Int = 8,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import graft.functions.VectorExpressions.lshBuckets
    val c = spread(corpus).select(col(idCol).as("nbr_id"),
      l2Normalize(toDouble(col(vecCol))).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"),
      l2Normalize(toDouble(col(vecCol))).as("__qv"))

    def bucketed(df: DataFrame, vec: String, id: String) =
      df.select(col(id), col(vec),
        posexplode(lshBuckets(col(vec), tables, bits, dim))
          .as(Seq("__tbl", "__bkt")))

    val cb = bucketed(c, "__cv", "nbr_id")
    val qb = bucketed(q, "__qv", "query_id")
    val cand = cb.join(qb, Seq("__tbl", "__bkt"))
      .where(col("query_id") =!= col("nbr_id"))
      .select("query_id", "__qv", "nbr_id", "__cv").distinct()

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    cand.withColumn("cos", graft.functions.VectorExpressions.dotFast(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cos")
  }
}
