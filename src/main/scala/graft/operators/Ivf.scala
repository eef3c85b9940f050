package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.dotFast
import graft.functions.VectorFunctions.{l2Normalize, toDouble}

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to LSH bucketing: a coarse k-means quantizer partitions
  * the corpus into `nlist` cells; queries probe only the `nprobe`
  * nearest cells, paying exact dot products on a 1/nlist-ish fraction
  * of the corpus.
  *
  * Training is `iters` rounds of distributed Lloyd's: assignment is a
  * broadcast-centroid argmin (map-only over the corpus), update is a
  * posexplode + per-(cell, component) average — both shuffle-light and
  * independent of corpus size per round. Initialization is
  * deterministic (hash-ordered sample), so builds are reproducible.
  */
object Ivf {

  /** Train centroids and assign every corpus row to its nearest cell.
    * Returns (assigned corpus [vec_id, __v, cell], centroids [cell, __c]). */
  def build(corpus: DataFrame, nlist: Int = 16, iters: Int = 3,
      vecCol: String = "embedding", idCol: String = "vec_id")
      : (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val vecs = corpus.repartition(n).select(col(idCol),
      l2Normalize(toDouble(col(vecCol))).as("__v"))

    // deterministic spread init: hash-order, take nlist
    var centroids = vecs
      .orderBy(xxhash64(col(idCol)))
      .limit(nlist)
      .select(col("__v").as("__c"))
      .withColumn("cell", row_number().over(
        Window.orderBy(xxhash64(col("__c")))).cast("long") - 1)

    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      assigned = assign(vecs, centroids)
      // Lloyd update: per-(cell, component) mean, re-assembled into an
      // ordered array; empty cells keep their previous centroid.
      val updated = assigned
        .select(col("cell"), posexplode(col("__v")).as(Seq("__i", "__x")))
        .groupBy("cell", "__i").agg(avg("__x").as("__m"))
        .groupBy("cell").agg(array_sort(collect_list(struct(col("__i"),
          col("__m")))).as("__ms"))
        .select(col("cell"), transform(col("__ms"), s => s("__m")).as("__c"))
      centroids = centroids.select("cell").join(updated, Seq("cell"), "left")
        .join(centroids.select(col("cell"), col("__c").as("__prev")), Seq("cell"))
        .select(col("cell"), coalesce(col("__c"), col("__prev")).as("__c"))
    }
    (assign(vecs, centroids), centroids)
  }

  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("__d").desc, col("cell"))
    vecs.crossJoin(broadcast(centroids))
      .withColumn("__d", dotFast(col("__v"), col("__c"))) // cosine on unit vecs
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("vec_id"), col("__v"), col("cell"))
  }

  /** Probe: route each query to its `nprobe` nearest cells, exact top-k
    * within the probed cells only. */
  def search(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int = 5, nprobe: Int = 4,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      l2Normalize(toDouble(col(vecCol))).as("__qv"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__d").desc, col("cell"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("__d", dotFast(col("__qv"), col("__c")))
      .withColumn("__rn", row_number().over(wq))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cell"))

    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    probed.join(assigned.withColumnRenamed("vec_id", "nbr_id"), Seq("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", dotFast(col("__qv"), col("__v")))
      .withColumn("rank", row_number().over(wk).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cos")
  }
}
