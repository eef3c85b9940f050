package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Distributed k-means over an embedding column — Lloyd's algorithm
  * (Lloyd 1982) in the shape Spark MLlib's own KMeans uses: per
  * iteration, ONE map-side assignment pass (argmin over the K
  * broadcast centroids — K×dim doubles, a CONFIG bound riding the
  * plan as literals) and ONE partial-aggregated centroid update
  * (posexplode → groupBy (cluster, pos) avg — map-side combine
  * collapses every partition to ≤ K·dim rows before the shuffle).
  * Only the K centroids ever leave the executors; the corpus is never
  * collected, sorted globally, or crossJoined against itself. This is
  * the curation clustering stage (SemDeDup §3 / DataComp cluster
  * balancing) run over the FULL corpus rather than [[Ivf]]'s bounded
  * sample — the two share nothing but the idea: Ivf trains on a
  * driver sample to build an ANN index; this assigns EVERY row a
  * cluster id as a data product.
  *
  * Determinism & oracle: every source of engine divergence is pinned —
  * init is the k smallest (md5-draw, id) rows (no RNG), assignment
  * ties break on the lowest cluster id (struct-ordered `array_min` =
  * `ORDER BY d2, cid`), squared-L2 folds in index order with a 0.0
  * seed (IEEE-identical to DuckDB's `list_reduce` left fold — 0.0+x
  * is exact), and per-iteration centroid means are `round(avg, 6)`
  * (absorbing float sum-order nondeterminism, the `q_embed_centroids`
  * / pagerank convention) so BOTH engines fold iteration t+1 from the
  * SAME rounded doubles. The `q_cluster_kmeans` oracle restates init +
  * every unrolled iteration + the final assignment in one DuckDB
  * query; the planted-cluster recovery property lives in KmeansSpec.
  *
  * 100 TB shape: iters·(1 map pass + 1 bounded-key shuffle); centroid
  * state is K·dim doubles on the driver between iterations (like
  * [[Graph.pagerank]]'s dangling-mass scalar, bounded by config, not
  * data). The input is localCheckpointed ONCE — iteration t+1's plan
  * does not replay t's scan, keeping the plan O(1)-deep.
  */
object Kmeans {

  /** Nearest-centroid `(cluster, d2)` of vector `v` (double array)
    * against the flattened centroid-matrix literal: codegen'd
    * [[graft.functions.Kernels.nearestCentroidL2]] kernels — the
    * accumulation is strictly ascending with a 0.0 seed and the
    * strict-`<` first-minimum wins ties, so the result is
    * bit-identical to the `aggregate(zip_with(...))` left fold the
    * oracle's `list_reduce` restates, with the lowest-cid tie-break
    * (`ORDER BY d2, cid`). The HOF form of the same arithmetic is
    * interpreted (no codegen for lambda exprs) and measured ~10×
    * slower on the bench. */
  def assignExpr(cents: Seq[(Int, Seq[Double])], v: Column): (Column, Column) = {
    val dim = cents.head._2.length
    require(cents.forall(_._2.length == dim),
      "assignExpr: centroids must share one dimension")
    val flat = cents.flatMap(_._2).toArray
    val posn = VectorFunctions.nearestCentroidL2Pos(v, flat, dim)
    (element_at(typedlit(cents.map(_._1)), posn.cast("int") + 1),
      VectorFunctions.nearestCentroidL2Dist(v, flat, dim))
  }

  /** Train centroids only: init at the k rows with the smallest
    * (md5(id ":seed"), id), run `iters` Lloyd updates; clusters that
    * empty out drop from the centroid set (both engines restate the
    * same frames, so the drop is deterministic too). The returned
    * K×dim doubles are the MODEL — the frozen-centroid analog of
    * [[Pq]]'s codebooks. */
  def fitCentroids(embs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 8, iters: Int = 3,
      seed: String = "km"): Seq[(Int, Seq[Double])] = {
    require(k >= 1, s"k must be positive: $k")
    require(iters >= 0, s"iters must be non-negative: $iters")
    val vecs = embs
      .select(col(idCol), VectorFunctions.toDouble(col(vecCol)).as("__v"))
      .localCheckpoint(true) // scanned iters+1 times; O(1)-deep plans
    val init = vecs
      .orderBy(Sampling.hashDraw(col(idCol), seed), col(idCol))
      .limit(k)
      .select("__v").collect() // K×dim doubles — config-bounded
    var cents: Seq[(Int, Seq[Double])] =
      init.zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0)) }
    for (_ <- 1 to iters) {
      cents = vecs
        .select(assignExpr(cents, col("__v"))._1.as("__c"),
          posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy("__c", "__pos").agg(round(avg("__x"), 6).as("__cv"))
        .groupBy("__c")
        .agg(transform(
          array_sort(collect_list(struct(col("__pos"), col("__cv")))),
          x => x.getField("__cv")).as("__cvec"))
        .collect() // ≤ K centroid rows
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq
    }
    cents
  }

  /** Frozen-centroid assignment — the SERVE path: one map-only pass,
    * no shuffle, centroids ride as literals. New data scores against
    * a trained model without retraining (the build-once/serve-many
    * contract the ANN family keeps). */
  def assign(embs: DataFrame, cents: Seq[(Int, Seq[Double])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(cents.nonEmpty, "assign: empty centroid set")
    val v = VectorFunctions.toDouble(col(vecCol))
    val (cluster, d2) = assignExpr(cents, v)
    embs.select(col(idCol), cluster.as("cluster"),
      round(d2, 6).as("dist2"))
  }

  /** Cluster every row of `embs`: `(idCol, cluster, dist2)` with
    * `dist2` the squared L2 to the final centroid, round-6 —
    * [[fitCentroids]] + [[assign]] in one call. */
  def fit(embs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 8, iters: Int = 3,
      seed: String = "km"): DataFrame =
    assign(embs, fitCentroids(embs, idCol, vecCol, k, iters, seed),
      idCol, vecCol)

  /** Persist a trained model under `root` (one (cid, cvec) row per
    * centroid — KBs) through [[graft.cdc.TableStore]]'s versioned
    * snapshot protocol, like [[Ivf.persist]]. */
  def persist(spark: org.apache.spark.sql.SparkSession, root: String,
      cents: Seq[(Int, Seq[Double])]): Unit = {
    import spark.implicits._
    new graft.cdc.TableStore(spark, root)
      .write(cents.toDF("cid", "cvec"))
  }

  /** Load a persisted model; plug straight into [[assign]]. None if
    * never written. */
  def load(spark: org.apache.spark.sql.SparkSession, root: String)
      : Option[Seq[(Int, Seq[Double])]] =
    new graft.cdc.TableStore(spark, root).read().map(
      _.select("cid", "cvec").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq)

  /** The `q_cluster_kmeans` DuckDB restatement: init + `iters`
    * unrolled assignment/update CTE pairs + the final assignment —
    * generated, not hand-unrolled, so oracle and engine always agree
    * on (k, iters, seed). */
  def oracleSql(k: Int = 8, iters: Int = 3, seed: String = "km"): String = {
    val iterCtes = (1 to iters).map { t =>
      s"""a$t AS (
         |  SELECT vec_id, v, cid, d2,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |  FROM (SELECT e.vec_id, e.v, c.cid,
         |          list_reduce(list_transform(range(1, len(v) + 1),
         |            j -> (v[j] - c.c[j]) * (v[j] - c.c[j])),
         |            (x, y) -> x + y) AS d2
         |        FROM e CROSS JOIN c${t - 1} c)),
         |c$t AS (
         |  SELECT cid, list(cv ORDER BY pos) AS c
         |  FROM (SELECT cid, pos, round(avg(x), 6) AS cv
         |        FROM (SELECT cid, unnest(v) AS x,
         |                generate_subscripts(v, 1) AS pos
         |              FROM a$t WHERE rn = 1)
         |        GROUP BY cid, pos)
         |  GROUP BY cid)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (
       |  SELECT cid, v AS c FROM (
       |    SELECT row_number() OVER (
       |        ORDER BY substr(md5(CAST(vec_id AS VARCHAR) || ':$seed'), 1, 8),
       |          vec_id) - 1 AS cid, v
       |    FROM e)
       |  WHERE cid < $k),
       |$iterCtes,
       |fin AS (
       |  SELECT vec_id, cid, d2,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |  FROM (SELECT e.vec_id, c.cid,
       |          list_reduce(list_transform(range(1, len(v) + 1),
       |            j -> (v[j] - c.c[j]) * (v[j] - c.c[j])),
       |            (x, y) -> x + y) AS d2
       |        FROM e CROSS JOIN c$iters c))
       |SELECT vec_id, CAST(cid AS INT) AS cluster, round(d2, 6) AS dist2
       |FROM fin WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }
}
