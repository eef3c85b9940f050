package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.{dotFast, nearestCentroid}
import graft.functions.VectorFunctions.{l2Normalize, toDouble}

/** Element-wise mean of double vectors as a typed Aggregator: map-side
  * partial sums mean the Lloyd-update shuffle carries one (sum, count)
  * buffer per (cell, input partition) — nlist×dim doubles — instead of
  * exploding corpus×dim (component, value) rows through the exchange. */
private object VecMean {
  final case class Buf(var sum: Array[Double], var n: Long)

  final class VecMeanAgg extends Aggregator[Seq[Double], Buf, Seq[Double]] {
    override def zero: Buf = Buf(Array.empty, 0L)

    override def reduce(b: Buf, v: Seq[Double]): Buf = {
      if (b.n == 0L) { b.sum = v.toArray; b.n = 1L }
      else {
        var i = 0
        val n = math.min(b.sum.length, v.length)
        while (i < n) { b.sum(i) += v(i); i += 1 }
        b.n += 1L
      }
      b
    }

    override def merge(a: Buf, c: Buf): Buf = {
      if (a.n == 0L) c
      else if (c.n == 0L) a
      else {
        var i = 0
        val n = math.min(a.sum.length, c.sum.length)
        while (i < n) { a.sum(i) += c.sum(i); i += 1 }
        a.n += c.n
        a
      }
    }

    override def finish(b: Buf): Seq[Double] =
      if (b.n == 0L) Nil else b.sum.toSeq.map(_ / b.n)

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }
}

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
    // Alias the id to a fixed internal name so any idCol works downstream.
    // localCheckpoint: the init sample, every Lloyd round's assignment
    // action, and the final assignment all consume `vecs` — without the
    // checkpoint each action re-reads the source and re-normalizes, so
    // an iters-round build pays iters+2 full corpus scans instead of
    // one. The materialized frame is the narrow (id, unit vector)
    // projection.
    val vecs = corpus.repartition(n).select(col(idCol).as("vec_id"),
      l2Normalize(toDouble(col(vecCol))).as("__v"))
      .localCheckpoint(true)

    // Centroids are MODEL state (nlist×dim doubles — KBs): they live on
    // the driver between rounds and re-enter the plan as a broadcast
    // literal frame each iteration. Keeping them as lazy lineage would
    // re-run every previous round per action (and is how MLlib's
    // k-means works too). The DATA never leaves the cluster.
    import spark.implicits._
    def toFrame(cs: Seq[(Long, Seq[Double])]): DataFrame =
      cs.toDF("cell", "__c")

    var centroidSeq: Seq[(Long, Seq[Double])] = vecs
      .orderBy(xxhash64(col("vec_id")))
      .limit(nlist)
      .select(col("__v"))
      .collect()
      .map(_.getSeq[Double](0).toSeq)
      .zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toSeq

    val vecMean = udaf(new VecMean.VecMeanAgg())
    for (_ <- 0 until iters) {
      val assigned = assign(vecs, centroidSeq)
      // Lloyd update: per-cell vector mean via the typed VecMean
      // aggregator — partial (sum, count) buffers combine map-side, so
      // the exchange moves nlist buffers per partition, NOT corpus×dim
      // exploded component rows. Empty cells keep their previous
      // centroid.
      val updated = assigned
        .groupBy("cell").agg(vecMean(col("__v")).as("__c"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
        .toMap
      centroidSeq = centroidSeq.map { case (cell, prev) =>
        cell -> updated.getOrElse(cell, prev)
      }
    }
    val centroids = toFrame(centroidSeq)
    (assign(vecs, centroidSeq), centroids)
  }

  /** Map-only argmin: the nlist×dim centroid matrix rides along as a plan
    * literal inside a codegen'd [[graft.functions.NearestCentroid]] — no
    * crossJoin expansion and no Exchange, where the previous
    * crossJoin+row_number shuffled corpus×nlist rows per Lloyd round. */
  private[operators] def assign(vecs: DataFrame,
      centroidSeq: Seq[(Long, Seq[Double])]): DataFrame = {
    val ordered = centroidSeq.sortBy(_._1)
    require(ordered.map(_._1) == ordered.indices.map(_.toLong),
      "centroid cells must be dense 0..nlist-1")
    val dim = ordered.head._2.length
    val flat = ordered.iterator.flatMap(_._2).toArray
    vecs.select(col("vec_id"), col("__v"),
      nearestCentroid(col("__v"), flat, dim).as("cell"))
  }

  /** Persist a built index for build-once / search-many serving: the
    * assigned corpus and the centroid table land in two
    * [[graft.cdc.TableStore]]s under `root`. At 100 TB the expensive
    * part of IVF is the corpus assignment pass — rebuilding it per
    * search call (the self-contained query form) is the anti-pattern;
    * a served index is trained once, persisted, and every search reads
    * the immutable snapshot. Centroids are KBs; the assigned corpus is
    * the corpus plus one `cell` long per row. */
  def persist(spark: org.apache.spark.sql.SparkSession, root: String,
      assigned: DataFrame, centroids: DataFrame): Unit = {
    new graft.cdc.TableStore(spark, s"$root/assigned").write(assigned)
    new graft.cdc.TableStore(spark, s"$root/centroids").write(centroids)
  }

  /** Load a persisted index; plug the pair straight into [[search]].
    * None if either half has never been written. */
  def load(spark: org.apache.spark.sql.SparkSession, root: String)
      : Option[(DataFrame, DataFrame)] =
    for {
      a <- new graft.cdc.TableStore(spark, s"$root/assigned").read()
      c <- new graft.cdc.TableStore(spark, s"$root/centroids").read()
    } yield (a, c)

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
