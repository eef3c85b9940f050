package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.{dotFast, pqAdc}
import graft.functions.VectorFunctions.{l2Normalize, toDouble}

/** IVF-PQ — the composite billion-scale ANN index (Jégou et al. 2011
  * §V, the faiss `IVFx,PQy` default): an [[Ivf]] coarse quantizer
  * partitions the corpus into `nlist` cells, and each vector's
  * RESIDUAL from its cell centroid is [[Pq]]-encoded with codebooks
  * shared across cells. Both scale levers compose: a query scans only
  * `nprobe/nlist` of the corpus (IVF's lever) and the scanned rows
  * are `m` small codes, not D floats (PQ's lever) — at a billion
  * vectors that is the difference between a cluster-wide float scan
  * and a few GB of code reads.
  *
  * Score decomposition (why residuals must NOT be re-normalized —
  * [[Pq.train]]'s `normalize = false`): for unit query `q`, corpus
  * vector `x = c_cell + r`, so `q·x = q·c_cell + q·r`; the first term
  * is exact per (query, probed cell), the second is the standard ADC
  * table lookup over the residual codes. Encoding residuals instead
  * of raw vectors is what makes `k` per-subspace entries enough: the
  * residual distribution is centered and tighter than the corpus.
  *
  * Scale shape: build = [[Ivf.build]]'s distributed Lloyd's + ONE
  * broadcast-centroid residual projection + [[Pq]]'s sample-trained
  * codebooks + ONE map-only encode pass (cell rides the row — no
  * re-join). Search = nprobe cell routing on the broadcast KB-sized
  * centroid table, a broadcast hash join of the (|Q|·nprobe)-row
  * probe set against the codes ON THE CELL KEY (only probed cells'
  * codes are touched after partition pruning on a cell-partitioned
  * store), codegen'd ADC adds, [[TopKPerKey]]'s bounded buffer, and
  * an exact re-rank of |Q|·rerank candidates. Nothing corpus-sized
  * shuffles at serve time.
  *
  * Reference anchor: none (no vector surface in the reference);
  * beyond-reference LLM extension set, SURVEY §2 ext — gates
  * `q_sim_ann_ivfpq` (per-row optimality) and
  * `q_sim_ann_ivfpq_recall` (≥0.8 vs brute force).
  */
object IvfPq {

  /** Driver-side model state: the coarse centroid frame (`cell, __c` —
    * KBs, broadcast at serve time) + the shared residual codebooks. */
  final case class Model(centroids: DataFrame, pq: Pq.Model)

  /** Build: coarse-quantize, project residuals, train shared residual
    * codebooks on a bounded deterministic sample, encode in one
    * map-only pass. Returns `(codes (vec_id, cell, __codes), model)`. */
  def build(corpus: DataFrame, nlist: Int = 16, ivfIters: Int = 3,
      m: Int = 8, k: Int = 16, pqIters: Int = 8,
      maxTrainRows: Int = 1 << 16,
      vecCol: String = "embedding", idCol: String = "vec_id")
      : (DataFrame, Model) = {
    val (assigned, centroids) = Ivf.build(corpus, nlist, ivfIters,
      vecCol, idCol)
    // residuals: one broadcast join + codegen'd subtract; checkpointed
    // because BOTH the bounded training sample and the encode pass
    // read it (without the pin the corpus is re-assigned twice)
    val withRes = assigned.join(broadcast(centroids), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("__v"), col("__c"), (a, b) => a - b).as("__r"))
      .localCheckpoint(true)
    val pqm = Pq.train(withRes, m, k, pqIters, maxTrainRows,
      vecCol = "__r", idCol = "vec_id", normalize = false)
    val codes = withRes.select(col("vec_id"), col("cell"),
      Pq.codesOf(pqm, col("__r")).as("__codes"))
    (codes, Model(centroids, pqm))
  }

  /** Encode a batch with a FROZEN model — the streaming-ingest kernel
    * ([[graft.streaming.AnnMicroBatch]]'s IVF-PQ path): map-only cell
    * routing (the codegen'd nearest-centroid literal — no shuffle, no
    * crossJoin), broadcast-centroid residual subtract, shared-codebook
    * encode. Pure in (batch, model): a replayed batch re-encodes to
    * content-identical `(vec_id, cell, __codes)` rows, and encoding
    * the full corpus with [[build]]'s own model reproduces [[build]]'s
    * codes exactly (spec-pinned). Same frozen-model contract as
    * [[Pq.encode]]: codebooks/centroids are distribution statistics —
    * encode online, retrain offline into a new root. */
  def encode(batch: DataFrame, model: Model,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val vecs = batch.select(col(idCol).as("vec_id"),
      l2Normalize(toDouble(col(vecCol))).as("__v"))
    val centroidSeq = model.centroids.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    Ivf.assign(vecs, centroidSeq)
      .join(broadcast(model.centroids), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        Pq.codesOf(model.pq,
          zip_with(col("__v"), col("__c"), (a, b) => a - b)).as("__codes"))
  }

  /** Search: route each query to its `nprobe` best cells (carrying the
    * exact `q·c_cell` term), ADC-score only those cells' codes, keep
    * the `rerank` best per query, exact re-rank. Returns
    * `(query_id, rank, nbr_id, cos)` — [[Ivf.search]]'s shape. */
  def search(codes: DataFrame, model: Model, corpus: DataFrame,
      queries: DataFrame, k: Int = 5, nprobe: Int = 4, rerank: Int = 50,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(k > 0 && rerank >= k && nprobe > 0,
      "need k>0, rerank>=k, nprobe>0")
    val spark = codes.sparkSession
    import spark.implicits._
    val qdf = queries
      .select(col(idCol).as("query_id"),
        l2Normalize(toDouble(col(vecCol))).as("__qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .toIndexedSeq
      .map { case (qid, qv) =>
        (qid, qv.toSeq, Pq.adcTable(model.pq, qv).toSeq)
      }
      .toDF("query_id", "__qv", "__tab")

    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__qc").desc, col("cell"))
    val probed = qdf.crossJoin(broadcast(model.centroids))
      .withColumn("__qc", dotFast(col("__qv"), col("__c")))
      .withColumn("__rn", row_number().over(wq))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("__tab"), col("cell"), col("__qc"))

    val cand = TopKPerKey(
      codes.join(broadcast(probed), Seq("cell"))
        .where(col("query_id") =!= col("vec_id"))
        .withColumn("__score",
          col("__qc") + pqAdc(col("__codes"), col("__tab"), model.pq.k)),
      keyCol = "query_id", scoreCol = "__score", payloadCol = "vec_id",
      k = rerank)
      .select(col("key").as("query_id"), col("payload").as("nbr_id"))

    val exact = corpus.select(col(idCol).as("nbr_id"),
      l2Normalize(toDouble(col(vecCol))).as("__cv"))
    val qvecs = queries.select(col(idCol).as("query_id"),
      l2Normalize(toDouble(col(vecCol))).as("__qv"))
    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    cand
      .join(broadcast(qvecs), Seq("query_id"))
      .join(exact, Seq("nbr_id"))
      .withColumn("cos", dotFast(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wk).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cos")
  }

  /** Persist for build-once / serve-many ([[Ivf.persist]] lifecycle):
    * codes + centroids + the PQ model row-per-subspace. */
  def persist(spark: SparkSession, root: String, codes: DataFrame,
      model: Model): Unit = {
    import spark.implicits._
    new graft.cdc.TableStore(spark, s"$root/codes").write(codes)
    new graft.cdc.TableStore(spark, s"$root/centroids")
      .write(model.centroids)
    val mdf = model.pq.codebooks.zipWithIndex.toIndexedSeq
      .map { case (cb, j) => (j, model.pq.dsub, model.pq.k, cb.toSeq) }
      .toDF("j", "dsub", "k", "cb")
    new graft.cdc.TableStore(spark, s"$root/model").write(mdf)
  }

  /** Load a persisted index; None if any part was never written. */
  def load(spark: SparkSession, root: String)
      : Option[(DataFrame, Model)] =
    for {
      codes <- new graft.cdc.TableStore(spark, s"$root/codes").read()
      cents <- new graft.cdc.TableStore(spark, s"$root/centroids").read()
      mdf <- new graft.cdc.TableStore(spark, s"$root/model").read()
    } yield {
      val rows = mdf.orderBy("j").collect()
      val dsub = rows.head.getAs[Int]("dsub")
      val kk = rows.head.getAs[Int]("k")
      val cbs = rows.map(_.getSeq[Double](3).toArray)
      (codes, Model(cents, Pq.Model(rows.length, dsub, kk, cbs)))
    }
}
