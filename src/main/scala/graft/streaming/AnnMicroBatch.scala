package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.cdc.AppendStore
import graft.operators.{IvfPq, Pq}

/** Streaming ANN index ingest — the serving-freshness story for
  * [[graft.operators.Pq]]: embeddings arrive in micro-batches, each
  * batch is encoded with the FROZEN codebooks (one map-only argmin
  * pass over the batch) and lands as its own [[AppendStore]] code
  * segment, so the searchable index grows by exactly the batch's
  * delta — the corpus is never re-encoded and the store is never
  * rewritten (the same O(batch) IO contract as [[DedupMicroBatch]]'s
  * signature index, with the same compaction cadence bounding segment
  * count on a long-running drain).
  *
  * Codebooks are deliberately frozen model state: PQ codebooks are
  * statistics of the embedding DISTRIBUTION, not of individual rows
  * (trained on a bounded sample — [[Pq.train]]), so the standard
  * production shape is encode-online / retrain-offline; a retrain is a
  * new index root, swapped atomically by the serving layer, never an
  * in-place mutation of segments queries may be reading.
  *
  * Exactly-once: the file-source checkpoint tracks consumed batches,
  * and a replayed batch re-encodes to content-identical codes (the
  * encode is a pure function of (batch, codebooks)), idempotently
  * replacing its own segment — [[StreamSpec]] replays a batch and
  * asserts the store is unchanged.
  */
object AnnMicroBatch {

  /** One micro-batch transition: encode `batch` with `model`, land
    * segment `batchId`. Pure in (batch, model, batchId) — replays
    * rewrite identical content. Returns the encoded frame. */
  def processBatch(batch: DataFrame, batchId: Long,
      codesStore: AppendStore, model: Pq.Model,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val codes = Pq.encode(batch, model, vecCol, idCol)
    codesStore.write(codes, batchId)
    codes
  }

  /** Drain all available input once (blocking), compacting below the
    * replay frontier every `compactEvery` batches. */
  def runAvailableNow(spark: SparkSession, sourceDir: String,
      schema: StructType, codesStore: AppendStore, model: Pq.Model,
      checkpoint: String, vecCol: String = "embedding",
      idCol: String = "vec_id", compactEvery: Int = 16): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, codesStore, model, vecCol, idCol)
        AppendStore.maybeCompact(compactEvery, batchId, codesStore)
      }
      .start()
    q.awaitTermination()
  }

  /** Search the drained index: ADC + exact re-rank over every code
    * segment admitted so far ([[Pq.search]] semantics; `corpus`
    * supplies the exact vectors for the re-rank — typically the same
    * landing directory the drain consumes). Empty store → None. */
  def search(codesStore: AppendStore, model: Pq.Model, corpus: DataFrame,
      queries: DataFrame, k: Int = 5, rerank: Int = 50,
      vecCol: String = "embedding", idCol: String = "vec_id")
      : Option[DataFrame] =
    codesStore.read().map { codes =>
      Pq.search(codes, model, corpus, queries, k, rerank, vecCol, idCol)
    }

  // ---- IVF-PQ ingest: the composite index's O(batch) freshness path ----
  // Same contract as the PQ trio above, with cell routing per batch
  // ([[IvfPq.encode]] — frozen centroids AND frozen codebooks), so the
  // index with BOTH 100 TB levers (cell-bounded scans + code-bounded
  // bytes) also grows by exactly the batch's delta. Create the codes
  // store with `sortCols = ivfPqStoreSortCols` so each landed segment
  // is cell-clustered — parquet row-group min/max on `cell` then prunes
  // unprobed cells at serve time, segment by segment.

  /** Recommended AppendStore sort columns for an IVF-PQ codes store:
    * cell-clustered segments give the serve path row-group pruning on
    * the probed cells. */
  val ivfPqStoreSortCols: Seq[String] = Seq("cell")

  /** One micro-batch transition: route + encode `batch` with the
    * frozen composite `model`, land segment `batchId`. Pure in
    * (batch, model, batchId) — replays rewrite identical content. */
  def processBatchIvfPq(batch: DataFrame, batchId: Long,
      codesStore: AppendStore, model: IvfPq.Model,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val codes = IvfPq.encode(batch, model, vecCol, idCol)
    codesStore.write(codes, batchId)
    codes
  }

  /** Drain all available input once (blocking), compacting below the
    * replay frontier every `compactEvery` batches. */
  def runAvailableNowIvfPq(spark: SparkSession, sourceDir: String,
      schema: StructType, codesStore: AppendStore, model: IvfPq.Model,
      checkpoint: String, vecCol: String = "embedding",
      idCol: String = "vec_id", compactEvery: Int = 16): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatchIvfPq(batch, batchId, codesStore, model, vecCol, idCol)
        AppendStore.maybeCompact(compactEvery, batchId, codesStore)
      }
      .start()
    q.awaitTermination()
  }

  /** Search the drained composite index over every code segment
    * admitted so far ([[IvfPq.search]] semantics). Empty store → None. */
  def searchIvfPq(codesStore: AppendStore, model: IvfPq.Model,
      corpus: DataFrame, queries: DataFrame, k: Int = 5, nprobe: Int = 4,
      rerank: Int = 50, vecCol: String = "embedding",
      idCol: String = "vec_id"): Option[DataFrame] =
    codesStore.read().map { codes =>
      IvfPq.search(codes, model, corpus, queries, k, nprobe, rerank,
        vecCol, idCol)
    }
}
