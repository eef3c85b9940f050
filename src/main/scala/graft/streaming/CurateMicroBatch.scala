package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.cdc.AppendStore
import graft.operators.{Decontaminate, Sampling}

/** Streaming corpus curation — the [[DedupMicroBatch]] drain composed
  * with the two labeling stages a training-data pipeline applies on
  * ingest: train/val/test split assignment ([[Sampling.split]]) and
  * benchmark decontamination ([[Decontaminate.flag]]).
  *
  * Each arriving batch is deduplicated (intra-batch + against the
  * persisted signature index), and the ADMITTED docs are labeled and
  * landed as this batch's segment of an admitted-corpus [[AppendStore]]
  * carrying `(doc cols..., split, contamination, contaminated)` — IO
  * per batch proportional to the batch, never a corpus rewrite.
  *
  * Stream == batch by construction: both labels are PURE per-doc
  * functions — the split is an md5 draw on (id, seed) (no dependence on
  * batch boundaries, partitioning, or arrival order) and contamination
  * compares each doc's own n-grams against the fixed eval dictionary —
  * so a doc admitted in micro-batch 17 of a year-long ingest gets
  * exactly the labels a one-shot batch run over the final corpus would
  * give it. StreamSpec pins this parity plus replay idempotency (a
  * replayed batch recomputes its transition from the pre-batch state
  * and overwrites its own segments with identical content — the
  * [[AppendStore]] contract).
  *
  * Scale: per batch, work is proportional to the batch (the dedup
  * drain's contract) plus one broadcast semi-join against the eval
  * dictionary (KBs–MBs) — the labeling adds ZERO corpus-sized shuffles.
  */
object CurateMicroBatch {

  /** One micro-batch transition. Dedups via
    * [[DedupMicroBatch.processBatch]] (which lands the index + reject
    * segments for `batchId`), then labels the admitted docs and lands
    * them as segment `batchId` of `admittedStore`. Idempotent under
    * batch re-delivery. */
  def processBatch(batch: DataFrame, batchId: Long,
      indexStore: AppendStore, rejectStore: AppendStore,
      admittedStore: AppendStore, evalDocs: DataFrame,
      weights: Seq[(String, Double)], seed: String = "0",
      threshold: Double = 0.5, contaminationN: Int = 3,
      contaminationThreshold: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    // The labeled plan references the admitted frame twice (split +
    // contamination legs) and its lineage re-runs the batch dedup per
    // reference — pin it once; batch-sized, so the materialization is
    // cheap by the drain's own contract.
    val adm = DedupMicroBatch.processBatch(batch, batchId, indexStore,
      rejectStore, threshold).localCheckpoint(true)
    val labeled = Sampling.split(adm, idCol, weights, seed)
      .join(Decontaminate.flag(adm, evalDocs, contaminationN,
          contaminationThreshold, textCol, idCol)
          .select(col(idCol), col("contamination"), col("contaminated")),
        Seq(idCol))
    admittedStore.write(labeled, batchId)
  }

  /** Drain all available input once. Blocks until done. Every
    * `compactEvery` batches the three stores' segments below the
    * replay frontier merge into one range segment
    * ([[AppendStore.maybeCompact]]) so a long-running drain's
    * directory count stays bounded. */
  def runAvailableNow(spark: SparkSession, sourceDir: String,
      schema: StructType, indexStore: AppendStore, rejectStore: AppendStore,
      admittedStore: AppendStore, evalDocs: DataFrame,
      weights: Seq[(String, Double)], checkpoint: String,
      seed: String = "0", threshold: Double = 0.5,
      compactEvery: Int = 16): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexStore, rejectStore,
          admittedStore, evalDocs, weights, seed = seed,
          threshold = threshold)
        AppendStore.maybeCompact(compactEvery, batchId,
          indexStore, rejectStore, admittedStore)
      }
      .start()
    q.awaitTermination()
  }
}
