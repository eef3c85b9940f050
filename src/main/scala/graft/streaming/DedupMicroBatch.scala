package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.cdc.AppendStore
import graft.operators.{Dedup, IncrementalDedup}

/** Streaming corpus dedup — [[IncrementalDedup]] driven by the same
  * micro-batch drain pattern as [[CdcMicroBatch]].
  *
  * Each arriving batch of documents is (1) internally deduplicated
  * (MinHash-LSH pairs → connected components → canonical
  * representatives), (2) matched against the PERSISTED signature index
  * of everything admitted so far, (3) split into admitted docs (their
  * signatures landing as this batch's index segment) and rejects
  * (landing with the id of the doc they duplicate). Work per batch —
  * compute AND IO — is proportional to the batch: the corpus is never
  * re-sketched, and the [[AppendStore]] segment model writes only the
  * batch's delta instead of rewriting the accumulated index/log (the
  * prior snapshot-store drain paid O(corpus) write amplification per
  * batch; see SCALE.md).
  *
  * Exactly-once: the file-source checkpoint tracks consumed batches;
  * a replayed batch recomputes its transition from
  * `readBefore(batchId)` — exactly the state its original run saw — so
  * both segment writes idempotently replace themselves with identical
  * content.
  */
object DedupMicroBatch {

  /** One micro-batch transition: reads the pre-`batchId` index state,
    * writes segment `batchId` of both the index and the reject log.
    * A PURE function of (prior segments, batch) — replaying the same
    * (batch, batchId) recomputes content-identical segments (StreamSpec
    * applies a batch twice and asserts both stores are unchanged).
    *
    * Returns the docs ADMITTED this batch (full batch schema) so
    * downstream labeling stages ([[CurateMicroBatch]]) can compose with
    * the drain; on a replay the same admitted frame is returned again
    * (pure recomputation), never doubled in the stores. */
  def processBatch(batch: DataFrame, batchId: Long,
      indexStore: AppendStore, rejectStore: AppendStore,
      threshold: Double): DataFrame = {
    // ONE sketch pass per batch: the checkpointed (id, shingles,
    // signature) frame feeds all three consumers — intra-batch pair
    // generation, the index probe, and the admitted index rows. The
    // prior shape re-ran the shingle+minhash kernels once per stage
    // (3× the dominant per-batch compute).
    val sig = Dedup.docSignatures(batch)

    // intra-batch: keep one representative per near-dup cluster
    val pairs = Dedup.pairsFromSignatures(sig, threshold = threshold)
    val reps = Dedup.clusters(pairs)
    val internal = batch.join(reps, Seq("doc_id"), "left")
      .where(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .drop("cluster_id")
    val sigInternal = sig.join(internal.select("doc_id"),
      Seq("doc_id"), "left_semi")

    val emptyRejects = internal.limit(0)
      .select(col("doc_id").as("new_id"), col("doc_id").as("dup_of"),
        lit(0.0).as("jaccard"))
    val (admitted, matches, sigAdmitted) =
      indexStore.readBefore(batchId) match {
        case None => (internal, emptyRejects, sigInternal)
        case Some(idx) =>
          val m = IncrementalDedup.matchAgainstSignatures(idx, sigInternal,
            threshold = threshold)
            // segment content must be deterministic under recomputation;
            // matches are already distinct pairs, localCheckpoint pins
            // them so the consumers (anti-joins + segment write) agree
            .localCheckpoint(true)
          val matched = m.select(col("new_id").as("doc_id")).distinct()
          (internal.join(matched, Seq("doc_id"), "left_anti"), m,
            sigInternal.join(matched, Seq("doc_id"), "left_anti"))
      }
    indexStore.write(IncrementalDedup.indexFromSignatures(sigAdmitted),
      batchId)
    rejectStore.write(matches, batchId)
    admitted
  }

  /** Drain all available input once. Blocks until done. Every
    * `compactEvery` batches the stores' segments below the replay
    * frontier merge into one range segment
    * ([[AppendStore.maybeCompact]]) so a long-running drain's
    * directory count stays bounded instead of growing one segment per
    * batch forever. */
  def runAvailableNow(spark: SparkSession, sourceDir: String,
      schema: StructType, indexStore: AppendStore, rejectStore: AppendStore,
      checkpoint: String, threshold: Double = 0.5,
      compactEvery: Int = 16): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexStore, rejectStore, threshold)
        AppendStore.maybeCompact(compactEvery, batchId,
          indexStore, rejectStore)
      }
      .start()
    q.awaitTermination()
  }
}
