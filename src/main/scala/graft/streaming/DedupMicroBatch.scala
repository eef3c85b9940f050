package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.cdc.TableStore
import graft.operators.{Dedup, IncrementalDedup}

/** Streaming corpus dedup — [[IncrementalDedup]] driven by the same
  * micro-batch drain pattern as [[CdcMicroBatch]].
  *
  * Each arriving batch of documents is (1) internally deduplicated
  * (MinHash-LSH pairs → connected components → canonical
  * representatives), (2) matched against the PERSISTED signature index
  * of everything admitted so far, (3) split into admitted docs (their
  * signatures appended to the index) and rejects (landed with the id of
  * the doc they duplicate). Work per batch is proportional to the
  * batch — the corpus is never re-sketched (see SCALE.md).
  *
  * Exactly-once: the file-source checkpoint tracks consumed batches and
  * both TableStore writes are idempotent re-derivations from (previous
  * index, batch), so a replayed batch converges to the same state.
  */
object DedupMicroBatch {

  /** One micro-batch transition: (index state, reject log, batch) →
    * (index', rejects'). A pure re-derivation from the persisted stores
    * plus the batch, so applying the SAME batch twice (crash after the
    * writes, before the checkpoint commit → source re-delivery)
    * converges: already-indexed ids are skipped by
    * [[IncrementalDedup.admitted]]'s anti-joins, and the reject log
    * dedups on the pair key. Exposed (not inlined in the foreachBatch
    * closure) so the replay guarantee is directly testable — StreamSpec
    * applies a batch twice and asserts both stores are unchanged.
    *
    * Returns the docs ADMITTED this batch (full batch schema) so
    * downstream labeling stages ([[CurateMicroBatch]]) can compose with
    * the drain; on a replayed batch the returned frame is empty. The
    * frame reads only the PRE-write index snapshot (TableStore versions
    * are immutable), so it stays valid after the index write. */
  def processBatch(batch: DataFrame, indexStore: TableStore,
      rejectStore: TableStore, threshold: Double): DataFrame = {
    // intra-batch: keep one representative per near-dup cluster
    val pairs = Dedup.minhashLsh(batch, threshold = threshold)
    val reps = Dedup.clusters(pairs)
    val internal = batch.join(reps, Seq("doc_id"), "left")
      .where(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .drop("cluster_id")

    indexStore.read() match {
      case None =>
        indexStore.write(IncrementalDedup.index(internal))
        rejectStore.write(internal.limit(0)
          .select(col("doc_id").as("new_id"), col("doc_id").as("dup_of"),
            lit(0.0).as("jaccard")))
        internal
      case Some(idx) =>
        val matches = IncrementalDedup.matchAgainst(idx, internal,
          threshold = threshold)
        indexStore.write(IncrementalDedup.append(idx, internal, matches))
        val prev = rejectStore.read().getOrElse(matches.limit(0))
        // replay guard: if this batch already ran (both writes landed,
        // crash before the checkpoint commit), the re-delivered matches
        // are already in `prev` — dedup on the pair key so the reject
        // log converges instead of double-counting
        rejectStore.write(prev.unionByName(matches)
          .dropDuplicates("new_id", "dup_of"))
        IncrementalDedup.admitted(idx, internal, matches)
    }
  }

  /** Drain all available input once. Blocks until done. */
  def runAvailableNow(spark: SparkSession, sourceDir: String,
      schema: StructType, indexStore: TableStore, rejectStore: TableStore,
      checkpoint: String, threshold: Double = 0.5): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, indexStore, rejectStore, threshold)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
