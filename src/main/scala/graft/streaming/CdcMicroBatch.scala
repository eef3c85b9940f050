package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.{AppendStore, TableStore, Upsert}
import graft.quality.Check

/** §2.10 — the reference's pull-based micro-batch CDC restated as
  * Structured Streaming.
  *
  * The reference polls on cron (all_schedules.py:12-52) and merges each
  * batch with delete+insert (C1). Spark-first: `readStream` over the
  * landing directory, `foreachBatch` running the same [[Upsert]] kernel
  * into a [[TableStore]], `Trigger.AvailableNow` for the cron-style
  * "drain what's there and stop" run (or ProcessingTime for continuous).
  * Exactly-once: checkpoint tracks consumed files; the upsert kernel is
  * idempotent per batch (delete+insert), so replays converge — the same
  * guarantee the reference gets from its delete+insert (SURVEY §2.10).
  */
object CdcMicroBatch {

  /** Drain all available input once (cron-run analog), upserting each
    * micro-batch into the store. Blocks until done. */
  def runAvailableNow(spark: SparkSession, sourceDir: String,
      schema: StructType, store: TableStore, keys: Seq[String],
      checkpoint: String): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dest = store.read().getOrElse(batch.limit(0))
        store.write(Upsert(dest, batch, keys))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Gated drain: each micro-batch routes through [[Check.route]] —
    * clean rows run the normal upsert, violating rows land with their
    * `__violations` labels as that batch's segment of a quarantine
    * [[AppendStore]] (repair-and-reingest material, never silently
    * dropped, never poisoning the destination). Exactly-once holds for
    * both sides: the upsert is idempotent per batch and the quarantine
    * segment is an idempotent overwrite keyed by batchId. */
  def runAvailableNowGated(spark: SparkSession, sourceDir: String,
      schema: StructType, store: TableStore, keys: Seq[String],
      checkpoint: String, rules: Seq[Check.Rule],
      quarantine: AppendStore): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (clean, dirty) = Check.route(batch, rules)
        val dest = store.read().getOrElse(clean.limit(0))
        store.write(Upsert(dest, clean, keys))
        quarantine.write(dirty, batchId)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Tumbling event-time counts with watermarking — works identically
    * over a stream (append mode after watermark) and a batch frame
    * (used by q_stream_tumbling_count's oracle parity). */
  def tumblingCounts(events: DataFrame, tsCol: String = "ts",
      width: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    src.groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value"))
  }

  /** [[runAvailableNow]] against a bucket-pruned COW table
    * ([[graft.cdc.CowStore]]) — the complete 100 TB CDC write path:
    * where the [[TableStore]] variant above rewrites the WHOLE
    * destination per micro-batch (O(dest) writes at the reference's
    * hourly cadence), this one rewrites only the buckets containing
    * each batch's keys; untouched buckets are inherited by manifest
    * reference. Exactly-once holds unchanged: the checkpoint tracks
    * consumed files and the bucket-local delete+insert (optionally
    * keep-latest via `dedup`) is idempotent per batch, so a replayed
    * batch re-merges to the identical bucket contents. */
  def runAvailableNowCow(spark: SparkSession, sourceDir: String,
      schema: StructType, store: graft.cdc.CowStore,
      checkpoint: String,
      dedup: Option[(String, Seq[String])] = None): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.upsert(batch, dedup)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** End-to-end streaming CDC: drain micro-batches into the COW
    * source AND patch a downstream row-wise mart from the change feed
    * after each committed batch — the reference's extract-then-marts
    * cadence (`all_schedules.py:40-52`, marts cron'd 5 minutes after
    * extracts) collapsed into one converging stream, with the mart
    * work ∝ churn instead of a rebuild per run. The feed cursor rides
    * the driver closure between batches; on a checkpoint replay the
    * re-upsert is idempotent and the re-drained window re-applies the
    * same patch ([[graft.cdc.IncrementalMart]]'s convergence
    * contract), so stream state needs no custom store. A mart that
    * does not exist yet is built from the first drained snapshot. */
  def runAvailableNowCowMart(spark: SparkSession, sourceDir: String,
      schema: StructType, store: graft.cdc.CowStore,
      mart: graft.cdc.CowStore, transform: DataFrame => DataFrame,
      keys: Seq[String], checkpoint: String): Unit = {
    var cursor = store.version.getOrElse(0)
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.upsert(batch)
        // store.version is Some after the upsert, so build().get is
        // total here; a refresh whose cursor fell out of retention
        // (None) rebuilds — the IncrementalMart contract.
        def rebuild(): Int =
          graft.cdc.IncrementalMart.build(store, transform, mart).get
        cursor =
          if (!mart.exists || cursor == 0) rebuild()
          else graft.cdc.IncrementalMart.refresh(store, cursor,
            transform, mart, keys).getOrElse(rebuild())
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Continuous variant: start a ProcessingTime-triggered upsert stream
    * (the reference's 15-min cadence analog); caller manages lifecycle. */
  def runContinuous(spark: SparkSession, sourceDir: String,
      schema: StructType, store: TableStore, keys: Seq[String],
      checkpoint: String, interval: String = "15 minutes"): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dest = store.read().getOrElse(batch.limit(0))
        store.write(Upsert(dest, batch, keys))
        ()
      }
      .start()
}
