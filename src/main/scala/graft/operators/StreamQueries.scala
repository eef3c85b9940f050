package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.CdcMicroBatch

/** Streaming-semantics and multimodal query keys — SURVEY §2.10, §7.5.
  * The tumbling aggregation is the same code path the streaming query
  * runs (batch/stream parity of Structured Streaming); the live-stream
  * behavior (watermark, AvailableNow drain, foreachBatch upsert) is
  * covered in StreamSpec.
  */
object StreamQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Tumbling event-time window counts (batch-expressible for oracle).
    "q_stream_tumbling_count" -> { (s, d) =>
      CdcMicroBatch.tumblingCounts(Tables(s, d, "events"))
        .orderBy("hour_start", "event_type")
    },

    // Sliding (overlapping) event-time windows — each event lands in
    // width/slide = 2 windows; same watermark/state semantics as the
    // tumbling key when run over a stream. Oracle unnests the two
    // epoch-aligned bucket starts per event.
    "q_stream_sliding_count" -> { (s, d) =>
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("cnt"))
        .orderBy("win_start", "event_type")
    },

    // Gap-based sessionization (batch formulation; streaming parity via
    // flatMapGroupsWithState asserted in StreamSpec).
    "q_sessionize" -> { (s, d) =>
      graft.streaming.Sessionize.batch(Tables(s, d, "events"), gapSec = 1800)
        .orderBy("user_id", "session_start")
    },

    // Multimodal metadata pass over binary payloads (documents' text
    // encoded as the stand-in payload; plumbing identical for real
    // image/audio bytes).
    "q_multimodal_meta" -> { (s, d) =>
      val media = Tables(s, d, "documents").select(
        col("doc_id").as("media_id"),
        lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      Multimodal.describePayloads(media)
        .withColumn("n_bytes", col("n_bytes").cast("long"))
        .select("media_id", "kind", "n_bytes", "magic")
        .orderBy("media_id")
    },

    // Feature extraction (mapPartitions batch shape; real JDK decode
    // for image/audio payloads, deterministic stub for the rest —
    // these text payloads take the stub path). Raw feature values are
    // engine-specific; the driver-visible gate variant lives in
    // [[gateQueries]].
    "q_multimodal_features" -> { (s, d) =>
      val media = Tables(s, d, "documents").select(
        col("doc_id").as("media_id"),
        lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("n_bytes"), col("width"), col("height"),
          element_at(col("feature"), 1).as("f0"))
        .orderBy("media_id")
    }
  )

  /** Verify-only gate for the feature-extraction key: `n_bytes` is a
    * REAL oracle value (DuckDB restates it as octet_length of the same
    * payload), and the shape booleans pin the decode contract — the
    * stub's documented dimension range and the fixed feature width. A
    * broken decode path (empty features, zero dims, wrong byte count)
    * flips a column → hash mismatch → red driver row. */
  val gateQueries: Map[String, Q] = Map(
    "q_multimodal_features" -> { (s, d) =>
      val media = Tables(s, d, "documents").select(
        col("doc_id").as("media_id"),
        lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"),
          col("n_bytes").cast("long").as("n_bytes"),
          (col("width").between(16, 79) && col("height").between(16, 79))
            .as("dims_ok"),
          (size(col("feature")) === 8).as("feature_len_8"))
        .orderBy("media_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling_count" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "q_stream_sliding_count" ->
      """SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type,
        |  count(*) AS cnt
        |FROM (
        |  SELECT unnest([
        |      time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
        |      time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
        |        - INTERVAL '30 minutes']) AS win_start,
        |    event_type
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'text' AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  substr(text, 1, 4) AS magic
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  true AS dims_ok, true AS feature_len_8
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
