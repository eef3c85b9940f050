package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.schema.{Infer, Normalize}

/** Document-scan, flatten, nested-field and schema-inference operators —
  * SURVEY.md §2.1 (S1, S6), §2.2 (P3, P4).
  */
object SchemaQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S1 — document-collection scan: raw JSON docs → normalization →
    // typed columns. Exercises the full json staging pipeline
    // (to_json round trip + sampled inference + schema'd read).
    "q_scan_json_docs" -> { (s, d) =>
      import s.implicits._
      val jsonDocs = Tables(s, d, "documents")
        .select(to_json(struct(col("*"))).as("doc")).as[String]
      Infer.readJson(s, jsonDocs).orderBy("doc_id")
    },

    // S6 — schema inference with date promotion: emit the inferred
    // (column, type) pairs for a JSON sample whose ts/day columns are
    // strings in the reference's staging formats.
    "q_infer_schema" -> { (s, d) =>
      import s.implicits._
      val jsonLines = Tables(s, d, "events").select(to_json(struct(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
        col("event_type"), col("value"))).as("j")).as[String]
      val schema = Infer.inferSchema(s, jsonLines)
      import scala.collection.JavaConverters._
      s.createDataFrame(
        schema.fields.map(f =>
          org.apache.spark.sql.Row(f.name, f.dataType.sql)).toList.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("column_name",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("column_type",
            org.apache.spark.sql.types.StringType))))
        .orderBy("column_name")
    },

    // P4 — one-level struct flatten: {meta: {user_id, event_type}} →
    // meta_user_id, meta_event_type (mongo_loader.py:122-130).
    "q_flatten_struct" -> { (s, d) =>
      val nested = Tables(s, d, "events").select(
        col("event_id"),
        struct(col("user_id"), col("event_type")).as("meta"),
        col("value"))
      Normalize.flattenOneLevel(nested).orderBy("event_id")
    },

    // P3 — nested-field deletion by dotted path (mongo_loader.py:62-85);
    // structural effect asserted in NormalizeSpec, value effect here.
    "q_drop_nested_field" -> { (s, d) =>
      val nested = Tables(s, d, "events").select(
        col("event_id"),
        struct(
          struct(col("user_id").as("id"), col("event_type").as("typ")).as("user"),
          col("value").as("v")).as("payload"))
      Normalize.dropNestedField(nested, "payload.user.typ")
        .select(col("event_id"),
          col("payload.user.id").as("user_id_kept"),
          col("payload.v").as("v"))
        .orderBy("event_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_scan_json_docs" -> "SELECT * FROM documents ORDER BY doc_id",
    "q_infer_schema" ->
      """SELECT * FROM (VALUES
        |  ('day_str', 'DATE'), ('event_id', 'BIGINT'),
        |  ('event_type', 'STRING'), ('ts_str', 'TIMESTAMP'),
        |  ('value', 'DOUBLE')) AS t(column_name, column_type)
        |ORDER BY column_name""".stripMargin,
    "q_flatten_struct" ->
      """SELECT event_id, user_id AS meta_user_id,
        |  event_type AS meta_event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_drop_nested_field" ->
      """SELECT event_id, user_id AS user_id_kept, value AS v
        |FROM events ORDER BY event_id""".stripMargin
  )
}
