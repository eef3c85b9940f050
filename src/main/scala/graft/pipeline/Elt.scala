package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cdc.{DedupLatest, TableStore, Upsert}
import graft.schema.{Infer, Normalize}

/** S4/S5/S11 — the reference's functional ELT façade restated:
  * `extract_*_to_object_storage` / `load_data_to_clickhouse`
  * (clickhouse_load_tool/mongo_to_clickhouse.py:24-111,
  * postgres_to_clickhouse.py:27-71) become extract-to-JSON-staging and
  * load-from-staging helpers over [[TableStore]].
  *
  * The JSON staging hop (base_loader.py:107-182) is retained as an
  * explicit exchange format: timestamps are rendered second-precision
  * strings, nested values JSON-stringified (§1.2 coercions), and the
  * load side re-infers the schema with date promotion — exactly the
  * reference's contract, executed distributed (one write job, one read
  * job; no driver-side buffering of the batch).
  */
object Elt {

  /** Extract: normalize per §1.2 and write the batch as JSON lines. */
  def extractToStaging(df: DataFrame, stagePath: String): Long = {
    val coerced = Normalize.stringifyNested(Normalize.decimalsToDouble(df))
    val rendered = coerced.schema.fields.foldLeft(coerced) { (acc, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampType =>
          acc.withColumn(f.name,
            Normalize.timestampToString(org.apache.spark.sql.functions.col(f.name)))
        case org.apache.spark.sql.types.DateType =>
          acc.withColumn(f.name,
            Normalize.dateToString(org.apache.spark.sql.functions.col(f.name)))
        case _ => acc
      }
    }
    rendered.write.mode("overwrite").json(stagePath)
    rendered.count()
  }

  /** Load: read staged JSON (sampled inference + date promotion),
    * project onto the destination schema when the table already exists
    * (S7 — unknown fields skipped, missing filled with nulls), then
    * merge per `mode`. Empty staging input is a no-op, preserving
    * `load_data_to_clickhouse`'s empty-file-key behavior. */
  def loadFromStaging(spark: SparkSession, stagePath: String,
      store: TableStore, upsertKeys: Seq[String],
      track: Option[String] = None): Long = {
    import spark.implicits._
    val raw = spark.read.text(stagePath).select("value").as[String]
    if (raw.isEmpty) return 0L // reference: no-op on empty input
    val incoming = Infer.readJson(spark, raw)
    val aligned = store.read() match {
      case Some(dest) => Normalize.alignToSchema(incoming, dest.schema)
      case None => incoming
    }
    val merged = store.read() match {
      case Some(dest) =>
        val up = Upsert(dest, aligned, upsertKeys)
        track.map(t => DedupLatest(up, upsertKeys, t)).getOrElse(up)
      case None => aligned
    }
    store.write(merged)
    store.read().map(_.count()).getOrElse(0L)
  }
}
