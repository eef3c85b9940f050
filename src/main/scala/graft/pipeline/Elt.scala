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

  /** The reference's incremental-extraction query shape
    * (postgres_loader.py:96-103: `SELECT * FROM schema.table` plus
    * `WHERE tracking_column > %s` when a watermark exists), rendered as
    * a derived-table string for Spark's JDBC `dbtable` option — so the
    * predicate executes IN the source database and only post-watermark
    * rows ever cross the wire, exactly like the reference's
    * server-side-cursor query. Pure string builder, unit-testable
    * without a database.
    *
    * `quoteWm = false` is for numeric tracking columns in strict-typed
    * databases (Derby rejects INTEGER-vs-CHAR comparisons; Postgres
    * would coerce the quoted literal). Single quotes in the watermark
    * value are doubled — the only escape SQL string literals need. */
  def jdbcSourceQuery(table: String, trackingCol: String,
      lastValue: Option[String], quoteWm: Boolean = true): String =
    lastValue match {
      case None => table
      case Some(wm) =>
        val lit = if (quoteWm) "'" + wm.replace("'", "''") + "'" else wm
        s"(SELECT * FROM $table WHERE $trackingCol > $lit) AS spark_src"
    }

  /** JDBC incremental extraction façade — the migrating user's first
    * step off `PostgresToClickhouseLoader` (postgres_loader.py:73-153).
    * Returns the post-watermark batch as a DataFrame; compose with
    * [[extractToStaging]] for the staging hop or merge it directly.
    *
    * Scale shape: a bare JDBC read is ONE connection through one task —
    * fine for dimension-sized tables, a bottleneck for large ones. Pass
    * `partitionCol` (+ bounds) to fan the extraction across
    * `numPartitions` parallel connections, each scanning a bound range;
    * the watermark predicate still applies inside every partition's
    * query because it lives in the derived table. `fetchSize` mirrors
    * the reference's server-side-cursor `batch_size` (base_loader
    * streams batches instead of materializing the result;
    * postgres_loader.py:95,110) — without it the PG driver buffers the
    * entire result set in executor memory.
    *
    * The reference's per-row datetime/Decimal coercions
    * (postgres_loader.py:128-137) are NOT applied here — they are the
    * staging contract, applied distributed by [[extractToStaging]], so
    * a caller that merges directly keeps native types. */
  def extractJdbc(spark: SparkSession, url: String, table: String,
      trackingCol: String, lastValue: Option[String],
      props: Map[String, String] = Map.empty,
      quoteWm: Boolean = true,
      fetchSize: Int = 10000,
      partitionCol: Option[String] = None,
      numPartitions: Int = 1,
      lowerBound: Option[String] = None,
      upperBound: Option[String] = None): DataFrame = {
    require(partitionCol.isEmpty ||
      (lowerBound.isDefined && upperBound.isDefined),
      "partitionCol requires lowerBound and upperBound")
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", jdbcSourceQuery(table, trackingCol, lastValue, quoteWm))
      .option("fetchsize", fetchSize.toString)
    val partitioned = partitionCol.fold(base) { pc =>
      base.option("partitionColumn", pc)
        .option("lowerBound", lowerBound.get)
        .option("upperBound", upperBound.get)
        .option("numPartitions", numPartitions.toString)
    }
    props.foldLeft(partitioned) { case (r, (k, v)) => r.option(k, v) }.load()
  }

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
