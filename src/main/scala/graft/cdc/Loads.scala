package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C3 — full load: truncate + insert (base_loader.py:477-516).
  *
  * Quirk preserved behind a flag: the reference checks the source count
  * first and returns WITHOUT truncating when the source is empty — stale
  * destination data survives (base_loader.py:485-491). `strictEmpty =
  * false` keeps that behavior; `true` truncates regardless (the fixed
  * semantics, documented deviation per SURVEY §2.9).
  */
object FullLoad {
  def apply(store: TableStore, source: DataFrame,
      strictEmpty: Boolean = false): Unit = {
    if (source.isEmpty && !strictEmpty) () // reference quirk: keep stale data
    else store.write(source)
  }
}

/** C4 — snapshot load: idempotent daily-partition overwrite
  * (base_loader.py:518-584): stage with `today() AS derived` →
  * `ALTER TABLE DELETE WHERE derived = today()` → insert. Re-runs on the
  * same day replace only that day's partition.
  *
  * Spark-first restatement: dynamic partition overwrite — only the
  * partitions present in the incoming batch are rewritten, so at 100 TB
  * a daily snapshot touches one partition, not the table. `asOf` is a
  * parameter (not `current_date()`) for deterministic replay/oracle
  * parity (SURVEY §7.4).
  */
object SnapshotLoad {
  def apply(spark: SparkSession, path: String, source: DataFrame,
      derivedCol: String, asOf: java.time.LocalDate): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      source
        .withColumn(derivedCol, lit(java.sql.Date.valueOf(asOf)))
        .write.mode("overwrite")
        .partitionBy(derivedCol)
        .parquet(path)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

/** C7/A2 — watermark: the destination IS the checkpoint. The last loaded
  * tracking value is `MAX(track)` over the destination; a missing table
  * means full load (base_loader.py:586-608).
  */
object Watermark {
  /** None → destination absent/empty → caller does a full load. */
  def lastLoaded(dest: Option[DataFrame], track: String): Option[Any] =
    dest.flatMap { d => Option(d.agg(max(col(track))).head().get(0)) }

  /** P5 — strict `>` predicate (PG path: watermark-tied rows dropped). */
  def strictAfter(df: DataFrame, track: String, wm: Any): DataFrame =
    df.where(col(track) > lit(wm))

  /** P6 — inclusive `>=` predicate (Mongo `$gte` path: boundary rows
    * re-read; safe because C1 upsert is idempotent). */
  def inclusiveFrom(df: DataFrame, track: String, wm: Any): DataFrame =
    df.where(col(track) >= lit(wm))
}
