package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (repo:TESTDATA.md).
  *
  * All declared queries receive `(spark, sfDir)` and must read inputs
  * through here so the same code path serves sf0.001 (smoke), sf0.01
  * (DuckDB-oracle correctness) and sf0.1 (bench) — and, at production
  * scale, any parquet directory layout.
  */
object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet timestamp encodings vary by fixture generation:
    // TIMESTAMP(NANOS) (vectorized reader rejects it — read nanos as raw
    // longs and floor-convert, matching DuckDB's ns→µs truncation) or
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark infers
    // TIMESTAMP_NTZ, which watermarks/unix_micros reject — cast to
    // TimestampType; the session tz is pinned UTC everywhere, so the
    // NTZ wall-clock and the UTC instant coincide, same as the nanos
    // interpretation and DuckDB's naive TIMESTAMP).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        acc.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else if (f.name == "ts" && f.dataType == TimestampNTZType)
        acc.withColumn("ts", col("ts").cast(TimestampType))
      else acc
    }
  }

  /** Register every table as a temp view so spark.sql(...) queries can
    * use the same names the DuckDB oracle sees. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      apply(spark, dir, n).createOrReplaceTempView(n)
    }
}
