package graft.schema

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S6 — sampling schema inference with regex date promotion.
  *
  * The reference infers an unseen table's schema from a ≤1000-line JSON
  * sample, 100 values per column, with two special rules
  * (base_loader.py:738-867):
  *   - mixed-type columns fall back to String (:808-813);
  *   - String columns are promoted to DateTime/Date when >80% of a
  *     20-value sample matches `^\d{4}-\d{2}-\d{2}( \d{2}:\d{2}:\d{2})?$`
  *     (:815-828).
  *
  * Spark-first restatement: `spark.read.json` on the bounded sample does
  * the base inference (its mixed-type fallback IS String), then one
  * aggregate pass over the sample computes per-column date-match ratios
  * — a single job, no driver-side row loop. The promotion is applied by
  * casting in the returned reader, so the full-scale read is a plain
  * schema'd `json` scan (no inference cost at 100 TB).
  */
object Infer {

  private val dateTimeRe = "^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$"
  private val dateRe = "^\\d{4}-\\d{2}-\\d{2}$"

  /** Infer a schema from a sample of raw JSON lines, applying the
    * reference's date-promotion rule. */
  def inferSchema(spark: SparkSession, jsonLines: Dataset[String],
      sampleLines: Int = 1000, sampleValues: Int = 100,
      promoteThreshold: Double = 0.8): StructType = {
    import spark.implicits._
    val sample = jsonLines.limit(sampleLines).cache()
    try {
      val base = spark.read.json(sample)
      val stringCols = base.schema.fields.collect {
        case StructField(n, StringType, _, _) => n
      }.toSeq
      if (stringCols.isEmpty) base.schema
      else {
        // One aggregate over the sample: per column, the fraction of the
        // first `sampleValues` non-null values matching each pattern.
        val aggs = stringCols.flatMap { c =>
          val v = col(s"`$c`")
          Seq(
            count(v).as(s"__n_$c"),
            count(when(v.rlike(dateTimeRe), 1)).as(s"__dt_$c"),
            count(when(v.rlike(dateRe), 1)).as(s"__d_$c"))
        }
        val row = base.select(stringCols.map(c =>
            col(s"`$c`")).toSeq: _*)
          .limit(sampleValues).agg(aggs.head, aggs.tail: _*).head()
        val promoted = stringCols.flatMap { c =>
          val n = row.getAs[Long](s"__n_$c")
          val dt = row.getAs[Long](s"__dt_$c")
          val d = row.getAs[Long](s"__d_$c")
          if (n == 0) None
          else if (dt.toDouble / n > promoteThreshold) Some(c -> TimestampType)
          else if ((dt + d).toDouble / n > promoteThreshold) Some(c -> DateType)
          else None
        }.toMap
        StructType(base.schema.fields.map { f =>
          promoted.get(f.name).map(t => f.copy(dataType = t)).getOrElse(f)
        })
      }
    } finally { sample.unpersist(); () }
  }

  /** Full read: infer from the bounded sample, then scan everything with
    * the fixed schema (inference never touches the full dataset). */
  def readJson(spark: SparkSession, jsonLines: Dataset[String],
      sampleLines: Int = 1000): DataFrame = {
    val schema = inferSchema(spark, jsonLines, sampleLines)
    spark.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss") // staging format,
      .option("dateFormat", "yyyy-MM-dd")               // mongo_loader.py:114
      .json(jsonLines)
  }
}
