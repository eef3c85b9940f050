package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the engine-level analog of the
  * reference's dbt schema tests (models/staging/schema.yml:9-37
  * unique/not_null, executed by `dbt build`, dagster_code/assets/
  * dbt_assets.py:23-24). A rule set is data, not code; running it
  * returns a VIOLATIONS DataFrame (empty = all checks pass), so the
  * result can be landed, alerted on, or used to gate a pipeline stage.
  *
  * Scale: each rule is one declarative aggregation — `not_null` is a
  * map-side-partial count, `unique`/`accepted_values` group on the
  * checked columns (the one unavoidable shuffle, same key a dedup would
  * use). Rules never collect row-level data to the driver; violations
  * are returned grouped (one row per offending key/value with its
  * count), so the output stays small even when a check fails on
  * billions of rows.
  */
object Check {

  sealed trait Rule
  /** schema.yml `not_null` */
  final case class NotNull(column: String) extends Rule
  /** schema.yml `unique` (composite keys supported) */
  final case class Unique(columns: Seq[String]) extends Rule
  /** dbt `accepted_values` (NULLs are ignored, matching dbt: pair with
    * [[NotNull]] to also forbid them) */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Rule
  /** dbt `relationships`: every non-NULL `column` value must exist in
    * `ref`'s `refColumn` (referential integrity). */
  final case class Relationship(column: String, ref: DataFrame,
      refColumn: String) extends Rule

  /** Violations frame: (rule, column_name, violating_value, n_rows).
    * Empty iff every rule passes. */
  def apply(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    val parts = rules.map {
      case NotNull(c) =>
        df.where(col(c).isNull)
          .agg(count(lit(1)).as("n_rows"))
          .where(col("n_rows") > 0)
          .select(lit("not_null").as("rule"), lit(c).as("column_name"),
            lit(null).cast("string").as("violating_value"), col("n_rows"))
      case Unique(cols) =>
        df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("n_rows"))
          .where(col("n_rows") > 1)
          .select(lit("unique").as("rule"),
            lit(cols.mkString(",")).as("column_name"),
            concat_ws("|", cols.map(c => col(c).cast("string")): _*)
              .as("violating_value"),
            col("n_rows"))
      case AcceptedValues(c, vs) =>
        df.where(col(c).isNotNull && !col(c).isin(vs: _*))
          .groupBy(col(c))
          .agg(count(lit(1)).as("n_rows"))
          .select(lit("accepted_values").as("rule"), lit(c).as("column_name"),
            col(c).cast("string").as("violating_value"), col("n_rows"))
      case Relationship(c, ref, rc) =>
        // anti join against the distinct referenced keys (broadcast when
        // the key set is small; shuffle otherwise — same key the join
        // a user would write anyway)
        df.where(col(c).isNotNull)
          .join(ref.select(col(rc).as(c)).distinct(), Seq(c), "left_anti")
          .groupBy(col(c))
          .agg(count(lit(1)).as("n_rows"))
          .select(lit("relationship").as("rule"), lit(c).as("column_name"),
            col(c).cast("string").as("violating_value"), col("n_rows"))
    }
    parts.reduce(_.unionByName(_))
  }

  /** `dbt build` gate: throw if any rule is violated (first offenders in
    * the message). */
  def enforce(df: DataFrame, rules: Seq[Rule], what: String = "table"): Unit = {
    val bad = apply(df, rules).limit(5).collect()
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"quality checks FAILED for $what: ${bad.mkString("; ")}")
  }
}
