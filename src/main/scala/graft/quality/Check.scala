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
  /** dbt_utils `accepted_range`: every non-NULL `column` value must lie
    * in [min, max] (inclusive; NULL bound = unbounded on that side).
    * NULLs are ignored, matching [[AcceptedValues]] — pair with
    * [[NotNull]] to also forbid them. */
  final case class InRange(column: String, min: Option[Double],
      max: Option[Double]) extends Rule

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
      case r: InRange =>
        df.where(rangeViolation(r))
          .groupBy(col(r.column))
          .agg(count(lit(1)).as("n_rows"))
          .select(lit("in_range").as("rule"),
            lit(r.column).as("column_name"),
            col(r.column).cast("string").as("violating_value"),
            col("n_rows"))
    }
    parts.reduce(_.unionByName(_))
  }

  private def rangeViolation(r: InRange) = {
    val c = col(r.column)
    val below = r.min.map(m => c < lit(m)).getOrElse(lit(false))
    val above = r.max.map(m => c > lit(m)).getOrElse(lit(false))
    c.isNotNull && (below || above)
  }

  /** Row-level routing for ingest-time quarantine: split `df` into
    * (clean, quarantined) on the row-routable rules. [[NotNull]] and
    * [[AcceptedValues]] evaluate per row (map-only); [[Relationship]]
    * flags rows whose non-NULL key is absent from the ref via one left
    * join against the distinct key set (dim-sized refs broadcast under
    * AQE — the same join [[apply]] already shapes). [[Unique]] is NOT
    * row-routable — which copy of a duplicate is "bad" is a dedup
    * policy, not a row predicate; route duplicates through
    * `Upsert.withDedup` / dedup-latest instead — and is rejected here
    * so a misconfigured gate fails loudly.
    *
    * Quarantined rows keep the full input schema plus a `__violations`
    * column naming every failed rule — enough to repair and re-ingest
    * (the reject-log pattern of the dedup drain, applied to quality).
    */
  def route(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "at least one rule required")
    rules.collectFirst { case u: Unique => u }.foreach { u =>
      throw new IllegalArgumentException(
        s"Unique(${u.columns.mkString(",")}) is not row-routable — " +
          "dedup policy decides which duplicate survives (Upsert.withDedup)")
    }
    var cur = df
    val flags = rules.zipWithIndex.map { case (r, i) =>
      val name = s"__viol_$i"
      r match {
        case NotNull(c) =>
          cur = cur.withColumn(name, col(c).isNull)
          name -> s"not_null($c)"
        case AcceptedValues(c, vs) =>
          cur = cur.withColumn(name,
            col(c).isNotNull && !col(c).isin(vs: _*))
          name -> s"accepted_values($c)"
        case Relationship(c, ref, rc) =>
          val hit = s"__ref_hit_$i"
          cur = cur
            .join(ref.select(col(rc).as(c)).distinct()
              .withColumn(hit, lit(true)), Seq(c), "left")
            .withColumn(name, col(c).isNotNull && col(hit).isNull)
            .drop(hit)
          name -> s"relationship($c)"
        case r: InRange =>
          cur = cur.withColumn(name, rangeViolation(r))
          name -> s"in_range(${r.column})"
        case u: Unique => throw new IllegalStateException(u.toString)
      }
    }
    val anyViol = flags.map(f => col(f._1)).reduce(_ || _)
    val labels = concat_ws(",",
      flags.map { case (n, label) => when(col(n), label) }: _*)
    val clean = cur.where(!anyViol).drop(flags.map(_._1): _*)
      .select(df.columns.map(col): _*)
    val dirty = cur.where(anyViol).withColumn("__violations", labels)
      .select((df.columns :+ "__violations").map(col): _*)
    (clean, dirty)
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
