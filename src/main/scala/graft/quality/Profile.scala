package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, StringType, TimestampNTZType, TimestampType}

/** One-pass table profiling — the "what is in this table" summary a
  * pipeline emits before/after every load (row count, per-column null
  * count, distinct cardinality, min/max). The reference reaches the
  * same need through dbt source freshness + schema tests
  * (schema.yml:9-37) and ad-hoc ClickHouse `count()/uniq()` probes;
  * here it is one operator over any DataFrame.
  *
  * Output: one row per profiled column —
  * `(col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
  * max_str)`. Numeric/timestamp/date columns carry min/max on the
  * `_num` pair (timestamps as epoch seconds — a double rides the
  * compare exactly for micro-precision fixtures), strings on the
  * `_str` pair; the other pair is NULL.
  *
  * Scale shape: a single aggregate pass. `n_distinct` is EXACT
  * (`count(DISTINCT c)`) — Catalyst plans multi-distinct via one
  * `Expand` that replicates input rows (#cols + 1)×, the standard
  * exact-profile cost; it is partial-aggregated map-side AFTER the
  * expand, so the shuffle carries group counts, not rows. At 100 TB
  * prefer [[statsApprox]]: HLL `approx_count_distinct` needs no
  * Expand and one map-side sketch per column (spec-tested within
  * rel-error vs exact; not oracle-pinnable — engine-specific sketch).
  */
object Profile {

  private def isNum(df: DataFrame, c: String): Boolean =
    df.schema(c).dataType match {
      case _: NumericType | TimestampType | TimestampNTZType | DateType => true
      case _ => false
    }

  /** Numeric view of a min/max value. NTZ/date go through a session-tz
    * cast (UTC everywhere in this library) — a direct NTZ→double cast
    * is not defined. */
  private def asNum(df: DataFrame, c: String)(v: org.apache.spark.sql.Column) =
    df.schema(c).dataType match {
      case TimestampNTZType | DateType => v.cast(TimestampType).cast("double")
      case _ => v.cast("double")
    }

  private def profiled(df: DataFrame, cols: Seq[String], distinct: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    cols.foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(isNum(df, c) || df.schema(c).dataType == StringType,
        s"unsupported profile type for $c: ${df.schema(c).dataType}")
    }
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"), distinct(c).as(s"__nd_$c")) ++
        (if (isNum(df, c))
          Seq(asNum(df, c)(min(col(c))).as(s"__mn_$c"),
            asNum(df, c)(max(col(c))).as(s"__mx_$c"))
        else
          Seq(min(col(c)).as(s"__mns_$c"), max(col(c)).as(s"__mxs_$c")))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      if (isNum(df, c))
        struct(lit(c).as("col_name"), col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$c")).as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"),
          col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
      else
        struct(lit(c).as("col_name"), col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$c")).as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          col(s"__mns_$c").as("min_str"), col(s"__mxs_$c").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Exact profile (oracle-pinnable): one aggregate pass, exact
    * distinct counts via the multi-distinct Expand plan. */
  def stats(df: DataFrame, cols: Seq[String]): DataFrame =
    profiled(df, cols, c => countDistinct(col(c)))

  /** HLL profile for wide/huge tables: `approx_count_distinct(rsd)`
    * replaces the Expand with one mergeable sketch per column —
    * single narrow shuffle regardless of column count. */
  def statsApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05)
      : DataFrame =
    profiled(df, cols, c => approx_count_distinct(col(c), rsd))
}
