package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AggQueries, CdcQueries, CoreQueries, ExtQueries, FeatureQueries, SamplingQueries, SchemaQueries, ShapeQueries, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every declared operator key from SURVEY.md §2;
  * `oracleSql` carries the DuckDB-equivalent SQL for each SQL-expressible
  * key (column names aliased identically on both sides; every query ends
  * in a deterministic total order).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The fact ⟕ dim enrichment join + staging projection + aggregate —
    * the `fact_savings_transaction` analog (SURVEY §7.2 step 1). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables(spark, d, "lineitem")
    val o = Tables(spark, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    li.join(o, li("l_orderkey") === o("o_orderkey"), "left")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** One entry per implemented operator from SURVEY.md §2 — RAW
    * operator definitions only. This is the map [[Bench]] times: no
    * entry may embed a brute-force truth baseline or other
    * verification-only work (that lives in [[gateQueries]]), so the
    * bench measures the operators a user would actually run. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ AggQueries.queries ++ CdcQueries.queries ++
      SchemaQueries.queries ++ ExtQueries.queries ++ StreamQueries.queries ++
      ShapeQueries.queries ++ SamplingQueries.queries ++
      FeatureQueries.queries

  /** Verify-only quality gates (approx-sketch ε-gates, near-dup
    * recall/subset gates, ANN optimality/recall gates). Same-named keys
    * OVERRIDE the raw operator in [[verifyQueries]]; gate-only keys
    * (the `_recall` pair) exist nowhere else. Deliberately excluded
    * from [[queries]]: each embeds an O(n²)-on-the-fixture truth
    * baseline that would distort the bench and contradict the
    * no-quadratic-stage design if declared as an operator. */
  def gateQueries: Map[String, (SparkSession, String) => DataFrame] =
    AggQueries.gateQueries ++ ExtQueries.gateQueries ++
      StreamQueries.gateQueries ++ CdcQueries.gateQueries

  /** The driver-checked correctness surface: every raw operator key,
    * with gate variants overriding where one exists. [[Verify]] dumps
    * THIS map, so the oracle rows the driver compares are unchanged by
    * the bench/gate split. */
  def verifyQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries ++ gateQueries

  /** For each key in [[verifyQueries]], equivalent ANSI SQL runnable by
    * DuckDB on the same parquet tables. Omitted keys → driver rows-only
    * check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ AggQueries.oracle ++ CdcQueries.oracle ++
      SchemaQueries.oracle ++ ExtQueries.oracle ++ StreamQueries.oracle ++
      ShapeQueries.oracle ++ SamplingQueries.oracle ++
      FeatureQueries.oracle
}
