package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Reshaping (pivot/unpivot) and scalar-function-family coverage —
  * engine-surface completeness beyond the reference's own usage.
  */
object ShapeQueries {

  type Q = (SparkSession, String) => DataFrame

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val queries: Map[String, Q] = Map(
    // Wide pivot: per-user event-type counts (explicit value list →
    // deterministic columns, single pass — Spark plans pivot as one
    // aggregate over when() projections, no per-value scans).
    "q_pivot" -> { (s, d) =>
      Tables(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
        .na.fill(0L, eventTypes)
        .orderBy("user_id")
    },

    // Unpivot back to long form (Spark unpivot ≡ SQL UNPIVOT/melt).
    "q_unpivot" -> { (s, d) =>
      val wide = queries("q_pivot")(s, d)
      wide.unpivot(Array(col("user_id")),
          eventTypes.map(col).toArray, "event_type", "cnt")
        .orderBy("user_id", "event_type")
    },

    // String-function family over one deterministic projection.
    "q_fn_strings" -> { (s, d) =>
      Tables(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("upper_name"),
        lower(col("c_mktsegment")).as("lower_seg"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded_key"),
        ltrim(rtrim(concat(lit("  "), col("c_name"), lit("  ")))).as("trimmed"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
        length(col("c_name")).cast("long").as("name_len"),
        reverse(col("c_mktsegment")).as("reversed"),
        split(col("c_name"), "#").getItem(0).as("name_head"))
        .orderBy("c_custkey")
    },

    // Date/time-function family (only semantics-identical pairs:
    // year/month/day, datediff, add_months on mid-month anchors,
    // last_day, quarter).
    "q_fn_dates" -> { (s, d) =>
      Tables(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_epoch_start"),
        add_months(col("o_orderdate"), 1).as("next_month"),
        last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey")
    },

    // Array/higher-order-function family — scalar outputs only (the
    // driver's pandas hasher cannot sort array cells), exact integer/
    // string values. HOF inputs are evaluated once (the per-element
    // re-evaluation trap only bites expressions INSIDE lambda bodies).
    "q_fn_array" -> { (s, d) =>
      val k = col("c_custkey")
      val mods = array(k % 7, k % 5, k % 3)
      val toks = split(col("c_name"), "#")
      Tables(s, d, "customer").select(
        k,
        size(toks).cast("long").as("n_parts"),
        element_at(toks, 1).as("head_part"),
        array_join(transform(sort_array(mods), x => x.cast("string")), "-")
          .as("mods_sorted"),
        array_contains(mods, lit(0L)).as("has_mod0"),
        size(filter(mods, x => x > 2L)).cast("long").as("n_gt2"),
        aggregate(mods, lit(0L), (a, x) => a + x).as("mod_sum"))
        .orderBy("c_custkey")
    },

    // Null-handling family (coalesce/nullif/greatest/least/nvl2-shape).
    "q_fn_null_handling" -> { (s, d) =>
      val deleted = when(col("doc_id") % 10 === 0,
        lit("2024-01-31").cast("timestamp"))
      Tables(s, d, "documents").select(
        col("doc_id"),
        deleted.as("deleted_at"),
        // Sentinel must stay inside pandas datetime64[ns] range (max
        // 2262-04-11): the driver's hasher round-trips through pandas and
        // represents out-of-range values inconsistently per engine.
        coalesce(deleted, lit("2200-01-01").cast("timestamp")).as("deleted_or_max"),
        nullif(col("lang"), lit("en")).as("lang_non_en"),
        when(deleted.isNull, lit("live")).otherwise(lit("deleted")).as("status"),
        greatest(col("n_chars"), lit(100L)).as("chars_floor100"),
        least(col("n_chars"), lit(100L)).as("chars_cap100"))
        .orderBy("doc_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_pivot" ->
      """SELECT user_id,
        |  coalesce("click", 0) AS click, coalesce("error", 0) AS error,
        |  coalesce("purchase", 0) AS purchase, coalesce("signup", 0) AS signup,
        |  coalesce("view", 0) AS view
        |FROM (PIVOT (SELECT user_id, event_type FROM events)
        |      ON event_type USING count(*) GROUP BY user_id)
        |ORDER BY user_id""".stripMargin,
    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT user_id,
        |    coalesce("click",0) AS click, coalesce("error",0) AS error,
        |    coalesce("purchase",0) AS purchase, coalesce("signup",0) AS signup,
        |    coalesce("view",0) AS view
        |  FROM (PIVOT (SELECT user_id, event_type FROM events)
        |        ON event_type USING count(*) GROUP BY user_id))
        |SELECT * FROM wide
        |UNPIVOT (cnt FOR event_type IN (click, error, purchase, signup, view))
        |ORDER BY user_id, event_type""".stripMargin,
    "q_fn_strings" ->
      """SELECT c_custkey,
        |  upper(c_name) AS upper_name,
        |  lower(c_mktsegment) AS lower_seg,
        |  substr(c_name, 1, 8) AS name_prefix,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
        |  ltrim(rtrim('  ' || c_name || '  ')) AS trimmed,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
        |  len(c_name) AS name_len,
        |  reverse(c_mktsegment) AS reversed,
        |  string_split(c_name, '#')[1] AS name_head
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_fn_dates" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS dom, quarter(o_orderdate) AS q,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |    AS days_since_epoch_start,
        |  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fn_array" ->
      """SELECT c_custkey,
        |  len(string_split(c_name, '#')) AS n_parts,
        |  string_split(c_name, '#')[1] AS head_part,
        |  array_to_string(list_sort(
        |    [c_custkey % 7, c_custkey % 5, c_custkey % 3]), '-') AS mods_sorted,
        |  list_contains([c_custkey % 7, c_custkey % 5, c_custkey % 3], 0)
        |    AS has_mod0,
        |  CAST(len(list_filter([c_custkey % 7, c_custkey % 5, c_custkey % 3],
        |    x -> x > 2)) AS BIGINT) AS n_gt2,
        |  CAST(list_sum([c_custkey % 7, c_custkey % 5, c_custkey % 3])
        |    AS BIGINT) AS mod_sum
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_fn_null_handling" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0 THEN TIMESTAMP '2024-01-31' END AS deleted_at,
        |  coalesce(CASE WHEN doc_id % 10 = 0 THEN TIMESTAMP '2024-01-31' END,
        |    TIMESTAMP '2200-01-01') AS deleted_or_max,
        |  nullif(lang, 'en') AS lang_non_en,
        |  CASE WHEN doc_id % 10 = 0 THEN 'deleted' ELSE 'live' END AS status,
        |  greatest(n_chars, 100) AS chars_floor100,
        |  least(n_chars, 100) AS chars_cap100
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
