package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scans, projections, filters, sorts, limits and scalar functions —
  * SURVEY.md §2.1, §2.2, §2.6, §2.8.
  *
  * Every query is a declarative DataFrame plan (Catalyst pushes the
  * filters/projections into the parquet scan — verified via
  * `.explain("formatted")`: `PushedFilters`/`ReadSchema`). Each query
  * ends in a deterministic total order so the driver's row-hash
  * compare is stable.
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S2 — incremental relational scan: predicate on the tracking column
    // pushed down to the source (reference: postgres_loader.py:73-153).
    "q_scan_incremental" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .where(col("l_shipdate") > lit("1998-06-30 00:00:00").cast("timestamp"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // S3/A1 — pre-scan count (reference: postgres_loader.py:84-93).
    "q_count_star" -> { (s, d) =>
      Tables(s, d, "lineitem").agg(count(lit(1)).as("cnt"))
    },

    // S8 — append as UNION ALL (reference: base_loader.py:301-306).
    "q_union_append" -> { (s, d) =>
      val o = Tables(s, d, "orders")
      val before = o.where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val after  = o.where(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      before.unionByName(after).orderBy("o_orderkey")
    },

    // Set ops beyond append (free from Spark; not reference parity —
    // SURVEY §2.7 — but part of a complete engine surface).
    "q_set_intersect" -> { (s, d) =>
      val o = Tables(s, d, "orders").select("o_custkey")
      val early = o.where(col("o_custkey") % 2 === 0)
      Tables(s, d, "customer").select(col("c_custkey").as("o_custkey"))
        .intersect(early)
        .orderBy("o_custkey")
    },
    "q_set_except" -> { (s, d) =>
      val all = Tables(s, d, "orders").select("o_orderkey")
      val shipped = Tables(s, d, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"))
      all.except(shipped).orderBy("o_orderkey")
    },

    // Cross join (bounded — dim × dim only; the planner rejects
    // accidental cartesian products on big inputs unless explicit).
    "q_join_cross" -> { (s, d) =>
      val r = Tables(s, d, "region").select(col("r_regionkey"), col("r_name"))
      val n = Tables(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      r.crossJoin(n).orderBy("r_regionkey", "n_nationkey")
    },

    // Schema-drift union: a later batch gained a column; earlier rows
    // take NULL (unionByName allowMissingColumns ≡ UNION ALL BY NAME).
    "q_union_schema_drift" -> { (s, d) =>
      val o = Tables(s, d, "orders")
      val early = o.where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val late = o.where(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").as("amount"))
      early.unionByName(late, allowMissingColumns = true)
        .orderBy("o_orderkey")
    },

    // Bitwise-function family over exact integers.
    "q_fn_bitwise" -> { (s, d) =>
      val k = col("o_orderkey")
      Tables(s, d, "orders").select(
        k,
        k.bitwiseAND(lit(255L)).as("low_byte"),
        k.bitwiseOR(lit(1L)).as("odd_or"),
        k.bitwiseXOR(col("o_custkey")).as("key_xor"),
        shiftleft(k, 2).as("shl2"),
        shiftright(k, 3).as("shr3"),
        bit_count(k).cast("long").as("popcount"))
        .orderBy("o_orderkey")
    },

    // P1 — rename/reorder staging projection (reference: stg_*.sql).
    "q_project_rename" -> { (s, d) =>
      Tables(s, d, "orders").select(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("customer_id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("amount"),
        col("o_orderdate").as("created_at")
      ).orderBy("order_id")
    },

    // P2 — column-projection pushdown: narrow select prunes the scan.
    "q_project_prune" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P5 — strict `>` watermark (PG path; ties at watermark dropped).
    "q_filter_gt_watermark" -> { (s, d) =>
      Tables(s, d, "events")
        .where(col("ts") > lit("2024-01-20 00:00:00").cast("timestamp"))
        .orderBy("event_id")
    },

    // P6 — inclusive `>=` watermark (Mongo $gte path; boundary re-read).
    "q_filter_gte_watermark" -> { (s, d) =>
      Tables(s, d, "events")
        .where(col("ts") >= lit("2024-01-20 00:00:00").cast("timestamp"))
        .orderBy("event_id")
    },

    // P9 — arbitrary caller-supplied predicate passthrough.
    "q_filter_pred" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .where(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P8 — IS NULL current-row filter, exercised through a left join
    // (orders with no lineitems → joined keys null).
    "q_filter_is_null" -> { (s, d) =>
      val o = Tables(s, d, "orders")
      val li = Tables(s, d, "lineitem").select(col("l_orderkey")).distinct()
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
        .where(col("l_orderkey").isNull)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    },

    // C8 — soft-delete carried, opt-in exclusion view (deleted_at
    // analog derived deterministically from the key).
    "q_filter_soft_delete" -> { (s, d) =>
      Tables(s, d, "documents")
        .withColumn("deleted_at",
          when(col("doc_id") % 10 === 0, lit("2024-01-31").cast("timestamp")))
        .where(col("deleted_at").isNull)
        .select("doc_id", "lang", "source", "n_chars", "deleted_at")
        .orderBy("doc_id")
    },

    // O1 — sort by tracking column ascending (CDC arrival order).
    "q_sort_asc" -> { (s, d) =>
      Tables(s, d, "events").orderBy("ts", "event_id")
    },

    // O5 — top-k = orderBy + limit (Spark plans TakeOrderedAndProject —
    // per-partition heap + driver merge, no global sort at scale).
    "q_topk_limit" -> { (s, d) =>
      Tables(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    },

    // O3 — monthly partition key derivation (reference: PARTITION BY
    // toStartOfMonth(txn_timestamp), init-clickhouse.sql:37).
    "q_partition_month" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .withColumn("ship_month", date_trunc("month", col("l_shipdate")))
        .groupBy("ship_month")
        .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("ship_month")
    },

    // O2-ext — Z-order clustering key (multi-dim layout for min/max
    // data skipping; Layout.zorder's range exchange is result-
    // invisible, so the gate pins the z-VALUE arithmetic — affine
    // 8-bit quantization + bit interleave — against a DuckDB
    // restatement of the identical expression; the file-skipping win
    // itself is LayoutSpec's evidence).
    "q_layout_zorder" -> { (s, d) =>
      Layout.zvalue(Tables(s, d, "lineitem"),
          Seq("l_partkey", "l_suppkey"), bits = 8, as = "z")
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"), col("z"))
        .orderBy("z", "l_orderkey", "l_linenumber")
    },

    // O2-ext — mixture-preserving shard layout: docs ranked per domain
    // by the md5 draw and dealt round-robin, so every shard (and any
    // prefix of shards) carries the global domain mixture ±1 doc; the
    // oracle restates rank-mod-N via a per-domain row_number (a window
    // DuckDB can afford at oracle scale; the operator itself uses the
    // bucketed two-pass prefix, never a per-domain window).
    "q_layout_shards" -> { (s, d) =>
      Layout.mixtureShards(
          Tables(s, d, "documents").select("doc_id", "source"),
          "doc_id", "source", nShards = 8, seed = "sh")
        .orderBy("doc_id")
    },

    // F1 — concat full-name (reference: dim_users.sql:8).
    "q_fn_concat" -> { (s, d) =>
      Tables(s, d, "customer")
        .select(col("c_custkey"),
          concat(col("c_name"), lit(" "), col("c_mktsegment")).as("full_name"))
        .orderBy("c_custkey")
    },

    // F2 — UTC → Africa/Lagos display timezone (fixed +01:00, no DST).
    "q_fn_timezone" -> { (s, d) =>
      Tables(s, d, "events")
        .select(col("event_id"),
          from_utc_timestamp(col("ts"), "Africa/Lagos").as("ts_lagos"))
        .orderBy("event_id")
    },

    // F3 — derived snapshot-date column (fixed literal for determinism;
    // production path takes `asOf` as a parameter — SURVEY §7.4).
    "q_fn_current_date" -> { (s, d) =>
      Tables(s, d, "customer")
        .select(col("c_custkey"), lit("2026-02-20").cast("date").as("snapshot_date"))
        .orderBy("c_custkey")
    },

    // F5 — strftime-style formatting "%Y-%m-%d %H:%M:%S".
    "q_fn_date_format" -> { (s, d) =>
      Tables(s, d, "events")
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          date_format(col("ts"), "yyyy-MM-dd").as("date_str"))
        .orderBy("event_id")
    },

    // F6 — regex match (the date-detection pattern from schema
    // inference, base_loader.py:818-822).
    "q_fn_regexp_like" -> { (s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"),
          col("text").rlike("^the ").as("starts_the"),
          regexp_extract(col("text"), "^(\\w+)", 1).as("first_word"))
        .orderBy("doc_id")
    },

    // F8 — CASE WHEN (simulator status rewrite, simulate_cdc.py:43;
    // deterministic predicate instead of random()).
    "q_fn_case_when" -> { (s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 250000, lit("large"))
            .when(col("o_totalprice") > 100000, lit("medium"))
            .otherwise(lit("small")).as("size_band"))
        .orderBy("o_orderkey")
    },

    // F9 — JSON extraction from events.props.
    "q_fn_json_extract" -> { (s, d) =>
      Tables(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
        .orderBy("event_id")
    },

    // F11 — arithmetic + round (simulator amount*rate math). Per-row
    // IEEE products are bit-identical across engines so the raw product
    // needs no rounding; the rounded column uses /7 (never lands on a
    // .xx5 boundary → round() is engine-agnostic — see tools/check.py).
    "q_fn_arith_round" -> { (s, d) =>
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
          round(col("l_quantity") / 7.0, 2).as("qty_sevenths"))
        .orderBy("l_orderkey", "l_linenumber")
    }
  )

  /** `q_layout_zorder`: the z-value arithmetic restated in SQL —
    * identical affine quantization (subtract-times-divide in the same
    * double-op order; IEEE ops are engine-identical on exact integer
    * inputs) and the identical flat OR of single-bit terms, generated
    * by the same `(i, j) → bit i·d + j` loop as
    * [[Layout.zvalue]]'s expression tree. */
  private val ZorderOracleSql: String = {
    val bits = 8
    val terms = (for {
      i <- 0 until bits
      j <- 0 until 2
    } yield s"((((q$j >> $i) & 1)) << ${i * 2 + j})").mkString(" | ")
    s"""WITH s AS (
       |  SELECT min(l_partkey) AS mn0, max(l_partkey) AS mx0,
       |         min(l_suppkey) AS mn1, max(l_suppkey) AS mx1
       |  FROM lineitem),
       |q AS (
       |  SELECT l_orderkey, l_linenumber,
       |    CASE WHEN l_partkey IS NULL OR mx0 <= mn0 THEN 0
       |      ELSE CAST(floor((CAST(l_partkey AS DOUBLE) - mn0) * 255.0
       |        / (CAST(mx0 AS DOUBLE) - mn0)) AS BIGINT) END AS q0,
       |    CASE WHEN l_suppkey IS NULL OR mx1 <= mn1 THEN 0
       |      ELSE CAST(floor((CAST(l_suppkey AS DOUBLE) - mn1) * 255.0
       |        / (CAST(mx1 AS DOUBLE) - mn1)) AS BIGINT) END AS q1
       |  FROM lineitem, s)
       |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       |  ($terms) AS z
       |FROM q ORDER BY z, l_orderkey, l_linenumber""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    "q_union_schema_drift" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_custkey FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, o_custkey, o_totalprice AS amount FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01')
        |ORDER BY o_orderkey""".stripMargin,
    "q_fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS low_byte,
        |  o_orderkey | 1 AS odd_or,
        |  xor(o_orderkey, o_custkey) AS key_xor,
        |  o_orderkey << 2 AS shl2,
        |  o_orderkey >> 3 AS shr3,
        |  CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_scan_incremental" ->
      """SELECT * FROM lineitem
        |WHERE l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_count_star" -> "SELECT count(*) AS cnt FROM lineitem",
    "q_union_append" ->
      """SELECT * FROM (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |) ORDER BY o_orderkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_custkey AS o_custkey FROM customer
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_custkey % 2 = 0
        |ORDER BY o_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT o_orderkey FROM orders
        |EXCEPT
        |SELECT l_orderkey AS o_orderkey FROM lineitem
        |ORDER BY o_orderkey""".stripMargin,
    "q_project_rename" ->
      """SELECT o_orderkey AS order_id, o_custkey AS customer_id,
        |  o_orderstatus AS status, o_totalprice AS amount,
        |  o_orderdate AS created_at
        |FROM orders ORDER BY order_id""".stripMargin,
    "q_project_prune" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_gt_watermark" ->
      """SELECT * FROM events
        |WHERE ts > TIMESTAMP '2024-01-20 00:00:00' ORDER BY event_id""".stripMargin,
    "q_filter_gte_watermark" ->
      """SELECT * FROM events
        |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' ORDER BY event_id""".stripMargin,
    "q_filter_pred" ->
      """SELECT * FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_is_null" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
        |  ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_orderkey IS NULL ORDER BY o_orderkey""".stripMargin,
    "q_filter_soft_delete" ->
      """SELECT doc_id, lang, source, n_chars,
        |  CASE WHEN doc_id % 10 = 0 THEN TIMESTAMP '2024-01-31' END AS deleted_at
        |FROM documents WHERE doc_id % 10 <> 0 ORDER BY doc_id""".stripMargin,
    "q_sort_asc" -> "SELECT * FROM events ORDER BY ts, event_id",
    "q_topk_limit" ->
      "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25",
    "q_partition_month" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
        |  count(*) AS cnt, round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem GROUP BY 1 ORDER BY ship_month""".stripMargin,
    "q_layout_zorder" -> ZorderOracleSql,
    "q_layout_shards" ->
      """SELECT doc_id, source AS domain,
        |  CAST((row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':sh') DESC,
        |        doc_id DESC) - 1) % 8 AS BIGINT) AS shard
        |FROM documents WHERE source IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "q_fn_concat" ->
      """SELECT c_custkey, c_name || ' ' || c_mktsegment AS full_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_fn_timezone" ->
      """SELECT event_id, ts + INTERVAL 1 HOUR AS ts_lagos
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fn_current_date" ->
      """SELECT c_custkey, DATE '2026-02-20' AS snapshot_date
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_fn_date_format" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  strftime(ts, '%Y-%m-%d') AS date_str
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fn_regexp_like" ->
      """SELECT doc_id, regexp_matches(text, '^the ') AS starts_the,
        |  coalesce(regexp_extract(text, '^(\w+)', 1), '') AS first_word
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_fn_case_when" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 250000 THEN 'large'
        |       WHEN o_totalprice > 100000 THEN 'medium'
        |       ELSE 'small' END AS size_band
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fn_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fn_arith_round" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS net_price,
        |  round(l_quantity / 7.0, 2) AS qty_sevenths
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
