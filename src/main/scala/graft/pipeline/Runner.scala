package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.cdc.{Scd2, TableStore, Upsert, Watermark}

/** The reference's end-to-end DAG (SURVEY §3) restated on the testdata
  * star schema: raw CDC upsert → staging projections → SCD2 snapshot →
  * dimensional marts. Each materialization lands in a [[TableStore]];
  * run order mirrors the dbt lineage (extract → snapshot → dims →
  * fact). Reruns are idempotent (delete+insert upsert + SCD2 check).
  */
object Staging {

  /** stg analog of stg_savings_plan.sql:9-19 — rename + display TZ. */
  def stgOrders(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("customer_id"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").as("amount"),
      from_utc_timestamp(col("o_orderdate"), "Africa/Lagos").as("created_at_lagos"),
      col("o_orderdate").as("created_at"))

  /** stg analog of stg_savings_transaction.sql:11-21. */
  def stgLineitem(lineitem: DataFrame): DataFrame =
    lineitem.select(
      col("l_orderkey").as("order_id"),
      col("l_linenumber").as("line_no"),
      col("l_quantity").as("quantity"),
      col("l_extendedprice").as("amount"),
      col("l_discount").as("discount"),
      col("l_shipdate").as("ship_ts"))
}

object Marts {

  /** dim_users analog (dim_users.sql:8-15): SCD2 current rows +
    * derived full_name. */
  def dimCustomer(snapshot: DataFrame): DataFrame =
    Scd2.currentRows(snapshot).select(
      col("c_custkey").as("customer_id"),
      concat(col("c_name"), lit(" "), col("c_mktsegment")).as("full_name"),
      col("c_mktsegment").as("segment"),
      col(Scd2.ValidFrom).as("member_since"))

  /** fact analog (fact_savings_transaction.sql:21-23): fact ⟕ dim with
    * a month partition key for pruned storage (O3). */
  def factLineitem(stgLi: DataFrame, stgOrders: DataFrame): DataFrame =
    stgLi.join(stgOrders.select("order_id", "customer_id", "status"),
        Seq("order_id"), "left")
      .withColumn("ship_month", date_trunc("month", col("ship_ts")))

  /** [[factLineitem]] over [[graft.cdc.ConsistentRead.pin]]'d inputs —
    * the mart refresh that cannot join different-age snapshots. The
    * reference's actual failure mode (§3.2: tables extract on
    * independent cadences, `all_schedules.py:12-52`, and the marts
    * join whatever age each staging table happens to be): a line item
    * whose order row hasn't loaded yet lands as an orphan fact row
    * (NULL customer). Pinning both inputs to the max COMMON value of
    * their LOAD-CURSOR columns holds such rows back until the next
    * refresh — the fact table is always the join as the SOURCE stood
    * at one instant.
    *
    * The no-orphans guarantee needs the cursors to be CAUSAL: a child
    * row's cursor is never older than the parent row it references —
    * true of the reference's incremental cursors (an `updated_at`
    * stamped by the source database: the transaction that inserts a
    * child sees its parent already committed), and of any
    * log-position cursor; NOT generally true of business event-time
    * columns (the StreamSpec scenario builds a causal cursor
    * explicitly). Without causality the pin still guarantees the
    * weaker snapshot property: both sides exactly as of the common
    * instant. Cost at 100 TB: two column-pruned max() scans + a
    * broadcast 1-row frame (or zero scans via pinTo when watermarks
    * are tracked — C7). */
  def factLineitemPinned(stgLi: DataFrame, stgOrders: DataFrame,
      liTrack: String = "ship_ts", ordTrack: String = "created_at")
      : DataFrame = {
    val pinned = graft.cdc.ConsistentRead.pin(
      Seq(stgLi -> liTrack, stgOrders -> ordTrack))
    factLineitem(pinned(0), pinned(1))
  }
}

object Runner {

  final case class Result(rawEvents: Long, dimCustomers: Long, factRows: Long)

  /** One full pipeline run against `sfDir`, materializing into
    * TableStores under `workRoot`. `asOf` parameterizes the SCD2
    * snapshot time (determinism — SURVEY §7.4). Row-count metrics ride
    * the write pass via `Observation` (CollectMetrics) — no re-scan of
    * the landed tables just to count them. `pinMarts = true` builds
    * the fact mart through [[Marts.factLineitemPinned]], refusing to
    * join different-age staging snapshots (the StreamSpec scenario
    * test shows the staggered-load orphan rows it prevents). */
  def runAll(spark: SparkSession, sfDir: String, workRoot: String,
      asOf: java.sql.Timestamp, pinMarts: Boolean = false): Result = {
    val rawObs = new org.apache.spark.sql.Observation()
    val dimObs = new org.apache.spark.sql.Observation()
    val factObs = new org.apache.spark.sql.Observation()
    // 1. raw extract+load: incremental upsert of events on watermark
    //    (C1+C7: the destination is the checkpoint). The dest is stored
    //    BUCKETED on the merge key: every repeated merge then reads the
    //    big side pre-partitioned — no dest shuffle even when the
    //    incoming batch is too large to broadcast (BucketingSpec, O2).
    val rawStore = new TableStore(spark, s"$workRoot/raw_events",
      bucketBy = Some((8, Seq("event_id"))))
    val events = Tables(spark, sfDir, "events")
    val incoming = Watermark.lastLoaded(rawStore.read(), "ts") match {
      case Some(wm) => Watermark.strictAfter(events, "ts", wm)
      case None => events
    }
    rawStore.write(Upsert(rawStore.read().getOrElse(events.limit(0)),
      incoming, Seq("event_id")).observe(rawObs, count(lit(1)).as("n")))

    // 2. SCD2 snapshot of the customer dimension (C6).
    val snapStore = new TableStore(spark, s"$workRoot/customer_snapshot")
    val staged = Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_mktsegment")
    val snapshot = snapStore.read() match {
      case Some(cur) => Scd2(cur, staged, Seq("c_custkey"),
        Seq("c_mktsegment"), asOf)
      case None => Scd2.init(staged, asOf)
    }
    snapStore.write(snapshot)

    // 3. staging + marts (dbt model layer), fact partitioned by month.
    val dim = Marts.dimCustomer(snapStore.read().get)
    // dbt-build gate (schema.yml unique/not_null on the dim key): a
    // violated rule aborts the run before the mart lands.
    graft.quality.Check.enforce(dim, Seq(
      graft.quality.Check.Unique(Seq("customer_id")),
      graft.quality.Check.NotNull("customer_id")), "dim_customer")
    val dimStore = new TableStore(spark, s"$workRoot/dim_customer")
    dimStore.write(dim.observe(dimObs, count(lit(1)).as("n")))

    val stgLi = Staging.stgLineitem(Tables(spark, sfDir, "lineitem"))
    val stgOrd = Staging.stgOrders(Tables(spark, sfDir, "orders"))
    val fact =
      if (pinMarts) Marts.factLineitemPinned(stgLi, stgOrd)
      else Marts.factLineitem(stgLi, stgOrd)
    val factStore = new TableStore(spark, s"$workRoot/fact_lineitem",
      partitionByCols = Seq("ship_month"),
      clusterByCols = Seq("order_id", "ship_ts")) // O2: MergeTree ORDER BY analog
    factStore.write(fact.observe(factObs, count(lit(1)).as("n")))

    Result(
      rawEvents = rawObs.get("n").asInstanceOf[Long],
      dimCustomers = dimObs.get("n").asInstanceOf[Long],
      factRows = factObs.get("n").asInstanceOf[Long])
  }
}
