package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.Tables
import graft.cdc.{DedupLatest, Scd2, Upsert}

/** C1–C6 CDC load-mode kernels as declared queries — SURVEY.md §2.9.
  *
  * Each query derives a deterministic (dest, incoming) pair from the
  * testdata, runs the actual `graft.cdc` kernel, and is checked against
  * a DuckDB oracle that restates the semantics in plain SQL CTEs. The
  * file/TableStore behavior of the same kernels is covered by ScalaTest.
  */
object CdcQueries {

  type Q = (SparkSession, String) => DataFrame

  private val asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")

  /** One per-JVM scratch root for the COW-store keys, deleted on exit —
    * a fresh `createTempDirectory` per invocation leaked a parquet copy
    * of the fixture per bench run (runs × rounds of /tmp growth).
    * Invocations still get DISJOINT subdirs (a reused store root would
    * accrete versions across bench repetitions and measure manifest
    * history, not the merge). */
  private lazy val cowScratch: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_cow_keys")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        val children = f.listFiles()
        if (children != null) children.foreach(del)
        f.delete(): Unit
      }
      del(p.toFile)
    }))
    p
  }
  private val cowSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private def freshCowRoot(tag: String): String =
    cowScratch.resolve(s"$tag-${cowSeq.incrementAndGet()}").toString

  /** Incoming batch for the upsert queries: later orders, mutated. */
  private def ordersIncoming(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "orders")
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)

  val queries: Map[String, Q] = Map(
    // C1 — delete+insert upsert (base_loader.py:275-338).
    "q_cdc_upsert" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      Upsert(dest, ordersIncoming(s, d), Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // C1 at the 100 TB write path — the SAME delete+insert semantics
    // through cdc.CowStore's bucket-pruned copy-on-write merge: full
    // load, then one incremental batch that rewrites ONLY the buckets
    // containing its keys while every other bucket is inherited by
    // manifest reference (zero bytes rewritten — CowStoreSpec pins
    // the file-path identity; ScaleBench's cow_upsert leg measures
    // write volume ∝ batch, not ∝ dest). Shares q_cdc_upsert's oracle
    // VERBATIM: bucketing is an execution layout, never a semantics
    // change.
    "q_cdc_upsert_bucketed" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val root = freshCowRoot("upsert")
      val store = new graft.cdc.CowStore(s, root, Seq("o_orderkey"),
        nBuckets = 16)
      store.writeFull(dest)
      store.upsert(ordersIncoming(s, d).select(
        dest.columns.map(col).toSeq: _*))
      store.read().get
        .select(dest.columns.map(col).toSeq: _*)
        .orderBy("o_orderkey")
    },

    // C2 through the COW path: keep-latest merge where the incoming
    // batch carries TWO versions of every key (U at the base date, V
    // one day later) against a maintained (unique-key) destination —
    // the bucket-local DedupLatest must pick the later V row per key,
    // which the oracle restates closed-form (a broken argmax keeps U
    // and goes red on status/price/date all at once). Destination
    // uniqueness is orders' own key contract, so the bucket-local
    // dedup equals the global one (the withDedupMaintained argument,
    // CowStoreSpec-pinned).
    "q_cdc_upsert_bucketed_dedup" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val inc0 = ordersIncoming(s, d).select(
        dest.columns.map(col).toSeq: _*)
      val incoming = inc0.unionByName(inc0
        .withColumn("o_orderstatus", lit("V"))
        .withColumn("o_totalprice", col("o_totalprice") - 500.0)
        .withColumn("o_orderdate",
          col("o_orderdate") + expr("INTERVAL 1 DAY")))
      val root = freshCowRoot("upsert_dedup")
      val store = new graft.cdc.CowStore(s, root, Seq("o_orderkey"),
        nBuckets = 16)
      store.writeFull(dest)
      store.upsert(incoming, dedup = Some(("o_orderdate", Nil)))
      store.read().get
        .select(dest.columns.map(col).toSeq: _*)
        .orderBy("o_orderkey")
    },

    // COW maintenance end-to-end (VERDICT r17 ask #1): the incoming
    // batch lands as FOUR disjoint-key sub-batches (orders keys are
    // unique, so sequential sub-batch upserts ≡ the single upsert —
    // the fragmentation is pure layout), then compact(2) rewrites the
    // fragmented tail into one version (the bytes-dominant full-load
    // version survives by inheritance) and vacuum retires the rest.
    // Shares q_cdc_upsert's oracle VERBATIM: compaction, like
    // bucketing, must be invisible to semantics.
    "q_cdc_upsert_compacted" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val root = freshCowRoot("compact")
      val store = new graft.cdc.CowStore(s, root, Seq("o_orderkey"),
        nBuckets = 16)
      store.writeFull(dest)
      val inc = ordersIncoming(s, d).select(
        dest.columns.map(col).toSeq: _*)
      (0 until 4).foreach { i =>
        store.upsert(inc.where(pmod(col("o_orderkey"), lit(4)) === i))
      }
      store.compact(maxReferenced = 2)
      store.vacuum()
      store.read().get
        .select(dest.columns.map(col).toSeq: _*)
        .orderBy("o_orderkey")
    },

    // Schema-drift upsert (VERDICT r17 ask #3 — the reference's
    // tolerance, base_loader.py:290-299): the batch DROPS a stored
    // column (o_orderpriority → null-filled) and CARRIES an unknown
    // one (o_junk → skipped). Same delete+insert merge, through the
    // same Normalize.alignToSchema the COW path uses; the oracle
    // restates the null-fill explicitly.
    "q_cdc_upsert_drift" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val incoming = ordersIncoming(s, d)
        .drop("o_orderpriority")
        .withColumn("o_junk", lit("ignore-me"))
      Upsert(dest, incoming, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // Additive schema EVOLUTION through the COW merge (the Delta
    // mergeSchema contract, rebuilt on the _SCHEMA-per-version log):
    // the batch carries a column the table has never seen
    // (o_channel); evolve=true widens the authoritative schema and
    // publishes it with the new version — old files are NEVER
    // rewritten, readers null-fill from the explicit schema, and
    // time travel to v1 still returns the original shape
    // (CowStoreSpec). Oracle: surviving dest rows read o_channel
    // NULL, batch rows carry it.
    "q_cdc_upsert_evolve" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val root = freshCowRoot("evolve")
      val store = new graft.cdc.CowStore(s, root, Seq("o_orderkey"),
        nBuckets = 16)
      store.writeFull(dest)
      store.upsert(ordersIncoming(s, d).withColumn("o_channel",
        lit("web")), evolve = true)
      store.read().get.orderBy("o_orderkey")
    },

    // Hard delete by key through the COW path — the DML leg the
    // reference's loader never needs (its extract filters to live
    // rows) but every log-based CDC feed carries. Bucket-pruned like
    // the merge; the probe deliberately includes keys the table never
    // held (no-ops) and deletes that empty whole buckets. Oracle is
    // the surviving-set restatement.
    "q_cdc_delete" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val root = freshCowRoot("delete")
      val store = new graft.cdc.CowStore(s, root, Seq("o_orderkey"),
        nBuckets = 16)
      store.writeFull(dest)
      val probe = dest.where(col("o_orderkey") % 9 === 4)
        .select("o_orderkey")
        .unionByName(dest.select((col("o_orderkey") + 100000000L)
          .as("o_orderkey")).limit(100)) // absent keys: must no-op
      store.delete(probe)
      store.read().get
        .select(dest.columns.map(col).toSeq: _*)
        .orderBy("o_orderkey")
    },

    // C1 through the MERGE-ON-READ upsert path (the update-side twin
    // of the deletion vectors — Iceberg/Hudi MoR semantics on this
    // layout): the batch commits as a delta-insert file (bytes ∝
    // batch, manifest unchanged) and the read resolves each key to
    // its newest version. The final read goes THROUGH the live delta
    // register — the MoR winner rule is what the oracle certifies;
    // fold/compact invisibility is CowStoreSpec-pinned. Shares
    // q_cdc_upsert's oracle VERBATIM: merge-on-read is an execution
    // layout, never a semantics change. ScaleBench's upd legs measure
    // the write-amplification gap.
    "q_cdc_upsert_mor" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val root = freshCowRoot("upsert_mor")
      val store = new graft.cdc.CowStore(s, root, Seq("o_orderkey"),
        nBuckets = 16)
      store.writeFull(dest)
      store.upsert(ordersIncoming(s, d).select(
        dest.columns.map(col).toSeq: _*), mor = true)
      store.read().get
        .select(dest.columns.map(col).toSeq: _*)
        .orderBy("o_orderkey")
    },

    // The same delete through the MERGE-ON-READ path (Delta deletion
    // vectors / Iceberg MoR on this layout): the commit writes only
    // key tombstones (bytes ∝ probe, never ∝ bucket — the write-
    // amplification fix for erasure/TTL streams; ScaleBench's del_mor
    // leg measures it) and every read anti-joins them away. The final
    // read here goes THROUGH live tombstones — the MoR read path is
    // what the oracle certifies; the compact() fold's result-
    // invisibility and vacuum interplay are CowStoreSpec-pinned.
    // Shares q_cdc_delete's oracle VERBATIM — merge-on-read is an
    // execution layout, never a semantics change.
    "q_cdc_delete_mor" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val root = freshCowRoot("delete_mor")
      val store = new graft.cdc.CowStore(s, root, Seq("o_orderkey"),
        nBuckets = 16)
      store.writeFull(dest)
      val probe = dest.where(col("o_orderkey") % 9 === 4)
        .select("o_orderkey")
        .unionByName(dest.select((col("o_orderkey") + 100000000L)
          .as("o_orderkey")).limit(100)) // absent keys: must no-op
      store.delete(probe, mor = true)
      store.read().get
        .select(dest.columns.map(col).toSeq: _*)
        .orderBy("o_orderkey")
    },

    // I/U/D op-apply (Upsert.applyOps — the Debezium/DMS-shaped batch
    // the delete+insert merge generalizes to): every batch key is
    // deleted, non-delete rows re-inserted. The U slice mutates
    // status/price; the D slice is key-disjoint from it (earlier
    // orders), so each event kind's effect is separately visible. The
    // oracle restates delete-all-keys + insert-non-deletes.
    "q_cdc_apply_ops" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val batch = ordersIncoming(s, d).withColumn("op", lit("U"))
        .unionByName(dest
          .where(col("o_orderkey") % 9 === 4 &&
            col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .withColumn("op", lit("D")))
      graft.cdc.Upsert.applyOps(dest, batch, Seq("o_orderkey"), "op")
        .orderBy("o_orderkey")
    },

    // Change data feed over the COW layout (CowStore.readChanges):
    // data files are immutable, so only buckets whose manifest OWNER
    // changed can differ — the diff reads exactly those buckets at
    // both versions and never scans the inherited rest. The fixture
    // drives all three change kinds through ONE applyCdc batch
    // (U-updates on the overlap, U-inserts past the dest horizon,
    // D-deletes on early keys); the oracle diffs the FULL before/after
    // tables — matching it proves bucket-pruning lost nothing.
    "q_cdc_changes" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val batch = ordersIncoming(s, d).withColumn("op", lit("U"))
        .unionByName(dest
          .where(col("o_orderkey") % 9 === 4 &&
            col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .withColumn("op", lit("D")))
      val root = freshCowRoot("changes")
      val store = new graft.cdc.CowStore(s, root, Seq("o_orderkey"),
        nBuckets = 16)
      store.writeFull(dest)
      val v1 = store.versions().last
      store.applyCdc(batch, "op")
      store.readChangesSince(v1).get.orderBy("o_orderkey")
    },

    // Incremental mart maintenance over the change feed
    // (cdc.IncrementalMart): the reference rebuilds marts in full 5
    // minutes after every extract (all_schedules.py:40-52); here the
    // mart — a filtered/projected/derived row-wise view — is patched
    // from readChangeRows instead, through ONE applyCdc batch whose
    // cost ∝ churn. The fixture exercises the corruption case a naive
    // upsert-only refresh gets wrong: odd-key updates flip to status
    // 'U', which the mart's isin('O','F') filter no longer emits —
    // those rows must be DELETED from the mart, not left stale. The
    // oracle restates transform(final source) — incremental must equal
    // the rebuild.
    "q_cdc_mart_incremental" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val batch = ordersIncoming(s, d)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 2 === 0, lit("F")).otherwise(lit("U")))
        .withColumn("op", lit("U"))
        .unionByName(dest
          .where(col("o_orderkey") % 9 === 4 &&
            col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .withColumn("op", lit("D")))
      def martOf(df: org.apache.spark.sql.DataFrame) =
        df.where(col("o_orderstatus").isin("O", "F"))
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderstatus"),
            (col("o_totalprice") * 2).as("double_price"),
            col("o_orderdate"))
      val source = new graft.cdc.CowStore(s, freshCowRoot("mart_src"),
        Seq("o_orderkey"), nBuckets = 16)
      val mart = new graft.cdc.CowStore(s, freshCowRoot("mart_dst"),
        Seq("o_orderkey"), nBuckets = 16)
      source.writeFull(dest)
      val cursor = graft.cdc.IncrementalMart.build(source, martOf, mart).get
      source.applyCdc(batch, "op")
      graft.cdc.IncrementalMart.refresh(source, cursor, martOf, mart,
        Seq("o_orderkey"))
      mart.read().get.orderBy("o_orderkey")
    },

    // Dim-aware incremental mart (IncrementalMart.refreshWithDims —
    // VERDICT r18 "what's missing" #2): the mart broadcast-enriches
    // orders against a customer dim that CHANGES between drains (the
    // reference's own mart joins the SCD2 dim_users). The registered
    // dim feed maps changed dim keys to affected fact keys through a
    // MAINTAINED FkIndex (VERDICT r19 ask #1 — the r19 form of this
    // query joined the changed dim keys to a FULL fact scan per dim
    // wave; the index's reverse store answers the same mapping with a
    // bucket-pruned readForKeys, and its own maintenance rides the
    // same change feed the mart drains). The refresh re-derives
    // exactly the source churn PLUS those fact rows — the rows a
    // dim-blind refresh leaves stale. The fixture's dim change (%4
    // custkeys → PROMO) hits many facts the fact-churn window never
    // touches, so stale enrichment diverges from the oracle, which
    // restates transform(final source, final dim) — incremental must
    // equal the rebuild, and the mapping is result-invisible (same
    // oracle as the r19 full-scan form, verbatim).
    "q_cdc_mart_dim_change" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val dim = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val source = new graft.cdc.CowStore(s, freshCowRoot("dmart_src"),
        Seq("o_orderkey"), nBuckets = 16)
      val dimStore = new graft.cdc.CowStore(s, freshCowRoot("dmart_dim"),
        Seq("c_custkey"), nBuckets = 16)
      val mart = new graft.cdc.CowStore(s, freshCowRoot("dmart_dst"),
        Seq("o_orderkey"), nBuckets = 16)
      source.writeFull(dest)
      dimStore.writeFull(dim)
      def martOf(df: org.apache.spark.sql.DataFrame) = {
        val dc = broadcast(dimStore.read().get)
        df.join(dc, df("o_custkey") === dc("c_custkey"), "left")
          .select(df("o_orderkey"), df("o_custkey"),
            dc("c_mktsegment").as("cust_segment"),
            df("o_totalprice"), df("o_orderstatus"))
      }
      val index = new graft.cdc.FkIndex(
        new graft.cdc.CowStore(s, freshCowRoot("dmart_rev"),
          Seq("c_custkey"), nBuckets = 16),
        new graft.cdc.CowStore(s, freshCowRoot("dmart_fwd"),
          Seq("o_orderkey"), nBuckets = 16),
        factKeys = Seq("o_orderkey"), fkCols = Seq("c_custkey"),
        factFkCols = Seq("o_custkey"))
      val idxCursor = index.build(source).get
      val dims = Seq(graft.cdc.FkIndex.dim(dimStore, index))
      val cursor = graft.cdc.IncrementalMart
        .buildWithDims(source, martOf, mart, dims).get
      // fact churn: updates past the horizon + deletes on early keys
      val batch = ordersIncoming(s, d).withColumn("op", lit("U"))
        .unionByName(dest
          .where(col("o_orderkey") % 9 === 4 &&
            col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .withColumn("op", lit("D")))
      source.applyCdc(batch, "op")
      // the index drains the SAME fact feed before the mart refresh
      index.refresh(source, idxCursor)
      // dim churn: every %4==1 customer moves to PROMO — most of the
      // affected orders saw NO fact churn
      dimStore.upsert(dim.where(col("c_custkey") % 4 === 1)
        .withColumn("c_mktsegment", lit("PROMO")))
      graft.cdc.IncrementalMart.refreshWithDims(source, cursor, martOf,
        mart, Seq("o_orderkey"), dims)
      mart.read().get.orderBy("o_orderkey")
    },

    // Maintained FK index (cdc.FkIndex — VERDICT r19 ask #1): the
    // dim-churn → fact-key mapping as a first-class maintained
    // operator. The churn wave deliberately includes an FK
    // REASSIGNMENT slice (early %31==5 orders move to the next
    // custkey) — the one event kind a reverse-only index gets wrong
    // (the change feed carries post-images, so the stale (oldFk, key)
    // pair would survive; the forward map resolves it exactly). The
    // oracle restates the truth the index must answer: fact keys of
    // the FINAL table whose fk is in the probe — a stale pair or a
    // missed reassignment diverges.
    "q_cdc_fk_index" -> { (s, d) =>
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val source = new graft.cdc.CowStore(s, freshCowRoot("fkidx_src"),
        Seq("o_orderkey"), nBuckets = 16)
      source.writeFull(dest)
      val index = new graft.cdc.FkIndex(
        new graft.cdc.CowStore(s, freshCowRoot("fkidx_rev"),
          Seq("c_custkey"), nBuckets = 16),
        new graft.cdc.CowStore(s, freshCowRoot("fkidx_fwd"),
          Seq("o_orderkey"), nBuckets = 16),
        factKeys = Seq("o_orderkey"), fkCols = Seq("c_custkey"),
        factFkCols = Seq("o_custkey"))
      val c0 = index.build(source).get
      val batch = ordersIncoming(s, d).withColumn("op", lit("U"))
        .unionByName(dest // fk reassignment on early keys
          .where(col("o_orderkey") % 31 === 5 &&
            !(col("o_orderkey") % 9 === 4) &&
            col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .withColumn("o_custkey", col("o_custkey") + 1)
          .withColumn("op", lit("U")))
        .unionByName(dest
          .where(col("o_orderkey") % 9 === 4 &&
            col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .withColumn("op", lit("D")))
      source.applyCdc(batch, "op")
      index.refresh(source, c0)
      val probe = Tables(s, d, "customer")
        .where(col("c_custkey") % 37 === 1).select("c_custkey")
      index.affectedKeys(probe).orderBy("o_orderkey")
    },

    // Incrementally-maintained table profile over the COW store
    // (quality.IncrementalProfile): per-(bucket,column) mergeable stat
    // rows refreshed ONLY for manifest-changed buckets (counts add,
    // min/max fold, distinct rides a union-able HLL sketch), so the
    // profile of a 100 TB destination stays current at churn cost.
    // The exact columns here equal a from-scratch profile of the final
    // table — the oracle restates them per column; the HLL estimate is
    // spec-gated (engine-specific bytes, the statsApprox precedent).
    "q_profile_incremental" -> { (s, d) =>
      import graft.quality.IncrementalProfile
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val batch = ordersIncoming(s, d).withColumn("op", lit("U"))
        .unionByName(dest
          .where(col("o_orderkey") % 9 === 4 &&
            col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .withColumn("op", lit("D")))
      val src = new graft.cdc.CowStore(s, freshCowRoot("iprof_src"),
        Seq("o_orderkey"), nBuckets = 16)
      val stats = new graft.cdc.CowStore(s, freshCowRoot("iprof_stats"),
        Seq("bkt", "col_name"), nBuckets = 8)
      val cols = Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderdate", "o_orderpriority", "o_orderstatus")
      src.writeFull(dest)
      val c0 = IncrementalProfile.build(src, cols, stats).get
      src.applyCdc(batch, "op")
      IncrementalProfile.refresh(src, c0, cols, stats)
      IncrementalProfile.global(stats).get
        .select("col_name", "n_rows", "n_nulls", "min_num", "max_num",
          "min_str", "max_str")
        .orderBy("col_name")
    },

    // C2 — upsert + global keep-latest-per-key dedup (base_loader.py:340-475).
    "q_cdc_upsert_dedup" -> { (s, d) =>
      val li = Tables(s, d, "lineitem")
      val dest = li
      val incoming = li.where(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
        .withColumn("l_quantity", col("l_quantity") + 100.0)
      val tieBreak = Seq("l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus")
      Upsert.withDedup(dest, incoming, Seq("l_orderkey"), "l_shipdate", tieBreak)
        .orderBy("l_orderkey")
    },

    // Cross-table consistent-as-of read (cdc.ConsistentRead.pin): the
    // reference extracts its tables on INDEPENDENT cadences
    // (all_schedules.py:12-52) and its marts join different-age
    // snapshots; here orders/lineitem are "loaded" to staggered
    // watermarks, both sides pin to the max COMMON watermark
    // (least-of-maxes, a broadcast 1-row frame — no driver collect),
    // and only then join. max_o/max_s in the output PROVE the pin:
    // both must sit at or under the common instant. Oracle restates
    // min-of-maxes + filters + join verbatim.
    "q_cdc_consistent_read" -> { (s, d) =>
      val o = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2001-01-01").cast("timestamp"))
      val li = Tables(s, d, "lineitem")
        .where(col("l_shipdate") < lit("2000-09-01").cast("timestamp"))
      val pinned = graft.cdc.ConsistentRead.pin(
        Seq(o -> "o_orderdate", li -> "l_shipdate"))
      val (po, pli) = (pinned(0), pinned(1))
      po.join(pli, po("o_orderkey") === pli("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice")), 2).as("revenue"),
          max(col("o_orderdate")).as("max_o"),
          max(col("l_shipdate")).as("max_s"))
        .orderBy("o_orderstatus")
    },

    // C3 — full load: truncate + insert ≡ the new snapshot IS the source
    // (base_loader.py:477-516; empty-source quirk covered in FullLoadSpec).
    "q_cdc_full_load" -> { (s, d) =>
      Tables(s, d, "orders").orderBy("o_orderkey")
    },

    // C4 — snapshot load: dynamic partition overwrite on the derived
    // date column; re-running a day replaces exactly that day
    // (base_loader.py:518-584).
    "q_cdc_snapshot_load" -> { (s, d) =>
      val ev = Tables(s, d, "events").withColumn("day", to_date(col("ts")))
      val dest = ev.where(col("day") < lit("2024-01-15").cast("date"))
      val rerun = ev.where(col("day") === lit("2024-01-15").cast("date"))
        .withColumn("value", col("value") * 2.0)
      dest.join(rerun.select("day").distinct(), Seq("day"), "left_anti")
        .unionByName(rerun)
        .orderBy("event_id")
    },

    // C6 — SCD2 check-strategy snapshot (users_snapshot.sql:1-18):
    // staged changes c_mktsegment for key%3=0 and adds new keys for
    // key%5=0; kernel must close+insert changed, insert new, keep rest.
    "q_cdc_scd2" -> { (s, d) =>
      val c = Tables(s, d, "customer")
      val cur = c.select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .withColumn(Scd2.ValidFrom, lit("2024-01-01 00:00:00").cast("timestamp"))
        .withColumn(Scd2.ValidTo, lit(null).cast(TimestampType))
      val staged = c.select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 3 === 0, lit("MOVED"))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"))
        .unionByName(
          c.where(col("c_custkey") % 5 === 0).select(
            (col("c_custkey") + 1000000L).as("c_custkey"),
            concat(lit("new_"), col("c_name")).as("c_name"),
            lit("NEW").as("c_mktsegment")))
      Scd2(cur, staged, Seq("c_custkey"), Seq("c_mktsegment"), asOf)
        .orderBy("c_custkey", Scd2.ValidFrom)
    },

    // C6 driven by the CHANGE FEED (Scd2.applyChanges): the dbt
    // snapshot re-stages the whole table every run; here the staged
    // side is readChangeRows' churn — changed keys close+insert, added
    // keys insert, unchanged keys never enter the join, and removed
    // keys' open rows are CLOSED (invalidate_hard_deletes, which the
    // full-staged form cannot express). D keys are %7∧¬%3 so the
    // change kinds stay disjoint; the oracle states each leg closed-
    // form.
    "q_cdc_scd2_changes" -> { (s, d) =>
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val c = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val src = new graft.cdc.CowStore(s, freshCowRoot("scd2chg"),
        Seq("c_custkey"), nBuckets = 16)
      src.writeFull(c)
      val batch = c.where(col("c_custkey") % 3 === 0)
        .withColumn("c_mktsegment", lit("MOVED"))
        .withColumn("op", lit("U"))
        .unionByName(c.where(col("c_custkey") % 5 === 0).select(
            (col("c_custkey") + 1000000L).as("c_custkey"),
            concat(lit("new_"), col("c_name")).as("c_name"),
            lit("NEW").as("c_mktsegment"))
          .withColumn("op", lit("I")))
        .unionByName(c.where(col("c_custkey") % 7 === 0 &&
            col("c_custkey") % 3 =!= 0)
          .withColumn("op", lit("D")))
      src.applyCdc(batch, "op")
      val changes = src.readChangeRows(1, src.version.get).get
      graft.cdc.Scd2.applyChanges(graft.cdc.Scd2.init(c, t1), changes,
          Seq("c_custkey"), Seq("c_mktsegment"), asOf,
          invalidateHardDeletes = true)
        .orderBy("c_custkey", graft.cdc.Scd2.ValidFrom)
    },

    // P8 companion — current-row view over the SCD2 result.
    "q_cdc_scd2_current" -> { (s, d) =>
      val snapshot = queries("q_cdc_scd2")(s, d)
      Scd2.currentRows(snapshot).orderBy("c_custkey")
    },

    // J5 — the SCD2 change-detection join on its own (SURVEY §2.3):
    // which staged rows differ from the open snapshot rows on the
    // check columns (the inputs that C6 closes+inserts).
    "q_scd2_check" -> { (s, d) =>
      val c = Tables(s, d, "customer")
      val open = c.select(col("c_custkey"), col("c_mktsegment"))
      val staged = c.select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0, lit("MOVED"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment_new"))
      open.join(staged, Seq("c_custkey"))
        .where(xxhash64(col("c_mktsegment")) =!= xxhash64(col("c_mktsegment_new")))
        .orderBy("c_custkey")
    },

    // Data-quality rules as a first-class operator (schema.yml:9-37
    // unique/not_null run by dbt build, dbt_assets.py:23-24): violations
    // frame over the raw tables. lineitem's l_orderkey is deliberately
    // non-unique (multi-line orders) → non-empty, deterministic output;
    // the orders rules document the passing case.
    "q_quality_violations" -> { (s, d) =>
      import graft.quality.Check
      // relationship rule planted to fail: lineitems referencing orders
      // placed on/after 1996 violate the artificially narrowed ref set
      val earlyOrders = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      Check(Tables(s, d, "lineitem"), Seq(
          Check.Unique(Seq("l_orderkey")),
          Check.Relationship("l_orderkey", earlyOrders, "o_orderkey"),
          Check.InRange("l_discount", Some(0.0), Some(0.05))))
        .unionByName(Check(Tables(s, d, "orders"), Seq(
          Check.NotNull("o_custkey"),
          Check.AcceptedValues("o_orderstatus", Seq("O", "F")))))
        .orderBy("rule", "column_name", "violating_value")
    },

    // Row-level quarantine routing (Check.route — the ingest-time gate
    // CdcMicroBatch.runAvailableNowGated drains): clean rows pass with
    // NULL __violations, violators carry every failed rule's label in
    // rule order. Three overlapping rules so multi-label rows exist;
    // the oracle restates the per-row predicates and label concat.
    "q_quality_quarantine" -> { (s, d) =>
      import graft.quality.Check
      val earlyOrders = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      val li = Tables(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_discount", "l_returnflag")
      val (clean, dirty) = Check.route(li, Seq(
        Check.InRange("l_discount", Some(0.0), Some(0.05)),
        Check.AcceptedValues("l_returnflag", Seq("A", "N")),
        Check.Relationship("l_orderkey", earlyOrders, "o_orderkey")))
      clean.withColumn("__violations", lit(null).cast("string"))
        .unionByName(dirty)
        .orderBy("l_orderkey", "l_linenumber", "l_discount", "l_returnflag")
    },

    // One-pass table profile (row count, per-column nulls / exact
    // distinct / typed min-max) — the pre/post-load summary the
    // reference gets from dbt schema tests + ad-hoc ClickHouse
    // count()/uniq() probes, as one operator. Exact-distinct Expand
    // plan; the 100 TB path is Profile.statsApprox (HLL, spec-tested).
    "q_profile_stats" -> { (s, d) =>
      import graft.quality.Profile
      Profile.stats(Tables(s, d, "orders"),
          Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
            "o_orderpriority", "o_orderstatus"))
        .orderBy("col_name")
    },

    // Snapshot diff (Diff.snapshotDiff): yesterday's vs today's load,
    // one row per added/removed/changed key. Fixture: old drops
    // key%7=3 (→ those keys are `added` in new), new drops key%5=2
    // (→ `removed`) and bumps o_totalprice for key%11=0 (→ `changed`
    // where both sides carry the key). The oracle restates the diff
    // with a full outer join comparing the actual column tuple —
    // matching it certifies the 96-bit digest compare made no
    // false-unchanged/false-changed call on the fixture.
    "q_cdc_snapshot_diff" -> { (s, d) =>
      import graft.cdc.Diff
      val o = Tables(s, d, "orders")
      val oldSnap = o.where(col("o_orderkey") % 7 =!= 3)
      val newSnap = o.where(col("o_orderkey") % 5 =!= 2)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")))
      Diff.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // Distribution drift (PSI) between two snapshots: breaks from the
    // OLD snapshot's exact deciles (quantile_cont parity, as
    // q_quality_outliers), deterministic planted shift (every third
    // event's value re-denominated +15%), Laplace-smoothed shares,
    // psi_contrib rounded to 6 so ln() is engine-portable. The oracle
    // restates breaks, bucketing, smoothing and the contribution
    // formula bit-for-bit. Exact percentile's global-column form is a
    // single-task merge by construction (the parity contract); the
    // 100 TB path swaps approx_percentile breaks (Drift scaladoc).
    "q_quality_drift_psi" -> { (s, d) =>
      import graft.quality.Drift
      val ev = Tables(s, d, "events")
      val oldSnap = ev.select(col("value").as("v"))
      val newSnap = ev.select(
        when(col("event_id") % 3 === 0, col("value") * 1.15)
          .otherwise(col("value")).as("v"))
      Drift.psi(oldSnap, newSnap, "v", buckets = 10)
        .orderBy("bucket")
    },

    // Categorical PSI: buckets = old snapshot's top-K categories +
    // __other__ (a NEW category surfaces as __other__ growth instead
    // of vanishing); planted shift relabels every 4th event to a type
    // the old snapshot never saw.
    "q_quality_drift_cat" -> { (s, d) =>
      import graft.quality.Drift
      val ev = Tables(s, d, "events")
      val oldSnap = ev.select(col("event_type").as("c"))
      val newSnap = ev.select(
        when(col("event_id") % 4 === 0, lit("promo"))
          .otherwise(col("event_type")).as("c"))
      Drift.psiCategorical(oldSnap, newSnap, "c", topK = 5)
        .orderBy("category")
    },

    // Robust per-group outlier summary (Outliers.summary): Tukey
    // fences on events.value within event_type. Exact quartiles →
    // DuckDB quantile_cont parity (same linear interpolation as
    // Spark's percentile; q_agg_median pins the same equivalence).
    "q_quality_outliers" -> { (s, d) =>
      import graft.quality.Outliers
      Outliers.summary(Tables(s, d, "events"), "value", Seq("event_type"))
        .orderBy("event_type")
    }
  )

  /** Verify-only truth gates (the [[graft.SparkEntry.gateQueries]]
    * contract: may embed truth baselines the bench must not time). */
  val gateQueries: Map[String, Q] = Map(
    // The maintained profile's QUANTILES under the GK ε-rank contract,
    // gated over the full store lifecycle (build → I/U/D applyCdc →
    // changed-bucket refresh → global fold): for every profiled
    // numeric column and p ∈ {.25,.5,.75}, the merged-sketch answer's
    // EXACT rank interval in the final table must overlap
    // ceil(p·n) ± ε·n (+1 boundary slack) — the same contract
    // functions.Quantiles documents for approx_percentile and
    // QuantilesSpec pins for the merge; values themselves are
    // engine-specific sketch output and never oracle-pinned (the
    // statsApprox precedent). n_vals is DuckDB-restated so the gate
    // can't pass on an empty frame.
    "q_profile_incremental_quantiles" -> { (s, d) =>
      import graft.quality.IncrementalProfile
      val dest = Tables(s, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      val batch = ordersIncoming(s, d).withColumn("op", lit("U"))
        .unionByName(dest
          .where(col("o_orderkey") % 9 === 4 &&
            col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .withColumn("op", lit("D")))
      val src = new graft.cdc.CowStore(s, freshCowRoot("iq_src"),
        Seq("o_orderkey"), nBuckets = 16)
      val stats = new graft.cdc.CowStore(s, freshCowRoot("iq_stats"),
        Seq("bkt", "col_name"), nBuckets = 8)
      val cols = Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderdate")
      src.writeFull(dest)
      val c0 = IncrementalProfile.build(src, cols, stats).get
      src.applyCdc(batch, "op")
      IncrementalProfile.refresh(src, c0, cols, stats)
      val ps = Seq(0.25, 0.5, 0.75)
      // ≤ nCols×|ps| driver values — config-bounded state (the
      // K-centroid precedent), never table data
      val approx: Map[String, Seq[Double]] =
        IncrementalProfile.global(stats, ps).get
          .select("col_name", "quantiles")
          .where(col("quantiles").isNotNull)
          .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val fin = src.read().get
      val eps = graft.functions.GkSketch.DefaultEps
      val legs = cols.map { c =>
        // IncrementalProfile.asNum's numeric form: TIMESTAMP_NTZ has
        // no direct double cast — route through TIMESTAMP (session tz
        // UTC), then epoch seconds
        val numc = fin.schema(c).dataType match {
          case org.apache.spark.sql.types.TimestampNTZType |
               org.apache.spark.sql.types.DateType =>
            col(c).cast("timestamp").cast("double")
          case _ => col(c).cast("double")
        }
        val vs = approx(c)
        val aggs = count(numc).as("n_vals") +:
          ps.zip(vs).zipWithIndex.flatMap { case ((_, v), i) => Seq(
            sum(when(numc < v, 1L).otherwise(0L)).as(s"lo_$i"),
            sum(when(numc <= v, 1L).otherwise(0L)).as(s"hi_$i")) }
        val one = fin.agg(aggs.head, aggs.tail: _*)
        val perP = ps.zipWithIndex.map { case (p, i) =>
          one.select(lit(c).as("col_name"), lit(p).as("p"),
            col("n_vals"),
            (col(s"hi_$i") >= ceil(lit(p) * col("n_vals")) -
                lit(eps) * col("n_vals") - 1 &&
              col(s"lo_$i") + 1 <= ceil(lit(p) * col("n_vals")) +
                lit(eps) * col("n_vals") + 1).as("rank_within_eps")) }
        perP.reduce(_ unionByName _)
      }
      legs.reduce(_ unionByName _).orderBy("col_name", "p")
    }
  )

  val oracle: Map[String, String] = Map(
    // Constant-truth restatement (the recall-gate pattern): the
    // booleans must all be true; n_vals is real so the gate cannot
    // pass vacuously.
    "q_profile_incremental_quantiles" ->
      """WITH fin AS (
        |  SELECT * FROM (
        |    SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01')
        |  WHERE o_orderkey NOT IN (
        |      SELECT o_orderkey FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |    AND NOT (o_orderkey % 9 = 4
        |      AND o_orderdate < TIMESTAMP '2000-01-01')
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'U', o_totalprice + 1000.0,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
        |p AS (SELECT CAST(x AS DOUBLE) AS p
        |      FROM (VALUES (0.25), (0.5), (0.75)) v(x))
        |SELECT col_name, p, n_vals, true AS rank_within_eps FROM (
        |  SELECT 'o_orderkey' AS col_name, count(o_orderkey) AS n_vals
        |  FROM fin
        |  UNION ALL SELECT 'o_custkey', count(o_custkey) FROM fin
        |  UNION ALL SELECT 'o_totalprice', count(o_totalprice) FROM fin
        |  UNION ALL SELECT 'o_orderdate', count(o_orderdate) FROM fin), p
        |ORDER BY col_name, p""".stripMargin,
    "q_quality_violations" ->
      """SELECT * FROM (
        |  SELECT 'unique' AS rule, 'l_orderkey' AS column_name,
        |    CAST(l_orderkey AS VARCHAR) AS violating_value, count(*) AS n_rows
        |  FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
        |  UNION ALL
        |  SELECT 'relationship', 'l_orderkey', CAST(l_orderkey AS VARCHAR),
        |    count(*)
        |  FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
        |                           WHERE o_orderdate < TIMESTAMP '1996-01-01')
        |  GROUP BY l_orderkey
        |  UNION ALL
        |  SELECT 'in_range', 'l_discount', CAST(l_discount AS VARCHAR),
        |    count(*)
        |  FROM lineitem
        |  WHERE l_discount IS NOT NULL
        |    AND (l_discount < 0.0 OR l_discount > 0.05)
        |  GROUP BY l_discount
        |  UNION ALL
        |  SELECT 'not_null', 'o_custkey', CAST(NULL AS VARCHAR), count(*)
        |  FROM orders WHERE o_custkey IS NULL HAVING count(*) > 0
        |  UNION ALL
        |  SELECT 'accepted_values', 'o_orderstatus', o_orderstatus, count(*)
        |  FROM orders
        |  WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O', 'F')
        |  GROUP BY o_orderstatus)
        |ORDER BY rule, column_name, violating_value NULLS FIRST""".stripMargin,
    "q_quality_quarantine" ->
      """SELECT l_orderkey, l_linenumber, l_discount, l_returnflag,
        |  CASE WHEN
        |      (l_discount IS NOT NULL AND (l_discount < 0.0 OR l_discount > 0.05))
        |      OR (l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N'))
        |      OR (l_orderkey IS NOT NULL AND l_orderkey NOT IN (
        |            SELECT o_orderkey FROM orders
        |            WHERE o_orderdate < TIMESTAMP '1996-01-01'))
        |    THEN concat_ws(',',
        |      CASE WHEN l_discount IS NOT NULL
        |        AND (l_discount < 0.0 OR l_discount > 0.05)
        |        THEN 'in_range(l_discount)' END,
        |      CASE WHEN l_returnflag IS NOT NULL
        |        AND l_returnflag NOT IN ('A', 'N')
        |        THEN 'accepted_values(l_returnflag)' END,
        |      CASE WHEN l_orderkey IS NOT NULL AND l_orderkey NOT IN (
        |            SELECT o_orderkey FROM orders
        |            WHERE o_orderdate < TIMESTAMP '1996-01-01')
        |        THEN 'relationship(l_orderkey)' END)
        |  END AS __violations
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_discount, l_returnflag""".stripMargin,
    "q_cdc_upsert" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |SELECT * FROM dest WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |UNION ALL SELECT * FROM inc
        |ORDER BY o_orderkey""".stripMargin,
    "q_cdc_consistent_read" ->
      """WITH ol AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01'),
        |ll AS (
        |  SELECT * FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-09-01'),
        |wm AS (SELECT least((SELECT max(o_orderdate) FROM ol),
        |                    (SELECT max(l_shipdate) FROM ll)) AS w),
        |po AS (SELECT * FROM ol WHERE o_orderdate <= (SELECT w FROM wm)),
        |pl AS (SELECT * FROM ll WHERE l_shipdate <= (SELECT w FROM wm))
        |SELECT o_orderstatus, count(*) AS n_lines,
        |  round(sum(l_extendedprice), 2) AS revenue,
        |  max(o_orderdate) AS max_o, max(l_shipdate) AS max_s
        |FROM po JOIN pl ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // VERBATIM q_cdc_upsert restatement — the bucketed COW layout must
    // be invisible to semantics (same rows, same order, same types).
    "q_cdc_upsert_bucketed" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |SELECT * FROM dest WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |UNION ALL SELECT * FROM inc
        |ORDER BY o_orderkey""".stripMargin,
    // VERBATIM q_cdc_upsert restatement again — fragmented sub-batch
    // loads + compact + vacuum must be invisible to semantics.
    "q_cdc_upsert_compacted" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |SELECT * FROM dest WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |UNION ALL SELECT * FROM inc
        |ORDER BY o_orderkey""".stripMargin,
    // Drift tolerance restated: the dropped column arrives NULL on
    // every merged batch row, the unknown column never lands.
    "q_cdc_upsert_drift" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate,
        |    CAST(NULL AS VARCHAR) AS o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |SELECT * FROM dest WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |UNION ALL SELECT * FROM inc
        |ORDER BY o_orderkey""".stripMargin,
    // Evolution restated: the upsert result plus the widened column —
    // NULL on surviving destination rows, populated on batch rows.
    "q_cdc_upsert_evolve" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate,
        |    o_orderpriority, 'web' AS o_channel
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |SELECT dest.*, CAST(NULL AS VARCHAR) AS o_channel FROM dest
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |UNION ALL SELECT * FROM inc
        |ORDER BY o_orderkey""".stripMargin,
    // The keep-latest winner is closed-form (the V variant is strictly
    // one day later per key), so the oracle states it directly: a
    // broken bucket-local argmax that kept U diverges on three columns.
    "q_cdc_upsert_bucketed_dedup" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc0 AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
        |win AS (
        |  SELECT o_orderkey, o_custkey, 'V' AS o_orderstatus,
        |    o_totalprice - 500.0 AS o_totalprice,
        |    o_orderdate + INTERVAL 1 DAY AS o_orderdate, o_orderpriority
        |  FROM inc0)
        |SELECT * FROM dest WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc0)
        |UNION ALL SELECT * FROM win
        |ORDER BY o_orderkey""".stripMargin,
    // Surviving set after the keyed delete (absent-key probes no-op).
    "q_cdc_delete" ->
      """SELECT * FROM orders
        |WHERE o_orderdate < TIMESTAMP '2000-07-01'
        |  AND o_orderkey % 9 <> 4
        |ORDER BY o_orderkey""".stripMargin,
    // VERBATIM q_cdc_upsert restatement — the merge-on-read delta path
    // must be invisible to semantics (the read resolves winners).
    "q_cdc_upsert_mor" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |SELECT * FROM dest WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |UNION ALL SELECT * FROM inc
        |ORDER BY o_orderkey""".stripMargin,
    // VERBATIM q_cdc_delete restatement — merge-on-read tombstones and
    // their compaction fold must be invisible to semantics.
    "q_cdc_delete_mor" ->
      """SELECT * FROM orders
        |WHERE o_orderdate < TIMESTAMP '2000-07-01'
        |  AND o_orderkey % 9 <> 4
        |ORDER BY o_orderkey""".stripMargin,
    // Delete-all-batch-keys + insert-non-deletes, restated.
    "q_cdc_apply_ops" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
        |del AS (
        |  SELECT o_orderkey FROM dest
        |  WHERE o_orderkey % 9 = 4 AND o_orderdate < TIMESTAMP '2000-01-01')
        |SELECT * FROM dest
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |  AND o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |UNION ALL SELECT * FROM inc
        |ORDER BY o_orderkey""".stripMargin,
    // The change feed restated as a FULL before/after diff (the engine
    // reads only changed-owner buckets; matching the full diff proves
    // the pruning lost nothing). Same IS DISTINCT FROM tuple compare
    // as q_cdc_snapshot_diff.
    "q_cdc_changes" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
        |del AS (
        |  SELECT o_orderkey FROM dest
        |  WHERE o_orderkey % 9 = 4 AND o_orderdate < TIMESTAMP '2000-01-01'),
        |fin AS (
        |  SELECT * FROM dest
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |  UNION ALL SELECT * FROM inc)
        |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |       WHEN n.o_orderkey IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change
        |FROM dest o FULL OUTER JOIN fin n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |  OR (o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate,
        |      o.o_orderpriority)
        |     IS DISTINCT FROM
        |     (n.o_custkey, n.o_orderstatus, n.o_totalprice, n.o_orderdate,
        |      n.o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,
    // The incremental mart must equal transform(final source) — a
    // stale filtered-out update or an unapplied delete diverges here.
    "q_cdc_mart_incremental" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'F' ELSE 'U' END
        |      AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
        |del AS (
        |  SELECT o_orderkey FROM dest
        |  WHERE o_orderkey % 9 = 4 AND o_orderdate < TIMESTAMP '2000-01-01'),
        |fin AS (
        |  SELECT * FROM dest
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |  UNION ALL SELECT * FROM inc)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice * 2 AS double_price, o_orderdate
        |FROM fin WHERE o_orderstatus IN ('O', 'F')
        |ORDER BY o_orderkey""".stripMargin,
    // transform(final source, final dim) restated — a dim-blind
    // refresh keeps pre-PROMO segments on unchurned facts and
    // diverges.
    "q_cdc_mart_dim_change" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
        |del AS (
        |  SELECT o_orderkey FROM dest
        |  WHERE o_orderkey % 9 = 4 AND o_orderdate < TIMESTAMP '2000-01-01'),
        |fin AS (
        |  SELECT * FROM dest
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |  UNION ALL SELECT * FROM inc),
        |dimf AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 4 = 1 THEN 'PROMO' ELSE c_mktsegment END
        |      AS c_mktsegment
        |  FROM customer)
        |SELECT o_orderkey, o_custkey, c_mktsegment AS cust_segment,
        |  o_totalprice, o_orderstatus
        |FROM fin LEFT JOIN dimf ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    // The index's truth restated: fact keys of the FINAL table whose
    // fk lands in the probe — delete+insert with the reassignment
    // slice folded into the U set.
    "q_cdc_fk_index" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey + 1 AS o_custkey FROM dest
        |  WHERE o_orderkey % 31 = 5 AND NOT (o_orderkey % 9 = 4)
        |    AND o_orderdate < TIMESTAMP '2000-01-01'),
        |del AS (
        |  SELECT o_orderkey FROM dest
        |  WHERE o_orderkey % 9 = 4 AND o_orderdate < TIMESTAMP '2000-01-01'),
        |fin AS (
        |  SELECT o_orderkey, o_custkey FROM dest
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |  UNION ALL SELECT * FROM inc)
        |SELECT o_orderkey FROM fin
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 37 = 1)
        |ORDER BY o_orderkey""".stripMargin,

    // The incremental profile's exact columns restated per column over
    // the FINAL table (the q_profile_stats pattern minus n_distinct,
    // which is HLL-approximate and spec-gated instead).
    "q_profile_incremental" ->
      """WITH dest AS (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-07-01'),
        |inc AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
        |del AS (
        |  SELECT o_orderkey FROM dest
        |  WHERE o_orderkey % 9 = 4 AND o_orderdate < TIMESTAMP '2000-01-01'),
        |fin AS (
        |  SELECT * FROM dest
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |  UNION ALL SELECT * FROM inc)
        |SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
        |  count(*) - count(o_custkey) AS n_nulls,
        |  CAST(min(o_custkey) AS DOUBLE) AS min_num,
        |  CAST(max(o_custkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM fin
        |UNION ALL
        |SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
        |  epoch(min(o_orderdate)), epoch(max(o_orderdate)), NULL, NULL
        |FROM fin
        |UNION ALL
        |SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
        |  CAST(min(o_orderkey) AS DOUBLE), CAST(max(o_orderkey) AS DOUBLE),
        |  NULL, NULL FROM fin
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  count(*) - count(o_orderpriority), NULL, NULL,
        |  min(o_orderpriority), max(o_orderpriority) FROM fin
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  NULL, NULL, min(o_orderstatus), max(o_orderstatus) FROM fin
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        |  min(o_totalprice), max(o_totalprice), NULL, NULL FROM fin
        |ORDER BY col_name""".stripMargin,
    "q_cdc_upsert_dedup" ->
      """WITH inc AS (
        |  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |    l_quantity + 100.0 AS l_quantity, l_extendedprice, l_discount,
        |    l_tax, l_returnflag, l_linestatus, l_shipdate
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01'),
        |merged AS (
        |  SELECT * FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT l_orderkey FROM inc)
        |  UNION ALL SELECT * FROM inc)
        |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_shipdate DESC, l_linenumber DESC, l_partkey DESC,
        |      l_suppkey DESC, l_quantity DESC, l_extendedprice DESC,
        |      l_discount DESC, l_tax DESC, l_returnflag DESC, l_linestatus DESC
        |  ) AS rn FROM merged)
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "q_cdc_full_load" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "q_cdc_snapshot_load" ->
      """WITH ev AS (SELECT *, CAST(ts AS DATE) AS day FROM events),
        |dest AS (SELECT * FROM ev WHERE day < DATE '2024-01-15'),
        |rerun AS (
        |  SELECT event_id, ts, user_id, event_type, value * 2.0 AS value,
        |    props, day FROM ev WHERE day = DATE '2024-01-15')
        |SELECT day, event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT * FROM dest WHERE day NOT IN (SELECT DISTINCT day FROM rerun)
        |  UNION ALL SELECT * FROM rerun)
        |ORDER BY event_id""".stripMargin,
    "q_cdc_scd2" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_name, c_mktsegment,
        |    TIMESTAMP '2024-01-01' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM customer)
        |SELECT * FROM (
        |  SELECT * FROM cur WHERE c_custkey % 3 <> 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_mktsegment, valid_from,
        |    TIMESTAMP '2024-02-01' FROM cur WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, 'MOVED', TIMESTAMP '2024-02-01',
        |    CAST(NULL AS TIMESTAMP) FROM cur WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'new_' || c_name, 'NEW',
        |    TIMESTAMP '2024-02-01', CAST(NULL AS TIMESTAMP)
        |  FROM customer WHERE c_custkey % 5 = 0)
        |ORDER BY c_custkey, valid_from""".stripMargin,
    // Each change-feed leg closed-form: changed (%3) close+insert,
    // hard-deleted (%7∧¬%3) close only, added (+1e6, %5) insert,
    // untouched stay open at t1.
    "q_cdc_scd2_changes" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_name, c_mktsegment,
        |    TIMESTAMP '2024-01-01' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM customer)
        |SELECT * FROM (
        |  SELECT * FROM cur WHERE c_custkey % 3 <> 0 AND c_custkey % 7 <> 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_mktsegment, valid_from,
        |    TIMESTAMP '2024-02-01' FROM cur WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, 'MOVED', TIMESTAMP '2024-02-01',
        |    CAST(NULL AS TIMESTAMP) FROM cur WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_mktsegment, valid_from,
        |    TIMESTAMP '2024-02-01' FROM cur
        |  WHERE c_custkey % 7 = 0 AND c_custkey % 3 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'new_' || c_name, 'NEW',
        |    TIMESTAMP '2024-02-01', CAST(NULL AS TIMESTAMP)
        |  FROM customer WHERE c_custkey % 5 = 0)
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "q_cdc_scd2_current" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_name, c_mktsegment,
        |    TIMESTAMP '2024-01-01' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM customer)
        |SELECT * FROM (
        |  SELECT * FROM cur WHERE c_custkey % 3 <> 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, 'MOVED', TIMESTAMP '2024-02-01',
        |    CAST(NULL AS TIMESTAMP) FROM cur WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'new_' || c_name, 'NEW',
        |    TIMESTAMP '2024-02-01', CAST(NULL AS TIMESTAMP)
        |  FROM customer WHERE c_custkey % 5 = 0)
        |ORDER BY c_custkey""".stripMargin,
    "q_scd2_check" ->
      """SELECT c_custkey, c_mktsegment, 'MOVED' AS c_mktsegment_new
        |FROM customer WHERE c_custkey % 3 = 0 AND c_mktsegment <> 'MOVED'
        |ORDER BY c_custkey""".stripMargin,
    // Per-column restatement of the one-pass profile; timestamps
    // compare as epoch seconds (Spark session tz = UTC = DuckDB's
    // epoch() frame).
    "q_profile_stats" ->
      """SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |  count(*) - count(o_orderkey) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS DOUBLE) AS min_num,
        |  CAST(max(o_orderkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |  count(DISTINCT o_custkey), CAST(min(o_custkey) AS DOUBLE),
        |  CAST(max(o_custkey) AS DOUBLE), NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        |  count(DISTINCT o_totalprice), min(o_totalprice),
        |  max(o_totalprice), NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
        |  count(DISTINCT o_orderdate), epoch(min(o_orderdate)),
        |  epoch(max(o_orderdate)), NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  count(*) - count(o_orderpriority),
        |  count(DISTINCT o_orderpriority), NULL, NULL,
        |  min(o_orderpriority), max(o_orderpriority) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  count(DISTINCT o_orderstatus), NULL, NULL,
        |  min(o_orderstatus), max(o_orderstatus) FROM orders
        |ORDER BY col_name""".stripMargin,
    // Diff restated with the actual column tuple (no digests): row
    // values compare via IS DISTINCT FROM so a NULL-vs-value change
    // counts as changed, same as the digest's null-flag interleave.
    "q_cdc_snapshot_diff" ->
      """WITH oldv AS (
        |  SELECT * FROM orders WHERE o_orderkey % 7 <> 3),
        |newv AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice + CASE WHEN o_orderkey % 11 = 0
        |      THEN 10.0 ELSE 0.0 END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 5 <> 2)
        |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |       WHEN n.o_orderkey IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change
        |FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |  OR (o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate,
        |      o.o_orderpriority)
        |     IS DISTINCT FROM
        |     (n.o_custkey, n.o_orderstatus, n.o_totalprice, n.o_orderdate,
        |      n.o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,
    "q_quality_drift_psi" ->
      """WITH oldv AS (
        |  SELECT value AS v FROM events WHERE value IS NOT NULL),
        |newv AS (
        |  SELECT CASE WHEN event_id % 3 = 0 THEN value * 1.15
        |         ELSE value END AS v
        |  FROM events WHERE value IS NOT NULL),
        |br AS (
        |  SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5,
        |    0.6, 0.7, 0.8, 0.9]) AS bs
        |  FROM oldv),
        |oc AS (
        |  SELECT len(list_filter(bs, b -> v > b)) AS bucket,
        |    count(*) AS n_old
        |  FROM oldv, br GROUP BY 1),
        |nc AS (
        |  SELECT len(list_filter(bs, b -> v > b)) AS bucket,
        |    count(*) AS n_new
        |  FROM newv, br GROUP BY 1),
        |base AS (SELECT unnest(range(10)) AS bucket),
        |j AS (
        |  SELECT base.bucket, coalesce(oc.n_old, 0) AS n_old,
        |    coalesce(nc.n_new, 0) AS n_new
        |  FROM base LEFT JOIN oc USING (bucket)
        |    LEFT JOIN nc USING (bucket)),
        |t AS (SELECT sum(n_old) AS t_old, sum(n_new) AS t_new FROM j)
        |SELECT j.bucket, j.n_old, j.n_new,
        |  round((CAST(n_new + 1 AS DOUBLE) / (t_new + 10)
        |         - CAST(n_old + 1 AS DOUBLE) / (t_old + 10))
        |    * ln((CAST(n_new + 1 AS DOUBLE) / (t_new + 10))
        |         / (CAST(n_old + 1 AS DOUBLE) / (t_old + 10))), 6)
        |    AS psi_contrib
        |FROM j, t ORDER BY bucket""".stripMargin,
    "q_quality_drift_cat" ->
      """WITH oldv AS (SELECT event_type AS c FROM events),
        |newv AS (
        |  SELECT CASE WHEN event_id % 4 = 0 THEN 'promo'
        |         ELSE event_type END AS c
        |  FROM events),
        |top AS (
        |  SELECT c FROM (
        |    SELECT c, count(*) AS n FROM oldv
        |    WHERE c IS NOT NULL AND c <> '__other__'
        |    GROUP BY c ORDER BY n DESC, c LIMIT 5)),
        |k AS (SELECT count(*) + 1 AS ncats FROM top),
        |base AS (
        |  SELECT c AS category FROM top
        |  UNION ALL SELECT '__other__'),
        |oc AS (
        |  SELECT CASE WHEN c IS NULL OR c NOT IN (SELECT c FROM top)
        |         THEN '__other__' ELSE c END AS category,
        |    count(*) AS n_old
        |  FROM oldv GROUP BY 1),
        |nc AS (
        |  SELECT CASE WHEN c IS NULL OR c NOT IN (SELECT c FROM top)
        |         THEN '__other__' ELSE c END AS category,
        |    count(*) AS n_new
        |  FROM newv GROUP BY 1),
        |j AS (
        |  SELECT base.category, coalesce(oc.n_old, 0) AS n_old,
        |    coalesce(nc.n_new, 0) AS n_new
        |  FROM base LEFT JOIN oc USING (category)
        |    LEFT JOIN nc USING (category)),
        |t AS (SELECT sum(n_old) AS t_old, sum(n_new) AS t_new FROM j)
        |SELECT j.category, j.n_old, j.n_new,
        |  round((CAST(n_new + 1 AS DOUBLE) / (t_new + k.ncats)
        |         - CAST(n_old + 1 AS DOUBLE) / (t_old + k.ncats))
        |    * ln((CAST(n_new + 1 AS DOUBLE) / (t_new + k.ncats))
        |         / (CAST(n_old + 1 AS DOUBLE) / (t_old + k.ncats))), 6)
        |    AS psi_contrib
        |FROM j, t, k ORDER BY category""".stripMargin,
    "q_quality_outliers" ->
      """WITH f AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, count(e.value) AS n_vals,
        |  CAST(sum(CASE WHEN e.value < f.q1 - 1.5*(f.q3 - f.q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN e.value > f.q3 + 1.5*(f.q3 - f.q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  any_value(f.q1) AS q1, any_value(f.q3) AS q3
        |FROM events e JOIN f USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin
  )
}
