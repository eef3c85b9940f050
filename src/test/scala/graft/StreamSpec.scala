package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{AppendStore, TableStore}
import graft.operators.{IncrementalDedup, Multimodal}
import graft.pipeline.{Marts, Runner, Staging}
import graft.streaming.{CdcMicroBatch, CowMaintenance}

/** Structured-Streaming CDC (AvailableNow drain + foreachBatch upsert),
  * streaming windowed aggregation, multimodal plumbing, pipeline DAG.
  */
class StreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("streaming CDC into a COW source with per-batch incremental " +
      "mart refresh: mart converges to transform(full source); " +
      "replayed drain converges too") {
    import org.apache.spark.sql.types._
    def rows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, tag, k * 10.0)).toDF("k", "tag", "v")
    def martOf(df: org.apache.spark.sql.DataFrame) =
      df.where(col("v") < 500.0)
        .select(col("k"), col("tag"), (col("v") * 2).as("v2"))
    val src = tmp("cowmart-src")
    val store = new graft.cdc.CowStore(spark, tmp("cowmart-s"),
      Seq("k"), nBuckets = 8)
    val mart = new graft.cdc.CowStore(spark, tmp("cowmart-m"),
      Seq("k"), nBuckets = 8)
    store.writeFull(rows(0 until 80, "old"))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("tag", StringType), StructField("v", DoubleType)))
    val ckpt = tmp("cowmart-ck")
    // drain 1 (mart does not exist yet → built from the snapshot):
    // updates crossing the mart's v<500 boundary
    rows(40 until 60, "b1").withColumn("v", col("v") + 15.0)
      .write.mode("append").parquet(src)
    CdcMicroBatch.runAvailableNowCowMart(spark, src, schema, store,
      mart, martOf, Seq("k"), ckpt)
    assert(mart.read().get.collect().map(_.toSeq).toSet ==
      martOf(store.read().get).collect().map(_.toSeq).toSet)
    // drain 2 (mart exists → per-batch change-feed refresh): new keys,
    // v 380..520 so keys ≤91 pass the filter and 92..94 don't
    rows(80 until 95, "b2").withColumn("v", col("v") - 420.0)
      .write.mode("append").parquet(src)
    CdcMicroBatch.runAvailableNowCowMart(spark, src, schema, store,
      mart, martOf, Seq("k"), ckpt)
    val want = martOf(store.read().get).collect().map(_.toSeq).toSet
    assert(mart.read().get.collect().map(_.toSeq).toSet == want)
    assert(want.nonEmpty)
    // replay from a fresh checkpoint: re-upserts are idempotent, the
    // re-drained feed windows re-apply the same patches
    CdcMicroBatch.runAvailableNowCowMart(spark, src, schema, store,
      mart, martOf, Seq("k"), tmp("cowmart-ck2"))
    assert(mart.read().get.collect().map(_.toSeq).toSet == want)
  }

  test("COW mart drain: the persisted cursor covers foreign writes " +
      "between runs; maintenance cadence bounds version dirs with " +
      "results unchanged") {
    import org.apache.spark.sql.types._
    def rows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, tag, k * 10.0)).toDF("k", "tag", "v")
    def martOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("tag"), (col("v") * 2).as("v2"))
    val src = tmp("cowcur-src")
    val store = new graft.cdc.CowStore(spark, tmp("cowcur-s"),
      Seq("k"), nBuckets = 8)
    val mart = new graft.cdc.CowStore(spark, tmp("cowcur-m"),
      Seq("k"), nBuckets = 8)
    store.writeFull(rows(0 until 80, "old"))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("tag", StringType), StructField("v", DoubleType)))
    val ckpt = tmp("cowcur-ck")
    val maint = Some(CowMaintenance(compactEvery = 2, maxReferenced = 3))
    rows(40 until 50, "b1").write.mode("append").parquet(src)
    CdcMicroBatch.runAvailableNowCowMart(spark, src, schema, store,
      mart, martOf, Seq("k"), ckpt, maint)
    // a FOREIGN writer advances the store between runs — the ADVICE
    // r18 staleness case: a head-initialized cursor would diff this
    // window empty and leave the mart silently missing these rows
    store.upsert(rows(200 until 210, "foreign"))
    rows(50 until 60, "b2").write.mode("append").parquet(src)
    CdcMicroBatch.runAvailableNowCowMart(spark, src, schema, store,
      mart, martOf, Seq("k"), ckpt, maint)
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)),
      "the foreign write's window must reach the mart via the marker")
    assert(mart.read().get.where(col("k") === 205L).count() == 1)
    // maintenance cadence: many more single-batch drains; version-dir
    // count stays bounded by the compact budget + the batches since
    // the last cadence hit, instead of growing O(batches)
    (0 until 6).foreach { i =>
      rows(100 + i until 101 + i, s"m$i").write.mode("append").parquet(src)
      CdcMicroBatch.runAvailableNowCowMart(spark, src, schema, store,
        mart, martOf, Seq("k"), ckpt, maint)
    }
    val owners = store.currentManifest.values.toSet.size
    assert(owners <= 3 + 2,
      s"maintenance must bound referenced version dirs, got $owners")
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)),
      "maintenance is result-invisible through the drain")
  }

  test("dim-aware COW mart drain: a dim change between drains " +
      "re-enriches exactly the affected fact rows; composite cursor " +
      "survives restarts") {
    import org.apache.spark.sql.types._
    import graft.cdc.IncrementalMart.Dim
    def factRows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, (k % 10).toLong, tag)).toDF("k", "fk", "tag")
    val src = tmp("dimdrain-src")
    val store = new graft.cdc.CowStore(spark, tmp("dimdrain-s"),
      Seq("k"), nBuckets = 8)
    val dimStore = new graft.cdc.CowStore(spark, tmp("dimdrain-d"),
      Seq("dk"), nBuckets = 4)
    val mart = new graft.cdc.CowStore(spark, tmp("dimdrain-m"),
      Seq("k"), nBuckets = 8)
    dimStore.writeFull((0 until 10).map(i => (i.toLong, s"seg$i"))
      .toDF("dk", "seg"))
    def martOf(df: org.apache.spark.sql.DataFrame) = {
      val dc = broadcast(dimStore.read().get)
      df.join(dc, df("fk") === dc("dk"), "left")
        .select(df("k"), df("fk"), dc("seg"), df("tag"))
    }
    val dims = Seq(Dim(dimStore, Some(ch => store.read().get
      .join(ch.select("dk").distinct(), col("fk") === col("dk"))
      .select("k"))))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("fk", LongType), StructField("tag", StringType)))
    val ckpt = tmp("dimdrain-ck")
    def drain(): Unit = CdcMicroBatch.runAvailableNowCowMartDims(spark,
      src, schema, store, mart, martOf, Seq("k"), ckpt, dims)
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    factRows(0 until 120, "b1").write.mode("append").parquet(src)
    drain() // builds the mart, records dim versions in the marker
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)))
    // a dim change BETWEEN drains: fk=4's ~12 facts see no fact churn
    // in the next batch, so only the dim feed can reach them
    dimStore.upsert(Seq((4L, "MOVED")).toDF("dk", "seg"))
    factRows(120 until 130, "b2").write.mode("append").parquet(src)
    drain()
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)),
      "dim-affected rows must re-enrich through the drain")
    assert(mart.read().get.where(col("seg") === "MOVED").count() == 13,
      "every fk=4 fact (4,14,...,124) re-enriches")
    // the refresh PATCHED (several owners), it did not rebuild
    assert(mart.currentManifest.values.toSet.size > 1)
    // replay with a fresh checkpoint (unknown cursor → rebuild path)
    drain()
    CdcMicroBatch.runAvailableNowCowMartDims(spark, src, schema, store,
      mart, martOf, Seq("k"), tmp("dimdrain-ck2"), dims)
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)))
  }

  test("INDEX-backed dims drain: the drain maintains the FkIndex from " +
      "the same fact feed (persisted index cursor, fk reassignment " +
      "through the stream), and the dim mapping never scans the fact " +
      "table") {
    import org.apache.spark.sql.types._
    def factRows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, (k % 10).toLong, tag)).toDF("k", "fk", "tag")
    val src = tmp("idxdrain-src")
    val store = new graft.cdc.CowStore(spark, tmp("idxdrain-s"),
      Seq("k"), nBuckets = 8)
    val dimStore = new graft.cdc.CowStore(spark, tmp("idxdrain-d"),
      Seq("fk"), nBuckets = 4)
    val mart = new graft.cdc.CowStore(spark, tmp("idxdrain-m"),
      Seq("k"), nBuckets = 8)
    dimStore.writeFull((0 until 11).map(i => (i.toLong, s"seg$i"))
      .toDF("fk", "seg"))
    def martOf(df: org.apache.spark.sql.DataFrame) = {
      val dc = broadcast(dimStore.read().get)
      df.join(dc, Seq("fk"), "left")
        .select(df("k"), col("fk"), dc("seg"), df("tag"))
    }
    val index = new graft.cdc.FkIndex(
      new graft.cdc.CowStore(spark, tmp("idxdrain-rev"), Seq("fk"),
        nBuckets = 4),
      new graft.cdc.CowStore(spark, tmp("idxdrain-fwd"), Seq("k"),
        nBuckets = 8),
      factKeys = Seq("k"), fkCols = Seq("fk"))
    val dims = Seq(graft.cdc.FkIndex.dim(dimStore, index))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("fk", LongType), StructField("tag", StringType)))
    val ckpt = tmp("idxdrain-ck")
    // clusterBy names a SOURCE column the index stores (fk, k) do NOT
    // carry — aux maintenance must cluster by the subset that exists
    // instead of crashing the drain on an unresolved column
    val maint = Some(CowMaintenance(compactEvery = 2, maxReferenced = 2,
      clusterBy = Seq("tag")))
    def drain(): Unit = CdcMicroBatch.runAvailableNowCowMartDims(spark,
      src, schema, store, mart, martOf, Seq("k"), ckpt, dims, maint,
      indexes = Seq(index))
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // batch 1: first drain builds mart AND index (unknown cursors)
    factRows(0 until 120, "b1").write.mode("append").parquet(src)
    drain()
    assert(index.reverse.exists && index.forward.exists,
      "the drain must build the registered index")
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)))
    // batch 2: an fk REASSIGNMENT rides the stream (k=24 moves 4→10);
    // a dim change between drains then hits fk 4 AND 10 — the index
    // must answer from post-reassignment pairs
    factRows(24 until 25, "b2").withColumn("fk", lit(10L))
      .write.mode("append").parquet(src)
    drain()
    dimStore.upsert(Seq((4L, "MOVED4"), (10L, "MOVED10"))
      .toDF("fk", "seg"))
    factRows(130 until 135, "b3").write.mode("append").parquet(src)
    drain()
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)),
      "index-mapped dim churn must re-enrich exactly like the rebuild")
    assert(mart.read().get.where(col("k") === 24L)
      .select("seg").head().getString(0) == "MOVED10",
      "the reassigned fact must enrich from its NEW dim row")
    // the index answered without a fact scan, and stayed exact
    assert(setOf(index.affectedKeys(Seq(4L).toDF("fk"))) ==
      setOf(store.read().get.where(col("fk") === 4L).select("k")))
    // more batches across the maintenance cadence: cursors re-point,
    // index stores stay bounded, results unchanged
    (0 until 4).foreach { i =>
      factRows(140 + i until 141 + i, s"m$i")
        .write.mode("append").parquet(src)
      drain()
    }
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)))
    assert(index.reverse.currentManifest.values.toSet.size <= 2 + 2,
      "index stores must ride the maintenance cadence")
    // replay from a fresh checkpoint converges (index cursors unknown
    // → rebuild; mapping is result-invisible)
    CdcMicroBatch.runAvailableNowCowMartDims(spark, src, schema, store,
      mart, martOf, Seq("k"), tmp("idxdrain-ck2"), dims, maint,
      indexes = Seq(index))
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)))
  }

  test("index-cursor IDENTITY GUARD: re-registering a DIFFERENT index " +
      "at the same position against an existing checkpoint rebuilds it " +
      "from scratch instead of window-loading the stale cursor " +
      "(VERDICT r20 #2)") {
    import org.apache.spark.sql.types._
    def factRows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, (k % 10).toLong, tag)).toDF("k", "fk", "tag")
    val src = tmp("idguard-src")
    val store = new graft.cdc.CowStore(spark, tmp("idguard-s"),
      Seq("k"), nBuckets = 8)
    val dimStore = new graft.cdc.CowStore(spark, tmp("idguard-d"),
      Seq("fk"), nBuckets = 4)
    val mart = new graft.cdc.CowStore(spark, tmp("idguard-m"),
      Seq("k"), nBuckets = 8)
    dimStore.writeFull((0 until 10).map(i => (i.toLong, s"seg$i"))
      .toDF("fk", "seg"))
    def martOf(df: org.apache.spark.sql.DataFrame) = {
      val dc = broadcast(dimStore.read().get)
      df.join(dc, Seq("fk"), "left")
        .select(df("k"), col("fk"), dc("seg"), df("tag"))
    }
    def newIndex(tag: String) = new graft.cdc.FkIndex(
      new graft.cdc.CowStore(spark, tmp(s"idguard-rev$tag"), Seq("fk"),
        nBuckets = 4),
      new graft.cdc.CowStore(spark, tmp(s"idguard-fwd$tag"), Seq("k"),
        nBuckets = 8),
      factKeys = Seq("k"), fkCols = Seq("fk"))
    val idxA = newIndex("A")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("fk", LongType), StructField("tag", StringType)))
    val ckpt = tmp("idguard-ck")
    def drain(idx: graft.cdc.FkIndex): Unit =
      CdcMicroBatch.runAvailableNowCowMartDims(spark, src, schema,
        store, mart, martOf, Seq("k"),  ckpt,
        Seq(graft.cdc.FkIndex.dim(dimStore, idx)), indexes = Seq(idx))
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // two drains with index A: position-0 cursor now persisted
    factRows(0 until 100, "b1").write.mode("append").parquet(src)
    drain(idxA)
    factRows(100 until 110, "b2").write.mode("append").parquet(src)
    drain(idxA)
    assert(idxA.reverse.exists)
    // RE-REGISTER: a brand-new index at the same position, same
    // checkpoint. Without the fingerprint guard the stale cursor's
    // refresh would first-load only the NEXT window into the empty
    // stores — a silently partial index under-reporting affectedKeys.
    val idxB = newIndex("B")
    assert(idxA.fingerprint != idxB.fingerprint)
    factRows(110 until 112, "b3").write.mode("append").parquet(src)
    drain(idxB)
    // idxB must hold the FULL pair set (built from scratch), so its
    // mapping equals the scan truth for every fk
    (0L until 10L).foreach { fk =>
      assert(setOf(idxB.affectedKeys(Seq(fk).toDF("fk"))) ==
        setOf(store.read().get.where(col("fk") === fk).select("k")),
        s"re-registered index under-reports fk $fk — stale cursor " +
          "was applied to the new index")
    }
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)))
  }

  test("feed-driven streaming SCD2 drain == batch Scd2 kernels over " +
      "the same I/U/D batches; unknown cursor resyncs; replay and " +
      "maintenance converge") {
    import org.apache.spark.sql.types._
    import graft.cdc.{Diff, Scd2, Upsert}
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    def batchDf(rs: Seq[(Long, String, Double, String)]) =
      rs.toDF("k", "seg", "v", "op")
    val b0 = (0L until 20L).map(k => (k, s"s${k % 4}", k * 1.0, "I"))
    // D keys deliberately disjoint from the %3 U set (applyCdc wants
    // ≤1 row per key) so each event kind's effect is separately visible
    val b1 = (0L until 20L).filter(_ % 3 == 0)
        .map(k => (k, "MOVED", k * 1.0, "U")) ++
      Seq(16L, 17L, 19L).map(k => (k, "x", 0.0, "D")) ++
      (30L until 35L).map(k => (k, "NEW", k * 1.0, "I"))
    val b2 = Seq((0L, "BACK", 0.0, "U"), (3L, "y", 0.0, "D"),
      (40L, "LATE", 40.0, "I"))
    val src = tmp("scd2drain-src")
    val store = new graft.cdc.CowStore(spark, tmp("scd2drain-s"),
      Seq("k"), nBuckets = 8)
    val history = new graft.cdc.CowStore(spark, tmp("scd2drain-h"),
      Seq("k"), nBuckets = 8)
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("seg", StringType), StructField("v", DoubleType),
      StructField("op", StringType)))
    val ckpt = tmp("scd2drain-ck")
    def drain(): Unit = CdcMicroBatch.runAvailableNowCowScd2(spark, src,
      schema, store, history, Seq("k"), Seq("seg"), "op", ckpt,
      bid => ts(bid.toInt + 1),
      Some(CowMaintenance(compactEvery = 2, maxReferenced = 3)))
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // batch 0: first load → history inits from the drained snapshot
    batchDf(b0).write.mode("append").parquet(src)
    drain()
    val src0 = batchDf(b0).where(col("op") =!= "D").drop("op")
    var expected = Scd2.init(src0, ts(1))
    assert(setOf(history.read().get) == setOf(expected))
    // batch 1: U closes+inserts, D closes with no successor, I inserts
    batchDf(b1).write.mode("append").parquet(src)
    drain()
    val src1 = Upsert.applyOps(src0, batchDf(b1), Seq("k"), "op")
    expected = Scd2.applyChanges(expected,
      Diff.changeRows(src0, src1, Seq("k")), Seq("k"), Seq("seg"),
      ts(2), invalidateHardDeletes = true)
    assert(setOf(history.read().get) == setOf(expected))
    // unknown cursor (marker lost): the drain resyncs full-staged —
    // which must equal the feed-driven chain over the same window
    assert(new java.io.File(ckpt, "graft_scd2_cursor").delete())
    batchDf(b2).write.mode("append").parquet(src)
    drain()
    val src2 = Upsert.applyOps(src1, batchDf(b2), Seq("k"), "op")
    expected = Scd2.applyChanges(expected,
      Diff.changeRows(src1, src2, Seq("k")), Seq("k"), Seq("seg"),
      ts(3), invalidateHardDeletes = true)
    assert(setOf(history.read().get) == setOf(expected))
    // the spot checks that make the parity meaningful: a closed+
    // reopened key, a hard-deleted key with no open row, a late insert
    val h = history.read().get
    assert(h.where(col("k") === 0L).count() == 3) // s0 → MOVED → BACK
    assert(h.where(col("k") === 16L && col("valid_to").isNull)
      .count() == 0, "hard-deleted key has no open row")
    assert(h.where(col("k") === 40L && col("valid_to").isNull)
      .count() == 1)
    // replay with the same checkpoint and no new files: unchanged
    drain()
    assert(setOf(history.read().get) == setOf(expected))
  }

  test("merge-on-read through the drains: mor mart drain == COW mart " +
      "drain, registers carry the debt until the maintenance fold, " +
      "and a replayed delta commit CONVERGES in results") {
    import org.apache.spark.sql.types._
    def rows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, tag, k * 10.0)).toDF("k", "tag", "v")
    def martOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("tag"), (col("v") * 2).as("v2"))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("tag", StringType), StructField("v", DoubleType)))
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val src = tmp("mordrain-src")
    val store = new graft.cdc.CowStore(spark, tmp("mordrain-s"),
      Seq("k"), nBuckets = 8)
    val mart = new graft.cdc.CowStore(spark, tmp("mordrain-m"),
      Seq("k"), nBuckets = 8)
    store.writeFull(rows(0 until 80, "old"))
    val ckpt = tmp("mordrain-ck")
    val maint = Some(CowMaintenance(compactEvery = 3, maxReferenced = 2))
    def drain(ck: String): Unit =
      CdcMicroBatch.runAvailableNowCowMart(spark, src, schema, store,
        mart, martOf, Seq("k"), ck, maint, mor = true)
    // batch 0: mart builds; batches 1-2: updates delta-commit — the
    // manifest must NOT advance ownership for them (write ∝ batch)
    rows(0 until 5, "b0").write.mode("append").parquet(src)
    drain(ckpt)
    val ownersAfterB0 = store.currentManifest.values.toSet
    rows(5 until 15, "b1").write.mode("append").parquet(src)
    drain(ckpt)
    assert(store.currentManifest.values.toSet == ownersAfterB0,
      "a MoR drain batch must not rewrite any data bucket")
    assert(store.pendingDlBuckets.nonEmpty, "delta register must carry b1")
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)),
      "the mart patch reads THROUGH the live delta register")
    // batch at the cadence (batchId 2 with a 3-cadence → not yet;
    // drive to the fold and check the debt clears)
    rows(15 until 20, "b2").write.mode("append").parquet(src)
    drain(ckpt)
    rows(20 until 25, "b3").write.mode("append").parquet(src)
    drain(ckpt) // batchId 3 → compact+vacuum: debt folds
    assert(store.pendingDlBuckets.isEmpty && store.pendingDvBuckets.isEmpty,
      "the maintenance cadence must fold MoR debt")
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)))
    // replay everything from a fresh checkpoint: delta commits STACK
    // register entries (layout) but results converge (winner-by-version
    // re-resolves each key to an identical row)
    drain(tmp("mordrain-ck2"))
    assert(setOf(mart.read().get) == setOf(martOf(store.read().get)),
      "replayed MoR drain must converge")
    // parity against a COW-drained twin over the same landing files
    val store2 = new graft.cdc.CowStore(spark, tmp("mordrain-s2"),
      Seq("k"), nBuckets = 8)
    val mart2 = new graft.cdc.CowStore(spark, tmp("mordrain-m2"),
      Seq("k"), nBuckets = 8)
    store2.writeFull(rows(0 until 80, "old"))
    CdcMicroBatch.runAvailableNowCowMart(spark, src, schema, store2,
      mart2, martOf, Seq("k"), tmp("mordrain-ck3"))
    assert(setOf(store.read().get) == setOf(store2.read().get),
      "mor drain and COW drain must converge to the same table")
    assert(setOf(mart.read().get) == setOf(mart2.read().get))
  }

  test("the mart drains maintain the MART store too: its referenced " +
      "version dirs stay bounded across 3× the cadence, results " +
      "unchanged (VERDICT r19 ask #3)") {
    import org.apache.spark.sql.types._
    def rows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, tag, k * 10.0)).toDF("k", "tag", "v")
    def martOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("tag"), (col("v") * 2).as("v2"))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("tag", StringType), StructField("v", DoubleType)))
    val src = tmp("martmaint-src")
    val store = new graft.cdc.CowStore(spark, tmp("martmaint-s"),
      Seq("k"), nBuckets = 8)
    val mart = new graft.cdc.CowStore(spark, tmp("martmaint-m"),
      Seq("k"), nBuckets = 8)
    store.writeFull(rows(0 until 60, "old"))
    val ckpt = tmp("martmaint-ck")
    val maint = Some(CowMaintenance(compactEvery = 2, maxReferenced = 2))
    (0 until 9).foreach { i =>
      rows(i * 3 until i * 3 + 3, s"b$i").write.mode("append").parquet(src)
      CdcMicroBatch.runAvailableNowCowMart(spark, src, schema, store,
        mart, martOf, Seq("k"), ckpt, maint)
    }
    val martOwners = mart.currentManifest.values.toSet.size
    assert(martOwners <= 2 + 2,
      s"mart version dirs must stay bounded by the cadence, got " +
        s"$martOwners referenced owners")
    assert(mart.versions().size <= 2 + 2 + 1,
      s"vacuum must reclaim the mart's retired dirs, got " +
        s"${mart.versions().size}")
    assert(mart.read().get.collect().map(_.toSeq).toSet ==
      martOf(store.read().get).collect().map(_.toSeq).toSet,
      "mart maintenance is result-invisible")
  }

  test("SCD2 drain with morDeletes: erasure events commit as " +
      "tombstones, history equals the COW-drained twin") {
    import org.apache.spark.sql.types._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    def batchDf(rs: Seq[(Long, String, Double, String)]) =
      rs.toDF("k", "seg", "v", "op")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("seg", StringType), StructField("v", DoubleType),
      StructField("op", StringType)))
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val b0 = (0L until 30L).map(k => (k, s"s${k % 3}", k * 1.0, "I"))
    // erasure-heavy second batch: many D events, few U
    val b1 = (0L until 30L).filter(_ % 2 == 0).map(k => (k, "x", 0.0, "D")) ++
      Seq((1L, "MOVED", 1.0, "U"))
    def run(tag: String, morDeletes: Boolean) = {
      val src = tmp(s"scd2mor-src-$tag")
      val store = new graft.cdc.CowStore(spark, tmp(s"scd2mor-s-$tag"),
        Seq("k"), nBuckets = 8)
      val history = new graft.cdc.CowStore(spark, tmp(s"scd2mor-h-$tag"),
        Seq("k"), nBuckets = 8)
      val ckpt = tmp(s"scd2mor-ck-$tag")
      def drain(): Unit = CdcMicroBatch.runAvailableNowCowScd2(spark,
        src, schema, store, history, Seq("k"), Seq("seg"), "op", ckpt,
        bid => ts(bid.toInt + 1), morDeletes = morDeletes)
      batchDf(b0).write.mode("append").parquet(src)
      drain()
      batchDf(b1).write.mode("append").parquet(src)
      drain()
      (store, history)
    }
    val (sMor, hMor) = run("mor", morDeletes = true)
    val (sCow, hCow) = run("cow", morDeletes = false)
    assert(sMor.pendingDvBuckets.nonEmpty,
      "the D events must have committed as live tombstones")
    assert(setOf(sMor.read().get) == setOf(sCow.read().get))
    assert(setOf(hMor.read().get) == setOf(hCow.read().get),
      "history via the register-diff change feed must equal the COW twin")
    // every erased key's history row is CLOSED, none open
    assert(hMor.read().get
      .where(col("k") % 2 === 0 && col("valid_to").isNull).count() == 0)
  }

  test("a ZERO-ROW first landing file on a never-written store is a " +
      "no-op for the mart and SCD2 drains, not an NPE (ADVICE r19); " +
      "the next real batch drains normally") {
    import org.apache.spark.sql.types._
    def rows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, tag, k * 10.0, "I")).toDF("k", "tag", "v", "op")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("tag", StringType), StructField("v", DoubleType),
      StructField("op", StringType)))
    def martOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), (col("v") * 2).as("v2"))
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // mart drain: empty file first — applyCdc/upsert early-return, the
    // store has no version, the drain must skip instead of rebuild().get
    val srcM = tmp("empty1-src")
    val storeM = new graft.cdc.CowStore(spark, tmp("empty1-s"),
      Seq("k"), nBuckets = 4)
    val martM = new graft.cdc.CowStore(spark, tmp("empty1-m"),
      Seq("k"), nBuckets = 4)
    val ckptM = tmp("empty1-ck")
    rows(0 until 0, "none").write.mode("append").parquet(srcM)
    CdcMicroBatch.runAvailableNowCowMart(spark, srcM, schema, storeM,
      martM, martOf, Seq("k"), ckptM)
    assert(!storeM.exists && !martM.exists)
    rows(0 until 20, "b1").write.mode("append").parquet(srcM)
    CdcMicroBatch.runAvailableNowCowMart(spark, srcM, schema, storeM,
      martM, martOf, Seq("k"), ckptM)
    assert(martM.read().get.collect().map(_.toSeq).toSet ==
      martOf(storeM.read().get).collect().map(_.toSeq).toSet)
    // SCD2 drain: same zero-row first file, then a real batch
    val srcS = tmp("empty2-src")
    val storeS = new graft.cdc.CowStore(spark, tmp("empty2-s"),
      Seq("k"), nBuckets = 4)
    val histS = new graft.cdc.CowStore(spark, tmp("empty2-h"),
      Seq("k"), nBuckets = 4)
    val ckptS = tmp("empty2-ck")
    rows(0 until 0, "none").write.mode("append").parquet(srcS)
    CdcMicroBatch.runAvailableNowCowScd2(spark, srcS, schema, storeS,
      histS, Seq("k"), Seq("tag"), "op", ckptS, bid => ts(bid.toInt + 1))
    assert(!storeS.exists && !histS.exists)
    rows(0 until 10, "b1").write.mode("append").parquet(srcS)
    CdcMicroBatch.runAvailableNowCowScd2(spark, srcS, schema, storeS,
      histS, Seq("k"), Seq("tag"), "op", ckptS, bid => ts(bid.toInt + 1))
    assert(histS.read().get.where(col("valid_to").isNull).count() == 10)
  }

  test("streaming upsert: two micro-batch drains converge to batch merge") {
    val src = tmp("stream-src")
    val store = new TableStore(spark, tmp("stream-store") + "/t")
    val ckpt = tmp("stream-ckpt")
    val schema = Seq((1L, "a", "2024-01-01")).toDF("id", "attr", "track").schema

    // batch 1 lands → drain
    Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-01"))
      .toDF("id", "attr", "track").write.mode("append").parquet(src)
    CdcMicroBatch.runAvailableNow(spark, src, schema, store, Seq("id"), ckpt)
    assert(store.read().get.count() == 2)

    // batch 2 lands (update id=2, insert id=3) → drain again
    Seq((2L, "b2", "2024-01-02"), (3L, "c", "2024-01-02"))
      .toDF("id", "attr", "track").write.mode("append").parquet(src)
    CdcMicroBatch.runAvailableNow(spark, src, schema, store, Seq("id"), ckpt)

    val state = store.read().get.select("id", "attr").as[(Long, String)]
      .collect().sortBy(_._1)
    assert(state.toSeq == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("gated streaming upsert: violating rows quarantined, clean rows merge") {
    import graft.quality.Check
    val src = tmp("gate-src")
    val store = new TableStore(spark, tmp("gate-store") + "/t")
    val quarantine = new AppendStore(spark, tmp("gate-q") + "/t")
    val ckpt = tmp("gate-ckpt")
    val schema = Seq((Option(1L), "a", "2024-01-01"))
      .toDF("id", "attr", "track").schema
    val rules = Seq(Check.NotNull("id"),
      Check.AcceptedValues("attr", Seq("a", "b")))

    // batch 1: one clean row, one null key, one bad attr value
    Seq((Option(1L), "a", "2024-01-01"), (Option.empty[Long], "b", "2024-01-01"),
      (Option(2L), "z", "2024-01-01"))
      .toDF("id", "attr", "track").write.mode("append").parquet(src)
    CdcMicroBatch.runAvailableNowGated(spark, src, schema, store,
      Seq("id"), ckpt, rules, quarantine)
    assert(store.read().get.select("id").as[Long].collect().toSeq == Seq(1L))
    val q1 = quarantine.read().get
      .select("id", "attr", "__violations")
      .as[(Option[Long], String, String)].collect().toSet
    assert(q1 == Set((None, "b", "not_null(id)"),
      (Some(2L), "z", "accepted_values(attr)")), s"got $q1")

    // batch 2: clean update of id=1 + another violator
    Seq((Option(1L), "b", "2024-01-02"), (Option(3L), "y", "2024-01-02"))
      .toDF("id", "attr", "track").write.mode("append").parquet(src)
    CdcMicroBatch.runAvailableNowGated(spark, src, schema, store,
      Seq("id"), ckpt, rules, quarantine)
    val state = store.read().get.select("id", "attr")
      .as[(Long, String)].collect().toSet
    assert(state == Set((1L, "b")), s"dest must hold only clean rows: $state")
    assert(quarantine.read().get.count() == 3)

    // Unique is not row-routable — the gate must refuse it loudly
    intercept[IllegalArgumentException] {
      Check.route(Seq((1L, "a")).toDF("id", "attr"),
        Seq(Check.Unique(Seq("id"))))
    }
  }

  test("streaming tumbling window agg matches the batch computation") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val batchResult = CdcMicroBatch.tumblingCounts(events)
      .orderBy("hour_start", "event_type").collect()

    // stream the same rows from parquet through the identical code path
    val dir = tmp("stream-ev")
    events.write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream.schema(events.schema).parquet(dir)
    val q = CdcMicroBatch.tumblingCounts(streamed)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamResult = spark.table("tumbling_out")
      .orderBy("hour_start", "event_type").collect()
    assert(streamResult.toSeq == batchResult.toSeq)
  }

  test("stateful sessionize: streaming (flatMapGroupsWithState) == batch") {
    import graft.streaming.Sessionize
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val batchResult = Sessionize.batch(events, gapSec = 1800)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet

    // stream the same rows + a far-future sentinel per user so the
    // watermark passes every real session's close (AvailableNow has no
    // extra trigger to fire timeouts otherwise)
    val dir = tmp("sess-ev")
    val sentinel = events.groupBy("user_id")
      .agg(max("ts").as("ts")).withColumn("ts",
        col("ts") + expr("INTERVAL 100 DAYS")).withColumn("value", lit(0.0))
      .select("user_id", "ts", "value")
    events.select("user_id", "ts", "value").unionByName(sentinel)
      .write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(events.select("user_id", "ts", "value").schema)
      .parquet(dir)
      .withWatermark("ts", "1 second")
      .as[Sessionize.SessionEvent]
    val q = Sessionize.streaming(src, gapSec = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamResult = spark.table("sessions_out")
      .where(col("n_events") > 0)
      // drop the sentinel's own single-event sessions
      .where(!(col("n_events") === 1 && col("sum_value") === 0.0))
      .collect().map(_.toSeq).toSet
    assert(streamResult == batchResult)
  }

  test("streaming dedup drain: index grows by admitted docs, rejects record dup-of") {
    import graft.streaming.DedupMicroBatch
    val src = tmp("dedup-src")
    val idxStore = new AppendStore(spark, tmp("dedup-idx") + "/t",
      IncrementalDedup.indexSortCols())
    val rejStore = new AppendStore(spark, tmp("dedup-rej") + "/t")
    val ckpt = tmp("dedup-ckpt")
    val base = "the quick brown fox jumps over the lazy dog and then runs " +
      "far away into the deep dark forest to hide from all the hunters"
    val other = "completely different content about spark query engines " +
      "processing large parquet tables with catalyst optimizer rules applied"
    val schema = Seq((1L, base)).toDF("doc_id", "text").schema

    // batch 1: two distinct docs + an intra-batch near-dup of doc 1
    Seq((1L, base), (2L, other), (3L, base.replace("lazy", "sleepy")))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    DedupMicroBatch.runAvailableNow(spark, src, schema, idxStore, rejStore,
      ckpt, threshold = 0.3)
    val indexed1 = idxStore.read().get.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(indexed1 == Set(1L, 2L), s"intra-batch near-dup must not index: $indexed1")

    // batch 2: near-dup of the indexed doc 1 + a genuinely new doc
    Seq((10L, base.replace("dog", "cat")), (11L, "entirely novel writing " +
      "about distributed systems and exactly once stream processing"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    DedupMicroBatch.runAvailableNow(spark, src, schema, idxStore, rejStore,
      ckpt, threshold = 0.3)
    val indexed2 = idxStore.read().get.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(indexed2 == Set(1L, 2L, 11L), s"got $indexed2")
    val rejects = rejStore.read().get.select("new_id", "dup_of")
      .as[(Long, Long)].collect().toSet
    assert(rejects == Set((10L, 1L)), s"got $rejects")

    // Narrow-index layout contract: band rows never carry shingle
    // arrays (the prior layout duplicated every array bands-x in the
    // persisted index), and each doc has EXACTLY one array row.
    val idx = idxStore.read().get
    assert(idx.where(col("__band") >= 0 && col("__sh").isNotNull)
      .isEmpty, "band rows must not carry shingle arrays")
    val arrRows = idx.where(col("__band") === -1)
    assert(arrRows.where(col("__sh").isNull).isEmpty,
      "array rows must carry the shingle set")
    val perDoc = arrRows.groupBy("doc_id").count()
      .where(col("count") =!= 1)
    assert(perDoc.isEmpty, "exactly one array row per indexed doc")
  }

  test("streaming SCD2 (flatMapGroupsWithState) == batch Scd2 over 3 batches") {
    import graft.cdc.Scd2
    import graft.streaming.Scd2Stream
    import graft.streaming.Scd2Stream.Scd2Event
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val t3 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")

    // k1 changes at t2 then holds; k2 is the NULL-swap change; k3 is new
    // at t2; keys absent from a batch stay open (dbt default).
    val b1 = Seq((1L, Option("a"), Option("x")), (2L, Option.empty[String], Option("x")))
      .toDF("id", "a", "b")
    val b2 = Seq((1L, Option("a"), Option("y")), (2L, Option("x"), Option.empty[String]),
      (3L, Option("c"), Option("c"))).toDF("id", "a", "b")
    val b3 = Seq((1L, Option("a"), Option("y"))).toDF("id", "a", "b")

    val batchSnap = Scd2(Scd2(Scd2.init(b1, t1), b2, Seq("id"), Seq("a", "b"), t2),
      b3, Seq("id"), Seq("a", "b"), t3)
    val batchHist = batchSnap.collect().map { r =>
      (r.getLong(0).toString, Option(r.getAs[String]("a")),
        Option(r.getAs[String]("b")),
        r.getAs[java.sql.Timestamp](Scd2.ValidFrom),
        Option(r.getAs[java.sql.Timestamp](Scd2.ValidTo)))
    }.toSet

    // Same history as a change-event stream + a far-future sentinel key
    // so the watermark passes every real key's timeout (same drain
    // pattern as the sessionize parity test).
    def ev(df: org.apache.spark.sql.DataFrame, ts: java.sql.Timestamp) =
      df.collect().map { r =>
        val vals = Seq("a", "b").flatMap(c =>
          Option(r.getAs[String](c)).map(c -> _)).toMap
        Scd2Event(r.getLong(0).toString, vals, ts)
      }.toSeq
    val sentinel = Scd2Event("__sentinel", Map("a" -> "s"),
      java.sql.Timestamp.valueOf("2024-12-01 00:00:00"))
    val dir = tmp("scd2-ev")
    (ev(b1, t1) ++ ev(b2, t2) ++ ev(b3, t3) :+ sentinel)
      .toDF().write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Scd2Event]].schema)
      .parquet(dir)
      .withWatermark("as_of", "1 second")
      .as[Scd2Event]
    val q = Scd2Stream.streaming(src, Seq("a", "b"))
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamHist = spark.table("scd2_out")
      .where(col("key") =!= "__sentinel")
      .collect().map { r =>
        val vals = r.getAs[Map[String, String]]("vals")
        (r.getAs[String]("key"), vals.get("a"), vals.get("b"),
          r.getAs[java.sql.Timestamp]("valid_from"),
          Option(r.getAs[java.sql.Timestamp]("valid_to")))
      }.toSet
    assert(streamHist == batchHist,
      s"stream/batch SCD2 divergence:\n stream=$streamHist\n batch=$batchHist")
  }

  test("streaming dedup: replaying a batch leaves index and reject log unchanged") {
    import graft.streaming.DedupMicroBatch
    val idxStore = new AppendStore(spark, tmp("dedup-rp-idx") + "/t",
      IncrementalDedup.indexSortCols())
    val rejStore = new AppendStore(spark, tmp("dedup-rp-rej") + "/t")
    val base = "the quick brown fox jumps over the lazy dog and then runs " +
      "far away into the deep dark forest to hide from all the hunters"
    val other = "completely different content about spark query engines " +
      "processing large parquet tables with catalyst optimizer rules applied"
    val b1 = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val b2 = Seq((10L, base.replace("dog", "cat")), (11L, "entirely novel " +
      "writing about distributed systems and exactly once stream processing"))
      .toDF("doc_id", "text")
    DedupMicroBatch.processBatch(b1, 0L, idxStore, rejStore, threshold = 0.3)
    DedupMicroBatch.processBatch(b2, 1L, idxStore, rejStore, threshold = 0.3)
    val idxBefore = idxStore.read().get.collect().map(_.toSeq).toSet
    val rejBefore = rejStore.read().get.collect().map(_.toSeq).toSet

    // crash after both writes, before the checkpoint commit → the source
    // re-delivers batch 2 verbatim; the state transition must converge
    DedupMicroBatch.processBatch(b2, 1L, idxStore, rejStore, threshold = 0.3)
    assert(idxStore.read().get.collect().map(_.toSeq).toSet == idxBefore,
      "replayed batch mutated the signature index")
    assert(rejStore.read().get.collect().map(_.toSeq).toSet == rejBefore,
      "replayed batch double-counted the reject log")
    val rejects = rejStore.read().get.select("new_id", "dup_of")
      .as[(Long, Long)].collect().toSet
    assert(rejects == Set((10L, 1L)), s"got $rejects")
  }

  test("incremental dedup probe: bloom on the index scan + pushed prunable filters") {
    val idxStore = new AppendStore(spark, tmp("prune-idx") + "/t",
      IncrementalDedup.indexSortCols())
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
    idxStore.write(IncrementalDedup.index(corpus), 0L)
    val idx = idxStore.read().get
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "fresh writing with entirely original vocabulary and phrasing"))
      .toDF("doc_id", "text")

    // The index-side band scan must carry (a) the batch-key bloom — the
    // map-side row cut that keeps join input ∝ batch — and (b) the
    // pushed `__band >= 0`, which with the sorted segment layout skips
    // the array-row row groups at the parquet reader.
    val matches = IncrementalDedup.matchAgainst(idx, batch, threshold = 0.3)
    val mPlan = matches.queryExecution.executedPlan.toString
    assert(mPlan.contains("bloom_might_contain_long"),
      s"index scan lost the batch-key bloom probe:\n$mPlan")
    assert(mPlan.contains("GreaterThanOrEqual(__band,0)"),
      s"band filter not pushed to the index scan:\n$mPlan")

    // The membership probe must push the batch's id range (row-group
    // prunable on the sorted layout) and never aggregate the corpus.
    val adm = IncrementalDedup.admitted(idx, batch, matches)
    val aPlan = adm.queryExecution.executedPlan.toString
    assert(aPlan.contains("EqualTo(__band,-1)"),
      s"array-row filter not pushed:\n$aPlan")
    assert(aPlan.contains("GreaterThanOrEqual(doc_id,"),
      s"batch id lower bound not pushed:\n$aPlan")
    // the PushedFilters display string truncates, so pin the upper
    // bound on the Filter condition itself
    assert("doc_id#\\d+L? <= 11".r.findFirstIn(aPlan).isDefined,
      s"batch id upper bound missing from the index scan:\n$aPlan")

    // probe shape changed, semantics didn't
    assert(matches.select("new_id", "dup_of").as[(Long, Long)]
      .collect().toSet == Set((10L, 1L)))
    assert(adm.select("doc_id").as[Long].collect().toSet == Set(11L))
  }

  test("bloom probe cuts index rows entering the band join (metrics)") {
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    val idxStore = new AppendStore(spark, tmp("bloomcut-idx") + "/t",
      IncrementalDedup.indexSortCols())
    val corpus = (1 to 200).map(i => (i.toLong,
      s"corpus document $i speaks of matters ${i * 7} ${i * 13} " +
        s"${i * 29} ${i * 31} and nothing else of note"))
      .toDF("doc_id", "text")
    idxStore.write(IncrementalDedup.index(corpus), 0L)
    val idx = idxStore.read().get
    val batch = Seq((900L, "a single probe document with its own fresh " +
      "vocabulary entirely unlike the indexed corpus"))
      .toDF("doc_id", "text")
    // AQE off so the executed plan is directly traversable for metrics;
    // restore whatever the suite was running with, not a hardcoded value
    val aqePrev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val matches = IncrementalDedup.matchAgainst(idx, batch, threshold = 0.5)
      matches.collect()
      val plan = matches.queryExecution.executedPlan
      val bloomFilters = plan.collect {
        case f: FilterExec
            if f.condition.toString.contains("bloom_might_contain_long") => f
      }
      assert(bloomFilters.nonEmpty, s"no bloom filter node in:\n$plan")
      val f = bloomFilters.head
      val scanned = f.child.metrics("numOutputRows").value
      val survived = f.metrics("numOutputRows").value
      // 200 docs × 32 bands = 6400 narrow band rows scanned; an
      // unrelated 1-doc batch keeps ~fpp of them. The join input is
      // now ∝ batch, not ∝ index.
      assert(scanned >= 6000, s"expected the full band leg, got $scanned")
      assert(survived <= scanned / 10,
        s"bloom kept $survived of $scanned index rows — not cutting")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
  }

  test("membership probe: batch-id bloom cuts array rows under scattered ids") {
    import org.apache.spark.sql.execution.FilterExec
    // Hash-scattered ids: the batch's [min, max] spans essentially the
    // whole corpus id space, so the pushed range predicate prunes
    // NOTHING — only the batch-id bloom keeps the membership scan
    // batch-bounded (the clustered-ingest case is covered by the
    // pushed-range test above).
    def scatter(i: Int): Long = (i * 2654435761L) % 1000000007L
    val idxStore = new AppendStore(spark, tmp("scatter-idx") + "/t",
      IncrementalDedup.indexSortCols())
    def text(i: Int): String =
      s"corpus document $i speaks of matters ${i * 7} ${i * 13} " +
        s"${i * 29} ${i * 31} and nothing else of note"
    val corpus = (1 to 200).map(i => (scatter(i), text(i)))
      .toDF("doc_id", "text")
    idxStore.write(IncrementalDedup.index(corpus), 0L)
    val idx = idxStore.read().get
    // one exact resend (id 3's doc — must be dropped by the membership
    // check alone, matchAgainst filters self-matches) + one new doc
    // whose id lands at the far end of the id space
    // resent id sits at the TOP of the id space, new id at the bottom:
    // the pushed [1, scatter(3)] range covers ~96% of the corpus ids
    val batch = Seq((scatter(3), text(3)),
      (1L, "a genuinely new document with its own vocabulary"))
      .toDF("doc_id", "text")
    val noMatches = Seq.empty[(Long, Long, Double)]
      .toDF("new_id", "dup_of", "jaccard")
    val aqePrev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val adm = IncrementalDedup.admitted(idx, batch, noMatches)
      // collect() on adm ITSELF — a .select() would spawn a fresh
      // query execution and leave this plan's metrics untouched
      val rows = adm.collect()
      assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L),
        "resent doc not dropped / new doc not admitted")
      val plan = adm.queryExecution.executedPlan
      val bloomFilters = plan.collect {
        case f: FilterExec
            if f.condition.toString.contains("bloom_might_contain_long") => f
      }
      assert(bloomFilters.nonEmpty, s"no id-bloom filter node in:\n$plan")
      val f = bloomFilters.head
      val scanned = f.child.metrics("numOutputRows").value
      val survived = f.metrics("numOutputRows").value
      // 200 array rows reach the filter (the range prune is powerless
      // here); the bloom keeps ~the one resent id plus fpp noise
      assert(scanned >= 150, s"expected the array-row leg, got $scanned")
      assert(survived <= scanned / 10,
        s"id bloom kept $survived of $scanned array rows — not cutting")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
  }

  test("index segments land clustered by (band, band-hash, id)") {
    val root = tmp("sorted-idx") + "/t"
    val store = new AppendStore(spark, root, IncrementalDedup.indexSortCols())
    val docs = (1 to 60).map(i => (i.toLong,
      s"document number $i about subject ${i % 7} carrying tokens " +
        s"${i * 31} ${i * 17} ${i * 13} and a tail of filler words"))
      .toDF("doc_id", "text")
    store.write(IncrementalDedup.index(docs), 0L)
    val seg = new java.io.File(root, "seg_" + "0" * 20)
    val parts = seg.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty, s"no parquet files in $seg")
    parts.foreach { f =>
      val rows = spark.read.parquet(f.getPath)
        .select("__band", "__bh", "doc_id").collect()
        .map(r => (r.getInt(0),
          if (r.isNullAt(1)) Long.MinValue else r.getLong(1), r.getLong(2)))
        .toSeq
      assert(rows == rows.sorted,
        s"segment file ${f.getName} not clustered — row-group stats useless")
    }
  }

  test("drain compaction cadence: segments bounded, content unchanged") {
    import graft.streaming.DedupMicroBatch
    val cIdx = new AppendStore(spark, tmp("cmp-idx") + "/t",
      IncrementalDedup.indexSortCols())
    val cRej = new AppendStore(spark, tmp("cmp-rej") + "/t")
    val uIdx = new AppendStore(spark, tmp("unc-idx") + "/t",
      IncrementalDedup.indexSortCols())
    val uRej = new AppendStore(spark, tmp("unc-rej") + "/t")
    (0 until 6).foreach { b =>
      val batch = Seq(
        (b * 10L, s"batch $b first document carries distinctive tokens " +
          s"${b * 100 + 1} ${(b * 100 + 1) * 7} ${(b * 100 + 1) * 11}"),
        (b * 10L + 1, s"batch $b second text speaks about matters " +
          s"${b * 100 + 2} ${(b * 100 + 2) * 7} ${(b * 100 + 2) * 11}"))
        .toDF("doc_id", "text")
      DedupMicroBatch.processBatch(batch, b.toLong, cIdx, cRej, threshold = 0.3)
      AppendStore.maybeCompact(2, b.toLong, cIdx, cRej)
      DedupMicroBatch.processBatch(batch, b.toLong, uIdx, uRej, threshold = 0.3)
    }
    // every=2 over 6 batches: [0,3] range + segments 4, 5
    assert(cIdx.segments().size <= 3,
      s"compaction cadence did not bound segments: ${cIdx.segments()}")
    assert(cIdx.segments().size < uIdx.segments().size)
    assert(cIdx.read().get.collect().map(_.toSeq).toSet ==
      uIdx.read().get.collect().map(_.toSeq).toSet,
      "compaction changed index content")
    assert(cRej.read().get.collect().map(_.toSeq).toSet ==
      uRej.read().get.collect().map(_.toSeq).toSet,
      "compaction changed reject content")
  }

  test("streaming curate drain: split + contamination labels == batch mode") {
    import graft.operators.{Decontaminate, Sampling}
    import graft.streaming.CurateMicroBatch
    val idxStore = new AppendStore(spark, tmp("cur-idx") + "/t",
      IncrementalDedup.indexSortCols())
    val rejStore = new AppendStore(spark, tmp("cur-rej") + "/t")
    val admStore = new AppendStore(spark, tmp("cur-adm") + "/t")
    val base = "the quick brown fox jumps over the lazy dog and then runs " +
      "far away into the deep dark forest to hide from all the hunters"
    val evalTxt = "what is the capital of france paris is the capital of " +
      "france and has been since the tenth century"
    // 1/2 distinct, 3 near-dups doc 1 cross-batch, 4 contains the eval
    // passage verbatim, 5 distinct
    val all = Seq(
      (1L, base),
      (2L, "completely different content about spark query engines " +
        "processing large parquet tables with catalyst optimizer rules"),
      (3L, base.replace("dog", "cat")),
      (4L, "document discussing that " + evalTxt + " among other things"),
      (5L, "entirely novel writing about distributed systems and exactly " +
        "once stream processing guarantees"))
    val evalDocs = Seq((100L, evalTxt)).toDF("doc_id", "text")
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

    val b1 = all.take(2).toDF("doc_id", "text")
    val b2 = all.drop(2).toDF("doc_id", "text")
    CurateMicroBatch.processBatch(b1, 0L, idxStore, rejStore, admStore,
      evalDocs, weights, threshold = 0.3)
    CurateMicroBatch.processBatch(b2, 1L, idxStore, rejStore, admStore,
      evalDocs, weights, threshold = 0.3)

    val streamed = admStore.read().get
      .select("doc_id", "split", "contaminated")
      .as[(Long, String, Boolean)].collect()
      .map { case (i, s, c) => i -> (s, c) }.toMap
    // doc 3 is a near-dup of indexed doc 1 → rejected, never labeled
    assert(streamed.keySet == Set(1L, 2L, 4L, 5L), s"got ${streamed.keySet}")

    // batch mode over the full corpus: same pure per-doc labels
    val full = all.toDF("doc_id", "text")
    val batchLabels = Sampling.split(full, "doc_id", weights)
      .join(Decontaminate.flag(full, evalDocs)
        .select("doc_id", "contaminated"), Seq("doc_id"))
      .select("doc_id", "split", "contaminated")
      .as[(Long, String, Boolean)].collect()
      .map { case (i, s, c) => i -> (s, c) }.toMap
    streamed.foreach { case (id, got) =>
      assert(got == batchLabels(id),
        s"doc $id: stream=$got batch=${batchLabels(id)}")
    }
    // the contamination flag actually bites on the planted doc
    assert(streamed(4L)._2, "doc 4 contains the eval passage verbatim")
    assert(!streamed(1L)._2 && !streamed(2L)._2 && !streamed(5L)._2)
  }

  test("streaming curate: runAvailableNow drain labels across checkpointed batches") {
    import graft.streaming.CurateMicroBatch
    val src = tmp("cur-drain-src")
    val idxStore = new AppendStore(spark, tmp("cur-drain-idx") + "/t",
      IncrementalDedup.indexSortCols())
    val rejStore = new AppendStore(spark, tmp("cur-drain-rej") + "/t")
    val admStore = new AppendStore(spark, tmp("cur-drain-adm") + "/t")
    val ckpt = tmp("cur-drain-ckpt")
    val evalDocs = Seq((100L, "held out evaluation question text"))
      .toDF("doc_id", "text")
    val weights = Seq("train" -> 0.9, "test" -> 0.1)
    val base = "the quick brown fox jumps over the lazy dog and then runs " +
      "far away into the deep dark forest to hide from all the hunters"
    val schema = Seq((1L, base)).toDF("doc_id", "text").schema

    // drain 1: one distinct doc
    Seq((1L, base)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    CurateMicroBatch.runAvailableNow(spark, src, schema, idxStore, rejStore,
      admStore, evalDocs, weights, ckpt, threshold = 0.3)
    // drain 2: a near-dup of the indexed doc + a new doc — the
    // checkpoint hands the second drain a HIGHER batchId, so the
    // cross-batch index match must reject the near-dup
    Seq((10L, base.replace("dog", "cat")), (11L, "entirely novel writing " +
      "about distributed systems and exactly once stream processing"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    CurateMicroBatch.runAvailableNow(spark, src, schema, idxStore, rejStore,
      admStore, evalDocs, weights, ckpt, threshold = 0.3)

    val admitted = admStore.read().get.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(admitted.keySet == Set(1L, 11L), s"got ${admitted.keySet}")
    val rejects = rejStore.read().get.select("new_id", "dup_of")
      .as[(Long, Long)].collect().toSet
    assert(rejects == Set((10L, 1L)), s"got $rejects")
    // labels match the pure batch-mode function
    val expected = graft.operators.Sampling.split(
      Seq((1L, base), (11L, "x")).toDF("doc_id", "text"), "doc_id", weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(admitted == expected, s"stream=$admitted batch=$expected")
  }

  test("streaming curate: replaying a batch leaves the admitted store unchanged") {
    import graft.streaming.CurateMicroBatch
    val idxStore = new AppendStore(spark, tmp("cur-rp-idx") + "/t",
      IncrementalDedup.indexSortCols())
    val rejStore = new AppendStore(spark, tmp("cur-rp-rej") + "/t")
    val admStore = new AppendStore(spark, tmp("cur-rp-adm") + "/t")
    val evalDocs = Seq((100L, "held out evaluation question text"))
      .toDF("doc_id", "text")
    val weights = Seq("train" -> 0.9, "test" -> 0.1)
    val b1 = Seq((1L, "the quick brown fox jumps over the lazy dog and " +
      "then runs far away into the deep dark forest")).toDF("doc_id", "text")
    val b2 = Seq((2L, "completely different content about spark query " +
      "engines processing large parquet tables with catalyst"))
      .toDF("doc_id", "text")
    CurateMicroBatch.processBatch(b1, 0L, idxStore, rejStore, admStore,
      evalDocs, weights, threshold = 0.3)
    CurateMicroBatch.processBatch(b2, 1L, idxStore, rejStore, admStore,
      evalDocs, weights, threshold = 0.3)
    val before = admStore.read().get.collect().map(_.toSeq).toSet
    // crash after the writes, before the checkpoint commit → re-delivery
    CurateMicroBatch.processBatch(b2, 1L, idxStore, rejStore, admStore,
      evalDocs, weights, threshold = 0.3)
    assert(admStore.read().get.collect().map(_.toSeq).toSet == before,
      "replayed batch mutated the admitted store")
    assert(before.size == 2)
  }

  test("streaming SCD2 drops change events below the watermark") {
    import graft.streaming.Scd2Stream
    import graft.streaming.Scd2Stream.Scd2Event
    val dir = tmp("scd2-late")
    def land(events: Seq[Scd2Event]): Unit = {
      // one file per land(): the file source orders batches by mtime and
      // maxFilesPerTrigger=1 — multiple part-files would split/reorder
      // the intended batch boundary
      events.toDF().coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100)
    }
    // batch 1: k1 opens at June; sentinel pushes the watermark to Dec
    land(Seq(
      Scd2Event("k1", Map("a" -> "A"), java.sql.Timestamp.valueOf("2024-06-01 00:00:00")),
      Scd2Event("__s1", Map("a" -> "s"), java.sql.Timestamp.valueOf("2024-12-01 00:00:00"))))
    // batch 2: a January event for k1 — below BOTH the watermark and the
    // open version's valid_from; applying it would close June with an
    // inverted interval (valid_to Jan < valid_from Jun) and open "B"
    land(Seq(
      Scd2Event("k1", Map("a" -> "B"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))))
    // batch 3: sentinel advances the watermark past k1's timeout → the
    // surviving open version drains
    land(Seq(
      Scd2Event("__s2", Map("a" -> "s"), java.sql.Timestamp.valueOf("2025-06-01 00:00:00"))))

    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Scd2Event]].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withWatermark("as_of", "1 second")
      .as[Scd2Event]
    val q = Scd2Stream.streaming(src, Seq("a"))
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_late_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val k1 = spark.table("scd2_late_out").where(col("key") === "k1")
      .collect().map { r =>
        (r.getAs[Map[String, String]]("vals")("a"),
          r.getAs[java.sql.Timestamp]("valid_from"),
          Option(r.getAs[java.sql.Timestamp]("valid_to")))
      }.toSet
    assert(k1 == Set(("A",
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), None)),
      s"late event corrupted SCD2 history: $k1")
  }

  test("streaming sessionize drops events below the watermark") {
    import graft.streaming.Sessionize
    val dir = tmp("sess-late")
    def land(rows: Seq[(Long, java.sql.Timestamp, Double)]): Unit = {
      // one file per land() — see the SCD2 late-event test
      rows.toDF("user_id", "ts", "value").coalesce(1)
        .write.mode("append").parquet(dir)
      Thread.sleep(1100)
    }
    // batch 1: u1 has a 2-event June session; sentinel user pushes the
    // watermark to Dec (so u1's session is already watermark-final)
    land(Seq(
      (1L, java.sql.Timestamp.valueOf("2024-06-01 10:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-06-01 10:10:00"), 2.0),
      (999L, java.sql.Timestamp.valueOf("2024-12-01 00:00:00"), 0.0)))
    // batch 2: a January event for u1, far below the watermark — without
    // the guard it would merge into (extend) the June session
    land(Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 9.0)))
    // batch 3: sentinel advances the watermark → u1's session drains
    land(Seq((999L, java.sql.Timestamp.valueOf("2025-06-01 00:00:00"), 0.0)))

    val src = spark.readStream
      .schema(Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0.0))
        .toDF("user_id", "ts", "value").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withWatermark("ts", "1 second")
      .as[Sessionize.SessionEvent]
    val q = Sessionize.streaming(src, gapSec = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_late_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val u1 = spark.table("sess_late_out").where(col("user_id") === 1L)
      .select("session_start", "n_events", "sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(u1 == Set((java.sql.Timestamp.valueOf("2024-06-01 10:00:00"),
      2L, 3.0)), s"late event corrupted sessionization: $u1")
  }

  test("streaming ANN ingest: drained index == batch encode; replay idempotent") {
    import graft.operators.Pq
    import graft.streaming.AnnMicroBatch
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val model = Pq.train(e, m = 8, k = 16, iters = 4)
    val src = tmp("ann-src")
    val store = new AppendStore(spark, tmp("ann-codes") + "/t")
    val ckpt = tmp("ann-ckpt")
    // land the corpus as three arrival batches, drain after each
    val schema = e.schema
    (0 until 3).foreach { i =>
      e.where(pmod(col("vec_id"), lit(3)) === i)
        .write.mode("append").parquet(src)
      AnnMicroBatch.runAvailableNow(spark, src, schema, store, model, ckpt)
    }
    val q = e.where(col("vec_id") < 5)
    val streamed = AnnMicroBatch.search(store, model, e, q, k = 3, rerank = 20)
      .getOrElse(fail("drained store is empty"))
      .collect().map(_.toSeq).toSet
    val batch = Pq.search(Pq.encode(e, model), model, e, q, k = 3, rerank = 20)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty,
      "search over the drained code segments must equal batch encode+search")
    // replaying a batch rewrites identical content (pure transition)
    val before = store.read().get.collect().map(_.toSeq).toSet
    AnnMicroBatch.processBatch(
      e.where(pmod(col("vec_id"), lit(3)) === 1), 1L, store, model)
    val after = store.read().get.collect().map(_.toSeq).toSet
    assert(after == before, "replayed batch must leave the store unchanged")
  }

  test("streaming IVF-PQ ingest: drained == batch encode+search; replay idempotent") {
    import graft.operators.IvfPq
    import graft.streaming.AnnMicroBatch
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    // model trained once on the corpus, then FROZEN for the drain
    val (builtCodes, model) = IvfPq.build(e, nlist = 8, ivfIters = 2)
    val src = tmp("ivfpq-src")
    val store = new AppendStore(spark, tmp("ivfpq-codes") + "/t",
      AnnMicroBatch.ivfPqStoreSortCols)
    val ckpt = tmp("ivfpq-ckpt")
    val schema = e.schema
    (0 until 3).foreach { i =>
      e.where(pmod(col("vec_id"), lit(3)) === i)
        .write.mode("append").parquet(src)
      AnnMicroBatch.runAvailableNowIvfPq(spark, src, schema, store, model,
        ckpt)
    }
    // drained code content == build's own encode of the full corpus
    val drained = store.read().get
      .select("vec_id", "cell", "__codes")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toSeq)).toSet
    val built = builtCodes
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toSeq)).toSet
    assert(drained == built && built.nonEmpty,
      "cell routing + residual encode over the drain must equal build's codes")
    // search over the drained segments == search over the batch build
    val q = e.where(col("vec_id") < 5)
    val streamed = AnnMicroBatch.searchIvfPq(store, model, e, q,
        k = 3, nprobe = 6, rerank = 20)
      .getOrElse(fail("drained store is empty"))
      .collect().map(_.toSeq).toSet
    val batch = IvfPq.search(builtCodes, model, e, q,
        k = 3, nprobe = 6, rerank = 20)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
    // replaying a batch rewrites identical content (pure transition)
    val before = store.read().get.collect().map(_.toSeq).toSet
    AnnMicroBatch.processBatchIvfPq(
      e.where(pmod(col("vec_id"), lit(3)) === 1), 1L, store, model)
    val after = store.read().get.collect().map(_.toSeq).toSet
    assert(after == before, "replayed batch must leave the store unchanged")
  }

  test("stream-stream interval join: streamed == batch, inner and outer") {
    import graft.streaming.StreamJoin
    val ldir = tmp("ssj-l"); val rdir = tmp("ssj-r")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def landL(rows: Seq[(Long, java.sql.Timestamp, String)]): Unit = {
      rows.toDF("user_id", "lts", "imp").coalesce(1)
        .write.mode("append").parquet(ldir)
      Thread.sleep(1100)
    }
    def landR(rows: Seq[(Long, java.sql.Timestamp, String)]): Unit = {
      rows.toDF("user_id", "rts", "clk").coalesce(1)
        .write.mode("append").parquet(rdir)
      Thread.sleep(1100)
    }
    // u1: click inside the ±60s window + one outside; u2: no click
    // (outer row); u3: click BEFORE the impression (beforeSec side);
    // arrival is out of order across batches; key-999 sentinels push
    // BOTH watermarks far forward so outer rows drain under
    // AvailableNow.
    landL(Seq((1L, ts("2024-06-01 10:00:00"), "i1"),
      (2L, ts("2024-06-01 10:00:00"), "i2")))
    landR(Seq((1L, ts("2024-06-01 10:00:30"), "c1"),
      (1L, ts("2024-06-01 10:02:00"), "c-far"),
      (3L, ts("2024-06-01 10:00:00"), "c3")))
    landL(Seq((3L, ts("2024-06-01 10:00:50"), "i3")))
    landL(Seq((999L, ts("2025-01-01 00:00:00"), "s")))
    landR(Seq((999L, ts("2025-01-01 00:00:00"), "s")))

    val lSchema = Seq((1L, ts("2024-01-01 00:00:00"), ""))
      .toDF("user_id", "lts", "imp").schema
    val rSchema = Seq((1L, ts("2024-01-01 00:00:00"), ""))
      .toDF("user_id", "rts", "clk").schema
    def collect(joinType: String, name: String): Set[Seq[Any]] = {
      val l = spark.readStream.schema(lSchema)
        .option("maxFilesPerTrigger", 1).parquet(ldir)
      val r = spark.readStream.schema(rSchema)
        .option("maxFilesPerTrigger", 1).parquet(rdir)
      val q = StreamJoin.interval(l, r, "user_id", "lts", "rts",
          beforeSec = 60, afterSec = 60, watermarkDelay = "1 second",
          joinType = joinType)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).where(col("user_id") =!= 999L)
        .collect().map(_.toSeq).toSet
    }
    val lAll = spark.read.parquet(ldir)
    val rAll = spark.read.parquet(rdir)
    def batchOf(joinType: String): Set[Seq[Any]] =
      StreamJoin.batch(lAll, rAll, "user_id", "lts", "rts", 60, 60, joinType)
        .where(col("user_id") =!= 999L).collect().map(_.toSeq).toSet

    val inner = collect("inner", "ssj_inner")
    assert(inner == batchOf("inner") && inner.size == 2,
      s"inner parity (u1+c1, u3+c3): $inner vs ${batchOf("inner")}")
    val outer = collect("left_outer", "ssj_outer")
    assert(outer == batchOf("left_outer") && outer.size == 3,
      s"left_outer parity (+u2 unmatched): $outer vs ${batchOf("left_outer")}")
    assert(outer.exists(r => r.head == 2L && r(3) == null),
      s"u2 must surface with null right side: $outer")
  }

  test("stream-stream join: same ts name on both sides is suffixed _r") {
    import graft.streaming.StreamJoin
    // the natural call passes leftTs = rightTs = "ts"; right's ts must
    // come back as ts_r or every downstream col("ts") is ambiguous
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, ts("2024-06-01 10:00:00"), "i1"))
      .toDF("user_id", "ts", "imp")
    val r = Seq((1L, ts("2024-06-01 10:00:30"), "c1"),
      (1L, ts("2024-06-01 10:05:00"), "c-far"))
      .toDF("user_id", "ts", "clk")
    val out = StreamJoin.batch(l, r, "user_id", "ts", "ts", 60, 60)
    assert(out.columns.count(_ == "ts") == 1 && out.columns.contains("ts_r"),
      s"right ts must be suffixed: ${out.columns.toSeq}")
    val got = out.select(col("ts"), col("ts_r"), col("clk"))
      .as[(java.sql.Timestamp, java.sql.Timestamp, String)].collect().toSeq
    assert(got == Seq((ts("2024-06-01 10:00:00"),
      ts("2024-06-01 10:00:30"), "c1")))
  }

  test("multimodal phash: dHash-by-construction, re-encode dedup, stub fallback") {
    // cellPatternImage is built so its dHash IS the requested bits
    val bitsA = 0x5A3C96E1D4B27F08L
    val bitsB = bitsA ^ 0x0FF0F00FF00FF0F0L // hamming 32 from A
    val pngA = Multimodal.cellPatternImage(bitsA, "png")
    assert(Multimodal.dHash64(pngA).contains(bitsA),
      "PNG round-trip must reproduce the constructed dHash exactly")
    // the SAME pixels through lossy JPEG stay within the dedup radius
    val jpgA = Multimodal.cellPatternImage(bitsA, "jpg", quality = 0.7f)
    val hJpg = Multimodal.dHash64(jpgA).getOrElse(fail("jpeg must decode"))
    assert(java.lang.Long.bitCount(hJpg ^ bitsA) <= 4,
      s"JPEG re-encode drifted ${java.lang.Long.bitCount(hJpg ^ bitsA)} bits")
    assert(!java.util.Arrays.equals(pngA, jpgA),
      "the two encodings must differ at the byte level (that's the point)")

    // planted corpus: (1,2) = same image re-encoded; 3 = distinct image;
    // (4,5) = byte-identical undecodable payloads; 6 = other garbage
    val garbage = "not-an-image-payload-0123456789".getBytes
    val garbage2 = "different-garbage-payload".getBytes
    val media = Seq(
      (1L, pngA), (2L, jpgA),
      (3L, Multimodal.cellPatternImage(bitsB, "png")),
      (4L, garbage), (5L, garbage.clone()), (6L, garbage2))
      .toDF("media_id", "payload")
    val pairs = Multimodal.phashDupPairs(media)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (4L, 5L)),
      s"re-encoded dup + exact-byte stub dup only: $pairs")
    val canon = Multimodal.phashDedup(media)
      .as[(Long, Long)].collect().toMap
    assert(canon == Map(1L -> 1L, 2L -> 1L, 3L -> 3L,
      4L -> 4L, 5L -> 4L, 6L -> 6L), s"canon map: $canon")
  }

  test("multimodal ahash: aHash-by-construction, re-encode dedup, modality fence") {
    // toneEnvelopeAudio is built so its aHash IS the requested bits
    val bitsA = 0x5A3C96E1D4B27F08L
    val bitsB = bitsA ^ 0x0FF0F00FF00FF0F0L // hamming 32 from A
    val wavA = Multimodal.toneEnvelopeAudio(bitsA, "wav16")
    assert(Multimodal.aHash64(wavA).contains(bitsA),
      "WAV-16 round-trip must reproduce the constructed aHash exactly")
    // container re-encode (AIFF big-endian) and lossy 8-bit re-encode
    // of the SAME clip stay within the dedup radius
    val aiffA = Multimodal.toneEnvelopeAudio(bitsA, "aiff16")
    val wav8A = Multimodal.toneEnvelopeAudio(bitsA, "wav8")
    assert(Multimodal.aHash64(aiffA).contains(bitsA),
      "AIFF re-encode of the same samples must hash identically")
    val h8 = Multimodal.aHash64(wav8A).getOrElse(fail("wav8 must decode"))
    assert(java.lang.Long.bitCount(h8 ^ bitsA) <= 4,
      s"8-bit re-encode drifted ${java.lang.Long.bitCount(h8 ^ bitsA)} bits")
    assert(!java.util.Arrays.equals(wavA, aiffA),
      "the two encodings must differ at the byte level (that's the point)")

    // planted corpus: (1,2,3) = same clip re-encoded; 4 = distinct clip;
    // 7 = an IMAGE constructed to the SAME bits (modality fence: a
    // matching hash across modalities must never pair)
    val media = Seq(
      (1L, wavA), (2L, aiffA), (3L, wav8A),
      (4L, Multimodal.toneEnvelopeAudio(bitsB, "wav16")),
      (7L, Multimodal.cellPatternImage(bitsA, "png")))
      .toDF("media_id", "payload")
    val pairs = Multimodal.phashDupPairs(media)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"re-encoded clip pairs only — no cross-modality match: $pairs")
    val canon = Multimodal.phashDedup(media)
      .as[(Long, Long)].collect().toMap
    assert(canon == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 7L -> 7L),
      s"canon map: $canon")
  }

  test("audio decode decimation: long clips subsample past the frame " +
      "cap yet hash identically across re-encodings") {
    val bits = 0xC4D1E0F39A2B5786L
    // perBin 2000 → 144k frames (18 s at 8 kHz) — past the 65536-frame
    // cap, stride 3; the short 0.72 s clips in the ahash test stay on
    // the bit-identical full-rate path (stride 1)
    val wavL = Multimodal.toneEnvelopeAudio(bits, "wav16", perBin = 2000)
    // decimation actually engaged: 144k frames decode to 48k samples,
    // while an uncapped decode keeps all of them
    assert(Multimodal.monoSamples(wavL).get.length == 48000)
    assert(Multimodal.monoSamples(wavL, Int.MaxValue).get.length == 144000)
    // the envelope fingerprint survives decimation exactly — and the
    // dedup contract (container + lossy re-encodes hash together)
    // holds on the decimated path too
    assert(Multimodal.aHash64(wavL).contains(bits))
    assert(Multimodal.aHash64(
      Multimodal.toneEnvelopeAudio(bits, "aiff16", perBin = 2000))
      .contains(bits))
    val h8 = Multimodal.aHash64(
      Multimodal.toneEnvelopeAudio(bits, "wav8", perBin = 2000))
      .getOrElse(fail("wav8 must decode"))
    assert(java.lang.Long.bitCount(h8 ^ bits) <= 4,
      s"8-bit long-clip re-encode drifted ${java.lang.Long.bitCount(h8 ^ bits)} bits")
  }

  test("multimodal: stub decode is deterministic, batch shape preserved") {
    val media = Seq((1L, "image", "fake-jpeg-bytes-here".getBytes),
      (2L, "audio", "fake-wav-bytes".getBytes))
      .toDF("media_id", "kind", "payload")
    val out1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val out2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(out1.map(_.feature.toSeq).toSeq == out2.map(_.feature.toSeq).toSeq)
    assert(out1(0).n_bytes == "fake-jpeg-bytes-here".getBytes.length)
    assert(out1.forall(f => f.width >= 16 && f.feature.length == 8))
    val meta = Multimodal.describePayloads(media)
    assert(meta.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "content_hash", "magic"))
  }

  test("multimodal: real JDK decode for PNG and WAV, stub fallback for video") {
    // PNG 20x10, left half black / right half white — luminance feature
    // must split cleanly across the 8 vertical strips
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20)
      img.setRGB(x, y, if (x < 10) 0x000000 else 0xFFFFFF)
    val png = {
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", b)
      b.toByteArray
    }
    // WAV mono 16-bit PCM: silent first half, loud second half
    val pcm = new Array[Byte](16000)
    for (i <- 4000 until 8000) {
      pcm(2 * i) = (20000 & 0xFF).toByte
      pcm(2 * i + 1) = ((20000 >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val wav = {
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 8000)
      val b = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, b)
      b.toByteArray
    }
    val junk = Array[Byte](1, 2, 3, 4)
    val media = Seq((1L, "image", png), (2L, "audio", wav), (3L, "video", junk))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)

    assert(out(0).width == 20 && out(0).height == 10, "real PNG dims")
    assert(out(0).feature.take(4).forall(_ < 0.1f) &&
      out(0).feature.drop(4).forall(_ > 0.9f),
      s"luminance strips: ${out(0).feature.toSeq}")
    assert(out(1).width == 1 && out(1).height == 8000, "WAV channels/frames")
    assert(out(1).feature.take(4).forall(_ < 0.01f) &&
      out(1).feature.drop(4).forall(f => f > 0.5f && f < 0.7f),
      s"RMS bins: ${out(1).feature.toSeq}")
    // undecodable bytes fall back to the deterministic stub, not a throw
    val stub = Multimodal.stubDecode(3L, "video", junk)
    assert(out(2).width == stub.width && out(2).height == stub.height &&
      out(2).feature.toSeq == stub.feature.toSeq)

    // AIFF is big-endian PCM — same samples must yield the same RMS
    // bins through the other endianness branch
    val aiff = {
      val be = new Array[Byte](16000)
      for (i <- 4000 until 8000) {
        be(2 * i) = ((20000 >> 8) & 0xFF).toByte
        be(2 * i + 1) = (20000 & 0xFF).toByte
      }
      val bfmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(be), bfmt, 8000)
      val b = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.AIFF, b)
      b.toByteArray
    }
    val aiffDecoded = Multimodal.decodeAudio(aiff)
    assert(aiffDecoded.isDefined, "JDK must decode AIFF")
    val (ch, frames, bins) = aiffDecoded.get
    assert(ch == 1 && frames == 8000)
    assert(bins.take(4).forall(_ < 0.01f) &&
      bins.drop(4).forall(f => f > 0.5f && f < 0.7f),
      s"AIFF RMS bins: ${bins.toSeq}")

    // real resize: 20x10 bichrome → 8x8 gray raster, left dark/right light
    val r = Multimodal.resize(png, 8)
    assert(r.length == 64)
    assert((0 until 8).forall(y => (r(y * 8) & 0xFF) < 64 &&
      (r(y * 8 + 7) & 0xFF) > 192), "resized raster keeps the split")
  }

  test("multimodal resize + frame sampling: deterministic, shape-correct") {
    val payload = Array.tabulate(1000)(i => (i % 251).toByte)
    val resized = Multimodal.stubResize(payload, 16)
    assert(resized.length == 256)
    assert(resized.toSeq == Multimodal.stubResize(payload, 16).toSeq)
    val frames = Multimodal.stubFrameSample(payload, frames = 8, stride = 2)
    assert(frames.map(_._1) == Seq(0, 2, 4, 6))
    assert(frames.forall(_._2.length == 125))
    // distributed path: one row in → sampled frames out
    val media = Seq((1L, "video", payload)).toDF("media_id", "kind", "payload")
    val out = Multimodal.sampleFrames(media).collect()
    assert(out.length == 4 && out.forall(_.media_id == 1L))
  }

  test("pipeline runner: full DAG lands all marts; rerun is stable") {
    val root = tmp("pipeline")
    val asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val r1 = Runner.runAll(spark, "/root/testdata/sf0.001", root, asOf)
    assert(r1.rawEvents == 1000)
    assert(r1.dimCustomers == 150)
    assert(r1.factRows == 6000)
    // rerun: nothing changed upstream → same counts (idempotent)
    val r2 = Runner.runAll(spark, "/root/testdata/sf0.001", root,
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
    assert(r2 == r1)
    // fact store is month-partitioned on disk (partition pruning works)
    val factDir = new java.io.File(s"$root/fact_lineitem")
    val versions = factDir.listFiles().filter(_.getName.startsWith("v_"))
    assert(versions.nonEmpty &&
      versions.head.listFiles().exists(_.getName.startsWith("ship_month=")))
  }

  test("pinned mart build: staggered staging loads would orphan fact " +
      "rows; the ConsistentRead-pinned build never does") {
    val sf = "/root/testdata/sf0.001"
    // Causal load cursor: a line item "arrives" with its order (a
    // child committed by the source after its parent — the property
    // the reference's updated_at cursors have). The synthetic event
    // times do NOT have it (~47% of lineitems "ship" before their
    // order's date), which is precisely why the pin must run on load
    // cursors, not business time.
    val liFull = Staging.stgLineitem(Tables(spark, sf, "lineitem"))
      .withColumn("arrived_at", col("order_id"))
    val ordFull = Staging.stgOrders(Tables(spark, sf, "orders"))
      .withColumn("arrived_at", col("order_id"))
    // the reference's cadence skew (all_schedules.py:12-52): the
    // orders extract lags the lineitem extract
    val ordLagged = ordFull.where(col("arrived_at") <= 1000)
    val liAhead = liFull.where(col("arrived_at") <= 1200)
    // unpinned build (the reference's): orphan fact rows — line items
    // whose order row hasn't loaded yet join to NULL customer
    val unpinned = Marts.factLineitem(liAhead, ordLagged)
    val orphans = unpinned.where(col("customer_id").isNull).count()
    assert(orphans > 0, "fixture must exhibit the staggered-load skew")
    // pinned build: both inputs held to the max common load instant —
    // zero orphans, and exactly the join as of that one instant
    val pinned = Marts.factLineitemPinned(liAhead, ordLagged,
      liTrack = "arrived_at", ordTrack = "arrived_at")
    assert(pinned.where(col("customer_id").isNull).count() == 0)
    assert(pinned.count() ==
      Marts.factLineitem(liAhead.where(col("arrived_at") <= 1000),
        ordLagged).count())
    // snapshot property holds for ANY orderable cursor, causal or
    // not: pinning on the (non-causal) event times equals filtering
    // both sides at the common instant
    val wm = graft.cdc.ConsistentRead
      .commonWatermarkFrame(Seq(liFull -> "ship_ts",
        ordLagged -> "created_at"))
      .select(date_format(col("__wm"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0)
    val pinnedEv = Marts.factLineitemPinned(liFull, ordLagged)
    val atInstant = Marts.factLineitem(
      liFull.where(col("ship_ts") <= lit(wm).cast("timestamp")),
      ordLagged.where(col("created_at") <= lit(wm).cast("timestamp")))
    assert(pinnedEv.count() == atInstant.count())
    assert(pinnedEv.exceptAll(atInstant).isEmpty)
    // and the full DAG runs end-to-end in pinned mode
    val r = Runner.runAll(spark, sf, tmp("pipeline-pinned"),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), pinMarts = true)
    assert(r.factRows > 0 && r.factRows ==
      Marts.factLineitemPinned(
        Staging.stgLineitem(Tables(spark, sf, "lineitem")),
        Staging.stgOrders(Tables(spark, sf, "orders"))).count())
  }
}
