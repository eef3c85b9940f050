package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc._

/** CDC kernel behavior — upsert idempotency, dedup invariant, full-load
  * quirk, snapshot-partition overwrite, SCD2 scenario (the reference's
  * manual verification recipe, README.md:69-88), TableStore atomicity.
  */
class CdcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  import scala.collection.JavaConverters._
  private def df(rows: Seq[(Long, String, String)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("attr", StringType),
      StructField("track", StringType)))
    spark.createDataFrame(
      rows.map { case (i, a, t) => org.apache.spark.sql.Row(i, a, t) }.asJava,
      schema)
  }

  test("upsert replaces matching keys and appends new ones") {
    val dest = df(Seq((1L, "a", "t1"), (2L, "b", "t1")))
    val inc = df(Seq((2L, "b2", "t2"), (3L, "c", "t2")))
    val out = Upsert(dest, inc, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("upsert is idempotent: merge(merge(s,b),b) == merge(s,b)") {
    val dest = df(Seq((1L, "a", "t1"), (2L, "b", "t1")))
    val inc = df(Seq((2L, "b2", "t2"), (3L, "c", "t2")))
    val once = Upsert(dest, inc, Seq("id"))
    val twice = Upsert(once, inc, Seq("id"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("upsert with empty incoming returns dest unchanged") {
    val dest = df(Seq((1L, "a", "t1")))
    val inc = df(Nil)
    assert(Upsert(dest, inc, Seq("id")).count() == 1)
  }

  test("dedup-latest keeps exactly one row per key, the max track") {
    val d = df(Seq((1L, "old", "t1"), (1L, "new", "t3"), (1L, "mid", "t2"),
      (2L, "only", "t1")))
    val out = DedupLatest(d, Seq("id"), "track", Seq("attr")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "new"), (2L, "only")))
  }

  test("dedup-latest: null tracks lose to any non-null; all-null key " +
      "survives by tie-break (desc NULLS LAST)") {
    import spark.implicits._
    val d = Seq((1L, "kept", Some("t2")), (1L, "nulled", None),
      (2L, "alsoNull", None), (2L, "win", Some("t0")),
      (3L, "onlyNull", None), (3L, "z_wins_tie", None))
      .toDF("id", "attr", "track")
    val out = DedupLatest.byWindow(d, Seq("id"), "track", Seq("attr"))
      .select("id", "attr").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq ==
      Seq((1L, "kept"), (2L, "win"), (3L, "z_wins_tie")))
    // the default (sort-aggregate) form must pick the same rows (total
    // tie-break): null struct fields are smallest, so max prefers
    // non-null tracks exactly like the window's desc NULLS LAST
    val alt = DedupLatest(d, Seq("id"), "track", Seq("attr"))
      .select("id", "attr").as[(Long, String)].collect().sortBy(_._1)
    assert(alt.toSeq == out.toSeq)
  }

  test("dedup-latest: MapType payload works (window orders only by " +
      "track); the sort-aggregate variant refuses it") {
    import spark.implicits._
    val d = Seq((1L, Map("k" -> "old"), "t1"), (1L, Map("k" -> "new"), "t2"))
      .toDF("id", "payload", "track")
    val out = DedupLatest(d, Seq("id"), "track").collect()
    assert(out.length == 1 && out.head.getString(2) == "t2")
    assert(out.head.getMap[String, String](1).get("k").contains("new"))
    intercept[IllegalArgumentException] {
      DedupLatest.bySortAggregate(d, Seq("id"), "track")
    }
  }

  test("C2 invariant: after withDedup every key has exactly one row") {
    val dest = df(Seq((1L, "a", "t1"), (1L, "dup", "t0"), (2L, "b", "t1")))
    val inc = df(Seq((1L, "a2", "t2"), (3L, "c", "t1")))
    val out = Upsert.withDedup(dest, inc, Seq("id"), "track", Seq("attr"))
    assert(out.groupBy("id").count().where(col("count") > 1).isEmpty)
  }

  test("TableStore: versioned writes, atomic pointer, vacuum") {
    val root = tmpDir("tstore")
    val store = new TableStore(spark, root)
    assert(store.read().isEmpty && !store.exists)
    store.write(df(Seq((1L, "a", "t1"))))
    assert(store.read().get.count() == 1)
    store.write(df(Seq((1L, "a", "t1"), (2L, "b", "t1"))))
    assert(store.read().get.count() == 2)
    // previous version still intact until vacuum
    assert(new java.io.File(root, "v_00000001").exists())
    store.vacuum(keep = 1)
    assert(!new java.io.File(root, "v_00000001").exists())
    assert(store.read().get.count() == 2)
  }

  test("TableStore writeSized: file count tracks the size estimate") {
    val root = tmpDir("tsized")
    val store = new TableStore(spark, root)
    val wide = spark.range(20000)
      .withColumn("pad", expr("repeat(uuid(), 8)"))
    // huge target -> everything in one file regardless of upstream
    // partitioning; tiny target -> many files; count returned == files
    val n1 = store.writeSized(wide.repartition(7), targetFileBytes = 1L << 40)
    assert(n1 == 1)
    def parts(v: Int): Int =
      new java.io.File(root, f"v_$v%08d").listFiles()
        .count(_.getName.startsWith("part-"))
    assert(parts(1) == 1)
    val n2 = store.writeSized(wide, targetFileBytes = 16L << 10)
    assert(n2 > 1 && parts(2) == n2)
    assert(store.read().get.count() == 20000)
    // bucketed stores refuse sizing (file count is bucket-driven)
    val bStore = new TableStore(spark, tmpDir("tsizedb"),
      bucketBy = Some((4, Seq("id"))))
    intercept[IllegalArgumentException] {
      bStore.writeSized(wide)
    }
  }

  test("TableStore writeSized: sentinel and product estimates are clamped") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val store = new TableStore(spark, tmpDir("tsclamp"))
    // RDD-backed frame: the plan has no stats, so sizeInBytes reports
    // the defaultSizeInBytes sentinel — the count-based fallback must
    // size it at 1 file, not 2^18 tiny ones.
    val rdd = spark.sparkContext.parallelize((1 to 100).map(i => Row(i.toLong)))
    val noStats = spark.createDataFrame(rdd,
      StructType(Seq(StructField("id", LongType))))
    assert(store.writeSized(noStats) == 1)
    // joined frame: without CBO the plan estimate is the PRODUCT of
    // the children's sizes (orders of magnitude over the real output);
    // the maxPartitions clamp keeps the file count sane.
    val j = spark.range(200000).toDF("id")
      .join(spark.range(200000).toDF("id"), "id")
    val prodEst = j.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(prodEst > BigInt(200000L * 8) * 100,
      s"precondition: join estimate must be a blow-up, got $prodEst")
    val n = store.writeSized(j, targetFileBytes = 4L << 10, maxPartitions = 16)
    assert(n == 16)
    assert(store.read().get.count() == 200000)
  }

  test("TableStore time travel: past versions readable until vacuumed") {
    val root = tmpDir("ttravel")
    val store = new TableStore(spark, root)
    store.write(df(Seq((1L, "v1", "t1"))))
    store.write(df(Seq((1L, "v2", "t2"), (2L, "b", "t2"))))
    assert(store.versions() == Seq(1, 2))
    assert(store.readVersion(1).get.count() == 1)
    assert(store.readVersion(2).get.count() == 2)
    assert(store.readVersion(3).isEmpty)
    store.vacuum(keep = 1)
    assert(store.readVersion(1).isEmpty)
    assert(store.read().get.count() == 2)
  }

  test("full load empty-source quirk: stale data survives by default") {
    val root = tmpDir("fullload")
    val store = new TableStore(spark, root)
    store.write(df(Seq((1L, "stale", "t1"))))
    FullLoad(store, df(Nil))                    // reference behavior: no-op
    assert(store.read().get.count() == 1)
    FullLoad(store, df(Nil), strictEmpty = true) // fixed behavior: truncate
    assert(store.read().get.count() == 0)
  }

  test("snapshot load: same-day rerun is idempotent, other days untouched") {
    val path = tmpDir("snap") + "/t"
    val day1 = java.time.LocalDate.parse("2024-01-01")
    val day2 = java.time.LocalDate.parse("2024-01-02")
    SnapshotLoad(spark, path, df(Seq((1L, "d1", "t1"))), "snap_date", day1)
    SnapshotLoad(spark, path, df(Seq((2L, "d2", "t1"))), "snap_date", day2)
    // rerun day2 with different content → replaces only day2
    SnapshotLoad(spark, path, df(Seq((3L, "d2-rerun", "t2"))), "snap_date", day2)
    val out = SnapshotLoad.read(spark, path)
    assert(out.count() == 2)
    assert(out.where(col("snap_date") === "2024-01-01").head().getLong(0) == 1L)
    assert(out.where(col("snap_date") === "2024-01-02").head().getLong(0) == 3L)
  }

  test("watermark: max over dest; None for missing/empty table") {
    assert(Watermark.lastLoaded(None, "track").isEmpty)
    assert(Watermark.lastLoaded(Some(df(Nil)), "track").isEmpty)
    assert(Watermark.lastLoaded(Some(df(Seq((1L, "a", "t1"), (2L, "b", "t9")))),
      "track").contains("t9"))
    val d = df(Seq((1L, "a", "t1"), (2L, "b", "t2"), (3L, "c", "t3")))
    assert(Watermark.strictAfter(d, "track", "t2").count() == 1)
    assert(Watermark.inclusiveFrom(d, "track", "t2").count() == 2)
  }

  test("SCD2 scenario (README.md:69-88): change one row -> two versions") {
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val staged1 = df(Seq((1L, "lagos", "x"), (2L, "abuja", "x"))).drop("track")
    val snap1 = Scd2.init(staged1, t1)
    assert(snap1.where(col(Scd2.ValidTo).isNull).count() == 2)

    // user 1 changes attr; user 3 is new; user 2 unchanged
    val staged2 = df(Seq((1L, "kano", "x"), (2L, "abuja", "x"),
      (3L, "ibadan", "x"))).drop("track")
    val snap2 = Scd2(snap1, staged2, Seq("id"), Seq("attr"), t2)

    val u1 = snap2.where(col("id") === 1).orderBy(Scd2.ValidFrom).collect()
    assert(u1.length == 2, "changed key must have old + new version")
    assert(u1(0).getAs[java.sql.Timestamp](Scd2.ValidTo) == t2)
    assert(u1(0).getAs[String]("attr") == "lagos")
    assert(u1(1).getAs[java.sql.Timestamp](Scd2.ValidTo) == null)
    assert(u1(1).getAs[String]("attr") == "kano")

    assert(snap2.where(col("id") === 2).count() == 1)
    val u3 = snap2.where(col("id") === 3).collect()
    assert(u3.length == 1 && u3(0).getAs[java.sql.Timestamp](Scd2.ValidTo) == null)

    // current-row view = latest state
    val cur = Scd2.currentRows(snap2).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(cur.toSeq == Seq((1L, "kano"), (2L, "abuja"), (3L, "ibadan")))
  }

  test("SCD2 detects NULL-swap changes across multiple check columns") {
    // Regression: a single xxhash64 over check columns skips NULL inputs,
    // so open=(NULL,'x') vs staged=('x',NULL) would hash identically and
    // the change would be silently missed. The per-column <=> fold must
    // close + insert here.
    import spark.implicits._
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val staged1 = Seq((1L, Option.empty[String], Option("x")))
      .toDF("id", "a", "b")
    val staged2 = Seq((1L, Option("x"), Option.empty[String]))
      .toDF("id", "a", "b")
    val snap = Scd2(Scd2.init(staged1, t1), staged2, Seq("id"), Seq("a", "b"), t2)
    val versions = snap.orderBy(Scd2.ValidFrom).collect()
    assert(versions.length == 2, "NULL-swap must close the old row and insert")
    assert(versions(0).getAs[java.sql.Timestamp](Scd2.ValidTo) == t2)
    assert(versions(1).getAs[String]("a") == "x"
      && versions(1).getAs[String]("b") == null
      && versions(1).getAs[java.sql.Timestamp](Scd2.ValidTo) == null)
  }

  test("applyOps: deletes remove, upserts replace/append, NULL and " +
      "unknown ops land as upserts") {
    val dest = df(Seq((1L, "a", "t1"), (2L, "b", "t1"), (3L, "c", "t1")))
    val batch = df(Seq((2L, "b2", "t2"), (3L, "ignored", "t2"),
        (4L, "d", "t2"), (5L, "e", "t2")))
      .withColumn("op",
        when(col("id") === 2L, lit("U"))     // update
          .when(col("id") === 3L, lit("D"))  // delete
          .when(col("id") === 4L, lit("I"))  // insert (≡ upsert)
          .otherwise(lit(null: String)))     // NULL op → upsert
    val got = Upsert.applyOps(dest, batch, Seq("id"), "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (4L, "d"), (5L, "e")))
    // the op column never reaches the destination
    assert(!Upsert.applyOps(dest, batch, Seq("id"), "op")
      .columns.contains("op"))
  }

  test("applyOps: a key carrying both a delete and a non-delete row " +
      "lands the non-delete row; empty batch is a no-op; op-name " +
      "collision with dest payload is rejected") {
    val dest = df(Seq((1L, "a", "t1")))
    val both = df(Seq((1L, "kept", "t2"), (1L, "dropped", "t2")))
      .withColumn("op", when(col("attr") === "kept", lit("U"))
        .otherwise(lit("D")))
    val got = Upsert.applyOps(dest, both, Seq("id"), "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "kept")))
    val empty = df(Seq.empty).withColumn("op", lit("D"))
    assert(Upsert.applyOps(dest, empty, Seq("id"), "op")
      .collect().toSet == dest.collect().toSet)
    intercept[IllegalArgumentException] { // "track" is dest payload
      Upsert.applyOps(dest, both.drop("op"), Seq("id"), "track")
    }
  }

  test("Scd2.applyChanges: change-feed-driven snapshot equals the " +
      "full-staged run (deletes stay open by default); " +
      "invalidateHardDeletes closes them with no successor") {
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    // key1: check-col change; key2: untouched; key3: hard-deleted;
    // key4: NON-check column change (stays open, old payload — dbt
    // check semantics); key5: added
    val v1 = df(Seq((1L, "a", "p"), (2L, "b", "q"), (3L, "c", "r"),
      (4L, "d", "s")))
    val v2 = df(Seq((1L, "a2", "p"), (2L, "b", "q"), (4L, "d", "s2"),
      (5L, "e", "t")))
    val cur = Scd2.init(v1, t1)
    val full = Scd2(cur, v2, Seq("id"), Seq("attr"), t2)
    val ch = Diff.changeRows(v1, v2, Seq("id"))
    val viaFeed = Scd2.applyChanges(cur, ch, Seq("id"), Seq("attr"), t2)
    assert(viaFeed.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet,
      "feed-driven and full-staged snapshots must be identical")
    // the feed-driven run's staged side is only the churn
    assert(ch.count() == 4) // changed 1, changed 4, removed 3, added 5
    val hard = Scd2.applyChanges(cur, ch, Seq("id"), Seq("attr"), t2,
      invalidateHardDeletes = true)
    val k3 = hard.where(col("id") === 3L).collect()
    assert(k3.length == 1 &&
      k3(0).getAs[java.sql.Timestamp](Scd2.ValidTo) == t2,
      "hard delete closes the open row with no successor")
    // everything else identical to the default run
    assert(hard.where(col("id") =!= 3L).collect().map(_.toSeq).toSet ==
      viaFeed.where(col("id") =!= 3L).collect().map(_.toSeq).toSet)
  }

  test("SCD2 is stable when nothing changed (idempotent re-run)") {
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val staged = df(Seq((1L, "a", "x"), (2L, "b", "x"))).drop("track")
    val snap1 = Scd2.init(staged, t1)
    val snap2 = Scd2(snap1, staged, Seq("id"), Seq("attr"), t2)
    assert(snap1.exceptAll(snap2).isEmpty && snap2.exceptAll(snap1).isEmpty)
  }
}
