package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ConsistentRead, TableStore}

/** Cross-table consistent-as-of read: pin N independently-loaded
  * tables to their max common watermark before joining, and pick the
  * newest mutually-consistent snapshot version of a TableStore. */
class ConsistentReadSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("pin filters every table to the least of the max watermarks") {
    // users loaded through t=17, plans through t=9, txns through t=13
    val users = Seq((1L, 3L), (2L, 17L), (3L, 8L)).toDF("id", "t")
    val plans = Seq((1L, 9L), (2L, 2L)).toDF("id", "t")
    val txns = Seq((1L, 13L), (2L, 9L), (3L, 10L)).toDF("id", "t")
    val pinned = ConsistentRead.pin(
      Seq(users -> "t", plans -> "t", txns -> "t"))
    def ts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(1)).toSet
    // common watermark = least(17, 9, 13) = 9
    assert(ts(pinned(0)) == Set(3L, 8L))
    assert(ts(pinned(1)) == Set(9L, 2L))
    assert(ts(pinned(2)) == Set(9L))
    // a single table pins to its own max — nothing is dropped
    assert(ConsistentRead.pin(Seq(users -> "t")).head.count() == 3)
  }

  test("NULL tracks never pass the pin; pinTo skips the scans") {
    val a = Seq((1L, Some(5L)), (2L, None), (3L, Some(2L)))
      .toDF("id", "t")
    val b = Seq((1L, 4L)).toDF("id", "t")
    val pinned = ConsistentRead.pin(Seq(a -> "t", b -> "t"))
    assert(pinned(0).collect().map(_.getLong(0)).toSet == Set(3L))
    val to = ConsistentRead.pinTo(Seq(a -> "t", b -> "t"), 4L)
    assert(to(0).collect().map(_.getLong(0)).toSet == Set(3L))
    assert(to(1).count() == 1)
  }

  test("a NULL per-table watermark makes the COMMON watermark NULL " +
      "(empty/unloaded table pins everything out, never waives itself)") {
    val loaded = Seq((1L, 5L), (2L, 9L)).toDF("id", "t")
    val empty = Seq.empty[(Long, Long)].toDF("id", "t")
    val unstamped = Seq((1L, Option.empty[Long])).toDF("id", "t")
    // least() would skip the empty table's NULL max and return 9 —
    // the exact silent waiver the primitive exists to prevent
    assert(ConsistentRead
      .commonWatermarkFrame(Seq(loaded -> "t", empty -> "t"))
      .head().isNullAt(0))
    assert(ConsistentRead
      .commonWatermarkFrame(Seq(loaded -> "t", unstamped -> "t"))
      .head().isNullAt(0))
    // pin then passes NOTHING from any table
    val pinned = ConsistentRead.pin(
      Seq(loaded -> "t", empty -> "t", unstamped -> "t"))
    assert(pinned.forall(_.isEmpty))
    // reserved-name guard: a table already carrying __wm is rejected
    // instead of silently dropping the user's column
    val clash = Seq((1L, 2L)).toDF("t", "__wm")
    intercept[IllegalArgumentException] {
      ConsistentRead.pin(Seq(clash -> "t"))
    }
  }

  test("asOfVersion picks the newest version at or under the instant") {
    val root = Files.createTempDirectory("graft-asof").toString
    val store = new TableStore(spark, root)
    store.write(Seq((1L, 5L)).toDF("id", "t"))              // v1, wm 5
    store.write(Seq((1L, 5L), (2L, 10L)).toDF("id", "t"))   // v2, wm 10
    store.write(Seq((1L, 5L), (2L, 10L), (3L, 15L)).toDF("id", "t")) // v3
    def pick(wm: Long) =
      ConsistentRead.asOfVersion(spark, store, "t", wm).map(_._1)
    assert(pick(12L).contains(2))
    assert(pick(10L).contains(2))
    assert(pick(9L).contains(1))
    assert(pick(20L).contains(3))
    assert(pick(3L).isEmpty)
    // the picked frame is the whole immutable snapshot, unfiltered
    val (v, df) = ConsistentRead.asOfVersion(spark, store, "t", 12L).get
    assert(v == 2 && df.count() == 2)
  }

  test("asOfCowVersion walks COW versions: manifest-resolved, " +
      "tombstones applied, incremental versions picked by their own " +
      "watermark") {
    val root = Files.createTempDirectory("graft-asof-cow").toString
    val store = new graft.cdc.CowStore(spark, root, Seq("id"),
      nBuckets = 4)
    store.writeFull(Seq((1L, 5L)).toDF("id", "t"))       // v1, wm 5
    store.upsert(Seq((2L, 10L)).toDF("id", "t"))         // v2, wm 10
    store.upsert(Seq((3L, 15L)).toDF("id", "t"))         // v3, wm 15
    store.delete(Seq(3L).toDF("id"), mor = true)         // v4, wm 10
    def pick(wm: Long) =
      ConsistentRead.asOfCowVersion(spark, store, "t", wm).map(_._1)
    assert(pick(12L).contains(4),
      "the MoR delete drops v4's watermark back to 10 (tombstone " +
        "applied at the probe)")
    assert(pick(9L).contains(1))
    assert(pick(20L).contains(4))
    assert(pick(3L).isEmpty)
    val (v, df) = ConsistentRead.asOfCowVersion(spark, store, "t", 9L).get
    assert(v == 1 && df.count() == 1)
  }

  test("asOfCowVersion never pins a PARTIAL snapshot: a version whose " +
      "referenced dirs were vacuumed is skipped even though its own " +
      "dir survives as a file-holder (ADVICE r19)") {
    val root = Files.createTempDirectory("graft-asof-part").toString
    val store = new graft.cdc.CowStore(spark, root, Seq("id"),
      nBuckets = 8)
    // three keys in pairwise-DIFFERENT buckets, probed through the
    // store's own derivation so the fixture survives a hash change
    val bucketOf = (1L to 64L).map(k => k -> Seq(k).toDF("id")
      .select(store.bucketOf).head().getInt(0)).toMap
    val kA = 1L
    val kB = (2L to 64L).find(k => bucketOf(k) != bucketOf(kA)).get
    val kC = (2L to 64L).find(k => bucketOf(k) != bucketOf(kA) &&
      bucketOf(k) != bucketOf(kB)).get
    store.writeFull(Seq((kA, 1L)).toDF("id", "t"))   // v1: kA,  wm 1
    store.upsert(Seq((kB, 100L)).toDF("id", "t"))    // v2: kB,  wm 100
    store.upsert(Seq((kC, 1L)).toDF("id", "t"))      // v3: kC (refs v2 for kB)
    store.upsert(Seq((kB, 100L)).toDF("id", "t"))    // v4: kB re-owned
    // current manifest references v1 (kA), v3 (kC), v4 (kB) — v2 is
    // only load-bearing for v3's OWN manifest and gets vacuumed, while
    // v3's dir survives as a file-holder for the current kC bucket
    store.vacuum()
    assert(store.versions() == Seq(1, 3, 4))
    assert(!store.versionIntact(3),
      "v3's manifest references the vacuumed v2")
    assert(store.versionIntact(4) && store.versionIntact(1))
    // v3's FULL snapshot had wm 100 (kB at v2); its surviving PARTIAL
    // subset (kA, kC) would probe wm 1 ≤ 50 — the walk must skip it
    // and pin the intact v1, never serve v3's partial rows
    val got = ConsistentRead.asOfCowVersion(spark, store, "t", 50L)
    assert(got.map(_._1).contains(1),
      s"expected the intact v1, got ${got.map(_._1)}")
    assert(got.get._2.count() == 1)
  }

  test("_STATS metadata walk: a statsCols store answers asOfCowVersion " +
      "without reading data for covered versions; MoR commits mark " +
      "their buckets unknown (fallback) until the fold heals them") {
    val root = Files.createTempDirectory("graft-asof-stats").toString
    val store = new graft.cdc.CowStore(spark, root, Seq("id"),
      nBuckets = 4, statsCols = Seq("t"))
    store.writeFull(Seq((1L, 9L)).toDF("id", "t"))   // v1, wm 9
    store.upsert(Seq((2L, 10L)).toDF("id", "t"))     // v2, wm 10
    store.upsert(Seq((3L, 15L)).toDF("id", "t"))     // v3, wm 15
    // every COW version is fully covered by commit-time stats
    Seq(1, 2, 3).foreach(v =>
      assert(store.versionTrackMaxes(v, "t").isDefined,
        s"v$v must carry complete _STATS"))
    def pick(wm: Long) =
      ConsistentRead.asOfCowVersion(spark, store, "t", wm).map(_._1)
    // the cast-back pin: "10" < "9" as STRINGS — a string-ordered fold
    // would call v2 (max 10) eligible at wm 9; the typed fold must not
    assert(pick(9L).contains(1))
    assert(pick(10L).contains(2))
    assert(pick(20L).contains(3))
    assert(pick(3L).isEmpty)
    // MoR delete: register diff, stats for the affected bucket become
    // UNKNOWN — versionTrackMaxes None, the walk falls back to reading
    // and still answers by the tombstone-applied watermark
    store.delete(Seq(3L).toDF("id"), mor = true)     // v4, wm back to 10
    assert(store.versionTrackMaxes(4, "t").isEmpty,
      "a live register must leave the version's stats incomplete")
    assert(pick(12L).contains(4))
    // the fold recomputes: compact clears the register AND republishes
    // complete stats — the probe is metadata again
    store.compact(maxReferenced = 1)
    val v5 = store.version.get
    assert(store.versionTrackMaxes(v5, "t").isDefined,
      "the fold must heal the stats")
    assert(pick(12L).contains(v5))
    // timestamp track round-trips through the base64-string encoding
    val troot = Files.createTempDirectory("graft-asof-ts").toString
    val tstore = new graft.cdc.CowStore(spark, troot, Seq("id"),
      nBuckets = 4, statsCols = Seq("ts"))
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 10:30:00")
    tstore.writeFull(Seq((1L, ts(1))).toDF("id", "ts"))
    tstore.upsert(Seq((2L, ts(20))).toDF("id", "ts"))
    assert(tstore.versionTrackMaxes(2, "ts").isDefined)
    assert(ConsistentRead.asOfCowVersion(spark, tstore, "ts", ts(5))
      .map(_._1).contains(1))
    assert(ConsistentRead.asOfCowVersion(spark, tstore, "ts", ts(25))
      .map(_._1).contains(2))
    // an all-NULL track version is trivially consistent (empty maxes)
    val nroot = Files.createTempDirectory("graft-asof-null").toString
    val nstore = new graft.cdc.CowStore(spark, nroot, Seq("id"),
      nBuckets = 4, statsCols = Seq("t"))
    nstore.writeFull(Seq((1L, Option.empty[Long])).toDF("id", "t"))
    assert(nstore.versionTrackMaxes(1, "t").contains(Nil))
    assert(ConsistentRead.asOfCowVersion(spark, nstore, "t", 0L)
      .map(_._1).contains(1))
  }

  test("_STATS timestamp maxes are SESSION-TIMEZONE-PROOF: a reader " +
      "configured in another zone gets the same as-of answer (epoch-" +
      "micros encoding, not CAST-to-string)") {
    val root = Files.createTempDirectory("graft-asof-tz").toString
    val store = new graft.cdc.CowStore(spark, root, Seq("id"),
      nBuckets = 4, statsCols = Seq("ts"))
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:30:00")
    // written under the suite's UTC session
    store.writeFull(Seq((1L, ts(10))).toDF("id", "ts")) // v1, wm 10:30 UTC
    assert(store.versionTrackMaxes(1, "ts").isDefined)
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      // a reader 8h ahead: the old CAST-string decode would re-parse
      // "10:30" as +08:00 = 02:30 UTC and wrongly call v1 eligible at
      // a 05:00 UTC watermark
      spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
      assert(ConsistentRead.asOfCowVersion(spark, store, "ts", ts(5))
        .isEmpty,
        "a zone-shifted reader must NOT pin a version past the watermark")
      assert(ConsistentRead.asOfCowVersion(spark, store, "ts", ts(11))
        .map(_._1).contains(1))
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("driverFoldLteq: the zero-job _STATS fold covers exactly the " +
      "engine-identical matrix and refuses everything else (VERDICT " +
      "r20 ask #5 — the walk's covered-version probe is pure driver " +
      "work; unsafe type pairs fall back to the engine compare)") {
    import org.apache.spark.sql.types._
    import graft.cdc.ConsistentRead.driverFoldLteq
    // integral: exact long compares; "10" <= 9 must be FALSE (a
    // string-ordered fold would say "10" < "9")
    assert(driverFoldLteq(Seq("5", "9"), Some(LongType), 9L)
      .contains(true))
    assert(driverFoldLteq(Seq("10"), Some(LongType), 9L).contains(false))
    assert(driverFoldLteq(Seq("7"), Some(IntegerType), 7L).contains(true))
    // unparseable max → None (engine decides), never a throw
    assert(driverFoldLteq(Seq("x"), Some(LongType), 9L).isEmpty)
    // mixed numeric families keep the engine's coercion
    assert(driverFoldLteq(Seq("5"), Some(LongType), 5.0).isEmpty)
    assert(driverFoldLteq(Seq("5.0"), Some(FloatType), 5.0f).isEmpty)
    // double vs double: exact round-trip, NaN wm refused
    assert(driverFoldLteq(Seq("5.5"), Some(DoubleType), 5.5).contains(true))
    assert(driverFoldLteq(Seq("5.6"), Some(DoubleType), 5.5)
      .contains(false))
    assert(driverFoldLteq(Seq("1.0"), Some(DoubleType), Double.NaN).isEmpty)
    assert(driverFoldLteq(Seq("NaN"), Some(DoubleType), 5.0)
      .contains(false), "a NaN max is greater than any non-NaN wm")
    // timestamp: _STATS carries epoch micros; wm converts through
    // Catalyst's own external mapping — 2024-03-01T10:30:00Z micros
    val t = java.sql.Timestamp.valueOf("2024-03-01 10:30:00")
    val micros = t.getTime * 1000L
    assert(driverFoldLteq(Seq(micros.toString), Some(TimestampType), t)
      .contains(true))
    assert(driverFoldLteq(Seq((micros + 1).toString),
      Some(TimestampType), t).contains(false))
    // date: compared as epoch days (ADVICE r21 — lexicographic order
    // breaks outside years 0–9999)
    assert(driverFoldLteq(Seq("2024-02-29"), Some(DateType),
      java.sql.Date.valueOf("2024-03-01")).contains(true))
    assert(driverFoldLteq(Seq("2024-03-02"), Some(DateType),
      java.sql.Date.valueOf("2024-03-01")).contains(false))
    // year 10000+ renders "+10000-…", which sorts lexicographically
    // BEFORE any 4-digit year — the epoch-day compare must say false
    assert(driverFoldLteq(Seq("+10000-01-01"), Some(DateType),
      java.sql.Date.valueOf("2024-03-01")).contains(false),
      "a far-future max is NOT <= a 2024 watermark")
    assert(driverFoldLteq(Seq("-0001-12-31"), Some(DateType),
      java.time.LocalDate.of(0, 1, 1)).contains(true),
      "BC years compare by value, not reversed byte order")
    // unparseable stored form → engine fallback, never a verdict
    assert(driverFoldLteq(Seq("01/02/2024"), Some(DateType),
      java.sql.Date.valueOf("2024-03-01")).isEmpty)
    // string: UTF-8 byte order (Spark's binary collation), where JVM
    // UTF-16 order diverges — U+10000 (surrogate pair, bytes F0 90…)
    // sorts ABOVE U+FFFD (bytes EF BF BD) in UTF-8 but BELOW it in
    // UTF-16 code units
    val supp = new String(Character.toChars(0x10000))
    assert(supp < "�", "JVM order: surrogate sorts below")
    assert(driverFoldLteq(Seq(supp), Some(StringType), "�")
      .contains(false), "UTF-8 order: supplementary char sorts above")
    assert(driverFoldLteq(Seq("abc"), Some(StringType), "abd")
      .contains(true))
    // unknown track type / missing schema → engine
    assert(driverFoldLteq(Seq("5"), None, 9L).isEmpty)
    assert(driverFoldLteq(Seq("5"), Some(BinaryType), 9L).isEmpty)
  }

  test("joint use: common watermark across two staggered stores") {
    val rootA = Files.createTempDirectory("graft-asof-a").toString
    val rootB = Files.createTempDirectory("graft-asof-b").toString
    val a = new TableStore(spark, rootA)
    val b = new TableStore(spark, rootB)
    a.write(Seq((1L, 10L)).toDF("id", "t"))
    a.write(Seq((1L, 10L), (2L, 20L)).toDF("id", "t")) // a current wm 20
    b.write(Seq((9L, 14L)).toDF("id", "t"))            // b current wm 14
    val common = ConsistentRead
      .commonWatermarkFrame(Seq(a.read().get -> "t", b.read().get -> "t"))
      .head().getLong(0)
    assert(common == 14L)
    // a's consistent snapshot at the common instant is v1, not v2
    assert(ConsistentRead.asOfVersion(spark, a, "t", common)
      .map(_._1).contains(1))
    assert(ConsistentRead.asOfVersion(spark, b, "t", common)
      .map(_._1).contains(1))
  }
}
