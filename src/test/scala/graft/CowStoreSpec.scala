package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CowStore, Upsert}

/** Bucket-pruned copy-on-write upsert (cdc.CowStore): semantics must
  * equal the plain [[Upsert]] kernel while write volume scales with
  * the batch — inherited buckets are manifest references to the OLD
  * version's files, never rewrites. */
class CowStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-cowspec").toString

  private def rows(ks: Range, tag: String) =
    ks.map(k => (k.toLong, tag, k * 10.0)).toDF("k", "tag", "v")

  private def collectSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet

  private def bucketDirs(root: String, v: Int): Set[Int] = {
    val d = new java.io.File(f"$root/v_$v%08d")
    d.listFiles().toSeq.map(_.getName).filter(_.startsWith("__bkt="))
      .map(_.stripPrefix("__bkt=").toInt).toSet
  }

  test("cow upsert equals the plain delete+insert kernel") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 8)
    val dest = rows(0 until 200, "old")
    val inc = rows(150 until 230, "new")
    store.writeFull(dest)
    store.upsert(inc)
    val want = collectSet(Upsert(dest, inc, Seq("k")))
    assert(collectSet(store.read().get) == want)
    // a second batch over the merged table
    val inc2 = rows(10 until 20, "new2")
    store.upsert(inc2)
    val want2 = collectSet(Upsert(Upsert(dest, inc, Seq("k")), inc2, Seq("k")))
    assert(collectSet(store.read().get) == want2)
  }

  test("only affected buckets are rewritten; the rest inherit by reference") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 16)
    store.writeFull(rows(0 until 400, "old"))
    val man1 = store.currentManifest
    assert(man1.values.toSet == Set(1) && man1.keySet == (0 until 16).toSet)
    // a single-key batch touches exactly ONE bucket
    val one = rows(42 until 43, "new")
    val affected = one.select(store.bucketOf).head().getInt(0)
    store.upsert(one)
    val man2 = store.currentManifest
    assert(man2(affected) == 2, "touched bucket owned by the new version")
    assert(man2.filter(_._1 != affected).values.toSet == Set(1),
      "every untouched bucket still references version 1's files")
    assert(bucketDirs(root, 2) == Set(affected),
      "the new version dir contains ONLY the touched bucket")
    // write volume ∝ batch: v2 holds one small bucket, v1 the table
    def bytes(v: Int) = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length else f.listFiles().map(walk).sum
      walk(new java.io.File(f"$root/v_$v%08d"))
    }
    assert(bytes(2) * 4 < bytes(1),
      s"v2=${bytes(2)}B should be far under v1=${bytes(1)}B")
    assert(collectSet(store.read().get) ==
      collectSet(Upsert(rows(0 until 400, "old"), one, Seq("k"))))
  }

  test("C2 keep-latest variant matches withDedupMaintained") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 8)
    val dest = rows(0 until 100, "old").withColumn("ts", col("k") % 7)
    val inc = rows(80 until 120, "new").withColumn("ts", col("k") % 7 + 3)
      .union(rows(80 until 120, "dup").withColumn("ts", col("k") % 7 + 1))
    store.writeFull(dest)
    store.upsert(inc, dedup = Some(("ts", Seq("tag"))))
    val want = Upsert.withDedupMaintained(dest, inc, Seq("k"), "ts",
      Seq("tag"))
    assert(store.read().get.collect().map(_.toSeq).toSet ==
      want.collect().map(_.toSeq).toSet)
  }

  test("empty batch is a no-op; first upsert on an empty store full-loads") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 4)
    store.upsert(rows(0 until 0, "x"))
    assert(!store.exists)
    store.upsert(rows(0 until 10, "a"))
    assert(collectSet(store.read().get) == collectSet(rows(0 until 10, "a")))
  }

  test("vacuum keeps versions the current manifest references") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 4)
    store.writeFull(rows(0 until 100, "old")) // v1
    store.upsert(rows(0 until 5, "a"))        // v2 (some buckets)
    store.upsert(rows(5 until 9, "b"))        // v3
    store.vacuum()
    // v1 must survive: untouched buckets still reference it
    assert(store.versions().contains(1))
    val before = collectSet(store.read().get)
    store.writeFull(store.read().get)         // v4 rewrites everything
    store.vacuum()
    assert(store.versions() == Seq(4), s"got ${store.versions()}")
    assert(collectSet(store.read().get) == before)
  }

  test("readForKeys prunes to the probe's buckets and exact keys") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 16)
    store.writeFull(rows(0 until 300, "old"))
    val probe = Seq(7L, 42L, 7L, 9999L).toDF("k") // dup + absent keys
    val got = collectSet(store.readForKeys(probe).get)
    assert(got == Set((7L, "old", 70.0), (42L, "old", 420.0)))
    // prunes: the probe's buckets are a strict subset of all 16
    val probed = probe.select(store.bucketOf).distinct().count()
    assert(probed <= 3)
  }

  test("readVersion time-travels through each version's own manifest") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 4)
    store.writeFull(rows(0 until 50, "old"))        // v1
    store.upsert(rows(10 until 15, "a"))            // v2
    store.upsert(rows(10 until 12, "b"))            // v3
    val v1 = collectSet(store.readVersion(1).get)
    val v2 = collectSet(store.readVersion(2).get)
    val v3 = collectSet(store.readVersion(3).get)
    assert(v1 == collectSet(rows(0 until 50, "old")))
    assert(v2 == collectSet(Upsert(rows(0 until 50, "old"),
      rows(10 until 15, "a"), Seq("k"))))
    assert(v3 == collectSet(store.read().get))
    assert(store.readVersion(9).isEmpty)
    // vacuum keeps exactly the versions the CURRENT manifest
    // references — time travel survives for those, and the current
    // read is untouched
    store.vacuum()
    val live = store.currentManifest.values.toSet
    live.foreach(v => assert(store.readVersion(v).isDefined))
    assert(collectSet(store.read().get) == v3)
  }

  test("rebucket is a full rewrite into a new store; contents identical") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 4)
    store.writeFull(rows(0 until 120, "old"))
    store.upsert(rows(5 until 9, "new"))
    val before = collectSet(store.read().get)
    val grown = store.rebucket(freshRoot(), nNew = 32)
    assert(collectSet(grown.read().get) == before)
    assert(grown.currentManifest.keySet == (0 until 32).toSet)
    // old root stays readable (retirement is the caller's call)
    assert(collectSet(store.read().get) == before)
    // and the new store merges correctly under its own modulus
    grown.upsert(rows(0 until 2, "g"))
    assert(collectSet(grown.read().get) ==
      collectSet(Upsert(store.read().get, rows(0 until 2, "g"), Seq("k"))))
  }

  test("streaming micro-batch drain upserts each batch bucket-pruned") {
    import org.apache.spark.sql.types._
    val src = Files.createTempDirectory("graft-cow-src").toString
    val ckpt = Files.createTempDirectory("graft-cow-ckpt").toString
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 8)
    store.writeFull(rows(0 until 100, "old"))
    rows(90 until 110, "b1").write.parquet(s"$src/f1")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("tag", StringType), StructField("v", DoubleType)))
    graft.streaming.CdcMicroBatch.runAvailableNowCow(
      spark, s"$src/f1", schema, store, ckpt)
    assert(collectSet(store.read().get) ==
      collectSet(Upsert(rows(0 until 100, "old"),
        rows(90 until 110, "b1"), Seq("k"))))
    // replayed drain (fresh checkpoint, same files) converges — the
    // bucket-local delete+insert is idempotent
    val ckpt2 = Files.createTempDirectory("graft-cow-ckpt2").toString
    graft.streaming.CdcMicroBatch.runAvailableNowCow(
      spark, s"$src/f1", schema, store, ckpt2)
    assert(collectSet(store.read().get) ==
      collectSet(Upsert(rows(0 until 100, "old"),
        rows(90 until 110, "b1"), Seq("k"))))
  }

  test("two interleaved writers: first commit wins, loser gets a " +
      "retryable conflict and publishes NO manifest") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 8)
    store.writeFull(rows(0 until 100, "old")) // v1
    val batchA = rows(10 until 15, "A")
    val batchB = rows(12 until 20, "B")
    // both writers snapshot base = v1; A commits first
    store.upsertAt(batchA, None, Some(1))
    val ex = intercept[graft.cdc.ConcurrentWriteException] {
      store.upsertAt(batchB, None, Some(1))
    }
    assert(ex.getMessage.contains("retry"))
    // loser's claimed version dir exists but carries no manifest — it
    // can never be read, crash-forwarded to, or time-traveled to
    assert(store.versions().contains(3))
    assert(store.readVersion(3).isEmpty)
    // table state is exactly writer A's commit
    assert(collectSet(store.read().get) ==
      collectSet(Upsert(rows(0 until 100, "old"), batchA, Seq("k"))))
    // the retry (fresh base) succeeds and equals sequential application
    store.upsert(batchB)
    assert(collectSet(store.read().get) ==
      collectSet(Upsert(Upsert(rows(0 until 100, "old"), batchA, Seq("k")),
        batchB, Seq("k"))))
    // once the table advances past it, the aborted claim-only dir is
    // definitively dead and vacuum reclaims it
    store.vacuum()
    assert(!store.versions().contains(3))
    assert(collectSet(store.read().get) ==
      collectSet(Upsert(Upsert(rows(0 until 100, "old"), batchA, Seq("k")),
        batchB, Seq("k"))))
  }

  test("two racing INITIAL loads: the loser's full-load must not " +
      "replace the winner's table") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 8)
    // both writers see an empty store (base = None); A commits first
    store.upsertAt(rows(0 until 10, "A"), None, None)
    intercept[graft.cdc.ConcurrentWriteException] {
      store.upsertAt(rows(5 until 15, "B"), None, None)
    }
    assert(collectSet(store.read().get) == collectSet(rows(0 until 10, "A")),
      "winner's initial load intact")
    // the retry re-enters as a MERGE against the winner's table
    store.upsert(rows(5 until 15, "B"))
    assert(collectSet(store.read().get) ==
      collectSet(Upsert(rows(0 until 10, "A"), rows(5 until 15, "B"),
        Seq("k"))))
  }

  test("compact collapses the fragmented tail; result-invisible; " +
      "vacuum then retires the tail dirs") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 16)
    store.writeFull(rows(0 until 4000, "old")) // v1: the big version
    (0 until 10).foreach { i =>    // 10 single-key fragmented batches
      store.upsert(rows(i until i + 1, s"b$i"))
    }
    val before = collectSet(store.read().get)
    val fragged = store.currentManifest.values.toSet
    assert(fragged.size > 2, s"fixture should fragment, got $fragged")
    store.compact(maxReferenced = 2)
    val man = store.currentManifest
    // ≤ 2 referenced versions, and the BYTES-dominant v1 survived by
    // inheritance (owner selection minimizes rewrite volume)
    assert(man.values.toSet.size <= 2)
    assert(man.values.toSet.contains(1),
      s"big full-load version should be kept, got ${man.values.toSet}")
    assert(collectSet(store.read().get) == before, "result-invisible")
    store.vacuum()
    assert(store.versions().toSet == man.values.toSet,
      "vacuum retires every no-longer-referenced tail dir")
    assert(collectSet(store.read().get) == before)
    // already within budget → no-op (no new version appears)
    val vmax = store.versions().max
    store.compact(maxReferenced = 2)
    assert(store.versions().max == vmax)
  }

  test("schema drift through upsert: missing payload null-fills, " +
      "unknown field drops, missing KEY is rejected") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 8)
    store.writeFull(rows(0 until 50, "old")) // schema (k, tag, v)
    // batch missing `v` (null-fill) and carrying unknown `junk` (drop)
    val drifted = Seq((40L, "new", "x"), (60L, "new", "y"))
      .toDF("k", "tag", "junk")
    store.upsert(drifted)
    val got = store.read().get.where(col("tag") === "new")
      .collect().map(r => (r.getLong(0), r.isNullAt(2))).toSet
    assert(got == Set((40L, true), (60L, true)))
    assert(!store.read().get.columns.contains("junk"))
    assert(store.read().get.where(col("tag") === "old").count() == 49)
    // a batch without the key column has no merge identity — reject
    val ex = intercept[IllegalArgumentException] {
      store.upsert(Seq(("z", 1.0)).toDF("tag", "v"))
    }
    assert(ex.getMessage.contains("key"))
    // reserved partition column is rejected, not silently replaced
    intercept[IllegalArgumentException] {
      store.upsert(Seq((1L, "t", 0)).toDF("k", "tag", "__bkt"))
    }
  }

  test("compact(clusterBy): rewritten bucket files are sorted within " +
      "file; row set identical") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 4)
    // arrival order deliberately scrambles v: write descending-k
    // batches so no file is accidentally sorted
    store.writeFull(rows(0 until 50, "old"))
    (0 until 6).foreach { i =>
      store.upsert(rows((40 - i * 7) until (40 - i * 7 + 5), s"b$i"))
    }
    val before = collectSet(store.read().get)
    store.compact(maxReferenced = 1, clusterBy = Seq("v"))
    store.vacuum()
    assert(collectSet(store.read().get) == before, "row set unchanged")
    // every rewritten bucket file is internally sorted by v
    val vdir = new java.io.File(f"$root/v_${store.versions().max}%08d")
    val bdirs = vdir.listFiles().filter(_.getName.startsWith("__bkt="))
    assert(bdirs.nonEmpty)
    bdirs.foreach { b =>
      val vs = spark.read.parquet(b.toString)
        .select("v").collect().map(_.getDouble(0)).toSeq
      assert(vs == vs.sorted, s"bucket ${b.getName} not clustered: $vs")
    }
  }

  test("additive schema evolution: new column widens the schema " +
      "without rewriting old files; time travel keeps the old shape") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 8)
    store.writeFull(rows(0 until 100, "old"))            // v1 (k,tag,v)
    val evolved = Seq((90L, "new", 900.0, "x"), (120L, "new", 1200.0, "y"))
      .toDF("k", "tag", "v", "extra")
    store.upsert(evolved, evolve = true)                 // v2 widens
    val cur = store.read().get
    assert(cur.columns.toSeq == Seq("k", "tag", "v", "extra"))
    // untouched buckets still live in v1's files (no rewrite) yet
    // read back with the new column null-filled
    val man = store.currentManifest
    assert(man.values.toSet.contains(1), "old version still inherited")
    val olds = cur.where(col("tag") === "old")
    assert(olds.count() == 99 && olds.where(col("extra").isNotNull).isEmpty)
    assert(cur.where(col("tag") === "new")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet ==
      Set((90L, "x"), (120L, "y")))
    // WITHOUT evolve the same batch drops the unknown column (S7)
    store.upsert(Seq((5L, "plain", 50.0, "z")).toDF("k", "tag", "v", "extra2"))
    assert(!store.read().get.columns.contains("extra2"))
    assert(store.read().get.columns.contains("extra"),
      "a non-evolve upsert keeps the already-evolved schema")
    // time travel: v1 has the ORIGINAL shape
    assert(store.readVersion(1).get.columns.toSeq == Seq("k", "tag", "v"))
    assert(store.schemaOf(1).get.fieldNames.toSeq == Seq("k", "tag", "v"))
    assert(store.currentSchema.get.fieldNames.toSeq ==
      Seq("k", "tag", "v", "extra"))
    // a later merge of an old-shape batch null-fills the evolved col
    store.upsert(rows(0 until 2, "late"))
    val late = store.read().get.where(col("tag") === "late")
    assert(late.count() == 2 && late.where(col("extra").isNotNull).isEmpty)
    // and compaction preserves the evolved schema + contents
    val before = store.read().get.collect().map(_.toSeq).toSet
    store.compact(maxReferenced = 1)
    store.vacuum()
    assert(store.read().get.collect().map(_.toSeq).toSet == before)
    assert(store.currentSchema.get.fieldNames.toSeq ==
      Seq("k", "tag", "v", "extra"))
  }

  test("delete removes exactly the probed keys, bucket-pruned; absent " +
      "keys no-op; an empty probe commits nothing") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 16)
    store.writeFull(rows(0 until 400, "old")) // v1
    val probe = (Seq(7L, 42L, 300L) ++ Seq(99999L)).toDF("k")
    store.delete(probe) // v2
    val got = collectSet(store.read().get)
    assert(got == collectSet(rows(0 until 400, "old")
      .where(!col("k").isin(7L, 42L, 300L))))
    // untouched buckets inherited: v1 still referenced
    val man = store.currentManifest
    assert(man.values.toSet == Set(1, 2))
    val touched = probe.where(col("k") =!= 99999L)
      .select(store.bucketOf).distinct().collect().map(_.getInt(0)).toSet
    assert(man.filter(_._2 == 2).keySet.subsetOf(
      touched + probe.where(col("k") === 99999L)
        .select(store.bucketOf).head().getInt(0)))
    // an empty probe commits no new version
    val vmax = store.versions().max
    store.delete(Seq(123456789L).toDF("k").where(col("k") < 0))
    assert(store.versions().max == vmax)
    // int-typed probe keys cast to the stored long before routing
    store.delete(Seq(7, 8).toDF("k")) // 7 already gone; 8 present
    assert(collectSet(store.read().get) ==
      collectSet(rows(0 until 400, "old")
        .where(!col("k").isin(7L, 8L, 42L, 300L))))
  }

  test("merge-on-read delete: same result as the COW delete at " +
      "tombstone cost — manifest unchanged, write bytes ∝ probe") {
    def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
    val (cowRoot, morRoot) = (freshRoot(), freshRoot())
    val cow = new CowStore(spark, cowRoot, Seq("k"), nBuckets = 16)
    val mor = new CowStore(spark, morRoot, Seq("k"), nBuckets = 16)
    cow.writeFull(rows(0 until 400, "old")) // v1
    mor.writeFull(rows(0 until 400, "old")) // v1
    val probe = (Seq(7L, 42L) ++ Seq(99999L)).toDF("k") // absent key no-ops
    cow.delete(probe)
    mor.delete(probe, mor = true)
    assert(collectSet(mor.read().get) == collectSet(cow.read().get))
    // the MoR commit rewrote NO data bucket: every owner is still v1
    assert(mor.currentManifest.values.toSet == Set(1))
    assert(mor.pendingDvBuckets.nonEmpty)
    // tombstone bytes ∝ probe, a small fraction of one rewritten bucket
    val morBytes = dirBytes(new java.io.File(f"$morRoot/v_${2}%08d"))
    val cowBytes = dirBytes(new java.io.File(f"$cowRoot/v_${2}%08d"))
    assert(morBytes < cowBytes / 2,
      s"MoR wrote $morBytes vs COW's $cowBytes — tombstones should be tiny")
    // readForKeys and readBuckets see through the tombstones too
    assert(mor.readForKeys(Seq(7L, 8L).toDF("k")).get
      .select("k").collect().map(_.getLong(0)).toSeq == Seq(8L))
  }

  test("MoR tombstones fold into the NEXT data write of their bucket " +
      "and only that bucket's register clears") {
    val store = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 16)
    store.writeFull(rows(0 until 400, "old")) // v1
    store.delete(Seq(7L, 42L).toDF("k"), mor = true) // v2, tombstones
    val b7 = rows(7 until 8, "x").select(store.bucketOf).head().getInt(0)
    val b42 = rows(42 until 43, "x").select(store.bucketOf).head().getInt(0)
    assume(b7 != b42, "fixture wants the two keys in distinct buckets")
    // re-insert key 7: the upsert rewrites b7, folding its tombstone —
    // the new row must NOT be shadowed by the stale tombstone
    store.upsert(rows(7 until 8, "back"))
    assert(store.read().get.where(col("k") === 7L).count() == 1)
    assert(store.read().get.where(col("k") === 42L).count() == 0,
      "the other bucket's tombstone still applies")
    assert(store.pendingDvBuckets == Seq(b42))
    // a second MoR delete stacks on the register; both still apply
    store.delete(Seq(100L).toDF("k"), mor = true)
    assert(store.read().get.where(col("k").isin(42L, 100L)).count() == 0)
    // compact force-folds ALL MoR debt even with no fragmentation to
    // speak of; rows unchanged; vacuum then reclaims the _DV versions
    val before = collectSet(store.read().get)
    store.compact(maxReferenced = 2)
    assert(store.pendingDvBuckets.isEmpty)
    assert(collectSet(store.read().get) == before)
    store.vacuum()
    assert(collectSet(store.read().get) == before)
  }

  test("MoR debt is bounded: a bucket at the register cap folds " +
      "through the COW rewrite; a tombstone-only workload never " +
      "exceeds cap versions per bucket") {
    val store = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 4)
    store.writeFull(rows(0 until 400, "old"))
    val cap = store.DvCapPerBucket
    // keys routed to ONE bucket, deleted one at a time — the pure
    // erasure-stream shape that would otherwise grow the register
    // (and the read's tombstone union) without bound
    val b0keys = rows(0 until 400, "x")
      .withColumn("b", store.bucketOf)
      .where(col("b") === 0).select("k")
      .collect().map(_.getLong(0)).take(cap + 8)
    assume(b0keys.length == cap + 8, "fixture wants cap+8 keys in b0")
    b0keys.foreach { k =>
      store.delete(Seq(k).toDF("k"), mor = true)
    }
    val reg = store.dvsOf(store.version.get).getOrElse(0, Nil)
    assert(reg.length <= cap,
      s"register must stay bounded, got ${reg.length}")
    assert(reg.length == 7, "the at-cap delete folds (register " +
      s"resets), then 7 more tombstones stack; got ${reg.length}")
    // every deleted key is gone; every other row intact
    assert(store.read().get.where(col("k").isin(b0keys: _*)).count() == 0)
    assert(store.read().get.count() == 400 - b0keys.length)
  }

  test("merge-on-read upsert: same result as the COW merge at delta " +
      "cost — manifest unchanged, write bytes ∝ batch; stacking, " +
      "delete interplay, duplicate keys, evolution") {
    def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
    val (cowRoot, morRoot) = (freshRoot(), freshRoot())
    val cow = new CowStore(spark, cowRoot, Seq("k"), nBuckets = 16)
    val mor = new CowStore(spark, morRoot, Seq("k"), nBuckets = 16)
    cow.writeFull(rows(0 until 400, "old"))
    mor.writeFull(rows(0 until 400, "old"))
    val inc = rows(350 until 420, "new") // updates + brand-new keys
    cow.upsert(inc)
    mor.upsert(inc, mor = true)
    assert(collectSet(mor.read().get) == collectSet(cow.read().get))
    assert(mor.currentManifest.values.toSet == Set(1),
      "the delta commit rewrote no data bucket")
    assert(mor.pendingDlBuckets.nonEmpty)
    val morBytes = dirBytes(new java.io.File(f"$morRoot/v_${2}%08d"))
    val cowBytes = dirBytes(new java.io.File(f"$cowRoot/v_${2}%08d"))
    assert(morBytes < cowBytes / 2,
      s"delta wrote $morBytes vs COW's $cowBytes")
    // key-pruned lookup resolves the winner through the delta
    assert(mor.readForKeys(Seq(399L).toDF("k")).get
      .select("tag").head().getString(0) == "new")
    // stacking: a second delta supersedes the first for its keys
    mor.upsert(rows(399 until 401, "newer"), mor = true)
    cow.upsert(rows(399 until 401, "newer"))
    assert(collectSet(mor.read().get) == collectSet(cow.read().get))
    // delete-after-delta kills the delta row; delta-after-delete
    // resurrects the key (version order decides, both ways)
    mor.delete(Seq(400L).toDF("k"), mor = true)
    cow.delete(Seq(400L).toDF("k"))
    assert(collectSet(mor.read().get) == collectSet(cow.read().get))
    mor.upsert(rows(400 until 401, "back"), mor = true)
    cow.upsert(rows(400 until 401, "back"))
    assert(collectSet(mor.read().get) == collectSet(cow.read().get))
    // duplicate-key batches keep their duplicates (Upsert parity: the
    // winner rule keeps ALL rows of the winning version)
    val dup = rows(5 until 6, "dupA").unionByName(rows(5 until 6, "dupB"))
    mor.upsert(dup, mor = true)
    cow.upsert(dup)
    assert(mor.read().get.where(col("k") === 5L).count() == 2)
    assert(collectSet(mor.read().get) == collectSet(cow.read().get))
    // additive evolution through the delta path: schema widens, base
    // null-fills, the delta carries the new column
    mor.upsert(rows(7 until 8, "evo").withColumn("extra", lit("x")),
      evolve = true, mor = true)
    cow.upsert(rows(7 until 8, "evo").withColumn("extra", lit("x")),
      evolve = true)
    assert(mor.read().get.columns.toSeq == cow.read().get.columns.toSeq)
    assert(collectSet3(mor.read().get) == collectSet3(cow.read().get))
    // the next COW write of a delta bucket FOLDS it: register clears
    // for exactly that bucket, rows unchanged
    val b7 = rows(7 until 8, "x").select(mor.bucketOf).head().getInt(0)
    mor.upsert(rows(7 until 8, "fold").withColumn("extra", lit("y")))
    cow.upsert(rows(7 until 8, "fold").withColumn("extra", lit("y")))
    assert(!mor.pendingDlBuckets.contains(b7))
    assert(collectSet3(mor.read().get) == collectSet3(cow.read().get))
    // compact force-folds the rest; vacuum reclaims; content intact
    val want = collectSet3(cow.read().get)
    mor.compact(maxReferenced = 2)
    mor.vacuum()
    assert(mor.pendingDlBuckets.isEmpty && mor.pendingDvBuckets.isEmpty)
    assert(collectSet3(mor.read().get) == want)
    // keep-latest dedup refuses the MoR path
    intercept[IllegalArgumentException] {
      mor.upsert(rows(0 until 1, "z").withColumn("extra", lit("z")),
        dedup = Some(("v", Nil)), mor = true)
    }
  }

  private def collectSet3(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("change feed, time travel and retention stay correct across a " +
      "MoR upsert window; the delta register is cap-bounded") {
    val store = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 4)
    store.writeFull(rows(0 until 200, "old")) // v1
    store.upsert(rows(198 until 203, "new"), mor = true) // v2: delta
    val ch = store.readChanges(1, 2).get.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == (198L until 200L).map(_ -> "changed").toSet ++
      (200L until 203L).map(_ -> "added").toSet)
    val post = store.readChangeRows(1, 2).get
      .where(col("k") === 198L).select("tag").head().getString(0)
    assert(post == "new", "the feed's post-image is the delta winner")
    assert(store.readVersion(1).get.where(col("k") === 198L)
      .select("tag").head().getString(0) == "old", "time travel")
    // current-only vacuum keeps the delta version alive while the
    // register references it
    store.upsert(rows(50 until 52, "other"), mor = true) // v3
    store.vacuum()
    assert(store.read().get.where(col("k") === 198L)
      .select("tag").head().getString(0) == "new")
    // cap: cap+3 single-key MoR upserts into one bucket fold once
    val cap = store.DlCapPerBucket
    val b0keys = rows(0 until 200, "x").withColumn("b", store.bucketOf)
      .where(col("b") === 0).select("k")
      .collect().map(_.getLong(0)).take(cap + 3)
    assume(b0keys.length == cap + 3)
    b0keys.zipWithIndex.foreach { case (k, i) =>
      store.upsert(Seq((k, s"u$i", 0.0)).toDF("k", "tag", "v"),
        mor = true)
    }
    val reg = store.dlsOf(store.version.get).getOrElse(0, Nil)
    assert(reg.length <= cap, s"delta register bounded, got ${reg.length}")
    // every single-key update landed (winner rule across fold + deltas)
    b0keys.zipWithIndex.foreach { case (k, i) =>
      assert(store.read().get.where(col("k") === k)
        .select("tag").head().getString(0) == s"u$i")
    }
  }

  test("applyCdc(morDeletes): mixed I/U/D batch equals the one-commit " +
      "op-apply; delete-only buckets keep their owner (tombstones)") {
    val (a, b) = (freshRoot(), freshRoot())
    val one = new CowStore(spark, a, Seq("k"), nBuckets = 16)
    val mor = new CowStore(spark, b, Seq("k"), nBuckets = 16)
    val dest = rows(0 until 400, "old")
    one.writeFull(dest)
    mor.writeFull(dest)
    // updates confined to keys < 64; deletes on far keys so some
    // buckets see ONLY deletes
    val batch = rows(10 until 40, "new").withColumn("op", lit("U"))
      .unionByName(rows(300 until 330, "x").withColumn("op", lit("D")))
    one.applyCdc(batch, "op")
    mor.applyCdc(batch, "op", morDeletes = true)
    assert(collectSet(mor.read().get) == collectSet(one.read().get))
    // a bucket only the deletes touched was never rewritten: its
    // owner is still v1 and it carries tombstones
    val delOnly = rows(300 until 330, "x").select(mor.bucketOf)
      .distinct().collect().map(_.getInt(0)).toSet --
      rows(10 until 40, "x").select(mor.bucketOf)
        .distinct().collect().map(_.getInt(0)).toSet
    assume(delOnly.nonEmpty, "fixture wants delete-only buckets")
    val man = mor.currentManifest
    assert(delOnly.forall(man(_) == 1),
      "delete-only buckets must be inherited, not rewritten")
    assert(delOnly.subsetOf(mor.pendingDvBuckets.toSet))
    // replay converges (the streaming-drain idempotence contract)
    mor.applyCdc(batch, "op", morDeletes = true)
    assert(collectSet(mor.read().get) == collectSet(one.read().get))
  }

  test("change feed and time travel stay correct across a MoR delete; " +
      "retention keeps _DV versions alive") {
    val store = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    store.writeFull(rows(0 until 100, "old")) // v1
    store.delete(Seq(5L, 9L).toDF("k"), mor = true) // v2
    // CDF: the register diff marks the buckets changed; the feed
    // reports exactly the two removals with pre-images
    val ch = store.readChanges(1, 2).get.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == Set(5L -> "removed", 9L -> "removed"))
    val pre = store.readChangeRows(1, 2).get
      .where(col("change") === "removed")
      .select("k", "tag", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(pre == Set((5L, "old", 50.0), (9L, "old", 90.0)))
    // time travel: v1 pre-delete, v2 post
    assert(store.readVersion(1).get.where(col("k") === 5L).count() == 1)
    assert(store.readVersion(2).get.where(col("k") === 5L).count() == 0)
    // another bucket's upsert then current-only vacuum: v2's _DV files
    // are still referenced by the current register and must survive
    store.upsert(rows(64 until 66, "new")) // v3 (different buckets)
    store.vacuum()
    assert(store.read().get.where(col("k").isin(5L, 9L)).count() == 0,
      "tombstones survive vacuum while the register references them")
  }

  test("a delete that empties every bucket leaves an EXISTING, EMPTY, " +
      "readable table; a stale cursor window returns None not a throw") {
    val store = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 4)
    store.writeFull(rows(0 until 50, "old"))
    store.delete(rows(0 until 50, "old").select("k"))
    assert(store.exists)
    val empty = store.read().get // ADVICE r18: .get stays total
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("k", "tag", "v"))
    assert(store.readVersion(2).get.count() == 0)
    // cursor ahead of the table (store recreated / restored): the
    // documented rebuild signal, not an IllegalArgumentException
    assert(store.changedBuckets(9, 2).isEmpty)
    assert(store.readChangesSince(9).isEmpty)
  }

  test("applyCdc equals the applyOps kernel; first load on an empty " +
      "store keeps only non-delete rows") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 8)
    val dest = rows(0 until 200, "old")
    store.writeFull(dest)
    val batch = rows(150 until 230, "new").withColumn("op",
        when(col("k") % 2 === 0, lit("U")).otherwise(lit("I")))
      .unionByName(rows(10 until 20, "x").withColumn("op", lit("D")))
    store.applyCdc(batch, "op")
    assert(collectSet(store.read().get) ==
      collectSet(Upsert.applyOps(dest, batch, Seq("k"), "op")))
    // empty batch: no-op, no version churn
    val vmax = store.versions().max
    store.applyCdc(rows(0 until 0, "e").withColumn("op", lit("D")), "op")
    assert(store.versions().max == vmax)
    // first load: deletes have nothing to act on; non-deletes land
    val store2 = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    store2.applyCdc(batch, "op")
    assert(collectSet(store2.read().get) ==
      collectSet(rows(150 until 230, "new")))
    // payload drift through the CDC batch: missing column null-fills
    store.applyCdc(Seq((5L, "drifted")).toDF("k", "tag")
      .withColumn("op", lit("U")), "op")
    val r5 = store.read().get.where(col("k") === 5L).collect()
    assert(r5.length == 1 && r5(0).getString(1) == "drifted"
      && r5(0).isNullAt(2))
    // evolve through the CDC batch (upsert parity): the unknown column
    // widens the schema, the op column never does
    store.applyCdc(Seq((6L, "e", 60.0, "x")).toDF("k", "tag", "v", "extra")
      .withColumn("op", lit("U")), "op", evolve = true)
    assert(store.read().get.columns.toSeq == Seq("k", "tag", "v", "extra"))
    assert(store.read().get.where(col("k") === 6L)
      .head().getString(3) == "x")
    assert(store.read().get.where(col("k") === 5L)
      .head().isNullAt(3), "pre-evolution rows null-fill")
  }

  test("readChanges diffs ONLY changed-owner buckets yet equals the " +
      "full-table diff; compaction windows diff empty; vacuumed or " +
      "unknown versions return None") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 16)
    store.writeFull(rows(0 until 300, "old"))               // v1
    val batch = rows(290 until 320, "new").withColumn("op", lit("U"))
      .unionByName(rows(3 until 6, "d").withColumn("op", lit("D")))
    store.applyCdc(batch, "op")                             // v2
    val got = store.readChanges(1, 2).get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // full-table truth via Diff over the time-traveled snapshots
    val want = graft.cdc.Diff.snapshotDiff(
        store.readVersion(1).get, store.readVersion(2).get, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
    assert(got.count(_._2 == "removed") == 3)
    assert(got.count(_._2 == "added") == 20)   // 300..319
    assert(got.count(_._2 == "changed") == 10) // 290..299
    // same-version window: empty
    assert(store.readChanges(2, 2).get.isEmpty)
    // a compaction-only window: ownership changed, rows didn't
    store.compact(maxReferenced = 1)                        // v3
    assert(store.readChanges(2, 3).get.isEmpty)
    // readChangesSince composes from a remembered version to current
    assert(store.readChangesSince(1).get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet == got)
    // unknown / vacuumed versions: None (not an exception)
    assert(store.readChanges(1, 99).isEmpty)
    store.vacuum() // retires v1 and v2 (v3 owns everything)
    assert(store.readChanges(1, 3).isEmpty)
  }

  test("readChanges compares under the NEWER version's schema: an " +
      "evolution-widened column participates") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 4)
    store.writeFull(rows(0 until 20, "old"))                // v1
    store.upsert(Seq((5L, "old", 50.0, "x")).toDF("k", "tag", "v", "extra"),
      evolve = true)                                        // v2
    val got = store.readChanges(1, 2).get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // k=5 kept tag/v identical — only the evolved column's value makes
    // it 'changed' (pre-evolution rows null-fill `extra`)
    assert(got == Set((5L, "changed")))
  }

  test("readChangeRows carries post-images for added/changed and the " +
      "pre-image for removed, under the newer schema") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 8)
    store.writeFull(rows(0 until 50, "old"))                // v1
    val batch = rows(45 until 55, "new").withColumn("op", lit("U"))
      .unionByName(rows(2 until 4, "x").withColumn("op", lit("D")))
    store.applyCdc(batch, "op")                             // v2
    val got = store.readChangeRows(1, 2).get
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
      .toSet
    val want =
      (45 until 50).map(k => (k.toLong, "new", "changed")).toSet ++
        (50 until 55).map(k => (k.toLong, "new", "added")) ++
        (2 until 4).map(k => (k.toLong, "old", "removed"))
    assert(got == want)
    // keys-only feed agrees with the row feed's tags
    assert(store.readChanges(1, 2).get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      got.map { case (k, _, c) => (k, c) })
  }

  test("IncrementalMart: incremental refresh equals a full rebuild — " +
      "including filtered-out updates (delete, not stale) — across " +
      "multiple drains; cursor semantics") {
    def martOf(df: org.apache.spark.sql.DataFrame) =
      df.where(col("v") < 400.0) // updates can move rows OUT of the mart
        .select(col("k"), col("tag"), (col("v") * 2).as("v2"))
    val source = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    val mart = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    source.writeFull(rows(0 until 100, "old")) // v in [0, 990]
    val c0 = graft.cdc.IncrementalMart.build(source, martOf, mart).get
    // drain 1: an I/U/D mix; the +77 pushes k=33..39 (old v 330..390,
    // IN the mart) past the 400 filter — they must VANISH from the
    // mart, the case a naive upsert-only refresh leaves stale
    val b1 = rows(30 until 45, "u1")
      .withColumn("v", col("v") + 77.0).withColumn("op", lit("U"))
      .unionByName(rows(5 until 8, "d").withColumn("op", lit("D")))
    source.applyCdc(b1, "op")
    val c1 = graft.cdc.IncrementalMart.refresh(source, c0, martOf, mart,
      Seq("k")).get
    // drain 2: plain upsert — an update moving k=40,41 back INTO the
    // mart, plus genuinely new in-filter keys
    source.upsert(rows(40 until 42, "u2").withColumn("v", col("v") - 100.0)
      .union(rows(100 until 110, "u2").withColumn("v", col("v") - 800.0)))
    val c2 = graft.cdc.IncrementalMart.refresh(source, c1, martOf, mart,
      Seq("k")).get
    val rebuilt = martOf(source.read().get)
    assert(mart.read().get.collect().map(_.toSeq).toSet ==
      rebuilt.collect().map(_.toSeq).toSet)
    assert(c0 == 1 && c1 > c0 && c2 > c1)
    // idempotent re-drain of an already-applied window converges
    graft.cdc.IncrementalMart.refresh(source, c1, martOf, mart, Seq("k"))
    assert(mart.read().get.collect().map(_.toSeq).toSet ==
      rebuilt.collect().map(_.toSeq).toSet)
    // a transform that drops the key column is rejected
    intercept[IllegalArgumentException] {
      graft.cdc.IncrementalMart.refresh(source, c1,
        df => df.select(col("tag")), mart, Seq("k"))
    }
    // a vacuumed-away cursor returns None (consumer must rebuild)
    source.writeFull(source.read().get)
    source.vacuum()
    assert(graft.cdc.IncrementalMart.refresh(source, c1, martOf, mart,
      Seq("k")).isEmpty)
  }

  test("IncrementalMart.refreshWithDims: a dim change patches exactly " +
      "the affected fact rows; no mapping or lost dim window degrades " +
      "to rebuild") {
    import graft.cdc.IncrementalMart
    import graft.cdc.IncrementalMart.{Cursor, Dim}
    def factRows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, (k % 10).toLong, tag)).toDF("k", "fk", "tag")
    val source = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 16)
    val dimStore = new CowStore(spark, freshRoot(), Seq("dk"), nBuckets = 4)
    val mart = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 16)
    source.writeFull(factRows(0 until 200, "f"))
    dimStore.writeFull((0 until 10).map(i => (i.toLong, s"seg$i"))
      .toDF("dk", "seg"))
    def martOf(df: org.apache.spark.sql.DataFrame) = {
      val dc = broadcast(dimStore.read().get)
      df.join(dc, df("fk") === dc("dk"), "left")
        .select(df("k"), df("fk"), dc("seg"), df("tag"))
    }
    val dims = Seq(Dim(dimStore, Some(ch => source.read().get
      .join(ch.select("dk").distinct(), col("fk") === col("dk"))
      .select("k"))))
    val c0 = IncrementalMart.buildWithDims(source, martOf, mart, dims).get
    // fact churn AND a dim change hitting rows the churn doesn't touch
    source.upsert(factRows(190 until 210, "f2"))
    dimStore.upsert(Seq((3L, "MOVED")).toDF("dk", "seg"))
    val martV0 = mart.version.get
    val c1 = IncrementalMart.refreshWithDims(source, c0, martOf, mart,
      Seq("k"), dims).get
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(setOf(mart.read().get) == setOf(martOf(source.read().get)),
      "dim-affected rows (fk=3, keys 3,13,...,193) must re-enrich")
    // churn-cost evidence: the refresh PATCHED (mart advanced by
    // applyCdc versions), it did not writeFull-rebuild — a rebuild
    // would own every bucket under one fresh version
    assert(mart.currentManifest.values.toSet.size > 1,
      "refresh must patch buckets, not rewrite the whole mart")
    assert(mart.version.get > martV0)
    // no dim advance: plain source churn refreshes as before
    source.upsert(factRows(0 until 3, "f3"))
    val c2 = IncrementalMart.refreshWithDims(source, c1, martOf, mart,
      Seq("k"), dims).get
    assert(setOf(mart.read().get) == setOf(martOf(source.read().get)))
    assert(c2.dimVs == c1.dimVs && c2.sourceV > c1.sourceV)
    // a mapping-less dim registration rebuilds on any advance
    dimStore.upsert(Seq((4L, "MOVED2")).toDF("dk", "seg"))
    val blind = Seq(Dim(dimStore, None))
    val c3 = IncrementalMart.refreshWithDims(source,
      Cursor(c2.sourceV, c2.dimVs), martOf, mart, Seq("k"), blind).get
    assert(setOf(mart.read().get) == setOf(martOf(source.read().get)))
    assert(mart.currentManifest.values.toSet.size == 1,
      "rebuild is a full load: one owner for every bucket")
    // a dim feed window lost to vacuum also degrades to rebuild
    dimStore.upsert(Seq((5L, "MOVED3")).toDF("dk", "seg"))
    dimStore.writeFull(dimStore.read().get)
    dimStore.vacuum()
    val c4 = IncrementalMart.refreshWithDims(source, c3, martOf, mart,
      Seq("k"), dims).get
    assert(setOf(mart.read().get) == setOf(martOf(source.read().get)))
    // a reordered/mis-sized dim registration is rejected
    intercept[IllegalArgumentException] {
      IncrementalMart.refreshWithDims(source, Cursor(c4.sourceV, Nil),
        martOf, mart, Seq("k"), dims)
    }
  }

  test("a delete racing an upsert loses the CAS like any write") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 8)
    store.writeFull(rows(0 until 100, "old")) // v1
    store.upsertAt(rows(10 until 15, "A"), None, Some(1))
    intercept[graft.cdc.ConcurrentWriteException] {
      store.deleteAt(rows(12 until 20, "x").select("k"), Some(1))
    }
    // winner's merge intact; the retry against the fresh base works
    store.delete(rows(12 until 20, "x").select("k"))
    assert(collectSet(store.read().get) ==
      collectSet(Upsert(rows(0 until 100, "old"), rows(10 until 15, "A"),
        Seq("k")).where(col("k") < 12 || col("k") >= 20)))
  }

  test("vacuum(retainLast) keeps a CDF/time-travel window readable: " +
      "retained versions keep their manifest deps; tighter reclaims " +
      "drop them") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 4)
    store.writeFull(rows(0 until 100, "old")) // v1
    store.upsert(rows(0 until 3, "a"))        // v2
    store.upsert(rows(4 until 7, "b"))        // v3
    store.writeFull(store.read().get)         // v4: owns every bucket
    val before = collectSet(store.read().get)
    // retain the last 2 committed versions: v3 stays readable, and
    // keeping it transitively keeps v1/v2 (its manifest references
    // them) — the change feed over the retained window still works
    store.vacuum(retainLast = 2)
    assert(store.readVersion(3).isDefined,
      "retained version stays fully readable (its deps survive)")
    assert(collectSet(store.readVersion(3).get) == before,
      "v3 == v4's content here (the full rewrite changed no rows)")
    assert(store.readChanges(3, 4).isDefined,
      "the change feed over the retained window still works")
    // tightest reclaim: current-only (the pre-retention default)
    store.vacuum()
    assert(store.versions() == Seq(4))
    assert(store.readChanges(3, 4).isEmpty, "window fell out of retention")
    assert(collectSet(store.read().get) == before)
  }

  test("missing pointer crash-forwards to the newest manifest version") {
    val root = freshRoot()
    val store = new CowStore(spark, root, Seq("k"), nBuckets = 4)
    store.writeFull(rows(0 until 20, "old"))
    store.upsert(rows(0 until 3, "new"))
    val expect = collectSet(store.read().get)
    assert(new java.io.File(s"$root/_CURRENT").delete())
    assert(collectSet(store.read().get) == expect)
  }

  test("MoR upsert with NULL key values stays result-invisible: the " +
      "NULL-keyed slice routes through the COW merge (ADVICE r19)") {
    // The COW anti-join is non-null-safe, so a NULL-keyed batch row
    // APPENDS beside the stored NULL-keyed row; the MoR winner window
    // groups NULLs and would SUPERSEDE it — parity must hold anyway.
    val cow = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    val mor = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    val base = rows(0 until 50, "old").unionByName(
      Seq((Option.empty[Long], "oldnull", 1.0)).toDF("k", "tag", "v"))
    cow.writeFull(base)
    mor.writeFull(base)
    val inc = rows(10 until 12, "new").unionByName(
      Seq((Option.empty[Long], "newnull", 2.0)).toDF("k", "tag", "v"))
    cow.upsert(inc)
    mor.upsert(inc, mor = true)
    assert(collectSet3(mor.read().get) == collectSet3(cow.read().get))
    assert(mor.read().get.where(col("k").isNull).count() == 2,
      "both NULL-keyed rows survive (NULL never merges NULL)")
    // the non-null slice still delta-committed (manifest untouched by
    // it; only the null slice's bucket was rewritten)
    assert(mor.pendingDlBuckets.nonEmpty,
      "the non-null slice must still take the delta path")
    // the fold bakes the same answer in
    mor.compact(maxReferenced = 1)
    mor.vacuum()
    assert(collectSet3(mor.read().get) == collectSet3(cow.read().get))
  }
}
