package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CowStore, FkIndex, IncrementalMart}

/** Maintained FK index (cdc.FkIndex): dim-churn → fact-key mapping as
  * a bucket-pruned lookup instead of a fact scan, kept EXACT across
  * adds / removes / in-place updates / fk reassignment by the
  * forward map. */
class FkIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-fkidx").toString

  /** facts: (k, c_custkey-as-o_custkey, v); fk = k % 10 over customers. */
  private def facts(ks: Range) =
    ks.map(k => (k.toLong, Option((k % 10).toLong), k * 1.0))
      .toDF("k", "o_cust", "v")

  private def newIndex(): FkIndex = new FkIndex(
    new CowStore(spark, freshRoot(), Seq("c_cust"), nBuckets = 8),
    new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8),
    factKeys = Seq("k"), fkCols = Seq("c_cust"),
    factFkCols = Seq("o_cust"))

  private def affectedSet(index: FkIndex, custs: Seq[Long]): Set[Long] =
    index.affectedKeys(custs.toDF("c_cust"))
      .collect().map(_.getLong(0)).toSet

  /** The truth the index must answer: fact keys whose CURRENT fk is in
    * `custs`. */
  private def scanTruth(fact: CowStore, custs: Seq[Long]): Set[Long] =
    fact.read().get.where(col("o_cust").isin(custs: _*))
      .select("k").collect().map(_.getLong(0)).toSet

  test("build answers the full-scan mapping; refresh stays EXACT " +
      "across add / remove / update / FK REASSIGNMENT / fk-null-out") {
    val fact = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    fact.writeFull(facts(0 until 100))
    val index = newIndex()
    val c0 = index.build(fact).get
    assert(affectedSet(index, Seq(3L)) == scanTruth(fact, Seq(3L)))
    assert(affectedSet(index, Seq(3L, 7L)) ==
      scanTruth(fact, Seq(3L, 7L)))
    // one churn wave with every event kind:
    //  adds (100..104, fk k%10), removes (0,10), in-place update (20:
    //  fk stays 0, v changes), REASSIGNMENT (33: fk 3 → 8),
    //  fk nulled out (44: fk 4 → NULL)
    val batch =
      facts(100 until 105).withColumn("op", lit("I"))
        .unionByName(facts(0 until 1).withColumn("op", lit("D")))
        .unionByName(facts(10 until 11).withColumn("op", lit("D")))
        .unionByName(facts(20 until 21).withColumn("v", lit(-1.0))
          .withColumn("op", lit("U")))
        .unionByName(facts(33 until 34)
          .withColumn("o_cust", lit(8L)).withColumn("op", lit("U")))
        .unionByName(facts(44 until 45)
          .withColumn("o_cust", lit(null).cast("long"))
          .withColumn("op", lit("U")))
    fact.applyCdc(batch, "op")
    val c1 = index.refresh(fact, c0).get
    // every fk the wave touched on either end, plus untouched ones
    (0L until 10L).foreach { cust =>
      assert(affectedSet(index, Seq(cust)) == scanTruth(fact, Seq(cust)),
        s"index diverged from the scan truth for fk $cust")
    }
    // the reassignment specifically: 33 left fk 3 and joined fk 8
    assert(!affectedSet(index, Seq(3L)).contains(33L),
      "stale (oldFk, k) pair survived the reassignment")
    assert(affectedSet(index, Seq(8L)).contains(33L))
    // the null-out: 44 maps to NO fk anymore
    assert(!affectedSet(index, Seq(4L)).contains(44L))
    // a second wave converges too (cursor chains)
    fact.applyCdc(facts(33 until 34).withColumn("op", lit("D")), "op")
    index.refresh(fact, c1).get
    assert(affectedSet(index, Seq(8L)) == scanTruth(fact, Seq(8L)))
  }

  test("an fk whose LAST fact disappears drops out of the reverse " +
      "store entirely (emptied key deleted, not left as stale rows)") {
    val fact = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    // fk 9 is carried by exactly one fact: k=9
    fact.writeFull(facts(0 until 10))
    val index = newIndex()
    val c0 = index.build(fact).get
    assert(affectedSet(index, Seq(9L)) == Set(9L))
    fact.applyCdc(facts(9 until 10).withColumn("op", lit("D")), "op")
    index.refresh(fact, c0).get
    assert(affectedSet(index, Seq(9L)).isEmpty)
    assert(index.reverse.read().get.where(col("c_cust") === 9L)
      .count() == 0, "the emptied fk's pair rows must be DELETED")
  }

  test("refresh window lost to vacuum → None (rebuild contract); " +
      "never-built index refuses affectedKeys loudly") {
    val fact = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    fact.writeFull(facts(0 until 50))
    val index = newIndex()
    intercept[IllegalStateException] {
      index.affectedKeys(Seq(1L).toDF("c_cust"))
    }
    val c0 = index.build(fact).get
    fact.writeFull(fact.read().get) // full rewrite
    fact.vacuum()                   // c0's manifest is gone
    assert(index.refresh(fact, c0).isEmpty)
    assert(index.build(fact).isDefined, "rebuild recovers")
  }

  test("CRASH-REPLAY exactness: a crash between the reverse and " +
      "forward commits replays to the from-scratch index (VERDICT r20 " +
      "#1 — reverse patches FIRST, so the replay re-reads the still-" +
      "old forward map and both re-patches are idempotent)") {
    val fact = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    fact.writeFull(facts(0 until 100))
    val index = newIndex()
    val c0 = index.build(fact).get
    // the wave includes the one event kind replay-exactness is about:
    // an fk REASSIGNMENT (33: fk 3 → 8), plus a delete and an add
    val batch = facts(33 until 34).withColumn("o_cust", lit(8L))
      .withColumn("op", lit("U"))
      .unionByName(facts(0 until 1).withColumn("op", lit("D")))
      .unionByName(facts(100 until 102).withColumn("op", lit("I")))
    fact.applyCdc(batch, "op")
    final class Crash extends RuntimeException("crash between commits")
    intercept[Crash] {
      index.refreshHook(fact, c0, () => throw new Crash)
    }
    // the crash window: reverse committed, forward did not — the
    // REPLAY (cursor never advanced) must converge, not resurrect the
    // stale (3, 33) pair
    val c1 = index.refresh(fact, c0).get
    assert(!affectedSet(index, Seq(3L)).contains(33L),
      "replay after the crash window resurrected the stale old-fk pair")
    assert(affectedSet(index, Seq(8L)).contains(33L))
    (0L until 10L).foreach { cust =>
      assert(affectedSet(index, Seq(cust)) == scanTruth(fact, Seq(cust)),
        s"post-replay index diverged from scan truth for fk $cust")
    }
    // and both stores equal a from-scratch twin build (compared under
    // a canonical column order: the refresh's applyCdc key-joins move
    // key columns first, a name-resolved layout detail)
    val twin = newIndex()
    twin.build(fact)
    def pairs(s: CowStore) = {
      val cols = s.read().get.columns.sorted.toSeq
      s.read().get.select(cols.map(col): _*)
        .collect().map(_.toSeq).toSet
    }
    assert(pairs(index.reverse) == pairs(twin.reverse),
      "reverse store != from-scratch build after crash-replay")
    assert(pairs(index.forward) == pairs(twin.forward),
      "forward store != from-scratch build after crash-replay")
    // a crash in the SECOND window (after both commits, cursor not yet
    // persisted) replays the whole window — also convergent
    index.refresh(fact, c0)
    assert(pairs(index.reverse) == pairs(twin.reverse))
    assert(pairs(index.forward) == pairs(twin.forward))
    c1 // consumed: the normal-path cursor chains
  }

  test("refresh on a NEVER-BUILT index returns None (the rebuild " +
      "signal) instead of silently window-loading empty stores " +
      "(VERDICT r20 #3)") {
    val fact = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    fact.writeFull(facts(0 until 20))
    val index = newIndex()
    assert(index.refresh(fact, 1).isEmpty,
      "refresh must refuse a never-built index")
    assert(!index.reverse.exists && !index.forward.exists,
      "the refusal must not materialize partial stores")
  }

  test("affectedKeys casts a TYPE-DRIFTED probe to the stored key " +
      "type before bucket routing (ADVICE r20: hash(int) != hash(long) " +
      "would prune the wrong reverse buckets and silently drop keys)") {
    val fact = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    fact.writeFull(facts(0 until 100))
    val index = newIndex()
    index.build(fact)
    // INT probe against the LONG-keyed reverse store
    val intProbe = (0 until 10).toDF("c_cust") // IntegerType
    val got = index.affectedKeys(intProbe)
      .collect().map(_.getLong(0)).toSet
    assert(got == scanTruth(fact, 0L until 10L),
      "int-typed probe must resolve identically to the long probe")
  }

  test("end-to-end: refreshWithDims over an INDEXED dim equals the " +
      "full rebuild — including facts only the dim change touches " +
      "and an fk reassignment inside the same window") {
    val source = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    val dimStore = new CowStore(spark, freshRoot(), Seq("c_cust"),
      nBuckets = 8)
    val mart = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    source.writeFull(facts(0 until 200))
    dimStore.writeFull((0L until 10L).map(c => (c, s"seg$c"))
      .toDF("c_cust", "seg"))
    def martOf(df: org.apache.spark.sql.DataFrame) = {
      val dc = broadcast(dimStore.read().get)
      df.join(dc, df("o_cust") === dc("c_cust"), "left")
        .select(df("k"), df("o_cust"), dc("seg").as("cust_seg"), df("v"))
    }
    val index = newIndex()
    val idx0 = index.build(source).get
    val dims = Seq(FkIndex.dim(dimStore, index))
    val cursor = IncrementalMart
      .buildWithDims(source, martOf, mart, dims).get
    // fact churn: one reassignment (55: fk 5 → 2) and one delete
    val batch = facts(55 until 56).withColumn("o_cust", lit(2L))
      .withColumn("op", lit("U"))
      .unionByName(facts(60 until 61).withColumn("op", lit("D")))
    source.applyCdc(batch, "op")
    index.refresh(source, idx0).get
    // dim churn on fks 2 and 5 — most affected facts saw NO fact churn
    dimStore.upsert(Seq((2L, "PROMO2"), (5L, "PROMO5"))
      .toDF("c_cust", "seg"))
    IncrementalMart.refreshWithDims(source, cursor, martOf, mart,
      Seq("k"), dims)
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(setOf(mart.read().get) == setOf(martOf(source.read().get)),
      "indexed dim-aware refresh must equal the rebuild")
    // the reassigned fact is enriched from its NEW dim row
    assert(mart.read().get.where(col("k") === 55L)
      .select("cust_seg").head().getString(0) == "PROMO2")
  }
}
