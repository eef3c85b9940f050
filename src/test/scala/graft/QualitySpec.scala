package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.{Check, Profile}

/** Declarative data-quality rules (the dbt schema-test analog). */
class QualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def fixture = Seq(
    (1L, Option("a"), "O"),
    (2L, Option("b"), "F"),
    (2L, Option("c"), "O"),      // duplicate id
    (3L, Option.empty[String], "O"), // null attr
    (4L, Option("d"), "P"))      // off-list status
    .toDF("id", "attr", "status")

  test("clean table produces zero violations") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "attr")
    val v = Check(clean, Seq(Check.Unique(Seq("id")), Check.NotNull("attr")))
    assert(v.isEmpty)
    Check.enforce(clean, Seq(Check.Unique(Seq("id")))) // must not throw
  }

  test("violations are grouped with counts, one row per offender") {
    val v = Check(fixture, Seq(
      Check.Unique(Seq("id")),
      Check.NotNull("attr"),
      Check.AcceptedValues("status", Seq("O", "F"))))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), r.getLong(3))).toSet
    assert(v == Set(
      ("unique", "id", Some("2"), 2L),
      ("not_null", "attr", None, 1L),
      ("accepted_values", "status", Some("P"), 1L)))
  }

  test("composite unique key and null-tolerant accepted_values") {
    val df = Seq((1L, "x", Option("ok")), (1L, "x", Option("ok")),
      (1L, "y", Option.empty[String])).toDF("a", "b", "c")
    val v = Check(df, Seq(
      Check.Unique(Seq("a", "b")),
      Check.AcceptedValues("c", Seq("ok"))))
      .collect()
    // (1,x) duplicated; NULL c is ignored by accepted_values (dbt parity)
    assert(v.length == 1 && v.head.getString(2) == "1|x")
  }

  test("relationship rule: orphaned foreign keys grouped with counts") {
    val ref = Seq(1L, 2L).toDF("id")
    val facts = Seq((1L, "a"), (1L, "b"), (3L, "c"), (3L, "d"),
      (4L, "e")).toDF("ref_id", "v")
    val v = Check(facts, Seq(Check.Relationship("ref_id", ref, "id")))
      .collect().map(r => (r.getString(2), r.getLong(3))).toSet
    assert(v == Set(("3", 2L), ("4", 1L)))
    // all keys resolve → clean
    assert(Check(facts.where($"ref_id" < 3),
      Seq(Check.Relationship("ref_id", ref, "id"))).isEmpty)
  }

  test("in_range rule: bounds inclusive, NULLs ignored, open sides unbounded") {
    val df = Seq(Option(0.5), Option(1.0), Option(1.5), Option(-2.0), None)
      .toDF("score")
    val v = Check(df, Seq(Check.InRange("score", Some(0.0), Some(1.0))))
      .collect().map(r => (Option(r.getString(2)), r.getLong(3))).toSet
    assert(v == Set((Some("1.5"), 1L), (Some("-2.0"), 1L)), s"got $v")
    // open-ended: only a lower bound
    assert(Check(df, Seq(Check.InRange("score", Some(0.0), None))).count() == 1)
    // route: violators quarantined with the rule label
    val (clean, dirty) = Check.route(df,
      Seq(Check.InRange("score", Some(0.0), Some(1.0))))
    assert(clean.count() == 3) // 0.5, 1.0 (inclusive), NULL (ignored)
    assert(dirty.select("__violations").as[String].collect().toSet ==
      Set("in_range(score)"))
  }

  test("enforce throws with offenders in the message") {
    val e = intercept[IllegalStateException] {
      Check.enforce(fixture, Seq(Check.Unique(Seq("id"))), "fixture")
    }
    assert(e.getMessage.contains("fixture"))
  }

  test("profile: nulls, exact distinct, and typed min/max routing") {
    import java.sql.Timestamp
    import graft.quality.Profile
    val df = Seq(
      (1L, Option(2.5), Option("b"), Option(Timestamp.valueOf("2024-01-01 00:00:00"))),
      (2L, Option(7.5), Option("a"), Option(Timestamp.valueOf("2024-03-01 12:00:00"))),
      (2L, Option.empty[Double], Option.empty[String], Option.empty[Timestamp]),
      (3L, Option(2.5), Option("a"), Option(Timestamp.valueOf("2024-01-01 00:00:00"))))
      .toDF("id", "score", "tag", "ts")
    val p = Profile.stats(df, Seq("id", "score", "tag", "ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "score", "tag", "ts"))
    p.values.foreach(r => assert(r.getLong(1) == 4L)) // n_rows everywhere
    val id = p("id")
    assert(id.getLong(2) == 0L && id.getLong(3) == 3L) // nulls, distinct
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 3.0)
    assert(id.isNullAt(6) && id.isNullAt(7)) // numeric → str pair NULL
    val sc = p("score")
    assert(sc.getLong(2) == 1L && sc.getLong(3) == 2L) // NULL not distinct
    assert(sc.getDouble(4) == 2.5 && sc.getDouble(5) == 7.5)
    val tag = p("tag")
    assert(tag.getLong(2) == 1L && tag.getLong(3) == 2L)
    assert(tag.isNullAt(4) && tag.isNullAt(5)) // string → num pair NULL
    assert(tag.getString(6) == "a" && tag.getString(7) == "b")
    val ts = p("ts")
    // epoch seconds (session tz UTC): 2024-01-01T00:00Z / 2024-03-01T12:00Z
    assert(ts.getDouble(4) == 1704067200.0 && ts.getDouble(5) == 1709294400.0)
  }

  test("profile: statsApprox matches exact except HLL-bounded distinct") {
    import graft.quality.Profile
    val df = (1 to 5000).map(i => (i.toLong % 997, s"v${i % 211}"))
      .toDF("k", "v")
    val exact = Profile.stats(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Profile.statsApprox(df, Seq("k", "v"), rsd = 0.05)
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("k", "v").foreach { c =>
      val (e, a) = (exact(c), approx(c))
      assert(a.getLong(1) == e.getLong(1) && a.getLong(2) == e.getLong(2))
      val (ed, ad) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(ad - ed) / ed <= 0.15, s"$c distinct: $ad vs $ed")
      assert(a.getString(6) == e.getString(6) || a.getDouble(4) == e.getDouble(4))
    }
  }

  test("profile: unsupported column type is refused, missing column named") {
    import graft.quality.Profile
    val df = Seq((1L, Seq("x"))).toDF("id", "arr")
    val e1 = intercept[IllegalArgumentException] {
      Profile.stats(df, Seq("arr"))
    }
    assert(e1.getMessage.contains("arr"))
    val e2 = intercept[IllegalArgumentException] {
      Profile.stats(df, Seq("nope"))
    }
    assert(e2.getMessage.contains("nope"))
  }

  test("Outliers: Tukey fences flag the planted extremes, nothing else") {
    import graft.quality.Outliers
    // group "a": 0..9 plus planted -100/+100; group "b": tight cluster,
    // no outliers even though its values would be outliers under "a"'s
    // fences (per-group fences, not global).
    val rows = ((0 to 9).map(i => ("a", Some(i.toDouble))) ++
      Seq(("a", Some(-100.0)), ("a", Some(100.0)), ("a", Option.empty[Double])) ++
      (0 to 9).map(i => ("b", Some(1000.0 + i)))).toDF("g", "v")
    val flags = Outliers.flag(rows, "v", Seq("g"))
      .where($"is_low" || $"is_high")
      .select("g", "v", "is_low", "is_high").as[(String, Option[Double], Boolean, Boolean)]
      .collect().toSet
    assert(flags == Set(("a", Some(-100.0), true, false),
      ("a", Some(100.0), false, true)))

    val s = Outliers.summary(rows, "v", Seq("g"))
      .select("g", "n_vals", "n_low", "n_high")
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, n, lo, hi) => g -> ((n, lo, hi)) }.toMap
    // n_vals counts non-null values only; the NULL row is not an outlier
    assert(s("a") == ((12L, 1L, 1L)) && s("b") == ((10L, 0L, 0L)))
  }

  test("Outliers: approx path agrees with exact on a small frame") {
    import graft.quality.Outliers
    val rows = ((1 to 200).map(i => ("g", i.toDouble)) ++
      Seq(("g", 1e6))).toDF("g", "v")
    val exact = Outliers.flag(rows, "v", Seq("g"))
      .where($"is_low" || $"is_high").select("v").as[Double].collect().toSet
    val approx = Outliers.flagApprox(rows, "v", Seq("g"))
      .where($"is_low" || $"is_high").select("v").as[Double].collect().toSet
    // at accuracy 10000 on 201 rows the GK sketch is exact
    assert(exact == Set(1e6) && approx == exact)
  }

  test("Diff: added/removed/changed partition, unchanged rows absent") {
    import graft.cdc.Diff
    val oldSnap = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0))
      .toDF("k", "s", "v")
    val newSnap = Seq((2L, "y", 2.0), (3L, "z", 30.0), (4L, "w", 4.0))
      .toDF("k", "s", "v")
    val d = Diff.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(d == Set((1L, Diff.Removed), (3L, Diff.Changed), (4L, Diff.Added)))
  }

  test("Diff: a column-value swap into NULL is changed (null-flag interleave)") {
    import graft.cdc.Diff
    // ("x", NULL) -> (NULL, "x"): both hash families fold NULL as a
    // no-op, so WITHOUT the interleaved null flags this row would
    // digest identically on both sides and pass as unchanged.
    val oldSnap = Seq((1L, Option("x"), Option.empty[String]))
      .toDF("k", "a", "b")
    val newSnap = Seq((1L, Option.empty[String], Option("x")))
      .toDF("k", "a", "b")
    val d = Diff.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .as[(Long, String)].collect().toList
    assert(d == List((1L, Diff.Changed)))
  }

  test("Diff: compareCols restricts the compared surface; extra columns ignored") {
    import graft.cdc.Diff
    val oldSnap = Seq((1L, "x", "meta1")).toDF("k", "a", "loaded_by")
    val newSnap = Seq((1L, "x", "meta2")).toDF("k", "a", "loaded_by")
    // default: loaded_by differs -> changed
    assert(Diff.snapshotDiff(oldSnap, newSnap, Seq("k")).count() == 1)
    // restricted to `a`: identical -> empty diff
    assert(Diff.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("a")).isEmpty)
    // a column only one side has is never compared (schema drift is
    // Normalize's job): old carries `extra`, new does not -> unchanged
    val o2 = oldSnap.withColumn("extra", lit(7))
    assert(Diff.snapshotDiff(o2, newSnap, Seq("k"), Seq("a")).isEmpty)
  }

  test("Drift PSI: zero on identical, positive on shift, finite on empty buckets") {
    import graft.quality.Drift
    val old = (1 to 1000).map(_.toDouble).toDF("v")
    // identical snapshots: every contrib is exactly 0.0
    val same = Drift.psi(old, old, "v")
      .select("psi_contrib").as[Double].collect()
    assert(same.length == 10 && same.forall(_ == 0.0), same.toSeq.toString)
    // hard right-shift: mass leaves the low buckets -> PSI well over
    // the 0.25 "investigate" convention
    val shifted = (1 to 1000).map(i => i.toDouble + 500).toDF("v")
    val psiS = Drift.psiTotal(old, shifted, "v")
    assert(psiS > 0.25, s"hard shift must flag: $psiS")
    // mild shift scores lower than the hard one but still nonzero
    val mild = (1 to 1000).map(i => i.toDouble + 30).toDF("v")
    val psiM = Drift.psiTotal(old, mild, "v")
    assert(psiM > 0.0 && psiM < psiS, s"mild $psiM vs hard $psiS")
    // new values entirely above the old range: 9 empty new-side
    // buckets, Laplace smoothing keeps every contrib finite
    val disjoint = (5000 to 5100).map(_.toDouble).toDF("v")
    val rows = Drift.psi(old, disjoint, "v")
      .select("n_new", "psi_contrib").as[(Long, Double)].collect()
    assert(rows.count(_._1 == 0L) == 9 &&
      rows.forall(r => !r._2.isNaN && !r._2.isInfinite), rows.toSeq.toString)
    assert(rows.map(_._1).sum == 101L, "every new row lands in a bucket")
  }

  test("Drift PSI approx path agrees with exact on a small frame") {
    import graft.quality.Drift
    val old = (1 to 2000).map(_.toDouble).toDF("v")
    val shifted = (1 to 2000).map(i => i.toDouble + 300).toDF("v")
    val exact = Drift.psi(old, shifted, "v")
      .collect().map(_.toSeq).toSeq
    // at accuracy 10000 on 2000 rows the GK sketch returns exact
    // quantiles, so the whole frame matches bucket for bucket
    val approx = Drift.psiApprox(old, shifted, "v")
      .collect().map(_.toSeq).toSeq
    assert(approx == exact && exact.nonEmpty)
  }

  test("Drift categorical: new category lands in __other__, identical is zero") {
    import graft.quality.Drift
    val old = (Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ Seq.fill(200)("c"))
      .toDF("c")
    val same = Drift.psiCategorical(old, old, "c", topK = 3)
      .select("psi_contrib").as[Double].collect()
    assert(same.length == 4 && same.forall(_ == 0.0), same.toSeq.toString)
    // half of category a re-labels to a NEVER-SEEN category: it must
    // surface as __other__ growth, not silently vanish
    val renamed = (Seq.fill(250)("a") ++ Seq.fill(250)("zz") ++
      Seq.fill(300)("b") ++ Seq.fill(200)("c")).toDF("c")
    val rows = Drift.psiCategorical(old, renamed, "c", topK = 3)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows("__other__")._1 == 0L && rows("__other__")._2 == 250L,
      s"unseen category must count as __other__: $rows")
    assert(rows("__other__")._3 > 0.0 && rows("a")._3 > 0.0,
      s"both the drained and the catch-all bucket contribute: $rows")
    // NULLs are __other__ too (a feed going NULL is drift)
    val withNulls = (Seq.fill(500)(Option("a")) ++ Seq.fill(500)(Option.empty[String]))
      .toDF("c")
    val n = Drift.psiCategorical(old, withNulls, "c", topK = 3)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(n("__other__") == 500L)
  }

  test("Diff: keys-only tables degrade to added/removed, never error") {
    import graft.cdc.Diff
    // no common non-key columns -> empty digest surface; `changed` is
    // impossible and the diff must not fail analysis (zero-child hash)
    val oldSnap = Seq(1L, 2L).toDF("k")
    val newSnap = Seq(2L, 3L).toDF("k")
    val d = Diff.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(d == Set((1L, Diff.Removed), (3L, Diff.Added)))
    // fully drifted non-key schemas reduce to the same keys-only diff
    val o2 = oldSnap.withColumn("only_old", lit("x"))
    val n2 = newSnap.withColumn("only_new", lit("y"))
    val d2 = Diff.snapshotDiff(o2, n2, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(d2 == d)
  }

  test("Outliers: NULL-group rows are kept by the null-safe fence join") {
    import graft.quality.Outliers
    // the NULL group gets its own fences (groupBy emits a NULL-group
    // row); a plain equi-join would drop every one of its input rows
    val rows = ((0 to 9).map(i => (Option.empty[String], i.toDouble)) ++
      Seq((Option.empty[String], 100.0)) ++
      (0 to 9).map(i => (Option("a"), i.toDouble))).toDF("g", "v")
    val flags = Outliers.flag(rows, "v", Seq("g"))
    assert(flags.count() == rows.count(),
      "flag must preserve every input row, including the NULL group")
    val hit = flags.where($"is_low" || $"is_high")
      .select("g", "v").as[(Option[String], Double)].collect().toSet
    assert(hit == Set((None, 100.0)),
      s"only the NULL group's planted extreme flags: $hit")
    val s = Outliers.summary(rows, "v", Seq("g"))
      .select("g", "n_vals", "n_high")
      .as[(Option[String], Long, Long)].collect()
      .map { case (g, n, h) => g -> ((n, h)) }.toMap
    assert(s(None) == ((11L, 1L)) && s(Some("a")) == ((10L, 0L)))
  }

  test("IncrementalProfile: churn-cost refresh equals a from-scratch " +
      "exact profile; HLL distinct within tolerance; emptied buckets " +
      "drop their stat rows") {
    import graft.cdc.CowStore
    import graft.quality.IncrementalProfile
    def freshRoot() =
      java.nio.file.Files.createTempDirectory("graft-iprof").toString
    def rows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, tag, k * 10.0)).toDF("k", "tag", "v")
    val source = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    val stats = new CowStore(spark, freshRoot(), Seq("bkt", "col_name"),
      nBuckets = 4)
    val cols = Seq("k", "tag", "v")
    source.writeFull(rows(0 until 500, "old"))
    val c0 = IncrementalProfile.build(source, cols, stats).get
    // churn 1: updates + deletes (D empties no whole bucket yet)
    val b1 = rows(450 until 520, "new").withColumn("op", lit("U"))
      .unionByName(rows(10 until 40, "d").withColumn("op", lit("D")))
    source.applyCdc(b1, "op")
    val c1 = IncrementalProfile.refresh(source, c0, cols, stats).get
    def exactOf(df: org.apache.spark.sql.DataFrame) =
      Profile.stats(df, cols)
        .select("col_name", "n_rows", "n_nulls", "min_num", "max_num",
          "min_str", "max_str")
        .collect().map(_.toSeq).toSet
    def incr() = IncrementalProfile.global(stats).get
      .select("col_name", "n_rows", "n_nulls", "min_num", "max_num",
        "min_str", "max_str")
      .collect().map(_.toSeq).toSet
    assert(incr() == exactOf(source.read().get))
    // churn 2: delete EVERYTHING (all buckets empty) → stat rows gone
    val c2 = IncrementalProfile.refresh(source, c1, cols, stats).get
    assert(c2 == c1, "no churn → same cursor")
    source.delete(source.read().get.select("k"))
    IncrementalProfile.refresh(source, c2, cols, stats)
    assert(IncrementalProfile.global(stats).forall(_.isEmpty),
      "a fully-emptied table has no stat rows")
    // rebuild-after-churn on a repopulated table, then HLL tolerance
    source.upsert(rows(0 until 300, "re"))
    val c3 = IncrementalProfile.refresh(source,
      source.version.get - 1, cols, stats).get
    assert(incr() == exactOf(source.read().get))
    val approx = IncrementalProfile.global(stats).get
      .where(col("col_name") === "k")
      .select("n_distinct_approx").head().getLong(0)
    assert(math.abs(approx - 300L) <= 300 * 0.1,
      s"HLL distinct off: $approx vs 300")
    // vacuumed-away cursor → None (consumer rebuilds)
    source.writeFull(source.read().get)
    source.vacuum()
    assert(IncrementalProfile.refresh(source, c3, cols, stats).isEmpty)
  }

  test("maintained fences gate a fresh load with zero history scan: " +
      "IncrementalProfile.fences + Outliers.flagWith agree with the " +
      "approx fences off the ε boundary") {
    import graft.cdc.CowStore
    import graft.quality.IncrementalProfile
    def freshRoot() =
      java.nio.file.Files.createTempDirectory("graft-ifence").toString
    // heavy-tailed history so fences are non-trivial
    val hist = (0 until 4000).map { i =>
      val u = ((i * 2654435761L) % 10007).toDouble / 10007.0
      (i.toLong, u * u * 1000.0)
    }.toDF("k", "v")
    val source = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    val stats = new CowStore(spark, freshRoot(), Seq("bkt", "col_name"),
      nBuckets = 4)
    source.writeFull(hist)
    IncrementalProfile.build(source, Seq("v"), stats)
    val f = IncrementalProfile.fences(stats).get
      .where(col("col_name") === "v").drop("col_name")
    // the maintained quartiles obey the ε rank contract vs history
    val eps = graft.functions.GkSketch.DefaultEps
    val (q1m, q3m) = {
      val r = f.head(); (r.getDouble(0), r.getDouble(1))
    }
    val vs = hist.select("v").collect().map(_.getDouble(0)).sorted
    def rank(x: Double) = vs.count(_ <= x)
    assert(math.abs(rank(q1m) - 0.25 * vs.length) <= eps * vs.length + 1)
    assert(math.abs(rank(q3m) - 0.75 * vs.length) <= eps * vs.length + 1)
    // gate a fresh load: planted extremes flag, mid-range rows don't —
    // and the flags agree with the engine-approx fences off-boundary
    val fresh = Seq((9001L, -1e6), (9002L, 1e9), (9003L, 500.0))
      .toDF("k", "v")
    val viaProfile = graft.quality.Outliers
      .flagWith(fresh, "v", Nil, f.withColumn("__g", lit(1)).drop("__g"))
      .select("k", "is_low", "is_high").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(viaProfile(9001L) == ((true, false)))
    assert(viaProfile(9002L) == ((false, true)))
    assert(viaProfile(9003L) == ((false, false)))
    // an all-string profile has no numeric fences (empty frame, no NPE)
    val sStats = new CowStore(spark, freshRoot(), Seq("bkt", "col_name"),
      nBuckets = 4)
    val sSrc = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 4)
    sSrc.writeFull(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    IncrementalProfile.build(sSrc, Seq("s"), sStats)
    assert(IncrementalProfile.fences(sStats).get.count() == 0)
  }

  test("incremental consumers across a MERGE-ON-READ delete window: " +
      "profile refresh and mart refresh both see the register diff") {
    import graft.cdc.{CowStore, IncrementalMart}
    import graft.quality.IncrementalProfile
    def freshRoot() =
      java.nio.file.Files.createTempDirectory("graft-iprof-mor").toString
    def rows(ks: Range, tag: String) =
      ks.map(k => (k.toLong, tag, k * 10.0)).toDF("k", "tag", "v")
    val source = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    val stats = new CowStore(spark, freshRoot(), Seq("bkt", "col_name"),
      nBuckets = 4)
    val mart = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    val cols = Seq("k", "tag", "v")
    def martOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), (col("v") + 1).as("v1"))
    source.writeFull(rows(0 until 400, "old"))
    val p0 = IncrementalProfile.build(source, cols, stats).get
    val m0 = IncrementalMart.build(source, martOf, mart).get
    // the delete commits ONLY tombstones — no bucket owner changes;
    // changedBuckets must still report the register-diff buckets, and
    // both consumers must converge on the post-delete table
    source.delete(rows(0 until 400, "x").where(col("k") % 7 === 3)
      .select("k"), mor = true)
    assert(IncrementalProfile.refresh(source, p0, cols, stats).isDefined)
    val prof = IncrementalProfile.global(stats).get
      .select("col_name", "n_rows", "n_nulls", "min_num", "max_num",
        "min_str", "max_str").collect().map(_.toSeq).toSet
    val exact = Profile.stats(source.read().get, cols)
      .select("col_name", "n_rows", "n_nulls", "min_num", "max_num",
        "min_str", "max_str").collect().map(_.toSeq).toSet
    assert(prof == exact, "profile must absorb the MoR delete")
    IncrementalMart.refresh(source, m0, martOf, mart, Seq("k"))
    assert(mart.read().get.collect().map(_.toSeq).toSet ==
      martOf(source.read().get).collect().map(_.toSeq).toSet,
      "mart must delete the tombstoned keys' rows")
  }

  test("fences: an all-NULL numeric history column yields NO fence " +
      "row — NaN fences would flag every fresh value as is_low " +
      "(ADVICE r19: NaN orders above every double)") {
    import graft.cdc.CowStore
    import graft.quality.IncrementalProfile
    def freshRoot() =
      java.nio.file.Files.createTempDirectory("graft-nanfence").toString
    // `dead` never carries a value; `v` has a real distribution
    val hist = (0 until 400).map(i =>
      (i.toLong, Option.empty[Double], i * 1.0)).toDF("k", "dead", "v")
    val source = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    val stats = new CowStore(spark, freshRoot(), Seq("bkt", "col_name"),
      nBuckets = 4)
    source.writeFull(hist)
    IncrementalProfile.build(source, Seq("dead", "v"), stats)
    val f = IncrementalProfile.fences(stats).get
    assert(f.where(col("col_name") === "dead").count() == 0,
      "no distribution → no fence row, never a NaN one")
    assert(f.where(col("col_name") === "v").count() == 1)
    // gating a fresh load on the dead column flags NOTHING (its rows
    // drop at the fence join) instead of flagging every row is_low
    val fresh = Seq((9001L, 5.0), (9002L, -3.0)).toDF("k", "dead")
    val flagged = graft.quality.Outliers.flagWith(fresh, "dead", Nil,
      f.where(col("col_name") === "dead").drop("col_name"))
    assert(flagged.count() == 0)
  }

  test("sketchAgg accepts non-double numeric inputs (int/long cast " +
      "at the column layer — the native aggregate unboxes Double)") {
    import graft.functions.GkSketch
    val ints = (1 to 100).map(i => Tuple1(i)).toDF("v")
    val q = ints.agg(GkSketch.quantilesOf(
      GkSketch.sketchAgg(col("v")), Seq(0.5)).as("qs"))
      .head().getSeq[Double](0)
    assert(math.abs(q.head - 50.0) <= 2.0, s"median off: ${q.head}")
  }

  test("refresh on a pre-qsk stat store returns None (format " +
      "migration → rebuild), never a silently quantile-less store") {
    import graft.cdc.CowStore
    import graft.quality.IncrementalProfile
    def freshRoot() =
      java.nio.file.Files.createTempDirectory("graft-preqsk").toString
    val source = new CowStore(spark, freshRoot(), Seq("k"), nBuckets = 8)
    val stats = new CowStore(spark, freshRoot(), Seq("bkt", "col_name"),
      nBuckets = 4)
    source.writeFull((0 until 200).map(i => (i.toLong, i * 2.0))
      .toDF("k", "v"))
    val c0 = IncrementalProfile.build(source, Seq("v"), stats).get
    // simulate an r18-format store: rewrite it without the qsk column
    stats.writeFull(stats.read().get.drop("qsk"))
    source.upsert((0 until 10).map(i => (i.toLong, 999.0)).toDF("k", "v"))
    assert(IncrementalProfile.refresh(source, c0, Seq("v"), stats).isEmpty,
      "a qsk-less store must signal rebuild, not refresh into a crash")
    // the signalled rebuild restores the full profile incl. quantiles
    val c1 = IncrementalProfile.build(source, Seq("v"), stats).get
    assert(IncrementalProfile.refresh(source, c1, Seq("v"), stats)
      .contains(c1))
    val q = IncrementalProfile.global(stats).get
      .where(col("col_name") === "v").select("quantiles").head()
    assert(!q.isNullAt(0))
  }
}
