package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Check

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
}
