package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, RangeJoin}

/** Edge semantics of the composed join operators. */
class JoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join: inclusive at equal ts, null before first right row") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // before any quote → null
      (2L, 10L, ts("2024-01-01 00:05:00")), // equal ts → inclusive match
      (3L, 10L, ts("2024-01-01 00:30:00")), // after both → latest wins
      (4L, 99L, ts("2024-01-01 12:00:00"))  // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:05:00"), 1.5),
      (10L, ts("2024-01-01 00:10:00"), 2.5)
    ).toDF("user_id", "ts", "rate")
    val out = AsOfJoin.backward(left, right, "user_id", "ts", "ts", Seq("rate"))
      .select("event_id", "rate").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(1.5))
    assert(out(3L).contains(2.5))
    assert(out(4L).isEmpty)
  }

  test("range join: [lo, hi) boundary semantics, long intervals found") {
    val points = Seq((1L, 0.0), (2L, 9.999), (3L, 10.0), (4L, 250.0))
      .toDF("event_id", "value")
    val intervals = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0), ("wide", 0.0, 300.0))
      .toDF("name", "lo", "hi")
    val out = RangeJoin.pointInterval(points, intervals, "value", "lo", "hi",
        bucketWidth = 25.0)
      .select("event_id", "name").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(out(1L) == Set("a", "wide"))   // lo inclusive
    assert(out(2L) == Set("a", "wide"))
    assert(out(3L) == Set("b", "wide"))   // hi exclusive for "a"
    assert(out(4L) == Set("wide"))        // interval spanning many buckets
  }
}
