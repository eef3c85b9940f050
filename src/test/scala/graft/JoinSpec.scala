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

  test("as-of join: NULL payload of the matched row stays NULL (merge_asof)") {
    // pandas merge_asof returns the MATCHED row's values, NULLs
    // included — a per-payload last(ignoreNulls) would leak the older
    // 1.5/1.0 instead, and could mix payload columns across rows.
    val left = Seq((1L, 10L, ts("2024-01-01 00:06:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:01:00"), Option(1.5), Option(1.0)),
      (10L, ts("2024-01-01 00:05:00"), Option.empty[Double], Option(3.0))
    ).toDF("user_id", "ts", "bid", "ask")
    val out = AsOfJoin.backward(left, right, "user_id", "ts", "ts",
        Seq("bid", "ask"))
      .select("event_id", "bid", "ask")
      .as[(Long, Option[Double], Option[Double])].collect().head
    assert(out == ((1L, None, Some(3.0))),
      s"payloads must all come from the matched 00:05 row, got $out")
  }

  test("as-of tolerance: no payload leaks from an out-of-tolerance row") {
    // matched row (01:30) is IN tolerance but its payload is NULL; the
    // older non-NULL row (00:30) is OUT of tolerance. Output must be
    // NULL — carrying payloads separately would emit 7.0 here.
    val left = Seq((1L, 10L, ts("2024-01-01 02:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:30:00"), Option(7.0)),
      (10L, ts("2024-01-01 01:30:00"), Option.empty[Double])
    ).toDF("user_id", "ts", "rate")
    val out = AsOfJoin.backward(left, right, "user_id", "ts", "ts",
        Seq("rate"), tolerance = Some("1 HOUR"))
      .select("rate").as[Option[Double]].collect().head
    assert(out.isEmpty, s"out-of-tolerance payload leaked: $out")
  }

  test("forward as-of: NULL payload of the matched row stays NULL") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:06:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:10:00"), Option.empty[Double]),
      (10L, ts("2024-01-01 00:20:00"), Option(9.0))
    ).toDF("user_id", "ts", "rate")
    val out = AsOfJoin.forward(left, right, "user_id", "ts", "ts",
        Seq("rate"))
      .select("rate").as[Option[Double]].collect().head
    assert(out.isEmpty, s"matched 00:10 row has NULL rate, got $out")
  }

  test("bucketed as-of == plain as-of (hot key spread over time buckets)") {
    // Hot key 1 carries most rows across 8 days; key 2 is sparse; some
    // buckets have no quotes (carry-in from earlier buckets), the
    // first bucket has none at all (null matches).
    val base = ts("2024-01-01 00:00:00").getTime
    def at(h: Long) = new java.sql.Timestamp(base + h * 3600 * 1000)
    val left = ((1 to 150).map(i => (i.toLong, 1L, at(i.toLong))) ++
      (1 to 12).map(i => (1000L + i, 2L, at(i * 13L))))
      .toDF("event_id", "user_id", "ts")
    // quotes only in hours 30-90, none afterwards → later buckets
    // depend entirely on carry-in; NULL rate at hour 60 pins the
    // struct semantics through the summary path too
    val right = (Seq((1L, at(30), Option(30.0)), (1L, at(55), Option(55.0)),
      (1L, at(60), Option.empty[Double]), (1L, at(90), Option(90.0)),
      (2L, at(40), Option(40.0))))
      .toDF("user_id", "ts", "rate")
    for (tol <- Seq(None, Some("36 HOURS"))) {
      val plain = AsOfJoin.backward(left, right, "user_id", "ts", "ts",
        Seq("rate"), tol).collect().map(_.toSeq).toSet
      val bucketed = AsOfJoin.backwardBucketed(left, right, "user_id",
        "ts", "ts", Seq("rate"), bucketSeconds = 86400L, tolerance = tol)
        .collect().map(_.toSeq).toSet
      assert(bucketed == plain,
        s"tolerance=$tol: bucketed != plain\n missing=${plain -- bucketed}\n extra=${bucketed -- plain}")
    }
  }

  test("auto as-of: histogram probe picks bucketed on hot keys, plain on uniform") {
    val base = ts("2024-01-01 00:00:00").getTime
    def at(h: Long) = new java.sql.Timestamp(base + h * 3600 * 1000)
    // hot: key 1 holds 150 of 162 rows; uniform: 27 keys × 6 rows
    val hotLeft = ((1 to 150).map(i => (i.toLong, 1L, at(i.toLong))) ++
      (1 to 12).map(i => (1000L + i, 2L, at(i * 13L))))
      .toDF("event_id", "user_id", "ts")
    val uniLeft = (0 until 162).map(i =>
      (i.toLong, (i % 27).toLong, at((i / 27).toLong)))
      .toDF("event_id", "user_id", "ts")
    assert(AsOfJoin.maxKeyShare(hotLeft, "user_id") > 0.9)
    assert(AsOfJoin.maxKeyShare(uniLeft, "user_id") < 0.05)
    assert(AsOfJoin.maxKeyShare(
      uniLeft.where("event_id < 0"), "user_id") == 0.0)
    // dispatch result == plain result on both distributions (either
    // branch may be taken; the answer must not depend on it)
    val right = Seq((1L, at(30), 30.0), (2L, at(40), 40.0),
      (5L, at(10), 10.0)).toDF("user_id", "ts", "rate")
    for (left <- Seq(hotLeft, uniLeft)) {
      val plain = AsOfJoin.backward(left, right, "user_id", "ts", "ts",
        Seq("rate")).collect().map(_.toSeq).toSet
      val auto = AsOfJoin.backwardAuto(left, right, "user_id", "ts", "ts",
        Seq("rate")).collect().map(_.toSeq).toSet
      assert(auto == plain)
      val fplain = AsOfJoin.forward(left, right, "user_id", "ts", "ts",
        Seq("rate")).collect().map(_.toSeq).toSet
      val fauto = AsOfJoin.forwardAuto(left, right, "user_id", "ts", "ts",
        Seq("rate")).collect().map(_.toSeq).toSet
      assert(fauto == fplain)
    }
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
