package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{Infer, Normalize}

class NormalizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("stripDollarKeys renames $-prefixed columns") {
    val df = Seq((1, "a")).toDF("$oid", "name")
    assert(Normalize.stripDollarKeys(df).columns.toSeq == Seq("oid", "name"))
  }

  test("flattenOneLevel flattens structs with k_n naming, keeps scalars") {
    val df = Seq((1L, (2L, "x"), 3.0)).toDF("id", "kv", "v")
    val flat = Normalize.flattenOneLevel(df)
    assert(flat.columns.toSeq == Seq("id", "kv__1", "kv__2", "v"))
  }

  test("dropNestedField removes exactly the dotted path") {
    val df = spark.sql(
      "SELECT 1 AS id, named_struct('user', named_struct('id', 7, 'typ', 'x'), 'v', 2.0) AS payload")
    val out = Normalize.dropNestedField(df, "payload.user.typ")
    val userType = out.schema("payload").dataType.asInstanceOf[StructType]
      .apply("user").dataType.asInstanceOf[StructType]
    assert(userType.fieldNames.toSeq == Seq("id"))
    // top-level drop
    assert(Normalize.dropNestedField(df, "payload").columns.toSeq == Seq("id"))
  }

  test("alignToSchema keeps known, fills missing with null, drops unknown") {
    val df = Seq((1L, "x", 9.9)).toDF("id", "known", "unknown")
    val dest = StructType(Seq(
      StructField("id", LongType), StructField("known", StringType),
      StructField("missing", TimestampType)))
    val out = Normalize.alignToSchema(df, dest)
    assert(out.columns.toSeq == Seq("id", "known", "missing"))
    assert(out.head().isNullAt(2))
  }

  test("decimalsToDouble casts decimal columns only") {
    val df = spark.sql("SELECT CAST(1.23 AS DECIMAL(18,2)) AS d, 'x' AS s")
    val out = Normalize.decimalsToDouble(df)
    assert(out.schema("d").dataType == DoubleType)
    assert(out.schema("s").dataType == StringType)
  }

  test("stringifyNested JSON-encodes structs/arrays, keeps scalars") {
    val df = spark.sql("SELECT 1 AS id, named_struct('a', 1) AS st, array(1,2) AS ar")
    val out = Normalize.stringifyNested(df)
    assert(out.schema("st").dataType == StringType)
    assert(out.schema("ar").dataType == StringType)
    assert(out.head().getString(1) == """{"a":1}""")
  }

  test("inferSchema promotes >80%-date string columns, mixed stays string") {
    val lines = Seq(
      """{"ts":"2024-01-01 10:00:00","d":"2024-01-01","s":"hello","m":"2024-01-01"}""",
      """{"ts":"2024-01-02 11:00:00","d":"2024-01-02","s":"world","m":"not-a-date"}""",
      """{"ts":"2024-01-03 12:00:00","d":"2024-01-03","s":"etc","m":"nope"}""",
      """{"ts":"2024-01-04 13:00:00","d":"2024-01-04","s":"x","m":"nah"}""",
      """{"ts":"2024-01-05 14:00:00","d":"2024-01-05","s":"y","m":"no"}"""
    ).toDS()
    val schema = Infer.inferSchema(spark, lines)
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("ts") == TimestampType)
    assert(types("d") == DateType)
    assert(types("s") == StringType)
    assert(types("m") == StringType) // only 20% date-like
  }

  test("readJson parses with the promoted schema (reference formats)") {
    val lines = Seq(
      """{"id":1,"ts":"2024-01-01 10:00:00"}""",
      """{"id":2,"ts":"2024-01-02 11:30:45"}""").toDS()
    val out = Infer.readJson(spark, lines).orderBy("id")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.collect().map(_.getAs[java.sql.Timestamp]("ts").toString).toSeq ==
      Seq("2024-01-01 10:00:00.0", "2024-01-02 11:30:45.0"))
  }
}
