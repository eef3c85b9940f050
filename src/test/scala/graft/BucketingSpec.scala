package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-shuffled table layout → co-located joins with NO
  * exchange on either side (the SCALE.md co-location strategy for
  * repeated big-big joins on a stable key at 100 TB). */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("bucketwh").toString)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("join of co-bucketed tables plans without shuffle exchanges") {
    val d = "/root/testdata/sf0.001"
    // the session (and its warehouse dir) may be shared with other
    // suites and prior runs — clear both catalog entries and locations
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(dir)
      }
    }
    Tables(spark, d, "lineitem")
      .write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    Tables(spark, d, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), Seq("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"co-bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)

    // contrast: the same join over raw parquet DOES shuffle
    val unbucketed = Tables(spark, d, "lineitem").join(
      Tables(spark, d, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"))
    assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
