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

  test("CDC merge over a bucketed TableStore dest: dest side never shuffles") {
    import graft.cdc.{TableStore, Upsert}
    val root = Files.createTempDirectory("bucketstore").toString + "/t"
    val store = new TableStore(spark, root,
      bucketBy = Some((4, Seq("o_orderkey"))))
    val d = "/root/testdata/sf0.001"
    val orders = Tables(spark, d, "orders")
    store.write(orders)

    // read goes through the catalog (a bare scan rightly reports
    // "Bucketed: false (disabled by query planner)" — autoBucketedScan
    // only engages when an operator needs the distribution)
    val dest = store.read().get
    assert(dest.queryExecution.executedPlan.toString.contains("graft_"),
      "bucketed store read must go through the catalog")

    // C1 merge with broadcast disabled (the big-incoming case where the
    // anti-join can't build-side-broadcast): the SMJ must exchange ONLY
    // the incoming key set — the bucketed dest side reads in place.
    val incoming = orders.limit(500)
      .withColumn("o_orderstatus", org.apache.spark.sql.functions.lit("U"))
    val merged = Upsert(dest, incoming, Seq("o_orderkey"))
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"merge must engage the bucketed dest scan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1,
      s"bucketed dest must not re-shuffle for the anti-join:\n$plan")
    assert(merged.count() == orders.count())
    // rerun-safe: the next version re-lands bucketed through the catalog
    store.write(merged)
    assert(store.read().get.queryExecution.executedPlan.toString
      .contains("graft_"))
  }

  test("two bucketed stores whose roots sanitize identically stay distinct") {
    import graft.cdc.TableStore
    // "a-b" and "a_b" both sanitize to "a_b": before the root-hash
    // suffix the second store's catalog entry silently replaced the
    // first's, so reads crossed stores
    val base = Files.createTempDirectory("bucketclash").toString
    val s1 = new TableStore(spark, s"$base/a-b",
      bucketBy = Some((2, Seq("id"))))
    val s2 = new TableStore(spark, s"$base/a_b",
      bucketBy = Some((2, Seq("id"))))
    import spark.implicits._
    s1.write(Seq((1L, "one")).toDF("id", "v"))
    s2.write(Seq((2L, "two")).toDF("id", "v"))
    assert(s1.read().get.select("v").as[String].collect().toSeq == Seq("one"))
    assert(s2.read().get.select("v").as[String].collect().toSeq == Seq("two"))
  }

  test("withDedupMaintained == withDedup when dest holds the invariant") {
    import graft.cdc.Upsert
    import spark.implicits._
    val dest = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "attr", "track")
    val incoming = Seq((2L, "b1", 21L), (2L, "b2", 22L), (4L, "d", 5L))
      .toDF("id", "attr", "track")
    val slow = Upsert.withDedup(dest, incoming, Seq("id"), "track", Seq("attr"))
      .collect().map(_.toSeq).toSet
    val fast = Upsert.withDedupMaintained(dest, incoming, Seq("id"), "track",
      Seq("attr")).collect().map(_.toSeq).toSet
    assert(fast == slow)
    assert(fast.contains(Seq(2L, "b2", 22L)) && fast.contains(Seq(4L, "d", 5L)))
  }
}
