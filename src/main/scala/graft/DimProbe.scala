package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-timer for q_cdc_mart_dim_change's lifecycle body
  * (r21): times each fixture/operator phase separately so the
  * optimization aims at the real sink. Tooling only — never benched.
  */
object DimProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    // warmup: run the whole key once
    SparkEntry.queries("q_cdc_mart_dim_change")(s, d).count()

    @volatile var curPhase = "init"
    val jobTimes = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobTimes.put(js.jobId, (curPhase, js.time))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val v = jobTimes.get(je.jobId)
          if (v != null)
            println(f"DIMJOB ${v._1}%-18s job=${je.jobId}%4d " +
              f"${(je.time - v._2) / 1000.0}%6.2f s")
        }
      })
    def phase[T](name: String)(f: => T): T = {
      curPhase = name
      val t0 = System.nanoTime()
      val r = f
      println(f"DIMPROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-dimprobe").toString
    def root(t: String) = s"$scratch/$t"

    val dest = Tables(s, d, "orders")
      .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
    val dim = Tables(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val source = new graft.cdc.CowStore(s, root("src"), Seq("o_orderkey"), 16)
    val dimStore = new graft.cdc.CowStore(s, root("dim"), Seq("c_custkey"), 16)
    val mart = new graft.cdc.CowStore(s, root("dst"), Seq("o_orderkey"), 16)
    phase("writeFull source")(source.writeFull(dest))
    phase("writeFull dim")(dimStore.writeFull(dim))
    def martOf(df: org.apache.spark.sql.DataFrame) = {
      val dc = broadcast(dimStore.read().get)
      df.join(dc, df("o_custkey") === dc("c_custkey"), "left")
        .select(df("o_orderkey"), df("o_custkey"),
          dc("c_mktsegment").as("cust_segment"),
          df("o_totalprice"), df("o_orderstatus"))
    }
    val index = new graft.cdc.FkIndex(
      new graft.cdc.CowStore(s, root("rev"), Seq("c_custkey"), 16),
      new graft.cdc.CowStore(s, root("fwd"), Seq("o_orderkey"), 16),
      factKeys = Seq("o_orderkey"), fkCols = Seq("c_custkey"),
      factFkCols = Seq("o_custkey"))
    val idxCursor = phase("index.build")(index.build(source).get)
    val dims = Seq(graft.cdc.FkIndex.dim(dimStore, index))
    val cursor = phase("buildWithDims")(graft.cdc.IncrementalMart
      .buildWithDims(source, martOf, mart, dims).get)
    val batch = dest
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .withColumn("op", lit("U"))
      .unionByName(dest
        .where(col("o_orderkey") % 9 === 4 &&
          col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
        .withColumn("op", lit("D")))
    phase("source.applyCdc")(source.applyCdc(batch, "op"))
    phase("index.refresh")(index.refresh(source, idxCursor))
    phase("dim.upsert")(dimStore.upsert(dim.where(col("c_custkey") % 4 === 1)
      .withColumn("c_mktsegment", lit("PROMO"))))
    phase("refreshWithDims")(graft.cdc.IncrementalMart
      .refreshWithDims(source, cursor, martOf, mart, Seq("o_orderkey"), dims))
    phase("final read+consume")(Bench.consume(mart.read().get
      .orderBy("o_orderkey")))
    spark.stop()
  }
}
