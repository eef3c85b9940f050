package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only timing harness (test sourceset — never ships in the
  * production artifact). Times named [[graft.SparkEntry.queries]] keys
  * against a data dir, calling ONLY the real operators so the numbers
  * can never drift from what the bench measures.
  *
  * Usage: sbt "Test/runMain graft.tools.Prof <sfDir> <key> [key ...]"
  * (2 timed runs per key; first run includes plan/codegen warmup).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Prof <sfDir> <key> [key ...]")
    val dir = args.head
    val keys = args.tail.toSeq
    val unknown = keys.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown keys: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m") // see Bench.scala
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // session warmup
    keys.foreach { k =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(k)(spark, dir).count()
        println(f"PROF $k%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
    }
    spark.stop()
  }
}
