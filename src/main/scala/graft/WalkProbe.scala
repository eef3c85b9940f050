package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement (r21): ScaleBench's cwalk leg in isolation —
  * a 50-version CowStore walked by ConsistentRead.asOfCowVersion with
  * and without `_STATS` coverage, timing ONLY the walk. Prices the
  * driver-side `_STATS` fold + single-listing versionIntact (VERDICT
  * r20 ask #5) without paying the full ScaleBench run. Tooling only —
  * never benched.
  */
object WalkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-walkprobe").toString
    val base = (0L until 100000L)
      .map(i => (i, new java.sql.Timestamp(1700000000000L + i)))
      .toDF("event_id", "ts")
    val tiny = (0L until 10L)
      .map(i => (i, new java.sql.Timestamp(1700005000000L)))
      .toDF("event_id", "ts")
    val lowWm = new java.sql.Timestamp(1700000000000L + 99999L)
    def walkAt(withStats: Boolean): Double = {
      val store = new graft.cdc.CowStore(spark, s"$dir/w_$withStats",
        Seq("event_id"), nBuckets = 16,
        statsCols = if (withStats) Seq("ts") else Nil)
      store.writeFull(base)
      (1 to 49).foreach { i =>
        store.upsert(tiny.withColumn("ts",
          col("ts") + expr(s"INTERVAL $i HOURS")))
      }
      // warmup + min of 3, walk only
      var best = Double.MaxValue
      (0 until 4).foreach { r =>
        val t0 = System.nanoTime()
        val got = graft.cdc.ConsistentRead.asOfCowVersion(
          spark, store, "ts", lowWm)
        val dt = (System.nanoTime() - t0) / 1e9
        require(got.map(_._1).contains(1), s"walk must pin v1, got $got")
        if (r > 0 && dt < best) best = dt
      }
      best
    }
    val tScan = walkAt(withStats = false)
    val tStats = walkAt(withStats = true)
    println(f"WALKPROBE versions=50 scan=${tScan}%.3f s stats=${tStats}%.3f s")
    spark.stop()
  }
}
