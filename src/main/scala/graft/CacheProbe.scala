package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r21 optimization round): does the CowStore
  * merge-path persist/unpersist discipline leak cache entries across
  * declared-key invocations? Runs a few CDC keys back-to-back and
  * prints the persistent-RDD count after each — a growing count means
  * CacheManager residue that taxes every later query's planning.
  * Tooling only — never benched, not part of the library surface.
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val keys = Seq("q_search_eval_graded", "q_cdc_upsert_bucketed",
      "q_cdc_mart_incremental", "q_cdc_mart_dim_change",
      "q_cdc_fk_index", "q_cdc_upsert_compacted",
      "q_search_eval_graded", "q_search_eval_graded")
    keys.foreach { k =>
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $k%-28s ${dt}%6.2f s  persistentRDDs=" +
        s"${spark.sparkContext.getPersistentRDDs.size}" +
        s"  cacheMgrEmpty=${spark.sharedState.cacheManager.isEmpty}")
    }
    spark.stop()
  }
}
