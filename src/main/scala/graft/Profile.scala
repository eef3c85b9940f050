package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    import graft.functions.TextFunctions
    val docs = Tables(spark, d, "documents")
    time("warmup") { docs.count() }
    val sh = docs.repartition(32)
      .select(col("doc_id"), col("lang"), TextFunctions.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("lang"),
        array_distinct(transform(TextFunctions.wordShinglesFromTokens(col("__toks"), 3), s => xxhash64(s))).as("__sh"))
      .withColumn("__sz", size(col("__sh")))
    time("sh") { sh.select(sum("__sz")).head(); 1 }
    val inv = sh.select(col("lang"), col("__sz"), col("doc_id"), explode(col("__sh")).as("__g"))
    time("inv") { inv.count() }
    val a = inv.select(col("doc_id").as("id_a"), col("__sz").as("sz_a"), col("__g"), col("lang"))
    val b = inv.select(col("doc_id").as("id_b"), col("__sz").as("sz_b"), col("__g"), col("lang"))
    time("join") { a.join(b, Seq("lang", "__g")).where(col("id_a") < col("id_b")).count() }
    time("full") { graft.operators.Dedup.ngramJaccardPairs(docs, Seq("lang")).count() }
    val ev = Tables(spark, d, "events")
    time("ev-users") { ev.select(countDistinct("user_id")).head().getLong(0) }
    time("rolling") { SparkEntry.queries("q_window_rolling_sum")(spark, d).count() }

    // Curate stage breakdown (the slowest bench key): which of the
    // eager stages inside Curate.corpus carries the time?
    {
      import graft.operators.{Curate, Dedup}
      val scored = docs
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .withColumn("lang_detected", TextFunctions.langId(col("text")))
      time("curate-score-only") { scored.count() }
      time("curate-score-again") { scored.count() }
      val kept = scored.where(col("quality") >= 0.7 &&
        col("lang_detected").isin("en"))
      time("curate-kept") { kept.count() }
      time("curate-exact-nockpt") { Dedup.exact(kept).count() }
      var unique: org.apache.spark.sql.DataFrame = null
      time("curate-checkpoint") {
        unique = Dedup.exact(kept).localCheckpoint(true); unique.count()
      }
      var pairs: org.apache.spark.sql.DataFrame = null
      time("curate-pairs") {
        pairs = Dedup.ngramJaccardPairs(unique, Seq("lang_detected"),
          threshold = 0.3)
        pairs.count()
      }
      time("curate-clusters") { Dedup.clusters(pairs).count() }
      time("curate-full") { Curate.corpus(docs).count() }
    }
    spark.stop()
  }
}
