package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextExpressions
object ProfNgram {
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
      println(f"PROF $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val docs = Tables(spark, d, "documents")
    time("warmup") { docs.count() }
    val blockCols = Seq("lang"); val idCol = "doc_id"; val threshold = 0.1
    val maxShingleDf = 1000L
    // stage timings of the new pipeline
    time("sh-ckpt") {
      val sh = docs.repartition(32)
        .select((idCol +: blockCols).map(col) :+
          TextExpressions.hashedShingles(col("text"), 3).as("__sh"): _*)
        .withColumn("__sz", size(col("__sh")))
        .localCheckpoint(true)
      sh.count()
    }
    val sh = docs.repartition(32)
      .select((idCol +: blockCols).map(col) :+
        TextExpressions.hashedShingles(col("text"), 3).as("__sh"): _*)
      .withColumn("__sz", size(col("__sh")))
      .localCheckpoint(true)
    val exploded = sh.select((blockCols :+ "__sz").map(col) :+ col(idCol) :+
      explode(col("__sh")).as("__g"): _*)
    time("exploded-count") { exploded.count() }
    val hot = exploded.groupBy((blockCols :+ "__g").map(col): _*)
      .agg(count(lit(1)).as("__df")).where(col("__df") > maxShingleDf)
      .select((blockCols :+ "__g").map(col): _*)
    val withDf = exploded.join(broadcast(hot), blockCols :+ "__g", "left_anti")
      .groupBy((blockCols :+ "__g").map(col): _*)
      .agg(collect_list(struct(col(idCol), col("__sz"))).as("__post"))
      .withColumn("__df", size(col("__post")).cast("long"))
      .select((blockCols :+ "__g" :+ "__df").map(col) :+ explode(col("__post")).as("__p"): _*)
      .select((blockCols :+ "__g" :+ "__df").map(col) ++ Seq(
        col("__p").getField(idCol).as(idCol), col("__p").getField("__sz").as("__sz")): _*)
    time("withDf-count") { withDf.count() }
    val eps = 1e-9
    time("docArr-ckpt") {
      val docArr = withDf.groupBy((blockCols :+ idCol :+ "__sz").map(col): _*)
        .agg(sort_array(collect_list(struct(col("__df").as("df"), col("__g").as("g")))).as("__arr"))
        .withColumn("__garr", transform(col("__arr"), x => x.getField("g")))
        .withColumn("__nh", size(col("__garr")))
        .withColumn("__plen", greatest(col("__nh") - ceil(col("__sz") * threshold - eps) + 1, lit(0)))
        .drop("__arr").localCheckpoint(true)
      docArr.count()
    }
    val docArr = withDf.groupBy((blockCols :+ idCol :+ "__sz").map(col): _*)
      .agg(sort_array(collect_list(struct(col("__df").as("df"), col("__g").as("g")))).as("__arr"))
      .withColumn("__garr", transform(col("__arr"), x => x.getField("g")))
      .withColumn("__nh", size(col("__garr")))
      .withColumn("__plen", greatest(col("__nh") - ceil(col("__sz") * threshold - eps) + 1, lit(0)))
      .drop("__arr").localCheckpoint(true)
    val pref = docArr.select((blockCols :+ idCol :+ "__sz" :+ "__nh").map(col) :+
      posexplode(slice(col("__garr"), lit(1), col("__plen").cast("int"))): _*)
      .withColumnRenamed("col", "__g")
    def leg(s: String) = pref.select(blockCols.map(col) :+ col("__g") :+
      col(idCol).as(s"id_$s") :+ col("__sz").as(s"sz_$s") :+
      col("__nh").as(s"nh_$s") :+ col("pos").as(s"pos_$s"): _*)
    time("pref-count") { pref.count() }
    val alpha = greatest(ceil(col("sz_a") * threshold - eps), ceil(col("sz_b") * threshold - eps),
      ceil((col("sz_a") + col("sz_b")) * (threshold / (1.0 + threshold)) - eps))
    val ubound = lit(1) + least(col("nh_a") - 1 - col("pos_a"), col("nh_b") - 1 - col("pos_b"))
    val cand = leg("a").join(leg("b"), blockCols :+ "__g")
      .where(col("id_a") < col("id_b") && ubound >= alpha)
      .select((blockCols :+ "id_a" :+ "id_b").map(col): _*).distinct()
    time("cand-count") { cand.count() }
    def side(s: String) = docArr.select(blockCols.map(col) :+
      col(idCol).as(s"id_$s") :+ col("__sz").as(s"sz_$s") :+ col("__garr").as(s"garr_$s"): _*)
    val out = cand.join(side("a"), blockCols :+ "id_a").join(side("b"), blockCols :+ "id_b")
      .withColumn("__shared", size(array_intersect(col("garr_a"), col("garr_b"))))
      .withColumn("jaccard", col("__shared").cast("double") /
        (col("sz_a") + col("sz_b") - col("__shared")).cast("double"))
      .where(col("jaccard") >= threshold)
    time("verify-count") { out.count() }
    time("full-op") { graft.operators.Dedup.ngramJaccardPairs(docs, Seq("lang")).count() }
    time("full-op-again") { graft.operators.Dedup.ngramJaccardPairs(docs, Seq("lang")).count() }
    spark.stop()
  }
}
