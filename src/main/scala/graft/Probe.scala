package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ivf, Similarity}
import graft.functions.{TextExpressions, TextFunctions}

/** Scratch measurement main for round-4 gate tuning — DELETE before commit. */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, d, "documents")
    val embs = Tables(spark, d, "embeddings")

    // minhash recall vs exact ngram pairs (threshold 0.3, no blocks)
    val exact = Dedup.ngramJaccardPairs(docs, blockCols = Nil, threshold = 0.3)
      .select("id_a", "id_b")
    val mh = Dedup.minhashLsh(docs, threshold = 0.3)
      .select("id_a", "id_b").withColumn("__hit", lit(1))
    val r1 = exact.join(mh, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hit")).collect()(0)
    println(s"PROBE minhash n_exact=${r1.getLong(0)} n_hit=${r1.getLong(1)}")
    val mhOnly = mh.join(exact.withColumn("__e", lit(1)), Seq("id_a", "id_b"), "left")
      .where(col("__e").isNull).count()
    println(s"PROBE minhash not_in_exact=$mhOnly")

    // simhash completeness vs brute truth
    val sh = docs.select(col("doc_id"),
      TextExpressions.simhash64(TextFunctions.tokens(col("text"))).as("__sim"))
    val a = sh.select(col("doc_id").as("id_a"), col("__sim").as("sa"))
    val b = sh.select(col("doc_id").as("id_b"), col("__sim").as("sb"))
    val truth = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .where(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("id_a", "id_b")
    val found = Dedup.simhashDup(docs).select("id_a", "id_b")
      .withColumn("__f", lit(1))
    val r2 = truth.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("__f"), lit(0))).as("n_found")).collect()(0)
    println(s"PROBE simhash n_truth=${r2.getLong(0)} n_found=${r2.getLong(1)}")

    // embed lsh recall vs exact
    val ee = Dedup.embeddingCosinePairs(embs, Seq("label"), threshold = 0.35)
      .select("id_a", "id_b")
    val el = Dedup.embeddingCosinePairsLsh(embs, Seq("label"),
      threshold = 0.35, tables = 32, bits = 4)
      .select("id_a", "id_b").withColumn("__hit", lit(1))
    val r3 = ee.join(el, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hit")).collect()(0)
    println(s"PROBE embedlsh n_exact=${r3.getLong(0)} n_hit=${r3.getLong(1)}")

    // approx distinct rel err
    val li = Tables(spark, d, "lineitem")
    val r4 = li.agg(
      countDistinct(col("l_orderkey")).as("eo"),
      approx_count_distinct(col("l_orderkey")).as("ao"),
      countDistinct(col("l_partkey")).as("ep"),
      approx_count_distinct(col("l_partkey")).as("ap")).collect()(0)
    println(s"PROBE approxdist eo=${r4.getLong(0)} ao=${r4.getLong(1)} ep=${r4.getLong(2)} ap=${r4.getLong(3)}")

    // approx quantile rank fractions
    val qs = li.groupBy("l_returnflag").agg(
      expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)").as("qs"))
    val joined = li.join(broadcast(qs), Seq("l_returnflag"))
    val r5 = joined.groupBy("l_returnflag").agg(
      (sum(when(col("l_extendedprice") <= col("qs").getItem(0), 1).otherwise(0))
        .cast("double") / count(lit(1))).as("f50"),
      (sum(when(col("l_extendedprice") <= col("qs").getItem(1), 1).otherwise(0))
        .cast("double") / count(lit(1))).as("f90"),
      (sum(when(col("l_extendedprice") <= col("qs").getItem(2), 1).otherwise(0))
        .cast("double") / count(lit(1))).as("f99")).collect()
    r5.foreach(r => println(s"PROBE quantile ${r.getString(0)} f50=${r.getDouble(1)} f90=${r.getDouble(2)} f99=${r.getDouble(3)}"))

    // shingle df distribution (lang blocks, 3-gram)
    val sh2 = docs.select(col("lang"), col("doc_id"),
      explode(TextExpressions.hashedShingles(col("text"), 3)).as("__g"))
    val df2 = sh2.groupBy("lang", "__g").agg(count(lit(1)).as("df"))
    val r6 = df2.agg(max("df").as("mx"),
      expr("percentile_approx(df, 0.999)").as("p999"),
      expr("percentile_approx(df, 0.99)").as("p99")).collect()(0)
    println(s"PROBE shingledf max=${r6.getLong(0)} p999=${r6.get(1)} p99=${r6.get(2)}")

    // ann result counts (should be k*|q| = 50)
    val q = embs.where(col("vec_id") < 10)
    println(s"PROBE ann lsh_rows=${Similarity.annTopK(embs, q, k = 5).count()}" +
      s" ivf_rows=${val (as, cs) = Ivf.build(embs, nlist = 16, iters = 2); Ivf.search(as, cs, q, k = 5, nprobe = 4).count()}")

    // fingerprint: dup pairs with equal text → equal fp?
    val fpd = docs.select(col("doc_id"), col("text"),
      TextExpressions.winnowFingerprint(col("text")).as("__fp"))
    val fa = fpd.select(col("text"), col("doc_id").as("id_a"), col("__fp").as("fa"))
    val fb = fpd.select(col("text"), col("doc_id").as("id_b"), col("__fp").as("fb"))
    val r7 = fa.join(fb, Seq("text")).where(col("id_a") < col("id_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("fa") === col("fb"), 1).otherwise(0)).as("n_eq")).collect()(0)
    val nEmpty = fpd.where(size(col("__fp")) < 1).count()
    println(s"PROBE fingerprint n_pairs=${r7.getLong(0)} n_eq=${r7.getLong(1)} n_empty=$nEmpty")

    spark.stop()
  }
}
