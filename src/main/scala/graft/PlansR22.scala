package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r22 optimization-round plan evidence: dumps `explain("formatted")`
  * into `plans/r22/<name>_<suffix>.txt`, where the suffix is the first
  * program arg (`before` run from the stashed r21 tree, `after` from
  * the r22 tree — the same binary dumps both, so the diffs are
  * code-only). Covers the declared keys this round touched plus the
  * INTERNAL kernels whose change a declared key's final frame cannot
  * show (the Scd2 apply frame, one un-checkpointed pagerank iteration
  * — VERDICT r21 "what's wrong" #2 — and the PQ training sample in
  * both gate states). Tooling only — never benched.
  */
object PlansR22 {

  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    def write(name: String, body: String): Unit = {
      Files.createDirectories(Paths.get("plans/r22"))
      Files.writeString(Paths.get(s"plans/r22/${name}_$suffix.txt"), body)
      println(s"PLANS_R22 wrote ${name}_$suffix.txt")
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"

    // ---- declared keys touched this round: final-frame plans
    val touched = Seq(
      "q_cdc_mart_incremental", "q_cdc_mart_dim_change", "q_cdc_fk_index",
      "q_cdc_scd2", "q_cdc_scd2_changes", "q_cdc_scd2_current",
      "q_search_eval", "q_search_eval_graded",
      "q_sim_ann_pq", "q_sim_ann_pq_search",
      "q_sim_ann_ivfpq", "q_sim_ann_ivfpq_search")
    touched.foreach { k =>
      write(k, fmt(SparkEntry.queries(k)(spark, d)))
    }

    // ---- internal kernel: the Scd2 apply frame (the plan the
    // snapshot write actually executes — the declared keys' final
    // frames are store reads and cannot show the join strategy)
    {
      val cust = Tables(spark, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val asOf = java.sql.Timestamp.valueOf("2000-07-01 00:00:00")
      val cur = graft.cdc.Scd2.init(cust, asOf)
      val staged = cust.where(col("c_custkey") % 4 === 1)
        .withColumn("c_mktsegment", lit("PROMO"))
      write("internal_scd2_apply", fmt(graft.cdc.Scd2.apply(
        cur, staged, Seq("c_custkey"), Seq("c_name", "c_mktsegment"),
        java.sql.Timestamp.valueOf("2000-08-01 00:00:00"))))
    }

    // ---- internal kernel: ONE pagerank iteration WITHOUT the
    // per-iteration localCheckpoint (VERDICT r21 #2: the committed
    // pagerank dumps truncate at the checkpoint, so the r21 broadcast
    // claim was bench-inferred; this reconstructs the loop body
    // verbatim minus the checkpoint so the join strategy is visible)
    {
      // the q_graph_pagerank fixture's own edge list
      val edges = Tables(spark, d, "lineitem").select(
        (col("l_orderkey") % 997).as("src"),
        (col("l_partkey") % 1009).as("dst"))
      val e = edges
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct().repartition(col("src")).localCheckpoint(true)
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct().localCheckpoint(true)
      val srcs = e.select("src").distinct().localCheckpoint(true)
      val deg = e.groupBy("src")
        .agg(count(lit(1)).cast("double").as("deg")).localCheckpoint(true)
      val n = nodes.count().toDouble
      val hinted: DataFrame => DataFrame =
        if (n <= graft.operators.Graph.DefaultBroadcastNodeLimit.toDouble)
          broadcast else identity
      val damping = 0.85
      val ranks = nodes.withColumn("pr", lit(1.0 / n))
      val dangling = ranks.join(srcs, ranks("node") === srcs("src"),
          "left_anti")
        .agg(coalesce(sum("pr"), lit(0.0)).as("dm"))
      val contribs = e.join(
          hinted(ranks.join(hinted(deg), ranks("node") === deg("src"))
            .select(col("node"), (col("pr") / col("deg")).as("share"))),
          e("src") === col("node"))
        .groupBy("dst").agg(sum("share").as("contrib"))
      val next = nodes
        .join(hinted(contribs), nodes("node") === contribs("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(nodes("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dm") / lit(n)))
            .as("pr"))
      write("internal_pagerank_iteration", fmt(next))
    }

    // ---- internal kernel: the PQ training sample in BOTH gate states
    // (the declared q_sim_ann_pq plan only shows the serve side; the
    // sample is collected inside train). `_twopass` is the at-scale
    // shape (narrow id sort + broadcast semi-join + hard cap);
    // `_onepass` is the under-gate toy shape (the r20 sort+limit).
    {
      val e = Tables(spark, d, "embeddings")
      val prepped = e.select(col("vec_id").as("__id"),
        graft.functions.VectorFunctions.l2Normalize(
          graft.functions.VectorFunctions.toDouble(col("embedding")))
          .as("__v"))
      val sampleIds = e.select(col("vec_id").as("__id"))
        .orderBy(xxhash64(col("__id"))).limit(1 << 16)
      write("internal_pq_sample_twopass", fmt(prepped
        .join(broadcast(sampleIds), Seq("__id"), "left_semi")
        .orderBy(xxhash64(col("__id"))).limit(1 << 16)
        .select(col("__v"))))
      write("internal_pq_sample_onepass", fmt(prepped
        .orderBy(xxhash64(col("__id"))).limit(1 << 16)
        .select(col("__v"))))
    }
    spark.stop()
  }
}
