package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 optimization-round plan evidence: dumps `explain("formatted")`
  * for the INTERNAL kernels the round changed (the declared CDC keys'
  * final frames are store reads + orderBy, which cannot show a
  * commit-path change) plus the after-state of every touched declared
  * key, into `plans/r21/<name>_after.txt`. The `_before.txt` twins are
  * extracted from the committed r20 `PLANS.md` (declared keys) or
  * reconstructed inline here (kernels whose old shape no longer exists
  * in the code — the 6-leg bucketStats). Tooling only — never benched.
  */
object PlansR21 {

  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def write(name: String, body: String): Unit = {
    Files.createDirectories(Paths.get("plans/r21"))
    Files.writeString(Paths.get(s"plans/r21/$name"), body)
    println(s"PLANS_R21 wrote $name")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"

    // ---- declared keys touched this round: after-state final plans
    val touched = Seq(
      "q_cdc_upsert_bucketed", "q_cdc_upsert_bucketed_dedup",
      "q_cdc_upsert_compacted", "q_cdc_upsert_evolve", "q_cdc_upsert_mor",
      "q_cdc_delete", "q_cdc_delete_mor", "q_cdc_apply_ops",
      "q_cdc_changes", "q_cdc_mart_incremental", "q_cdc_mart_dim_change",
      "q_cdc_fk_index", "q_profile_incremental", "q_cdc_scd2_changes",
      "q_cdc_consistent_read",
      // wave E: graph broadcast gates + the two-pass PQ sample (the
      // eval-leg fusion was attempted and reverted — see
      // OPTIMIZATION_r21.md)
      "q_graph_triangles", "q_graph_pagerank", "q_curate_url_rank",
      "q_sim_ann_pq", "q_sim_ann_ivfpq")
    touched.foreach { k =>
      write(s"${k}_after.txt", fmt(SparkEntry.queries(k)(spark, d)))
    }

    // ---- internal kernel: the COW merge write plan (what one commit
    // actually executes — the cached batch + pinned repartition)
    {
      val root = Files.createTempDirectory("plans-r21-cow").toString
      val store = new graft.cdc.CowStore(spark, root, Seq("o_orderkey"),
        nBuckets = 16)
      val dest = Tables(spark, d, "orders")
        .where(col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      store.writeFull(dest)
      // reproduce upsertAt's merged frame shape: cached aligned batch,
      // pruned prev read, anti-join + union (the plan the write job
      // runs; captured via the same kernels upsertAt composes)
      val batch = dest.limit(3000)
        .withColumn("o_orderstatus", lit("U")).persist()
      batch.count() // materialize like the probe does
      val prev = store.readForKeys(batch.select("o_orderkey")).get
      val merged = graft.cdc.Upsert.merge(prev, batch, Seq("o_orderkey"))
      write("internal_cow_merge_after.txt", fmt(merged))
      batch.unpersist()
    }

    // ---- internal kernel: bucketStats AFTER (single-pass) vs BEFORE
    // (the r20 6-leg union, reconstructed inline verbatim)
    {
      val src = Tables(spark, d, "orders")
        .withColumn("bkt", pmod(hash(col("o_orderkey")), lit(16)))
      val cols = Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderdate", "o_orderpriority", "o_orderstatus")
      write("internal_bucketstats_after.txt",
        fmt(graft.quality.IncrementalProfile.bucketStats(src, cols, 12)))

      def isNum(df: DataFrame, c: String): Boolean =
        df.schema(c).dataType match {
          case _: org.apache.spark.sql.types.NumericType |
               org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType |
               org.apache.spark.sql.types.DateType => true
          case _ => false
        }
      def asNum(df: DataFrame, c: String)(v: org.apache.spark.sql.Column) =
        df.schema(c).dataType match {
          case org.apache.spark.sql.types.TimestampNTZType |
               org.apache.spark.sql.types.DateType =>
            v.cast("timestamp").cast("double")
          case _ => v.cast("double")
        }
      val legs = cols.map { c =>
        if (isNum(src, c)) {
          val agged = src.select(col("bkt"), col(c)).groupBy(col("bkt"))
            .agg(count(lit(1)).as("__n"), count(col(c)).as("__nn"),
              hll_sketch_agg(col(c).cast("string"), lit(12)).as("__hll"),
              min(col(c)).as("__mn"), max(col(c)).as("__mx"),
              graft.functions.GkSketch.sketchAgg(asNum(src, c)(col(c)))
                .as("__qs"))
          agged.select(col("bkt"), lit(c).as("col_name"),
            col("__n").as("n_rows"), (col("__n") - col("__nn")).as("n_nulls"),
            asNum(src, c)(col("__mn")).as("min_num"),
            asNum(src, c)(col("__mx")).as("max_num"),
            lit(null).cast("string").as("min_str"),
            lit(null).cast("string").as("max_str"),
            col("__hll").as("hll"), col("__qs").as("qsk"))
        } else {
          val agged = src.select(col("bkt"), col(c)).groupBy(col("bkt"))
            .agg(count(lit(1)).as("__n"), count(col(c)).as("__nn"),
              hll_sketch_agg(col(c).cast("string"), lit(12)).as("__hll"),
              min(col(c)).as("__mn"), max(col(c)).as("__mx"))
          agged.select(col("bkt"), lit(c).as("col_name"),
            col("__n").as("n_rows"), (col("__n") - col("__nn")).as("n_nulls"),
            lit(null).cast("double").as("min_num"),
            lit(null).cast("double").as("max_num"),
            col("__mn").cast("string").as("min_str"),
            col("__mx").cast("string").as("max_str"),
            col("__hll").as("hll"),
            lit(null).cast("binary").as("qsk"))
        }
      }
      write("internal_bucketstats_before.txt", fmt(legs.reduce(_ unionByName _)))
    }
    spark.stop()
  }
}
