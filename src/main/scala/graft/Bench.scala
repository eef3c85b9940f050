package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — times every RAW operator key in [[SparkEntry.queries]]
  * (gate queries are Verify-only and never timed here), median-of-N per
  * key, plus one end-to-end `pipeline_total` run of the full
  * staging→snapshot→marts DAG ([[graft.pipeline.Runner]]) — the closest
  * analog to the reference's wall-clock pipeline figure.
  *
  * A failing query is reported in `errors` with its message, NOT as a
  * fake elapsed-until-throw timing; `value` sums only successful
  * medians, so a broken query can never masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Testdata tables are single ~MB parquet files; the 128m default
      // would scan them on one core. Split small files so per-row
      // compute (sketches, shingles) parallelizes. Cluster deployments
      // with real multi-file inputs keep the default.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warmup (executor threads, codegen pipeline, FS client) so
    // the first measured query doesn't absorb one-time init cost.
    spark.range(1000).selectExpr("sum(id)").collect()

    def fmt(d: Double): String = f"$d%.4f"
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    final case class R(name: String, times: Seq[Double], err: Option[String])
    val results: Seq[R] = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val times = scala.collection.mutable.ArrayBuffer.empty[Double]
        var err: Option[String] = None
        var i = 0
        while (i < runs && err.isEmpty) {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            err = Some(Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("\\s+", " ").take(200))
          }
          i += 1
        }
        R(name, times.toSeq.sorted, err)
    }

    def median(ts: Seq[Double]): Double = ts(ts.size / 2) // ts pre-sorted

    // End-to-end pipeline: raw upsert → staging → SCD2 → marts into a
    // throwaway TableStore root. One timed run (the DAG is dominated by
    // writes; repeat runs would measure the no-op incremental path).
    val pipelineTotal: Either[String, Double] =
      try {
        val work = java.nio.file.Files
          .createTempDirectory("graft-bench-pipeline").toString
        val t0 = System.nanoTime()
        graft.pipeline.Runner.runAll(spark, sfDir, work,
          java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("\\s+", " ").take(200))
      }

    val ok = results.filter(_.err.isEmpty)
    val qs = ok.map(r => "\"" + r.name + "\":" + fmt(median(r.times)))
      .mkString("{", ",", "}")
    val errs = results.flatMap(r => r.err.map(e =>
      "\"" + r.name + "\":\"" + esc(e) + "\"")).mkString("{", ",", "}")
    val details = results.map { r =>
      val med = if (r.times.nonEmpty) fmt(median(r.times)) else "null"
      val runsJson = r.times.map(fmt).mkString("[", ",", "]")
      val errJson = r.err.fold("null")(e => "\"" + esc(e) + "\"")
      s""""${r.name}":{"t_median":$med,"t_runs":$runsJson,"err":$errJson}"""
    }.mkString("{", ",", "}")
    val total = ok.map(r => median(r.times)).sum
    val pipeJson = pipelineTotal.fold(
      e => s""""pipeline_error":"${esc(e)}"""",
      t => s""""pipeline_total":${fmt(t)}""")
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs_per_query":$runs,"queries":$qs,"errors":$errs,$pipeJson,"details":$details,"sf":"$sfDir"}"""
    // Persist to a file as well: sbt log noise buries/truncates stdout, and
    // the driver needs a parseable artifact for round-over-round regression.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
    java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    spark.stop()
    // Final clean line AFTER spark.stop() so no executor shutdown logging
    // can interleave behind it.
    println(json)
  }
}
