package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage attribution for one declared query key — the tool behind
  * "where do the seconds go" questions (q_curate_corpus drift watch,
  * the q_join_fuzzy single-task diagnosis). Runs the key once untimed
  * (codegen, page cache), then once measured under a listener that
  * captures every completed stage's wall time, task count, input and
  * shuffle bytes, and spill; prints the stages sorted by wall time.
  *
  * A stage with `tasks=1` and most of the wall clock is the
  * serialization smell (see SCALE.md "Fuzzy join" — AQE's input-byte
  * coalescing vs data-dependent fan-out); a stage with spill > 0 wants
  * smaller `maxPartitionBytes` or more partitions; shuffle bytes out
  * of proportion to input is the missing-pushdown smell.
  *
  * Usage: `sbt "runMain graft.Prof <key>"` (default q_curate_corpus).
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_CPUS (default 32). Tooling only — not part of the
  * library surface, never benched.
  */
object Prof {

  private final case class Stage(id: Int, name: String, wallMs: Long,
      tasks: Int, inputMB: Double, shufReadMB: Double, shufWriteMB: Double,
      spillMB: Double)

  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("q_curate_corpus")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = SparkEntry.queries.getOrElse(key,
      sys.error(s"unknown key $key; declared: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))

    def consume(): Unit = {
      val df = q(spark, sfDir)
      df.agg(count(lit(1)),
        sum(xxhash64(struct(df.columns.map(col).toSeq: _*))
          .bitwiseAND(lit(0xffffffffL)))).head()
      ()
    }

    consume() // untimed warmup

    val stages = scala.collection.concurrent.TrieMap[Int, Stage]()
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        def mb(b: Long) = b / 1048576.0
        stages(si.stageId) = Stage(si.stageId,
          si.name.linesIterator.nextOption().getOrElse(si.name),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks, mb(m.inputMetrics.bytesRead),
          mb(m.shuffleReadMetrics.totalBytesRead),
          mb(m.shuffleWriteMetrics.bytesWritten),
          mb(m.memoryBytesSpilled + m.diskBytesSpilled))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    consume()
    val wall = (System.nanoTime() - t0) / 1e9
    // stage events arrive asynchronously on the listener bus
    // (private API; a short sleep drains it reliably for a tool)
    Thread.sleep(1500)

    println(f"PROF $key total ${wall}%.2f s, ${stages.size} stages (sorted by wall):")
    println(f"${"ms"}%8s ${"tasks"}%6s ${"inMB"}%9s ${"shRdMB"}%9s ${"shWrMB"}%9s ${"spillMB"}%8s  stage")
    stages.values.toSeq.sortBy(-_.wallMs).foreach { s =>
      println(f"${s.wallMs}%8d ${s.tasks}%6d ${s.inputMB}%9.1f " +
        f"${s.shufReadMB}%9.1f ${s.shufWriteMB}%9.1f ${s.spillMB}%8.1f  " +
        s"[${s.id}] ${s.name.take(90)}")
    }
    spark.stop()
  }
}
