package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Drift
import graft.streaming.DriftStream

/** Streaming PSI monitor vs batch [[Drift.psi]]: drained cumulative
  * bucket counts must be row-identical to the batch histogram, the
  * derived per-bucket psi_contrib bit-equal to the batch frame, and
  * counts monotone across micro-batches. */
class DriftStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val buckets = 10

  // Baseline: 500 values over 0..99; new feed: shifted by +15 with a
  // planted NULL every 37th row (the monitor must drop them exactly
  // like the batch histogram's isNotNull guard).
  private def oldSnap: DataFrame =
    (1 to 500).map(i => (i % 100).toDouble).toDF("v")
  private def newSnap: DataFrame =
    (1 to 600).map { i =>
      if (i % 37 == 0) None else Some((i % 100 + 15).toDouble)
    }.toDF("v")

  /** Drain `dir` through the Complete-mode counts query one file per
    * trigger; returns every emitted cumulative snapshot in order. */
  private def drainSnapshots(dir: String, breaks: Seq[Double])
      : Seq[Map[Int, Long]] = {
    val snaps = scala.collection.mutable.ArrayBuffer.empty[Map[Int, Long]]
    val src = spark.readStream
      .schema(StructType(Seq(StructField("v", DoubleType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val q = DriftStream.bucketCounts(src, "v", breaks)
      .writeStream.outputMode("complete")
      .foreachBatch { (b: DataFrame, _: Long) =>
        snaps += b.collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("dsck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    snaps.toSeq
  }

  test("drained counts + derived PSI are row-identical to batch Drift.psi") {
    val breaks = DriftStream.breaksOf(oldSnap, "v", buckets)
    val batch = Drift.psi(oldSnap, newSnap, "v", buckets)
      .orderBy("bucket").collect().toSeq

    val dir = Files.createTempDirectory("dsrc").toString
    (0 until 3).foreach { c =>
      newSnap.where(abs(hash(col("v"))) % 3 === c || col("v").isNull && lit(c) === 0)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val snaps = drainSnapshots(dir, breaks)
    assert(snaps.size >= 3, s"expected >=3 micro-batches, got ${snaps.size}")

    // monotone growth: cumulative counts never shrink batch-to-batch
    snaps.sliding(2).foreach {
      case Seq(a, b) =>
        a.foreach { case (bk, n) =>
          assert(b.getOrElse(bk, 0L) >= n,
            s"bucket $bk shrank: $n -> ${b.getOrElse(bk, 0L)}")
        }
      case _ => ()
    }

    // final snapshot == batch n_new, bucket by bucket (absent = 0)
    val last = snaps.last
    batch.foreach { r =>
      val bk = r.getLong(0).toInt
      assert(last.getOrElse(bk, 0L) === r.getLong(2),
        s"bucket $bk: stream ${last.getOrElse(bk, 0L)} != batch ${r.getLong(2)}")
    }
    assert(last.values.sum === batch.map(_.getLong(2)).sum)

    // derived per-bucket PSI from the frozen baseline hist × drained
    // counts is bit-equal to the batch frame
    val baseHist = Drift.histogram(oldSnap, "v", breaks, "n_old")
    val cur = last.toSeq.toDF("bucket", "n_new")
    val derived = Drift.psiFromHistograms(baseHist, cur, buckets)
      .orderBy("bucket").collect().toSeq
    assert(derived.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      === batch.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))))
  }

  test("single-batch drain equals batch histogram (whole feed one file)") {
    val breaks = DriftStream.breaksOf(oldSnap, "v", buckets)
    val dir = Files.createTempDirectory("dsrc1").toString
    newSnap.coalesce(1).write.mode("append").parquet(dir)
    val snaps = drainSnapshots(dir, breaks)
    val expect = Drift.histogram(newSnap, "v", breaks, "n")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(snaps.last === expect)
  }
}
