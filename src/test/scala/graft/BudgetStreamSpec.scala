package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling
import graft.streaming.BudgetStream
import graft.streaming.BudgetStream.{Admitted, BudgetEvent}

/** Streaming token-budget admission vs the batch budgetDraw: one-batch
  * parity, multi-batch monotonicity + bounded overshoot, checkpoint
  * recovery, and the drop rules. */
class BudgetStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // 60 docs over 3 domains; token counts 1..15 with a few zero-weight
  // rows; ids shaped so md5 draws interleave the domains.
  private def docs: DataFrame = {
    val rows = (1 to 60).map { i =>
      val dom = Seq("web", "code", "books")(i % 3)
      val w = if (i % 17 == 0) 0L else (i % 15 + 1).toLong
      (f"doc$i%03d", dom, w)
    }
    rows.toDF("doc_id", "dom", "w")
  }

  private val quotas = Map("web" -> 60L, "code" -> 25L, "books" -> 1L)

  /** Drain everything currently in `dir` through the admission stream,
    * resuming from `ckpt`; returns ALL rows this drain emitted. */
  private def drain(dir: String, ckpt: String): Seq[Admitted] = {
    // foreachBatch invocations are sequential on the driver for a
    // single query, so a plain buffer is safe here
    val buf = scala.collection.mutable.ArrayBuffer.empty[Admitted]
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[BudgetEvent]].schema)
      .parquet(dir)
      .as[BudgetEvent]
    val q = BudgetStream.streaming(src, quotas)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Admitted], _: Long) =>
        buf ++= b.collect(); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    buf.toSeq
  }

  private def write(df: DataFrame, dir: String): Unit =
    BudgetStream.events(df, "doc_id", "dom", col("w"), seed = "bs")
      .write.mode("append").parquet(dir)

  test("single-batch drain is row-identical to batch budgetDraw") {
    val dir = tmp("bs-one"); val ckpt = tmp("bs-one-ckpt")
    write(docs, dir)
    val streamed = drain(dir, ckpt)
      .map(a => (a.doc_id, a.domain, a.n_tokens)).toSet
    val batch = Sampling.budgetDraw(docs, "doc_id", "dom", col("w"),
        quotas.toSeq, seed = "bs")
      .as[(String, String, Long)].collect().toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("multi-batch: monotone admissions, overshoot ≤ one doc, recovery") {
    val dir = tmp("bs-multi"); val ckpt = tmp("bs-multi-ckpt")
    val (b1, b2, b3) = (docs.where(col("doc_id") <= "doc020"),
      docs.where(col("doc_id") > "doc020" && col("doc_id") <= "doc040"),
      docs.where(col("doc_id") > "doc040"))

    write(b1, dir)
    val a1 = drain(dir, ckpt)
    write(b2, dir)
    val a2 = drain(dir, ckpt) // checkpoint recovery: state resumes
    write(b3, dir)
    val a3 = drain(dir, ckpt)

    // Append-mode-final: later drains never retract earlier admissions
    val all = a1 ++ a2 ++ a3
    assert(all.map(_.doc_id).distinct.size == all.size)

    // exclusive-prefix first-fit: consumed minus the LAST admitted
    // doc's tokens stays under quota (overshoot bounded by one doc)
    all.groupBy(_.domain).foreach { case (d, as) =>
      val tot = as.map(_.n_tokens).sum
      assert(tot - as.last.n_tokens < quotas(d),
        s"domain $d overshot by more than one doc: $tot vs ${quotas(d)}")
    }

    // books quota=1 → exactly the single first-fit doc per its batch
    assert(all.count(_.domain == "books") >= 1)

    // determinism: replaying the same three batches from a fresh
    // checkpoint admits the same set in the same per-batch split
    val ckpt2 = tmp("bs-multi-ckpt2"); val dir2 = tmp("bs-multi2")
    write(b1, dir2); val r1 = drain(dir2, ckpt2)
    write(b2, dir2); val r2 = drain(dir2, ckpt2)
    write(b3, dir2); val r3 = drain(dir2, ckpt2)
    assert(r1.toSet == a1.toSet && r2.toSet == a2.toSet
      && r3.toSet == a3.toSet)
  }

  test("drop rules: unlisted domain and NULL weight; zero-weight admitted") {
    val dir = tmp("bs-drop"); val ckpt = tmp("bs-drop-ckpt")
    val d = Seq(
      ("k1", "web", Option(5L)),
      ("k2", "unlisted", Option(5L)), // not in quotas → dropped
      ("k3", "web", Option.empty[Long]), // NULL weight → dropped
      ("k4", "books", Option(0L)) // zero-weight, quota open → admitted
    ).toDF("doc_id", "dom", "w")
    write(d, dir)
    val got = drain(dir, ckpt).map(_.doc_id).toSet
    assert(got.contains("k1") && got.contains("k4"))
    assert(!got.contains("k2") && !got.contains("k3"))
  }
}
