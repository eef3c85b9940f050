package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPq, Similarity}

/** IVF-PQ composite index: recall vs brute force on the real fixture,
  * per-row optimality (re-ranked cos can never beat exact), persisted
  * serve == fresh build, and the residual decomposition's planted-
  * structure sanity (a vector's own cell scores it first). The
  * driver-visible gates are `q_sim_ann_ivfpq` / `_recall`. */
class IvfPqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("recall >= 0.8 vs brute force; re-ranked cos never beats exact") {
    val e = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val q = e.where(col("vec_id") < 10)
    // nlist=8/nprobe=6 mirrors the q_sim_ann_ivf_recall gate: the
    // fixture's near-random embeddings are the cell-probing worst
    // case (no cluster structure), so recall needs a wide probe —
    // real embedding corpora cluster and probe far fewer cells.
    val (codes, model) = IvfPq.build(e, nlist = 8, ivfIters = 2,
      m = 16, k = 64, pqIters = 8)
    val got = IvfPq.search(codes, model, e, q, k = 5, nprobe = 6,
      rerank = 100)
    val brute = Similarity.bruteForceTopKScored(e, q, k = 5)
      .select(col("query_id"), col("rank"), col("nbr_id").as("__bn"),
        col("cos").as("__bcos"))
    val joined = got.join(brute, Seq("query_id", "rank")).collect()
    assert(joined.length == 50, s"expected 10x5 rows: ${joined.length}")
    assert(joined.forall(r =>
      r.getAs[Double]("cos") <= r.getAs[Double]("__bcos") + 1e-12),
      "approximate rank-r cosine must never exceed the exact rank-r")
    val hits = got.select("query_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSet = brute.select(col("query_id"), col("__bn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bruteSet.count(hits).toDouble / bruteSet.size
    assert(recall >= 0.8, s"recall $recall < 0.8")
  }

  test("persisted index serves the same results as the fresh build") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where(col("vec_id") < 5)
    val (codes, model) = IvfPq.build(e, nlist = 8, ivfIters = 2,
      m = 8, k = 16, pqIters = 4)
    val fresh = IvfPq.search(codes, model, e, q, k = 3, nprobe = 3)
      .collect().map(_.toSeq).toSet
    val root = tmp("ivfpq") + "/idx"
    IvfPq.persist(spark, root, codes, model)
    val (c2, m2) = IvfPq.load(spark, root)
      .getOrElse(fail("persisted index must load"))
    val served = IvfPq.search(c2, m2, e, q, k = 3, nprobe = 3)
      .collect().map(_.toSeq).toSet
    assert(served == fresh && fresh.nonEmpty,
      s"served results must equal fresh build: $served vs $fresh")
    assert(IvfPq.load(spark, tmp("ivfpq-empty") + "/none").isEmpty)
  }

  test("residual codes stay cell-local: probing every cell recovers " +
      "brute force exactly after full re-rank") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where(col("vec_id") < 5)
    val (codes, model) = IvfPq.build(e, nlist = 4, ivfIters = 2,
      m = 8, k = 16, pqIters = 4)
    val n = e.count().toInt
    // nprobe = nlist and rerank = corpus: ADC only ORDERS candidates,
    // the exact re-rank sees everything -> must equal brute force
    val full = IvfPq.search(codes, model, e, q, k = 3, nprobe = 4,
        rerank = n)
      .select("query_id", "rank", "nbr_id")
      .collect().map(_.toSeq).toSet
    val brute = Similarity.bruteForceTopKScored(e, q, k = 3)
      .select(col("query_id"), col("rank").cast("long"), col("nbr_id"))
      .collect().map(_.toSeq).toSet
    assert(full == brute, "all-cells + corpus-wide re-rank must be exact")
  }

  test("Pq.train caps the sample at maxTrainRows even with duplicate " +
      "ids: two-pass (scale) shape == one-pass shape") {
    import spark.implicits._
    // 100 distinct ids, each with THREE copies of the same vector: the
    // hash sort ties only among identical rows, so the sampled CONTENT
    // is deterministic in both shapes. Without the re-applied
    // limit(maxTrainRows), the two-pass semi-join returns every copy
    // of each sampled id (51 rows for the 50-row cap) and trains a
    // different model.
    val rows = (0 until 100).flatMap { id =>
      val v = Seq.tabulate(8)(i => (id * 31 + i * 7 % 13).toDouble)
      Seq.fill(3)((id.toLong, v))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    def model(gateBytes: Long) = {
      spark.conf.set("spark.graft.pq.twoPassMinBytes", gateBytes.toString)
      try graft.operators.Pq.train(corpus, m = 4, k = 8, iters = 4,
        maxTrainRows = 50)
      finally spark.conf.unset("spark.graft.pq.twoPassMinBytes")
    }
    val twoPass = model(0L)          // force the at-scale two-pass shape
    val onePass = model(Long.MaxValue) // force the toy one-pass shape
    assert(twoPass.codebooks.map(_.toSeq).toSeq ==
      onePass.codebooks.map(_.toSeq).toSeq,
      "two-pass sample must train the identical model (hard cap held)")
  }
}
