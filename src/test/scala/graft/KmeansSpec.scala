package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kmeans

/** Distributed k-means: planted-cluster recovery, repartition
  * invariance (assignment is a pure function of the data, not the
  * layout), the iters=0 init-assignment identity, and the
  * empty-cluster drop path. Engine-vs-oracle equality runs in the
  * `q_cluster_kmeans` driver row. */
class KmeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Three tight, well-separated planted clusters in 4-d: members at
    * base + i/1000 along each axis — any correct k-means with k=3
    * must recover the planted partition after an iteration or two,
    * regardless of which members seed the init. */
  private def planted: DataFrame =
    (0 until 30).map { i =>
      val g = i % 3
      val base = Array(0.0, 0.0, 0.0, 0.0)
      base(g) = 100.0 * (g + 1)
      (i.toLong, base.map(x => (x + i / 1000.0).toFloat).toSeq)
    }.toDF("vec_id", "embedding")

  private def groups(df: DataFrame): Map[Int, Set[Long]] =
    df.collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSet }

  test("recovers the planted partition with k=3") {
    val got = groups(Kmeans.fit(planted, k = 3, iters = 3))
    val want = (0 until 3)
      .map(g => (0 until 30).filter(_ % 3 == g).map(_.toLong).toSet).toSet
    assert(got.values.toSet === want)
  }

  test("assignment is repartition-invariant") {
    val a = Kmeans.fit(planted, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Kmeans.fit(planted.repartition(7), k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }

  test("iters=0 assigns against the raw init vectors") {
    val pts = Map(
      1L -> Seq(0.0, 0.0),
      2L -> Seq(10.0, 10.0),
      3L -> Seq(0.1, 0.1))
    val df = pts.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val rows = Kmeans.fit(df, k = 2, iters = 0).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    // whichever 2 of the 3 the md5 draw seeded sit at d2 = 0 of
    // themselves; the leftover point must land on its nearest seed
    val seeds = rows.filter(_._2._2 == 0.0).keys.toSet
    assert(seeds.size === 2)
    val rest = (pts.keySet -- seeds).head
    def d2(a: Long, b: Long): Double =
      pts(a).zip(pts(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    val nearest = seeds.minBy(s => (d2(rest, s), rows(s)._1))
    assert(rows(rest)._1 === rows(nearest)._1)
    assert(math.abs(rows(rest)._2 - d2(rest, nearest)) < 1e-9)
  }

  test("persist -> load -> assign reproduces fit exactly; frozen serve on new data") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_km_spec").toString
    val cents = Kmeans.fitCentroids(planted, k = 3, iters = 2)
    Kmeans.persist(spark, root, cents)
    val loaded = Kmeans.load(spark, root).get
    assert(loaded === cents)
    val direct = Kmeans.fit(planted, k = 3, iters = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val served = Kmeans.assign(planted, loaded).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(served === direct)
    // new (unseen) vectors score map-side against the frozen model:
    // a probe next to planted group g's base lands in g's cluster
    val probes = (0 until 3).map { g =>
      val base = Array(0.0f, 0.0f, 0.0f, 0.0f)
      base(g) = 100.0f * (g + 1)
      (1000L + g, base.toSeq)
    }.toDF("vec_id", "embedding")
    val got = Kmeans.assign(probes, loaded).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val planted2cluster = groups(Kmeans.assign(planted, loaded))
      .flatMap { case (c, ids) => ids.map(_ -> c) }
    (0 until 3).foreach { g =>
      assert(got(1000L + g) === planted2cluster(g.toLong), s"probe $g")
    }
    assert(Kmeans.load(spark, root + "_never").isEmpty)
  }

  test("k > distinct points: surplus clusters empty out and drop") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(10.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    val out = Kmeans.fit(df, k = 3, iters = 2).collect()
    assert(out.length === 3)
    val byCluster = out.groupBy(_.getInt(1))
    // the two coincident points share a cluster; the far one is alone
    assert(byCluster.size === 2)
    assert(byCluster.values.map(_.length).toSet === Set(1, 2))
  }
}
