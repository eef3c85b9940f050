package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KmvSketch

/** KMV overlap sketches: exact identities (identical sets → 1,
  * disjoint → 0), the mergeability property that makes the sketch a
  * persistable synopsis, and estimator accuracy on a planted overlap.
  * The full estimate-vs-exact restatement runs in the
  * `q_sketch_overlap` oracle gate. */
class KmvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def elems(group: String, xs: Seq[Int]) =
    xs.map(x => (group, s"elem-$x")).toDF("g", "e")

  test("identical sets estimate 1.0, disjoint sets 0.0 — exactly") {
    val df = elems("a", 0 until 500)
      .unionByName(elems("b", 0 until 500))
      .unionByName(elems("c", 1000 until 1500))
    val sk = KmvSketch.sketch(df, "g", col("e"), k = 64)
    val est = KmvSketch.pairJaccard(sk, Seq(("a", "b"), ("a", "c")), k = 64)
      .as[(String, String, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(est(("a", "b")) == 1.0)
    assert(est(("a", "c")) == 0.0)
  }

  test("mergeability: sketch(A ∪ B) == k-min of sketch(A) ∪ sketch(B)") {
    val a = elems("a", 0 until 400)
    val b = elems("b", 200 until 700)
    val direct = KmvSketch.sketch(
      a.unionByName(b).withColumn("g", lit("u")), "g", col("e"), k = 32)
      .select("h").as[Long].collect().sorted.toSeq
    val merged = KmvSketch.sketch(a.unionByName(b), "g", col("e"), k = 32)
      .select("h").distinct().as[Long].collect().sorted.take(32).toSeq
    assert(direct == merged,
      "k smallest of the sketch union must equal the union's sketch")
  }

  test("planted 1/3 overlap estimated within the ~1/sqrt(k) bound") {
    // |A|=|B|=1000, |A∩B|=500 => J = 500/1500 ≈ 0.333
    val df = elems("a", 0 until 1000).unionByName(elems("b", 500 until 1500))
    val sk = KmvSketch.sketch(df, "g", col("e"), k = 256)
    val est = KmvSketch.pairJaccard(sk, Seq(("a", "b")), k = 256)
      .select("jaccard_kmv").as[Double].head()
    assert(math.abs(est - 1.0 / 3) < 0.1, s"estimate $est for truth 0.333")
    // and the exact leg is exact
    val ex = KmvSketch.pairJaccardExact(df, "g", col("e"), Seq(("a", "b")))
      .select("jaccard_exact").as[Double].head()
    assert(ex == 500.0 / 1500.0)
  }

  test("sketch size is bounded by k and by the set size") {
    val df = elems("tiny", 0 until 5).unionByName(elems("big", 0 until 900))
    val sk = KmvSketch.sketch(df, "g", col("e"), k = 64)
    val sizes = sk.groupBy("group").count().as[(String, Long)].collect().toMap
    assert(sizes("tiny") == 5L && sizes("big") == 64L)
  }
}
