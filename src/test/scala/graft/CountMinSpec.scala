package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CountMin

/** Count-Min sketch: exact mergeability (halves == whole, for the
  * sketch table AND the estimates derived from it), the
  * never-undercount guarantee, and the degenerate tiny-width path.
  * Engine-vs-oracle value equality runs in the `q_text_cms` driver
  * row. */
class CountMinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  // 60 distinct tokens, token i repeated i times (known truth), plus
  // NULLs that must drop
  private def toks: DataFrame =
    ((1 to 60).flatMap(i => Seq.fill(i)(Some(f"tok$i%02d"))) ++
      Seq(None, None)).toDF("tok")

  private def truth: Map[String, Long] =
    (1 to 60).map(i => f"tok$i%02d" -> i.toLong).toMap

  private def skSet(df: DataFrame): Set[(Int, Long, Long)] =
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

  test("merge of halves equals the one-shot sketch, cell for cell") {
    val whole = CountMin.sketch(toks, "tok")
    val h1 = CountMin.sketch(toks.where(abs(hash(col("tok"))) % 2 === 0), "tok")
    val h2 = CountMin.sketch(toks.where(abs(hash(col("tok"))) % 2 === 1), "tok")
    assert(skSet(CountMin.merge(h1, h2)) === skSet(whole))
  }

  test("estimates never undercount; merged estimates == whole's") {
    val probes = truth.keys.toSeq.toDF("tok")
    def ests(sk: DataFrame): Map[String, Long] =
      CountMin.estimate(sk, probes, "tok")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = ests(CountMin.sketch(toks, "tok"))
    truth.foreach { case (t, n) =>
      assert(whole(t) >= n, s"$t undercounted: ${whole(t)} < $n")
    }
    val h1 = CountMin.sketch(toks.where(abs(hash(col("tok"))) % 2 === 0), "tok")
    val h2 = CountMin.sketch(toks.where(abs(hash(col("tok"))) % 2 === 1), "tok")
    assert(ests(CountMin.merge(h1, h2)) === whole)
  }

  test("degenerate width=2 depth=1: estimates are the two cell totals") {
    val sk = CountMin.sketch(toks, "tok", depth = 1, width = 2)
    val cells = sk.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(cells.values.sum === truth.values.sum) // every token landed
    val est = CountMin.estimate(sk, Seq("tok60").toDF("tok"), "tok",
      depth = 1, width = 2).head().getLong(1)
    assert(cells.values.toSeq.contains(est)) // est IS its cell's total
    assert(est >= 60L)
  }

  test("unseen token estimates are collision mass, never negative") {
    val sk = CountMin.sketch(toks, "tok")
    val est = CountMin.estimate(sk, Seq("never-seen-zzq").toDF("tok"), "tok")
      .head().getLong(1)
    assert(est >= 0L && est <= truth.values.sum)
  }
}
