package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** PassJoin-style edit-distance self-join: exact-recall contract vs a
  * brute-force all-pairs truth (the property the pigeonhole blocking
  * must never lose), plus the edges the fixture oracle can't see —
  * empty strings, strings shorter than the segment count, dist-0
  * duplicates, maxDist > 1. */
class FuzzyJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist.toLong)).toSet
  }

  private def run(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.selfPairs(rows.toDF("id", "name"), "name", "id", d)
      .as[(Long, Long, Long)].collect().toSet

  test("exact recall + precision vs brute force at maxDist 1 and 2") {
    val rows = Seq(
      (1L, "kitten"), (2L, "sitten"), (3L, "sitting"), (4L, "mitten"),
      (5L, "kitchen"), (6L, "bitten"), (7L, "fitting"), (8L, "written"),
      (9L, "kitten"), (10L, "totally-unrelated"))
    assert(run(rows, 1) == bruteForce(rows, 1))
    assert(run(rows, 2) == bruteForce(rows, 2))
  }

  test("empty and shorter-than-segments strings follow the contract") {
    val rows = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "abc"), (5L, ""))
    assert(run(rows, 1) == bruteForce(rows, 1))
    assert(run(rows, 2) == bruteForce(rows, 2))
    // the empty-empty pair is dist 0 and must be present
    assert(run(rows, 1).contains((1L, 5L, 0L)))
  }

  test("identical strings pair at dist 0; nulls never pair") {
    val rows = Seq((1L, "same"), (2L, "same"), (3L, null.asInstanceOf[String]))
    val got = run(rows.map { case (i, s) => (i, s) }, 0)
    assert(got == Set((1L, 2L, 0L)))
  }

  test("maxDist 0 degenerates to exact-duplicate pairing") {
    val rows = Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "xx"))
    assert(run(rows, 0) == Set((1L, 3L, 0L)))
  }
}
