package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Sliding-window exact-substring dedup: offset-independence (the
  * case the stride grid misses), intra-doc repeats, interval merging,
  * short-doc passthrough, full-removal collapse — each pinned against
  * an independent in-memory reference implementation, plus a seeded
  * randomized parity sweep. The end-to-end pipeline is oracle-gated
  * by `q_dedup_substrings`. */
class ExactSubstrSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** Independent reference: window grid → keeper election → interval
    * merge → reassembly, all in plain Scala collections. */
  private def truth(docs: Seq[(Long, String)], w: Int)
      : Map[Long, (String, Long, Long)] = {
    val occ = for {
      (id, t) <- docs
      ws = t.trim.split("\\s+").toSeq
      if ws.size >= w
      s <- 0 to ws.size - w
    } yield (ws.slice(s, s + w).mkString(" "), id, s)
    val marked = occ.groupBy(_._1).values.flatMap { os =>
      if (os.size > 1) os.sortBy(o => (o._2, o._3)).tail else Nil
    }
    val perDoc = marked.groupBy(_._2).map { case (id, ms) =>
      val ivs = ms.map(m => (m._3.toLong, m._3.toLong + w)).toSeq.sorted
      val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
        case ((ps, pe) :: rest, (s, e)) if s <= pe =>
          (ps, math.max(pe, e)) :: rest
        case (acc, iv) => iv :: acc
      }.reverse
      id -> merged
    }
    docs.map { case (id, t) =>
      val ws = t.trim.split("\\s+").toSeq
      val ivs = perDoc.getOrElse(id, Nil)
      val kept = ws.zipWithIndex.collect {
        case (wd, i) if !ivs.exists(iv => i >= iv._1 && i < iv._2) => wd
      }
      id -> ((kept.mkString(" "), ws.size.toLong,
        ivs.map(iv => iv._2 - iv._1).sum))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], w: Int)
      : Map[Long, (String, Long, Long)] =
    Dedup.exactSubstrDedup(docs.toDF("doc_id", "text"), windowWords = w)
      .select("doc_id", "text_dedup", "n_words", "n_removed")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("offset-shifted duplicate run is cut where the stride grid misses") {
    // the 4-word run sits at offset 0 in doc 0 and offset 3 in doc 1 —
    // different stride-4 cells, same sliding windows
    val docs = Seq(
      (0L, "dup one two three tail0 tail1 tail2 tail3"),
      (1L, "pre0 pre1 pre2 dup one two three post0 post1"))
    val got = run(docs, 4)
    assert(got == truth(docs, 4), s"got $got")
    assert(got(0L)._1.startsWith("dup one two three"),
      "earliest occurrence is the keeper")
    assert(got(1L)._1 == "pre0 pre1 pre2 post0 post1",
      s"shifted copy must be cut: ${got(1L)}")
  }

  test("intra-doc repeat: the second copy of a run is cut") {
    val docs = Seq((5L, "a1 a2 a3 a4 mid a1 a2 a3 a4 end"))
    val got = run(docs, 4)
    assert(got == truth(docs, 4), s"got $got")
    assert(got(5L) == (("a1 a2 a3 a4 mid end", 10L, 4L)), s"${got(5L)}")
  }

  test("overlapping marks merge into one interval (no double count)") {
    // doc 1 repeats doc 0's 6-word run: windows at offsets 0,1,2 all
    // mark, merged interval = [0, 6), removed = 6 not 12
    val docs = Seq(
      (0L, "r1 r2 r3 r4 r5 r6 tailA tailB tailC"),
      (1L, "r1 r2 r3 r4 r5 r6 otherX otherY otherZ"))
    val got = run(docs, 4)
    assert(got == truth(docs, 4), s"got $got")
    assert(got(1L)._3 == 6L, s"merged removal must be 6: ${got(1L)}")
  }

  test("short docs pass through; full duplicates collapse to empty") {
    val docs = Seq(
      (0L, "w1 w2 w3 w4 w5"),
      (1L, "w1 w2 w3 w4 w5"), // exact clone of doc 0, 5 >= w
      (2L, "tiny doc"))       // shorter than the window
    val got = run(docs, 4)
    assert(got == truth(docs, 4), s"got $got")
    assert(got(0L) == (("w1 w2 w3 w4 w5", 5L, 0L)))
    assert(got(1L) == (("", 5L, 5L)), s"clone collapses: ${got(1L)}")
    assert(got(2L) == (("tiny doc", 2L, 0L)))
  }

  test("randomized parity vs the reference implementation") {
    val rnd = new scala.util.Random(14)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (0L until 40L).map { id =>
      val n = 3 + rnd.nextInt(20)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (w <- Seq(3, 5)) {
      val got = run(docs, w)
      val want = truth(docs, w)
      assert(got == want,
        s"w=$w diff: ${got.toSet.diff(want.toSet).take(3)} vs ${
          want.toSet.diff(got.toSet).take(3)}")
    }
  }
}
