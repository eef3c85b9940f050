package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.AppendStore

/** The log-structured segment store contract the streaming drains'
  * exactly-once story rests on. */
class AppendStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("segments accumulate; readBefore excludes the segment's own id") {
    val store = new AppendStore(spark, tmp("as") + "/t")
    assert(store.read().isEmpty)
    assert(store.readBefore(0L).isEmpty)
    store.write(Seq((1L, "a")).toDF("id", "v"), 0L)
    store.write(Seq((2L, "b")).toDF("id", "v"), 1L)
    assert(store.segments() == Seq(0L, 1L))
    assert(store.read().get.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // the transition for batch 1 must see ONLY batch 0's state
    assert(store.readBefore(1L).get.as[(Long, String)].collect().toSet ==
      Set((1L, "a")))
    assert(store.readBefore(0L).isEmpty)
  }

  test("re-writing a segment replaces it — no duplicate rows on replay") {
    val store = new AppendStore(spark, tmp("as-rp") + "/t")
    store.write(Seq((1L, "a")).toDF("id", "v"), 0L)
    store.write(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), 1L)
    // replayed batch 1 recomputes identical content → same state
    store.write(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), 1L)
    assert(store.read().get.count() == 3)
    // a diverging recomputation REPLACES (segment semantics, not append)
    store.write(Seq((9L, "z")).toDF("id", "v"), 1L)
    assert(store.read().get.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (9L, "z")))
  }

  test("compact merges a prefix; originals invisible by containment") {
    val root = tmp("as-cp") + "/t"
    val store = new AppendStore(spark, root)
    store.write(Seq((1L, "a")).toDF("id", "v"), 0L)
    store.write(Seq((2L, "b")).toDF("id", "v"), 1L)
    store.write(Seq((3L, "c")).toDF("id", "v"), 2L)
    store.write(Seq((4L, "d")).toDF("id", "v"), 5L)
    store.compact(upTo = 2L)
    // same data, fewer segments; later segments untouched
    assert(store.read().get.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(store.segments() == Seq(0L, 5L))
    // a future batch's readBefore still reconstructs its prior state
    assert(store.readBefore(5L).get.count() == 3)
    assert(store.readBefore(3L).get.count() == 3)
    // but a boundary splitting the compacted range is refused
    intercept[RuntimeException](store.readBefore(2L))
    // compaction is idempotent
    store.compact(upTo = 2L)
    assert(store.read().get.count() == 4)
  }

  test("crash between range-commit and cleanup never double-counts") {
    val root = tmp("as-crash") + "/t"
    val store = new AppendStore(spark, root)
    store.write(Seq((1L, "a")).toDF("id", "v"), 0L)
    store.write(Seq((2L, "b")).toDF("id", "v"), 1L)
    // simulate the crash: a committed range dir exists AND the original
    // segment dirs still exist (cleanup never ran)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write
      .parquet(new java.io.File(root,
        "seg_" + "0" * 20 + "_" + "0" * 19 + "1").toString)
    assert(store.read().get.count() == 2, "originals must be invisible")
    // future batches reconstruct cleanly past the range
    assert(store.readBefore(2L).get.count() == 2)
    // a batch INSIDE the compacted range can no longer replay — the
    // guard makes the precondition violation loud instead of silent
    intercept[RuntimeException](store.readBefore(1L))
  }

  test("schema evolution across segments merges; old rows get NULLs") {
    val store = new AppendStore(spark, tmp("as-ev") + "/t")
    store.write(Seq((1L, "a")).toDF("id", "v"), 0L)
    // the writer evolved: a new column appears in later segments
    store.write(Seq((2L, "b", 0.5)).toDF("id", "v", "score"), 1L)
    val rows = store.read().get.select("id", "v", "score")
      .as[(Long, String, Option[Double])].collect().toSet
    assert(rows == Set((1L, "a", None), (2L, "b", Some(0.5))), s"got $rows")
  }

  test("torn segments (no _SUCCESS) are invisible to readers") {
    val root = tmp("as-torn") + "/t"
    val store = new AppendStore(spark, root)
    store.write(Seq((1L, "a")).toDF("id", "v"), 0L)
    // simulate a crash mid-write: segment dir exists, never committed
    val torn = new java.io.File(root, "seg_" + "0" * 19 + "5")
    assert(torn.mkdirs())
    Files.writeString(torn.toPath.resolve("part-junk.parquet"), "half")
    assert(store.segments() == Seq(0L))
    assert(store.read().get.count() == 1)
    assert(store.readBefore(99L).get.count() == 1)
  }
}
