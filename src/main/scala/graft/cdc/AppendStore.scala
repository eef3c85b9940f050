package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Log-structured append table: one immutable parquet SEGMENT directory
  * per micro-batch, keyed by the batch id — the durable-state primitive
  * for the streaming drains ([[graft.streaming.DedupMicroBatch]],
  * [[graft.streaming.CurateMicroBatch]]).
  *
  * {{{
  *   <root>/seg_00000000000000000000/part-*.parquet            // batch 0
  *   <root>/seg_00000000000000000001/part-*.parquet            // batch 1
  *   <root>/seg_00000000000000000000_00000000000000000041/...  // compacted 0..41
  * }}}
  *
  * Why not [[TableStore]] snapshots: a snapshot `write(prev ∪ delta)`
  * REWRITES the whole accumulated state every batch — O(corpus) IO per
  * batch even when the drain's compute is O(batch). Here a batch lands
  * only its own delta: per-batch IO is proportional to the batch, and
  * the store's total footprint is the data itself, written once.
  *
  * Exactly-once under replay comes from two properties:
  *   - `write(df, batchId)` is an idempotent overwrite of THAT
  *     segment — a re-delivered batch replaces seg_N with recomputed
  *     content instead of appending duplicates;
  *   - `readBefore(batchId)` reconstructs exactly the state the
  *     original run of batch N saw (the union of committed segments
  *     with id < N), so the recomputation is a pure function of
  *     (prior state, batch) and the replacement content is identical.
  *     Reading `read()` inside the transition for batch N would be
  *     wrong: on replay it would include seg_N itself.
  *
  * A segment is COMMITTED iff its `_SUCCESS` marker exists (Spark
  * writes it last); readers skip torn segments, and a crash
  * mid-segment-write is healed by the replay's overwrite.
  *
  * Compaction — [[compact]] merges the committed id range `[0, upTo]`
  * into one RANGE segment (`seg_<lo>_<hi>`), bounding file/dir counts
  * on a long-running drain (the LSM maintenance step). Crash-safe
  * without a manifest via CONTAINMENT VISIBILITY: readers ignore any
  * committed segment whose id range is covered by another committed
  * segment's range, so the instant the range dir commits, the
  * originals become invisible — a crash before their (best-effort)
  * deletion never double-counts. `readBefore` determinism is preserved
  * because compaction only merges ids strictly below any batch the
  * source could still (re)deliver: callers pass `upTo` < the
  * checkpoint frontier, and the range segment never straddles a future
  * batch's `readBefore` boundary.
  *
  * `sortBy` — optional CLUSTERING of every landed segment (applied by
  * both [[write]] and [[compact]], so the layout survives merges):
  * rows are sorted within each task's output file, giving parquet
  * row-group min/max stats tight ranges on the sort key. A store whose
  * reads probe a key (the dedup drains' signature index) declares its
  * probe key here so pushed-down predicates SKIP row groups the probe
  * can't touch, instead of scanning the whole accumulated index every
  * batch. `sortWithinPartitions`, not a global sort: no extra shuffle,
  * no range-sampling re-execution of the batch lineage — clustering is
  * per-file, which is exactly the granularity row-group stats prune at. */
object AppendStore {
  /** Compaction cadence for a micro-batch drain: every `every`-th
    * batch, merge each store's segments strictly below the replay
    * frontier. When `foreachBatch` runs batch N, batches < N are
    * committed in the streaming checkpoint and can never be
    * re-delivered — so `upTo = N - 1` is safe, and a replay of batch N
    * still finds its `readBefore(N)` boundary un-split. Keeps a
    * year-long drain's segment count bounded by `every` (plus the one
    * range segment) instead of one directory per batch forever;
    * idempotent, so a replayed batch re-running the policy no-ops. */
  def maybeCompact(every: Int, batchId: Long, stores: AppendStore*): Unit =
    if (every > 0 && batchId > 0 && batchId % every == 0)
      stores.foreach(_.compact(batchId - 1))
}

final class AppendStore(spark: SparkSession, root: String,
    sortBy: Seq[String] = Nil) {

  private val rootPath = new Path(root)
  private def fs =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def segName(lo: Long, hi: Long): String =
    if (lo == hi) f"seg_$lo%020d" else f"seg_$lo%020d_$hi%020d"

  /** Committed segment ranges after containment filtering, ascending by
    * lo. Single-batch segments are (id, id) ranges. */
  private def ranges(): Seq[(Long, Long, Path)] = {
    if (!fs.exists(rootPath)) return Nil
    val committed = fs.listStatus(rootPath).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("seg_") &&
        fs.exists(new Path(p, "_SUCCESS")))
      .flatMap { p =>
        p.getName.stripPrefix("seg_").split("_") match {
          case Array(a)    => Some((a.toLong, a.toLong, p))
          case Array(a, b) => Some((a.toLong, b.toLong, p))
          case _           => None
        }
      }
    // containment visibility: a segment covered by a (strictly wider)
    // committed range was compacted into it — invisible, pending delete
    committed.filterNot { case (lo, hi, p) =>
      committed.exists { case (l2, h2, p2) =>
        p2 != p && l2 <= lo && hi <= h2 && (h2 - l2) > (hi - lo)
      }
    }.sortBy(_._1)
  }

  /** Committed segment ids (ascending); range segments contribute their
    * bounds' full span conceptually but are listed by `lo`. */
  def segments(): Seq[Long] = ranges().map(_._1)

  private def clustered(df: DataFrame): DataFrame =
    if (sortBy.isEmpty) df
    else df.sortWithinPartitions(sortBy.map(org.apache.spark.sql.functions.col): _*)

  /** Land `df` as segment `batchId`, overwriting any previous content
    * of that segment (idempotent batch replay). */
  def write(df: DataFrame, batchId: Long): Unit =
    clustered(df).write.mode("overwrite")
      .parquet(new Path(rootPath, segName(batchId, batchId)).toString)

  // mergeSchema: a store outlives its writer's schema — an ingest that
  // adds a column after a restart must not have old/new segments win
  // arbitrarily by footer order. Added columns surface as NULLs on old
  // rows (unionByName semantics); the footer-merge cost is bounded by
  // the segment count, which compaction bounds in turn.
  private def union(rs: Seq[(Long, Long, Path)]): Option[DataFrame] =
    if (rs.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true")
      .parquet(rs.map(_._3.toString): _*))

  /** All committed state. */
  def read(): Option[DataFrame] = union(ranges())

  /** State as of BEFORE `batchId` — what the transition function for
    * batch `batchId` must read so its output is replay-invariant.
    * Refuses a boundary that splits a compacted range (compaction
    * below the checkpoint frontier makes this unreachable in the
    * drains; the guard turns a misuse into an error, not wrong data). */
  def readBefore(batchId: Long): Option[DataFrame] = {
    val rs = ranges()
    rs.find(r => r._1 < batchId && batchId <= r._2).foreach { r =>
      sys.error(s"readBefore($batchId) splits compacted range " +
        s"[${r._1}, ${r._2}] — compact only below the replay frontier")
    }
    union(rs.filter(_._2 < batchId))
  }

  /** Merge all committed segments with ids in `[0, upTo]` into one
    * range segment. Call with `upTo` strictly below the streaming
    * checkpoint frontier (batches that can never be re-delivered).
    * Idempotent; a crash at any point leaves a readable store (the
    * originals stay visible until the range dir commits, then become
    * invisible by containment and are best-effort deleted). */
  def compact(upTo: Long): Unit = {
    val victims = ranges().filter(_._2 <= upTo)
    if (victims.size <= 1) return
    val lo = victims.map(_._1).min
    val hi = victims.map(_._2).max
    val target = new Path(rootPath, segName(lo, hi))
    clustered(union(victims).get).write.mode("overwrite")
      .parquet(target.toString)
    // best-effort cleanup — already invisible to readers either way
    victims.foreach { case (_, _, p) =>
      try { fs.delete(p, true); () } catch { case _: Exception => () }
    }
  }
}
