package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Log-structured append table: one immutable parquet SEGMENT directory
  * per micro-batch, keyed by the batch id — the durable-state primitive
  * for the streaming drains ([[graft.streaming.DedupMicroBatch]],
  * [[graft.streaming.CurateMicroBatch]]).
  *
  * {{{
  *   <root>/seg_00000000000000000000/part-*.parquet  // batch 0
  *   <root>/seg_00000000000000000001/part-*.parquet  // batch 1
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
  * Compaction (merging old segments to bound file counts) is a
  * maintenance concern deliberately left out: it must preserve id-range
  * boundaries for `readBefore` determinism (e.g. merge seg_0..seg_41
  * into one dir tagged with that range) and the drains here never need
  * it at test scale. At 100 TB you would compact cold segments on a
  * schedule, exactly like any LSM table.
  */
final class AppendStore(spark: SparkSession, root: String) {

  private val rootPath = new Path(root)
  private def fs =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def segDir(id: Long) = new Path(rootPath, f"seg_$id%020d")

  /** Committed segment ids, ascending. */
  def segments(): Seq[Long] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("seg_") &&
        fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("seg_").toLong).sorted

  /** Land `df` as segment `batchId`, overwriting any previous content
    * of that segment (idempotent batch replay). */
  def write(df: DataFrame, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(segDir(batchId).toString)

  private def union(ids: Seq[Long]): Option[DataFrame] =
    if (ids.isEmpty) None
    else Some(spark.read.parquet(ids.map(segDir(_).toString): _*))

  /** All committed state. */
  def read(): Option[DataFrame] = union(segments())

  /** State as of BEFORE `batchId` — what the transition function for
    * batch `batchId` must read so its output is replay-invariant. */
  def readBefore(batchId: Long): Option[DataFrame] =
    union(segments().filter(_ < batchId))
}
