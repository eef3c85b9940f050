package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Sequence packing for pretraining batches — concat-then-chunk
  * semantics: documents are laid out in a deterministic total order
  * (`orderCol`, which must be unique and non-null), their token counts
  * form one global stream, and each document is assigned the pack
  * (chunk of `budget` tokens) its FIRST token lands in:
  * `pack_id = exclusive_prefix_sum div budget` (integer floor-division
  * on longs — exact at any corpus size, where a Double quotient would
  * lose exactness past 2^53 total tokens).
  *
  * Scale: a global running sum is the textbook distributed prefix-sum,
  * NOT a single-partition window (which would serialize the corpus
  * through one task). Two passes:
  *   1. bucket-local cumulative sums — one shuffle on the bucket key,
  *      windows sort only within buckets;
  *   2. per-bucket totals (tiny: one row per bucket) get an exclusive
  *      running offset on a single-partition window over that TINY
  *      frame, then broadcast-join back.
  * The bucket key must be MONOTONE in `orderCol` (bucket boundaries
  * respect the global order) but is otherwise arbitrary — the result is
  * independent of the slicing. [[bucketed]] picks it by column type:
  * numeric columns floor-divide (map-only, zero extra cost); any other
  * orderable type range-partitions on `orderCol` and uses the range
  * partition id — a string/UUID order column must never silently fall
  * into one bucket (the failure mode of a blind `cast("long")`, which
  * yields NULL for every non-numeric value).
  *
  * Precondition-violation semantics: rows whose `orderCol` is NULL are
  * DROPPED from the output — identically on the numeric and non-numeric
  * paths. NULL has no position in a total order, so there is no correct
  * pack for such a row; dropping (rather than failing) keeps the
  * operator total on dirty corpora, and callers that need fail-fast
  * semantics should pre-assert non-nullness (cf. the quality.Check
  * violation report, which surfaces exactly this class of row).
  */
object Pack {

  /** NOTE — eager construction: [[assign]]'s bounded per-bucket-totals
    * collect runs at PLAN-CONSTRUCTION time, so calling this method
    * executes a full Spark job (the corpus-wide token-count pass) even
    * if the returned DataFrame is never acted on. Both paths checkpoint
    * the narrow (orderCol, count, bucket) projection first, so that one
    * materialization feeds BOTH the totals collect and the final plan —
    * token counting runs once, and a nondeterministic upstream cannot
    * make the two passes disagree (ADVICE r13). */
  def sequences(docs: DataFrame, budget: Long,
      orderCol: String = "doc_id", tokensExpr: Column = null,
      bucketSize: Long = 8192L): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(bucketSize > 0, "bucketSize must be positive")
    // Rows with a NULL order key are dropped up front — on EITHER path.
    // (Previously the numeric path silently kept them in a NULL bucket
    // while the non-numeric path's rejoin dropped them; the documented
    // precondition is a non-null unique key, so violations now behave
    // identically instead of diverging by column type.)
    val toks = Option(tokensExpr).getOrElse(
      graft.functions.TextFunctions.tokenCount(col("text")))
    val withTok = docs.where(col(orderCol).isNotNull)
      .select(col(orderCol), toks.cast("long").as("__ntok"))
    val bucketed = docs.schema(orderCol).dataType match {
      case _: NumericType =>
        // Bucket is a pure function of the column value — monotone in
        // `orderCol` by construction, map-only, zero extra shuffle.
        withTok.withColumn("__bkt",
          floor(col(orderCol).cast("long") / bucketSize))
      case _ =>
        // Range-partition the NARROW (orderCol, count) projection and
        // use the range partition id as the bucket: partition i's keys
        // all precede partition i+1's, so the id is monotone in
        // `orderCol` — a string/UUID order column must never silently
        // collapse into one bucket (the failure mode of a blind
        // `cast("long")`, which yields NULL for every non-numeric value).
        val n = docs.sparkSession.conf.get(
          "spark.sql.shuffle.partitions", "32").toInt
        rangeBuckets(withTok, orderCol, n)
    }
    // Pin ONE materialization of the narrow frame (3 columns, never the
    // corpus width): the non-numeric path REQUIRES it
    // (spark_partition_id is only deterministic within one physical
    // execution), and on the numeric path it stops the totals collect
    // and the final join from each re-running the token-count pass.
    // localCheckpoint stores partitions only on executors — fast, but
    // an executor loss mid-job is unrecoverable. When the session has a
    // reliable checkpoint dir configured, use a real checkpoint instead
    // (survives executor loss; the right trade at multi-TB scale where
    // pass 2 can run minutes after pass 1).
    val narrow =
      if (docs.sparkSession.sparkContext.getCheckpointDir.isDefined)
        bucketed.checkpoint(true)
      else bucketed.localCheckpoint(true)
    val packed = assign(narrow, orderCol, budget)
      .select(col(orderCol), col("pack_id"), col("n_tokens"))
    docs.join(packed, Seq(orderCol))
  }

  /** Two-pass prefix sum over a frame carrying `__ntok` and a monotone
    * `__bkt`; adds `pack_id` and `n_tokens`, drops the bucket plumbing. */
  private def assign(b: DataFrame, orderCol: String, budget: Long)
      : DataFrame = {
    val wIn = Window.partitionBy("__bkt").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = b.withColumn("__cum_in", sum(col("__ntok")).over(wIn))
    // One row per bucket → the running offsets are prefix-summed on the
    // DRIVER over a bounded collect (≤ |buckets| rows; numeric path:
    // ~rows/bucketSize, non-numeric path: shuffle-partition count) and
    // broadcast back. A `Window.orderBy("__bkt")` over the same tiny
    // frame is equivalent, but it emits WindowExec's "moving all data
    // to a single partition" WARN on every run — at scale that
    // intentional tiny-frame warning is indistinguishable in the logs
    // from a genuine corpus-serializing window, so it would mask the
    // exact bug class this operator is designed to avoid. The collect
    // is an eager action at plan-construction time (same bounded
    // pattern as Sampling's domain-count collect).
    val totals = b.groupBy("__bkt")
      .agg(coalesce(sum("__ntok"), lit(0L)).as("__tot"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offs = totals.map { case (bkt, tot) =>
      val off = acc; acc += tot; (bkt, off)
    }
    val spark = b.sparkSession
    import spark.implicits._
    val offsets = spark.createDataset(offs.toIndexedSeq).toDF("__bkt", "__off")
    inBucket.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("__start", col("__cum_in") + col("__off") - col("__ntok"))
      .withColumn("pack_id", expr(s"__start div ${budget}L"))
      .withColumn("n_tokens", col("__ntok"))
      .drop("__bkt", "__cum_in", "__off", "__start")
  }

  /** The bucket assignment [[sequences]] uses for a non-numeric order
    * column. `private[graft]` so specs can assert the corpus actually
    * spreads across >1 bucket (the anti-pattern this exists to prevent
    * is every row landing in one bucket and pass 1 serializing through
    * a single-partition window). Callers must pin the result with a
    * checkpoint before fanning out consumers — partition ids are only
    * stable within one physical execution. */
  private[graft] def rangeBuckets(docs: DataFrame, orderCol: String,
      numBuckets: Int): DataFrame =
    docs.repartitionByRange(numBuckets, col(orderCol))
      .withColumn("__bkt", spark_partition_id().cast("long"))
}
