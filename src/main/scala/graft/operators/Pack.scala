package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches — concat-then-chunk
  * semantics: documents are laid out in a deterministic total order
  * (`orderCol`), their token counts form one global stream, and each
  * document is assigned the pack (chunk of `budget` tokens) its FIRST
  * token lands in: `pack_id = floor(exclusive_prefix_sum / budget)`.
  *
  * Scale: a global running sum is the textbook distributed prefix-sum,
  * NOT a single-partition window (which would serialize the corpus
  * through one task). Two passes:
  *   1. bucket-local cumulative sums — one shuffle on the bucket key,
  *      windows sort only within buckets;
  *   2. per-bucket totals (tiny: one row per bucket) get an exclusive
  *      running offset on a single-partition window over that TINY
  *      frame, then broadcast-join back.
  * Choose `bucketSize` so a bucket's rows fit a task comfortably; the
  * result is independent of the choice (it only re-slices pass 1).
  */
object Pack {

  def sequences(docs: DataFrame, budget: Long,
      orderCol: String = "doc_id", tokensExpr: Column = null,
      bucketSize: Long = 8192L): DataFrame = {
    require(budget > 0, "budget must be positive")
    val toks = Option(tokensExpr).getOrElse(
      graft.functions.TextFunctions.tokenCount(col("text")))
    val b = docs
      .withColumn("__ntok", toks.cast("long"))
      .withColumn("__bkt", floor(col(orderCol).cast("long") / bucketSize))
    val wIn = Window.partitionBy("__bkt").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = b.withColumn("__cum_in", sum(col("__ntok")).over(wIn))
    // One row per bucket → the running offset over buckets costs a
    // single-partition window on a frame of |buckets| rows (KBs), not
    // on the corpus.
    val wOff = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = b.groupBy("__bkt").agg(sum("__ntok").as("__tot"))
      .withColumn("__off", sum(col("__tot")).over(wOff) - col("__tot"))
      .select("__bkt", "__off")
    inBucket.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("pack_id",
        floor((col("__cum_in") + col("__off") - col("__ntok")) /
          budget.toDouble).cast("long"))
      .withColumn("n_tokens", col("__ntok"))
      .drop("__bkt", "__ntok", "__cum_in", "__off")
  }
}
