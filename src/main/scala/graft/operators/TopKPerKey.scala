package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k rows per key via a typed `Aggregator` with a bounded buffer —
  * the scale-correct alternative to `row_number().over(window) <= k`:
  * the window form SORTS every key's full row set after the shuffle;
  * this form keeps only k candidates per key on the MAP side (partial
  * aggregation), so the shuffle carries ≤ k rows per key per input
  * partition and no full sort ever happens. For hot keys with millions
  * of rows this is the difference between O(n log n) per key and
  * O(n log k) with k-sized state.
  */
object TopKPerKey {

  /** (score, payload) pairs; keeps the k largest by (score, payload). */
  final case class ScoredRow(score: Double, payload: Long)

  final class TopKAgg(k: Int)
      extends Aggregator[ScoredRow, Seq[ScoredRow], Seq[ScoredRow]] {
    private implicit val ord: Ordering[ScoredRow] =
      Ordering.by((r: ScoredRow) => (r.score, r.payload))

    override def zero: Seq[ScoredRow] = Nil

    private def bound(xs: Seq[ScoredRow]): Seq[ScoredRow] =
      if (xs.size <= k) xs else xs.sorted.takeRight(k)

    override def reduce(b: Seq[ScoredRow], a: ScoredRow): Seq[ScoredRow] =
      bound(a +: b)

    override def merge(b1: Seq[ScoredRow], b2: Seq[ScoredRow]): Seq[ScoredRow] =
      bound(b1 ++ b2)

    override def finish(b: Seq[ScoredRow]): Seq[ScoredRow] =
      b.sorted.reverse // descending: best first

    override def bufferEncoder: Encoder[Seq[ScoredRow]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[ScoredRow]] = ExpressionEncoder()
  }

  /** DataFrame-facing helper: top `k` rows per `keyCol` by `scoreCol`
    * (descending, `payloadCol` as deterministic tie-break), returned as
    * (key, rank, score, payload) rows. */
  def apply(df: DataFrame, keyCol: String, scoreCol: String,
      payloadCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    df.select(col(keyCol).as("key"),
        col(scoreCol).cast("double").as("score"),
        col(payloadCol).cast("long").as("payload"))
      .groupBy("key")
      .agg(agg(col("score"), col("payload")).as("top"))
      .select(col("key"), posexplode(col("top")).as(Seq("idx", "row")))
      .select(col("key"), (col("idx") + 1).cast("long").as("rank"),
        col("row.score").as("score"), col("row.payload").as("payload"))
  }
}
