package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join: match left points to right intervals
  * (`lo <= x < hi`), without the broadcast-nested-loop cross product a
  * naive inequality join plans.
  *
  * Bucketed formulation: quantize the domain into fixed-width buckets;
  * each interval explodes into the buckets it overlaps, each point maps
  * to exactly one bucket; equi-join on the bucket id, then apply the
  * exact range predicate. The shuffle is an equi-shuffle on bucket id —
  * output-linear work instead of |L|×|R|. Bucket width trades
  * replication of long intervals against bucket fan-in (pick ≈ median
  * interval width).
  */
object RangeJoin {

  def pointInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    val pb = points.withColumn("__bkt",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__bkt",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor((col(hiCol) - lit(1e-9)) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("__bkt"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bkt")
  }
}
