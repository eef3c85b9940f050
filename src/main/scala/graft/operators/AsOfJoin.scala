package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row (key, ts), attach the most
  * recent right row with the same key and rightTs ≤ ts (inclusive) —
  * the time-series enrichment operator (trade↔quote style) the
  * reference lacks and Spark has no built-in for.
  *
  * Composed from built-ins (preference (a) of the custom-operator
  * ladder — no custom SparkPlan needed): tag and union both sides on
  * (key, time), then a single `last(ignoreNulls)` running window per
  * key carries the latest right payload forward onto each left row.
  * ONE shuffle on the key, O(n log n) within partitions — no per-key
  * loops, no range cross product; survives any fact:quote ratio.
  *
  * Equal timestamps: the right row sorts before the left row at the
  * same instant (tag ordering), matching inclusive `l.ts >= r.ts`
  * ASOF semantics.
  *
  * `tolerance` (a Spark interval string, e.g. `"2 HOURS"`) bounds the
  * match age: a carried payload older than `leftTs - tolerance` nulls
  * out — pandas `merge_asof(tolerance=...)` semantics. Correctness
  * rests on monotonicity: if the LATEST right row at or before `ts` is
  * already out of tolerance, every earlier one is older still, so
  * nulling the carried match is exactly "no match within tolerance".
  * Same single shuffle — the matched timestamp rides the same window.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String],
      tolerance: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts after right at equal ts
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val r = right
      .withColumn("__t", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedTs = last(when(col("__side") === 0, col("__t")),
      ignoreNulls = true).over(w)
    val inTol = tolerance.fold(lit(true)) { tol =>
      matchedTs >= col("__t") - expr(s"INTERVAL $tol")
    }
    l.unionByName(r)
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        payloadCols.map(c => when(inTol,
          last(col(s"__p_$c"), ignoreNulls = true).over(w)).as(c)): _*)
      .where(col("__side") === 1) // keep only left rows
      .drop("__t", "__side")
  }

  /** Forward as-of join: attach the EARLIEST right row with the same
    * key and `rightTs ≥ leftTs` (pandas `merge_asof
    * direction="forward"`) — the "next quote after the trade" lookup.
    * Same one-shuffle union+window shape as [[backward]], mirrored: the
    * running `last` becomes a `first(ignoreNulls)` over the FOLLOWING
    * frame, and the left row sorts before the right row at equal
    * timestamps (inclusive `r.ts >= l.ts`). `tolerance` bounds the
    * match age forward: matches later than `leftTs + tolerance` null
    * out (monotonicity argument mirrors backward's). */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String],
      tolerance: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(0)) // left sorts before right at equal ts
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val r = right
      .withColumn("__t", col(rightTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matchedTs = first(when(col("__side") === 1, col("__t")),
      ignoreNulls = true).over(w)
    val inTol = tolerance.fold(lit(true)) { tol =>
      matchedTs <= col("__t") + expr(s"INTERVAL $tol")
    }
    l.unionByName(r)
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        payloadCols.map(c => when(inTol,
          first(col(s"__p_$c"), ignoreNulls = true).over(w)).as(c)): _*)
      .where(col("__side") === 0) // keep only left rows
      .drop("__t", "__side")
  }
}
