package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * key carries the latest right ROW forward onto each left row.
  * ONE shuffle on the key, O(n log n) within partitions — no per-key
  * loops, no range cross product; survives any fact:quote ratio.
  * Caveat: `partitionBy(key)` serializes each key into one task, so a
  * single hot key (one symbol carrying most of both sides) bounds the
  * operator by that task — use [[backwardBucketed]] for that shape.
  *
  * The carried value is ONE STRUCT per right row `(matched ts,
  * payloads...)`, not per-payload `last` calls: carrying payloads
  * separately would skip a matched row whose payload is NULL and
  * substitute an older row's value — and under `tolerance` could emit
  * a payload from a row OUTSIDE tolerance, or mix payload columns
  * from different right rows. The struct is all-or-nothing, matching
  * pandas `merge_asof` (the matched row's values, NULLs included).
  *
  * Equal timestamps: the right row sorts before the left row at the
  * same instant (tag ordering), matching inclusive `l.ts >= r.ts`
  * ASOF semantics.
  *
  * `tolerance` (a Spark interval string, e.g. `"2 HOURS"`) bounds the
  * match age: a carried match older than `leftTs - tolerance` nulls
  * out — pandas `merge_asof(tolerance=...)` semantics. Correctness
  * rests on monotonicity: if the LATEST right row at or before `ts` is
  * already out of tolerance, every earlier one is older still, so
  * nulling the carried match is exactly "no match within tolerance".
  * Same single shuffle — the matched timestamp rides inside the
  * carried struct, so the gate and the payloads see the same row.
  *
  * DETERMINISM PRECONDITION: right-side `(key, rightTs)` pairs must be
  * unique. With ties, "the latest right row at or before ts" is not
  * well defined, and the variants break the tie differently — the
  * window shape keeps whichever tied row sorts last within the
  * partition (engine-dependent for equal sort keys), while the
  * bucketed variants' `max(struct)`/`min(struct)` summary compares
  * payload fields after the timestamp — so tied inputs can produce
  * rows that differ BETWEEN variants and BETWEEN runs. Pre-dedup the
  * right side (e.g. `row_number()` over `(key, rightTs)`, keep 1) when
  * ties are possible; the declared `q_join_asof*` keys and the
  * PropertySpec brute-force harness do exactly that.
  */
object AsOfJoin {

  /** The carried match as one struct: `__mt` = the right row's ts,
    * then that SAME row's payloads. */
  private def matchStruct(payloadCols: Seq[String]): Column =
    struct(col("__t").as("__mt") +:
      payloadCols.map(c => col(s"__p_$c")): _*)

  /** Final projection shared by all variants: keep left rows, gate the
    * carried struct on tolerance, project its fields. */
  private def projectMatch(unioned: DataFrame, key: String,
      leftCols: Seq[String], payloadCols: Seq[String], carried: Column,
      leftTag: Int, inTol: Column => Column): DataFrame = {
    val ok = inTol(col("__m").getField("__mt"))
    unioned
      .withColumn("__m", carried)
      .where(col("__side") === leftTag)
      .select(Seq(col(key)) ++
        leftCols.filterNot(_ == key).map(col) ++
        payloadCols.map(c =>
          when(ok, col("__m").getField(s"__p_$c")).as(c)): _*)
  }

  /** Tag-and-pad legs: both sides get (key, __t, __side, left cols,
    * __p_ payload cols), NULL-padded where absent. */
  private def legs(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      leftTag: Int, rightTag: Int): (DataFrame, DataFrame) = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(leftTag))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        payloadCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val r = right
      .withColumn("__t", col(rightTs))
      .withColumn("__side", lit(rightTag))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)
    (l, r)
  }

  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String],
      tolerance: Option[String] = None): DataFrame = {
    // left sorts after right at equal ts → inclusive l.ts >= r.ts
    val (l, r) = legs(left, right, key, leftTs, rightTs, payloadCols,
      leftTag = 1, rightTag = 0)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(when(col("__side") === 0, matchStruct(payloadCols)),
      ignoreNulls = true).over(w)
    projectMatch(l.unionByName(r), key, left.columns.toSeq, payloadCols,
      carried, leftTag = 1,
      inTol = mt => tolerance.fold(lit(true))(tol =>
        mt >= col("__t") - expr(s"INTERVAL $tol")))
  }

  /** Forward as-of join: attach the EARLIEST right row with the same
    * key and `rightTs >= leftTs` (pandas `merge_asof
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
    // left sorts before right at equal ts → inclusive r.ts >= l.ts
    val (l, r) = legs(left, right, key, leftTs, rightTs, payloadCols,
      leftTag = 0, rightTag = 1)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = first(when(col("__side") === 1, matchStruct(payloadCols)),
      ignoreNulls = true).over(w)
    projectMatch(l.unionByName(r), key, left.columns.toSeq, payloadCols,
      carried, leftTag = 0,
      inTol = mt => tolerance.fold(lit(true))(tol =>
        mt <= col("__t") + expr(s"INTERVAL $tol")))
  }

  /** Auto-dispatching [[backward]]: one cheap keyed histogram over the
    * LEFT side (two-level aggregate — per-key counts partial-aggregate
    * map-side, then a 2-value reduce; safe under any skew) picks the
    * plain window when keys are roughly uniform and
    * [[backwardBucketed]] when one key carries ≥ `hotKeyShare` of the
    * rows. Measured basis (SCALE.md "Skew proof"): plain wins ~1.3× at
    * uniform keys, bucketed wins 3.3× at a 50% hot key — the probe
    * aggregate costs far less than either gap. Use the explicit
    * variants when the key distribution is known at build time. */
  def backwardAuto(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      bucketSeconds: Long = 86400L, tolerance: Option[String] = None,
      hotKeyShare: Double = 0.2): DataFrame =
    if (maxKeyShare(left, key) >= hotKeyShare)
      backwardBucketed(left, right, key, leftTs, rightTs, payloadCols,
        bucketSeconds, tolerance)
    else backward(left, right, key, leftTs, rightTs, payloadCols, tolerance)

  /** [[backwardAuto]]'s mirror for the forward direction. */
  def forwardAuto(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      bucketSeconds: Long = 86400L, tolerance: Option[String] = None,
      hotKeyShare: Double = 0.2): DataFrame =
    if (maxKeyShare(left, key) >= hotKeyShare)
      forwardBucketed(left, right, key, leftTs, rightTs, payloadCols,
        bucketSeconds, tolerance)
    else forward(left, right, key, leftTs, rightTs, payloadCols, tolerance)

  /** Largest single-key share of `df`'s rows — the dispatch statistic
    * (exposed for specs). 0.0 on an empty frame. */
  private[graft] def maxKeyShare(df: DataFrame, key: String): Double = {
    val r = df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")), sum(col("__n"))).head()
    if (r.isNullAt(0)) 0.0
    else r.getLong(0).toDouble / math.max(r.getLong(1), 1L)
  }

  /** [[backward]] for the HOT-KEY case. `partitionBy(key)` puts one
    * key's whole history in one task; with a single dominant symbol
    * that task IS the runtime. This variant partitions by
    * `(key, time bucket)` so a hot key's rows spread over
    * `range / bucketSeconds` tasks, and the per-bucket carry-in (the
    * last right row from any strictly earlier bucket) arrives via a
    * per-bucket summary window — one row per (key, bucket), the same
    * two-pass trick as Pack's distributed prefix sum. Result is
    * row-identical to [[backward]] (spec-pinned, including
    * tolerance): the carry-in keeps the matched row's ORIGINAL
    * timestamp, so the tolerance gate sees exactly what the
    * single-partition window would.
    *
    * Cost: one extra shuffle of the narrow per-bucket summaries
    * (≤ #right-buckets rows) and a second window over #buckets rows
    * per key — both bounded by bucket count, never by row count.
    * Lineage note: the RIGHT side is evaluated twice (in-bucket leg +
    * summary aggregate) and the LEFT gets one extra column-pruned pass
    * (the bucket markers read only (key, ts) — plan-verified). Pass a
    * cached/checkpointed frame if the right side's lineage is
    * expensive to recompute. */
  def backwardBucketed(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      bucketSeconds: Long = 86400L,
      tolerance: Option[String] = None): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val leftCols = left.columns.toSeq
    val (l, r) = legs(left, right, key, leftTs, rightTs, payloadCols,
      leftTag = 1, rightTag = 0)
    def withBucket(df: DataFrame): DataFrame = df.withColumn("__bkt",
      floor(col("__t").cast("double") / bucketSeconds).cast("long"))
    val lb = withBucket(l)
    val rb = withBucket(r)

    // Per-(key, bucket) right summary: the bucket's LAST row as one
    // struct (max over structs = argmax by time; payload fields ride
    // along atomically, same all-or-nothing contract as the window).
    val summaries = rb.groupBy(col(key), col("__bkt"))
      .agg(max(matchStruct(payloadCols)).as("__last"))

    // Carry-in per LEFT bucket: the latest summary from any STRICTLY
    // earlier bucket. One row per (key, bucket) on both legs — the
    // hot key serializes over its bucket count here, not its rows.
    // Tag order puts the left marker BEFORE the same bucket's summary
    // so the running last() never leaks the current bucket's rows
    // (those are already in the bucket's own union).
    val marks = lb.select(col(key), col("__bkt")).distinct()
      .select(col(key), col("__bkt"), lit(0).as("__tag"),
        lit(null).cast(summaries.schema("__last").dataType).as("__last"))
    val sums = summaries
      .select(col(key), col("__bkt"), lit(1).as("__tag"), col("__last"))
    val wb = Window.partitionBy(col(key))
      .orderBy(col("__bkt"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carryIns = marks.unionByName(sums)
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wb))
      .where(col("__tag") === 0 && col("__carry").isNotNull)
      .select(col(key), col("__bkt"), col("__carry"))

    // Re-materialize each carry-in as a right row inside the LEFT
    // bucket, at its ORIGINAL timestamp (strictly before the bucket,
    // so it sorts first; tolerance stays exact).
    val carryRows = carryIns.select(
      Seq(col(key), col("__carry").getField("__mt").as("__t"),
        lit(0).as("__side"), col("__bkt")) ++
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c =>
          col("__carry").getField(s"__p_$c").as(s"__p_$c")): _*)

    val w = Window.partitionBy(col(key), col("__bkt"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(when(col("__side") === 0, matchStruct(payloadCols)),
      ignoreNulls = true).over(w)
    projectMatch(lb.unionByName(rb).unionByName(carryRows), key,
      leftCols, payloadCols, carried, leftTag = 1,
      inTol = mt => tolerance.fold(lit(true))(tol =>
        mt >= col("__t") - expr(s"INTERVAL $tol")))
  }

  /** [[forward]] for the HOT-KEY case — the exact mirror of
    * [[backwardBucketed]]: per-bucket summaries carry each bucket's
    * EARLIEST right row, and a left bucket's carry-in is the earliest
    * summary from any strictly LATER bucket (the summary sorts before
    * the marker at equal bucket, so a current→following frame never
    * leaks the bucket's own rows). Row-identical to [[forward]],
    * spec-pinned including tolerance. Same cost/lineage notes as
    * [[backwardBucketed]]. */
  def forwardBucketed(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      bucketSeconds: Long = 86400L,
      tolerance: Option[String] = None): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val leftCols = left.columns.toSeq
    val (l, r) = legs(left, right, key, leftTs, rightTs, payloadCols,
      leftTag = 0, rightTag = 1)
    def withBucket(df: DataFrame): DataFrame = df.withColumn("__bkt",
      floor(col("__t").cast("double") / bucketSeconds).cast("long"))
    val lb = withBucket(l)
    val rb = withBucket(r)

    val summaries = rb.groupBy(col(key), col("__bkt"))
      .agg(min(matchStruct(payloadCols)).as("__first"))

    val sums = summaries
      .select(col(key), col("__bkt"), lit(0).as("__tag"), col("__first"))
    val marks = lb.select(col(key), col("__bkt")).distinct()
      .select(col(key), col("__bkt"), lit(1).as("__tag"),
        lit(null).cast(summaries.schema("__first").dataType).as("__first"))
    val wb = Window.partitionBy(col(key))
      .orderBy(col("__bkt"), col("__tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carryIns = marks.unionByName(sums)
      .withColumn("__carry", first(col("__first"), ignoreNulls = true).over(wb))
      .where(col("__tag") === 1 && col("__carry").isNotNull)
      .select(col(key), col("__bkt"), col("__carry"))

    val carryRows = carryIns.select(
      Seq(col(key), col("__carry").getField("__mt").as("__t"),
        lit(1).as("__side"), col("__bkt")) ++
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c =>
          col("__carry").getField(s"__p_$c").as(s"__p_$c")): _*)

    val w = Window.partitionBy(col(key), col("__bkt"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = first(when(col("__side") === 1, matchStruct(payloadCols)),
      ignoreNulls = true).over(w)
    projectMatch(lb.unionByName(rb).unionByName(carryRows), key,
      leftCols, payloadCols, carried, leftTag = 0,
      inTol = mt => tolerance.fold(lit(true))(tol =>
        mt <= col("__t") + expr(s"INTERVAL $tol")))
  }
}
