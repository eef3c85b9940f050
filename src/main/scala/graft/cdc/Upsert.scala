package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C1 — incremental upsert, the reference's delete+insert load
  * (reference: base_loader.py:275-338 `_perform_incremental_load`):
  * `DELETE FROM dest WHERE key IN (SELECT key FROM incoming)` then
  * `INSERT INTO dest SELECT * FROM incoming`.
  *
  * Spark-first restatement: the delete phase is a left-anti join of the
  * destination against the incoming key set, the insert phase a
  * `unionByName`. One shuffle on the key (or none for the dest side when
  * the incoming batch is small enough for AQE to broadcast the anti-join
  * build side — the common CDC case: a micro-batch vs a huge table).
  *
  * Empty incoming batches return the destination unchanged, preserving
  * the reference's early-return (base_loader.py:307-314) without a
  * `count()` action — `isEmpty` short-circuits after one partition.
  */
object Upsert {

  def apply(dest: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val missingKeys = keys.filterNot(incoming.columns.contains)
    require(missingKeys.isEmpty,
      s"incoming batch lacks key column(s) ${missingKeys.mkString(",")}" +
        " — drift tolerance null-fills payload columns only")
    if (incoming.isEmpty) dest else merge(dest, incoming, keys)
  }

  /** [[apply]] minus the emptiness probe — for callers that already
    * KNOW the batch is non-empty ([[CowStore]]'s merge decides that
    * from the bucket probe it runs anyway; paying `isEmpty` again here
    * was one whole extra job per commit). Empty-batch semantics are
    * the caller's responsibility on this path. */
  private[graft] def merge(dest: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame = {
    // Schema-drift tolerance, the reference's (base_loader.py:290-299):
    // missing destination columns null-fill, unknown incoming fields
    // drop, compatible types cast. Same-type casts are erased by
    // Catalyst's SimplifyCasts, so the aligned-already path keeps its
    // exact plan.
    val inc = graft.schema.Normalize.alignToSchema(incoming, dest.schema)
    // No distinct on the anti-join BUILD side (r21): duplicate build
    // keys cannot change an anti-join's result, the hash relation
    // dedups keys as it builds, and the distinct cost a whole
    // exchange + AQE round per merge. (CDC batches are ≤1 row/key by
    // convention anyway; a dup-heavy batch only carries its own dups
    // through the shuffle in the rare too-big-to-broadcast case.)
    val incKeys = inc.select(keys.map(col): _*)
    dest.join(incKeys, keys, "left_anti").unionByName(inc)
  }

  /** C2 — "special" upsert (base_loader.py:340-475): C1, then enforce
    * the ≤1-row-per-key invariant by keeping only the row with the
    * highest tracking value (and a caller-supplied total tie-break, as
    * ClickHouse's `MAX(track)` tuple-delete leaves ties undefined). */
  def withDedup(dest: DataFrame, incoming: DataFrame, keys: Seq[String],
      track: String, tieBreak: Seq[String] = Nil): DataFrame =
    DedupLatest(apply(dest, incoming, keys), keys, track, tieBreak)

  /** CDC op-apply — the I/U/D generalization of the delete+insert
    * merge (the reference's loader only ever sees upserts because its
    * extract queries filter to live rows, `base_loader.py:275-338`; a
    * log-based CDC feed — Debezium/DMS shaped — additionally carries
    * explicit delete events, and this is the standard one-pass apply
    * for such a batch):
    *
    *  - EVERY batch key is deleted from the destination (the delete
    *    phase of delete+insert — one left-anti join, AQE-broadcast for
    *    micro-batches);
    *  - rows whose `opCol` is NOT in `deleteOps` are inserted back
    *    (insert and update are the same operation under delete+insert,
    *    so I vs U tags need no distinct handling).
    *
    * The batch is expected pre-collapsed to ≤1 row per key (the shape
    * every log compactor / `DedupLatest` emits); callers holding a
    * multi-event history per key collapse it FIRST with
    * [[DedupLatest]] on the event-order column, so "latest op wins" is
    * decided by the caller's ordering, not by this kernel. When a key
    * still carries both a delete row and a non-delete row, the
    * non-delete row lands (its insert follows the shared delete phase)
    * — deterministic, spec-pinned.
    *
    * `opCol` is consumed here and never reaches the destination.
    * Schema drift on the payload follows [[apply]]'s tolerance. */
  def applyOps(dest: DataFrame, batch: DataFrame, keys: Seq[String],
      opCol: String, deleteOps: Seq[String] = Seq("D", "d", "delete"))
      : DataFrame = {
    require(keys.nonEmpty, "applyOps requires at least one key column")
    require(batch.columns.contains(opCol),
      s"batch lacks the op column '$opCol'")
    require(!keys.contains(opCol), "the op column cannot be a key")
    require(!dest.columns.contains(opCol),
      s"destination already carries a column named '$opCol' — the op " +
        "column is batch metadata and must not collide with payload")
    val missingKeys = keys.filterNot(batch.columns.contains)
    require(missingKeys.isEmpty,
      s"batch lacks key column(s) ${missingKeys.mkString(",")}")
    if (batch.isEmpty) dest
    else opsMerge(dest, batch, keys, opCol, deleteOps)
  }

  /** [[applyOps]] minus the emptiness probe — same contract as
    * [[merge]]: the caller ([[CowStore.applyCdc]]'s bucket probe)
    * already established the batch is non-empty. */
  private[graft] def opsMerge(dest: DataFrame, batch: DataFrame,
      keys: Seq[String], opCol: String, deleteOps: Seq[String])
      : DataFrame = {
    // build side of the delete-phase anti-join — no distinct needed
    // (see [[merge]]; applyOps batches are pre-collapsed to ≤1
    // row/key by contract anyway)
    val allKeys = batch.select(keys.map(col): _*)
    // NULL / unrecognized ops are upserts (the conservative read of a
    // malformed feed: data lands rather than silently vanishing) —
    // the coalesce keeps the three-valued NOT from dropping them.
    val inserts = graft.schema.Normalize.alignToSchema(
      batch.where(!coalesce(col(opCol).isin(deleteOps: _*), lit(false))),
      dest.schema)
    dest.join(allKeys, keys, "left_anti").unionByName(inserts)
  }

  /** C2 steady-state fast path: when `dest` already satisfies the
    * ≤1-row-per-key invariant (true after every previous merge), the
    * post-union global window in [[withDedup]] is wasted work — after the
    * anti-join each key's rows come from exactly ONE side, so deduping
    * the INCOMING micro-batch alone is equivalent (BucketingSpec asserts
    * this). The window shuffle then runs on the batch, not the 100 TB
    * destination, and the dest side keeps its broadcast-anti-join
    * zero-shuffle plan (or its bucketed layout — BucketingSpec). */
  def withDedupMaintained(dest: DataFrame, incoming: DataFrame,
      keys: Seq[String], track: String, tieBreak: Seq[String] = Nil)
      : DataFrame =
    apply(dest, DedupLatest(incoming, keys, track, tieBreak), keys)
}

/** J4/C2 — keep only the latest version per key, replacing the
  * reference's tuple-anti-join delete (base_loader.py:427-436).
  *
  * Default form: an aggregate argmax — `max` over a struct whose
  * leading fields are `(track, tieBreak...)` with the remaining
  * payload columns trailing. Descending order and NULLS LAST both fall
  * out of struct comparison (a null field is the smallest value, so
  * `max` prefers non-null tracks exactly like a window's `desc` NULLS
  * LAST — CdcSpec pins the parity). Structs are not hash-aggregable
  * buffer types, so Spark plans a SortAggregate; what makes it win is
  * the map-side PARTIAL combine: the shuffle carries one candidate row
  * per key per input partition instead of every version, and a hot
  * key's post-shuffle partition holds ≤ #map-partitions candidate rows
  * instead of the key's entire history — the same skew-safe
  * min/max-struct doctrine as `Dedup.spans`. The window form
  * (`row_number() OVER (PARTITION BY key ORDER BY track DESC, ...)`)
  * necessarily funnels a hot key's every row into ONE unsplittable
  * task and sorts it there.
  *
  * Measured (matched in-JVM interleaved min-of-5, sf0.1 local[32],
  * full-row checksum consumption; JSON in SCALE.md "Latest-per-key
  * argmax — contenders"): raw-scan shape 1.06s window → 0.91s
  * aggregate; composite upsert upstream 0.98 → 0.92s; 7.8M-row frame
  * with a ~50% hot key 7.41 → 3.79s. A third contender — join-on-max
  * (narrow codegen'd `max(track)`, equi-join back, struct-max over
  * ties) — evaluates the upstream lineage twice (both join legs) and
  * measured strictly worse on composite upstreams; rejected.
  *
  * The struct comparison extends through ALL columns, so the pick is
  * deterministic even when `(track, tieBreak)` is not a total order —
  * strictly stronger than the window form's sort-order luck, same
  * contract ("ties beyond tieBreak are the implementation's choice";
  * when the caller's tie-break IS total — every correctness-gated
  * caller — the surviving row is identical to the window form's).
  *
  * Fallback: payloads carrying a non-orderable type (MapType anywhere)
  * cannot ride a comparable struct; those take the window argmax,
  * which only orders by `(track, tieBreak)`. */
object DedupLatest {
  private def orderable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => orderable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case _ => true
    }

  def apply(df: DataFrame, keys: Seq[String], track: String,
      tieBreak: Seq[String] = Nil): DataFrame =
    if (df.schema.fields.forall(f => orderable(f.dataType)))
      bySortAggregate(df, keys, track, tieBreak)
    else byWindow(df, keys, track, tieBreak)

  /** The aggregate argmax (see object scaladoc). Requires every column
    * orderable — [[apply]] dispatches here when that holds. */
  def bySortAggregate(df: DataFrame, keys: Seq[String], track: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(df.schema.fields.forall(f => orderable(f.dataType)),
      "bySortAggregate requires all columns orderable (no MapType); " +
        "use DedupLatest.byWindow for map-typed payloads")
    val packed = (track +: tieBreak) ++
      df.columns.filterNot(c =>
        keys.contains(c) || c == track || tieBreak.contains(c))
    df.groupBy(keys.map(col): _*)
      .agg(max(struct(packed.map(col): _*)).as("__latest"))
      .select(keys.map(col) ++
        packed.map(c => col("__latest").getField(c).as(c)): _*)
      .select(df.columns.map(col).toSeq: _*) // original column order
  }

  /** Window argmax — the fallback for non-orderable payloads (orders
    * only by `(track, tieBreak)`, so MapType can ride as payload). */
  def byWindow(df: DataFrame, keys: Seq[String], track: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (track +: tieBreak).map(col(_).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
