package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** C6 — SCD Type 2 snapshot with the dbt `check` strategy
  * (reference: dbt_project/dbt/snapshots/users_snapshot.sql:1-18,
  * verified behavior README.md:69-88): compare staged rows against the
  * current open rows on `key`; when any of `checkCols` changed, close
  * the old row (`valid_to = asOf`) and insert a new version
  * (`valid_from = asOf`, `valid_to = NULL`). New keys insert; keys
  * missing from the staged batch stay open (dbt default — no hard
  * deletes).
  *
  * Plan shape (designed for a 100 TB history table): the old form was
  * ONE full-outer join — but a full outer can never broadcast, so it
  * SORT-MERGE-shuffled every open row's full payload per snapshot run
  * regardless of batch size. r22 splits it into the two legs the
  * full outer was encoding (guide §2.3/§3.1):
  *  - open LEFT JOIN staged — the matched + left-only cases; the
  *    staged batch is the (churn-sized) build side, so AQE broadcasts
  *    it and the open rows never cross an exchange;
  *  - staged ANTI JOIN open KEYS — the brand-new keys; only the
  *    narrow key projection of the open set shuffles, never payloads.
  * Row-for-row identical output (matched/open-only/staged-only map
  * 1:1 onto the full outer's three cases, NULL keys match nowhere in
  * either form — spec-pinned parity); each leg emits 0–2 output rows
  * via an `explode` of a conditionally-built struct array — no
  * driver-side iteration, closed history rows pass through untouched
  * (and, with a month-partitioned [[TableStore]], unrewritten). Change
  * detection is a per-column null-safe comparison fold (`<=>`), matching
  * dbt's column-by-column `check` strategy — NOT a single xxhash64 over
  * the columns: Spark's xxhash64 skips NULL inputs entirely, so a value
  * swap involving NULLs (open=(NULL,'x') vs staged=('x',NULL)) hashes
  * identically and the change would be silently missed.
  */
object Scd2 {
  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"

  /** First run: everything opens at `asOf` (dbt snapshot first-run). */
  def init(staged: DataFrame, asOf: java.sql.Timestamp): DataFrame =
    staged
      .withColumn(ValidFrom, lit(asOf))
      .withColumn(ValidTo, lit(null).cast(TimestampType))

  def apply(current: DataFrame, staged: DataFrame, keys: Seq[String],
      checkCols: Seq[String], asOf: java.sql.Timestamp): DataFrame = {
    val attrCols = current.columns.filterNot(c =>
      c == ValidFrom || c == ValidTo).toSeq
    require(staged.columns.toSet == attrCols.toSet,
      s"staged columns ${staged.columns.toSeq} must match tracked columns $attrCols")

    val closed = current.where(col(ValidTo).isNotNull)
    val open = current.where(col(ValidTo).isNull)

    // Disambiguate the staged side, keep join keys shared.
    val stg = staged.select(keys.map(col) ++
      attrCols.filterNot(keys.contains).map(c => col(c).as(s"__s_$c")): _*)
    def sCol(c: String): Column = if (keys.contains(c)) col(c) else col(s"__s_$c")

    val unchanged = checkCols.map(c => col(c) <=> sCol(c)).reduce(_ && _)

    val openRow = struct(
      attrCols.map(col) :+ col(ValidFrom) :+ col(ValidTo): _*)
    val closedRow = struct(
      attrCols.map(col) :+ col(ValidFrom) :+ lit(asOf).as(ValidTo): _*)
    val newRow = struct(
      attrCols.map(c => sCol(c).as(c)) :+ lit(asOf).as(ValidFrom)
        :+ lit(null).cast(TimestampType).as(ValidTo): _*)

    // Presence marker that survives the outer join even for all-null
    // staged rows. Matched + open-only keys: one broadcast-able left
    // join (open payloads never shuffle — see class doc).
    val joined = open
      .join(stg.withColumn("__staged", lit(true)), keys, "left")
    val emitted = joined.select(explode(
      when(col("__staged").isNull, array(openRow))           // key left as-is
        .when(unchanged, array(openRow))                     // unchanged
        .otherwise(array(closedRow, newRow))                 // changed: close+insert
    ).as("r")).select(col("r.*"))
    // Brand-new keys: anti-join against the open KEY projection only.
    val newOnly = stg
      .join(open.select(keys.map(col): _*), keys, "left_anti")
      .select(attrCols.map(c => sCol(c).as(c)) :+
        lit(asOf).as(ValidFrom) :+
        lit(null).cast(TimestampType).as(ValidTo): _*)

    closed.unionByName(emitted).unionByName(newOnly)
  }

  /** Current-row view (P8): `WHERE valid_to IS NULL` (dim_users.sql:15). */
  def currentRows(snapshot: DataFrame): DataFrame =
    snapshot.where(col(ValidTo).isNull)

  /** SCD2 maintenance from a CHANGE FEED ([[CowStore.readChangeRows]]'s
    * row shape — attr columns + a `change` tag) instead of a full
    * staged snapshot. The reference's dbt snapshot re-stages the whole
    * table every run (users_snapshot.sql:1-18, select * over staging);
    * at 100 TB the history join's staged side should be the CHURN, not
    * the table.
    *
    * The no-delete case is [[apply]] by composition — zero new kernel
    * logic, because the kernel's "key missing from staged stays open"
    * rule (the dbt default) makes absent-because-unchanged
    * indistinguishable from present-and-unchanged: both emit the open
    * row untouched (Scd2 parity is spec-pinned, deletes included).
    * Changed-on-a-non-check-column rows pass through the kernel's own
    * `checkCols` comparison exactly as a full-staged run would.
    *
    * `invalidateHardDeletes = true` additionally CLOSES the open rows
    * of `removed` keys (`valid_to = asOf`, no successor) — dbt's
    * `invalidate_hard_deletes` flag, which the full-staged form cannot
    * express without re-deriving the delete set by anti-join; the feed
    * carries it directly. One extra broadcast-able left join keyed on
    * the (tiny) removed-key set; closed history rows never rejoin. */
  def applyChanges(current: DataFrame, changes: DataFrame,
      keys: Seq[String], checkCols: Seq[String],
      asOf: java.sql.Timestamp,
      invalidateHardDeletes: Boolean = false): DataFrame = {
    require(changes.columns.contains("change"),
      "changes must carry the change-feed tag column `change` " +
        "(readChangeRows / Diff.changeRows output)")
    val staged = changes.where(col("change") =!= Diff.Removed)
      .drop("change")
    val snap = apply(current, staged, keys, checkCols, asOf)
    if (!invalidateHardDeletes) snap
    else {
      require(!current.columns.contains("__del"),
        "__del is applyChanges' reserved marker column; rename it")
      val delKeys = changes.where(col("change") === Diff.Removed)
        .select(keys.map(col): _*).distinct()
        .withColumn("__del", lit(true))
      snap.join(delKeys, keys, "left")
        .withColumn(ValidTo,
          when(col("__del") && col(ValidTo).isNull, lit(asOf))
            .otherwise(col(ValidTo)))
        .drop("__del")
        .select(snap.columns.map(col).toSeq: _*)
    }
  }
}
