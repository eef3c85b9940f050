package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the "what changed between yesterday's load and
  * today's" audit a CDC pipeline runs after every sync. The reference
  * validates loads by re-counting and spot-querying the destination
  * (base_loader.py:275-338 delete+insert leaves no record of WHICH
  * rows moved); this operator makes the change set itself a first-class
  * result: one row per differing key, tagged `added` / `removed` /
  * `changed`. Unchanged rows are deliberately absent — at 100 TB the
  * diff of two daily snapshots is tiny relative to the snapshots, and
  * emitting it (not the full outer result) is what keeps the output
  * proportional to the churn, not the corpus.
  *
  * Scale shape: each side is projected to `(keys, digest)` BEFORE the
  * join, so the full-outer shuffle carries ~12 bytes of payload per
  * row instead of the corpus width — on a 100 TB snapshot pair the
  * exchange is a few hundred GB, not 200 TB. The digest is a 96-bit
  * combine (xxhash64 ‖ murmur3-32) over the compared columns
  * interleaved with their null flags:
  *   - two independent hash families → a false "unchanged" needs a
  *     simultaneous 96-bit collision (~n²/2⁹⁷ — negligible at any n
  *     this library targets);
  *   - the interleaved `isnull` flags close Spark's null-skip
  *     ambiguity: both hash functions fold NULL as a no-op, so
  *     ("x", NULL) and (NULL, "x") would otherwise digest identically
  *     across BOTH families and a column-swap row would pass as
  *     unchanged.
  * AQE handles residual key skew; there is no sort, no window, no
  * driver materialization.
  */
object Diff {

  val Added = "added"
  val Removed = "removed"
  val Changed = "changed"

  /** 96-bit row digest over `cols` (values interleaved with null
    * flags), split across two columns `__d1`/`__d2`. With no compared
    * columns (keys-only tables, or fully drifted schemas) `changed` is
    * impossible by definition, so the digest degrades to constants —
    * `xxhash64()`/`hash()` with zero children would fail analysis. */
  private def digest(cols: Seq[String]): (Column, Column) =
    if (cols.isEmpty) (lit(0L), lit(0))
    else {
      val parts = cols.flatMap(c => Seq(col(c), isnull(col(c))))
      (xxhash64(parts: _*), hash(parts: _*))
    }

  /** Diff `newSnap` against `oldSnap` on `keys`: one row per key whose
    * presence or compared-column content differs, `(keys*, change)`,
    * where `change` ∈ `added` (key only in new) / `removed` (only in
    * old) / `changed` (both, differing content). `compareCols`
    * defaults to every non-key column present in BOTH schemas — a
    * column only one side carries cannot be compared and does not
    * count as a change (schema drift is [[graft.schema.Normalize]]'s
    * job, not the diff's).
    */
  /** [[snapshotDiff]] with PAYLOADS — the full-row change set a
    * downstream consumer applies (Delta CDF's row shape): `added` /
    * `changed` rows carry the NEW side's columns (post-image),
    * `removed` rows the OLD side's (pre-image), plus the `change` tag.
    * Column set = `newSnap`'s columns (the newer schema governs, as a
    * CDC reader expects); a removed row's pre-image is read under that
    * same shape. Unlike the keys-only diff, the full-outer shuffle
    * here carries row payloads on both sides — callers wanting the
    * cheap audit use [[snapshotDiff]]; this form exists for consumers
    * that APPLY the changes. */
  def changeRows(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String], compareCols: Seq[String] = Seq.empty): DataFrame = {
    require(!newSnap.columns.contains("change") &&
        !oldSnap.columns.contains("change"),
      "`change` is the change feed's tag column; rename the input column")
    val payload = newSnap.columns.filterNot(keys.contains).toSeq
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else payload.filter(oldSnap.columns.contains)
    val (d1, d2) = digest(cmp)
    // The pre-image rides newSnap's column set: columns the old side
    // lacks (schema evolution) null-fill via alignToSchema.
    val oldAligned = graft.schema.Normalize.alignToSchema(
      oldSnap, newSnap.schema)
    val o = oldAligned.select(keys.map(col) :+
      struct(payload.map(col): _*).as("__orow") :+
      d1.as("__od1") :+ d2.as("__od2"): _*)
    val n = newSnap.select(keys.map(col) :+
      struct(payload.map(col): _*).as("__nrow") :+
      d1.as("__nd1") :+ d2.as("__nd2"): _*)
    val tagged = o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__od1").isNull && col("__od2").isNull, lit(Added))
          .when(col("__nd1").isNull && col("__nd2").isNull, lit(Removed))
          .when(col("__od1") =!= col("__nd1") ||
            col("__od2") =!= col("__nd2"), lit(Changed)))
      .where(col("change").isNotNull)
      .withColumn("__row",
        when(col("change") === Removed, col("__orow"))
          .otherwise(col("__nrow")))
    tagged.select(keys.map(col) ++
      payload.map(c => col("__row").getField(c).as(c)) :+
      col("change"): _*)
  }

  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String], compareCols: Seq[String] = Seq.empty): DataFrame = {
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else oldSnap.columns.filterNot(keys.contains)
        .filter(newSnap.columns.contains).toSeq
    val (d1, d2) = digest(cmp)
    val o = oldSnap.select(keys.map(col) :+ d1.as("__od1") :+ d2.as("__od2"): _*)
    val n = newSnap.select(keys.map(col) :+ d1.as("__nd1") :+ d2.as("__nd2"): _*)
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__od1").isNull && col("__od2").isNull, lit(Added))
          .when(col("__nd1").isNull && col("__nd2").isNull, lit(Removed))
          .when(col("__od1") =!= col("__nd1") ||
            col("__od2") =!= col("__nd2"), lit(Changed)))
      .where(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }
}
