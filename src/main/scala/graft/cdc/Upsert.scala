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
    if (incoming.isEmpty) dest
    else {
      val incKeys = incoming.select(keys.map(col): _*).distinct()
      dest.join(incKeys, keys, "left_anti")
        .unionByName(incoming.select(dest.columns.map(col).toSeq: _*))
    }
  }

  /** C2 — "special" upsert (base_loader.py:340-475): C1, then enforce
    * the ≤1-row-per-key invariant by keeping only the row with the
    * highest tracking value (and a caller-supplied total tie-break, as
    * ClickHouse's `MAX(track)` tuple-delete leaves ties undefined). */
  def withDedup(dest: DataFrame, incoming: DataFrame, keys: Seq[String],
      track: String, tieBreak: Seq[String] = Nil): DataFrame =
    DedupLatest(apply(dest, incoming, keys), keys, track, tieBreak)

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

/** J4/C2 — keep only the latest version per key: the idiomatic window
  * argmax (`row_number() OVER (PARTITION BY key ORDER BY track DESC)`)
  * replacing the reference's tuple-anti-join delete
  * (base_loader.py:427-436). Single shuffle on the key. */
object DedupLatest {
  def apply(df: DataFrame, keys: Seq[String], track: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (track +: tieBreak).map(col(_).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
