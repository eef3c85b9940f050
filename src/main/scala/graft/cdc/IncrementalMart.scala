package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental mart maintenance over the change data feed — the step
  * that makes [[CowStore.readChangeRows]] load-bearing in the
  * pipeline DAG. The reference rebuilds its marts IN FULL five minutes
  * after every extract (`all_schedules.py:40-52`, dbt `delete+insert`
  * over the whole staging table); at 100 TB a full rebuild per hourly
  * batch re-reads the world to re-derive rows that didn't change.
  * When the mart is a ROW-WISE view of one source table, the change
  * feed is sufficient: apply the transform to just the changed rows
  * and patch the mart store.
  *
  * Contract on `transform` (the standard single-table incremental-view
  * conditions, stated rather than inferred):
  *  - row-wise: each output row derives from exactly one input row
  *    (filter / project / scalar derivation / broadcast-enrichment
  *    against dimensions that are CONSTANT over the refresh window —
  *    general multi-table IVM is out of scope and a dim-side change
  *    requires a rebuild or a dim-side feed);
  *  - key-preserving: the source key columns pass through unchanged
  *    (they identify the mart row to patch);
  *  - deterministic: same input row, same output row.
  * Filters ARE allowed to drop rows — a changed row the transform no
  * longer emits is DELETED from the mart (the subtle case a naive
  * upsert-only refresh silently corrupts).
  *
  * Mechanics of one [[refresh]] drain, all through the store's own
  * bucket-pruned DML (cost ∝ churn, never ∝ mart size):
  *  1. `source.readChangeRows(sinceV, current)` — post-images for
  *     added/changed, pre-images for removed;
  *  2. upserts = transform(post-images of added ∪ changed);
  *  3. deletes = EVERY changed key the transform did not re-emit
  *     (removed keys, plus filtered-out updates — computed with one
  *     anti-join, no second transform pass);
  *  4. one [[CowStore.applyCdc]] I/U/D batch against the mart.
  * Returns the new cursor (the source version this drain covered) —
  * the consumer persists it between runs; `None` when the source has
  * no committed version or `sinceV` was vacuumed away (the consumer
  * must then rebuild — same contract as a Delta CDF reader that fell
  * behind the retention window).
  *
  * Idempotent: re-draining the same window re-applies the same
  * delete+insert batch (applyCdc is idempotent over its batch), so a
  * crashed consumer that never saved its cursor converges on retry.
  */
object IncrementalMart {

  private val Op = "__op"

  /** Patch `mart` = transform(source) for the source changes since
    * version `sinceV`. See object doc for the transform contract and
    * the returned cursor. */
  def refresh(source: CowStore, sinceV: Int,
      transform: DataFrame => DataFrame, mart: CowStore,
      keys: Seq[String]): Option[Int] =
    source.version.flatMap { cur =>
      source.readChangeRows(sinceV, cur).map { ch =>
        val chC = ch.localCheckpoint(true) // two consumers below
        val post = chC.where(col("change") =!= Diff.Removed).drop("change")
        val upserts = transform(post)
        val missingKeys = keys.filterNot(upserts.columns.contains)
        require(missingKeys.isEmpty,
          s"transform must preserve key column(s) " +
            missingKeys.mkString(","))
        require(!upserts.columns.contains(Op),
          s"$Op is the refresh's reserved op column; the transform " +
            "must not emit it")
        // every changed key the transform did not re-emit is deleted:
        // removed keys AND updates the transform now filters out
        val dels = chC.select(keys.map(col): _*).distinct()
          .join(upserts.select(keys.map(col): _*), keys, "left_anti")
        val batch = upserts.withColumn(Op, lit("U")).unionByName(
          graft.schema.Normalize.alignToSchema(dels, upserts.schema)
            .withColumn(Op, lit("D")))
        mart.applyCdc(batch, Op)
        cur
      }
    }

  /** First build (or rebuild after falling behind vacuum): the mart is
    * transform(full source read), written as a full load; returns the
    * cursor to start [[refresh]]-ing from. */
  def build(source: CowStore, transform: DataFrame => DataFrame,
      mart: CowStore): Option[Int] =
    source.version.map { cur =>
      source.read().foreach(df => mart.writeFull(transform(df)))
      cur
    }
}
