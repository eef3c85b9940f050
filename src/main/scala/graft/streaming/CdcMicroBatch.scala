package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.{AppendStore, TableStore, Upsert}
import graft.quality.Check

/** Maintenance cadence for a COW streaming drain (VERDICT r18
  * "what's missing" #4): without it, a long-lived drain grows version
  * dirs O(batches) until a human runs `compact()` by hand — the same
  * hole [[graft.cdc.AppendStore.maybeCompact]] closes for segment
  * stores. Every `compactEvery` batches the drain compacts the store
  * to `maxReferenced` version dirs (optionally restoring `clusterBy`
  * scan order) and vacuums to `retainLast` versions. `retainLast`
  * defaults to 2 so a crash BETWEEN maintenance and the cursor-marker
  * write still finds its feed window readable on restart (a tighter
  * reclaim only costs the rebuild fallback, never correctness). */
final case class CowMaintenance(compactEvery: Int, maxReferenced: Int = 2,
    clusterBy: Seq[String] = Nil, retainLast: Int = 2) {
  require(compactEvery > 0, "compactEvery must be positive")
}

/** §2.10 — the reference's pull-based micro-batch CDC restated as
  * Structured Streaming.
  *
  * The reference polls on cron (all_schedules.py:12-52) and merges each
  * batch with delete+insert (C1). Spark-first: `readStream` over the
  * landing directory, `foreachBatch` running the same [[Upsert]] kernel
  * into a [[TableStore]], `Trigger.AvailableNow` for the cron-style
  * "drain what's there and stop" run (or ProcessingTime for continuous).
  * Exactly-once: checkpoint tracks consumed files; the upsert kernel is
  * idempotent per batch (delete+insert), so replays converge — the same
  * guarantee the reference gets from its delete+insert (SURVEY §2.10).
  */
object CdcMicroBatch {

  /** Drain all available input once (cron-run analog), upserting each
    * micro-batch into the store. Blocks until done. */
  def runAvailableNow(spark: SparkSession, sourceDir: String,
      schema: StructType, store: TableStore, keys: Seq[String],
      checkpoint: String): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dest = store.read().getOrElse(batch.limit(0))
        store.write(Upsert(dest, batch, keys))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Gated drain: each micro-batch routes through [[Check.route]] —
    * clean rows run the normal upsert, violating rows land with their
    * `__violations` labels as that batch's segment of a quarantine
    * [[AppendStore]] (repair-and-reingest material, never silently
    * dropped, never poisoning the destination). Exactly-once holds for
    * both sides: the upsert is idempotent per batch and the quarantine
    * segment is an idempotent overwrite keyed by batchId. */
  def runAvailableNowGated(spark: SparkSession, sourceDir: String,
      schema: StructType, store: TableStore, keys: Seq[String],
      checkpoint: String, rules: Seq[Check.Rule],
      quarantine: AppendStore): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (clean, dirty) = Check.route(batch, rules)
        val dest = store.read().getOrElse(clean.limit(0))
        store.write(Upsert(dest, clean, keys))
        quarantine.write(dirty, batchId)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Tumbling event-time counts with watermarking — works identically
    * over a stream (append mode after watermark) and a batch frame
    * (used by q_stream_tumbling_count's oracle parity). */
  def tumblingCounts(events: DataFrame, tsCol: String = "ts",
      width: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    src.groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value"))
  }

  /** [[runAvailableNow]] against a bucket-pruned COW table
    * ([[graft.cdc.CowStore]]) — the complete 100 TB CDC write path:
    * where the [[TableStore]] variant above rewrites the WHOLE
    * destination per micro-batch (O(dest) writes at the reference's
    * hourly cadence), this one rewrites only the buckets containing
    * each batch's keys; untouched buckets are inherited by manifest
    * reference. Exactly-once holds unchanged: the checkpoint tracks
    * consumed files and the bucket-local delete+insert (optionally
    * keep-latest via `dedup`) is idempotent per batch, so a replayed
    * batch re-merges to the identical bucket contents.
    *
    * `mor = true` commits each batch MERGE-ON-READ
    * ([[graft.cdc.CowStore.upsert]]'s delta-insert contract — VERDICT
    * r19 ask #2: the batch API bounds update write-amplification
    * ~3,600× at f100 but every drain still paid the COW rewrite), so
    * an update-heavy stream writes bytes ∝ batch, never ∝ the buckets
    * it lands in. Replay is RESULT-idempotent, not layout-idempotent:
    * a replayed delta commit stacks a second register entry whose
    * winner-by-version read resolves to the identical rows (the rows
    * tie only against their own earlier copy; spec-pinned), and the
    * debt caps + `maintenance` folds bound the stack exactly as in
    * batch use. Pass `maintenance` when streaming MoR — the
    * [[CowMaintenance]] cadence is the natural fold point (compact
    * folds ALL registered debt by contract). `dedup` requires the COW
    * merge and therefore excludes `mor`. */
  def runAvailableNowCow(spark: SparkSession, sourceDir: String,
      schema: StructType, store: graft.cdc.CowStore,
      checkpoint: String,
      dedup: Option[(String, Seq[String])] = None,
      mor: Boolean = false,
      maintenance: Option[CowMaintenance] = None): Unit = {
    require(!mor || dedup.isEmpty,
      "keep-latest dedup requires the COW merge (CowStore.upsert's " +
        "contract) — drop dedup or mor")
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.upsert(batch, dedup, mor = mor)
        maintainAux(store, batchId, maintenance)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** The persisted feed cursor of a drain — a marker file beside the
    * checkpoint, written AFTER each batch's downstream patch commits
    * (tmp + rename, the [[graft.cdc.CowStore]] pointer discipline).
    * ADVICE r18: a cursor that only rode the driver closure and
    * re-initialized to the store's CURRENT head on restart silently
    * skipped any batch a crash landed between `store.upsert` and the
    * downstream refresh (the replay produced a content-identical
    * version, the head-initialized cursor diffed it empty, and the
    * mart stayed stale) — and likewise skipped foreign writers that
    * advanced the store between runs. With the marker, a restart
    * refreshes from the last version actually APPLIED downstream; an
    * absent marker (fresh checkpoint, pre-marker run) conservatively
    * rebuilds on the first batch. */
  private def readMarker(spark: SparkSession, checkpoint: String,
      name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        if (s.isEmpty) None else Some(s)
      } finally in.close()
    }
  }

  private def writeMarker(spark: SparkSession, checkpoint: String,
      name: String, value: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(checkpoint, s"$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"cursor write failed: $p")
  }

  private def readCursor(spark: SparkSession, checkpoint: String,
      name: String): Option[Int] =
    readMarker(spark, checkpoint, name).map(_.toInt)

  private def writeCursor(spark: SparkSession, checkpoint: String,
      name: String, v: Int): Unit =
    writeMarker(spark, checkpoint, name, v.toString)

  /** Run the maintenance policy, then RE-POINT the cursor past the
    * maintenance versions: compact/vacuum are result-invisible, so the
    * next feed window may start at the maintained head — without the
    * re-point every later drain pays a scan of the compacted buckets
    * (they diff empty, but the read is real: the Delta
    * drain-before-OPTIMIZE advice, automated). Returns the cursor. */
  private def maintain(store: graft.cdc.CowStore, batchId: Long,
      m: Option[CowMaintenance], cursor: Int): Int =
    m match {
      case Some(mm) if batchId > 0 && batchId % mm.compactEvery == 0 =>
        store.compact(mm.maxReferenced, mm.clusterBy)
        store.vacuum(mm.retainLast)
        store.version.getOrElse(cursor)
      case _ => cursor
    }

  /** [[maintain]] for a store the drain keeps NO feed cursor into (a
    * mart / history destination, or the source of a cursor-less
    * drain): same compact+vacuum cadence, no re-point (VERDICT r19
    * ask #3 — the mart drains maintained only the SOURCE, so a
    * long-lived drain grew the mart's dirs O(batches) of applyCdc
    * patches, the exact hole [[CowMaintenance]] closes). A
    * destination with downstream CDF consumers of its own should
    * instead be maintained by ITS drain, which can re-point. */
  private def maintainAux(store: graft.cdc.CowStore, batchId: Long,
      m: Option[CowMaintenance]): Unit =
    m.foreach { mm =>
      if (batchId > 0 && batchId % mm.compactEvery == 0 && store.exists) {
        // clusterBy names SOURCE columns; a mart/history/index store's
        // schema may not carry them (a transform that renames, an
        // index's (fk, key) projection) — cluster by the subset that
        // exists rather than crash the drain on an unresolved column
        val cb = store.currentSchema
          .map(s => mm.clusterBy.filter(s.fieldNames.contains))
          .getOrElse(Nil)
        store.compact(mm.maxReferenced, cb)
        store.vacuum(mm.retainLast)
      }
    }

  /** End-to-end streaming CDC: drain micro-batches into the COW
    * source AND patch a downstream row-wise mart from the change feed
    * after each committed batch — the reference's extract-then-marts
    * cadence (`all_schedules.py:40-52`, marts cron'd 5 minutes after
    * extracts) collapsed into one converging stream, with the mart
    * work ∝ churn instead of a rebuild per run. The feed cursor is
    * PERSISTED beside the checkpoint after each applied patch (see
    * [[readCursor]] — crash/restart and foreign-writer safe); on a
    * checkpoint replay the re-upsert is idempotent and the re-drained
    * window diffs empty, so the patch converges. A mart that does not
    * exist yet — or an unknown cursor — is (re)built from the drained
    * snapshot. `maintenance` compacts+vacuums BOTH stores on its
    * cadence — the source with a cursor re-point past the
    * result-invisible maintenance versions, the mart plainly (it
    * keeps no cursor into the mart; VERDICT r19 ask #3 closed the
    * source/mart asymmetry). `mor = true` delta-commits each batch
    * into the source instead of the COW rewrite (see
    * [[runAvailableNowCow]] — result-idempotent under replay, debt
    * folded by the caps and the maintenance cadence); the change feed
    * sees register diffs as changed buckets, so the mart patch is
    * unaffected. */
  def runAvailableNowCowMart(spark: SparkSession, sourceDir: String,
      schema: StructType, store: graft.cdc.CowStore,
      mart: graft.cdc.CowStore, transform: DataFrame => DataFrame,
      keys: Seq[String], checkpoint: String,
      maintenance: Option[CowMaintenance] = None,
      mor: Boolean = false): Unit = {
    val CursorFile = "graft_mart_cursor"
    var cursor = readCursor(spark, checkpoint, CursorFile).getOrElse(0)
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.upsert(batch, mor = mor)
        // upsert early-returns on an EMPTY batch, so a zero-row landing
        // file against a never-written store leaves store.version None
        // — skip the drain step rather than NPE in rebuild().get
        // (ADVICE r19). Once the store exists, build().get is total.
        if (store.exists) {
          // a refresh whose cursor fell out of retention (None)
          // rebuilds — the IncrementalMart contract.
          def rebuild(): Int =
            graft.cdc.IncrementalMart.build(store, transform, mart).get
          cursor =
            if (!mart.exists || cursor == 0) rebuild()
            else graft.cdc.IncrementalMart.refresh(store, cursor,
              transform, mart, keys).getOrElse(rebuild())
          cursor = maintain(store, batchId, maintenance, cursor)
          maintainAux(mart, batchId, maintenance)
          writeCursor(spark, checkpoint, CursorFile, cursor)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** [[runAvailableNowCowMart]] with REGISTERED DIMS — the drain for
    * the reference's real mart shape (fact broadcast-enriched against
    * an SCD2 dim that CHANGES, `dim_users.sql`): each batch patches
    * the mart for the source churn AND, via
    * [[graft.cdc.IncrementalMart.refreshWithDims]], for the fact rows
    * any advanced dim's change feed touches — a dim update between
    * drains re-enriches exactly the affected rows instead of leaving
    * them stale (or forcing a rebuild). The persisted marker carries
    * the COMPOSITE cursor (`sourceV|dimV,dimV,…`, positions = the
    * stable `dims` order); unknown/mismatched markers conservatively
    * rebuild. Everything else (idempotent replay, maintenance cadence
    * with cursor re-point, retention fallback) is the plain drain's
    * contract.
    *
    * `indexes`: [[graft.cdc.FkIndex]]es backing any of the registered
    * dims' affectedKeys mappings. The drain maintains them from the
    * SAME fact feed it drains — each batch refreshes every index over
    * the window since its own persisted cursor (marker
    * `graft_fkidx_cursor_<i>`, same tmp+rename discipline), BEFORE the
    * mart refresh consumes affectedKeys, and rebuilds on an unknown
    * cursor or a window lost to retention (the IncrementalMart
    * contract). Index stores join the maintenance cadence too — their
    * dirs otherwise grow O(batches) like any churned CowStore. Without
    * this, an index-backed dim in a streaming drain silently went
    * stale unless the caller hand-rolled the refresh loop. */
  def runAvailableNowCowMartDims(spark: SparkSession, sourceDir: String,
      schema: StructType, store: graft.cdc.CowStore,
      mart: graft.cdc.CowStore, transform: DataFrame => DataFrame,
      keys: Seq[String], checkpoint: String,
      dims: Seq[graft.cdc.IncrementalMart.Dim],
      maintenance: Option[CowMaintenance] = None,
      mor: Boolean = false,
      indexes: Seq[graft.cdc.FkIndex] = Nil): Unit = {
    import graft.cdc.IncrementalMart
    val CursorFile = "graft_mart_cursor_dims"
    def idxCursorFile(i: Int) = s"graft_fkidx_cursor_$i"
    // Index cursors are positional, so each marker carries the index's
    // FINGERPRINT beside the version (`v|fp`): a re-registration
    // (swap, reorder, add) against an existing checkpoint must not
    // apply position i's stale cursor to a DIFFERENT index — the
    // refresh would silently window-load a never-built store (VERDICT
    // r20 #2; the mart cursor's `parse` already guards its own
    // registration drift). Mismatched or legacy bare markers read as
    // None → the drain rebuilds that index from scratch.
    def readIdxCursor(i: Int, idx: graft.cdc.FkIndex): Option[Int] =
      readMarker(spark, checkpoint, idxCursorFile(i)).flatMap { s =>
        val parts = s.split("\\|", -1)
        if (parts.length == 2 && parts(1) == idx.fingerprint)
          parts(0).toIntOption
        else None
      }
    def writeIdxCursor(i: Int, idx: graft.cdc.FkIndex, v: Int): Unit =
      writeMarker(spark, checkpoint, idxCursorFile(i),
        s"$v|${idx.fingerprint}")
    def parse(s: String): Option[IncrementalMart.Cursor] = {
      val parts = s.split("\\|", -1)
      val dimVs = if (parts.length < 2 || parts(1).isEmpty) Nil
        else parts(1).split(",").map(_.toInt).toSeq
      if (dimVs.length != dims.length) None // registration changed
      else Some(IncrementalMart.Cursor(parts(0).toInt, dimVs))
    }
    var cursor: Option[IncrementalMart.Cursor] =
      readMarker(spark, checkpoint, CursorFile).flatMap(parse)
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.upsert(batch, mor = mor)
        // empty batch + never-written store: no version to drain from
        // yet — skip rather than NPE in buildWithDims().get (ADVICE r19)
        if (store.exists) {
          // registered indexes drain the same fact window FIRST, so
          // the mart refresh's affectedKeys answers from current pairs
          indexes.zipWithIndex.foreach { case (idx, i) =>
            val idxCur = readIdxCursor(i, idx)
              .flatMap(c => idx.refresh(store, c))
              .orElse(idx.build(store))
            idxCur.foreach(c => writeIdxCursor(i, idx, c))
            maintainAux(idx.reverse, batchId, maintenance)
            maintainAux(idx.forward, batchId, maintenance)
          }
          def rebuild(): IncrementalMart.Cursor =
            IncrementalMart.buildWithDims(store, transform, mart, dims).get
          var cur = cursor match {
            case Some(c) if mart.exists =>
              IncrementalMart.refreshWithDims(store, c, transform, mart,
                keys, dims).getOrElse(rebuild())
            case _ => rebuild()
          }
          val repointed = maintain(store, batchId, maintenance, cur.sourceV)
          if (repointed != cur.sourceV)
            // result-invisible maintenance advanced the source: the
            // index cursors re-point with the mart cursor, or every
            // later index drain pays a scan of the compacted buckets
            // (they diff empty, but the read is real)
            indexes.zipWithIndex.foreach { case (idx, i) =>
              writeIdxCursor(i, idx, repointed) }
          cur = cur.copy(sourceV = repointed)
          cursor = Some(cur)
          maintainAux(mart, batchId, maintenance)
          writeMarker(spark, checkpoint, CursorFile,
            s"${cur.sourceV}|${cur.dimVs.mkString(",")}")
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Feed-driven STREAMING SCD2 (VERDICT r18 ask #6): drain I/U/D
    * micro-batches into the COW source and maintain a dbt-style SCD2
    * history table from the CHANGE FEED after each committed batch —
    * history maintenance ∝ churn end-to-end, completing the r18
    * pattern (mart ✓, profile ✓, SCD2 was batch-only). Where
    * [[Scd2Stream]] holds per-key state in the engine and re-stages
    * full snapshots upstream, this composition keeps ALL state in the
    * two tables: per batch,
    *  1. `store.applyCdc(batch, opCol)` — the source advances;
    *  2. `readChangeRows(cursor, current)` — the churn window;
    *  3. the history rows of exactly the changed keys are read back
    *     (bucket-pruned [[graft.cdc.CowStore.readForKeys]]), the batch
    *     [[graft.cdc.Scd2.applyChanges]] kernel runs on that slice
    *     (`invalidateHardDeletes = true`: D events close their open
    *     row), and the full per-key version sets are upserted back —
    *     keys outside the window are provably untouched (the kernel
    *     passes them through), so patching the slice IS the global
    *     snapshot;
    *  4. the cursor marker persists beside the checkpoint.
    * An unknown cursor or a window lost to vacuum falls back to a
    * FULL-STAGED resync: the kernel over (history, current source)
    * plus closing open keys the source no longer holds — convergent
    * from any crash point, at full-join cost (the feed path's price is
    * ∝ churn). `asOfFor(batchId)` supplies each batch's snapshot
    * timestamp (deterministic under replay — dbt's NOW() frozen per
    * batch); a replayed batch re-applies an idempotent window (diffs
    * empty) and converges. History keys are the SCD2 `keys` — each
    * upsert replaces a key's WHOLE version set, so the history store
    * must not enable dedup. */
  def runAvailableNowCowScd2(spark: SparkSession, sourceDir: String,
      schema: StructType, store: graft.cdc.CowStore,
      history: graft.cdc.CowStore, keys: Seq[String],
      checkCols: Seq[String], opCol: String, checkpoint: String,
      asOfFor: Long => java.sql.Timestamp,
      maintenance: Option[CowMaintenance] = None,
      morDeletes: Boolean = false): Unit = {
    import graft.cdc.Scd2
    val CursorFile = "graft_scd2_cursor"
    var cursor = readCursor(spark, checkpoint, CursorFile).getOrElse(0)
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val asOf = asOfFor(batchId)
        // morDeletes: the batch's D events commit as tombstones (bytes
        // ∝ erasure events, never ∝ the buckets they empty — the
        // erasure-stream shape; VERDICT r19 ask #2), folded on the
        // maintenance cadence; the register diff keeps the change feed
        // and therefore the history patch correct
        store.applyCdc(batch, opCol, morDeletes = morDeletes)
        // applyCdc early-returns on an empty batch: a zero-row landing
        // file against a never-written store leaves version None —
        // nothing to sync yet (ADVICE r19)
        if (store.exists) {
          val cur = store.version.get
          def resync(): Unit = {
            val src = store.read().get
            if (!history.exists) history.writeFull(Scd2.init(src, asOf))
            else {
              val snap = Scd2(history.read().get, src, keys, checkCols, asOf)
              // hard deletes: open keys the source no longer holds close
              // at asOf (the full-staged form can't see them in `staged`;
              // derive by anti-join — the cost that makes the feed path
              // the default)
              val gone = snap.where(col(Scd2.ValidTo).isNull)
                .select(keys.map(col): _*)
                .join(src.select(keys.map(col): _*), keys, "left_anti")
                .withColumn("__del", lit(true))
              val closed = snap.join(gone, keys, "left")
                .withColumn(Scd2.ValidTo,
                  when(col("__del") && col(Scd2.ValidTo).isNull, lit(asOf))
                    .otherwise(col(Scd2.ValidTo)))
                .drop("__del")
                .select(snap.columns.map(col).toSeq: _*)
              history.writeFull(closed)
            }
          }
          if (!history.exists || cursor == 0) resync()
          else store.readChangeRows(cursor, cur) match {
            case None => resync() // window fell out of retention
            case Some(ch) =>
              val chC = ch.localCheckpoint(true)
              val slice = history
                .readForKeys(chC.select(keys.map(col): _*).distinct())
                .getOrElse(history.read().get.limit(0))
              history.upsert(Scd2.applyChanges(slice, chC, keys,
                checkCols, asOf, invalidateHardDeletes = true))
          }
          cursor = cur
          cursor = maintain(store, batchId, maintenance, cursor)
          maintainAux(history, batchId, maintenance)
          writeCursor(spark, checkpoint, CursorFile, cursor)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Continuous variant: start a ProcessingTime-triggered upsert stream
    * (the reference's 15-min cadence analog); caller manages lifecycle. */
  def runContinuous(spark: SparkSession, sourceDir: String,
      schema: StructType, store: TableStore, keys: Seq[String],
      checkpoint: String, interval: String = "15 minutes"): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dest = store.read().getOrElse(batch.limit(0))
        store.write(Upsert(dest, batch, keys))
        ()
      }
      .start()
}
