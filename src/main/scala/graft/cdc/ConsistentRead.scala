package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-table consistent-as-of read — the join-consistency primitive
  * the reference's marts silently lack: users/plans/transactions are
  * extracted on INDEPENDENT cadences (reference
  * `all_schedules.py:12-52` — transactions hourly, users/plans daily)
  * and `int_users_with_plans.sql`-style marts then join
  * different-age snapshots, so a transaction can reference a plan
  * change its user row hasn't loaded yet. The fix is to pin every
  * table of a join to the MAX COMMON WATERMARK — the newest instant
  * ALL tables have fully loaded — before joining (VERDICT r16 ask
  * #5).
  *
  * Two surfaces:
  *
  *  - [[pin]]: fully declarative — each table's watermark is a 1-row
  *    `max(track)` aggregate, the common watermark their broadcast
  *    `least`, and each table filters `track <= common`. No driver
  *    collect, engine-restatable in plain SQL (the
  *    `q_cdc_consistent_read` oracle restates min-of-maxes + filters
  *    + join verbatim). At 100 TB the max(track) scans are
  *    column-pruned single-agg passes; a deployment that already
  *    tracks watermarks (C7: the destination IS the checkpoint)
  *    skips them via [[pinTo]].
  *  - [[asOfVersion]]: snapshot-level time travel over a
  *    [[TableStore]] — the newest version whose own watermark
  *    (`max(track)` of that version) is ≤ the requested instant, so
  *    a mart can join the LAST MUTUALLY CONSISTENT snapshots rather
  *    than filtered currents. Walks versions newest-first, one
  *    column-pruned aggregate per probed version; a deployment
  *    records the watermark at write time and makes this a metadata
  *    lookup — the selection rule, not the probe cost, is the
  *    contract (ConsistentReadSpec pins it).
  */
object ConsistentRead {

  /** Pin every `(table, trackCol)` to their max common watermark:
    * returns the same tables filtered to `track <= least(max(track_1),
    * ..., max(track_n))`, plus nothing else — column sets unchanged.
    * NULL tracks never pass the pin (consistent with watermark
    * semantics: an unstamped row has no load instant to trust), and a
    * table whose watermark is NULL — empty, or no stamped row yet
    * (exactly the mid-initial-load state the pin guards) — makes the
    * COMMON watermark NULL, so every table pins to nothing rather
    * than silently waiving the not-yet-loaded table's constraint. */
  def pin(tables: Seq[(DataFrame, String)]): Seq[DataFrame] = {
    val common = commonWatermarkFrame(tables)
    tables.map { case (df, track) =>
      df.crossJoin(broadcast(common))
        .where(col(track) <= col("__wm"))
        .drop("__wm")
    }
  }

  /** The 1-row `(__wm)` frame holding the max common watermark —
    * broadcastable into any consumer ([[pin]]'s building block,
    * exposed for callers composing their own predicate). NULL when
    * ANY table's own watermark is NULL: SQL `least` skips NULLs, which
    * here would drop that table's constraint entirely — the opposite
    * of "the newest instant ALL tables have fully loaded" — so the
    * NULL is propagated instead (no instant is known-safe yet). */
  def commonWatermarkFrame(tables: Seq[(DataFrame, String)]): DataFrame = {
    require(tables.nonEmpty, "need at least one (table, track) pair")
    tables.foreach { case (df, _) =>
      require(!df.columns.contains("__wm"),
        "__wm is the pin's reserved watermark column; rename it")
    }
    val wms = tables.zipWithIndex.map { case ((df, track), i) =>
      df.agg(max(col(track)).as(s"__wm$i"))
    }
    val joined = wms.reduce(_.crossJoin(_))
    val cols = tables.indices.map(i => col(s"__wm$i"))
    val leastAll = if (cols.size == 1) cols.head else least(cols: _*)
    joined.select(
      when(cols.map(_.isNull).reduce(_ || _), lit(null))
        .otherwise(leastAll).as("__wm"))
  }

  /** [[pin]] with a KNOWN watermark (no scans): `track <= wm`. */
  def pinTo(tables: Seq[(DataFrame, String)], wm: Any): Seq[DataFrame] =
    tables.map { case (df, track) => df.where(col(track) <= lit(wm)) }

  /** Newest store version whose own watermark (`max(track)` over that
    * version) is ≤ `wm`; None when the store is empty or every
    * version is ahead of `wm`. A NULL version watermark (version with
    * no non-null track) counts as ≤ every instant — an empty/unstamped
    * snapshot is trivially consistent. */
  def asOfVersion(spark: SparkSession, store: TableStore, track: String,
      wm: Any): Option[(Int, DataFrame)] =
    store.versions().reverse.iterator.flatMap { v =>
      store.readVersion(v).flatMap { df =>
        val vwm = df.agg(max(col(track))).head().get(0)
        if (vwm == null || lteq(spark, vwm, wm)) Some(v -> df) else None
      }
    }.nextOption()

  /** [[asOfVersion]] over a [[CowStore]] — the same newest-first walk
    * across COMMITTED versions (manifest-resolved, tombstones applied,
    * each probed with one column-pruned `max(track)` aggregate), so
    * marts built on the COW write path join the last mutually
    * consistent snapshots too. Versions without a manifest (aborted
    * claims) are skipped, and so is any version that is no longer
    * INTACT ([[CowStore.versionIntact]]): vacuum can keep an old dir
    * alive purely as a file-holder for a retained manifest while
    * deleting dirs the OLD manifest references — reading such a
    * version silently returns a partial snapshot whose `max(track)`
    * probe can pass on the surviving subset (ADVICE r19). The walk
    * therefore only ever pins versions inside the vacuum retention
    * window (`retainLast` governs how far back as-of reads reach).
    *
    * Probe cost (VERDICT r19 ask #4): a store constructed with
    * `statsCols` containing `track` publishes per-bucket maxes in each
    * commit's `_STATS` ([[CowStore.versionTrackMaxes]]), so the probe
    * of a covered version is PURE METADATA — one tiny file read and a
    * driver-local fold, zero data files opened, and the walk is
    * O(versions) regardless of table size. Versions the stats don't
    * fully cover (pre-`_STATS` commits, buckets under a live MoR
    * register) fall back to the column-pruned `max(track)` read —
    * [[asOfVersion]]'s original cost; a compact heals them. */
  def asOfCowVersion(spark: SparkSession, store: CowStore, track: String,
      wm: Any): Option[(Int, DataFrame)] = {
    // ONE listing of the store root for the whole walk: versionIntact
    // per probed version then folds over this snapshot instead of
    // paying O(refs) fs.exists probes per version (VERDICT r20 ask #5
    // — at a 1000-version retention window the exists probes alone
    // were tens of seconds of FS round-trips for a metadata question).
    val existing = store.versions()
    val dirSnapshot = existing.toSet
    existing.reverse.iterator
      .filter(v => store.versionIntact(v, dirSnapshot))
      .flatMap { v =>
        store.versionTrackMaxes(v, track) match {
          case Some(maxes) =>
            // metadata probe: fold the per-bucket maxes under the
            // version's own track type (string order is not value
            // order; TIMESTAMPs decode from epoch micros —
            // CowStore.encodeTrackMax — so a reader session's timezone
            // can never shift the watermark); no non-null max =
            // trivially consistent. The fold is DRIVER-side typed
            // compares for the types whose encoded form compares
            // exactly in the JVM (VERDICT r20 ask #5: the previous
            // spark.range(1) probe paid ~20 ms of scheduler latency
            // per covered version for a microsecond compare); types
            // without a provably order-preserving JVM compare fall
            // back to the engine expression — same answer, one job.
            val eligible = maxes.isEmpty || {
              val dt = store.schemaOf(v).map(_(track).dataType)
              driverFoldLteq(maxes, dt, wm).getOrElse {
                val cast = dt
                  .fold((s: String) => lit(s))(t =>
                    (s: String) => CowStore.decodeTrackMax(s, t))
                val folded =
                  if (maxes.size == 1) cast(maxes.head)
                  else greatest(maxes.map(cast): _*)
                spark.range(1)
                  .select(coalesce(folded <= lit(wm), lit(false)))
                  .head().getBoolean(0)
              }
            }
            if (eligible) store.readVersion(v).map(v -> _) else None
          case None =>
            store.readVersion(v).flatMap { df =>
              val vwm = df.agg(max(col(track))).head().get(0)
              if (vwm == null || lteq(spark, vwm, wm)) Some(v -> df)
              else None
            }
        }
      }.nextOption()
  }

  /** Driver-side `∀ max: decode(max) <= wm` over `_STATS` strings, for
    * the (track type, wm type) pairs where the encoded form compares
    * exactly in the JVM; None = not provably safe, caller uses the
    * engine. Safe cases, each pinned by ConsistentReadSpec:
    *  - TIMESTAMP: encoded as epoch micros ([[CowStore.encodeTrackMax]]
    *    — zone-proof by construction); wm converts through Catalyst's
    *    own external→internal mapping (`Literal`, the same conversion
    *    `lit(wm)` applies), so both sides are Long micros.
    *  - integral vs integral wm: SQL compares as long, exactly; DOUBLE
    *    vs double wm: toString round-trips the exact double, and the
    *    NaN-is-greatest divergence is excluded (NaN wm falls back, a
    *    NaN max is never <= a non-NaN wm on either side). Mixed
    *    numeric families (float/decimal, double vs long, …) keep the
    *    engine's coercion — their promotion is lossy in ways a naive
    *    exact compare would silently "fix".
    *  - DATE: compared as EPOCH DAYS — `cast(date as string)` is
    *    zero-padded ISO only within years 0–9999 (Spark renders year
    *    10000+ as "+10000-…", which sorts BEFORE 4-digit years, and
    *    negative years reverse byte order — ADVICE r21), so both
    *    sides parse to days and compare numerically; an unparseable
    *    stored form falls back to the engine.
    *  - STRING: compared as UTF-8 bytes, Spark's own binary collation
    *    (JVM String '<=' is UTF-16 code-unit order, which DIVERGES on
    *    supplementary characters — so it is not used). */
  private[graft] def driverFoldLteq(maxes: Seq[String],
      dt: Option[org.apache.spark.sql.types.DataType], wm: Any)
      : Option[Boolean] = {
    import org.apache.spark.sql.types._
    def all(f: String => Boolean): Option[Boolean] =
      try Some(maxes.forall(f))
      catch { case scala.util.control.NonFatal(_) => None }
    dt match {
      case Some(TimestampType) =>
        val wmLit = org.apache.spark.sql.catalyst.expressions.Literal(wm)
        if (wmLit.dataType == TimestampType && wmLit.value != null) {
          val w = wmLit.value.asInstanceOf[Long]
          all(s => s.toLong <= w)
        } else None
      case Some(ByteType | ShortType | IntegerType | LongType) =>
        // integral vs integral: SQL compares as long, exactly
        wm match {
          case w @ (_: java.lang.Byte | _: java.lang.Short |
              _: java.lang.Integer | _: java.lang.Long) =>
            val wv = w.asInstanceOf[java.lang.Number].longValue
            all(s => s.toLong <= wv)
          case _ => None // mixed-family coercion: engine decides
        }
      case Some(DoubleType) =>
        // double max round-trips its own toString exactly; SQL's
        // NaN-is-greatest only diverges from the primitive compare
        // when wm itself is NaN — excluded below
        wm match {
          case w: java.lang.Double if !w.isNaN =>
            all { s =>
              val x = java.lang.Double.parseDouble(s)
              !x.isNaN && x <= w
            }
          case _ => None
        }
      case Some(DateType) =>
        // Compare as EPOCH DAYS, not lexicographically (ADVICE r21):
        // Spark renders years > 9999 as "+10000-…" (sorts before any
        // 4-digit year) and negative years reverse byte order, so a
        // string compare is only exact on plain \d{4}-\d{2}-\d{2}
        // forms. ISO_LOCAL_DATE parses Spark's +/- extended forms;
        // an unparseable max THROWS, which `all` converts to None —
        // the engine fallback, never a wrong verdict.
        val w = wm match {
          case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
          case d: java.time.LocalDate => Some(d.toEpochDay)
          case _ => None
        }
        w.flatMap(wd => all(s => java.time.LocalDate.parse(
          s, java.time.format.DateTimeFormatter.ISO_LOCAL_DATE)
          .toEpochDay <= wd))
      case Some(StringType) =>
        wm match {
          case ws: String => all(s => utf8Lteq(s, ws))
          case _ => None
        }
      case _ => None
    }
  }

  /** `a <= b` under Spark's binary (UTF-8 byte) string order. */
  private def utf8Lteq(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length <= y.length
  }

  /** Engine-evaluated `a <= b` so timestamp/date/numeric watermarks
    * all compare by SQL semantics, not JVM ones. */
  private def lteq(spark: SparkSession, a: Any, b: Any): Boolean =
    spark.range(1).select(lit(a) <= lit(b)).head().getBoolean(0)
}
