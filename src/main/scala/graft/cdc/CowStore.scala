package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A concurrent writer lost the commit race: the table advanced past
  * the snapshot this write merged against. RETRYABLE — re-running the
  * same upsert re-reads the new current version and re-merges (the
  * delete+insert kernel is idempotent over its batch). */
final class ConcurrentWriteException(msg: String)
  extends RuntimeException(msg)

object CowStore {
  /** `_STATS` value encoding, one place for both sides. TIMESTAMP
    * (instant) maxes are stored as EPOCH MICROS, never as
    * `CAST(ts AS STRING)`: the string form renders — and re-parses —
    * in the SESSION timezone, so a reader configured differently from
    * the writer would shift the watermark by the zone offset and the
    * metadata walk could pin a version whose true max exceeds the
    * requested instant (the exact inconsistency the walk exists to
    * prevent). TIMESTAMP_NTZ and DATE are wall-clock types whose
    * string forms are zone-free; numerics/strings round-trip as-is. */
  private[cdc] def encodeTrackMax(c: String,
      dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case org.apache.spark.sql.types.TimestampType =>
      unix_micros(max(col(c))).cast("string")
    case _ => max(col(c)).cast("string")
  }

  private[cdc] def decodeTrackMax(s: String,
      dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case org.apache.spark.sql.types.TimestampType =>
      timestamp_micros(lit(s.toLong))
    case _ => lit(s).cast(dt)
  }
}

/** Bucket-pruned copy-on-write table — the incremental-merge layout
  * that makes C1/C2 write volume scale with the BATCH instead of the
  * destination (VERDICT r16 ask #2: [[Upsert]] over a [[TableStore]]
  * snapshot swap rewrites the whole table per batch; at the
  * reference's hourly cadence, `all_schedules.py:40-52`, that is
  * O(100 TB) of writes per hour — the precise reason Delta/Iceberg
  * exist; this is the same manifest idea rebuilt on plain parquet).
  *
  * Layout — versions own only the buckets they rewrote; a manifest
  * maps every bucket to its owning version (Iceberg's manifest-file
  * idea at bucket granularity):
  *
  * {{{
  *   <root>/v_00000001/__bkt=0/part-*.parquet   // full load: all buckets
  *   <root>/v_00000002/_CLAIM                   // writer's exclusive stake
  *   <root>/v_00000002/__bkt=3/part-*.parquet   // upsert touching bucket 3
  *   <root>/v_00000002/_SCHEMA                  // authoritative schema JSON
  *   <root>/v_00000002/_MANIFEST                // "0 1", "1 1", ..., "3 2"
  *   <root>/v_00000003/dv/part-*.parquet        // MoR delete: key tombstones
  *   <root>/v_00000003/_DVS                     // "3 3" (bucket -> dv versions)
  *   <root>/_CURRENT                            // "v_00000003"
  * }}}
  *
  * A merge-on-read [[delete]] commits ONLY tombstones (`dv/` key rows,
  * bytes ∝ probe) plus a per-bucket register (`_DVS`); reads anti-join
  * them away until the next data write of the bucket folds them in
  * ([[delete]]'s scaladoc has the full contract).
  *
  * `_SCHEMA` is the schema-in-log: reads pass it explicitly, so files
  * written before an additive [[upsert evolution]] null-fill the
  * later columns with zero rewrites and zero per-file footer merges.
  *
  * `upsert(batch)`:
  *  1. the batch's AFFECTED bucket set (`pmod(hash(keys), nBuckets)`)
  *     is one distinct-collect of ≤ nBuckets ints — config-bounded
  *     driver state;
  *  2. ONLY the affected buckets' current files are read back (path
  *     pruning via the manifest — the scan never lists, opens, or
  *     shuffles the untouched 100 TB);
  *  3. the delete+insert merge ([[Upsert]] semantics: anti-join on
  *     keys, union the batch) runs on that affected slice — AQE
  *     broadcasts the batch side exactly as in the unbucketed kernel;
  *  4. only the affected buckets are rewritten under the new version;
  *     every other bucket is INHERITED by manifest reference — zero
  *     bytes copied, zero files touched (CowStoreSpec pins that the
  *     inherited entries resolve to the IDENTICAL file paths).
  *
  * Equivalence: buckets partition the key space, so rows of untouched
  * buckets can never share a key with the batch — merging only the
  * affected slice IS the global delete+insert (spec-pinned against
  * [[Upsert.apply]]; the declared key `q_cdc_upsert_bucketed` shares
  * `q_cdc_upsert`'s oracle verbatim).
  *
  * Schema drift follows the reference's tolerance
  * (`base_loader.py:290-299`): the batch is aligned to the STORED
  * schema — unknown incoming fields are skipped (S7), missing stored
  * columns are null-filled, compatible types cast — via
  * [[graft.schema.Normalize.alignToSchema]]. Only the KEY columns must
  * be present (an unkeyed CDC row has no merge identity to act on).
  *
  * Writer concurrency is OPTIMISTIC (the Delta/Iceberg commit
  * protocol, reduced to this layout):
  *  - every writer stakes an exclusive version number first — an
  *    atomic create-no-overwrite of `v_N/_CLAIM` (HDFS and local FS
  *    both refuse an existing path atomically; object-store
  *    deployments map this to a conditional put) — so two racing
  *    writers can never interleave data files in one version dir;
  *  - commit re-checks that `_CURRENT` still names the snapshot the
  *    merge was based on, then swaps the pointer. A writer that lost
  *    the race gets a retryable [[ConcurrentWriteException]] and its
  *    claimed dir becomes garbage that [[vacuum]] reclaims (a
  *    claim-only dir below the current version can never commit — its
  *    base predates the current version, so its own CAS must fail).
  *    The check-then-rename pair is not itself one atomic op: two
  *    losers are always detected, but a commit landing INSIDE the
  *    check-to-rename window of another commit can still last-write-
  *    win the pointer — the standard HDFS-rename approximation; a
  *    deployment needing the full guarantee swaps [[casPointer]] for
  *    a conditional put / lock service, one method.
  *
  * [[vacuum]] is reference-aware — a version dir survives as long as
  * the CURRENT manifest references any of its buckets, so inherited
  * data can never be deleted from under the live table. That rule
  * alone lets dir count grow O(batches) (every batch's dir stays
  * alive for the buckets only it owns) — [[compact]] is the
  * maintenance op that rewrites the fragmented tail into one version
  * so vacuum can retire it.
  *
  * Bucket membership must be stable across versions: it derives from
  * `hash(keys)` (Spark's Murmur3), deterministic for a given Spark
  * major line. A cross-version-upgrade deployment would pin its own
  * hash expression; the derivation is centralized in [[bucketOf]] so
  * that swap is one line (every consumer, [[readForKeys]] included,
  * goes through it).
  */
final class CowStore(spark: SparkSession, root: String,
    keys: Seq[String], nBuckets: Int,
    statsCols: Seq[String] = Nil) {
  require(keys.nonEmpty, "CowStore requires at least one key column")
  require(nBuckets > 0, "CowStore requires a positive bucket count")
  require(!keys.contains("__bkt"),
    "__bkt is the store's reserved partition column; rename the key")
  require(statsCols.forall(c => c != "__bkt" && !c.exists(_.isWhitespace)),
    "statsCols must be plain payload column names")

  private val rootPath = new Path(root)

  /** Stable store identity (the normalized root path) — consumed by
    * cursor-identity guards ([[FkIndex.fingerprint]]). */
  private[graft] def rootId: String = rootPath.toString
  private def fs =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def pointer = new Path(rootPath, "_CURRENT")
  private def versionDir(v: Int) = new Path(rootPath, f"v_$v%08d")
  private def manifestPath(v: Int) = new Path(versionDir(v), "_MANIFEST")
  private def claimPath(v: Int) = new Path(versionDir(v), "_CLAIM")
  private def schemaPath(v: Int) = new Path(versionDir(v), "_SCHEMA")
  // NOT underscore-prefixed: the tombstone dir is READ as parquet, and
  // Spark's hidden-path convention (leading _/.) makes every read of an
  // "_DV" root log "All paths were ignored" warnings. No data reader
  // can stumble into it — reads resolve explicit `__bkt=` dirs through
  // the manifest, never a version root.
  private def dvDir(v: Int) = new Path(versionDir(v), "dv")
  private def dvsPath(v: Int) = new Path(versionDir(v), "_DVS")
  private def dlDir(v: Int) = new Path(versionDir(v), "dl")
  private def dlsPath(v: Int) = new Path(versionDir(v), "_DLS")
  private def statsPath(v: Int) = new Path(versionDir(v), "_STATS")
  private def bucketDir(owner: Int, b: Int) =
    new Path(versionDir(owner), s"__bkt=$b")

  /** The ONE bucket derivation (scaladoc: centralizing it makes the
    * hash impl swappable without touching merge logic). Only the key
    * columns are referenced, so it resolves against any frame carrying
    * them — stored rows, incoming batches, key probes alike. */
  def bucketOf: Column =
    pmod(hash(keys.map(col): _*), lit(nBuckets))

  private def currentVersion: Option[Int] =
    if (!fs.exists(pointer))
      // crash-forward fallback (TableStore doctrine): the newest dir
      // with a manifest is the version an interrupted swap was
      // publishing — manifest is written last before the pointer.
      // Claim-only dirs (no manifest) are in-flight or aborted
      // writers, never a committed state.
      versions().reverse.find(v => fs.exists(manifestPath(v)))
    else {
      val in = fs.open(pointer)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        if (s.isEmpty) None else Some(s.stripPrefix("v_").toInt)
      } finally in.close()
    }

  def exists: Boolean = currentVersion.isDefined

  /** The committed current version number (None before the first
    * write) — the cursor an incremental consumer remembers between
    * [[readChangesSince]] drains. */
  def version: Option[Int] = currentVersion

  def versions(): Seq[Int] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v_")).map(_.stripPrefix("v_").toInt).sorted

  /** Whether version `v` is FULLY readable: it published a manifest and
    * every version dir it references — bucket owners and registered MoR
    * artifact versions — still exists. [[vacuum]] deletes whole VERSION
    * dirs, so a missing owner dir means `v`'s snapshot is partial
    * ([[readVersion]] would silently skip the vacuumed buckets: an
    * absent BUCKET dir is a legitimate empty bucket, an absent OWNER
    * dir never is). Old version dirs can survive vacuum as file-holders
    * for buckets a RETAINED manifest still references while their own
    * manifest's other references are gone — so any time-travel walk
    * ([[ConsistentRead.asOfCowVersion]]) must filter on this, not on
    * dir existence (ADVICE r19). */
  def versionIntact(v: Int): Boolean = versionIntact(v, versions().toSet)

  /** [[versionIntact]] against a pre-listed snapshot of the existing
    * version dirs — a multi-version walk
    * ([[ConsistentRead.asOfCowVersion]]) lists the root ONCE and
    * reuses the snapshot instead of paying O(refs) `fs.exists` probes
    * per version (the walk is read-only, so dirs cannot appear or
    * vanish under it; a concurrent vacuum already falls under the
    * retention contract). */
  private[cdc] def versionIntact(v: Int, existingDirs: Set[Int]): Boolean =
    fs.exists(manifestPath(v)) && {
      val refs = manifest(v).values.toSet ++
        dvsOf(v).values.flatten ++ dlsOf(v).values.flatten
      refs.forall(existingDirs.contains)
    }

  /** bucket -> owning version, for version `v`. */
  private[cdc] def manifest(v: Int): Map[Int, Int] = {
    val in = fs.open(manifestPath(v))
    val text = try scala.io.Source.fromInputStream(in).mkString
      finally in.close()
    text.split("\n").filter(_.nonEmpty).map { line =>
      val Array(b, owner) = line.split(" ")
      b.toInt -> owner.toInt
    }.toMap
  }

  /** Current manifest (empty if the table has never been written). */
  def currentManifest: Map[Int, Int] =
    currentVersion.map(manifest).getOrElse(Map.empty)

  /** bucket -> tombstone versions, for version `v` (the deletion-vector
    * register — see [[delete]]'s merge-on-read mode). A bucket's list
    * names the versions whose `dv/` key files must be ANTI-JOINED away
    * when reading that bucket at `v`. Empty for pre-DV versions and for
    * every bucket whose data was (re)written at or after its last
    * tombstone — a data rewrite always FOLDS pending tombstones in and
    * clears the register, so a listed tombstone is always newer than
    * its bucket's data and applying it can never drop a re-inserted
    * row. */
  private def registerOf(p: Path): Map[Int, Seq[Int]] =
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      text.split("\n").filter(_.nonEmpty).map { line =>
        val Array(b, vs) = line.split(" ", 2)
        b.toInt -> vs.split(",").filter(_.nonEmpty).map(_.toInt).toSeq
      }.toMap
    }

  private[graft] def dvsOf(v: Int): Map[Int, Seq[Int]] =
    registerOf(dvsPath(v))

  /** bucket -> DELTA-INSERT versions, for version `v` — the
    * merge-on-read UPSERT register (`_DLS`, see [[upsert]]'s `mor`
    * contract): each listed version's `dl/` parquet holds batch rows
    * that SUPERSEDE any older row of the same key in that bucket
    * (delete+insert semantics without the rewrite). The same
    * fold-on-any-data-write invariant as [[dvsOf]] holds, so a listed
    * delta is always newer than its bucket's base data. */
  private[graft] def dlsOf(v: Int): Map[Int, Seq[Int]] =
    registerOf(dlsPath(v))

  /** Buckets carrying unapplied tombstones at the current version —
    * exposed so maintenance policy can see MoR debt ([[compact]] folds
    * it). */
  def pendingDvBuckets: Seq[Int] =
    currentVersion.map(dvsOf(_).collect {
      case (b, vs) if vs.nonEmpty => b
    }.toSeq.sorted).getOrElse(Nil)

  /** Buckets carrying unapplied delta inserts at the current version. */
  def pendingDlBuckets: Seq[Int] =
    currentVersion.map(dlsOf(_).collect {
      case (b, vs) if vs.nonEmpty => b
    }.toSeq.sorted).getOrElse(Nil)

  /** Per-bucket track-column maxes for version `v` (`_STATS` — VERDICT
    * r19 ask #4): `bucket -> col -> max-as-string` (None = bucket has
    * no non-null value). Written at commit time for stores constructed
    * with `statsCols`; an ABSENT entry means unknown — the bucket was
    * inherited from a pre-`_STATS` version, or carries a live MoR
    * register (tombstones can lower the true max, deltas raise it, and
    * neither writes data the publisher could cheaply re-aggregate), so
    * consumers must fall back to reading. Values are
    * base64(UTF-8([[CowStore.encodeTrackMax]] string)) —
    * newline/whitespace-safe for any type, decoded under the version's
    * own schema to compare (TIMESTAMPs as epoch micros — zone-proof). */
  private def statsOf(v: Int): Map[Int, Map[String, Option[String]]] =
    if (!fs.exists(statsPath(v))) Map.empty
    else {
      val in = fs.open(statsPath(v))
      val text = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      text.split("\n").filter(_.nonEmpty).map { line =>
        val Array(b, c, value) = line.split(" ", 3)
        (b.toInt, c, value)
      }.groupBy(_._1).map { case (b, rows) =>
        b -> rows.map { case (_, c, value) =>
          c -> (if (value == "-") None
            else Some(new String(
              java.util.Base64.getDecoder.decode(value), "UTF-8")))
        }.toMap
      }
    }

  private def writeStats(v: Int,
      stats: Map[Int, Map[String, Option[String]]]): Unit =
    if (stats.nonEmpty) {
      val out = fs.create(statsPath(v), true)
      try out.write(stats.toSeq.sortBy(_._1).flatMap { case (b, cols) =>
        cols.toSeq.sortBy(_._1).map { case (c, value) =>
          val enc = value.fold("-")(s => java.util.Base64.getEncoder
            .encodeToString(s.getBytes("UTF-8")))
          s"$b $c $enc"
        }
      }.mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
    }

  /** The per-bucket maxes of `track` at version `v`, IF the published
    * stats fully cover that version's manifest: `Some(maxes)` — the
    * non-null per-bucket max strings (empty = the whole version holds
    * no non-null track value); `None` — no/incomplete stats (pre-stats
    * buckets or live MoR registers), so the caller must read the
    * version to learn its watermark ([[ConsistentRead.asOfCowVersion]]
    * consumes this: Some turns the probe into pure metadata — zero
    * data files opened). Decode with [[CowStore.decodeTrackMax]] under
    * [[schemaOf]]'s track type before comparing — string order is NOT
    * value order, and TIMESTAMP values travel as epoch micros (the
    * string form would shift with the session timezone). */
  def versionTrackMaxes(v: Int, track: String): Option[Seq[String]] =
    if (!fs.exists(manifestPath(v))) None
    else {
      val st = statsOf(v)
      val entries = manifest(v).keys.toSeq.sorted
        .map(b => st.get(b).flatMap(_.get(track)))
      if (entries.exists(_.isEmpty)) None
      else Some(entries.flatten.flatten)
    }

  /** The AUTHORITATIVE table schema as of version `v` (the Delta
    * schema-in-log idea): written at publish time, consulted at read
    * time so files older than a schema [[evolution|upsert]] null-fill
    * the columns added after them — no rewrite, no per-file footer
    * merge at 100 TB. None only for pre-`_SCHEMA` stores (readers then
    * fall back to parquet inference). */
  def schemaOf(v: Int): Option[org.apache.spark.sql.types.StructType] =
    if (!fs.exists(schemaPath(v))) None
    else {
      val in = fs.open(schemaPath(v))
      val text = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(text)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }

  /** Authoritative current schema (None before the first write or on
    * a pre-`_SCHEMA` store). */
  def currentSchema: Option[org.apache.spark.sql.types.StructType] =
    currentVersion.flatMap(schemaOf)

  /** Existing data dirs for `buckets` under the current manifest —
    * partitionBy never writes empty buckets, so absent dirs are
    * simply skipped. */
  private def bucketPaths(man: Map[Int, Int], buckets: Seq[Int])
      : Seq[String] =
    buckets.flatMap { b =>
      man.get(b).map(owner => bucketDir(owner, b))
        .filter(fs.exists).map(_.toString)
    }

  /** Schema-aware path read: with an authoritative schema the parquet
    * reader null-fills columns a file predates (additive evolution's
    * read side) and skips footer inference; without one (pre-`_SCHEMA`
    * store) it infers. */
  private def readPaths(paths: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Option[DataFrame] =
    if (paths.isEmpty) None
    else Some(schema.fold(spark.read)(s => spark.read.schema(s))
      .parquet(paths: _*))

  private def emptyFrame(s: org.apache.spark.sql.types.StructType)
      : DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), s)

  /** Per-version MoR artifact frames for `buckets` under register
    * `reg`: only versions a bucket's register STILL lists apply — a
    * bucket rewritten since (register cleared, artifacts folded) must
    * not have stale artifacts shadow its current rows, even though
    * the version's file also holds that bucket's old rows. */
  private def morArtifacts(dir: Int => Path, reg: Map[Int, Seq[Int]],
      buckets: Seq[Int],
      schema: Option[org.apache.spark.sql.types.StructType])
      : Seq[(Int, DataFrame)] =
    buckets.flatMap(b => reg.getOrElse(b, Nil)).distinct.sorted
      .flatMap { t =>
        val allowed = buckets.filter(b =>
          reg.getOrElse(b, Nil).contains(t))
        if (!fs.exists(dir(t))) None
        else {
          // explicit schema (+__bkt, which MoR files always carry) so
          // artifacts older than an evolution null-fill like base data
          val rdr = schema.fold(spark.read)(s => spark.read.schema(
            org.apache.spark.sql.types.StructType(s.fields :+
              org.apache.spark.sql.types.StructField("__bkt",
                org.apache.spark.sql.types.IntegerType))))
          Some(t -> rdr.parquet(dir(t).toString)
            .where(col("__bkt").isin(allowed: _*)).drop("__bkt"))
        }
      }

  /** The one read kernel every consumer resolves through: `buckets` of
    * the table under manifest `man`, merged with the merge-on-read
    * registers —
    *  - `dvs` tombstones ([[delete]]'s `mor`): applicable key rows are
    *    ANTI-JOINED away (broadcast — bytes ∝ deleted keys);
    *  - `dls` delta inserts ([[upsert]]'s `mor`): base rows carry
    *    effective version 0 and each delta its commit version — both
    *    registers only ever hold versions NEWER than the bucket's base
    *    (any data write folds and clears them) — so the NEWEST version
    *    of each key wins (all rows of that version: duplicate-key
    *    batches keep their duplicates, exact [[Upsert]] parity), and a
    *    tombstone kills a key only when it postdates the winning row.
    * A bucket set with no registered artifacts pays zero extra work
    * (the common case); tombstone-only slices keep the shuffle-free
    * anti-join plan, and only delta-carrying slices pay the per-key
    * window — the classic MoR read tax, bounded by the fold-at-cap
    * policy. */
  private def readSlice(man: Map[Int, Int], dvs: Map[Int, Seq[Int]],
      dls: Map[Int, Seq[Int]], buckets: Seq[Int],
      schema: Option[org.apache.spark.sql.types.StructType])
      : Option[DataFrame] = {
    val base = readPaths(bucketPaths(man, buckets), schema)
    val tombs = morArtifacts(dvDir, dvs, buckets, schema.map(s =>
        org.apache.spark.sql.types.StructType(
          s.fields.filter(f => keys.contains(f.name)))))
      .map { case (t, df) =>
        df.select(keys.map(col) :+ lit(t).as("__tv"): _*) }
    val deltas = morArtifacts(dlDir, dls, buckets, schema)
    if (deltas.isEmpty) {
      // tombstone-only (or artifact-free) slice: the zero-shuffle path
      base.map { data =>
        if (tombs.isEmpty) data
        else data.join(
          tombs.map(_.select(keys.map(col): _*)).reduce(_ unionByName _)
            .distinct(), keys, "left_anti")
      }
    } else {
      val withV = base.map(_.withColumn("__v", lit(0))).toSeq ++
        deltas.map { case (t, df) => df.withColumn("__v", lit(t)) }
      val rows = withV.reduce(_ unionByName _)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
      val won = rows.withColumn("__maxv", max(col("__v")).over(w))
        .where(col("__v") === col("__maxv")).drop("__maxv")
      val result =
        if (tombs.isEmpty) won
        else {
          val tombMax = tombs.reduce(_ unionByName _)
            .groupBy(keys.map(col): _*).agg(max(col("__tv")).as("__tv"))
          won.join(broadcast(tombMax), keys, "left")
            .where(col("__tv").isNull || col("__tv") < col("__v"))
            .drop("__tv")
        }
      Some(result.drop("__v"))
    }
  }

  /** Full current table (all buckets, resolved through the manifest,
    * read under the current authoritative schema). An existing table
    * every row of which was deleted reads as an EMPTY frame under the
    * authoritative schema (ADVICE r18) — `None` means never-written
    * (or a pre-`_SCHEMA` store with no surviving files), so
    * `store.read().get` stays total on any committed table. */
  def read(): Option[DataFrame] = currentVersion.flatMap(readVersion)

  /** Only `buckets` of the current table — the pruned read the merge
    * uses; exposed for key-range-restricted consumers. */
  def readBuckets(buckets: Seq[Int]): Option[DataFrame] =
    currentVersion.flatMap(v =>
      readSlice(manifest(v), dvsOf(v), dlsOf(v), buckets.distinct,
        schemaOf(v)))

  /** Time travel: the table as of (un-vacuumed) version `v`, resolved
    * through THAT version's manifest — inherited buckets read their
    * owning older versions' files, exactly as a current read does;
    * that version's registered tombstones apply. None when `v` never
    * published a manifest; an empty committed version reads as an
    * empty frame under its schema. Purely path-based, so it stays
    * correct even across a [[rebucket]] (an old manifest's bucket ids
    * belong to the old modulus, but a manifest read never consults
    * [[bucketOf]]). */
  def readVersion(v: Int): Option[DataFrame] =
    if (!fs.exists(manifestPath(v))) None
    else {
      val man = manifest(v)
      // THAT version's schema: time travel to before an evolution
      // returns the old shape, exactly as Delta/Iceberg do.
      readSlice(man, dvsOf(v), dlsOf(v), man.keys.toSeq.sorted,
          schemaOf(v))
        .orElse(schemaOf(v).map(emptyFrame))
    }

  /** Re-bucket maintenance: the bucket count is fixed at table
    * creation (bucket membership must stay stable across versions for
    * the pruned merge to be correct), so growing a table past its
    * bucket sizing is a FULL rewrite into a new store — the same
    * amortized cost contract as Hive/Iceberg bucket-spec changes.
    * Returns the new store; the old root remains readable (and
    * time-travelable) until the caller retires it. */
  def rebucket(targetRoot: String, nNew: Int): CowStore = {
    val t = new CowStore(spark, targetRoot, keys, nNew)
    read().foreach(t.writeFull)
    t
  }

  /** Bucket-pruned point/batch lookup: the current rows whose key
    * tuple appears in `keyRows` (a frame carrying the key columns) —
    * the serving-side complement of the pruned merge. The probe's
    * bucket set is one config-bounded distinct-collect; only those
    * buckets' files are listed and scanned, then a left-semi join
    * (AQE-broadcast for any sane probe) filters to the exact keys.
    * A 100-key lookup against a 100 TB table touches ≤100 buckets. */
  def readForKeys(keyRows: DataFrame): Option[DataFrame] =
    readForKeysAndBuckets(keyRows)._2

  /** [[readForKeys]] that ALSO returns the probe's collected bucket
    * set (empty when the store was never written or the probe is
    * empty). For maintenance loops ([[FkIndex.refresh]]) whose
    * follow-up COMMIT batch provably touches exactly the probed keys:
    * the commit then reuses this bucket set ([[applyCdcAt]]'s
    * `knownBuckets`) instead of paying a second probe job — one whole
    * Spark action saved per store patch (guide §1.2). */
  private[graft] def readForKeysAndBuckets(keyRows: DataFrame)
      : (Seq[Int], Option[DataFrame]) =
    currentVersion.map { v =>
      val man = manifest(v)
      val sch = storedSchema(man, v)
      // The probe is cast to the STORED key types BEFORE bucket
      // derivation (the same pre-derivation discipline as the merge
      // paths — [[castKeys]]): hash(int) ≠ hash(long) for the same
      // value, so an uncast probe of a type-drifted caller (INT dim
      // key vs BIGINT stored fk) would prune the wrong buckets and
      // silently miss rows (ADVICE r20). No key-level distinct: the
      // bucket collect distincts the BUCKET column itself and a
      // semi-join build side dedups keys in its hash relation — the
      // old distinct was one whole exchange per lookup for nothing.
      val probe = castKeys(keyRows, sch)
      val buckets = probe.select(bucketOf.as("__bkt"))
        .distinct().collect().map(_.getInt(0)).toSeq
      (buckets, readSlice(man, dvsOf(v), dlsOf(v), buckets, sch)
        .map(_.join(probe, keys, "left_semi")))
    }.getOrElse((Nil, None))

  /** Stake an exclusive version number ≥ `from`: atomic
    * create-no-overwrite of the `_CLAIM` marker — the one FS primitive
    * both HDFS and local FS make exclusive — retrying upward past
    * versions other writers claimed first. Returns the owned number;
    * no other writer can write data into its dir. */
  private def allocateVersion(from: Int): Int = {
    var v = math.max(from, versions().lastOption.getOrElse(0) + 1)
    while (true) {
      try {
        fs.create(claimPath(v), false).close()
        return v
      } catch {
        case _: java.io.IOException => v += 1 // claimed by another writer
      }
    }
    v // unreachable
  }

  private def checkBase(expectedBase: Option[Int]): Unit = {
    val now = currentVersion
    if (now != expectedBase)
      throw new ConcurrentWriteException(
        s"$root: table advanced to v$now while this write merged " +
          s"against v$expectedBase — retry the upsert against the " +
          "new current version")
  }

  /** The commit CAS: `_CURRENT` must still name `expectedBase` (the
    * snapshot this write merged against) at swap time. See the class
    * doc for the residual check-to-rename window and its upgrade
    * path. */
  private def casPointer(v: Int, expectedBase: Option[Int]): Unit = {
    // The table must still be at our base — EXCEPT that with no pointer
    // file yet, crash-forward resolution already surfaces the manifest
    // we published one step ago: seeing our own claimed v is never a
    // conflict (no other writer can hold v).
    if (currentVersion != Some(v)) checkBase(expectedBase)
    val tmp = new Path(rootPath, s"_CURRENT.tmp.$v")
    val pout = fs.create(tmp, true)
    try pout.write(f"v_$v%08d".getBytes("UTF-8")) finally pout.close()
    if (fs.exists(pointer)) fs.delete(pointer, false)
    if (!fs.rename(tmp, pointer))
      throw new java.io.IOException(s"pointer swap failed for $root v$v")
  }

  /** Commit-time per-bucket track stats for version `v` (see
    * [[versionTrackMaxes]]): rewritten buckets (owner == v) re-aggregate
    * from the JUST-WRITTEN files — one column-pruned scan of the commit's
    * own bytes, never the table; inherited buckets copy their base
    * version's entries; `dirtyStats` buckets (a MoR commit's affected
    * set) publish NO entry — unknown until the fold recomputes them.
    * Zero cost (and no `_STATS` file) when `statsCols` is empty. */
  private def commitStats(v: Int, man: Map[Int, Int],
      expectedBase: Option[Int],
      schema: org.apache.spark.sql.types.StructType,
      dirtyStats: Set[Int]): Unit = {
    if (statsCols.isEmpty) return
    val present = statsCols.filter(schema.fieldNames.contains)
    val baseStats = expectedBase.map(statsOf).getOrElse(Map.empty)
    val rewritten = man.collect { case (b, o) if o == v => b }.toSet
    val computed: Map[Int, Map[String, Option[String]]] =
      if (rewritten.isEmpty || present.isEmpty) Map.empty
      else {
        val dirs = rewritten.toSeq.sorted
          .map(b => bucketDir(v, b)).filter(fs.exists).map(_.toString)
        val agg: Map[Int, Map[String, Option[String]]] =
          if (dirs.isEmpty) Map.empty
          else spark.read.option("basePath", versionDir(v).toString)
            .schema(org.apache.spark.sql.types.StructType(schema.fields :+
              org.apache.spark.sql.types.StructField("__bkt",
                org.apache.spark.sql.types.IntegerType)))
            .parquet(dirs: _*)
            .groupBy(col("__bkt"))
            .agg(
              CowStore.encodeTrackMax(present.head,
                schema(present.head).dataType).as(present.head),
              present.tail.map(c =>
                CowStore.encodeTrackMax(c, schema(c).dataType).as(c)): _*)
            .collect() // ≤ nBuckets rows — config-bounded driver state
            .map { r =>
              r.getInt(0) -> present.zipWithIndex.map { case (c, i) =>
                c -> Option(r.getString(i + 1))
              }.toMap
            }.toMap
        // empty rewritten buckets (no dir) publish explicit null entries
        rewritten.map(b => b -> present.map(c =>
          c -> agg.getOrElse(b, Map.empty).getOrElse(c, None)).toMap).toMap
      }
    val inherited = man.collect {
      case (b, o) if o != v && !dirtyStats.contains(b) =>
        baseStats.get(b).map(b -> _)
    }.flatten.toMap
    writeStats(v, inherited ++ computed)
  }

  private def publish(v: Int, man: Map[Int, Int],
      expectedBase: Option[Int],
      schema: org.apache.spark.sql.types.StructType,
      dvs: Map[Int, Seq[Int]] = Map.empty,
      dls: Map[Int, Seq[Int]] = Map.empty,
      dirtyStats: Set[Int] = Set.empty): Unit = {
    // Detect a lost race BEFORE publishing the manifest: an aborted
    // version must never carry one, or the crash-forward fallback
    // (newest dir WITH a manifest) could resurrect it as current.
    checkBase(expectedBase)
    // Authoritative schema first (manifest stays the commit marker).
    val sout = fs.create(schemaPath(v), true)
    try sout.write(schema.json.getBytes("UTF-8")) finally sout.close()
    commitStats(v, man, expectedBase, schema, dirtyStats)
    // MoR registers next (same commit-marker discipline: only the
    // manifest makes any of it visible). Written only when non-empty —
    // the common no-MoR-debt version carries no register files.
    def writeRegister(p: Path, reg: Map[Int, Seq[Int]]): Unit = {
      val live = reg.filter(_._2.nonEmpty)
      if (live.nonEmpty) {
        val dout = fs.create(p, true)
        try dout.write(live.toSeq.sortBy(_._1)
          .map { case (b, vs) => s"$b ${vs.mkString(",")}" }
          .mkString("", "\n", "\n").getBytes("UTF-8"))
        finally dout.close()
      }
    }
    writeRegister(dvsPath(v), dvs)
    writeRegister(dlsPath(v), dls)
    val tmpMan = new Path(versionDir(v), "_MANIFEST.tmp")
    val out = fs.create(tmpMan, true)
    try out.write(man.toSeq.sorted
      .map { case (b, o) => s"$b $o" }.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmpMan, manifestPath(v)))
      throw new java.io.IOException(s"manifest publish failed: $root v$v")
    casPointer(v, expectedBase)
  }

  /** Write `df` into version `v`, bucket-partitioned; append mode
    * because the claimed dir is exclusively ours and already holds the
    * `_CLAIM` marker (overwrite would delete it). One file per bucket
    * by default — each bucket is batch-or-smaller here; a deployment
    * sizing multi-GB buckets would repartition by (__bkt, salt).
    * `sortBy` additionally orders rows WITHIN each bucket's file
    * (prefixing `__bkt` keeps every bucket contiguous when several
    * share a task) — min/max row-group pruning then works on the
    * sorted columns, the MergeTree ORDER BY idea. */
  private def writeBuckets(df: DataFrame, v: Int,
      sortBy: Seq[String] = Nil): Unit = {
    require(!df.columns.contains("__bkt"),
      "__bkt is the store's reserved partition column; rename or drop it")
    // Explicit partition count: ≤ nBuckets write tasks is the
    // documented one-file-per-bucket contract already (scaladoc
    // above), and pinning it lets the exchange skip AQE's extra
    // coalescing round per commit — material when a lifecycle runs
    // many small commits. Multi-GB-bucket deployments repartition by
    // (__bkt, salt) upstream, as before.
    val bucketed = df.withColumn("__bkt", bucketOf)
      .repartition(nBuckets, col("__bkt"))
    val arranged =
      if (sortBy.isEmpty) bucketed
      else bucketed.sortWithinPartitions(("__bkt" +: sortBy).map(col): _*)
    arranged.write.mode("append").partitionBy("__bkt")
      .parquet(versionDir(v).toString)
  }

  /** Initial full load (or CAS-checked full rewrite): every bucket
    * written under one claimed version. Rebases on the CURRENT
    * version — a deliberate full rewrite replaces whatever is there. */
  def writeFull(df: DataFrame): Unit = writeFullAt(df, currentVersion)

  private def writeFullAt(df: DataFrame, base: Option[Int]): Unit = {
    val v = allocateVersion(base.getOrElse(0) + 1)
    writeBuckets(df.select(df.columns.map(col).toSeq: _*), v)
    publish(v, (0 until nBuckets).map(_ -> v).toMap, base, df.schema)
  }

  /** C1 delete+insert merge, rewriting only the batch's buckets. Pass
    * `dedup = Some((track, tieBreak))` for the C2 keep-latest variant
    * — applied to the merged affected slice, which equals the global
    * dedup whenever the stored table already satisfies the
    * ≤1-row-per-key invariant (true after every previous merge — the
    * [[Upsert.withDedupMaintained]] argument). Concurrency: loses with
    * a retryable [[ConcurrentWriteException]] if another writer
    * commits between the snapshot read and the pointer swap.
    *
    * `evolve = true` ADDS the batch's unknown columns to the stored
    * schema instead of dropping them (S7's default) — additive-only
    * schema evolution, the Delta `mergeSchema` contract: the widened
    * schema publishes with this version, old files are NEVER
    * rewritten (readers null-fill from the authoritative schema), and
    * time travel to an earlier version returns the earlier shape.
    * Type changes are NOT evolution — an existing column still casts
    * to its stored type (parquet files must stay type-stable or the
    * vectorized reader breaks on old files).
    *
    * `mor = true` is the MERGE-ON-READ upsert (the update-side twin of
    * [[delete]]'s deletion vectors — Iceberg MoR / Hudi MOR-table
    * semantics on this layout): the batch commits as a DELTA-INSERT
    * file (`dl/` parquet, bytes ∝ batch rows, never ∝ the buckets they
    * land in) with the manifest unchanged; reads resolve each key to
    * its NEWEST version ([[readSlice]]'s winner rule — base data is
    * provably older than every registered delta), so a 1-row update
    * stops costing a bucket rewrite. Result-invisible vs the COW merge
    * (`q_cdc_upsert_mor` shares `q_cdc_upsert`'s oracle verbatim).
    * Reads of delta-carrying buckets pay a per-key window — the MoR
    * read tax — until the next data write folds the deltas in, and
    * [[DlCapPerBucket]] bounds the debt exactly as the tombstone cap
    * does (an at-cap bucket's slice folds through the COW merge).
    * Keep-latest `dedup` requires the COW merge (the winner rule
    * resolves versions, not track columns). */
  def upsert(incoming: DataFrame,
      dedup: Option[(String, Seq[String])] = None,
      evolve: Boolean = false, mor: Boolean = false): Unit =
    // Emptiness is decided inside upsertAt from the one probe job that
    // must run anyway (an `isEmpty` here was a whole extra evaluation
    // of the batch lineage per merge); an empty batch still commits
    // nothing, first-load included.
    upsertAt(incoming, dedup, currentVersion, evolve, mor)

  /** Max delta versions a bucket's register may hold before a MoR
    * upsert degrades that bucket to the folding COW merge. */
  val DlCapPerBucket = 32

  /** [[upsert]] pinned to an explicit base snapshot — the seam the
    * concurrency spec interleaves through (two writers sharing one
    * base: first commit wins, second throws). Production callers use
    * [[upsert]], which bases on the current version. */
  private[graft] def upsertAt(incoming: DataFrame,
      dedup: Option[(String, Seq[String])], base: Option[Int],
      evolve: Boolean = false, mor: Boolean = false): Unit = {
    require(!mor || dedup.isEmpty,
      "keep-latest dedup requires the COW merge — the MoR winner rule " +
        "resolves commit versions, not track columns")
    val missingKeys = keys.filterNot(incoming.columns.contains)
    require(missingKeys.isEmpty,
      s"incoming batch lacks key column(s) ${missingKeys.mkString(",")}" +
        " — drift tolerance null-fills payload columns only")
    // Checked HERE, not only in writeBuckets: schema alignment would
    // otherwise silently drop a caller's __bkt as an unknown field.
    require(!incoming.columns.contains("__bkt"),
      "__bkt is the store's reserved partition column; rename or drop it")
    val man = base.map(manifest).getOrElse(Map.empty)
    if (man.isEmpty) {
      // First load — but pinned to OUR base, not a re-read of current:
      // two racing initial loads must not last-write-win (the loser
      // retries and re-enters as a proper merge). An empty batch
      // commits no version (the merge path below decides that from
      // its probe; here nothing else would evaluate the batch).
      if (incoming.isEmpty) return
      writeFullAt(dedup.fold(incoming) { case (t, tb) =>
        DedupLatest(incoming, keys, t, tb) }, base)
      return
    }
    // 0. align the batch to the TARGET schema — the reference's drift
    // tolerance (base_loader.py:290-299): missing stored columns
    // null-fill, unknown incoming fields drop (or, under evolve, are
    // APPENDED to the stored schema), compatible types cast. This
    // MUST precede the bucket derivation: hash(int) ≠ hash(long) for
    // the same value, so a type-drifted key routed pre-cast would
    // probe (and rewrite) the wrong buckets. The stored schema comes
    // from the authoritative `_SCHEMA` (one tiny file read), falling
    // back to one parquet footer on pre-`_SCHEMA` stores.
    val stored = storedSchema(man, base.get)
    val target = stored.map { s =>
      if (!evolve) s
      else {
        val known = s.fieldNames.toSet
        org.apache.spark.sql.types.StructType(
          s.fields ++ incoming.schema.fields.filterNot(f =>
            known.contains(f.name)))
      }
    }
    // The aligned batch is CACHED for the duration of the merge: its
    // lineage (often a composed transform over a source scan) is
    // otherwise re-evaluated by the probe, the anti-join build side
    // AND the union side of the rewrite — three-plus full passes over
    // the input per commit. The probe job below materializes the
    // cache; unpersist is in the finally so a lost CAS race or failed
    // write cannot leak blocks.
    val inc = target.fold(incoming)(s =>
      graft.schema.Normalize.alignToSchema(incoming, s)).persist()
    try {
    // 1. affected buckets: ≤ 2·nBuckets rows of driver state — the MoR
    // form rides a null-key flag on the SAME probe, so detecting the
    // split-route case below costs no second scan of the batch. An
    // EMPTY probe is an empty batch: commit nothing — the contract the
    // old entry-point `isEmpty` action provided, now for free.
    val anyNullKey = keys.map(col(_).isNull).reduce(_ || _)
    val probe = inc.select(bucketOf.as("__bkt"),
        (if (mor) anyNullKey else lit(false)).as("__nullkey"))
      .distinct().collect()
    if (probe.isEmpty) return
    val affected = probe.map(_.getInt(0)).distinct.sorted.toSeq
    val dvs = dvsOf(base.get)
    val dls = dlsOf(base.get)
    if (mor) {
      Seq("__v", "__tv", "__maxv").foreach(r => require(
        target.forall(!_.fieldNames.contains(r)),
        s"$r is reserved by the merge-on-read reader; rename the column"))
      // NULL key values diverge between the kernels: the COW anti-join
      // is non-null-safe, so a NULL-keyed batch row APPENDS beside any
      // stored NULL-keyed row, while the MoR winner window groups
      // NULLs together and would SUPERSEDE the stored row — and the
      // next fold would bake that answer in (ADVICE r19). Route the
      // NULL-keyed slice through the COW merge so mor stays
      // result-invisible; the non-null rest delta-commits on top.
      if (probe.exists(_.getBoolean(1))) {
        upsertAt(inc.where(anyNullKey), None, base, evolve)
        if (probe.exists(!_.getBoolean(1)))
          upsertAt(inc.where(!anyNullKey), None, currentVersion, evolve,
            mor = true)
        return
      }
      // Delta-register at cap? Those buckets' batch slice folds
      // through the COW merge first, the still-cheap rest delta-
      // commits on the advanced base (deleteAt's fold-at-cap shape).
      val overloaded = affected.filter(b =>
        dls.getOrElse(b, Nil).length >= DlCapPerBucket).toSet
      if (overloaded.nonEmpty) {
        upsertAt(inc.where(bucketOf.isin(overloaded.toSeq: _*)), None,
          base, evolve)
        val rest = affected.filterNot(overloaded)
        if (rest.nonEmpty)
          upsertAt(inc.where(bucketOf.isin(rest: _*)), None,
            currentVersion, evolve, mor = true)
      } else {
        val v = allocateVersion(base.get + 1)
        inc.withColumn("__bkt", bucketOf)
          .write.mode("append").parquet(dlDir(v).toString)
        publish(v, man, base, target.getOrElse(inc.schema), dvs,
          dls ++ affected.map(b => b -> (dls.getOrElse(b, Nil) :+ v)),
          dirtyStats = affected.toSet)
      }
      return
    }
    val v = allocateVersion(base.get + 1)
    // 2+3. pruned read of exactly those buckets (under the target
    // schema, so pre-evolution files null-fill any just-added
    // columns; pending MoR tombstones and delta inserts fold in
    // here), then the same anti-join+union (+ optional keep-latest)
    // as the unbucketed kernel.
    val merged = readSlice(man, dvs, dls, affected, target) match {
      case Some(prev) =>
        // merge (not apply): the probe above already proved the batch
        // non-empty — the kernel's own isEmpty would be a wasted job
        val up = Upsert.merge(prev, inc, keys)
        dedup.fold(up) { case (t, tb) => DedupLatest(up, keys, t, tb) }
      case None =>
        dedup.fold(inc) { case (t, tb) =>
          DedupLatest(inc, keys, t, tb) }
    }
    // 4. rewrite affected buckets only; inherit the rest by reference.
    // Rewritten buckets clear their MoR registers (folded above).
    writeBuckets(merged, v)
    publish(v, man ++ affected.map(_ -> v), base, merged.schema,
      dvs -- affected, dls -- affected)
    } finally inc.unpersist(false)
  }

  /** Cast a key probe to the STORED key types before bucket routing —
    * the same pre-derivation discipline as the upsert's alignment:
    * `hash(int) ≠ hash(long)` for the same value, so an uncast probe
    * would prune (and scan) the wrong buckets and silently miss rows. */
  private def castKeys(probe: DataFrame,
      schema: Option[org.apache.spark.sql.types.StructType]): DataFrame = {
    val p = probe.select(keys.map(col): _*)
    schema.fold(p) { s =>
      val types = s.fields.map(f => f.name -> f.dataType).toMap
      p.select(keys.map(k =>
        types.get(k).fold(col(k))(t => col(k).cast(t).as(k))): _*)
    }
  }

  /** Stored schema as of `base`, with the pre-`_SCHEMA` footer
    * fallback the merge paths share. */
  private def storedSchema(man: Map[Int, Int], base: Int)
      : Option[org.apache.spark.sql.types.StructType] =
    schemaOf(base).orElse(
      bucketPaths(man, man.keys.toSeq.sorted).headOption
        .map(p => spark.read.parquet(p).schema))

  /** Hard delete by key — the missing leg of the DML triad (insert and
    * update are both [[upsert]] under delete+insert semantics). Bucket-
    * pruned exactly like the merge: the probe's bucket set is one
    * config-bounded distinct-collect, only buckets that both hold the
    * probe's keys AND exist in the manifest are read back and rewritten
    * key-filtered; every other bucket is inherited by reference. A
    * bucket emptied by the delete simply has no dir under the new
    * version (reads skip absent dirs), so full-bucket deletes cost one
    * empty write, never a tombstone scan. Keys absent from the table
    * are row-level no-ops (their bucket is rewritten unchanged — cost
    * bounded by the probe's bucket count, never checked row-by-row);
    * an EMPTY probe commits nothing at all. CAS-checked like any
    * write.
    *
    * `mor = true` is the MERGE-ON-READ form (Delta deletion vectors /
    * Iceberg MoR, reduced to this layout — VERDICT r18 ask #2): the
    * copy-on-write rewrite makes a 1-row delete cost a full bucket
    * rewrite, so write volume for delete-heavy CDC (GDPR erasure
    * streams, TTL sweeps) is ∝ bucket size, not ∝ churn. MoR instead
    * commits a version whose only data is the probe's KEY TOMBSTONES
    * (`dv/` parquet, bytes ∝ probe) and whose manifest is UNCHANGED —
    * the `_DVS` register maps each affected bucket to its tombstone
    * versions, and every read anti-joins them away ([[readSlice]]).
    * Result-invisible vs the COW form (`q_cdc_delete_mor` shares
    * `q_cdc_delete`'s oracle verbatim); the change feed sees a
    * register diff as a changed bucket, so CDF stays correct. Reads
    * pay the (broadcast) anti-join until the NEXT data write of the
    * bucket — any rewrite folds pending tombstones in and clears the
    * register, and [[compact]] force-folds all MoR debt.
    *
    * MoR debt is BOUNDED per bucket ([[DvCapPerBucket]]): a bucket
    * whose register already lists that many tombstone versions takes
    * its slice of the delete through the folding COW rewrite instead
    * (register back to zero), while the rest of the probe stays
    * tombstone-cheap — so a tombstone-only workload (pure erasure
    * stream, no upserts, no compaction) amortizes to one bucket
    * rewrite per cap-many deletes and a read never unions more than
    * cap tombstone files per bucket. The same self-limiting idea as
    * Delta's OPTIMIZE-triggering DV thresholds, inlined. */
  def delete(keyRows: DataFrame, mor: Boolean = false): Unit =
    deleteAt(keyRows, currentVersion, mor)

  /** Max tombstone versions a bucket's register may hold before a MoR
    * delete degrades that bucket to the folding COW rewrite. */
  val DvCapPerBucket = 32

  private[graft] def deleteAt(keyRows: DataFrame, base: Option[Int],
      mor: Boolean = false): Unit = {
    val missingKeys = keys.filterNot(keyRows.columns.contains)
    require(missingKeys.isEmpty,
      s"delete probe lacks key column(s) ${missingKeys.mkString(",")}")
    val man = base.map(manifest).getOrElse(Map.empty)
    if (man.isEmpty) return // nothing stored, nothing to delete
    val stored = storedSchema(man, base.get)
    // NOT cached (unlike the merge paths' batches): a delete probe is
    // a key projection whose two evaluations are cheap, and a cached
    // plan keeps its un-coalesced shuffle partitioning
    // (canChangeCachedPlanOutputPartitioning is off by default), which
    // would fan the tombstone write into one tiny file per shuffle
    // partition instead of AQE's size-coalesced layout.
    val probe = castKeys(keyRows, stored).distinct()
    val affected = probe.select(bucketOf.as("__bkt")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
      .filter(man.contains) // never-written buckets hold nothing
    val dvs = dvsOf(base.get)
    val dls = dlsOf(base.get)
    if (mor) stored.foreach { sch =>
      Seq("__v", "__tv", "__maxv").foreach(r => require(
        !sch.fieldNames.contains(r),
        s"$r is reserved by the merge-on-read reader; rename the column"))
      // Register at cap? Those buckets' probe slice folds through the
      // COW rewrite first (one commit), then the still-cheap buckets
      // tombstone on top of the advanced base (a second commit).
      val overloaded = affected.filter(b =>
        dvs.getOrElse(b, Nil).length >= DvCapPerBucket).toSet
      val morBuckets = affected.filterNot(overloaded)
      if (overloaded.nonEmpty) {
        deleteAt(probe.where(bucketOf.isin(overloaded.toSeq: _*)),
          base, mor = false)
        if (morBuckets.nonEmpty)
          deleteAt(probe.where(bucketOf.isin(morBuckets: _*)),
            currentVersion, mor = true)
      }
      // Tombstones only for buckets that exist — a probe entirely in
      // never-written buckets commits nothing, like the COW form.
      else if (morBuckets.nonEmpty) {
        val v = allocateVersion(base.get + 1)
        probe.withColumn("__bkt", bucketOf)
          .where(col("__bkt").isin(morBuckets: _*))
          .write.mode("append").parquet(dvDir(v).toString)
        publish(v, man, base, sch,
          dvs ++ morBuckets.map(b => b -> (dvs.getOrElse(b, Nil) :+ v)),
          dls, dirtyStats = morBuckets.toSet)
      }
    }
    else readSlice(man, dvs, dls, affected, stored).foreach { prev =>
      val v = allocateVersion(base.get + 1)
      writeBuckets(prev.join(probe, keys, "left_anti"), v)
      publish(v, man ++ affected.map(_ -> v), base,
        stored.getOrElse(prev.schema), dvs -- affected, dls -- affected)
    }
  }

  /** Apply an I/U/D CDC batch ([[Upsert.applyOps]] semantics — delete
    * every batch key, re-insert the non-delete rows) through the
    * bucket-pruned copy-on-write merge. The affected-bucket set covers
    * ALL batch keys, delete events included, so a delete-heavy batch
    * prunes exactly like an upsert-heavy one. The batch is expected
    * pre-collapsed to ≤1 row per key (collapse a multi-event history
    * with [[DedupLatest]] on the event-order column first); payload
    * drift follows the same [[graft.schema.Normalize.alignToSchema]]
    * tolerance as [[upsert]], with `opCol` riding alongside the
    * aligned payload and consumed before the write.
    *
    * `morDeletes = true` routes the batch's DELETE events through the
    * merge-on-read path instead ([[delete]]'s `mor` contract, caps
    * included): the deletes commit as tombstones, then the non-delete
    * rows merge normally — two versions instead of one, but a bucket
    * only the deletes touch is never rewritten. Equivalent to the
    * one-commit form because the batch is pre-collapsed to ≤1 row per
    * key (a key is EITHER deleted or upserted, so delete-then-merge
    * composes to the same table; spec-pinned). The shape for TTL
    * sweeps and erasure events arriving mixed into an update feed. */
  def applyCdc(batch: DataFrame, opCol: String,
      deleteOps: Seq[String] = Seq("D", "d", "delete"),
      evolve: Boolean = false, morDeletes: Boolean = false): Unit = {
    // No entry-point isEmpty action: the plain path decides emptiness
    // from the bucket probe it runs anyway, and the split morDeletes
    // path from its own slices (delete/upsert are both empty-safe).
    if (morDeletes && exists) {
      // Both slices re-evaluate the batch lineage (delete: probe +
      // tombstone write; upsert: probe + merge) — cache it once.
      val b = batch.persist()
      try {
        val isDel = coalesce(col(opCol).isin(deleteOps: _*), lit(false))
        delete(b.where(isDel).select(keys.map(col): _*), mor = true)
        upsert(b.where(!isDel).drop(opCol), evolve = evolve)
      } finally b.unpersist(false)
    }
    else applyCdcAt(batch, opCol, deleteOps, currentVersion, evolve)
  }

  /** `knownBuckets`: the batch's affected-bucket set, when the caller
    * has ALREADY collected it (a maintenance loop whose batch key set
    * provably equals a probe it just paid for — [[FkIndex.refresh]]).
    * Skips this commit's own probe job. The set must equal the true
    * bucket set of the batch's keys under THIS store's [[bucketOf]]: a
    * superset only rewrites extra buckets unchanged (result-invisible,
    * wasted I/O), but a SUBSET would leave deletes unapplied — callers
    * must derive it from the same cast key frame the batch carries. */
  private[graft] def applyCdcAt(batch: DataFrame, opCol: String,
      deleteOps: Seq[String], base: Option[Int],
      evolve: Boolean = false,
      knownBuckets: Option[Seq[Int]] = None): Unit = {
    val missingKeys = keys.filterNot(batch.columns.contains)
    require(missingKeys.isEmpty,
      s"CDC batch lacks key column(s) ${missingKeys.mkString(",")}")
    require(batch.columns.contains(opCol),
      s"CDC batch lacks the op column '$opCol'")
    require(!keys.contains(opCol), "the op column cannot be a key")
    require(opCol != "__bkt", "__bkt cannot be the op column")
    require(!batch.columns.contains("__bkt"),
      "__bkt is the store's reserved partition column; rename or drop it")
    def nonDelete(df: DataFrame): DataFrame =
      // NULL/unknown ops are upserts — Upsert.applyOps' contract.
      df.where(!coalesce(col(opCol).isin(deleteOps: _*), lit(false)))
    val man = base.map(manifest).getOrElse(Map.empty)
    if (man.isEmpty) {
      // First load: no destination to delete against — the non-delete
      // rows ARE the table (pinned to OUR base, as upsertAt's).
      val inserts = nonDelete(batch).drop(opCol)
      if (!inserts.isEmpty) writeFullAt(inserts, base)
      return
    }
    val stored = storedSchema(man, base.get)
    stored.foreach(s => require(!s.fieldNames.contains(opCol),
      s"stored schema already carries '$opCol' — the op column is " +
        "batch metadata and must not collide with payload"))
    // evolve follows upsert's additive contract: the batch's unknown
    // non-op columns widen the authoritative schema; old files are
    // never rewritten (readers null-fill).
    val target = stored.map { s =>
      if (!evolve) s
      else {
        val known = s.fieldNames.toSet + opCol
        org.apache.spark.sql.types.StructType(
          s.fields ++ batch.schema.fields.filterNot(f =>
            known.contains(f.name)))
      }
    }
    // Align payload to the target schema with opCol riding along (the
    // op is batch metadata, never part of the authoritative schema) —
    // BEFORE bucket derivation, as in upsertAt. Cached like upsertAt's
    // batch: the probe, the delete-phase key set and the re-insert
    // slice otherwise each re-evaluate the batch lineage.
    val aligned = target.fold(batch) { s =>
      graft.schema.Normalize.alignToSchema(batch,
        org.apache.spark.sql.types.StructType(s.fields :+ batch.schema(opCol)))
    }.persist()
    try {
    val affected = knownBuckets.map(_.distinct.sorted).getOrElse(
      aligned.select(bucketOf.as("__bkt")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted)
    if (affected.isEmpty) return // empty batch: nothing to commit
    val v = allocateVersion(base.get + 1)
    val dvs = dvsOf(base.get)
    val dls = dlsOf(base.get)
    val merged = readSlice(man, dvs, dls, affected, target) match {
      case Some(prev) =>
        // opsMerge (not applyOps): non-emptiness proven by the probe
        Upsert.opsMerge(prev, aligned, keys, opCol, deleteOps)
      case None => nonDelete(aligned).drop(opCol)
    }
    writeBuckets(merged, v)
    publish(v, man ++ affected.map(_ -> v), base, merged.schema,
      dvs -- affected, dls -- affected)
    } finally aligned.unpersist(false)
  }

  /** Change data feed — what changed between (un-vacuumed) versions
    * `fromV` and `toV`: one row per key whose presence or content
    * differs, `(keys*, change)` with `change` ∈ added / removed /
    * changed ([[Diff.snapshotDiff]]'s contract). The version layout
    * makes this INCREMENTAL: data files are immutable, so a bucket can
    * only differ if its manifest OWNER differs — the diff reads exactly
    * the buckets whose ownership changed, at both versions, and never
    * touches the inherited 100 TB (an hourly batch touching 5 buckets
    * diffs 10 bucket dirs regardless of table size; this is Delta's
    * change-data-feed idea recovered from the manifest alone, no
    * per-row change files). A [[compact]]/[[delete]]-rewritten bucket
    * with identical rows diffs to nothing — correct, though a window
    * spanning a compaction pays a scan of the compacted bytes
    * (downstream consumers should drain BEFORE maintenance, as with
    * Delta OPTIMIZE). Rows compare under `toV`'s authoritative schema,
    * so evolution-widened columns participate (pre-evolution rows
    * null-fill — a row whose only change is a new column's value
    * reports `changed`, as Delta CDF does). None when either version
    * never published a manifest (or was vacuumed). */
  def readChanges(fromV: Int, toV: Int): Option[DataFrame] =
    changedSlices(fromV, toV).map { case (o, n) =>
      Diff.snapshotDiff(o, n, keys)
    }

  /** [[readChanges]] with PAYLOADS ([[Diff.changeRows]]'s row shape —
    * post-images for added/changed, pre-image for removed, all under
    * `toV`'s schema): the form a downstream APPLIER consumes — see
    * [[IncrementalMart]]. Same changed-owner bucket pruning. */
  def readChangeRows(fromV: Int, toV: Int): Option[DataFrame] =
    changedSlices(fromV, toV).map { case (o, n) =>
      Diff.changeRows(o, n, keys)
    }

  /** The buckets whose manifest OWNER or tombstone register differs
    * between (un-vacuumed) versions `fromV` and `toV` — the only
    * buckets whose CONTENT can differ, since version data and `_DV`
    * files are immutable (the pruning argument under [[readChanges]];
    * a merge-on-read [[delete]] changes no owner, but it changes the
    * bucket's register entry, so the feed still sees it). Exposed for
    * consumers that maintain per-bucket derived state
    * ([[graft.quality.IncrementalProfile]]) and only want to recompute
    * the churned buckets. None when either version never published a
    * manifest (or was vacuumed) — INCLUDING `fromV > toV` (a persisted
    * cursor ahead of the table: store recreated, restored from backup,
    * or root swapped; ADVICE r18): that is not a committed window, and
    * None is the documented fell-out-of-retention rebuild signal every
    * consumer already handles, where a throw would crash the drain. */
  def changedBuckets(fromV: Int, toV: Int): Option[Seq[Int]] =
    if (fromV > toV ||
        !fs.exists(manifestPath(fromV)) || !fs.exists(manifestPath(toV)))
      None
    else {
      val mOld = manifest(fromV)
      val mNew = manifest(toV)
      val dOld = dvsOf(fromV)
      val dNew = dvsOf(toV)
      val lOld = dlsOf(fromV)
      val lNew = dlsOf(toV)
      Some((mOld.keySet ++ mNew.keySet).toSeq.sorted
        .filter(b => mOld.get(b) != mNew.get(b) ||
          dOld.getOrElse(b, Nil) != dNew.getOrElse(b, Nil) ||
          lOld.getOrElse(b, Nil) != lNew.getOrElse(b, Nil)))
    }

  /** The changed bucket slices of versions `fromV`/`toV` (see
    * [[readChanges]] for why owner+register-diff pruning is complete),
    * each read with its own version's tombstones applied. */
  private def changedSlices(fromV: Int, toV: Int)
      : Option[(DataFrame, DataFrame)] =
    changedBuckets(fromV, toV).flatMap { changed =>
      val mOld = manifest(fromV)
      val mNew = manifest(toV)
      // toV's schema governs the compare (CDF convention); fall back to
      // fromV's, then to a footer, for pre-_SCHEMA stores.
      val sch = schemaOf(toV).orElse(schemaOf(fromV))
        .orElse(bucketPaths(mNew, mNew.keys.toSeq.sorted).headOption
          .map(p => spark.read.parquet(p).schema))
        .orElse(bucketPaths(mOld, mOld.keys.toSeq.sorted).headOption
          .map(p => spark.read.parquet(p).schema))
      sch.map { s =>
        def slice(man: Map[Int, Int], dvs: Map[Int, Seq[Int]],
            dls: Map[Int, Seq[Int]]): DataFrame =
          readSlice(man, dvs, dls, changed, Some(s))
            .getOrElse(emptyFrame(s))
        (slice(mOld, dvsOf(fromV), dlsOf(fromV)),
          slice(mNew, dvsOf(toV), dlsOf(toV)))
      }
    }

  /** [[readChanges]] from `sinceV` to the current version — the shape
    * an incremental downstream consumer (mart refresh, cache
    * invalidation) polls with, remembering the version it last drained. */
  def readChangesSince(sinceV: Int): Option[DataFrame] =
    currentVersion.flatMap(cur => readChanges(sinceV, cur))

  /** Maintenance: rewrite the FRAGMENTED TAIL so the current manifest
    * references at most `maxReferenced` version dirs. Without it, dir
    * count grows O(batches) — every batch's dir stays alive for the
    * buckets only it owns, and a year of hourly loads fans `read()`
    * into ~9k paths (the problem Delta OPTIMIZE / Iceberg
    * rewrite-manifests exists for).
    *
    * Owner selection minimizes rewrite volume: owners are ranked by
    * the BYTES they hold live (file sizes of their referenced bucket
    * dirs — driver metadata, ≤ nBuckets listStatus calls); the largest
    * `maxReferenced - 1` survive by inheritance, every bucket of the
    * long tail is read once (pruned paths) and rewritten under one new
    * claimed version. Result-invisible: same rows before and after
    * (`q_cdc_upsert_compacted` shares `q_cdc_upsert`'s oracle); a
    * subsequent [[vacuum]] reclaims the retired dirs. CAS-checked like
    * any write; no-op when already within budget.
    *
    * `clusterBy` makes the rewrite also CLUSTER the rewritten buckets
    * (rows sorted within each bucket's file by the given columns — the
    * OPTIMIZE-ZORDER/MergeTree-ORDER-BY maintenance idea, in its
    * lexicographic form; multi-dimensional use composes
    * `Layout.zvalue` upstream): incremental merges append in arrival
    * order, compaction is exactly when a deployment restores scan
    * order for min/max row-group pruning. Row SET unchanged —
    * clustering is layout, never semantics. */
  def compact(maxReferenced: Int = 1, clusterBy: Seq[String] = Nil)
      : Unit = {
    require(maxReferenced >= 1, "maxReferenced must be >= 1")
    val base = currentVersion
    val man = base.map(manifest).getOrElse(Map.empty)
    if (man.isEmpty) return
    val dvs = dvsOf(base.get)
    val dls = dlsOf(base.get)
    // MoR debt is folded here regardless of fragmentation: a bucket
    // with registered tombstones OR delta inserts joins the rewrite
    // tail even when its owner would otherwise survive by inheritance,
    // so compact() always leaves an artifact-free table (the Delta
    // OPTIMIZE-rewrites-DVs contract).
    val dvCarriers = (dvs.collect { case (b, vs) if vs.nonEmpty => b } ++
      dls.collect { case (b, vs) if vs.nonEmpty => b }).toSet
    val byOwner: Map[Int, Seq[Int]] =
      man.groupBy(_._2).map { case (o, m) => o -> m.keys.toSeq.sorted }
    if (byOwner.size <= maxReferenced && dvCarriers.isEmpty) return
    def liveBytes(owner: Int, buckets: Seq[Int]): Long =
      buckets.map { b =>
        val d = bucketDir(owner, b)
        if (fs.exists(d)) fs.getContentSummary(d).getLength else 0L
      }.sum
    val keep = byOwner.toSeq
      .map { case (o, bs) => (liveBytes(o, bs), o) }
      .sortBy { case (bytes, o) => (-bytes, -o) }
      .take(maxReferenced - 1).map(_._2).toSet
    val tail = man.filter { case (b, o) =>
      !keep.contains(o) || dvCarriers.contains(b) }.keys.toSeq.sorted
    val v = allocateVersion(base.get + 1)
    // Read the tail under the authoritative schema (pre-evolution
    // files null-fill; pending tombstones fold in) and republish that
    // same schema — compaction is layout maintenance, never a schema
    // event.
    val sch = schemaOf(base.get)
    val tailDf = readSlice(man, dvs, dls, tail, sch)
    tailDf.foreach(writeBuckets(_, v, clusterBy))
    publish(v, man ++ tail.map(_ -> v), base,
      sch.orElse(tailDf.map(_.schema))
        .getOrElse(new org.apache.spark.sql.types.StructType()),
      dvs -- tail, dls -- tail)
  }

  /** Reference-aware vacuum: drop version dirs older than the current
    * version that the CURRENT manifest no longer references — an
    * inherited bucket keeps its owner's whole dir alive. Claim-only
    * dirs (a writer staked the version but never published a
    * manifest) below the current version are aborted commits — their
    * writer's CAS can no longer succeed (its base predates the
    * current version) — and are reclaimed too.
    *
    * `retainLast` is the CDF/time-travel retention window (Delta's
    * `delta.deletedFileRetentionDuration` idea in version units): the
    * newest `retainLast` COMMITTED versions stay fully readable — each
    * retained version keeps every older dir its own manifest still
    * references, so [[readVersion]]/[[readChanges]] over the retained
    * window keep working after maintenance. An incremental consumer
    * ([[IncrementalMart]]) that may fall `k` drains behind needs
    * `retainLast >= k + 1`; one that fell further behind gets `None`
    * and rebuilds (the standard CDF retention contract). Default 0 =
    * current-only, the tightest reclaim. */
  def vacuum(retainLast: Int = 0): Unit = currentVersion.foreach { cur =>
    val retained = versions()
      .filter(v => v <= cur && fs.exists(manifestPath(v)))
      .takeRight(math.max(retainLast, 1))
    // A retained version keeps alive every dir its manifest references
    // AND every tombstone version its register references — a MoR
    // delete's `_DV` files are load-bearing for reads at any version
    // whose register lists them.
    val live = retained.flatMap(v =>
      manifest(v).values ++ dvsOf(v).values.flatten ++
        dlsOf(v).values.flatten).toSet ++
      retained + cur
    versions().filter(v => v < cur && !live.contains(v)).foreach { v =>
      fs.delete(versionDir(v), true)
    }
  }
}
