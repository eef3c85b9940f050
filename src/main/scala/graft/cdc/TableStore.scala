package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet snapshot directories with an atomic current-version
  * pointer — the engine's durable-table primitive.
  *
  * The environment has no Delta/Iceberg (repo:SURVEY.md header note), so
  * CDC merge targets are rewritten as immutable snapshot versions:
  *
  * {{{
  *   <root>/v_00000001/part-*.parquet
  *   <root>/v_00000002/part-*.parquet
  *   <root>/_CURRENT            // contains "v_00000002"
  * }}}
  *
  * Readers resolve `_CURRENT` then read one immutable directory, so a
  * concurrent writer can never produce a torn read; the pointer swap is
  * a single-file rename (atomic on HDFS and local FS; on S3 a real
  * deployment would swap through a small consistent store instead).
  * Mirrors the reference's ClickHouse table-mutation model
  * (base_loader.py:275-338 delete+insert) without in-place mutation.
  *
  * Scale: snapshots can optionally be partitioned (`partitionByCols`) so
  * downstream reads prune; writing a new version costs only the changed
  * data's rewrite — at 100 TB you'd partition by month (O3) and pair
  * with [[SnapshotLoad]]'s dynamic partition overwrite to rewrite only
  * touched partitions.
  */
final class TableStore(spark: SparkSession, root: String,
    partitionByCols: Seq[String] = Nil,
    clusterByCols: Seq[String] = Nil,
    bucketBy: Option[(Int, Seq[String])] = None) {

  private val rootPath = new Path(root)
  private def fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def pointer = new Path(rootPath, "_CURRENT")

  /** Catalog identifier for a bucketed version (bucketing metadata lives
    * in the catalog, not the files). The sanitized root alone is NOT
    * injective (`/a/b-c` and `/a/b_c` both sanitize to `_a_b_c`, and
    * truncation loses distinguishing prefixes), so a hash of the FULL
    * root disambiguates — two stores can never silently share catalog
    * entries. */
  private def catalogName(v: Int): String = {
    val h = f"${scala.util.hashing.MurmurHash3.stringHash(root)}%08x"
    "graft_" + root.replaceAll("[^A-Za-z0-9]", "_").takeRight(40) +
      s"_$h" + f"_v$v%08d"
  }

  /** Pointer read with a fallback: the swap is delete-then-rename (rename
    * over an existing file is not atomic-replace on every Hadoop FS), so
    * a reader can land in the instant where `_CURRENT` is absent. In that
    * window the highest `v_*` directory IS the version the interrupted
    * swap was publishing (the data dir and tmp pointer are fully written
    * before the delete) — fall back to it instead of reporting the table
    * as never-written. Only COMMITTED directories (with the `_SUCCESS`
    * marker) qualify, so a crash mid-parquet-write is never exposed;
    * a complete-but-unpublished orphan is (crash-forward semantics). */
  private def currentVersion: Option[Int] =
    if (!fs.exists(pointer))
      versions().reverse.find(v =>
        fs.exists(new Path(versionDir(v), "_SUCCESS")))
    else {
      val in = fs.open(pointer)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        if (s.isEmpty) None else Some(s.stripPrefix("v_").toInt)
      } finally in.close()
    }

  def exists: Boolean = currentVersion.isDefined

  /** Current snapshot, or None if the table has never been written.
    * Bucketed stores read through the catalog so the scan reports
    * `HashPartitioning` on the bucket keys and merges/joins on those
    * keys skip the Exchange on this (the 100 TB) side; if the catalog
    * entry is gone (new session — the default catalog is session-local)
    * the data still reads as plain parquet, just without the
    * shuffle-elision metadata. */
  def read(): Option[DataFrame] =
    currentVersion.map { v =>
      if (bucketBy.isDefined && spark.catalog.tableExists(catalogName(v)))
        spark.table(catalogName(v))
      else spark.read.parquet(versionDir(v).toString)
    }

  /** Time travel: read a specific (un-vacuumed) version. */
  def readVersion(v: Int): Option[DataFrame] = {
    val dir = versionDir(v)
    if (fs.exists(dir)) Some(spark.read.parquet(dir.toString)) else None
  }

  /** Versions currently on disk (ascending). */
  def versions(): Seq[Int] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v_")).map(_.stripPrefix("v_").toInt).sorted

  private def versionDir(v: Int) = new Path(rootPath, f"v_$v%08d")

  /** Write `df` as the next immutable version, then atomically advance
    * the pointer. A crash before the pointer swap leaves an orphan
    * directory and an intact previous version — never a torn table. */
  def write(df: DataFrame): Unit = {
    val next = currentVersion.getOrElse(0) + 1
    val dir = versionDir(next)
    // O2 clustering analog (MergeTree ORDER BY, init-clickhouse.sql:24):
    // sort within partitions before write so parquet row-group min/max
    // stats give the skip-index effect on the cluster keys.
    val clustered =
      if (clusterByCols.nonEmpty)
        df.sortWithinPartitions(clusterByCols.map(org.apache.spark.sql
          .functions.col): _*)
      else df
    val w = clustered.write.mode("overwrite")
    val pw = if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w
    bucketBy match {
      case Some((n, cols)) =>
        // External bucketed table: files under the version dir, bucket
        // metadata in the catalog. Pre-shuffling into buckets here is
        // the amortized cost that lets every later merge/join on the
        // bucket key read this side exchange-free (BucketingSpec).
        spark.sql(s"DROP TABLE IF EXISTS ${catalogName(next)}")
        pw.bucketBy(n, cols.head, cols.tail: _*)
          .sortBy(cols.head, cols.tail: _*)
          .option("path", dir.toString)
          .saveAsTable(catalogName(next))
      case None => pw.parquet(dir.toString)
    }
    val tmp = new Path(rootPath, s"_CURRENT.tmp.$next")
    val out = fs.create(tmp, true)
    try out.write(f"v_$next%08d".getBytes("UTF-8")) finally out.close()
    if (fs.exists(pointer)) fs.delete(pointer, false)
    if (!fs.rename(tmp, pointer))
      throw new java.io.IOException(s"pointer swap failed for $root v$next")
  }

  /** [[write]] with output-file sizing — the small-files/giant-files
    * control a 100 TB table needs: a snapshot written from however many
    * shuffle partitions the upstream job happened to end with produces
    * either thousands of KB files (metadata pressure, per-file open
    * cost on every read) or a handful of multi-GB ones (no read
    * parallelism, whole-file retries). Targets `targetFileBytes` per
    * parquet file by estimating the frame's on-disk size from the
    * optimizer's `sizeInBytes` statistic over an assumed
    * `compressionRatio` (in-memory → parquet; ~3× is typical for mixed
    * text/numeric — callers with atypical data pass their own), then
    * `repartition(n)` before the write. The estimate costs no job
    * (leaf file sizes propagate through the plan); being 2× off yields
    * files 2× off target, which is operationally fine — the point is
    * the ORDER of magnitude, not byte precision. Returns `n`.
    *
    * The statistic is only trustworthy near the leaves: without CBO,
    * Spark propagates a join's size as the PRODUCT of its children's
    * sizes, and a plan with no stats at all reports the
    * `defaultSizeInBytes` sentinel (Long.MaxValue) — either would turn
    * the sizing repartition into a small-files bomb, the exact
    * pathology this method exists to prevent. Two guards:
    *   - the sentinel (stats absent) falls back to a row-count
    *     estimate — `df.count()` × the schema's default row width —
    *     which costs one extra job but can never be a blow-up;
    *   - `n` is clamped to `maxPartitions` (default 4096 ≈ 512 GB of
    *     output at the default target — callers sizing a genuinely
    *     larger snapshot raise it explicitly), so a joined/derived
    *     frame whose product-estimate is orders of magnitude off
    *     still writes a sane file count. Callers wanting exact sizing
    *     for derived frames should localCheckpoint first so leaf-file
    *     stats apply. */
  def writeSized(df: DataFrame, targetFileBytes: Long = 128L << 20,
      compressionRatio: Double = 3.0, maxPartitions: Int = 4096): Int = {
    require(bucketBy.isEmpty,
      "writeSized: bucketed stores derive file count from bucket spec")
    require(targetFileBytes > 0 && compressionRatio > 0 && maxPartitions > 0,
      "writeSized: target size, compression ratio and maxPartitions must be positive")
    val sentinel = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    val planEst = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estIn =
      if (planEst >= sentinel)
        BigInt(df.count()) * math.max(df.schema.defaultSize, 1)
      else planEst
    val estOut = (BigDecimal(estIn) / compressionRatio).toBigInt
    val tgt = BigInt(targetFileBytes)
    val n = ((estOut + tgt - 1) / tgt).max(1).min(maxPartitions).toInt
    write(df.repartition(n))
    n
  }

  /** Keep the latest `n` versions, delete older ones (vacuum). */
  def vacuum(keep: Int = 2): Unit = currentVersion.foreach { cur =>
    if (fs.exists(rootPath)) fs.listStatus(rootPath).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("v_") && name.stripPrefix("v_").toInt <= cur - keep) {
        val v = name.stripPrefix("v_").toInt
        if (bucketBy.isDefined)
          spark.sql(s"DROP TABLE IF EXISTS ${catalogName(v)}")
        fs.delete(st.getPath, true)
      }
    }
  }
}
