package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage clustering (Z-order): lay a table out so
  * parquet min/max stats prune MULTI-column range predicates — the
  * Delta/Iceberg `OPTIMIZE ZORDER BY` story. A lexicographic sort
  * clusters only its leading column (a predicate on the second column
  * alone intersects EVERY file); interleaving the columns' quantized
  * bits puts rows close in ALL dimensions into the same files, so a
  * selective box on any subset of the dimensions skips most of the
  * table. At 100 TB this is the difference between a full scan and
  * reading a few percent: row-group/file stats are the only index
  * parquet has, and they only bite when the layout gives each file a
  * tight bounding box ([[LayoutSpec]] pins the win: a second-column
  * box intersects every lexicographic file but a strict minority of
  * z-ordered ones, with identical query results).
  *
  * Shape: ONE bounded stats aggregate (a 1-row min/max frame, joined
  * back by broadcast — no driver collect), one map-only projection
  * computing the z-value (pure bitwise expression tree, whole-stage
  * codegen'd, `q_layout_zorder`-gated against a DuckDB restatement of
  * the same arithmetic), then `repartitionByRange` on the z-value
  * (Spark's range exchange samples — no global sort) and a
  * per-partition sort so every output file covers one tight z-run.
  * Nothing here is iterative; the only non-map stage is the range
  * exchange any clustered write pays.
  *
  * Quantization is affine min/max → `bits`-bit grid. Affine is exact
  * for the oracle and cheap, but skew concentrates cells — for a
  * heavy-tailed column, pre-transform (ln, rank-bucket via
  * [[graft.quality.Outliers]]-style quantiles) before handing it in.
  * NULLs quantize to cell 0 (they cluster with the minimum, keeping
  * NULL-heavy columns prunable rather than poisoning every file's
  * range with a NULL-sentinel spread).
  *
  * Reference anchor: the reference's only layout control is
  * ClickHouse `ORDER BY` single-key clustering (`schema_raw.sql`) —
  * this is its multi-dimensional generalization, part of the
  * beyond-reference extension set (SURVEY §2 ext, O2's sibling).
  */
object Layout {

  /** Bit-interleaved z-value over `qs`, each already an integer in
    * `[0, 2^bits)`: output bit `i·d + j` = bit `i` of `qs(j)`. A flat
    * OR of disjoint single-bit terms — constant-shape expression tree
    * (`d · bits` ops), fully codegen'd, no UDF. */
  private def interleave(qs: Seq[Column], bits: Int): Column = {
    val d = qs.size
    val terms = for {
      i <- 0 until bits
      j <- 0 until d
    } yield shiftleft(shiftright(qs(j), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Affine `bits`-bit quantization of `c` given its min/max (columns
    * from the broadcast stats row): `floor((c − min) · (2^bits − 1) /
    * (max − min))`, constant-column-safe (max == min → 0), NULL → 0.
    * Double arithmetic is IEEE-identical in Spark and DuckDB, so the
    * oracle restates this expression verbatim. */
  private def quantize(c: Column, mn: Column, mx: Column,
      bits: Int): Column = {
    val hi = (1L << bits) - 1
    when(c.isNull || mx <= mn, lit(0L)).otherwise(
      floor((c.cast("double") - mn.cast("double")) * lit(hi.toDouble) /
        (mx.cast("double") - mn.cast("double"))).cast("long"))
  }

  /** Append column `as` holding the z-value of `cols` (numeric
    * columns; `d · bits ≤ 63`). One bounded stats aggregate broadcast
    * back + one map-only projection. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 16,
      as: String = "__z"): DataFrame = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"need 1..63/bits columns, got ${cols.size} x $bits bits")
    val stats = df.agg(
      min(col(cols.head)).as(s"__mn0"),
      (max(col(cols.head)).as(s"__mx0") +:
        cols.tail.zipWithIndex.flatMap { case (c, i) =>
          Seq(min(col(c)).as(s"__mn${i + 1}"),
            max(col(c)).as(s"__mx${i + 1}"))
        }): _*)
    val qs = cols.zipWithIndex.map { case (c, j) =>
      quantize(col(c), col(s"__mn$j"), col(s"__mx$j"), bits)
    }
    df.crossJoin(broadcast(stats))
      .withColumn(as, interleave(qs, bits))
      .drop(cols.indices.flatMap(j => Seq(s"__mn$j", s"__mx$j")): _*)
  }

  /** Cluster `df` for writing: z-value → range exchange into
    * `numPartitions` (one output file per partition under a plain
    * `.write`) → per-partition z sort, helper column dropped. Pair
    * with [[graft.cdc.TableStore.writeSized]] when byte-targeted file
    * sizes matter more than an exact partition count. */
  def zorder(df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 16): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    zvalue(df, cols, bits)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Per-file bounding boxes of `cols` for a written parquet dir —
    * the pruning a stats-aware reader would do, made queryable:
    * `(file, mn_<c>, mx_<c>, rows)`. Evidence surface for
    * [[LayoutSpec]]; also the input to "which files does this box
    * touch" planning. */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"mn_$c"),
          max(col(c)).as(s"mx_$c"))): _*)

  /** How many files of `stats` ([[fileStats]] output) a conjunctive
    * box predicate `col -> (lo, hi)` cannot skip. */
  def filesTouched(stats: DataFrame, box: Map[String, (Long, Long)]): Long =
    stats.where(box.map { case (c, (lo, hi)) =>
      col(s"mx_$c") >= lo && col(s"mn_$c") <= hi
    }.reduce(_ && _)).count()

  /** Mixture-preserving shard assignment — every output shard carries
    * the GLOBAL domain mixture (±1 doc per domain), so a training
    * reader consuming shards sequentially (or any subset of them) sees
    * the planned data mix from the first shard on, instead of whatever
    * domain the writer happened to finish last (the reason webdataset/
    * Megatron-style loaders want interleaved shards, not per-domain
    * files). Docs are ranked WITHIN each domain by the deterministic
    * md5 draw (full 32-hex [[Sampling.hashDrawFull]], desc, ties id
    * desc — unreachable at 128 bits) and dealt round-robin:
    * `shard = (rank − 1) mod nShards`. The assignment is a pure
    * function of (ids, domains, nShards, seed) — engine-, run- and
    * partitioning-invariant, so a re-run or a second engine lays out
    * identical shards.
    *
    * Scale: the per-domain rank is [[Sampling.drawRunningSum]] with
    * `__w = 1` — the bucketed two-pass prefix, NOT a per-domain
    * window, so a hot domain never serializes through one task. Rows
    * with a NULL domain drop (no mixture to preserve). Compose with
    * `df.repartition(col("shard"))` + [[graft.cdc.TableStore]] to
    * materialize one file per shard. */
  def mixtureShards(df: DataFrame, idCol: String, domainCol: String,
      nShards: Int, seed: String = "0"): DataFrame = {
    require(nShards >= 1, s"nShards must be positive: $nShards")
    val narrow = df
      .where(col(domainCol).isNotNull)
      .select(col(idCol), col(domainCol).cast("string").as("__dom"),
        lit(1L).as("__w"), Sampling.hashDrawFull(col(idCol), seed).as("__draw"))
    Sampling.drawRunningSum(narrow, idCol)
      .select(col(idCol), col("__dom").as("domain"),
        ((col("__cum") - 1L) % nShards).cast("long").as("shard"))
  }
}
