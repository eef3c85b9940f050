package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions

/** Incremental near-dup detection against a PERSISTED signature index —
  * the batch-arrival form of [[Dedup.minhashLsh]].
  *
  * At 100 TB the corpus is never re-sketched per arriving batch: the
  * index stores each accepted document's banded MinHash keys plus its
  * shingle hashes (for exact-Jaccard verification), so admitting a new
  * batch costs `sketch(batch) + probe(index on (band, band_hash))
  * + verify(candidates)` — compute proportional to the BATCH, not the
  * corpus. In that probe the BATCH side is the small one: it
  * broadcasts (AQE picks this up at any realistic batch:index ratio),
  * AND a bloom filter of the batch's (band, band_hash) keys — built
  * driver-side per batch, batch-bounded — is applied directly on the
  * index scan, so only ~candidate rows (plus the 1% fpp) ever reach
  * the join; everything else dies inside the scan's codegen stage. No
  * index shuffle, no index aggregate, no array bytes touched until a
  * candidate pair exists. Persisted through [[graft.cdc.AppendStore]]
  * segments declared with [[indexSortCols]], index files are CLUSTERED
  * by `(__band, __bh, id)`: the band probe's pushed-down `__band >= 0`
  * and [[admitted]]'s pushed `(__band = -1, id range)` predicates skip
  * whole row groups, so per-batch index IO shrinks toward the row
  * groups the batch's keys can actually touch instead of the full
  * accumulated index.
  *
  * Index layout — TWO row kinds in one frame (same narrow-legs trick
  * as [[Dedup.minhashLsh]]'s band join):
  *
  *   - band rows `(id, __band ∈ [0, bands), __bh, __sh = NULL)` — what
  *     the per-batch candidate join reads; NARROW, no arrays.
  *   - one array row per doc `(id, __band = -1, __bh = NULL, __sh)` —
  *     the shingle set, stored ONCE, attached per unique candidate
  *     pair at verify time.
  *
  * A prior layout carried `__sh` on every band row — a `bands`×
  * duplication of every shingle set in the persisted index (32× index
  * storage at the defaults) that also shipped the arrays through the
  * candidate join. Measured effect of the split at sf0.1: the
  * end-to-end drain key (`q_stream_curate`) dropped ~2× on the index
  * write alone.
  *
  * Flow per batch: `matches = matchAgainst(index, batch)` → route the
  * matched ids to the dedup policy (drop / cluster with
  * [[Dedup.clusters]]) → `index = append(index, batch, matches)` for
  * the admitted survivors.
  */
object IncrementalDedup {

  /** `__band` marker for the one-array-row-per-doc kind. */
  private[graft] val ArrayRowBand = -1

  /** Clustering key for the persisted index's [[graft.cdc.AppendStore]]
    * segments: band rows sort by their probe key `(__band, __bh)` and
    * the array rows (`__band = -1`, `__bh` NULL) cluster together at
    * the front ordered by id — so both probe shapes (the band join's
    * `__band >= 0` + bloom, [[admitted]]'s `__band = -1` + id range)
    * get tight parquet row-group stats to prune against. */
  def indexSortCols(idCol: String = "doc_id"): Seq[String] =
    Seq("__band", "__bh", idCol)

  /** Index rows from a [[Dedup.docSignatures]] frame: narrow band rows
    * derived via [[Dedup.bandRows]] plus one array row per doc — no
    * groupBy, no extra shuffle. */
  private def toIndexRows(sig: DataFrame, idCol: String, k: Int,
      bands: Int): DataFrame = {
    val bandLegs = Dedup.bandRows(sig, idCol, k, bands)
      .select(col(idCol), col("__band"), col("__bh"),
        lit(null).cast("array<bigint>").as("__sh"))
    val arrays = sig.select(col(idCol), lit(ArrayRowBand).as("__band"),
      lit(null).cast("bigint").as("__bh"), col("__sh"))
    bandLegs.unionByName(arrays)
  }

  /** Build the initial signature index from an accepted corpus. */
  def index(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 128, bands: Int = 32,
      shingleWords: Int = 3): DataFrame =
    indexFromSignatures(
      Dedup.docSignatures(docs, textCol, idCol, k, shingleWords),
      idCol, k, bands)

  /** [[index]] from a precomputed [[Dedup.docSignatures]] frame — what
    * the streaming drain uses so one batch sketch feeds intra-dedup,
    * the index probe AND the index append. */
  def indexFromSignatures(sig: DataFrame, idCol: String = "doc_id",
      k: Int = 128, bands: Int = 32): DataFrame =
    toIndexRows(sig, idCol, k, bands)

  /** Near-dup pairs of `newDocs` against the indexed corpus:
    * (new_id, dup_of, jaccard ≥ threshold). Never compares new docs
    * against each other — run [[Dedup.minhashLsh]] on the batch for
    * intra-batch pairs if needed. */
  def matchAgainst(index: DataFrame, newDocs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", k: Int = 128,
      bands: Int = 32, threshold: Double = 0.5, shingleWords: Int = 3)
      : DataFrame =
    matchAgainstSignatures(index,
      Dedup.docSignatures(newDocs, textCol, idCol, k, shingleWords),
      idCol, k, bands, threshold)

  /** [[matchAgainst]] from a precomputed [[Dedup.docSignatures]]
    * frame. */
  def matchAgainstSignatures(index: DataFrame, sig: DataFrame,
      idCol: String = "doc_id", k: Int = 128, bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    // Batch-bounded bloom over the batch's (band, bh) keys, applied ON
    // the index scan: the broadcast join alone would still feed every
    // index band row into the probe; with the bloom, non-candidate
    // rows die inside the scan's codegen stage, and with the sorted
    // segment layout ([[indexSortCols]]) the pushed `__band >= 0`
    // skips the array-row row groups outright. Cost: one count + one
    // aggregate over the CHECKPOINTED batch sketch — O(batch).
    val nDocs = sig.count()
    if (nDocs == 0)
      return sig.select(col(idCol).as("new_id"),
        col(idCol).as("dup_of"), lit(0.0).as("jaccard")).limit(0)
    val bandKey = xxhash64(col("__band"), col("__bh"))
    val freshBandRows = Dedup.bandRows(sig, idCol, k, bands)
    val batchKeyBloom =
      freshBandRows.stat.bloomFilter(bandKey, nDocs * bands, 0.01)
    val freshBands = freshBandRows
      .select(col(idCol).as("new_id"), col("__band"), col("__bh"))
    val freshArr = sig
      .select(col(idCol).as("new_id"), col("__sh").as("sh_new"))
    val oldBands = index.where(col("__band") >= 0)
      .where(BloomFunctions.mightContainLong(batchKeyBloom, bandKey))
      .select(col(idCol).as("dup_of"), col("__band"), col("__bh"))
    val oldArr = index.where(col("__band") === ArrayRowBand)
      .select(col(idCol).as("dup_of"), col("__sh").as("sh_old"))
    freshBands.join(oldBands, Seq("__band", "__bh"))
      // a replayed batch re-sends docs already in the index: a doc is
      // never its own duplicate
      .where(col("new_id") =!= col("dup_of"))
      .select("new_id", "dup_of").distinct()
      // arrays attach per unique candidate pair — they never ride the
      // band shuffle
      .join(freshArr, Seq("new_id"))
      .join(oldArr, Seq("dup_of"))
      .withColumn("jaccard", Dedup.jaccard(col("sh_new"), col("sh_old")))
      .where(col("jaccard") >= threshold)
      .select("new_id", "dup_of", "jaccard")
  }

  /** The docs of `newDocs` the dedup policy ADMITS this batch: no match
    * in `matches` and not already indexed. The second check makes the
    * transition idempotent under a re-delivered batch OR a doc resent
    * in a LATER batch (`matchAgainst` filters self-matches by id, so an
    * exact resend would otherwise be re-admitted).
    *
    * The membership check is BATCH-BOUNDED, never a corpus aggregate,
    * under EITHER id distribution:
    *
    *   - clustered ids (monotone ingest sequence): the `[min, max]`
    *     id-range predicate pushes down to parquet, and the sorted
    *     segment layout ([[indexSortCols]]) gives the array-row id
    *     column tight row-group stats — whole row groups skip;
    *   - random ids (UUID-hash style): the range covers the whole
    *     index and prunes nothing, so a bloom over the BATCH's ids
    *     (driver-built, batch-bounded — the same
    *     [[graft.functions.BloomFunctions.mightContainLong]] probe the
    *     band join uses) is applied ON the array-row scan: non-batch
    *     ids die inside the scan's codegen stage instead of feeding
    *     the join.
    *
    * Either way the scan stays map-only and column-pruned to the id;
    * the broadcast semi-join against the batch's ids then removes the
    * bloom's ~fpp false positives exactly, and the surviving `present`
    * set (≤ batch) broadcasts into the final anti-join. A prior shape
    * ran `index.select(id).distinct()` here — a corpus-wide
    * shuffle-aggregate every batch. */
  def admitted(index: DataFrame, newDocs: DataFrame, matches: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val fresh = newDocs
      .join(matches.select(col("new_id").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
    // bounded action: min/max/count of the batch's own ids
    val bounds = newDocs
      .agg(min(col(idCol)), max(col(idCol)), count(lit(1))).head()
    if (bounds.isNullAt(0)) return fresh // empty batch
    val idBloom = newDocs.stat.bloomFilter(
      col(idCol), math.max(bounds.getLong(2), 1L), 0.01)
    val present = index
      .where(col("__band") === ArrayRowBand &&
        col(idCol) >= lit(bounds.get(0)) && col(idCol) <= lit(bounds.get(1)))
      .where(BloomFunctions.mightContainLong(idBloom, col(idCol)))
      .select(col(idCol))
      .join(broadcast(newDocs.select(col(idCol))), Seq(idCol), "left_semi")
    fresh.join(broadcast(present), Seq(idCol), "left_anti")
  }

  /** Next index state: previous index + signatures of the ADMITTED new
    * docs (those without a match). `matches` is [[matchAgainst]]'s
    * output for this batch. */
  def append(index: DataFrame, newDocs: DataFrame, matches: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", k: Int = 128,
      bands: Int = 32, shingleWords: Int = 3): DataFrame =
    index.unionByName(indexFromSignatures(
      Dedup.docSignatures(admitted(index, newDocs, matches, idCol),
        textCol, idCol, k, shingleWords), idCol, k, bands))
}
