package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-dup detection against a PERSISTED signature index —
  * the batch-arrival form of [[Dedup.minhashLsh]].
  *
  * At 100 TB the corpus is never re-sketched per arriving batch: the
  * index stores each accepted document's banded MinHash keys plus its
  * shingle hashes (for exact-Jaccard verification), so admitting a new
  * batch costs `sketch(batch) + join(batch×index on (band, band_hash))
  * + verify(candidates)` — work proportional to the BATCH, not the
  * corpus. Landing the index in a `TableStore(bucketBy = Some((n,
  * Seq("__band", "__bh"))))` makes the index side of that join
  * exchange-free on every batch (BucketingSpec pattern).
  *
  * Flow per batch: `matches = matchAgainst(index, batch)` → route the
  * matched ids to the dedup policy (drop / cluster with
  * [[Dedup.clusters]]) → `index = append(index, batch, matches)` for
  * the admitted survivors.
  */
object IncrementalDedup {

  /** Build the initial signature index from an accepted corpus. Schema:
    * (idCol, __sh, __band, __bh) — one row per (doc, band). */
  def index(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 128, bands: Int = 32,
      shingleWords: Int = 3): DataFrame =
    Dedup.bandedSignatures(docs, textCol, idCol, k, bands, shingleWords)

  /** Near-dup pairs of `newDocs` against the indexed corpus:
    * (new_id, dup_of, jaccard ≥ threshold). Never compares new docs
    * against each other — run [[Dedup.minhashLsh]] on the batch for
    * intra-batch pairs if needed. */
  def matchAgainst(index: DataFrame, newDocs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", k: Int = 128,
      bands: Int = 32, threshold: Double = 0.5, shingleWords: Int = 3)
      : DataFrame = {
    val fresh = Dedup.bandedSignatures(newDocs, textCol, idCol, k, bands,
      shingleWords)
      .select(col(idCol).as("new_id"), col("__sh").as("sh_new"),
        col("__band"), col("__bh"))
    val old = index.select(col(idCol).as("dup_of"), col("__sh").as("sh_old"),
      col("__band"), col("__bh"))
    fresh.join(old, Seq("__band", "__bh"))
      // a replayed batch re-sends docs already in the index: a doc is
      // never its own duplicate
      .where(col("new_id") =!= col("dup_of"))
      .select("new_id", "dup_of", "sh_new", "sh_old").distinct()
      .withColumn("jaccard", Dedup.jaccard(col("sh_new"), col("sh_old")))
      .where(col("jaccard") >= threshold)
      .select("new_id", "dup_of", "jaccard")
  }

  /** The docs of `newDocs` the dedup policy ADMITS this batch: no match
    * in `matches` and not already indexed. The second anti-join makes
    * the transition replay-idempotent — a re-delivered batch's docs are
    * already in the index, so its admitted set is EMPTY and every
    * downstream consumer (index append, split labeling, contamination
    * flags) converges instead of double-processing. */
  def admitted(index: DataFrame, newDocs: DataFrame, matches: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    newDocs
      .join(matches.select(col("new_id").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      .join(index.select(col(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Next index state: previous index + signatures of the ADMITTED new
    * docs (those without a match). `matches` is [[matchAgainst]]'s
    * output for this batch. */
  def append(index: DataFrame, newDocs: DataFrame, matches: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", k: Int = 128,
      bands: Int = 32, shingleWords: Int = 3): DataFrame =
    index.unionByName(Dedup.bandedSignatures(
      admitted(index, newDocs, matches, idCol), textCol, idCol, k, bands,
      shingleWords))
}
