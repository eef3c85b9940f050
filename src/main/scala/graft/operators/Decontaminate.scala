package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Benchmark decontamination — flag training documents that overlap an
  * evaluation set (the standard pre-training hygiene step: a benchmark
  * question leaking into the corpus inflates eval scores).
  *
  * Contamination score per doc = |distinct doc n-grams ∩ eval n-gram
  * dictionary| / |distinct doc n-grams| (GPT-3-appendix-style n-gram
  * containment, with the same DISTINCT-shingle semantics as
  * [[graft.functions.HashedShingles]]: docs with ≤ n tokens contribute
  * one whole-text shingle).
  *
  * Scale: the eval set is benchmarks — KBs-to-MBs, thousands of docs —
  * so its distinct-shingle dictionary BROADCASTS; the 100 TB corpus is
  * sketched in ONE pass (custom expression, one kernel run per row),
  * exploded with the doc's shingle count riding each row (O(1) array
  * length, no array bytes duplicated), broadcast-LEFT-joined against
  * the dictionary, and aggregated per doc — map-side partial counts on
  * the already-doc-local rows, so the ONLY corpus shuffle is the tiny
  * per-doc (id, sz, hits) aggregate. `explode_outer` keeps empty docs
  * in the aggregate, so no second corpus scan or join-back exists (a
  * prior shape localCheckpointed the corpus-wide shingle arrays and
  * re-joined them — an O(corpus) materialization this plan avoids
  * entirely).
  */
object Decontaminate {

  /** Per-doc contamination against `evalDocs`. Returns every corpus doc
    * with `n_hits`, `contamination` ∈ [0,1], and the `contaminated`
    * flag at `threshold`. */
  def flag(docs: DataFrame, evalDocs: DataFrame, n: Int = 3,
      threshold: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(TextExpressions.hashedShingles(col(textCol), n)).as("__g"))
      .distinct()
      .withColumn("__hit", lit(1))
    docs
      .select(col(idCol), TextExpressions.hashedShingles(col(textCol), n).as("__sh"))
      .select(col(idCol), size(col("__sh")).as("__sz"),
        explode_outer(col("__sh")).as("__g"))
      // Forced broadcast is valid because eval SETS are small by
      // nature (benchmark suites: thousands of docs, MBs of grams) —
      // the bound is the use case, not the data. Corpus-vs-corpus
      // decontamination (an unbounded "eval" side) must NOT go through
      // this hint: that is exactly what [[Bloom.flag]] exists for
      // (O(config) bitmap, map-only probe).
      .join(broadcast(evalGrams), Seq("__g"), "left")
      .groupBy(col(idCol), col("__sz"))
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
      .withColumn("contamination",
        when(col("__sz") === 0, 0.0)
          .otherwise(col("n_hits").cast("double") / col("__sz")))
      .withColumn("contaminated", col("contamination") >= threshold)
      .select(col(idCol), col("n_hits"), col("contamination"),
        col("contaminated"))
  }
}
