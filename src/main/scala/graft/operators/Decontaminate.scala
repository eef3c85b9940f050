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
  * sketched map-only (one pass, custom expression) and the hit count is
  * a broadcast-hash semi-join + partial aggregate. Zero corpus
  * shuffles besides the per-doc hit aggregate, which runs map-side
  * first (partial count on the already-doc-local exploded rows).
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
    // Sketch once: the hit semi-join and the final left join both read
    // this frame (see Dedup — Catalyst would otherwise re-scan and
    // re-sketch the corpus per consumer).
    val sh = docs.select(col(idCol),
        TextExpressions.hashedShingles(col(textCol), n).as("__sh"))
      .withColumn("__sz", size(col("__sh")))
      .localCheckpoint(true)
    val hits = sh.select(col(idCol), explode(col("__sh")).as("__g"))
      .join(broadcast(evalGrams), Seq("__g"))
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
    sh.join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contamination",
        when(col("__sz") === 0, 0.0)
          .otherwise(col("n_hits").cast("double") / col("__sz")))
      .withColumn("contaminated", col("contamination") >= threshold)
      .select(col(idCol), col("n_hits"), col("contamination"),
        col("contaminated"))
  }
}
