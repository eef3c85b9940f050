package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring: train an add-α-smoothed
  * bigram LM over a (reference) corpus, score each document by its
  * mean per-bigram negative log-likelihood — the CCNet-style "does
  * this read like the reference distribution" signal (Wenzek et al.
  * 2020 train a 5-gram KenLM on Wikipedia and bucket CommonCrawl by
  * perplexity; the bigram order here keeps the model a plain
  * aggregate, which is the part Spark should own — the statistical
  * shape is identical). Complements the rule-based
  * [[graft.functions.TextFunctions.qualityScore]] heuristics: those
  * catch structural garbage (punctuation soup, no stopwords), an LM
  * catches fluent-looking token salad the rules pass.
  *
  * Scale shape (the reason this is three aggregates and two joins, not
  * a model object): the model IS a pair of DataFrames — bigram counts
  * `(w1, w2, c12)` and context totals `(w1, c1)` — so "train" is one
  * corpus-sized shuffle (bigram groupBy, map-side partial counts bound
  * memory by the partition's distinct-bigram count) plus a vocab-sized
  * re-aggregate for contexts (derived from the bigram table — the
  * corpus is NOT re-shuffled for unigrams) and a one-row vocabulary
  * count. Scoring joins the scored corpus's per-doc bigram counts
  * against the model on the bigram key: the build side is one row per
  * key, so stopword-pair skew ("of the" at web scale) is AQE
  * skew-split territory; no broadcast is FORCED, so Catalyst
  * broadcasts a small model (it does at the fixture scales) and
  * sort-merge-joins a web-scale one instead of OOMing on a
  * vocab²-sized build side.
  * Nothing here is iterative and nothing collects to the driver — at
  * 100 TB the model tables land wherever the pipeline's other
  * aggregates land, and cross-corpus scoring (train on curated
  * reference, score raw crawl) is the same two joins against persisted
  * model parquet.
  *
  * Reference anchor: no LM surface exists in the reference (its
  * quality layer is dbt test predicates, `schema_transformed.yml`) —
  * this is part of the beyond-reference LLM-pipeline extension set
  * (SURVEY §2 ext), the trainability complement of
  * `q_text_quality`/`q_curate_corpus`.
  *
  * Tokenization is [[TextSearch.tokens]] (lowercased `[a-z0-9]+`
  * runs), mirrored verbatim by the DuckDB oracle; documents with fewer
  * than two tokens have no bigrams and are absent from the scored
  * output (the oracle restates the same exclusion).
  */
object TextLm {

  /** A trained bigram model: `bigrams` = `(w1, w2, c12)`, `contexts` =
    * `(w1, c1)` where `c1 = Σ_w2 c12`, `vocab` = one row `(v)` with
    * the corpus distinct-token count (the smoothing denominator's
    * event-space size). All three are unevaluated plans — persist with
    * [[graft.cdc.TableStore]] for build-once/score-many. */
  final case class Model(bigrams: DataFrame, contexts: DataFrame,
      vocab: DataFrame)

  /** Adjacent-token pairs per document: `(doc_id, w1, w2)`, one row
    * per bigram OCCURRENCE (duplicates preserved — counts happen at
    * the aggregate). `zip_with` over the array and its shift keeps the
    * pairing inside one codegen'd projection; no self-join on
    * position. */
  private def bigramOccurrences(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextSearch.tokens(col(textCol)).as("__t"))
    toks.where(size(col("__t")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("__t"), lit(1), size(col("__t")) - 1),
          slice(col("__t"), lit(2), size(col("__t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col("doc_id"), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
  }

  /** Train the bigram model on `docs`. One corpus-sized shuffle (the
    * bigram count); contexts re-aggregate the bigram table, vocabulary
    * is a single-row distinct count over the token stream. */
  def train(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Model = {
    val bg = bigramOccurrences(docs, textCol, idCol)
    val bigrams = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val contexts = bigrams.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = docs
      .select(explode(TextSearch.tokens(col(textCol))).as("__w"))
      .agg(countDistinct(col("__w")).as("v"))
    Model(bigrams, contexts, vocab)
  }

  /** Score `docs` against a trained model: `(doc_id, n_bigrams, nll)`
    * where `nll` is the mean negative log-likelihood per bigram under
    * `P(w2|w1) = (c12 + α) / (c1 + α·V)` (add-α smoothing; unseen
    * bigrams and unseen contexts coalesce to 0 counts, so cross-corpus
    * scoring of out-of-vocabulary text is well-defined — it just
    * scores as maximally surprising). Lower = more reference-like;
    * `exp(nll)` is the conventional perplexity, left to the caller so
    * the compared value stays in the numerically tame log domain. */
  def score(model: Model, docs: DataFrame, alpha: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val docBg = bigramOccurrences(docs, textCol, idCol)
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("__n"))
    scoreDocBigrams(docBg, model, alpha)
  }

  /** Shared scoring tail over an already-aggregated per-doc bigram
    * frame `(doc_id, w1, w2, __n)`. */
  private def scoreDocBigrams(docBg: DataFrame, model: Model,
      alpha: Double): DataFrame = {
    require(alpha > 0, "alpha must be positive (unsmoothed zeros => -inf log)")
    docBg
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.contexts, Seq("w1"), "left")
      // model.vocab is a ONE-ROW countDistinct aggregate (the scalar V
      // in add-α smoothing), not the vocabulary itself — this broadcast
      // is O(1) regardless of corpus size and needs no size gate.
      .crossJoin(broadcast(model.vocab))
      .withColumn("__lp", log(
        (coalesce(col("c12"), lit(0L)) + lit(alpha)) /
          (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("v"))))
      .groupBy("doc_id")
      .agg(sum("__n").as("n_bigrams"),
        (-sum(col("__lp") * col("__n")) / sum("__n")).as("nll"))
  }

  /** Self-scoring convenience: train on `docs`, score `docs` — the
    * "which documents look least like the rest of this corpus" outlier
    * probe (`q_quality_lm_score`). NOT `score(train(docs), docs)`:
    * self-scoring means the model counts are exactly the per-doc
    * counts summed, so the per-doc bigram aggregate is materialized
    * ONCE (localCheckpoint — both the scored side and the derived
    * model read it) and the model tables come from a distinct-(doc,
    * bigram)-sized re-aggregate instead of a second corpus-sized
    * explode + shuffle of raw occurrences. Same result, one fewer
    * corpus pass — the difference between 2n and n shuffled rows at
    * 100 TB. */
  def selfScore(docs: DataFrame, alpha: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val docBg = bigramOccurrences(docs, textCol, idCol)
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("__n"))
      .localCheckpoint(true)
    val bigrams = docBg.groupBy("w1", "w2").agg(sum("__n").as("c12"))
    val contexts = bigrams.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = docs
      .select(explode(TextSearch.tokens(col(textCol))).as("__w"))
      .agg(countDistinct(col("__w")).as("v"))
    scoreDocBigrams(docBg, Model(bigrams, contexts, vocab), alpha)
  }
}
