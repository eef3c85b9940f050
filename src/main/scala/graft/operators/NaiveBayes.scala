package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification — the trained
  * "model-based filter" pillar of LLM data curation (the shape of
  * fastText-style quality/domain classifiers: GPT-3's WebText-vs-crawl
  * LR filter, CCNet's language buckets, FineWeb-Edu's educational-value
  * scorer are all linear bag-of-words models; multinomial NB is the
  * counting-form member of that family, and the one whose training IS
  * a SQL aggregate — which is why the whole train+score pipeline is
  * exactly DuckDB-restatable, gate `q_text_classify_nb`). Complements
  * the UNsupervised quality signals ([[TextLm]] perplexity,
  * `q_text_quality` rules): here the operator learns from LABELED
  * examples (domain tags, curated-vs-raw provenance) and routes new
  * documents.
  *
  * Scale shape: the model IS three DataFrames — per-(label, token)
  * counts, per-label token totals, per-label doc priors — so "train"
  * is ONE corpus-sized shuffle (the `(doc, label, token)` distinct
  * count, map-side combined) plus model-sized re-aggregates; nothing
  * iterates and nothing collects. Scoring explodes each doc's distinct
  * tokens × |labels| (a small constant), left-joins the weight table
  * on `(token, label)`, and sums per `(doc, label)` with map-side
  * partial aggregation — the shuffle carries ≤ |labels| rows per doc
  * per partition. The weight table is `|vocab| × |labels|` rows at
  * worst; [[hashTokens]] is the 100 TB cap: the hashing trick folds
  * the vocabulary into 2^b buckets so the weight table is bounded and
  * broadcast-joinable no matter the corpus (spec pins that a separable
  * fixture still classifies correctly through the fold).
  *
  * Smoothing: add-α over the event space of the corpus vocabulary
  * `V`, i.e. `P(t|c) = (c_tc + α) / (n_c + α·V)` — tokens a class
  * never saw (and tokens NO class saw, for cross-corpus scoring) get
  * the floor probability instead of -∞.
  *
  * Reference anchor: no classifier surface exists in the reference
  * (its routing is dbt test predicates); this is the beyond-reference
  * LLM-pipeline extension set (SURVEY §2 ext), the supervised
  * complement of `q_quality_lm_score`.
  *
  * Tokenization is [[TextSearch.tokens]] (lowercased `[a-z0-9]+`
  * runs), mirrored verbatim by the DuckDB oracle; documents with zero
  * tokens are absent from the scored output on both sides.
  */
object NaiveBayes {

  /** A trained model, all unevaluated plans (persist the three frames
    * with [[graft.cdc.TableStore]] for train-once/score-many):
    * `weights` = `(label, token, c)` observed counts; `classTotals` =
    * `(label, n_tok)` with `n_tok = Σ_token c`; `priors` = `(label,
    * n_docs, n_total)` doc counts (prior = `n_docs / n_total`);
    * `vocab` = one row `(v)`, the corpus distinct-token count. */
  final case class Model(weights: DataFrame, classTotals: DataFrame,
      priors: DataFrame, vocab: DataFrame)

  /** Train on labeled `docs`. One corpus-sized shuffle (the per-doc
    * token count); the weight table, class totals, priors, and
    * vocabulary are all re-aggregates of that frame or of the doc
    * list — the corpus is never exploded twice. */
  def train(docs: DataFrame, labelCol: String = "lang",
      textCol: String = "text", idCol: String = "doc_id",
      tokenize: Column => Column = TextSearch.tokens): Model = {
    val dt = docs.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
        tokenize(col(textCol)).as("__t"))
      .where(size(col("__t")) > 0)
    val docTok = dt
      .select(col("doc_id"), col("label"), explode(col("__t")).as("token"))
      .groupBy("doc_id", "label", "token").agg(count(lit(1)).as("__n"))
    fromDocTokens(docTok, dt.groupBy("label").agg(count(lit(1)).as("n_docs")))
  }

  /** Model tables derived from an already-aggregated labeled per-doc
    * token frame `(doc_id, label, token, __n)` — shared by [[train]]
    * and [[selfScore]] (which materializes that frame once). */
  private def fromDocTokens(docTok: DataFrame, docCounts: DataFrame)
      : Model = {
    val weights = docTok.groupBy("label", "token").agg(sum("__n").as("c"))
    val classTotals = weights.groupBy("label").agg(sum("c").as("n_tok"))
    val priors = docCounts.crossJoin(
      broadcast(docCounts.agg(sum("n_docs").as("n_total"))))
    val vocab = docTok.agg(countDistinct(col("token")).as("v"))
    Model(weights, classTotals, priors, vocab)
  }

  /** Score `docs` against a trained model: `(doc_id, rank, label,
    * logpost)` — ALL classes per doc, ranked by joint log-posterior
    * `ln(prior) + Σ_t n_t · ln((c_tc + α)/(n_c + α·V))` descending
    * (ties by label, so ranking is a total order). `rank = 1` is the
    * prediction; emitting the full per-class posterior keeps the
    * margin available for downstream confidence cuts (route only when
    * `logpost₁ − logpost₂` clears a bar) at zero extra cost. */
  def score(model: Model, docs: DataFrame, alpha: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id",
      tokenize: Column => Column = TextSearch.tokens): DataFrame = {
    val docTok = docs
      .select(col(idCol).as("doc_id"), tokenize(col(textCol)).as("__t"))
      .where(size(col("__t")) > 0)
      .select(col("doc_id"), explode(col("__t")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("__n"))
    scoreDocTokens(docTok, model, alpha)
  }

  /** Shared scoring tail over `(doc_id, token, __n)`. The label grid
    * is a broadcast cross join (|labels| is a small constant); the
    * weight join is LEFT so unseen `(token, label)` pairs coalesce to
    * the smoothing floor. */
  private def scoreDocTokens(docTok: DataFrame, model: Model,
      alpha: Double): DataFrame = {
    require(alpha > 0, "alpha must be positive (unsmoothed zeros => -inf log)")
    val labels = model.classTotals.select(col("label"), col("n_tok"))
    val scored = docTok
      .crossJoin(broadcast(labels))
      .join(model.weights, Seq("token", "label"), "left")
      .crossJoin(broadcast(model.vocab))
      .withColumn("__lp", log(
        (coalesce(col("c"), lit(0L)) + lit(alpha)) /
          (col("n_tok") + lit(alpha) * col("v"))))
      .groupBy("doc_id", "label")
      .agg(sum(col("__n") * col("__lp")).as("__s"))
      .join(broadcast(model.priors), Seq("label"))
      .withColumn("logpost",
        log(col("n_docs").cast("double") / col("n_total")) + col("__s"))
    scored.select(col("doc_id"),
        row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("logpost").desc, col("label"))).cast("long").as("rank"),
        col("label"), col("logpost"))
  }

  /** Self-classification convenience: train on `docs`' own labels,
    * score `docs` (`q_text_classify_nb` — "which class does each doc's
    * TEXT look like", the label-vs-content consistency probe; rank-1
    * disagreeing with the stored label flags mislabeled rows). NOT
    * `score(train(docs), docs)`: the labeled per-doc token aggregate
    * is materialized ONCE (localCheckpoint) and both the model tables
    * and the scored side re-aggregate it — one corpus explode instead
    * of two, the same 2n→n shuffle cut as [[TextLm.selfScore]]. */
  def selfScore(docs: DataFrame, labelCol: String = "lang",
      alpha: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id",
      tokenize: Column => Column = TextSearch.tokens): DataFrame = {
    val dt = docs.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
        tokenize(col(textCol)).as("__t"))
      .where(size(col("__t")) > 0)
    val docTok = dt
      .select(col("doc_id"), col("label"), explode(col("__t")).as("token"))
      .groupBy("doc_id", "label", "token").agg(count(lit(1)).as("__n"))
      .localCheckpoint(true)
    val model = fromDocTokens(docTok,
      dt.groupBy("label").agg(count(lit(1)).as("n_docs")))
    scoreDocTokens(docTok.select("doc_id", "token", "__n"), model, alpha)
  }

  /** The hashing-trick tokenizer: fold tokens into `buckets` string
    * buckets (`xxhash64` mod — Spark-native, one codegen'd pass) so
    * the weight table is ≤ `buckets × |labels|` rows no matter the
    * corpus vocabulary. Pass as `tokenize` to [[train]]/[[score]]
    * (same fold on both, or scores are garbage). Bucket ids are
    * strings so hashed and raw models share every code path. */
  def hashTokens(buckets: Int)(c: Column): Column = {
    require(buckets > 0, "buckets must be positive")
    transform(TextSearch.tokens(c),
      t => pmod(xxhash64(t), lit(buckets.toLong)).cast("string"))
  }
}
