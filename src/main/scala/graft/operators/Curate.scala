package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** End-to-end training-corpus curation — the composition the engine
  * exists for (C4/RefinedWeb-style): score → filter → exact dedup →
  * near-dup cluster representative selection, all as one declarative
  * plan.
  *
  * Stages (each individually oracle-verified by its own query key):
  *  1. heuristic quality score ([[TextFunctions.qualityScore]]) and
  *     language ID ([[TextFunctions.langId]]) — map-only;
  *  2. keep docs with `quality >= minQuality` and detected language in
  *     `langs`;
  *  3. exact dedup (lowest id per identical text — one hash shuffle);
  *  4. n-gram-Jaccard near-dup pairs within language blocks
  *     (inverted-index join) → connected components → keep each
  *     cluster's canonical (minimum-id) representative.
  *
  * Scale: no stage is quadratic in the corpus; the expensive shuffles
  * are the exact-dedup hash and the shingle inverted index, both key
  * shuffles a 1000-executor cluster spreads evenly. For incremental
  * arrival compose with [[IncrementalDedup]] instead of stage 4.
  */
object Curate {

  /** The shared funnel behind [[corpus]] and [[report]]: the final
    * representatives frame. With `obs` present, the raw/kept counts
    * (scan observation) and the unique count attach as
    * `CollectMetrics` nodes to the ONE materialization this plan
    * already performs — [[report]]'s per-stage counts then cost zero
    * extra passes (they are accumulator side-outputs of the eager
    * `unique` checkpoint), instead of a second raw scan plus a kept
    * checkpoint. */
  private def funnel(docs: DataFrame, minQuality: Double,
      langs: Seq[String], jaccard: Double, textCol: String, idCol: String,
      maxShingleDf: Long, maxDupGram: Double,
      obs: Option[(org.apache.spark.sql.Observation,
        org.apache.spark.sql.Observation)] = None): DataFrame = {
    val scored = docs
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("lang_detected", TextFunctions.langId(col(textCol)))
    // Optional Gopher-style repetition cut (off at the 1.0 default —
    // the declared key's oracle restates only quality+langid). The
    // kernel only enters the plan when the cut can bite.
    val langQual = col("quality") >= minQuality &&
      col("lang_detected").isin(langs: _*)
    val keepPred =
      if (maxDupGram >= 1.0) langQual
      else langQual &&
        TextFunctions.dupGramFraction(col(textCol)) <= maxDupGram
    // the scan observation counts every scored row (raw) and the
    // filter survivors (kept) in the same pass the filter runs in
    val kept = obs match {
      case Some((scanObs, _)) =>
        scored.observe(scanObs, count(lit(1)).as("n_raw"),
          coalesce(sum(when(keepPred, 1L).otherwise(0L)), lit(0L))
            .as("n_kept"))
          .where(keepPred)
      case None => scored.where(keepPred)
    }
    // Materialized once, consumed twice (pair generation + final
    // representative join). localCheckpoint instead of cache(): cached
    // plans stay registered in the session CacheManager until an
    // explicit unpersist nobody here can safely issue (the returned
    // plan still needs the data), leaking a corpus-sized cache entry
    // per corpus() call; checkpoint blocks are RDD-level storage the
    // ContextCleaner reclaims as soon as the result frame is GC'd.
    // The eager checkpoint is ALSO what fires the observations exactly
    // once — without it the twice-consumed subplan would double-count.
    val uniqueBase = Dedup.exact(kept, textCol, idCol)
    val unique = (obs match {
      case Some((_, uniqueObs)) =>
        uniqueBase.observe(uniqueObs, count(lit(1)).as("n_unique"))
      case None => uniqueBase
    }).localCheckpoint(true)
    val pairs = Dedup.ngramJaccardPairs(unique,
      blockCols = Seq("lang_detected"), textCol = textCol, idCol = idCol,
      threshold = jaccard, maxShingleDf = maxShingleDf)
    val reps = Dedup.clusters(pairs)
    // representative = the cluster's min member (its own label); docs in
    // no near-dup pair pass through (left join, null cluster)
    unique
      .join(reps.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .where(col("cluster_id").isNull || col("cluster_id") === col(idCol))
  }

  def corpus(docs: DataFrame, minQuality: Double = 0.7,
      langs: Seq[String] = Seq("en"), jaccard: Double = 0.3,
      textCol: String = "text", idCol: String = "doc_id",
      maxShingleDf: Long = Dedup.DefaultMaxShingleDf,
      maxDupGram: Double = 1.0): DataFrame =
    funnel(docs, minQuality, langs, jaccard, textCol, idCol,
      maxShingleDf, maxDupGram)
      .select(col(idCol), col("lang_detected"), col("quality"))

  /** The curation FUNNEL REPORT — the per-stage survivor counts every
    * production corpus pipeline publishes with each release (what
    * fraction died to the language/quality gate vs exact dedup vs
    * near-dup clustering): one row per stage,
    * `(stage_idx, stage, n_docs)` for raw → lang_quality →
    * exact_unique → near_dup_reps. Same parameters and EXACTLY the
    * same stage frames as [[corpus]] (shared [[funnel]]), so the
    * report provably describes the corpus the composition would ship.
    *
    * Eager by contract (the counts are actions at construction — the
    * [[Pack.sequences]]/[[topFraction]] convention): cost is STRICTLY
    * ONE corpus pass — raw/kept/unique ride the funnel's single eager
    * materialization as `Observation` (CollectMetrics accumulator)
    * side-outputs, so no stage is scanned or executed a second time;
    * the only separate action is the final representatives count,
    * which reads the `unique` checkpoint (never the raw corpus).
    */
  def report(docs: DataFrame, minQuality: Double = 0.7,
      langs: Seq[String] = Seq("en"), jaccard: Double = 0.3,
      textCol: String = "text", idCol: String = "doc_id",
      maxShingleDf: Long = Dedup.DefaultMaxShingleDf,
      maxDupGram: Double = 1.0): DataFrame = {
    val scanObs = new org.apache.spark.sql.Observation()
    val uniqueObs = new org.apache.spark.sql.Observation()
    val finals = funnel(docs, minQuality, langs, jaccard,
      textCol, idCol, maxShingleDf, maxDupGram,
      obs = Some((scanObs, uniqueObs)))
    // the funnel's eager checkpoint already fired both observations;
    // .get just reads the captured rows (no job, no blocking wait)
    val nFinal = finals.count()
    val scan = scanObs.get
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(
      (0, "raw", scan("n_raw").asInstanceOf[Long]),
      (1, "lang_quality", scan("n_kept").asInstanceOf[Long]),
      (2, "exact_unique", uniqueObs.get("n_unique").asInstanceOf[Long]),
      (3, "near_dup_reps", nFinal))
      .toDF("stage_idx", "stage", "n_docs")
  }

  /** [[corpus]] plus the span-level scrub — stage 5 of the full
    * curation story: after document-level filtering and dedup, remove
    * CROSS-doc repeated spans (boilerplate that survives whole-doc
    * near-dup because the surrounding text differs) from the
    * survivors' texts via [[Dedup.spanDedup]]. Returns one row per
    * surviving doc: `(id, text_dedup, n_spans, n_spans_kept)` — the
    * reassembled text with first-occurrence-wins span provenance.
    * Same non-quadratic scale story as the stages it composes; the
    * span pass adds one skew-safe hash aggregate + equi-join + per-doc
    * regroup over the (already reduced) survivor set. */
  /** Keep the top `frac` of documents by heuristic quality score — the
    * relative (distribution-anchored) counterpart to [[corpus]]'s
    * absolute `minQuality` cut: "keep the best 20%" holds meaning
    * across corpora whose score distributions drift, where a fixed
    * threshold silently keeps 3% of one crawl and 60% of the next.
    *
    * Scale shape: scoring is map-only; the threshold is ONE
    * `approx_percentile` pass (mergeable quantile sketch — no sort, no
    * single-partition window; the exact-rank alternatives either
    * globally sort 100 TB or funnel top-frac·n rows through one node).
    * The scored frame is localCheckpoint'd so the threshold pass and
    * the filter pass read one materialization — construction is
    * therefore EAGER (same contract as [[Pack.sequences]]), and both
    * passes see identical scores even over a nondeterministic source.
    * Returns `(idCol, quality, threshold)` for kept docs; the gate key
    * pins n_total exactly plus the structural cut invariant
    * (max dropped < min kept) and the kept-fraction tolerance. */
  def topFraction(docs: DataFrame, frac: Double = 0.2,
      textCol: String = "text", idCol: String = "doc_id",
      accuracy: Int = 10000): DataFrame = {
    require(frac > 0.0 && frac < 1.0, s"frac must be in (0,1): $frac")
    val scored = docs.select(col(idCol),
        TextFunctions.qualityScore(col(textCol)).as("quality"))
      .localCheckpoint(true)
    val thr = scored.agg(percentile_approx(col("quality"),
      lit(1.0 - frac), lit(accuracy)).as("__thr"))
    scored.crossJoin(broadcast(thr))
      .where(col("quality") >= col("__thr"))
      .select(col(idCol), col("quality"), col("__thr").as("threshold"))
  }

  /** Quality-threshold yield curve — the tuning table behind the
    * `minQuality` knob: for each threshold `i/buckets` (i = 0..buckets)
    * the number of docs and the number of tokens that survive
    * `quality >= i/buckets`. Thresholds are emitted as the INTEGER
    * numerator `thr_num` (denominator = `buckets`), so the output
    * carries no float column and the oracle comparison is exact; the
    * per-doc bucket `floor(quality·buckets)` is computed from the same
    * quality double both engines already hash-match on (the curate
    * keys emit it raw), so the bucketing itself is cross-engine exact
    * too.
    *
    * Scale: map-only score + a `sequence(0, bucket)` explode (≤
    * buckets+1 rows per doc) into ONE partially-aggregated groupBy —
    * the shuffle carries ≤ (buckets+1) rows per map task, not the
    * corpus. No windows, no driver state; the cumulative "≥ threshold"
    * sums fall out of the explode (a doc in bucket b clears every
    * threshold ≤ b) instead of a single-partition running-total frame.
    * NULL-text docs are excluded EXPLICITLY: `least` skips NULL
    * arguments (in Spark and DuckDB alike), so an unguarded NULL
    * quality would silently clamp to the TOP bucket and count a
    * scoreless doc at every threshold. */
  def thresholdSweep(docs: DataFrame, buckets: Int = 20,
      textCol: String = "text"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val bucket = least(floor(TextFunctions.qualityScore(col(textCol))
        * buckets), lit(buckets)).cast("int")
    docs
      .where(col(textCol).isNotNull)
      .select(bucket.as("__b"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__ntok"))
      .select(explode(sequence(lit(0), col("__b"))).as("thr_num"),
        col("__ntok"))
      .groupBy(col("thr_num"))
      .agg(count(lit(1)).as("n_kept"), sum(col("__ntok")).as("tokens_kept"))
  }

  def corpusSpanDedup(docs: DataFrame, minQuality: Double = 0.7,
      langs: Seq[String] = Seq("en"), jaccard: Double = 0.3,
      textCol: String = "text", idCol: String = "doc_id",
      maxShingleDf: Long = Dedup.DefaultMaxShingleDf,
      maxDupGram: Double = 1.0, spanWords: Int = 10): DataFrame = {
    val kept = corpus(docs, minQuality, langs, jaccard, textCol, idCol,
      maxShingleDf, maxDupGram)
    val survivors = docs.join(kept.select(col(idCol)), Seq(idCol), "left_semi")
    Dedup.spanDedup(survivors, textCol, idCol, spanWords)
  }
}
