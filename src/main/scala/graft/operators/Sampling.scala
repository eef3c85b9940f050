package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-deterministic sampling and dataset splitting — the
  * reproducibility primitive a training-data pipeline needs where
  * `DataFrame.sample` cannot be trusted: Spark's `sample`/
  * `randomSplit` draw from a per-partition RNG stream, so the selected
  * ROWS change whenever partitioning, ordering, or cluster layout
  * changes. Here membership is a pure function of (id, seed) — an md5
  * prefix compared against a fraction threshold — so a document lands
  * in the same split on every engine, every run, every repartition,
  * and train/test assignment survives incremental re-processing (the
  * property leakage audits depend on).
  *
  * Scale: map-only (one hash + one string compare per row), zero
  * shuffles, codegen'd built-ins end to end; trivially survives any
  * scale-up. The md5 prefix is uniform on [0, 16^8), so realized
  * fractions concentrate tightly around the target.
  *
  * Reference scope: the reference pipeline has no sampling operator —
  * this extends the LLM-pipeline surface (SURVEY §7.5) alongside
  * dedup/similarity/text-analysis.
  */
object Sampling {

  /** Lowercase-hex threshold for `fraction` of the 16^8 hash space,
    * zero-padded to 8 chars so lexicographic compare == numeric
    * compare. Shared by the Spark side and (as literals) the DuckDB
    * oracle restatements. */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    f"${math.floor(fraction * 4294967296.0).toLong}%08x"
  }

  /** First 8 hex chars of md5(id ":" seed) — the uniform per-row draw.
    * DuckDB restatement:
    * `substr(md5(CAST(id AS VARCHAR) || ':seed'), 1, 8)`. */
  def hashDraw(id: Column, seed: String): Column =
    substring(md5(concat(id.cast("string"), lit(":" + seed)).cast("binary")), 1, 8)

  /** The FULL 32-hex md5 draw — for RANKING (not thresholding): 128
    * bits never collide in practice, so rank order is total without
    * consulting the id's native type. [[drawRunningSum]] and
    * [[graft.streaming.BudgetStream]] rank on this; with the 8-hex
    * prefix, a 32-bit collision inside one domain made the batch
    * tie-break (native id desc) and the stream's (string id desc)
    * disagree for numeric ids — different admitted docs at a quota
    * boundary. DuckDB restatement: `md5(CAST(id AS VARCHAR) || ':seed')`. */
  def hashDrawFull(id: Column, seed: String): Column =
    md5(concat(id.cast("string"), lit(":" + seed)).cast("binary"))

  /** Membership predicate: keep ~`fraction` of rows, deterministically. */
  def samplePredicate(id: Column, fraction: Double, seed: String): Column =
    if (fraction >= 1.0) lit(true)
    else if (fraction <= 0.0) lit(false)
    else hashDraw(id, seed) < lit(thresholdHex(fraction))

  /** Deterministic ~`fraction` sample of `df`, keyed on `idCol`. */
  def sample(df: DataFrame, idCol: String, fraction: Double,
      seed: String = "0"): DataFrame =
    df.where(samplePredicate(col(idCol), fraction, seed))

  /** Split-label column: partitions the hash space by cumulative
    * weight, so every row gets EXACTLY one label and the labels are
    * consistent with [[samplePredicate]] prefixes (a 0.8/0.1/0.1 split's
    * `train` set == `sample(df, id, 0.8)`). Weights must be positive
    * and sum to 1. */
  def splitLabel(id: Column, weights: Seq[(String, Double)],
      seed: String): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0.0),
      "weights must be positive")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1, got ${weights.map(_._2).sum}")
    val h = hashDraw(id, seed)
    val cums = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    // Intermediate cumulative thresholds only: the last label is the
    // `otherwise` branch, so cum == 1.0 never becomes a (9-char,
    // lexicographically unsafe) threshold string.
    val branches = weights.init.zip(cums.init).map { case ((label, _), cum) =>
      (thresholdHex(cum), label)
    }
    branches.foldRight(lit(weights.last._1): Column) { case ((thr, label), acc) =>
      when(h < lit(thr), lit(label)).otherwise(acc)
    }
  }

  /** Train/val/test-style split assignment as an extra column. */
  def split(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
      seed: String = "0", labelCol: String = "split"): DataFrame =
    df.withColumn(labelCol, splitLabel(col(idCol), weights, seed))

  /** Deterministic domain-mixture sampling (the DoReMi-style data-mix
    * step): pick per-domain keep fractions so the SAMPLED corpus hits
    * `targetShares` (a probability vector over `domainCol` values)
    * exactly in expectation, NEVER up-sampling — the feasible total is
    * `T = min_d(n_d / s_d)` (the binding domain is kept whole,
    * fraction 1) and every other domain keeps `s_d · T / n_d`.
    * Domains outside the target are dropped.
    *
    * Determinism: fractions derive from exact counts with the same
    * IEEE-754 expression shape the DuckDB oracle restates
    * (`min(n/s)`, then `s·T/n`), and membership is the md5 draw — so
    * the selected ROW SET is engine- and partitioning-invariant, not
    * just the realized proportions.
    *
    * Scale: one tiny count aggregate (K domains of driver-held model
    * state, like Ivf centroids), then the map-only stratified draw —
    * zero corpus shuffles. */
  def mixture(df: DataFrame, idCol: String, domainCol: String,
      targetShares: Seq[(String, Double)], seed: String = "0")
      : DataFrame =
    mixtureBy(df, idCol, domainCol, targetShares, lit(1L), seed)

  /** [[mixture]] with shares over an integral per-row WEIGHT instead of
    * row counts — the practical form: training mixes are specified in
    * TOKEN shares, so pass the token count as the weight. The weight
    * must be integral: per-domain totals then sum EXACTLY (long
    * arithmetic is order-independent where a double sum is not), which
    * keeps the derived fractions bit-reproducible against the DuckDB
    * oracle. Membership stays the per-row md5 draw, so the expected
    * WEIGHT share hits the target while row selection remains
    * engine/partitioning-invariant. */
  def mixtureBy(df: DataFrame, idCol: String, domainCol: String,
      targetShares: Seq[(String, Double)], weight: Column,
      seed: String = "0"): DataFrame = {
    require(targetShares.nonEmpty && targetShares.forall(_._2 > 0.0),
      "target shares must be positive")
    require(math.abs(targetShares.map(_._2).sum - 1.0) < 1e-9,
      s"target shares must sum to 1, got ${targetShares.map(_._2).sum}")
    val domains = targetShares.map(_._1)
    // cast + coalesce so a non-string domain column or an all-NULL
    // weight reaches the descriptive require below instead of a
    // ClassCastException/NPE here
    val totals = df.where(col(domainCol).isin(domains: _*))
      .groupBy(col(domainCol).cast("string").as("__d"))
      .agg(coalesce(sum(weight.cast("long")), lit(0L)).as("__w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = domains.filterNot(d => totals.get(d).exists(_ > 0))
    require(missing.isEmpty,
      s"target domains absent (or zero-weight) in corpus: ${missing.mkString(", ")}")
    val minRatio = targetShares
      .map { case (d, s) => totals(d).toDouble / s }.min
    val fractions = targetShares.map { case (d, s) =>
      d -> (s * minRatio / totals(d).toDouble)
    }
    stratifiedSample(df, idCol, domainCol, fractions,
      defaultFraction = 0.0, seed = seed)
  }

  /** Temperature-rescaled domain mixture — the multilingual/domain
    * rebalancing standard (XLM-R / mT5 exponentiated sampling: draw
    * domain `d` with probability ∝ W_d^τ): τ = 1 keeps the corpus
    * distribution, τ → 0 flattens toward uniform, so low-resource
    * domains are up-weighted RELATIVELY (never up-sampled — the
    * binding domain keeps fraction 1, [[mixtureBy]] semantics).
    * Target shares are computed FROM the corpus: one K-domain
    * aggregate (driver-held model state, like [[mixtureBy]]'s
    * totals), then `q_d = floor((W_d / ΣW)^τ · 10⁹)` — NORMALIZED
    * before quantizing so no Long ever saturates at any corpus size,
    * and integer-quantized so the shares are ratios of exact longs
    * and the whole downstream draw stays bit-reproducible
    * cross-engine. τ = 1 short-circuits to the identity mix (corpus
    * restricted to positive-weight domains, no draw). τ = 0.5
    * evaluates via `sqrt` (IEEE-correctly-rounded on every engine);
    * other τ use `pow`, whose last ulp is engine-specific — the
    * quantization confines any cross-engine flip to shares within
    * one part in 10⁹ of a quantization boundary (the oracle-gated
    * key uses τ = 0.5). Zero-weight and NULL domains drop (they have
    * nothing to contribute). */
  /** Per-domain positive long-weight totals, collected and sorted by
    * domain — the driver-held-model-state block shared by
    * [[mixtureTemperature]] and [[epochPlan]]. */
  private def domainTotals(df: DataFrame, domainCol: String,
      weight: Column): Seq[(String, Long)] =
    df.where(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("__d"))
      .agg(coalesce(sum(weight.cast("long")), lit(0L)).as("__w"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 > 0L).sortBy(_._1).toSeq

  /** `floor((w/Σw)^τ · 10⁹)` share quantization over positive totals —
    * quantize NORMALIZED shares, not raw weights: p_d ∈ (0, 1], so the
    * result ≤ 10⁹ never saturates a Long (raw token weights at 100 TB
    * would overflow W·10⁶) and the q-sum ≤ K·10⁹. Domains whose share
    * quantizes to 0 (p^τ < 10⁻⁹) drop — sub-ppb of the mix. τ = 0.5 is
    * the IEEE-exact sqrt; τ = 1 the identity. ONE implementation so
    * [[epochPlan]]'s quotas and the [[mixtureTemperature]] draw they
    * are documented to match can never diverge. Returns (domain, w,
    * q9) with q9 > 0. */
  private def quantizedShares(totals: Seq[(String, Long)],
      tau: Double): Seq[(String, Long, Long)] = {
    val wSum = totals.map(_._2).sum
    def powT(p: Double): Double =
      if (tau == 1.0) p
      else if (tau == 0.5) math.sqrt(p)
      else math.pow(p, tau)
    totals.map { case (d, w) =>
      (d, w, math.floor(powT(w.toDouble / wSum) * 1e9).toLong)
    }.filter(_._3 > 0L)
  }

  def mixtureTemperature(df: DataFrame, idCol: String, domainCol: String,
      tau: Double = 0.5, weight: Column = lit(1L),
      seed: String = "0"): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1]: $tau")
    val totals = domainTotals(df, domainCol, weight)
    require(totals.nonEmpty, "mixtureTemperature: no positive-weight domains")
    if (tau == 1.0) {
      // exponent 1 is the identity mix: every positive-weight domain's
      // keep fraction is exactly 1, so return the corpus restricted to
      // those domains WITHOUT a draw — a derived-shares round trip
      // could lose rows to double rounding at the f == 1.0 boundary.
      val doms = totals.map(_._1)
      df.where(col(domainCol).isNotNull &&
        col(domainCol).cast("string").isin(doms: _*))
    } else {
      val q = quantizedShares(totals, tau)
      require(q.nonEmpty, "mixtureTemperature: all shares quantized to 0")
      val qsum = q.map(_._3).sum
      val shares = q.map { case (d, _, v) => d -> v.toDouble / qsum }
      mixtureBy(df, idCol, domainCol, shares, weight, seed)
    }
  }

  /** Deterministic weighted sample WITHOUT replacement: the `k` rows
    * with the largest priority `u^(1/w)` (Efraimidis & Spirakis 2006,
    * algorithm A-ES) — the one-pass answer to "give me 10k docs drawn
    * proportionally to token count" that neither `sample` (unweighted)
    * nor per-stratum fractions (discrete strata only) covers. `u` is
    * the [[hashDraw]] md5 prefix mapped into (0,1), so like every draw
    * here the SELECTED SET is a pure function of (ids, weights, seed):
    * engine-, run- and partitioning-invariant.
    *
    * Scale: priorities are map-only codegen'd built-ins; top-k is
    * `orderBy(...).limit(k)` = TakeOrdered — per-partition k-heaps,
    * the driver merges |partitions|·k candidates, no global sort ever
    * materializes. Rows with NULL or non-positive weight are excluded
    * (E-S requires w > 0; a zero-weight row has sampling probability
    * zero anyway). Ties (astronomically unlikely across md5 draws)
    * break by `idCol`.
    *
    * At very large `w` the priority crowds toward 1.0 and double
    * resolution shrinks; with 32-bit draws and corpus-realistic
    * weights (≤ ~10^7 tokens) adjacent priorities stay well separated
    * — the property the oracle's exact restatement exercises. */
  def prioritySample(df: DataFrame, idCol: String, weight: Column, k: Int,
      seed: String = "0"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(hashDraw(col(idCol), seed), 16, 10).cast("long")
      .cast("double") + 1.0) / 4294967297.0 // (hash+1)/(2^32+1) ∈ (0,1)
    df.where(weight.cast("double") > 0.0)
      .withColumn("__pri", pow(u, lit(1.0) / weight.cast("double")))
      .orderBy(col("__pri").desc, col(idCol))
      .limit(k)
      .drop("__pri")
  }

  /** DSIR-style importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): sample
    * `k` documents with probability proportional to how much more
    * target-like than corpus-like each one reads, where both densities
    * are bigram LMs ([[TextLm]]) — the target model trained on the
    * `targetPred` subset (the high-quality reference slice), the
    * source model on the whole corpus. The importance weight is the
    * LENGTH-NORMALIZED likelihood ratio
    * `w = exp(nll_source − nll_target)` (mean per-bigram, so a long
    * document's weight measures its distribution, not its length),
    * drawn without replacement via the deterministic A-ES priority
    * sample ([[prioritySample]] — same md5 draw, same repartition
    * invariance). Documents with fewer than two tokens have no bigrams
    * under either model and are excluded (the [[TextLm]] convention).
    *
    * Scale shape: two LM trains (each one corpus-sized bigram
    * aggregate), two scoring joins against 1-row-per-key model tables,
    * one map-only priority draw + TakeOrdered — nothing quadratic,
    * nothing iterative, no driver model state beyond [[TextLm]]'s
    * aggregate frames. Returns `(idCol, w)` for the selected docs. */
  def dsirSample(docs: DataFrame, targetPred: Column, k: Int,
      seed: String = "dsir", alpha: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    val target = TextLm.train(docs.where(targetPred), textCol, idCol)
    val source = TextLm.train(docs, textCol, idCol)
    val st = TextLm.score(target, docs, alpha, textCol, idCol)
      .select(col(idCol), col("nll").as("__nll_t"))
    val ss = TextLm.score(source, docs, alpha, textCol, idCol)
      .select(col(idCol), col("nll").as("__nll_s"))
    val weighted = st.join(ss, Seq(idCol))
      .withColumn("w", exp(col("__nll_s") - col("__nll_t")))
    prioritySample(weighted, idCol, col("w"), k, seed)
      .select(col(idCol), col("w"))
  }

  /** Deterministic stratified sample: per-stratum fractions (e.g. keep
    * 50% of `en`, 25% of `de`, `defaultFraction` of everything else).
    * The draw hashes ONLY (id, seed) — the same row keeps or drops
    * membership when its stratum's fraction changes monotonically
    * (nested-samples property: raising a fraction only ADDS rows). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Seq[(String, Double)], defaultFraction: Double = 0.0,
      seed: String = "0"): DataFrame = {
    val keep = fractions.foldRight(
      samplePredicate(col(idCol), defaultFraction, seed)) {
      case ((stratum, f), acc) =>
        when(col(stratumCol) === lit(stratum),
          samplePredicate(col(idCol), f, seed)).otherwise(acc)
    }
    df.where(keep)
  }

  /** Token-budget epoch planner — the static data plan a training run
    * starts from (LLaMA-/Chinchilla-style): given per-domain token
    * totals `W_d`, a total token budget `B`, a sampling temperature
    * `τ` and a per-domain repetition cap, emit the per-domain plan
    * table: target tokens `floor(B·q_d/Σq)` (the same normalized
    * `q_d = floor((W_d/ΣW)^τ·10⁹)` quantization as
    * [[mixtureTemperature]]), capped at `maxEpochsMilli/1000` passes
    * over the domain's data ("don't repeat any domain more than E
    * epochs" — Muennighoff 2023's data-constrained regime), plus the
    * realized epoch count in exact milli-epochs. All arithmetic after
    * the one float step (the `^τ` on a normalized share, IEEE-exact
    * for τ = 0.5) is BigInt — `B·q_d` at a 10¹³-token budget overflows
    * a Long, so the products run in arbitrary precision and only the
    * (≤ B) results are emitted as longs.
    *
    * Scale: ONE K-domain aggregate collect (the [[mixtureBy]]
    * driver-held-model-state pattern), O(K) driver arithmetic, a
    * K-row output — the corpus is scanned once, counts only.
    *
    * Output: (domain, w_tokens, share_q9, target_tokens, final_tokens,
    * epochs_milli, capped), one row per positive-weight domain. */
  def epochPlan(df: DataFrame, domainCol: String, weight: Column,
      budgetTokens: Long, tau: Double = 0.5,
      maxEpochsMilli: Long = 1000L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1]: $tau")
    require(maxEpochsMilli > 0,
      s"maxEpochsMilli must be positive: $maxEpochsMilli")
    val totals = domainTotals(df, domainCol, weight)
    require(totals.nonEmpty, "epochPlan: no positive-weight domains")
    val q = quantizedShares(totals, tau)
    require(q.nonEmpty, "epochPlan: all shares quantized to 0")
    val qsum = q.map(_._3).sum
    val rows = q.map { case (d, w, qv) =>
      val target = (BigInt(budgetTokens) * qv / qsum).toLong
      val capTok = BigInt(w) * maxEpochsMilli / 1000L
      val capped = BigInt(target) > capTok
      val fin = if (capped) capTok.toLong else target
      val epochs = (BigInt(fin) * 1000L / w).toLong
      (d, w, qv, target, fin, epochs, capped)
    }
    df.sparkSession.createDataFrame(rows).toDF("domain", "w_tokens",
      "share_q9", "target_tokens", "final_tokens", "epochs_milli", "capped")
  }

  /** Execute a per-domain token quota ([[epochPlan]]'s other half):
    * within each domain, rank docs by the deterministic
    * [[hashDrawFull]] priority (descending, ties by id descending —
    * unreachable at 128 bits, which is WHY the full draw: an 8-hex
    * prefix collides once per ~10⁵ docs/domain and the id tie-break
    * is type-sensitive) and keep docs while the EXCLUSIVE
    * running token sum is below the domain's quota — so the first doc
    * of a non-zero quota always ships (first-fit may overshoot by at
    * most one doc; a training pipeline wants the quota filled, not
    * undershot). The kept SET is a pure function of (ids, weights,
    * quotas, seed): engine-, run- and partitioning-invariant.
    *
    * Scale: the per-domain running sum is the [[Pack]] two-pass
    * distributed prefix sum, NOT a per-domain window — a hot domain
    * (half the corpus in one domain is normal on the web) would
    * serialize through one task. The bucket key is the draw's first
    * two hex chars: monotone in the draw order WITHIN every domain by
    * construction, so pass 1 windows sort only inside (domain, 1/256
    * of the draw space) slices, and pass 2's per-(domain, bucket)
    * totals collect is bounded at 256·|domains| rows of driver-held
    * model state. Rows with NULL/unlisted domains or NULL weight
    * drop (nothing to account); zero-weight rows are free and kept
    * whenever their prefix is inside the quota. */
  def budgetDraw(df: DataFrame, idCol: String, domainCol: String,
      weight: Column, quotas: Seq[(String, Long)],
      seed: String = "0"): DataFrame = {
    val qPos = quotas.filter(_._2 > 0L)
    require(quotas.nonEmpty, "budgetDraw: no quotas")
    val spark = df.sparkSession
    import spark.implicits._
    val narrow = df
      .where(col(domainCol).isin(qPos.map(_._1): _*))
      .select(col(idCol), col(domainCol).cast("string").as("__dom"),
        weight.cast("long").as("__w"),
        hashDrawFull(col(idCol), seed).as("__draw"))
    val quotaDf = spark.createDataset(qPos.toIndexedSeq)
      .toDF("__dom", "__quota")
    drawRunningSum(narrow, idCol)
      .join(broadcast(quotaDf), Seq("__dom"))
      .where(col("__cum") - col("__w") < col("__quota"))
      .select(col(idCol), col("__dom").as("domain"),
        col("__w").as("n_tokens"))
  }

  /** Distributed draw-order running sum — the [[Pack]]-style two-pass
    * prefix shared by [[budgetDraw]] (token quotas) and
    * [[Layout.mixtureShards]] (round-robin ranks, `__w = 1`). Input
    * must carry (`idCol`, `__dom`, `__w`, `__draw`); the output adds
    * `__cum`, the INCLUSIVE running `__w` sum within each `__dom` in
    * (draw desc, id desc) order — a pure function of the input set,
    * partitioning- and run-invariant.
    *
    * Scale: NOT a per-domain window — a hot domain (half the corpus in
    * one domain is normal on the web) would serialize through one
    * task. The bucket key is the draw's first two hex chars: monotone
    * in the draw order WITHIN every domain by construction, so pass 1
    * windows sort only inside (domain, 1/256 of the draw space) slices,
    * and pass 2's per-(domain, bucket) totals collect is bounded at
    * 256·|domains| rows of driver-held model state. The narrow
    * projection is pinned to ONE materialization (checkpoint), so both
    * passes read the same bytes and a nondeterministic upstream cannot
    * make them disagree. */
  private[operators] def drawRunningSum(narrowIn: DataFrame,
      idCol: String): DataFrame = {
    val spark = narrowIn.sparkSession
    import spark.implicits._
    val narrow0 = narrowIn.withColumn("__bkt", substring(col("__draw"), 1, 2))
    val narrow =
      if (spark.sparkContext.getCheckpointDir.isDefined)
        narrow0.checkpoint(true)
      else narrow0.localCheckpoint(true)
    // pass 1: prefix sums inside (domain, draw-prefix) slices
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("__dom", "__bkt")
      .orderBy(col("__draw").desc, col(idCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val inBucket = narrow.withColumn("__cum_in", sum(col("__w")).over(wIn))
    // pass 2: per-(domain, bucket) totals → driver running offsets in
    // DESCENDING bucket order (the draw ranks descending) → broadcast
    val totals = narrow.groupBy("__dom", "__bkt")
      .agg(coalesce(sum("__w"), lit(0L)).as("__tot"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (d, bs) =>
        var acc = 0L
        bs.sortBy(_._2)(Ordering[String].reverse).map { case (_, b, tot) =>
          val off = acc; acc += tot; (d, b, off)
        }
      }
    val offsets = spark.createDataset(totals.toIndexedSeq)
      .toDF("__dom", "__bkt", "__off")
    inBucket.join(broadcast(offsets), Seq("__dom", "__bkt"))
      .withColumn("__cum", col("__cum_in") + col("__off"))
      .drop("__cum_in", "__off", "__bkt")
  }

  /** Leakage-safe split — train/eval assignment at near-duplicate
    * CLUSTER granularity, so near-duplicate documents never straddle a
    * split boundary (the eval-contamination failure mode of per-doc
    * splitting: a doc's near-clone in train leaks its eval answer —
    * the GPT-3 §4 / Dodge 2021 C4 contamination concern, applied to
    * the split itself). `clusters` is a (doc → canonical member)
    * assignment, e.g. [[Dedup.clusters]] over any near-dup pair
    * source; docs absent from it are singletons. Every doc draws with
    * its cluster canon's id, so a whole cluster lands on one side —
    * the draw unit is emitted as `unit_id` for auditability.
    *
    * Scale: one shuffle join against the cluster table (≪ corpus —
    * only docs that HAVE a near-dup; AQE broadcasts it when small),
    * then the map-only [[splitLabel]] md5 draw on the unit id. */
  def leakageSafeSplit(df: DataFrame, clusters: DataFrame, idCol: String,
      weights: Seq[(String, Double)], seed: String = "0",
      clusterIdCol: String = "doc_id", clusterCol: String = "cluster_id",
      labelCol: String = "split"): DataFrame = {
    val cl = clusters.select(col(clusterIdCol).as("__ls_id"),
      col(clusterCol).as("__ls_cl"))
    df.join(cl, col(idCol) === col("__ls_id"), "left")
      .withColumn("unit_id", coalesce(col("__ls_cl"), col(idCol)))
      .drop("__ls_id", "__ls_cl")
      .withColumn(labelCol, splitLabel(col("unit_id"), weights, seed))
  }
}
