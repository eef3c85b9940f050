package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Declared keys for the deterministic sampling/splitting/packing
  * operators — all fully SQL-expressible, so the DuckDB oracles restate
  * the md5-prefix draw (resp. the global token prefix sum) verbatim and
  * the driver hash-checks exact row sets (not just counts). Threshold
  * literals in the SQL are `Sampling.thresholdHex` values:
  * 0.8→cccccccc, 0.9→e6666666, 0.5→80000000, 0.25→40000000,
  * 0.1→19999999.
  */
object SamplingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Train/val/test assignment: every doc gets exactly one label,
    // stable across engines/runs/partitionings.
    "q_sample_split" -> { (s, d) =>
      Sampling.split(Tables(s, d, "documents").select("doc_id"),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        seed = "42")
        .orderBy("doc_id")
    },

    // Leakage-safe split: near-dup clusters (the q_dedup_clusters
    // composition) are assigned train/eval as a UNIT — every member
    // draws with its cluster canon's id, so a doc and its near-clone
    // can never straddle the split boundary. unit_id in the output
    // makes the draw auditable; the oracle restates the whole chain
    // (shingle → Jaccard pairs → recursive-CTE components → canon →
    // md5 draw on the canon).
    "q_sample_split_leakage" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, blockCols = Seq("lang"),
        threshold = 0.1, maxShingleDf = Dedup.DefaultMaxShingleDf)
      Sampling.leakageSafeSplit(docs.select("doc_id"),
          Dedup.clusters(pairs), "doc_id",
          Seq("train" -> 0.9, "eval" -> 0.1), seed = "ls")
        .orderBy("doc_id")
    },

    // Per-language stratified sample: 50% en, 25% de, 10% of the rest.
    "q_sample_stratified" -> { (s, d) =>
      Sampling.stratifiedSample(
        Tables(s, d, "documents").select("doc_id", "lang"),
        "doc_id", "lang", Seq("en" -> 0.5, "de" -> 0.25),
        defaultFraction = 0.1, seed = "7")
        .orderBy("doc_id")
    },

    // Domain-mixture sampling (DoReMi-style data mix): keep fractions
    // chosen so the sample hits target lang shares (en .5 / de .2 /
    // fr .3) at the max feasible total — the binding domain keeps
    // fraction 1, nothing is ever up-sampled. The oracle recomputes the
    // fractions from the SAME count + IEEE-754 expression shape
    // (min(n/s), then s·T/n) and restates the md5 draw, so the exact
    // ROW SET is hash-checked, not just the realized proportions.
    "q_sample_mixture" -> { (s, d) =>
      Sampling.mixture(Tables(s, d, "documents").select("doc_id", "lang"),
        "doc_id", "lang", Seq("en" -> 0.5, "de" -> 0.2, "fr" -> 0.3),
        seed = "77")
        .orderBy("doc_id")
    },

    // Token-weighted mixture — the practical form (training mixes are
    // specified in TOKEN shares): per-domain totals are exact long sums
    // of the whitespace token count, so the derived fractions stay
    // bit-reproducible against the oracle's identical restatement.
    "q_sample_mixture_tokens" -> { (s, d) =>
      Sampling.mixtureBy(Tables(s, d, "documents")
          .select("doc_id", "lang", "text"),
        "doc_id", "lang", Seq("en" -> 0.6, "zh" -> 0.4),
        weight = graft.functions.TextFunctions.tokenCount(col("text")),
        seed = "78")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Temperature-rescaled mixture (XLM-R/mT5 exponentiated domain
    // sampling, tau = 0.5): target shares computed FROM the corpus as
    // floor((W_d/ΣW)^tau * 1e9) — NORMALIZED shares quantized to
    // integers (sqrt of a [0,1] ratio is IEEE-correct on every
    // engine, never saturates a Long, and the oracle restates the
    // whole derivation bit-for-bit), then the standard mixture draw —
    // low-resource sources up-weighted relatively, binding domain at
    // fraction 1, nothing up-sampled.
    "q_sample_mixture_temperature" -> { (s, d) =>
      Sampling.mixtureTemperature(Tables(s, d, "documents")
          .select("doc_id", "source"),
        "doc_id", "source", tau = 0.5, seed = "79")
        .orderBy("doc_id")
    },

    // Token-budget epoch planner (LLaMA/Chinchilla-style data plan):
    // per-source token totals -> temperature-quantized shares (the
    // mixtureTemperature floor((W/ΣW)^0.5 * 1e9) derivation) ->
    // target tokens floor(B*q/Σq) -> capped at 2.5 epochs over the
    // domain's own data (Muennighoff 2023 data-constrained regime),
    // with realized milli-epochs. One K-domain aggregate, BigInt
    // driver arithmetic (B*q overflows a Long at real budgets), K-row
    // output; the oracle restates the whole integer derivation in
    // HUGEINT.
    "q_sample_epoch_plan" -> { (s, d) =>
      Sampling.epochPlan(Tables(s, d, "documents")
          .select("doc_id", "source", "text"),
        "source", graft.functions.TextFunctions.tokenCount(col("text")),
        budgetTokens = 1000000L, tau = 0.5, maxEpochsMilli = 2500L)
        .orderBy("domain")
    },

    // The plan EXECUTED: epochPlan quotas (20k-token budget, 1-epoch
    // cap, tau=0.5) drawn per domain by descending md5 priority with
    // the Pack-style two-pass prefix sum (no per-domain window — a
    // hot domain would serialize through one task). First-fit: a
    // domain's first doc always ships; the kept SET is pinned by the
    // oracle, which restates the whole plan derivation AND the
    // exclusive-prefix draw.
    "q_sample_budget_draw" -> { (s, d) =>
      val docs = Tables(s, d, "documents").select("doc_id", "source", "text")
      val w = graft.functions.TextFunctions.tokenCount(col("text"))
      val plan = Sampling.epochPlan(docs, "source", w,
        budgetTokens = 20000L, tau = 0.5, maxEpochsMilli = 1000L)
      val quotas = plan.select("domain", "final_tokens").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
      Sampling.budgetDraw(docs, "doc_id", "source", w, quotas, seed = "bd")
        .orderBy("doc_id")
    },

    // Token-weighted priority sample (Efraimidis-Spirakis A-ES): the
    // 20 docs with the largest u^(1/w) priorities, w = whitespace
    // token count — weighted sampling WITHOUT replacement in one
    // map-only pass + TakeOrdered. The oracle restates the md5 draw,
    // the (hash+1)/(2^32+1) uniform map and the pow priority exactly,
    // so the hash check pins the selected SET, not a distributional
    // property.
    "q_sample_priority" -> { (s, d) =>
      val docs = Tables(s, d, "documents").select("doc_id", "text")
      Sampling.prioritySample(docs, "doc_id",
          graft.functions.TextFunctions.tokenCount(col("text")), k = 20,
          seed = "tok")
        .select(col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long").as("n_tokens"))
        .orderBy("doc_id")
    },

    // DSIR-style importance resampling (Xie et al. 2023): target LM
    // trained on the lang='en' slice, source LM on the whole corpus,
    // importance w = exp(nll_source - nll_target) (length-normalized
    // likelihood ratio), top-20 by deterministic A-ES priority. The
    // oracle restates BOTH bigram models (left-join scoring — OOV
    // bigrams under the target model coalesce to 0 counts), the ratio,
    // and the md5 priority draw, so the selected SET is pinned.
    "q_sample_dsir" -> { (s, d) =>
      Sampling.dsirSample(Tables(s, d, "documents"),
          targetPred = col("lang") === "en", k = 20, seed = "dsir")
        .withColumn("w", round(col("w"), 6))
        .orderBy("doc_id")
    },

    // Topic-balanced sampling (cluster-balance curation, the SemDeDup /
    // DataComp "don't let one topic cluster dominate" step): every
    // vector is assigned to its NEAREST per-label centroid by cosine —
    // the label only SEEDS the centroids; assignment is label-agnostic,
    // so a vector sitting closer to another class's mean moves there —
    // then each topic is capped at 30 via the uniform md5 draw.
    // Scale shape: centroids are K×dim rows built by the posexplode
    // partial-agg (never collects a vector), broadcast as K arrays;
    // scoring is a map-side crossJoin (K small by construction);
    // argmax is a partial-aggregating max_by over the K rows per
    // vector (never a per-vector window sort); the per-topic cap goes
    // through TopKPerKey's bounded-buffer aggregate — topics are FEW
    // by construction, so a row_number window would serialize each
    // topic into one task at corpus scale. The oracle restates
    // centroids, the fold-ordered cosine arithmetic, the argmax
    // tie-break, and the exact draw ranking — kept SET pinned.
    "q_sample_topic_balance" -> { (s, d) =>
      val embs = Tables(s, d, "embeddings")
      val cent = embs
        .select(col("label").as("topic"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("topic", "pos").agg(round(avg("v"), 6).as("cv"))
        .groupBy("topic")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("cv")))),
          x => x.getField("cv")).as("cvec"))
      val scored = embs
        .select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("__e"))
        .crossJoin(broadcast(cent))
        .select(col("vec_id"), col("topic"),
          round(VectorFunctions.cosine(col("__e"), col("cvec")), 6).as("cos_sim"))
      val assigned = scored
        .groupBy("vec_id")
        .agg(max_by(struct(col("topic"), col("cos_sim")),
          struct(col("cos_sim"), negate(col("topic")))).as("__a"))
        .select(col("vec_id"), col("__a.topic").as("topic"),
          col("__a.cos_sim").as("cos_sim"))
        .localCheckpoint(true) // consumed twice: cap draw + survivor join
      val drawn = assigned.withColumn("__u",
        conv(Sampling.hashDraw(col("vec_id"), "tb"), 16, 10)
          .cast("long").cast("double"))
      val kept = TopKPerKey(drawn, "topic", "__u", "vec_id", 30)
        .select(col("payload").as("vec_id"))
      assigned.join(kept, Seq("vec_id"), "left_semi")
        .select("vec_id", "topic", "cos_sim")
        .orderBy("vec_id")
    },

    // Sequence packing: concat-then-chunk pack assignment over the
    // doc_id-ordered token stream, 4096-token packs — distributed
    // two-pass prefix sum (the oracle restates the global running sum
    // directly; the engine must match it without a global window).
    "q_pack_sequences" -> { (s, d) =>
      Pack.sequences(Tables(s, d, "documents").select("doc_id", "text"),
        budget = 4096L)
        .select("doc_id", "n_tokens", "pack_id")
        .orderBy("doc_id")
    }
  )

  val oracle: Map[String, String] = Map(
    // Centroids (round-6 per-label means), fold-ordered cosine (the
    // list_reduce left fold = Spark's aggregate() with its 0.0 seed —
    // identical op order, so bit-equal doubles), argmax with the
    // (cos DESC, topic ASC) tie-break, md5 draw rank <= 30 per topic.
    "q_sample_topic_balance" ->
      """WITH cpos AS (
        |  SELECT label AS topic, pos, round(avg(v), 6) AS cv
        |  FROM (SELECT label, unnest(embedding) AS v,
        |          generate_subscripts(embedding, 1) AS pos
        |        FROM embeddings)
        |  GROUP BY topic, pos),
        |cent AS (
        |  SELECT topic, list(cv ORDER BY pos) AS cvec
        |  FROM cpos GROUP BY topic),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |sc AS (
        |  SELECT e.vec_id, cent.topic,
        |    round(
        |      list_reduce(list_transform(range(1, len(ev) + 1),
        |          i -> ev[i] * cvec[i]), (x, y) -> x + y)
        |      / (sqrt(list_reduce(list_transform(ev, x -> x * x),
        |            (x, y) -> x + y))
        |         * sqrt(list_reduce(list_transform(cvec, x -> x * x),
        |            (x, y) -> x + y))), 6) AS cos_sim
        |  FROM e CROSS JOIN cent),
        |a AS (
        |  SELECT vec_id, topic, cos_sim,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos_sim DESC, topic) AS rn
        |  FROM sc),
        |k AS (
        |  SELECT vec_id, topic, cos_sim,
        |    row_number() OVER (PARTITION BY topic
        |      ORDER BY substr(md5(CAST(vec_id AS VARCHAR) || ':tb'), 1, 8) DESC,
        |        vec_id DESC) AS tr
        |  FROM a WHERE rn = 1)
        |SELECT vec_id, topic, cos_sim FROM k
        |WHERE tr <= 30 ORDER BY vec_id""".stripMargin,
    "q_sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN h < 'cccccccc' THEN 'train'
        |       WHEN h < 'e6666666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8) AS h
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // The q_dedup_clusters recursive-CTE restatement, left-joined back
    // to documents: absent docs are singletons drawing with their own
    // id; thresholdHex(0.9) = e6666666 (train below, eval above).
    "q_sample_split_leakage" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN len(string_split_regex(trim(text), '\s+')) <= 3
        |      THEN [array_to_string(string_split_regex(trim(text), '\s+'), ' ')]
        |      ELSE list_transform(
        |        range(0, len(string_split_regex(trim(text), '\s+')) - 2),
        |        i -> array_to_string(
        |          string_split_regex(trim(text), '\s+')[i+1:i+3], ' '))
        |    END AS grams
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |      / len(list_distinct(a.grams || b.grams)) >= 0.1),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |cl AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |  FROM reach GROUP BY src)
        |SELECT d.doc_id,
        |  coalesce(c.cluster_id, d.doc_id) AS unit_id,
        |  CASE WHEN substr(md5(CAST(coalesce(c.cluster_id, d.doc_id)
        |      AS VARCHAR) || ':ls'), 1, 8) < 'e6666666'
        |    THEN 'train' ELSE 'eval' END AS split
        |FROM documents d LEFT JOIN cl c ON d.doc_id = c.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q_sample_stratified" ->
      """SELECT doc_id, lang
        |FROM (SELECT doc_id, lang,
        |        substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8) AS h
        |      FROM documents)
        |WHERE CASE WHEN lang = 'en' THEN h < '80000000'
        |           WHEN lang = 'de' THEN h < '40000000'
        |           ELSE h < '19999999' END
        |ORDER BY doc_id""".stripMargin,
    "q_sample_mixture" ->
      """WITH tgt(lang, s) AS (
        |  VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.3)),
        |cnt AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS n
        |  FROM documents JOIN tgt USING (lang) GROUP BY lang),
        |j AS (SELECT t.lang, t.s, c.n FROM tgt t JOIN cnt c USING (lang)),
        |fr AS (
        |  SELECT lang, s * (SELECT min(n / s) FROM j) / n AS f FROM j)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN fr USING (lang)
        |WHERE f >= 1.0
        |   OR substr(md5(CAST(d.doc_id AS VARCHAR) || ':77'), 1, 8)
        |      < printf('%08x', CAST(floor(f * 4294967296.0) AS BIGINT))
        |ORDER BY d.doc_id""".stripMargin,
    "q_sample_mixture_tokens" ->
      """WITH tgt(lang, s) AS (VALUES ('en', 0.6), ('zh', 0.4)),
        |tok AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
        |      ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      END AS ntok
        |  FROM documents JOIN tgt USING (lang)),
        |cnt AS (
        |  SELECT lang, CAST(sum(ntok) AS DOUBLE) AS n
        |  FROM tok GROUP BY lang),
        |j AS (SELECT t.lang, t.s, c.n FROM tgt t JOIN cnt c USING (lang)),
        |fr AS (
        |  SELECT lang, s * (SELECT min(n / s) FROM j) / n AS f FROM j)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN fr USING (lang)
        |WHERE f >= 1.0
        |   OR substr(md5(CAST(d.doc_id AS VARCHAR) || ':78'), 1, 8)
        |      < printf('%08x', CAST(floor(f * 4294967296.0) AS BIGINT))
        |ORDER BY d.doc_id""".stripMargin,
    "q_sample_mixture_temperature" ->
      """WITH cnt AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS w
        |  FROM documents WHERE source IS NOT NULL GROUP BY source),
        |q AS (
        |  SELECT source,
        |    CAST(floor(sqrt(CAST(w AS DOUBLE)
        |        / (SELECT sum(w) FROM cnt))
        |      * 1000000000.0) AS BIGINT) AS qv, w
        |  FROM cnt WHERE w > 0),
        |q2 AS (SELECT * FROM q WHERE qv > 0),
        |qs AS (SELECT sum(qv) AS qsum FROM q2),
        |j AS (
        |  SELECT source, CAST(qv AS DOUBLE) / qsum AS s,
        |    CAST(w AS DOUBLE) AS n
        |  FROM q2, qs),
        |fr AS (
        |  SELECT source, s * (SELECT min(n / s) FROM j) / n AS f FROM j)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN fr USING (source)
        |WHERE f >= 1.0
        |   OR substr(md5(CAST(d.doc_id AS VARCHAR) || ':79'), 1, 8)
        |      < printf('%08x', CAST(floor(f * 4294967296.0) AS BIGINT))
        |ORDER BY d.doc_id""".stripMargin,
    // Epoch plan: the full integer derivation — token totals, the
    // mixtureTemperature share quantization, HUGEINT budget products
    // (BIGINT would overflow at real budgets; Spark-side mirrors with
    // BigInt), the 2.5-epoch cap and realized milli-epochs.
    "q_sample_epoch_plan" ->
      """WITH tok AS (
        |  SELECT source,
        |    CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
        |      ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      END AS ntok
        |  FROM documents WHERE source IS NOT NULL),
        |cnt AS (
        |  SELECT source, CAST(sum(ntok) AS BIGINT) AS w
        |  FROM tok GROUP BY source HAVING sum(ntok) > 0),
        |q AS (
        |  SELECT source, w,
        |    CAST(floor(sqrt(CAST(w AS DOUBLE) / (SELECT sum(w) FROM cnt))
        |      * 1000000000.0) AS BIGINT) AS qv
        |  FROM cnt),
        |q2 AS (SELECT * FROM q WHERE qv > 0),
        |qs AS (SELECT sum(qv) AS qsum FROM q2),
        |p AS (
        |  SELECT source, w, qv,
        |    CAST((CAST(1000000 AS HUGEINT) * qv) // qsum AS BIGINT)
        |      AS target,
        |    (CAST(w AS HUGEINT) * 2500) // 1000 AS captok
        |  FROM q2, qs)
        |SELECT source AS domain, w AS w_tokens, qv AS share_q9,
        |  target AS target_tokens,
        |  CAST(CASE WHEN target > captok THEN captok ELSE target END
        |    AS BIGINT) AS final_tokens,
        |  CAST((CAST(CASE WHEN target > captok THEN captok ELSE target END
        |      AS HUGEINT) * 1000) // w AS BIGINT) AS epochs_milli,
        |  target > captok AS capped
        |FROM p ORDER BY domain""".stripMargin,
    // Budget draw: the epoch-plan derivation (20k budget, 1-epoch cap)
    // feeding the per-domain descending-md5 draw; keep while the
    // EXCLUSIVE prefix token sum is under the quota. The window here
    // is the truth restatement — the engine side must reproduce it
    // with the distributed two-pass prefix sum.
    "q_sample_budget_draw" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
        |      ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      END AS ntok
        |  FROM documents WHERE source IS NOT NULL),
        |cnt AS (
        |  SELECT source, CAST(sum(ntok) AS BIGINT) AS w
        |  FROM tok GROUP BY source HAVING sum(ntok) > 0),
        |q AS (
        |  SELECT source, w,
        |    CAST(floor(sqrt(CAST(w AS DOUBLE) / (SELECT sum(w) FROM cnt))
        |      * 1000000000.0) AS BIGINT) AS qv
        |  FROM cnt),
        |q2 AS (SELECT * FROM q WHERE qv > 0),
        |qs AS (SELECT sum(qv) AS qsum FROM q2),
        |p AS (
        |  SELECT source, w,
        |    CAST((CAST(20000 AS HUGEINT) * qv) // qsum AS BIGINT)
        |      AS target,
        |    (CAST(w AS HUGEINT) * 1000) // 1000 AS captok
        |  FROM q2, qs),
        |fin AS (
        |  SELECT source,
        |    CAST(CASE WHEN target > captok THEN captok ELSE target END
        |      AS BIGINT) AS quota
        |  FROM p),
        |dr AS (
        |  SELECT doc_id, source, ntok,
        |    md5(CAST(doc_id AS VARCHAR) || ':bd') AS draw
        |  FROM tok),
        |c AS (
        |  SELECT doc_id, source, ntok,
        |    sum(ntok) OVER (PARTITION BY source
        |      ORDER BY draw DESC, doc_id DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok
        |      AS pre
        |  FROM dr)
        |SELECT c.doc_id, c.source AS domain, c.ntok AS n_tokens
        |FROM c JOIN fin ON c.source = fin.source
        |WHERE c.pre < fin.quota ORDER BY c.doc_id""".stripMargin,
    "q_sample_priority" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
        |      ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      END AS w,
        |    (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':tok'),
        |       1, 8) AS BIGINT) + 1.0) / 4294967297.0 AS u
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, w, pow(u, 1.0 / w) AS pri FROM t WHERE w > 0),
        |top AS (
        |  SELECT doc_id, w FROM p ORDER BY pri DESC, doc_id LIMIT 20)
        |SELECT doc_id, w AS n_tokens FROM top ORDER BY doc_id""".stripMargin,
    "q_sample_dsir" ->
      """WITH dt AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '') AS toks
        |  FROM documents),
        |bgall AS (
        |  SELECT doc_id, lang, s.w1 AS w1, s.w2 AS w2 FROM (
        |    SELECT doc_id, lang,
        |      unnest(list_transform(range(0, len(toks) - 1),
        |        i -> struct_pack(w1 := toks[i + 1], w2 := toks[i + 2]))) AS s
        |    FROM dt WHERE len(toks) >= 2)),
        |sb2 AS (SELECT w1, w2, count(*) AS c12 FROM bgall GROUP BY 1, 2),
        |sc1 AS (SELECT w1, sum(c12) AS c1 FROM sb2 GROUP BY 1),
        |sv AS (SELECT count(DISTINCT w) AS v
        |  FROM (SELECT unnest(toks) AS w FROM dt)),
        |tb2 AS (SELECT w1, w2, count(*) AS c12 FROM bgall
        |  WHERE lang = 'en' GROUP BY 1, 2),
        |tc1 AS (SELECT w1, sum(c12) AS c1 FROM tb2 GROUP BY 1),
        |tv AS (SELECT count(DISTINCT w) AS v
        |  FROM (SELECT unnest(toks) AS w FROM dt WHERE lang = 'en')),
        |db AS (
        |  SELECT doc_id, w1, w2, count(*) AS n FROM bgall GROUP BY 1, 2, 3),
        |snll AS (
        |  SELECT d.doc_id,
        |    -sum(d.n * ln((coalesce(b.c12, 0) + 0.5)
        |      / (coalesce(c.c1, 0) + 0.5 * sv.v))) / sum(d.n) AS nll_s
        |  FROM db d LEFT JOIN sb2 b USING (w1, w2)
        |    LEFT JOIN sc1 c USING (w1), sv
        |  GROUP BY 1),
        |tnll AS (
        |  SELECT d.doc_id,
        |    -sum(d.n * ln((coalesce(b.c12, 0) + 0.5)
        |      / (coalesce(c.c1, 0) + 0.5 * tv.v))) / sum(d.n) AS nll_t
        |  FROM db d LEFT JOIN tb2 b USING (w1, w2)
        |    LEFT JOIN tc1 c USING (w1), tv
        |  GROUP BY 1),
        |wts AS (
        |  SELECT s.doc_id, exp(s.nll_s - t.nll_t) AS w
        |  FROM snll s JOIN tnll t USING (doc_id)),
        |pri AS (
        |  SELECT doc_id, w,
        |    pow((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |        || ':dsir'), 1, 8) AS BIGINT) + 1.0) / 4294967297.0,
        |      1.0 / w) AS pri
        |  FROM wts WHERE w > 0),
        |top AS (SELECT doc_id, w FROM pri ORDER BY pri DESC, doc_id LIMIT 20)
        |SELECT doc_id, round(w, 6) AS w FROM top ORDER BY doc_id""".stripMargin,
    "q_pack_sequences" ->
      """SELECT doc_id, ntok AS n_tokens,
        |  CAST(floor((cum - ntok) / 4096.0) AS BIGINT) AS pack_id
        |FROM (SELECT doc_id, ntok,
        |        sum(ntok) OVER (ORDER BY doc_id
        |          ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM (SELECT doc_id,
        |              CASE WHEN trim(text) = '' THEN 0
        |                ELSE len(string_split_regex(trim(text), '\s+'))
        |                END AS ntok
        |            FROM documents))
        |ORDER BY doc_id""".stripMargin
  )
}
