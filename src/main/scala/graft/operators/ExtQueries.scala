package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextExpressions, TextFunctions}

/** LLM-training-data extension operators (SURVEY §7.5, BASELINE.json
  * scope): text analysis, dedup family, similarity search.
  *
  * Oracle strategy: everything built from integer counts and exact
  * divisions gets a DuckDB oracle (bit-stable across engines); the
  * sketch-based operators (minhash/simhash/LSH/fingerprint) are
  * engine-specific hashes → their [[gateQueries]] variants emit
  * DuckDB-restatable truth values plus contract booleans (recall,
  * subset, optimality), with planted-duplicate ScalaTest coverage in
  * ExtSpec on top.
  */
object ExtQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Text statistics: whitespace tokens, BPE-ish subwords, punctuation,
    // mean token length.
    "q_text_stats" -> { (s, d) =>
      val t = col("text")
      Tables(s, d, "documents").select(
        col("doc_id"),
        length(t).cast("long").as("n_chars"),
        TextFunctions.tokenCount(t).cast("long").as("n_tokens"),
        TextFunctions.bpeishTokenCount(t).cast("long").as("n_bpeish"),
        TextFunctions.punctCount(t).cast("long").as("n_punct"),
        TextFunctions.meanTokenLen(t).as("mean_tok_len"))
        .orderBy("doc_id")
    },

    // Composite quality score (C4/Gopher-style cheap heuristics).
    "q_text_quality" -> { (s, d) =>
      Tables(s, d, "documents").select(
        col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },

    // Language ID over function-word profiles + CJK codepoint check.
    "q_text_langid" -> { (s, d) =>
      Tables(s, d, "documents").select(
        col("doc_id"), col("lang").as("lang_labeled"),
        TextFunctions.langId(col("text")).as("lang_detected"))
        .orderBy("doc_id")
    },

    // Within-document repetition: duplicate word-3-gram fraction
    // (Gopher-style quality filter; single-pass kernel).
    "q_text_repetition" -> { (s, d) =>
      Tables(s, d, "documents").select(
        col("doc_id"),
        TextFunctions.dupGramFraction(col("text")).as("dup3"))
        .orderBy("doc_id")
    },

    // Compression-ratio quality signal (level-6 raw deflate,
    // compressed/raw bytes): repetitive spam compresses far below
    // natural text, word-salad barely compresses — the cheap
    // "does this look like language" signal in Dolma/RedPajama-class
    // quality stacks. Map-only, one codegen'd kernel call per row.
    // Deflate has no DuckDB restatement, so the driver-checked
    // surface is the GATE variant (restatable invariants); this raw
    // key is what the bench times.
    "q_text_compress" -> { (s, d) =>
      Tables(s, d, "documents").select(
        col("doc_id"),
        TextFunctions.compressionRatio(col("text")).as("ratio"))
        .orderBy("doc_id")
    },

    // Lexical diversity: type-token ratio + token-level Shannon
    // entropy per doc (the gibberish/boilerplate detection pair in
    // quality-filter stacks — low entropy = repetitive spam, TTR near
    // 1 on long docs = word-salad). Entropy in the H = ln n − Σc·ln c
    // / n form: counts are exact ints, ln is per-count, the ONE
    // division happens last, round-6 absorbs sum-order ulps (the LM
    // scoring precedent). Shape: explode + two bounded groupBys —
    // per-doc token counts then per-doc stats, both skew-bounded by
    // document length; empty docs survive via the left join-back with
    // null ttr/entropy.
    "q_text_entropy" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val toks = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
      val st = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("__c"))
        .groupBy("doc_id").agg(
          sum("__c").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(col("__c").cast("double") * log(col("__c").cast("double")))
            .as("__sclc"))
      docs.select("doc_id").join(st, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_types"), lit(0L)).as("n_types"),
          round(col("n_types").cast("double") / col("n_tokens"), 6)
            .as("ttr"),
          round(log(col("n_tokens").cast("double")) -
            col("__sclc") / col("n_tokens"), 6).as("entropy"))
        .orderBy("doc_id")
    },

    // Benchmark decontamination: flag corpus docs overlapping the
    // (deterministic pseudo-)eval set doc_id % 101 == 0 by distinct
    // 3-gram containment. Eval dictionary broadcasts; corpus is
    // sketched map-only.
    "q_decontaminate" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      Decontaminate.flag(docs, docs.where(col("doc_id") % 101 === 0))
        .orderBy("doc_id")
    },

    // Bloom-filter decontamination — the corpus-vs-corpus scale path:
    // same pseudo-eval set as q_decontaminate, but membership goes
    // through the m=2^16-bit / k=4 md5-sliced bloom bitmap (config-
    // bounded broadcast; probe map-only, zero shuffle). n_maybe may
    // exceed q_decontaminate's n_hits by the FPR, never undercount —
    // the oracle recomputes the bloom verdicts exactly, so the values
    // are pinned, not tolerance-gated.
    "q_decontaminate_bloom" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      Bloom.flag(docs, docs.where(col("doc_id") % 101 === 0))
        .orderBy("doc_id")
    },

    // Text-hygiene normalization: control-strip + Unicode NFC + trim
    // (the pre-tokenization cleaning pass). The oracle restates the
    // same pipeline via DuckDB's utf8proc NFC — two independent
    // Unicode implementations must agree byte-for-byte on the corpus;
    // planted decomposed/control/mojibake edges are spec-pinned where
    // the fixture (already NFC-clean) can't exercise them.
    "q_text_clean" -> { (s, d) =>
      val clean = TextExpressions.textNormalizeClean(col("text"))
      Tables(s, d, "documents").select(
        col("doc_id"), clean.as("clean"),
        (clean =!= col("text")).as("changed"))
        .orderBy("doc_id")
    },

    // HTML → text extraction (the WET-file stage of a crawl pipeline).
    // The fixture is plain text, so each doc is wrapped in a
    // deterministic page template that plants every hazard the kernel
    // must survive: a <style> block, a <script> body containing a BARE
    // `<` (script-strip must precede tag-strip), a comment, and
    // entities BOTH inside markup (&amp; in a heading — decodes to &)
    // and as text-level escapes (&lt;b&gt; — must decode to literal
    // "<b>" AFTER tag-strip, not get re-stripped). The oracle replays
    // the identical replace chain, so the order of operations itself
    // is pinned, not just the end state.
    "q_text_html_extract" -> { (s, d) =>
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><style type=\"text/css\">p { color: red; }</style>"),
        lit("<script>if (1 < 2) { var x = \"&amp;\"; }</script></head>"),
        lit("<body><!-- nav\nboilerplate --><h1>Heading &amp; more</h1><p>"),
        col("text"),
        lit("</p><p>&quot;quoted&quot; &lt;b&gt;&nbsp;tail</p></body></html>"))
      Tables(s, d, "documents").select(
        col("doc_id"),
        TextFunctions.htmlExtract(html).as("extracted"))
        .withColumn("n_chars", length(col("extracted")))
        .orderBy("doc_id")
    },

    // PII redaction (emails, URLs, IPv4, phone-shaped digit groups) —
    // the corpus-hygiene pass; patterns live in the Java∩RE2 common
    // dialect so the oracle replaces identical spans.
    "q_text_redact" -> { (s, d) =>
      Tables(s, d, "documents").select(
        col("doc_id"),
        TextFunctions.redactPii(col("text")).as("redacted"))
        .orderBy("doc_id")
    },

    // Winnowed rolling-hash fingerprint (custom Catalyst expression).
    // Hash VALUES are engine-specific, so the oracle checks winnowing's
    // defining guarantee instead (Schleimer et al. §3): any shared
    // substring of length ≥ window+gram-1 (= 23 chars) yields ≥1 shared
    // fingerprint — asserted per doc against the doc embedded in a
    // longer string. A broken window/min selection flips the boolean →
    // red driver row.
    "q_text_fingerprint" -> { (s, d) =>
      val fp = TextExpressions.winnowFingerprint(col("text"))
      val embedded = TextExpressions.winnowFingerprint(
        concat(col("text"), lit(" trailing winnow containment pad")))
      Tables(s, d, "documents").select(
        col("doc_id"),
        (length(col("text")) < 8 || size(fp) >= 1).as("fp_nonempty"),
        (length(col("text")) < 23 || arrays_overlap(fp, embedded))
          .as("containment_ok"))
        .orderBy("doc_id")
    },

    // Exact heavy hitters: most frequent tokens corpus-wide (the
    // boilerplate/stop-shingle detection primitive behind the n-gram
    // hot-shingle cutoff). One shuffle on the token, partial map-side
    // counts, TakeOrdered top-k — no full sort.
    "q_text_top_tokens" -> { (s, d) =>
      Tables(s, d, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(20)
    },

    // Count-Min point-frequency estimates for the corpus's own exact
    // top-20 tokens: the d=4 × w=1024 sketch builds in ONE
    // explode+partial-agg pass (key space bounded at d·w cells), the
    // KB-sized sketch broadcasts to the probe side, and estimates are
    // min-over-rows. The md5-derived cells make the sketch AND every
    // estimate engine-restatable, so n_est is pinned as an EXACT value
    // (no tolerance boolean); over_ok additionally states the classic
    // never-undercount guarantee as arithmetic. Mergeability (cell-wise
    // addition, halves == whole) is CountMinSpec's exact-equality leg.
    "q_text_cms" -> { (s, d) =>
      val toks = Tables(s, d, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
      val sk = CountMin.sketch(toks, "tok")
      val top = toks.groupBy("tok").agg(count(lit(1)).as("n_true"))
        .orderBy(col("n_true").desc, col("tok")).limit(20)
        .localCheckpoint(true) // consumed twice: probes + truth join-back
      CountMin.estimate(sk, top.select("tok"), "tok")
        .join(broadcast(top), Seq("tok"))
        .select(col("tok").as("token"), col("n_true"), col("n_est"),
          (col("n_est") >= col("n_true")).as("over_ok"))
        .orderBy("token")
    },

    // Approximate heavy hitters (Misra-Gries, capacity 256): the
    // bounded-memory single-pass counterpart of q_text_top_tokens for
    // the domain-doesn't-fit regime. The gate pins the THEOREM as
    // integer arithmetic — every exact-top-10 token heavier than
    // n/(C+1) must be in the summary with
    // est <= true <= est + n/(C+1) — because MG counter VALUES are
    // merge-order-dependent (inherent) while the bound is not; a
    // broken trim/merge flips a boolean -> red row.
    "q_text_heavy_hitters" -> { (s, d) =>
      val cap = 256
      val toks = Tables(s, d, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
        .localCheckpoint(true) // consumed 3x: total, exact top, sketch
      val n = toks.count()
      val exactTop = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok")).limit(10)
      val sk = HeavyHitters.summary(toks, "tok", cap)
        .withColumnRenamed("item", "tok")
      exactTop.join(sk, Seq("tok"), "left")
        .select(col("tok"), col("n_exact"),
          (!(col("n_exact") * (cap + 1) > lit(n)) ||
            (col("est").isNotNull && col("est") <= col("n_exact") &&
              (col("n_exact") - col("est")) * (cap + 1) <= lit(n)))
            .as("ok"))
        .orderBy(col("n_exact").desc, col("tok"))
    },

    // BM25 top-k retrieval: a fixed 5-probe query set (including one
    // query whose terms are partly absent from the corpus) against the
    // documents table; the oracle recomputes the full Okapi scoring in
    // SQL. Scores rounded to 4 decimals AFTER ranking so the compared
    // values are engine-portable while ranks come from raw doubles.
    "q_search_bm25" -> { (s, d) =>
      TextSearch.bm25TopK(Tables(s, d, "documents"), bm25Probes(s), k = 10)
        .withColumn("score", round(col("score"), 4))
        .orderBy("query_id", "rank")
    },

    // The same retrieval through the persisted postings index
    // (build-once/serve-many, term-sorted layout + pushed IN filter —
    // the Ivf.search analog for text). SAME oracle as q_search_bm25:
    // the index must be result-invisible.
    "q_search_bm25_indexed" -> { (s, d) =>
      val (postings, stats) = servedBm25(s, d)
      TextSearch.searchIndex(postings, stats, bm25Probes(s), k = 10)
        .withColumn("score", round(col("score"), 4))
        .orderBy("query_id", "rank")
    },

    // TF-IDF keyword extraction: top-3 most characteristic terms per
    // doc (smooth idf); exact SQL restatement, rank ties broken by
    // term so the comparison is deterministic.
    "q_text_keywords" -> { (s, d) =>
      TextSearch.tfIdfKeywords(Tables(s, d, "documents"), k = 3)
        .withColumn("tfidf", round(col("tfidf"), 4))
        .orderBy("doc_id", "rank")
    },

    // Hybrid retrieval: BM25 lexical top-10 fused with embedding-cosine
    // semantic top-10 by reciprocal-rank fusion (c=60). The embedding
    // table's vec_id doubles as doc_id (parallel fixtures); queries 0-4
    // probe both systems. The oracle recomputes both rankings AND the
    // fusion, so a rank drift in either leg or a broken tie-break goes
    // red.
    "q_search_hybrid_rrf" -> { (s, d) =>
      val emb = Tables(s, d, "embeddings")
      val text = TextSearch.bm25TopK(Tables(s, d, "documents"),
        bm25Probes(s), k = 10).select("query_id", "rank", "doc_id")
      val vec = Similarity
        .bruteForceTopK(emb, emb.where(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("nbr_id").as("doc_id"))
      TextSearch.rrfFuse(Seq(text, vec), k = 10)
        .withColumn("rrf", round(col("rrf"), 6))
        .orderBy("query_id", "rank")
    },

    // Offline retrieval evaluation: the two retrieval systems the repo
    // serves (lexical BM25@10 and embedding-cosine@10, vec_id ≡ doc_id
    // as in q_search_hybrid_rrf) scored side-by-side against the exact
    // boolean-AND relevance truth (docs containing ALL query terms) —
    // the A/B quality report a team runs after touching a ranker or
    // the corpus. One row per (system, probe) with n_rel/hits/
    // rank_first plus precision/recall/RR/binary-nDCG at the cutoff;
    // the oracle recomputes both rankings, the truth set AND every
    // metric. The lexical system saturates by construction (conjunctive
    // truth ⊆ BM25 matches — pins the all-hits path); the cosine leg's
    // partial overlap exercises mid-range hits/rank_first/ndcg; query 4
    // ("nosuchword") pins the n_rel=0 edge: recall/ndcg NULL, rr 0.
    "q_search_eval" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val probes = bm25Probes(s)
      val qrels = TextSearch.booleanRelevance(docs, probes)
        .localCheckpoint(true) // consumed by both systems' hit joins
      val lex = TextSearch.bm25TopK(docs, probes, k = 10)
        .select("query_id", "rank", "doc_id")
      val emb = Tables(s, d, "embeddings")
      val cos = Similarity
        .bruteForceTopK(emb, emb.where(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("nbr_id").as("doc_id"))
      TextSearch.evalRanking(lex, qrels, probes, k = 10)
        .withColumn("system", lit("bm25"))
        .unionByName(TextSearch.evalRanking(cos, qrels, probes, k = 10)
          .withColumn("system", lit("cos")))
        .orderBy("system", "query_id")
    },

    // GRADED-relevance retrieval eval (VERDICT r16 ask #7) — the same
    // two systems against multi-level qrels: gain = number of distinct
    // query terms the doc contains (booleanRelevance is exactly the
    // full-gain slice, so the binary key's rows are untouched).
    // Exponential-gain nDCG exercises the DCG arithmetic the binary
    // case cannot (2^gain − 1 numerators; ideal ranking ordered by
    // gain); the IDCG fold runs over the per-query GAIN HISTOGRAM —
    // state bounded by query length, never corpus size. The oracle
    // restates qrels, both rankings, the hit DCG and a row_number
    // ideal ranking (equivalent arithmetic: within a gain level the
    // ideal order is irrelevant to the sum).
    "q_search_eval_graded" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val probes = bm25Probes(s)
      val qrels = TextSearch.gradedRelevance(docs, probes)
        .localCheckpoint(true) // consumed by both systems' metric legs
      val lex = TextSearch.bm25TopK(docs, probes, k = 10)
        .select("query_id", "rank", "doc_id")
      val emb = Tables(s, d, "embeddings")
      val cos = Similarity
        .bruteForceTopK(emb, emb.where(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("nbr_id").as("doc_id"))
      TextSearch.evalRankingGraded(lex, qrels, probes, k = 10)
        .withColumn("system", lit("bm25"))
        .unionByName(TextSearch
          .evalRankingGraded(cos, qrels, probes, k = 10)
          .withColumn("system", lit("cos")))
        .orderBy("system", "query_id")
    },

    // BPE tokenizer: distributed word-count training (bounded driver
    // merge loop) + codegen'd encode. Token COUNTS are model-specific
    // (no SQL restatement), so the driver row carries the restatable
    // pre-token count plus two per-row invariants that a broken merge
    // table or inconsistent encode/count kernel flips red: lossless
    // roundtrip (concat of subwords == concat of pre-tokens) and
    // count bounds (n_pretok <= n_bpe <= total pre-token chars, with
    // encode and the count-only kernel agreeing). Merge-list parity
    // vs an independent reference implementation is spec-pinned.
    "q_tokenize_bpe" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val model = BpeTokenizer.train(docs, numMerges = 200)
      val pre = BpeTokenizer.preTokens(col("text"))
      docs.select(col("doc_id"), pre.as("__pre"),
          BpeTokenizer.encode(model, col("text")).as("__bpe"),
          BpeTokenizer.countTokens(model, col("text")).as("__cnt"))
        .select(col("doc_id"),
          size(col("__pre")).cast("long").as("n_pretok"),
          (concat_ws("", col("__bpe")) === concat_ws("", col("__pre")))
            .as("roundtrip_ok"),
          (size(col("__bpe")) === col("__cnt") &&
            size(col("__bpe")) >= size(col("__pre")) &&
            size(col("__bpe")) <= length(concat_ws("", col("__pre"))))
            .as("bounded_ok"))
        .orderBy("doc_id")
    },

    // Bigram-LM quality scoring (CCNet-style): train an add-0.5
    // smoothed bigram model on the corpus, score every doc by mean
    // per-bigram negative log-likelihood — the trainable outlier
    // signal next to the rule-based q_text_quality. Exact-count model,
    // so the oracle restates train AND score in SQL.
    "q_quality_lm_score" -> { (s, d) =>
      TextLm.selfScore(Tables(s, d, "documents"), alpha = 0.5)
        .withColumn("nll", round(col("nll"), 4))
        .orderBy("doc_id")
    },

    // Multinomial Naive Bayes self-classification (the fastText-shaped
    // model-based filter): train per-lang token models on the corpus'
    // own labels, emit every doc's full ranked class posterior
    // (rank 1 = prediction; the rank-1-vs-stored-label disagreement is
    // the mislabel probe). Exact-count model + closed-form smoothing,
    // so the oracle restates train AND score in SQL — one float
    // surface (ln/÷, round-4), same contract as q_quality_lm_score.
    "q_text_classify_nb" -> { (s, d) =>
      NaiveBayes.selfScore(Tables(s, d, "documents"), labelCol = "lang",
          alpha = 0.5)
        .withColumn("logpost", round(col("logpost"), 4))
        .orderBy("doc_id", "rank")
    },

    // Corpus-overlap KMV sketch — the RAW scale-path operator: per-
    // source k-minimum-values sketches over word-3-gram md5 hashes,
    // pairwise Jaccard estimated from sketch rows only (estimation
    // cost independent of corpus size; HLL can union but not
    // intersect — this is the sketch that can). The exact-Jaccard
    // truth leg lives in the [[gateQueries]] override; the md5-prefix
    // hash makes even the ESTIMATE deterministic and SQL-restatable.
    // Dedup.spread BEFORE the explode: the tiny fixture scan is one
    // split, and without it the whole explode+md5+partial-distinct
    // chain serializes in a single task (Prof r14: one 5.5 s stage of
    // an 8.45 s total — the same collapsed-scan fan-out disease as
    // q_join_fuzzy, same explicit-count repartition cure).
    "q_sketch_overlap" -> { (s, d) =>
      val grams = Dedup.spread(Tables(s, d, "documents"))
        .select(col("source"), explode(wordGrams3(col("text"))).as("gram"))
      val sk = KmvSketch.sketch(grams, "source", col("gram"), k = 256)
      KmvSketch.pairJaccard(sk, OverlapPairs, k = 256)
        .select(col("src_a"), col("src_b"),
          round(col("jaccard_kmv"), 6).as("jaccard_kmv"))
        .orderBy("src_a", "src_b")
    },

    // Edit-distance fuzzy self-join (entity resolution): customer
    // names within levenshtein 1, PassJoin segment blocking (exact
    // recall by pigeonhole — the oracle is the ALL-PAIRS levenshtein
    // truth on the same subset, so a single missed pair goes red).
    // Subset keeps the oracle's quadratic restatement bounded; the
    // operator itself never goes all-pairs.
    "q_join_fuzzy" -> { (s, d) =>
      val cust = Tables(s, d, "customer").where(col("c_custkey") < 2000)
      FuzzyJoin.selfPairs(cust, "c_name", "c_custkey", maxDist = 1)
        .orderBy("id_a", "id_b")
    },

    // Flagship curation composition: quality filter + language filter +
    // exact dedup + near-dup cluster representatives, one declarative
    // plan — every stage individually oracle-verified, and the whole
    // composition hash-checked against a DuckDB restatement.
    "q_curate_corpus" -> { (s, d) =>
      Curate.corpus(Tables(s, d, "documents")).orderBy("doc_id")
    },

    // Curation with the Gopher-style repetition cut ENABLED (dup-3gram
    // fraction ≤ 0.03): the full composition again, with the
    // within-document repetition filter in the keep predicate. The
    // threshold is tuned so the cut provably bites on the fixture (1
    // kept-en doc at sf0.01, 7 at sf0.1 exceed it) — the oracle
    // restates the dup3 predicate, so a silently-disabled cut
    // hash-mismatches.
    "q_curate_corpus_gopher" -> { (s, d) =>
      Curate.corpus(Tables(s, d, "documents"), maxDupGram = 0.03)
        .orderBy("doc_id")
    },

    // Quality-threshold yield curve: docs and tokens surviving
    // `quality >= i/20` for every i = 0..20 — the tuning table behind
    // the curation minQuality knob. Integer threshold numerators and
    // long counts only (no float column in the output); the per-doc
    // bucket derives from the same quality double the curate keys
    // already hash-match raw, and the cumulative sums fall out of a
    // map-side sequence-explode (no single-partition running-total
    // window). The oracle restates score, bucket and explode exactly.
    "q_curate_threshold_sweep" -> { (s, d) =>
      Curate.thresholdSweep(Tables(s, d, "documents")).orderBy("thr_num")
    },

    // Curation funnel report: per-stage survivor counts (raw →
    // lang/quality → exact-unique → near-dup representatives) over
    // EXACTLY the stage frames q_curate_corpus ships (shared funnel).
    // The oracle reuses the full curate restatement's CTEs and counts
    // them, so a drift in ANY stage shows up as the wrong count at
    // that stage — a funnel-shaped diagnostic, not just a final hash.
    "q_curate_report" -> { (s, d) =>
      Curate.report(Tables(s, d, "documents")).orderBy("stage_idx")
    },

    // URL/domain curation (C4/RefinedWeb day-one pass): deterministic
    // per-doc URLs synthesized from the source column, host extraction
    // via parse_url, broadcast blocklist (one domain-level entry
    // blocking both its subdomain hosts, one host-level entry leaving
    // the sibling subdomain alive), then a per-registrable-domain cap
    // via the uniform-weight A-ES draw through TopKPerKey. The oracle
    // restates host parse, two-label domain, blocklist semantics and
    // the exact md5 draw ranking — the KEPT SET is pinned, not just
    // counts.
    "q_curate_url_filter" -> { (s, d) =>
      val docs = Tables(s, d, "documents").select(
        col("doc_id"),
        concat(lit("https://"),
          when(col("doc_id") % 2 === 0, lit("www.")).otherwise(lit("cdn.")),
          col("source"), lit("-site.org/page/"), col("doc_id")).as("url"))
      UrlCurate.filter(docs, "url", "doc_id",
        blocklist = Seq("src13-site.org", "cdn.src7-site.org"),
        perDomainCap = 15, seed = "url")
        .orderBy("doc_id")
    },

    // URL canonicalization + canonical-form dedup (the crawl-frontier
    // normalization): three deterministic messy variants per doc —
    // uppercase scheme/host + default port + tracking params + fragment
    // (mod 0), clean-but-unsorted params (mod 1), http:80 + gclid
    // (mod 2) — where variants 0 and 1 derive host AND path from
    // doc_id div 2, so every (6m, 6m+1) sibling pair collapses to one
    // canonical form and the dedup's rep/is_dup columns are exercised,
    // not just the string transform. Oracle restates the full chain:
    // part extraction, port strip, param filter + sort, group-min rep.
    "q_curate_url_canon" -> { (s, d) =>
      val docs = Tables(s, d, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(
          lit("HTTPS://WWW.S"), expr("(doc_id div 2) % 50"),
          lit("-Site.ORG:443/A/"), expr("doc_id div 2"),
          lit("?utm_source=feed&b=2&a=1#frag")))
        .when(col("doc_id") % 3 === 1, concat(
          lit("https://www.s"), expr("(doc_id div 2) % 50"),
          lit("-site.org/A/"), expr("doc_id div 2"),
          lit("?b=2&a=1")))
        .otherwise(concat(
          lit("http://CDN."), col("source"),
          lit("-site.org:80/A/"), col("doc_id"),
          lit("/?gclid=xyz"))).as("url"))
      UrlCurate.canonicalDedup(docs, "url", "doc_id")
        .orderBy("doc_id")
    },

    // Centrality-weighted URL curation (RefinedWeb §3.1 spirit):
    // Graph.pagerank composed with UrlCurate — each page carries a
    // deterministic outlink to one of 7 hub domains (doc_id % 7), so
    // the domain graph has 7 high-in-degree hubs and 13 periphery
    // domains; hubs earn caps above baseCap, periphery decays to the
    // floor. The oracle restates the WHOLE derivation — edge list,
    // 5 unrolled pagerank iterations, the integer cap quantization
    // and the exact md5 draw ranking — so the kept set is pinned.
    "q_curate_url_rank" -> { (s, d) =>
      val docs = Tables(s, d, "documents").select(
        col("doc_id"),
        concat(lit("https://"),
          when(col("doc_id") % 2 === 0, lit("www.")).otherwise(lit("cdn.")),
          col("source"), lit("-site.org/page/"), col("doc_id")).as("url"),
        concat(lit("https://www.src"), col("doc_id") % 7,
          lit("-site.org/ref")).as("out_url"))
      UrlCurate.rankWeightedCap(docs, "url", "out_url", "doc_id",
        baseCap = 10, maxCap = 40, iters = 5, seed = "url")
        .orderBy("doc_id")
    },

    // Sliding-window chunking (the embedding-pipeline preprocessing
    // step: context-budget windows with overlap, LangChain-standard
    // layout — see TextChunk scaladoc). Map-only explode, no shuffle;
    // oracle restates tokenization + slice arithmetic exactly.
    "q_text_chunks" -> { (s, d) =>
      TextChunk.chunks(Tables(s, d, "documents"),
        chunkTokens = 64, overlapTokens = 16)
        .withColumn("chunk_idx", col("chunk_idx").cast("long"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Cross-document boilerplate removal (CCNet-style): planted
    // per-source header/footer lines (df ≈ docs-per-source ≫ 30)
    // must strip; body lines keep their order. Exact df truth —
    // full DuckDB restatement.
    "q_text_boilerplate" -> { (s, d) =>
      val planted = Tables(s, d, "documents").select(
        col("doc_id"),
        concat(lit("NOTICE "), col("source"), lit("\n"), col("text"),
          lit("\nCOPYRIGHT "), col("source")).as("text"))
      Dedup.boilerplate(planted, minDf = 30L)
        .select("doc_id", "n_lines", "n_dropped", "text")
        .orderBy("doc_id")
    },

    // Code-vs-prose detection (StarCoder/Pile-style routing
    // heuristic): symbol density + indented-line and
    // statement-terminator line fractions, one map-only pass of
    // codegen'd regex built-ins. Pure integer-ratio arithmetic with
    // the expression tree mirrored in the oracle, so the boolean cut
    // is engine-exact.
    "q_text_code_detect" -> { (s, d) =>
      val t = col("text")
      val nLines = size(split(t, "\n", -1)).cast("double")
      val symFrac = size(regexp_extract_all(t,
        lit("[{}()\\[\\];=<>]"), lit(0))).cast("double") /
        greatest(length(t).cast("double"), lit(1.0))
      val indentFrac = size(regexp_extract_all(t,
        lit("(?m)^(?: {2,}|\\t)"), lit(0))).cast("double") / nLines
      val eolFrac = size(regexp_extract_all(t,
        lit("(?m)[;{}][ \\t]*$"), lit(0))).cast("double") / nLines
      val score = symFrac + lit(0.5) * indentFrac + lit(0.5) * eolFrac
      Tables(s, d, "documents").select(
        col("doc_id"),
        symFrac.as("sym_frac"),
        indentFrac.as("indent_frac"),
        eolFrac.as("eol_frac"),
        score.as("code_score"),
        (score > lit(0.05)).as("is_code"))
        .orderBy("doc_id")
    },

    // Distribution-anchored quality cut: keep the best 20% by score,
    // threshold from ONE mergeable approx_percentile pass (no global
    // sort, no single-partition funnel). The gate override pins
    // n_total exactly plus the structural cut + fraction invariants.
    "q_quality_top_frac" -> { (s, d) =>
      Curate.topFraction(Tables(s, d, "documents"), frac = 0.2)
        .orderBy("doc_id")
    },

    // Exact dedup: lowest doc_id survives per identical text.
    "q_dedup_exact" -> { (s, d) =>
      Dedup.exact(Tables(s, d, "documents"))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },

    // Span-level (sub-document) dedup: cross-doc repeated 10-word
    // spans removed, first occurrence (by doc_id, span_idx) wins, docs
    // reassembled from their surviving spans — the duplicate class
    // whole-doc dedup can't touch (boilerplate spans inside
    // otherwise-distinct docs). Fires for real on the fixture (57 docs
    // lose spans at sf0.01), so a broken keep policy hash-mismatches.
    "q_dedup_spans" -> { (s, d) =>
      Dedup.spanDedup(Tables(s, d, "documents")).orderBy("doc_id")
    },

    // Span-level provenance: every (doc, span) row with its keep/drop
    // flag — the masking surface a pipeline uses to audit (or
    // re-apply) the span scrub.
    "q_dedup_spans_flags" -> { (s, d) =>
      Dedup.spanFlags(Tables(s, d, "documents"))
        .orderBy("doc_id", "span_idx")
    },

    // EXACT-SUBSTRING dedup (Lee et al. 2022 ExactSubstr, sliding
    // form): a window at EVERY word offset, so duplicated runs are
    // cut wherever they land — the offset-exact sibling of the stride
    // grid above. Keeper = global min (doc, start); non-keeper ranges
    // island-merged per doc and cut. Exact oracle restates the window
    // grid, keeper election, island merge, and reassembly.
    "q_dedup_substrings" -> { (s, d) =>
      Dedup.exactSubstrDedup(Tables(s, d, "documents"))
        .orderBy("doc_id")
    },

    // INTRA-doc line dedup (map-only within-row scrub): fixture plants
    // each doc's full text twice and a 40-char prefix line twice, so
    // every doc drops exactly its repeats (docs shorter than the
    // prefix collapse further — same rule both sides). Exact oracle:
    // first-occurrence-order distinct restated via min(ord) per line.
    "q_dedup_lines" -> { (s, d) =>
      val planted = Tables(s, d, "documents")
        .where(col("doc_id") % 3 === 0)
        .withColumn("text", concat_ws("\n",
          col("text"), substring(col("text"), 1, 40),
          col("text"), substring(col("text"), 1, 40)))
      Dedup.intraDocLineDedup(planted)
        .select("doc_id", "text", "n_lines", "n_dropped")
        .orderBy("doc_id")
    },

    // MinHash+LSH near-dup pairs — the RAW scale-path operator (banded
    // signatures → bucket join → exact-Jaccard verify). Benched as-is;
    // its recall/precision gate vs the exact truth lives in
    // [[gateQueries]] under the same key (Verify-only).
    "q_dedup_minhash" -> { (s, d) =>
      Dedup.minhashLsh(Tables(s, d, "documents"), threshold = 0.3)
        .orderBy("id_a", "id_b")
    },

    // SimHash near-dup pairs — the raw pigeonhole-banded operator; the
    // completeness gate is the [[gateQueries]] override.
    "q_dedup_simhash" -> { (s, d) =>
      Dedup.simhashDup(Tables(s, d, "documents")).orderBy("id_a", "id_b")
    },

    // Exact word-3-gram Jaccard pairs within language blocks. Finite
    // hot-shingle cutoff wired explicitly: at web scale one boilerplate
    // shingle otherwise creates a df² join bucket (the operator's
    // quadratic failure mode); at the fixture scales no shingle comes
    // near the cutoff (max df 25 at sf0.1), so the DuckDB oracle —
    // which has no cutoff — still hash-matches exactly.
    "q_dedup_ngram_jaccard" -> { (s, d) =>
      Dedup.ngramJaccardPairs(Tables(s, d, "documents"),
        blockCols = Seq("lang"), threshold = 0.1,
        maxShingleDf = Dedup.DefaultMaxShingleDf)
        .select("lang", "id_a", "id_b", "jaccard")
        .orderBy("lang", "id_a", "id_b")
    },

    // Transitive duplicate clusters over the n-gram-Jaccard pairs:
    // connected components labeled by the canonical (min) member.
    "q_dedup_clusters" -> { (s, d) =>
      val pairs = Dedup.ngramJaccardPairs(Tables(s, d, "documents"),
        blockCols = Seq("lang"), threshold = 0.1,
        maxShingleDf = Dedup.DefaultMaxShingleDf)
      Dedup.clusters(pairs).orderBy("doc_id")
    },

    // Embedding-cosine near-dup pairs within label blocks.
    "q_dedup_embed_cosine" -> { (s, d) =>
      Dedup.embeddingCosinePairs(Tables(s, d, "embeddings"),
        blockCols = Seq("label"), threshold = 0.35)
        .orderBy("label", "id_a", "id_b")
    },

    // Scale-path embed near-dup pairs — raw LSH-bucketed operator
    // (sign-random-projection candidates + exact dot verify); its
    // recall/subset gate vs the exact baseline is the [[gateQueries]]
    // override.
    "q_dedup_embed_lsh" -> { (s, d) =>
      Dedup.embeddingCosinePairsLsh(Tables(s, d, "embeddings"),
        blockCols = Seq("label"), threshold = 0.35, tables = 32, bits = 4)
        .orderBy("label", "id_a", "id_b")
    },

    // SemDeDup-style semantic dedup (cluster embeddings, compare pairs
    // only within a cluster — the modern curation step for LLM corpora).
    // Raw operator benched here; correctness rides the [[gateQueries]]
    // override (cluster assignment is engine-specific, so the raw pair
    // set has no SQL restatement — the gate pins precision, planted
    // recall, and the DuckDB-exact global pair count instead).
    "q_dedup_semantic" -> { (s, d) =>
      Dedup.semanticPairs(Tables(s, d, "embeddings"), nClusters = 8,
        threshold = 0.35)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    },

    // Brute-force cosine top-k: exact baseline for similarity search.
    "q_sim_topk" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 10), k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // LSH-bucketed ANN top-k — raw operator, tuned regime (32 tables ×
    // 4 bits for this near-random corpus). Per-row optimality gate is
    // the [[gateQueries]] override; set-level recall is the gate-only
    // key q_sim_ann_lsh_recall.
    "q_sim_ann_lsh" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      Similarity.annTopK(e, e.where(col("vec_id") < 10), k = 5,
        tables = 32, bits = 4)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // IVF ANN top-k — raw operator (build + probe). The per-call build
    // here is the self-contained query form; the build-once /
    // search-many shape for repeated serving is [[Ivf.persist]] /
    // [[Ivf.load]] (search-from-persisted == search-from-fresh,
    // asserted in ExtSpec).
    "q_sim_ann_ivf" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val (assigned, centroids) = Ivf.build(e, nlist = 16, iters = 2)
      Ivf.search(assigned, centroids, e.where(col("vec_id") < 10),
        k = 5, nprobe = 4)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // IVF ANN SERVING path: the index is trained and persisted ONCE per
    // corpus (process-wide cache → TableStore snapshot), and the query
    // only pays probe + per-cell dot products — the build-once /
    // search-many cost model the 100 TB design claims. The build is
    // deterministic (hash-ordered init), so served results ==
    // fresh-build results and the same optimality oracle applies.
    // Bench-visible: after the first call amortizes the build, the
    // median-of-3 timing is search-only.
    "q_sim_ann_ivf_search" -> { (s, d) =>
      val (assigned, centroids) = servedIvf(s, d)
      Ivf.search(assigned, centroids,
        Tables(s, d, "embeddings").where(col("vec_id") < 10),
        k = 5, nprobe = 4)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // Product-quantization ANN (Jégou 2011) — the memory-bounded third
    // scale path beside LSH and IVF: 64 floats/row serve as 16 codes,
    // ADC table adds + exact re-rank of the top-100. Self-contained
    // build (deterministic sample-trained codebooks, map-only encode)
    // + search; optimality + recall gates override in gateQueries.
    "q_sim_ann_pq" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val model = Pq.train(e, m = 16, k = 64, iters = 8)
      val codes = Pq.encode(e, model)
      Pq.search(codes, model, e, e.where(col("vec_id") < 10),
        k = 5, rerank = 100)
        .orderBy("query_id", "rank")
    },

    // PQ SERVING path (the Ivf `_search` analog): codebooks + codes
    // train/encode ONCE per corpus snapshot and persist; the query
    // pays only ADC + re-rank. Deterministic build ⇒ served == fresh
    // ⇒ the same optimality oracle applies (gate override below).
    "q_sim_ann_pq_search" -> { (s, d) =>
      val (codes, model) = servedPq(s, d)
      Pq.search(codes, model, Tables(s, d, "embeddings"),
        Tables(s, d, "embeddings").where(col("vec_id") < 10),
        k = 5, rerank = 100)
        .orderBy("query_id", "rank")
    },

    // IVF-PQ composite (faiss IVFx,PQy; Jégou 2011 §V): coarse cells
    // bound the SCAN (nprobe/nlist of the corpus), shared residual
    // codebooks bound the BYTES (m codes/row) — both billion-scale
    // levers in one index. nlist=8/nprobe=6 mirrors the IVF recall
    // gate (the near-random fixture is the cell-probing worst case);
    // optimality + recall gates override in gateQueries.
    "q_sim_ann_ivfpq" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val (codes, model) = IvfPq.build(e, nlist = 8, ivfIters = 2,
        m = 16, k = 64, pqIters = 8)
      IvfPq.search(codes, model, e, e.where(col("vec_id") < 10),
        k = 5, nprobe = 6, rerank = 100)
        .orderBy("query_id", "rank")
    },

    // IVF-PQ SERVING path (the Ivf/Pq `_search` analog): index built
    // and persisted once per corpus snapshot; queries pay cell routing
    // + ADC over probed cells + re-rank only. Deterministic build →
    // served == fresh → same optimality gate applies.
    "q_sim_ann_ivfpq_search" -> { (s, d) =>
      val (codes, model) = servedIvfPq(s, d)
      IvfPq.search(codes, model, Tables(s, d, "embeddings"),
        Tables(s, d, "embeddings").where(col("vec_id") < 10),
        k = 5, nprobe = 6, rerank = 100)
        .orderBy("query_id", "rank")
    }
  )

  /** Build-once cache behind `q_sim_ann_ivf_search`: first call per
    * corpus snapshot trains the IVF index and persists it via
    * [[Ivf.persist]] into a temp TableStore root; every later call (and
    * every other thread) serves from the persisted snapshot through
    * [[Ivf.load]]. The cache key is (corpus dir, embeddings fingerprint)
    * — size + mtime of the parquet files — so a rewritten corpus under
    * the same path rebuilds instead of serving a stale index. Temp roots
    * are deleted on JVM exit (they are per-process serving state, not a
    * durable artifact; a real deployment would persist to a managed
    * TableStore path with its own lifecycle). */
  private val ivfServeRoot = new ServeCache(8, "graft_ivf_serve")

  /** Cheap content fingerprint of a fixture table: (path, length,
    * mtime) of each parquet part, hashed. Local-filesystem stat calls
    * only — O(#files), no data read. */
  private def tableFingerprint(d: String, table: String): String = {
    val p = java.nio.file.Paths.get(d, s"$table.parquet")
    import scala.jdk.CollectionConverters._
    val parts: Seq[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(p)) {
        val st = java.nio.file.Files.list(p)
        try st.iterator().asScala.toSeq.sortBy(_.toString)
        finally st.close()
      } else Seq(p)
    val sig = parts.map { f =>
      val sz = if (java.nio.file.Files.exists(f))
        java.nio.file.Files.size(f) else -1L
      val mt = if (java.nio.file.Files.exists(f))
        java.nio.file.Files.getLastModifiedTime(f).toMillis else -1L
      s"$f:$sz:$mt"
    }.mkString("|")
    Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sig))
  }

  /** The fixed probe set behind both `q_search_bm25*` keys: four
    * in-vocabulary probes of varying selectivity plus one whose terms
    * are partly absent from the corpus (restated as VALUES in the
    * shared oracle — keep in sync). */
  private def bm25Probes(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (0, "spark window merge"),
      (1, "customer filter join order"),
      (2, "vector scan batch"),
      (3, "the data"),
      (4, "hash join probe nosuchword")).toDF("query_id", "qtext")
  }

  /** Build-once cache behind `q_search_bm25_indexed` — the
    * [[servedIvf]] twin for the text index: first call per corpus
    * snapshot tokenizes + aggregates the postings and persists them via
    * [[TextSearch.persistIndex]]; later calls serve from the snapshot.
    * Cache key = (corpus dir, documents fingerprint). */
  private val bm25ServeRoot = new ServeCache(8, "graft_bm25_serve")

  private def servedBm25(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val key = s"$d@${tableFingerprint(d, "documents")}"
    val root = bm25ServeRoot.getOrBuild(key) { r =>
      val (postings, stats) = TextSearch.index(Tables(s, d, "documents"))
      TextSearch.persistIndex(s, r, postings, stats)
    }
    TextSearch.loadIndex(s, root).getOrElse(
      sys.error(s"persisted BM25 index missing under $root"))
  }

  private def servedIvf(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val key = s"$d@${tableFingerprint(d, "embeddings")}"
    val root = ivfServeRoot.getOrBuild(key) { r =>
      val (assigned, centroids) =
        Ivf.build(Tables(s, d, "embeddings"), nlist = 16, iters = 2)
      Ivf.persist(s, r, assigned, centroids)
    }
    Ivf.load(s, root).getOrElse(
      sys.error(s"persisted IVF index missing under $root"))
  }

  /** Build-once cache behind `q_sim_ann_pq_search` — the PQ analog of
    * [[servedIvf]]: same fingerprint key, same temp-root lifecycle. */
  private val pqServeRoot = new ServeCache(8, "graft_pq_serve")

  private def servedPq(s: SparkSession, d: String): (DataFrame, Pq.Model) = {
    val key = s"$d@${tableFingerprint(d, "embeddings")}"
    val root = pqServeRoot.getOrBuild(key) { r =>
      val e = Tables(s, d, "embeddings")
      val model = Pq.train(e, m = 16, k = 64, iters = 8)
      Pq.persist(s, r, Pq.encode(e, model), model)
    }
    Pq.load(s, root).getOrElse(
      sys.error(s"persisted PQ index missing under $root"))
  }

  /** Build-once cache behind `q_sim_ann_ivfpq_search` — the IVF-PQ
    * analog of [[servedPq]]: same fingerprint key, same temp-root
    * lifecycle. */
  private val ivfPqServeRoot = new ServeCache(8, "graft_ivfpq_serve")

  private def servedIvfPq(s: SparkSession, d: String)
      : (DataFrame, IvfPq.Model) = {
    val key = s"$d@${tableFingerprint(d, "embeddings")}"
    val root = ivfPqServeRoot.getOrBuild(key) { r =>
      val e = Tables(s, d, "embeddings")
      val (codes, model) = IvfPq.build(e, nlist = 8, ivfIters = 2,
        m = 16, k = 64, pqIters = 8)
      IvfPq.persist(s, r, codes, model)
    }
    IvfPq.load(s, root).getOrElse(
      sys.error(s"persisted IVF-PQ index missing under $root"))
  }

  /** Verify-only quality gates (merged over [[queries]] by
    * `SparkEntry.verifyQueries`; NEVER benched — each embeds a
    * brute-force truth baseline that is deliberately O(n²) on the
    * fixture, which would both mask operator regressions in the bench
    * and contradict the no-quadratic-stage design if it sat in the
    * declared operator map). Same-named keys OVERRIDE the raw operator
    * definition at Verify time, so the driver's correctness surface is
    * unchanged. All recall booleans are `coalesce(.., true)`: an empty
    * truth set (possible at other scales/fixtures) means "nothing to
    * recall", not a null that would hash-mismatch the oracle's `true`. */
  /** Word-3-gram strings (the KMV overlap element), mirrored verbatim
    * by the oracle's `array_to_string(w[i+1:i+3], ' ')` over
    * `range(0, len(w)-2)`. Docs with <3 whitespace tokens contribute
    * nothing. */
  private def wordGrams3(text: Column): Column = {
    val w = split(trim(text), "\\s+")
    when(length(trim(text)) === 0 || size(w) < 3,
      array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", slice(w, i + 1, lit(3)))))
  }

  private val OverlapPairs =
    Seq(("src0", "src1"), ("src0", "src2"), ("src1", "src2"))

  val gateQueries: Map[String, Q] = Map(
    // Incremental heavy-hitter ROLLUP, end to end through persistence
    // — the [[HeavyHitters.merge]] lifecycle as a driver row (the
    // q_agg_hll_incremental pattern, for frequencies): the corpus
    // arrives as three ingest batches; each batch persists ONE
    // capacity-C summary (C rows) into an AppendStore, and the rollup
    // re-aggregates the persisted (item, est) rows through the same
    // MG trim — history is never rescanned; any rollup costs
    // O(batches × C) rows. The gate pins the mergeable-summaries
    // theorem (Agarwal et al., PODS'12) against the CONCATENATED
    // truth as integer arithmetic: every exact-top-10 token heavier
    // than n/(C+1) must be present with est <= true <= est + n/(C+1),
    // where n is the TOTAL weight across all batches. Gate-only
    // (never benched) BY DESIGN: the three blocking store round-trips
    // are scheduling overhead in local mode; the data-proportional
    // work (tokenize + MG pass) is benched under q_text_heavy_hitters.
    // The temp store lands under java.io.tmpdir (per-call scratch,
    // OS-reaped — the returned frame reads it lazily, so no eager
    // delete).
    "q_text_heavy_hitters_rollup" -> { (s, d) =>
      import graft.cdc.AppendStore
      val cap = 256
      val toks = Tables(s, d, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
        .localCheckpoint(true) // consumed by 3 batch passes + truth legs
      val root = java.nio.file.Files
        .createTempDirectory("graft_hh_rollup").toString
      val store = new AppendStore(s, root)
      Seq(0L, 1L, 2L).foreach { b =>
        store.write(
          HeavyHitters.summary(toks.where(col("doc_id") % 3 === b),
            "tok", cap), b)
      }
      val sk = HeavyHitters.merge(store.read().get, cap)
        .withColumnRenamed("item", "tok")
      val n = toks.count()
      val exactTop = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok")).limit(10)
      exactTop.join(sk, Seq("tok"), "left")
        .select(col("tok"), col("n_exact"),
          (!(col("n_exact") * (cap + 1) > lit(n)) ||
            (col("est").isNotNull && col("est") <= col("n_exact") &&
              (col("n_exact") - col("est")) * (cap + 1) <= lit(n)))
            .as("ok"))
        .orderBy(col("n_exact").desc, col("tok"))
    },

    // Incremental Count-Min ROLLUP through persistence — the
    // [[CountMin.merge]] lifecycle as a driver row (the frequency
    // twin of q_text_heavy_hitters_rollup, but EXACT: counts add
    // cell-wise, so the rolled-up estimates are value-pinned, not
    // theorem-gated): three ingest batches each persist ONE ≤ d·w-row
    // sketch into an AppendStore; the rollup sums the persisted cells
    // — history never rescanned, O(batches · d·w) rows per rollup.
    // The oracle restates the PER-BATCH sketches and the cell-wise
    // sum, so a rollup that double-counts a batch, drops one, or
    // re-reads raw history goes red on values. Gate-only (never
    // benched): the store round-trips are scheduling overhead in
    // local mode; the data-proportional sketch pass is benched under
    // q_text_cms.
    "q_text_cms_rollup" -> { (s, d) =>
      import graft.cdc.AppendStore
      val toks = Tables(s, d, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
        .localCheckpoint(true) // consumed by 3 batch passes + truth leg
      val root = java.nio.file.Files
        .createTempDirectory("graft_cms_rollup").toString
      val store = new AppendStore(s, root)
      Seq(0L, 1L, 2L).foreach { b =>
        store.write(
          CountMin.sketch(toks.where(col("doc_id") % 3 === b), "tok"), b)
      }
      val sk = CountMin.merge(store.read().get.select("r", "cell", "cnt"))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("n_true"))
        .orderBy(col("n_true").desc, col("tok")).limit(20)
        .localCheckpoint(true) // consumed twice: probes + truth join-back
      CountMin.estimate(sk, top.select("tok"), "tok")
        .join(broadcast(top), Seq("tok"))
        .select(col("tok").as("token"), col("n_true"), col("n_est"),
          (col("n_est") >= col("n_true")).as("over_ok"))
        .orderBy("token")
    },

    // Compression-ratio gate: deflate has no DuckDB restatement, so
    // the driver row pins engine-independent INVARIANTS of the
    // kernel as all-true booleans — (1) the zlib worst-case bound
    // (compressed <= raw + 64 at our doc sizes; a kernel emitting
    // garbage lengths goes red), and (2) doubled-text monotonicity:
    // deflate(text||text)/2n < deflate(text)/n for docs > 200 bytes
    // (the second copy is one back-reference — a kernel that fails
    // to find repetition, e.g. a broken window or a length-only fake,
    // goes red). The discriminative spread (repetitive << natural <<
    // salad) is CompressSpec's job.
    "q_text_compress" -> { (s, d) =>
      val t = col("text")
      val r = TextFunctions.compressionRatio(t)
      val r2 = TextFunctions.compressionRatio(concat(t, t))
      Tables(s, d, "documents").select(
        col("doc_id"),
        // Margin is size-proportional (deflateBound shape): raw-deflate
        // stored blocks cost ~5 bytes per 64 KB, which outgrows a fixed
        // 64-byte slack on large incompressible docs (ADVICE r16) —
        // 64 + ceil(raw/16384) stays safely above 5/65536 per byte.
        when(octet_length(t) === 0, r === 1.0)
          .otherwise(r > 0.0 &&
            r * octet_length(t) <= octet_length(t).cast("double") + 64.0 +
              ceil(octet_length(t).cast("double") / 16384.0))
          .as("bound_ok"),
        (octet_length(t) <= 200 || r2 < r).as("doubled_lt"))
        .orderBy("doc_id")
    },

    // Top-fraction quality cut gate. The approx threshold value is
    // engine-specific (quantile sketch), so the pair set is not
    // restatable; the scale-independent invariants are: (1) n_total
    // exact; (2) the cut is CLEAN — every dropped score lies strictly
    // below every kept score (structural for any threshold filter, so
    // a broken comparison or a lost broadcast goes red); (3) the kept
    // fraction lands within ±0.05 of the requested 0.2 (the sketch
    // accuracy check — a mis-anchored quantile misses it).
    "q_quality_top_frac" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val kept = Curate.topFraction(docs, frac = 0.2)
      val scored = docs.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      val dropped = scored.join(kept.select("doc_id"), Seq("doc_id"),
        "left_anti")
      scored.agg(count(lit(1)).as("n_total"))
        .crossJoin(kept.agg(count(lit(1)).as("__nk"),
          min("quality").as("__min_kept")))
        .crossJoin(dropped.agg(max("quality").as("__max_dropped")))
        .select(col("n_total"),
          (abs(col("__nk").cast("double") / col("n_total") - 0.2) <= 0.05)
            .as("frac_kept_ok"),
          (col("__max_dropped").isNull ||
            col("__max_dropped") < col("__min_kept")).as("cut_clean"))
    },

    // KMV overlap gate: the raw estimates PLUS the exact Jaccard over
    // the full distinct hash sets — the corpus-sized intersection the
    // sketch exists to avoid lives only here (verify-only), and the
    // oracle restates BOTH columns exactly (the md5-prefix hash makes
    // the whole sketch deterministic), so the estimate is hash-pinned
    // as a value, not bounded by a tolerance boolean.
    "q_sketch_overlap" -> { (s, d) =>
      val docs = Dedup.spread(Tables(s, d, "documents"))
      val grams = docs.select(col("source"),
        explode(wordGrams3(col("text"))).as("gram"))
      val sk = KmvSketch.sketch(grams, "source", col("gram"), k = 256)
      val est = KmvSketch.pairJaccard(sk, OverlapPairs, k = 256)
      val exact = KmvSketch.pairJaccardExact(grams, "source",
        col("gram"), OverlapPairs)
      est.join(exact, Seq("src_a", "src_b"))
        .select(col("src_a"), col("src_b"),
          round(col("jaccard_kmv"), 6).as("jaccard_kmv"),
          round(col("jaccard_exact"), 6).as("jaccard_exact"))
        .orderBy("src_a", "src_b")
    },

    // MinHash+LSH quality gate. Ground truth = the exact inverted-index
    // Jaccard pairs (same shingle kernel, no blocking), which DuckDB
    // restates independently — so n_exact is a real oracle value, and
    // the booleans make LSH recall/precision driver-visible: the LSH
    // output is exact-Jaccard-verified, so it must be a SUBSET of the
    // truth (no_spurious_pairs), and banding (128 hashes × 32 bands)
    // must recover ≥90% of true pairs at this threshold (measured 1.0
    // at sf0.01/sf0.1 — deterministic seeds).
    "q_dedup_minhash" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val exact = Dedup.ngramJaccardPairs(docs, blockCols = Nil,
        threshold = 0.3).select("id_a", "id_b")
      val lsh = Dedup.minhashLsh(docs, threshold = 0.3).select("id_a", "id_b")
      val recall = exact
        .join(lsh.withColumn("__hit", lit(1)), Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (sum(coalesce(col("__hit"), lit(0))).cast("double") /
            count(lit(1))).as("__recall"))
      val spurious = lsh.join(exact, Seq("id_a", "id_b"), "left_anti")
        .agg(count(lit(1)).as("__spur"))
      recall.crossJoin(spurious).select(col("n_exact"),
        coalesce(col("__recall") >= 0.9, lit(true)).as("recall_ge_09"),
        (col("__spur") === 0).as("no_spurious_pairs"))
    },

    // SimHash completeness gate. The pigeonhole block construction
    // PROVES recall 1 at Hamming ≤ 3: every truth pair (brute-force
    // 64-bit Hamming over all id pairs — a verification-only O(n²)
    // scan, cheap because each side is one long per doc) must appear
    // in the banded output. No pinned pair count: the sketch is
    // engine-specific and a fixed constant is only valid for one
    // fixture scale — the completeness boolean is the scale-independent
    // invariant.
    "q_dedup_simhash" -> { (s, d) =>
      val docs = Tables(s, d, "documents")
      val sh = docs.select(col("doc_id"),
        TextExpressions.simhash64(TextFunctions.tokens(col("text"))).as("__sim"))
      val a = sh.select(col("doc_id").as("id_a"), col("__sim").as("__sa"))
      val b = sh.select(col("doc_id").as("id_b"), col("__sim").as("__sb"))
      val truth = a.crossJoin(b).where(col("id_a") < col("id_b") &&
        bit_count(col("__sa").bitwiseXOR(col("__sb"))) <= 3)
        .select("id_a", "id_b")
      val found = Dedup.simhashDup(docs).select("id_a", "id_b")
      truth.join(found.withColumn("__f", lit(1)), Seq("id_a", "id_b"), "left")
        .agg(coalesce(sum(coalesce(col("__f"), lit(0))) === count(lit(1)),
          lit(true)).as("recall_complete"))
    },

    // Span near-dup gate (gate-only key) — the one r12 operator whose
    // correctness the driver couldn't see (spec-only planted fixtures).
    // The FULL span-granular truth is quadratic in SPANS (~10× docs —
    // it would dominate the sf0.1 oracle sweep), so the gate BLOCKS
    // truth to docs with doc_id < 150 (~1.5k spans → a bounded ~1M
    // verification-only comparisons) and restates three claims:
    //   n_exact — the blocked truth pair count, which DuckDB recomputes
    //     independently with string 2-grams (same-set semantics as the
    //     hashed-shingle kernel modulo 64-bit collisions — the trade
    //     every sketch oracle here makes);
    //   recall_ge_08 — the banded sketch (k=64, 32 bands × 2 rows →
    //     P[candidate | j=0.3] ≈ 1-(1-0.3²)³² ≈ 0.95) must recover
    //     ≥80% of blocked truth pairs (measured 1.0 at sf0.01/sf0.1 —
    //     deterministic seeds);
    //   no_spurious_pairs — candidates are verified with the SAME
    //     exact-Jaccard kernel the truth uses, so the output must be a
    //     subset of truth.
    // Output pairs are canonicalized to (doc_id, span_idx) order: the
    // operator orders a/b by its synthetic 64-bit span id, which is a
    // hash — engine-specific, not part of the contract.
    "q_dedup_spans_near" -> { (s, d) =>
      val docs = Tables(s, d, "documents").where(col("doc_id") < 150)
      // Token-less (empty/whitespace-only) spans are excluded from BOTH
      // truth legs: hashedShingles returns an empty set for them, so
      // the Spark jaccard is 0 and they never pair — while DuckDB's
      // string_split_regex('') yields [''] (one empty gram), which
      // would give empty–empty pairs jaccard 1 and inflate n_exact.
      // The fixture has no blank docs today; the filter keeps the two
      // restatements equivalent if it ever does (ADVICE r13).
      val spans = Dedup.spanRows(docs, "text", "doc_id", 10)
        .withColumn("__sh", TextExpressions.hashedShingles(col("span"), 2))
        .where(size(col("__sh")) > 0)
        .localCheckpoint(true) // one split+sketch pass for both legs
      val a = spans.select(col("doc_id").as("id_a"),
        col("span_idx").as("ix_a"), col("__sh").as("sh_a"))
      val b = spans.select(col("doc_id").as("id_b"),
        col("span_idx").as("ix_b"), col("__sh").as("sh_b"))
      val truth = a.join(b,
          col("id_a") < col("id_b") ||
            (col("id_a") === col("id_b") && col("ix_a") < col("ix_b")))
        .where(Dedup.jaccard(col("sh_a"), col("sh_b")) >= 0.3)
        .select("id_a", "ix_a", "id_b", "ix_b")
      val raw = Dedup.spanNearDupPairs(docs, spanWords = 10, k = 64,
        bands = 32, threshold = 0.3, shingleWords = 2)
      val sw = col("doc_id_a") > col("doc_id_b") ||
        (col("doc_id_a") === col("doc_id_b") &&
          col("span_idx_a") > col("span_idx_b"))
      val found = raw.select(
        when(sw, col("doc_id_b")).otherwise(col("doc_id_a")).as("id_a"),
        when(sw, col("span_idx_b")).otherwise(col("span_idx_a")).as("ix_a"),
        when(sw, col("doc_id_a")).otherwise(col("doc_id_b")).as("id_b"),
        when(sw, col("span_idx_a")).otherwise(col("span_idx_b")).as("ix_b"))
      val recall = truth
        .join(found.withColumn("__hit", lit(1)),
          Seq("id_a", "ix_a", "id_b", "ix_b"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (sum(coalesce(col("__hit"), lit(0))).cast("double") /
            count(lit(1))).as("__recall"))
      val spurious = found
        .join(truth, Seq("id_a", "ix_a", "id_b", "ix_b"), "left_anti")
        .agg(count(lit(1)).as("__spur"))
      recall.crossJoin(spurious).select(col("n_exact"),
        coalesce(col("__recall") >= 0.8, lit(true)).as("recall_ge_08"),
        (col("__spur") === 0).as("no_spurious_pairs"))
    },

    // Embed-LSH quality gate: LSH candidates + exact dot verify vs the
    // exact blocked all-pairs baseline. n_exact is DuckDB-restated
    // (list_cosine_similarity), so the truth side is a real oracle
    // value; LSH output is verified with the SAME normalize + dot
    // kernel, so it must be a subset (no_spurious_pairs), and the
    // 4-bit/32-table regime (P[candidate | cos=0.35] ≈ 0.99 per
    // 1-(1-(1-acos(.35)/π)^4)^32; deterministic splitmix64 planes) must
    // recover ≥95% (measured 1.0 at sf0.01/sf0.1).
    "q_dedup_embed_lsh" -> { (s, d) =>
      val embs = Tables(s, d, "embeddings")
      val exact = Dedup.embeddingCosinePairs(embs, blockCols = Seq("label"),
        threshold = 0.35).select("id_a", "id_b")
      val lsh = Dedup.embeddingCosinePairsLsh(embs, blockCols = Seq("label"),
        threshold = 0.35, tables = 32, bits = 4).select("id_a", "id_b")
      val recall = exact
        .join(lsh.withColumn("__hit", lit(1)), Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (sum(coalesce(col("__hit"), lit(0))).cast("double") /
            count(lit(1))).as("__recall"))
      val spurious = lsh.join(exact, Seq("id_a", "id_b"), "left_anti")
        .agg(count(lit(1)).as("__spur"))
      recall.crossJoin(spurious).select(col("n_exact"),
        coalesce(col("__recall") >= 0.95, lit(true)).as("recall_ge_095"),
        (col("__spur") === 0).as("no_spurious_pairs"))
    },

    // Semantic-dedup gate. Three driver-visible claims:
    //   n_exact_global — the DuckDB-recomputable count of ALL global
    //     cosine≥t pairs (real oracle value, hash-compared);
    //   planted_recall_1 — 50 EXACT duplicate vectors (same embedding,
    //     shifted id) unioned into the corpus must ALL be recovered at
    //     t=0.9: an identical vector has an identical centroid argmax,
    //     so co-location is structural, not probabilistic — a broken
    //     assignment or pair stage flips this to false;
    //   no_spurious_pairs — precision 1: every emitted pair is in the
    //     exact global pair set (clustering may MISS cross-cluster
    //     pairs — the method's documented trade — but must never
    //     invent one).
    "q_dedup_semantic" -> { (s, d) =>
      val embs = Tables(s, d, "embeddings")
      val exact = Dedup.embeddingCosinePairs(
        embs.withColumn("__all", lit(1)), blockCols = Seq("__all"),
        threshold = 0.35).select("id_a", "id_b")
      val sem = Dedup.semanticPairs(embs, nClusters = 8, threshold = 0.35)
        .select("id_a", "id_b")
      val planted = embs.where(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      val sem9 = Dedup.semanticPairs(embs.unionByName(planted),
        nClusters = 8, threshold = 0.9).select("id_a", "id_b")
      val plantedOk = sem9.agg(
        (count(lit(1)) === 50 && sum(when(
          col("id_b") === col("id_a") + 1000000L, 1).otherwise(0)) === 50)
          .as("planted_recall_1"))
      val spurious = sem.join(exact, Seq("id_a", "id_b"), "left_anti")
        .agg((count(lit(1)) === 0).as("no_spurious_pairs"))
      exact.agg(count(lit(1)).as("n_exact_global"))
        .crossJoin(plantedOk).crossJoin(spurious)
    },

    // LSH ANN per-row optimality gate: for every (query, rank) the ANN
    // cosine can never EXCEED the exact rank-r cosine (the exact top-k
    // is optimal at every prefix), and with the tuned table count every
    // query must fill all k slots — so the oracle can state the full
    // (query_id, rank) grid with a true bound per row.
    "q_sim_ann_lsh" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopKScored(e, q, k = 5)
        .select(col("query_id"), col("rank"), col("cos").as("__bcos"))
      Similarity.annTopK(e, q, k = 5, tables = 32, bits = 4)
        .join(brute, Seq("query_id", "rank"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          (col("cos") <= col("__bcos")).as("cos_le_exact"))
        .orderBy("query_id", "rank")
    },

    // IVF serving path, same per-row optimality gate — verified against
    // the PERSISTED index (the deterministic build makes served == fresh).
    "q_sim_ann_ivf_search" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopKScored(e, q, k = 5)
        .select(col("query_id"), col("rank"), col("cos").as("__bcos"))
      val (assigned, centroids) = servedIvf(s, d)
      Ivf.search(assigned, centroids, q, k = 5, nprobe = 4)
        .join(brute, Seq("query_id", "rank"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          (col("cos") <= col("__bcos")).as("cos_le_exact"))
        .orderBy("query_id", "rank")
    },

    // IVF ANN, same per-row optimality gate as q_sim_ann_lsh.
    "q_sim_ann_ivf" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopKScored(e, q, k = 5)
        .select(col("query_id"), col("rank"), col("cos").as("__bcos"))
      val (assigned, centroids) = Ivf.build(e, nlist = 16, iters = 2)
      Ivf.search(assigned, centroids, q, k = 5, nprobe = 4)
        .join(brute, Seq("query_id", "rank"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          (col("cos") <= col("__bcos")).as("cos_le_exact"))
        .orderBy("query_id", "rank")
    },

    // Driver-visible ANN recall gates: recall vs brute force computed
    // IN the query (deterministic — splitmix64 planes, hash-seeded
    // k-means init), emitted as a scalar invariant the DuckDB oracle
    // restates as the expected constant. A recall regression flips
    // recall_ge_08 to false → hash mismatch → red driver row.
    // Parameters are tuned to THIS data's regime: the testdata
    // embeddings are near-random (same-label cos tops out ≈0.47), the
    // hardest case for ANN — wide 4-bit buckets × 32 tables (LSH) and
    // 6-of-8 probed cells (IVF) measured ≥0.9 at sf0.001/sf0.01.
    // Clustered corpora (the production case) need far fewer probes —
    // ExtSpec's fixtures show 0.8+ with 8×8 tables / 5-of-20 cells.
    "q_sim_ann_lsh_recall" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(e, q, k = 5)
        .select("query_id", "nbr_id")
      val ann = Similarity.annTopK(e, q, k = 5, tables = 32, bits = 4)
        .select("query_id", "nbr_id").withColumn("__hit", lit(1))
      brute.join(ann, Seq("query_id", "nbr_id"), "left")
        .agg(count(lit(1)).as("n_brute"),
          (sum(coalesce(col("__hit"), lit(0))).cast("double") /
            count(lit(1))).as("__recall"))
        .select(col("n_brute"),
          coalesce(col("__recall") >= 0.8, lit(true)).as("recall_ge_08"))
    },

    "q_sim_ann_ivf_recall" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(e, q, k = 5)
        .select("query_id", "nbr_id")
      val (assigned, centroids) = Ivf.build(e, nlist = 8, iters = 2)
      val ivf = Ivf.search(assigned, centroids, q, k = 5, nprobe = 6)
        .select("query_id", "nbr_id").withColumn("__hit", lit(1))
      brute.join(ivf, Seq("query_id", "nbr_id"), "left")
        .agg(count(lit(1)).as("n_brute"),
          (sum(coalesce(col("__hit"), lit(0))).cast("double") /
            count(lit(1))).as("__recall"))
        .select(col("n_brute"),
          coalesce(col("__recall") >= 0.8, lit(true)).as("recall_ge_08"))
    },

    // PQ ANN, same per-row optimality gate: the re-ranked cosine at
    // rank r can never exceed the exact rank-r cosine.
    "q_sim_ann_pq" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopKScored(e, q, k = 5)
        .select(col("query_id"), col("rank"), col("cos").as("__bcos"))
      val model = Pq.train(e, m = 16, k = 64, iters = 8)
      Pq.search(Pq.encode(e, model), model, e, q, k = 5, rerank = 100)
        .join(brute, Seq("query_id", "rank"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          (col("cos") <= col("__bcos")).as("cos_le_exact"))
        .orderBy("query_id", "rank")
    },

    // PQ serving path, same optimality gate against the PERSISTED
    // index (deterministic build makes served == fresh).
    "q_sim_ann_pq_search" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopKScored(e, q, k = 5)
        .select(col("query_id"), col("rank"), col("cos").as("__bcos"))
      val (codes, model) = servedPq(s, d)
      Pq.search(codes, model, e, q, k = 5, rerank = 100)
        .join(brute, Seq("query_id", "rank"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          (col("cos") <= col("__bcos")).as("cos_le_exact"))
        .orderBy("query_id", "rank")
    },

    // IVF-PQ, same per-row optimality gate: the exact re-rank's cosine
    // at rank r can never exceed the brute-force rank-r cosine.
    "q_sim_ann_ivfpq" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopKScored(e, q, k = 5)
        .select(col("query_id"), col("rank"), col("cos").as("__bcos"))
      val (codes, model) = IvfPq.build(e, nlist = 8, ivfIters = 2,
        m = 16, k = 64, pqIters = 8)
      IvfPq.search(codes, model, e, q, k = 5, nprobe = 6, rerank = 100)
        .join(brute, Seq("query_id", "rank"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          (col("cos") <= col("__bcos")).as("cos_le_exact"))
        .orderBy("query_id", "rank")
    },

    // IVF-PQ serving path, same optimality gate against the PERSISTED
    // index (deterministic build makes served == fresh).
    "q_sim_ann_ivfpq_search" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopKScored(e, q, k = 5)
        .select(col("query_id"), col("rank"), col("cos").as("__bcos"))
      val (codes, model) = servedIvfPq(s, d)
      IvfPq.search(codes, model, e, q, k = 5, nprobe = 6, rerank = 100)
        .join(brute, Seq("query_id", "rank"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          (col("cos") <= col("__bcos")).as("cos_le_exact"))
        .orderBy("query_id", "rank")
    },

    // IVF-PQ recall gate (nlist=8/nprobe=6 — the IVF gate's probe
    // width; the residual-PQ ADC stage only orders candidates and
    // rerank=100 re-ranks exactly, so recall tracks the cell probing).
    "q_sim_ann_ivfpq_recall" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(e, q, k = 5)
        .select("query_id", "nbr_id")
      val (codes, model) = IvfPq.build(e, nlist = 8, ivfIters = 2,
        m = 16, k = 64, pqIters = 8)
      val got = IvfPq.search(codes, model, e, q, k = 5, nprobe = 6,
          rerank = 100)
        .select("query_id", "nbr_id").withColumn("__hit", lit(1))
      brute.join(got, Seq("query_id", "nbr_id"), "left")
        .agg(count(lit(1)).as("n_brute"),
          (sum(coalesce(col("__hit"), lit(0))).cast("double") /
            count(lit(1))).as("__recall"))
        .select(col("n_brute"),
          coalesce(col("__recall") >= 0.8, lit(true)).as("recall_ge_08"))
    },

    // PQ recall gate (measured 1.0 at sf0.01 AND sf0.1 with
    // m=16/k=64/rerank=100 on these near-random embeddings — the
    // ADC-hostile regime; gate at the shared 0.8 bar).
    "q_sim_ann_pq_recall" -> { (s, d) =>
      val e = Tables(s, d, "embeddings")
      val q = e.where(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(e, q, k = 5)
        .select("query_id", "nbr_id")
      val model = Pq.train(e, m = 16, k = 64, iters = 8)
      val pq = Pq.search(Pq.encode(e, model), model, e, q,
          k = 5, rerank = 100)
        .select("query_id", "nbr_id").withColumn("__hit", lit(1))
      brute.join(pq, Seq("query_id", "nbr_id"), "left")
        .agg(count(lit(1)).as("n_brute"),
          (sum(coalesce(col("__hit"), lit(0))).cast("double") /
            count(lit(1))).as("__recall"))
        .select(col("n_brute"),
          coalesce(col("__recall") >= 0.8, lit(true)).as("recall_ge_08"))
    }
  )

  private val stopEn =
    "'the','a','an','of','to','and','in','is','that','it','was','for','on','with','as'"

  /** The full curation DuckDB restatement — quality score + language ID
    * + keep filter + exact dedup + n-gram-Jaccard pairs + recursive-CTE
    * connected components + representative selection. With
    * `gopher = true` the keep filter additionally applies the
    * dup-3gram-fraction cut (`dup3 <= 0.03`), mirroring
    * [[Curate.corpus]]'s `maxDupGram` path; dup3 arithmetic is the same
    * exact integer-count division the green `q_text_repetition` oracle
    * pins, so the predicate is bit-stable across engines. */
  private def curateOracle(gopher: Boolean): String =
    curateOracle(gopher,
      """SELECT u.doc_id, u.lang_detected, u.quality
        |FROM uniq u LEFT JOIN labels l ON u.doc_id = l.doc_id
        |WHERE l.cluster_id IS NULL OR l.cluster_id = u.doc_id
        |ORDER BY u.doc_id""".stripMargin)

  private def curateOracle(gopher: Boolean, tail: String): String = {
    val repCte = if (!gopher) "" else
      """rep AS (
        |  SELECT doc_id,
        |    CASE WHEN len(rtoks) <= 3 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(rgrams)) AS DOUBLE)
        |                    / len(rgrams) END AS dup3
        |  FROM (
        |    SELECT doc_id, rtoks,
        |      list_transform(range(1, greatest(len(rtoks) - 2, 1) + 1),
        |        i -> rtoks[i] || ' ' || rtoks[i+1] || ' ' || rtoks[i+2])
        |        AS rgrams
        |    FROM (SELECT doc_id,
        |            string_split_regex(trim(text), '\s+') AS rtoks
        |          FROM documents))),
        |""".stripMargin
    val repJoin = if (gopher) " JOIN rep USING (doc_id)" else ""
    val repPred = if (gopher) " AND rep.dup3 <= 0.03" else ""
    s"""WITH RECURSIVE t AS (
      |  SELECT doc_id, text,
      |    string_split_regex(trim(text), '\\s+') AS toks,
      |    len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS DOUBLE) AS ntok,
      |    CAST(len(list_filter(toks, x -> x IN ($stopEn))) AS DOUBLE) AS nsw,
      |    CAST(np AS DOUBLE) AS npunct,
      |    CAST(len(text) AS DOUBLE) AS nchar,
      |    CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
      |      / len(toks) AS mtl
      |  FROM t),
      |q AS (
      |  SELECT doc_id,
      |    (least(ntok / 64.0, 1.0)
      |     + least(nsw / ntok * 4.0, 1.0)
      |     + greatest(0.0, 1.0 - npunct / greatest(nchar, 1.0) * 4.0)
      |     + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)) / 4.0
      |    AS quality
      |  FROM s),
      |lid1 AS (
      |  SELECT doc_id, text,
      |    string_split_regex(trim(lower(text)), '\\s+') AS ltoks
      |  FROM documents),
      |lid2 AS (
      |  SELECT doc_id, text,
      |    len(list_filter(ltoks, x -> x IN ('the','and','of','to','in','is','that','it','was','for'))) AS s_en,
      |    len(list_filter(ltoks, x -> x IN ('der','die','und','das','ist','nicht','ein','mit','auf','zu'))) AS s_de,
      |    len(list_filter(ltoks, x -> x IN ('le','la','et','les','des','une','est','dans','que','pour'))) AS s_fr,
      |    len(list_filter(ltoks, x -> x IN ('el','los','de','y','en','un','que','por','con','para'))) AS s_es
      |  FROM lid1),
      |lid AS (
      |  SELECT doc_id,
      |    CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
      |         WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
      |         WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
      |         WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
      |         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
      |         ELSE 'es' END AS lang_detected
      |  FROM lid2),
      |${repCte}kept AS (
      |  SELECT d.doc_id, d.text, lid.lang_detected, q.quality
      |  FROM documents d JOIN q USING (doc_id) JOIN lid USING (doc_id)$repJoin
      |  WHERE q.quality >= 0.7 AND lid.lang_detected IN ('en')$repPred),
      |uniq AS (
      |  SELECT doc_id, text, lang_detected, quality FROM (
      |    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) rn
      |    FROM kept) WHERE rn = 1),
      |sh AS (
      |  SELECT doc_id, lang_detected,
      |    CASE WHEN len(string_split_regex(trim(text), '\\s+')) <= 3
      |      THEN [array_to_string(string_split_regex(trim(text), '\\s+'), ' ')]
      |      ELSE list_transform(
      |        range(0, len(string_split_regex(trim(text), '\\s+')) - 2),
      |        i -> array_to_string(
      |          string_split_regex(trim(text), '\\s+')[i+1:i+3], ' '))
      |    END AS grams
      |  FROM uniq),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b
      |    ON a.lang_detected = b.lang_detected AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / len(list_distinct(a.grams || b.grams)) >= 0.3),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |labels AS (
      |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      |  FROM reach GROUP BY src)
      |$tail""".stripMargin
  }

  /** The full BM25 restatement as a CTE chain (through `ranked`) —
    * shared by the two `q_search_bm25*` oracles and the hybrid-RRF
    * oracle, which extends it with the cosine leg and the fusion. */
  private val Bm25Ctes: String =
    """WITH q(query_id, qtext) AS (VALUES
      |    (0, 'spark window merge'),
      |    (1, 'customer filter join order'),
      |    (2, 'vector scan batch'),
      |    (3, 'the data'),
      |    (4, 'hash join probe nosuchword')),
      |dt AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
      |  FROM dt WHERE len(toks) > 0),
      |tf AS (
      |  SELECT doc_id, dl, term, count(*) AS tf
      |  FROM toks GROUP BY 1, 2, 3),
      |stats AS (
      |  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl
      |  FROM dt WHERE len(toks) > 0),
      |qt0 AS (
      |  SELECT query_id,
      |    unnest(list_filter(string_split_regex(lower(qtext), '[^a-z0-9]+'),
      |      t -> t <> '')) AS term
      |  FROM q),
      |qt AS (SELECT DISTINCT query_id, term FROM qt0),
      |dfq AS (
      |  SELECT term, count(*) AS df FROM tf
      |  WHERE term IN (SELECT term FROM qt) GROUP BY 1),
      |scored AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    sum(ln(1.0 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
      |        * (tf.tf * (1.2 + 1.0))
      |        / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl))) AS score
      |  FROM tf
      |  JOIN dfq USING (term)
      |  JOIN qt USING (term), stats s
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT query_id, doc_id, score,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, doc_id DESC) AS rn
      |  FROM scored)""".stripMargin

  /** Shared by `q_search_bm25` and `q_search_bm25_indexed`: the
    * persisted-index serving path must be RESULT-INVISIBLE, so both
    * keys compare against the identical full-scoring restatement. */
  private val Bm25OracleSql: String = Bm25Ctes +
    """
      |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rn AS BIGINT) AS rank,
      |  doc_id, round(score, 4) AS score
      |FROM ranked WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin

  /** `q_search_eval`: BM25 CTEs + the cosine ranking (CTEs verbatim
    * from the hybrid-RRF oracle) + the boolean-AND truth set + every
    * metric recomputed — both rankings, the judgments and the
    * arithmetic are all restated, so a drift in any of them goes red.
    * The `toks` CTE already carries one row per (doc, token)
    * occurrence; the DISTINCT projection reduces it to the doc-term
    * incidence the conjunctive truth needs. */
  private val SearchEvalOracleSql: String = Bm25Ctes +
    """,
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |vq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      |vscored AS (
      |  SELECT vq.query_id, e.vec_id AS doc_id,
      |    list_cosine_similarity(vq.qv, e.v) AS cos
      |  FROM vq JOIN e ON vq.query_id <> e.vec_id),
      |vec_r AS (
      |  SELECT query_id, doc_id, rank FROM (
      |    SELECT query_id, doc_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY cos DESC, doc_id) AS rank
      |    FROM vscored) WHERE rank <= 10),
      |ret AS (
      |  SELECT 'bm25' AS syst, query_id, doc_id, CAST(rn AS BIGINT) AS rank
      |  FROM ranked WHERE rn <= 10
      |  UNION ALL
      |  SELECT 'cos', query_id, doc_id, CAST(rank AS BIGINT) FROM vec_r),
      |dterm AS (SELECT DISTINCT doc_id, term FROM toks),
      |qn AS (SELECT query_id, count(*) AS nq FROM qt GROUP BY 1),
      |rel AS (
      |  SELECT h.query_id, h.doc_id FROM (
      |    SELECT qt.query_id, dterm.doc_id, count(*) AS nh
      |    FROM dterm JOIN qt USING (term) GROUP BY 1, 2) h
      |  JOIN qn USING (query_id) WHERE h.nh = qn.nq),
      |nrel AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY 1),
      |nret AS (
      |  SELECT syst, query_id, count(*) AS n_ret FROM ret GROUP BY 1, 2),
      |hit AS (
      |  SELECT r.syst, r.query_id, count(*) AS hits,
      |    min(r.rank) AS rank_first,
      |    sum(1.0 / log2(r.rank + 1)) AS dcg
      |  FROM ret r JOIN rel USING (query_id, doc_id) GROUP BY 1, 2),
      |sys(syst) AS (VALUES ('bm25'), ('cos'))
      |SELECT CAST(q.query_id AS BIGINT) AS query_id,
      |  COALESCE(nrel.n_rel, 0) AS n_rel,
      |  COALESCE(nret.n_ret, 0) AS n_ret,
      |  COALESCE(hit.hits, 0) AS hits,
      |  hit.rank_first AS rank_first,
      |  round(COALESCE(hit.hits, 0) / 10.0, 6) AS precision_k,
      |  CASE WHEN COALESCE(nrel.n_rel, 0) > 0 THEN
      |    round(CAST(COALESCE(hit.hits, 0) AS DOUBLE) / nrel.n_rel, 6)
      |  END AS recall_k,
      |  round(COALESCE(1.0 / hit.rank_first, 0), 6) AS rr,
      |  CASE WHEN COALESCE(nrel.n_rel, 0) > 0 THEN
      |    round(COALESCE(hit.dcg, 0) / list_sum(list_transform(
      |      generate_series(1, CAST(least(10, nrel.n_rel) AS BIGINT)),
      |      i -> 1.0 / log2(i + 1))), 6)
      |  END AS ndcg_k,
      |  sys.syst AS system
      |FROM q CROSS JOIN sys
      |LEFT JOIN nrel ON q.query_id = nrel.query_id
      |LEFT JOIN nret ON q.query_id = nret.query_id AND sys.syst = nret.syst
      |LEFT JOIN hit ON q.query_id = hit.query_id AND sys.syst = hit.syst
      |ORDER BY system, query_id""".stripMargin

  /** `q_search_eval_graded`: the graded sibling — qrels carry
    * gain = matched-distinct-term count (no full-match filter), hit
    * DCG uses (2^gain − 1) numerators, and the ideal ranking is a
    * row_number over gain-descending judgments (within a gain level
    * the order is irrelevant to the positional sum, so DuckDB's
    * window form and the engine's histogram fold are the same
    * number). */
  private val SearchEvalGradedOracleSql: String = Bm25Ctes +
    """,
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |vq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      |vscored AS (
      |  SELECT vq.query_id, e.vec_id AS doc_id,
      |    list_cosine_similarity(vq.qv, e.v) AS cos
      |  FROM vq JOIN e ON vq.query_id <> e.vec_id),
      |vec_r AS (
      |  SELECT query_id, doc_id, rank FROM (
      |    SELECT query_id, doc_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY cos DESC, doc_id) AS rank
      |    FROM vscored) WHERE rank <= 10),
      |ret AS (
      |  SELECT 'bm25' AS syst, query_id, doc_id, CAST(rn AS BIGINT) AS rank
      |  FROM ranked WHERE rn <= 10
      |  UNION ALL
      |  SELECT 'cos', query_id, doc_id, CAST(rank AS BIGINT) FROM vec_r),
      |dterm AS (SELECT DISTINCT doc_id, term FROM toks),
      |grel AS (
      |  SELECT qt.query_id, dterm.doc_id, count(*) AS gain
      |  FROM dterm JOIN qt USING (term) GROUP BY 1, 2),
      |nrel AS (SELECT query_id, count(*) AS n_rel FROM grel GROUP BY 1),
      |hit AS (
      |  SELECT r.syst, r.query_id, count(*) AS hits,
      |    min(r.rank) AS rank_first,
      |    sum((pow(2, g.gain) - 1) / log2(r.rank + 1)) AS dcg
      |  FROM ret r JOIN grel g USING (query_id, doc_id) GROUP BY 1, 2),
      |ideal AS (
      |  SELECT query_id, sum((pow(2, gain) - 1) / log2(pos + 1)) AS idcg
      |  FROM (
      |    SELECT query_id, gain, row_number() OVER (PARTITION BY query_id
      |      ORDER BY gain DESC, doc_id) AS pos
      |    FROM grel)
      |  WHERE pos <= 10 GROUP BY 1),
      |sys(syst) AS (VALUES ('bm25'), ('cos'))
      |SELECT CAST(q.query_id AS BIGINT) AS query_id,
      |  COALESCE(nrel.n_rel, 0) AS n_rel,
      |  COALESCE(hit.hits, 0) AS hits,
      |  hit.rank_first AS rank_first,
      |  round(COALESCE(hit.dcg, 0), 6) AS dcg_k,
      |  CASE WHEN COALESCE(nrel.n_rel, 0) > 0
      |    THEN round(ideal.idcg, 6) END AS idcg_k,
      |  CASE WHEN COALESCE(nrel.n_rel, 0) > 0
      |    THEN round(COALESCE(hit.dcg, 0) / ideal.idcg, 6) END AS ndcg_k,
      |  sys.syst AS system
      |FROM q CROSS JOIN sys
      |LEFT JOIN nrel ON q.query_id = nrel.query_id
      |LEFT JOIN ideal ON q.query_id = ideal.query_id
      |LEFT JOIN hit ON q.query_id = hit.query_id AND sys.syst = hit.syst
      |ORDER BY system, query_id""".stripMargin

  /** `q_search_hybrid_rrf`: BM25 CTEs + the cosine leg + RRF fusion.
    * RRF sums at most TWO doubles per (query, doc) and IEEE addition
    * is commutative, so the fused scores are bit-identical across
    * engines regardless of aggregation order (a ≥3-system fusion
    * would need a fixed summation order to keep hash-compare safe). */
  private val HybridRrfOracleSql: String = Bm25Ctes +
    """,
      |text_r AS (
      |  SELECT query_id, doc_id, rn AS rank FROM ranked WHERE rn <= 10),
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |vq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      |vscored AS (
      |  SELECT vq.query_id, e.vec_id AS doc_id,
      |    list_cosine_similarity(vq.qv, e.v) AS cos
      |  FROM vq JOIN e ON vq.query_id <> e.vec_id),
      |vec_r AS (
      |  SELECT query_id, doc_id, rank FROM (
      |    SELECT query_id, doc_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY cos DESC, doc_id) AS rank
      |    FROM vscored) WHERE rank <= 10),
      |unioned AS (
      |  SELECT * FROM text_r UNION ALL SELECT * FROM vec_r),
      |fused AS (
      |  SELECT query_id, doc_id, sum(1.0 / (60.0 + rank)) AS rrf
      |  FROM unioned GROUP BY 1, 2),
      |franked AS (
      |  SELECT query_id, doc_id, rrf,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY rrf DESC, doc_id DESC) AS rank
      |  FROM fused)
      |SELECT CAST(query_id AS BIGINT) AS query_id,
      |  CAST(rank AS BIGINT) AS rank, CAST(doc_id AS BIGINT) AS doc_id,
      |  round(rrf, 6) AS rrf
      |FROM franked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** `q_quality_lm_score`: the bigram-LM train+score restated in SQL —
    * tokens mirror [[TextSearch.tokens]], bigrams come from index
    * ranges over the token list, the model is exact integer counts and
    * the score is a sum of logs of exact rationals, so the only
    * cross-engine surface is double ln/÷ (round-4 compared, same as
    * the BM25 scores). Docs with <2 tokens have no bigrams and are
    * absent on both sides. */
  private val LmScoreOracleSql: String =
    """WITH dt AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(0, len(toks) - 1),
      |        i -> struct_pack(w1 := toks[i + 1], w2 := toks[i + 2]))) AS s
      |    FROM dt WHERE len(toks) >= 2)),
      |b2 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, sum(c12) AS c1 FROM b2 GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v
      |  FROM (SELECT unnest(toks) AS w FROM dt)),
      |db AS (
      |  SELECT doc_id, w1, w2, count(*) AS n FROM bg GROUP BY 1, 2, 3),
      |sc AS (
      |  SELECT d.doc_id, sum(d.n) AS n_bigrams,
      |    -sum(d.n * ln((b2.c12 + 0.5) / (c1.c1 + 0.5 * v.v))) / sum(d.n)
      |      AS nll
      |  FROM db d JOIN b2 USING (w1, w2) JOIN c1 USING (w1), v
      |  GROUP BY 1)
      |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |  round(nll, 4) AS nll
      |FROM sc ORDER BY doc_id""".stripMargin

  /** `q_text_classify_nb`: the multinomial-NB train+score restated in
    * SQL. Tokens mirror [[TextSearch.tokens]]; the model is exact
    * integer counts (per-(label, token), per-label totals, doc priors,
    * vocabulary size); the posterior is `ln(prior) + Σ n·ln((c+α)/
    * (n_c+α·V))` over the COMPLETE doc-token × label grid (the LEFT
    * join coalesces unseen pairs to the smoothing floor, exactly as
    * the Spark side does). Ranking happens on unrounded posteriors in
    * both engines; only the emitted score is round-4. Zero-token docs
    * are absent on both sides. */
  private val ClassifyNbOracleSql: String =
    """WITH dt AS (
      |  SELECT doc_id, lang AS label,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |      t -> t <> '') AS toks
      |  FROM documents),
      |d2 AS (SELECT * FROM dt WHERE len(toks) > 0),
      |doctok AS (
      |  SELECT doc_id, label, t AS token, count(*) AS n FROM (
      |    SELECT doc_id, label, unnest(toks) AS t FROM d2)
      |  GROUP BY 1, 2, 3),
      |w AS (SELECT label, token, sum(n) AS c FROM doctok GROUP BY 1, 2),
      |ctot AS (SELECT label, sum(c) AS n_tok FROM w GROUP BY 1),
      |pri AS (SELECT label, count(*) AS n_docs FROM d2 GROUP BY 1),
      |tot AS (SELECT count(*) AS n_total FROM d2),
      |v AS (SELECT count(DISTINCT token) AS v FROM doctok),
      |ll AS (
      |  SELECT g.doc_id, g.label,
      |    sum(g.n * ln((COALESCE(w.c, 0) + 0.5) / (g.n_tok + 0.5 * v.v)))
      |      AS s
      |  FROM (SELECT d.doc_id, d.token, d.n, ct.label, ct.n_tok
      |        FROM (SELECT doc_id, token, n FROM doctok) d
      |        CROSS JOIN ctot ct) g
      |  LEFT JOIN w ON g.token = w.token AND g.label = w.label, v
      |  GROUP BY 1, 2),
      |post AS (
      |  SELECT ll.doc_id, ll.label,
      |    ln(CAST(p.n_docs AS DOUBLE) / t.n_total) + ll.s AS logpost
      |  FROM ll JOIN pri p ON ll.label = p.label, tot t),
      |r AS (
      |  SELECT doc_id, label, logpost,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY logpost DESC, label) AS rank
      |  FROM post)
      |SELECT doc_id, CAST(rank AS BIGINT) AS rank, label,
      |  round(logpost, 4) AS logpost
      |FROM r ORDER BY doc_id, rank""".stripMargin

  /** Full restatement of `q_curate_url_rank`: planted domain graph,
    * `iters` unrolled pagerank CTEs (the [[FeatureQueries]] pattern,
    * over domain-string nodes), the integer cap quantization and the
    * md5 draw ranking — one query, zero tolerance. */
  private def urlRankOracle(iters: Int): String = {
    val base =
      """WITH pages AS (
        |  SELECT doc_id,
        |    lower(CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE 'cdn.' END
        |      || source || '-site.org') AS host,
        |    source || '-site.org' AS domain,
        |    'src' || CAST(doc_id % 7 AS VARCHAR) || '-site.org' AS odomain
        |  FROM documents),
        |edges AS (SELECT DISTINCT domain AS src, odomain AS dst FROM pages),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
        |  FROM edges GROUP BY src),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS pr FROM nodes)""".stripMargin
    val iterCtes = Graph.oracleIterCtes(iters)
    val tail =
      s"""caps AS (
         |  SELECT node AS domain,
         |    greatest(1, least(40,
         |      (CAST(round(round(pr, 7) * 1e7, 0) AS BIGINT) * 10 *
         |        (SELECT CAST(count(*) AS BIGINT) FROM nodes)) // 10000000))
         |      AS cap
         |  FROM r$iters),
         |ranked AS (
         |  SELECT doc_id, host, domain,
         |    row_number() OVER (PARTITION BY domain ORDER BY
         |      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':url'),
         |        1, 8) AS BIGINT) DESC, doc_id DESC) AS rn
         |  FROM pages)
         |SELECT r.doc_id, r.host, r.domain, CAST(c.cap AS BIGINT) AS cap
         |FROM ranked r JOIN caps c USING (domain)
         |WHERE rn <= c.cap ORDER BY r.doc_id""".stripMargin
    (base +: iterCtes :+ tail).mkString(",\n")
  }

  val oracle: Map[String, String] = Map(
    "q_curate_url_rank" -> urlRankOracle(5),
    "q_search_bm25" -> Bm25OracleSql,
    "q_search_bm25_indexed" -> Bm25OracleSql,
    "q_search_eval" -> SearchEvalOracleSql,
    "q_search_eval_graded" -> SearchEvalGradedOracleSql,
    "q_search_hybrid_rrf" -> HybridRrfOracleSql,
    "q_quality_lm_score" -> LmScoreOracleSql,
    "q_text_classify_nb" -> ClassifyNbOracleSql,
    // The quantile-sketch threshold is engine-specific; the restated
    // truth is the exact corpus count plus the gate's structural
    // booleans (see the gate comment for what each pins).
    "q_quality_top_frac" ->
      """SELECT count(*) AS n_total, true AS frac_kept_ok,
        |  true AS cut_clean FROM documents""".stripMargin,
    "q_sketch_overlap" ->
      """WITH t AS (
        |  SELECT source, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE trim(text) <> ''),
        |g AS (
        |  SELECT source, array_to_string(w[i+1:i+3], ' ') AS gram
        |  FROM t, unnest(range(0, greatest(len(w) - 2, 0))) AS u(i)),
        |d AS (
        |  SELECT DISTINCT source,
        |    CAST('0x' || substr(md5(gram), 1, 13) AS BIGINT) AS h
        |  FROM g),
        |sk AS (
        |  SELECT source, h FROM (
        |    SELECT source, h,
        |      row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |    FROM d) WHERE rn <= 256),
        |pairs(src_a, src_b) AS (VALUES
        |  ('src0', 'src1'), ('src0', 'src2'), ('src1', 'src2')),
        |skf AS (
        |  SELECT p.src_a, p.src_b, x.h,
        |    max(CASE WHEN x.source = p.src_a THEN 1 ELSE 0 END) AS ia,
        |    max(CASE WHEN x.source = p.src_b THEN 1 ELSE 0 END) AS ib
        |  FROM pairs p JOIN sk x ON x.source IN (p.src_a, p.src_b)
        |  GROUP BY 1, 2, 3),
        |topu AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY src_a, src_b
        |      ORDER BY h) AS rn FROM skf) WHERE rn <= 256),
        |est AS (
        |  SELECT src_a, src_b,
        |    CAST(sum(ia * ib) AS DOUBLE) / count(*) AS jk
        |  FROM topu GROUP BY 1, 2),
        |df AS (
        |  SELECT p.src_a, p.src_b, x.h,
        |    max(CASE WHEN x.source = p.src_a THEN 1 ELSE 0 END) AS ia,
        |    max(CASE WHEN x.source = p.src_b THEN 1 ELSE 0 END) AS ib
        |  FROM pairs p JOIN d x ON x.source IN (p.src_a, p.src_b)
        |  GROUP BY 1, 2, 3),
        |ex AS (
        |  SELECT src_a, src_b,
        |    CAST(sum(ia * ib) AS DOUBLE) / count(*) AS je
        |  FROM df GROUP BY 1, 2)
        |SELECT est.src_a, est.src_b, round(est.jk, 6) AS jaccard_kmv,
        |  round(ex.je, 6) AS jaccard_exact
        |FROM est JOIN ex USING (src_a, src_b)
        |ORDER BY src_a, src_b""".stripMargin,
    "q_tokenize_bpe" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_pretok,
        |  true AS roundtrip_ok, true AS bounded_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_clean" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    trim(nfc_normalize(regexp_replace(text,
        |      '[\x00-\x08\x0B-\x1F\x7F-\x9F]', '', 'g')),
        |      ' ' || chr(10) || chr(9)) AS clean
        |  FROM documents)
        |SELECT doc_id, clean, clean <> text AS changed
        |FROM c ORDER BY doc_id""".stripMargin,
    // Replays htmlExtract's exact chain: comment/script/style strip,
    // tag→space, entity decode (&amp; last), whitespace collapse.
    "q_text_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id ||
        |    '</title><style type="text/css">p { color: red; }</style>' ||
        |    '<script>if (1 < 2) { var x = "&amp;"; }</script></head>' ||
        |    '<body><!-- nav' || chr(10) ||
        |    'boilerplate --><h1>Heading &amp; more</h1><p>' || text ||
        |    '</p><p>&quot;quoted&quot; &lt;b&gt;&nbsp;tail</p></body></html>'
        |      AS html
        |  FROM documents),
        |x AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g'),
        |              '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS extracted
        |  FROM h)
        |SELECT doc_id, extracted, len(extracted) AS n_chars
        |FROM x ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id, len(text) AS n_chars,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpeish,
        |  len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
        |  CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
        |    x -> len(x))) AS DOUBLE)
        |    / len(string_split_regex(trim(text), '\s+')) AS mean_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""WITH t AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\\s+') AS toks,
        |    len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(toks, x -> x IN ($stopEn))) AS DOUBLE) AS nsw,
        |    CAST(np AS DOUBLE) AS npunct,
        |    CAST(len(text) AS DOUBLE) AS nchar,
        |    CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
        |      / len(toks) AS mtl
        |  FROM t)
        |SELECT doc_id,
        |  (least(ntok / 64.0, 1.0)
        |   + least(nsw / ntok * 4.0, 1.0)
        |   + greatest(0.0, 1.0 - npunct / greatest(nchar, 1.0) * 4.0)
        |   + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)) / 4.0
        |  AS quality
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang AS lang_labeled, text,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang_labeled, text,
        |    len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','that','it','was','for'))) AS s_en,
        |    len(list_filter(toks, x -> x IN ('der','die','und','das','ist','nicht','ein','mit','auf','zu'))) AS s_de,
        |    len(list_filter(toks, x -> x IN ('le','la','et','les','des','une','est','dans','que','pour'))) AS s_fr,
        |    len(list_filter(toks, x -> x IN ('el','los','de','y','en','un','que','por','con','para'))) AS s_es
        |  FROM t)
        |SELECT doc_id, lang_labeled,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |       WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
        |       WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
        |       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |       ELSE 'es' END AS lang_detected
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_curate_corpus" -> curateOracle(gopher = false),
    "q_curate_corpus_gopher" -> curateOracle(gopher = true),
    // Quality + token count + bucket + threshold-explode restated
    // exactly; same quality CTEs as q_text_quality (which hash-matches
    // the raw double), integer thresholds/counts in the output.
    "q_curate_threshold_sweep" ->
      s"""WITH t AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\\s+') AS toks,
        |    len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(toks, x -> x IN ($stopEn))) AS DOUBLE) AS nsw,
        |    CAST(np AS DOUBLE) AS npunct,
        |    CAST(len(text) AS DOUBLE) AS nchar,
        |    CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
        |      / len(toks) AS mtl
        |  FROM t),
        |q AS (
        |  SELECT doc_id,
        |    (least(ntok / 64.0, 1.0)
        |     + least(nsw / ntok * 4.0, 1.0)
        |     + greatest(0.0, 1.0 - npunct / greatest(nchar, 1.0) * 4.0)
        |     + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)) / 4.0
        |    AS quality
        |  FROM s),
        |nt AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT)
        |      ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
        |      END AS ntok
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (
        |  SELECT least(CAST(floor(q.quality * 20) AS INTEGER), 20) AS bk,
        |    nt.ntok
        |  FROM q JOIN nt USING (doc_id)),
        |e AS (
        |  SELECT CAST(unnest(range(0, bk + 1)) AS INTEGER) AS thr_num, ntok
        |  FROM b)
        |SELECT thr_num, count(*) AS n_kept,
        |  CAST(sum(ntok) AS BIGINT) AS tokens_kept
        |FROM e GROUP BY thr_num ORDER BY thr_num""".stripMargin,
    "q_text_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '')
        |      AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    CASE WHEN len(toks) <= 64 THEN 1
        |         ELSE 1 + CAST(ceil((len(toks) - 64) / 48.0) AS INT) END
        |      AS nc
        |  FROM t WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, toks, n, unnest(range(nc)) AS chunk_idx FROM s)
        |SELECT doc_id, chunk_idx,
        |  least(64, n - chunk_idx * 48) AS n_tokens,
        |  array_to_string(list_slice(toks, chunk_idx * 48 + 1,
        |    least(chunk_idx * 48 + 64, n)), ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_text_boilerplate" ->
      """WITH d2 AS (
        |  SELECT doc_id,
        |    'NOTICE ' || source || chr(10) || text || chr(10) ||
        |      'COPYRIGHT ' || source AS text
        |  FROM documents),
        |l AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line,
        |    generate_subscripts(string_split(text, chr(10)), 1) AS pos
        |  FROM d2),
        |b AS (
        |  SELECT line FROM (
        |    SELECT line, count(DISTINCT doc_id) AS df
        |    FROM l WHERE trim(line) <> '' GROUP BY line)
        |  WHERE df >= 30),
        |f AS (
        |  SELECT l.doc_id, l.pos, l.line,
        |    (b.line IS NOT NULL AND trim(l.line) <> '') AS is_boiler
        |  FROM l LEFT JOIN b ON l.line = b.line)
        |SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  COALESCE(string_agg(CASE WHEN NOT is_boiler THEN line END,
        |    chr(10) ORDER BY pos), '') AS text
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_code_detect" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[{}()\[\];=<>]'))
        |      AS DOUBLE) /
        |      greatest(CAST(len(text) AS DOUBLE), 1.0) AS sym_frac,
        |    CAST(len(regexp_extract_all(text, '(?m)^(?: {2,}|\t)'))
        |      AS DOUBLE) /
        |      CAST(len(string_split(text, chr(10))) AS DOUBLE)
        |      AS indent_frac,
        |    CAST(len(regexp_extract_all(text, '(?m)[;{}][ \t]*$'))
        |      AS DOUBLE) /
        |      CAST(len(string_split(text, chr(10))) AS DOUBLE) AS eol_frac
        |  FROM documents)
        |SELECT doc_id, sym_frac, indent_frac, eol_frac,
        |  sym_frac + 0.5 * indent_frac + 0.5 * eol_frac AS code_score,
        |  sym_frac + 0.5 * indent_frac + 0.5 * eol_frac > 0.05 AS is_code
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_curate_url_filter" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    'https://' || CASE WHEN doc_id % 2 = 0 THEN 'www.'
        |      ELSE 'cdn.' END || source || '-site.org/page/' || doc_id
        |      AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^[a-z]+://([^/:]+)', 1)) AS host
        |  FROM m),
        |hd AS (
        |  SELECT doc_id, host,
        |    CASE WHEN len(string_split(host, '.')) >= 2
        |      THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
        |      ELSE host END AS domain
        |  FROM h),
        |allowed AS (
        |  SELECT * FROM hd
        |  WHERE host NOT IN ('src13-site.org', 'cdn.src7-site.org')
        |    AND domain NOT IN ('src13-site.org', 'cdn.src7-site.org')),
        |ranked AS (
        |  SELECT doc_id, host, domain,
        |    row_number() OVER (PARTITION BY domain ORDER BY
        |      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':url'),
        |        1, 8) AS BIGINT) DESC, doc_id DESC) AS rn
        |  FROM allowed)
        |SELECT doc_id, host, domain FROM ranked
        |WHERE rn <= 15 ORDER BY doc_id""".stripMargin,
    // Restates canonicalize's whole chain (part extraction, default-
    // port strip, tracking-param filter + sort) and the group-min rep.
    "q_curate_url_canon" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      'HTTPS://WWW.S' || ((doc_id // 2) % 50) || '-Site.ORG:443/A/' ||
        |        (doc_id // 2) || '?utm_source=feed&b=2&a=1#frag'
        |    WHEN doc_id % 3 = 1 THEN
        |      'https://www.s' || ((doc_id // 2) % 50) || '-site.org/A/' ||
        |        (doc_id // 2) || '?b=2&a=1'
        |    ELSE
        |      'http://CDN.' || source || '-site.org:80/A/' || doc_id ||
        |        '/?gclid=xyz'
        |    END AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |      AS scheme,
        |    lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM m),
        |q AS (
        |  -- coalesce: DuckDB's array_to_string of an EMPTY list is
        |  -- NULL where Spark's array_join is '' — variant 2 drops all
        |  -- of its params, so without it the whole concat nulls out
        |  SELECT *, coalesce(array_to_string(list_sort(list_filter(
        |      string_split(query, '&'),
        |      x -> x <> '' AND NOT starts_with(x, 'utm_')
        |        AND NOT starts_with(x, 'fbclid')
        |        AND NOT starts_with(x, 'gclid'))), '&'), '') AS sq
        |  FROM p),
        |c AS (
        |  SELECT doc_id,
        |    scheme || '://' ||
        |    CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |         WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |         ELSE hostport END ||
        |    CASE WHEN path = '' THEN '/' ELSE path END ||
        |    CASE WHEN sq = '' THEN '' ELSE '?' || sq END AS canon_url
        |  FROM q)
        |SELECT doc_id, canon_url,
        |  min(doc_id) OVER (PARTITION BY canon_url) AS rep_id,
        |  doc_id <> min(doc_id) OVER (PARTITION BY canon_url) AS is_dup
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_curate_report" -> curateOracle(gopher = false,
      """SELECT * FROM (
        |  SELECT 0 AS stage_idx, 'raw' AS stage, count(*) AS n_docs
        |  FROM documents
        |  UNION ALL SELECT 1, 'lang_quality', count(*) FROM kept
        |  UNION ALL SELECT 2, 'exact_unique', count(*) FROM uniq
        |  UNION ALL SELECT 3, 'near_dup_reps', count(*) FROM (
        |    SELECT u.doc_id
        |    FROM uniq u LEFT JOIN labels l ON u.doc_id = l.doc_id
        |    WHERE l.cluster_id IS NULL OR l.cluster_id = u.doc_id))
        |ORDER BY stage_idx""".stripMargin),
    "q_text_repetition" ->
      """SELECT doc_id,
        |  CASE WHEN len(toks) <= 3 THEN 0.0
        |       ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |                  / len(grams) END AS dup3
        |FROM (
        |  SELECT doc_id, toks,
        |    list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS grams
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // Gate truth: every invariant is true by the kernel's contract.
    "q_text_compress" ->
      """SELECT doc_id, true AS bound_ok, true AS doubled_lt
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_entropy" ->
      """WITH t AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |per AS (
        |  SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
        |st AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_types, sum(c * ln(c)) AS sclc
        |  FROM per GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(st.n_tokens, 0) AS n_tokens,
        |  coalesce(st.n_types, 0) AS n_types,
        |  round(CAST(st.n_types AS DOUBLE) / st.n_tokens, 6) AS ttr,
        |  round(ln(st.n_tokens) - st.sclc / st.n_tokens, 6) AS entropy
        |FROM documents d LEFT JOIN st USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) <= 3
        |      THEN [array_to_string(t, ' ')]
        |      ELSE list_transform(range(1, len(t) - 2 + 1),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS gs
        |  FROM toks),
        |eval_g AS (
        |  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 101 = 0),
        |hits AS (
        |  SELECT e.doc_id, count(*) AS n_hits
        |  FROM (SELECT doc_id, unnest(gs) AS g FROM grams) e
        |  JOIN eval_g USING (g) GROUP BY e.doc_id)
        |SELECT g.doc_id, coalesce(h.n_hits, 0) AS n_hits,
        |  CASE WHEN len(g.gs) = 0 THEN 0.0
        |       ELSE CAST(coalesce(h.n_hits, 0) AS DOUBLE) / len(g.gs) END
        |    AS contamination,
        |  (CASE WHEN len(g.gs) = 0 THEN 0.0
        |        ELSE CAST(coalesce(h.n_hits, 0) AS DOUBLE) / len(g.gs) END)
        |    >= 0.5 AS contaminated
        |FROM grams g LEFT JOIN hits h ON g.doc_id = h.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    // Recomputes the ENTIRE bloom derivation at the position-SET level
    // (the packed bitmap is an encoding of this set — BloomSpec pins
    // packed == set; DuckDB's << refuses the sign-bit shift, so the
    // set form IS the restatement): eval positions = 4 md5 slices mod
    // 2^16 over distinct eval grams; a corpus gram is maybe-contained
    // iff ALL 4 of its positions are in that set.
    "q_decontaminate_bloom" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) <= 3
        |      THEN [array_to_string(t, ' ')]
        |      ELSE list_transform(range(1, len(t) - 2 + 1),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS gs
        |  FROM toks),
        |slots AS (SELECT unnest([0, 1, 2, 3]) AS i),
        |epos AS (
        |  SELECT DISTINCT
        |    CAST('0x' || substr(md5(g || ':bl'), i * 8 + 1, 8) AS BIGINT)
        |      % 65536 AS p
        |  FROM (SELECT DISTINCT unnest(gs) AS g FROM grams
        |        WHERE doc_id % 101 = 0)
        |  CROSS JOIN slots),
        |cp AS (
        |  SELECT doc_id, sz, g,
        |    CAST('0x' || substr(md5(g || ':bl'), i * 8 + 1, 8) AS BIGINT)
        |      % 65536 AS p
        |  FROM (SELECT doc_id, len(gs) AS sz, unnest(gs) AS g FROM grams)
        |  CROSS JOIN slots),
        |hits AS (
        |  SELECT doc_id, sz, g,
        |    min(CASE WHEN e.p IS NOT NULL THEN 1 ELSE 0 END) AS hit
        |  FROM cp LEFT JOIN epos e ON cp.p = e.p
        |  GROUP BY doc_id, sz, g),
        |agg AS (
        |  SELECT doc_id, sz, CAST(sum(hit) AS BIGINT) AS n_maybe
        |  FROM hits GROUP BY doc_id, sz)
        |SELECT doc_id, n_maybe,
        |  CASE WHEN sz = 0 THEN 0.0
        |       ELSE CAST(n_maybe AS DOUBLE) / sz END AS contamination,
        |  (CASE WHEN sz = 0 THEN 0.0
        |        ELSE CAST(n_maybe AS DOUBLE) / sz END) >= 0.5 AS flagged
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q_text_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |    'https?://[^ \t\n\r]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+?\d{1,3}[-. ]?\(?\d{2,4}\)?[-. ]?\d{3,4}[-. ]?\d{3,4}',
        |    '<PHONE>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_top_tokens" ->
      """SELECT tok, count(*) AS n
        |FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |      FROM documents)
        |WHERE len(tok) > 0
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin,
    // Recomputes the ENTIRE Count-Min derivation: md5-cell sketch,
    // exact top-20 truth, min-over-rows estimates — values pinned.
    "q_text_cms" ->
      """WITH t AS (
        |  SELECT tok FROM (
        |    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |sketch AS (
        |  SELECT r, CAST('0x' || substr(md5(tok || ':cms' || r), 1, 8)
        |      AS BIGINT) % 1024 AS cell, count(*) AS cnt
        |  FROM t CROSS JOIN rs GROUP BY r, cell),
        |top AS (
        |  SELECT tok, count(*) AS n_true FROM t
        |  GROUP BY tok ORDER BY n_true DESC, tok LIMIT 20),
        |probe AS (
        |  SELECT top.tok, top.n_true, rs.r,
        |    CAST('0x' || substr(md5(top.tok || ':cms' || rs.r), 1, 8)
        |      AS BIGINT) % 1024 AS cell
        |  FROM top CROSS JOIN rs),
        |est AS (
        |  SELECT p.tok, p.n_true, min(coalesce(s.cnt, 0)) AS n_est
        |  FROM probe p LEFT JOIN sketch s ON p.r = s.r AND p.cell = s.cell
        |  GROUP BY p.tok, p.n_true)
        |SELECT tok AS token, n_true, n_est, n_est >= n_true AS over_ok
        |FROM est ORDER BY token""".stripMargin,
    "q_text_heavy_hitters" ->
      """WITH t2 AS (
        |  SELECT tok FROM (
        |    SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |      AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |top AS (
        |  SELECT tok, count(*) AS n_exact FROM t2 GROUP BY tok
        |  ORDER BY n_exact DESC, tok LIMIT 10)
        |SELECT tok, n_exact, true AS ok FROM top
        |ORDER BY n_exact DESC, tok""".stripMargin,
    "q_text_heavy_hitters_rollup" ->
      """WITH t2 AS (
        |  SELECT tok FROM (
        |    SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |      AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |top AS (
        |  SELECT tok, count(*) AS n_exact FROM t2 GROUP BY tok
        |  ORDER BY n_exact DESC, tok LIMIT 10)
        |SELECT tok, n_exact, true AS ok FROM top
        |ORDER BY n_exact DESC, tok""".stripMargin,
    // Restates the per-batch sketches (doc_id % 3) AND the cell-wise
    // rollup sum — a rollup that double-counts, drops a batch, or
    // rescans raw history diverges from these values.
    "q_text_cms_rollup" ->
      """WITH t AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |persk AS (
        |  SELECT doc_id % 3 AS b, r,
        |    CAST('0x' || substr(md5(tok || ':cms' || r), 1, 8)
        |      AS BIGINT) % 1024 AS cell, count(*) AS cnt
        |  FROM t CROSS JOIN rs GROUP BY b, r, cell),
        |merged AS (
        |  SELECT r, cell, sum(cnt) AS cnt FROM persk GROUP BY r, cell),
        |top AS (
        |  SELECT tok, count(*) AS n_true FROM t
        |  GROUP BY tok ORDER BY n_true DESC, tok LIMIT 20),
        |probe AS (
        |  SELECT top.tok, top.n_true, rs.r,
        |    CAST('0x' || substr(md5(top.tok || ':cms' || rs.r), 1, 8)
        |      AS BIGINT) % 1024 AS cell
        |  FROM top CROSS JOIN rs),
        |est AS (
        |  SELECT p.tok, p.n_true,
        |    CAST(min(coalesce(m.cnt, 0)) AS BIGINT) AS n_est
        |  FROM probe p LEFT JOIN merged m ON p.r = m.r AND p.cell = m.cell
        |  GROUP BY p.tok, p.n_true)
        |SELECT tok AS token, n_true, n_est, n_est >= n_true AS over_ok
        |FROM est ORDER BY token""".stripMargin,
    "q_join_fuzzy" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer
        |           WHERE c_custkey < 2000)
        |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM c a JOIN c b ON a.c_custkey < b.c_custkey
        |WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
        |  AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "q_text_keywords" ->
      """WITH dt AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '') AS toks
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(toks) AS term FROM dt)
        |  GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs FROM dt WHERE len(toks) > 0),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    tf.tf * (ln((1.0 + s.n_docs) / (1.0 + dfreq.df)) + 1.0) AS tfidf
        |  FROM tf JOIN dfreq USING (term), stats s),
        |ranked AS (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, term) AS rn
        |  FROM scored)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rank, term, round(tfidf, 4) AS tfidf
        |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM (SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) rn
        |      FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_dedup_spans" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, u['i'] AS span_idx, u['s'] AS span FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(
        |        range(0, CAST(greatest(ceil(len(ws) / 10.0), 1) AS BIGINT)),
        |        i -> {'i': i,
        |              's': array_to_string(ws[i*10+1:(i+1)*10], ' ')})) AS u
        |    FROM w)),
        |r AS (
        |  SELECT *, row_number()
        |    OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
        |  FROM s)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' '
        |    ORDER BY span_idx), '') AS text_dedup,
        |  count(*) AS n_spans,
        |  count(CASE WHEN rn = 1 THEN 1 END) AS n_spans_kept
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dedup_spans_flags" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, u['i'] AS span_idx, u['s'] AS span FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(
        |        range(0, CAST(greatest(ceil(len(ws) / 10.0), 1) AS BIGINT)),
        |        i -> {'i': i,
        |              's': array_to_string(ws[i*10+1:(i+1)*10], ' ')})) AS u
        |    FROM w)),
        |r AS (
        |  SELECT *, row_number()
        |    OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
        |  FROM s)
        |SELECT doc_id, span_idx, span, rn = 1 AS keep
        |FROM r ORDER BY doc_id, span_idx""".stripMargin,
    "q_dedup_lines" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    text || chr(10) || substr(text, 1, 40) || chr(10) || text
        |      || chr(10) || substr(text, 1, 40) AS text
        |  FROM documents WHERE doc_id % 3 = 0),
        |ex AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line,
        |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS ord
        |  FROM src),
        |f AS (
        |  SELECT doc_id, line, min(ord) AS ord
        |  FROM ex GROUP BY doc_id, line),
        |n AS (SELECT doc_id, count(*) AS n_lines FROM ex GROUP BY doc_id)
        |SELECT f.doc_id,
        |  string_agg(f.line, chr(10) ORDER BY f.ord) AS text,
        |  any_value(n.n_lines) AS n_lines,
        |  any_value(n.n_lines) - count(*) AS n_dropped
        |FROM f JOIN n ON f.doc_id = n.doc_id
        |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin,
    "q_dedup_substrings" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS s,
        |    array_to_string(ws[i+1:i+10], ' ') AS win
        |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws) - 10 + 1)) AS i
        |        FROM w WHERE len(ws) >= 10)),
        |marked AS (
        |  SELECT doc_id, s, s + 10 AS e FROM (
        |    SELECT doc_id, s,
        |      count(*) OVER (PARTITION BY win) AS c,
        |      row_number() OVER (PARTITION BY win ORDER BY doc_id, s) AS rn
        |    FROM occ)
        |  WHERE c > 1 AND rn > 1),
        |isl AS (
        |  SELECT doc_id, s, e,
        |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |         OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS ni
        |  FROM marked),
        |isl2 AS (SELECT doc_id, s, e,
        |  sum(ni) OVER (PARTITION BY doc_id ORDER BY s
        |    ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM isl),
        |ivs AS (SELECT doc_id, min(s) AS s, max(e) AS e
        |  FROM isl2 GROUP BY doc_id, grp),
        |perdoc AS (SELECT doc_id AS pdoc,
        |  list(struct_pack(s := s, e := e)) AS ivl,
        |  sum(e - s) AS removed FROM ivs GROUP BY doc_id)
        |SELECT w.doc_id,
        |  -- COALESCE: DuckDB's array_to_string of an EMPTY list is
        |  -- NULL; Spark's array_join is '' (a fully-removed doc)
        |  COALESCE(array_to_string(list_transform(list_filter(
        |    list_transform(range(0, len(ws)),
        |      i -> struct_pack(i := i, wd := ws[i+1])),
        |    p -> COALESCE(len(list_filter(ivl,
        |      iv -> p['i'] >= iv['s'] AND p['i'] < iv['e'])), 0) = 0),
        |    p -> p['wd']), ' '), '') AS text_dedup,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(COALESCE(removed, 0) AS BIGINT) AS n_removed
        |FROM w LEFT JOIN perdoc ON w.doc_id = pdoc
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN len(string_split_regex(trim(text), '\s+')) <= 3
        |      THEN [array_to_string(string_split_regex(trim(text), '\s+'), ' ')]
        |      ELSE list_transform(
        |        range(0, len(string_split_regex(trim(text), '\s+')) - 2),
        |        i -> array_to_string(
        |          string_split_regex(trim(text), '\s+')[i+1:i+3], ' '))
        |    END AS grams
        |  FROM documents)
        |SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(a.grams || b.grams)) AS jaccard
        |FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(a.grams || b.grams)) >= 0.1
        |ORDER BY a.lang, id_a, id_b""".stripMargin,
    "q_dedup_clusters" ->
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
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    "q_dedup_embed_cosine" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |  FROM embeddings)
        |SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.35
        |ORDER BY a.label, id_a, id_b""".stripMargin,
    // The gate keys' oracles state the expected INVARIANT. Where DuckDB
    // can recompute the ground truth (exact Jaccard / exact cosine pair
    // counts) it does — those columns are real oracle values; the
    // quality booleans are computed Spark-side against the Spark exact
    // baseline, and a regression flips them → hash mismatch → red row.
    "q_text_fingerprint" ->
      """SELECT doc_id, true AS fp_nonempty, true AS containment_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // `trim(text) <> ''` mirrors the hashed-shingle kernel, which
    // yields an EMPTY set for a token-less doc (so it never pairs) —
    // whereas string_split_regex('') is [''] and would give empty–empty
    // pairs jaccard 1, inflating n_exact on a fixture with blank docs
    // (none today; ADVICE r13 hardening).
    "q_dedup_minhash" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(string_split_regex(trim(text), '\s+')) <= 3
        |      THEN [array_to_string(string_split_regex(trim(text), '\s+'), ' ')]
        |      ELSE list_transform(
        |        range(0, len(string_split_regex(trim(text), '\s+')) - 2),
        |        i -> array_to_string(
        |          string_split_regex(trim(text), '\s+')[i+1:i+3], ' '))
        |    END AS grams
        |  FROM documents WHERE trim(text) <> ''),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_distinct(a.grams || b.grams)) > 0
        |    AND CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |      / len(list_distinct(a.grams || b.grams)) >= 0.3)
        |SELECT (SELECT count(*) FROM p) AS n_exact,
        |  true AS recall_ge_09, true AS no_spurious_pairs""".stripMargin,
    // The sketch is engine-specific, so DuckDB cannot restate the pair
    // set; the scale-independent invariant is the pigeonhole
    // completeness proof (every brute-force Hamming≤3 pair recovered),
    // valid at ANY fixture scale — unlike a pinned pair count.
    "q_dedup_simhash" -> "SELECT true AS recall_complete",
    // Blocked span-level truth (doc_id < 150), independently recomputed:
    // same non-overlapping 10-word span split (zipped unnests — DuckDB
    // list slicing a[i+1:i+n] is the inclusive analog of Spark
    // slice(a, i+1, n)), same word-2-gram sets with the ≤2-token
    // whole-span fallback the hashed-shingle kernel applies.
    "q_dedup_spans_near" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE doc_id < 150),
        |spans AS (
        |  SELECT doc_id,
        |    unnest(range(0, greatest(CAST(ceil(len(w)/10.0) AS INT), 1)))
        |      AS span_idx,
        |    unnest(list_transform(
        |      range(0, greatest(CAST(ceil(len(w)/10.0) AS INT), 1)),
        |      i -> array_to_string(w[i*10+1:i*10+10], ' '))) AS span
        |  FROM ws),
        |g AS (
        |  SELECT doc_id, span_idx,
        |    CASE WHEN len(string_split_regex(trim(span), '\s+')) <= 2
        |      THEN [span]
        |      ELSE list_transform(
        |        range(0, len(string_split_regex(trim(span), '\s+')) - 1),
        |        i -> array_to_string(
        |          string_split_regex(trim(span), '\s+')[i+1:i+2], ' '))
        |    END AS grams
        |  FROM spans WHERE trim(span) <> ''),
        |p AS (
        |  SELECT 1 FROM g a JOIN g b
        |  ON (a.doc_id, a.span_idx) < (b.doc_id, b.span_idx)
        |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |      / len(list_distinct(a.grams || b.grams)) >= 0.3)
        |SELECT (SELECT count(*) FROM p) AS n_exact,
        |  true AS recall_ge_08, true AS no_spurious_pairs""".stripMargin,
    "q_dedup_embed_lsh" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.v, b.v) >= 0.35)
        |SELECT (SELECT count(*) FROM p) AS n_exact,
        |  true AS recall_ge_095, true AS no_spurious_pairs""".stripMargin,
    "q_dedup_semantic" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.v, b.v) >= 0.35)
        |SELECT (SELECT count(*) FROM p) AS n_exact_global,
        |  true AS planted_recall_1, true AS no_spurious_pairs""".stripMargin,
    "q_sim_ann_lsh" ->
      """SELECT vec_id AS query_id, r AS rank, true AS cos_le_exact
        |FROM embeddings, range(1, 6) t(r)
        |WHERE vec_id < 10 ORDER BY query_id, rank""".stripMargin,
    "q_sim_ann_ivf" ->
      """SELECT vec_id AS query_id, r AS rank, true AS cos_le_exact
        |FROM embeddings, range(1, 6) t(r)
        |WHERE vec_id < 10 ORDER BY query_id, rank""".stripMargin,
    "q_sim_ann_ivf_search" ->
      """SELECT vec_id AS query_id, r AS rank, true AS cos_le_exact
        |FROM embeddings, range(1, 6) t(r)
        |WHERE vec_id < 10 ORDER BY query_id, rank""".stripMargin,
    "q_sim_ann_lsh_recall" ->
      "SELECT CAST(50 AS BIGINT) AS n_brute, true AS recall_ge_08",
    "q_sim_ann_ivf_recall" ->
      "SELECT CAST(50 AS BIGINT) AS n_brute, true AS recall_ge_08",
    "q_sim_ann_pq" ->
      """SELECT vec_id AS query_id, r AS rank, true AS cos_le_exact
        |FROM embeddings, range(1, 6) t(r)
        |WHERE vec_id < 10 ORDER BY query_id, rank""".stripMargin,
    "q_sim_ann_pq_search" ->
      """SELECT vec_id AS query_id, r AS rank, true AS cos_le_exact
        |FROM embeddings, range(1, 6) t(r)
        |WHERE vec_id < 10 ORDER BY query_id, rank""".stripMargin,
    "q_sim_ann_pq_recall" ->
      "SELECT CAST(50 AS BIGINT) AS n_brute, true AS recall_ge_08",
    "q_sim_ann_ivfpq" ->
      """SELECT vec_id AS query_id, r AS rank, true AS cos_le_exact
        |FROM embeddings, range(1, 6) t(r)
        |WHERE vec_id < 10 ORDER BY query_id, rank""".stripMargin,
    "q_sim_ann_ivfpq_search" ->
      """SELECT vec_id AS query_id, r AS rank, true AS cos_le_exact
        |FROM embeddings, range(1, 6) t(r)
        |WHERE vec_id < 10 ORDER BY query_id, rank""".stripMargin,
    "q_sim_ann_ivfpq_recall" ->
      "SELECT CAST(50 AS BIGINT) AS n_brute, true AS recall_ge_08",
    "q_sim_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS nbr_id,
        |    list_cosine_similarity(q.qv, e.v) AS cos
        |  FROM q JOIN e ON q.query_id <> e.vec_id)
        |SELECT query_id, rank, nbr_id FROM (
        |  SELECT query_id, nbr_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, nbr_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  )
}
