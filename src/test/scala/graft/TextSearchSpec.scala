package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextSearch

/** BM25 retrieval + TF-IDF keyword extraction: relevance contract on
  * planted corpora, absent-term/empty-query edges, and the scale-shape
  * pins (query-vocabulary pruning BEFORE the postings aggregate;
  * broadcast query side). The numeric formulas themselves are
  * oracle-verified end-to-end by `q_search_bm25` / `q_text_keywords`
  * against DuckDB restatements — these specs pin semantics the oracle
  * can't see (plan shape) or that the fixture doesn't exercise. */
class TextSearchSpec extends AnyFunSuite {

  // AQE off: the plan-shape test traverses the executed plan, and the
  // AdaptiveSparkPlanExec wrapper hides its tree from collect(); the
  // semantics under test are AQE-independent.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark shuffle exchange partition spark spark"),
    (2L, "window aggregate frame window"),
    (3L, "the quick brown fox jumps over the lazy dog"),
    (4L, "spark window merge join"),
    (5L, "completely unrelated text about gardening tulips"),
    (6L, "")).toDF("doc_id", "text")

  test("bm25: doc containing every query term outranks partial matches") {
    val qs = Seq((0, "spark window merge")).toDF("query_id", "qtext")
    val got = TextSearch.bm25TopK(corpus, qs, k = 10)
      .orderBy("query_id", "rank")
      .select("doc_id", "rank").as[(Long, Long)].collect()
    assert(got.head == ((4L, 1L)),
      s"doc 4 holds all three query terms and must rank first: ${got.toSeq}")
    // docs with no query term never appear
    val ids = got.map(_._1).toSet
    assert(!ids.contains(3L) && !ids.contains(5L) && !ids.contains(6L))
  }

  test("bm25: tf saturates (k1) — 3x 'spark' beats 1x but not 3x") {
    val qs = Seq((0, "spark")).toDF("query_id", "qtext")
    val got = TextSearch.bm25TopK(corpus, qs, k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(got(1L) > got(4L), "higher tf must score higher")
    assert(got(1L) < 3 * got(4L),
      "BM25 tf saturation: triple tf must NOT triple the score " +
        "(doc lengths differ but not 3x)")
  }

  test("bm25: absent-term and empty queries yield no rows for them") {
    val qs = Seq((0, "zzzabsent"), (1, ""), (2, "fox")).toDF("query_id", "qtext")
    val got = TextSearch.bm25TopK(corpus, qs, k = 10)
      .select("query_id", "doc_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((2L, 3L)),
      s"only the 'fox' probe matches anything: ${got.toSeq}")
  }

  test("bm25: rank ties break by doc_id descending (TopKPerKey order)") {
    // two docs with identical text => identical (tf, dl) => exact tie
    val docs = Seq((10L, "alpha beta"), (11L, "alpha beta"),
      (12L, "gamma")).toDF("doc_id", "text")
    val qs = Seq((0, "alpha")).toDF("query_id", "qtext")
    val got = TextSearch.bm25TopK(docs, qs, k = 10)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(11L, 10L), s"tie must order by doc_id desc: $got")
  }

  test("bm25 plan: postings pruned before aggregation, query side broadcast") {
    val qs = Seq((0, "spark window")).toDF("query_id", "qtext")
    val plan = TextSearch.bm25TopK(corpus, qs, k = 10)
      .queryExecution.executedPlan
    val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 3,
      s"query-vocab semi-join, dfreq and qterms sides must all broadcast " +
        s"(found ${bhj.size} broadcast hash joins)\n$plan")
    assert(bhj.exists(_.joinType.toString == "LeftSemi"),
      s"the query-vocabulary prune must be a broadcast LEFT SEMI join\n$plan")
    // Every CORPUS-side shuffle (it carries doc_id) whose subtree
    // explodes tokens must have the broadcast semi-join BELOW it —
    // i.e. only pruned postings are shuffled, the full-vocabulary
    // posting list never materializes. (The query side also explodes
    // for its tiny distinct(), hence the doc_id scoping.)
    val postingsShuffles = plan.collect {
      case s: ShuffleExchangeExec
          if s.output.exists(_.name == "doc_id") &&
            s.child.collect({ case g: GenerateExec => g }).nonEmpty => s
    }
    assert(postingsShuffles.nonEmpty, s"expected a postings shuffle\n$plan")
    postingsShuffles.foreach { s =>
      val pruned = s.child.collect { case b: BroadcastHashJoinExec => b }
        .exists(_.joinType.toString == "LeftSemi")
      assert(pruned,
        "found a shuffle over exploded tokens without the query-vocab " +
          s"semi-join below it — the full posting list would materialize\n$plan")
    }
  }

  test("index round-trip: searchIndex == bm25TopK (persisted postings " +
      "are result-invisible)") {
    val root = java.nio.file.Files.createTempDirectory("bm25idx").toString
    val (postings, stats) = TextSearch.index(corpus)
    TextSearch.persistIndex(spark, root, postings, stats)
    val (p, st) = TextSearch.loadIndex(spark, root).get
    val qs = Seq((0, "spark window merge"), (1, "fox"), (2, "zzzabsent"))
      .toDF("query_id", "qtext")
    val direct = TextSearch.bm25TopK(corpus, qs, k = 10)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val served = TextSearch.searchIndex(p, st, qs, k = 10)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(served.toSeq == direct.toSeq)
  }

  test("index serving plan: the query vocabulary reaches the postings " +
      "scan as a pushed IN filter") {
    val root = java.nio.file.Files.createTempDirectory("bm25idx-plan").toString
    val (postings, stats) = TextSearch.index(corpus)
    TextSearch.persistIndex(spark, root, postings, stats)
    val (p, st) = TextSearch.loadIndex(spark, root).get
    val qs = Seq((0, "spark window")).toDF("query_id", "qtext")
    val plan = TextSearch.searchIndex(p, st, qs, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term IN (...) must push down to the parquet postings scan " +
        s"(row-group pruning on the term-sorted layout)\n$plan")
  }

  test("index serving: queries with no surviving terms return empty") {
    val root = java.nio.file.Files.createTempDirectory("bm25idx-empty").toString
    val (postings, stats) = TextSearch.index(corpus)
    TextSearch.persistIndex(spark, root, postings, stats)
    val (p, st) = TextSearch.loadIndex(spark, root).get
    val qs = Seq((0, ""), (1, "...")).toDF("query_id", "qtext")
    assert(TextSearch.searchIndex(p, st, qs, k = 5).isEmpty)
  }

  test("keywords: the distinctive term ranks first, k bounds rows") {
    val docs = Seq(
      (1L, "common tulip"),
      (2L, "common common common"),
      (3L, "common rose rose")).toDF("doc_id", "text")
    val got = TextSearch.tfIdfKeywords(docs, k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term").as[(Long, Long, String)].collect()
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).head._3 == "tulip",
      s"df=1 'tulip' (idf ln(2)+1) must beat df=3 'common' (idf 1) at " +
        s"equal tf: ${byDoc(1L).toSeq}")
    assert(byDoc(3L).head._3 == "rose")
    assert(got.count(_._1 == 2L) == 1, "doc 2 has one distinct term")
    assert(byDoc.values.forall(_.length <= 2))
  }

  test("keywords: empty docs produce no rows; ranks are 1..k dense") {
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val got = TextSearch.tfIdfKeywords(docs, k = 5)
      .select("doc_id", "rank").as[(Long, Long)].collect()
    assert(got.forall(_._1 == 1L))
    assert(got.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("rrf: both-system docs outrank single-system docs, scores exact") {
    // sys1: A@1, B@2;  sys2: A@2, C@1  (query 7)
    val sys1 = Seq((7L, 1L, 100L), (7L, 2L, 200L))
      .toDF("query_id", "rank", "doc_id")
    val sys2 = Seq((7L, 1L, 300L), (7L, 2L, 100L))
      .toDF("query_id", "rank", "doc_id")
    val got = TextSearch.rrfFuse(Seq(sys1, sys2), k = 10)
      .orderBy("rank").select("doc_id", "rrf")
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(100L, 300L, 200L),
      s"A (both lists) > C (rank 1 once) > B (rank 2 once): $got")
    assert(math.abs(got(0)._2 - (1.0 / 61 + 1.0 / 62)) < 1e-12)
    assert(math.abs(got(1)._2 - 1.0 / 61) < 1e-12)
    assert(math.abs(got(2)._2 - 1.0 / 62) < 1e-12)
  }

  test("rrf: equal-score ties break by doc_id descending; k bounds rows") {
    // two docs each ranked 1 by exactly one system => identical score
    val sys1 = Seq((0L, 1L, 10L), (0L, 2L, 30L))
      .toDF("query_id", "rank", "doc_id")
    val sys2 = Seq((0L, 1L, 20L), (0L, 2L, 40L))
      .toDF("query_id", "rank", "doc_id")
    val got = TextSearch.rrfFuse(Seq(sys1, sys2), k = 3)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(20L, 10L, 40L),
      s"ties at 1/61 and 1/62 order by doc_id desc, k=3 cuts: $got")
  }

  test("rrf: custom c shifts weights; per-query isolation holds") {
    val sys1 = Seq((0L, 1L, 1L), (1L, 1L, 2L))
      .toDF("query_id", "rank", "doc_id")
    val got = TextSearch.rrfFuse(Seq(sys1), k = 5, c = 0.0)
      .select("query_id", "doc_id", "rrf")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((0L, 1L, 1.0), (1L, 2L, 1.0)),
      s"c=0, rank 1 => score 1.0, queries fused independently: $got")
  }

  test("booleanRelevance: conjunction over distinct terms only") {
    val qs = Seq((0, "spark window"), (1, "nosuchword spark"),
      (2, "the the fox")).toDF("query_id", "qtext")
    val rel = TextSearch.booleanRelevance(corpus, qs)
      .as[(Long, Long)].collect().toSet
    // q0: only doc 4 has BOTH spark and window; q1: nosuchword kills
    // every doc; q2: repeated query term counts once — doc 3 has
    // the+fox and must qualify even though "the" appears twice in q.
    assert(rel == Set((0L, 4L), (2L, 3L)))
  }

  test("evalRanking: hand metrics — partial hits, cutoff, no-rel and " +
      "no-hit queries") {
    val ret = Seq(
      (0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 30L), (0L, 11L, 99L),
      (1L, 1L, 40L),
      (2L, 1L, 50L)).toDF("query_id", "rank", "doc_id")
    val rels = Seq((0L, 20L), (0L, 40L), (0L, 99L), (1L, 77L))
      .toDF("query_id", "doc_id")
    val qs = Seq((0, "x"), (1, "x"), (2, "x"), (3, "x"))
      .toDF("query_id", "qtext")
    val out = TextSearch.evalRanking(ret, rels, qs, k = 10)
      .orderBy("query_id").collect()
    def log2(x: Double) = math.log(x) / math.log(2.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // q0: doc 99 is relevant but ranked past the cutoff → excluded
    // from n_ret AND the hit fold; hit = doc 20 at rank 2.
    val q0 = out(0)
    assert((q0.getLong(1), q0.getLong(2), q0.getLong(3), q0.getLong(4)) ==
      ((3L, 3L, 1L, 2L)))
    assert(q0.getDouble(5) == 0.1) // precision 1/10
    assert(q0.getDouble(6) == 0.333333) // recall 1/3
    assert(q0.getDouble(7) == 0.5) // rr = 1/2
    val idcg0 = 1.0 + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(q0.getDouble(8) == r6((1.0 / log2(3.0)) / idcg0))

    // q1: one relevant doc, none retrieved — recall/ndcg 0, rr 0.
    val q1 = out(1)
    assert((q1.getLong(1), q1.getLong(2), q1.getLong(3)) == ((1L, 1L, 0L)))
    assert(q1.isNullAt(4) && q1.getDouble(6) == 0.0 &&
      q1.getDouble(7) == 0.0 && q1.getDouble(8) == 0.0)

    // q2: retrieved but NO relevant docs exist — recall/ndcg are
    // undefined (NULL), not zero; q3: query absent from both inputs.
    val q2 = out(2)
    assert((q2.getLong(1), q2.getLong(2), q2.getLong(3)) == ((0L, 1L, 0L)))
    assert(q2.isNullAt(4) && q2.isNullAt(6) && q2.getDouble(7) == 0.0 &&
      q2.isNullAt(8))
    val q3 = out(3)
    assert((q3.getLong(1), q3.getLong(2), q3.getLong(3)) == ((0L, 0L, 0L)))
    assert(q3.isNullAt(4) && q3.getDouble(5) == 0.0 && q3.isNullAt(6) &&
      q3.getDouble(7) == 0.0 && q3.isNullAt(8))
  }

  test("gradedRelevance: gain counts matched distinct terms; the " +
      "full-gain slice IS booleanRelevance") {
    val qs = Seq((0, "spark window"), (1, "the the fox"))
      .toDF("query_id", "qtext")
    val graded = TextSearch.gradedRelevance(corpus, qs)
      .as[(Long, Long, Long)].collect().toSet
    // any doc matching at least one term appears, gain = #terms matched
    assert(graded.filter(_._1 == 0L).forall(t => t._3 >= 1L && t._3 <= 2L))
    val fullGain = graded.filter(t => t._1 == 0L && t._3 == 2L)
      .map(t => (t._1, t._2))
    val bool = TextSearch.booleanRelevance(corpus, qs)
      .as[(Long, Long)].collect().toSet.filter(_._1 == 0L)
    assert(fullGain == bool)
    // repeated query terms count once: q1 gains are at most 2 (the, fox)
    assert(graded.filter(_._1 == 1L).forall(_._3 <= 2L))
  }

  test("evalRankingGraded: hand DCG/IDCG with multi-level gains, " +
      "cutoff-bounded ideal, duplicate judgments collapse to max gain") {
    def log2(x: Double) = math.log(x) / math.log(2.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ret = Seq(
      (0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 30L),
      (1L, 1L, 40L)).toDF("query_id", "rank", "doc_id")
    val rels = Seq(
      (0L, 20L, 3L), (0L, 20L, 1L), // duplicate judgment: max gain wins
      (0L, 30L, 1L), (0L, 77L, 2L),
      (1L, 88L, 1L)).toDF("query_id", "doc_id", "gain")
    val qs = Seq((0, "x"), (1, "x"), (2, "x")).toDF("query_id", "qtext")
    val out = TextSearch.evalRankingGraded(ret, rels, qs, k = 2)
      .orderBy("query_id").collect()
    // q0 at k=2: hits = doc 20 (rank 2, gain 3); doc 30 is past the
    // cutoff. dcg = (2^3-1)/log2(3). ideal gains desc = [3, 2, 1],
    // cutoff 2 → idcg = 7/log2(2) + 3/log2(3).
    val q0 = out(0)
    assert((q0.getLong(1), q0.getLong(2), q0.getLong(3)) == ((3L, 1L, 2L)))
    val dcg0 = 7.0 / log2(3.0)
    val idcg0 = 7.0 / log2(2.0) + 3.0 / log2(3.0)
    assert(q0.getDouble(4) == r6(dcg0))
    assert(q0.getDouble(5) == r6(idcg0))
    assert(q0.getDouble(6) == r6(dcg0 / idcg0))
    // q1: judged but nothing relevant retrieved → dcg 0, ndcg 0
    val q1 = out(1)
    assert((q1.getLong(1), q1.getLong(2)) == ((1L, 0L)))
    assert(q1.isNullAt(3) && q1.getDouble(4) == 0.0 &&
      q1.getDouble(6) == 0.0)
    // q2: no judgments → idcg/ndcg NULL, not zero
    val q2 = out(2)
    assert(q2.getLong(1) == 0L && q2.isNullAt(5) && q2.isNullAt(6))
  }
}
