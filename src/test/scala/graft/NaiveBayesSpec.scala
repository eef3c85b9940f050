package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NaiveBayes

/** Multinomial NB classification: exact-value check against the
  * independently-computed closed form on a tiny corpus, cross-corpus
  * train/score with a separable fixture, the hashing-trick fold's
  * bounded weight table, tie determinism, and the zero-token
  * exclusion edge. The full self-score pipeline is oracle-verified
  * end-to-end by `q_text_classify_nb` against the DuckDB restatement;
  * these specs pin what the fixture doesn't isolate. */
class NaiveBayesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("self-score matches the closed form on a hand-checked corpus") {
    // class p: "a a b" ; class q: "b c"
    //   weights: (p,a)=2 (p,b)=1 (q,b)=1 (q,c)=1
    //   totals:  n_p=3 n_q=2 ; V=3 ; priors 1/2, 1/2
    val docs = Seq((1L, "a a b", "p"), (2L, "b c", "q"))
      .toDF("doc_id", "text", "lang")
    val got = NaiveBayes.selfScore(docs, labelCol = "lang", alpha = 0.5)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "label", "logpost")
      .as[(Long, Long, String, Double)].collect().toSeq
    def lp(c: Long, n: Long): Double = math.log((c + 0.5) / (n + 0.5 * 3))
    val prior = math.log(0.5)
    // doc 1 = {a:2, b:1}
    val d1p = prior + 2 * lp(2, 3) + lp(1, 3)
    val d1q = prior + 2 * lp(0, 2) + lp(1, 2)
    // doc 2 = {b:1, c:1}
    val d2p = prior + lp(1, 3) + lp(0, 3)
    val d2q = prior + lp(1, 2) + lp(1, 2)
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 1L, "p"), (1L, 2L, "q"), (2L, 1L, "q"), (2L, 2L, "p")),
      s"rank order must put each doc's own class first: $got")
    val byKey = got.map(r => (r._1, r._3) -> r._4).toMap
    for (((k, want), i) <- Seq(((1L, "p"), d1p), ((1L, "q"), d1q),
        ((2L, "p"), d2p), ((2L, "q"), d2q)).zipWithIndex)
      assert(math.abs(byKey(k) - want) < 1e-12, s"case $i: ${byKey(k)} vs $want")
  }

  test("cross-corpus: held-out docs route to the right class; OOV is safe") {
    val train = Seq(
      (1L, "spark shuffle partition join broadcast", "eng"),
      (2L, "partition broadcast shuffle codegen spark", "eng"),
      (3L, "sonnet stanza rhyme meter verse", "poem"),
      (4L, "verse rhyme couplet stanza meter", "poem"))
      .toDF("doc_id", "text", "lang")
    val model = NaiveBayes.train(train, labelCol = "lang")
    val target = Seq((10L, "shuffle join spark"), (11L, "rhyme verse meter"),
      (12L, "zq xv qqj")).toDF("doc_id", "text")
    val got = NaiveBayes.score(model, target)
      .where($"rank" === 1).select("doc_id", "label", "logpost")
      .as[(Long, String, Double)].collect()
    val pred = got.map(r => r._1 -> r._2).toMap
    assert(pred(10L) == "eng" && pred(11L) == "poem",
      s"separable fixture must classify correctly: $pred")
    // fully-OOV doc: every (token, class) pair coalesces to the floor,
    // so scores are finite and ranking falls back to the prior + the
    // per-class floor — never NaN/null.
    assert(got.forall(r => !r._3.isNaN && !r._3.isInfinite),
      s"OOV scoring must stay finite: ${got.toSeq}")
  }

  test("hashing-trick fold: bounded weight table, still separates") {
    val train = Seq(
      (1L, "spark shuffle partition join broadcast", "eng"),
      (2L, "partition broadcast shuffle codegen spark", "eng"),
      (3L, "sonnet stanza rhyme meter verse", "poem"),
      (4L, "verse rhyme couplet stanza meter", "poem"))
      .toDF("doc_id", "text", "lang")
    val fold = NaiveBayes.hashTokens(buckets = 8) _
    val model = NaiveBayes.train(train, labelCol = "lang", tokenize = fold)
    assert(model.weights.count() <= 8 * 2,
      "hashed weight table must be bounded by buckets x labels")
    val target = Seq((10L, "shuffle join spark"), (11L, "rhyme verse meter"))
      .toDF("doc_id", "text")
    val pred = NaiveBayes.score(model, target, tokenize = fold)
      .where($"rank" === 1).select("doc_id", "label")
      .as[(Long, String)].collect().toMap
    assert(pred == Map(10L -> "eng", 11L -> "poem"),
      s"8-bucket fold keeps the fixture separable: $pred")
  }

  test("exact ties rank by label ascending (deterministic total order)") {
    // perfectly symmetric classes: swap a<->b and p<->q maps the corpus
    // to itself, so a doc with balanced evidence ties exactly.
    val docs = Seq((1L, "a a", "p"), (2L, "b b", "q"), (3L, "a b", "p"),
      (4L, "a b", "q")).toDF("doc_id", "text", "lang")
    val model = NaiveBayes.train(docs, labelCol = "lang")
    val got = NaiveBayes.score(model, Seq((10L, "a b")).toDF("doc_id", "text"))
      .orderBy("rank").select("rank", "label", "logpost")
      .as[(Long, String, Double)].collect().toSeq
    assert(got.map(_._3).distinct.size == 1, s"fixture must tie: $got")
    assert(got.map(r => (r._1, r._2)) == Seq((1L, "p"), (2L, "q")),
      s"ties break by label asc: $got")
  }

  test("zero-token docs are absent from training and scoring") {
    val docs = Seq((1L, "real text here", "p"), (2L, "???!!!", "p"),
      (3L, "more real text", "q")).toDF("doc_id", "text", "lang")
    val got = NaiveBayes.selfScore(docs, labelCol = "lang")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(got == Set(1L, 3L), s"punct-only doc must be absent: $got")
  }
}
