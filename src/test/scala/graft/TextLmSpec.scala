package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextLm

/** Bigram-LM quality scoring: exact-value check against an
  * independently-computed closed form on a tiny corpus, cross-corpus
  * (train-on-reference) semantics including out-of-vocabulary
  * smoothing, and the sub-2-token exclusion edge. The full self-score
  * formula is oracle-verified end-to-end by `q_quality_lm_score`
  * against the DuckDB restatement; these specs pin the semantics the
  * fixture doesn't isolate. */
class TextLmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("self-score matches the closed form on a hand-checked corpus") {
    // corpus: "a b a b" and "a b c"
    //   bigrams: (a,b)x3  (b,a)x1  (b,c)x1 ; contexts: a->3, b->2 ; V=3
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextLm.selfScore(docs, alpha = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "nll")
      .as[(Long, Long, Double)].collect().toSeq
    val pAB = (3 + 0.5) / (3 + 0.5 * 3) // c12=3, c1(a)=3
    val pBA = (1 + 0.5) / (2 + 0.5 * 3) // c12=1, c1(b)=2
    val pBC = (1 + 0.5) / (2 + 0.5 * 3)
    val nll1 = -(2 * math.log(pAB) + math.log(pBA)) / 3
    val nll2 = -(math.log(pAB) + math.log(pBC)) / 2
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 3L), (2L, 2L)))
    assert(math.abs(got(0)._3 - nll1) < 1e-12, s"doc 1: ${got(0)._3} vs $nll1")
    assert(math.abs(got(1)._3 - nll2) < 1e-12, s"doc 2: ${got(1)._3} vs $nll2")
  }

  test("cross-corpus: out-of-vocabulary text scores as maximally surprising") {
    val ref = Seq((1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug")).toDF("doc_id", "text")
    val model = TextLm.train(ref)
    val target = Seq((10L, "the cat sat"), (11L, "zq xv qqj zq"))
      .toDF("doc_id", "text")
    val got = TextLm.score(model, target, alpha = 0.5)
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    assert(got(10L) < got(11L),
      s"in-distribution text must beat token salad: $got")
    // every OOV bigram has c12=0, c1=0 => p = alpha/(alpha*V) = 1/V;
    // ref vocabulary = {the,cat,sat,on,mat,dog,rug} => V=7
    assert(math.abs(got(11L) - math.log(7.0)) < 1e-12,
      s"fully-OOV doc's nll must equal ln(V): ${got(11L)}")
  }

  test("docs with <2 tokens have no bigrams and are absent") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens here"))
      .toDF("doc_id", "text")
    val got = TextLm.selfScore(docs).select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L), s"only the >=2-token doc scores: $got")
  }

  test("unseen context vs unseen continuation smooth differently") {
    val ref = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val model = TextLm.train(ref)
    // "b z": context b seen (c1=2), continuation z unseen => (0+.5)/(2+.5*3)
    // "z b": context z unseen                             => (0+.5)/(0+.5*3)
    val target = Seq((10L, "b z"), (11L, "z b")).toDF("doc_id", "text")
    val got = TextLm.score(model, target, alpha = 0.5)
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    assert(math.abs(got(10L) + math.log(0.5 / 3.5)) < 1e-12, s"$got")
    assert(math.abs(got(11L) + math.log(0.5 / 1.5)) < 1e-12, s"$got")
  }
}
