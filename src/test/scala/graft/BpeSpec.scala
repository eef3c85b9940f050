package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeKernel
import graft.operators.BpeTokenizer

/** BPE tokenizer: merge-list parity against an independent reference
  * implementation (string-rewrite style, no shared code with the
  * kernel), encode/train self-consistency, determinism under
  * repartitioning, and the roundtrip/bounds invariants the
  * `q_tokenize_bpe` gate carries per row. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  // ---- independent reference: words as space-joined symbol STRINGS
  // (the classic exposition encoding), merges via regex-free rewrite
  private def refTrain(wordFreq: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] = wordFreq.groupBy(_._1)
      .map { case (w, xs) => (w.toList.map(_.toString), xs.map(_._2).sum) }
    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (merges.size < numMerges && !stop) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, n) <- vocab; Seq(a, b) <- syms.sliding(2)
           if syms.length > 1)
        counts((a, b)) += n
      if (counts.isEmpty) stop = true
      else {
        val maxN = counts.values.max
        if (maxN < 2) stop = true
        else {
          val best = counts.filter(_._2 == maxN).keys.min
          merges += best
          def rewrite(syms: List[String]): List[String] = syms match {
            case a :: b :: rest if (a, b) == best =>
              (a + b) :: rewrite(rest)
            case x :: rest => x :: rewrite(rest)
            case Nil => Nil
          }
          vocab = vocab.toSeq.map { case (s, n) => (rewrite(s), n) }
            .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
        }
      }
    }
    merges.toSeq
  }

  private def refEncode(word: String,
      merges: Seq[(String, String)]): List[String] = {
    var syms = word.toList.map(_.toString)
    for (best <- merges) {
      def rewrite(s: List[String]): List[String] = s match {
        case a :: b :: rest if (a, b) == best => (a + b) :: rewrite(rest)
        case x :: rest => x :: rewrite(rest)
        case Nil => Nil
      }
      syms = rewrite(syms)
    }
    syms
  }

  test("trained merges match the reference implementation exactly") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "newer newest new news"),
      (3L, "wider wide widest lower")).toDF("doc_id", "text")
    val model = BpeTokenizer.train(docs, numMerges = 12)
    // reference word frequencies from the same pre-tokenization
    val wf = docs.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.split("\\s+")).toSeq
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }.toSeq
    val expect = refTrain(wf, 12)
    assert(model.merges == expect,
      s"merge lists diverge:\n got ${model.merges}\n ref $expect")
  }

  test("kernel encoding matches reference encoding for every word") {
    val words = Seq("low", "lowest", "newer", "aaaa", "a", "", "zzz",
      "wideness", "lowlow")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("a", "a"),
      ("aa", "aa"))
    val pairs = merges.toArray
    for (w <- words) {
      val got = BpeKernel.encodeWord(w, pairs).toList
      val ref = refEncode(w, merges)
      assert(got == ref, s"word '$w': got $got, ref $ref")
    }
  }

  test("left-to-right within a pass: 'aaa' + (a,a) -> [aa, a]") {
    assert(BpeKernel.encodeWord("aaa", Array(("a", "a"))).toList ==
      List("aa", "a"))
    // and the learned double-pair chains: (a,a) then (aa,aa)
    assert(BpeKernel.encodeWord("aaaaa",
      Array(("a", "a"), ("aa", "aa"))).toList == List("aaaa", "a"))
  }

  test("training is invariant to partitioning and row order") {
    val base = (0L until 60L).map(i =>
      (i, s"shuffle invariance text number ${i % 7} repeated tokens"))
    val a = BpeTokenizer.train(base.toDF("doc_id", "text"), numMerges = 20)
    val b = BpeTokenizer.train(
      base.reverse.toDF("doc_id", "text").repartition(7), numMerges = 20)
    assert(a.merges == b.merges)
  }

  test("roundtrip + bounds hold; merges actually compress the corpus") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the the the quick quick brown"),
      (3L, ""),
      (4L, "!!! 123 abc-def")).toDF("doc_id", "text")
    val model = BpeTokenizer.train(docs, numMerges = 30)
    assert(model.merges.nonEmpty, "fixture must learn at least one merge")
    val got = docs.select(col("doc_id"),
        BpeTokenizer.preTokens(col("text")).as("pre"),
        BpeTokenizer.encode(model, col("text")).as("bpe"),
        BpeTokenizer.countTokens(model, col("text")).as("cnt"))
      .as[(Long, Seq[String], Seq[String], Int)].collect()
    for ((id, pre, bpe, cnt) <- got) {
      assert(bpe.mkString("") == pre.mkString(""), s"doc $id roundtrip")
      assert(bpe.size == cnt, s"doc $id: encode vs count kernel")
      assert(bpe.size >= pre.size && bpe.size <= pre.map(_.length).sum,
        s"doc $id bounds")
    }
    val totalBpe = got.map(_._3.size).sum
    val totalChars = got.map(_._2.map(_.length).sum).sum
    assert(totalBpe < totalChars,
      s"merges must compress below char count: $totalBpe vs $totalChars")
  }

  test("packing by real BPE token counts composes with Pack.sequences") {
    val docs = (0L until 40L)
      .map(i => (i, s"pack budget composition doc $i with shared shared text"))
      .toDF("doc_id", "text")
    val model = BpeTokenizer.train(docs, numMerges = 40)
    val packed = operators.Pack.sequences(docs, budget = 32L,
        tokensExpr = BpeTokenizer.countTokens(model, col("text")))
      .select(col("doc_id"), col("pack_id"), col("n_tokens"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // n_tokens must be the BPE count, and pack_id the exclusive
    // prefix-sum chunk — recomputed locally from the same counts
    val counts = docs.select(col("doc_id"),
        BpeTokenizer.countTokens(model, col("text")).cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    var run = 0L
    counts.zip(packed).foreach { case ((id, n), (pid, pack, ntok)) =>
      assert(id == pid && n == ntok)
      assert(pack == run / 32L, s"doc $id: pack $pack, start $run")
      run += n
    }
  }

  test("persisted model == fresh model: merges and every token count") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val model = BpeTokenizer.train(docs, numMerges = 40)
    val root = java.nio.file.Files.createTempDirectory("bpe-model").toString
    BpeTokenizer.persist(spark, root, model)
    val loaded = BpeTokenizer.load(spark, root)
      .getOrElse(fail("persisted BPE model did not load"))
    assert(loaded.merges == model.merges,
      "merge list (including ORDER) must round-trip exactly")
    val fresh = docs.select(col("doc_id"),
        BpeTokenizer.countTokens(model, col("text")).cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val served = docs.select(col("doc_id"),
        BpeTokenizer.countTokens(loaded, col("text")).cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(served == fresh && fresh.nonEmpty)
    assert(BpeTokenizer.load(spark,
      java.nio.file.Files.createTempDirectory("bpe-none").toString).isEmpty)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
