package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextExpressions, TextFunctions}
import graft.operators.{Dedup, Ivf, Similarity}

/** Extension operators: dedup family with planted duplicates, ANN
  * recall vs brute force, language-ID fixtures, fingerprint robustness.
  */
class ExtSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep dark forest to hide from all the hunters"

  test("exact dedup keeps lowest id per identical text") {
    val docs = Seq((1L, base), (2L, base), (3L, "something else entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(docs).select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("intra-doc line dedup: repeats dropped in place, order kept, blanks collapse") {
    val docs = Seq(
      (1L, "keep me\nunique line\nkeep me\nanother\nkeep me"),
      (2L, "a\n\n\nb"),          // blank-line run collapses to one
      (3L, "no repeats here"))
      .toDF("doc_id", "text")
    val out = Dedup.intraDocLineDedup(docs).orderBy("doc_id")
      .select("doc_id", "text", "n_lines", "n_dropped")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "keep me\nunique line\nanother", 5L, 2L),
      (2L, "a\n\nb", 4L, 1L),
      (3L, "no repeats here", 1L, 0L)))
    // other columns pass through untouched
    val withMeta = Dedup.intraDocLineDedup(
      docs.withColumn("src", concat(lit("s"), $"doc_id")))
    assert(withMeta.columns.toSet ==
      Set("doc_id", "text", "src", "n_lines", "n_dropped"))
  }

  test("span dedup: cross-doc boilerplate span dropped, first occurrence kept") {
    // 10-word boilerplate header shared verbatim by docs 1 and 2; the
    // bodies are distinct, so whole-doc dedup would keep both intact.
    val header = "this website uses cookies to improve your browsing experience today"
    val body1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val body2 = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, s"$header $body1"),
      (2L, s"$header $body2"),
      (3L, "a short unrelated doc")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs)
      .orderBy("doc_id")
      .select("doc_id", "text_dedup", "n_spans", "n_spans_kept")
      .as[(Long, String, Long, Long)].collect().toSeq
    // doc 1 keeps everything; doc 2 loses exactly the header span but
    // keeps its own body; doc 3 (single short span) passes through
    assert(out == Seq(
      (1L, s"$header $body1", 2L, 2L),
      (2L, body2, 2L, 1L),
      (3L, "a short unrelated doc", 1L, 1L)))
    // provenance flags agree with the reassembly
    val flags = Dedup.spanFlags(docs)
      .orderBy("doc_id", "span_idx")
      .select("doc_id", "span_idx", "keep")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(flags == Seq((1L, 0L, true), (1L, 1L, true),
      (2L, 0L, false), (2L, 1L, true), (3L, 0L, true)))
  }

  test("span dedup: doc of nothing but seen spans collapses to empty text") {
    val span = "ten exact words repeated verbatim in every single document here"
    val docs = Seq((1L, span), (2L, span)).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs).orderBy("doc_id")
      .select("doc_id", "text_dedup", "n_spans_kept")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, span, 1L), (2L, "", 0L)))
  }

  test("span near-dup: one-word-varied boilerplate paired, unrelated spans not") {
    // The case exact span dedup cannot catch: the same 10-word banner
    // with the site name substituted. 2-gram jaccard of the two
    // variants = 7/11 ≈ 0.64 ≥ 0.5; unrelated spans share nothing.
    val bannerA = "this website alpha uses cookies to improve your browsing experience"
    val bannerB = "this website beta uses cookies to improve your browsing experience"
    val body = "totally different payload words one two three four five six"
    val docs = Seq(
      (1L, s"$bannerA $body"),
      (2L, s"$bannerB completely other content about seven eight nine ten eleven")
    ).toDF("doc_id", "text")
    val pairs = Dedup.spanNearDupPairs(docs, threshold = 0.5)
      .select("doc_id_a", "span_idx_a", "doc_id_b", "span_idx_b")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 0L, 2L, 0L)) || pairs == Set((2L, 0L, 1L, 0L)),
      s"expected exactly the banner pair, got $pairs")
  }

  test("curate + span scrub composition: survivors' texts span-deduped") {
    import graft.operators.Curate
    // fixture docs pass quality/langid; doc 60 is near-identical to 50
    // so doc-level near-dup keeps only 50; 50 and 70 share a 10-word
    // head span the span scrub must strip from 70.
    val head = "the quick brown fox jumps over the lazy dog and"
    val docs = Seq(
      (50L, s"$head then runs far away into the deep dark forest"),
      (60L, s"$head then runs far away into the deep dark woods"),
      (70L, s"$head later sleeps beside a warm stone wall outside"))
      .toDF("doc_id", "text")
    val out = Curate.corpusSpanDedup(docs, minQuality = 0.0, jaccard = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "text_dedup", "n_spans", "n_spans_kept")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(50L, 70L), s"doc-level dedup wrong: $out")
    assert(out(0)._2.startsWith(head))
    assert(out(1)._2 == "later sleeps beside a warm stone wall outside",
      s"span scrub did not strip the shared head: ${out(1)}")
    assert(out.map(r => (r._3, r._4)) == Seq((2L, 2L), (2L, 1L)))
  }

  test("minhash LSH finds planted near-duplicates, skips unrelated") {
    val nearDup = base.replace("lazy", "sleepy") // one word changed
    val unrelated = "completely different content about spark query engines " +
      "processing large parquet tables with catalyst optimizer rules applied"
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash finds planted near-duplicates, skips unrelated") {
    // SimHash needs enough tokens for stable per-bit votes — use a
    // longer doc (~75 tokens) with a single-word edit.
    val long = (base + " ") * 3
    val nearDup = ((base.replace("lazy", "sleepy")) + " ") * 3
    val unrelated = ("completely different content about spark query engines " +
      "processing large parquet tables with catalyst optimizer rules " +
      "applied during execution ") * 3
    val docs = Seq((1L, long), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashDup(docs, maxHamming = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard: identical docs score 1.0, near-dups high") {
    val docs = Seq((1L, "b", base), (2L, "b", base),
      (3L, "b", base.replace("lazy", "sleepy")))
      .toDF("doc_id", "blk", "text")
    val out = Dedup.ngramJaccardPairs(docs, Seq("blk"), threshold = 0.1)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) > 0.7 && out((1L, 3L)) < 1.0)
  }

  test("duplicate clusters: transitive components, min-id canonical") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L) // chain a-b-c
    assert(out(7L) == 7L && out(9L) == 7L)                   // separate pair
    assert(out.size == 5)
    // distributed label-propagation path (driverThreshold=0) agrees
    val dist = Dedup.clusters(pairs, driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == out)
  }

  test("duplicate clusters: 100-link chain converges distributed (pointer doubling)") {
    // a path graph is the worst case for plain min-label propagation
    // (O(diameter) rounds); with label compression it must finish well
    // inside the default maxIters and agree with driver union-find
    val chain = (0L until 99L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val dist = Dedup.clusters(chain, driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist.size == 100 && dist.values.forall(_ == 0L),
      s"chain must collapse to a single 0-rooted cluster: $dist")
    val driver = Dedup.clusters(chain).as[(Long, Long)].collect().toMap
    assert(dist == driver)
  }

  test("duplicate clusters: ScaleBench stress shape — distributed equals union-find") {
    // The miniature of graft.ScaleBench's CC fixture: cliques (near-dup
    // groups) + a chain (pointer-doubling worst case) + a star hub
    // (skew), all in one edge list. Pins row-level equality between the
    // distributed label-propagation path and driver union-find on the
    // SAME pairs — the contract the harness re-asserts (by checksum) at
    // ~1.8M edges, where the default dispatch actually goes distributed.
    val gs = 4
    val cliq = for { g <- 0L until 20L; i <- 0 until gs; j <- i + 1 until gs }
      yield (g * gs + i, g * gs + j)
    val cBase = 20L * gs
    val chain = (0L until 63L).map(i => (cBase + i, cBase + i + 1))
    val sBase = cBase + 64L
    val star = (1L to 30L).map(i => (sBase, sBase + i))
    val pairs = (cliq ++ chain ++ star).toDF("id_a", "id_b")
    val driver = Dedup.clusters(pairs) // well under the driver threshold
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.clusters(pairs, driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == driver)
    // one component per clique group + the chain + the star, each
    // labeled by its minimum member
    assert(driver.values.toSet.size == 22)
    assert((0L until 20L).forall(g => driver(g * gs + gs - 1) == g * gs))
    assert(driver(cBase + 63L) == cBase && driver(sBase + 30L) == sBase)
  }

  test("embedding cosine pairs: planted duplicate vector found") {
    val v1 = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val v2 = v1.map(x => (x * 1.001f)) // same direction
    val v3 = Array.tabulate(8)(i => math.cos(3 * i + 2).toFloat)
    val embs = Seq((1L, v1, 0), (2L, v2, 0), (3L, v3, 0))
      .toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingCosinePairs(embs, Seq("label"), threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngram jaccard hot-shingle cutoff: pairs preserved, hot buckets dropped") {
    // 1-2 share everything; doc 3 shares only the one "hot" shingle that
    // appears in every doc (df = 4 > cutoff 3) — with the cutoff the hot
    // shingle stops generating candidates, so (1,3)/(2,3)/(3,4) vanish
    // while the genuine near-dup pair (1,2) keeps jaccard 1.0.
    val hot = "click here to"
    val docs = Seq(
      (1L, "b", s"$base $hot"), (2L, "b", s"$base $hot"),
      (3L, "b", s"totally different text body $hot"),
      (4L, "b", s"another unrelated document $hot"))
      .toDF("doc_id", "blk", "text")
    val all = Dedup.ngramJaccardPairs(docs, Seq("blk"), threshold = 0.01)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(all.contains((1L, 2L)) && all.contains((3L, 4L)))
    val cut = Dedup.ngramJaccardPairs(docs, Seq("blk"), threshold = 0.01,
        maxShingleDf = 3L)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    // Sizes keep counting dropped shingles (conservative underestimate,
    // no extra shuffle): identical ~25-shingle docs with 1 hot shingle
    // dropped score 24/26 ≈ 0.92, not 1.0.
    assert(cut((1L, 2L)) >= 0.9, "true near-dup pair must survive the cutoff")
    assert(!cut.contains((3L, 4L)),
      "pair sharing only the hot shingle must be dropped")
  }

  test("incremental dedup: new batch matches indexed corpus, index grows by admitted docs") {
    import graft.operators.IncrementalDedup
    val corpus = Seq((1L, base), (2L, "completely different content about " +
      "spark query engines processing large parquet tables with catalyst " +
      "optimizer rules applied")).toDF("doc_id", "text")
    val idx1 = IncrementalDedup.index(corpus)

    // batch: near-dup of doc 1, and a genuinely new doc
    val batch = Seq((10L, base.replace("lazy", "sleepy")),
      (11L, "entirely novel writing about distributed systems and the " +
        "careful art of exactly once stream processing semantics at scale"))
      .toDF("doc_id", "text")
    val matches = IncrementalDedup.matchAgainst(idx1, batch, threshold = 0.3)
      .select("new_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(matches == Set((10L, 1L)), s"got $matches")

    // only the admitted doc (11) enters the index
    val idx2 = IncrementalDedup.append(idx1, batch,
      IncrementalDedup.matchAgainst(idx1, batch, threshold = 0.3))
    val indexed = idx2.select("doc_id").distinct().as[Long].collect().toSet
    assert(indexed == Set(1L, 2L, 11L))

    // a re-send of the admitted doc now matches the grown index
    val resend = Seq((20L, "entirely novel writing about distributed systems " +
      "and the careful art of exactly once stream processing semantics at scale"))
      .toDF("doc_id", "text")
    val m2 = IncrementalDedup.matchAgainst(idx2, resend, threshold = 0.3)
      .select("new_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(m2 == Set((20L, 11L)))
  }

  test("embed-cosine LSH recall >= 0.9 vs exact pairs on clustered vectors") {
    import graft.functions.Hashing.splitmix64
    def unit(seed: Long, dim: Int): Array[Double] = {
      val v = Array.tabulate(dim)(i =>
        splitmix64(seed * dim + i).toDouble / Long.MaxValue)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val dim = 16
    val rows = for { c <- 0 until 20; m <- 0 until 10 } yield {
      val center = unit(c + 1, dim)
      val noise = unit(1000L + c * 10 + m, dim)
      ((c * 10 + m).toLong,
        center.zip(noise).map { case (a, b) => (a + 0.1 * b).toFloat }, 0)
    }
    val embs = rows.toDF("vec_id", "embedding", "label")
    val exact = Dedup.embeddingCosinePairs(embs, Seq("label"), threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingCosinePairsLsh(embs, Seq("label"),
        threshold = 0.9, dim = dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must contain planted near-dup pairs")
    assert(lsh.subsetOf(exact), "LSH verify must be exact (no false pairs)")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"embed-cosine LSH recall $recall too low")
  }

  test("ANN recall >= 0.8 vs brute force on clustered vectors") {
    // LSH recall is only meaningful when near neighbors actually exist:
    // plant 40 clusters of 15 vectors (deterministic pseudo-noise).
    import graft.functions.Hashing.splitmix64
    def unit(seed: Long, dim: Int): Array[Double] = {
      val v = Array.tabulate(dim)(i =>
        splitmix64(seed * dim + i).toDouble / Long.MaxValue)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val dim = 16
    val rows = for {
      c <- 0 until 40
      m <- 0 until 15
    } yield {
      val center = unit(c + 1, dim)
      val noise = unit(1000L + c * 15 + m, dim)
      val vec = center.zip(noise).map { case (a, b) => (a + 0.15 * b).toFloat }
      ((c * 15 + m).toLong, vec, c)
    }
    val embs = rows.toDF("vec_id", "embedding", "label")
    val q = embs.where(col("vec_id") % 15 === 0) // one query per cluster
    val brute = Similarity.bruteForceTopK(embs, q, k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(embs, q, k = 5, dim = dim)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.8, s"ANN recall $recall too low")
  }

  test("IVF recall >= 0.8 vs brute force on clustered vectors") {
    import graft.functions.Hashing.splitmix64
    def unit(seed: Long, dim: Int): Array[Double] = {
      val v = Array.tabulate(dim)(i =>
        splitmix64(seed * dim + i).toDouble / Long.MaxValue)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val dim = 16
    val rows = for { c <- 0 until 40; m <- 0 until 15 } yield {
      val center = unit(c + 1, dim)
      val noise = unit(1000L + c * 15 + m, dim)
      ((c * 15 + m).toLong,
        center.zip(noise).map { case (a, b) => (a + 0.15 * b).toFloat }, c)
    }
    val embs = rows.toDF("vec_id", "embedding", "label")
    val q = embs.where(col("vec_id") % 15 === 0)
    val brute = graft.operators.Similarity.bruteForceTopK(embs, q, k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val (assigned, centroids) = graft.operators.Ivf.build(embs, nlist = 20, iters = 2)
    val ivf = graft.operators.Ivf.search(assigned, centroids, q, k = 5, nprobe = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall too low")
  }

  test("approx quantile within 5% of exact; approx distinct within 5%") {
    val d = "/root/testdata/sf0.001"
    val li = Tables(spark, d, "lineitem")
    val approxMedian = li.selectExpr(
      "approx_percentile(l_extendedprice, 0.5, 1000) AS m").head().getDouble(0)
    val exactMedian = li.selectExpr(
      "percentile(l_extendedprice, 0.5) AS m").head().getDouble(0)
    assert(math.abs(approxMedian - exactMedian) / exactMedian < 0.05)

    // rsd 0.01 → 1% std dev; default 0.05 can legitimately miss by >5%
    val approxN = li.selectExpr("approx_count_distinct(l_orderkey, 0.01) AS n")
      .head().getLong(0)
    val exactN = li.selectExpr("count(DISTINCT l_orderkey) AS n")
      .head().getLong(0)
    assert(math.abs(approxN - exactN).toDouble / exactN < 0.05)
  }

  test("language ID on real-language fixtures") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was happy"),
      (2L, "der Hund und die Katze sind nicht mit dem Auto"),
      (3L, "le chat est dans la maison et les chiens"),
      (4L, "el perro y los gatos en la casa con un amigo"),
      (5L, "今天天气很好"),
      (6L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      TextFunctions.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en"); assert(out(2L) == "de")
    assert(out(3L) == "fr"); assert(out(4L) == "es")
    assert(out(5L) == "zh"); assert(out(6L) == "und")
  }

  test("quality/langid kernels agree bit-exactly with composed restatements") {
    // The hot-path single-pass kernels (Kernels.textQuality / langId)
    // must match the Column-composed reference trees on every corner the
    // semantics have: Spark trim strips ONLY ' ' (a leading \n or \t
    // survives and yields a "" token from the limit=-1 split), lengths
    // count codepoints not UTF-16 units (astral emoji), \p{Punct} is the
    // ASCII class, CJK overrides, ties break to profile order.
    val edge = Seq(
      "", " ", "   ", "\n", "\t\n ", "a", " a ", "\ta b\n",
      "the the the", "der die und das ist", "le la et les des",
      "el los de y en", "the der le el", // 1 hit each → en wins tie
      "今天天气很好 the and of", "mixed 今 cjk",
      "!!!???...", "a!b?c.d,e", "w" * 200,
      ("the quick brown fox " * 20).trim, "😀 😀 😀 the and of to in is",
      "é è ü ß Ä Ö", "word " + " " + " nbsp", // NBSP is NOT \s
      "ends with spaces   ", "   starts with spaces")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val edgeDf = edge.toDF("doc_id", "text")
    val real = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edgeDf, real)) {
      val diff = df.select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("qk"),
          TextFunctions.qualityScoreComposed(col("text")).as("qc"),
          TextFunctions.langId(col("text")).as("lk"),
          TextFunctions.langIdComposed(col("text")).as("lc"),
          TextFunctions.dupGramFraction(col("text")).as("dk"),
          TextFunctions.dupGramFractionComposed(col("text")).as("dc"))
        // bit-exact: no tolerance on the doubles
        .where(not(col("qk") <=> col("qc")) || not(col("lk") <=> col("lc")) ||
          not(col("dk") <=> col("dc")))
        .limit(5).collect()
      assert(diff.isEmpty, s"kernel/composed mismatch: ${diff.mkString("; ")}")
    }
    // null propagates identically (nullSafeEval vs null-safe Column tree)
    val nullRow = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(TextFunctions.qualityScore(col("text")).as("qk"),
        TextFunctions.langId(col("text")).as("lk")).head()
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1))
  }

  test("curate: opt-in repetition cut drops spam the quality score passes") {
    import graft.operators.Curate
    // High quality score (stopwords, sane length/punct) but massively
    // repetitive — the case the Gopher dup-gram cut exists for.
    val spam = ("the cat sat on the mat and it was happy " * 10).trim
    val clean = base + " while the other animals watched from the trees " +
      "and the sun was setting over the quiet hills in the far distance"
    val docs = Seq((1L, clean), (2L, spam)).toDF("doc_id", "text")
    def ids(maxDupGram: Double): Set[Long] =
      Curate.corpus(docs, minQuality = 0.7, maxDupGram = maxDupGram)
        .select("doc_id").as[Long].collect().toSet
    assert(ids(1.0) == Set(1L, 2L)) // default: repetition not judged
    assert(ids(0.3) == Set(1L)) // cut bites only the spam doc
  }

  test("topFraction: keeps exactly the best-scoring tail, threshold rides the row") {
    import graft.operators.Curate
    import graft.functions.TextFunctions
    // 20 docs with strictly increasing quality (longer stopword-rich
    // text scores higher under the heuristic). frac=0.25: the sketch
    // is exact at this size and anchors the threshold AT the
    // (1-frac)-quantile element (index round(p·(n-1)) = 15th smallest),
    // which the inclusive `>=` keeps — so the kept set is the top
    // n-15+1 = 6, one past frac·n: the documented ties-up convention,
    // bounded by the gate's ±0.05 fraction check at corpus scale.
    val docs = (1 to 20).map { i =>
      (i.toLong, ("the quick brown fox jumps over the lazy dog and " * i).trim + ".")
    }.toDF("doc_id", "text")
    val scores = docs.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = scores.toSeq.sortBy(-_._2).take(6).map(_._1).toSet
    val kept = Curate.topFraction(docs, frac = 0.25).collect()
    assert(kept.map(_.getLong(0)).toSet == expect,
      s"kept ${kept.map(_.getLong(0)).toSet} expected $expect")
    // threshold column is the same value on every kept row, and every
    // kept quality is at or above it
    val thrs = kept.map(_.getDouble(2)).toSet
    assert(thrs.size == 1)
    assert(kept.forall(r => r.getDouble(1) >= r.getDouble(2)))
    // boundaries refused
    intercept[IllegalArgumentException](Curate.topFraction(docs, frac = 0.0))
    intercept[IllegalArgumentException](Curate.topFraction(docs, frac = 1.0))
  }

  test("decontamination: leaked eval doc flagged, partial overlap scored, clean doc zero") {
    import graft.operators.Decontaminate
    val evalSet = Seq((100L, "what is the capital of france paris obviously"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "what is the capital of france paris obviously"), // verbatim leak
      (2L, "quiz question what is the capital of france and other trivia here"),
      (3L, "completely unrelated text about spark engines and parquet files"))
      .toDF("doc_id", "text")
    val out = Decontaminate.flag(corpus, evalSet)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(out(1L)._1 == 1.0 && out(1L)._2)
    assert(out(2L)._1 > 0.0 && out(2L)._1 < 1.0)
    assert(out(3L)._1 == 0.0 && !out(3L)._2)
  }

  test("PII redaction: planted email/url/ip/phone redact, clean text untouched") {
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, "mail bob.smith+x@example.co.uk today"),
      (2L, "see https://a.example.com/p?q=1#frag and http://b.io ok"),
      (3L, "server at 10.0.0.1 responded"),
      (4L, "call +1 (415) 555-0132 or +44 20 7946 0958 now"),
      (5L, "clean prose with no contact details at all"),
      (6L, "v2.1.3 released")) // version strings are NOT IPs (3 groups)
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextFunctions.redactPii(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "mail <EMAIL> today")
    assert(out(2L) == "see <URL> and <URL> ok")
    assert(out(3L) == "server at <IP> responded")
    assert(out(4L).contains("<PHONE>") && !out(4L).exists(_.isDigit))
    assert(out(5L) == "clean prose with no contact details at all")
    assert(out(6L) == "v2.1.3 released")
  }

  test("dup-gram fraction: repetition scores high, unique text zero, short text zero") {
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, base), // long unique prose
      (3L, "too short"), (4L, "")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextFunctions.dupGramFraction(col("text")).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > 0.8, s"all-repeat doc: ${out(1L)}") // 8 grams, 1 distinct
    assert(out(2L) == 0.0 && out(3L) == 0.0 && out(4L) == 0.0)
  }

  test("deterministic sampling: stable under repartition, exact split partition, nested fractions") {
    import graft.operators.Sampling
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang")
    // Stability: membership is a pure function of (id, seed) — layout
    // must not matter (the property DataFrame.sample does NOT have).
    val s1 = Sampling.sample(docs, "doc_id", 0.3, "s").select("doc_id")
      .as[Long].collect().toSet
    val s2 = Sampling.sample(docs.repartition(7), "doc_id", 0.3, "s")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(s1.nonEmpty && s1.size < docs.count())
    // Split: every row exactly one label; train == sample(0.8) (the
    // split partitions the same hash space the prefix predicate reads).
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split = Sampling.split(docs, "doc_id", weights, seed = "s")
    assert(split.count() == docs.count())
    val trainIds = split.where(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(trainIds == Sampling.sample(docs, "doc_id", 0.8, "s")
      .select("doc_id").as[Long].collect().toSet)
    // Nested: raising the fraction only adds rows.
    val small = Sampling.sample(docs, "doc_id", 0.1, "s")
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(s1.union(small)) &&
      small.subsetOf(Sampling.sample(docs, "doc_id", 0.5, "s")
        .select("doc_id").as[Long].collect().toSet))
    // Stratified: kept rows per stratum ⊆ that stratum's plain sample.
    val strat = graft.operators.Sampling.stratifiedSample(docs, "doc_id",
      "lang", Seq("en" -> 0.5), defaultFraction = 0.0, seed = "s")
    val stratEn = strat.select("doc_id").as[Long].collect().toSet
    val plainEn = Sampling.sample(docs.where(col("lang") === "en"),
      "doc_id", 0.5, "s").select("doc_id").as[Long].collect().toSet
    assert(stratEn == plainEn) // default 0.0 drops every other stratum
  }

  test("sequence packing: matches sequential reference, invariant to bucket size") {
    import graft.operators.Pack
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    def packed(bucketSize: Long): Map[Long, (Long, Long)] =
      Pack.sequences(docs, budget = 512L, bucketSize = bucketSize)
        .select("doc_id", "n_tokens", "pack_id")
        .as[(Long, Long, Long)].collect()
        .map { case (id, n, p) => id -> (n, p) }.toMap
    val out = packed(64L)
    // Sequential reference: exclusive prefix sum over doc_id order.
    val seqRef = out.toSeq.sortBy(_._1)
    var cum = 0L
    seqRef.foreach { case (id, (n, p)) =>
      assert(p == cum / 512L, s"doc $id: pack $p != ${cum / 512L}")
      cum += n
    }
    // pack ids are nondecreasing in doc order and start at 0
    assert(seqRef.head._2._2 == 0L)
    // Bucketing is an implementation detail: any bucket size, same packs.
    assert(packed(7L) == out && packed(1000000L) == out)
  }

  test("winnow fingerprint: stable under distant edit, detects overlap") {
    val df = Seq((1L, base), (2L, base + " with a tiny suffix appended"),
      (3L, "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk ll"))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      TextExpressions.winnowFingerprint(col("text")).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    val overlap12 = (fps(1L).toSet & fps(2L).toSet).size.toDouble / fps(1L).size
    val overlap13 = (fps(1L).toSet & fps(3L).toSet).size.toDouble / fps(1L).size
    assert(overlap12 > 0.8, s"prefix-shared docs should share fingerprints: $overlap12")
    assert(overlap13 < 0.1, s"unrelated docs should not: $overlap13")
  }

  test("token counts: whitespace and bpe-ish") {
    val df = Seq((1L, "hello world  foo"), (2L, "a1b2!c"), (3L, "   x   "))
      .toDF("id", "text")
    val out = df.select(col("id"),
      TextFunctions.tokenCount(col("text")).as("ws"),
      TextFunctions.bpeishTokenCount(col("text")).as("bpe"))
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) == (3, 3))
    assert(out(2L) == (1, 6)) // a,1,b,2,!,c
    assert(out(3L) == (1, 1))
  }

  test("quality score in [0,1] and ranks clean text above punctuation soup") {
    val df = Seq((1L, base), (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"))
      .toDF("id", "text")
    val out = df.select(col("id"),
      TextFunctions.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(out.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(1L) > out(2L))
  }

  test("hot-shingle cutoff: boilerplate-only pairs vanish, genuine near-dups survive") {
    // 10 docs sharing ONLY a 5-word boilerplate suffix (3 hot shingles,
    // df=10 each); pairwise jaccard 3/15 = 0.2 ≥ 0.1 → without the
    // cutoff the boilerplate alone manufactures C(10,2)=45 pairs — the
    // df² bucket blow-up in miniature. Distinct prefixes end in an
    // i-specific word so junction shingles never collide.
    val boiler = "subscribe to our newsletter today"
    val noise = (1L to 10L).map(i =>
      (i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i " + boiler))
    // one genuine near-dup pair, no boilerplate, one word changed
    val genuine = Seq((100L, base), (101L, base.replace("lazy", "sleepy")))
    val docs = (noise ++ genuine).toDF("doc_id", "text")

    val unbounded = Dedup.ngramJaccardPairs(docs, blockCols = Nil,
      threshold = 0.1, maxShingleDf = Long.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(unbounded.size == 46 && unbounded.contains((100L, 101L)),
      s"expected 45 boilerplate pairs + the genuine pair, got $unbounded")

    val cut = Dedup.ngramJaccardPairs(docs, blockCols = Nil,
      threshold = 0.1, maxShingleDf = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cut == Set((100L, 101L)),
      s"df>5 shingles must stop generating pairs, got $cut")
  }

  test("ngram pair-gen dispatch: count-verify below 0.5, PPJoin prefix at ≥0.5") {
    // The engine's real callers sit in the dedup regime (t=0.1 declared
    // key, t=0.3 Curate) — pinned to the count-verify path after the
    // round-9 PPJoin-everywhere rewrite measured 3.3× slower there.
    assert(!Dedup.usesPrefixIndex(0.1) && !Dedup.usesPrefixIndex(0.3))
    assert(Dedup.usesPrefixIndex(0.5) && Dedup.usesPrefixIndex(0.8))
  }

  test("ngram pair-gen: count-verify and prefix paths produce identical pairs") {
    // Mixed corpus: exact dup, near-dup, boilerplate-only overlap (hot
    // shingles under the cutoff), unrelated doc — exercises the length,
    // positional, and hot-set machinery of both paths.
    val hot = "subscribe to our newsletter today"
    val docs = (Seq(
      (1L, "b", base), (2L, "b", base),
      (3L, "b", base.replace("lazy", "sleepy") + " " + hot),
      (4L, "b", s"totally different text body entirely $hot"),
      (5L, "b", "unrelated words about distributed query planning engines"),
      (6L, "c", base)) ++ // other block: must never pair across blocks
      (10L to 15L).map(i => (i, "b", s"alpha$i beta$i gamma$i $hot")))
      .toDF("doc_id", "blk", "text")
    for (t <- Seq(0.05, 0.3, 0.5, 0.7);
         cutoff <- Seq(Long.MaxValue, 4L)) {
      def run(f: (org.apache.spark.sql.DataFrame, Seq[String], String,
          String, Int, Double, Long) => org.apache.spark.sql.DataFrame) =
        f(docs, Seq("blk"), "text", "doc_id", 3, t, cutoff)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 9))
          .as[(Long, Long, Double)].collect().toSet
      val cnt = run(Dedup.ngramPairsCountVerify)
      val pre = run(Dedup.ngramPairsPrefix)
      assert(cnt == pre,
        s"paths diverge at t=$t cutoff=$cutoff: count=$cnt prefix=$pre")
    }
  }

  test("ngram pair-gen: paths agree on the real documents fixture at the dispatch boundary") {
    // Synthetic-doc equality above; this pins it on real corpus text
    // (500 sf0.01 docs, planted near-dups) at the t where dispatch
    // flips — the threshold a caller is most likely to sit near.
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    def run(f: (org.apache.spark.sql.DataFrame, Seq[String], String,
        String, Int, Double, Long) => org.apache.spark.sql.DataFrame) =
      f(docs, Seq("lang"), "text", "doc_id", 3, 0.5,
        Dedup.DefaultMaxShingleDf)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 9))
        .as[(Long, Long, Double)].collect().toSet
    val cnt = run(Dedup.ngramPairsCountVerify)
    val pre = run(Dedup.ngramPairsPrefix)
    assert(cnt == pre && cnt.nonEmpty,
      s"fixture paths diverge at t=0.5: count=${cnt.size} prefix=${pre.size}")
  }

  test("embeddingCosinePairs rejects a block larger than maxBlockRows") {
    val embs = (1L to 8L).map(i =>
      (i, "same", Array.tabulate(4)(j => 0.1f * (i + j))))
      .toDF("vec_id", "label", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Dedup.embeddingCosinePairs(embs, blockCols = Seq("label"),
        maxBlockRows = 4)
    }
    assert(ex.getMessage.contains("embeddingCosinePairsLsh"))
    // bounded blocks pass through the guard
    assert(Dedup.embeddingCosinePairs(embs, blockCols = Seq("label"),
      maxBlockRows = 100).count() >= 0)
  }

  test("PQ: codes are m small ints; recall >= 0.8 on clustered vectors; " +
      "persisted == fresh") {
    import graft.functions.Hashing.splitmix64
    import graft.operators.Pq
    def unit(seed: Long, dim: Int): Array[Double] = {
      val v = Array.tabulate(dim)(i =>
        splitmix64(seed * dim + i).toDouble / Long.MaxValue)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val dim = 16
    val rows = for { c <- 0 until 40; m <- 0 until 15 } yield {
      val center = unit(c + 1, dim)
      val noise = unit(1000L + c * 15 + m, dim)
      ((c * 15 + m).toLong,
        center.zip(noise).map { case (a, b) => (a + 0.15 * b).toFloat }, c)
    }
    val embs = rows.toDF("vec_id", "embedding", "label")
    val q = embs.where(col("vec_id") % 15 === 0)
    val model = Pq.train(embs, m = 4, k = 16, iters = 8)
    val codes = Pq.encode(embs, model)
    // the memory contract: m codes per row, every code in [0, k)
    val bad = codes.where(size(col("__codes")) =!= 4 ||
      exists(col("__codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
    val brute = graft.operators.Similarity.bruteForceTopK(embs, q, k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val pq = Pq.search(codes, model, embs, q, k = 5, rerank = 30)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.8, s"PQ recall $recall too low")
    // build-once/serve-many: persisted index reproduces fresh results
    val root = java.nio.file.Files.createTempDirectory("pq-idx").toString
    Pq.persist(spark, root, codes, model)
    val (pcodes, pmodel) = Pq.load(spark, root)
      .getOrElse(fail("persisted PQ index did not load"))
    val served = Pq.search(pcodes, pmodel, embs, q, k = 5, rerank = 30)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(served == pq && pq.nonEmpty)
  }

  test("curate report: monotone funnel, final stage == corpus survivors") {
    import graft.operators.Curate
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val rep = Curate.report(docs)
      .select("stage_idx", "stage", "n_docs")
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(rep.map(_._2).toSeq ==
      Seq("raw", "lang_quality", "exact_unique", "near_dup_reps"))
    val ns = rep.map(_._3)
    assert(ns(0) == docs.count())
    assert(ns(1) <= ns(0) && ns(2) <= ns(1) && ns(3) <= ns(2))
    assert(ns(3) == Curate.corpus(docs).count(),
      "report's final stage must count exactly corpus()'s survivors")
  }

  test("serve cache: LRU eviction deletes the root, re-request rebuilds") {
    import graft.operators.ServeCache
    val cache = new ServeCache(2, "graft_servecache_spec")
    var builds = 0
    def build(key: String): String = cache.getOrBuild(key) { r =>
      builds += 1
      java.nio.file.Files.write(
        java.nio.file.Paths.get(r, "index.marker"),
        key.getBytes("UTF-8"))
      ()
    }
    // three corpus snapshots through a capacity-2 cache
    val r1 = build("snap1"); val r2 = build("snap2")
    assert(builds == 2 && build("snap1") == r1 && builds == 2,
      "second request must serve the cached root without rebuilding")
    // snap1 was just touched, so inserting snap3 evicts snap2 (LRU)
    val r3 = build("snap3")
    assert(builds == 3 && cache.size == 2)
    assert(cache.peek("snap2").isEmpty &&
      !java.nio.file.Files.exists(java.nio.file.Paths.get(r2)),
      "evicted root must be deleted from disk")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(r1, "index.marker")) &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(r3, "index.marker")),
      "survivors keep their roots")
    // re-requesting the evicted snapshot rebuilds into a FRESH root
    val r2b = build("snap2")
    assert(builds == 4 && r2b != r2 &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(r2b, "index.marker")))
    // a throwing build caches nothing and leaves no root behind
    val before = cache.size
    intercept[RuntimeException] {
      cache.getOrBuild("bad") { _ => throw new RuntimeException("boom") }
    }
    assert(cache.size == before && cache.peek("bad").isEmpty)
  }

  test("url curation: blocklist semantics, per-domain cap, draw invariance") {
    import graft.operators.UrlCurate
    // a.example.com + b.example.com (domain example.com), www.other.org,
    // plus a parse failure; blocklist: the DOMAIN example.com (blocks
    // both subdomain hosts) and the HOST www.keep.net (its sibling
    // cdn.keep.net survives)
    val docs = (1L to 40L).map { i =>
      val url =
        if (i <= 5) s"https://a.example.com/p/$i"
        else if (i <= 10) s"https://b.example.com/p/$i"
        else if (i <= 12) s"https://www.keep.net/p/$i"
        else if (i <= 14) s"https://cdn.keep.net/p/$i"
        else if (i == 15) "not a url at all"
        else s"https://bulk.big.io/p/$i" // 25 docs on one domain
      (i, url)
    }.toDF("doc_id", "url")
    val kept = UrlCurate.filter(docs, "url", "doc_id",
      blocklist = Seq("example.com", "www.keep.net"), perDomainCap = 10)
      .select("doc_id", "host", "domain")
      .as[(Long, String, String)].collect()
    val byDomain = kept.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert(!byDomain.contains("example.com"),
      s"domain-level entry must block every subdomain host: $byDomain")
    assert(byDomain("keep.net") == Set(13L, 14L),
      s"host-level entry blocks only that host: $byDomain")
    assert(byDomain("big.io").size == 10,
      s"per-domain cap must bite on the hot domain: ${byDomain("big.io").size}")
    assert(!kept.exists(_._1 == 15L), "unparseable url must drop")
    // the kept SET is a pure function of (ids, seed) — partitioning-blind
    val kept2 = UrlCurate.filter(docs.repartition(7), "url", "doc_id",
      blocklist = Seq("example.com", "www.keep.net"), perDomainCap = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == kept.map(_._1).toSet)
  }

  test("url rank-weighted cap: hubs keep more, periphery floors at 1") {
    import graft.operators.UrlCurate
    // star graph: every page links to hub.com; hub pages link to
    // spoke1.net. 30 docs: 10 on hub.com, 10 each on spoke1/spoke2.
    val docs = (1L to 30L).map { i =>
      val (dom, out) =
        if (i <= 10) ("hub.com", "spoke1.net")
        else if (i <= 20) ("spoke1.net", "hub.com")
        else ("spoke2.net", "hub.com")
      (i, s"https://www.$dom/p/$i", s"https://www.$out/ref")
    }.toDF("doc_id", "url", "out_url")
    val kept = UrlCurate.rankWeightedCap(docs, "url", "out_url", "doc_id",
      baseCap = 4, maxCap = 8, iters = 5)
      .select("doc_id", "domain", "cap")
      .as[(Long, String, Long)].collect()
    val capBy = kept.groupBy(_._2).view
      .mapValues(rs => (rs.head._3, rs.size)).toMap
    // hub.com gets 2/3 of in-links -> pr far above 1/n -> cap > baseCap
    assert(capBy("hub.com")._1 > 4L, s"hub must out-cap baseCap: $capBy")
    // spoke2 has NO in-links (teleport-only pr) -> floors at 1
    assert(capBy("spoke2.net") == ((1L, 1)), s"periphery floors: $capBy")
    // keeps never exceed the domain's cap
    assert(kept.groupBy(_._2).forall { case (d, rs) =>
      rs.size <= capBy(d)._1 }, s"cap must bound keeps: $capBy")
    // partitioning-blind kept set (same draw + same graph)
    val kept2 = UrlCurate.rankWeightedCap(docs.repartition(7), "url",
      "out_url", "doc_id", baseCap = 4, maxCap = 8, iters = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == kept.map(_._1).toSet)
  }

  test("IVF persisted index: search-from-persisted == search-from-fresh") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val (assigned, centroids) = Ivf.build(e, nlist = 8, iters = 2)
    val root = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    Ivf.persist(spark, root, assigned, centroids)
    val (pa, pc) = Ivf.load(spark, root)
      .getOrElse(fail("persisted index did not load"))
    val q = e.where(col("vec_id") < 5)
    val fresh = Ivf.search(assigned, centroids, q, k = 3, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val persisted = Ivf.search(pa, pc, q, k = 3, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(persisted == fresh && fresh.nonEmpty,
      "search over the persisted index must equal search over the fresh build")
  }

  test("semanticPairs: planted duplicates recovered, no spurious pairs") {
    import graft.operators.Dedup
    // three well-separated directions + exact duplicates of two of them
    def v(x: Double, y: Double, z: Double) = Array(x.toFloat, y.toFloat, z.toFloat)
    val embs = Seq(
      (1L, v(1, 0, 0)), (2L, v(0, 1, 0)), (3L, v(0, 0, 1)),
      (4L, v(0.99, 0.1, 0)),              // near-dup of 1 (cos ~0.995)
      (101L, v(1, 0, 0)), (102L, v(0, 1, 0))) // exact dups of 1 and 2
      .toDF("vec_id", "embedding")
    val pairs = Dedup.semanticPairs(embs, nClusters = 3, iters = 2,
      threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // identical vectors share a centroid argmax structurally; the
    // near-dup lands with its original for any sane clustering of
    // three orthogonal directions
    assert(pairs.contains((1L, 101L)) && pairs.contains((2L, 102L)),
      s"planted duplicates not recovered: $pairs")
    assert(pairs.contains((1L, 4L)), s"near-dup of 1 missing: $pairs")
    // precision 1: nothing across the orthogonal directions
    val exact = Set((1L, 4L), (1L, 101L), (2L, 102L), (4L, 101L))
    assert(pairs.subsetOf(exact), s"spurious pairs: ${pairs -- exact}")

    // representative policy: each component keeps its min id only
    val kept = Dedup.semanticDedup(embs, nClusters = 3, iters = 2,
      threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L), s"got $kept")
  }

  test("decontaminate: empty, tiny, and exact-leak docs") {
    import graft.operators.Decontaminate
    val docs = Seq(
      (1L, ""),                                     // zero shingles
      (2L, "two words"),                            // whole-text shingle
      (3L, "the quick brown fox jumps over fences"), // partial overlap
      (4L, "completely unrelated content here now")).toDF("doc_id", "text")
    val eval = Seq((9L, "two words"),
      (10L, "the quick brown fox sits")).toDF("doc_id", "text")
    val out = Decontaminate.flag(docs, eval).orderBy("doc_id")
      .select("doc_id", "n_hits", "contamination", "contaminated")
      .as[(Long, Long, Double, Boolean)].collect()
    // empty doc: no shingles -> defined 0.0, never NULL, never flagged
    assert(out(0) == ((1L, 0L, 0.0, false)), s"got ${out(0)}")
    // tiny doc identical to an eval doc: its single whole-text shingle
    // hits -> contamination 1.0
    assert(out(1) == ((2L, 1L, 1.0, true)), s"got ${out(1)}")
    // 3-gram overlap: eval doc 10 contributes 'the quick brown' and
    // 'quick brown fox' among doc 3's 5 shingles -> 2/5
    assert(out(2) == ((3L, 2L, 0.4, false)), s"got ${out(2)}")
    assert(out(3) == ((4L, 0L, 0.0, false)), s"got ${out(3)}")
  }
}
