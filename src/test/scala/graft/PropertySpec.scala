package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{DedupLatest, Upsert, Watermark}
import graft.operators.Skew

/** Property-based invariants (SURVEY §5): upsert idempotency and
  * key-uniqueness, dedup invariant, watermark split completeness,
  * salted-join equivalence — over generated datasets.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, String, Int)]] =
    Gen.listOfN(30, for {
      id <- Gen.chooseNum(0L, 9L)
      attr <- Gen.alphaStr.map(_.take(4))
      track <- Gen.chooseNum(0, 99)
    } yield (id, attr, track))

  /** Deterministic property driver: 10 samples per generator from
    * fixed seeds (no scalatestplus bridge in the offline dep cache). */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (1 to 10).foreach { i =>
      f(g.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 10).foreach { i =>
      f(g1.apply(Gen.Parameters.default, Seed(i.toLong)).get,
        g2.apply(Gen.Parameters.default, Seed(1000L + i)).get)
    }
  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  test("upsert: result keys = dest ∪ incoming; incoming rows win") {
    forAll(rowsGen, rowsGen) { (destRows, incRows) =>
      whenever(destRows.nonEmpty || incRows.nonEmpty) {
        val dest = DedupLatest(destRows.toDF("id", "attr", "track"),
          Seq("id"), "track", Seq("attr"))
        val inc = incRows.toDF("id", "attr", "track")
        val out = Upsert(dest, inc, Seq("id"))
        val outKeys = out.select("id").as[Long].collect().toSet
        val expected = dest.select("id").as[Long].collect().toSet ++
          incRows.map(_._1)
        assert(outKeys == expected)
        // rows for incoming keys come only from incoming
        val incKeys = incRows.map(_._1).toSet
        val fromInc = out.where(col("id").isInCollection(
          if (incKeys.isEmpty) Set(-1L) else incKeys))
        assert(fromInc.count() == incRows.size)
      }
    }
  }

  test("dedup-latest: exactly one row per key, track = max(track)") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("id", "attr", "track")
        val out = DedupLatest(df, Seq("id"), "track", Seq("attr"))
        assert(out.groupBy("id").count().where(col("count") > 1).isEmpty)
        val maxes = rows.groupBy(_._1).map { case (k, g) =>
          k -> g.map(_._3).max }
        val got = out.select("id", "track").as[(Long, Int)].collect().toMap
        assert(got == maxes)
      }
    }
  }

  test("watermark split: strict-after + ties-at + before == everything") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("id", "attr", "track")
        val wm = rows.map(_._3).min + (rows.map(_._3).max - rows.map(_._3).min) / 2
        val after = Watermark.strictAfter(df, "track", wm).count()
        val from = Watermark.inclusiveFrom(df, "track", wm).count()
        val ties = rows.count(_._3 == wm)
        assert(from - after == ties) // >= re-reads exactly the boundary
        assert(after + rows.count(_._3 <= wm) == rows.size)
      }
    }
  }

  test("salted join ≡ plain join") {
    forAll(rowsGen, rowsGen) { (probeRows, buildRows) =>
      val probe = probeRows.toDF("id", "attr", "track")
      val build = DedupLatest(buildRows.toDF("id", "attr", "track"),
          Seq("id"), "track", Seq("attr"))
        .select(col("id"), col("attr").as("battr"))
      val plain = probe.join(build, Seq("id"), "left")
      val salted = Skew.saltedLeftJoin(probe, build, "id", saltFactor = 4)
      assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    }
  }

  private val docsGen: Gen[List[(Long, String)]] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "shared",
      "quick", "brown", "fox", "lazy", "dog")
    Gen.listOfN(12, Gen.listOfN(8, word).map(_.mkString(" ")))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  }

  test("ngram-jaccard: a cutoff no shingle reaches ≡ unbounded; any cutoff only removes pairs") {
    import graft.operators.Dedup
    forAll(docsGen) { rows =>
      val docs = rows.toDF("doc_id", "text")
      def pairs(cutoff: Long) =
        Dedup.ngramJaccardPairs(docs, blockCols = Nil, threshold = 0.1,
          maxShingleDf = cutoff)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val unbounded = pairs(Long.MaxValue)
      // df can never exceed the doc count, so cutoff = |docs| is inert
      assert(pairs(rows.size.toLong) == unbounded)
      // a biting cutoff is monotone: it can only drop pairs, never
      // invent them (shared counts shrink, sizes stay)
      assert(pairs(3L).subsetOf(unbounded))
    }
  }

  test("quality/langid kernels ≡ composed trees on arbitrary unicode text") {
    import graft.functions.TextFunctions
    // Adversarial char mix: ASCII words, function words from every
    // profile, all \s classes, NBSP (NOT \s), ASCII + unicode punct,
    // CJK (zh override), astral emoji (UTF-16 surrogate pairs — length
    // must count codepoints), combining accents, stray spaces.
    val atom: Gen[String] = Gen.frequency(
      6 -> Gen.oneOf("the", "and", "of", "der", "die", "und", "le", "la",
        "el", "los", "que", "fox", "word", "a1b2", "W" * 80),
      3 -> Gen.oneOf(" ", "  ", "\t", "\n", "\r", "\f", "", " "),
      2 -> Gen.oneOf("!", "?!", "...", ",", ";", "~", "\"", "«»", "—"),
      1 -> Gen.oneOf("今天", "天气", "好"),
      1 -> Gen.oneOf("😀", "🚀🔥", "é", "ü", "ß", "ñ", "İ"))
    val textGen: Gen[List[(Long, String)]] =
      Gen.listOfN(25, Gen.listOfN(12, atom).map(_.mkString("")))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    forAll(textGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val diff = df.select(
          TextFunctions.qualityScore(col("text")).as("qk"),
          TextFunctions.qualityScoreComposed(col("text")).as("qc"),
          TextFunctions.langId(col("text")).as("lk"),
          TextFunctions.langIdComposed(col("text")).as("lc"),
          TextFunctions.dupGramFraction(col("text")).as("dk"),
          TextFunctions.dupGramFractionComposed(col("text")).as("dc"),
          col("text"))
        .where(not(col("qk") <=> col("qc")) || not(col("lk") <=> col("lc")) ||
          not(col("dk") <=> col("dc")))
        .limit(3).collect()
      assert(diff.isEmpty, s"kernel/composed drift: ${diff.mkString("; ")}")
    }
  }

  test("deterministic sampling: splits partition the id space; fractions nest") {
    import graft.operators.Sampling
    val idsGen: Gen[List[Long]] =
      Gen.listOfN(200, Gen.chooseNum(0L, 1000000L)).map(_.distinct)
    val weightsGen: Gen[List[Double]] =
      Gen.listOfN(3, Gen.chooseNum(1, 10)).map { raw =>
        val s = raw.sum.toDouble
        // make the weights sum to exactly 1.0 (last takes the remainder)
        val head = raw.init.map(_ / s)
        head :+ (1.0 - head.sum)
      }
    forAll(idsGen, weightsGen) { (ids, ws) =>
      whenever(ids.nonEmpty) {
        val df = ids.toDF("id")
        val weights = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
        val split = Sampling.split(df, "id", weights, seed = "p")
        val byLabel = split.groupBy("split").count()
          .as[(String, Long)].collect().toMap
        // exactly one label per row, only declared labels
        assert(byLabel.values.sum == ids.size)
        assert(byLabel.keySet.subsetOf(weights.map(_._1).toSet))
        // nesting: a smaller fraction's sample is inside a larger one's
        val lo = Sampling.sample(df, "id", 0.2, "p").as[Long].collect().toSet
        val hi = Sampling.sample(df, "id", 0.7, "p").as[Long].collect().toSet
        assert(lo.subsetOf(hi))
      }
    }
  }

  test("mixture sampling: binding domain kept whole, shares hit target, never up-samples") {
    import graft.operators.Sampling
    // skewed corpus: a=600, b=100, c=50; target 0.5/0.2/0.3 → c binds
    // (50/0.3 ≈ 167), so T ≈ 167: keep all of c, ~83 of a, ~33 of b
    val rows = (1L to 600L).map(i => (i, "a")) ++
      (1001L to 1100L).map(i => (i, "b")) ++
      (2001L to 2050L).map(i => (i, "c")) ++
      (3001L to 3100L).map(i => (i, "x")) // outside the target: dropped
    val df = rows.toDF("id", "dom")
    val out = Sampling.mixture(df, "id", "dom",
      Seq("a" -> 0.5, "b" -> 0.2, "c" -> 0.3), seed = "m")
      .as[(Long, String)].collect()
    val byDom = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom.getOrElse("x", 0) == 0, "non-target domain must drop")
    assert(byDom("c") == 50, "binding domain must be kept whole")
    assert(byDom("a") <= 600 && byDom("b") <= 100, "never up-sample")
    // realized shares concentrate near the target (md5 draw is
    // uniform; 3-sigma-ish slack for the ~83/33 expected counts)
    val total = out.length.toDouble
    assert(math.abs(byDom("a") / total - 0.5) < 0.12, s"a share ${byDom("a") / total}")
    assert(math.abs(byDom("b") / total - 0.2) < 0.10, s"b share ${byDom("b") / total}")
    // a target domain absent from the corpus fails fast
    intercept[IllegalArgumentException] {
      Sampling.mixture(df, "id", "dom", Seq("a" -> 0.5, "zz" -> 0.5))
    }
  }

  test("temperature mixture: tau=1 keeps everything, tau<1 flattens toward uniform") {
    import graft.operators.Sampling
    // skewed corpus: a=800, b=200, c=50
    val rows = (1L to 800L).map(i => (i, "a")) ++
      (1001L to 1200L).map(i => (i, "b")) ++
      (2001L to 2050L).map(i => (i, "c"))
    val df = rows.toDF("id", "dom")
    // tau=1: shares == realized distribution → every fraction is 1,
    // nothing drops (exponentiated sampling degenerates to identity)
    val all = Sampling.mixtureTemperature(df, "id", "dom", tau = 1.0)
      .count()
    assert(all == rows.size, s"tau=1 must keep the whole corpus: $all")
    // tau=0.5: sqrt-flattened shares — the smallest domain binds and
    // keeps everything; the big domains down-sample, and the realized
    // ratio a:c contracts from 16:1 toward sqrt(16):1 = 4:1
    val out = Sampling.mixtureTemperature(df, "id", "dom", tau = 0.5,
        seed = "t")
      .as[(Long, String)].collect()
    val byDom = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom("c") == 50, "binding (smallest) domain kept whole")
    assert(byDom("a") < 800, "dominant domain must down-sample")
    val ratio = byDom("a").toDouble / byDom("c")
    assert(ratio > 2.5 && ratio < 5.5,
      s"a:c should contract toward sqrt(800/50) ≈ 4: got $ratio")
    // the kept SET is partitioning-invariant (pure md5 draw)
    val out2 = Sampling.mixtureTemperature(df.repartition(7), "id", "dom",
        tau = 0.5, seed = "t")
      .as[(Long, String)].collect()
    assert(out2.toSet == out.toSet)
  }

  test("epoch plan: budget conservation, cap semantics, exact integer arithmetic") {
    import graft.operators.Sampling
    // skewed weights: a=800, b=200, c=50 tokens (one row per token unit
    // would be wasteful — carry the weight as a column instead)
    val df = Seq(("a", 800L), ("b", 200L), ("c", 50L), ("z", 0L))
      .toDF("dom", "w")
    def planOf(budget: Long, maxMilli: Long) =
      Sampling.epochPlan(df, "dom", col("w"), budget,
          tau = 0.5, maxEpochsMilli = maxMilli)
        .as[(String, Long, Long, Long, Long, Long, Boolean)]
        .collect().sortBy(_._1)
    // mirror of the arithmetic, independently in BigInt
    val w = Map("a" -> 800L, "b" -> 200L, "c" -> 50L)
    val q = w.toSeq.sortBy(_._1).map { case (d, v) =>
      d -> math.floor(math.sqrt(v.toDouble / 1050L) * 1e9).toLong
    }
    val qsum = q.map(_._2).sum
    for ((budget, maxMilli) <- Seq((500L, 2000L), (5000L, 2000L),
        (1000000L, 2500L))) {
      val plan = planOf(budget, maxMilli)
      assert(plan.map(_._1).toSeq == Seq("a", "b", "c"),
        "zero-weight domain must drop; rows sorted by domain")
      plan.foreach { case (d, wt, sq, target, fin, epochs, capped) =>
        assert(wt == w(d))
        assert(sq == q.toMap.apply(d))
        val expTarget = (BigInt(budget) * sq / qsum).toLong
        assert(target == expTarget, s"$d target")
        val cap = (BigInt(wt) * maxMilli / 1000L).toLong
        assert(capped == (target > cap), s"$d capped flag")
        assert(fin == math.min(target, cap), s"$d final")
        assert(epochs == (BigInt(fin) * 1000L / wt).toLong, s"$d epochs")
        assert(epochs <= maxMilli, s"$d epoch cap respected")
      }
      assert(plan.map(_._5).sum <= budget,
        "final tokens never exceed the budget")
    }
    // a budget far beyond maxEpochs * corpus caps EVERY domain
    assert(planOf(1000000L, 2500L).forall(_._7),
      "huge budget must cap all domains")
    // a tiny budget caps none
    assert(planOf(500L, 2000L).forall(!_._7),
      "small budget must cap none")
  }

  test("budget draw: matches window truth, first-fit, partitioning-invariant") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    // 3 domains: a hot (60 docs), b small (8), c tiny (2); weights vary
    val rows = (1L to 60L).map(i => (i, "a", 10L + i % 7)) ++
      (101L to 108L).map(i => (i, "b", 25L)) ++
      (201L to 202L).map(i => (i, "c", 40L))
    val df = rows.toDF("id", "dom", "w")
    val quotas = Seq("a" -> 200L, "b" -> 60L, "c" -> 10L, "zz" -> 50L)
    val got = Sampling.budgetDraw(df, "id", "dom", col("w"), quotas,
        seed = "bd")
      .as[(Long, String, Long)].collect().toSet
    // truth: the per-domain window the operator must reproduce
    val wTruth = Window.partitionBy("dom")
      .orderBy(Sampling.hashDrawFull(col("id"), "bd").desc, col("id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("pre", sum(col("w")).over(wTruth) - col("w"))
      .join(quotas.toDF("dom", "q"), Seq("dom"))
      .where(col("pre") < col("q"))
      .select(col("id"), col("dom"), col("w"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == expect, "two-pass prefix sum must equal the window truth")
    // first-fit: c's quota (10) < any c doc (40 tokens) → exactly one ships
    assert(got.count(_._2 == "c") == 1, "first doc of a non-zero quota ships")
    // quota accounting: kept-minus-first stays under quota per domain
    for ((dq, cap) <- Seq("a" -> 200L, "b" -> 60L)) {
      val kept = got.filter(_._2 == dq).map(_._3).sum
      val maxDoc = rows.filter(_._2 == dq).map(_._3).max
      assert(kept < cap + maxDoc, s"$dq overshoot bounded by one doc")
    }
    // unlisted domain in quotas ships nothing (no 'zz' rows exist;
    // and no doc of an absent domain appears)
    assert(got.map(_._2).subsetOf(Set("a", "b", "c")))
    // partitioning-invariance of the SET
    val got2 = Sampling.budgetDraw(df.repartition(7), "id", "dom",
        col("w"), quotas, seed = "bd")
      .as[(Long, String, Long)].collect().toSet
    assert(got2 == got)
    // zero quota ships nothing
    val none = Sampling.budgetDraw(df, "id", "dom", col("w"),
        Seq("c" -> 0L), seed = "bd").count()
    assert(none == 0L)
  }

  test("mixture shards: window truth, per-shard mixture ±1, partitioning-invariant") {
    import graft.operators.{Layout, Sampling}
    import org.apache.spark.sql.expressions.Window
    // hot domain (60), small (8), tiny (3), plus a NULL-domain row
    val rows = (1L to 60L).map(i => (i, Option("a"))) ++
      (101L to 108L).map(i => (i, Option("b"))) ++
      (201L to 203L).map(i => (i, Option("c"))) :+ (900L, Option.empty[String])
    val df = rows.toDF("id", "dom")
    val n = 4
    val got = Layout.mixtureShards(df, "id", "dom", n, seed = "ms")
      .as[(Long, String, Long)].collect().toSet
    // truth: per-domain row_number in draw order, dealt mod n
    val w = Window.partitionBy("dom")
      .orderBy(Sampling.hashDrawFull(col("id"), "ms").desc, col("id").desc)
    val expect = df.where(col("dom").isNotNull)
      .withColumn("shard", (row_number().over(w) - 1) % n)
      .select(col("id"), col("dom"), col("shard").cast("long"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == expect, "two-pass rank must equal the window truth")
    // NULL domain dropped
    assert(!got.exists(_._1 == 900L))
    // mixture: within each domain, per-shard counts differ by ≤ 1
    for (d <- Seq("a", "b", "c")) {
      val perShard = (0 until n).map(s =>
        got.count(t => t._2 == d && t._3 == s))
      assert(perShard.max - perShard.min <= 1,
        s"domain $d uneven across shards: $perShard")
    }
    // partitioning-invariance of the assignment
    val got2 = Layout.mixtureShards(df.repartition(7), "id", "dom", n,
        seed = "ms").as[(Long, String, Long)].collect().toSet
    assert(got2 == got)
    // nShards = 1 puts everything in shard 0
    assert(Layout.mixtureShards(df, "id", "dom", 1, seed = "ms")
      .where(col("shard") =!= 0L).count() == 0L)
  }

  test("leakage-safe split: clusters move as a unit, singletons = plain split") {
    import graft.operators.Sampling
    // clusters: {1,2,3} canon 1, {10,11} canon 10; 20..29 singletons
    val docs = ((1L to 3L) ++ (10L to 11L) ++ (20L to 29L)).toDF("id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L)).toDF("doc_id", "cluster_id")
    val weights = Seq("train" -> 0.7, "eval" -> 0.3)
    val out = Sampling.leakageSafeSplit(docs, clusters, "id", weights,
        seed = "lk")
      .as[(Long, Long, String)].collect()
    // every cluster lands on ONE side, drawn by its canon's id
    for ((canon, members) <- Seq(1L -> Seq(1L, 2L, 3L),
        10L -> Seq(10L, 11L))) {
      val labels = out.filter(r => members.contains(r._1))
      assert(labels.forall(_._2 == canon), "unit_id must be the canon")
      assert(labels.map(_._3).distinct.length == 1,
        s"cluster $canon straddles the split")
    }
    // singletons draw with their own id — identical to the plain split
    val plain = Sampling.split(docs.where(col("id") >= 20L), "id",
        weights, seed = "lk")
      .as[(Long, String)].collect().toMap
    out.filter(_._1 >= 20L).foreach { r =>
      assert(r._2 == r._1 && r._3 == plain(r._1),
        "singleton must match per-doc split")
    }
    // both labels actually occur over the singleton range (seed sanity)
    assert(out.filter(_._1 >= 20L).map(_._3).distinct.length == 2)
  }

  test("threshold sweep: cumulative counts match per-doc buckets, NULL text drops") {
    import graft.operators.Curate
    import graft.functions.TextFunctions
    val texts = Seq(
      1L -> "the cat sat on the mat and it was a fine day for all of us",
      2L -> "x$%^ &*() !!! ??? ###",
      3L -> ("the quick brown fox jumps over the lazy dog and keeps " +
        "running through the field with a steady pace for a while"),
      4L -> null,
      5L -> "short")
    val df = texts.toDF("doc_id", "text")
    val got = Curate.thresholdSweep(df)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // independent expectation: per-doc (bucket, ntok) via the same
    // public functions, cumulated in Scala
    val perDoc = df.where(col("text").isNotNull)
      .select(
        least(floor(TextFunctions.qualityScore(col("text")) * 20), lit(20))
          .cast("int"),
        TextFunctions.tokenCount(col("text")).cast("long"))
      .as[(Int, Long)].collect()
    val expect = (0 to 20).map { i =>
      val kept = perDoc.filter(_._1 >= i)
      (i, kept.length.toLong, kept.map(_._2).sum)
    }.filter(_._2 > 0)
    assert(got.toSeq == expect,
      s"sweep mismatch: got ${got.toSeq} expect $expect")
    // structure: thr 0 covers every non-null doc; counts non-increasing
    assert(got.head._1 == 0 && got.head._2 == 4)
    assert(got.sliding(2).forall(p => p.length < 2 ||
      (p(0)._2 >= p(1)._2 && p(0)._3 >= p(1)._3)),
      "kept counts must be non-increasing in the threshold")
  }

  test("text chunks: layout arithmetic, overlap, boundary cases") {
    import graft.operators.TextChunk
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(10)),   // n < chunk -> 1 chunk of 10
      (2L, words(64)),   // n == chunk -> exactly 1 chunk
      (3L, words(65)),   // one token over -> 2 chunks (2nd from 48)
      (4L, words(160)),  // 1 + ceil(96/48) = 3 chunks
      (5L, "   "),       // zero tokens -> zero chunks
      (6L, "a  b\tc"))   // whitespace runs collapse -> 3 tokens
      .toDF("doc_id", "text")
    val got = TextChunk.chunks(docs, chunkTokens = 64, overlapTokens = 16)
      .select("doc_id", "chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(!got.contains(5L), "empty doc must yield zero chunks")
    assert(got(1L).map(t => (t._2, t._3)) == Seq((0, 10L)))
    assert(got(2L).map(t => (t._2, t._3)) == Seq((0, 64L)))
    assert(got(3L).map(t => (t._2, t._3)) == Seq((0, 64L), (1, 17L)),
      s"65 tokens: second chunk covers 48..64 (17 tokens): ${got(3L)}")
    assert(got(3L)(1)._4.split(" ").head == "w49",
      "second chunk must start at token 49 (stride 48, 1-based)")
    assert(got(4L).map(_._3) == Seq(64L, 64L, 64L),
      s"160 tokens: chunks at 0/48/96 all full: ${got(4L)}")
    // overlap: last 16 tokens of chunk 0 == first 16 of chunk 1
    val c0 = got(4L)(0)._4.split(" ")
    val c1 = got(4L)(1)._4.split(" ")
    assert(c0.takeRight(16).toSeq == c1.take(16).toSeq)
    assert(got(6L).map(t => (t._2, t._3)) == Seq((0, 3L)) &&
      got(6L)(0)._4 == "a b c", "whitespace-normalized reconstruction")
    intercept[IllegalArgumentException] {
      TextChunk.chunks(docs, chunkTokens = 10, overlapTokens = 10)
    }
  }

  test("pack: string order column — exact global prefix sum, >1 bucket, no corpus-wide global window") {
    import graft.operators.Pack
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // String keys whose lexicographic order is the intended total order;
    // scrambled physical layout so nothing accidentally arrives sorted.
    val rows = (0 until 200).map(i => (f"doc_$i%04d", ("w " * (i % 7 + 1)).trim))
    val df = rows.toDF("doc_id", "text").repartition(4)
    val out = Pack.sequences(df, budget = 10L, orderCol = "doc_id")
    val got = out.select("doc_id", "n_tokens", "pack_id")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    var cum = 0L
    val expected = rows.sortBy(_._1).map { case (id, text) =>
      val ntok = text.split("\\s+").length.toLong
      val start = cum; cum += ntok
      (id, ntok, start / 10L)
    }
    assert(got == expected)
    // the range path actually spreads the corpus across buckets
    val nBuckets = Pack.rangeBuckets(df.select("doc_id"), "doc_id", 4)
      .select(countDistinct("__bkt")).as[Long].head()
    assert(nBuckets > 1, s"string order column collapsed to $nBuckets bucket")
    // the offsets prefix sum runs on the DRIVER over the bounded
    // per-bucket totals collect — NO single-partition Window may exist
    // anywhere in the plan (so WindowExec's "moving all data to a
    // single partition" WARN can never fire, and a future regression
    // that reintroduces a corpus-wide global window fails here)
    val globalWindows = out.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"plan contains ${globalWindows.size} single-partition Window(s); " +
        "offsets must come from the bounded driver-side prefix sum")
    // numeric fast path ≡ range path: zero-padded string ids sort like
    // their numeric values, so pack assignment must agree row for row
    val numDf = (0 until 200).map(i => (i.toLong, ("w " * (i % 7 + 1)).trim))
      .toDF("doc_id", "text").repartition(4)
    val numGot = Pack.sequences(numDf, budget = 10L)
      .select("doc_id", "n_tokens", "pack_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(numGot.map(t => (t._2, t._3)) == got.map(t => (t._2, t._3)))
  }

  test("as-of joins ≡ brute-force reference (directions × tolerance × bucketed)") {
    import graft.operators.AsOfJoin
    val leftGen = Gen.listOfN(40, for {
      k <- Gen.chooseNum(0L, 2L)
      t <- Gen.chooseNum(0L, 60L)
    } yield (k, t))
    val rightGen = Gen.listOfN(25, for {
      k <- Gen.chooseNum(0L, 2L)
      t <- Gen.chooseNum(0L, 60L)
      p <- Gen.option(Gen.chooseNum(1, 9).map(_.toDouble))
    } yield (k, t, p))
    forAll(leftGen, rightGen) { (ls, rs0) =>
      // unique (key, ts) on the right — a timestamp tie makes the
      // matched ROW engine-nondeterministic in any as-of definition
      val rs = rs0.groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val left = ls.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
        .toDF("event_id", "k", "ts")
      val right = rs.map { case (k, t, p) =>
        (k, new java.sql.Timestamp(t * 1000), p) }.toDF("k", "ts", "p")
      val tolSec = 7L
      // reference semantics: the matched row's payload, NULLs included;
      // tolerance nulls the whole match, never substitutes another row
      def refB(withTol: Boolean): Map[Long, Option[Double]] =
        ls.zipWithIndex.map { case ((k, t), i) =>
          val m = rs.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
          i.toLong -> m.flatMap(r =>
            if (withTol && t - r._2 > tolSec) None else r._3)
        }.toMap
      def refF(withTol: Boolean): Map[Long, Option[Double]] =
        ls.zipWithIndex.map { case ((k, t), i) =>
          val m = rs.filter(r => r._1 == k && r._2 >= t).sortBy(_._2).headOption
          i.toLong -> m.flatMap(r =>
            if (withTol && r._2 - t > tolSec) None else r._3)
        }.toMap
      def got(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
        df.select("event_id", "p").as[(Long, Option[Double])].collect().toMap
      for (tol <- Seq(Option.empty[String], Some("7 SECONDS"))) {
        val expB = refB(tol.isDefined)
        val expF = refF(tol.isDefined)
        // bucketSeconds=13 forces multi-bucket carry-ins at t ∈ [0,60]
        assert(got(AsOfJoin.backward(
          left, right, "k", "ts", "ts", Seq("p"), tol)) == expB)
        assert(got(AsOfJoin.backwardBucketed(
          left, right, "k", "ts", "ts", Seq("p"), 13L, tol)) == expB)
        assert(got(AsOfJoin.forward(
          left, right, "k", "ts", "ts", Seq("p"), tol)) == expF)
        assert(got(AsOfJoin.forwardBucketed(
          left, right, "k", "ts", "ts", Seq("p"), 13L, tol)) == expF)
      }
    }
  }

  test("skewed fixture: hot-key variants row-identical to plain shapes") {
    import graft.operators.{AsOfJoin, Skew}
    // The SkewBench distribution in miniature: one key holds half of
    // both sides (the case the variants exist for; SkewBench measures
    // the win, this pins result equality row-by-row on the same shape).
    def keyed(n: Int, seed: Int) = (0 until n).map { i =>
      val k = if (i % 2 == 0) 0L else (math.abs((i * 31 + seed) % 40) + 1).toLong
      (k, new java.sql.Timestamp(((i * 7919 + seed * 13) % 3600) * 1000L), i.toLong)
    }
    val left = keyed(400, 1).toDF("key", "ts", "v")
    val right = keyed(150, 2)
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, ts)
      .map { case (k, t, i) => (k, t, i.toDouble) }.toDF("key", "rts", "quote")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = AsOfJoin.backward(left, right, "key", "ts", "rts", Seq("quote"))
    val bucketed = AsOfJoin.backwardBucketed(left, right, "key", "ts", "rts",
      Seq("quote"), bucketSeconds = 600L)
    assert(rows(plain) == rows(bucketed),
      "bucketed as-of diverges from plain on the hot-key distribution")
    val dim = (0L to 41L).map(k => (k, s"dim_$k")).toDF("key", "label")
    val j = left.join(dim, Seq("key"), "left")
    val s = Skew.saltedLeftJoin(left, dim, "key")
    assert(rows(j) == rows(s.select(j.columns.map(col): _*)),
      "salted join diverges from plain on the hot-key distribution")
  }

  test("minhash-LSH pairs ⊆ exact-jaccard pairs at the same threshold") {
    import graft.operators.Dedup
    // LSH candidates are exact-Jaccard VERIFIED, so the output can
    // gain no pair the exact inverted-index join lacks — the subset
    // half of the driver gate, asserted over generated corpora
    forAll(docsGen) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val exact = Dedup.ngramJaccardPairs(docs, blockCols = Nil,
        threshold = 0.3).select("id_a", "id_b")
        .as[(Long, Long)].collect().toSet
      val lsh = Dedup.minhashLsh(docs, threshold = 0.3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(lsh.subsetOf(exact),
        s"spurious LSH pairs: ${lsh -- exact}")
    }
  }

  test("fuzzy join ≡ brute-force levenshtein truth on random short strings") {
    import graft.operators.FuzzyJoin
    // small alphabet + short lengths force heavy collisions, empty
    // strings and every segment-boundary shape
    val strGen: Gen[List[(Long, String)]] =
      Gen.listOfN(18, Gen.chooseNum(0, 6).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
        .map(_.zipWithIndex.map { case (s, i) => (i.toLong, s) })
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    forAll(strGen) { rows =>
      (0 to 2).foreach { d =>
        val got = FuzzyJoin.selfPairs(rows.toDF("id", "s"), "s", "id", d)
          .as[(Long, Long, Long)].collect().toSet
        val want = (for {
          (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
          dist = lev(sa, sb) if dist <= d
        } yield (ia, ib, dist.toLong)).toSet
        assert(got == want,
          s"maxDist=$d missing=${want -- got} spurious=${got -- want}")
      }
    }
  }

  test("priority sample ≡ local A-ES reference; w<=0 excluded; k >= n total") {
    import graft.operators.Sampling
    val rowsGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(80, for {
        id <- Gen.chooseNum(0L, 100000L)
        w <- Gen.chooseNum(-2L, 500L)
      } yield (id, w)).map(_.distinctBy(_._1))
    def pri(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:ps".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967297.0
      math.pow(u, 1.0 / w)
    }
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("id", "w")
        val got = Sampling.prioritySample(df, "id", col("w"), k = 10,
          seed = "ps").select("id").as[Long].collect().toSet
        val expect = rows.filter(_._2 > 0)
          .map { case (id, w) => (id, pri(id, w)) }
          .sortBy { case (id, p) => (-p, id) }.take(10).map(_._1).toSet
        assert(got == expect,
          s"missing=${expect -- got} spurious=${got -- expect}")
        // k past the positive-weight population returns all of it
        val all = Sampling.prioritySample(df, "id", col("w"),
          k = rows.size + 5, seed = "ps").count()
        assert(all == rows.count(_._2 > 0).toLong)
      }
    }
  }

  test("snapshot diff ≡ brute-force column compare on random snapshot pairs") {
    import graft.cdc.Diff
    val snapGen: Gen[List[(Long, Option[String], Option[String])]] =
      Gen.listOfN(25, for {
        k <- Gen.chooseNum(0L, 14L)
        a <- Gen.option(Gen.oneOf("x", "y", "z"))
        b <- Gen.option(Gen.oneOf("p", "q"))
      } yield (k, a, b))
    // keys may repeat in the generated lists; keep first per key so the
    // fixture satisfies the operator's unique-key contract
    def dedupKeys(rows: List[(Long, Option[String], Option[String])]) =
      rows.groupBy(_._1).map(_._2.head).toList
    forAll(snapGen, snapGen) { (oldRaw, newRaw) =>
      val oldRows = dedupKeys(oldRaw)
      val newRows = dedupKeys(newRaw)
      whenever(oldRows.nonEmpty || newRows.nonEmpty) {
        val got = Diff.snapshotDiff(
          oldRows.toDF("k", "a", "b"), newRows.toDF("k", "a", "b"), Seq("k"))
          .as[(Long, String)].collect().toMap
        val oldM = oldRows.map(r => r._1 -> ((r._2, r._3))).toMap
        val newM = newRows.map(r => r._1 -> ((r._2, r._3))).toMap
        val expect = (oldM.keySet ++ newM.keySet).flatMap { k =>
          (oldM.get(k), newM.get(k)) match {
            case (None, Some(_)) => Some(k -> Diff.Added)
            case (Some(_), None) => Some(k -> Diff.Removed)
            case (Some(o), Some(n)) if o != n => Some(k -> Diff.Changed)
            case _ => None
          }
        }.toMap
        assert(got == expect,
          s"diff mismatch: got=$got expect=$expect old=$oldRows new=$newRows")
      }
    }
  }

  test("intra-doc line dedup ≡ local first-occurrence distinct on random line lists") {
    import graft.operators.Dedup
    val docGen: Gen[List[(Long, List[String])]] =
      Gen.listOfN(8, for {
        id <- Gen.chooseNum(0L, 100L)
        lines <- Gen.listOfN(12, Gen.oneOf("a", "bb", "", "ccc", "d d"))
      } yield (id, lines))
    forAll(docGen) { docsRaw =>
      val docs = docsRaw.groupBy(_._1).map(_._2.head).toList
      whenever(docs.nonEmpty) {
        val df = docs.map { case (id, ls) => (id, ls.mkString("\n")) }
          .toDF("doc_id", "text")
        val got = Dedup.intraDocLineDedup(df)
          .select("doc_id", "text", "n_lines", "n_dropped")
          .as[(Long, String, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        docs.foreach { case (id, ls) =>
          val exp = ls.distinct.mkString("\n")
          val (txt, n, dropped) = got(id)
          assert(txt == exp && n == ls.size &&
            dropped == (ls.size - ls.distinct.size).toLong,
            s"doc $id: got=$txt expect=$exp lines=$ls")
        }
      }
    }
  }

  test("aHash64 round-trips arbitrary bits through every encoder") {
    import graft.operators.Multimodal
    // The planted-clip generator + decoder must agree for ANY 64-bit
    // pattern, not just the hand fixtures: 16-bit paths exactly;
    // the lossy 8-bit path within the documented 4-bit radius.
    forAll(Gen.long) { bits =>
      assert(Multimodal.aHash64(
        Multimodal.toneEnvelopeAudio(bits, "wav16")).contains(bits),
        f"wav16 round-trip failed for bits=$bits%016x")
      assert(Multimodal.aHash64(
        Multimodal.toneEnvelopeAudio(bits, "aiff16")).contains(bits),
        f"aiff16 round-trip failed for bits=$bits%016x")
      val h8 = Multimodal.aHash64(Multimodal.toneEnvelopeAudio(bits, "wav8"))
        .getOrElse(fail(f"wav8 must decode for bits=$bits%016x"))
      assert(java.lang.Long.bitCount(h8 ^ bits) <= 4,
        f"wav8 drifted ${java.lang.Long.bitCount(h8 ^ bits)} bits " +
          f"for bits=$bits%016x")
    }
  }
}
