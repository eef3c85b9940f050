package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.{dotFast, nearestCentroid, pqAdc}
import graft.functions.VectorFunctions.{l2Normalize, toDouble}

/** Product quantization (Jégou et al. 2011) — the memory-bounded ANN
  * path beside LSH bucketing ([[Similarity.annTopK]]) and IVF cell
  * probing ([[Ivf]]): each unit vector is split into `m` subvectors,
  * each subvector quantized to one of `k` per-subspace codebook
  * entries, so a D-dim float corpus serves from `m` small ints per row
  * (64 floats → 8 bytes at m=8/k≤256 — the 32× memory cut that makes
  * billion-vector serving affordable). Queries score codes by
  * asymmetric distance computation: one m×k dot-product table per
  * query (KBs, built from the exact query vector), then `Σ_j
  * tab[j][code_j]` per corpus row — m table adds, no vector math.
  * A final exact re-rank over the ADC top-`rerank` candidates restores
  * recall lost to quantization (the standard IVF-PQ serve shape).
  *
  * Scale shape: training runs driver-side Lloyd's on a DETERMINISTIC
  * bounded sample (hash-ordered `limit(maxTrainRows)` — the faiss
  * convention: codebooks are statistics of the distribution, not of
  * every row; the collect is bounded by contract like Pack's offsets).
  * Encoding is ONE map-only corpus pass — m codegen'd
  * [[graft.functions.NearestCentroid]] argmins over plan-literal
  * codebooks, zero exchange. Serving crossJoins the corpus codes with
  * the BROADCAST per-query tables (queries small by contract, as in
  * [[Similarity.bruteForceTopK]]), scores via the codegen'd
  * [[graft.functions.PqAdc]], bounds candidates with [[TopKPerKey]]'s
  * heap buffer, and re-ranks by joining the |Q|·rerank candidate ids
  * back to the exact vectors (broadcast hash join — the corpus is
  * scanned, never shuffled). Reference anchor: none (the reference has
  * no vector surface); beyond-reference LLM extension set, SURVEY §2
  * ext.
  */
object Pq {

  /** A trained codebook set: `codebooks(j)` is the row-major `k×dsub`
    * matrix for subspace `j`. Driver model state (m·k·dsub doubles —
    * KBs), like [[Ivf]] centroids. */
  final case class Model(m: Int, dsub: Int, k: Int,
      codebooks: Array[Array[Double]]) {
    require(codebooks.length == m, "one codebook per subspace")
  }

  /** Train per-subspace codebooks on a deterministic sample of
    * `corpus`. `dim` must split evenly into `m` subspaces.
    * `normalize = false` trains on the raw vectors — required when the
    * input is RESIDUALS ([[IvfPq]]): normalizing residuals would break
    * the additive `q·x = q·c + q·r` decomposition ADC relies on. */
  def train(corpus: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 8,
      maxTrainRows: Int = 1 << 16,
      vecCol: String = "embedding", idCol: String = "vec_id",
      normalize: Boolean = true): Model = {
    require(m > 0 && k > 1 && iters > 0 && maxTrainRows >= k,
      "need m>0, k>1, iters>0, maxTrainRows>=k")
    val prep = if (normalize) l2Normalize(toDouble(col(vecCol)))
      else toDouble(col(vecCol))
    // The deterministic hash-ordered sample. `limit(maxTrainRows)`
    // exceeds Spark's TakeOrdered fallback threshold, so the
    // single-pass form plans a FULL SORT of (id, vector) — at corpus
    // scale that shuffles every vector to pick 2^16 of them. Above a
    // size gate we sample in two passes so the corpus-wide sort never
    // carries vectors (guide §2.3 "shuffle keys and metadata instead
    // of payloads" / §8's decide-small move-once): pass 1 sorts
    // ids+hashes only (narrow); pass 2 attaches vectors by broadcast
    // semi-join (map-only corpus scan) and re-sorts just the sample
    // rows, with the hard `limit(maxTrainRows)` re-applied so a
    // duplicate-id corpus still trains on exactly ≤ maxTrainRows rows
    // (the semi-join alone would return every row sharing a sampled
    // id). Same ids, same collect order — the trained model is
    // bit-identical (oracle-pinned). Below the gate (estimated from
    // plan stats — no job) the one-pass sort is cheaper: the two-pass
    // shape costs an extra broadcast + second corpus scan, which at
    // toy scale is pure per-stage overhead.
    val spark = corpus.sparkSession
    val twoPassMinBytes = spark.conf
      .getOption("spark.graft.pq.twoPassMinBytes")
      .map(_.toLong).getOrElse(256L << 20)
    val prepped = corpus.select(col(idCol).as("__id"), prep.as("__v"))
    val corpusBytes = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
    val sample = (if (corpusBytes >= twoPassMinBytes) {
      val sampleIds = corpus
        .select(col(idCol).as("__id"))
        .orderBy(xxhash64(col("__id")))
        .limit(maxTrainRows)
      prepped
        .join(broadcast(sampleIds), Seq("__id"), "left_semi")
        .orderBy(xxhash64(col("__id")))
        .limit(maxTrainRows)
    } else {
      prepped
        .orderBy(xxhash64(col("__id")))
        .limit(maxTrainRows)
    })
      .select(col("__v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train PQ on an empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      lloyd(sub, k, iters, dsub)
    }
    Model(m, dsub, k, codebooks)
  }

  /** In-memory Lloyd's over the sampled subvectors (deterministic:
    * init = first k sample rows, which arrive hash-shuffled; L2
    * objective; empty cells keep their previous centroid). Returns the
    * row-major flat k×dsub codebook. */
  private def lloyd(rows: Array[Array[Double]], k: Int, iters: Int,
      dsub: Int): Array[Double] = {
    val kk = math.min(k, rows.length)
    val cents = Array.tabulate(k) { c =>
      if (c < kk) rows(c).clone() else rows(c % kk).clone()
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dsub))
      val counts = new Array[Long](k)
      var r = 0
      while (r < rows.length) {
        val v = rows(r)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          val ct = cents(c)
          while (i < dsub) { val t = v(i) - ct(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best); var i = 0
        while (i < dsub) { s(i) += v(i); i += 1 }
        counts(best) += 1
        r += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dsub) { cents(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
      it += 1
    }
    val flat = new Array[Double](k * dsub)
    var c = 0
    while (c < k) {
      System.arraycopy(cents(c), 0, flat, c * dsub, dsub)
      c += 1
    }
    flat
  }

  /** Encode the corpus: one map-only pass → `(vec_id, __codes)` where
    * `__codes(j)` is the nearest codebook entry of subvector `j`
    * (m codegen'd argmins over plan-literal codebooks — no exchange).
    * NearestCentroid maximizes DOT; for the L2-trained codebooks the
    * argmin distance needs `q·c − |c|²/2`, so each codebook entry is
    * augmented with its −|c|²/2 bias folded in via an appended
    * constant-1 vector component. */
  def encode(corpus: DataFrame, model: Model,
      vecCol: String = "embedding", idCol: String = "vec_id",
      normalize: Boolean = true): DataFrame = {
    val prep = if (normalize) l2Normalize(toDouble(col(vecCol)))
      else toDouble(col(vecCol))
    corpus
      .select(col(idCol).as("vec_id"), prep.as("__v"))
      .select(col("vec_id"), codesOf(model, col("__v")).as("__codes"))
  }

  /** The m-argmin code array of an (already prepared) double vector
    * column — [[encode]]'s kernel, shared with [[IvfPq]]'s residual
    * encode so the cell column can ride along. */
  private[operators] def codesOf(model: Model,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val codeCols = (0 until model.m).map { j =>
      // argmin_c |x−c|² = argmax_c (x·c − |c|²/2): append 1.0 to the
      // subvector and −|c|²/2 to each centroid row, reuse the dot argmax
      val aug = new Array[Double](model.k * (model.dsub + 1))
      var c = 0
      while (c < model.k) {
        val base = c * model.dsub
        var n2 = 0.0
        var i = 0
        while (i < model.dsub) {
          val x = model.codebooks(j)(base + i)
          aug(c * (model.dsub + 1) + i) = x
          n2 += x * x
          i += 1
        }
        aug(c * (model.dsub + 1) + model.dsub) = -n2 / 2.0
        c += 1
      }
      val sub = concat(slice(v, j * model.dsub + 1, model.dsub),
        array(lit(1.0)))
      nearestCentroid(sub, aug, model.dsub + 1)
    }
    array(codeCols: _*)
  }

  /** The per-query m×k ADC dot table (flat row-major) — shared with
    * [[IvfPq]]. */
  private[operators] def adcTable(model: Model,
      qv: Array[Double]): Array[Double] = {
    val tab = new Array[Double](model.m * model.k)
    var j = 0
    while (j < model.m) {
      var c = 0
      while (c < model.k) {
        var s = 0.0; var i = 0
        while (i < model.dsub) {
          s += qv(j * model.dsub + i) * model.codebooks(j)(c * model.dsub + i)
          i += 1
        }
        tab(j * model.k + c) = s
        c += 1
      }
      j += 1
    }
    tab
  }

  /** ADC top-`k` per query with exact re-rank: score every code row by
    * the query's m×k dot table (map-only over the codes), keep the
    * `rerank` best by ADC, re-score those exactly against the corpus
    * vectors, return `(query_id, rank, nbr_id, cos)` — [[Ivf.search]]'s
    * shape. `queries` is small by contract (collected driver-side to
    * build the tables, like [[TextSearch.searchIndex]]'s vocabulary). */
  def search(codes: DataFrame, model: Model, corpus: DataFrame,
      queries: DataFrame, k: Int = 5, rerank: Int = 50,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(k > 0 && rerank >= k, "need k>0 and rerank>=k")
    val spark = codes.sparkSession
    val qRows = queries
      .select(col(idCol).as("query_id"),
        l2Normalize(toDouble(col(vecCol))).as("__qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val tabs = qRows.map { case (qid, qv) =>
      (qid, qv.toSeq, adcTable(model, qv).toSeq)
    }.toIndexedSeq
    import spark.implicits._
    val qdf = tabs.toDF("query_id", "__qv", "__tab")

    val cand = TopKPerKey(
      codes.crossJoin(broadcast(qdf))
        .where(col("query_id") =!= col("vec_id"))
        .withColumn("__adc", pqAdc(col("__codes"), col("__tab"), model.k)),
      keyCol = "query_id", scoreCol = "__adc", payloadCol = "vec_id",
      k = rerank)
      .select(col("key").as("query_id"), col("payload").as("nbr_id"))

    val exact = corpus.select(col(idCol).as("nbr_id"),
      l2Normalize(toDouble(col(vecCol))).as("__cv"))
    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    cand
      .join(qdf.select("query_id", "__qv"), Seq("query_id"))
      .join(exact, Seq("nbr_id"))
      .withColumn("cos", dotFast(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(wk).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cos")
  }

  /** Persist codes + codebooks for build-once / serve-many (the
    * [[Ivf.persist]] lifecycle): codes as-is, the model as one row per
    * subspace `(j, dsub, k, cb)`. */
  def persist(spark: SparkSession, root: String, codes: DataFrame,
      model: Model): Unit = {
    import spark.implicits._
    new graft.cdc.TableStore(spark, s"$root/codes").write(codes)
    val mdf = model.codebooks.zipWithIndex.toIndexedSeq
      .map { case (cb, j) => (j, model.dsub, model.k, cb.toSeq) }
      .toDF("j", "dsub", "k", "cb")
    new graft.cdc.TableStore(spark, s"$root/model").write(mdf)
  }

  /** Load a persisted index; None if either half was never written. */
  def load(spark: SparkSession, root: String): Option[(DataFrame, Model)] =
    for {
      codes <- new graft.cdc.TableStore(spark, s"$root/codes").read()
      mdf <- new graft.cdc.TableStore(spark, s"$root/model").read()
    } yield {
      val rows = mdf.orderBy("j").collect()
      val dsub = rows.head.getAs[Int]("dsub")
      val k = rows.head.getAs[Int]("k")
      val cbs = rows.map(_.getSeq[Double](3).toArray)
      (codes, Model(rows.length, dsub, k, cbs))
    }
}
