package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeExpressions

/** Byte-pair-encoding tokenizer: distributed merge-table TRAINING over
  * a corpus plus a codegen'd ENCODE/COUNT kernel — the real version of
  * the `n_bpeish` regex estimate, and the primitive a training
  * pipeline needs wherever "tokens" means "what the model will
  * actually see" (packing budgets, per-domain token accounting,
  * mixture weights).
  *
  * Scale split (the part that matters at 100 TB): training follows the
  * word-frequency formulation (Sennrich et al. 2016; how production
  * tokenizer trainers work) — the corpus-sized work is ONE distributed
  * word-count aggregate (explode → groupBy → top-`maxWords` by
  * TakeOrdered, no full sort), and the merge-learning loop runs on the
  * driver over that bounded word-frequency table (≤ maxWords rows —
  * model state, like Ivf's centroids, NOT corpus state; the Zipf tail
  * truncation this implies is what real trainers do via min-frequency
  * cutoffs). Encoding is map-only: the merge list ships as a literal
  * (KBs) inside a codegen'd kernel with a per-executor word memo, so
  * tokenize-the-corpus is one pass with zero shuffles and zero driver
  * involvement.
  *
  * Pre-tokenization is the byte-level-BPE-style splitter the repo
  * already exposes as [[graft.functions.TextFunctions.bpeishTokenCount]]:
  * lowercased runs of letters / digits / single punctuation
  * (`[a-z]+|[0-9]+|[^a-z0-9\s]`); merges never cross pre-token
  * boundaries. Reference anchor: the reference has no tokenizer
  * surface — beyond-reference LLM-pipeline extension (SURVEY §2 ext).
  *
  * Determinism: ties in the pair-count argmax break by the
  * lexicographically smallest pair; the word table is tie-broken by
  * word; no RNG anywhere — retraining on a repartitioned corpus yields
  * the identical merge list (spec-pinned).
  */
object BpeTokenizer {

  /** An ordered merge list — the entire model. */
  final case class Model(merges: Seq[(String, String)])

  /** The shared pre-tokenizer (see class doc). */
  def preTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Learn `numMerges` merges from the corpus. `maxWords` bounds the
    * driver-held word-frequency table (top-N by count — the same
    * Zipf-head truncation real trainers apply); `minPairFreq` stops
    * early when the best remaining pair is noise. */
  def train(docs: DataFrame, numMerges: Int = 200,
      maxWords: Int = 1 << 16, minPairFreq: Long = 2,
      textCol: String = "text"): Model = {
    require(numMerges >= 0, "numMerges must be non-negative")
    require(maxWords > 0, "maxWords must be positive")
    val wordFreq: Array[(Array[String], Long)] = docs
      .select(explode(preTokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w"))
      .limit(maxWords) // TakeOrdered: no global sort materializes
      .collect()
      .map(r => (r.getString(0).map(String.valueOf(_)).toArray, r.getLong(1)))

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var words = wordFreq
    var done = false
    while (merges.size < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // argmax by count, ties to the lexicographically smallest pair
        val best = counts.reduceLeft { (x, y) =>
          if (y._2 > x._2 ||
            (y._2 == x._2 && Ordering[(String, String)].lt(y._1, x._1))) y
          else x
        }
        if (best._2 < minPairFreq) done = true
        else {
          val (a, b) = best._1
          merges += best._1
          words = words.map { case (syms, n) =>
            if (syms.length < 2) (syms, n)
            else {
              val out = new mutable.ArrayBuffer[String](syms.length)
              var p = 0
              while (p < syms.length) {
                if (p < syms.length - 1 && syms(p) == a && syms(p + 1) == b) {
                  out += a + b; p += 2
                } else { out += syms(p); p += 1 }
              }
              (out.toArray, n)
            }
          }
        }
      }
    }
    Model(merges.toSeq)
  }

  /** Subword token array column for `text` under `model` (map-only;
    * merge list rides the plan as a literal). */
  def encode(model: Model, text: Column): Column =
    BpeExpressions.bpeEncode(preTokens(text), model.merges)

  /** Token count column — the packing/accounting primitive; skips
    * materializing token strings. */
  /** Persist the trained merge list — train-once / tokenize-everywhere:
    * a tokenizer is an ARTIFACT (retraining per job would silently
    * change every downstream token count and pack boundary), so the
    * merge list lands in a [[graft.cdc.TableStore]] the same way the
    * ANN/BM25 indexes do. Merge ORDER is the model; rows carry their
    * index. Loaded-vs-fresh encode parity is spec-pinned (BpeSpec). */
  def persist(spark: org.apache.spark.sql.SparkSession, root: String,
      model: Model): Unit = {
    import spark.implicits._
    new graft.cdc.TableStore(spark, root).write(
      model.merges.zipWithIndex
        .map { case ((a, b), i) => (i, a, b) }
        .toDF("i", "m_left", "m_right"))
  }

  /** Load a persisted merge list; None if never written. */
  def load(spark: org.apache.spark.sql.SparkSession, root: String)
      : Option[Model] =
    new graft.cdc.TableStore(spark, root).read().map { df =>
      Model(df.orderBy("i").collect()
        .map(r => (r.getAs[String]("m_left"), r.getAs[String]("m_right")))
        .toSeq)
    }

  def countTokens(model: Model, text: Column): Column =
    BpeExpressions.bpeCount(preTokens(text), model.merges)
}
