package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sampling

/** Streaming token-budget admission — the online half of the
  * [[graft.operators.Sampling.budgetDraw]] plan→draw pair (the
  * reference's incremental loads stage rows as they arrive,
  * cdc_pipelines/loads.py; a training-data intake applies the same
  * idea to a token budget: admit documents against per-domain quotas
  * as the crawl lands, instead of re-ranking the full corpus every
  * time).
  *
  * Per-domain state is ONE Long (tokens consumed so far) — bounded at
  * |domains| regardless of stream length, the same constant-per-key
  * state discipline as [[Scd2Stream]]. Admission is first-fit against
  * the EXCLUSIVE running sum (`consumed_before < quota`), the exact
  * batch rule: a domain's first document always ships, and the quota
  * can be overshot by at most one document — a training pipeline wants
  * the budget filled, not undershot.
  *
  * Ordering contract: WITHIN a micro-batch, documents are admitted in
  * the batch draw order (FULL 32-hex md5 draw descending —
  * [[Sampling.hashDrawFull]], precomputed as a column by [[events]] so
  * the bytes ranked are identical to the batch operator's; at 128 bits
  * ties are unreachable, so the string-id tie-break here can never
  * disagree with the batch kernel's native-id one); ACROSS
  * micro-batches, arrival order governs — an online intake cannot rank
  * against documents it has not seen. Consequences, both spec-pinned
  * in BudgetStreamSpec:
  *  - a single-batch drain is row-identical to `budgetDraw` with the
  *    same quotas and seed (the whole corpus is one "batch", so the
  *    draw order is global — batch parity);
  *  - admission is monotone: replaying a prefix of the stream admits a
  *    prefix of the admissions (state only grows), so re-drains and
  *    checkpoint recoveries never retract an admitted document —
  *    Append-mode-final, like every streaming twin here.
  *
  * Rows with NULL/unlisted domains or NULL weight drop (nothing to
  * account); zero-weight rows are free and admitted whenever the
  * domain's quota is not yet exhausted. Zero/negative quotas admit
  * nothing (filtered up front, mirroring `budgetDraw`'s `_._2 > 0`).
  */
object BudgetStream {

  final case class BudgetEvent(doc_id: String, domain: String,
      n_tokens: Long, draw: String)
  final case class QuotaState(consumed: Long)
  final case class Admitted(doc_id: String, domain: String, n_tokens: Long)

  /** Project a (streaming or batch) frame to the event shape, computing
    * the draw with the SAME Spark md5 expression as the batch operator
    * — engine identity by construction, not by reimplementation. */
  def events(df: DataFrame, idCol: String, domainCol: String,
      weight: Column, seed: String): Dataset[BudgetEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string").as("doc_id"),
        col(domainCol).cast("string").as("domain"),
        weight.cast("long").as("n_tokens"),
        Sampling.hashDrawFull(col(idCol), seed).as("draw"))
      .where(col("domain").isNotNull && col("n_tokens").isNotNull)
      .as[BudgetEvent]
  }

  /** Admit events against `quotas` (domain → token budget, e.g.
    * [[Sampling.epochPlan]]'s `final_tokens`). Append output mode. */
  def streaming(evs: Dataset[BudgetEvent], quotas: Map[String, Long])
      : Dataset[Admitted] = {
    val spark = evs.sparkSession
    import spark.implicits._
    val qPos = quotas.filter(_._2 > 0L)
    require(quotas.nonEmpty, "BudgetStream: no quotas")

    evs.groupByKey(_.domain)
      .flatMapGroupsWithState[QuotaState, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (dom: String, rows: Iterator[BudgetEvent],
            state: GroupState[QuotaState]) =>
          qPos.get(dom) match {
            case None => Iterator.empty // unlisted domain: nothing to account
            case Some(quota) =>
              var consumed = state.getOption.map(_.consumed).getOrElse(0L)
              val out = List.newBuilder[Admitted]
              // batch draw order inside the micro-batch: draw desc, id desc
              rows.toIndexedSeq
                .sortBy(e => (e.draw, e.doc_id))(
                  Ordering.Tuple2(Ordering[String].reverse,
                    Ordering[String].reverse))
                .foreach { e =>
                  if (consumed < quota) { // exclusive prefix: first-fit
                    out += Admitted(e.doc_id, dom, e.n_tokens)
                    consumed += e.n_tokens
                  }
                }
              state.update(QuotaState(consumed))
              out.result().iterator
          }
      }
  }
}
