package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** THE exact/approx percentile switch — every operator with an
  * exact/approx QUANTILE PAIR (winsorize, robust feature scaling, the
  * median/quantile agg keys, [[graft.quality.Outliers]] fences,
  * [[graft.quality.Drift]] PSI breaks) builds its percentile
  * expression here, so each names its at-scale form in code rather
  * than prose (VERDICT r16 ask #6). Deliberately OUTSIDE the switch:
  * operators that are sketch-only by construction — a distribution-
  * anchored threshold has no exact twin to pair with
  * ([[graft.operators.Curate.topFraction]], the SemDeDup-style
  * semantic threshold) — those call `percentile_approx` directly and
  * their gates pin rank-tolerant invariants instead of exact values.
  *
  * The two forms and the single contract between them:
  *
  *  - `approx = false` → Spark's exact interpolated `percentile`.
  *    Bit-matchable against DuckDB's `quantile_cont`, which is why
  *    every oracle-declared key pins this form. Cost shape: an
  *    ObjectHashAggregate whose per-group buffer holds one counter
  *    PER DISTINCT VALUE — fine to ~10⁸ values/group, a
  *    buffer-growth cliff beyond (measured: SCALE.md winsorize f100
  *    leg), and categorically wrong for a 100 TB single group.
  *  - `approx = true` → `approx_percentile` (Greenwald–Khanna
  *    sketch). Bounded memory at any scale, mergeable map-side
  *    partials, returns an ELEMENT of the column (never
  *    interpolates). Not oracle-pinnable (the sketch is
  *    engine-specific), so approx paths are spec-gated instead.
  *
  * ε-contract (what "approx" promises, and all it promises): the
  * returned element's RANK is within ε·n of the requested rank,
  * ε = 1/accuracy (the GK guarantee Spark documents). It does NOT
  * promise |approx − exact| is small — on heavy-tailed data
  * neighboring ranks can be far apart in value. Downstream semantics
  * must therefore be threshold-tolerant (clamping, fencing,
  * bucketing all are: a value within ε·n ranks of a threshold may
  * land on the other side, nothing else changes). QuantilesSpec pins
  * this contract once for every operator that routes through here.
  */
object Quantiles {

  /** ε = 1/accuracy ≈ 1e-4 rank error: tight enough that a fence or
    * clamp threshold moves by at most ~0.01% of a group's ranks,
    * cheap enough that a sketch stays KBs per group. */
  val DefaultAccuracy: Int = 10000

  private def lit(p: Double): String = {
    require(p >= 0.0 && p <= 1.0, s"percentage out of [0,1]: $p")
    // "D" suffix: a bare 0.05 parses as DECIMAL in Spark SQL; the
    // exact/approx percentile functions want DOUBLE percentages.
    s"${p}D"
  }

  /** Single-percentile aggregate expression over column `value`. */
  def one(value: String, p: Double, approx: Boolean,
      accuracy: Int = DefaultAccuracy): Column =
    if (approx) expr(s"approx_percentile($value, ${lit(p)}, $accuracy)")
    else expr(s"percentile($value, ${lit(p)})")

  /** Array-percentile aggregate expression (one pass, all `ps`). */
  def of(value: String, ps: Seq[Double], approx: Boolean,
      accuracy: Int = DefaultAccuracy): Column = {
    require(ps.nonEmpty, "need at least one percentage")
    val arr = s"array(${ps.map(lit).mkString(", ")})"
    if (approx) expr(s"approx_percentile($value, $arr, $accuracy)")
    else expr(s"percentile($value, $arr)")
  }
}
