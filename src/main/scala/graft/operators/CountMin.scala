package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — bounded-memory
  * POINT-FREQUENCY estimation over an unbounded token domain, the
  * complement of [[HeavyHitters]]: Misra-Gries answers "which items
  * are frequent", Count-Min answers "how often does THIS item occur"
  * for any item, including ones no top-k summary retained. The
  * classic guarantee: estimates never undercount, and overcount by at
  * most ε·N (ε ≈ e/width) with probability 1−δ (δ ≈ e^−depth).
  *
  * Determinism & oracle: the row hashes are md5-derived —
  * `cell_r(t) = int(md5(t ":seed" r)[0:8]) mod width` — a pure
  * function of (token, seed), so the ENTIRE sketch and every point
  * estimate are engine-restatable (`q_text_cms` recomputes both in
  * DuckDB and pins the estimates as exact values, not tolerance
  * booleans). md5 is not pairwise-independent in the textbook sense,
  * but the ε-bound is a worst-case statement the oracle does not rely
  * on — equality is checked, not the bound.
  *
  * Scale shape: ONE pass over the token stream — a depth-way explode
  * into (r, cell) pairs feeding a partial-aggregated groupBy whose
  * key space is bounded at depth·width cells (map-side combine
  * collapses each partition to ≤ depth·width rows regardless of input
  * size); the sketch table is KBs and BROADCASTS to the probe side.
  * Sketches MERGE by cell-wise addition ([[merge]] — union + sum), so
  * per-batch sketches roll up without rescanning history (the
  * [[HeavyHitters]] / `q_agg_hll_incremental` lifecycle; exact-
  * equality spec in CountMinSpec: merged halves == one-shot whole).
  */
object CountMin {

  /** Row-`r` cell of a token: `int(md5(tok ":seed" r)[0:8]) mod width`.
    * DuckDB restatement:
    * `CAST('0x' || substr(md5(tok || ':seedR'), 1, 8) AS BIGINT) % width`. */
  def cellExpr(tok: Column, r: Int, width: Int, seed: String): Column =
    conv(substring(md5(concat(tok, lit(s":$seed$r")).cast("binary")), 1, 8),
      16, 10).cast("long") % width

  private def rcExpr(tok: Column, depth: Int, width: Int,
      seed: String): Column =
    explode(array((0 until depth).map(r =>
      struct(lit(r).as("r"), cellExpr(tok, r, width, seed).as("cell"))): _*))

  /** Build the sketch over `toks(tokCol)`: `(r, cell, cnt)` rows,
    * ≤ depth·width of them. NULL tokens drop (nothing to count). */
  def sketch(toks: DataFrame, tokCol: String, depth: Int = 4,
      width: Int = 1024, seed: String = "cms"): DataFrame = {
    require(depth >= 1, s"depth must be positive: $depth")
    require(width >= 2, s"width must be at least 2: $width")
    toks.where(col(tokCol).isNotNull)
      .select(rcExpr(col(tokCol), depth, width, seed).as("__rc"))
      .groupBy(col("__rc.r").as("r"), col("__rc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise sum of sketches built with identical (depth, width,
    * seed) — the rollup step; exact: counts add. */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge: no sketches")
    sketches.reduce(_ unionByName _)
      .groupBy("r", "cell").agg(sum("cnt").as("cnt"))
  }

  /** Point estimates for `probes(tokCol)`: `(tokCol, n_est)` with
    * `n_est = min_r cnt[r, cell_r(tok)]` (0 only when some probed
    * cell is empty — a token the sketch never saw and that dodged
    * collisions in at least one row). The sketch side broadcasts —
    * it is ≤ depth·width rows by construction. */
  def estimate(sk: DataFrame, probes: DataFrame, tokCol: String,
      depth: Int = 4, width: Int = 1024, seed: String = "cms"): DataFrame = {
    require(depth >= 1, s"depth must be positive: $depth")
    require(width >= 2, s"width must be at least 2: $width")
    probes.where(col(tokCol).isNotNull)
      .select(col(tokCol), rcExpr(col(tokCol), depth, width, seed).as("__rc"))
      .select(col(tokCol), col("__rc.r").as("r"), col("__rc.cell").as("cell"))
      .join(broadcast(sk), Seq("r", "cell"), "left")
      .groupBy(col(tokCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }
}
