package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for web-corpus curation.
  *
  * Crawl-derived training corpora rank domains by link centrality
  * before sampling (Common Crawl's host ranking; CCNet/RefinedWeb
  * keep it as a quality signal). The reference has no graph operator
  * (its scope stops at CDC loads), so this is extension scope from
  * repo:BASELINE.json; the algorithm is the textbook damped PageRank
  * (Page et al. 1999) with uniform dangling-mass redistribution.
  *
  * Spark-first shape, sized for a 100 TB edge list:
  *  - edges are deduplicated and hash-partitioned on `src` ONCE, then
  *    eagerly materialized (`localCheckpoint`) — every iteration's
  *    contribution join reuses that layout instead of re-shuffling
  *    the (big) edge side;
  *  - one iteration = one join edges⋈ranks on src + one groupBy(dst)
  *    partial-aggregated sum — two shuffles of rank-sized (not
  *    edge-sized) data beyond the resident edges;
  *  - the dangling mass is a 1-row aggregate cross-joined back in
  *    (broadcast), never a driver collect;
  *  - each iteration ends in an eager `localCheckpoint` so the plan
  *    stays O(1) deep across iterations (no lineage blow-up, and the
  *    next iteration's two consumers of `ranks` share one
  *    materialization).
  *
  * Determinism: pure arithmetic over an exact edge set — restatable
  * in the DuckDB oracle as K unrolled CTE iterations (rounded, since
  * float summation order differs across engines).
  */
object Graph {

  /** Damped PageRank with uniform teleport and dangling-mass
    * redistribution. Returns (node, pr); Σpr = 1 up to float error.
    * Node identity is the src/dst columns' own type (long ids, domain
    * strings, …) — every step is joins and aggregates, nothing
    * numeric touches the key.
    *
    * @param edges  frame holding one row per directed edge; duplicate
    *               edges are collapsed (standard simple-graph form)
    * @param iters  fixed iteration count (callers wanting a
    *               convergence test can compare successive calls;
    *               a fixed K keeps the result exactly restatable)
    */
  def pagerank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    // deg/srcs are node-sized (tiny next to edges) but derived FROM the
    // edge list — materialize them once or every iteration's dangling
    // probe and share join re-scans the full edge checkpoint (measured
    // 2.4s → 1.3s at sf0.1: ~10 edge re-scans of 36 MB become 2).
    val srcs = e.select("src").distinct().localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
      .localCheckpoint(true)
    val n = nodes.count().toDouble

    var ranks = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iters) {
      // Mass sitting on nodes with no out-edges, as a 1-row frame.
      val dangling = ranks.join(srcs, ranks("node") === srcs("src"),
          "left_anti")
        .agg(coalesce(sum("pr"), lit(0.0)).as("dm"))
      val contribs = e.join(
          ranks.join(deg, ranks("node") === deg("src"))
            .select(col("node"), (col("pr") / col("deg")).as("share")),
          e("src") === col("node"))
        .groupBy("dst").agg(sum("share").as("contrib"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(nodes("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dm") / lit(n)))
            .as("pr"))
        // lazy: materializes inside the NEXT iteration's first consumer
        // instead of paying a dedicated job per iteration; still cuts
        // the lineage so the plan stays O(1) deep.
        .localCheckpoint(false)
    }
    ranks
  }

  /** DuckDB restatement of one [[pagerank]] iteration — the d$i/r$i
    * dangling-mass + contribution CTE pair for iterations 1..iters,
    * shared by every pagerank-backed oracle (FeatureQueries'
    * `q_graph_pagerank`, ExtQueries' `q_curate_url_rank`) so the
    * arithmetic is pinned in ONE place: a change to the iteration
    * formula is a one-site oracle edit, never a silent divergence
    * between two hand-rolled SQL generators. Callers supply the base
    * CTEs `edges(src, dst)`, `nodes(node)`, `deg(src, deg)`, `nn(n)`
    * and `r0(node, pr)`. */
  def oracleIterCtes(iters: Int, damping: Double = 0.85): Seq[String] =
    (1 to iters).map { i =>
      s"""d$i AS (SELECT COALESCE(sum(pr), 0) AS dm FROM r${i - 1}
         |  WHERE node NOT IN (SELECT src FROM edges)),
         |r$i AS (SELECT nd.node,
         |    (1.0 - $damping)/(SELECT n FROM nn) + $damping*(COALESCE(c.contrib, 0)
         |      + (SELECT dm FROM d$i)/(SELECT n FROM nn)) AS pr
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.pr/dg.deg) AS contrib
         |    FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |    JOIN deg dg ON e.src = dg.src
         |    GROUP BY e.dst) c ON nd.node = c.node)""".stripMargin
    }
}
