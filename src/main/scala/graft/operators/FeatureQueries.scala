package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Feature-engineering + corpus-analytics keys (extension scope,
  * repo:BASELINE.json): the pre-training "know your corpus / build
  * your features" operators a 100 TB pipeline runs before and after
  * curation — composition reports, per-group normalization,
  * equi-depth binning, per-class embedding centroids, and link-graph
  * centrality ([[Graph.pagerank]]).
  *
  * Every key here is pure arithmetic over exact inputs, so each has
  * a full DuckDB oracle (rounded where float summation order
  * differs across engines).
  */
object FeatureQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Per-group winsorization: clamp `valueCol` to its group's
    * `[pLo, pHi]` percentiles (outlier capping before training — the
    * robust complement of z-scaling). GroupBy-stats + broadcast
    * join-back, |groups| rows of driver-independent state — the same
    * 100 TB shape as `q_feature_scale`.
    *
    * `approx` is the at-scale switch ([[graft.functions.Quantiles]]):
    * exact interpolated `percentile` is bit-matchable against DuckDB
    * (the declared key pins it) but buffers per-group distinct values
    * (the measured f100 step in SCALE.md's winsorize leg);
    * `approx = true` swaps in the GK sketch — bounded memory for
    * arbitrarily wide groups, thresholds within ε·n ranks of exact,
    * and clamping is threshold-tolerant so nothing else changes
    * (QuantilesSpec gates the equivalence off the boundary).
    *
    * Output: `(idCols*, groupCols*, valueCol, lo, hi, winsorized,
    * clipped)`, NULL values passing through NULL. Explicit CASE (not
    * least/greatest) so NULL semantics match the oracle's. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95, approx: Boolean = false,
      accuracy: Int = graft.functions.Quantiles.DefaultAccuracy)
      : DataFrame = {
    require(pLo < pHi, s"pLo $pLo must be < pHi $pHi")
    val q = graft.functions.Quantiles
    val stats = df.groupBy(groupCols.map(col): _*).agg(
      q.one(valueCol, pLo, approx, accuracy).cast("double").as("lo"),
      q.one(valueCol, pHi, approx, accuracy).cast("double").as("hi"))
    val v = col(valueCol)
    df.join(broadcast(stats), groupCols)
      .withColumn("winsorized",
        when(v.isNull, lit(null))
          .when(v < col("lo"), col("lo"))
          .when(v > col("hi"), col("hi"))
          .otherwise(v))
      .withColumn("clipped",
        when(v.isNull, lit(null))
          .otherwise(v < col("lo") || v > col("hi")))
  }

  val queries: Map[String, Q] = Map(
    // Corpus composition report: docs/chars/tokens by lang × source
    // with corpus fractions — the first table every training-mixture
    // design doc contains. One shuffle to the group; fractions via a
    // broadcast 1-row totals crossJoin (the [[graft.quality.Drift]]
    // idiom) instead of an empty-partition window, so no
    // single-partition exchange appears even when |groups| grows.
    // The group frame is pinned so totals + output read it once.
    "q_corpus_stats" -> { (s, d) =>
      val g = Tables(s, d, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          sum(TextFunctions.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
        .localCheckpoint(true)
      val tot = g.agg(sum("n_docs").as("__td"), sum("n_tokens").as("__tt"))
      g.crossJoin(broadcast(tot))
        .select(col("lang"), col("source"), col("n_docs"), col("n_chars"),
          col("n_tokens"),
          round(col("n_docs") / col("__td"), 6).as("doc_frac"),
          round(col("n_tokens") / col("__tt"), 6).as("token_frac"))
        .orderBy("lang", "source")
    },

    // Per-group feature scaling: z-score (mean/stddev) and robust
    // (median/IQR) normalization of a metric column. GroupBy-stats +
    // broadcast join back — the 100 TB shape (the stats side is
    // |groups| rows; no per-row window state).
    "q_feature_scale" -> { (s, d) =>
      val ev = Tables(s, d, "events")
      val stats = ev.groupBy("event_type").agg(
        avg("value").as("mu"),
        stddev_samp("value").as("sigma"),
        graft.functions.Quantiles.one("value", 0.5, approx = false)
          .as("med"),
        (graft.functions.Quantiles.one("value", 0.75, approx = false) -
          graft.functions.Quantiles.one("value", 0.25, approx = false))
          .as("iqr"))
      ev.join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          round((col("value") - col("mu")) /
            when(col("sigma") =!= 0.0, col("sigma")), 6).as("z"),
          round((col("value") - col("med")) /
            when(col("iqr") =!= 0.0, col("iqr")), 6).as("robust"))
        .orderBy("event_id")
    },

    // Equi-depth binning: decile bucket of `value` within each
    // event_type (stratification / winsorization prep). Tie-broken
    // by event_id so the total order — and thus the bucket of every
    // row — is deterministic and engine-independent.
    "q_feature_bucketize" -> { (s, d) =>
      val w = Window.partitionBy("event_type")
        .orderBy(col("value").asc_nulls_first, col("event_id"))
      Tables(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"),
          ntile(10).over(w).cast("long").as("bucket"))
        .orderBy("event_id")
    },

    // Per-label embedding centroid (mean pooling), exploded to
    // (label, pos, centroid) rows: the SemDeDup / cluster-balancing
    // primitive. posexplode + two-level groupBy — never collects a
    // vector list; scales to any corpus × dim.
    "q_embed_centroids" -> { (s, d) =>
      Tables(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(round(avg("v"), 6).as("centroid"))
        .orderBy("label", "pos")
    },

    // Link-graph centrality: damped PageRank over a deterministic
    // lineitem-derived edge list (order-bucket → part-bucket; the
    // distinct prime moduli guarantee dangling nodes exist, so the
    // redistribution path is exercised). 5 unrolled iterations in
    // the oracle.
    "q_graph_pagerank" -> { (s, d) =>
      val edges = Tables(s, d, "lineitem").select(
        (col("l_orderkey") % 997).as("src"),
        (col("l_partkey") % 1009).as("dst"))
      Graph.pagerank(edges, iters = 5, damping = 0.85)
        .select(col("node"), round(col("pr"), 7).as("pr"))
        .orderBy("node")
    },

    // Triangle count + local clustering coefficient over a
    // lineitem-derived edge list whose node space SCALES WITH the
    // data (m = max(997, ⌊|lineitem|/30⌋), both endpoints mod m) so
    // the average degree — and with it the wedge workload per node —
    // stays ~constant at every SF instead of densifying into an
    // all-pairs graph. The modulus is derived from the data as a
    // broadcast 1-row crossJoin (never a driver collect) and restated
    // identically in the oracle. Degree-ordered orientation per
    // [[Graph.triangles]].
    "q_graph_triangles" -> { (s, d) =>
      val li = Tables(s, d, "lineitem")
      val m = li.agg(greatest(lit(997L),
        floor(count(lit(1)) / 30).cast("long")).as("__m"))
      val edges = li.crossJoin(broadcast(m)).select(
        (col("l_orderkey") % col("__m")).as("src"),
        (col("l_partkey") % col("__m")).as("dst"))
      Graph.triangles(edges).orderBy("node")
    },

    // Per-group winsorization via [[winsorize]] — the declared key
    // pins the EXACT form (approx = false) for bit-exact DuckDB
    // parity; `winsorize(approx = true)` is the selectable GK-sketch
    // path for groups too wide to buffer (ε-gated in QuantilesSpec,
    // measured as the winsorize_approx ScaleBench leg).
    "q_feature_winsorize" -> { (s, d) =>
      val ev = Tables(s, d, "events")
      winsorize(ev.select("event_id", "event_type", "value"),
        Seq("event_type"), "value")
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("lo"), 6).as("lo"), round(col("hi"), 6).as("hi"),
          round(col("winsorized"), 6).as("winsorized"), col("clipped"))
        .orderBy("event_id")
    },

    // Time-decayed per-user engagement: Σ value · 0.5^(age/1d) at the
    // corpus watermark (the feature-store recency aggregate). The
    // as-of instant is max(ts) — derived from the data, broadcast as
    // a 1-row crossJoin (never a driver collect); ages in exact
    // microseconds (unix_micros == epoch_us; a timestamp→long cast
    // would TRUNCATE to seconds on one engine and fraction on the
    // other). One shuffle to the user grain; round-6 absorbs
    // pow/sum-order ulps.
    "q_feature_decay" -> { (s, d) =>
      val ev = Tables(s, d, "events")
      val asOf = ev.agg(max(unix_micros(col("ts"))).as("__as_of"))
      ev.crossJoin(broadcast(asOf))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value") *
            pow(lit(0.5), (col("__as_of") - unix_micros(col("ts")))
              .cast("double") / lit(86400e6))), 6).as("decayed_sum"))
        .orderBy("user_id")
    },

    // Distributed k-means over the embeddings corpus (Lloyd, k=8,
    // 3 iterations, deterministic md5-draw init): every vector gets a
    // cluster id — the curation clustering stage run over the FULL
    // corpus, only K centroids ever leaving the executors. The oracle
    // restates init + every unrolled iteration ([[Kmeans.oracleSql]],
    // generated so engine and oracle can't drift on (k, iters, seed)).
    "q_cluster_kmeans" -> { (s, d) =>
      Kmeans.fit(Tables(s, d, "embeddings"))
        .orderBy("vec_id")
    })

  /** Unrolled K-iteration PageRank restatement (same arithmetic
    * shape as [[Graph.pagerank]]: (1-d)/n + d*(contrib + dm/n));
    * the per-iteration CTEs come from the shared
    * [[Graph.oracleIterCtes]] generator. */
  private def pagerankOracle(iters: Int): String = {
    val base =
      """WITH edges AS (
        |  SELECT DISTINCT l_orderkey % 997 AS src, l_partkey % 1009 AS dst
        |  FROM lineitem),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
        |  FROM edges GROUP BY src),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS pr FROM nodes)""".stripMargin
    (base +: Graph.oracleIterCtes(iters)).mkString(",\n") +
      s"\nSELECT node, round(pr, 7) AS pr FROM r$iters ORDER BY node"
  }

  val oracle: Map[String, String] = Map(
    "q_corpus_stats" ->
      """WITH g AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |    CAST(sum(len(text)) AS BIGINT) AS n_chars,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY lang, source)
        |SELECT lang, source, n_docs, n_chars, n_tokens,
        |  round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS doc_frac,
        |  round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6)
        |    AS token_frac
        |FROM g ORDER BY lang, source""".stripMargin,
    "q_feature_scale" ->
      """WITH s AS (
        |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma,
        |    quantile_cont(value, 0.5) AS med,
        |    quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - s.mu) / nullif(s.sigma, 0), 6) AS z,
        |  round((e.value - s.med) / nullif(s.iqr, 0), 6) AS robust
        |FROM events e JOIN s USING (event_type)
        |ORDER BY event_id""".stripMargin,
    "q_feature_bucketize" ->
      """SELECT event_id, event_type, value,
        |  ntile(10) OVER (PARTITION BY event_type
        |    ORDER BY value ASC NULLS FIRST, event_id) AS bucket
        |FROM events ORDER BY event_id""".stripMargin,
    "q_embed_centroids" ->
      """SELECT label, CAST(pos - 1 AS INT) AS pos,
        |  round(avg(v), 6) AS centroid
        |FROM (SELECT label, unnest(embedding) AS v,
        |        generate_subscripts(embedding, 1) AS pos
        |      FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q_graph_pagerank" -> pagerankOracle(5),
    "q_graph_triangles" ->
      """WITH m AS (
        |  SELECT greatest(997, CAST(count(*) AS BIGINT) // 30) AS m
        |  FROM lineitem),
        |ue AS (
        |  SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
        |  FROM (SELECT l_orderkey % (SELECT m FROM m) AS x,
        |               l_partkey % (SELECT m FROM m) AS y FROM lineitem)
        |  WHERE x <> y),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM ue UNION ALL SELECT v FROM ue)
        |  GROUP BY node),
        |o AS (
        |  SELECT CASE WHEN du.deg < dv.deg
        |                OR (du.deg = dv.deg AND ue.u < ue.v)
        |           THEN ue.u ELSE ue.v END AS a,
        |         CASE WHEN du.deg < dv.deg
        |                OR (du.deg = dv.deg AND ue.u < ue.v)
        |           THEN ue.v ELSE ue.u END AS b
        |  FROM ue JOIN deg du ON ue.u = du.node
        |          JOIN deg dv ON ue.v = dv.node),
        |tri AS (
        |  SELECT o1.a, o1.b, o2.b AS c
        |  FROM o o1 JOIN o o2 ON o1.b = o2.a
        |  WHERE EXISTS (SELECT 1 FROM o o3
        |                WHERE o3.a = o1.a AND o3.b = o2.b)),
        |pn AS (
        |  SELECT node, count(*) AS n_tri FROM (
        |    SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri)
        |  GROUP BY node)
        |SELECT d.node, d.deg, COALESCE(pn.n_tri, 0) AS n_tri,
        |  CASE WHEN d.deg >= 2 THEN
        |    round(2.0 * COALESCE(pn.n_tri, 0) / (d.deg * (d.deg - 1)), 6)
        |  END AS clustering
        |FROM deg d LEFT JOIN pn USING (node) ORDER BY node""".stripMargin,
    "q_cluster_kmeans" -> Kmeans.oracleSql(),
    "q_feature_winsorize" ->
      """WITH s AS (
        |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  round(s.lo, 6) AS lo, round(s.hi, 6) AS hi,
        |  round(CASE WHEN e.value IS NULL THEN NULL
        |             WHEN e.value < s.lo THEN s.lo
        |             WHEN e.value > s.hi THEN s.hi
        |             ELSE e.value END, 6) AS winsorized,
        |  CASE WHEN e.value IS NULL THEN NULL
        |       ELSE (e.value < s.lo OR e.value > s.hi) END AS clipped
        |FROM events e JOIN s USING (event_type)
        |ORDER BY event_id""".stripMargin,
    "q_feature_decay" ->
      """WITH a AS (SELECT max(epoch_us(ts)) AS as_of FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  round(sum(value * pow(0.5,
        |    CAST(a.as_of - epoch_us(ts) AS DOUBLE) / 86400e6)), 6)
        |    AS decayed_sum
        |FROM events CROSS JOIN a
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
}
