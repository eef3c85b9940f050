package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level corpus curation — the C4/RefinedWeb-style pass a
  * crawl-corpus user runs on day one: extract the host, drop blocklisted
  * hosts/domains, and cap each registrable domain's contribution so no
  * single site dominates the training mix (RefinedWeb §3.1 caps
  * per-domain document counts; C4 filters by a host blocklist).
  *
  * The reference has no URL surface (its sources are databases,
  * base_loader.py) — SURVEY §7.5 extension set, composing three
  * already-oracled primitives: `parse_url` host extraction (built-in),
  * a broadcast anti-join against the (tiny) blocklist, and the A-ES
  * uniform-weight priority draw ([[Sampling.hashDraw]] — with w = 1,
  * priority `u^(1/w)` reduces to the raw md5 draw) capped per domain
  * through [[TopKPerKey]]'s bounded-buffer aggregate.
  *
  * Scale shape: host/domain extraction is map-only codegen'd built-ins;
  * the blocklist is broadcast (a real blocklist is ~10⁵ rows — far
  * under any broadcast threshold); the cap is ONE hash shuffle on the
  * domain key where a hot domain (half the crawl on one CDN) ships at
  * most `cap` rows per input partition to the reduce side — the exact
  * hot-key story measured for [[TopKPerKey]] in SCALE.md. The draw is
  * a pure function of (id, seed): repartition-, run- and
  * engine-invariant, so the KEPT SET is exactly reproducible (and
  * DuckDB-restatable — `q_curate_url_filter`).
  */
object UrlCurate {

  /** Lowercased host of a URL (`try_parse_url HOST` — codegen'd
    * built-in; NULL for unparseable urls, which a 100 TB crawl always
    * contains — ANSI `parse_url` would kill the stage on the first
    * one). */
  def host(url: Column): Column = lower(try_parse_url(url, lit("HOST")))

  /** Registrable-ish domain: the last two dot-labels of the host
    * (`example.com` of `a.b.example.com`), the host itself when it has
    * fewer. A production deployment swaps in the public-suffix list;
    * the two-label heuristic keeps the operator dependency-free and is
    * what the oracle restates. */
  def registrableDomain(hostCol: Column): Column = {
    val parts = split(hostCol, "\\.")
    when(size(parts) >= 2, concat_ws(".", slice(parts, -2, 2)))
      .otherwise(hostCol)
  }

  /** Blocklist + per-domain cap: of `docs`, keep rows whose host parses,
    * whose host AND registrable domain both miss `blocklist` (a
    * domain-level entry blocks every subdomain's host with it), and —
    * per registrable domain — only the `perDomainCap` docs with the
    * highest md5 draw (A-ES at uniform weight: deterministic,
    * partitioning-invariant; ties break toward the larger id, matching
    * [[TopKPerKey]]'s (score, payload) order). Returns survivors as
    * `(idCol, host, domain)`. */
  def filter(docs: DataFrame, urlCol: String, idCol: String,
      blocklist: Seq[String], perDomainCap: Int,
      seed: String = "url"): DataFrame = {
    require(perDomainCap > 0, "perDomainCap must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val withHost = docs
      .select(col(idCol), host(col(urlCol)).as("host"))
      .where(col("host").isNotNull)
      .withColumn("domain", registrableDomain(col("host")))
    val bl = blocklist.map(_.toLowerCase).toDF("blocked")
    val allowed = withHost.join(broadcast(bl),
      col("host") === col("blocked") || col("domain") === col("blocked"),
      "left_anti")
      .localCheckpoint(true) // consumed twice: cap draw + survivor join
    val drawn = allowed.withColumn("__u",
      conv(Sampling.hashDraw(col(idCol), seed), 16, 10).cast("long")
        .cast("double"))
    val kept = TopKPerKey(drawn, "domain", "__u", idCol, perDomainCap)
      .select(col("payload").as(idCol))
    allowed.join(kept, Seq(idCol), "left_semi")
  }

  /** Centrality-weighted per-domain cap (RefinedWeb §3.1 spirit:
    * weight a domain's contribution by its link-graph standing instead
    * of a uniform cap): build the domain→domain link graph from each
    * page's outlink, rank it with [[Graph.pagerank]] (domain STRINGS
    * as nodes), and cap each registrable domain at
    * `clamp(baseCap · pr_d · |domains|, 1, maxCap)` — `pr_d · n` is
    * relative centrality (1 = average domain), so an average domain
    * keeps `baseCap` docs, hubs keep proportionally more, periphery
    * decays to the floor of 1. Keeps per domain are the top-cap rows
    * of the same A-ES uniform draw as [[filter]].
    *
    * Exactness: pr is quantized to `prQ = round(round(pr,7)·1e7)` (the
    * 7-decimal rounding the pagerank gate pins engine-equal; the outer
    * round absorbs the ·1e7 float wobble), and the cap is then PURE
    * INTEGER arithmetic `(prQ · baseCap · n) div 1e7` — so the KEPT
    * SET is exactly restatable, never one-off at a floor boundary.
    *
    * Scale shape: the edge list is domain-level (distinct'd — orders
    * of magnitude smaller than the page corpus), pagerank's iterations
    * are bounded by [[Graph.pagerank]]'s resident-edge layout, the cap
    * table is |domains| rows broadcast back, and the per-domain draw
    * ships ≤ maxCap rows per input partition ([[TopKPerKey]]) with the
    * variable cap applied as a rank filter on that bounded set.
    * Returns survivors as `(idCol, host, domain, cap)`. */
  def rankWeightedCap(docs: DataFrame, urlCol: String, outUrlCol: String,
      idCol: String, baseCap: Int, maxCap: Int, iters: Int = 5,
      damping: Double = 0.85, seed: String = "url"): DataFrame = {
    require(baseCap > 0 && maxCap >= baseCap,
      s"need 0 < baseCap <= maxCap, got ($baseCap, $maxCap)")
    val pages = docs
      .select(col(idCol), host(col(urlCol)).as("host"),
        host(col(outUrlCol)).as("__oh"))
      .where(col("host").isNotNull)
      .withColumn("domain", registrableDomain(col("host")))
      .withColumn("__od", registrableDomain(col("__oh")))
      .localCheckpoint(true) // consumed by edges, the draw and the join
    val edges = pages.where(col("__od").isNotNull)
      .select(col("domain").as("src"), col("__od").as("dst"))
    val pr = Graph.pagerank(edges, iters, damping)
    val nD = pr.agg(count(lit(1)).as("__n"))
    val caps = pr.crossJoin(broadcast(nD))
      .select(col("node").as("domain"),
        greatest(lit(1L), least(lit(maxCap.toLong),
          expr(s"(CAST(round(round(pr, 7) * 1e7, 0) AS BIGINT) * " +
            s"${baseCap}L * __n) div 10000000")))
          .as("cap"))
    val drawn = pages.withColumn("__u",
      conv(Sampling.hashDraw(col(idCol), seed), 16, 10).cast("long")
        .cast("double"))
    // a domain absent from the link graph (no parseable outlink on any
    // of its pages) has no rank signal — it keeps the neutral baseCap
    val kept = TopKPerKey(drawn, "domain", "__u", idCol, maxCap)
      .join(broadcast(caps), col("key") === caps("domain"), "left")
      .withColumn("cap", coalesce(col("cap"), lit(baseCap.toLong)))
      .where(col("rank") <= col("cap"))
      .select(col("payload").as(idCol), col("cap"))
    pages.select(col(idCol), col("host"), col("domain"))
      .join(kept, Seq(idCol))
  }
}
