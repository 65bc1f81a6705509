package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Tables

/**
 * x128 — URL canonicalization + per-domain quota sampling, the
 * RefinedWeb-style (Penedo et al. 2023 §3.1) crawl-curation stage: a
 * handful of mega-domains dominate raw crawls, so curation caps the
 * documents any one REGISTERED DOMAIN contributes, after canonicalizing
 * URLs so the same page under trivially-different spellings (case, default
 * port, trailing slash, tracking params, fragment) keys identically.
 *
 * Canonicalization rules (the standard normalization set):
 *  - scheme and host lowercase; a leading `www.` label drops;
 *  - default ports drop (`:80` for http, `:443` for https); explicit
 *    non-default ports survive;
 *  - the fragment drops entirely;
 *  - trailing slashes on the path drop (the root path stays `/`);
 *  - tracking query params drop (`utm_*`, `ref`, `fbclid`, `gclid`);
 *    surviving params keep their order; an emptied query drops its `?`.
 *
 * The quota is enforced with a deterministic hash rank — `md5` of the
 * canonical URL — so the kept sample is stable across runs and clusters,
 * not first-N-in-scan-order (which at 100 TB is whatever the split
 * planner felt like). Plan shape: everything is map-side string work in
 * one projection; the only shuffle is the per-domain window (hash
 * partitioned BY DOMAIN — parallel across domains, the top-k inside a
 * domain never leaves one partition). Heavy-tailed mega-domains at
 * 100 TB: the window sorts that domain's rows on one executor — if one
 * domain exceeds a partition, pre-filter with an approximate per-domain
 * count and a hash-prefix pre-cut before ranking (documented upgrade,
 * same result).
 *
 * Fixtures lack a url column, so [[domainCap]] derives a deterministic
 * synthetic URL from (source, doc_id) — the same closed-form-fixture
 * trick as x127's lined corpus — exercising every canonicalization
 * branch: mixed-case scheme/host, `www.`/`cdn.Assets.` subdomains,
 * default and non-default ports, double trailing slashes, tracking and
 * non-tracking params, fragments.
 */
object UrlOps {

  private val trackingPrefixes =
    Seq("utm_", "ref=", "fbclid=", "gclid=")

  /** Canonical form of `url` per the rules above. Pure Column
    * composition — codegen'd builtins except the param filter (a
    * bounded higher-order fold over the split query, never a hot loop:
    * queries are a handful of params). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = substring_index(noFrag, "://", -1)
    // the authority ends at the FIRST of '/' or '?' — a query with no
    // path ("http://h.io:8080?q=1") must not leak into the host/port
    // (found by the seeded-random idempotence sweep, not the fixtures:
    // every synthetic fixture URL carries a path)
    val hostport = substring_index(substring_index(rest, "/", 1), "?", 1)
    val pathq = rest.substr(length(hostport) + lit(1), length(rest))
    val hostRaw = lower(substring_index(hostport, ":", 1))
    val host = when(hostRaw.startsWith("www."),
      hostRaw.substr(lit(5), length(hostRaw))).otherwise(hostRaw)
    val port = when(hostport.contains(":"),
      substring_index(hostport, ":", -1)).otherwise(lit(""))
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path = substring_index(pathq, "?", 1)
    val query = when(pathq.contains("?"),
      substring_index(pathq, "?", -1)).otherwise(lit(""))
    val pathStripped = regexp_replace(path, "/+$", "")
    val pathCanon = when(pathStripped === "", lit("/"))
      .otherwise(pathStripped)
    val keptParams = filter(split(query, "&"), t =>
      !trackingPrefixes.map(p => t.startsWith(p)).reduce(_ || _) &&
        t =!= "")
    val queryCanon = array_join(keptParams, "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      pathCanon,
      when(queryCanon =!= "", concat(lit("?"), queryCanon))
        .otherwise(lit("")))
  }

  /** Registered domain of a CANONICAL url: the last two host labels
    * (the public-suffix list is a deployment lookup table; the 2-label
    * rule is the fixture-complete core). */
  def registeredDomain(canonicalUrl: Column): Column = {
    val host = substring_index(substring_index(
      substring_index(substring_index(canonicalUrl, "://", -1), "/", 1),
      "?", 1), ":", 1)
    array_join(slice(split(host, "[.]"), -2, 2), ".")
  }

  /** Deterministic synthetic raw URL for a fixture doc — every
    * canonicalization branch reachable. */
  private def syntheticUrl: Column = expr(
    """concat(
      |  CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END, '://',
      |  CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
      |       WHEN doc_id % 3 = 1 THEN 'cdn.Assets.' ELSE '' END,
      |  source, '-', CAST(doc_id % 3 AS STRING), '.COM',
      |  CASE WHEN doc_id % 2 = 0 THEN ':80'
      |       WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END,
      |  '/Docs/', CAST(doc_id AS STRING),
      |  CASE WHEN doc_id % 4 = 0 THEN '//' ELSE '' END,
      |  CASE WHEN doc_id % 2 = 1 THEN concat('?utm_source=feed&id=',
      |    CAST(doc_id AS STRING), '&ref=x&utm_campaign=z') ELSE '' END,
      |  CASE WHEN doc_id % 7 = 0 THEN '#Section-2' ELSE '' END)"""
      .stripMargin)

  /** x128 driver entry: canonicalize, extract registered domain, rank
    * docs per domain by md5(canonical url), cap at `maxPerDomain`. */
  def domainCap(spark: SparkSession, dir: String, maxPerDomain: Int = 5)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("url_canonical", canonicalizeUrl(syntheticUrl))
      .withColumn("domain", registeredDomain(col("url_canonical")))
    val w = Window.partitionBy(col("domain"))
    docs
      .withColumn("n_docs_domain", count(lit(1)).over(w))
      .withColumn("domain_rank", row_number().over(
          w.orderBy(md5(col("url_canonical")), col("doc_id")))
        .cast("long"))
      .withColumn("kept", col("domain_rank") <= maxPerDomain)
      .select(col("doc_id"), col("url_canonical"), col("domain"),
        col("n_docs_domain"), col("domain_rank"), col("kept"))
      .orderBy(col("doc_id"))
  }
}
