package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
 * The registered domain is public-suffix aware: hosts under a 2-level
 * public suffix (`foo.co.uk`, `user.github.io`) key one label deeper
 * than plain TLDs, via a longest-matching-suffix lookup over a small
 * broadcast PSL subset ([[publicSuffixes]] — a deployment swaps in the
 * full publicsuffix.org table through the same rule). Without this,
 * every `.uk` site merges into ONE `co.uk` quota bucket — the first
 * real crawl corpus hits it.
 *
 * The quota is enforced with a deterministic hash rank — `md5` of the
 * canonical URL — so the kept sample is stable across runs and clusters,
 * not first-N-in-scan-order (which at 100 TB is whatever the split
 * planner felt like). OUTPUT CONTRACT: the kept rows (the capped corpus)
 * plus each row's exact rank and its domain's exact total count. Dropped
 * rows carry no rank on purpose: an exact rank for EVERY row of a domain
 * is information-theoretically a full per-domain sort — exactly the
 * unbounded-partition hotspot this operator must avoid at 100 TB.
 *
 * Plan shape (the mega-domain-safe two-phase rank): the canonical URL,
 * domain and salt are one map-side projection; phase 1 ranks inside
 * (domain, salt) slices — a heavy-tailed mega-domain splits across
 * [[saltBuckets]] partitions, so no single sort ever sees more than
 * ~1/saltBuckets of it — and keeps each slice's top `cap`; phase 2 ranks
 * the surviving ≤ saltBuckets×cap rows per domain. Any row in the domain
 * top-cap is in its slice's top-cap (it has fewer smaller md5s in its
 * slice than in the whole domain), so the result is PROVABLY identical
 * to the unbounded single-window rank — pinned against the reference
 * implementation on a planted mega-domain corpus in ExtSpec. The exact
 * domain total rides along for free: each slice's rank-1 row (which
 * always survives phase 1) carries its slice's row count, and phase 2
 * sums them — no separate count aggregate, no unbounded
 * `count().over(domain)`. One full shuffle (by domain+salt), one
 * cap-sized shuffle (by domain), zero joins.
 *
 * Fixtures lack a url column, so [[domainCap]] derives a deterministic
 * synthetic URL from (source, doc_id) — the same closed-form-fixture
 * trick as x127's lined corpus — exercising every canonicalization
 * branch: mixed-case scheme/host, `www.`/`cdn.Assets.` subdomains,
 * default and non-default ports, double trailing slashes, tracking and
 * non-tracking params, fragments, 2-level public suffixes, a
 * single-label intranet host, and a no-path URL whose query must not
 * leak into the host.
 */
object UrlOps {

  private val trackingPrefixes =
    Seq("utm_", "ref=", "fbclid=", "gclid=")

  /** 2-level entries of the public suffix list (publicsuffix.org) that
    * real crawls hit first; the registered-domain rule is
    * longest-matching-suffix, so a deployment swaps in the full table
    * without touching the rule. Kept tiny here: it ships as literals
    * inside one codegen'd CASE chain (the broadcast-lookup shape for a
    * list this size). */
  private[ext] val publicSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au",
    "co.jp", "co.nz", "co.in", "com.br", "github.io", "blogspot.com")

  /** Suffixes ordered for longest-match-first evaluation (more labels
    * beat fewer; ties alphabetical for determinism). */
  private def orderedSuffixes: Seq[String] =
    publicSuffixes.sortBy(s => (-s.count(_ == '.'), s))

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
    // every synthetic fixture URL used to carry a path; doc_id % 11
    // now plants the case)
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

  /** Registered domain of a CANONICAL url, public-suffix aware: the
    * longest matching [[publicSuffixes]] entry plus one more label;
    * a host that IS a public suffix keys as itself; otherwise the last
    * two labels, clamped to the whole host for single-label hosts
    * (`intranet`). */
  def registeredDomain(canonicalUrl: Column): Column = {
    val host = substring_index(substring_index(
      substring_index(substring_index(canonicalUrl, "://", -1), "/", 1),
      "?", 1), ":", 1)
    val labels = split(host, "[.]")
    // default rule: last 2 labels, clamped (slice(-2,2) on a 1-element
    // array is EMPTY in Spark where DuckDB's [-2:] clamps — the
    // cross-engine divergence the clamp removes)
    val base = when(size(labels) <= 2, host)
      .otherwise(array_join(slice(labels, -2, 2), "."))
    val chain = orderedSuffixes.foldLeft(Option.empty[Column]) {
      (acc, sfx) =>
        val n = sfx.count(_ == '.') + 1 // labels in the suffix
        val hit = host === sfx || host.endsWith("." + sfx)
        // endsWith(".sfx") implies >= n+1 labels, so the slice is full
        val v = when(host === sfx, host)
          .otherwise(array_join(slice(labels, -(n + 1), n + 1), "."))
        Some(acc.fold(when(hit, v))(_.when(hit, v)))
    }
    chain.get.otherwise(base)
  }

  /** The registered-domain rule as DuckDB SQL over a host expression —
    * generated from the SAME [[publicSuffixes]] list as the Column
    * implementation so the two can never drift. `labelsExpr` must be
    * `string_split(host, '.')`. */
  def registeredDomainSqlDuck(hostExpr: String,
      labelsExpr: String): String = {
    val arms = orderedSuffixes.flatMap { sfx =>
      val n = sfx.count(_ == '.') + 1
      Seq(
        s"WHEN $hostExpr = '$sfx' THEN $hostExpr",
        s"WHEN ends_with($hostExpr, '.$sfx') THEN " +
          s"array_to_string($labelsExpr[-${n + 1}:], '.')")
    }
    (s"CASE ${arms.mkString(" ")} " +
      s"ELSE CASE WHEN len($labelsExpr) <= 2 THEN $hostExpr " +
      s"ELSE array_to_string($labelsExpr[-2:], '.') END END")
  }

  /** Deterministic synthetic raw URL for a fixture doc — every
    * canonicalization + registered-domain branch reachable. */
  private def syntheticUrl: Column = expr(
    """concat(
      |  CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END, '://',
      |  CASE WHEN doc_id % 13 = 0 THEN 'Intranet'
      |    ELSE concat(
      |      CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
      |           WHEN doc_id % 3 = 1 THEN 'cdn.Assets.' ELSE '' END,
      |      source, '-', CAST(doc_id % 3 AS STRING),
      |      CASE WHEN doc_id % 5 = 0 THEN '.COM'
      |           WHEN doc_id % 5 = 1 THEN '.CO.UK'
      |           WHEN doc_id % 5 = 2 THEN '.GitHub.IO'
      |           WHEN doc_id % 5 = 3 THEN '.COM.AU'
      |           ELSE '.ORG' END) END,
      |  CASE WHEN doc_id % 2 = 0 THEN ':80'
      |       WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END,
      |  CASE WHEN doc_id % 11 = 0 THEN ''
      |    ELSE concat('/Docs/', CAST(doc_id AS STRING),
      |      CASE WHEN doc_id % 4 = 0 THEN '//' ELSE '' END) END,
      |  CASE WHEN doc_id % 2 = 1 THEN concat('?utm_source=feed&id=',
      |    CAST(doc_id AS STRING), '&ref=x&utm_campaign=z') ELSE '' END,
      |  CASE WHEN doc_id % 7 = 0 THEN '#Section-2' ELSE '' END)"""
      .stripMargin)

  /** The mega-domain-safe cap over a prepared (doc_id, url_canonical,
    * domain) frame — the two-phase rank documented on the object.
    * Exposed for the ExtSpec identity pin against
    * [[capDomainsUnbounded]]. */
  private[graft] def capDomains(docs: DataFrame, maxPerDomain: Int,
      saltBuckets: Int): DataFrame = {
    val order = Seq(md5(col("url_canonical")), col("doc_id"))
    val sliceW = Window.partitionBy(col("domain"), col("salt"))
    val salted = docs
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(saltBuckets)))
      .withColumn("slice_rank", row_number().over(
        sliceW.orderBy(order: _*)))
      .withColumn("slice_n", count(lit(1)).over(sliceW))
      .where(col("slice_rank") <= maxPerDomain)
    val domW = Window.partitionBy(col("domain"))
    salted
      .withColumn("n_docs_domain",
        sum(when(col("slice_rank") === 1, col("slice_n"))).over(domW))
      .withColumn("domain_rank",
        row_number().over(domW.orderBy(order: _*)).cast("long"))
      .where(col("domain_rank") <= maxPerDomain)
      .select(col("doc_id"), col("url_canonical"), col("domain"),
        col("n_docs_domain"), col("domain_rank"))
  }

  /** The reference single-window rank — O(domain) sort on one executor,
    * correct but NOT mega-domain-safe; exists only as the ExtSpec
    * identity oracle for [[capDomains]]. */
  private[graft] def capDomainsUnbounded(docs: DataFrame,
      maxPerDomain: Int): DataFrame = {
    val w = Window.partitionBy(col("domain"))
    docs
      .withColumn("n_docs_domain", count(lit(1)).over(w))
      .withColumn("domain_rank", row_number().over(
          w.orderBy(md5(col("url_canonical")), col("doc_id")))
        .cast("long"))
      .where(col("domain_rank") <= maxPerDomain)
      .select(col("doc_id"), col("url_canonical"), col("domain"),
        col("n_docs_domain"), col("domain_rank"))
  }

  /** x128 driver entry: canonicalize, extract the registered domain,
    * keep each domain's `maxPerDomain` docs by md5(canonical url) rank
    * via the bounded two-phase window. */
  def domainCap(spark: SparkSession, dir: String, maxPerDomain: Int = 5,
      saltBuckets: Int = 32): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("url_canonical", canonicalizeUrl(syntheticUrl))
      .withColumn("domain", registeredDomain(col("url_canonical")))
      .select(col("doc_id"), col("url_canonical"), col("domain"))
    capDomains(docs, maxPerDomain, saltBuckets)
      .orderBy(col("doc_id"))
  }

  /** The fixture documents with canonical URL + registered domain
    * attached — the shared input frame of x128 and x139. */
  private def docsWithDomain(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("url_canonical", canonicalizeUrl(syntheticUrl))
      .withColumn("domain", registeredDomain(col("url_canonical")))

  /** Deterministic membership rule standing in for the external opt-out
    * registry (engine-shared md5 closed form): ~1/4 of domains. */
  private val optOutRuleSpark =
    "CAST(conv(substring(md5(concat('optout:', domain)), 1, 8), 16, 10)" +
      " AS BIGINT) % 4 = 0"
  private[ext] val optOutRuleDuck =
    "('0x' || substr(md5('optout:' || domain), 1, 8))::BIGINT % 4 = 0"

  /**
   * x139 — OPT-OUT / COMPLIANCE FILTER (the robots-opt-out stage of
   * RefinedWeb/CommonCrawl curation, and the crawl-side face of the
   * kq57/kq104 right-to-erasure family): drop every document whose
   * REGISTERED DOMAIN (the x128 public-suffix-aware rule — an opt-out
   * by `example.co.uk` must catch `cdn.assets.example.co.uk`) appears
   * in an opt-out registry, and account for the drops EXACTLY per
   * source — the dataset-card line item (x85) a compliance review
   * reads first.
   *
   * The registry is a tiny external table in production; here it
   * derives deterministically from the corpus's own domain universe by
   * a pinned md5 rule (~25% of domains), built as one bounded
   * distinct-aggregate. The enforcement join BROADCASTS the registry —
   * at 100 TB the corpus side stays map-only (scan → hash-probe →
   * partial agg): no shuffle of the documents, the same plan shape as
   * x31's decontamination probe. The structural `.limit` bounds the
   * broadcast side in the plan itself (registries are thousands of
   * domains, never corpus-scale). Output: per-source (n_docs,
   * n_dropped, n_kept, n_optout_domains) — all exact integers; the
   * kept corpus is the `opted_out IS NULL` leg of the same join.
   */
  def optOutFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsWithDomain(spark, dir)
      .select(col("doc_id"), col("source"), col("domain"))
      .localCheckpoint()
    // registry-sized, plan-visible broadcast bound (TakeOrdered): the
    // ORDER BY makes the kept subset DETERMINISTIC should the opted-out
    // domain universe ever exceed the cap — a bare limit would keep an
    // arbitrary per-run subset and silently pass opted-out documents
    // (round-15 ADVICE); the oracle mirrors the same ordered cap.
    val optOut = docs.select(col("domain")).distinct()
      .where(expr(optOutRuleSpark))
      .orderBy(col("domain")).limit(100000)
      .withColumn("opted_out", lit(1L))
    docs.join(broadcast(optOut), Seq("domain"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("opted_out").isNotNull, 1L).otherwise(0L))
          .as("n_dropped"),
        sum(when(col("opted_out").isNull, 1L).otherwise(0L)).as("n_kept"),
        countDistinct(when(col("opted_out").isNotNull, col("domain")))
          .as("n_optout_domains"))
      .orderBy(col("source"))
  }

  /** The synthetic-URL + canonicalization + registered-domain chain as
    * DuckDB CTEs (`d` .. `v`), generated HERE so the x128 and x139
    * oracles share one text with the Scala side's suffix table
    * ([[registeredDomainSqlDuck]]) — the engines cannot drift. Carries
    * (doc_id, source) through every stage; `v` exposes
    * (doc_id, source, url_canonical, domain). split_part matches
    * substring_index on always-present separators; the hostport cut
    * takes the FIRST of '/' or '?' on both sides (doc_id % 11 plants a
    * no-path URL with a query); the last-2-labels fallback clamps to
    * the whole host for single-label hosts (doc_id % 13 plants
    * 'Intranet') exactly like the Spark size-guard. */
  def urlDomainCteDuck: String =
    s"""d AS (SELECT doc_id, source,
       |    CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END
       |    || '://' ||
       |    CASE WHEN doc_id % 13 = 0 THEN 'Intranet'
       |      ELSE CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
       |           WHEN doc_id % 3 = 1 THEN 'cdn.Assets.' ELSE '' END
       |      || source || '-' || CAST(doc_id % 3 AS VARCHAR) ||
       |      CASE WHEN doc_id % 5 = 0 THEN '.COM'
       |           WHEN doc_id % 5 = 1 THEN '.CO.UK'
       |           WHEN doc_id % 5 = 2 THEN '.GitHub.IO'
       |           WHEN doc_id % 5 = 3 THEN '.COM.AU'
       |           ELSE '.ORG' END END ||
       |    CASE WHEN doc_id % 2 = 0 THEN ':80'
       |         WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0 THEN ''
       |      ELSE '/Docs/' || CAST(doc_id AS VARCHAR) ||
       |        CASE WHEN doc_id % 4 = 0 THEN '//' ELSE '' END END ||
       |    CASE WHEN doc_id % 2 = 1 THEN '?utm_source=feed&id=' ||
       |      CAST(doc_id AS VARCHAR) || '&ref=x&utm_campaign=z'
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0 THEN '#Section-2' ELSE '' END
       |      AS url
       |  FROM documents),
       |q AS (SELECT doc_id, source,
       |    lower(split_part(split_part(url, '#', 1), '://', 1))
       |      AS scheme,
       |    split_part(split_part(url, '#', 1), '://', 2) AS rest
       |  FROM d),
       |r AS (SELECT doc_id, source, scheme,
       |    split_part(split_part(rest, '/', 1), '?', 1) AS hostport,
       |    substr(rest, length(split_part(split_part(rest, '/', 1),
       |      '?', 1)) + 1) AS pathq
       |  FROM q),
       |s AS (SELECT doc_id, source, scheme, pathq,
       |    CASE WHEN starts_with(lower(split_part(hostport, ':', 1)),
       |        'www.')
       |      THEN substr(lower(split_part(hostport, ':', 1)), 5)
       |      ELSE lower(split_part(hostport, ':', 1)) END AS host,
       |    CASE WHEN contains(hostport, ':')
       |      THEN split_part(hostport, ':', 2) ELSE '' END AS port
       |  FROM r),
       |t AS (SELECT doc_id, source, host,
       |    CASE WHEN port <> '' AND NOT
       |        ((scheme = 'http' AND port = '80') OR
       |         (scheme = 'https' AND port = '443'))
       |      THEN ':' || port ELSE '' END AS portpart,
       |    CASE WHEN regexp_replace(split_part(pathq, '?', 1),
       |        '/+$$', '') = '' THEN '/'
       |      ELSE regexp_replace(split_part(pathq, '?', 1), '/+$$', '')
       |      END AS path, scheme,
       |    array_to_string(list_filter(string_split(
       |      CASE WHEN contains(pathq, '?')
       |        THEN split_part(pathq, '?', 2) ELSE '' END, '&'),
       |      x -> NOT (starts_with(x, 'utm_') OR starts_with(x, 'ref=')
       |        OR starts_with(x, 'fbclid=') OR starts_with(x, 'gclid=')
       |        OR x = '')), '&') AS q2
       |  FROM s),
       |u AS (SELECT doc_id, source,
       |    scheme || '://' || host || portpart || path ||
       |      CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END
       |      AS url_canonical,
       |    host, string_split(host, '.') AS labels
       |  FROM t),
       |v AS (SELECT doc_id, source, url_canonical,
       |    ${registeredDomainSqlDuck("host", "labels")} AS domain
       |  FROM u)""".stripMargin
}
