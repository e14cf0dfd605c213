package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-curation normalizer that runs before
  * URL-level dedup and host-level policy decisions: raw crawl URLs differ
  * in case, default ports, tracking parameters, and fragments while naming
  * the same resource, so exact URL dedup without canonicalization both
  * under-merges (same page, different tracking tag) and over-counts hosts.
  *
  * Canonical form applied here (the widely-shared subset of RFC 3986
  * normalization plus tracking-param hygiene):
  *   - scheme and host lowercased (path/query case is semantic — kept);
  *   - default port stripped (`:80` for http, `:443` for https);
  *   - fragment dropped (never sent to the server);
  *   - `utm_*` query parameters removed; parameter order otherwise kept
  *     (re-sorting changes semantics for duplicate keys);
  *   - empty query suffix (`?` with nothing surviving) dropped.
  *
  * Parity: every step is string/array arithmetic with an exact DuckDB
  * counterpart (`substring_index`↔`split_part`, `instr`↔`strpos`, array
  * filter + rejoin — NO regex anywhere), so the oracle replays the
  * transform byte-identically. Envelope: exactly one `://` (the oracle's
  * `split_part` returns '' where Spark's `substring_index(…,-1)` echoes
  * the input, so scheme-less strings are out of contract), query splits
  * on `&` only — `;` separators and percent-encoding normalization need
  * a full RFC parser (the same out-of-JVM seam as the PDF rasterizer).
  *
  * Scale shape: pure per-row projection, zero shuffles until the caller's
  * rollup; the host rollup is one map-side-combined aggregation.
  */
object Urls {

  private val MaxLen = 1 << 20

  /** Lowercased host with the scheme's default port stripped. */
  private def canonHost(scheme: Column, hostPort: Column): Column = {
    val host = lower(hostPort)
    when(scheme === "http" && host.endsWith(":80"),
      host.substr(lit(1), length(host) - 3))
      .when(scheme === "https" && host.endsWith(":443"),
        host.substr(lit(1), length(host) - 4))
      .otherwise(host)
  }

  private def parts(url: Column): (Column, Column, Column) = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = substring_index(noFrag, "://", -1)
    val hostPort = substring_index(substring_index(rest, "/", 1), "?", 1)
    val pathQ = rest.substr(length(hostPort) + 1, lit(MaxLen))
    (scheme, hostPort, pathQ)
  }

  /** Canonical form of a URL column (see object doc for the contract). */
  def canonicalizeUrl(url: Column): Column = {
    val (scheme, hostPort, pathQ) = parts(url)
    val path = substring_index(pathQ, "?", 1)
    val query = when(instr(pathQ, "?") > 0,
      pathQ.substr(instr(pathQ, "?") + 1, lit(MaxLen))).otherwise("")
    val kept = filter(split(query, "&"), t => !t.startsWith("utm_"))
    val keptStr = concat_ws("&", kept)
    val suffix = when(keptStr === "", "").otherwise(concat(lit("?"), keptStr))
    concat(scheme, lit("://"), canonHost(scheme, hostPort), path, suffix)
  }

  /** Canonical host of a URL column (lowercased, default port stripped). */
  def urlHost(url: Column): Column = {
    val (scheme, hostPort, _) = parts(url)
    canonHost(scheme, hostPort)
  }

  /** Host-level canonicalization rollup — the crawl-frontier readout:
    * per canonical host, how many raw URLs it received, how many DISTINCT
    * canonical URLs they collapse to, and how many raw forms the
    * normalizer actually changed.
    *
    * @return one row per host: host, n_urls, n_canonical, n_changed
    */
  def hostRollup(urls: DataFrame, urlCol: Column): DataFrame =
    urls
      .select(urlHost(urlCol).as("host"), urlCol.as("raw"),
        canonicalizeUrl(urlCol).as("canonical"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("canonical")).as("n_canonical"),
        sum(when(col("raw") =!= col("canonical"), 1L).otherwise(0L))
          .as("n_changed"))

  /** Robots-style disallow filtering: a URL is blocked when its canonical
    * host has a rule whose PATH PREFIX matches — the longest-standing
    * crawl-compliance contract (robots.txt `Disallow:` lines are literal
    * prefixes; `*`/`$` wildcard extensions are out of this envelope, the
    * same documented-subset style as the canonicalizer). Rules are a tiny
    * broadcast table; a URL matched by several rules is still ONE blocked
    * URL (max-aggregated per URL before the rollup).
    *
    * Scale shape: canonical host/path are per-row projections; the rule
    * probe is a broadcast left join on host + `startsWith` (O(rules/host)
    * per URL — real disallow lists are short; a 10k-rule host would move
    * to a prefix-trie kernel, the BlocklistCounts discipline); rollup is
    * host-cardinality.
    *
    * Empty-prefix convention: a robots.txt `Disallow:` line with an EMPTY
    * value means allow-all (RFC 9309 §2.2.2), so empty-prefix rules are
    * dropped here — a naive `startsWith("")` would invert that common
    * rule form into block-everything-on-host. Block-all is spelled
    * `Disallow: /`, which this operator honors as the "/" prefix.
    *
    * @return host, n_urls, n_blocked
    */
  def robotsFilter(urls: DataFrame, idCol: Column, urlCol: Column,
                   rules: Seq[(String, String)]): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val ruleDf = rules.filter(_._2.nonEmpty).toDF("host", "prefix")
    val parsed = urls.select(idCol.as("__id"), urlHost(urlCol).as("host"),
      canonicalizeUrl(urlCol).as("canon"))
      .withColumn("path", substring_index(
        expr("substring(canon, length(host) + instr(canon, '://') + 3)"),
        "?", 1))
    parsed
      .join(broadcast(ruleDf), Seq("host"), "left_outer")
      .withColumn("hit",
        when(col("prefix").isNotNull && col("path").startsWith(col("prefix")),
          1L).otherwise(0L))
      .groupBy(col("host"), col("__id"))
      .agg(max(col("hit")).as("blocked"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"), sum(col("blocked")).as("n_blocked"))
  }

  /** Crawl politeness audit: per host, fetch counts bucketed into
    * fixed event-time windows and rolled up to the numbers a crawl
    * scheduler is judged on — total fetches, active buckets, the PEAK
    * per-bucket rate, and how many buckets exceeded the politeness
    * limit. A host with `over_limit_buckets > 0` was hit harder than
    * policy allows; the readout is the evidence either way.
    *
    * `ts` follows the epoch-ns long contract; the bucket is the exact
    * integer `ts div bucketNs`. Scale shape: two map-side-combined
    * aggregations — (host, bucket) grain then host grain — no windows,
    * no joins; output is host-cardinality.
    *
    * @return host, n_fetches, n_active_buckets, peak_per_bucket,
    *         over_limit_buckets
    */
  def fetchRateAudit(fetches: DataFrame, host: Column,
                     bucketNs: Long, limit: Int): DataFrame =
    fetches
      .select(host.as("host"), expr(s"ts div ${bucketNs}L").as("bucket"))
      .groupBy(col("host"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("host"))
      .agg(sum(col("n")).as("n_fetches"),
        count(lit(1)).as("n_active_buckets"),
        max(col("n")).as("peak_per_bucket"),
        sum(when(col("n") > limit, 1L).otherwise(0L))
          .as("over_limit_buckets"))
}
