package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain rule filtering — the blocklist curation stage every
  * web-crawl pipeline runs before content heuristics (RefinedWeb §3.1
  * "URL filtering", Penedo et al. 2023; FineWeb ships a ~4.6M-domain
  * blocklist): parse each document's URL into (host, tld, path) and gate
  * on (1) an exact-host blocklist RELATION, (2) host-suffix rules,
  * (3) TLD rules, (4) path regex rules.
  *
  * Scale shape: parsing and the literal rules (2)-(4) compile into the
  * row — zero exchanges; the host blocklist (1) is deduplicated (one
  * blocklist-bounded exchange, never corpus-bounded) and joined LEFT
  * OUTER on the extracted host. While the blocklist's cardinality fits
  * `maxBroadcastHosts` the join is an explicit BROADCAST, so the corpus
  * never shuffles (spec-pinned); past the cap — FineWeb's 4.6M-host list
  * is hundreds of MB serialized — the hint is withheld and both sides
  * hash-partition on the host key instead (the [[HistoryDedup]]
  * capped-broadcast pattern): slower, never fatal, output-identical
  * (spec-pinned). The bound comes free from the caller (`expectedHosts`,
  * blocklists ship with manifests) or, when absent, from one eager
  * map-side `approx_count_distinct` over the blocklist at plan
  * construction (2% rsd, 25% slack — blocklist-sized, never corpus-sized;
  * a miss past the cap is a resource error, never a wrong result).
  *
  * Determinism: the URL is lowercased inside [[parse]] (so the anchored
  * lowercase-scheme regexes cannot silently fail open on `HTTPS://…`
  * input) and parsing is three anchored regexes in the Java∩RE2 subset
  * (the t04 redaction convention), so an external engine reproduces
  * host/tld/path and every rule verdict bit-for-bit. `block_reason` is
  * the FIRST matching rule in the fixed precedence unparseable → host →
  * host_suffix → tld → path (null when kept) — the audit-trail convention
  * of [[Quality.flags]]. A URL whose host does not parse (scheme-less,
  * userinfo/port forms) is blocked as `unparseable`, NOT silently kept:
  * a filter that cannot check its rules must fail closed. */
object UrlFilter {

  /** Literal rule set; all matching runs on the lowercased URL. */
  final case class Rules(
      blockedTlds: Seq[String] = Nil,
      blockedHostSuffixes: Seq[String] = Nil,
      blockedPathPatterns: Seq[String] = Nil)

  private val hostRe = "^[a-z]+://([^/]+)"
  private val tldRe = "\\.([a-z]+)$"
  private val pathRe = "^[a-z]+://[^/]+(/.*)?$"

  private val claimed =
    Set("host", "path", "tld", "kept", "block_reason", "_bh", "_u")

  private def checkCarry(carry: Seq[String]): Unit = {
    val clash = carry.filter(claimed)
    require(clash.isEmpty,
      s"UrlFilter: carried columns ${clash.mkString(", ")} collide with " +
        s"the filter's own output columns — rename them first")
  }

  /** `(idCol, carry..., host, path, tld)` — empty strings where a
    * component is absent (both engines' no-match convention). `carry`
    * names metadata columns passed through unchanged — the composition
    * seam, so downstream stages never join back for them. */
  def parse(df: DataFrame, idCol: String, urlCol: String,
            carry: Seq[String] = Nil): DataFrame = {
    checkCarry(carry)
    df.select(col(idCol) +: carry.map(col) :+
        lower(col(urlCol)).as("_u"): _*)
      .select(col(idCol) +: carry.map(col) :+
        regexp_extract(col("_u"), hostRe, 1).as("host") :+
        regexp_extract(col("_u"), pathRe, 1).as("path"): _*)
      .withColumn("tld", regexp_extract(col("host"), tldRe, 1))
  }

  /** Per-doc verdict: `(idCol, carry..., host, tld, path, kept,
    * block_reason)`. `blockedHosts` is a one-column relation of exact
    * hosts (the FineWeb-style blocklist) — deduplicated here, so duplicate
    * rows in the caller's list can never multiply document rows; pass None
    * to skip rule (1). `expectedHosts ≥ 0` supplies the broadcast-cap
    * bound for free; when absent one eager HLL count over the blocklist
    * decides (see object scaladoc). */
  def flags(df: DataFrame, idCol: String, urlCol: String, rules: Rules,
            blockedHosts: Option[DataFrame] = None,
            hostCol: String = "host",
            carry: Seq[String] = Nil,
            maxBroadcastHosts: Long = 10L * 1000 * 1000,
            expectedHosts: Long = -1L): DataFrame = {
    checkCarry(carry)
    val parsed = parse(df, idCol, urlCol, carry)
    val joined = blockedHosts match {
      case Some(bl) =>
        val marks = bl.select(col(hostCol).as("host")).distinct()
          .withColumn("_bh", lit(true))
        val small =
          if (expectedHosts >= 0) expectedHosts <= maxBroadcastHosts
          else bl.agg(approx_count_distinct(col(hostCol), 0.02))
            .head().getLong(0) * 1.25 <= maxBroadcastHosts
        parsed.join(if (small) broadcast(marks) else marks,
          Seq("host"), "left")
      case None => parsed.withColumn("_bh", lit(null).cast("boolean"))
    }
    def anyOf(checks: Seq[Column]): Column =
      checks.foldLeft(lit(false))(_ || _)
    val suffixHit = anyOf(rules.blockedHostSuffixes.map(s =>
      col("host").endsWith(s)))
    val tldHit =
      if (rules.blockedTlds.isEmpty) lit(false)
      else col("tld").isin(rules.blockedTlds: _*)
    val pathHit = anyOf(rules.blockedPathPatterns.map(p =>
      col("path").rlike(p)))
    val reason = when(col("host") === "", "unparseable")
      .when(col("_bh").isNotNull, "host")
      .when(suffixHit, "host_suffix")
      .when(tldHit, "tld")
      .when(pathHit, "path")
    joined.select(col(idCol) +: carry.map(col) :+ col("host") :+
      col("tld") :+ col("path") :+ reason.isNull.as("kept") :+
      reason.as("block_reason"): _*)
  }

  /** The filter: documents whose URL passes every rule, ALL input columns
    * preserved. The payload rides [[flags]]'s `carry` seam — a narrow
    * projection plus the (normally broadcast) blocklist join — instead of
    * re-deriving the corpus and semi-joining it back, so the whole filter
    * stays exchange-free on the corpus side at any scale. */
  def filterDocs(df: DataFrame, idCol: String, urlCol: String, rules: Rules,
                 blockedHosts: Option[DataFrame] = None,
                 maxBroadcastHosts: Long = 10L * 1000 * 1000,
                 expectedHosts: Long = -1L): DataFrame =
    flags(df, idCol, urlCol, rules, blockedHosts,
      carry = df.columns.filterNot(_ == idCol).toSeq,
      maxBroadcastHosts = maxBroadcastHosts, expectedHosts = expectedHosts)
      .where(col("kept"))
      .select(df.columns.map(col).toSeq: _*)
}
