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
  * row — zero exchanges; the host blocklist (1) is a bounded relation
  * (millions of hosts ≪ corpus) joined BROADCAST LEFT OUTER on the
  * extracted host, so the corpus never shuffles at any scale
  * (spec-pinned: zero shuffle exchanges in the whole plan).
  *
  * Determinism: parsing is three anchored regexes in the Java∩RE2 subset
  * (the t04 redaction convention), so an external engine reproduces
  * host/tld/path and every rule verdict bit-for-bit. `block_reason` is
  * the FIRST matching rule in the fixed precedence host → host_suffix →
  * tld → path (null when kept) — the audit-trail convention of
  * [[Quality.flags]]. */
object UrlFilter {

  /** Literal rule set; all matching is case-sensitive on the already-
    * lowercased URL (lowercase upstream if the crawl is not). */
  final case class Rules(
      blockedTlds: Seq[String] = Nil,
      blockedHostSuffixes: Seq[String] = Nil,
      blockedPathPatterns: Seq[String] = Nil)

  private val hostRe = "^[a-z]+://([^/]+)"
  private val tldRe = "\\.([a-z]+)$"
  private val pathRe = "^[a-z]+://[^/]+(/.*)?$"

  /** `(idCol, host, tld, path)` — empty strings where a component is
    * absent (both engines' no-match convention). */
  def parse(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol),
        regexp_extract(col(urlCol), hostRe, 1).as("host"),
        regexp_extract(col(urlCol), pathRe, 1).as("path"))
      .withColumn("tld", regexp_extract(col("host"), tldRe, 1))

  /** Per-doc verdict: `(idCol, host, tld, path, kept, block_reason)`.
    * `blockedHosts` is a one-column relation of exact hosts (the
    * FineWeb-style blocklist); pass None to skip rule (1). */
  def flags(df: DataFrame, idCol: String, urlCol: String, rules: Rules,
            blockedHosts: Option[DataFrame] = None,
            hostCol: String = "host"): DataFrame = {
    val parsed = parse(df, idCol, urlCol)
    val joined = blockedHosts match {
      case Some(bl) =>
        val marks = bl.select(col(hostCol).as("host"), lit(true).as("_bh"))
        parsed.join(broadcast(marks), Seq("host"), "left")
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
    val reason = when(col("_bh").isNotNull, "host")
      .when(suffixHit, "host_suffix")
      .when(tldHit, "tld")
      .when(pathHit, "path")
    joined.select(col(idCol), col("host"), col("tld"), col("path"),
      reason.isNull.as("kept"), reason.as("block_reason"))
  }

  /** The filter: documents whose URL passes every rule. */
  def filterDocs(df: DataFrame, idCol: String, urlCol: String, rules: Rules,
                 blockedHosts: Option[DataFrame] = None): DataFrame =
    df.join(flags(df, idCol, urlCol, rules, blockedHosts)
        .where(col("kept")).select(col(idCol)),
      Seq(idCol), "left_semi")
}
