package graft

import graft.operators.UrlFilter
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class UrlFilterSpec extends SparkSpec {
  import spark.implicits._

  private val rules = UrlFilter.Rules(
    blockedTlds = Seq("xyz"),
    blockedHostSuffixes = Seq("-ads.com"),
    blockedPathPatterns = Seq("^/tracker(/|$)"))

  test("parse splits host/tld/path; components absent -> empty string") {
    val got = UrlFilter.parse(Seq(
        (1L, "https://www.example.com/a/b"),
        (2L, "http://sub.host.org"),
        (3L, "https://nodots/x")).toDF("id", "url"), "id", "url")
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._3))).toMap
    assert(got(1L) == (("www.example.com", "com", "/a/b")))
    assert(got(2L) == (("sub.host.org", "org", "")))
    assert(got(3L) == (("nodots", "", "/x")))
  }

  test("rule precedence: host beats suffix beats tld beats path; kept has " +
       "no reason") {
    val docs = Seq(
      (1L, "https://bad.example.com/ok"),        // exact blocklist
      (2L, "https://shop-ads.com/ok"),           // suffix
      (3L, "https://fine.xyz/ok"),               // tld
      (4L, "https://fine.org/tracker/p"),        // path
      (5L, "https://fine.org/docs/p"),           // kept
      (6L, "https://bad.example.com/tracker/p")  // host wins over path
    ).toDF("id", "url")
    val bl = Seq("bad.example.com").toDF("host")
    val got = UrlFilter.flags(docs, "id", "url", rules, Some(bl))
      .select("id", "kept", "block_reason")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(got == Map(
      1L -> ((false, Some("host"))),
      2L -> ((false, Some("host_suffix"))),
      3L -> ((false, Some("tld"))),
      4L -> ((false, Some("path"))),
      5L -> ((true, None)),
      6L -> ((false, Some("host")))))
  }

  test("filterDocs keeps exactly the kept rows") {
    val docs = Seq(
      (1L, "https://a.xyz/p"), (2L, "https://a.org/p"),
      (3L, "https://a.com/tracker")).toDF("id", "url")
    val kept = UrlFilter.filterDocs(docs, "id", "url", rules)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("plan: blocklist joins broadcast, the corpus never shuffles — " +
       "zero shuffle exchanges end to end") {
    val docs = (1L to 5000L).map(i =>
      (i, s"https://www.h$i.com/p$i")).toDF("id", "url")
    val bl = (1L to 200L).map(i => s"www.h${i * 3}.com").toDF("host")
    val df = UrlFilter.flags(docs, "id", "url", rules, Some(bl))
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
      (p match {
        case s: ShuffleExchangeExec => Seq(s)
        case _ => Seq.empty
      }) ++ p.children.flatMap(shuffles)
    assert(shuffles(df.queryExecution.executedPlan).isEmpty,
      s"URL filtering must be exchange-free:\n${df.queryExecution.executedPlan}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // verdicts correct under the join: exactly hosts h3, h6, ..., h600
    val blockedIds = df.where(col("block_reason") === "host")
      .select("id").as[Long].collect().toSet
    assert(blockedIds == (1L to 200L).map(_ * 3).toSet)
  }
}
