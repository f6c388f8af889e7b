package graft

import graft.operators.UrlFilter
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

class UrlFilterSpec extends SparkSpec {
  import spark.implicits._

  private val rules = UrlFilter.Rules(
    blockedTlds = Seq("xyz"),
    blockedHostSuffixes = Seq("-ads.com"),
    blockedPathPatterns = Seq("^/tracker(/|$)"))

  test("parse splits host/tld/path; components absent -> empty string; " +
       "uppercase input is lowercased, not failed open") {
    val got = UrlFilter.parse(Seq(
        (1L, "https://www.example.com/a/b"),
        (2L, "http://sub.host.org"),
        (3L, "https://nodots/x"),
        (4L, "HTTPS://Upper.Example.COM/Path")).toDF("id", "url"), "id", "url")
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._3))).toMap
    assert(got(1L) == (("www.example.com", "com", "/a/b")))
    assert(got(2L) == (("sub.host.org", "org", "")))
    assert(got(3L) == (("nodots", "", "/x")))
    assert(got(4L) == (("upper.example.com", "com", "/path")))
  }

  test("rule precedence: unparseable beats host beats suffix beats tld " +
       "beats path; kept has no reason; unparseable URLs fail CLOSED") {
    val docs = Seq(
      (1L, "https://bad.example.com/ok"),        // exact blocklist
      (2L, "https://shop-ads.com/ok"),           // suffix
      (3L, "https://fine.xyz/ok"),               // tld
      (4L, "https://fine.org/tracker/p"),        // path
      (5L, "https://fine.org/docs/p"),           // kept
      (6L, "https://bad.example.com/tracker/p"), // host wins over path
      (7L, "not-a-url"),                         // no scheme -> unparseable
      (8L, "//scheme.less/p")                    // unparseable too
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
      6L -> ((false, Some("host"))),
      7L -> ((false, Some("unparseable"))),
      8L -> ((false, Some("unparseable")))))
  }

  test("duplicate blocklist rows never multiply document rows") {
    val docs = Seq((1L, "https://dup.com/p"), (2L, "https://ok.org/p"))
      .toDF("id", "url")
    val bl = Seq("dup.com", "dup.com", "dup.com").toDF("host")
    val out = UrlFilter.flags(docs, "id", "url", rules, Some(bl))
    assert(out.count() == 2L)
    assert(out.where(col("id") === 1L).head().getAs[String]("block_reason")
      == "host")
  }

  test("filterDocs keeps exactly the kept rows with ALL columns, via the " +
       "carry seam — one blocklist join, no corpus-vs-corpus semi-join") {
    val docs = Seq(
      (1L, "https://a.xyz/p", "keep-me-1"), (2L, "https://a.org/p", "keep-me-2"),
      (3L, "https://a.com/tracker", "x")).toDF("id", "url", "payload")
    val bl = Seq("a.xyz").toDF("host")
    val out = UrlFilter.filterDocs(docs, "id", "url", rules, Some(bl))
    assert(out.columns.toSeq == Seq("id", "url", "payload"))
    val rows = out.as[(Long, String, String)].collect().toSet
    assert(rows == Set((2L, "https://a.org/p", "keep-me-2")))
    // exactly ONE join in the plan (the blocklist), and it is not a semi
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") == 1, plan)
    assert(!plan.contains("LeftSemi"), plan)
  }

  test("plan below the cap: blocklist joins broadcast; every shuffle " +
       "exchange is blocklist-side (under the broadcast), the corpus " +
       "never shuffles") {
    val docs = (1L to 5000L).map(i =>
      (i, s"https://www.h$i.com/p$i")).toDF("id", "url")
    val bl = (1L to 200L).map(i => s"www.h${i * 3}.com").toDF("host")
    val df = UrlFilter.flags(docs, "id", "url", rules, Some(bl),
      expectedHosts = 200L)
    def collectNodes[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] =
      f.lift(p).toSeq ++ p.children.flatMap(collectNodes(_)(f))
    val plan = df.queryExecution.executedPlan
    val all = collectNodes(plan) { case s: ShuffleExchangeExec => s }
    val underBroadcast = collectNodes(plan) { case b: BroadcastExchangeLike => b }
      .flatMap(b => collectNodes[ShuffleExchangeExec](b) {
        case s: ShuffleExchangeExec => s })
    assert(all.size == underBroadcast.size,
      s"corpus-side shuffle found:\n$plan")
    assert(plan.toString.contains("BroadcastHashJoin"), plan.toString)
    // verdicts correct under the join: exactly hosts h3, h6, ..., h600
    val blockedIds = df.where(col("block_reason") === "host")
      .select("id").as[Long].collect().toSet
    assert(blockedIds == (1L to 200L).map(_ * 3).toSet)
  }

  test("above the cap: the broadcast hint is withheld (shuffle-join " +
       "fallback) and the output is identical") {
    val docs = (1L to 2000L).map(i =>
      (i, s"https://www.h$i.com/p$i")).toDF("id", "url")
    val bl = (1L to 100L).map(i => s"www.h${i * 7}.com").toDF("host")
    val under = UrlFilter.flags(docs, "id", "url", rules, Some(bl),
      expectedHosts = 100L, maxBroadcastHosts = 1000L)
    val over = UrlFilter.flags(docs, "id", "url", rules, Some(bl),
      expectedHosts = 100L, maxBroadcastHosts = 50L)
    // hint present below the cap, absent above it (static plans)
    assert(under.queryExecution.optimizedPlan.toString.contains("ResolvedHint")
      || under.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
    withSQLConf("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(!over.queryExecution.sparkPlan.toString
        .contains("BroadcastHashJoin"),
        over.queryExecution.sparkPlan.toString)
    }
    val a = under.collect().map(_.toString).sorted
    val b = over.collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("HLL path sizes the cap when no expectedHosts bound is given") {
    val docs = (1L to 500L).map(i =>
      (i, s"https://www.h$i.com/p$i")).toDF("id", "url")
    val bl = (1L to 50L).map(i => s"www.h${i * 2}.com").toDF("host")
    // 50 hosts * 1.25 slack = 62.5 > cap 10 -> fallback, still correct
    val out = UrlFilter.flags(docs, "id", "url", rules, Some(bl),
      maxBroadcastHosts = 10L)
    assert(out.where(col("block_reason") === "host").count() == 50L)
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
