package graft

import graft.operators.Boilerplate
import graft.sources.Lake
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val body = "this paragraph carries the actual article text with " +
    "plenty of ordinary words flowing along so the densitometric rule sees " +
    "genuine body content here"

  private val page =
    s"""<html><head><title>t</title></head><body>
       |<nav><a href="/">home</a> <a href="/a">about</a> <a href="/c">contact</a></nav>
       |<p>$body</p>
       |<div class="f"><a href="/t">terms</a> <a href="/p">privacy</a> all rights reserved</div>
       |</body></html>""".stripMargin

  test("keeps the article block, drops nav and footer, extracts in order") {
    val got = Boilerplate.extract(
        Seq((1L, page)).toDF("doc_id", "html"), "doc_id", "html")
      .as[(Long, Long, Long, String)].head()
    assert(got._2 == 1, s"content blocks: $got")
    assert(got._3 >= 2, s"nav+footer must be boilerplate: $got")
    assert(got._4 == body)
  }

  test("link-density rule: a long-enough block that is one-third-plus " +
       "anchors is boilerplate") {
    val linky = "<p>" + (1 to 6).map(i => s"""<a href="#">link$i</a>""")
      .mkString(" ") + " plus eight plain filler words following here now" +
      "</p>"
    val rows = Boilerplate.blockStats(
        Seq((1L, linky)).toDF("doc_id", "html"), "doc_id", "html")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r._3 == 14 && r._4 == 6, s"6 of 14 words are anchor text: $r")
    assert(!r._6, "3*6 > 14 must fail the link-density rule")
  }

  test("text-density rule: sparse short blocks drop, dense long ones keep") {
    val html = "<p>one two three four five six</p>" + // 6 words, 1 line -> <7
      s"<p>$body</p>"
    val rows = Boilerplate.blockStats(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .select("block_idx", "kept").as[(Long, Boolean)].collect().toMap
    assert(rows == Map(1L -> false, 2L -> true))
  }

  test("matches a driver-side reference on randomly assembled pages") {
    val rnd = new scala.util.Random(23)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def plain(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    def block(): String = rnd.nextInt(3) match {
      case 0 => s"<p>${plain(3 + rnd.nextInt(40))}</p>"
      case 1 => s"""<div><a href="#">${plain(1 + rnd.nextInt(3))}</a> ${plain(rnd.nextInt(8))}</div>"""
      case 2 => s"<li>${plain(1 + rnd.nextInt(5))}</li>"
    }
    val pages = (0 until 30).map(i =>
      (i.toLong, "<html><body>" + Seq.fill(1 + rnd.nextInt(6))(block())
        .mkString("\n") + "</body></html>"))
    val got = Boilerplate.extract(pages.toDF("doc_id", "html"),
        "doc_id", "html")
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    val want = pages.map { case (id, html) => id -> refExtract(html) }.toMap
    assert(got == want)
  }

  test("plan: the whole pass is a narrow map — zero exchanges") {
    val d = Lake.table(spark, sf0001, "documents")
      .select(col("doc_id"),
        concat(lit("<html><body><p>"), col("text"),
          lit("</p></body></html>")).as("html"))
    val plan = Boilerplate.extract(d, "doc_id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"boilerplate removal must never shuffle:\n$plan")
  }

  /** Independent driver-side reimplementation of the block rules. */
  private def refExtract(html: String): (Long, Long, String) = {
    val blocks = html.split(
      "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|hr|blockquote|pre|" +
        "section|article|header|footer|nav|aside|main|form|html|body|head|title)[^>]*>",
      -1)
    def norm(s: String) = s.replaceAll("(?s)<[^>]*>", " ")
      .replaceAll("\\s+", " ").trim
    val stats = blocks.toSeq.map { raw =>
      val txt = norm(raw)
      val w = if (txt.isEmpty) 0 else txt.split(" ").count(_.nonEmpty)
      val anchors = "(?is)<a[^>]*>(.*?)</a>".r
        .findAllMatchIn(raw).map(_.group(1)).mkString(" ")
      val lw = {
        val t = norm(anchors); if (t.isEmpty) 0 else t.split(" ").count(_.nonEmpty)
      }
      (txt, w, txt.length, lw)
    }.filter(_._2 >= 1)
    val kept = stats.filter { case (_, w, c, lw) =>
      w >= 5 && 3 * lw <= w && w >= 7 * ((c + 79) / 80)
    }
    (kept.size.toLong, (stats.size - kept.size).toLong,
      kept.map(_._1).mkString(" "))
  }
}
