package graft

import graft.operators.CrawlPipeline
import graft.sources.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class CrawlPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def pages(dir: String): DataFrame =
    Lake.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        concat(
          lit("<html><body><nav><a href=\"/\">home</a> " +
            "<a href=\"/a\">about</a> <a href=\"/c\">contact</a></nav><p>"),
          col("text"),
          lit("</p><div class=\"foot\"><a href=\"/t\">terms</a> " +
            "<a href=\"/p\">privacy</a> all rights reserved</div>" +
            "</body></html>")).as("html"))

  private def run(dir: String, k: Int = 50): DataFrame =
    CrawlPipeline.curate(pages(dir), "doc_id", "html", "lang", "source",
      labeledPred = col("doc_id") % 5 =!= 0, targetLangs = Seq("en"),
      dsirTargetPred = col("doc_id") % 13 === 0, sampleK = k)

  test("end-to-end invariants: k selected, all predicted-target, pack " +
       "arithmetic consistent, winners dedup-unique") {
    val out = run(sf0001, k = 20).collect()
    assert(out.length == 20)
    assert(out.forall(_.getAs[String]("lang_pred") == "en"))
    // pack arithmetic: recompute the per-source cumulative sums
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("pack_id") == cum / 512,
          s"pack_id mismatch at doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("pack_offset") == cum % 512)
        cum += r.getAs[Long]("n_tokens")
      }
    }
    assert(out.forall(_.getAs[Long]("n_tokens") >= 5),
      "quality gate requires >= 5 tokens")
  }

  test("deterministic across runs (content-keyed draw, quantized models)") {
    val a = run(sf0001, k = 20).collect().map(_.toString).sorted
    val b = run(sf0001, k = 20).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("composition plan: document text crosses exactly TWO shuffle " +
       "exchanges (pred join, dedup agg); no cartesian product; models " +
       "broadcast") {
    // static plan (AQE off) with auto-broadcast DISABLED — the 100 TB
    // regime, where no corpus-sized relation fits a broadcast. Text
    // co-locates twice because the chain has two differently-keyed
    // text-dependent stages: the language-gate join (by id) and the dedup
    // min_by aggregation (by fingerprint, map-side combined). The DSIR
    // single-pass keeps survivors a one-consumer subtree and the draw
    // carries the packing metadata, so no third crossing and no join-back
    // exists; every model/gram aggregation exchanges narrow
    // integer/decimal rows only. (Model broadcasts are explicit hints, so
    // they survive the disabled threshold.)
    withSQLConf("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = run(sf0001, k = 20)
      val plan = df.queryExecution.executedPlan
      def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
        (p match {
          case s: ShuffleExchangeExec => Seq(s)
          case _ => Seq.empty
        }) ++ p.children.flatMap(shuffles)
      // text-bearing = any output attribute that IS or CONTAINS (e.g. a
      // min_by partial-aggregation buffer struct) the document text
      val textShuffles = shuffles(plan).filter(_.child.output.exists(a =>
        a.name.contains("extracted_text") || a.name == "html" ||
          a.name == "text" ||
          a.dataType.catalogString.contains("extracted_text")))
      assert(textShuffles.length == 2,
        s"expected exactly two text-bearing exchanges, found " +
          s"${textShuffles.length}:\n${textShuffles.mkString("\n")}")
      val s = plan.toString
      assert(!s.contains("CartesianProduct"), s)
      assert(s.contains("BroadcastHashJoin"), s)
    }
  }

  test("KN head gate drops crossed-trigram junk that t06's rule battery " +
       "passes — the composed gate separates what the rules alone cannot") {
    // the TrainingOpsSpec planting, rule-proofed: every template is
    // 'the s_i mid e_i and' — stopwords present, sane token lengths, low
    // bigram dup — so t06 passes BOTH populations; crossed chains
    // 'the s_i mid e_j and' (i != j) use only high-frequency bigrams but
    // rare trigrams, which only the KN LM can see
    val rnd = new scala.util.Random(7)
    def triple(i: Int, j: Int) = s"the s$i mid e$j and"
    val aligned = (1L to 30L).map { id =>
      (id, Seq.fill(6)({ val i = rnd.nextInt(20); triple(i, i) })
        .mkString(" "))
    }
    val crossed = (101L to 108L).map { id =>
      (id, Seq.fill(6)({
        val i = rnd.nextInt(20)
        triple(i, (i + 1 + rnd.nextInt(19)) % 20)
      }).mkString(" "))
    }
    val pages = (aligned ++ crossed).map { case (id, text) =>
      (id, "en", "srcA",
        "<html><body><nav><a href=\"/\">home</a> <a href=\"/a\">x</a> " +
          "<a href=\"/c\">y</a></nav><p>" + text +
          "</p><div><a href=\"/t\">terms</a> all rights reserved</div>" +
          "</body></html>")
    }.toDF("doc_id", "lang", "source", "html")
    def ids(knHeadFrac: Option[Double]): Set[Long] =
      CrawlPipeline.curate(pages, "doc_id", "html", "lang", "source",
        labeledPred = lit(true), targetLangs = Seq("en"),
        dsirTargetPred = col("doc_id") % 2 === 0, sampleK = 50,
        knHeadFrac = knHeadFrac)
        .select("doc_id").as[Long].collect().toSet
    val plain = ids(None)
    val gatedIds = ids(Some(0.75))
    val junk = crossed.map(_._1).toSet
    assert((plain & junk) == junk,
      s"t06 alone must pass the crossed docs: ${(plain & junk).size}/8 kept")
    assert((gatedIds & junk).isEmpty,
      s"KN head gate must drop all crossed docs, kept ${gatedIds & junk}")
    assert((gatedIds & aligned.map(_._1).toSet).size >= 25,
      s"KN head gate must keep most aligned docs: $gatedIds")
  }

  test("KN-gated composition plan: still exactly TWO text-bearing " +
       "exchanges — the ppl gate joins at the same id key as the language " +
       "gate, adding no third crossing") {
    withSQLConf("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = CrawlPipeline.curate(pages(sf0001), "doc_id", "html",
        "lang", "source",
        labeledPred = col("doc_id") % 5 =!= 0, targetLangs = Seq("en"),
        dsirTargetPred = col("doc_id") % 13 === 0, sampleK = 20,
        knHeadFrac = Some(0.8))
      val plan = df.queryExecution.executedPlan
      def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
        (p match {
          case s: ShuffleExchangeExec => Seq(s)
          case _ => Seq.empty
        }) ++ p.children.flatMap(shuffles)
      val textShuffles = shuffles(plan).filter(_.child.output.exists(a =>
        a.name.contains("extracted_text") || a.name == "html" ||
          a.name == "text" ||
          a.dataType.catalogString.contains("extracted_text")))
      assert(textShuffles.length == 2,
        s"expected exactly two text-bearing exchanges, found " +
          s"${textShuffles.length}:\n${textShuffles.mkString("\n")}")
      assert(!plan.toString.contains("CartesianProduct"), plan.toString)
    }
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
