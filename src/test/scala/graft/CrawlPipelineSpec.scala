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

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
