package graft

import graft.operators.SourceCuration
import graft.sources.Lake
import org.apache.spark.sql.functions._

class SourceCurationSpec extends SparkSpec {
  import spark.implicits._

  test("sourceStats matches a per-source recomputation on real documents") {
    val docs = Lake.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val got = SourceCuration.sourceStats(docs, "text", "source")
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq

    val rows = docs.collect().map(r =>
      (r.getAs[String]("source"),
        r.getAs[String]("text").trim.toLowerCase.replaceAll("\\s+", " "),
        r.getAs[String]("text").length < 120))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, g) =>
      val n = g.length.toLong
      val dup = n - g.map(_._2).distinct.length
      val short = g.count(_._3).toLong
      (src, n, dup, dup.toDouble / n, short.toDouble / n)
    }
    assert(got == want)
  }

  test("a boilerplate-heavy source is dropped whole even though each of its " +
       "docs clears the per-doc length floor") {
    val longA = "a" * 200
    val longB = "b" * 200
    // srcdup: 4 docs, 3 verbatim copies -> dup_rate 0.5 > 0.02
    // srcok: 7 distinct long docs + 1 short (short_frac 0.125 <= 0.15, so
    // the SOURCE passes; the short doc alone fails its per-doc floor)
    val df = (Seq(
      (1L, longA, "srcdup"), (2L, longA, "srcdup"),
      (3L, longA, "srcdup"), (4L, longB, "srcdup")) ++
      (5L to 11L).map(i => (i, longA + ("x" * i.toInt), "srcok")) :+
      ((12L, "tiny", "srcok"))
    ).toDF("doc_id", "text", "source")
    val kept = SourceCuration.curate(df, "doc_id", "text", "source")
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(!kept(_)), "dup-heavy source must drop whole")
    assert((5L to 11L).forall(kept(_)))
    assert(!kept(12L), "short doc fails the per-doc floor in a passing source")
  }

  test("plan: gate join broadcasts the S-row stats side; the doc side never " +
       "sort-merges, and the stats aggregation plans without Expand") {
    val docs = Lake.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val plan = SourceCuration.curate(docs, "doc_id", "text", "source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Expand"),
      s"two-level agg must not plan a distinct-aggregate Expand:\n$plan")
  }
}
