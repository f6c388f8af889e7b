package graft

import graft.operators.LanguageMix
import org.apache.spark.sql.functions.col

class LanguageMixSpec extends SparkSpec {
  import spark.implicits._

  // histogram [a:1, b:2, c:10, d:100] — one clear capped prefix at C=3, B=30
  private val corpus: Seq[(Long, String)] =
    (0L until 1L).map(i => i -> "a") ++
    (10L until 12L).map(i => i -> "b") ++
    (20L until 30L).map(i => i -> "c") ++
    (100L until 200L).map(i => i -> "d")
  private def df = corpus.toDF("doc_id", "lang")

  /** Sequential UniMax reference: ascending by (n, lang), cap at C epochs,
    * remaining budget split by integer division among the uncapped tail. */
  private def unimaxRef(hist: Seq[(String, Long)], budget: Long,
                        cap: Long): Map[String, Long] = {
    val asc = hist.sortBy { case (l, n) => (n, l) }
    var remaining = budget
    var left = asc.size
    val out = scala.collection.mutable.Map[String, Long]()
    var share = 0L
    var capping = true
    asc.foreach { case (l, n) =>
      if (capping && cap * n * left <= remaining) {
        out(l) = cap * n; remaining -= cap * n; left -= 1
      } else {
        if (capping) { share = remaining / left; capping = false }
        out(l) = share
      }
    }
    out.toMap
  }

  private def quotaMap(dfq: org.apache.spark.sql.DataFrame): Map[String, Long] =
    dfq.collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("unimax hand-computed fixture: capped prefix gets C*n, tail splits " +
       "the remainder evenly by integer division") {
    // asc: a1 b2 c10 d100; C=3, B=30 -> a capped (12<=30), b capped
    // (18<=27), c uncapped (60>21): share = 21 div 2 = 10
    val got = quotaMap(LanguageMix.unimaxQuotas(df, "lang", 30, epochCap = 3))
    assert(got === Map("a" -> 3L, "b" -> 6L, "c" -> 10L, "d" -> 10L))
  }

  test("unimax edge: budget too small to cap anyone -> pure even split") {
    val got = quotaMap(LanguageMix.unimaxQuotas(df, "lang", 8, epochCap = 3))
    assert(got === Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 2L))
  }

  test("unimax edge: budget large enough to cap everyone -> C*n each") {
    val got = quotaMap(LanguageMix.unimaxQuotas(df, "lang", 100000, epochCap = 2))
    assert(got === Map("a" -> 2L, "b" -> 4L, "c" -> 20L, "d" -> 200L))
  }

  test("unimax matches the sequential reference on random histograms, and " +
       "never exceeds budget or the epoch cap") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val langs = (1 to (2 + rnd.nextInt(8))).map(i => s"l$i")
      val hist = langs.map(l => l -> (1L + rnd.nextInt(1000)))
      val rows = hist.zipWithIndex.flatMap { case ((l, n), li) =>
        (0L until n).map(j => (li * 100000L + j) -> l)
      }
      val budget = 1L + rnd.nextInt(3000)
      val cap = 1 + rnd.nextInt(4)
      val got = quotaMap(LanguageMix.unimaxQuotas(
        rows.toDF("doc_id", "lang"), "lang", budget, cap))
      assert(got === unimaxRef(hist, budget, cap))
      assert(got.values.sum <= budget)
      hist.foreach { case (l, n) => assert(got(l) <= cap * n) }
    }
  }

  test("temperature quotas: alpha=1 recovers ~proportional shares; " +
       "alpha<1 strictly narrows the head-to-tail ratio") {
    val prop = quotaMap(LanguageMix.temperatureQuotas(df, "lang", 56, alpha = 1.0))
    // proportional: floor(56 * n/113) = a:0 b:0 c:4 d:49
    assert(prop === Map("a" -> 0L, "b" -> 0L, "c" -> 4L, "d" -> 49L))
    val flat = quotaMap(LanguageMix.temperatureQuotas(df, "lang", 56, alpha = 0.3))
    assert(flat("a") > 0L, "flattening must lift the smallest language")
    assert(flat("d").toDouble / flat("a") < prop("d").toDouble / 1.0)
    assert(flat.values.sum <= 56)
  }

  test("drawByQuota returns exactly quota rows per language (quota <= n) " +
       "and is deterministic under repartition") {
    val q = LanguageMix.unimaxQuotas(df, "lang", 30, epochCap = 3)
    val drawn = LanguageMix.drawByQuota(df, "lang", "doc_id", q)
    val perLang = drawn.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // quotas are a:3 b:6 c:10 d:10 against sizes 1/2/10/100 — a quota above
    // n selects the whole language, never duplicates
    assert(perLang === Map("a" -> 1L, "b" -> 2L, "c" -> 10L, "d" -> 10L))
    val again = LanguageMix.drawByQuota(df.repartition(7), "lang", "doc_id", q)
    assert(drawn.select("doc_id").collect().map(_.getLong(0)).sorted
      === again.select("doc_id").collect().map(_.getLong(0)).sorted)
  }

  test("drawByShare: membership is content-keyed — a doc's verdict never " +
       "changes when the rest of its language arrives later") {
    val q = LanguageMix.temperatureQuotas(df, "lang", 56, alpha = 0.3)
    val full = LanguageMix.drawByShare(df, "lang", "doc_id", q)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // same quotas applied to half the corpus: the half's verdicts must be
    // the full run's verdicts restricted to the half
    val half = df.where(col("doc_id") % 2 === 0)
    val halfSel = LanguageMix.drawByShare(half, "lang", "doc_id", q)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val halfIds = corpus.map(_._1).filter(_ % 2 == 0).toSet
    assert(halfSel === (full & halfIds))
  }

  test("allocation plan shape: quotas join the corpus as a broadcast and " +
       "the exact draw has ONE corpus exchange (the per-language window)") {
    val q = LanguageMix.unimaxQuotas(df, "lang", 30, epochCap = 3)
    val plan = LanguageMix.drawByQuota(df, "lang", "doc_id", q)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"quotas must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized join may appear:\n$plan")
  }
}
