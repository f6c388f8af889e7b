package graft

import graft.operators.Winnowing
import graft.sources.Lake
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side winnowing (same contract, separate code path).
    * Grams/positions are CODE POINTS — the engine's Substring/length operate
    * on code points (UTF8String semantics), as do DuckDB's, so the reference
    * must too or it diverges off the BMP (Java String indices are UTF-16). */
  private def winnowRef(text: String, k: Int = 5, w: Int = 4): Set[(Long, Long)] = {
    val s0 = text.trim.toLowerCase.replaceAll("\\s+", " ")
    val cps = s0.codePoints().toArray
    def cpSub(from: Int, len: Int): String =
      new String(cps, from, len)
    if (cps.length < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (1 to cps.length - k + 1).map { i =>
      val hex = md.digest(cpSub(i - 1, k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val we = math.min(w, hs.length)
    (1 to hs.length - we + 1).map { t =>
      // argmin, rightmost on ties
      val (h, p) = (t until t + we).map(p => (hs(p - 1), p))
        .minBy { case (h, p) => (h, -p) }
      (p.toLong, h)
    }.toSet
  }

  test("matches an independent reimplementation on real documents") {
    val docs = Lake.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Winnowing.fingerprints(
        Lake.table(spark, sf0001, "documents"), "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
    assert(got.keySet == docs.keySet.filter(id => docs(id).trim.length >= 5))
    got.foreach { case (id, fps) =>
      assert(fps == winnowRef(docs(id)), s"doc $id")
    }
  }

  test("shared-passage guarantee: docs sharing a substring of length >= w+k-1 " +
       "share a fingerprint hash at any offset; disjoint docs share none") {
    val passage = "the quick brown fox jumps over the lazy dog near the bank"
    val df = Seq(
      (1L, s"XXXX YYYY $passage ZZZZ"),
      (2L, s"completely different preamble words here $passage and a tail"),
      (3L, "unrelated content about weather patterns in antarctica today")
    ).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(df, "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty, "planted shared passage must fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint texts must not collide")
  }

  test("density ~ 2/(w+1): selected fraction within [1/(w+1), 3/(w+1)] on " +
       "real docs") {
    val docs = Lake.table(spark, sf0001, "documents")
    val k = 5
    val nGrams = docs.select(
        sum(greatest(length(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
          - (k - 1), lit(0))).as("g"))
      .head().getLong(0)
    val nSel = Winnowing.fingerprints(docs, "doc_id", "text").count()
    val density = nSel.toDouble / nGrams
    assert(density > 1.0 / 5 && density < 3.0 / 5,
      s"winnowing density out of range for w=4: $density")
  }

  test("overlapPairs finds planted shared passages, counts DISTINCT shared " +
       "hashes, and the maxDocFreq prune drops ubiquitous phrases exactly") {
    val passage = "the quick brown fox jumps over the lazy dog near the river bank today"
    val boiler = "all rights reserved contact us terms of service apply here"
    val df = Seq(
      (1L, s"alpha beta gamma $passage delta $boiler"),
      (2L, s"totally different opening words $passage closing remarks $boiler"),
      (3L, s"unrelated text about glaciers and penguins in the far south $boiler")
    ).toDF("doc_id", "text")
    val pairs = Winnowing.overlapPairs(df, "doc_id", "text", minShared = 1,
        maxDocFreq = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), "planted passage pair missing")
    // with the boilerplate phrase in all 3 docs, pruning at df <= 2 must
    // remove exactly the hashes shared by all three: (1,3)/(2,3) overlap
    // (boilerplate only) disappears, (1,2) keeps its passage hashes
    val pruned = Winnowing.overlapPairs(df, "doc_id", "text", minShared = 1,
        maxDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pruned.contains((1L, 2L)))
    assert(!pruned.contains((1L, 3L)) && !pruned.contains((2L, 3L)),
      "boilerplate-only overlap must vanish under the df prune")
    assert(pruned((1L, 2L)) <= pairs((1L, 2L)))
  }

  test("supplementary-plane text: positions and grams are code points — " +
       "engine agrees with the code-point reference off the BMP") {
    // emoji (U+1F600..) and Gothic letters (U+10330..) are 2 UTF-16 units
    // each; a UTF-16-based engine would shift every later position and hash
    val docs = Seq(
      1L -> "café 😀😁 naïve 😀😁 résumé text",
      2L -> "plain ascii alongside 𐌰𐌱𐌲 gothic letters here",
      3L -> "😀😁😂😃😄😅 all emoji doc")
    val got = Winnowing.fingerprints(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
    docs.foreach { case (id, t) =>
      assert(got(id) == winnowRef(t), s"doc $id diverges off the BMP")
    }
  }

  test("plan: winnowing is a pure narrow map — zero exchanges") {
    val plan = Winnowing.fingerprints(
        Lake.table(spark, sf0001, "documents"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"selection must stay inside the row with no shuffle:\n$plan")
  }

  test("hot fingerprint: a boilerplate hash with df >> maxDocFreq is pruned " +
       "by a count, never materialized — output equals brute force") {
    // 400 docs all share one ubiquitous boilerplate sentence (df = 400,
    // maxDocFreq = 50); consecutive doc pairs (2i, 2i+1) additionally share
    // a distinct long passage. The prune must drop the boilerplate hashes by
    // doc-frequency COUNT alone and still find every planted pair.
    val boiler = "all rights reserved terms of service privacy policy applies"
    val docs = (0 until 400).map { i =>
      val passage = s"shared unique passage number ${i / 2} with extra words " +
        s"padding the window ${i / 2} end"
      (i.toLong, s"doc $i preamble $passage middle $boiler tail $i")
    }
    val df = docs.toDF("doc_id", "text")
    val k = 5; val w = 4; val maxDf = 50L
    val got = Winnowing.overlapPairs(df, "doc_id", "text", k = k, w = w,
        minShared = 1, maxDocFreq = maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the two-pass fallback (pathological-maxDocFreq path) must agree exactly
    val gotTwoPass = Winnowing.overlapPairsImpl(df, "doc_id", "text", k, w,
        minShared = 1, maxDocFreq = maxDf, singlePass = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == gotTwoPass, "single-pass and two-pass plans diverged")
    // brute force from the independent driver-side reference
    val perDoc = docs.map { case (id, t) => id -> winnowRef(t, k, w).map(_._2) }
    val dfCount = perDoc.flatMap { case (id, fps) => fps.map(_ -> id) }
      .groupBy(_._1).map { case (fp, xs) => fp -> xs.map(_._2).toSet.size }
    val keep = dfCount.collect { case (fp, n) if n >= 2 && n <= maxDf => fp }.toSet
    val want = (for {
      (a, af) <- perDoc; (b, bf) <- perDoc if a < b
      shared = (af & bf & keep).size if shared >= 1
    } yield (a, b) -> shared.toLong).toMap
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    // every planted consecutive pair survives; boilerplate-only pairs don't
    assert((0 until 200).forall(i => got.contains((2L * i, 2L * i + 1))))
    assert(!got.contains((0L, 2L)), "boilerplate-only pair must be pruned")
  }

  test("plan: overlapPairs builds per-fp sets with the BOUNDED aggregate " +
       "only — the unbounded collect_set never appears, and the bounded " +
       "one partial-aggregates map-side") {
    val plan = Winnowing.overlapPairs(
        Lake.table(spark, sf0001, "documents"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_set("),
      s"unbounded collect_set must never buffer per-fp id sets:\n$plan")
    assert(plan.contains("partial_collect_set_bounded"),
      s"bounded set must combine map-side:\n$plan")
    // the pathological-maxDocFreq fallback keeps constant-size buffers:
    // count-prune (no object-hash buffer at all), then self-join
    val plan2 = Winnowing.overlapPairsImpl(
        Lake.table(spark, sf0001, "documents"), "doc_id", "text",
        5, 4, 8, 1000, singlePass = false)
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("collect_set") && !plan2.contains("ObjectHashAggregate"),
      s"two-pass path must never hold any per-fp id set:\n$plan2")
    assert(plan2.contains("partial_count") || plan2.contains("partial count"),
      s"two-pass doc-frequency count must partial-aggregate map-side:\n$plan2")
  }
}
