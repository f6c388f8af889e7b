package graft

import graft.operators.{RangeJoin, Sampling}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized (seeded, reproducible) equivalence properties: each
  * rewrite-style operator must equal its naive formulation on arbitrary
  * inputs, not just the planted spec cases. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def intervals(rnd: Random, n: Int): List[(Long, Long)] =
    List.fill(n) {
      val lo = rnd.between(-100L, 300L)
      (lo, lo + rnd.between(0L, 60L))
    }

  test("binned point-in-interval join == naive theta join (random inputs)") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val w = Seq(1L, 3L, 7L, 64L)(rnd.nextInt(4))
      val pdf = List.fill(60)(rnd.between(-100L, 300L)).zipWithIndex
        .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val idf = intervals(rnd, 25).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(pdf, "p", idf, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toList
      val want = pdf.crossJoin(idf).where($"p".between($"lo", $"hi"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toList
      assert(got == want, s"seed=$seed w=$w")
    }
  }

  test("binned interval overlap == naive theta join, exactly once (random inputs)") {
    for (seed <- 1 to 6) {
      val rnd = new Random(100 + seed)
      val w = Seq(2L, 5L, 32L)(rnd.nextInt(3))
      val adf = intervals(rnd, 20).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("aid", "a_lo", "a_hi")
      val bdf = intervals(rnd, 20).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("bid", "b_lo", "b_hi")
      val got = RangeJoin.intervalOverlap(adf, "a_lo", "a_hi", bdf, "b_lo", "b_hi", w)
        .select("aid", "bid").as[(Long, Long)].collect().toList
      val want = adf.crossJoin(bdf)
        .where($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
        .select("aid", "bid").as[(Long, Long)].collect().toList
      assert(got.sorted == want.sorted, s"seed=$seed w=$w")
      assert(got.size == got.toSet.size, s"seed=$seed duplicate emissions")
    }
  }

  test("bottom_k == sort-distinct-take (random strings, random k)") {
    for (seed <- 1 to 8) {
      val rnd = new Random(200 + seed)
      val k = 1 + rnd.nextInt(12)
      val xs = List.fill(1 + rnd.nextInt(120))(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val got = xs.toDF("v").repartition(5)
        .agg(graft.functions.SketchAggregates.bottomK($"v", k))
        .head().getSeq[String](0).toList
      assert(got == xs.distinct.sorted.take(k), s"seed=$seed k=$k")
    }
  }

  test("stratified sample: exact per-stratum size at random fractions") {
    for (seed <- 1 to 5) {
      val rnd = new Random(300 + seed)
      val n = 10 + rnd.nextInt(70)
      val f = Seq(0.1, 0.5, 0.9)(rnd.nextInt(3))
      val df = (1 to n).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
      val bySize = Sampling.stratifiedExact(df, "g", "id", f)
        .groupBy("g").count().as[(String, Long)].collect().toMap
      df.groupBy("g").count().as[(String, Long)].collect().foreach { case (g, cnt) =>
        assert(bySize.getOrElse(g, 0L) == math.ceil(cnt * f).toLong,
          s"seed=$seed stratum $g")
      }
    }
  }
}
