package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val fact = Seq(
    (1L, 10.0), (1L, 11.0), (2L, 20.0), (3L, 30.0), (4L, 40.0), (5L, 50.0)
  ).toDF("fk", "amount")
  private val dim = Seq((1L, "x"), (3L, "y")).toDF("dk", "name")

  test("bloom-pruned join equals the plain inner join exactly") {
    val got = BloomJoin.prunedInnerJoin(fact, dim, "fk", "dk", expectedDimRows = 16)
      .select("fk", "amount", "name").as[(Long, Double, String)].collect().toSet
    val want = fact.join(dim, $"fk" === $"dk")
      .select("fk", "amount", "name").as[(Long, Double, String)].collect().toSet
    assert(got == want && want.size == 3)
  }

  test("the probe side carries a might_contain filter fed by a scalar subquery") {
    val plan = BloomJoin.prunedInnerJoin(fact, dim, "fk", "dk", expectedDimRows = 16)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(plan.contains("scalar-subquery"), plan)
    assert(plan.contains("bloom_filter_agg"), plan)
  }

  test("non-matching fact rows are discarded BEFORE the join's exchange") {
    // measure the bloom filter's output alone — NOT the joined result (the
    // join would mask a broken filter): with a well-sized filter on this tiny
    // dim, false positives are essentially impossible, so the pre-join row
    // count must drop from 6 to the 3 genuine matches.
    val pruned = BloomJoin.prune(fact, dim, "fk", "dk", expectedDimRows = 16)
    assert(pruned.count() == 3)
    assert(pruned.select("fk").as[Long].collect().sorted.toSeq == Seq(1L, 1L, 3L))
  }

  test("a fact row matching the bloom but not the dim is removed by the join") {
    // key 2 hashes differently from 1/3; even if a false positive let it
    // through, the equi-join must drop it — assert the invariant directly by
    // running with an absurdly small filter (high fpp).
    val got = BloomJoin.prunedInnerJoin(fact, dim, "fk", "dk", expectedDimRows = 1)
      .select("fk").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 1L, 3L))
  }
}
