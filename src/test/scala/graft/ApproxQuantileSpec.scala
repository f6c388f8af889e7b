package graft

import graft.sources.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Error-bound contract for the approx-percentile entries (q43/t12): the GK
  * sketch guarantees the returned value's RANK is within ε·n (ε = 1/accuracy,
  * ±a couple of ranks for target-rank conventions) of the requested rank —
  * value-distance |approx − exact| has no a priori bound (it scales with local
  * density), rank-distance does. So the assertion is: the approximate
  * p-quantile lies between the exact order statistics at ranks
  * (p ± ε)·n ∓ 2. Exact envelopes come from driver-side sorted group values
  * (test-scale groups; the entries themselves never collect). */
class ApproxQuantileSpec extends SparkSpec {

  private def checkRankBounds(df: DataFrame, groupCol: String, valueCol: String,
                              ps: Seq[Double], acc: Int): Unit = {
    val eps = 1.0 / acc
    val approx = df.groupBy(col(groupCol).as("g"))
      .agg(ps.zipWithIndex.map { case (p, i) =>
        approx_percentile(col(valueCol), lit(p), lit(acc)).as(s"a$i")
      }.head, ps.zipWithIndex.map { case (p, i) =>
        approx_percentile(col(valueCol), lit(p), lit(acc)).as(s"a$i")
      }.tail: _*)
      .collect().map(r => r.get(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    val exact = df.select(col(groupCol).as("g"), col(valueCol).cast("double"))
      .collect().groupBy(_.get(0))
      .map { case (g, rows) => g -> rows.map(_.getDouble(1)).sorted }
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (g, sortedVals) =>
      val n = sortedVals.length
      ps.zipWithIndex.foreach { case (p, i) =>
        val a = approx(g)(i)
        val idxLo = math.max(0, math.ceil((p - eps) * n).toInt - 2)
        val idxHi = math.min(n - 1, math.floor((p + eps) * n).toInt + 2)
        assert(a >= sortedVals(idxLo) && a <= sortedVals(idxHi),
          s"group=$g p=$p acc=$acc n=$n: approx $a outside exact rank envelope " +
            s"[${sortedVals(idxLo)}, ${sortedVals(idxHi)}] (ranks $idxLo..$idxHi)")
      }
    }
  }

  test("approx p50/p90 of order prices stay within the exact rank envelope") {
    val o = Lake.table(spark, sf001, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
    checkRankBounds(o, "o_orderpriority", "o_totalprice", Seq(0.5, 0.9), acc = 100)
    checkRankBounds(o, "o_orderpriority", "o_totalprice", Seq(0.5, 0.9), acc = 1000)
  }

  test("negative control: the entries' bound checks fail for wrong values") {
    // q43's rank-bound formula with an adversarial 'sketch' output (below the
    // group minimum): rank(<=) = 0, far outside 0.5n +/- slack -> flag 0.
    // Proves the oracle's literal-1 comparison actually discriminates.
    val o = Lake.table(spark, sf001, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
    val acc = 100
    val slack = lit(1.0) / acc * col("n") + lit(2.0)
    val sk = o.groupBy(col("o_orderpriority")).agg(
      (min(col("o_totalprice")) - 1.0).as("p50"), // wrong on purpose
      count(lit(1)).as("n"))
    val flags = o.join(broadcast(sk), "o_orderpriority")
      .groupBy(col("o_orderpriority"), col("n"))
      .agg(sum(when(col("o_totalprice") <= col("p50"), 1L).otherwise(0L)).as("rle50"),
        sum(when(col("o_totalprice") < col("p50"), 1L).otherwise(0L)).as("rlt50"))
      .select((col("rle50") >= col("n") * 0.5 - slack &&
        col("rlt50") <= col("n") * 0.5 + slack).cast("int").as("in_bound"))
      .collect().map(_.getInt(0))
    assert(flags.nonEmpty && flags.forall(_ == 0), flags.mkString(","))

    // q45's error bound with a doubled 'approx': |2e - e| = e > max(0.08e, 8)
    // for every real group here -> flag 0.
    val ev = Lake.table(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .select((abs(col("exact") * 2 - col("exact")) <=
        greatest(col("exact") * 0.08, lit(8.0))).cast("int").as("in_bound"))
      .collect().map(_.getInt(0))
    assert(ev.nonEmpty && ev.forall(_ == 0), ev.mkString(","))
  }

  test("approx length cutoffs (t12's shape) stay within the exact rank envelope") {
    val d = Lake.table(spark, sf001, "documents")
      .where(col("text").isNotNull && col("lang").isNotNull)
      .select(col("lang"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
          .cast("double").as("n_words"))
    checkRankBounds(d, "lang", "n_words", Seq(0.05, 0.95), acc = 1000)
  }
}
