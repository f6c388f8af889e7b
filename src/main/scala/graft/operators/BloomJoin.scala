package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Bloom-filter semi-join pruning: filter the big side of a join down to rows
  * that MIGHT match before paying the join's shuffle.
  *
  * At 100 TB the dominant cost of `fact ⋈ dim` (selective dim) is shuffling
  * fact rows that will never match. A Bloom filter of the dim keys — a few MB
  * regardless of fact size — broadcasts to every fact scan task and discards
  * non-matching rows AT THE SCAN, so the exchange carries only plausible rows
  * (plus the filter's ~1% false positives, which the real join then removes:
  * the result is exactly the plain join, making a plain-SQL oracle apply).
  *
  * Spark has this built in as runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), but only where its
  * cost model dares inject it (shuffle-join sides with selective creation-side
  * filters, thresholds on sizes). This operator is the explicit form for when
  * the pipeline KNOWS the dim side is selective — the same
  * [[org.apache.spark.util.sketch.BloomFilter]] machinery, placed
  * deliberately. The filter is built by a real aggregate (partial builders
  * merge map-side, one filter leaves the exchange), rides a scalar subquery —
  * one bounded-size value through the driver, like every scalar subquery, not
  * a data collect — and both build and probe hash through xxhash64, so only
  * 8 bytes per row enter the filter.
  */
object BloomJoin {

  /** The pruning half alone: `fact` rows whose key MIGHT be in `dim`'s key
    * set (superset of the true matches by the filter's false-positive rate).
    * Useful stand-alone as a semi-join reducer before any downstream op. */
  def prune(fact: DataFrame, dim: DataFrame,
            factKey: String, dimKey: String,
            expectedDimRows: Long): DataFrame = {
    require(expectedDimRows > 0, "expectedDimRows must be positive")
    val bloomAgg = column(new BloomFilterAggregate(
      expression(xxhash64(col(dimKey))),
      expression(lit(expectedDimRows)),
      expression(lit(expectedDimRows * 8))).toAggregateExpression())
    // might_contain requires its filter side to be a scalar subquery (or a
    // literal) — the same shape Spark's own InjectRuntimeFilter emits: the
    // one-row aggregate runs once and its result ships to every probe task.
    val bloomSubquery = ScalarSubquery(
      dim.agg(bloomAgg.as("_bloom")).queryExecution.logical)
    fact.where(column(BloomFilterMightContain(
      bloomSubquery, expression(xxhash64(col(factKey))))))
  }

  /** Inner equi-join of `fact` against selective `dim`, Bloom-pruned.
    * `expectedDimRows` sizes the filter (bits = 8 per expected item ≈ 2% fpp;
    * oversizing is cheap, undersizing just raises the false-positive rate —
    * correctness never depends on it). */
  def prunedInnerJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedDimRows: Long): DataFrame = {
    val pruned = prune(fact, dim, factKey, dimKey, expectedDimRows)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
