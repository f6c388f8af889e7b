package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout control: Z-order (Morton) clustering for multi-dimensional data
  * skipping. Parquet min/max row-group statistics prune scans only when file
  * contents are clustered on the filter column; a single-column sort clusters
  * one dimension and scatters the rest. Interleaving the bits of several
  * bucketed dimensions into one sort key clusters ALL of them at once — every
  * file covers a small hyper-rectangle, so predicates on ANY of the z-columns
  * skip most files (the lakehouse OPTIMIZE ZORDER primitive, e.g. Delta).
  *
  * Everything is ordinary Catalyst bit arithmetic: bucket ids from min/max
  * range scaling, the Morton code from shift/mask/or folds — codegen'd, no
  * UDFs, and the identical integer expressions reproduce in any SQL engine.
  */
object Layout {

  /** Morton code: interleave the low `bits` bits of each (non-negative,
    * long-castable) column; column j owns result bits `i*k + j`. `k*bits` must
    * fit a signed long. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 1, "zValue of zero columns")
    require(k * bits <= 63, s"$k cols x $bits bits overflows a long")
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Scale a numeric column to an integer bucket id in `[0, 2^bits)` given its
    * value range — the rank-normalization feeding [[zValue]]. Constant range
    * endpoints keep this a pure per-row expression (compute them once with one
    * tiny `agg`; at 100 TB that is a metadata-cheap pass compared to the
    * rewrite itself). */
  def rangeBucket(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    require(hi > lo, s"degenerate range [$lo, $hi]")
    val n = 1L << bits
    least(greatest(
      floor((c.cast("double") - lit(lo)) * lit(n.toDouble) / lit(hi - lo)).cast("long"),
      lit(0L)), lit(n - 1))
  }

  /** Rewrite `df` into `numFiles` z-clustered files' worth of partitions:
    * range-partition + sort by the Morton code of the given (column, lo, hi)
    * dimensions. Each output partition then covers a compact hyper-rectangle
    * of the dimension space. One shuffle (the range exchange), sample-based
    * boundaries, no driver materialization — the standard layout-rewrite cost. */
  def zOrder(df: DataFrame, dims: Seq[(String, Double, Double)],
             numFiles: Int, bits: Int = 16): DataFrame = {
    val b = math.max(1, math.min(bits, 63 / math.max(1, dims.size)))
    val z = zValue(dims.map { case (c, lo, hi) => rangeBucket(col(c), lo, hi, b) }, b)
    df.withColumn("graft_zv", z)
      .repartitionByRange(numFiles, col("graft_zv"))
      .sortWithinPartitions("graft_zv")
      .drop("graft_zv")
  }
}
