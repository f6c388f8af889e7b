package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality report an ingestion service runs before
  * publishing a dataset. The reference's validation surface stops at
  * required-column presence (`DataValidationStep.cs:32-39`, with row-level
  * checks left TODO); this extends it to per-column statistics computed in ONE
  * scan: row count, non-null count, exact distinct count, min/max.
  *
  * Shape: a single `agg` row holding every statistic, then `stack` to long
  * format — so profiling N columns costs one pass over the data plus the
  * per-column distinct aggregations (each a map-side-partial hash aggregate),
  * never N scans. Values surface as strings so heterogeneous column types fit
  * one report schema; exact-representation types (integers, strings, dates)
  * round-trip losslessly — profile floating-point columns with a numeric
  * variant if digit-exact formatting matters. */
object Profile {

  /** One row per profiled column:
    * `(col_name, n_rows, n_nonnull, n_distinct, min_s, max_s)`. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile of zero columns")
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        count_distinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = columns
      .map(c => s"'$c', `nn_$c`, `nd_$c`, `mn_$c`, `mx_$c`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${columns.size}, $stackArgs) as (col_name, n_nonnull, n_distinct, min_s, max_s)",
      "n_rows")
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
