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
    * `(col_name, n_rows, n_nonnull, n_distinct, min_s, max_s)`.
    * Internal aliases are index-based and the pivot to long format goes
    * through `inline` over structs — no name is ever spliced into SQL text,
    * so arbitrary column names (dots, quotes, backticks) are safe. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile of zero columns")
    // backtick-quote input references so dots/quotes/backticks in names are
    // treated literally, not as nested-field syntax
    def ref(c: String) = col(s"`${c.replace("`", "``")}`")
    val aggs = columns.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(ref(c)).as(s"nn_$i"),
        count_distinct(ref(c)).as(s"nd_$i"),
        min(ref(c)).cast("string").as(s"mn_$i"),
        max(ref(c)).cast("string").as(s"mx_$i"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = columns.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"nn_$i").as("n_nonnull"),
        col(s"nd_$i").as("n_distinct"), col(s"mn_$i").as("min_s"),
        col(s"mx_$i").as("max_s"))
    }
    wide.select(col("n_rows"), inline(array(rows: _*)))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** Fixed-width histogram of a numeric column: one partial-aggregated
    * `groupBy` over `floor((x - lo) / width)` — a single scan with map-side
    * combine, shuffling only (bucket, count) pairs regardless of data size.
    * Bucket edges are one IEEE multiply-add from the bucket id, so the report
    * reproduces exactly on any engine. Null values are dropped (they have no
    * bucket); count them separately via [[profile]]. */
  def histogram(df: DataFrame, valueCol: String,
                width: Double, lo: Double = 0.0): DataFrame = {
    require(width > 0, s"bucket width must be positive: $width")
    df.where(col(valueCol).isNotNull)
      .select(floor((col(valueCol) - lo) / width).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo", lit(lo) + col("bucket").cast("double") * width)
      .select(col("bucket"), col("bucket_lo"), col("n"))
  }
}
