package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization — the resampling pass between raw event extracts
  * and anything that assumes a dense time axis (charting, seasonal models,
  * week-over-week SQL that joins on day offsets).
  *
  * Scale design: the heavy lifting is the one partial-aggregated `groupBy`
  * over the raw events; everything after operates on AGGREGATED data (one row
  * per present (day, group)). The date spine × group-universe cross join is
  * spine-sized (days × groups, thousands at most), and joins back to the
  * aggregate broadcast — raw data is scanned once, shuffled once. */
object TimeSeries {

  /** Daily counts per `groupCol` with every missing (day, group) combination
    * filled as zero, over the table's full [min, max] day span — so the output
    * is a dense grid of `span_days × |groups|` rows. Day boundaries follow the
    * session time zone (pin `spark.sql.session.timeZone`). */
  def dailyDense(df: DataFrame, tsCol: String, groupCol: String): DataFrame = {
    val counts = df
      .groupBy(to_date(col(tsCol)).as("day"), col(groupCol))
      .agg(count(lit(1)).as("n"))
    val days = counts.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val groups = counts.select(col(groupCol)).distinct()
    days.crossJoin(groups)
      .join(counts, Seq("day", groupCol), "left")
      .select(col("day"), col(groupCol), coalesce(col("n"), lit(0L)).as("n"))
  }
}
