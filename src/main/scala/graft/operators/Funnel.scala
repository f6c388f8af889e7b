package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered multi-stage funnel ("view → click → purchase") — the event-analytics
  * workload the reference's event extracts feed downstream. For each entity,
  * stage k counts only if it happens STRICTLY AFTER the first qualifying
  * completion of stage k-1, so scrambled orderings don't inflate conversion.
  *
  * Scale design: every stage is a running conditional `min` over the SAME
  * window spec (partition by entity, order by time), so Catalyst stacks all
  * stages into one Window operator chain behind a SINGLE Exchange + sort, and
  * the final per-entity rollup reuses that partitioning — one shuffle total,
  * whatever the stage count. The alternative (per-stage self-joins) is k-1
  * shuffles of the full event stream. Per-row state is O(stages); nothing is
  * collected.
  */
object Funnel {

  /** Per-entity first-completion times for an ordered `stages` chain, plus
    * `funnel_depth` (how many consecutive stages completed). `tieCol` breaks
    * timestamp ties deterministically inside the window sort; sequencing
    * itself compares timestamps strictly. */
  def firstCompletion(df: DataFrame, entityCol: String, tsCol: String,
                      typeCol: String, stages: Seq[String],
                      tieCol: String): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // stage 0 needs no predecessor; stage k gates on the running first
    // completion of stage k-1 being strictly earlier.
    val staged = stages.zipWithIndex.foldLeft(df) { case (acc, (stage, i)) =>
      val qualifies =
        if (i == 0) col(typeCol) === stage
        else col(typeCol) === stage && col(tsCol) > col(s"graft_s${i - 1}")
      acc.withColumn(s"graft_s$i", min(when(qualifies, col(tsCol))).over(w))
    }
    // min of a running min == the partition-wide first qualifying time; the
    // aggregate's required distribution is satisfied by the window's hash
    // partitioning, so no second Exchange.
    val firsts = stages.indices.map(i =>
      min(col(s"graft_s$i")).as(s"first_${stages(i)}"))
    val depth = stages.indices.map(i =>
      min(col(s"graft_s$i")).isNotNull.cast("long"))
      .reduce(_ + _).as("funnel_depth")
    staged.groupBy(col(entityCol)).agg(firsts.head, firsts.tail :+ depth: _*)
  }

  /** Weekly retention cohorts: entities grouped by the date of their first
    * `signupType` event, activity counted as distinct entities per
    * (cohort_date, week_offset). Pre-signup events are excluded.
    *
    * Plan: the per-entity signup aggregate and the activity join share the
    * entity-key partitioning (one entity shuffle), then the cohort rollup is a
    * second, unavoidable regrouping — but it carries only
    * (cohort_date, offset, entity) triples, deduplicated map-side by the
    * distinct-aggregate's partial step, never raw events. */
  def retentionCohorts(df: DataFrame, entityCol: String, tsCol: String,
                       typeCol: String, signupType: String): DataFrame = {
    val signup = df.where(col(typeCol) === signupType)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("graft_cohort_ts"))
    df.join(signup, entityCol)
      .where(col(tsCol) >= col("graft_cohort_ts"))
      .select(col(entityCol),
        to_date(col("graft_cohort_ts")).as("cohort_date"),
        floor(datediff(to_date(col(tsCol)), to_date(col("graft_cohort_ts"))) / 7.0)
          .cast("long").as("week_offset"))
      .groupBy(col("cohort_date"), col("week_offset"))
      .agg(count_distinct(col(entityCol)).as("n_active"))
  }

  /** First-order Markov transition matrix over per-entity event sequences:
    * `(from_type, to_type, n, p)` with `p` the row-stochastic probability
    * `n / sum(n over from_type)`. `tieCol` makes same-timestamp ordering
    * deterministic (and the oracle replayable), same as [[firstCompletion]].
    *
    * Plan: ONE entity-key exchange for the lag window; the pair rollup then
    * moves only (from, to) partial counts — K² rows for a K-type vocabulary,
    * map-side combined — and the row totals re-join as a K-row broadcast.
    * The event stream itself is never shuffled a second time. `p` is one
    * exact integer division, so a plain-SQL oracle matches bit-for-bit. */
  def transitions(df: DataFrame, entityCol: String, tsCol: String,
                  typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("graft_prev", lag(col(typeCol), 1).over(w))
      .where(col("graft_prev").isNotNull)
      .groupBy(col("graft_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("graft_tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("graft_tot")).as("p"))
  }
}
