package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (time-travel) join — attach to each left row the payload of the latest
  * right row at or before the left row's timestamp, per join key. The standard
  * time-series enrichment operator (DuckDB `ASOF JOIN`, pandas `merge_asof`,
  * kdb `aj`); Spark has no built-in, and the naive formulation (theta-join on
  * `r.ts <= l.ts` + max) explodes quadratically per key.
  *
  * Implementation: tag both sides, align schemas with `unionByName`, and run ONE
  * window pass per key ordered by `(ts, side)` carrying the last non-null right
  * payload forward. Right rows sort before left rows at equal timestamps, giving
  * at-or-before (`>=`) semantics.
  *
  * Scale: a single hash exchange on the join key + a linear within-partition
  * sort — no range explosion, no per-row probe, state O(1) per row during the
  * pass. Skewed keys can pre-salt by coarse time bucket (bucket boundaries then
  * need a boundary-carry pass), the same trick as any windowed scan.
  *
  * Caller contract: right rows must be unique per (key, ts) — pre-aggregate
  * (e.g. `groupBy(key, ts).agg(max(...))`) for deterministic results; ties
  * between right rows at the same instant are otherwise partition-order
  * dependent.
  */
object AsofJoin {

  /** @param payload built against `right`'s columns, attached to each left row
    *                as a struct column named `payloadName` (null when no right
    *                row is at or before the left timestamp). */
  def lastAtOrBefore(left: DataFrame, right: DataFrame,
                     keyCols: Seq[String], tsCol: String,
                     payload: Column, payloadName: String = "_asof"): DataFrame = {
    val l2 = left.withColumn("_side", lit(1))
    val r2 = right
      .select(keyCols.map(col) :+ col(tsCol) :+ payload.as(payloadName): _*)
      .withColumn("_side", lit(0))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2, allowMissingColumns = true)
      .withColumn(payloadName, last(col(payloadName), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
