package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the domain-mixing step of a training-data
  * pipeline ("25% of each source", "rebalance languages to a target mix").
  * `df.sampleBy` is seed-reproducible only within one Spark version/partitioning;
  * these variants are content-keyed, so the same row set is selected on any
  * engine, any partitioning, any day — which also makes them exactly
  * verifiable against a SQL oracle.
  *
  * Two shapes, different scale trade-offs:
  *  - [[byHashThreshold]]: shuffle-free — a per-row predicate on an md5-derived
  *    uniform value. Fraction is approximate (binomial), cost is a scan.
  *  - [[stratifiedExact]]: exact per-stratum counts — one shuffle by stratum
  *    (two window functions over the same partitioning, so ONE Exchange), rank
  *    rows by content hash, keep the top `ceil(f * n)`. At 100 TB the shuffle
  *    moves only the projected columns; a skewed stratum serializes through one
  *    task, so prefer byHashThreshold when strata are huge and exactness is
  *    not required.
  */
object Sampling {

  /** Uniform content hash in [0, 1): the first 15 hex digits of md5 (60 bits)
    * as a fraction. md5 exists in every engine, so membership is portable —
    * unlike xxhash64, whose seed/implementation varies. */
  private def unitHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("double") /
      lit(java.lang.Math.pow(2.0, 60.0))

  /** Keep rows whose content-hash coordinate falls below `fraction`.
    * Deterministic, shuffle-free, approximately `fraction` of each stratum
    * (strata need no column here — hashing is per-row uniform). */
  def byHashThreshold(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.where(unitHash(col(keyCol)) < fraction)
  }

  /** Exactly `ceil(fraction * count(stratum))` rows per stratum, chosen by
    * md5-of-key rank (ties broken by the key itself, so selection is total and
    * deterministic). Per-stratum overrides via `fractions`. */
  def stratifiedExact(df: DataFrame, stratumCol: String, keyCol: String,
                      fraction: Double,
                      fractions: Map[String, Double] = Map.empty): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    val byStratum = Window.partitionBy(col(stratumCol))
    val rk = row_number().over(
      byStratum.orderBy(md5(col(keyCol).cast("string")), col(keyCol)))
    val n = count(lit(1)).over(byStratum)
    val frac = fractions.foldLeft(lit(fraction)) { case (acc, (s, f)) =>
      when(col(stratumCol) === s, f).otherwise(acc)
    }
    df.withColumn("graft_rk", rk)
      .withColumn("graft_n", n)
      .where(col("graft_rk") <= ceil(col("graft_n") * frac))
      .drop("graft_rk", "graft_n")
  }
}
