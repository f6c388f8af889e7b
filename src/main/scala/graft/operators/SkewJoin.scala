package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-robust equi-join via key salting.
  *
  * A hash join shuffles both sides by the join key: one heavy-hitter key (the
  * celebrity user, the null-ish default id) lands an entire cluster's worth of
  * rows on one task. Salting spreads it: the big side gets a deterministic salt
  * in `[0, salts)`, the small side is replicated once per salt value, and the
  * join key becomes `(key, salt)` — the hot key's rows fan out over `salts`
  * tasks at the cost of replicating the other side `salts` times.
  *
  * AQE's runtime skew-join handling (`spark.sql.adaptive.skewJoin.*`) covers
  * sort-merge joins whose skew is visible in map output sizes; explicit salting
  * remains the tool when the skew is known up front, when the join must be
  * shuffled-hash, or when AQE's split thresholds don't trigger. Results are
  * identical to the unsalted join (PlanSpec-style equality spec + o02 oracle).
  *
  * The salt is derived from a hash of `saltBy` columns, NOT `rand()` — runs are
  * reproducible and retried tasks recompute identical salts (a `rand()` salt
  * breaks exactly-once under task retry).
  */
object SkewJoin {

  /** Inner equi-join of `big` (salted) against `small` (replicated).
    * @param saltBy big-side columns whose hash assigns the salt; pick columns
    *               that vary within a hot key (e.g. the fact row id). */
  def saltedInnerJoin(big: DataFrame, small: DataFrame,
                     joinKeys: Seq[(String, String)],
                     salts: Int, saltBy: Seq[String]): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol: Column = pmod(xxhash64(saltBy.map(col): _*), lit(salts))
    val b = big.withColumn("_salt", saltCol)
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    val cond = joinKeys.map { case (bk, sk) => b(bk) === s(sk) }
      .reduce(_ && _) && (b("_salt") === s("_salt"))
    b.join(s, cond).drop("_salt")
  }
}
