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

  /** 15-hex-digit threshold for a fraction of the 60-bit hash space. Equal-
    * length lowercase-hex string comparison IS numeric comparison, so the
    * selection predicate is a plain string `<` that any engine reproduces. */
  private def hexThreshold(fraction: Double): String =
    "%015x".format(math.min((fraction * math.pow(2.0, 60.0)).toLong, (1L << 60) - 1))

  /** Content-hash membership test: true for ~`fraction` of keys,
    * deterministically. md5 exists in every engine (unlike xxhash64, whose
    * seed/implementation varies), so membership is portable. */
  def hashBelow(key: Column, fraction: Double): Column =
    if (fraction <= 0) lit(false)
    else if (fraction >= 1) lit(true)
    else substring(md5(key.cast("string")), 1, 15) < lit(hexThreshold(fraction))

  /** Keep rows whose content-hash coordinate falls below `fraction`.
    * Deterministic, shuffle-free, approximately `fraction` of each stratum
    * (strata need no column here — hashing is per-row uniform). */
  def byHashThreshold(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.where(hashBelow(col(keyCol), fraction))
  }

  /** Deterministic weighted resampling — domain MIXING, where weights may
    * exceed 1 ("train 2.3 epochs of src0, 0.4 of src1"): each row appears
    * `floor(w)` times plus once more for the hash-chosen `frac(w)` of keys.
    * Output gains an `epoch` column (0-based copy index) so downstream
    * shuffles/splits can keep copies distinguishable. Explode-based: no
    * driver work, no RNG, repeatable under retries — and since both the copy
    * count and the membership test are exact integer/string ops, the mix is
    * reproducible in ANSI SQL. */
  def weightedMix(df: DataFrame, stratumCol: String, keyCol: String,
                  weights: Map[String, Double],
                  defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 100),
      "weights must be in [0, 100]")
    def copiesFor(w: Double): Column =
      lit(math.floor(w).toLong) + hashBelow(col(keyCol), w - math.floor(w)).cast("long")
    val copies = weights.foldLeft(copiesFor(defaultWeight)) { case (acc, (s, w)) =>
      when(col(stratumCol) === s, copiesFor(w)).otherwise(acc)
    }
    df.withColumn("graft_copies", copies)
      .where(col("graft_copies") > 0L)
      .withColumn("epoch", explode(sequence(lit(0L), col("graft_copies") - 1L)))
      .drop("graft_copies")
  }

  /** Exactly `ceil(fraction * count(stratum))` rows per stratum, chosen by
    * md5-of-key rank (ties broken by the key itself, so selection is total and
    * deterministic). Per-stratum overrides via `fractions`. */
  def stratifiedExact(df: DataFrame, stratumCol: String, keyCol: String,
                      fraction: Double,
                      fractions: Map[String, Double] = Map.empty): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    fractions.foreach { case (s, f) =>
      require(f >= 0 && f <= 1,
        s"fraction out of range for stratum '$s': $f (use weightedMix to oversample)")
    }
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

  /** PPS systematic sampling (probability proportional to size): walk the
    * id-ordered cumulative weight line and pick the row covering each of `k`
    * equally spaced integer boundaries — the classic survey-sampling scheme
    * for "sample documents proportional to length/quality weight". A row is
    * selected iff `floor(cum·k/total)` increases across it, ALL integer
    * arithmetic — no RNG, no transcendental keys whose last-ulp could differ
    * across engines — so the selection reproduces exactly in ANSI SQL. Rows
    * heavier than `total/k` are selected once (never duplicated), so the
    * result can be slightly under `k` rows on skewed weights.
    *
    * Scale shape: the global prefix sum is distributed — ids split into
    * `parts` COUNT-BALANCED ranges (boundaries = deterministic approximate
    * quantiles of the id distribution, computed from a bounded seeded sample
    * on large inputs so they never cost a second full scan), each range
    * cumsums locally behind one Exchange, and only the `parts` per-range
    * subtotals reach the driver to become offsets (same bounded seam as the
    * IVF centroid seed), shipped back via a broadcast join (O(1) expression
    * depth at any `parts`). No global-order single-task window anywhere.
    * Quantile boundaries make the ranges hold ~n/parts rows however the ids
    * cluster in the key space — arithmetic `[0, max]/parts` ranges would
    * serialize the cumsum window when ids occupy a sliver of the space.
    * Boundary PLACEMENT only affects load balance, never the result: the
    * selection predicate reads the offset-corrected GLOBAL cumulative weight,
    * which is identical under any monotone range assignment. `cum·k` must fit
    * a long: fine for k ≤ ~10^4 against ~10^14 total weight.
    *
    * Ids must be non-null and non-negative (the documented key contract of
    * the training-data id space; the quantile ranges themselves would accept
    * any ordering). */
  def ppsSystematic(df: DataFrame, idCol: String, weightCol: String, k: Int,
                    parts: Int = 32): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = df.select(col(idCol), col(weightCol).cast("long").as("graft_w"))
    val stats = w.agg(
      count(lit(1)), count(col(idCol)),
      min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    require(stats.getLong(0) > 0, "ppsSystematic: empty input")
    require(stats.getLong(1) == stats.getLong(0),
      "ppsSystematic: ids must be non-null")
    require(stats.getLong(2) >= 0,
      s"ppsSystematic: ids must be non-negative (min=${stats.getLong(2)})")
    // Boundaries only steer load balance (never selection), so on large
    // inputs they come from a seeded ~200k-row sample — the quantile pass
    // must not cost a second full scan of a 100 TB table.
    val n = stats.getLong(0)
    val boundarySource =
      if (n > 400000L) w.sample(withReplacement = false, 200000.0 / n, seed = 42L)
      else w
    val bounds = rangeBoundaries(boundarySource, idCol, parts)
    // range id = #{boundaries <= id}: monotone in id (the correctness
    // requirement), O(1) expression depth via a single array literal. Long→
    // double id comparison is monotone at any magnitude (ties collapse into
    // the same range, which is load-balance-only).
    val ranged = w.withColumn("graft_rid",
      if (bounds.isEmpty) lit(0L)
      else size(filter(array(bounds.toIndexedSeq.map(lit(_)): _*),
        b => b <= col(idCol).cast("double"))).cast("long"))
    // bounded driver collect: one (range, subtotal) row per id range
    val subtotals = ranged.groupBy(col("graft_rid"))
      .agg(sum(col("graft_w")).as("sw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val total = subtotals.map(_._2).sum
    require(total > 0, "total weight is zero")
    // Exclusive prefix sums ship back as a broadcast-joined frame of <= parts
    // rows — O(1) expression depth at any `parts` (same rationale as
    // RangeJoin.intervalOverlapCount; a folded when() chain is linear codegen
    // depth in the range count).
    val off = subtotals.scanLeft(0L)(_ + _._2)
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = broadcast(
      subtotals.indices.map(i => (subtotals(i)._1, off(i)))
        .toDF("graft_rid", "graft_off"))
    // Explicit ROWS frame: the default RANGE frame would hand every peer of a
    // tied orderBy value the full tied-group sum, making `cum - w` not the
    // previous cumulative weight. Ids are expected unique, but the frame makes
    // the prefix sum row-accurate regardless.
    val inRange = Window.partitionBy(col("graft_rid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(offsets, Seq("graft_rid"))
      .withColumn("graft_cum", sum(col("graft_w")).over(inRange) + col("graft_off"))
      .where(expr(s"graft_cum * $k div $total") >
        expr(s"(graft_cum - graft_w) * $k div $total"))
      .select(col(idCol))
  }

  /** Count-based range boundaries for the distributed prefix sum: `parts - 1`
    * approximate id quantiles (relative error 1%), deduplicated. Exposed for
    * the range-balance spec; result quality only affects parallelism. */
  private[graft] def rangeBoundaries(df: DataFrame, idCol: String,
                                     parts: Int): Array[Double] =
    if (parts <= 1) Array.empty[Double]
    else df.stat.approxQuantile(idCol,
      (1 until parts).map(_.toDouble / parts).toArray, 0.01).distinct.sorted
}
