package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join, the operator Spark's planner has no native
  * strategy for: a plain `p.join(i, point between lo and hi)` has no equi key,
  * so Catalyst falls back to BroadcastNestedLoopJoin (or a cartesian), which is
  * O(|points| x |intervals|) — fatal when both sides are large.
  *
  * Strategy here is the classic binning rewrite: pick a bin width near the
  * typical interval length, assign each point to the single bin containing it,
  * explode each interval to the bins it overlaps, and equi-join on the bin id.
  * The shuffle key becomes `bin`, the planner uses a shuffled hash / sort-merge
  * join, and the exact `BETWEEN` predicate filters the per-bin candidates.
  * Each (point, interval) pair meets in at most one bin (the point's), so no
  * dedup pass is needed.
  *
  * Cost model: intervals replicate to `len/binWidth + 1` bins; candidate pairs
  * per bin = points-in-bin x intervals-touching-bin. A bin width close to the
  * median interval length keeps replication ~2x while bounding candidates to
  * near-neighbors. Runtime skew (a hot bin) is AQE's skew-join problem, which
  * stays enabled on this equi-join — exactly what the nested-loop fallback
  * forfeits. The reference reaches range joins only as SQL pushed to the source
  * database (`/root/reference/src/Worker/Jobs/DataIngestionJob.cs:84-112`).
  */
object RangeJoin {

  /** Join `points` to every interval in `intervals` with
    * `lo <= point <= hi` (inclusive), all columns numeric (cast dates to epoch
    * days / timestamps to epoch seconds first). Column sets must be disjoint.
    * Output: all point columns + all interval columns for each match. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = "graft_range_bin"
    val p = points.withColumn(bin, floor(col(pointCol) / binWidth))
    val i = intervals.withColumn(bin,
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(i, bin)
      .where(col(pointCol).between(col(loCol), col(hiCol)))
      .drop(bin)
  }

  /** Interval-overlap join: every (a, b) pair with
    * `aLo <= bHi && bLo <= aHi` (inclusive overlap). Same binning rewrite,
    * both sides exploded to their covered bins — and since an overlapping pair
    * shares every bin their intersection covers, each pair is emitted ONLY in
    * the first shared bin (`floor(max(aLo, bLo) / binWidth)`), which makes the
    * output exactly-once without a distinct/dedup shuffle. Column sets must be
    * disjoint. */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
                      b: DataFrame, bLo: String, bHi: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = "graft_range_bin"
    def explodeBins(df: DataFrame, lo: String, hi: String) = df.withColumn(bin,
      explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    explodeBins(a, aLo, aHi).join(explodeBins(b, bLo, bHi), bin)
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .where(col(bin) === floor(greatest(col(aLo), col(bLo)) / binWidth))
      .drop(bin)
  }
}
