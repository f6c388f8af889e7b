package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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

  /** Interval-overlap join whose per-bin cost is OUTPUT-linear: the binned
    * equi-join above compares every a-in-bin with every b-in-bin, so when
    * interval DENSITY per bin grows with the corpus (many short intervals on
    * the same time span) candidates grow quadratically even though genuine
    * overlaps grow linearly. This variant runs the classic plane sweep inside
    * each bin instead: rows sorted by `lo`, a min-heap-by-`hi` active set per
    * side, every arrival first evicts actives with `hi < lo` and then pairs
    * with EXACTLY the surviving opposite-side actives — each comparison IS an
    * output pair, so per-cell CPU = sort + genuine pairs, never bin².
    *
    * Exactly-once without a dedup shuffle: for a pair, the later-`lo` row is
    * the emitter; the earlier row covers the emitter's `lo`, so both meet in
    * the emitter's native bin, and a row only emits in its own `lo`-bin.
    *
    * Composite cells (`salt` > 1) bound the other scale axis — one hot bin
    * serializing in one task: every row is replicated to `salt` cells per bin
    * and acts as an active candidate in all of them, but emits only in its
    * own hash cell. Per-cell work drops to sort + pairs/salt at the price of
    * ×salt row replication; the sort key ends with the full row struct so the
    * later-of-a-tied-pair is the SAME row in every cell (ties must not
    * double-emit across cells).
    *
    * Memory: the active sets hold only intervals overlapping the current
    * sweep position (max concurrent overlap depth), not the whole bin.
    * Inclusive overlap `aLo <= bHi && bLo <= aHi`; column sets disjoint. */
  def intervalOverlapSweep(a: DataFrame, aLo: String, aHi: String,
                           b: DataFrame, bLo: String, bHi: String,
                           binWidth: Long, salt: Int = 1): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(salt > 0, s"salt must be positive, got $salt")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "column sets must be disjoint")
    val aType = StructType(a.schema.fields)
    val bType = StructType(b.schema.fields)
    val outSchema = StructType(a.schema.fields ++ b.schema.fields)

    def prep(df: DataFrame, lo: String, hi: String, side: Int) = {
      val rowStruct = struct(df.columns.toIndexedSeq.map(col): _*)
      df.select(
          col(lo).cast("double").as("graft_lo"),
          col(hi).cast("double").as("graft_hi"),
          lit(side).as("graft_side"),
          (if (side == 0) rowStruct else lit(null).cast(aType)).as("graft_a"),
          (if (side == 1) rowStruct else lit(null).cast(bType)).as("graft_b"),
          floor(col(lo) / binWidth).as("graft_lobin"),
          pmod(hash(rowStruct), lit(salt)).as("graft_home"),
          explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth)))
            .as("graft_bin"))
        .withColumn("graft_cell", explode(sequence(lit(0), lit(salt - 1))))
        // a row emits pairs only where its lo lands AND in its own hash cell;
        // everywhere else it is candidate-only
        .withColumn("graft_native",
          col("graft_bin") === col("graft_lobin") &&
            col("graft_cell") === col("graft_home"))
        .drop("graft_lobin", "graft_home")
    }

    val combined = prep(a, aLo, aHi, 0).unionByName(prep(b, bLo, bHi, 1))
    val sch = combined.schema
    val (iLo, iHi, iSide) =
      (sch.fieldIndex("graft_lo"), sch.fieldIndex("graft_hi"), sch.fieldIndex("graft_side"))
    val (iA, iB) = (sch.fieldIndex("graft_a"), sch.fieldIndex("graft_b"))
    val (iBin, iCell, iNat) =
      (sch.fieldIndex("graft_bin"), sch.fieldIndex("graft_cell"), sch.fieldIndex("graft_native"))

    combined
      .repartition(col("graft_bin"), col("graft_cell"))
      // the trailing struct keys make the within-tie order identical in every
      // cell (salted exactly-once depends on a cross-cell-consistent "later")
      .sortWithinPartitions(col("graft_bin"), col("graft_cell"), col("graft_lo"),
        col("graft_side"), col("graft_a"), col("graft_b"))
      .mapPartitions { it =>
        val minByHi = Ordering.by[(Double, Row), Double](_._1).reverse
        var curBin = Long.MinValue
        var curCell = Int.MinValue
        var activeA = collection.mutable.PriorityQueue.empty(minByHi)
        var activeB = collection.mutable.PriorityQueue.empty(minByHi)
        it.flatMap { r =>
          val bin = r.getLong(iBin); val cell = r.getInt(iCell)
          if (bin != curBin || cell != curCell) {
            curBin = bin; curCell = cell
            activeA = collection.mutable.PriorityQueue.empty(minByHi)
            activeB = collection.mutable.PriorityQueue.empty(minByHi)
          }
          val lo = r.getDouble(iLo); val hi = r.getDouble(iHi)
          while (activeA.nonEmpty && activeA.head._1 < lo) activeA.dequeue()
          while (activeB.nonEmpty && activeB.head._1 < lo) activeB.dequeue()
          val fromA = r.getInt(iSide) == 0
          val me = if (fromA) r.getStruct(iA) else r.getStruct(iB)
          val out: Iterator[Row] =
            if (!r.getBoolean(iNat)) Iterator.empty
            else if (fromA) activeB.iterator.map { case (_, other) =>
              Row.fromSeq(me.toSeq ++ other.toSeq)
            }
            else activeA.iterator.map { case (_, other) =>
              Row.fromSeq(other.toSeq ++ me.toSeq)
            }
          // materialize before mutating the active set the iterator reads
          val emitted = out.toVector
          (if (fromA) activeA else activeB).enqueue((hi, me))
          emitted
        }
      }(Encoders.row(outSchema))
  }

  /** Per-`a`-row overlap COUNT without enumerating pairs. When interval
    * density per bin grows with the corpus, the number of genuinely
    * overlapping pairs grows quadratically — any pair-enumerating join
    * (binned or sweep) is then Ω(pairs), even though a counting consumer
    * only needs |a| output rows. This computes the count directly:
    *
    *   n(a) = #{b : bLo <= aHi  &&  bHi >= aLo}
    *        = #{b : bLo <= aHi} − #{b : bHi < aLo}
    *
    * (the subtracted set is contained in the first: bHi < aLo implies
    * bLo <= bHi < aLo <= aHi). Both terms are rank queries against sorted
    * endpoint multisets, answered in ONE pass: union b's endpoints (+1
    * events) with a's two query rows, sort by value, and read a running
    * count at each query row. Tie order encodes inclusivity — an `aLo`
    * query sorts BEFORE events at its value (strict <), an `aHi` query
    * AFTER (inclusive <=).
    *
    * The running count is the same distributed prefix sum as
    * [[graft.operators.Sampling.ppsSystematic]]: value-range partitions
    * cumsum locally behind one Exchange and only `parts` per-range
    * subtotals reach the driver as offsets — no global-order single-task
    * window. Total cost O(n log n) sort + ONE count-keyed exchange,
    * independent of pair count, so wall scales with DATA, not density².
    *
    * `aKey` must be unique and non-null in `a`. Self-overlap is counted
    * when `a`'s interval is also in `b` (subtract it caller-side).
    * Returns (aKey, overlapCount) — join back to `a` for more columns. */
  def intervalOverlapCount(a: DataFrame, aKey: String, aLo: String, aHi: String,
                           b: DataFrame, bLo: String, bHi: String,
                           parts: Int = 32): DataFrame = {
    require(parts > 0, s"parts must be positive, got $parts")
    val nullKey = lit(null).cast(a.schema(aKey).dataType)
    // ord encodes tie semantics: aLo queries (0) < events (1) < aHi queries (2)
    val events = b.select(col(bLo).cast("double").as("graft_v"), lit(1).as("graft_ord"),
        lit(1L).as("graft_dlo"), lit(0L).as("graft_dhi"), nullKey.as("graft_k"))
      .unionAll(b.select(col(bHi).cast("double"), lit(1),
        lit(0L), lit(1L), nullKey))
    val queries = a.select(col(aLo).cast("double").as("graft_v"), lit(0).as("graft_ord"),
        lit(0L).as("graft_dlo"), lit(0L).as("graft_dhi"), col(aKey).as("graft_k"))
      .unionAll(a.select(col(aHi).cast("double"), lit(2),
        lit(0L), lit(0L), col(aKey)))
    val all = events.unionAll(queries)

    val bounds = all.agg(min("graft_v"), max("graft_v")).head()
    if (bounds.isNullAt(0))
      return a.limit(0).select(col(aKey), lit(0L).as("overlap_count"))
    val lo0 = bounds.getDouble(0)
    val width = math.max((bounds.getDouble(1) - lo0) / parts, 1e-9)
    val ranged = all.withColumn("graft_rid",
      least(floor((col("graft_v") - lit(lo0)) / lit(width)), lit(parts.toLong)))

    // bounded driver collect: one subtotal row per value range (<= parts+1)
    val subs = ranged.groupBy("graft_rid")
      .agg(sum("graft_dlo").as("slo"), sum("graft_dhi").as("shi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // Exclusive prefix sums over the per-range subtotals, shipped back as a
    // BROADCAST-joined frame of <= parts+1 rows: O(1) expression depth however
    // large `parts` is. (A folded when() chain here is linear codegen depth in
    // `parts` — a compile-time cliff once ranges number in the thousands.)
    val offLo = subs.scanLeft(0L)(_ + _._2)
    val offHi = subs.scanLeft(0L)(_ + _._3)
    val spark = a.sparkSession
    import spark.implicits._
    val offsets = broadcast(
      subs.indices.map(i => (subs(i)._1, offLo(i), offHi(i)))
        .toDF("graft_rid", "graft_offlo", "graft_offhi"))

    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("graft_rid")
      .orderBy(col("graft_v"), col("graft_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(offsets, Seq("graft_rid"))
      .withColumn("graft_clo", sum("graft_dlo").over(win) + col("graft_offlo"))
      .withColumn("graft_chi", sum("graft_dhi").over(win) + col("graft_offhi"))
      .where(col("graft_k").isNotNull)
      .groupBy(col("graft_k").as(aKey))
      .agg((sum(when(col("graft_ord") === 2, col("graft_clo")).otherwise(0L)) -
        sum(when(col("graft_ord") === 0, col("graft_chi")).otherwise(0L)))
        .as("overlap_count"))
  }
}
