package graft

import graft.pipeline.Incremental
import graft.sources.Lake
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  private def events = Lake.table(spark, sf0001, "events")
    .select(col("event_id"), col("ts"))

  test("increments partition the table exactly; an empty run is a no-op") {
    val base = graft.util.Scratch.dir("graft-inc")
    val state = s"$base/wm"; val dest = s"$base/data"
    val mm = events.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val cut = (mm.getLong(0) + mm.getLong(1)) / 2

    val n1 = Incremental.runIncrement(
      events.filter(unix_micros(col("ts")) <= cut), "ts", state, dest)
    val n2 = Incremental.runIncrement(events, "ts", state, dest)
    val total = events.count()
    assert(n1 > 0 && n2 > 0 && n1 + n2 == total, s"$n1 + $n2 != $total")

    // nothing new -> zero rows, watermark unmoved
    val wm = Incremental.loadWatermark(spark, state)
    assert(Incremental.runIncrement(events, "ts", state, dest) == 0)
    assert(Incremental.loadWatermark(spark, state) == wm)

    // landed rows = source rows, no dups
    val landed = Incremental.readAll(spark, dest).select("event_id")
    assert(landed.count() == total)
    assert(landed.distinct().count() == total)
  }

  test("cursor predicate reaches the parquet scan for native timestamp columns") {
    // events.ts is TIMESTAMP(NANOS) surfaced through a conversion, which is not
    // pushable; write a native-timestamp copy and show the increment's filter
    // lands in PushedFilters — the property that makes incremental ingest skip
    // old data at the scan.
    val base = graft.util.Scratch.dir("graft-inc-push")
    events.limit(100).write.parquet(s"$base/native")
    val native = spark.read.parquet(s"$base/native")
    val state = s"$base/wm"
    Incremental.saveWatermark(spark, state, 0L)
    val wm = Incremental.loadWatermark(spark, state).get
    val cutoff = java.time.Instant.EPOCH.plus(wm, java.time.temporal.ChronoUnit.MICROS)
    val plan = native.filter(col("ts") > lit(cutoff))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(ts"),
      s"cursor predicate not pushed:\n$plan")
  }

  test("a retried increment overwrites its own subdirectory (idempotent replay)") {
    val base = graft.util.Scratch.dir("graft-inc-retry")
    val state = s"$base/wm"; val dest = s"$base/data"
    val mm = events.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val cut = (mm.getLong(0) + mm.getLong(1)) / 2

    Incremental.runIncrement(
      events.filter(unix_micros(col("ts")) <= cut), "ts", state, dest)
    val wmAfter1 = Incremental.loadWatermark(spark, state).get
    Incremental.runIncrement(events, "ts", state, dest)
    val total = events.count()

    // simulate a crash after run 2's data commit but before its watermark
    // advance: roll the watermark back and re-run — the retry must rewrite
    // inc_from=<wmAfter1> in place, leaving no duplicates
    Incremental.saveWatermark(spark, state, wmAfter1)
    Incremental.runIncrement(events, "ts", state, dest)
    assert(Incremental.readAll(spark, dest).count() == total)
  }

  test("retention sweep drops only increments whose data is entirely <= cutoff") {
    val base = graft.util.Scratch.dir("graft-inc-ret")
    val state = s"$base/wm"; val dest = s"$base/data"
    val mm = events.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val cut1 = lo + (hi - lo) / 3
    val cut2 = lo + 2 * (hi - lo) / 3
    // three increments: (-inf, cut1], (cut1, cut2], (cut2, hi]
    Incremental.runIncrement(
      events.filter(unix_micros(col("ts")) <= cut1), "ts", state, dest)
    Incremental.runIncrement(
      events.filter(unix_micros(col("ts")) <= cut2), "ts", state, dest)
    Incremental.runIncrement(events, "ts", state, dest)
    val total = events.count()

    // cutoff below every increment's upper bound: nothing droppable
    assert(Incremental.retentionSweep(spark, dest, lo - 1).isEmpty)
    assert(Incremental.readAll(spark, dest).count() == total)

    // cutoff at cut1: exactly the first increment (upper bound cut1) drops
    val dropped = Incremental.retentionSweep(spark, dest, cut1)
    assert(dropped.size == 1 && dropped.head.contains(s"inc_from=${Long.MinValue}"))
    val remaining = Incremental.readAll(spark, dest)
    assert(remaining.count() == total - events
      .filter(unix_micros(col("ts")) <= cut1).count())
    // survivors are untouched: everything left is > cut1
    assert(remaining.filter(unix_micros(col("ts")) <= cut1).count() == 0)

    // the newest increment never drops, even with a max cutoff
    val dropped2 = Incremental.retentionSweep(spark, dest, Long.MaxValue)
    assert(dropped2.size == 1) // only the middle one
    assert(Incremental.readAll(spark, dest).count() > 0)
  }

  test("evolved read surfaces columns added by later increments, null for older rows") {
    import spark.implicits._
    val base = graft.util.Scratch.dir("graft-inc-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.parquet(s"$base/inc_from=0")
    Seq((3L, "c", 7.5), (4L, "d", 8.5)).toDF("id", "s", "score")
      .write.parquet(s"$base/inc_from=100")
    val got = Incremental.readAllEvolved(spark, base)
      .select("id", "s", "score").as[(Long, String, Option[Double])]
      .collect().toSet
    assert(got == Set((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(7.5)), (4L, "d", Some(8.5))))
  }
}
