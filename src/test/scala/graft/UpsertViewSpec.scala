package graft

import graft.streaming.UpsertView
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming upsert view: batch-fold equivalence, tombstone semantics, replay
  * idempotency of the versioned snapshot layout. */
class UpsertViewSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, seq, event_id, op, value)
  private def chg(rows: (Long, Long, Long, String, Double)*): DataFrame =
    rows.toDF("user_id", "seq", "event_id", "op", "value")

  private def merge(base: DataFrame, batch: DataFrame) =
    UpsertView.mergeBatch(base, batch, "user_id", "seq", "op", "event_id")

  private def empty = chg().where(lit(false))

  test("folding batches one at a time equals one global pass, any chop point") {
    val all = Seq(
      (1L, 10L, 1L, "U", 1.0), (1L, 30L, 2L, "U", 3.0), (1L, 20L, 3L, "D", 0.0),
      (2L, 10L, 4L, "U", 2.0), (2L, 20L, 5L, "D", 0.0),
      (3L, 10L, 6L, "U", 9.0),
      (4L, 10L, 7L, "D", 0.0), (4L, 10L, 8L, "U", 5.0) // seq tie: delete wins
    )
    val global = merge(empty, chg(all: _*)).collect().toSet
    for (cut1 <- Seq(2, 4, 6); cut2 <- Seq(7)) {
      val (b1, rest) = all.splitAt(cut1)
      val (b2, b3) = rest.splitAt(cut2 - cut1)
      val folded = merge(merge(merge(empty, chg(b1: _*)), chg(b2: _*)), chg(b3: _*))
      assert(folded.collect().toSet == global, s"chop at $cut1/$cut2 diverged")
    }
  }

  test("tombstones block resurrection by a late out-of-order update") {
    val s1 = merge(empty, chg((1L, 20L, 1L, "D", 0.0)))      // delete at seq 20
    val s2 = merge(s1, chg((1L, 10L, 2L, "U", 7.0)))          // late update, seq 10
    val row = s2.as[(Long, Long, Long, String, Double)].collect().toList
    assert(row == List((1L, 20L, 1L, "D", 0.0)), s"late update must lose: $row")
  }

  test("end-to-end stream run serves latest non-deleted state and matches batch window") {
    val snap = graft.util.Scratch.dir("graft-upsert-snap").toString
    val ckpt = graft.util.Scratch.dir("graft-upsert-ckpt").toString
    val got = UpsertView.runUpsertStream(spark, "/root/testdata/sf0.001", snap, ckpt)
    val events = graft.sources.Lake.table(spark, "/root/testdata/sf0.001", "events")
    val expect = UpsertView.mergeBatch(
        UpsertView.eventsChangelog(events).where(lit(false)),
        UpsertView.eventsChangelog(events), "user_id", "seq", "op", "event_id")
      .where($"op" =!= "D").select($"user_id", $"event_id", $"value")
    assert(got.collect().toSet == expect.collect().toSet)
    assert(got.count() > 0)
  }

  test("a replayed batch rebuilds its own version from the prior one (idempotent)") {
    val snap = graft.util.Scratch.dir("graft-upsert-replay").toString
    // simulate: batch 0 written, then batch 1 written TWICE (replay after crash)
    def writeVersion(id: Long, df: DataFrame, base: DataFrame): Unit =
      merge(base, df).write.mode("overwrite").parquet(s"$snap/v=$id")
    val b0 = chg((1L, 10L, 1L, "U", 1.0))
    val b1 = chg((1L, 20L, 2L, "U", 2.0))
    writeVersion(0L, b0, empty)
    val base = spark.read.parquet(s"$snap/v=0")
    writeVersion(1L, b1, base)
    val first = spark.read.parquet(s"$snap/v=1").collect().toSet
    writeVersion(1L, b1, base) // replay
    val second = spark.read.parquet(s"$snap/v=1").collect().toSet
    assert(first == second)
    assert(second.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 20L)))
  }

  test("snapshot sweep keeps the newest versions, deletes the rest") {
    import graft.sinks.SnapshotStore
    val dir = graft.util.Scratch.dir("graft-snap-sweep").toString
    (0L to 3L).foreach(i => SnapshotStore.write(chg((1L, i, i, "U", i.toDouble)), dir, i))
    val deleted = SnapshotStore.sweep(spark, dir, keep = 2)
    assert(deleted.size == 2 && deleted.forall(p => p.endsWith("v=0") || p.endsWith("v=1")))
    assert(SnapshotStore.versions(spark, dir).map(_._1) == Seq(2L, 3L))
    // served version unharmed
    assert(spark.read.parquet(s"$dir/v=3").count() == 1)
  }

  test("changelog seq has microsecond precision (sub-second order decides the winner)") {
    import java.sql.Timestamp
    val t1 = Timestamp.valueOf("2024-01-01 10:00:00.100"); // error (delete), earlier
    val t2 = Timestamp.valueOf("2024-01-01 10:00:00.900"); // upsert, later
    val events = Seq(
      (9L, t1, 1L, "error", 0.0), (5L, t2, 1L, "view", 7.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val chg = UpsertView.eventsChangelog(events)
    val served = merge(empty, chg).where($"op" =!= "D")
    // a seconds-precision seq would tie the two and let the delete tiebreak win
    assert(served.count() == 1, "later sub-second upsert must beat earlier delete")
    assert(served.select("event_id").as[Long].head() == 5L)
  }

  test("versions() ignores uncommitted (marker-less) directories") {
    import graft.sinks.SnapshotStore
    val dir = graft.util.Scratch.dir("graft-snap-commit").toString
    SnapshotStore.write(chg((1L, 1L, 1L, "U", 1.0)), dir, 0L)
    // fake a crashed writer: directory exists, no _SUCCESS
    val half = new java.io.File(s"$dir/v=1"); half.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/v=1/part-x.parquet"),
      Array[Byte](1, 2, 3))
    assert(SnapshotStore.versions(spark, dir).map(_._1) == Seq(0L))
    assert(SnapshotStore.latest(spark, dir).map(_._1).contains(0L))
  }

  test("sweep reclaims superseded marker-less crash leftovers, spares in-flight writers") {
    import graft.sinks.SnapshotStore
    val dir = graft.util.Scratch.dir("graft-snap-crash").toString
    SnapshotStore.write(chg((1L, 0L, 1L, "U", 0.0)), dir, 0L)
    SnapshotStore.write(chg((1L, 2L, 2L, "U", 2.0)), dir, 2L)
    def markerless(id: Long): Unit = {
      new java.io.File(s"$dir/v=$id").mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/v=$id/part-x.parquet"), Array[Byte](1))
    }
    markerless(1L) // crashed writer, superseded by committed v=2 -> garbage
    markerless(5L) // above newest committed -> possibly in flight, keep
    new java.io.File(s"$dir/v=stray").mkdirs() // non-numeric foreign dir: ignored, not fatal
    val deleted = SnapshotStore.sweep(spark, dir, keep = 2)
    assert(deleted.size == 1 && deleted.head.endsWith("v=1"), deleted.toString)
    assert(new java.io.File(s"$dir/v=5").exists(), "in-flight dir must survive")
    assert(SnapshotStore.versions(spark, dir).map(_._1) == Seq(0L, 2L))
  }
}
