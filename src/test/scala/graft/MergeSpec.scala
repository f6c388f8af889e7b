package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

/** CDC snapshot merge — latest-wins semantics and plan shape. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "price")

  test("merge applies latest change per key, deletes drop, untouched pass through") {
    val changes = Seq(
      (2L, "b", 21.0, "U", 1L),  // update
      (3L, "c", 30.0, "D", 1L),  // delete
      (5L, "e", 50.0, "I", 1L),  // insert
      (2L, "b", 22.0, "U", 2L),  // later update wins over seq 1
      (4L, "d", 41.0, "U", 1L),
      (4L, "d", 40.0, "D", 2L)   // delete after update -> gone
    ).toDF("k", "name", "price", "op", "seq")
    val got = Merge.snapshot(base, changes, Seq("k"), "seq", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b", 22.0), (5L, "e", 50.0)))
  }

  test("same-seq delete beats its own upsert (op desc tiebreak)") {
    val changes = Seq(
      (1L, "a", 11.0, "U", 5L),
      (1L, "a", 10.0, "D", 5L)
    ).toDF("k", "name", "price", "op", "seq")
    val got = Merge.snapshot(base, changes, Seq("k"), "seq", "op")
      .select("k").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L))
  }

  test("merge is idempotent: re-applying the same changelog is a no-op") {
    val changes = Seq(
      (2L, "b", 99.0, "U", 1L), (3L, "c", 0.0, "D", 2L)
    ).toDF("k", "name", "price", "op", "seq")
    val once = Merge.snapshot(base, changes, Seq("k"), "seq", "op")
    val twice = Merge.snapshot(once, changes, Seq("k"), "seq", "op")
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("plan is one exchange on the key: union feeds a single window, no join") {
    val changes = Seq((2L, "b", 21.0, "U", 1L)).toDF("k", "name", "price", "op", "seq")
    val plan = Merge.snapshot(base, changes, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one hash exchange:\n$plan")
    assert(!plan.contains("Join"), s"merge must not plan a join:\n$plan")
  }

  test("touchedPartitions lists exactly the changelog's partition values") {
    val changes = Seq(
      (2L, "p1", 1.0, "U", 1L), (7L, "p3", 2.0, "I", 1L), (9L, "p3", 3.0, "D", 1L)
    ).toDF("k", "part", "price", "op", "seq")
    val got = Merge.touchedPartitions(changes, "part").as[String].collect().toSet
    assert(got == Set("p1", "p3"))
  }

  test("snapshotState: stale replay cannot regress rows or resurrect deletes") {
    val run1 = Seq(
      (2L, "b", 21.0, "U", 1L),
      (3L, "c", 30.0, "U", 1L)
    ).toDF("k", "name", "price", "op", "seq")
    val run2 = Seq(
      (2L, "b", 22.0, "U", 2L),  // newer update
      (3L, "c", 30.0, "D", 2L)   // delete
    ).toDF("k", "name", "price", "op", "seq")
    val s1 = Merge.snapshotState(base, run1, Seq("k"), "seq", "op")
    val s2 = Merge.snapshotState(s1, run2, Seq("k"), "seq", "op")
    // tombstone for key 3 is RETAINED in the stored shape
    assert(s2.where($"graft_op" === "D").select("k").as[Long].collect().toSeq == Seq(3L))
    // replaying run 1 (stale seqs) on top changes nothing served
    val s3 = Merge.snapshotState(s2, run1, Seq("k"), "seq", "op")
    val served = Merge.serve(s3).as[(Long, String, Double)].collect().toSet
    assert(served == Set((1L, "a", 10.0), (2L, "b", 22.0), (4L, "d", 40.0)),
      served.toString)
    // and folding out of order equals folding in order (winner is a max)
    val r21 = Merge.snapshotState(
      Merge.snapshotState(base, run2, Seq("k"), "seq", "op"),
      run1, Seq("k"), "seq", "op")
    assert(r21.collect().toSet == s3.collect().toSet)
  }

  test("snapshotState plans the same single key exchange as snapshot") {
    val changes = Seq((2L, "b", 21.0, "U", 1L)).toDF("k", "name", "price", "op", "seq")
    val plan = Merge.snapshotState(base, changes, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("scd2 keeps every version as an interval; deletes close without a row") {
    val changes = Seq(
      (2L, "b", 21.0, "U", 1L),  // version 2 of key 2
      (2L, "b", 22.0, "U", 3L),  // version 3 (current)
      (3L, "c", 30.0, "D", 2L),  // key 3 deleted: base closed, nothing current
      (5L, "e", 50.0, "I", 1L)   // fresh key
    ).toDF("k", "name", "price", "op", "seq")
    val got = Merge.scd2(base, changes, Seq("k"), "seq", "op")
      .as[(Long, String, Double, Long, Option[Long], Int)].collect().toSet
    assert(got == Set(
      (1L, "a", 10.0, 0L, None, 1),        // untouched: still current from seq 0
      (2L, "b", 20.0, 0L, Some(1L), 0),
      (2L, "b", 21.0, 1L, Some(3L), 0),
      (2L, "b", 22.0, 3L, None, 1),
      (3L, "c", 30.0, 0L, Some(2L), 0),    // closed by the delete, no current row
      (4L, "d", 40.0, 0L, None, 1),
      (5L, "e", 50.0, 1L, None, 1)
    ), got.toString)
  }
}
