package graft

import graft.operators.{Funnel, Reconcile}
import java.sql.Timestamp

/** Table reconciliation + retention cohorts. */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies deletions, insertions, and content drift; clean rows silent") {
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "s", "v")
    val b = Seq((1L, "x", 10.0), (2L, "y", 99.0), (4L, "w", 40.0))
      .toDF("k", "s", "v")
    val got = Reconcile.diff(a, b, Seq("k"), Seq("s", "v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "mismatch", 3L -> "missing_in_b", 4L -> "missing_in_a"))
  }

  test("null, empty string, and single space all hash distinctly") {
    val a = Seq((1L, Some("")), (2L, Some("")), (3L, Some(" "))).toDF("k", "s")
    val b = Seq((1L, Option.empty[String]), (2L, Some("")), (3L, Option.empty[String]))
      .toDF("k", "s")
    val got = Reconcile.diff(a, b, Seq("k"), Seq("s"))
      .as[(Long, String)].collect().toMap
    // null != "" and null != " " (NUL sentinel): real corruption never hides
    assert(got == Map(1L -> "mismatch", 3L -> "mismatch"))
  }

  test("bucket checksums localize a single damaged row; clean tables agree everywhere") {
    val a = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "v")
    val b = (1L to 1000L).map(i => (i, if (i == 500L) -1.0 else i * 2.0)).toDF("k", "v")
    val ca = Reconcile.bucketChecksums(a, Seq("k"), Seq("v"), buckets = 16)
      .as[(Long, Long, Long)].collect().map { case (b2, c, n) => (b2, (c, n)) }.toMap
    val cb = Reconcile.bucketChecksums(b, Seq("k"), Seq("v"), buckets = 16)
      .as[(Long, Long, Long)].collect().map { case (b2, c, n) => (b2, (c, n)) }.toMap
    val differing = ca.keySet.filter(k => ca(k) != cb(k))
    assert(differing.size == 1, s"exactly one bucket must differ: $differing")
    // row counts agree (content damage, not cardinality damage)
    assert(ca.values.map(_._2).sum == 1000L && cb.values.map(_._2).sum == 1000L)
    // checksum is order-independent: a shuffled input yields identical sums
    val shuffled = Reconcile.bucketChecksums(a.repartition(7), Seq("k"), Seq("v"), 16)
      .as[(Long, Long, Long)].collect().map { case (b2, c, n) => (b2, (c, n)) }.toMap
    assert(shuffled == ca)
  }

  private def ts(d: Int, h: Int = 12) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("retention cohorts bucket activity by weeks since first signup") {
    val events = Seq(
      (1L, ts(1), "signup"), (1L, ts(3), "click"), (1L, ts(9), "view"),   // w0, w0, w1
      (2L, ts(1), "click"),                                               // pre-signup: dropped
      (2L, ts(8), "signup"), (2L, ts(8, 13), "view"),                     // w0 twice -> 1 distinct
      (3L, ts(20), "view")                                                // never signs up
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.retentionCohorts(events, "user_id", "ts", "event_type", "signup")
      .as[(java.sql.Date, Long, Long)].collect()
      .map { case (d, w, n) => (d.toString, w, n) }.toSet
    assert(got == Set(
      ("2024-01-01", 0L, 1L),  // u1 signup+click week 0
      ("2024-01-01", 1L, 1L),  // u1 view day 9 -> week 1
      ("2024-01-08", 0L, 1L)   // u2 signup+view same day
    ), got.toString)
  }
}
