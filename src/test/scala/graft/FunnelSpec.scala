package graft

import graft.operators.Funnel
import java.sql.Timestamp

/** Funnel sequencing semantics on planted event streams. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("stages count only strictly after the previous stage's first completion") {
    val events = Seq(
      // u1: clean view -> click -> purchase
      (1L, ts(1), "view", 10L), (1L, ts(2), "click", 11L), (1L, ts(3), "purchase", 12L),
      // u2: click BEFORE any view never counts; the later click does
      (2L, ts(1), "click", 20L), (2L, ts(2), "view", 21L), (2L, ts(3), "click", 22L),
      // u3: purchase before click -> depth stops at view
      (3L, ts(1), "view", 30L), (3L, ts(2), "purchase", 31L),
      // u4: no view at all
      (4L, ts(1), "click", 40L), (4L, ts(2), "purchase", 41L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Funnel.firstCompletion(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), "event_id")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp], Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, Some(ts(1)), Some(ts(2)), Some(ts(3)), 3L)))
    assert(got(2L) == ((2L, Some(ts(2)), Some(ts(3)), None, 2L)))
    assert(got(3L) == ((3L, Some(ts(1)), None, None, 1L)))
    assert(got(4L) == ((4L, None, None, None, 0L)))
  }

  test("same-instant stage pair does not advance the funnel (strict ordering)") {
    val events = Seq(
      (1L, ts(1), "view", 1L), (1L, ts(1), "click", 2L), (1L, ts(2), "click", 3L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Funnel.firstCompletion(events, "user_id", "ts", "event_type",
        Seq("view", "click"), "event_id")
      .as[(Long, Option[Timestamp], Option[Timestamp], Long)].collect().head
    assert(got == ((1L, Some(ts(1)), Some(ts(2)), 2L)))
  }

  test("all stages and the rollup share one exchange") {
    val events = Seq((1L, ts(1), "view", 1L)).toDF("user_id", "ts", "event_type", "event_id")
    val plan = Funnel.firstCompletion(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one hash exchange:\n$plan")
  }

  test("transition matrix counts adjacent pairs per entity and is " +
       "row-stochastic, with same-instant order fixed by the tiebreak") {
    val events = Seq(
      // u1: view -> click -> view; u2: view -> view
      (1L, ts(1), "view", 10L), (1L, ts(2), "click", 11L), (1L, ts(3), "view", 12L),
      (2L, ts(1), "view", 20L), (2L, ts(2), "view", 21L),
      // u3: same-instant pair — event_id orders click before view
      (3L, ts(1), "click", 30L), (3L, ts(1), "view", 31L),
      // u4: single event contributes no transition
      (4L, ts(1), "purchase", 40L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Funnel.transitions(events, "user_id", "ts", "event_type", "event_id")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // u1 yields view->click, click->view; u2 view->view; u3 click->view
    assert(got == Map(
      ("view", "click") -> ((1L, 0.5)),
      ("view", "view") -> ((1L, 0.5)),
      ("click", "view") -> ((2L, 1.0))))
    // row-stochastic: counts per from_type sum to that row's denominator
    val byFrom = got.groupBy(_._1._1).view.mapValues(_.values.map(_._2).sum)
    byFrom.foreach { case (from, pSum) =>
      assert(math.abs(pSum - 1.0) < 1e-12, s"row $from sums to $pSum") }
  }

  test("transitions shuffle the event stream once; totals join broadcasts") {
    val events = Seq((1L, ts(1), "view", 1L), (1L, ts(2), "click", 2L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val plan = Funnel.transitions(events, "user_id", "ts", "event_type", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"expected broadcast totals join:\n$plan")
  }
}
