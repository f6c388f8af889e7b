package graft

import graft.config.DatasetConfig
import graft.pipeline.{DatasetScheduler, QuartzCron}
import org.scalatest.funsuite.AnyFunSuite

import java.time.{ZoneOffset, ZonedDateTime}

class SchedulerSpec extends AnyFunSuite {

  private def at(h: Int, m: Int, s: Int) =
    ZonedDateTime.of(2026, 8, 12, h, m, s, 0, ZoneOffset.UTC)

  test("Quartz cron parsing: the reference's own expressions") {
    // dataset-sales-sqlserver.json: every 2 minutes
    val every2m = QuartzCron.parse("0 */2 * * * ?")
    assert(every2m.matches(at(10, 0, 0)))
    assert(every2m.matches(at(10, 2, 0)))
    assert(!every2m.matches(at(10, 1, 0)))
    assert(!every2m.matches(at(10, 2, 30)))
    // dataset-hr-oracle.json: every minute
    val everyMin = QuartzCron.parse("0 * * * * ?")
    assert(everyMin.matches(at(23, 59, 0)))
    assert(!everyMin.matches(at(23, 59, 1)))
    // default: top of every hour
    val hourly = QuartzCron.parse("0 0 * * * ?")
    assert(hourly.matches(at(7, 0, 0)))
    assert(!hourly.matches(at(7, 30, 0)))
  }

  test("optional 7th field constrains the year; next() skips whole years to reach it") {
    val y = QuartzCron.parse("0 0 12 1 1 ? 2030")
    assert(y.matches(ZonedDateTime.of(2030, 1, 1, 12, 0, 0, 0, ZoneOffset.UTC)))
    assert(!y.matches(ZonedDateTime.of(2029, 1, 1, 12, 0, 0, 0, ZoneOffset.UTC)))
    val n = y.next(at(10, 0, 0)) // 2026-08-12 -> first fire is 2030-01-01
    assert(n.contains(ZonedDateTime.of(2030, 1, 1, 12, 0, 0, 0, ZoneOffset.UTC)))
    // year range
    val r = QuartzCron.parse("0 0 0 1 * ? 2026-2027")
    assert(r.matches(ZonedDateTime.of(2027, 5, 1, 0, 0, 0, 0, ZoneOffset.UTC)))
    assert(!r.matches(ZonedDateTime.of(2028, 5, 1, 0, 0, 0, 0, ZoneOffset.UTC)))
    // a past-only year never fires again
    assert(QuartzCron.parse("0 0 0 1 1 ? 2020").next(at(0, 0, 0)).isEmpty)
  }

  test("ranges wrap when a > b (Quartz '22-2' semantics); next() stays bounded") {
    val h = QuartzCron.parse("0 0 22-2 * * ?")
    assert(h.matches(at(22, 0, 0)) && h.matches(at(23, 0, 0)))
    assert(h.matches(at(0, 0, 0)) && h.matches(at(2, 0, 0)))
    assert(!h.matches(at(3, 0, 0)) && !h.matches(at(21, 0, 0)))
    // wrapped + stepped: every 2nd hour of the walk 22,23,0,1,2 -> 22,0,2
    val s = QuartzCron.parse("0 0 22-2/2 * * ?")
    assert(s.matches(at(22, 0, 0)) && s.matches(at(0, 0, 0)) && s.matches(at(2, 0, 0)))
    assert(!s.matches(at(23, 0, 0)) && !s.matches(at(1, 0, 0)))
    // a wrapped minute range always matches something, so next() returns fast
    assert(QuartzCron.parse("0 50-10 * * * ?").next(at(12, 20, 0)).isDefined)
    // zero step is rejected loudly
    intercept[IllegalArgumentException](QuartzCron.parse("0 */0 * * * ?"))
  }

  test("ranges, lists, and stepped ranges") {
    val s = QuartzCron.parse("0 10-20/5 9,17 * * ?")
    assert(s.matches(at(9, 10, 0)))
    assert(s.matches(at(17, 15, 0)))
    assert(s.matches(at(9, 20, 0)))
    assert(!s.matches(at(9, 12, 0)))
    assert(!s.matches(at(12, 10, 0)))
  }

  test("Quartz numeric day-of-week uses 1=SUN..7=SAT") {
    // 2026-08-12 is a Wednesday -> Quartz 4. Quartz Monday is 2.
    val wed = QuartzCron.parse("0 0 12 ? * 4")
    assert(wed.matches(at(12, 0, 0)))
    val mon = QuartzCron.parse("0 0 12 ? * 2")
    assert(!mon.matches(at(12, 0, 0)))
    // 7 = Saturday must be expressible (2026-08-15 is a Saturday)
    val sat = QuartzCron.parse("0 0 12 ? * 7")
    assert(sat.matches(ZonedDateTime.of(2026, 8, 15, 12, 0, 0, 0, ZoneOffset.UTC)))
    assert(!sat.matches(at(12, 0, 0)))
  }

  test("day and month names: MON-FRI, SAT,SUN, JAN-DEC") {
    val weekdays = QuartzCron.parse("0 0 9 ? * MON-FRI")
    assert(weekdays.matches(at(9, 0, 0))) // Wednesday
    assert(!weekdays.matches(ZonedDateTime.of(2026, 8, 15, 9, 0, 0, 0, ZoneOffset.UTC)))
    val weekend = QuartzCron.parse("0 0 9 ? * SAT,SUN")
    assert(!weekend.matches(at(9, 0, 0)))
    assert(weekend.matches(ZonedDateTime.of(2026, 8, 16, 9, 0, 0, 0, ZoneOffset.UTC)))
    val aug = QuartzCron.parse("0 0 9 * AUG ?")
    assert(aug.matches(at(9, 0, 0)))
    val dec = QuartzCron.parse("0 0 9 * DEC ?")
    assert(!dec.matches(at(9, 0, 0)))
  }

  test("WED and JUL parse despite containing W/L (names substitute before the token check)") {
    // 2026-08-12 is a Wednesday
    val wed = QuartzCron.parse("0 0 9 ? * WED")
    assert(wed.matches(at(9, 0, 0)))
    assert(!wed.matches(ZonedDateTime.of(2026, 8, 13, 9, 0, 0, 0, ZoneOffset.UTC)))
    // lowercase names parse identically (Quartz is case-insensitive)
    val wedLower = QuartzCron.parse("0 0 9 ? * wed")
    assert(wedLower.matches(at(9, 0, 0)))
    val jul = QuartzCron.parse("0 0 9 * JUL ?")
    assert(!jul.matches(at(9, 0, 0))) // August
    assert(jul.matches(ZonedDateTime.of(2026, 7, 12, 9, 0, 0, 0, ZoneOffset.UTC)))
  }

  test("specifying both day-of-month and day-of-week is rejected (Quartz requires '?')") {
    // Quartz rejects this outright; silently ANDing them would be a semantic
    // divergence ('0 0 12 15 * 2' would fire only on Mondays falling on the 15th)
    intercept[UnsupportedOperationException] { QuartzCron.parse("0 0 12 15 * 2") }
    intercept[UnsupportedOperationException] { QuartzCron.parse("0 0 12 1-5 * MON") }
    // one-sided constraints stay valid
    QuartzCron.parse("0 0 12 15 * ?")
    QuartzCron.parse("0 0 12 ? * MON")
    QuartzCron.parse("0 0 12 * * ?")
  }

  private def on(y: Int, mo: Int, d: Int, h: Int = 12) =
    ZonedDateTime.of(y, mo, d, h, 0, 0, 0, ZoneOffset.UTC)

  test("day-of-month L / L-n: (offset from) the last day of the month") {
    val last = QuartzCron.parse("0 0 12 L * ?")
    assert(last.matches(on(2026, 8, 31)))
    assert(!last.matches(on(2026, 8, 30)))
    assert(last.matches(on(2024, 2, 29))) // leap February
    assert(!last.matches(on(2024, 2, 28)))
    val lMinus2 = QuartzCron.parse("0 0 12 L-2 * ?")
    assert(lMinus2.matches(on(2026, 8, 29)))
    assert(!lMinus2.matches(on(2026, 8, 31)))
  }

  test("day-of-month LW: last weekday of the month") {
    val lw = QuartzCron.parse("0 0 12 LW * ?")
    assert(lw.matches(on(2026, 8, 31)))  // Aug 31 2026 is a Monday
    assert(!lw.matches(on(2026, 8, 28)))
    assert(lw.matches(on(2026, 5, 29)))  // May 31 2026 is a Sunday -> Fri 29th
    assert(!lw.matches(on(2026, 5, 31)))
  }

  test("day-of-month nW: nearest weekday without leaving the month") {
    val w15 = QuartzCron.parse("0 0 12 15W * ?")
    assert(w15.matches(on(2026, 8, 14)))  // Aug 15 2026 Sat -> Fri 14th
    assert(!w15.matches(on(2026, 8, 15)))
    assert(w15.matches(on(2026, 3, 16)))  // Mar 15 2026 Sun -> Mon 16th
    val w1 = QuartzCron.parse("0 0 12 1W * ?")
    assert(w1.matches(on(2026, 8, 3)))    // Aug 1 Sat: Friday leaves month -> Mon 3rd
    assert(!w1.matches(on(2026, 8, 1)))
    val w31 = QuartzCron.parse("0 0 12 31W * ?")
    assert(w31.matches(on(2026, 2, 27)))  // Feb clamps to 28th (Sat) -> Fri 27th
  }

  test("day-of-week xL and x#n: last / nth weekday of the month (Quartz 6=FRI)") {
    val lastFri = QuartzCron.parse("0 0 12 ? * 6L")
    assert(lastFri.matches(on(2026, 8, 28)))
    assert(!lastFri.matches(on(2026, 8, 21)))
    val friL = QuartzCron.parse("0 0 12 ? * FRIL")
    assert(friL.matches(on(2026, 8, 28)))
    val thirdFri = QuartzCron.parse("0 0 12 ? * 6#3")
    assert(thirdFri.matches(on(2026, 8, 21)))
    assert(!thirdFri.matches(on(2026, 8, 14)) && !thirdFri.matches(on(2026, 8, 28)))
    val secondMon = QuartzCron.parse("0 0 12 ? * MON#2")
    assert(secondMon.matches(on(2026, 8, 10)))
    // bare L in the dow field means Saturday
    assert(QuartzCron.parse("0 0 12 ? * L").matches(on(2026, 8, 15)))
  }

  test("calendar tokens outside dom/dow, and bad values, still fail loudly") {
    intercept[UnsupportedOperationException] { QuartzCron.parse("L 0 12 * * ?") }
    intercept[IllegalArgumentException] { QuartzCron.parse("0 0 12 ? * 8L") }
    intercept[IllegalArgumentException] { QuartzCron.parse("0 0 12 ? * 6#6") }
    intercept[IllegalArgumentException] { QuartzCron.parse("0 0 12 99W * ?") }
    // out-of-range numeric DOW (unix-cron 0=SUN habit) fails loudly too
    intercept[IllegalArgumentException] { QuartzCron.parse("0 0 12 ? * 0") }
    // L-constrained dom combined with a constrained dow is still rejected
    intercept[UnsupportedOperationException] { QuartzCron.parse("0 0 12 L * MON") }
  }

  test("next() finds the following fire time") {
    val every2m = QuartzCron.parse("0 */2 * * * ?")
    assert(every2m.next(at(10, 0, 0)).contains(at(10, 2, 0)))
    assert(every2m.next(at(10, 1, 59)).contains(at(10, 2, 0)))
    val hourly = QuartzCron.parse("0 0 * * * ?")
    assert(hourly.next(at(10, 0, 0)).contains(at(11, 0, 0)))
  }

  test("tick fires matching enabled datasets once per matching second") {
    var runs = List.empty[String]
    val ds = Seq(
      DatasetConfig(datasetId = "a", cronExpression = "0 * * * * ?"),
      DatasetConfig(datasetId = "b", cronExpression = "0 */2 * * * ?"),
      DatasetConfig(datasetId = "off", enabled = false, cronExpression = "0 * * * * ?"))
    val sched = new DatasetScheduler(ds, d => runs ::= d.datasetId, () => at(10, 1, 0))
    val launched = sched.tick(at(10, 1, 0), r => r.run())
    assert(launched == Seq("a")) // b fires only on even minutes; off disabled
    assert(sched.tick(at(10, 1, 0), r => r.run()).isEmpty) // same second: no refire
    assert(sched.tick(at(10, 2, 0), r => r.run()).sorted == Seq("a", "b"))
    assert(runs.sorted == List("a", "a", "b"))
  }

  test("DisallowConcurrentExecution: overlapping fire is skipped, not queued") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.CountDownLatch(1)
    var runs = 0
    val ds = Seq(DatasetConfig(datasetId = "slow", cronExpression = "* * * * * ?"))
    val sched = new DatasetScheduler(ds,
      _ => { runs += 1; started.countDown(); gate.await() }, () => at(0, 0, 0))
    val t = new Thread(() => { sched.tick(at(0, 0, 0), r => r.run()); () })
    t.start()
    started.await()
    // a second fire while the first still runs must be skipped
    assert(sched.isRunning("slow"))
    assert(sched.tick(at(0, 0, 1), r => r.run()).isEmpty)
    gate.countDown(); t.join()
    assert(runs == 1)
    // after completion the next fire goes through
    assert(sched.tick(at(0, 0, 2), r => r.run()) == Seq("slow"))
    assert(runs == 2)
  }
}
