package graft.pipeline

import graft.config.DatasetConfig

import java.time.ZonedDateTime
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

/** Per-dataset cron scheduling with the reference's semantics
  * (`/root/reference/src/Worker/Services/JobSchedulingService.cs:24-75`):
  * one schedule per enabled dataset, in-memory store, and — critically —
  * no overlapping runs of the same dataset (`[DisallowConcurrentExecution]`,
  * `DataIngestionJob.cs:10`): a fire that arrives while the previous run is
  * still going is skipped, not queued.
  *
  * Cron dialect: the reference uses Quartz 6/7-field expressions
  * (`sec min hour dom mon dow [year]`, e.g. `0 *&#47;2 * * * ?`). [[QuartzCron]]
  * supports the subset the reference's configs use: numbers, `*`, `?`, ranges
  * `a-b`, lists `a,b`, steps `*&#47;n` / `a/n`, and `SUN-SAT` / `JAN-DEC` names,
  * on the first six fields. Quartz's numeric day-of-week convention is
  * `1=SUN .. 7=SAT` (NOT the unix-cron 0=SUN) — `JobSchedulingService.cs:61-66`
  * hands expressions straight to Quartz, so that is the convention matched here.
  * The calendar-position tokens `L`/`W`/`#` are rejected loudly rather than
  * silently mis-parsed.
  */
object QuartzCron {

  final case class Field(matches: Int => Boolean)

  private val dowNames = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")
    .zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
  private val monthNames = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
    .zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap

  /** Parse one cron field into a predicate. `names` maps Quartz mnemonic tokens
    * (SUN..SAT / JAN..DEC) to their numeric values before numeric parsing. */
  private[pipeline] def parseField(spec0: String, min: Int, max: Int,
                                   names: Map[String, Int] = Map.empty,
                                   fieldName: String = "field"): Field = {
    // substitute mnemonic names BEFORE rejecting calendar tokens: WED contains
    // 'W' and JUL contains 'L', so the L/W/# check must only see what's left
    // after name substitution (names are matched case-insensitively, as Quartz does)
    val spec = names.foldLeft(spec0.toUpperCase) { case (s, (name, num)) =>
      s.replace(name, num.toString)
    }
    if (spec.contains("L") || spec.contains("W") || spec.contains("#"))
      throw new UnsupportedOperationException(
        s"Quartz '$spec0' in $fieldName: calendar tokens L/W/# are not supported")
    if (spec == "*" || spec == "?") return Field(_ => true)
    if (!spec.matches("[0-9,\\-*/]+"))
      throw new IllegalArgumentException(s"Unparseable Quartz $fieldName: '$spec0'")
    def bounded(n: Int): Int = {
      require(n >= min && n <= max,
        s"Quartz $fieldName value $n out of range [$min,$max] in '$spec0'")
      n
    }
    val preds = spec.split(",").toSeq.map { part =>
      part.split("/") match {
        case Array(base, step) =>
          val stepN = step.toInt
          val start = if (base == "*") min else bounded(base.split("-")(0).toInt)
          val end = base.split("-") match {
            case Array(_, e) => bounded(e.toInt)
            case _ => max
          }
          (v: Int) => v >= start && v <= end && (v - start) % stepN == 0
        case Array(range) if range.contains("-") =>
          val Array(a, b) = range.split("-").map(s => bounded(s.toInt))
          (v: Int) => v >= a && v <= b
        case Array(single) =>
          val n = bounded(single.toInt)
          (v: Int) => v == n
      }
    }
    Field(v => preds.exists(_(v)))
  }

  /** java.time DayOfWeek (1=MON..7=SUN) → Quartz numeric DOW (1=SUN..7=SAT). */
  private[pipeline] def quartzDow(t: ZonedDateTime): Int =
    t.getDayOfWeek.getValue % 7 + 1

  final case class Schedule(sec: Field, minute: Field, hour: Field,
                            dom: Field, month: Field, dow: Field) {
    def matches(t: ZonedDateTime): Boolean =
      sec.matches(t.getSecond) && minute.matches(t.getMinute) &&
        hour.matches(t.getHour) && dom.matches(t.getDayOfMonth) &&
        month.matches(t.getMonthValue) &&
        dow.matches(quartzDow(t))

    /** Next fire time strictly after `from` (second resolution; bounded scan —
      * fine for schedules with at-least-minutely density; a year guard caps
      * pathological expressions). */
    def next(from: ZonedDateTime): Option[ZonedDateTime] = {
      var t = from.plusSeconds(1).withNano(0)
      val limit = from.plusDays(366)
      while (t.isBefore(limit)) {
        if (matches(t)) return Some(t)
        // skip in the largest safe increments
        t = if (!month.matches(t.getMonthValue))
          t.plusMonths(1).withDayOfMonth(1).withHour(0).withMinute(0).withSecond(0)
        else if (!dom.matches(t.getDayOfMonth) || !dow.matches(quartzDow(t)))
          t.plusDays(1).withHour(0).withMinute(0).withSecond(0)
        else if (!hour.matches(t.getHour))
          t.plusHours(1).withMinute(0).withSecond(0)
        else if (!minute.matches(t.getMinute))
          t.plusMinutes(1).withSecond(0)
        else t.plusSeconds(1)
      }
      None
    }
  }

  def parse(expr: String): Schedule = {
    val f = expr.trim.split("\\s+")
    require(f.length >= 6, s"Quartz cron needs >= 6 fields: '$expr'")
    // Quartz requires exactly one of day-of-month / day-of-week to be '?'
    // (specifying both is rejected by Quartz, not silently ANDed) — fail loud
    // like the unsupported-calendar-token policy above.
    if (f(3) != "?" && f(3) != "*" && f(5) != "?" && f(5) != "*")
      throw new UnsupportedOperationException(
        s"Quartz '$expr': specifying both day-of-month and day-of-week is not supported; use '?' in one")
    Schedule(
      parseField(f(0), 0, 59, fieldName = "second"),
      parseField(f(1), 0, 59, fieldName = "minute"),
      parseField(f(2), 0, 23, fieldName = "hour"),
      parseField(f(3), 1, 31, fieldName = "day-of-month"),
      parseField(f(4), 1, 12, monthNames, "month"),
      parseField(f(5), 1, 7, dowNames, "day-of-week"))
  }
}

/** Driver-side scheduler loop: evaluates each enabled dataset's cron every
  * second and launches runs on a work pool, skipping fires whose previous run
  * is still in flight. The job body is injected, so tests (and alternative
  * runners) decide what a "run" is. */
final class DatasetScheduler(datasets: Seq[DatasetConfig],
                             runJob: DatasetConfig => Unit,
                             clock: () => ZonedDateTime) {
  private val running = new ConcurrentHashMap[String, AtomicBoolean]()
  private val fired = new ConcurrentHashMap[String, java.lang.Long]()
  private var ticker: ScheduledExecutorService = _
  private val workers = Executors.newCachedThreadPool()

  val schedules: Map[String, QuartzCron.Schedule] =
    datasets.filter(_.enabled)
      .map(d => d.datasetId -> QuartzCron.parse(d.cronExpression)).toMap

  /** One scheduler tick: fire every dataset whose cron matches `now` and whose
    * previous run has finished (DisallowConcurrentExecution — the gate is held
    * until the job completes on the worker pool, so a fire that lands during a
    * long run is skipped, not queued). `execute` is the launch strategy; tests
    * pass `r => r.run()` for synchronous determinism. Returns ids launched. */
  def tick(now: ZonedDateTime,
           execute: Runnable => Unit = workers.execute(_)): Seq[String] = {
    val epochSec = now.toEpochSecond
    datasets.filter(_.enabled).flatMap { d =>
      val sched = schedules(d.datasetId)
      val last = Option(fired.get(d.datasetId)).map(_.longValue).getOrElse(Long.MinValue)
      if (sched.matches(now) && last != epochSec) {
        val gate = running.computeIfAbsent(d.datasetId, _ => new AtomicBoolean(false))
        if (gate.compareAndSet(false, true)) {
          fired.put(d.datasetId, epochSec)
          execute(() => try runJob(d) finally gate.set(false))
          Some(d.datasetId)
        } else None // previous run still going -> skip this fire
      } else None
    }
  }

  /** Is this dataset's previous run still in flight? (test/observability hook) */
  def isRunning(datasetId: String): Boolean =
    Option(running.get(datasetId)).exists(_.get())

  def start(): Unit = {
    ticker = Executors.newSingleThreadScheduledExecutor()
    ticker.scheduleAtFixedRate(() => tick(clock()), 0, 1, TimeUnit.SECONDS)
  }

  /** Stop ticking and wait for in-flight runs to drain — callers may tear down
    * shared resources (the SparkSession) right after. */
  def stop(): Unit = {
    if (ticker != null) { ticker.shutdownNow(); () }
    workers.shutdown()
    workers.awaitTermination(120, TimeUnit.SECONDS)
    ()
  }
}
