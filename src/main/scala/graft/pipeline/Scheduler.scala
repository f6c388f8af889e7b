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
  * supports numbers, `*`, `?`, ranges `a-b`, lists `a,b`, steps `*&#47;n` /
  * `a/n`, `SUN-SAT` / `JAN-DEC` names, and the calendar-position tokens:
  * day-of-month `L` / `L-n` / `LW` / `nW`, day-of-week `xL` / `x#n` — the full
  * dialect the reference's Quartz engine accepts. Quartz's numeric day-of-week
  * convention is `1=SUN .. 7=SAT` (NOT the unix-cron 0=SUN) —
  * `JobSchedulingService.cs:61-66` hands expressions straight to Quartz, so
  * that is the convention matched here. `nW` with `n` past the month's end
  * clamps to the last day before choosing the nearest weekday.
  */
object QuartzCron {

  final case class Field(matches: Int => Boolean)

  /** Day-of-month matcher — needs the full date for the calendar tokens. */
  private[pipeline] sealed trait DomSpec {
    def matches(d: java.time.LocalDate): Boolean
  }
  private[pipeline] object DomSpec {
    final case class Plain(f: Field) extends DomSpec {
      def matches(d: java.time.LocalDate): Boolean = f.matches(d.getDayOfMonth)
    }
    /** `L` / `L-n`: (n days before the) last day of the month. */
    final case class Last(offset: Int) extends DomSpec {
      def matches(d: java.time.LocalDate): Boolean =
        d.getDayOfMonth == d.lengthOfMonth() - offset
    }
    /** `LW`: last weekday (Mon-Fri) of the month. */
    case object LastWeekday extends DomSpec {
      def matches(d: java.time.LocalDate): Boolean =
        d.getDayOfMonth == {
          val last = d.withDayOfMonth(d.lengthOfMonth())
          (last.getDayOfWeek.getValue match {
            case 6 => last.minusDays(1) // Sat -> Fri
            case 7 => last.minusDays(2) // Sun -> Fri
            case _ => last
          }).getDayOfMonth
        }
    }
    /** `nW`: nearest weekday to day `n` without leaving the month. */
    final case class NearestWeekday(n: Int) extends DomSpec {
      def matches(d: java.time.LocalDate): Boolean = {
        val target = d.withDayOfMonth(math.min(n, d.lengthOfMonth()))
        val fire = target.getDayOfWeek.getValue match {
          case 6 => // Saturday: Friday, unless that leaves the month -> Monday
            if (target.getDayOfMonth == 1) target.plusDays(2) else target.minusDays(1)
          case 7 => // Sunday: Monday, unless that leaves the month -> Friday
            if (target.getDayOfMonth == target.lengthOfMonth()) target.minusDays(2)
            else target.plusDays(1)
          case _ => target
        }
        d.getDayOfMonth == fire.getDayOfMonth
      }
    }
  }

  /** Day-of-week matcher — calendar tokens need the date, not just the dow. */
  private[pipeline] sealed trait DowSpec {
    def matches(d: java.time.LocalDate): Boolean
  }
  private[pipeline] object DowSpec {
    final case class Plain(f: Field) extends DowSpec {
      def matches(d: java.time.LocalDate): Boolean = f.matches(quartzDowOf(d))
    }
    /** `xL`: the last weekday `x` (Quartz numbering) of the month. */
    final case class LastOfMonth(qdow: Int) extends DowSpec {
      def matches(d: java.time.LocalDate): Boolean =
        quartzDowOf(d) == qdow && d.getDayOfMonth + 7 > d.lengthOfMonth()
    }
    /** `x#n`: the nth weekday `x` of the month. */
    final case class Nth(qdow: Int, n: Int) extends DowSpec {
      def matches(d: java.time.LocalDate): Boolean =
        quartzDowOf(d) == qdow && (d.getDayOfMonth - 1) / 7 + 1 == n
    }
  }

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
    val spec = substituteNames(spec0, names)
    if (spec.contains("L") || spec.contains("W") || spec.contains("#"))
      throw new UnsupportedOperationException(
        s"Quartz '$spec0' in $fieldName: calendar tokens L/W/# are only valid " +
          "in the day-of-month / day-of-week fields")
    if (spec == "*" || spec == "?") return Field(_ => true)
    if (!spec.matches("[0-9,\\-*/]+"))
      throw new IllegalArgumentException(s"Unparseable Quartz $fieldName: '$spec0'")
    def bounded(n: Int): Int = {
      require(n >= min && n <= max,
        s"Quartz $fieldName value $n out of range [$min,$max] in '$spec0'")
      n
    }
    // Quartz ranges WRAP when a > b ('22-2' on hours = 22,23,0,1,2); a wrapped
    // or stepped range is materialized as the ordered value walk and stepping
    // takes every step-th element of it — which also guarantees every
    // syntactically valid field matches at least one value, keeping next()'s
    // scan bounded (a never-true field would otherwise walk seconds to 2200).
    def walk(a: Int, b: Int): Seq[Int] =
      if (a <= b) a to b else (a to max) ++ (min to b)
    val preds = spec.split(",").toSeq.map { part =>
      part.split("/") match {
        case Array(base, step) =>
          val stepN = step.toInt
          require(stepN > 0, s"Quartz $fieldName step must be positive in '$spec0'")
          val vals = (base.split("-") match {
            case Array("*") => walk(min, max)
            case Array(s) => walk(bounded(s.toInt), max)
            case Array(s, e) => walk(bounded(s.toInt), bounded(e.toInt))
            case _ => throw new IllegalArgumentException(
              s"Unparseable Quartz $fieldName range '$base' in '$spec0'")
          }).zipWithIndex.collect { case (v, i) if i % stepN == 0 => v }.toSet
          (v: Int) => vals(v)
        case Array(range) if range.contains("-") =>
          val Array(a, b) = range.split("-").map(s => bounded(s.toInt))
          val vals = walk(a, b).toSet
          (v: Int) => vals(v)
        case Array(single) =>
          val n = bounded(single.toInt)
          (v: Int) => v == n
      }
    }
    Field(v => preds.exists(_(v)))
  }

  private def substituteNames(spec0: String, names: Map[String, Int]): String =
    names.foldLeft(spec0.toUpperCase) { case (s, (name, num)) =>
      s.replace(name, num.toString)
    }

  /** Parse the day-of-month field, calendar tokens included. */
  private[pipeline] def parseDom(spec0: String): DomSpec = {
    val spec = spec0.toUpperCase
    spec match {
      case "L" => DomSpec.Last(0)
      case s if s.matches("L-\\d+") => DomSpec.Last(s.drop(2).toInt)
      case "LW" => DomSpec.LastWeekday
      case s if s.matches("\\d+W") =>
        val n = s.dropRight(1).toInt
        require(n >= 1 && n <= 31, s"Quartz day-of-month ${n}W out of range in '$spec0'")
        DomSpec.NearestWeekday(n)
      case _ => DomSpec.Plain(parseField(spec0, 1, 31, fieldName = "day-of-month"))
    }
  }

  /** Parse the day-of-week field, calendar tokens included (names substitute
    * first, so `FRIL` arrives here as `6L` and `MON#2` as `2#2`). */
  private[pipeline] def parseDow(spec0: String): DowSpec = {
    val spec = substituteNames(spec0, dowNames)
    spec match {
      case "L" => DowSpec.Plain(Field(_ == 7)) // bare L in dow = Saturday
      case s if s.matches("\\d+L") =>
        val d = s.dropRight(1).toInt
        require(d >= 1 && d <= 7, s"Quartz day-of-week ${d}L out of range in '$spec0'")
        DowSpec.LastOfMonth(d)
      case s if s.matches("\\d+#\\d+") =>
        val Array(d, n) = s.split("#").map(_.toInt)
        require(d >= 1 && d <= 7 && n >= 1 && n <= 5,
          s"Quartz day-of-week $d#$n out of range in '$spec0'")
        DowSpec.Nth(d, n)
      case _ => DowSpec.Plain(parseField(spec0, 1, 7, dowNames, "day-of-week"))
    }
  }

  /** java.time DayOfWeek (1=MON..7=SUN) → Quartz numeric DOW (1=SUN..7=SAT). */
  private[pipeline] def quartzDow(t: ZonedDateTime): Int =
    t.getDayOfWeek.getValue % 7 + 1
  private[pipeline] def quartzDowOf(d: java.time.LocalDate): Int =
    d.getDayOfWeek.getValue % 7 + 1

  final case class Schedule(sec: Field, minute: Field, hour: Field,
                            dom: DomSpec, month: Field, dow: DowSpec,
                            year: Field = Field(_ => true)) {
    def matches(t: ZonedDateTime): Boolean =
      sec.matches(t.getSecond) && minute.matches(t.getMinute) &&
        hour.matches(t.getHour) && dom.matches(t.toLocalDate) &&
        month.matches(t.getMonthValue) &&
        dow.matches(t.toLocalDate) &&
        year.matches(t.getYear)

    /** Next fire time strictly after `from` (second resolution; bounded scan —
      * fine for schedules with at-least-minutely density; the Quartz year
      * horizon (2199) caps pathological expressions). */
    def next(from: ZonedDateTime): Option[ZonedDateTime] = {
      var t = from.plusSeconds(1).withNano(0)
      // year-constrained expressions may legitimately sleep for years; the
      // per-year skip below makes the long scan cheap
      val limit = from.plusDays(366).withYear(2200)
      while (t.isBefore(limit)) {
        if (matches(t)) return Some(t)
        // skip in the largest safe increments
        t = if (!year.matches(t.getYear))
          t.plusYears(1).withDayOfYear(1).withHour(0).withMinute(0).withSecond(0)
        else if (!month.matches(t.getMonthValue))
          t.plusMonths(1).withDayOfMonth(1).withHour(0).withMinute(0).withSecond(0)
        else if (!dom.matches(t.toLocalDate) || !dow.matches(t.toLocalDate))
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
      parseDom(f(3)),
      parseField(f(4), 1, 12, monthNames, "month"),
      parseDow(f(5)),
      // optional 7th field: year, Quartz range 1970-2199 ('*'/'?' = any)
      if (f.length >= 7) parseField(f(6), 1970, 2199, fieldName = "year")
      else Field(_ => true))
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
