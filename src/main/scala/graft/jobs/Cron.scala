package graft.jobs

import org.apache.spark.sql.SparkSession

import java.time.LocalDateTime
import scala.collection.concurrent.TrieMap

/** Standard 5-field cron expression (minute hour day-of-month month
  * day-of-week) — the reference schedules jobs with these
  * (mimiro-io/datahub internal/jobs/scheduler.go:50 `TriggerTypeCron`,
  * :560 `cron.ParseStandard`). Supports `*`, values, ranges `a-b`,
  * slash-step expressions (every n, over `*` or a range), and comma
  * lists; day-of-week 0-7 with both
  * 0 and 7 = Sunday. POSIX day-OR rule: when BOTH day fields are
  * restricted (neither is `*`), a time matches if either field matches.
  * Matching is minute-granular — the tick cadence of the trigger loop. */
final case class Cron(minutes: Set[Int], hours: Set[Int], dom: Set[Int],
                      months: Set[Int], dow: Set[Int],
                      domStar: Boolean, dowStar: Boolean) {

  def matches(t: LocalDateTime): Boolean = {
    val dayOk = (domStar, dowStar) match {
      case (true, true)   => true
      case (true, false)  => dow(t.getDayOfWeek.getValue % 7)
      case (false, true)  => dom(t.getDayOfMonth)
      case (false, false) => dom(t.getDayOfMonth) || dow(t.getDayOfWeek.getValue % 7)
    }
    minutes(t.getMinute) && hours(t.getHour) && months(t.getMonthValue) && dayOk
  }

  /** First matching minute strictly after `t` (bounded scan; a valid
    * expression always fires within 4 years). */
  def nextAfter(t: LocalDateTime): LocalDateTime = {
    var c = t.withSecond(0).withNano(0).plusMinutes(1)
    val limit = t.plusYears(4)
    while (!matches(c)) {
      c = c.plusMinutes(1)
      if (c.isAfter(limit)) sys.error(s"cron expression never matches: $this")
    }
    c
  }
}

object Cron {

  def parse(spec: String): Cron = {
    val fs = spec.trim.split("\\s+")
    require(fs.length == 5, s"cron spec needs 5 fields (min hour dom month dow): '$spec'")

    def field(f: String, lo: Int, hi: Int, normalize: Int => Int): Set[Int] =
      f.split(",").iterator.flatMap { part =>
        val (range, step) = part.split("/") match {
          case Array(r)    => (r, 1)
          case Array(r, s) => (r, s.toInt)
          case _           => sys.error(s"bad cron field '$part' in '$spec'")
        }
        require(step >= 1, s"bad cron step in '$part'")
        val (a, b) = range match {
          case "*"                  => (lo, hi)
          case r if r.contains("-") => val Array(x, y) = r.split("-", 2); (x.toInt, y.toInt)
          case r if step > 1        => (r.toInt, hi) // vixie: "n/step" = n..max by step
          case r                    => (r.toInt, r.toInt)
        }
        require(a >= lo && b <= hi && a <= b,
          s"cron field '$part' out of range [$lo,$hi] in '$spec'")
        (a to b by step).map(normalize)
      }.toSet

    Cron(
      minutes = field(fs(0), 0, 59, identity),
      hours   = field(fs(1), 0, 23, identity),
      dom     = field(fs(2), 1, 31, identity),
      months  = field(fs(3), 1, 12, identity),
      dow     = field(fs(4), 0, 7, _ % 7), // 7 = Sunday = 0
      domStar = fs(2) == "*",
      dowStar = fs(4) == "*")
  }
}

/** A cron-triggered job with INCREMENTAL continuation state: each firing
  * rebuilds the job from the stored since-token and advances the token
  * afterwards, so a tick processes exactly the changes recorded since
  * the previous firing (the reference's per-job sync state —
  * scheduler.go runs each registered job on its cron trigger, and
  * incremental sources resume from their continuation token).
  *
  * `makeJob` receives the current token (None on the first firing =
  * fullsync-equivalent initial run); `nextToken` is evaluated AFTER a
  * successful run and usually returns the source log's max recorded
  * value — a parquet-footer-level aggregate, not a data scan. A None
  * from `nextToken` keeps the previous token (empty tick). */
final case class CronJob(
    id: String,
    cron: Cron,
    makeJob: Option[Long] => Job,
    nextToken: () => Option[Long])

/** The trigger loop. `tick(now)` is the unit of scheduling: run every
  * job whose cron matches the minute of `now`, in id order, with per-job
  * retry — the wall-clock loop that CALLS tick belongs to the cluster's
  * orchestrator (or a Structured Streaming trigger), not the library;
  * driving tick explicitly also makes schedules simulatable in specs.
  * Token state lives here, keyed by job id, exactly one advance per
  * successful firing. */
final class CronScheduler(jobs: Seq[CronJob], maxRetries: Int = 0,
                          historyTo: Option[String] = None) {

  private val tokens = TrieMap.empty[String, Long]
  private val firingSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile private var seqSeeded = false

  /** The history dataset is SHARED, APPEND-ONLY state; `seq` is its
    * monotone change token (`JobHistory.changesSince` pages on it,
    * `latest` takes max-seq per job). A fresh AtomicLong starting at 0
    * would duplicate earlier tokens whenever a scheduler is recreated
    * (restart, second instance on the same dataset), silently breaking
    * both consumers (r17 ADVICE) — so before the FIRST append this
    * instance makes, the counter seeds from max(seq) already in the
    * dataset. Lazy because the scheduler is constructed without a
    * session; idempotent under the per-instance flag. */
  private def seedSeqOnce(registry: DatasetRegistry, ds: String): Unit =
    if (!seqSeeded) synchronized {
      if (!seqSeeded) {
        scala.util.Try(registry.get(ds)).toOption.foreach { df =>
          val m = df.agg(org.apache.spark.sql.functions.max("seq")).head()
          if (!m.isNullAt(0)) firingSeq.set(m.getLong(0))
        }
        seqSeeded = true
      }
    }

  /** The stored continuation token for a job (None before first run). */
  def token(id: String): Option[Long] = tokens.get(id)

  /** Run all jobs due at `now` with PER-JOB failure isolation — a job
    * that exhausts its retries is recorded as failed and the remaining
    * due jobs still run this minute (the reference scheduler isolates
    * per-job panics the same way; one broken job must not starve the
    * rest of the schedule). The token only advances on success.
    *
    * With `historyTo` set, every firing appends a [[JobHistory]] row
    * (job id, firing seq, tick instant, processed count, last error) —
    * the reference writes its `jobResult` at the end of every
    * `job.Run()` the same way, success or failure
    * (internal/jobs/job.go:156). */
  def tickOutcomes(spark: SparkSession, registry: DatasetRegistry,
                   now: LocalDateTime): Seq[(String, Option[Throwable])] =
    jobs.filter(_.cron.matches(now)).sortBy(_.id).map { cj =>
      val (err, processed) =
        try {
          // capture the next token BEFORE the run: rows appended while
          // the job executes stay past the stored token and surface next
          // tick (at-least-once; latestOnly sinks dedup) — reading it
          // after the run would skip that window's appends forever
          val next = cj.nextToken()
          val job = cj.makeJob(tokens.get(cj.id))
          val n =
            if (historyTo.isDefined)
              Scheduler.runWithRetryCounted(spark, registry, job, maxRetries)
            else { Scheduler.runWithRetry(spark, registry, job, maxRetries); 0L }
          next.foreach(t => tokens.put(cj.id, t))
          (None: Option[Throwable], n)
        } catch {
          case scala.util.control.NonFatal(e) => (Some(e), 0L)
        }
      historyTo.foreach { ds =>
        seedSeqOnce(registry, ds)
        val tUs = now.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          now.getNano / 1000L
        JobHistory.record(spark, registry, ds, cj.id, firingSeq.incrementAndGet(),
          tUs, tUs, processed,
          err.map(e => Option(e.getMessage).getOrElse(e.getClass.getName)))
      }
      cj.id -> err
    }

  /** Run all jobs due at `now`; returns the ids that ran successfully
    * (failures are isolated per job — see `tickOutcomes`). */
  def tick(spark: SparkSession, registry: DatasetRegistry,
           now: LocalDateTime): Seq[String] =
    tickOutcomes(spark, registry, now).collect { case (id, None) => id }
}
