package graft.jobs

import org.apache.spark.sql.SparkSession

/** Job runner/scheduler semantics (reference: internal/jobs/runner.go,
  * scheduler.go — cron/onchange triggers, retries, and the implicit
  * dependency order of jobs whose sources are other jobs' sinks).
  *
  * Spark translation: cron wall-clock scheduling belongs to the
  * cluster's orchestrator; what the LIBRARY owns is deterministic
  * dependency-ordered execution of a job set — a topological sort over
  * sourceName/hops → sinkName edges — plus per-job retry. Used for
  * fullsync cascades: run everything downstream of a changed dataset
  * in one call. */
object Scheduler {

  /** Run `jobSet` in topological dependency order (Kahn's algorithm,
    * ties broken by job id for determinism). Returns the execution
    * order. Throws on dependency cycles. */
  def runAll(
      spark: SparkSession,
      registry: DatasetRegistry,
      jobSet: Seq[Job],
      maxRetries: Int = 0,
      paused: Set[String] = Set.empty
  ): Seq[String] = {
    // j2 depends on j1 iff j1's sink feeds j2's source or a hop —
    // and only NAMED sinks form edges: jobs left at the default ""
    // would otherwise all mutually "depend" on each other ("" == "")
    // and abort as a phantom cycle
    def deps(j: Job): Seq[String] =
      jobSet.filter(o => o.id != j.id && o.sinkName.nonEmpty &&
        (o.sinkName == j.sourceName || j.hops.contains(o.sinkName))).map(_.id)
    val remaining = scala.collection.mutable.Set(jobSet.map(_.id): _*)
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    while (remaining.nonEmpty) {
      val ready = jobSet
        .filter(j => remaining(j.id) && deps(j).forall(d => !remaining(d)))
        .map(_.id).sorted
      if (ready.isEmpty)
        sys.error(s"dependency cycle among jobs: ${remaining.toSeq.sorted.mkString(", ")}")
      ready.foreach { id =>
        // reference Jobs API pause: a paused job is skipped (not run),
        // but still counts as satisfied for dependents — they run
        // against whatever its sink dataset currently holds
        if (!paused(id)) {
          val job = jobSet.find(_.id == id).get
          runWithRetry(spark, registry, job, maxRetries)
          order += id
        }
        remaining -= id
      }
    }
    order.toSeq
  }

  private val running = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Single-flight guard — reference internal/jobs/raffle.go: only one
    * run of a given job id at a time; a concurrent attempt loses the
    * raffle and returns false instead of double-running. */
  def runSingleFlight(spark: SparkSession, registry: DatasetRegistry, job: Job,
                      maxRetries: Int = 0): Boolean = {
    if (running.putIfAbsent(job.id, System.currentTimeMillis()).isDefined) false
    else
      try { runWithRetry(spark, registry, job, maxRetries); true }
      finally running.remove(job.id)
  }

  /** The live raffle tickets — reference scheduler.go:337
    * `GetRunningJobs` / :352 `GetRunningJob` (JobStatus{JobID,
    * Started}; the cli follows a run with it): (job id, started-ms)
    * for every job currently holding a ticket, id-ordered. */
  def runningJobs: Seq[(String, Long)] = running.toSeq.sortBy(_._1)

  /** Status of one running job (None = not running) — the "is it still
    * going" poll the reference cli uses. */
  def runningJob(id: String): Option[Long] = running.get(id)

  private def jobGroup(id: String) = s"graft-job-$id"

  /** Reference: `mim jobs operate <id> -o kill` (DOCUMENTATION.md
    * "Stopping a Job", scheduler.go:400 KillJob) — stop a RUNNING job.
    * Spark-native: every graft job run executes under a job group
    * keyed by its id, so kill cancels the group (interrupt-on-cancel)
    * and aborts its active stages cluster-wide; the raffle ticket
    * releases when the aborted run unwinds. A job that is not running
    * is a no-op, like the reference. */
  def kill(spark: SparkSession, id: String): Unit = {
    // flag BEFORE the cancel: the retry loop consults it on the very
    // failure the cancellation is about to cause
    killRequested.add(id)
    spark.sparkContext.cancelJobGroup(jobGroup(id))
  }

  /** Per-job kill flags, set by [[kill]] and consumed (removed) by the
    * retry loops. Typed, not textual: the previous detector substring-
    * matched "cancelled" in cause messages, so an ordinary failure
    * whose message happened to contain the word (an HTTP client error,
    * a user exception) skipped its retries and masqueraded as an
    * operator kill (r17 ADVICE). A failure is a kill iff the operator
    * actually asked for THIS job's group to die — which only kill()
    * knows — or the JVM interrupted the runner thread (Spark's
    * interrupt-on-cancel mechanism, also not a retryable state). */
  private val killRequested =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** A kill of `id` was requested (flag consumed), or an interrupt is
    * in the cause chain. Must propagate immediately, never burn
    * retries re-running work the operator just asked to stop. */
  private def isCancelled(id: String, e: Throwable): Boolean =
    killRequested.remove(id) ||
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .exists(_.isInstanceOf[InterruptedException])

  /** Reference: runner.go retries a failed job run. Only NonFatal
    * failures retry — an OOM or an interrupt must propagate, not
    * re-run on a broken JVM (`tickOutcomes` follows the same rule);
    * a kill propagates too (`isCancelled`). */
  def runWithRetry(spark: SparkSession, registry: DatasetRegistry, job: Job, maxRetries: Int): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      spark.sparkContext.setJobGroup(jobGroup(job.id),
        s"graft job ${job.id}", interruptOnCancel = true)
      try { job.run(spark, Some(registry)); done = true }
      catch {
        case e: Throwable if isCancelled(job.id, e) => throw e
        case scala.util.control.NonFatal(_) if attempt < maxRetries => attempt += 1
      }
      finally spark.sparkContext.clearJobGroup()
    }
  }

  /** `runWithRetry` returning the firing's processed count (the
    * reference's `jobResult.Processed`) — the history-recording path.
    * Same job-group/kill discipline as `runWithRetry`. */
  def runWithRetryCounted(spark: SparkSession, registry: DatasetRegistry,
                          job: Job, maxRetries: Int): Long = {
    var attempt = 0
    while (true) {
      spark.sparkContext.setJobGroup(jobGroup(job.id),
        s"graft job ${job.id}", interruptOnCancel = true)
      try return job.runCounted(spark, Some(registry))
      catch {
        case e: Throwable if isCancelled(job.id, e) => throw e
        case scala.util.control.NonFatal(_) if attempt < maxRetries => attempt += 1
      }
      finally spark.sparkContext.clearJobGroup()
    }
    0L // unreachable
  }
}
