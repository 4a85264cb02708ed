package graft.jobs

import scala.collection.concurrent.TrieMap

/** Transform instrumentation — the reference's `Timing` and `Log`
  * transform hooks (mimiro-io/datahub DOCUMENTATION.md "Timing" /
  * "Log": `Timing(name)` registers a start, `Timing(name, true)` sends
  * the duration to statsd; `Log(value, level)` prints while developing
  * transforms). Graft transforms are Scala closures, so they call
  * these hooks directly — same authoring experience as the reference's
  * JS sandbox, minus the sandbox. `Job.run` also times every run as
  * `job.<id>` automatically (the reference's per-job statsd metrics).
  *
  * The registry is process-local state, like a statsd client's buffer;
  * a cluster deployment forwards `timings` to its metrics backend.
  * Everything here is driver-side bookkeeping — nothing touches the
  * data path. */
object Metrics {

  private val starts = TrieMap.empty[String, Long]
  private val recorded = TrieMap.empty[String, Vector[Long]]

  /** `timing(name)` = register start; `timing(name, send = true)` =
    * record the duration since the start (no-op when no start is
    * pending, matching the reference's tolerant hook). */
  def timing(name: String, send: Boolean = false): Unit =
    if (!send) { starts.put(name, System.nanoTime()); () }
    else starts.remove(name).foreach { t0 =>
      val d = System.nanoTime() - t0
      recorded.updateWith(name)(v => Some(v.getOrElse(Vector.empty) :+ d))
    }

  /** Recorded durations (nanoseconds) for a metric, oldest first. */
  def timings(name: String): Seq[Long] = recorded.getOrElse(name, Vector.empty)

  def clear(): Unit = { starts.clear(); recorded.clear() }

  private lazy val logger = org.slf4j.LoggerFactory.getLogger("graft.transform")

  /** The reference's `Log(value, level)` — INFO when omitted;
    * WARNING/ERROR map to the matching slf4j levels. */
  def log(value: Any, level: String = "INFO"): Unit = level.toUpperCase match {
    case "WARNING" | "WARN" => logger.warn(String.valueOf(value))
    case "ERROR"            => logger.error(String.valueOf(value))
    case _                  => logger.info(String.valueOf(value))
  }
}
