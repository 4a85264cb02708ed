package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Event-time analytics over the change/event stream.
  *
  * The reference exposes arbitrary aggregation over a dataset's change
  * stream through its javascript-query endpoint (mimiro-io/datahub
  * DOCUMENTATION.md "Javascript Query"); in Spark these become native
  * event-time window aggregations, which also run unchanged as
  * Structured Streaming queries (same operators, streaming source).
  *
  * Scale notes: both shapes are single-shuffle hash aggregations keyed by
  * (window, group) / (user, session) — partial aggregation happens
  * map-side, and no global sort is required.
  */
object Events {

  /** The event log's TIMESTAMP(NANOS) column read as a nanosecond long
    * (legacy nanosAsLong), converted to a proper microsecond timestamp
    * for Spark's event-time operators. Integer floor-division keeps the
    * conversion exact. */
  def tsFromNanos(nsColName: String): Column =
    // integer `div`, NOT `/`: epoch-ns (~1.7e18) exceeds double's 2^53
    // exact-integer range, so float division would corrupt timestamps
    timestamp_micros(expr(s"`$nsColName` div 1000L"))

  /** Epoch-microseconds LONG for an event-time column, adaptive to how
    * the parquet encoded it: TIMESTAMP(NANOS) read as long (legacy
    * `nanosAsLong`), plain TIMESTAMP, or TIMESTAMP_NTZ. The NTZ branch
    * interprets the naive value as UTC — every graft session (and the
    * DuckDB oracle's `epoch_us`) does the same; graft sessions pin
    * `spark.sql.session.timeZone=UTC`, which the NTZ→TZ cast consults. */
  def tsMicros(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case LongType         => expr(s"`$c` div 1000L")
    case TimestampType    => unix_micros(col(c))
    case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
    case other =>
      throw new IllegalArgumentException(s"unsupported event-time type $other for column `$c`")
  }

  /** `tsMicros` as a proper TimestampType column for Spark's event-time
    * operators (`window` / `session_window` / watermarks). */
  def tsTimestamp(df: DataFrame, c: String): Column = timestamp_micros(tsMicros(df, c))

  /** Tumbling event-time window aggregation (streaming-ready shape). */
  def tumblingAgg(events: DataFrame, nsCol: String, windowDur: String, groupCol: String): DataFrame =
    events
      .withColumn("__ts", tsTimestamp(events, nsCol))
      .groupBy(window(col("__ts"), windowDur).as("w"), col(groupCol))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"), col(groupCol), col("n"), col("sum_value"))

  /** Sliding event-time windows (duration > slide ⇒ each event lands in
    * duration/slide overlapping windows). Spark's `window` generates the
    * covering windows per row — still a single hash-agg shuffle. */
  def slidingAgg(events: DataFrame, nsCol: String, windowDur: String, slide: String, groupCol: String): DataFrame =
    events
      .withColumn("__ts", tsTimestamp(events, nsCol))
      .groupBy(window(col("__ts"), windowDur, slide).as("w"), col(groupCol))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"), col(groupCol), col("n"), col("sum_value"))

  /** Session windows: events of one user belong to the same session while
    * consecutive gaps stay under `gap` (Spark `session_window`; the
    * streaming-native operator — identical semantics in batch). */
  def sessionize(events: DataFrame, nsCol: String, userCol: String, gap: String): DataFrame =
    events
      .withColumn("__ts", tsTimestamp(events, nsCol))
      .groupBy(session_window(col("__ts"), gap).as("w"), col(userCol))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col(userCol), unix_micros(col("w.start")).as("session_start_us"), col("n_events"), col("sum_value"))

  /** Ordered event FUNNEL (the product-analytics staple: of the users
    * who did step 1, how many went on to do step 2, then 3, … in
    * order, within `horizonUs` of entering): per user, t1 = the
    * earliest step-1 event; tₖ = the earliest step-k event STRICTLY
    * after tₖ₋₁ and within the horizon of t1 (first-touch semantics —
    * the standard funnel definition). Emits one row per entered user
    * (users with no step-1 event are not in the funnel) with every
    * step timestamp (NULL once the user drops out — NULLs propagate
    * monotonically, tₖ is only ever computed from a non-NULL tₖ₋₁) and
    * `depth` = steps completed.
    *
    * Shape: the scan filters to the funnel's event types FIRST (the
    * predicate reaches the parquet scan — at 100 TB the log is mostly
    * other types), then k−1 rounds of user-keyed join + min-aggregate,
    * each a single hash shuffle with map-side partial min, no window
    * and no per-user event sort anywhere. k is the funnel length (2–5
    * in practice) — a constant number of passes over the type-filtered
    * slice, each pass strictly smaller (only users still in the
    * funnel's entry set carry forward). */
  def funnel(events: DataFrame, nsCol: String, userCol: String, typeCol: String,
             steps: Seq[String], horizonUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length, "funnel steps must be distinct")
    require(horizonUs > 0, s"bad horizon $horizonUs")
    val ev = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("user_id"),
        tsMicros(events, nsCol).as("__us"), col(typeCol).as("__et"))
    var cur = ev.filter(col("__et") === steps.head)
      .groupBy("user_id").agg(min(col("__us")).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = s"t$i"
      val tk = s"t${i + 1}"
      val stepEv = ev.filter(col("__et") === st).select(col("user_id"), col("__us"))
      val carried = (1 to i).map(j => s"t$j").map(col)
      cur = cur.join(stepEv, Seq("user_id"), "left")
        .groupBy((col("user_id") +: carried): _*)
        .agg(min(when(col("__us") > col(prev) &&
          col("__us") <= col("t1") + horizonUs, col("__us"))).as(tk))
    }
    // NULLs are monotone (t_k derives from t_{k-1}), so depth = the
    // count of non-NULL step times
    val depth = steps.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    cur.withColumn("depth", depth)
  }

  /** COHORT RETENTION (the other product-analytics staple next to
    * [[funnel]]): users bucket into cohorts by their first-seen
    * period, and each (cohort, offset) cell counts the cohort members
    * still active `offset` periods later — the retention triangle a
    * team reads week-over-week. Periods are integer event-time
    * buckets: period(t) = t div periodUs (epoch-anchored — stable
    * under reprocessing, no calendar arithmetic to diverge between
    * engines); cohort = period(first event), offset = period(event) −
    * cohort ≥ 0. Every cohort emits its offset-0 cell (a user is
    * active in their own first period by definition), so
    * `n_active / cohort_size` at offset 0 is exactly 1 and the
    * triangle normalizes row-wise.
    *
    * Shape: one user-keyed min-aggregate (first touch), one user-keyed
    * join back (map-side combinable distinct on (cohort, offset, user)
    * first — the count-distinct never sees raw event volume), then the
    * cell count: three hash shuffles, none keyed by anything
    * corpus-sized beyond the user space, no window, no sort. The
    * cohort-size join rides broadcast when cohorts are few (they are:
    * one per period). */
  def retentionCohorts(events: DataFrame, nsCol: String, userCol: String,
                       periodUs: Long): DataFrame = {
    require(periodUs > 0, s"bad period $periodUs")
    // integer `div`, not `/`: Column `/` on longs is DOUBLE division
    // (the tsFromNanos lesson — epoch-µs exceeds double's exact range)
    val ev = events.select(col(userCol).as("user_id"),
        tsMicros(events, nsCol).as("__us"))
      .select(col("user_id"), expr(s"__us div $periodUs").as("__p"))
    val first = ev.groupBy("user_id").agg(min(col("__p")).as("cohort"))
    val active = ev.join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort"),
        (col("__p") - col("cohort")).as("period_offset"))
      .distinct()
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    active.groupBy("cohort", "period_offset").agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("period_offset"), col("n_active"), col("cohort_size"))
  }
}
