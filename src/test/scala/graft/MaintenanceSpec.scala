package graft

import graft.jobs._
import graft.ops.ChangeLog
import org.apache.spark.sql.functions._

import java.time.LocalDateTime

/** Scheduled maintenance composition (reference scheduler.go:21-22:
  * stats at 02:00, GC at 19:00) driven by SIMULATED ticks. */
class MaintenanceSpec extends SparkSpec {

  private def mkLog() = {
    val s = spark
    import s.implicits._
    // 4 users × 25 versions each; recorded token = event_id 1..100;
    // user 4 deleted at its last version (tombstone must survive GC)
    (1L to 100L).map { eid =>
      val uid = (eid - 1) % 4 + 1
      (uid, eid, eid * 1.5, uid == 4L && eid == 100L)
    }.toDF("user_id", "event_id", "value", "deleted")
  }

  test("cron ticks: nothing runs off-schedule; stats refresh advances per firing") {
    val reg = new DatasetRegistry
    reg.put("log", mkLog())
    val sched = Maintenance.scheduler(reg, Seq(Maintenance.Target("log")),
      logName = "log", idCol = "user_id", recordedCol = "event_id", keepTokens = 50L)

    // off-schedule minute: neither job fires
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 13, 3, 7)).isEmpty)
    assert(!reg.names.contains("stats"))

    // 02:00 → stats land with refresh_seq 1 (per-dataset row + the
    // generated `all` rollup)
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 13, 2, 0))
      == Seq("scheduled_stats_update"))
    val s1 = reg.get("stats").collect().map(r => r.getAs[String]("dataset") -> r).toMap
    assert(s1.keySet == Set("log", "all"))
    assert(s1("log").getAs[Long]("rows") == 100L)
    assert(s1("all").getAs[Long]("rows") == 100L)
    assert(s1("log").getAs[Long]("refresh_seq") == 1L)

    // next day 02:00 → the refresh provably advanced (seq 2), fresh count
    reg.put("log", mkLog().limit(80))
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 14, 2, 0))
      == Seq("scheduled_stats_update"))
    val s2 = reg.get("stats").collect().map(r => r.getAs[String]("dataset") -> r).toMap
    assert(s2("log").getAs[Long]("refresh_seq") == 2L)
    assert(s2("log").getAs[Long]("rows") == 80L)
  }

  test("GC tick sweeps pre-watermark history; as-of queries at tokens >= T unchanged") {
    val reg = new DatasetRegistry
    reg.put("log", mkLog())
    val pre = reg.get("log")
    val keep = 40L
    val t = 100L - keep // watermark the job must compute and store
    // pre-GC as-of answers at every token >= T, plus latestOnly
    def snap(df: org.apache.spark.sql.DataFrame, at: Long) =
      ChangeLog.asOf(df, "user_id", "event_id", at)
        .orderBy("user_id").collect().toSeq
    val preAsOf = Seq(t, t + 17, 100L).map(at => at -> snap(pre, at)).toMap
    val preLatest = ChangeLog.latestOnly(pre, "user_id", "event_id")
      .orderBy("user_id").collect().toSeq

    val sched = Maintenance.scheduler(reg, Seq(Maintenance.Target("log")),
      logName = "log", idCol = "user_id", recordedCol = "event_id", keepTokens = keep)
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 13, 19, 0))
      == Seq("scheduled_gc"))
    assert(sched.token("scheduled_gc").contains(t), "stored token = applied watermark")

    val post = reg.get("log")
    // history shrank: pre-T versions collapse to one per entity
    val nPost = post.count()
    assert(nPost < 100L, s"GC must drop pre-watermark versions, kept $nPost")
    assert(post.filter(col("event_id") <= t).groupBy("user_id").count()
      .filter(col("count") > 1).isEmpty, "at most one pre-T version per entity survives")
    // the GC contract: every as-of at tokens >= T identical, latest intact
    preAsOf.foreach { case (at, want) => assert(snap(post, at) == want, s"asOf($at) changed") }
    assert(ChangeLog.latestOnly(post, "user_id", "event_id")
      .orderBy("user_id").collect().toSeq == preLatest)
    // the deleted-at-100 tombstone is user 4's latest → must survive
    assert(post.filter(col("user_id") === 4 && col("event_id") === 100).count() == 1)

    // second firing with no new appends: watermark unchanged, idempotent
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 14, 19, 0))
      == Seq("scheduled_gc"))
    assert(sched.token("scheduled_gc").contains(t))
    assert(reg.get("log").count() == nPost, "GC is idempotent at a fixed watermark")
  }

  test("stats-state maintenance job: off-schedule no-op; firing compacts + restores sketch ≡ one-shot; refiring idempotent") {
    val s = spark
    import s.implicits._
    import graft.text.{StatsState, TextAnalysis}
    val tbl = "sst_maint"
    // doc log: v1 of docs 1-3, then a gram-REMOVING re-ingest of doc 1
    // (recorded 4) — the one edit class no absorb can keep the sketch
    // exact under (distinct union is not invertible)
    val v1 = Seq((1L, "a", "alpha beta gamma delta", 1L),
      (2L, "a", "epsilon zeta eta kappa", 2L), (3L, "b", "mu nu xi omicron", 3L))
    val re = Seq((1L, "a", "alpha beta zzz", 4L))
    val log = (v1 ++ re).toDF("doc_id", "lang", "text", "recorded")
    val reg = new DatasetRegistry
    reg.put("doclog", log)
    def docs(rows: Seq[(Long, String, String, Long)]) =
      rows.map { case (i, g, t, _) => (i, g, t) }.toDF("doc_id", "lang", "text")
    StatsState.buildStatsState(docs(v1), "text", "lang", "doc_id", tbl,
      n = 3, k = 8, buckets = 4, shardSize = 2L)
    assert(StatsState.absorbIntoStatsState(s, docs(re), "text", "lang", "doc_id",
      tbl, 1L, 3, 8))
    val effective = docs(Seq((1L, "a", "alpha beta zzz", 0L)) ++ v1.drop(1))
    def kmvMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def freqRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.toSeq.drop(1))).sortBy(_._1).toSeq
    val wantKmv = kmvMap(TextAnalysis.ngramKmv(effective, "text", "lang", 3, 8)
      .select(col("lang"), col("kmv_est")))
    val wantStats = freqRows(TextAnalysis.tokenFrequencyStats(effective, "text", "lang", 10))
    // pre-fire: freq leg already exact, sketch STRICTLY over-approximates
    assert(freqRows(StatsState.tokenStatsReadout(s, tbl, 10)) == wantStats)
    assert(kmvMap(StatsState.kmvReadout(s, tbl, 8))("a") > wantKmv("a"),
      "a gram-removing re-ingest must leave the sketch over-approximating")
    val jobId = s"stats_maintain_$tbl"
    val sched = new CronScheduler(Seq(StatsState.statsStateJob(reg, "doclog",
      "doc_id", "recorded", "text", "lang", tbl, 3, 8)))
    // off-schedule minute: nothing fires, nothing changes
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 15, 3, 7)).isEmpty)
    assert(kmvMap(StatsState.kmvReadout(s, tbl, 8))("a") > wantKmv("a"))
    // 02:00 firing: the log nets (no negative cells, one row per live
    // cell) and the scheduled refresh restores sketch ≡ one-shot
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 16, 2, 0)) == Seq(jobId))
    assert(kmvMap(StatsState.kmvReadout(s, tbl, 8)) == wantKmv)
    assert(freqRows(StatsState.tokenStatsReadout(s, tbl, 10)) == wantStats)
    val lg = s.table(s"${tbl}_freq")
    assert(lg.filter(col("c") <= 0L).isEmpty)
    assert(lg.groupBy("id", "group", "token").count().filter(col("count") > 1L).isEmpty)
    assert(sched.token(jobId).contains(4L), "token must record the log watermark the refresh saw")
    // idempotent refiring: same readouts, replay markers intact
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 17, 2, 0)) == Seq(jobId))
    assert(kmvMap(StatsState.kmvReadout(s, tbl, 8)) == wantKmv)
    assert(freqRows(StatsState.tokenStatsReadout(s, tbl, 10)) == wantStats)
    assert(!StatsState.absorbIntoStatsState(s, docs(re), "text", "lang", "doc_id",
      tbl, 1L, 3, 8), "maintenance must not re-open replay")
  }

  test("stats job reports footer-level bytes for path-backed targets; all-rollup sums") {
    val reg = new DatasetRegistry
    reg.put("log", mkLog())
    val path = s"$sfDir/orders.parquet"
    val snap = Maintenance.statsSnapshot(spark, reg,
      Seq(Maintenance.Target("log"), Maintenance.Target("orders", Some(path))), seq = 7L)
      .collect().map(r => r.getAs[String]("dataset") -> r).toMap
    assert(snap("log").isNullAt(snap("log").fieldIndex("data_bytes")),
      "registry-only target has no byte stats")
    val ob = snap("orders").getAs[Long]("data_bytes")
    assert(ob == Statistics.parquetDataBytes(spark, path) && ob > 0)
    assert(snap("orders").getAs[Long]("rows") == spark.read.parquet(path).count())
    assert(snap("orders").getAs[Long]("refresh_seq") == 7L)
    // the reference's generated `all` entry: rows and bytes summed over
    // every dataset (bytes sum skips targets that report none)
    assert(snap.keySet == Set("log", "orders", "all"))
    assert(snap("all").getAs[Long]("rows")
      == snap("log").getAs[Long]("rows") + snap("orders").getAs[Long]("rows"))
    assert(snap("all").getAs[Long]("data_bytes") == ob)
  }

  test("stats snapshot is ONE distributed pass, not a per-target driver loop") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    val nTargets = 24
    (0 until nTargets).foreach(i => reg.put(s"ds$i", (0L until (10L + i)).toDF("v")))
    // count driver-side ACTIONS (query executions), not Spark jobs —
    // AQE legitimately splits one union plan's stages into many jobs,
    // but the r9 shape ran a SEPARATE count() action per target; the
    // distributed snapshot must run a bounded handful regardless of
    // target count
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        actions.incrementAndGet(); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    s.listenerManager.register(qel)
    try {
      val snap = Maintenance.statsSnapshot(spark, reg,
        (0 until nTargets).map(i => Maintenance.Target(s"ds$i")), seq = 1L).collect()
      // listener events are delivered async; wait for the count to
      // settle (the bus drains well inside a second when idle)
      var last = -1
      while (actions.get() != last) { last = actions.get(); Thread.sleep(500L) }
      assert(snap.length == nTargets + 1)
      assert(snap.find(_.getString(0) == "all").get.getLong(1)
        == (0 until nTargets).map(10L + _).sum)
      assert(actions.get() <= 4,
        s"snapshot must not run per-target actions: ${actions.get()} for $nTargets targets")
    } finally s.listenerManager.unregister(qel)
  }

  test("stats top ranks datasets per storage category, rollup excluded") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    Seq("a" -> 5L, "b" -> 50L, "c" -> 20L, "d" -> 1L).foreach { case (n, rows) =>
      reg.put(n, (0L until rows).toDF("v"))
    }
    val snap = Maintenance.statsSnapshot(spark, reg,
      Seq("a", "b", "c", "d").map(Maintenance.Target(_)), seq = 1L)
    val top = Maintenance.statsTop(snap, k = 2)
      .select("category", "dataset", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(top == Set(("rows", "b", 1), ("rows", "c", 2)),
      s"top-2 by rows must be b, c (no bytes category for registry-only targets): $top")
  }
}
