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

    // 02:00 → stats land with refresh_seq 1
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 13, 2, 0))
      == Seq("scheduled_stats_update"))
    val s1 = reg.get("stats").collect()
    assert(s1.length == 1 && s1(0).getAs[String]("dataset") == "log")
    assert(s1(0).getAs[Long]("rows") == 100L)
    assert(s1(0).getAs[Long]("refresh_seq") == 1L)

    // next day 02:00 → the refresh provably advanced (seq 2), fresh count
    reg.put("log", mkLog().limit(80))
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 14, 2, 0))
      == Seq("scheduled_stats_update"))
    val s2 = reg.get("stats").collect()
    assert(s2(0).getAs[Long]("refresh_seq") == 2L)
    assert(s2(0).getAs[Long]("rows") == 80L)
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

  test("stats job reports footer-level bytes for path-backed targets") {
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
  }
}
