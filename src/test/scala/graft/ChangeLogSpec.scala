package graft

import graft.ops.ChangeLog
import org.apache.spark.sql.functions._

/** Change-log semantics on a hand-built version log (reference:
  * /changes, latestOnly, time-travel, tombstones, compaction). */
class ChangeLogSpec extends SparkSpec {

  private lazy val log = {
    val s = spark
    import s.implicits._
    // (id, recorded, payload, deleted)
    Seq(
      ("a", 1L, "v1", false),
      ("a", 3L, "v2", false),
      ("a", 5L, "v2", false), // successive duplicate -> compacted away
      ("b", 2L, "w1", false),
      ("b", 4L, "w1", false), // duplicate
      ("b", 6L, "w2", false),
      ("c", 2L, "x1", false),
      ("c", 7L, "x1", true) // tombstone is the latest version
    ).toDF("id", "recorded", "payload", "deleted")
  }

  test("changesSince returns only versions after the token") {
    val got = ChangeLog.changesSince(log, "recorded", 4L).select("id", "recorded")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 5L), ("b", 6L), ("c", 7L)))
  }

  test("latestOnly keeps exactly the newest version per entity") {
    val got = ChangeLog.latestOnly(log, "id", "recorded")
      .select("id", "recorded", "payload")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(("a", 5L, "v2"), ("b", 6L, "w2"), ("c", 7L, "x1")))
  }

  test("asOf reconstructs the state at an earlier token") {
    val got = ChangeLog.asOf(log, "id", "recorded", 3L)
      .select("id", "payload").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "v2"), ("b", "w1"), ("c", "x1")))
  }

  test("snapshot hides entities whose latest version is a tombstone, changes keeps them") {
    val snap = ChangeLog.snapshot(log, "id", "recorded", col("deleted"))
      .select("id").collect().map(_.getString(0)).toSet
    assert(snap == Set("a", "b"))
    val changes = ChangeLog.changesSince(log, "recorded", 0L)
      .filter(col("deleted")).count()
    assert(changes == 1L) // the delete still flows to syncs
  }

  test("compactDedup drops successive identical versions only") {
    val kept = ChangeLog.compactDedup(log, "id", "recorded", Seq("payload", "deleted"))
      .select("id", "recorded").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept == Set(("a", 1L), ("a", 3L), ("b", 2L), ("b", 6L), ("c", 2L), ("c", 7L)))
  }

  test("asOfJoin picks the latest version at-or-before each probe, inclusive") {
    val s = spark
    import s.implicits._
    val probes = Seq(("a", 3L), ("a", 4L), ("b", 1L), ("c", 9L), ("zz", 5L)).toDF("id", "t")
    val got = ChangeLog.asOfJoin(log, "id", "recorded", Seq("payload"), probes, "id", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      ("a", 3L, "v2"), // version recorded exactly at t included
      ("a", 4L, "v2"),
      ("c", 9L, "x1")
      // ("b", 1L): no version <= 1 -> dropped; "zz": unknown entity -> dropped
    ))
  }

  test("latestOnly is one shuffle with map-side partial aggregation — no window sort") {
    val plan = planOf(ChangeLog.latestOnly(log, "id", "recorded"))
    // struct-valued max_by plans as SortAggregate; what matters at scale:
    // exactly ONE exchange, a partial agg before it, and no Window
    // formatted explain names each node twice (tree + detail): count the
    // numbered detail entries
    assert("""\(\d+\) Exchange""".r.findAllIn(plan).size == 1, "expected exactly one shuffle:\n" + plan)
    assert(plan.contains("partial_max_by"), plan)
    assert(!plan.contains("Window"), "latestOnly must not use a window sort:\n" + plan)
  }

  test("partitioned log: incremental read prunes whole token buckets at planning time") {
    val s = spark
    import s.implicits._
    val big = (1L to 1000L).map(t => (s"e${t % 50}", t, s"v$t")).toDF("id", "recorded", "payload")
    val dir = java.nio.file.Files.createTempDirectory("graft_partlog_").toString
    ChangeLog.writePartitionedLog(big, "recorded", dir, bucketSize = 100L)
    val inc = ChangeLog.readChangesSince(spark, dir, "recorded", since = 850L, bucketSize = 100L)
    // row parity with the unpartitioned path
    val expected = ChangeLog.changesSince(big, "recorded", 850L)
      .select("id", "recorded", "payload").collect().map(_.toSeq).toSet
    assert(inc.select("id", "recorded", "payload").collect().map(_.toSeq).toSet == expected)
    assert(inc.count() == 150)
    // the scan must prune partitions: PartitionFilters carries the bucket
    // predicate, and only buckets 8 and 9 of the 11 survive the listing
    val plan = planOf(inc)
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("__rbucket"), plan)
    val pruned = inc.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.selectedPartitions.partitionCount
    }
    if (pruned.nonEmpty) assert(pruned.head == 2, s"expected 2 surviving buckets, got $pruned")
  }
}
