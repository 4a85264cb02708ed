package graft

import graft.core.EntityGraph
import graft.jobs.FullSync
import graft.model.{EntityDataset, Namespaces, Ref}
import graft.ops.{ChangeLog, TimeTravel}
import org.apache.spark.sql.functions._

/** Versioned-log semantics: time-aware traversal (ref history +
  * tombstone suppression), fullsync deletion detection, retention GC,
  * and multi-valued refs. */
class TemporalSpec extends SparkSpec {

  import TimeTravel.{outAtTime, stateAt}

  // entity 1: ref A @1, ref B @3 (history), tombstone @5, re-assert C @7
  // entity 2: ref A @2, never deleted
  private lazy val log = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 1L, "A", false), (1L, 3L, "B", false),
      (1L, 5L, null.asInstanceOf[String], true), (1L, 7L, "C", false),
      (2L, 2L, "A", false)
    ).toDF("id", "recorded", "ref", "deleted")
  }

  private def edgesAt(t: Long): Set[(String, String)] =
    outAtTime(log, "id", "recorded", col("deleted"), "ref", t, "u/", "p", "n/")
      .select("start", "related").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  test("time-aware traversal: ref history resolves per token") {
    assert(edgesAt(1) == Set(("u/1", "n/A")))
    assert(edgesAt(2) == Set(("u/1", "n/A"), ("u/2", "n/A")))
    assert(edgesAt(3) == Set(("u/1", "n/B"), ("u/2", "n/A")))
    assert(edgesAt(4) == Set(("u/1", "n/B"), ("u/2", "n/A")))
  }

  test("time-aware traversal: tombstone suppresses the relation until re-asserted") {
    assert(edgesAt(5) == Set(("u/2", "n/A")))
    assert(edgesAt(6) == Set(("u/2", "n/A")))
    assert(edgesAt(7) == Set(("u/1", "n/C"), ("u/2", "n/A")))
  }

  test("stateAt at the max token equals the tombstone-filtered latestOnly") {
    val viaLatest = ChangeLog.snapshot(log, "id", "recorded", col("deleted"))
      .select("id", "ref").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaAsOf = stateAt(log, "id", "recorded", col("deleted"), Long.MaxValue)
      .select("id", "ref").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaAsOf == viaLatest)
  }

  test("fullsync: absent live entities get tombstoned; snapshot hides them, changes carries them") {
    val s = spark
    import s.implicits._
    // A,B live; C already tombstoned before the sync
    val lg = Seq(
      (10L, 1L, false, "pa"), (20L, 2L, false, "pb"),
      (30L, 3L, false, "pc"), (30L, 4L, true, null.asInstanceOf[String])
    ).toDF("id", "recorded", "deleted", "payload")
    val batch = Seq(10L).toDF("sid")
    val stones = FullSync.deletionTombstones(lg, "id", "recorded", col("deleted"), batch, "sid", 9L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(stones == Set((20L, 9L, true))) // only B: A is in the batch, C was already dead
    val post = FullSync.completeFullSync(lg, "id", "recorded", "deleted", batch, "sid", 9L)
    val snap = ChangeLog.snapshot(post, "id", "recorded", col("deleted"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(snap == Set(10L))
    val changes = ChangeLog.changesSince(post, "recorded", 8L)
      .select("id", "deleted").collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(changes == Set((20L, true))) // downstream syncs see the delete
  }

  test("retention GC preserves every as-of query at tokens >= T") {
    val retained = ChangeLog.retain(log, "id", "recorded", 4)
    assert(retained.count() < log.count()) // history before T compacted
    for (t <- Seq(4L, 5L, 6L, 7L)) {
      val full = ChangeLog.asOf(log, "id", "recorded", t)
        .select("id", "recorded", "ref", "deleted").collect().map(_.toSeq).toSet
      val gc = ChangeLog.asOf(retained, "id", "recorded", t)
        .select("id", "recorded", "ref", "deleted").collect().map(_.toSeq).toSet
      assert(gc == full, s"as-of $t changed after GC")
    }
    // changes after T unchanged
    assert(ChangeLog.changesSince(retained, "recorded", 4).count() ==
      ChangeLog.changesSince(log, "recorded", 4).count())
  }

  test("plan shapes: stateAt is one aggregate exchange, no Window; tombstones broadcast the batch") {
    // stateAt (and with it g12's traversal) must ride ChangeLog.asOf's
    // single max_by hash-aggregate — a Window over the log would
    // shuffle-sort the entire 100 TB history instead
    val statePlan = planOf(stateAt(log, "id", "recorded", col("deleted"), 5))
    assert(!statePlan.contains("Window"), statePlan)
    assert(statePlan.split("\\(\\d+\\) Exchange").length == 2, statePlan) // exactly one Exchange
    // fullsync deletion detection: the log-side snapshot anti-joins a
    // BROADCAST of the (bounded) batch id set — the log never reshuffles
    val s = spark
    import s.implicits._
    val batch = Seq(1L).toDF("sid")
    val stonePlan = planOf(graft.jobs.FullSync.deletionTombstones(
      log, "id", "recorded", col("deleted"), batch, "sid", 9L))
    assert(stonePlan.contains("BroadcastHashJoin") && stonePlan.contains("LeftAnti"), stonePlan)
  }

  test("plan shape: retention GC windows only the pre-T slice, pass-through for the rest") {
    val plan = planOf(ChangeLog.retain(log, "id", "recorded", 4))
    // exactly one Window pass over the <= T slice — and Spark further
    // rewrites the rn=1 filter into a WindowGroupLimit (per-group top-1
    // before the full sort), which is exactly the plan we want
    assert("\\(\\d+\\) Window\\b".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("WindowGroupLimit"), plan)
    // the > T slice passes through as a plain filtered scan under the Union
    assert(plan.contains("Union"), plan)
  }

  test("array-valued refs explode to one edge per element, in both directions") {
    val s = spark
    import s.implicits._
    val src = Seq(
      (1L, Seq(100L, 200L)), (2L, Seq(200L)), (3L, Seq.empty[Long])
    ).toDF("sid", "targets")
    val tgtDf = Seq((100L, "x"), (200L, "y")).toDF("tid", "name")
    val g = EntityGraph(Map(
      "src" -> EntityDataset("src", src, "sid", "s/",
        refs = Seq(Ref("p", "targets", "tgt", array = true))),
      "tgt" -> EntityDataset("tgt", tgtDf, "tid", "t/", small = true)
    ), Namespaces(Map.empty))
    val out = g.out("src", "p").select("start", "related").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("s/1", "t/100"), ("s/1", "t/200"), ("s/2", "t/200")))
    val in = g.in("tgt", "p", col("tid") === 200L)
      .select("related").collect().map(_.getString(0)).toSet
    assert(in == Set("s/1", "s/2"))
    val edges = g.allEdges.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges.size == 3)
  }
}
