package graft

import graft.jobs._
import org.apache.spark.sql.functions._

/** Jobs: transaction atomicity, lineage kinds, virtual datasets. */
class JobsSpec extends SparkSpec {

  test("transaction publishes all legs on success") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    val counts = Transaction(Seq(
      "t1" -> Seq(1, 2, 3).toDF("x"),
      "t2" -> Seq(4).toDF("y")
    )).commit(reg).toMap
    assert(counts == Map("t1" -> 3L, "t2" -> 1L))
    assert(reg.names == Seq("t1", "t2"))
  }

  test("a failing leg aborts the whole transaction (registry untouched)") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    reg.put("pre", Seq(0).toDF("z"))
    val bad = Seq(1).toDF("x").withColumn("boom", expr("assert_true(x > 100)"))
    intercept[Throwable] {
      Transaction(Seq("ok" -> Seq(1).toDF("x"), "bad" -> bad)).commit(reg)
    }
    assert(reg.names == Seq("pre"), "no transactional leg may be visible after abort")
  }

  test("lineage records copy vs transform vs transform-hop") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    val src = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    Job("j1", DatasetSource(src, "id", "id"),
      sink = DatasetSink(reg, "copy_out"), sourceName = "src", sinkName = "copy_out").run(s, Some(reg))
    Job("j2", DatasetSource(src, "id", "id"),
      Transforms.setProperty("v2", col("v") * 2),
      DatasetSink(reg, "xform_out"), sourceName = "src", sinkName = "xform_out",
      hops = Seq("dim")).run(s, Some(reg))
    assert(reg.lineage == Seq(
      ("dim", "xform_out", "transform-hop"),
      ("src", "copy_out", "copy"),
      ("src", "xform_out", "transform")))
  }

  test("virtual dataset composes with stored relations") {
    val vd = VirtualDataset("seq", sp => sp.range(0, 5).select(col("id").as("k")))
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val n = orders.join(vd.read(spark), pmod(col("o_orderkey"), lit(5)) === col("k")).count()
    assert(n == orders.count(), "every order lands in exactly one virtual bucket")
  }

  test("scheduler runs jobs in dependency order regardless of declaration order") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    val base = Seq((1L, 5.0), (2L, 50.0)).toDF("id", "v")
    reg.put("base", base)
    // declared INTENTIONALLY out of order: j_final reads j_mid's sink
    val jFinal = Job("j_final",
      RegistrySource(reg, "mid"),
      Transforms.setProperty("v3", col("v2") * 3),
      DatasetSink(reg, "final"), sourceName = "mid", sinkName = "final")
    val jMid = Job("j_mid",
      RegistrySource(reg, "base"),
      Transforms.setProperty("v2", col("v") * 2),
      DatasetSink(reg, "mid"), sourceName = "base", sinkName = "mid")
    val order = Scheduler.runAll(s, reg, Seq(jFinal, jMid))
    assert(order == Seq("j_mid", "j_final"))
    assert(reg.get("final").agg(org.apache.spark.sql.functions.sum("v3")).collect()(0).getDouble(0) == (5.0 + 50.0) * 6)
  }

  test("scheduler detects dependency cycles") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    val df = Seq(1).toDF("x")
    val a = Job("a", FunctionSource(_ => df),
      sink = DatasetSink(reg, "out_a"), sourceName = "out_b", sinkName = "out_a")
    val b = Job("b", FunctionSource(_ => df),
      sink = DatasetSink(reg, "out_b"), sourceName = "out_a", sinkName = "out_b")
    val e = intercept[RuntimeException](Scheduler.runAll(s, reg, Seq(a, b)))
    assert(e.getMessage.contains("cycle"))
  }

  test("paused jobs are skipped; dependents run against the existing sink state") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    reg.put("base", Seq((1L, 5.0)).toDF("id", "v"))
    reg.put("mid", Seq((1L, 5.0, 999.0)).toDF("id", "v", "v2")) // stale state from a prior run
    val jMid = Job("j_mid", RegistrySource(reg, "base"),
      Transforms.setProperty("v2", col("v") * 2),
      DatasetSink(reg, "mid"), sourceName = "base", sinkName = "mid")
    val jFinal = Job("j_final", RegistrySource(reg, "mid"),
      Transforms.setProperty("v3", col("v2") * 3),
      DatasetSink(reg, "final"), sourceName = "mid", sinkName = "final")
    val order = Scheduler.runAll(s, reg, Seq(jFinal, jMid), paused = Set("j_mid"))
    assert(order == Seq("j_final")) // paused job not run...
    assert(reg.get("final").collect()(0).getDouble(3) == 999.0 * 3) // ...stale mid consumed
  }

  test("single-flight: a concurrent run of the same job id loses the raffle") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    val gate = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.CountDownLatch(1)
    val slow = FunctionSource { _ => started.countDown(); gate.await(); Seq(1).toDF("x") }
    val job = Job("only_once", slow, sink = DatasetSink(reg, "out"), sourceName = "s", sinkName = "out")
    val first = new Thread(() => Scheduler.runSingleFlight(s, reg, job))
    first.start()
    started.await()
    assert(!Scheduler.runSingleFlight(s, reg, job)) // loses while first holds the slot
    // the GetRunningJobs view: the held ticket is visible while live
    assert(Scheduler.runningJobs.map(_._1) == Seq("only_once"))
    assert(Scheduler.runningJob("only_once").isDefined &&
      Scheduler.runningJob("absent").isEmpty)
    gate.countDown()
    first.join()
    assert(Scheduler.runningJobs.isEmpty && Scheduler.runningJob("only_once").isEmpty)
    assert(Scheduler.runSingleFlight(s, reg, job)) // free again after completion
  }

  test("kill stops a running job: active stages abort, the failure propagates un-retried, the raffle frees") {
    val s = spark
    val reg = new DatasetRegistry
    val out = java.nio.file.Files.createTempDirectory("graft_kill_out_").toString
    // SlowSource pays its sleep INSIDE the scan, so the write action has
    // a genuinely running Spark stage to cancel
    val job = Job("kill_me", SlowSource(4, 30000L), sink = ParquetSink(s"$out/p"),
      sourceName = "s", sinkName = "out")
    @volatile var outcome: Option[Throwable] = None
    val t = new Thread(() => {
      try { Scheduler.runSingleFlight(s, reg, job, maxRetries = 5); () }
      catch { case e: Throwable => outcome = Some(e) }
    })
    t.start()
    // wait for the job group's Spark job to actually be live
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (s.sparkContext.statusTracker.getJobIdsForGroup("graft-job-kill_me").isEmpty
           && System.nanoTime() < deadline) Thread.sleep(50)
    assert(s.sparkContext.statusTracker.getJobIdsForGroup("graft-job-kill_me").nonEmpty,
      "the slow job never started a Spark job")
    Scheduler.kill(s, "kill_me")
    t.join(60000)
    assert(!t.isAlive, "the killed job should unwind promptly, not retry for 5x30s")
    assert(outcome.isDefined, "the kill must surface as a failure, not silent success")
    assert(Scheduler.runningJob("kill_me").isEmpty, "the raffle ticket must release")
  }

  test("runWithRetry retries a transiently failing job") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    var attempts = 0
    val flaky = FunctionSource { _ =>
      attempts += 1
      if (attempts < 3) sys.error("transient")
      Seq(42).toDF("x")
    }
    Scheduler.runWithRetry(s, reg,
      Job("flaky", flaky, sink = DatasetSink(reg, "out"), sourceName = "src", sinkName = "out"),
      maxRetries = 5)
    assert(attempts == 3)
    assert(reg.get("out").count() == 1)
  }

  test("backup/restore round-trips the registry") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    reg.put("alpha", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    reg.put("beta", Seq(9).toDF("n"))
    val root = java.nio.file.Files.createTempDirectory("graft_backup_spec_").toString
    Backup.backup(reg, root)
    val restored = Backup.restore(s, root)
    assert(restored.names == Seq("alpha", "beta"))
    assert(restored.get("alpha").count() == 2 && restored.get("beta").count() == 1)
    assert(restored.get("alpha").orderBy("k").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("transaction with stagingDir stages legs as durable parquet before publish") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    val dir = java.nio.file.Files.createTempDirectory("graft_stage_").toString
    val counts = Transaction(Seq("a" -> s.range(5).toDF()), stagingDir = Some(dir)).commit(reg).toMap
    assert(counts == Map("a" -> 5L))
    assert(reg.get("a").count() == 5)
    assert(new java.io.File(s"$dir/a").exists()) // the durable staging artifact
  }

  test("wire source/sink round-trips entity JSON through a path") {
    val s = spark
    import s.implicits._
    val entities = Seq(("u/1", 0L, false, Map("p" -> "v1"), Map("r" -> Seq("u/2", "u/3"))))
      .toDF("id", "recorded", "deleted", "props", "refs")
    val dir = java.nio.file.Files.createTempDirectory("graft_wire_spec_").toString
    WireDatasetSink(dir).write(entities)
    val back = WireDatasetSource(dir).read(s)
    assert(back.count() == 1)
    val row = back.collect()(0)
    assert(row.getString(0) == "u/1")
    assert(row.getMap[String, String](3) == Map("p" -> "v1"))
    assert(row.getMap[String, scala.collection.Seq[String]](4)
      .map { case (k, v) => (k, v.toList) }.toMap ==
      Map("r" -> List("u/2", "u/3"))) // multi-valued refs round-trip
  }

  test("failing entities divert to the re-queue sink; a retry job drains it") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    val src = Seq((1, "ok"), (2, "bad"), (3, "ok")).toDF("k", "status")
    Job("clean", FunctionSource(_ => src),
      sink = DatasetSink(reg, "clean"),
      validate = col("status") === "ok",
      requeueTo = Some(DatasetSink(reg, "requeue"))).run(s, Some(reg))
    assert(reg.get("clean").select("k").collect().map(_.getInt(0)).toSet == Set(1, 3))
    assert(reg.get("requeue").select("k").collect().map(_.getInt(0)).toSet == Set(2))
    // retry run: the queue is just another source
    Job("retry", RegistrySource(reg, "requeue"),
      sink = DatasetSink(reg, "retried")).run(s, Some(reg))
    assert(reg.get("retried").count() == 1)
  }

  test("a NULL validation verdict re-queues the entity instead of dropping it") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    // props of row 2 is malformed JSON → the extract is NULL → the
    // predicate can't evaluate; such rows must land in the re-queue, not
    // vanish (sink ∪ requeue == transformed relation)
    val src = Seq((1, """{"q": 5}"""), (2, "not json"), (3, """{"q": 99}""")).toDF("k", "props")
    Job("clean", FunctionSource(_ => src),
      sink = DatasetSink(reg, "clean"),
      validate = from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("q INT")).getField("q") < 50,
      requeueTo = Some(DatasetSink(reg, "requeue"))).run(s, Some(reg))
    assert(reg.get("clean").select("k").collect().map(_.getInt(0)).toSet == Set(1))
    assert(reg.get("requeue").select("k").collect().map(_.getInt(0)).toSet == Set(2, 3))
  }

  test("transaction stages via parquet by default (cache path is opt-in)") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    Transaction(Seq("a" -> Seq(1, 2).toDF("x"))).commit(reg)
    // the published dataset is backed by staged files, not a live plan
    // pinned to the erratic CacheManager
    assert(planOf(reg.get("a")).contains("Scan parquet"), planOf(reg.get("a")))
  }

  test("context strip keys on the parsed id, not raw-line serialization details") {
    val s = spark
    import s.implicits._
    // key order differs and whitespace varies — the wire format forbids neither
    val payload = Seq(
      """{"namespaces": {"p": "http://x/"}, "id": "@context"}""",
      """{"id":"e/1","recorded":1,"deleted":false,"props":{"p/a":"v"},"refs":null}"""
    ).toDF("json")
    val back = graft.sources.EntityJson.fromJsonLines(s, payload)
    assert(back.count() == 1)
    assert(back.select("id").collect().map(_.getString(0)).toSeq == Seq("e/1"))
    val ctx = graft.sources.EntityJson.readContext(s, payload)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(ctx == Map("p" -> "http://x/"))
  }

  test("wire parse accepts the reference's scalar ref form; export drops null-FK edges") {
    val s = spark
    import s.implicits._
    // scalar refs ({URI: URI}) are legal reference wire format — the
    // line must parse, refs normalized to one-element arrays
    val payload = Seq(
      """{"id":"e/1","recorded":1,"deleted":false,"props":{"p/a":"v"},"refs":{"pred":"http://t/9"}}""",
      """{"id":"e/2","recorded":1,"deleted":false,"props":{"p/a":"w"},"refs":{"pred":["http://t/7"]}}"""
    ).toDF("json")
    val back = graft.sources.EntityJson.fromJsonLines(s, payload)
      .collect().map(r => r.getString(0) -> r.getMap[String, Seq[String]](4).toMap).toMap
    assert(back("e/1") == Map("pred" -> Seq("http://t/9")), back.toString)
    assert(back("e/2") == Map("pred" -> Seq("http://t/7")))
    // a quote in a namespace expansion must not produce invalid JSON
    val ns = graft.model.Namespaces(Map("q" -> """http://x/"quoted"/"""))
    val ctxLine = graft.sources.EntityJson.contextLine(s, ns)
    val ctx = graft.sources.EntityJson.readContext(s, ctxLine)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(ctx == Map("q" -> """http://x/"quoted"/"""))
    // export: a null FK exports NO edge, not "refs":{"p":[null]}
    val g = graft.core.Tpch.graph(s, sfDir)
    val nation = g("nation")
    val withNull = nation.df.withColumn("n_regionkey",
      when(col("n_nationkey") === 0, lit(null)).otherwise(col("n_regionkey")))
    val g2 = graft.core.EntityGraph(
      g.datasets + ("nation" -> nation.copy(df = withNull)), g.ns)
    val rows = graft.sources.EntityJson.toEntityRows(g2, "nation")
      .filter(col("id").endsWith("/0"))
      .select("refs").collect()
    assert(rows.length == 1 && rows(0).getMap[String, Seq[String]](0).isEmpty,
      rows.mkString(","))
  }

  test("multi-source dependency tracking follows array-valued refs in both directions") {
    val s = spark
    import s.implicits._
    import graft.core.EntityGraph
    import graft.model.{EntityDataset, Namespaces, Ref}
    // orders reference MULTIPLE parts (array ref); part 200 changes
    val orders = Seq((1L, Seq(100L, 200L)), (2L, Seq(100L)), (3L, Seq(200L, 300L)))
      .toDF("oid", "parts")
    val parts = Seq((100L, "a"), (200L, "b"), (300L, "c")).toDF("pid", "pname")
    val g = EntityGraph(Map(
      "orders" -> EntityDataset("orders", orders, "oid", "o/",
        refs = Seq(Ref("uses", "parts", "part", array = true))),
      "part" -> EntityDataset("part", parts, "pid", "p/", small = true)
    ), Namespaces(Map.empty))
    // inverse hop: changed part → orders referencing it (each order once,
    // even when several of its parts changed)
    val aff = MultiSource.affected(g, "part", col("pid").isin(200L, 300L),
        Seq(MultiSource.Hop("orders", "uses", inverse = true)))
      .select("oid").collect().map(_.getLong(0))
    assert(aff.sorted.toSeq == Seq(1L, 3L), aff.mkString(","))
    assert(aff.length == 2, "an order must not duplicate per matching array element")
    // forward hop: changed orders → the parts they use
    val fwd = MultiSource.affected(g, "orders", col("oid") === 1L,
        Seq(MultiSource.Hop("part", "uses", inverse = false)))
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(fwd == Set(100L, 200L))
  }

  test("content store: upsert/get/list/delete with history and as-of reads") {
    val s = spark
    val reg = new DatasetRegistry
    val cs = new ContentStore(s, reg)
    cs.upsert("mapping-a", """{"fields": 1}""", t = 1L)
    cs.upsert("mapping-b", """{"fields": 2}""", t = 2L)
    cs.upsert("mapping-a", """{"fields": 3}""", t = 3L) // update wins
    assert(cs.get("mapping-a").contains("""{"fields": 3}"""))
    assert(cs.list().collect().map(_.getString(0)).toSet == Set("mapping-a", "mapping-b"))
    cs.delete("mapping-b", t = 4L)
    assert(cs.get("mapping-b").isEmpty)
    assert(cs.list().collect().map(_.getString(0)).toSet == Set("mapping-a"))
    // config time travel: the state as of token 2
    val old = cs.asOf(2L).collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(old == Map("mapping-a" -> """{"fields": 1}""", "mapping-b" -> """{"fields": 2}"""))
    // content is an ordinary dataset: it rides backup like everything else
    assert(reg.names.contains("core.content"))
  }

  test("cron parse + match: steps, ranges, lists, day-OR rule, sunday aliases") {
    import java.time.LocalDateTime
    val every15 = Cron.parse("*/15 * * * *")
    assert(every15.matches(LocalDateTime.of(2026, 8, 12, 9, 30)))
    assert(!every15.matches(LocalDateTime.of(2026, 8, 12, 9, 31)))
    val nightly = Cron.parse("30 2 * * 1-5")
    assert(nightly.matches(LocalDateTime.of(2026, 8, 12, 2, 30))) // a Wednesday
    assert(!nightly.matches(LocalDateTime.of(2026, 8, 16, 2, 30))) // a Sunday
    // POSIX day-OR: both day fields restricted → either may match
    val dayOr = Cron.parse("0 0 13 * 0")
    assert(dayOr.matches(LocalDateTime.of(2026, 8, 13, 0, 0))) // dom=13 (a Thursday)
    assert(dayOr.matches(LocalDateTime.of(2026, 8, 16, 0, 0))) // dow=Sunday, dom=16
    assert(!dayOr.matches(LocalDateTime.of(2026, 8, 14, 0, 0)))
    // 7 = 0 = Sunday
    assert(Cron.parse("0 0 * * 7").matches(LocalDateTime.of(2026, 8, 16, 0, 0)))
    // nextAfter walks to the next firing minute
    assert(every15.nextAfter(LocalDateTime.of(2026, 8, 12, 9, 31)) ==
      LocalDateTime.of(2026, 8, 12, 9, 45))
    assert(Cron.parse("0 3 1 * *").nextAfter(LocalDateTime.of(2026, 8, 12, 9, 0)) ==
      LocalDateTime.of(2026, 9, 1, 3, 0))
  }

  test("cron scheduler: two ticks advance the since-token; incremental job resumes from it") {
    import java.time.LocalDateTime
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    reg.put("src", Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "recorded"))
    reg.put("out", Seq.empty[(Long, Long)].toDF("id", "recorded"))
    val cj = CronJob("sync_src", Cron.parse("*/5 * * * *"),
      makeJob = since => Job("sync_src",
        DatasetSource(reg.get("src"), "id", "recorded", since = since),
        // append-to-sink: the incremental runs accumulate
        transform = df => reg.get("out").unionByName(df),
        sink = DatasetSink(reg, "out")),
      nextToken = () => {
        val m = reg.get("src").agg(max("recorded")).head()
        if (m.isNullAt(0)) None else Some(m.getLong(0))
      })
    val sched = new CronScheduler(Seq(cj))

    // tick at a non-matching minute runs nothing
    assert(sched.tick(s, reg, LocalDateTime.of(2026, 8, 12, 9, 3)).isEmpty)
    assert(sched.token("sync_src").isEmpty)

    // first firing: no token → full read; token advances to max recorded
    assert(sched.tick(s, reg, LocalDateTime.of(2026, 8, 12, 9, 5)) == Seq("sync_src"))
    assert(sched.token("sync_src").contains(30L))
    assert(reg.get("out").count() == 3)

    // new changes land between ticks
    reg.put("src", reg.get("src").unionByName(Seq((4L, 40L), (2L, 45L)).toDF("id", "recorded")))

    // second firing: only recorded > 30 is processed (no re-emission)
    assert(sched.tick(s, reg, LocalDateTime.of(2026, 8, 12, 9, 10)) == Seq("sync_src"))
    assert(sched.token("sync_src").contains(45L))
    val out = reg.get("out").select("id", "recorded").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (2L, 45L)))

    // an empty tick (no new changes) keeps the token
    assert(sched.tick(s, reg, LocalDateTime.of(2026, 8, 12, 9, 15)) == Seq("sync_src"))
    assert(sched.token("sync_src").contains(45L))
    assert(reg.get("out").count() == 5)
  }

  test("wire payload with @context: entities parse with context stripped, context restricted to public namespaces") {
    val s = spark
    val g = graft.core.Tpch.graph(s, sfDir)
    val pub = Seq(graft.core.Tpch.base + "nation/", graft.core.Tpch.schemaNs)
    val g2 = graft.core.EntityGraph(
      g.datasets + ("nation" -> g("nation").copy(publicNamespaces = pub)), g.ns)
    val payload = graft.sources.EntityJson.toJsonLinesWithContext(g2, "nation")
    // context first line, restricted to the public namespaces
    val ctx = graft.sources.EntityJson.readContext(s, payload)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(ctx.values.toSet == pub.toSet)
    // entities parse with the context line stripped
    val back = graft.sources.EntityJson.fromJsonLines(s, payload)
    assert(back.count() == g("nation").df.count())
    assert(back.filter(col("id") === "@context").count() == 0)
    // no restriction -> the full registered map is advertised
    val full = graft.sources.EntityJson.readContext(s,
      graft.sources.EntityJson.toJsonLinesWithContext(g, "nation")).count()
    assert(full == g.ns.prefixes.size)
  }

  test("proxy dataset answers the dataset API from a wire location") {
    val s = spark
    import s.implicits._
    val entities = Seq(
      ("n/1", 5L, false, Map("p/name" -> "alpha"), null.asInstanceOf[Map[String, Seq[String]]]),
      ("n/2", 9L, false, Map("p/name" -> "beta"), null.asInstanceOf[Map[String, Seq[String]]])
    ).toDF("id", "recorded", "deleted", "props", "refs")
    val dir = java.nio.file.Files.createTempDirectory("graft_proxy_spec_").toString
    WireDatasetSink(dir).write(entities)
    val proxy = graft.sources.ProxyDataset("n", dir)
    assert(proxy.entities(s).count() == 2)
    assert(proxy.changesSince(s, 5L).select("id").collect().map(_.getString(0)).toSeq == Seq("n/2"))
    assert(proxy.lookup(s, "n/1").count() == 1)
    val flat = proxy.flattened(s, Seq(("p/name", "name")))
      .select("key", "name").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(flat == Set(("1", "alpha"), ("2", "beta")))
  }

  test("transaction staging policy: local temp only on local masters, shared or fail-fast on clusters") {
    // local master: a fresh writable temp dir
    val local = Transaction.resolveStaging("local[4]", None)
    assert(new java.io.File(local).isDirectory)
    // non-local master + graft.checkpointDir: derive a shared path under it
    val derived = Transaction.resolveStaging("spark://host:7077", Some("/shared/ckpt"))
    assert(derived.startsWith("/shared/ckpt/graft_txn_"), derived)
    // non-local master, no shared location: fail fast, never driver-local
    val e = intercept[IllegalArgumentException] {
      Transaction.resolveStaging("spark://host:7077", None)
    }
    assert(e.getMessage.contains("stagingDir"), e.getMessage)
  }

  test("cron tick isolates a failing job: the other due job runs, the failed token stays") {
    import java.time.LocalDateTime
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    reg.put("src", Seq((1L, 10L)).toDF("id", "recorded"))
    val boom = CronJob("a_broken", Cron.parse("* * * * *"),
      makeJob = _ => Job("a_broken",
        FunctionSource(_ => sys.error("permanently failing source")),
        sink = DatasetSink(reg, "never")),
      nextToken = () => Some(99L))
    val ok = CronJob("b_ok", Cron.parse("* * * * *"),
      makeJob = _ => Job("b_ok",
        DatasetSource(reg.get("src"), "id", "recorded"),
        sink = DatasetSink(reg, "out")),
      nextToken = () => Some(10L))
    val sched = new CronScheduler(Seq(boom, ok))
    val outcomes = sched.tickOutcomes(s, reg, LocalDateTime.of(2026, 8, 12, 9, 0))
    // the broken job (sorted first) did not starve the healthy one
    assert(outcomes.map(_._1) == Seq("a_broken", "b_ok"))
    assert(outcomes(0)._2.isDefined && outcomes(1)._2.isEmpty, outcomes.toString)
    assert(reg.get("out").count() == 1)
    // the failed job's token did NOT advance; the healthy one's did
    assert(sched.token("a_broken").isEmpty)
    assert(sched.token("b_ok").contains(10L))
    // tick() reports only the successful ids
    assert(sched.tick(s, reg, LocalDateTime.of(2026, 8, 12, 9, 1)) == Seq("b_ok"))
  }

  test("parquetDataBytes recurses into a partitioned layout") {
    val s = spark
    import s.implicits._
    val log = (1L to 100L).map(i => (i, i)).toDF("id", "recorded")
    val dir = java.nio.file.Files.createTempDirectory("graft_statpart_").toString
    graft.ops.ChangeLog.writePartitionedLog(log, "recorded", dir, bucketSize = 25L)
    // partitioned layout: part files live under __rbucket=N subdirs
    assert(new java.io.File(dir).listFiles().exists(f =>
      f.isDirectory && f.getName.startsWith("__rbucket=")))
    val partitioned = Statistics.parquetDataBytes(s, dir)
    // same rows written flat: the recursive sum must match the flat sum
    // to within encoding noise — and must not be the empty-listing 0
    val flat = java.nio.file.Files.createTempDirectory("graft_statflat_").toString + "/f"
    log.write.parquet(flat)
    val flatBytes = Statistics.parquetDataBytes(s, flat)
    assert(partitioned > 0, "partitioned layout must not report 0 bytes")
    assert(flatBytes > 0)
  }

  test("sample source generates the namespaced entity range and resumes from the since token") {
    val full = SampleSource(5L).read(spark)
    assert(full.count() == 5)
    assert(full.select("id").orderBy("recorded").collect().map(_.getString(0)).head ==
      "http://data.samplesource.org/e-0")
    // incremental resume: the continuation token is the end index
    val resumed = SampleSource(5L, since = Some(3L)).read(spark)
    assert(resumed.select("id").collect().map(_.getString(0)).toSet ==
      Set("http://data.samplesource.org/e-3", "http://data.samplesource.org/e-4"))
    // past-the-end token = empty tick
    assert(SampleSource(5L, since = Some(5L)).read(spark).isEmpty)
    assert(SampleSource(5L).nextToken == 5L)
  }

  test("slow source paces the batch: rows arrive only after the sleep elapses") {
    val src = SlowSource(batchSize = 4, sleepMs = 300L)
    val df = src.read(spark)
    // the pace is paid at SCAN time, not plan time: building the frame
    // is instant, collecting it is not
    val t0 = System.nanoTime()
    val rows = df.collect()
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(elapsedMs >= 300L, s"scan returned in ${elapsedMs}ms, before the pace elapsed")
    assert(rows.length == 4)
    assert(rows.map(_.getString(0)).toSet ==
      Set("test:e-0", "test:e-1", "test:e-2", "test:e-3"))
    // reference contract: the continuation never advances (every sync
    // restarts from scratch)
    assert(src.nextToken == "")
  }

  test("Timing/Log hooks: explicit start/send pairs record; every job run is timed") {
    val s = spark
    import s.implicits._
    Metrics.clear()
    // the reference's transform-authoring pattern: hooks called inside
    // the transform closure
    val reg = new DatasetRegistry
    Job("timed_job", FunctionSource(_ => Seq(1).toDF("x")),
      transform = df => {
        Metrics.timing("xform.section")
        val out = df.withColumn("y", col("x") * 2)
        Metrics.timing("xform.section", send = true)
        Metrics.log("built plan for timed_job") // dev-loop Log hook
        out
      },
      sink = DatasetSink(reg, "out")).run(s, Some(reg))
    assert(Metrics.timings("xform.section").size == 1)
    assert(Metrics.timings("job.timed_job").size == 1)
    assert(Metrics.timings("job.timed_job").head > 0)
    // send without a pending start is a tolerated no-op
    Metrics.timing("never.started", send = true)
    assert(Metrics.timings("never.started").isEmpty)
  }

  test("incremental DatasetSource honors the since token with latestOnly") {
    val s = spark
    import s.implicits._
    val log = Seq(("a", 1L, "x"), ("a", 5L, "y"), ("b", 2L, "z")).toDF("id", "rec", "p")
    val got = DatasetSource(log, "id", "rec", latestOnly = true, since = Some(2L))
      .read(s).select("id", "p").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "y"))) // b's only version is at/before the token
  }

  test("sharded export: deterministic, complete, manifest-consistent, coalescible") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()
    def tmp() = java.nio.file.Files.createTempDirectory("graft_export_spec_").toString
    val dir1 = tmp()
    val m1 = Export.shardedExport(docs, "doc_id", dir1, 8).collect()
    // manifest: 8 shards, rows sum to the corpus, bytes from footers
    assert(m1.length == 8 && m1.map(_.getLong(1)).sum == total)
    assert(m1.forall(_.getLong(2) > 0))
    // completeness: every doc id exactly once across the shard dirs
    val back = spark.read.parquet(dir1)
    assert(back.count() == total && back.select("doc_id").distinct().count() == total)
    // determinism: a second export assigns every id to the same shard
    val dir2 = tmp()
    Export.shardedExport(docs, "doc_id", dir2, 8)
    val asg = (d: String) => spark.read.parquet(d).select("doc_id", "__shard")
      .collect().map(r => r.getLong(0) -> r.get(1).toString).toMap
    assert(asg(dir1) == asg(dir2))
    // coalesced: hash partitioning BY the shard value → 1 file per shard dir
    val dir3 = tmp()
    Export.shardedExport(docs, "doc_id", dir3, 8, coalesceFiles = true)
    val fs = new org.apache.hadoop.fs.Path(dir3)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir3))
      .filter(_.getPath.getName.startsWith("__shard=")).foreach { d =>
        val files = fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet"))
        assert(files == 1, s"${d.getPath.getName} has $files files")
      }
    assert(spark.read.parquet(dir3).count() == total)
    // full roster: hash buckets that received zero rows still get a
    // (0, 0) manifest row — loaders map workers onto the advertised
    // shard count
    val dir4 = tmp()
    val m4 = Export.shardedExport(docs.limit(10), "doc_id", dir4, 64).collect()
    assert(m4.length == 64 && m4.map(_.getLong(1)).sum == 10)
    assert(m4.count(_.getLong(1) == 0) > 0, "tiny corpus must leave empty shards")
  }

  test("tombstone upsert sink: retracts, ignores absent-key tombstones, idempotent, re-live works") {
    val s = spark
    import s.implicits._
    val reg = new DatasetRegistry
    val sink = TombstoneUpsertSink(reg, "t", "id", "gone")
    def state(): Seq[(Long, String)] = reg.get("t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // first write creates the dataset from live rows only — a
    // tombstone for a key that never existed is a no-op, not a row
    sink.write(Seq((1L, "a", false), (2L, "b", false), (9L, "x", true))
      .toDF("id", "v", "gone"))
    assert(state() == Seq((1L, "a"), (2L, "b")))
    assert(!reg.get("t").columns.contains("gone"), "marker column must not be persisted")
    // supersede one key, retract another
    val batch2 = Seq((2L, "b2", false), (1L, "dead", true)).toDF("id", "v", "gone")
    sink.write(batch2)
    assert(state() == Seq((2L, "b2")), "a tombstoned key must be deleted, not kept stale")
    // at-least-once redelivery of the same batch is a fixed point
    sink.write(batch2)
    assert(state() == Seq((2L, "b2")))
    // a retracted key can re-enter on a later batch
    sink.write(Seq((1L, "alive", false)).toDF("id", "v", "gone"))
    assert(state() == Seq((1L, "alive"), (2L, "b2")))
  }

  test("sharded export: many-shard manifest byte sums equal the driver-side footer walk") {
    // the distributed footer pass (mapPartitions over the file list)
    // must agree byte-for-byte with Statistics.parquetDataBytes run
    // per shard directory on the driver
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_export_many_").toString
    val m = Export.shardedExport(docs, "doc_id", dir, 96).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m.size == 96)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.startsWith("__shard=")).foreach { d =>
        val shard = d.getPath.getName.stripPrefix("__shard=").toLong
        val expect = Statistics.parquetDataBytes(spark, d.getPath.toString)
        assert(m(shard)._2 == expect, s"shard $shard: ${m(shard)._2} != $expect")
      }
    // absent dirs (zero-row buckets) report (0, 0)
    val present = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.startsWith("__shard=")).map(
        _.getPath.getName.stripPrefix("__shard=").toLong).toSet
    (0L until 96L).filterNot(present).foreach(sh => assert(m(sh) == ((0L, 0L))))
  }

  test("job history: every firing appends (failure recorded, success overwrites nothing), ordered, latest view per job") {
    val s = spark
    import s.implicits._
    import java.time.LocalDateTime
    val reg = new DatasetRegistry
    reg.put("src", Seq(1, 2, 3).toDF("x"))
    val sched = new CronScheduler(Seq(
      CronJob("good", Cron.parse("0 3 * * *"),
        _ => Job(id = "good", source = RegistrySource(reg, "src"),
          sink = DatasetSink(reg, "out")), () => None),
      CronJob("flaky", Cron.parse("0 3 * * *"),
        _ => Job(id = "flaky",
          source = FunctionSource { _ =>
            if (!reg.names.contains("late")) sys.error("dataset does not exist: late")
            reg.get("late")
          },
          sink = DatasetSink(reg, "out2")), () => None)),
      historyTo = Some(JobHistory.DefaultDataset))
    sched.tick(s, reg, LocalDateTime.of(2026, 8, 14, 3, 0))
    // day-14 failure is already on record BEFORE the fix lands
    val afterDay1 = JobHistory.history(reg).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getString(5)))
    assert(afterDay1.toSeq == Seq(
      ("flaky", 1L, 0L, "dataset does not exist: late"),
      ("good", 2L, 3L, "")), afterDay1.mkString(", "))
    reg.put("late", Seq(7, 8).toDF("y"))
    sched.tick(s, reg, LocalDateTime.of(2026, 8, 15, 3, 0))
    // append-only: the day-15 success did NOT overwrite the day-14
    // failure row; seq gives the firing total order
    val hist = JobHistory.history(reg).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getString(5)))
    def us(d: Int) = LocalDateTime.of(2026, 8, d, 3, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(hist.toSeq == Seq(
      ("flaky", 1L, us(14), 0L, "dataset does not exist: late"),
      ("good", 2L, us(14), 3L, ""),
      ("flaky", 3L, us(15), 2L, ""),
      ("good", 4L, us(15), 3L, "")), hist.mkString(", "))
    assert(hist.map(_._2).toSeq == hist.map(_._2).sorted.toSeq) // ordered
    // the reference GetJobHistory view: latest run per job + counters
    val latest = JobHistory.latest(reg).orderBy("job_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getString(5),
        r.getLong(6), r.getLong(7)))
    assert(latest.toSeq == Seq(
      ("flaky", 3L, 2L, "", 2L, 1L),
      ("good", 4L, 3L, "", 2L, 0L)), latest.mkString(", "))
    // the history is an ORDINARY dataset: `seq` is its monotone change
    // token, so incremental consumers ride changesSince unchanged
    val incr = graft.ops.ChangeLog.changesSince(reg.get(JobHistory.DefaultDataset),
        "seq", since = 2L).collect().map(_.getLong(1)).toSeq
    assert(incr == Seq(3L, 4L), incr.toString)
  }
  test("a RECREATED scheduler over the same history dataset continues the monotone seq") {
    // seq is the history dataset's change token (changesSince pages on
    // it; latest takes max-seq per job): a fresh scheduler restarting
    // at 0 would duplicate earlier tokens (r17 ADVICE) — the counter
    // seeds from max(seq) already in the shared dataset
    val s = spark
    import s.implicits._
    import java.time.LocalDateTime
    val reg = new DatasetRegistry
    reg.put("src", Seq(1, 2).toDF("x"))
    def mkSched() = new CronScheduler(Seq(
      CronJob("j", Cron.parse("0 3 * * *"),
        _ => Job(id = "j", source = RegistrySource(reg, "src"),
          sink = DatasetSink(reg, "out")), () => None)),
      historyTo = Some(JobHistory.DefaultDataset))
    mkSched().tick(s, reg, LocalDateTime.of(2026, 8, 14, 3, 0))
    mkSched().tick(s, reg, LocalDateTime.of(2026, 8, 15, 3, 0)) // RESTART
    val seqs = JobHistory.history(reg).collect().map(_.getLong(1)).toSeq
    assert(seqs == Seq(1L, 2L), s"duplicate/non-monotone seq after restart: $seqs")
  }

  test("a failure whose message merely CONTAINS 'cancelled' still burns retries (not a kill)") {
    // kill detection is a typed per-job flag set by Scheduler.kill, not
    // message text: an HTTP-client error saying "request cancelled"
    // must retry like any NonFatal failure (r17 ADVICE)
    val s = spark
    val reg = new DatasetRegistry
    var attempts = 0
    val job = Job(id = "textual", source = FunctionSource { sp =>
      attempts += 1
      if (attempts < 3) sys.error("upstream request cancelled by peer")
      import sp.implicits._
      Seq(1).toDF("x")
    }, sink = DatasetSink(reg, "out_txt"))
    Scheduler.runWithRetry(s, reg, job, maxRetries = 5)
    assert(attempts == 3, s"expected 3 attempts (2 retries), got $attempts")
  }
}
