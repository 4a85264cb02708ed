package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{PackIndex, TextAnalysis}

/** The incremental packer's operational contract (p15): after every
  * absorb the standing placement table equals the one-shot packer over
  * the effective corpus; untouched shards are BYTE-identical on disk;
  * the delta emission restricted to batch docs is the one-shot
  * restriction (the d8/d18/p12 delta identity); supersede, straddle at
  * the tail, empty-shard creation, absorb chaining, and the read-only
  * process/absorb split all behave. */
class PackIndexSpec extends SparkSpec {

  private val Cap = 50L
  private val ShardSize = 64L

  private def df(rows: Seq[(Long, String, Long)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("id", "src", "tok")
  }

  /** One-shot reference placements over `rows`. */
  private def oneShot(rows: Seq[(Long, String, Long)]): Map[Long, (Long, Long, Long, Long)] =
    TextAnalysis.packSequences(df(rows), "id", "src", "tok", Cap, ShardSize)
      .select("id", "shard", "bin_first", "bin_last", "offset_in_bin")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  private def state(table: String): Map[Long, (Long, Long, Long, Long)] =
    spark.table(table).select("id", "shard", "bin_first", "bin_last", "offset_in_bin")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  /** (path, length, mtime) of every data file under a shard partition. */
  private def files(table: String, shard: Long): Seq[(String, Long, Long)] = {
    val root = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      s"${table.toLowerCase}/shard=$shard")
    if (!root.exists()) Seq.empty
    else root.listFiles().filter(f => f.isFile && !f.getName.startsWith("."))
      .map(f => (f.getName, f.length(), f.lastModified())).toSeq.sorted
  }

  private def cycle(table: String, batch: Seq[(Long, String, Long)]): DataFrame = {
    val d = PackIndex.packDelta(spark, df(batch), "id", "src", "tok",
      Cap, ShardSize, table)
    PackIndex.absorbPackDelta(spark, table, d)
    d
  }

  test("append-at-tail: state equals one-shot, standing tail rows untouched, straddle lands") {
    val standing = (0L until 100L).map(i => (i, s"s${i % 2}", 7L))
    PackIndex.buildPackState(df(standing), "id", "src", "tok", Cap, ShardSize, "pk_tail")
    val before = state("pk_tail")
    // 47 tokens onto a partly-filled tail: the first batch doc must
    // STRADDLE the tail bin boundary of its (src, shard) cell
    val batch = Seq((100L, "s0", 47L), (101L, "s1", 47L), (102L, "s0", 5L))
    val delta = cycle("pk_tail", batch)
    assert(state("pk_tail") == oneShot(standing ++ batch),
      "after absorb the state must equal the one-shot packer")
    // standing docs of the touched shard kept their exact placements
    standing.filter(_._1 / ShardSize == 100L / ShardSize).foreach { case (i, _, _) =>
      assert(state("pk_tail")(i) == before(i), s"standing doc $i moved on append")
    }
    val d100 = delta.filter(col("id") === 100L)
      .select("bin_first", "bin_last").collect()(0)
    assert(d100.getLong(1) > d100.getLong(0), "47 tokens at the tail must straddle")
    // delta restricted to batch docs == one-shot restricted (the d8 identity)
    val emitted = delta.filter(col("from_batch"))
      .select("id", "shard", "bin_first", "bin_last", "offset_in_bin")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val os = oneShot(standing ++ batch)
    assert(emitted == batch.map(_._1).map(i => i -> os(i)).toMap,
      "batch emission must equal the one-shot restriction")
  }

  test("untouched shards are byte-identical across absorbs; empty shards appear") {
    val standing = (0L until 100L).map(i => (i, "s", 7L)) // shard 0 full, shard 1 partial
    PackIndex.buildPackState(df(standing), "id", "src", "tok", Cap, ShardSize, "pk_byte")
    val f0 = files("pk_byte", 0L)
    val f1 = files("pk_byte", 1L)
    assert(f0.nonEmpty && f1.nonEmpty)
    // the batch lands in a FAR shard (empty-shard creation) and at
    // shard 1's tail (id 100: 100 div 64 = 1)
    val batch = Seq((640L, "s", 11L), (100L, "s", 11L))
    cycle("pk_byte", batch)
    assert(files("pk_byte", 0L) == f0,
      "shard 0 was not touched — its files must be byte-identical")
    assert(files("pk_byte", 1L) != f1, "shard 1 was touched")
    assert(files("pk_byte", 10L).nonEmpty, "shard 10 must be created")
    assert(state("pk_byte") == oneShot(standing ++ batch))
    assert(state("pk_byte")(640L) == (10L, 0L, 0L, 0L),
      "a far doc opens its empty shard at coordinate zero")
  }

  test("absorb chaining: batch b+1 packs against batch b through the standing state alone") {
    val standing = (0L until 50L).map(i => (i, "s", 7L))
    PackIndex.buildPackState(df(standing), "id", "src", "tok", Cap, ShardSize, "pk_chain")
    val b1 = (50L until 60L).map(i => (i, "s", 9L))
    val b2 = (60L until 70L).map(i => (i, "s", 13L))
    // absorb runs on a write-scoped session CLONE (the dynamic
    // overwrite mode must not touch the shared conf) — clones must
    // not accumulate bus listeners across a long-running loop
    val listeners =
      org.apache.spark.graft.ListenerBridge.listenerCount(spark.sparkContext)
    cycle("pk_chain", b1)
    cycle("pk_chain", b2)
    assert(state("pk_chain") == oneShot(standing ++ b1 ++ b2),
      "chained absorbs must accumulate to the one-shot packing")
    assert(org.apache.spark.graft.ListenerBridge.listenerCount(spark.sparkContext)
      == listeners, "absorb's session clone must not leak bus listeners")
  }

  test("supersede: a re-ingested id replaces its placement and displaces only its shard") {
    val standing = (0L until 100L).map(i => (i, "s", 7L))
    PackIndex.buildPackState(df(standing), "id", "src", "tok", Cap, ShardSize, "pk_sup")
    // doc 10 grows 7 → 40 tokens; everything after it in shard 0 shifts,
    // shard 1 (ids 64+) must not move
    val batch = Seq((10L, "s", 40L))
    val effective = standing.map { case t @ (i, s, _) => if (i == 10L) (i, s, 40L) else t }
    val f1 = files("pk_sup", 1L)
    cycle("pk_sup", batch)
    assert(state("pk_sup") == oneShot(effective),
      "supersede must equal the one-shot over the EFFECTIVE corpus")
    assert(files("pk_sup", 1L) == f1, "shard 1 was not touched by a shard-0 supersede")
  }

  test("out-of-order insert repacks its shard to the one-shot placement") {
    val standing = Seq((0L, "s", 7L), (2L, "s", 7L), (4L, "s", 7L))
    PackIndex.buildPackState(df(standing), "id", "src", "tok", Cap, ShardSize, "pk_ooo")
    val batch = Seq((1L, "s", 30L)) // lands BETWEEN standing ids
    cycle("pk_ooo", batch)
    assert(state("pk_ooo") == oneShot(standing ++ batch),
      "an out-of-order id must interleave exactly as the one-shot packer would")
  }

  test("streaming pack: full-delta emissions equal the batch loop; latest-per-id is the loader view") {
    val s = spark; import s.implicits._
    val standing = (0L until 100L).map(i => (i, "s", 7L))
    val b1 = (100L until 110L).map(i => (i, "s", 9L))
    val b2 = (110L until 120L).map(i => (i, "s", 13L))
    // batch 3 SUPERSEDES id 70 (7 → 40 tokens): standing placements
    // 71..99 and the streamed 100..119 all displace — the ADVICE case:
    // a from_batch-only emission would leave a downstream consumer
    // with stale coordinates for every one of them
    val b3 = Seq((70L, "s", 40L))
    // batch-mode reference emissions: the FULL touched-shard delta
    PackIndex.buildPackState(df(standing), "id", "src", "tok", Cap, ShardSize, "pk_ref")
    def emission(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long, Long)] =
      d.select("id", "shard", "bin_first", "bin_last", "offset_in_bin")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sorted
    val e1 = emission(cycle("pk_ref", b1))
    val e2 = emission(cycle("pk_ref", b2))
    val e3 = emission(cycle("pk_ref", b3))
    // streaming over the same three micro-batches
    PackIndex.buildPackState(df(standing), "id", "src", "tok", Cap, ShardSize, "pk_str")
    val staged = df(b1 ++ b2 ++ b3)
    val docsDir = SparkEntry.stageMicroBatches(staged, "id",
      Seq((100L, 110L), (110L, 120L), (70L, 71L)), "pks")
    val out = java.nio.file.Files.createTempDirectory("graft_pks_out_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pks_ckpt_").toString
    graft.streaming.OnChange.streamingPackDelta(spark, docsDir, "id", "src", "tok",
      Cap, ShardSize, "pk_str", out, ckpt)
    def streamed(b: Int): Seq[(Long, Long, Long, Long, Long)] =
      spark.read.parquet(s"$out/batch_id=$b")
        .select("id", "shard", "bin_first", "bin_last", "offset_in_bin")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sorted
    assert(streamed(0) == e1, "streaming batch 0 must emit the full batch-mode delta 1")
    assert(streamed(1) == e2, "streaming batch 1 must emit the full batch-mode delta 2")
    assert(streamed(2) == e3, "streaming batch 2 must emit the full batch-mode delta 3")
    // the supersede's displacements are IN its emission
    val moved = e3.map(t => t._1 -> t).toMap
    assert((71L until 120L).forall(moved.contains),
      "displaced standing/streamed placements must re-emit with the superseding batch")
    val effective = standing.map { case t @ (i, g, _) => if (i == 70L) (i, g, 40L) else t } ++
      b1 ++ b2
    assert(state("pk_str") == oneShot(effective),
      "after the stream the standing state must equal the one-shot packer (effective corpus)")
    assert(state("pk_str") == state("pk_ref"), "streaming ≡ batch standing state")
    // the loader view: latest emission per id == final placement
    val latest = spark.read.parquet(out)
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("batch_id").desc)))
      .filter(col("__rn") === 1)
      .select("id", "shard", "bin_first", "bin_last", "offset_in_bin")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val os = oneShot(effective)
    assert(latest == latest.keySet.map(i => i -> os(i)).toMap,
      "latest emission per id must equal the one-shot placement")
  }

  test("pack cron job: tokens advance, windows drain, placements upsert, redelivery is clean") {
    import graft.jobs._
    import java.time.LocalDateTime
    val s = spark; import s.implicits._
    val standing = (0L until 100L).map(i => (i, "s", 7L))
    PackIndex.buildPackState(df(standing), "id", "src", "tok", Cap, ShardSize, "pk_job")
    val reg = new DatasetRegistry
    val b1 = (100L until 110L).map(i => (i, "s", 9L))
    reg.put("toklog", df(b1).withColumn("recorded", lit(1L)))
    val sched = new CronScheduler(Seq(PackIndex.packJob(reg, "toklog",
      "id", "src", "tok", "recorded", Cap, ShardSize, "pk_job", "placements")))
    def placed(): Map[Long, (Long, Long, Long, Long)] =
      reg.get("placements").select("id", "shard", "bin_first", "bin_last", "offset_in_bin")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
    // day 1, 04:00: window 1 drains — the emission carries EVERY
    // placement of the touched shard (standing 64..99 re-emitted
    // unchanged, the batch appended at the tail)
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 14, 4, 0)) == Seq("pack_placements"))
    assert(sched.token("pack_placements").contains(1L))
    val os1 = oneShot(standing ++ b1)
    assert(placed() == (64L until 110L).map(i => i -> os1(i)).toMap)
    // day 2: b2 lands PLUS a re-ingest of id 105 with a new width; the
    // window collapses to latest, the repack displaces 106..109, and
    // the upsert replaces every moved placement
    val b2 = (110L until 120L).map(i => (i, "s", 13L))
    reg.put("toklog", reg.get("toklog").unionByName(
      (df(b2 :+ (105L, "s", 40L))).withColumn("recorded", lit(2L))))
    assert(sched.tick(spark, reg, LocalDateTime.of(2026, 8, 15, 4, 0)) == Seq("pack_placements"))
    val eff = (standing ++ b1).map { case t @ (i, g, _) => if (i == 105L) (i, g, 40L) else t } ++ b2
    val os2 = oneShot(eff)
    assert(state("pk_job") == os2, "state equals the one-shot over the effective corpus")
    assert(placed() == (64L until 120L).map(i => i -> os2(i)).toMap,
      "placements must carry every touched-shard placement at its post-repack value")
    // redelivery with the stale token: placements unchanged
    PackIndex.packJob(reg, "toklog", "id", "src", "tok", "recorded",
        Cap, ShardSize, "pk_job", "placements")
      .makeJob(Some(1L)).run(spark, Some(reg))
    assert(state("pk_job") == os2 && placed() == (64L until 120L).map(i => i -> os2(i)).toMap)
    assert(reg.lineage.contains(("toklog", "placements", "transform")))
  }

  test("packDelta is read-only, runs ONE driver action, and rejects multi-version batches") {
    val standing = (0L until 40L).map(i => (i, "s", 7L))
    PackIndex.buildPackState(df(standing), "id", "src", "tok", Cap, ShardSize, "pk_ro")
    val before = state("pk_ro")
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        actions.incrementAndGet(); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(qel)
    try {
      // drain pre-registration async events, then zero (the RecipeSpec
      // bounded-actions discipline — full-suite bleed otherwise)
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      Thread.sleep(500L)
      actions.set(0)
      PackIndex.packDelta(spark, df(Seq((40L, "s", 5L))), "id", "src", "tok",
        Cap, ShardSize, "pk_ro")
      var last = -1
      while (actions.get() != last) { last = actions.get(); Thread.sleep(500L) }
      // one batch pin + one fused probe; nothing else is eager
      assert(actions.get() <= 2,
        s"packDelta must run one pin + one fused probe, saw ${actions.get()}")
    } finally spark.listenerManager.unregister(qel)
    assert(state("pk_ro") == before, "packDelta must not mutate the standing table")
    intercept[IllegalArgumentException] {
      PackIndex.packDelta(spark, df(Seq((50L, "s", 5L), (50L, "s", 6L))),
        "id", "src", "tok", Cap, ShardSize, "pk_ro")
    }
    // absorb redelivery (at-least-once): same delta twice lands clean
    val d = PackIndex.packDelta(spark, df(Seq((40L, "s", 5L))), "id", "src", "tok",
      Cap, ShardSize, "pk_ro")
    PackIndex.absorbPackDelta(spark, "pk_ro", d)
    PackIndex.absorbPackDelta(spark, "pk_ro", d)
    assert(state("pk_ro") == oneShot(standing :+ (40L, "s", 5L)),
      "re-absorbing the same delta must be idempotent")
  }

  test("many-shard batch: broadcast semi-join path keeps the delta identity; small batch stays statically pruned") {
    // small batch (below the threshold): the literal isin folds into
    // STATIC partition pruning — the standing scan reads exactly the
    // touched partition's files
    val standing = (0L until 10L * ShardSize).map(i => (i, "s", 7L))
    PackIndex.buildPackState(df(standing), "id", "src", "tok", Cap, ShardSize, "pk_many")
    val small = PackIndex.packDelta(spark, df(Seq((5L, "s", 9L))), "id", "src", "tok",
      Cap, ShardSize, "pk_many")
    val plan = planOf(small)
    assert(plan.contains("PartitionFilters") && plan.contains("shard"), plan)
    // sparkPlan, not executedPlan: AQE wraps the latter and hides the
    // scan from collect; static pruning is decided before AQE anyway
    val pruned = small.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.selectedPartitions.partitionCount
    }
    assert(pruned == Seq(1),
      s"a one-shard batch must prune the standing scan to 1 of 10 partitions, got $pruned")
    // many-shard batch (above the threshold): the shards frame rides a
    // broadcast semi-join instead of a giant literal tree — same result
    val batch = (0L until 6L).map(i => (i * ShardSize + 1L, "s", 11L))
    val viaJoin = PackIndex.packDelta(spark, df(batch), "id", "src", "tok",
      Cap, ShardSize, "pk_many", isinShardMax = 4)
    assert(planOf(viaJoin).contains("BroadcastHashJoin"),
      "above the threshold the touched-shard filter must be a broadcast join")
    PackIndex.absorbPackDelta(spark, "pk_many", viaJoin)
    val effective = standing.map { case t @ (i, g, _) =>
      if (i % ShardSize == 1L && i / ShardSize < 6L) (i, g, 11L) else t }
    assert(state("pk_many") == oneShot(effective),
      "the broadcast-join path must land the same one-shot-equal state")
  }
}
