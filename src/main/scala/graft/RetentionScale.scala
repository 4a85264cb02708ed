package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Events, Retention}

/** e9's absorb marginal measured against a growing standing event log
  * (the StatsStateScale discipline): build the retention state on the
  * slice's earlier events (untimed — the once-per-snapshot cost), then
  * time ONE `absorbIntoRetentionState` of the FIXED ~10k latest-by-time
  * events (the in-order arrival contract makes the time-split the only
  * valid batch shape), a REPLAY of the same batch (must be a marker
  * no-op, ~0), and the triangle read-out (min-of-2 — the read-out is
  * pure, unlike the mutating absorb).
  *
  * What must hold at 100×: the absorb carries NO shuffle or hash build
  * keyed by the standing corpus — its standing reads are map-only
  * column-pruned scans of the user roster and the cells table under
  * broadcast semi-joins, so the timed row may grow only with the
  * roster SCAN (users), never event volume; the read-out is bounded by
  * users × live periods (cells), never events.
  *
  * `runMain graft.RetentionScale [eventsParquet] [sizes...]` */
object RetentionScale {
  def main(args: Array[String]): Unit = {
    val eventsPath = args.headOption.getOrElse("/tmp/sf100ev/events.parquet")
    val sizes = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
                else Seq(100000L, 1000000L, 10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_rsc_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val all = spark.read.parquet(eventsPath).select("event_id", "ts", "user_id")
    val batchN = 10000
    sizes.foreach { n =>
      val staged = java.nio.file.Files.createTempDirectory(s"graft_rsc_$n")
      try {
        all.filter(col("event_id") < n).repartition(32)
          .write.mode("overwrite").parquet(staged.toString)
        val ev = spark.read.parquet(staged.toString)
        val tus = Events.tsMicros(ev, "ts")
        // fixed-size batch = the globally latest ~10k events (ties at
        // the cutoff stay in the batch), standing = everything earlier
        val cutoff = ev.select(tus.as("t")).orderBy(desc("t")).limit(batchN)
          .agg(min(col("t"))).head.getLong(0)
        val standing = ev.filter(tus < cutoff)
        val batch = ev.filter(tus >= cutoff)
        val table = "rsc_state"
        Retention.buildRetentionState(standing, "ts", "user_id",
          periodUs = 86400000000L, table) // daily periods over the ~30-day log
        val t0 = System.nanoTime()
        Retention.absorbIntoRetentionState(spark, batch, "ts", "user_id", table, 1L)
        val tAbsorb = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        Retention.absorbIntoRetentionState(spark, batch, "ts", "user_id", table, 1L)
        val tReplay = (System.nanoTime() - t1) / 1e9
        def readOnce(): (Double, Long) = {
          val t = System.nanoTime()
          val c = Retention.retentionReadout(spark, table).count()
          ((System.nanoTime() - t) / 1e9, c)
        }
        val (ra, cells) = readOnce()
        val (rb, _) = readOnce()
        val users = spark.table(s"${table}_first").count()
        // the r17 re-anchor valve priced against its alternative: an
        // out-of-order backfill for a FIXED ~100 users (one synthetic
        // pre-cohort event each) re-anchors the affected slice vs a
        // full buildRetentionState over the complete log. The
        // re-anchor's standing reads are the compact rewrite (linear
        // in state size, not event volume) + a broadcast semi-join
        // SLICE of the log; the rebuild re-aggregates every event.
        val mn = ev.agg(min(tus)).head.getLong(0)
        val someUsers = ev.select(col("user_id")).distinct()
          .orderBy("user_id").limit(100)
        // the backfill's ts must ride the LOG'S OWN encoding (long
        // nanos under nanosAsLong, or a real timestamp) — tsMicros
        // adapts per schema, and a mixed-type union would be wrong
        val backTs =
          if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            lit((mn - 86400000000L) * 1000L)
          else timestamp_micros(lit(mn - 86400000000L))
        val backfill = someUsers.select(col("user_id"), backTs.as("ts"))
        val log = ev.select(col("user_id"), col("ts"))
        val t2 = System.nanoTime()
        Retention.reanchorRetentionState(spark, log, backfill,
          "ts", "user_id", table, 99L)
        val tReanchor = (System.nanoTime() - t2) / 1e9
        // the r18 deployment shape: the absorbed log MAINTAINED
        // partitioned by the user shard (Retention.userShard) — the
        // re-anchor's history read then PRUNES to the affected users'
        // shard directories at planning time instead of scanning all
        // events (untimed one-off staging; a deployment pays it
        // incrementally at absorb time)
        val shardedDir = java.nio.file.Files.createTempDirectory(s"graft_rsc_sh_$n")
        log.withColumn("shard", Retention.userShard(col("user_id")))
          .write.mode("overwrite").partitionBy("shard").parquet(shardedDir.toString)
        val shardedLog = spark.read.parquet(shardedDir.toString)
        val t2b = System.nanoTime()
        Retention.reanchorRetentionState(spark, shardedLog, backfill,
          "ts", "user_id", table, 100L, shardCol = Some("shard"))
        val tReanchorSh = (System.nanoTime() - t2b) / 1e9
        // the case the pruning exists for: a SHARD-LOCAL backfill (one
        // re-ingested upstream partition — its users share a shard, so
        // the history read prunes to ~1/64 of the directories; the
        // 100-spread-users case above touches most shards and measures
        // the pruning floor, not its value)
        val localUsers = ev.select(col("user_id")).distinct()
          .filter(Retention.userShard(col("user_id")) === 0)
          .orderBy("user_id").limit(100)
        val localBackfill = localUsers.select(col("user_id"), backTs.as("ts"))
        val t2c = System.nanoTime()
        Retention.reanchorRetentionState(spark, shardedLog, localBackfill,
          "ts", "user_id", table, 101L, shardCol = Some("shard"))
        val tReanchorShLocal = (System.nanoTime() - t2c) / 1e9
        org.apache.commons.io.FileUtils.deleteQuietly(shardedDir.toFile)
        val t3 = System.nanoTime()
        Retention.buildRetentionState(log.unionByName(backfill), "ts", "user_id",
          periodUs = 86400000000L, "rsc_rebuild")
        val tRebuild = (System.nanoTime() - t3) / 1e9
        println(f"n=$n%9d  users=$users%7d  batch~$batchN  absorb=$tAbsorb%6.2f s  " +
          f"replay=$tReplay%5.2f s  readout=${math.min(ra, rb)}%6.2f s  triangle_cells=$cells  " +
          f"reanchor(100u)=$tReanchor%6.2f s  reanchor_sharded=$tReanchorSh%6.2f s  " +
          f"reanchor_shard_local=$tReanchorShLocal%6.2f s  rebuild=$tRebuild%6.2f s")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(staged.toFile)
        ()
      }
    }
    spark.stop()
  }
}
