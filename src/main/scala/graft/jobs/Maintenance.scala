package graft.jobs

import graft.ops.ChangeLog
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Composed background maintenance — the reference's standing scheduler
  * registers exactly two system cron tasks
  * (mimiro-io/datahub internal/service/scheduler/scheduler.go:21-22):
  * a nightly statistics refresh at 02:00
  * (statistics_update.go:43 `NewStatisticsUpdater` — recount every
  * dataset, persist the result under a store-meta key) and a nightly GC
  * sweep at 19:00 (gc_update.go:10 `NewGCUpdate` — clean deleted
  * datasets, then reclaim storage). Re-expressed over graft primitives:
  * [[Statistics]] (footer-level byte stats), [[ChangeLog.retain]] (the
  * as-of-preserving retention sweep), and [[CronScheduler]] ticks.
  *
  * Scale shape: the stats job is O(#datasets) tiny aggregates (row
  * counts are scan-count jobs Spark distributes; byte stats are footer
  * reads, no data pages); the GC job is ChangeLog.retain's single
  * entity-partitioned window over the pre-watermark slice — each firing
  * touches one dataset's log, never the whole lake, and the rewrite is
  * pinned (lineage-truncated) exactly like a real storage generation
  * swap, so repeated firings never stack plans.
  */
object Maintenance {

  /** One maintained dataset: registry name + optional parquet path.
    * Path-backed targets also report compressed data bytes (the
    * reference's per-dataset key/value size breakdown —
    * statistics_update.go:98 `Count`). */
  final case class Target(name: String, path: Option[String] = None)

  private val statsSchema = StructType(Seq(
    StructField("dataset", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("data_bytes", LongType, nullable = true),
    StructField("refresh_seq", LongType, nullable = false)))

  /** One statistics snapshot over `targets`: (dataset, rows,
    * data_bytes, refresh_seq). `refresh_seq` is the firing ordinal —
    * the observable proof a scheduled refresh actually advanced
    * (reference RunResult timestamps serve the same purpose). */
  def statsSnapshot(spark: SparkSession, registry: DatasetRegistry,
                    targets: Seq[Target], seq: Long): DataFrame = {
    val rows = targets.map { t =>
      val df = t.path.map(spark.read.parquet(_)).getOrElse(registry.get(t.name))
      val bytes = t.path.map(p => Statistics.parquetDataBytes(spark, p))
      Row(t.name, df.count(), bytes.map(java.lang.Long.valueOf).orNull, seq)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), statsSchema)
  }

  /** The nightly statistics-refresh cron job (reference
    * statistics_update.go:43, schedule scheduler.go:21 `0 2 * * *`).
    * Stateless full recount per firing — the published `statsName`
    * dataset is replaced wholesale, `refresh_seq` strictly increasing. */
  def statsJob(registry: DatasetRegistry, targets: Seq[Target],
               statsName: String = "stats",
               cron: String = "0 2 * * *"): CronJob = {
    val seq = new java.util.concurrent.atomic.AtomicLong(0L)
    CronJob(
      id = "scheduled_stats_update",
      cron = Cron.parse(cron),
      makeJob = _ => Job(
        id = "scheduled_stats_update",
        source = FunctionSource(s => statsSnapshot(s, registry, targets, seq.incrementAndGet())),
        sink = DatasetSink(registry, statsName),
        sourceName = "system", sinkName = statsName),
      nextToken = () => None)
  }

  /** The nightly GC cron job (reference gc_update.go:10, schedule
    * scheduler.go:22 `0 19 * * *`): compute the retention watermark
    * T = max(recorded) − `keepTokens`, sweep the log with
    * [[ChangeLog.retain]] (every as-of query at tokens ≥ T unchanged —
    * garbagecollector.go's contract), and republish the PINNED result
    * as the new log generation. The stored continuation token is the
    * watermark actually applied, so an operator can read how far GC
    * has swept from `scheduler.token("scheduled_gc")`. */
  def gcJob(registry: DatasetRegistry, logName: String,
            idCol: String, recordedCol: String, keepTokens: Long,
            cron: String = "0 19 * * *"): CronJob = {

    def watermark(): Long = {
      val mx = registry.get(logName).agg(max(col(recordedCol))).collect()(0)
      if (mx.isNullAt(0)) 0L else math.max(0L, mx.getLong(0) - keepTokens)
    }

    CronJob(
      id = "scheduled_gc",
      cron = Cron.parse(cron),
      makeJob = _ => Job(
        id = "scheduled_gc",
        source = RegistrySource(registry, logName),
        transform = log =>
          // pin the sweep result: a registry republish must behave like
          // the reference's storage rewrite (a new generation), not a
          // lazy plan stacking retain-over-retain every firing
          graft.core.Checkpoints.truncate(
            ChangeLog.retain(log, idCol, recordedCol, watermark())),
        sink = DatasetSink(registry, logName),
        sourceName = logName, sinkName = logName),
      nextToken = () => Some(watermark()))
  }

  /** The reference's full standing schedule, ready for a
    * [[CronScheduler]]: stats at 02:00, GC at 19:00
    * (scheduler.go:21-22). */
  def scheduler(registry: DatasetRegistry, targets: Seq[Target],
                logName: String, idCol: String, recordedCol: String,
                keepTokens: Long): CronScheduler =
    new CronScheduler(Seq(
      statsJob(registry, targets),
      gcJob(registry, logName, idCol, recordedCol, keepTokens)))
}
