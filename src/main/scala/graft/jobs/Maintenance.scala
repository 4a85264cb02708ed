package graft.jobs

import graft.ops.ChangeLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** One statistics snapshot over `targets`: (dataset, rows,
    * data_bytes, refresh_seq), plus the reference's generated `all`
    * rollup row summing every dataset (DOCUMENTATION.md "Maintenance →
    * statistics": "one generated dataset entry called `all`").
    * `refresh_seq` is the firing ordinal — the observable proof a
    * scheduled refresh actually advanced (reference RunResult
    * timestamps serve the same purpose).
    *
    * Scale shape: ONE distributed pass, never a sequential driver
    * loop of `count()` actions — each target contributes a count
    * branch to a single union plan (branches schedule in parallel
    * within one job — the Export.manifest precedent), and the footer
    * byte reads distribute over executors (one task per slice of the
    * file list; the driver only walks the listing). At hundreds of
    * datasets the snapshot's wall time is the LARGEST target's scan,
    * not the sum. The per-dataset result is pinned before the rollup
    * so the counts run once, not once per union branch.
    *
    * Executor-side footer reads use a classpath-default Hadoop conf
    * (core-site.xml etc.); session-only conf overrides do not
    * propagate — matching `Statistics.parquetDataBytes`'s documented
    * object-store caveat. */
  def statsSnapshot(spark: SparkSession, registry: DatasetRegistry,
                    targets: Seq[Target], seq: Long): DataFrame = {
    import spark.implicits._
    require(targets.nonEmpty, "statsSnapshot needs at least one target")
    val counts = targets.map { tgt =>
      val df = tgt.path.map(spark.read.parquet(_)).getOrElse(registry.get(tgt.name))
      df.agg(count(lit(1)).as("rows")).select(lit(tgt.name).as("dataset"), col("rows"))
    }.reduce(_ unionByName _)
    val files: Seq[(String, String)] = {
      val conf = spark.sessionState.newHadoopConf()
      targets.flatMap(tgt => tgt.path.toSeq.flatMap(p =>
        Statistics.listParquetFiles(conf, p).map(f => tgt.name -> f)))
    }
    val bytesDf =
      if (files.isEmpty) Seq.empty[(String, Long)].toDF("dataset", "data_bytes")
      else spark.sparkContext.parallelize(files, math.min(files.size, 64))
        .map { case (name, f) =>
          val conf = new org.apache.hadoop.conf.Configuration()
          name -> Statistics.footerDataBytes(conf, new org.apache.hadoop.fs.Path(f))
        }.toDF("dataset", "data_bytes")
        .groupBy("dataset").agg(sum("data_bytes").cast("long").as("data_bytes"))
    val perDs = graft.core.Checkpoints.truncate(
      counts.join(bytesDf, Seq("dataset"), "left"))
    val all = perDs.agg(sum("rows").cast("long").as("rows"),
        sum("data_bytes").cast("long").as("data_bytes"))
      .select(lit("all").as("dataset"), col("rows"), col("data_bytes"))
    perDs.unionByName(all)
      .withColumn("refresh_seq", lit(seq))
      .select("dataset", "rows", "data_bytes", "refresh_seq")
  }

  /** `mim stats top` — the largest datasets per storage category
    * (reference DOCUMENTATION.md "Maintenance → statistics"). Over a
    * [[statsSnapshot]]: rank datasets (the generated `all` row
    * excluded) within each category (`rows`, `data_bytes`; a category
    * skips datasets that don't report it) and keep the top `k`. The
    * input is dataset-count-sized, so the windows are trivial. */
  def statsTop(snapshot: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = snapshot.filter(col("dataset") =!= "all")
    val cats = Seq("rows", "data_bytes").map { c =>
      base.filter(col(c).isNotNull)
        .select(lit(c).as("category"), col("dataset"), col(c).cast("long").as("value"))
    }.reduce(_ unionByName _)
    cats.withColumn("rank", row_number().over(
        Window.partitionBy("category").orderBy(col("value").desc, col("dataset"))))
      .filter(col("rank") <= k)
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
