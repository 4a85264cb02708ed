package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Job run history — the reference's per-run `jobResult` record
  * (mimiro-io/datahub internal/jobs/job.go:40 `jobResult{ID, Title,
  * Start, End, LastError, Processed}`, stored at the end of every
  * `job.Run()` at job.go:156-168 and read back by
  * `Scheduler.GetJobHistory` at scheduler.go:368; surfaced by
  * `mim jobs history <id>`, DOCUMENTATION.md "Getting latest run info
  * from a Job").
  *
  * Graft's history is an APPEND-ONLY registry dataset — one row per
  * firing, never overwritten (the log discipline every graft dataset
  * follows; the reference keeps only the last run per job, which is
  * exactly [[latest]] over this log). It rides the registry like any
  * other dataset: backup, lineage, and changes-since consume it
  * unchanged. Timestamps come from the scheduler's tick instant — the
  * simulated-schedule time source that makes histories reproducible
  * (wall-clock durations are [[Metrics]]' job); `seq` is the
  * scheduler-assigned firing number, the total order within a run. */
object JobHistory {

  /** Default registry dataset name for the history log. */
  val DefaultDataset = "_job_history"

  /** Append one firing's result row. `lastError` None = success
    * (recorded as an empty string, the reference's zero value — a
    * non-null column keeps DuckDB/Spark hash parity simple). */
  def record(spark: SparkSession, registry: DatasetRegistry, dataset: String,
             jobId: String, seq: Long, startUs: Long, endUs: Long,
             processed: Long, lastError: Option[String]): Unit = {
    import spark.implicits._
    val row = Seq((jobId, seq, startUs, endUs, processed, lastError.getOrElse("")))
      .toDF("job_id", "seq", "start_us", "end_us", "processed", "last_error")
    AppendSink(registry, dataset).write(row)
  }

  /** The full firing log, ordered (`seq` is the scheduler's total
    * order). */
  def history(registry: DatasetRegistry,
              dataset: String = DefaultDataset): DataFrame =
    registry.get(dataset).orderBy("seq")

  /** The reference's `GetJobHistory` view: the LATEST run per job —
    * plus each job's total firing and failure counts, the aggregate a
    * jobs dashboard reads next to it. One shuffle on job_id at any
    * scale; the history log is bounded by firings, never data volume. */
  def latest(registry: DatasetRegistry,
             dataset: String = DefaultDataset): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("job_id").orderBy(col("seq").desc)
    registry.get(dataset)
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_runs", count(lit(1)).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .withColumn("n_failed", sum(when(col("last_error") =!= "", 1L).otherwise(0L))
        .over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
