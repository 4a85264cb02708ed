package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The reference's `onchange` trigger (mimiro-io/datahub
  * DOCUMENTATION.md "Jobs": a job that runs whenever its source dataset
  * changes) mapped to Structured Streaming: the change log directory IS
  * the stream; new files are new changes; the job's transform runs
  * incrementally per micro-batch.
  *
  * `runAvailableNow` drains everything currently in the source and
  * stops — the batch-parity mode used by the correctness gate. A live
  * deployment uses the same code with a continuous trigger + checkpoint
  * location; state (aggregations) is managed by Spark's streaming state
  * store, sized by watermarks.
  */
object OnChange {

  /** Incremental aggregation over the event change log, drained with
    * Trigger.AvailableNow into an in-memory sink. The result must equal
    * the batch aggregation over the same files — that equivalence is the
    * oracle. */
  def aggregateEvents(spark: SparkSession, eventsPath: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsPath).schema
    // FileStreamSource consumes a DIRECTORY (each appended file = one
    // batch of changes — the reference's change-log layout). Stage the
    // log file into a scratch dir standing in for that directory.
    val dir = java.nio.file.Files.createTempDirectory("graft_changelog_")
    dir.toFile.deleteOnExit()
    val src = java.nio.file.Paths.get(eventsPath)
    java.nio.file.Files.copy(src, dir.resolve(src.getFileName))
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    val name = "onchange_agg_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
