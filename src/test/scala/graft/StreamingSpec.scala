package graft

import graft.streaming.OnChange
import org.apache.spark.sql.functions._

/** onchange ≙ Structured Streaming: the drained incremental aggregation
  * must equal the batch aggregation over the same change log. */
class StreamingSpec extends SparkSpec {

  test("mapGroupsWithState latestOnly carries state across micro-batches (at-least-once redelivery)") {
    val path = s"$sfDir/events.parquet"
    val streamed = OnChange.streamingLatestOnly(spark, path, batches = 3)
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.ops.ChangeLog.latestOnly(
        spark.read.parquet(path), "user_id", "event_id")
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streamed incremental agg equals batch agg") {
    val path = s"$sfDir/events.parquet"
    val streamed = OnChange.aggregateEvents(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = spark.read.parquet(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
