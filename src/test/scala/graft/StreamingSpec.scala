package graft

import graft.streaming.OnChange
import org.apache.spark.sql.functions._

/** onchange ≙ Structured Streaming: the drained incremental aggregation
  * must equal the batch aggregation over the same change log. */
class StreamingSpec extends SparkSpec {

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
