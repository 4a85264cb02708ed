package graft

import graft.ops.Events
import graft.streaming.OnChange
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The r8 testdata regeneration silently flipped events.parquet's `ts`
  * from TIMESTAMP(NANOS) (read as long under nanosAsLong) to
  * TIMESTAMP(MICROS)/NTZ — and six queries died on a hard-coded
  * `ts div 1000`. This spec pins the contract that killed them: every
  * event-time consumer must produce IDENTICAL results over all three
  * physical encodings of the same logical events, so a future testdata
  * change can never again be invisible to the suite. */
class EventsEncodingSpec extends SparkSpec {

  // one logical event log: 3 users, sessions separated by >2h gaps
  private lazy val fixtures: Map[String, String] = {
    val s = spark
    import s.implicits._
    val hourUs = 3600L * 1000000L
    val rows = for {
      u <- 1L to 3L
      k <- 0L until 20L
    } yield {
      // two session clusters per user: events 10 min apart, clusters 6h apart
      val tsUs = (k / 10) * 6 * hourUs + (k % 10) * 600L * 1000000L + u * 1000000L
      (u * 100 + k, tsUs, u, if (k % 2 == 0) "view" else "click", k * 1.5)
    }
    val base = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
    def write(name: String, tsCol: org.apache.spark.sql.Column): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_enc_${name}_").toString
      base.withColumn("ts", tsCol).drop("ts_us")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      dir
    }
    Map(
      "nanos_long" -> write("nl", (col("ts_us") * 1000L).cast(LongType)),
      "micros_tz"  -> write("tz", timestamp_micros(col("ts_us"))),
      "micros_ntz" -> write("ntz", timestamp_micros(col("ts_us")).cast(TimestampNTZType)))
  }

  private def read(enc: String): DataFrame = spark.read.parquet(fixtures(enc))

  test("the three fixtures really carry three distinct physical types") {
    assert(read("nanos_long").schema("ts").dataType == LongType)
    assert(read("micros_tz").schema("ts").dataType == TimestampType)
    assert(read("micros_ntz").schema("ts").dataType == TimestampNTZType)
  }

  test("tsMicros normalizes every encoding to the same epoch-micros longs") {
    val want = fixtures.keys.map { enc =>
      val df = read(enc)
      enc -> df.select(col("event_id"), Events.tsMicros(df, "ts").as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }.toMap
    assert(want("micros_tz") == want("nanos_long"), "TZ vs long diverged")
    assert(want("micros_ntz") == want("nanos_long"), "NTZ vs long diverged")
    // and the values are the original micros, not an off-by-1000:
    // event_id 100 is (u=1, k=0) → ts_us = 1_000_000 exactly
    assert(want("nanos_long").head == (100L, 1000000L), want("nanos_long").head.toString)
  }

  test("batch event-time operators are encoding-invariant (e1/e2/e4 shapes)") {
    def all(f: DataFrame => DataFrame): Seq[Seq[org.apache.spark.sql.Row]] =
      Seq("nanos_long", "micros_tz", "micros_ntz").map(e => f(read(e)).collect().toSeq)
    val tumb = all(df => Events.tumblingAgg(df, "ts", "1 hour", "event_type")
      .orderBy("window_start", "event_type"))
    assert(tumb(0) == tumb(1) && tumb(0) == tumb(2), "tumblingAgg diverged")
    assert(tumb(0).nonEmpty)
    val slid = all(df => Events.slidingAgg(df, "ts", "2 hours", "1 hour", "event_type")
      .orderBy("window_start", "event_type"))
    assert(slid(0) == slid(1) && slid(0) == slid(2), "slidingAgg diverged")
    val sess = all(df => Events.sessionize(df, "ts", "user_id", "2 hours")
      .orderBy("user_id", "session_start_us"))
    assert(sess(0) == sess(1) && sess(0) == sess(2), "sessionize diverged")
    // 3 users x 2 clusters = 6 sessions
    assert(sess(0).length == 6, s"expected 6 sessions, got ${sess(0).length}")
  }

  test("streaming consumers are encoding-invariant (e3/e5 shapes)") {
    def partFile(dir: String): String =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head.getPath
    val win = Seq("nanos_long", "micros_tz", "micros_ntz").map { e =>
      OnChange.windowedStream(spark, partFile(fixtures(e)))
        .orderBy("window_start", "event_type").collect().toSeq
    }
    assert(win(0) == win(1) && win(0) == win(2), "windowedStream diverged")
    assert(win(0).nonEmpty)
    val sess = Seq("nanos_long", "micros_tz", "micros_ntz").map { e =>
      OnChange.streamingSessionize(spark, partFile(fixtures(e)), gapUs = 7200000000L)
        .orderBy("user_id", "session_start_us").collect().toSeq
    }
    assert(sess(0) == sess(1) && sess(0) == sess(2), "streamingSessionize diverged")
  }
}
