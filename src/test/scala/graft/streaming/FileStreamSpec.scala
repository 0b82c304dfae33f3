package graft.streaming

import graft.SparkSpec
import graft.core.Fx
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The S6-as-stream path: the events fixture consumed through a real
  * parquet file stream (micro-batch), checked against the batch read. */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("events file stream == batch read; windowed agg matches batch twin") {
    val stream = Streams.eventsFileStream(spark, sfDir)
    assert(stream.isStreaming)
    val q = Streams.tumblingAgg(stream, "ts", "1 hour", lateness = "1 minute")
      .writeStream.format("memory").queryName("fs_tumbling")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val streamed = spark.table("fs_tumbling")
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = Fx.t(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    // append mode emits only watermark-closed windows; the final
    // (unclosed) hour stays in state — everything emitted must match
    // the batch result, and nearly all windows should have closed.
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= batch.size - 10, s"${streamed.size} vs ${batch.size}")
    assert(streamed.nonEmpty)
  }
}
