package graft

import graft.sources.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Streaming/batch parity: the micro-batched pipeline over the bounded events
  * directory must agree with the equivalent batch aggregation. */
class StreamingSpec extends SparkSpec {

  test("streaming hourly windowed counts match the batch equivalent") {
    val streamed = EventStream.runBounded(spark, sfDir,
        EventStream.hourlyTypeCounts, "hourly_counts")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet

    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
