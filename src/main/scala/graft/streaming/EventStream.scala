package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming face of the engine.
  *
  * The reference's Loader is a pull-based paginated stream — a cursor
  * advanced `take` records per `Gimme` (`/root/reference/Loader.fs:14,32-38`)
  * with receipt-counted backpressure (`/root/reference/Orchestrator.fs:65-88`)
  * — i.e., exactly Structured Streaming's micro-batch offset model
  * (SURVEY.md §1 "Streams"). Here the same tables stream micro-batched from
  * parquet with `maxFilesPerTrigger` as the `chunkSize` analogue, plus the
  * things the reference lacks entirely: event time, watermarks, windows, and
  * fault-tolerant state.
  *
  * All transforms are (streaming DataFrame → DataFrame) so the identical
  * logic runs in batch tests and streaming runs.
  */
object EventStream {

  /** events.parquet on-disk schema (ts as nanos long — see
    * [[graft.sources.Tables]] for why). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Micro-batched scan of an events directory; `maxFilesPerTrigger` is the
    * streaming analogue of the reference's `chunkSize` pull batching. */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour windowed counts per event type with a 1-day watermark:
    * late data beyond the watermark is dropped, state is bounded — the
    * at-scale answer to the reference's unbounded in-memory dict
    * (`/root/reference/Worker.fs:32`). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Run a streaming transform over a bounded directory synchronously
    * (availableNow + memory sink), returning the materialized result —
    * used by tests and demos; batch/stream parity check.
    *
    * Complete mode by default: in append mode the windows at the tail of a
    * bounded input never pass the watermark and would be withheld. */
  def runBounded(spark: SparkSession, dir: String,
      transform: DataFrame => DataFrame, queryName: String,
      outputMode: String = "complete"): DataFrame = {
    val q = transform(readEvents(spark, dir))
      .writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
