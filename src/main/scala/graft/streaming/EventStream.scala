package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** events.parquet on-disk schema with `ts` as a nanos long (the legacy
    * testdata layout — see [[graft.sources.Tables]] for why). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Micro-batched scan of the events table under `dir` (the sf directory —
    * only `events.parquet` is ingested); `maxFilesPerTrigger` is the
    * streaming analogue of the reference's `chunkSize` pull batching.
    *
    * A streaming source needs a declared schema, so the on-disk `ts` layout
    * is sniffed from one batch footer read first (both testdata generations
    * are supported — see [[graft.sources.Tables]]); either way the stream
    * surfaces a session-zone TIMESTAMP. */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsIsNanosLong =
      spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
        LongType
    val schema =
      if (tsIsNanosLong) rawSchema
      else StructType(rawSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (tsIsNanosLong)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts", col("ts").cast(TimestampType))
  }

  /** Tumbling 1-hour windowed counts per event type with a 1-day watermark:
    * late data beyond the watermark is dropped, state is bounded — the
    * at-scale answer to the reference's unbounded in-memory dict
    * (`/root/reference/Worker.fs:32`). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // decimal-staged sum: exact regardless of per-batch fold order, and
      // bit-identical to the batch/oracle computation of the same total.
      // DECIMAL(20,4), not (12,4): under non-ANSI Spark an out-of-range cast
      // NULLs and silently drops from the sum while DuckDB's identical CAST
      // errors — 16 integer digits puts the divergence bound far outside
      // any real event-value domain
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(20, 4))).cast(DoubleType)
          .as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  case class SessionState(sessionId: Long, startUs: Long, lastUs: Long,
      nEvents: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      duration_us: Long)

  /** Stateful gap-based sessionization over the stream:
    * `flatMapGroupsWithState` keeps one open session per user across
    * micro-batches and emits a session row whenever a gap > `gapMinutes`
    * closes it. The streaming twin of the batch `q19_sessionize` query —
    * the reference's per-worker mutable state dict
    * (`/root/reference/Worker.fs:32`) reborn as fault-tolerant, bounded,
    * checkpointed state. The user's final session stays open (unemitted)
    * until more data or a timeout policy closes it. */
  def sessionize(events: DataFrame, gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L

    def fn(userId: Long, rows: Iterator[(Long, Long)],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = rows.map(_._2).toVector.sorted
      var closed = Vector.empty[SessionOut]
      var st = state.getOption.orNull
      sorted.foreach { us =>
        st = st match {
          case null => SessionState(1L, us, us, 1L)
          case s if us - s.lastUs > gapUs =>
            closed :+= SessionOut(userId, s.sessionId, s.nEvents,
              s.lastUs - s.startUs)
            SessionState(s.sessionId + 1, us, us, 1L)
          case s =>
            // min/max rather than overwrite: an out-of-order event from a
            // later micro-batch (us < s.lastUs) must not regress the session
            // frontier and wrongly split/extend subsequent sessions.
            s.copy(startUs = math.min(s.startUs, us),
              lastUs = math.max(s.lastUs, us), nEvents = s.nEvents + 1)
        }
      }
      if (st != null) state.update(st)
      closed.iterator
    }

    events.select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Watermarked stream-stream inner join: pair each `view` event with the
    * same user's `purchase` events in the following 6 hours — the
    * attribution-join shape. Both sides carry watermarks AND the time-range
    * conjunct, which is what lets Spark evict join state once the watermark
    * passes a row's match window: bounded state on an unbounded stream,
    * where the reference framework could only buffer forever. Inner join
    * results emit as soon as both sides arrive (append mode). */
  def viewToPurchase(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", "1 day")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "1 day")
    views.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") > col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 6 HOURS"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
  }

  /** Streaming exact dedup: drop events whose `event_id` was already seen,
    * with state bounded by the watermark (`dropDuplicatesWithinWatermark` —
    * an id is only guaranteed unique against events inside the watermark
    * horizon, which is what an at-scale ingest dedup wants: O(window) state,
    * not O(stream)). The streaming face of `Dedup.exact`. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming transform over a bounded directory synchronously
    * (availableNow + memory sink), returning the materialized result —
    * used by tests and demos; batch/stream parity check.
    *
    * Complete mode by default: in append mode the windows at the tail of a
    * bounded input never pass the watermark and would be withheld.
    *
    * `shufflePartitions` sizes the STATE STORE count for stateful
    * transforms — a streaming query spins up one store per shuffle
    * partition per stateful operator (a join keeps four), and each store
    * pays per-batch commit I/O regardless of how few rows it holds. Size it
    * to state volume, not to core count (the conf is set for the query's
    * planning and restored after; it is pinned into the query's checkpoint
    * by Spark for its lifetime). */
  def runBounded(spark: SparkSession, dir: String,
      transform: DataFrame => DataFrame, queryName: String,
      outputMode: String = "complete",
      shufflePartitions: Option[Int] = None): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    shufflePartitions.foreach(n => spark.conf.set(key, n))
    try {
      val q = transform(readEvents(spark, dir))
        .writeStream
        .outputMode(outputMode)
        .format("memory")
        .queryName(queryName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, prev)
    spark.table(queryName)
  }
}
