package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 implementation of the reference's pull-based paginated
  * Loader (`/root/reference/Loader.fs:9-38`) — the §2a-1 source mapped to
  * Spark's actual connector API instead of by subsumption argument.
  *
  * The reference advances a cursor `toSkip` by `take` rows per request and
  * signals EOF with an empty page (`Orchestrator.fs:80-88`). Here each page
  * becomes one `InputPartition` planned up front — Spark's scheduler deals
  * pages to executors (the reference's round-robin batch dealing,
  * `Orchestrator.fs:77,112`) and completion is the job barrier rather than
  * receipt counting. Column pruning is honored via
  * `SupportsPushDownRequiredColumns`: `select(roll)` never materializes ids.
  *
  * Rows are the deterministic LCG dice stream shared with q18
  * (`Example-Job.fs:37-40`'s unseeded Random made reproducible), so the
  * DuckDB oracle replays the source exactly.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.v2.PagedRollSource")
  *     .option("rows", "100000").option("pageSize", "4096").load()
  * }}}
  */
class PagedRollSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedRollSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // raw properties preserve the caller's key case — normalize
    val opts = new CaseInsensitiveStringMap(properties)
    new PagedRollTable(
      opts.getLong("rows", 100000L),
      opts.getLong("pageSize", 4096L))
  }
}

object PagedRollSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("roll", LongType, nullable = false)))

  /** The q18 LCG die: deterministic, overflow-free in 64 bits. */
  def rollOf(id: Long): Long = ((id * 48271L + 11L) % 2147483647L) % 6L + 1L
}

private[v2] class PagedRollTable(rows: Long, pageSize: Long)
    extends Table with SupportsRead {
  require(rows >= 0 && pageSize > 0, "rows >= 0 and pageSize > 0 required")
  override def name: String = s"paged_rolls(rows=$rows, pageSize=$pageSize)"
  override def schema: StructType = PagedRollSource.schema
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(rows, pageSize)
}

private[v2] class PagedScanBuilder(rows: Long, pageSize: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedRollSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PagedScan(rows, pageSize, required)
}

private[v2] class PagedScan(rows: Long, pageSize: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // one partition per Loader page: cursor = offset, take = pageSize
  override def planInputPartitions(): Array[InputPartition] =
    (0L until rows by pageSize)
      .map(off => PagePartition(off, math.min(pageSize, rows - off))
        : InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PagedMicroBatchStream(rows, pageSize, required)
}

/** Cursor position as a streaming offset — the reference's `toSkip`
  * (`Loader.fs:14`) made a replayable checkpointed offset. */
private[v2] case class CursorOffset(skip: Long) extends Offset {
  override def json(): String = skip.toString
}

/** The streaming face of the paginated Loader: each micro-batch advances
  * the cursor by exactly one page — `latestOffset(start, _)` IS the
  * reference's batched flow control (`Orchestrator.fs:65-88`: fetch a
  * chunk, wait for it to complete, fetch the next), with completion
  * detection handled by the engine committing offsets instead of counting
  * receipts. `SupportsTriggerAvailableNow` lets AvailableNow capture the
  * EOF bound up front and drain page by page to it; restart resumes from
  * the checkpointed cursor (exactly-once, StreamingSpec). */
private[v2] class PagedMicroBatchStream(rows: Long, pageSize: Long,
    required: StructType) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  override def initialOffset(): Offset = CursorOffset(0L)
  // admission-controlled path: one Loader page per trigger
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    CursorOffset(math.min(start.asInstanceOf[CursorOffset].skip + pageSize, rows))
  override def reportLatestOffset(): Offset = CursorOffset(rows) // EOF bound
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def deserializeOffset(json: String): Offset =
    CursorOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CursorOffset].skip
    val e = end.asInstanceOf[CursorOffset].skip
    // page the range exactly as the batch path does (one page per batch
    // under admission control; wider ranges still split into pages)
    (s until e by pageSize)
      .map(off => PagePartition(off, math.min(pageSize, e - off))
        : InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required)
}

private[v2] case class PagePartition(offset: Long, count: Long)
    extends InputPartition

private[v2] class PagedReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val page = p.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var i = -1L
      // resolve the pruned projection once per partition, not per row
      private val getters: Array[Long => Long] = required.fields.map { f =>
        f.name match {
          case "id" => (id: Long) => id
          case "roll" => PagedRollSource.rollOf _
          case other => throw new IllegalArgumentException(
            s"unknown column $other")
        }
      }
      // one mutable row reused across get() calls (consumed before next(),
      // per the reader contract) — no per-row allocation in the scan loop
      private val values = new Array[Any](getters.length)
      private val row =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      override def next(): Boolean = { i += 1; i < page.count }
      override def get(): InternalRow = {
        val id = page.offset + i
        var j = 0
        while (j < getters.length) { values(j) = getters(j)(id); j += 1 }
        row
      }
      override def close(): Unit = ()
    }
  }
}
