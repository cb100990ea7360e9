package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** PUSH ingestion — the dozer gRPC ingest service analogue
  * (/root/reference/dozer-ingestion/grpc/src/adapter/: clients push
  * Arrow/JSON batches into an in-process `Ingestor` channel; the
  * pipeline consumes them with resume tokens).
  *
  * Spark-native seam: a named in-JVM channel ([[PushBuffer]]) exposed
  * as a REAL DataSource V2 table that supports
  *
  *  - batch reads (the connector's snapshot phase), and
  *  - micro-batch streaming reads with monotonic long offsets (the
  *    change-stream phase; the streaming checkpoint persists the
  *    offset — dozer's `OpIdentifier` resume token).
  *
  * Rows are `(seq BIGINT, ts TIMESTAMP, value STRING)` — the JSON
  * ingest-adapter shape; callers parse `value` with `from_json`
  * downstream, which keeps this source schema-free like the
  * reference's JSON adapter.
  *
  * Planned partitions EMBED their rows (exactly how Spark's own
  * MemoryStream ships driver-held data to executors), so the source
  * works unchanged on a multi-executor cluster as long as pushes
  * happen on the driver; a production deployment would back the same
  * two scan paths with a durable log instead of a heap buffer.
  *
  * Usage:
  * {{{
  *   PushBuffer.push("chan", """{"k":1}""")
  *   spark.readStream.format("graft.sources.PushSource")
  *     .option("channel", "chan").load()
  * }}}
  */
class PushSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PushSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val channel = properties.get("channel")
    require(channel != null && channel.nonEmpty,
      "push source needs .option(\"channel\", <name>)")
    new PushTable(channel)
  }
}

object PushSource {
  val Schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", StringType, nullable = true)))
}

/** Driver-side push channels. Thread-safe; each push is assigned a
  * monotonically increasing `seq` (the offset AND the resume token).
  */
object PushBuffer {
  final case class Event(seq: Long, tsMicros: Long, value: String)

  private val channels =
    new ConcurrentHashMap[String, java.util.ArrayList[Event]]()

  private def buf(channel: String): java.util.ArrayList[Event] =
    channels.computeIfAbsent(channel, _ => new java.util.ArrayList[Event]())

  /** Append values; returns the exclusive end offset after the push. */
  def push(channel: String, values: String*): Long = {
    val b = buf(channel)
    b.synchronized {
      val now = System.currentTimeMillis() * 1000L
      values.foreach(v => b.add(Event(b.size().toLong, now, v)))
      b.size().toLong
    }
  }

  /** Current exclusive end offset. */
  def endOffset(channel: String): Long = {
    val b = buf(channel)
    b.synchronized(b.size().toLong)
  }

  /** Events in [from, until). */
  def slice(channel: String, from: Long, until: Long): Array[Event] = {
    val b = buf(channel)
    b.synchronized {
      val hi = math.min(until, b.size().toLong).toInt
      val lo = math.min(math.max(from, 0L), hi.toLong).toInt
      Array.tabulate(hi - lo)(i => b.get(lo + i))
    }
  }

  def clear(channel: String): Unit = {
    val b = buf(channel)
    b.synchronized(b.clear())
  }
}

private[sources] class PushTable(channel: String) extends Table with SupportsRead {
  override def name(): String = s"push:$channel"
  override def schema(): StructType = PushSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new PushScan(channel)
}

private[sources] class PushScan(channel: String) extends Scan {
  override def readSchema(): StructType = PushSource.Schema

  /** Snapshot phase: everything pushed so far, fixed at planning time. */
  override def toBatch: Batch = new Batch {
    private val end = PushBuffer.endOffset(channel)
    override def planInputPartitions(): Array[InputPartition] =
      PushScan.partitions(channel, 0L, end)
    override def createReaderFactory(): PartitionReaderFactory =
      PushScan.readerFactory
  }

  /** Change-stream phase: micro-batches over [start, latest). */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      override def latestOffset(): Offset =
        PushOffset(PushBuffer.endOffset(channel))
      override def initialOffset(): Offset = PushOffset(0L)
      override def deserializeOffset(json: String): Offset =
        PushOffset(json.trim.toLong)
      override def commit(end: Offset): Unit = () // buffer retained for replay
      override def stop(): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        PushScan.partitions(channel,
          start.asInstanceOf[PushOffset].seq, end.asInstanceOf[PushOffset].seq)
      override def createReaderFactory(): PartitionReaderFactory =
        PushScan.readerFactory
    }
}

private[sources] object PushScan {
  /** Split [from, until) into row-embedding partitions (≤ `maxSlices`,
    * ≥ 1 row each) so a large push still fans out across executors.
    */
  def partitions(channel: String, from: Long, until: Long,
      maxSlices: Int = 8): Array[InputPartition] = {
    val events = PushBuffer.slice(channel, from, until)
    if (events.isEmpty) Array.empty
    else {
      val slices = math.min(maxSlices, events.length)
      val per = (events.length + slices - 1) / slices
      events.grouped(per).map(g => PushPartition(g): InputPartition).toArray
    }
  }

  val readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val rows = partition.asInstanceOf[PushPartition].events
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = {
          val e = rows(i)
          InternalRow(e.seq, e.tsMicros,
            if (e.value == null) null else UTF8String.fromString(e.value))
        }
        override def close(): Unit = ()
      }
    }
  }
}

private[sources] case class PushPartition(events: Array[PushBuffer.Event])
  extends InputPartition

private[sources] case class PushOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}
