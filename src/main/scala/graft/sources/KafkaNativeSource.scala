package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.{KafkaBatch, KafkaClient}

/** NATIVE Kafka DataSource V2 — the reference Kafka connector re-built
  * directly on the broker wire protocol (no librdkafka, no
  * spark-sql-kafka jar): [[KafkaClient]] sessions speak Metadata /
  * ListOffsets / Fetch v4, [[KafkaBatch]] decodes the RecordBatch v2
  * frames.
  *
  * The properties that make it the REAL connector shape rather than a
  * drain-to-channel bridge:
  *
  *  - **Kafka offsets ARE the checkpoint offsets** — the streaming
  *    offset log persists one offset PER TOPIC-PARTITION (dozer's
  *    `OpIdentifier` for Kafka is exactly the message offset,
  *    stream_consumer_basic.rs / stream_consumer_helper.rs's
  *    OffsetsMap), so a restarted query resumes from the broker
  *    precisely where the checkpoint says, no duplicates, no gap,
  *    nothing buffered on the driver.
  *  - **Partitions are DISCOVERED from broker metadata** (the
  *    consumer contract) unless pinned with the `partition` /
  *    `partitions` options, and **fetch runs on the EXECUTORS** —
  *    planned input partitions carry (broker, topic, partition,
  *    fromOffset, untilOffset); each reader opens its own session and
  *    fetches only its slice, so a large catch-up fans out across the
  *    cluster while the driver only asks for high watermarks.
  *
  * Options: `broker` (host:port), `topic`, `partition`/`partitions`
  * (optional pin, e.g. "0" / "0,2"), `numSlices` (per-partition fetch
  * parallelism for big ranges, default 4), `maxOffsetsPerTrigger`
  * (default 10000, spread over partitions). Schema:
  * `(partition INT, offset BIGINT, ts TIMESTAMP, key STRING,
  * value STRING)`; Kafka's ordering contract is per partition (and so
  * per key under key-hash partitioning), which is exactly the
  * ordering CDC decoders need.
  *
  * PLAINTEXT listeners (the reference's default).
  */
class KafkaNativeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaNativeSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    def req(k: String): String = {
      val v = opts.get(k)
      require(v != null && v.nonEmpty, s"kafka native source needs .option(\"$k\", …)")
      v
    }
    val pinned = Option(opts.get("partitions")).orElse(Option(opts.get("partition")))
      .map(_.split(",").map(_.trim.toInt).toSeq)
    new KafkaNativeTable(KafkaNativeConf(
      broker = req("broker"),
      topic = req("topic"),
      pinnedPartitions = pinned,
      numSlices = Option(opts.get("numSlices")).map(_.toInt).getOrElse(4),
      maxPerTrigger = Option(opts.get("maxOffsetsPerTrigger"))
        .map(_.toLong).getOrElse(10000L)))
  }
}

object KafkaNativeSource {
  val Schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))
}

private[sources] final case class KafkaNativeConf(broker: String,
    topic: String, pinnedPartitions: Option[Seq[Int]], numSlices: Int,
    maxPerTrigger: Long)

private[sources] class KafkaNativeTable(conf: KafkaNativeConf)
    extends Table with SupportsRead {
  override def name(): String = s"kafka:${conf.topic}"
  override def schema(): StructType = KafkaNativeSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new KafkaNativeScan(conf)
}

private[sources] class KafkaNativeScan(conf: KafkaNativeConf) extends Scan {
  override def readSchema(): StructType = KafkaNativeSource.Schema

  private def withSession[A](f: KafkaClient.Session => A): A = {
    val (host, port) = Sources.splitBroker(conf.broker)
    val s = new KafkaClient.Session(host, port)
    try f(s) finally s.close()
  }

  /** Partition ids: pinned by option, else broker metadata. */
  private def partitionIds(s: KafkaClient.Session): Seq[Int] =
    conf.pinnedPartitions.getOrElse {
      val meta = s.metadata(Seq(conf.topic))
      val topicMeta = meta.find(_.name == conf.topic).getOrElse(
        throw new IllegalStateException(
          s"kafka native: broker metadata has no topic '${conf.topic}'"))
      require(topicMeta.error == 0,
        s"kafka native: metadata error ${topicMeta.error} for '${conf.topic}'")
      topicMeta.partitions.map(_.partition).sorted
    }

  private def offsetsAt(timestamp: Long): Map[Int, Long] = withSession { s =>
    partitionIds(s).map(p =>
      p -> s.listOffset(conf.topic, p, timestamp)).toMap
  }

  /** Snapshot: [earliest, latest) per partition, fixed at planning. */
  override def toBatch: Batch = new Batch {
    private val (start, end) = withSession { s =>
      val ps = partitionIds(s)
      (ps.map(p => p -> s.listOffset(conf.topic, p, -2L)).toMap,
        ps.map(p => p -> s.listOffset(conf.topic, p, -1L)).toMap)
    }
    override def planInputPartitions(): Array[InputPartition] =
      KafkaNativeScan.slices(conf, start, end)
    override def createReaderFactory(): PartitionReaderFactory =
      KafkaNativeScan.readerFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsAdmissionControl
        with SupportsTriggerAvailableNow {
      // AvailableNow contract: capture the end ONCE, then page micro-
      // batches up to it — a bounded catch-up that checkpoints per batch
      private var availableEnd: Option[Map[Int, Long]] = None
      override def prepareForTriggerAvailableNow(): Unit =
        availableEnd = Some(offsetsAt(-1L))
      override def initialOffset(): Offset =
        KafkaNativeOffset(offsetsAt(-2L))
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException(
          "latestOffset(Offset, ReadLimit) should be called instead")
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val from = start.asInstanceOf[KafkaNativeOffset].offsets
        val hw = availableEnd.getOrElse(offsetsAt(-1L))
        // spread the trigger budget over partitions; a partition that
        // appears mid-stream starts at its earliest offset
        val perPart = math.max(1L, conf.maxPerTrigger / math.max(1, hw.size))
        KafkaNativeOffset(hw.map { case (p, h) =>
          p -> math.min(h, from.getOrElse(p, 0L) + perPart)
        })
      }
      override def reportLatestOffset(): Offset =
        KafkaNativeOffset(availableEnd.getOrElse(offsetsAt(-1L)))
      override def getDefaultReadLimit: ReadLimit =
        ReadLimit.maxRows(conf.maxPerTrigger)
      override def deserializeOffset(json: String): Offset =
        KafkaNativeOffset(KafkaNativeOffset.parse(json))
      override def commit(end: Offset): Unit = () // the broker retains
      override def stop(): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        KafkaNativeScan.slices(conf,
          start.asInstanceOf[KafkaNativeOffset].offsets,
          end.asInstanceOf[KafkaNativeOffset].offsets)
      override def createReaderFactory(): PartitionReaderFactory =
        KafkaNativeScan.readerFactory
    }
}

private[sources] object KafkaNativeScan {
  /** Per topic-partition: split [from, until) into at most
    * `numSlices` offset ranges (per-partition fetch parallelism).
    */
  def slices(conf: KafkaNativeConf, from: Map[Int, Long],
      until: Map[Int, Long]): Array[InputPartition] =
    until.toSeq.sortBy(_._1).flatMap { case (p, hi) =>
      val lo = from.getOrElse(p, 0L)
      if (hi <= lo) Nil
      else {
        val n = math.min(conf.numSlices.toLong, hi - lo).toInt
        val per = (hi - lo + n - 1) / n
        (0 until n).flatMap { i =>
          val a = lo + i * per
          val b = math.min(hi, a + per)
          if (a < b)
            Some(KafkaNativePartition(conf.broker, conf.topic, p, a, b)
              : InputPartition)
          else None
        }
      }
    }.toArray

  val readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[KafkaNativePartition]
      new PartitionReader[InternalRow] {
        private val (host, port) = Sources.splitBroker(p.broker)
        private val session = new KafkaClient.Session(host, port)
        private var offset = p.from
        private var recs: Iterator[KafkaBatch.Rec] = Iterator.empty
        private var current: KafkaBatch.Rec = _

        override def next(): Boolean = {
          while (!recs.hasNext && offset < p.until) {
            val f = session.fetch(p.topic, p.partition, offset,
              maxWaitMs = 500)
            require(f.error == 0, s"kafka native: fetch error ${f.error}")
            if (f.batches.isEmpty) {
              // nothing at/past our offset although the planner said
              // there would be — loud, never a silent short read
              require(offset >= f.highWatermark,
                s"kafka native: empty fetch at $offset below " +
                  s"watermark ${f.highWatermark}")
              return false
            }
            val decoded = f.batches.iterator.flatMap(KafkaBatch.decodeBatch)
              .filter(r => r.offset >= p.from && r.offset < p.until)
            val lastBatch = f.batches.last
            val bb = java.nio.ByteBuffer.wrap(lastBatch)
            offset = bb.getLong(0) + bb.getInt(23) + 1
            recs = decoded
          }
          if (recs.hasNext) { current = recs.next(); true } else false
        }

        override def get(): InternalRow = InternalRow(
          p.partition, current.offset, current.tsMillis * 1000L,
          if (current.key == null) null else UTF8String.fromString(current.key),
          if (current.value == null) null else UTF8String.fromString(current.value))

        override def close(): Unit = session.close()
      }
    }
  }
}

private[sources] final case class KafkaNativePartition(broker: String,
    topic: String, partition: Int, from: Long, until: Long)
  extends InputPartition

private[sources] final case class KafkaNativeOffset(offsets: Map[Int, Long])
    extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

private[sources] object KafkaNativeOffset {
  def parse(json: String): Map[Int, Long] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val b = Map.newBuilder[Int, Long]
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      b += (e.getKey.toInt -> e.getValue.asLong())
    }
    b.result()
  }
}
