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
  *    planned input partitions carry (leaderBroker, bootstrap, topic,
  *    partition, fromOffset, untilOffset); each reader opens its own
  *    session and fetches only its slice, so a large catch-up fans out
  *    across the cluster while the driver only asks for high
  *    watermarks.
  *  - **Requests are LEADER-ROUTED** (what rdkafka does transparently
  *    for the reference, dozer-ingestion/kafka/src/connector.rs):
  *    planning resolves each partition's leader through the Metadata
  *    address book, ListOffsets/Fetch go to that broker, and a fetch
  *    answered with error 6 (NOT_LEADER_OR_FOLLOWER — leadership moved
  *    after planning) refreshes metadata via the bootstrap broker and
  *    retries once against the new leader. A partition appearing
  *    mid-stream starts at its EARLIEST retained offset, not 0.
  *
  * Options: `broker` (host:port), `topic`, `partition`/`partitions`
  * (optional pin, e.g. "0" / "0,2"), `numSlices` (per-partition fetch
  * parallelism for big ranges, default 4), `maxOffsetsPerTrigger`
  * (default 10000, spread over partitions), `valueFormat`
  * (`string` default | `binary` for Avro/protobuf topics),
  * `startingOffsets` (`earliest` default | `latest` | per-partition
  * JSON) / `startingTimestamp` (epoch ms, ListOffsets time lookup) —
  * first start only, the checkpoint always wins on restart. Schema:
  * `(partition INT, offset BIGINT, ts TIMESTAMP, key STRING|BINARY,
  * value STRING|BINARY)`; Kafka's ordering contract is per partition
  * (and so per key under key-hash partitioning), which is exactly the
  * ordering CDC decoders need.
  *
  * Transport: PLAINTEXT (the reference's default) or SSL via
  * `tls=true` [+ `truststore`/`truststorePassword` to pin a
  * certificate; system CAs otherwise] — every session (planner and
  * executor readers alike) then handshakes TLS with SAN hostname
  * verification before the first frame.
  */
class KafkaNativeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaNativeSource.schemaFor(KafkaNativeSource.isBinary(options))

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
        .map(_.toLong).getOrElse(10000L),
      binary = KafkaNativeSource.isBinary(opts),
      tls = Option(opts.get("tls")).exists(_.toBoolean),
      truststore = Option(opts.get("truststore")),
      truststorePassword = Option(opts.get("truststorePassword"))
        .getOrElse(""),
      startingOffsets = Option(opts.get("startingOffsets")),
      startingTimestamp = Option(opts.get("startingTimestamp"))
        .map(_.toLong),
      timestampStrategy = Option(opts.get("startingTimestampStrategy"))
        .map(_.toLowerCase).getOrElse("latest"),
      sasl = Option(opts.get("sasl")).map(_.toLowerCase),
      saslUsername = Option(opts.get("saslUsername")).getOrElse(""),
      saslPassword = Option(opts.get("saslPassword")).getOrElse(""),
      isolationLevel = Option(opts.get("isolationLevel"))
        .orElse(Option(opts.get("isolation.level")))
        .map(_.toLowerCase).getOrElse("read_uncommitted")))
  }
}

object KafkaNativeSource {
  /** `valueFormat`: `string` (default — Debezium/Connect-JSON topics
    * are UTF-8 text) or `binary` (Confluent-framed Avro, protobuf —
    * raw key/value bytes, lossless).
    */
  private[sources] def isBinary(opts: CaseInsensitiveStringMap): Boolean =
    Option(opts.get("valueFormat")).map(_.toLowerCase) match {
      case None | Some("string") => false
      case Some("binary") => true
      case Some(other) => throw new IllegalArgumentException(
        s"kafka native: valueFormat must be string|binary, got '$other'")
    }

  def schemaFor(binary: Boolean): StructType = {
    val payload = if (binary) BinaryType else StringType
    StructType(Seq(
      StructField("partition", IntegerType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("key", payload, nullable = true),
      StructField("value", payload, nullable = true)))
  }

  val Schema: StructType = schemaFor(binary = false)
}

private[sources] final case class KafkaNativeConf(broker: String,
    topic: String, pinnedPartitions: Option[Seq[Int]], numSlices: Int,
    maxPerTrigger: Long, binary: Boolean = false, tls: Boolean = false,
    truststore: Option[String] = None, truststorePassword: String = "",
    startingOffsets: Option[String] = None,
    startingTimestamp: Option[Long] = None,
    timestampStrategy: String = "latest",
    sasl: Option[String] = None, saslUsername: String = "",
    saslPassword: String = "",
    /** "read_uncommitted" (default) or "read_committed" — the latter
      * fetches at isolation level 1 and drops aborted transactions'
      * records via [[graft.cdc.KafkaBatch.filterCommitted]] (KIP-98).
      */
    isolationLevel: String = "read_uncommitted") {
  require(startingOffsets.isEmpty || startingTimestamp.isEmpty,
    "kafka native: startingOffsets and startingTimestamp are exclusive")
  require(Set("read_uncommitted", "read_committed").contains(isolationLevel),
    "kafka native: isolationLevel must be read_uncommitted|" +
      s"read_committed, got '$isolationLevel'")
  def readCommitted: Boolean = isolationLevel == "read_committed"
  require(Set("latest", "error").contains(timestampStrategy),
    s"kafka native: startingTimestampStrategy must be latest|error, " +
      s"got '$timestampStrategy'")
  require(sasl.forall(Set("plain", "scram-sha-256")),
    s"kafka native: sasl must be plain|scram-sha-256, got '${sasl.get}'" +
      " — GSSAPI/Kerberos needs a KDC to authenticate against (none in" +
      " this deployment); use SASL/PLAIN or SCRAM-SHA-256 over TLS")

  /** Secrets may be configured as `env:NAME` to resolve from the
    * process environment at session-open time instead of riding
    * verbatim in the serialized scan conf (where plan dumps / event
    * logs could surface them).
    */
  private def secret(v: String): String =
    if (v.startsWith("env:"))
      sys.env.getOrElse(v.substring(4), throw new IllegalArgumentException(
        s"kafka native: environment variable '${v.substring(4)}' " +
          "(referenced by an env: option) is not set"))
    else v

  /** Open (and, when configured, TLS-handshake + SASL-authenticate) a
    * session to `broker` — every session opener (planner and executor
    * readers) goes through here, so SASL_PLAINTEXT / SASL_SSL both
    * compose from options.
    */
  def openSession(broker: String): graft.cdc.KafkaClient.Session = {
    val (host, port) = Sources.splitBroker(broker)
    val s = new graft.cdc.KafkaClient.Session(host, port,
      ssl = sslFactory())
    try {
      sasl match {
        case Some("plain") =>
          s.saslPlain(saslUsername, secret(saslPassword))
        case Some("scram-sha-256") =>
          s.saslScram(saslUsername, secret(saslPassword))
        case _ => ()
      }
      s
    } catch { case e: Throwable => s.close(); throw e }
  }
  /** One socket factory per session opener: truststore-pinned when a
    * path is configured, system CAs otherwise. (Executors resolve the
    * truststore path locally — ship it with `--files` on a cluster.)
    */
  def sslFactory(): Option[javax.net.ssl.SSLSocketFactory] =
    if (!tls) None
    else Some(truststore match {
      case Some(path) =>
        graft.cdc.KafkaClient.Tls.socketFactory(path,
          secret(truststorePassword))
      case None => graft.cdc.KafkaClient.Tls.defaultFactory()
    })
}

private[sources] class KafkaNativeTable(conf: KafkaNativeConf)
    extends Table with SupportsRead {
  override def name(): String = s"kafka:${conf.topic}"
  override def schema(): StructType = KafkaNativeSource.schemaFor(conf.binary)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new KafkaNativeScan(conf)
}

private[sources] class KafkaNativeScan(conf: KafkaNativeConf) extends Scan {
  override def readSchema(): StructType = KafkaNativeSource.schemaFor(conf.binary)

  private def withSession[A](broker: String)(f: KafkaClient.Session => A): A = {
    val s = conf.openSession(broker)
    try f(s) finally s.close()
  }

  /** One Metadata round-trip to the bootstrap broker: the address book
    * + per-partition leaders. Re-fetched per planning call — leadership
    * moves between micro-batches must re-route the next plan.
    */
  private def cluster(): KafkaClient.ClusterMeta =
    withSession(conf.broker)(_.metadataFull(Seq(conf.topic)))

  /** Partition ids: pinned by option, else broker metadata. */
  private def partitionIds(meta: KafkaClient.ClusterMeta): Seq[Int] =
    conf.pinnedPartitions.getOrElse {
      val topicMeta = meta.topics.find(_.name == conf.topic).getOrElse(
        throw new IllegalStateException(
          s"kafka native: broker metadata has no topic '${conf.topic}'"))
      require(topicMeta.error == 0,
        s"kafka native: metadata error ${topicMeta.error} for '${conf.topic}'")
      topicMeta.partitions.map(_.partition).sorted
    }

  /** host:port every request for `p` must go to: its leader when the
    * address book resolves it, else the bootstrap broker (single-node
    * deployments often report a loopback-unreachable advertised
    * address; the bootstrap answered Metadata, so it exists).
    */
  private def routeFor(meta: KafkaClient.ClusterMeta, p: Int): String =
    meta.leaderAddr(conf.topic, p)
      .map { case (h, pt) => s"$h:$pt" }.getOrElse(conf.broker)

  /** ListOffsets routed to each partition's leader — offsets are
    * leader state; a non-leader answers error 6, not a number.
    */
  private def offsetsAt(timestamp: Long, parts: Seq[Int],
      meta: KafkaClient.ClusterMeta): Map[Int, Long] =
    parts.groupBy(routeFor(meta, _)).flatMap { case (broker, ps) =>
      withSession(broker) { s =>
        ps.map(p => p -> s.listOffset(conf.topic, p, timestamp))
      }
    }

  private def offsetsAt(timestamp: Long): Map[Int, Long] = {
    val meta = cluster()
    offsetsAt(timestamp, partitionIds(meta), meta)
  }

  /** Resolve the configured start position per partition (the
    * spark-kafka `startingOffsets`/`startingOffsetsByTimestamp`
    * surface on the native wire):
    *
    *  - none / `earliest` → ListOffsets -2 (default)
    *  - `latest` → ListOffsets -1 (new data only)
    *  - JSON `{"0": 5, "1": -2}` → explicit per-partition offsets,
    *    -2/-1 resolving through ListOffsets; unlisted partitions start
    *    earliest
    *  - `startingTimestamp` (epoch ms) → ListOffsets with the real
    *    timestamp (first offset with ts >= t); a partition with no
    *    such message falls back to its high watermark (read only what
    *    arrives later — the `latest` strategy for missing offsets)
    */
  private def startFor(parts: Seq[Int],
      meta: KafkaClient.ClusterMeta): Map[Int, Long] =
    (conf.startingTimestamp, conf.startingOffsets) match {
      case (Some(ts), _) =>
        val byTs = offsetsAt(ts, parts, meta)
        val missing = byTs.filter(_._2 < 0L).keys.toSeq.sorted
        if (missing.nonEmpty && conf.timestampStrategy == "error")
          throw new IllegalStateException(
            s"kafka native: no offset at/after timestamp $ts for " +
              s"partitions ${missing.mkString(",")} " +
              "(startingTimestampStrategy=error)")
        val hw = if (missing.isEmpty) Map.empty[Int, Long]
          else offsetsAt(-1L, missing, meta)
        byTs.map { case (p, o) => p -> (if (o < 0) hw(p) else o) }
      case (_, None) | (_, Some("earliest")) => offsetsAt(-2L, parts, meta)
      case (_, Some("latest")) => offsetsAt(-1L, parts, meta)
      case (_, Some(json)) if json.trim.startsWith("{") =>
        val want = KafkaNativeOffset.parse(json)
        val spec = parts.map(p => p -> want.getOrElse(p, -2L)).toMap
        def resolve(sentinel: Long): Map[Int, Long] = {
          val ps = spec.filter(_._2 == sentinel).keys.toSeq.sorted
          if (ps.isEmpty) Map.empty else offsetsAt(sentinel, ps, meta)
        }
        spec ++ resolve(-2L) ++ resolve(-1L)
      case (_, Some(other)) => throw new IllegalArgumentException(
        s"kafka native: startingOffsets must be earliest|latest|{json}, " +
          s"got '$other'")
    }

  /** Snapshot: [start, latest) per partition, fixed at planning. */
  override def toBatch: Batch = new Batch {
    private val (meta, start, end) = {
      val m = cluster()
      val ps = partitionIds(m)
      (m, startFor(ps, m), offsetsAt(-1L, ps, m))
    }
    override def planInputPartitions(): Array[InputPartition] =
      KafkaNativeScan.slices(conf, meta, start, end)
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
      override def initialOffset(): Offset = {
        // first start only — an existing checkpoint always wins
        val m = cluster()
        KafkaNativeOffset(startFor(partitionIds(m), m))
      }
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException(
          "latestOffset(Offset, ReadLimit) should be called instead")
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val from = start.asInstanceOf[KafkaNativeOffset].offsets
        val hw = availableEnd.getOrElse(offsetsAt(-1L))
        // a partition that appears mid-stream starts at its EARLIEST
        // offset (offset 0 may be retention-truncated — fetching it
        // would fail loudly instead of resuming)
        val newParts = hw.keySet.diff(from.keySet).toSeq.sorted
        val earliest: Map[Int, Long] =
          if (newParts.isEmpty) Map.empty
          else {
            val m = cluster()
            offsetsAt(-2L, newParts, m)
          }
        // spread the trigger budget over partitions
        val perPart = math.max(1L, conf.maxPerTrigger / math.max(1, hw.size))
        KafkaNativeOffset(hw.map { case (p, h) =>
          p -> math.min(h,
            from.getOrElse(p, earliest.getOrElse(p, 0L)) + perPart)
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
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val from = start.asInstanceOf[KafkaNativeOffset].offsets
        val until = end.asInstanceOf[KafkaNativeOffset].offsets
        val meta = cluster()
        // a partition in `until` but absent from the checkpointed start
        // appeared mid-stream: read from its earliest retained offset
        val missing = until.keySet.diff(from.keySet).toSeq.sorted
        val filled =
          if (missing.isEmpty) from else from ++ offsetsAt(-2L, missing, meta)
        KafkaNativeScan.slices(conf, meta, filled, until)
      }
      override def createReaderFactory(): PartitionReaderFactory =
        KafkaNativeScan.readerFactory
    }
}

private[sources] object KafkaNativeScan {
  /** Per topic-partition: split [from, until) into at most
    * `numSlices` offset ranges (per-partition fetch parallelism).
    * Each planned slice carries the partition LEADER's address (from
    * the Metadata address book) next to the bootstrap broker — the
    * reader fetches from the leader and falls back to a
    * metadata-refresh-and-reroute on error 6.
    */
  def slices(conf: KafkaNativeConf, meta: KafkaClient.ClusterMeta,
      from: Map[Int, Long], until: Map[Int, Long]): Array[InputPartition] =
    until.toSeq.sortBy(_._1).flatMap { case (p, hi) =>
      val lo = from.getOrElse(p, 0L)
      val leader = meta.leaderAddr(conf.topic, p)
        .map { case (h, pt) => s"$h:$pt" }.getOrElse(conf.broker)
      if (hi <= lo) Nil
      else {
        val n = math.min(conf.numSlices.toLong, hi - lo).toInt
        val per = (hi - lo + n - 1) / n
        (0 until n).flatMap { i =>
          val a = lo + i * per
          val b = math.min(hi, a + per)
          if (a < b)
            Some(KafkaNativePartition(leader, conf, p, a, b): InputPartition)
          else None
        }
      }
    }.toArray

  val readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[KafkaNativePartition]
      new PartitionReader[InternalRow] {
        private def connect(broker: String): KafkaClient.Session =
          p.conf.openSession(broker)
        private var session = connect(p.broker)
        private var rerouted = false
        private var offset = p.from
        private var recs: Iterator[KafkaBatch.RecB] = Iterator.empty
        private var current: KafkaBatch.RecB = _

        /** Leadership moved since planning (error 6): ask the
          * bootstrap broker for fresh metadata and reconnect to the
          * new leader — once; a second move mid-slice fails loudly.
          */
        private def reroute(): Unit = {
          require(!rerouted,
            s"kafka native: ${p.topic}-${p.partition} leadership moved " +
              "twice within one slice read — giving up")
          rerouted = true
          session.close()
          val fresh = {
            val s = connect(p.bootstrap)
            try s.metadataFull(Seq(p.topic)) finally s.close()
          }
          val (h, pt) = fresh.leaderAddr(p.topic, p.partition).getOrElse(
            throw new IllegalStateException(
              s"kafka native: no leader for ${p.topic}-${p.partition} " +
                "after metadata refresh"))
          session = connect(s"$h:$pt")
        }

        override def next(): Boolean = {
          while (!recs.hasNext && offset < p.until) {
            val f = session.fetch(p.topic, p.partition, offset,
              maxWaitMs = 500,
              isolation = if (p.conf.readCommitted) 1 else 0)
            if (f.error == KafkaClient.ErrNotLeaderOrFollower) reroute()
            else {
              require(f.error == 0, s"kafka native: fetch error ${f.error}")
              if (f.batches.isEmpty) {
                // nothing at/past our offset although the planner said
                // there would be — loud, never a silent short read
                require(offset >= f.highWatermark,
                  s"kafka native: empty fetch at $offset below " +
                    s"watermark ${f.highWatermark}")
                return false
              }
              val visible =
                if (p.conf.readCommitted)
                  KafkaBatch.filterCommitted(f.batches, f.aborted).iterator
                else f.batches.iterator.flatMap(KafkaBatch.decodeBatchBytes)
              val decoded = visible
                .filter(r => r.offset >= p.from && r.offset < p.until)
              val lastBatch = f.batches.last
              val bb = java.nio.ByteBuffer.wrap(lastBatch)
              offset = bb.getLong(0) + bb.getInt(23) + 1
              recs = decoded
            }
          }
          if (recs.hasNext) { current = recs.next(); true } else false
        }

        private def payload(b: Array[Byte]): Any =
          if (b == null) null
          else if (p.binary) b
          else UTF8String.fromBytes(b)

        override def get(): InternalRow = InternalRow(
          p.partition, current.offset, current.tsMillis * 1000L,
          payload(current.key), payload(current.value))

        override def close(): Unit = session.close()
      }
    }
  }
}

private[sources] final case class KafkaNativePartition(broker: String,
    conf: KafkaNativeConf, partition: Int, from: Long, until: Long)
  extends InputPartition {
  def bootstrap: String = conf.broker
  def topic: String = conf.topic
  def binary: Boolean = conf.binary
}

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
