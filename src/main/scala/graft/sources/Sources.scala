package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source connectors (SURVEY §2.1). Dozer's `Connector` trait does
  * snapshot-then-CDC per table (dozer-ingestion/connector/src/lib.rs:
  * 55-112); on Spark the same contract is `spark.read` (snapshot) and
  * `spark.readStream` (continuous) over the same location, with
  * checkpointing standing in for `OpIdentifier` resume tokens.
  *
  * Kafka/Debezium and JDBC-CDC connectors are config-level additions
  * (format("kafka") etc.) — the object-store connectors (parquet/CSV,
  * dozer-ingestion/object-store) and push sources are covered here.
  */
object Sources {

  /** Batch snapshot of a parquet/csv/json table directory. */
  def snapshot(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format).options(options).load(path)

  /** File stream: picks up new files in `path` — the object-store
    * connector's tailing mode. Schema must be supplied (streaming
    * sources cannot infer).
    */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet", maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream.format(format)
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)

  /** Rate source for load testing (the gRPC push-source stand-in). */
  def rate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()

  /** PUSH channel, change-stream phase: a real DataSource V2
    * micro-batch source over the named in-process ingest channel
    * ([[PushBuffer]]) — the dozer gRPC ingest analogue
    * (dozer-ingestion/grpc/src/adapter/). Rows: (seq, ts, value JSON).
    */
  def push(spark: SparkSession, channel: String): DataFrame =
    spark.readStream.format("graft.sources.PushSource")
      .option("channel", channel).load()

  /** PUSH channel, snapshot phase: batch read of everything pushed so
    * far — the connector's SnapshottingStarted/Done contract
    * (dozer-types/src/models/ingestion_types.rs:41-45).
    */
  def pushSnapshot(spark: SparkSession, channel: String): DataFrame =
    spark.read.format("graft.sources.PushSource")
      .option("channel", channel).load()

  /** A CDC file stream: change-log rows with _op/_seq columns (see
    * graft.cdc.ChangeModel) arriving as files — the Debezium-topic
    * shape without a broker.
    */
  def cdcFileStream(spark: SparkSession, path: String, schema: StructType)
      : DataFrame = {
    require(schema.fieldNames.contains(graft.cdc.ChangeModel.OpCol) &&
      schema.fieldNames.contains(graft.cdc.ChangeModel.SeqCol),
      s"CDC stream schema needs ${graft.cdc.ChangeModel.OpCol}/${graft.cdc.ChangeModel.SeqCol}")
    fileStream(spark, path, schema)
  }

  /** Decode a Debezium JSON envelope column (a Kafka `value`, a change
    * file's lines) into graft change rows — the log-based CDC decode
    * dozer does natively against Postgres WAL / MySQL binlog
    * (dozer-ingestion/postgres/src/replicator.rs). Delegates to
    * [[graft.cdc.Debezium.decode]]; see there for envelope shapes and
    * `_seq` derivation.
    */
  def debeziumJson(raw: DataFrame, valueCol: String, rowSchema: StructType)
      : DataFrame =
    graft.cdc.Debezium.decode(raw, valueCol, rowSchema)

  /** Streaming Debezium decode over newline-delimited JSON change
    * files in `path` — the file-based stand-in for a Debezium Kafka
    * topic (same envelope, no broker). Composes [[fileStream]] (text)
    * with the decoder; batch equivalent: `spark.read.text` +
    * [[debeziumJson]].
    */
  def debeziumFileStream(spark: SparkSession, path: String,
      rowSchema: StructType, maxFilesPerTrigger: Int = 16): DataFrame =
    graft.cdc.Debezium.decode(
      fileStream(spark, path,
        StructType(Seq(org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))),
        format = "text", maxFilesPerTrigger = maxFilesPerTrigger),
      "value", rowSchema)

  /** Micro-batch stream of `eth_getLogs` JSON objects from newline
    * files in `path` — the file-based stand-in for a web3 subscription
    * bridge (same wire format, no client). Composes [[fileStream]]
    * (text) with [[graft.cdc.EthLogs.decode]]; pair with
    * `EthLogs.asChanges` + `ChangeModel.applyChanges` for
    * reorg-correct materialized state.
    */
  def ethLogFileStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    graft.cdc.EthLogs.decode(
      fileStream(spark, path,
        StructType(Seq(org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))),
        format = "text", maxFilesPerTrigger = maxFilesPerTrigger),
      "value")

  /** Micro-batch stream of Kafka records from dumped SEGMENT files
    * (the on-disk log format — concatenated RecordBatch v2) under
    * `path`: Spark's `binaryFile` source reads whole segments, the
    * native codec splits and decodes them map-only. The broker-less
    * path for the reference's Kafka connector content (values are
    * typically Debezium envelopes — compose with
    * [[graft.cdc.KafkaBatch.debeziumChanges]]' decode step or
    * `Debezium.decode` on the `value` column).
    */
  def kafkaSegmentStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    // binaryFile's schema is fixed by the format, but the STREAMING
    // source requires it stated explicitly
    val binaryFileSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    graft.cdc.KafkaBatch.recordsFromSegments(
      spark.readStream.format("binaryFile")
        .schema(binaryFileSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
        .option("pathGlobFilter", "*.log")
        .load(path))
  }

  /** Batch twin of [[kafkaSegmentStream]]. */
  def kafkaSegmentSnapshot(spark: SparkSession, path: String): DataFrame =
    graft.cdc.KafkaBatch.recordsFromSegments(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.log").load(path))

  /** LIVE Kafka tail via the NATIVE consumer session client
    * ([[graft.cdc.KafkaClient]] — no librdkafka, no connector jar): a
    * driver poller thread fetches RecordBatch v2 frames from the
    * broker and lands each batch (base64) on a bounded push channel,
    * so the feed gets both [[PushSource]] scan paths and the
    * backpressure contract (a full channel blocks the poller, which
    * simply stops fetching — Kafka's pull model needs nothing else).
    * One poller per topic-partition, like the reference's consumer
    * (connector.rs); the DATA decode runs distributed via
    * [[kafkaLiveRecords]].
    */
  def kafkaLiveStart(host: String, port: Int, topic: String,
      partition: Int, channel: String, fromEarliest: Boolean = true,
      pollMs: Long = 200L, fromOffset: Option[Long] = None): KafkaLiveHandle = {
    val session = new graft.cdc.KafkaClient.Session(host, port)
    val start = fromOffset.getOrElse(session.listOffset(topic, partition,
      if (fromEarliest) -2L else -1L))
    val handle = new KafkaLiveHandle(session)
    val t = new Thread(() => {
      var offset = start
      try {
        while (handle.running) {
          val f = session.fetch(topic, partition, offset,
            maxWaitMs = pollMs.toInt)
          require(f.error == 0, s"kafka live: fetch error ${f.error}")
          if (f.batches.isEmpty) Thread.sleep(pollMs)
          else {
            f.batches.foreach { b =>
              // blocking push = backpressure: a full channel pauses
              // the poll loop until the consumer commits
              PushBuffer.push(channel,
                java.util.Base64.getEncoder.encodeToString(b))
              val bb = java.nio.ByteBuffer.wrap(b)
              offset = bb.getLong(0) + bb.getInt(23) + 1
            }
          }
        }
      } catch {
        case _: InterruptedException => ()
        case e: Exception => handle.failure = e
      }
    }, s"graft-kafka-live-$topic-$partition")
    t.setDaemon(true)
    handle.thread = t
    t.start()
    handle
  }

  final class KafkaLiveHandle private[sources] (
      session: graft.cdc.KafkaClient.Session) {
    @volatile private[sources] var running = true
    @volatile var failure: Exception = null
    private[sources] var thread: Thread = null
    def stop(): Unit = {
      running = false
      if (thread != null) { thread.interrupt(); thread.join(5000) }
      session.close()
      if (failure != null) throw failure
    }
  }

  /** One-shot bounded DRAIN of a topic-partition onto a push channel —
    * the batch-snapshot phase of a config-declared Kafka source
    * (`dozer run` in batch mode). Per-channel bookkeeping makes
    * repeated calls INCREMENTAL (only batches past the last drained
    * offset are pushed), so plan-time schema derivation, `build`, and
    * the actual run can each touch the source without duplicating
    * data. Returns the next offset (where a streaming poller should
    * resume — pass it to [[kafkaLiveStart]]'s `fromOffset`).
    */
  def kafkaDrainOnce(broker: String, topic: String, partition: Int,
      channel: String): Long = KafkaDrainState.synchronized {
    val (host, port) = splitBroker(broker)
    val key = s"$channel|$topic|$partition"
    val from = KafkaDrainState.next.getOrElse(key, 0L)
    val session = new graft.cdc.KafkaClient.Session(host, port)
    try {
      val start =
        if (KafkaDrainState.next.contains(key)) from
        else session.listOffset(topic, partition, -2L)
      val (next, batches) = session.fetchAll(topic, partition, start)
      batches.foreach(b => PushBuffer.push(channel,
        java.util.Base64.getEncoder.encodeToString(b)))
      KafkaDrainState.next(key) = next
      next
    } finally session.close()
  }

  private object KafkaDrainState {
    val next = scala.collection.mutable.Map.empty[String, Long]
  }

  def splitBroker(broker: String): (String, Int) = {
    val i = broker.lastIndexOf(':')
    require(i > 0, s"kafka broker must be host:port, got '$broker'")
    (broker.substring(0, i), broker.substring(i + 1).toInt)
  }

  /** Decode a [[kafkaLiveStart]] push feed (base64 batch per event)
    * into Kafka records — map-only, batch and streaming alike; the
    * channel seq orders batches, the Kafka offset inside each batch is
    * the record `_seq`.
    */
  def kafkaLiveRecords(feed: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.cdc.KafkaBatch.records(
      feed.select(col("seq"), unbase64(col("value")).as("frame")))
  }

  /** Reader options for dozer's Kafka connector config
    * (dozer-ingestion/kafka: broker url + topic [+ schema registry]),
    * mapped onto Spark's kafka source. Pure config mapping — the
    * spark-sql-kafka connector jar provides the actual source on a
    * deployment; it is not shipped in this environment, so this stays
    * the documented bridge (SURVEY §2.1):
    * {{{
    * spark.readStream.format("kafka")
    *   .options(Sources.kafkaOptions(broker, topic)).load()
    * }}}
    */
  def kafkaOptions(brokerUrl: String, topic: String,
      startFromEarliest: Boolean = true,
      tls: Boolean = false, truststore: Option[String] = None,
      truststorePassword: String = "",
      saslMechanism: Option[String] = None, saslUsername: String = "",
      saslPassword: String = ""): Map[String, String] = {
    val security = (tls, saslMechanism.isDefined) match {
      case (false, false) => Map.empty[String, String]
      case (t, s) => Map("kafka.security.protocol" -> ((t, s) match {
        case (true, true) => "SASL_SSL"
        case (true, false) => "SSL"
        case _ => "SASL_PLAINTEXT"
      }))
    }
    val ssl = truststore.toSeq.flatMap(path => Seq(
      "kafka.ssl.truststore.location" -> path,
      "kafka.ssl.truststore.password" -> truststorePassword))
    val sasl = saslMechanism.toSeq.flatMap { m =>
      val mech = m.toUpperCase match {
        case "PLAIN" => "PLAIN"
        case "SCRAM-SHA-256" => "SCRAM-SHA-256"
        case other => other
      }
      val module =
        if (mech == "PLAIN") "org.apache.kafka.common.security.plain.PlainLoginModule"
        else "org.apache.kafka.common.security.scram.ScramLoginModule"
      Seq("kafka.sasl.mechanism" -> mech,
        "kafka.sasl.jaas.config" ->
          (s"""$module required username="$saslUsername" """ +
            s"""password="$saslPassword";"""))
    }
    Map(
      "kafka.bootstrap.servers" -> brokerUrl,
      "subscribe" -> topic,
      "startingOffsets" -> (if (startFromEarliest) "earliest" else "latest"),
      // resume/exactly-once comes from the query's checkpointLocation,
      // not Kafka group offsets (the OpIdentifier analogue)
      "failOnDataLoss" -> "true") ++ security ++ ssl ++ sasl
  }

  /** Reader config for JDBC snapshot loads (dozer's Postgres/MySQL
    * connectors' snapshot phase; their log-based CDC phase has no
    * vanilla-Spark equivalent — the documented mapping is
    * Debezium-to-topic into [[kafkaOptions]] or change files into
    * [[cdcFileStream]]). `partitionColumn` bounds give Spark the
    * parallel-scan split the reference gets from table chunking.
    */
  def jdbcOptions(url: String, table: String, user: String, password: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None): Map[String, String] = {
    val base = Map(
      "url" -> url, "dbtable" -> table,
      "user" -> user, "password" -> password)
    partitionColumn match {
      case Some((col, lower, upper, n)) => base ++ Map(
        "partitionColumn" -> col,
        "lowerBound" -> lower.toString,
        "upperBound" -> upper.toString,
        "numPartitions" -> n.toString)
      case None => base
    }
  }

  /** Reader options for dozer's Snowflake connector config
    * (`SnowflakeConfig`, ingestion_types.rs:196-211: server/port/user/
    * password/database/schema/warehouse [+ driver]) mapped onto the
    * Snowflake JDBC driver through Spark's generic JDBC source — the
    * reference's batch/table-stream read is a JDBC snapshot in Spark
    * terms. Pure config mapping (SURVEY §2.1): the snowflake-jdbc jar
    * supplies the driver on a deployment.
    * {{{
    * spark.read.format("jdbc")
    *   .options(Sources.snowflakeOptions(...)).load()
    * }}}
    */
  def snowflakeOptions(server: String, port: String, user: String,
      password: String, database: String, schema: String, warehouse: String,
      table: String, driver: Option[String] = None): Map[String, String] =
    Map(
      "url" -> (s"jdbc:snowflake://$server:$port/?db=$database" +
        s"&schema=$schema&warehouse=$warehouse"),
      "dbtable" -> table,
      "user" -> user, "password" -> password,
      "driver" -> driver.getOrElse(
        "net.snowflake.client.jdbc.SnowflakeDriver"))

  /** Reader options for dozer's MongoDB connector config
    * (`MongodbConfig`, ingestion_types.rs:399-401: a connection
    * string) mapped onto the mongo-spark connector — the snapshot
    * phase is `format("mongodb")` batch read; the change-stream phase
    * is the same format via `readStream` (connector-managed resume
    * tokens play the OpIdentifier role). Pure config mapping (SURVEY
    * §2.1): the mongo-spark-connector jar supplies the source on a
    * deployment.
    */
  def mongodbOptions(connectionString: String, database: String,
      collection: String): Map[String, String] =
    Map(
      "connection.uri" -> connectionString,
      "database" -> database,
      "collection" -> collection)

  /** Option bridge for dozer's Ethereum log connector config
    * (`EthConfig`/`EthLogConfig`/`EthFilter`, ingestion_types.rs:99-134:
    * wss_url + optional from/to-block and address/topic filters). The
    * wire format — `eth_getLogs` JSON log objects — is decoded by
    * [[graft.cdc.EthLogs]]; this mapping carries the subscription
    * parameters to whatever transport delivers them (a web3 bridge
    * publishing to Kafka, a file drop, a webhook push). Pure config
    * mapping, SURVEY §2.1.
    */
  def ethereumOptions(wssUrl: String, fromBlock: Option[Long] = None,
      toBlock: Option[Long] = None, addresses: Seq[String] = Nil,
      topics: Seq[String] = Nil): Map[String, String] =
    Map("wss_url" -> wssUrl) ++
      fromBlock.map(b => "from_block" -> b.toString) ++
      toBlock.map(b => "to_block" -> b.toString) ++
      (if (addresses.nonEmpty) Map("addresses" -> addresses.mkString(","))
       else Map.empty) ++
      (if (topics.nonEmpty) Map("topics" -> topics.mkString(","))
       else Map.empty)
}
