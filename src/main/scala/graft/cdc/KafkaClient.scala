package graft.cdc

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** Native Kafka CONSUMER session client — the broker-protocol half the
  * RecordBatch codec ([[KafkaBatch]]) sits behind. Reference:
  * dozer-ingestion/kafka/src/connector.rs (librdkafka `BaseConsumer`:
  * fetch metadata, assign partitions at offsets, poll messages;
  * stream_consumer_basic.rs maps each message value through the
  * Debezium envelope with the message offset as the resume token).
  *
  * Implemented directly on the PUBLIC Kafka wire protocol (the
  * versioned request/response binary protocol every client speaks;
  * big-endian, `size i32 | api_key i16 | api_version i16 |
  * correlation_id i32 | client_id nullable-string | body`). Pinned to
  * pre-"flexible" API versions so the frames carry no tagged fields:
  *
  *  - ApiVersions v0 (key 18) — handshake / feature probe
  *  - Metadata v1 (key 3) — topic → partitions + leaders
  *  - ListOffsets v1 (key 2) — earliest/latest partition offsets
  *  - Fetch v4 (key 1) — returns RecordBatch v2 record sets, exactly
  *    the frames [[KafkaBatch.decodeBatch]] decodes (v4 is the first
  *    fetch version serving the v2 magic, KIP-98)
  *
  * The session is driver-side by design (one socket per broker, like
  * the reference's single consumer); the record sets it returns are
  * `(seq, batch)` rows whose decode runs DISTRIBUTED through
  * [[KafkaBatch.changes]]/[[KafkaBatch.debeziumChanges]] — the fetch
  * loop moves bytes, never parses records.
  *
  * KafkaClientSpec drives the full session against a loopback mock
  * broker serving Encode-built batches (the Pg/MyReplication test
  * pattern). Security: PLAINTEXT (the reference's default
  * `security.protocol`), SSL via [[Tls]] (JSSE with truststore pinning
  * + SAN endpoint verification; loopback-tested against a
  * keytool-issued certificate), SASL/PLAIN via [[Session.saslPlain]],
  * and SASL/SCRAM-SHA-256 via [[Session.saslScram]] (KIP-152 framed
  * exchange with mutual authentication) — each SASL mechanism
  * composes with either transport (SASL_PLAINTEXT / SASL_SSL). GSSAPI
  * is out of scope (no KDC to validate against).
  */
object KafkaClient {

  final case class PartitionMeta(partition: Int, leader: Int, error: Int)
  final case class TopicMeta(name: String, error: Int,
      partitions: Seq[PartitionMeta])
  /** One row of the Metadata response's broker address book. */
  final case class BrokerMeta(nodeId: Int, host: String, port: Int)
  /** Metadata response in full: the address book + the topic list.
    * The address book is what leader ROUTING needs — each partition's
    * `leader` node id resolves through `brokers` to the host:port every
    * fetch for that partition must go to (rdkafka does this
    * transparently; dozer-ingestion/kafka/src/connector.rs relies on
    * it). Fetching from a non-leader returns error 6.
    */
  final case class ClusterMeta(brokers: Map[Int, BrokerMeta],
      topics: Seq[TopicMeta]) {
    /** host:port of `partition`'s leader, when the address book has it
      * (a leaderless partition reports -1 during election). */
    def leaderAddr(topic: String, partition: Int): Option[(String, Int)] =
      for {
        t <- topics.find(_.name == topic)
        p <- t.partitions.find(_.partition == partition)
        b <- brokers.get(p.leader)
      } yield (b.host, b.port)
  }
  final case class FetchedBatches(highWatermark: Long,
      batches: Seq[Array[Byte]], error: Int,
      /** the Fetch response's aborted-transaction list
        * (producerId, firstOffset) — what read_committed filtering
        * consumes ([[KafkaBatch.filterCommitted]]).
        */
      aborted: Seq[(Long, Long)] = Nil)

  // API keys
  val ApiFetch = 1
  val ApiListOffsets = 2
  val ApiMetadata = 3
  val ApiSaslHandshake = 17
  val ApiVersionsKey = 18
  val ApiSaslAuthenticate = 36

  /** Error codes the client routes on. */
  val ErrNotLeaderOrFollower = 6

  /** TLS plumbing for SSL / SASL_SSL listeners — the shared
    * [[graft.cdc.Tls]] JSSE helpers under the client's namespace.
    */
  object Tls {
    def socketFactory(truststorePath: String,
        password: String): javax.net.ssl.SSLSocketFactory =
      graft.cdc.Tls.socketFactory(truststorePath, password)
    def defaultFactory(): javax.net.ssl.SSLSocketFactory =
      graft.cdc.Tls.defaultFactory()
  }

  final class Session(host: String, port: Int,
      clientId: String = "graft-consumer",
      ssl: Option[javax.net.ssl.SSLSocketFactory] = None,
      soTimeoutMs: Int = 30000) extends AutoCloseable {

    private val socket: Socket = ssl match {
      case None => new Socket(host, port)
      // implicit TLS: handshake (with SAN verification) at connect,
      // so an untrusted/wrong-host cert fails with the TLS alert
      case Some(f) => graft.cdc.Tls.connect(host, port, f)
    }
    socket.setTcpNoDelay(true)
    // every request here is answered within its own bound (Fetch's
    // maxWaitMs is the longest, 500 ms) — a silent broker is a FAULT;
    // the read timeout turns a hung task into a loud SocketTimeout
    socket.setSoTimeout(soTimeoutMs)
    private val in = new DataInputStream(socket.getInputStream)
    private val out = new DataOutputStream(socket.getOutputStream)
    private var correlation = 0

    // ---------------------------------------------------------- framing

    private def send(apiKey: Int, apiVersion: Int,
        body: Writer => Unit): Int = {
      correlation += 1
      val w = new Writer
      w.i16(apiKey); w.i16(apiVersion); w.i32(correlation)
      w.str(clientId)
      body(w)
      val payload = w.result
      out.writeInt(payload.length)
      out.write(payload)
      out.flush()
      correlation
    }

    private def receive(expectCorrelation: Int): Reader = {
      val size = in.readInt()
      require(size >= 4 && size < (1 << 26), s"kafka: response size $size")
      val buf = new Array[Byte](size)
      in.readFully(buf)
      val r = new Reader(buf)
      val corr = r.i32()
      require(corr == expectCorrelation,
        s"kafka: correlation $corr != $expectCorrelation")
      r
    }

    // --------------------------------------------------------- requests

    /** SASL/PLAIN authentication (SaslHandshake v0 + the pre-KIP-152
      * raw token exchange — the wire every SASL_PLAINTEXT listener
      * accepts): negotiate the PLAIN mechanism, send the RFC 4616
      * `\0user\0password` token length-framed, expect the broker's
      * (empty) token back. Call before any other request on a
      * SASL_PLAINTEXT listener. GSSAPI/SCRAM mechanisms and TLS are
      * out of scope (no KDC/cert infrastructure to validate against).
      */
    def saslPlain(username: String, passwd: String): Unit = {
      val corr = send(ApiSaslHandshake, 0, w => w.str("PLAIN"))
      val r = receive(corr)
      val err = r.i16()
      val mechs = (0 until r.i32()).map(_ => r.str())
      require(err == 0,
        s"kafka: SaslHandshake error $err (broker mechanisms: $mechs)")
      // RFC 4616: authzid NUL authcid NUL passwd (empty authzid)
      val token = Array[Byte](0) ++ username.getBytes(UTF_8) ++
        Array[Byte](0) ++ passwd.getBytes(UTF_8)
      out.writeInt(token.length)
      out.write(token)
      out.flush()
      val respLen = in.readInt()
      require(respLen >= 0 && respLen < (1 << 20),
        s"kafka: SASL response size $respLen — authentication failed " +
          "(brokers close or garble the stream on bad credentials)")
      val resp = new Array[Byte](respLen)
      in.readFully(resp)
    }

    /** SASL/SCRAM-SHA-256 (RFC 5802/7677 over Kafka's framed SASL:
      * SaslHandshake v1 negotiates the mechanism, then every SASL
      * token rides a SaslAuthenticate request/response pair — KIP-152,
      * the exchange every secured non-TLS cluster actually runs). The
      * SCRAM math is [[PgReplication.Scram]] — the same RFC-7677-
      * vector-pinned primitives the Postgres walsender client uses —
      * with MUTUAL authentication: the server's final `v=` signature
      * is verified, so a server that does not know the password is
      * refused even if it fakes success codes. `nonceOverride` exists
      * for deterministic tests only.
      */
    def saslScram(username: String, passwd: String,
        nonceOverride: Option[String] = None): Unit = {
      val corr = send(ApiSaslHandshake, 1, w => w.str("SCRAM-SHA-256"))
      val hs = receive(corr)
      val hsErr = hs.i16()
      val mechs = (0 until hs.i32()).map(_ => hs.str())
      require(hsErr == 0,
        s"kafka: SaslHandshake error $hsErr (broker mechanisms: $mechs)")
      def authenticate(token: Array[Byte]): Array[Byte] = {
        val c = send(ApiSaslAuthenticate, 0, w => {
          w.i32(token.length); w.raw(token)
        })
        val r = receive(c)
        val err = r.i16()
        val msg = r.nstr()
        require(err == 0, s"kafka: SaslAuthenticate error $err" +
          msg.fold("")(m => s" — $m"))
        r.bytes(r.i32())
      }
      val b64 = java.util.Base64.getEncoder
      val nonce = nonceOverride.getOrElse {
        val b = new Array[Byte](18)
        new java.security.SecureRandom().nextBytes(b)
        b64.encodeToString(b)
      }
      // RFC 5802 saslname escaping for the n= attribute
      val user = username.replace("=", "=3D").replace(",", "=2C")
      val clientFirstBare = s"n=$user,r=$nonce"
      val serverFirst = new String(
        authenticate(("n,," + clientFirstBare).getBytes(UTF_8)), UTF_8)
      val attrs = serverFirst.split(",").map { a =>
        a.substring(0, 1) -> a.substring(2)
      }.toMap
      val fullNonce = attrs("r")
      // RFC 5802 MUST: the combined nonce extends the client nonce
      require(fullNonce.startsWith(nonce),
        "kafka: SCRAM server nonce does not begin with the client nonce")
      val salt = java.util.Base64.getDecoder.decode(attrs("s"))
      val salted = PgReplication.Scram.saltedPassword(
        passwd, salt, attrs("i").toInt)
      val clientFinalWoProof = s"c=biws,r=$fullNonce"
      val authMessage = s"$clientFirstBare,$serverFirst,$clientFinalWoProof"
      val proof = b64.encodeToString(
        PgReplication.Scram.clientProof(salted, authMessage))
      val serverFinal = new String(
        authenticate(s"$clientFinalWoProof,p=$proof".getBytes(UTF_8)), UTF_8)
      require(serverFinal == "v=" + b64.encodeToString(
        PgReplication.Scram.serverSignature(salted, authMessage)),
        "kafka: SCRAM server signature mismatch — the server does not " +
          "know the password (possible MITM); aborting")
    }

    /** ApiVersions v0 → map of api_key → (min, max). */
    def apiVersions(): Map[Int, (Int, Int)] = {
      val corr = send(ApiVersionsKey, 0, _ => ())
      val r = receive(corr)
      val err = r.i16()
      require(err == 0, s"kafka: ApiVersions error $err")
      (0 until r.i32()).map { _ =>
        (r.i16(), (r.i16(), r.i16()))
      }.toMap
    }

    /** Metadata v1 for `topics` (Nil = all) — topic list only; use
      * [[metadataFull]] when the broker address book matters (it does
      * for any multi-broker fetch plan).
      */
    def metadata(topics: Seq[String]): Seq[TopicMeta] =
      metadataFull(topics).topics

    /** Metadata v1 for `topics` (Nil = all), keeping the broker
      * address book the response leads with — `leader` ids in the
      * partition rows are node ids INTO that book.
      */
    def metadataFull(topics: Seq[String]): ClusterMeta = {
      val corr = send(ApiMetadata, 1, w => {
        w.i32(topics.length)
        topics.foreach(w.str)
      })
      val r = receive(corr)
      val brokers = (0 until r.i32()).map { _ =>
        val node = r.i32(); val host = r.str(); val port = r.i32()
        r.nstr() // rack
        node -> BrokerMeta(node, host, port)
      }.toMap
      r.i32() // controller_id
      val ts = (0 until r.i32()).map { _ =>
        val err = r.i16()
        val name = r.str()
        r.bool() // is_internal
        val parts = (0 until r.i32()).map { _ =>
          val perr = r.i16()
          val pid = r.i32()
          val leader = r.i32()
          (0 until r.i32()).foreach(_ => r.i32()) // replicas
          (0 until r.i32()).foreach(_ => r.i32()) // isr
          PartitionMeta(pid, leader, perr)
        }
        TopicMeta(name, err, parts)
      }
      ClusterMeta(brokers, ts)
    }

    /** ListOffsets v1: timestamp -1 = latest, -2 = earliest. */
    def listOffset(topic: String, partition: Int, timestamp: Long): Long = {
      val corr = send(ApiListOffsets, 1, w => {
        w.i32(-1) // replica_id (consumer)
        w.i32(1); w.str(topic)
        w.i32(1); w.i32(partition); w.i64(timestamp)
      })
      val r = receive(corr)
      require(r.i32() == 1, "kafka: ListOffsets topic count")
      r.str()
      require(r.i32() == 1, "kafka: ListOffsets partition count")
      r.i32() // partition
      val err = r.i16()
      require(err == 0, s"kafka: ListOffsets error $err")
      r.i64() // timestamp
      r.i64() // offset
    }

    /** Fetch v4: one topic-partition from `offset`; returns the RAW
      * RecordBatch v2 frames (split on batchLength — the response's
      * record set may end with a truncated batch, which brokers send
      * and clients must drop).
      */
    def fetch(topic: String, partition: Int, offset: Long,
        maxWaitMs: Int = 500, minBytes: Int = 1,
        maxBytes: Int = 8 * 1024 * 1024,
        isolation: Int = 0): FetchedBatches = {
      val corr = send(ApiFetch, 4, w => {
        w.i32(-1)        // replica_id
        w.i32(maxWaitMs)
        w.i32(minBytes)
        w.i32(maxBytes)
        w.i8(isolation)  // 0 = READ_UNCOMMITTED, 1 = READ_COMMITTED
        w.i32(1); w.str(topic)
        w.i32(1); w.i32(partition); w.i64(offset); w.i32(maxBytes)
      })
      val r = receive(corr)
      r.i32() // throttle_time_ms
      require(r.i32() == 1, "kafka: Fetch topic count")
      r.str()
      require(r.i32() == 1, "kafka: Fetch partition count")
      r.i32() // partition
      val err = r.i16()
      val highWatermark = r.i64()
      r.i64() // last_stable_offset
      val nAborted = r.i32()
      val aborted = (0 until math.max(nAborted, 0)).map { _ =>
        (r.i64(), r.i64()) // producer_id, first_offset
      }
      val setSize = r.i32()
      val recordSet = r.bytes(setSize)
      FetchedBatches(highWatermark, splitBatches(recordSet), err, aborted)
    }

    /** Poll [fromOffset, highWatermark) to exhaustion — the snapshot
      * read a bounded replay needs. Returns (nextOffset, batches).
      */
    def fetchAll(topic: String, partition: Int, fromOffset: Long,
        maxFetches: Int = 10000): (Long, Seq[Array[Byte]]) = {
      val outB = mutable.ArrayBuffer.empty[Array[Byte]]
      var off = fromOffset
      var rounds = 0
      var done = false
      while (!done) {
        rounds += 1
        require(rounds <= maxFetches, s"kafka: $maxFetches fetches exhausted")
        val f = fetch(topic, partition, off, maxWaitMs = 100)
        require(f.error == 0, s"kafka: Fetch error ${f.error}")
        if (f.batches.isEmpty) done = true
        else {
          outB ++= f.batches
          val last = f.batches.last
          // next offset = baseOffset + lastOffsetDelta + 1
          val bb = ByteBuffer.wrap(last)
          val baseOffset = bb.getLong(0)
          val lastOffsetDelta = bb.getInt(23)
          off = baseOffset + lastOffsetDelta + 1
          if (off >= f.highWatermark) done = true
        }
      }
      (off, outB.toSeq)
    }

    /** [[fetchAll]] under READ_COMMITTED: same bounded poll with
      * isolation level 1, aborted-transaction lists aggregated, and
      * the records filtered through [[KafkaBatch.filterCommitted]].
      */
    def fetchAllCommitted(topic: String, partition: Int, fromOffset: Long,
        maxFetches: Int = 10000): (Long, Seq[KafkaBatch.RecB]) = {
      val outB = mutable.ArrayBuffer.empty[Array[Byte]]
      val outA = mutable.ArrayBuffer.empty[(Long, Long)]
      var off = fromOffset
      var rounds = 0
      var done = false
      while (!done) {
        rounds += 1
        require(rounds <= maxFetches, s"kafka: $maxFetches fetches exhausted")
        val f = fetch(topic, partition, off, maxWaitMs = 100, isolation = 1)
        require(f.error == 0, s"kafka: Fetch error ${f.error}")
        if (f.batches.isEmpty) done = true
        else {
          outB ++= f.batches
          outA ++= f.aborted
          val last = f.batches.last
          val bb = ByteBuffer.wrap(last)
          off = bb.getLong(0) + bb.getInt(23) + 1
          if (off >= f.highWatermark) done = true
        }
      }
      (off, KafkaBatch.filterCommitted(outB.toSeq, outA.toSeq))
    }

    override def close(): Unit = socket.close()
  }

  /** Split a fetch record set into whole RecordBatch v2 frames,
    * dropping a trailing truncated batch (normal broker behavior).
    */
  def splitBatches(recordSet: Array[Byte]): Seq[Array[Byte]] = {
    val outB = mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (recordSet.length - pos >= 12) {
      val batchLength = ByteBuffer.wrap(recordSet, pos + 8, 4).getInt
      val total = 12 + batchLength
      if (recordSet.length - pos < total) return outB.toSeq // truncated tail
      outB += java.util.Arrays.copyOfRange(recordSet, pos, pos + total)
      pos += total
    }
    outB.toSeq
  }

  // ------------------------------------------------------- wire helpers

  final class Writer {
    private val bos = new ByteArrayOutputStream()
    private val d = new DataOutputStream(bos)
    def i8(v: Int): Unit = d.writeByte(v)
    def i16(v: Int): Unit = d.writeShort(v)
    def i32(v: Int): Unit = d.writeInt(v)
    def i64(v: Long): Unit = d.writeLong(v)
    def bool(v: Boolean): Unit = d.writeByte(if (v) 1 else 0)
    def str(s: String): Unit = {
      val b = s.getBytes(UTF_8)
      d.writeShort(b.length)
      d.write(b)
    }
    def nstr(s: Option[String]): Unit = s match {
      case None => d.writeShort(-1)
      case Some(v) => str(v)
    }
    def raw(b: Array[Byte]): Unit = d.write(b)
    def result: Array[Byte] = { d.flush(); bos.toByteArray }
  }

  final class Reader(buf: Array[Byte]) {
    var pos = 0
    def i8(): Int = { val v = buf(pos); pos += 1; v.toInt }
    def i16(): Int = { val v = ByteBuffer.wrap(buf, pos, 2).getShort.toInt; pos += 2; v }
    def i32(): Int = { val v = ByteBuffer.wrap(buf, pos, 4).getInt; pos += 4; v }
    def i64(): Long = { val v = ByteBuffer.wrap(buf, pos, 8).getLong; pos += 8; v }
    def bool(): Boolean = i8() != 0
    def str(): String = {
      val n = i16()
      require(n >= 0, "kafka: null string where non-null expected")
      val s = new String(buf, pos, n, UTF_8); pos += n; s
    }
    def nstr(): Option[String] = {
      val n = i16()
      if (n < 0) None
      else { val s = new String(buf, pos, n, UTF_8); pos += n; Some(s) }
    }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= buf.length, s"kafka: truncated ($n at $pos)")
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
  }
}
