package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cdc.{KafkaBatch, KafkaClient}

/** Kafka consumer-session tests against a loopback mock broker
  * speaking the documented wire protocol (ApiVersions v0, Metadata v1,
  * ListOffsets v1, Fetch v4), serving RecordBatch v2 frames built by
  * [[KafkaBatch.Encode]] — session transport and batch codec compose
  * end to end with no live broker (the Pg/MyReplication test pattern).
  */
class KafkaClientSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Mock broker: one topic/partition, a fixed batch log, serves at
    * most `batchesPerFetch` whole batches per Fetch (+ an optional
    * truncated tail — brokers cut record sets at max_bytes mid-batch
    * and clients must drop the partial frame).
    */
  private final class MockBroker(topic: String, log0: Seq[Array[Byte]],
      batchesPerFetch: Int = 2, truncatedTail: Boolean = false) {
    private val logBuf =
      new java.util.concurrent.CopyOnWriteArrayList[Array[Byte]]()
    log0.foreach(logBuf.add)
    private def log: Seq[Array[Byte]] = {
      import scala.jdk.CollectionConverters._
      logBuf.asScala.toSeq
    }
    def append(b: Array[Byte]): Unit = { logBuf.add(b); () }
    val fetchOffsets = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    private val server = new ServerSocket(0)
    def port: Int = server.getLocalPort

    private def baseOffset(b: Array[Byte]): Long =
      java.nio.ByteBuffer.wrap(b, 0, 8).getLong
    private def lastOffset(b: Array[Byte]): Long =
      baseOffset(b) + java.nio.ByteBuffer.wrap(b, 23, 4).getInt
    private def highWatermark: Long =
      if (log.isEmpty) 0L else lastOffset(log.last) + 1

    val thread = new Thread(() => {
      try {
        val sock = server.accept()
        sock.setTcpNoDelay(true)
        val in = new DataInputStream(sock.getInputStream)
        val out = new DataOutputStream(sock.getOutputStream)
        var open = true
        while (open) {
          val size = try in.readInt() catch { case _: Exception => open = false; 0 }
          if (open) {
            val req = new Array[Byte](size)
            in.readFully(req)
            val r = new KafkaClient.Reader(req)
            val apiKey = r.i16(); val apiVersion = r.i16()
            val corr = r.i32(); r.nstr() // client_id
            val w = new KafkaClient.Writer
            w.i32(corr)
            apiKey match {
              case KafkaClient.ApiVersionsKey =>
                assert(apiVersion == 0)
                w.i16(0) // error
                w.i32(3)
                Seq((1, 0, 12), (2, 0, 7), (3, 0, 12)).foreach { case (k, lo, hi) =>
                  w.i16(k); w.i16(lo); w.i16(hi)
                }
              case KafkaClient.ApiMetadata =>
                assert(apiVersion == 1)
                w.i32(1) // one broker
                w.i32(0); w.str("127.0.0.1"); w.i32(port); w.nstr(None)
                w.i32(0) // controller
                w.i32(1) // one topic
                w.i16(0); w.str(topic); w.bool(false)
                w.i32(1) // one partition
                w.i16(0); w.i32(0); w.i32(0)
                w.i32(1); w.i32(0) // replicas
                w.i32(1); w.i32(0) // isr
              case KafkaClient.ApiListOffsets =>
                assert(apiVersion == 1)
                // request: replica_id, topics[1]{name, parts[1]{pid, ts}}
                r.i32(); r.i32(); r.str(); r.i32(); r.i32()
                val ts = r.i64()
                val off = if (ts == -2L) 0L else highWatermark
                w.i32(1); w.str(topic)
                w.i32(1); w.i32(0); w.i16(0); w.i64(-1L); w.i64(off)
              case KafkaClient.ApiFetch =>
                assert(apiVersion == 4)
                r.i32(); r.i32(); r.i32(); r.i32(); r.i8() // replica..isolation
                r.i32(); r.str(); r.i32(); r.i32()
                val wanted = r.i64()
                fetchOffsets.add(wanted)
                val serve = log.filter(b => lastOffset(b) >= wanted)
                  .take(batchesPerFetch)
                val set = new KafkaClient.Writer
                serve.foreach(b => set.raw(b))
                if (truncatedTail && serve.nonEmpty)
                  set.raw(log.head.take(17)) // partial frame past max_bytes
                val setBytes = set.result
                w.i32(0) // throttle
                w.i32(1); w.str(topic)
                w.i32(1); w.i32(0); w.i16(0)
                w.i64(highWatermark); w.i64(highWatermark)
                w.i32(0) // no aborted txns
                w.i32(setBytes.length); w.raw(setBytes)
              case other => fail(s"mock broker: unexpected api $other")
            }
            val resp = w.result
            out.writeInt(resp.length)
            out.write(resp)
            out.flush()
          }
        }
      } catch { case _: Exception => () }
    })
    thread.setDaemon(true)
    thread.start()
    def close(): Unit = server.close()
  }

  private def mkBatch(base: Long, recs: Seq[(String, String)]): Array[Byte] =
    KafkaBatch.Encode.batch(base, 1700000000000L + base,
      recs.map { case (k, v) => (1700000000000L + base, k, v) })

  test("session handshake, metadata, earliest/latest offsets, and a " +
      "multi-round fetch drain the full log") {
    val log = Seq(
      mkBatch(0L, Seq(("a", "va"), ("b", "vb"))),
      mkBatch(2L, Seq(("c", "vc"))),
      mkBatch(3L, Seq(("d", "vd"), ("e", "ve"), ("f", null))))
    val broker = new MockBroker("orders_cdc", log, batchesPerFetch = 1)
    val sess = new KafkaClient.Session("127.0.0.1", broker.port)
    try {
      val versions = sess.apiVersions()
      assert(versions(KafkaClient.ApiFetch)._2 >= 4)

      val meta = sess.metadata(Seq("orders_cdc"))
      assert(meta == Seq(KafkaClient.TopicMeta("orders_cdc", 0,
        Seq(KafkaClient.PartitionMeta(0, 0, 0)))))

      assert(sess.listOffset("orders_cdc", 0, -2L) == 0L)
      assert(sess.listOffset("orders_cdc", 0, -1L) == 6L)

      val (next, batches) = sess.fetchAll("orders_cdc", 0, 0L)
      assert(next == 6L)
      assert(batches.length == 3)
      // one fetch per batch (batchesPerFetch = 1) from advancing offsets
      assert(broker.fetchOffsets.toArray.toSeq == Seq(0L, 2L, 3L))

      // decode DISTRIBUTED through the batch codec
      import spark.implicits._
      val df = batches.zipWithIndex
        .map { case (b, i) => (i.toLong, b) }.toDF("seq", "frame")
      val recs = KafkaBatch.records(df).orderBy("_seq").collect()
      assert(recs.map(_.getAs[Long]("_seq")).toSeq == (0L to 5L))
      assert(recs.map(_.getAs[String]("key")).toSeq ==
        Seq("a", "b", "c", "d", "e", "f"))
      assert(recs.last.getAs[String]("value") == null) // tombstone survives
    } finally { sess.close(); broker.close() }
  }

  test("a truncated trailing frame in the record set is dropped " +
      "(split on batchLength), and the drain still completes") {
    val log = Seq(
      mkBatch(0L, Seq(("k0", "v0"))),
      mkBatch(1L, Seq(("k1", "v1"))))
    val broker = new MockBroker("t", log, batchesPerFetch = 1,
      truncatedTail = true)
    val sess = new KafkaClient.Session("127.0.0.1", broker.port)
    try {
      val (next, batches) = sess.fetchAll("t", 0, 0L)
      assert(next == 2L && batches.length == 2)
      assert(batches.flatMap(KafkaBatch.decodeBatch)
        .map(_.key) == Seq("k0", "k1"))
    } finally { sess.close(); broker.close() }
  }

  test("splitBatches carves whole frames and rejects nothing silently " +
      "when the set is aligned") {
    val b0 = mkBatch(0L, Seq(("a", "1")))
    val b1 = mkBatch(1L, Seq(("b", "2")))
    val set = b0 ++ b1
    val split = KafkaClient.splitBatches(set)
    assert(split.length == 2)
    assert(split(0).toSeq == b0.toSeq && split(1).toSeq == b1.toSeq)
    assert(KafkaClient.splitBatches(set ++ b0.take(20)).length == 2)
  }

  test("SASL/PLAIN: handshake negotiates the mechanism, the RFC 4616 " +
      "token authenticates, wrong credentials are refused") {
    // minimal SASL_PLAINTEXT mock: SaslHandshake v0 then the raw
    // token exchange, gating the normal request loop behind auth
    val server = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          val in = new java.io.DataInputStream(sock.getInputStream)
          val out = new java.io.DataOutputStream(sock.getOutputStream)
          // SaslHandshake request
          val sz = in.readInt(); val req = new Array[Byte](sz); in.readFully(req)
          val r = new KafkaClient.Reader(req)
          assert(r.i16() == KafkaClient.ApiSaslHandshake && r.i16() == 0)
          val corr = r.i32(); r.nstr()
          val mech = r.str()
          val w = new KafkaClient.Writer
          w.i32(corr)
          if (mech != "PLAIN") { w.i16(33); w.i32(1); w.str("PLAIN") }
          else { w.i16(0); w.i32(1); w.str("PLAIN") }
          val resp = w.result
          out.writeInt(resp.length); out.write(resp); out.flush()
          if (mech == "PLAIN") {
            val tl = in.readInt(); val tok = new Array[Byte](tl); in.readFully(tok)
            val parts = new String(tok, "UTF-8").split('\u0000')
            // token = "", user, pass
            if (parts.length == 3 && parts(1) == "bob" && parts(2) == "pw") {
              out.writeInt(0); out.flush() // empty broker token = success
              // serve one ApiVersions to prove the session continues
              val sz2 = in.readInt(); val req2 = new Array[Byte](sz2)
              in.readFully(req2)
              val r2 = new KafkaClient.Reader(req2)
              r2.i16(); r2.i16()
              val corr2 = r2.i32()
              val w2 = new KafkaClient.Writer
              w2.i32(corr2); w2.i16(0); w2.i32(1)
              w2.i16(1); w2.i16(0); w2.i16(12)
              val resp2 = w2.result
              out.writeInt(resp2.length); out.write(resp2); out.flush()
            } else sock.close() // brokers drop the connection on bad creds
          }
          if (!sock.isClosed) () // keep for the session to close
        }
      } catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start()
    try {
      val good = new KafkaClient.Session("127.0.0.1", server.getLocalPort)
      try {
        good.saslPlain("bob", "pw")
        assert(good.apiVersions().contains(KafkaClient.ApiFetch))
      } finally good.close()

      val bad = new KafkaClient.Session("127.0.0.1", server.getLocalPort)
      try {
        intercept[Exception] { bad.saslPlain("bob", "WRONG") }
      } finally bad.close()
    } finally server.close()
  }

  test("SASL/SCRAM-SHA-256: framed handshake + mutual auth succeed, " +
      "and the session continues with normal requests") {
    val cluster = new TestKafkaCluster("tscram",
      scramUser = Some(("alice", "s3cr3t")))
    val sess = new KafkaClient.Session("127.0.0.1", cluster.port(0))
    try {
      sess.saslScram("alice", "s3cr3t", Some("cnonceFixed01"))
      // post-auth: the request loop keeps working
      assert(sess.apiVersions().contains(KafkaClient.ApiFetch))
    } finally { sess.close(); cluster.close() }
  }

  test("SASL/SCRAM-SHA-256: a wrong password is refused with " +
      "SASL_AUTHENTICATION_FAILED (error 58)") {
    val cluster = new TestKafkaCluster("tscram2",
      scramUser = Some(("alice", "s3cr3t")))
    val sess = new KafkaClient.Session("127.0.0.1", cluster.port(0))
    try {
      val e = intercept[IllegalArgumentException] {
        sess.saslScram("alice", "WRONG", Some("cnonceFixed02"))
      }
      assert(e.getMessage.contains("58"))
    } finally { sess.close(); cluster.close() }
  }

  test("SASL/SCRAM-SHA-256: a server that fakes success without " +
      "knowing the password fails the client's server-signature check") {
    val cluster = new TestKafkaCluster("tscram3",
      scramUser = Some(("alice", "s3cr3t")), tamperScramSig = true)
    val sess = new KafkaClient.Session("127.0.0.1", cluster.port(0))
    try {
      val e = intercept[IllegalArgumentException] {
        sess.saslScram("alice", "s3cr3t", Some("cnonceFixed03"))
      }
      assert(e.getMessage.contains("signature mismatch"))
    } finally { sess.close(); cluster.close() }
  }

  test("SASL/SCRAM-SHA-256: a combined nonce that does not extend the " +
      "client nonce is rejected (RFC 5802 MUST) before any proof is sent") {
    val cluster = new TestKafkaCluster("tscram4",
      scramUser = Some(("alice", "s3cr3t")), tamperScramNonce = true)
    val sess = new KafkaClient.Session("127.0.0.1", cluster.port(0))
    try {
      val e = intercept[IllegalArgumentException] {
        sess.saslScram("alice", "s3cr3t", Some("cnonceFixed04"))
      }
      assert(e.getMessage.contains("nonce"))
    } finally { sess.close(); cluster.close() }
  }

  test("TLS: a truststore-pinned session handshakes against the mock " +
      "broker's keytool-issued certificate and the fetch path works; " +
      "an unpinned client refuses the self-signed cert") {
    import graft.cdc.KafkaBatch
    val cluster = new TestKafkaCluster("ttls", tls = true)
    cluster.append(KafkaBatch.Encode.batch(0L, 1700000000000L,
      Seq((1700000000000L, "k", "v"))))
    try {
      val sess = new KafkaClient.Session("127.0.0.1", cluster.port(0),
        ssl = Some(KafkaClient.Tls.socketFactory(
          TestTls.truststorePath, TestTls.password)))
      try {
        assert(sess.listOffset("ttls", 0, -1L) == 1L)
        val (next, batches) = sess.fetchAll("ttls", 0, 0L)
        assert(next == 1L &&
          batches.flatMap(KafkaBatch.decodeBatch).map(_.key) == Seq("k"))
      } finally sess.close()

      // system-CA trust must REJECT the self-signed broker cert
      intercept[Exception] {
        new KafkaClient.Session("127.0.0.1", cluster.port(0),
          ssl = Some(KafkaClient.Tls.defaultFactory()))
      }
      // and a plaintext client on a TLS listener fails, not hangs
      intercept[Exception] {
        val plain = new KafkaClient.Session("127.0.0.1", cluster.port(0))
        try plain.apiVersions() finally plain.close()
      }
    } finally cluster.close()
  }

  test("metadataFull keeps the broker address book and per-partition " +
      "leaders resolve through it") {
    val cluster = new TestKafkaCluster("tmeta", nPartitions = 3, nBrokers = 2)
    val sess = new KafkaClient.Session("127.0.0.1", cluster.port(0))
    try {
      val meta = sess.metadataFull(Seq("tmeta"))
      assert(meta.brokers.keySet == Set(0, 1))
      assert(meta.brokers(1).port == cluster.port(1))
      // round-robin leadership: 0->b0, 1->b1, 2->b0
      assert(meta.leaderAddr("tmeta", 0).map(_._2).contains(cluster.port(0)))
      assert(meta.leaderAddr("tmeta", 1).map(_._2).contains(cluster.port(1)))
      assert(meta.leaderAddr("tmeta", 2).map(_._2).contains(cluster.port(0)))
      assert(meta.leaderAddr("tmeta", 9).isEmpty)
      assert(meta.leaderAddr("nope", 0).isEmpty)
    } finally { sess.close(); cluster.close() }
  }

  test("live tail: the poller lands broker batches on a push channel " +
      "as they appear, and the feed decodes distributed") {
    import graft.sources.{PushBuffer, Sources}
    val chan = "kafka-live-test"
    PushBuffer.clear(chan)
    val broker = new MockBroker("live", Seq(mkBatch(0L, Seq(("a", "v0")))))
    val handle = Sources.kafkaLiveStart("127.0.0.1", broker.port, "live", 0,
      chan, pollMs = 20L)
    try {
      def awaitRetained(n: Int): Unit = {
        val deadline = System.nanoTime() + 10L * 1000000000L
        while (PushBuffer.retained(chan) < n) {
          assert(System.nanoTime() < deadline, s"timed out waiting for $n")
          Thread.sleep(10)
        }
      }
      awaitRetained(1)
      broker.append(mkBatch(1L, Seq(("b", "v1"), ("c", "v2"))))
      awaitRetained(2)
      val recs = Sources.kafkaLiveRecords(
        Sources.pushSnapshot(spark, chan)).orderBy("_seq").collect()
      assert(recs.map(r => (r.getAs[Long]("_seq"), r.getAs[String]("key"),
        r.getAs[String]("value"))).toSeq ==
        Seq((0L, "a", "v0"), (1L, "b", "v1"), (2L, "c", "v2")))
    } finally { handle.stop(); broker.close() }
  }

  test("end-to-end: fetched Debezium values materialize through " +
      "debeziumChanges + applyChanges") {
    def env(id: Int, v: String) =
      s"""{"after":{"id":$id,"v":"$v"},"op":"r"}"""
    val log = Seq(
      mkBatch(0L, Seq(("1", env(1, "x")), ("2", env(2, "y")))),
      mkBatch(2L, Seq(("1", s"""{"payload":{"before":{"id":1,"v":"x"},"op":"d"}}"""))))
    val broker = new MockBroker("cdc", log)
    val sess = new KafkaClient.Session("127.0.0.1", broker.port)
    try {
      val (_, batches) = sess.fetchAll("cdc", 0, 0L)
      import spark.implicits._
      val df = batches.zipWithIndex
        .map { case (b, i) => (i.toLong, b) }.toDF("seq", "frame")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType)))
      val state = graft.cdc.ChangeModel.applyChanges(
        KafkaBatch.debeziumChanges(df, schema), Seq("id"))
      assert(state.select("id", "v").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "y")))
    } finally { sess.close(); broker.close() }
  }
}
