package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket

import graft.cdc.{KafkaBatch, KafkaClient, PgReplication}

/** Loopback mock Kafka CLUSTER (the documented wire protocol subset the
  * native client speaks: ApiVersions v0 / Metadata v1 / ListOffsets v1
  * / Fetch v4 / SaslHandshake v0+v1 / SaslAuthenticate v0) serving
  * appendable in-memory logs for one topic with `nPartitions`
  * partitions across `nBrokers` broker sockets.
  *
  * Leadership is REAL in the mock: every broker serves the full
  * Metadata address book with the CURRENT leader ids, but answers
  * ListOffsets/Fetch for a partition it does not lead with error 6
  * (NOT_LEADER_OR_FOLLOWER) — exactly what a production broker does —
  * so a client that ignores leader routing breaks here the way it
  * would on a real cluster. [[moveLeader]] reassigns mid-test.
  *
  * Optional SASL/SCRAM-SHA-256: when `scramUser` is set, the broker
  * runs the server half of RFC 5802 (same [[PgReplication.Scram]]
  * primitives the client uses are NOT reused here beyond the raw
  * HMAC/H math — the server derives StoredKey/ServerKey itself and
  * verifies the client proof), refusing wrong credentials with error
  * 58 (SASL_AUTHENTICATION_FAILED). `tamperScramSig` serves a broken
  * server signature to prove the client's mutual-auth check.
  */
/** One keytool-issued self-signed certificate (SAN=IP:127.0.0.1) per
  * test JVM: a PKCS12 keystore for mock TLS listeners and a matching
  * truststore for clients — real JSSE handshakes, no fixture bytes.
  */
object TestTls {
  lazy val (keystorePath, truststorePath, password): (String, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tls")
    val ks = dir.resolve("broker.p12").toString
    val cer = dir.resolve("broker.cer").toString
    val ts = dir.resolve("trust.p12").toString
    val pw = "changeit"
    def run(args: String*): Unit = {
      val p = new ProcessBuilder(("keytool" +: args): _*)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      require(p.waitFor() == 0, s"keytool failed: $out")
    }
    run("-genkeypair", "-alias", "broker", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "30", "-storetype", "PKCS12",
      "-keystore", ks, "-storepass", pw, "-dname", "CN=127.0.0.1",
      "-ext", "SAN=IP:127.0.0.1")
    run("-exportcert", "-alias", "broker", "-keystore", ks,
      "-storepass", pw, "-file", cer)
    run("-importcert", "-noprompt", "-alias", "broker", "-storetype",
      "PKCS12", "-keystore", ts, "-storepass", pw, "-file", cer)
    (ks, ts, pw)
  }

  /** STARTTLS-style server-side wrap of an accepted plaintext socket
    * (the mock walsender / mock MySQL upgrade step).
    */
  def serverWrap(sock: java.net.Socket): javax.net.ssl.SSLSocket = {
    val tls = serverContext.getSocketFactory
      .createSocket(sock, "127.0.0.1", sock.getPort, true)
      .asInstanceOf[javax.net.ssl.SSLSocket]
    tls.setUseClientMode(false)
    tls.startHandshake()
    tls
  }

  /** Server-side SSLContext over the generated keystore. */
  lazy val serverContext: javax.net.ssl.SSLContext = {
    val ks = java.security.KeyStore.getInstance(
      new java.io.File(keystorePath), password.toCharArray)
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password.toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }
}

final class TestKafkaCluster(topic: String, nPartitions: Int = 1,
    nBrokers: Int = 1, scramUser: Option[(String, String)] = None,
    tamperScramSig: Boolean = false, tamperScramNonce: Boolean = false,
    tls: Boolean = false, requireSasl: Boolean = false) {
  private val logs = Array.fill(nPartitions)(
    new java.util.concurrent.CopyOnWriteArrayList[Array[Byte]]())
  // partition -> broker index currently leading it (round-robin start)
  private val leaders = new java.util.concurrent.atomic.AtomicIntegerArray(
    Array.tabulate(nPartitions)(_ % nBrokers))
  // retention truncation point per partition (earliest retained offset)
  private val earliest =
    new java.util.concurrent.atomic.AtomicLongArray(nPartitions)
  // how many partitions Metadata currently reports (grows mid-test to
  // model a partition added to the topic)
  @volatile private var visibleParts: Int = nPartitions
  // one-shot: on the next Fetch for (partition), flip leadership to
  // (broker) and answer error 6 — models a move between plan and read
  @volatile private var pendingMove: Option[(Int, Int)] = None
  private val servers: Array[ServerSocket] = Array.fill(nBrokers)(
    if (tls) TestTls.serverContext.getServerSocketFactory.createServerSocket(0)
    else new ServerSocket(0))

  def port(broker: Int): Int = servers(broker).getLocalPort
  def broker(i: Int): String = s"127.0.0.1:${port(i)}"
  def bootstrap: String = broker(0)
  def leaderOf(partition: Int): Int = leaders.get(partition)
  def moveLeader(partition: Int, broker: Int): Unit =
    leaders.set(partition, broker)
  /** Flip leadership at the moment the current leader sees the next
    * Fetch for `partition` (answered with error 6, like production).
    */
  def moveLeaderOnNextFetch(partition: Int, broker: Int): Unit =
    pendingMove = Some((partition, broker))
  def movePending: Boolean = pendingMove.isDefined
  /** Retention-truncate: offsets below `offset` are gone; ListOffsets
    * earliest reports `offset`, fetches below it answer error 1
    * (OFFSET_OUT_OF_RANGE) — production broker behavior.
    */
  def truncateBefore(partition: Int, offset: Long): Unit =
    earliest.set(partition, offset)
  /** Report only the first `n` partitions in Metadata (grow later to
    * model partition addition).
    */
  def setVisiblePartitions(n: Int): Unit = {
    require(n >= 1 && n <= nPartitions); visibleParts = n
  }

  def append(b: Array[Byte]): Unit = append(0, b)
  def append(partition: Int, b: Array[Byte]): Unit = {
    logs(partition).add(b); ()
  }

  private def log(p: Int): Seq[Array[Byte]] = {
    import scala.jdk.CollectionConverters._
    logs(p).asScala.toSeq
  }
  private def baseOffset(b: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(b, 0, 8).getLong
  private def lastOffset(b: Array[Byte]): Long =
    baseOffset(b) + java.nio.ByteBuffer.wrap(b, 23, 4).getInt
  private def highWatermark(p: Int): Long =
    if (log(p).isEmpty) 0L else lastOffset(log(p).last) + 1

  servers.zipWithIndex.foreach { case (server, myId) =>
    val accept = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          val t = new Thread(() => serve(sock, myId), "test-kafka-conn")
          t.setDaemon(true)
          t.start()
        }
      } catch { case _: Exception => () }
    }, s"test-kafka-accept-$myId")
    accept.setDaemon(true)
    accept.start()
  }

  private def serve(sock: java.net.Socket, myId: Int): Unit = {
    // per-connection SCRAM exchange state
    var scramClientFirstBare: String = null
    var scramServerFirst: String = null
    var scramSalted: Array[Byte] = null
    // a requireSasl broker answers data APIs only after a successful
    // SASL exchange — it CLOSES the connection otherwise, which is
    // what production brokers do to unauthenticated requests
    var authed = !requireSasl
    try {
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      while (true) {
        val size = in.readInt()
        val req = new Array[Byte](size)
        in.readFully(req)
        val r = new KafkaClient.Reader(req)
        val apiKey = r.i16(); r.i16() // apiVersion
        val corr = r.i32(); r.nstr()
        val w = new KafkaClient.Writer
        w.i32(corr)
        if (!authed && apiKey != KafkaClient.ApiVersionsKey &&
            apiKey != KafkaClient.ApiSaslHandshake &&
            apiKey != KafkaClient.ApiSaslAuthenticate)
          throw new IllegalStateException("mock: unauthenticated request")
        apiKey match {
          case KafkaClient.ApiVersionsKey =>
            w.i16(0); w.i32(3)
            Seq((1, 0, 12), (2, 0, 7), (3, 0, 12)).foreach { case (k, lo, hi) =>
              w.i16(k); w.i16(lo); w.i16(hi)
            }
          case KafkaClient.ApiSaslHandshake =>
            val mech = r.str()
            if (scramUser.isDefined && mech == "SCRAM-SHA-256") {
              w.i16(0); w.i32(1); w.str("SCRAM-SHA-256")
            } else if (scramUser.isEmpty && mech == "PLAIN") {
              w.i16(0); w.i32(1); w.str("PLAIN")
            } else { // 33 = UNSUPPORTED_SASL_MECHANISM
              w.i16(33); w.i32(1)
              w.str(if (scramUser.isDefined) "SCRAM-SHA-256" else "PLAIN")
            }
          case KafkaClient.ApiSaslAuthenticate =>
            val (user, pass) = scramUser.getOrElse(
              throw new IllegalStateException("mock: SASL not configured"))
            val token = new String(r.bytes(r.i32()),
              java.nio.charset.StandardCharsets.UTF_8)
            def respond(err: Int, msg: Option[String],
                auth: String): Unit = {
              w.i16(err); w.nstr(msg)
              val b = auth.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              w.i32(b.length); w.raw(b)
            }
            if (scramClientFirstBare == null) {
              // client-first: gs2 "n,," + "n=user,r=nonce"
              require(token.startsWith("n,,"), s"mock: bad gs2 in '$token'")
              scramClientFirstBare = token.substring(3)
              val attrs = scramClientFirstBare.split(",").map { a =>
                a.substring(0, 1) -> a.substring(2)
              }.toMap
              if (attrs("n") != user) respond(58,
                Some(s"unknown user ${attrs("n")}"), "")
              else {
                val salt = "mocksalt0123".getBytes(
                  java.nio.charset.StandardCharsets.UTF_8)
                val saltB64 = java.util.Base64.getEncoder.encodeToString(salt)
                scramSalted = PgReplication.Scram.saltedPassword(
                  pass, salt, 4096)
                val combined =
                  if (tamperScramNonce) "NOTYOURNONCE" + attrs("r")
                  else attrs("r") + "serverExt"
                scramServerFirst = s"r=$combined,s=$saltB64,i=4096"
                respond(0, None, scramServerFirst)
              }
            } else {
              // client-final: "c=biws,r=...,p=proof"
              val woProof = token.substring(0, token.lastIndexOf(",p="))
              val proof = token.substring(token.lastIndexOf(",p=") + 3)
              val authMessage =
                s"$scramClientFirstBare,$scramServerFirst,$woProof"
              val expect = java.util.Base64.getEncoder.encodeToString(
                PgReplication.Scram.clientProof(scramSalted, authMessage))
              if (proof != expect)
                respond(58, Some("SASL authentication failed: bad proof"), "")
              else {
                val sig = java.util.Base64.getEncoder.encodeToString(
                  PgReplication.Scram.serverSignature(scramSalted, authMessage))
                authed = true
                respond(0, None,
                  "v=" + (if (tamperScramSig) "TAMPERED" + sig else sig))
              }
            }
          case KafkaClient.ApiMetadata =>
            w.i32(nBrokers)
            (0 until nBrokers).foreach { b =>
              w.i32(b); w.str("127.0.0.1"); w.i32(port(b)); w.nstr(None)
            }
            w.i32(0) // controller id
            val nVis = visibleParts
            w.i32(1); w.i16(0); w.str(topic); w.bool(false)
            w.i32(nVis)
            (0 until nVis).foreach { p =>
              w.i16(0); w.i32(p); w.i32(leaders.get(p))
              w.i32(1); w.i32(leaders.get(p)); w.i32(1); w.i32(leaders.get(p))
            }
          case KafkaClient.ApiListOffsets =>
            r.i32(); r.i32(); r.str(); r.i32()
            val part = r.i32()
            val ts = r.i64()
            w.i32(1); w.str(topic)
            if (leaders.get(part) != myId) {
              w.i32(1); w.i32(part); w.i16(6); w.i64(-1L); w.i64(-1L)
            } else {
              // -2 earliest, -1 latest, >=0 first offset with ts >= t
              // (-1 when no such message — the protocol's answer)
              val off = ts match {
                case -2L => earliest.get(part)
                case -1L => highWatermark(part)
                case t => log(part).flatMap(KafkaBatch.decodeBatch)
                  .find(_.tsMillis >= t).map(_.offset).getOrElse(-1L)
              }
              w.i32(1); w.i32(part); w.i16(0); w.i64(-1L); w.i64(off)
            }
          case KafkaClient.ApiFetch =>
            r.i32(); r.i32(); r.i32(); r.i32(); r.i8()
            r.i32(); r.str(); r.i32()
            val part = r.i32()
            val wanted = r.i64()
            w.i32(0)
            w.i32(1); w.str(topic)
            val moveNow =
              pendingMove.exists(_._1 == part) && leaders.get(part) == myId
            if (moveNow) {
              val (_, dest) = pendingMove.get
              leaders.set(part, dest)
              pendingMove = None
              w.i32(1); w.i32(part); w.i16(6)
              w.i64(-1L); w.i64(-1L); w.i32(0); w.i32(0)
            } else if (leaders.get(part) != myId) {
              // the production broker answer a non-leader gives:
              // error 6, no record set
              w.i32(1); w.i32(part); w.i16(6)
              w.i64(-1L); w.i64(-1L); w.i32(0); w.i32(0)
            } else if (wanted < earliest.get(part)) {
              // 1 = OFFSET_OUT_OF_RANGE (below the retention floor)
              w.i32(1); w.i32(part); w.i16(1)
              w.i64(-1L); w.i64(-1L); w.i32(0); w.i32(0)
            } else {
              val serve = log(part).filter(b => lastOffset(b) >= wanted).take(4)
              val set = new KafkaClient.Writer
              serve.foreach(b => set.raw(b))
              val setBytes = set.result
              // aborted-transaction list computed from the log itself:
              // per producer, a txn opens at its first transactional
              // batch and an ABORT control marker closes it aborted —
              // exactly what a real broker's txn index stores
              val abortedList = {
                val open = scala.collection.mutable.Map.empty[Long, Long]
                // (pid, firstOffset, markerOffset) — a real broker's txn
                // index; the response carries only entries OVERLAPPING
                // the fetched range (marker at/after the fetch start)
                val out = scala.collection.mutable.ArrayBuffer
                  .empty[(Long, Long, Long)]
                log(part).foreach { b =>
                  val info = graft.cdc.KafkaBatch.decodeBatchInfo(b)
                  if (info.control) {
                    if (info.controlType.contains(graft.cdc.KafkaBatch.ControlAbort))
                      open.get(info.producerId).foreach(first =>
                        out += ((info.producerId, first, info.baseOffset)))
                    open -= info.producerId
                  } else if (info.transactional &&
                      !open.contains(info.producerId))
                    open(info.producerId) = info.baseOffset
                }
                out.toSeq.collect {
                  case (pid, first, marker) if marker >= wanted =>
                    (pid, first)
                }
              }
              w.i32(1); w.i32(part); w.i16(0)
              w.i64(highWatermark(part)); w.i64(highWatermark(part))
              w.i32(abortedList.length)
              abortedList.foreach { case (pid, first) =>
                w.i64(pid); w.i64(first)
              }
              w.i32(setBytes.length); w.raw(setBytes)
            }
          case other =>
            throw new IllegalStateException(s"test broker: api $other")
        }
        val resp = w.result
        out.writeInt(resp.length)
        out.write(resp)
        out.flush()
      }
    } catch { case _: Exception => () }
    finally { try sock.close() catch { case _: Exception => () } }
  }

  def close(): Unit = servers.foreach(_.close())
}

/** Single-broker compatibility facade over [[TestKafkaCluster]] — the
  * shape most specs need.
  */
final class TestKafkaBroker(topic: String, nPartitions: Int = 1) {
  private val cluster = new TestKafkaCluster(topic, nPartitions, 1)
  def port: Int = cluster.port(0)
  def broker: String = cluster.bootstrap
  def append(b: Array[Byte]): Unit = cluster.append(b)
  def append(partition: Int, b: Array[Byte]): Unit =
    cluster.append(partition, b)
  def close(): Unit = cluster.close()
}
