package graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.{ChangeModel, PgOutput, PgReplication}
import graft.cdc.PgOutput.{Encode, Selection}
import graft.cdc.PgReplication.WalMessage

/** Replication-session protocol tests: a mock walsender speaking the
  * documented PostgreSQL frontend/backend + streaming-replication wire
  * format over loopback TCP (the strategy that gave the webhook edge a
  * real HTTP transport). The mock serves XLogData frames built by
  * [[PgOutput.Encode]], so session transport + wire codec compose end
  * to end with no live server.
  */
class PgReplicationSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val ConsistentPoint = "0/16B3748"

  /** Scripted one-connection walsender. Records standby status updates. */
  private final class MockWalsender(frames: Seq[Array[Byte]],
      keepaliveAfter: Int, requirePassword: Boolean = false,
      scram: Boolean = false, tamperServerSig: Boolean = false,
      tls: Boolean = false) {
    val statusUpdates = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    @volatile var sawReplicationParam = false
    @volatile var lastQuery = ""
    private val server = new ServerSocket(0)
    def port: Int = server.getLocalPort

    private def backend(out: DataOutputStream, typ: Char, payload: Array[Byte]): Unit = {
      out.writeByte(typ); out.writeInt(payload.length + 4); out.write(payload)
      out.flush()
    }
    private def cstr(s: String): Array[Byte] = {
      val b = new ByteArrayOutputStream(); b.write(s.getBytes(UTF_8)); b.write(0)
      b.toByteArray
    }
    private def i32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v).array()
    private def dataRow(cells: Seq[Option[String]]): Array[Byte] = {
      val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
      d.writeShort(cells.length)
      cells.foreach {
        case None => d.writeInt(-1)
        case Some(s) => val a = s.getBytes(UTF_8); d.writeInt(a.length); d.write(a)
      }
      d.flush(); b.toByteArray
    }
    private def rowDesc(names: String*): Array[Byte] = {
      val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
      d.writeShort(names.length)
      names.foreach { n =>
        d.write(cstr(n)); d.writeInt(0); d.writeShort(0); d.writeInt(25)
        d.writeShort(-1); d.writeInt(-1); d.writeShort(0)
      }
      d.flush(); b.toByteArray
    }

    val thread = new Thread(() => {
      var sock: java.net.Socket = server.accept()
      sock.setTcpNoDelay(true)
      if (tls) {
        // SSLRequest: len 8, code 80877103 → answer 'S' and upgrade
        val pin = new DataInputStream(sock.getInputStream)
        require(pin.readInt() == 8 && pin.readInt() == 80877103,
          "mock: expected SSLRequest first")
        sock.getOutputStream.write('S'); sock.getOutputStream.flush()
        sock = TestTls.serverWrap(sock)
      }
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      // startup message (untyped): len, proto, k\0v\0...\0
      val len = in.readInt()
      val body = new Array[Byte](len - 4); in.readFully(body)
      val params = new String(body, 4, body.length - 5, UTF_8).split('\u0000')
      sawReplicationParam = params.grouped(2).exists(p =>
        p.length == 2 && p(0) == "replication" && p(1) == "database")
      if (scram) {
        // REAL server-side SCRAM-SHA-256 (same RFC primitives): offer
        // the mechanism, build server-first, VERIFY the client proof,
        // answer with the server signature
        import graft.cdc.PgReplication.Scram
        val salt = (1 to 16).map(_.toByte).toArray
        val saltB64 = java.util.Base64.getEncoder.encodeToString(salt)
        val iters = 4096
        val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
        d.writeInt(10); d.write(cstr("SCRAM-SHA-256")); d.writeByte(0); d.flush()
        backend(out, 'R', b.toByteArray)
        // SASLInitialResponse: mech cstring + i32 len + client-first
        val t1 = in.readByte().toChar; val l1 = in.readInt()
        val p1 = new Array[Byte](l1 - 4); in.readFully(p1)
        require(t1 == 'p', "mock: expected SASLInitialResponse")
        val mechEnd = p1.indexOf(0.toByte)
        require(new String(p1, 0, mechEnd, UTF_8) == "SCRAM-SHA-256")
        val cfLen = java.nio.ByteBuffer.wrap(p1, mechEnd + 1, 4).getInt
        val clientFirst = new String(p1, mechEnd + 5, cfLen, UTF_8)
        require(clientFirst.startsWith("n,,"), s"mock: gs2 header in '$clientFirst'")
        val clientFirstBare = clientFirst.substring(3)
        val clientNonce = clientFirstBare.split(",").find(_.startsWith("r="))
          .get.substring(2)
        val fullNonce = clientNonce + "SRVNONCE"
        val serverFirst = s"r=$fullNonce,s=$saltB64,i=$iters"
        val c2 = new ByteArrayOutputStream(); val d2 = new DataOutputStream(c2)
        d2.writeInt(11); d2.write(serverFirst.getBytes(UTF_8)); d2.flush()
        backend(out, 'R', c2.toByteArray)
        // SASLResponse: client-final-message
        val t2 = in.readByte().toChar; val l2 = in.readInt()
        val p2 = new Array[Byte](l2 - 4); in.readFully(p2)
        require(t2 == 'p', "mock: expected SASLResponse")
        val clientFinal = new String(p2, UTF_8)
        val woProof = clientFinal.substring(0, clientFinal.indexOf(",p="))
        val proofB64 = clientFinal.substring(clientFinal.indexOf(",p=") + 3)
        val authMessage = s"$clientFirstBare,$serverFirst,$woProof"
        val salted = Scram.saltedPassword("sekret", salt, iters)
        val expected = java.util.Base64.getEncoder.encodeToString(
          Scram.clientProof(salted, authMessage))
        if (proofB64 != expected) {
          backend(out, 'E', Array('M'.toByte) ++
            cstr("password authentication failed") ++ Array(0.toByte))
        } else {
          val sig = java.util.Base64.getEncoder.encodeToString(
            Scram.serverSignature(salted, authMessage))
          val c3 = new ByteArrayOutputStream(); val d3 = new DataOutputStream(c3)
          d3.writeInt(12)
          d3.write((if (tamperServerSig) "v=AAAA" else s"v=$sig").getBytes(UTF_8))
          d3.flush()
          backend(out, 'R', c3.toByteArray)
          backend(out, 'R', i32(0)) // AuthenticationOk
          backend(out, 'S', cstr("server_version") ++ cstr("16.0"))
          backend(out, 'Z', Array('I'.toByte))
          // minimal query loop so identifySystem works post-auth
          var open2 = true
          while (open2) {
            val typ = try in.readByte().toChar catch {
              case _: Exception => open2 = false; 'X'
            }
            if (open2) {
              val l = in.readInt()
              val payload = new Array[Byte](l - 4); in.readFully(payload)
              typ match {
                case 'X' => open2 = false
                case 'Q' =>
                  backend(out, 'T', rowDesc("systemid", "timeline", "xlogpos", "dbname"))
                  backend(out, 'D', dataRow(Seq(Some("7001"), Some("1"),
                    Some(ConsistentPoint), Some("app"))))
                  backend(out, 'C', cstr("IDENTIFY_SYSTEM"))
                  backend(out, 'Z', Array('I'.toByte))
                case _ =>
              }
            }
          }
        }
        sock.close(); server.close()
      } else {
      if (requirePassword) {
        backend(out, 'R', i32(3)) // cleartext password request
        val t = in.readByte().toChar; val l = in.readInt()
        val p = new Array[Byte](l - 4); in.readFully(p)
        require(t == 'p' && new String(p, 0, p.length - 1, UTF_8) == "sekret",
          "mock: bad password")
      }
      backend(out, 'R', i32(0)) // AuthenticationOk
      backend(out, 'S', cstr("server_version") ++ cstr("16.0"))
      backend(out, 'Z', Array('I'.toByte))
      var open = true
      while (open) {
        val typ = in.readByte().toChar
        val l = in.readInt()
        val payload = new Array[Byte](l - 4); in.readFully(payload)
        typ match {
          case 'X' => open = false
          case 'Q' =>
            val q = new String(payload, 0, payload.length - 1, UTF_8)
            lastQuery = q
            if (q.startsWith("IDENTIFY_SYSTEM")) {
              backend(out, 'T', rowDesc("systemid", "timeline", "xlogpos", "dbname"))
              backend(out, 'D', dataRow(Seq(Some("7001"), Some("1"),
                Some(ConsistentPoint), Some("app"))))
              backend(out, 'C', cstr("IDENTIFY_SYSTEM"))
              backend(out, 'Z', Array('I'.toByte))
            } else if (q.startsWith("CREATE_REPLICATION_SLOT")) {
              backend(out, 'T', rowDesc("slot_name", "consistent_point",
                "snapshot_name", "output_plugin"))
              backend(out, 'D', dataRow(Seq(Some("graft_slot"),
                Some(ConsistentPoint), Some("00000003-00000002-1"),
                Some("pgoutput"))))
              backend(out, 'C', cstr("CREATE_REPLICATION_SLOT"))
              backend(out, 'Z', Array('I'.toByte))
            } else if (q.startsWith("START_REPLICATION")) {
              backend(out, 'W', Array[Byte](0, 0, 0)) // CopyBothResponse
              frames.zipWithIndex.foreach { case (f, i) =>
                backend(out, 'd', f)
                if (i + 1 == keepaliveAfter) {
                  // keepalive, reply requested → expect a status update
                  val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
                  d.writeByte('k'); d.writeLong(0L); d.writeLong(0L); d.writeByte(1)
                  d.flush()
                  backend(out, 'd', b.toByteArray)
                }
                // drain any standby status updates without blocking the script
                while (in.available() > 5) {
                  val t2 = in.readByte().toChar; val l2 = in.readInt()
                  val p2 = new Array[Byte](l2 - 4); in.readFully(p2)
                  if (t2 == 'd' && p2.nonEmpty && p2(0) == 'r')
                    statusUpdates.add(java.nio.ByteBuffer.wrap(p2, 1, 8).getLong)
                }
              }
              backend(out, 'c', Array.emptyByteArray) // CopyDone
              backend(out, 'C', cstr("COPY 0"))
              backend(out, 'Z', Array('I'.toByte))
            } else if (q.startsWith("SELECT")) {
              // snapshot-phase simple query (snapshotter.rs query_raw)
              backend(out, 'T', rowDesc("id", "name"))
              backend(out, 'D', dataRow(Seq(Some("1"), Some("ada"))))
              backend(out, 'D', dataRow(Seq(Some("2"), None)))
              backend(out, 'C', cstr("SELECT 2"))
              backend(out, 'Z', Array('I'.toByte))
            } else {
              backend(out, 'E', Array('M'.toByte) ++ cstr(s"unknown: $q") ++
                Array(0.toByte))
            }
          case 'd' =>
            if (payload.nonEmpty && payload(0) == 'r')
              statusUpdates.add(java.nio.ByteBuffer.wrap(payload, 1, 8).getLong)
          case _ =>
        }
      }
      sock.close(); server.close()
      }
    }, "mock-walsender")
    thread.setDaemon(true)
    thread.start()
  }

  private val RelId = 16384
  // WAL positions stream FORWARD from the slot's consistent point
  private val Base = PgReplication.lsn(ConsistentPoint)
  private def walFrames: Seq[Array[Byte]] = {
    val rel = Encode.relation(RelId, "public", "users", 'd',
      Seq(("id", 20, true), ("name", 25, false)))
    def ins(lsn: Long, id: Long, name: String) =
      Encode.xlogData(lsn, lsn + 1, 0L,
        Encode.insert(RelId, Seq(Some(id.toString), Some(name))))
    Seq(
      Encode.xlogData(Base + 10L, Base + 11L, 0L, rel),
      ins(Base + 20L, 1L, "ann"),
      ins(Base + 30L, 2L, "bob"),
      Encode.xlogData(Base + 40L, Base + 41L, 0L,
        Encode.delete(RelId, 'K', Seq(Some("1"), None))))
  }

  test("session: startup in walsender mode, IDENTIFY_SYSTEM, slot, stream, acks") {
    val mock = new MockWalsender(walFrames, keepaliveAfter = 2)
    val session = new PgReplication.Session("127.0.0.1", mock.port, "app", "dozer")
    try {
      session.connect()
      assert(mock.sawReplicationParam, "startup must carry replication=database")
      val sys = session.identifySystem()
      assert(sys.systemId == "7001" && sys.timeline == 1 &&
        sys.xlogPos == ConsistentPoint)
      val got = mutable.ArrayBuffer.empty[WalMessage]
      val (slotInfo, lastAck) = PgReplication.snapshotThenStream(
        session, "graft_slot", "mypub", maxMessages = 5) { info =>
        assert(info.consistentPoint == ConsistentPoint &&
          info.snapshotName.contains("00000003-00000002-1"))
        // snapshot phase over the SAME connection — the native
        // simple-query read (snapshotter.rs query_raw parity, no JDBC)
        val (cols, rows) = session.select("SELECT id, name FROM users")
        assert(cols == Seq("id", "name"))
        assert(rows == Seq(Seq(Some("1"), Some("ada")),
          Seq(Some("2"), None)))
        "snapshot-done"
      } { m => got += m }
      assert(slotInfo == "snapshot-done")
      assert(mock.lastQuery.contains("START_REPLICATION SLOT \"graft_slot\"") &&
        mock.lastQuery.contains(s"LOGICAL $ConsistentPoint") &&
        mock.lastQuery.contains("proto_version '1'") &&
        mock.lastQuery.contains("publication_names '\"mypub\"'"))
      // 4 XLogData + 1 keepalive arrived
      assert(got.count(_.frame(0) == 'w') == 4)
      assert(got.count(_.frame(0) == 'k') == 1)
      assert(lastAck == Base + 41L) // last XLogData's end LSN acknowledged
      // transport + codec compose: frames decode and materialize
      import spark.implicits._
      val df = got.filter(_.frame(0) == 'w')
        .map(m => (m.lsn, m.frame)).toSeq.toDF("seq", "frame")
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))
      val state = PgOutput.materialize(df, Selection("users"), schema, Seq("id"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(state == Seq((2L, "bob")))
    } finally session.close()
    // the slot-advance contract: status updates reached the server
    val deadline = System.currentTimeMillis() + 5000
    while (mock.statusUpdates.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    import scala.jdk.CollectionConverters._
    val acks = mock.statusUpdates.asScala.toSeq
    assert(acks.nonEmpty && acks.max == Base + 41L)
  }

  test("session: TLS via SSLRequest upgrade — streaming works over the " +
      "encrypted channel; a server refusing SSL aborts the connect") {
    val mock = new MockWalsender(walFrames.take(2), keepaliveAfter = -1,
      tls = true)
    val session = new PgReplication.Session("127.0.0.1", mock.port, "app",
      "dozer", ssl = Some(graft.cdc.Tls.socketFactory(
        TestTls.truststorePath, TestTls.password)))
    try {
      session.connect()
      assert(mock.sawReplicationParam)
      assert(session.identifySystem().systemId == "7001")
    } finally session.close()

    // sslmode=require semantics: a server answering 'N' must abort —
    // never a silent plaintext fallback
    val refuser = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      try {
        val s = refuser.accept()
        val pin = new DataInputStream(s.getInputStream)
        pin.readInt(); pin.readInt()
        s.getOutputStream.write('N'); s.getOutputStream.flush()
        s.close()
      } catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start()
    try {
      val e = intercept[IllegalArgumentException] {
        new PgReplication.Session("127.0.0.1", refuser.getLocalPort,
          "app", "dozer", ssl = Some(graft.cdc.Tls.socketFactory(
            TestTls.truststorePath, TestTls.password)))
      }
      assert(e.getMessage.contains("refused SSL"))
    } finally refuser.close()
  }

  test("session: cleartext password auth round-trips") {
    val mock = new MockWalsender(walFrames.take(1), keepaliveAfter = -1,
      requirePassword = true)
    val session = new PgReplication.Session("127.0.0.1", mock.port, "app",
      "dozer", password = Some("sekret"))
    try {
      session.connect()
      assert(session.identifySystem().systemId == "7001")
    } finally session.close()
  }

  test("SCRAM proof math matches the RFC 7677 published example") {
    import PgReplication.Scram
    val salt = java.util.Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    val snonce = "rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
    val authMessage =
      "n=user,r=rOprNGfwEbeRWgbNEkqO," +
        s"r=$snonce,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096," +
        s"c=biws,r=$snonce"
    val salted = Scram.saltedPassword("pencil", salt, 4096)
    assert(java.util.Base64.getEncoder.encodeToString(
      Scram.clientProof(salted, authMessage)) ==
      "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    assert(java.util.Base64.getEncoder.encodeToString(
      Scram.serverSignature(salted, authMessage)) ==
      "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
  }

  test("session: full SCRAM-SHA-256 exchange authenticates and the " +
      "session proceeds (server proof VERIFIED by the mock)") {
    val mock = new MockWalsender(Nil, keepaliveAfter = -1, scram = true)
    val session = new PgReplication.Session("127.0.0.1", mock.port, "app",
      "dozer", Some("sekret"), scramNonce = Some("clientNonce123"))
    try {
      session.connect()
      assert(session.identifySystem().systemId == "7001")
    } finally session.close()
  }

  test("session: SCRAM with a wrong password is refused by the server") {
    val mock = new MockWalsender(Nil, keepaliveAfter = -1, scram = true)
    val session = new PgReplication.Session("127.0.0.1", mock.port, "app",
      "dozer", Some("WRONG"), scramNonce = Some("clientNonce123"))
    try {
      val e = intercept[IllegalStateException] { session.connect() }
      assert(e.getMessage.contains("authentication failed"))
    } finally session.close()
  }

  test("session: a tampered SCRAM server signature is rejected " +
      "(mutual auth — the server must prove password knowledge)") {
    val mock = new MockWalsender(Nil, keepaliveAfter = -1, scram = true,
      tamperServerSig = true)
    val session = new PgReplication.Session("127.0.0.1", mock.port, "app",
      "dozer", Some("sekret"), scramNonce = Some("clientNonce123"))
    try {
      val e = intercept[IllegalArgumentException] { session.connect() }
      assert(e.getMessage.contains("server signature mismatch"))
    } finally session.close()
  }

  test("lsn text parses and formats round-trip") {
    assert(PgReplication.lsn("0/16B3748") == 0x16B3748L)
    assert(PgReplication.lsn("A/2") == (0xAL << 32 | 2L))
    assert(PgReplication.lsnText(PgReplication.lsn("A/16B3748")) == "A/16B3748")
  }
}
