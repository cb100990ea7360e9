package graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.cdc.{ChangeModel, MyBinlog, MyReplication}
import graft.cdc.MyBinlog.{Encode, Selection}

/** MySQL binlog session-protocol tests against a loopback mock server
  * speaking the documented client/server + replication wire format,
  * serving events built by [[MyBinlog.Encode]] — session transport and
  * binlog codec compose end to end with no live server.
  */
class MyReplicationSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val Scramble: Array[Byte] =
    (1 to 20).map(_.toByte).toArray // fixed 20-byte nonce

  private final class MockMysqld(events: Seq[Array[Byte]],
      password: String, plugin: String = "mysql_native_password",
      cachingFullAuth: Boolean = false, tls: Boolean = false) {
    @volatile var sawRegisterSlave = false
    @volatile var dumpRequest: Option[(Long, String)] = None
    val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val server = new ServerSocket(0)
    def port: Int = server.getLocalPort

    private def packet(out: DataOutputStream, seq: Int, payload: Array[Byte]): Unit = {
      out.writeByte(payload.length & 0xff)
      out.writeByte((payload.length >> 8) & 0xff)
      out.writeByte((payload.length >> 16) & 0xff)
      out.writeByte(seq)
      out.write(payload); out.flush()
    }

    private def handshake: Array[Byte] = {
      val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
      d.writeByte(10)
      d.write("8.0.0-mock".getBytes(UTF_8)); d.writeByte(0)
      d.writeInt(0x01020304) // thread id
      d.write(Scramble, 0, 8); d.writeByte(0) // part1 + filler
      d.writeByte(0xff); d.writeByte(0xff) // caps low
      d.writeByte(33) // charset
      d.writeByte(0); d.writeByte(0) // status
      d.writeByte(0xff); d.writeByte(0xff) // caps high
      d.writeByte(21) // auth data len (8 + 12 + NUL)
      d.write(new Array[Byte](10))
      d.write(Scramble, 8, 12); d.writeByte(0) // part2 + NUL
      d.write(plugin.getBytes(UTF_8)); d.writeByte(0)
      d.flush(); b.toByteArray
    }

    val thread = new Thread(() => {
      var sock = server.accept()
      sock.setTcpNoDelay(true)
      var in = new DataInputStream(sock.getInputStream)
      var out = new DataOutputStream(sock.getOutputStream)
      packet(out, 0, handshake)
      def read(): (Int, Array[Byte]) = {
        val len = in.read() | (in.read() << 8) | (in.read() << 16)
        val seq = in.read()
        val p = new Array[Byte](len); in.readFully(p)
        (seq, p)
      }
      if (tls) {
        // Protocol::SSLRequest: the 32-byte capability prelude with
        // CLIENT_SSL set, then TLS layers over the stream and the full
        // response arrives encrypted
        val (_, sslReq) = read()
        require(sslReq.length == 32, s"mock: SSLRequest len ${sslReq.length}")
        val caps = (sslReq(0) & 0xff) | ((sslReq(1) & 0xff) << 8) |
          ((sslReq(2) & 0xff) << 16) | ((sslReq(3) & 0xff) << 24)
        require((caps & 0x0800) != 0, "mock: CLIENT_SSL not set")
        sock = TestTls.serverWrap(sock)
        in = new DataInputStream(sock.getInputStream)
        out = new DataOutputStream(sock.getOutputStream)
      }
      // handshake response: verify the plugin-specific proof
      val (_, resp) = read()
      var p = 4 + 4 + 1 + 23
      val userEnd = { var e = p; while (resp(e) != 0) e += 1; e }
      p = userEnd + 1
      val proofLen = resp(p) & 0xff; p += 1
      val proof = java.util.Arrays.copyOfRange(resp, p, p + proofLen)
      val expected =
        if (plugin == "caching_sha2_password")
          MyReplication.cachingSha2Scramble(password, Scramble)
        else MyReplication.nativePassword(password, Scramble)
      var authOk = java.util.Arrays.equals(proof, expected)
      var seqNo = 2
      if (plugin == "caching_sha2_password") {
        if (cachingFullAuth) {
          // no cached entry server-side: the scramble cannot be
          // checked — full authentication decides, not the fast proof
          // full authentication: 0x01 0x04, serve the RSA key, verify
          // the OAEP-encrypted XORed password
          packet(out, seqNo, Array[Byte](0x01, 0x04)); seqNo += 1
          val (_, req) = read()
          require((req(0) & 0xff) == 0x02, "mock: expected RSA key request")
          val kp = {
            val g = java.security.KeyPairGenerator.getInstance("RSA")
            g.initialize(2048); g.generateKeyPair()
          }
          val pem = "-----BEGIN PUBLIC KEY-----\n" +
            java.util.Base64.getMimeEncoder.encodeToString(
              kp.getPublic.getEncoded) + "\n-----END PUBLIC KEY-----\n"
          packet(out, seqNo, Array(0x01.toByte) ++ pem.getBytes(UTF_8))
          seqNo += 1
          val (_, enc) = read()
          val c = javax.crypto.Cipher.getInstance(
            "RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
          c.init(javax.crypto.Cipher.DECRYPT_MODE, kp.getPrivate)
          val ob = c.doFinal(enc)
          val plain = ob.indices.map(i =>
            (ob(i) ^ Scramble(i % Scramble.length)).toByte).toArray
          authOk = java.util.Arrays.equals(plain,
            password.getBytes(UTF_8) :+ 0.toByte)
        } else if (authOk) {
          packet(out, seqNo, Array[Byte](0x01, 0x03)); seqNo += 1 // fast auth
        }
      }
      if (!authOk) {
        packet(out, seqNo, Array(0xff.toByte, 0x15, 0x04, '#'.toByte,
          '2', '8', '0', '0', '0').map(_.toByte) ++
          "Access denied".getBytes(UTF_8))
        sock.close(); server.close()
      } else {
        packet(out, seqNo, Array[Byte](0x00, 0x00, 0x00, 0x00, 0x00)) // OK
        var open = true
        while (open) {
          val (_, cmd) = read()
          (cmd(0) & 0xff) match {
            case 0x01 => open = false // COM_QUIT
            case 0x03 => // COM_QUERY
              val sql = new String(cmd, 1, cmd.length - 1, UTF_8)
              queries.add(sql)
              if (sql.startsWith("SELECT")) {
                // text result set: column count, 2 ColumnDefinition41,
                // EOF, rows (lenenc strings, 0xfb NULL), EOF
                def lenencStr(s: String): Array[Byte] = {
                  val b = s.getBytes(UTF_8)
                  Array(b.length.toByte) ++ b
                }
                def colDef(name: String): Array[Byte] =
                  lenencStr("def") ++ lenencStr("shop") ++
                    lenencStr("users") ++ lenencStr("users") ++
                    lenencStr(name) ++ lenencStr(name) ++
                    Array[Byte](0x0c, 33, 0, 0, 1, 0, 0,
                      0xfd.toByte, 0, 0, 0, 0, 0)
                packet(out, 1, Array[Byte](2)) // column count
                packet(out, 2, colDef("id"))
                packet(out, 3, colDef("name"))
                packet(out, 4, Array(0xfe.toByte, 0x00, 0x00, 0x00, 0x00))
                packet(out, 5, lenencStr("1") ++ lenencStr("ann"))
                packet(out, 6, lenencStr("2") ++ Array(0xfb.toByte))
                packet(out, 7, Array(0xfe.toByte, 0x00, 0x00, 0x00, 0x00))
              } else
                packet(out, 1, Array[Byte](0x00, 0x00, 0x00, 0x00, 0x00))
            case 0x15 => // COM_REGISTER_SLAVE
              sawRegisterSlave = true
              packet(out, 1, Array[Byte](0x00, 0x00, 0x00, 0x00, 0x00))
            case 0x12 => // COM_BINLOG_DUMP
              val pos = (cmd(1) & 0xffL) | ((cmd(2) & 0xffL) << 8) |
                ((cmd(3) & 0xffL) << 16) | ((cmd(4) & 0xffL) << 24)
              val file = new String(cmd, 11, cmd.length - 11, UTF_8)
              dumpRequest = Some((pos, file))
              var seq = 1
              events.foreach { e =>
                packet(out, seq, Array(0x00.toByte) ++ e); seq += 1
              }
              packet(out, seq, Array(0xfe.toByte, 0x00, 0x00, 0x00, 0x00))
            case _ =>
              packet(out, 1, Array(0xff.toByte, 0x30, 0x04, '#'.toByte,
                '4', '2', '0', '0', '0').map(_.toByte) ++
                "unknown command".getBytes(UTF_8))
          }
        }
        sock.close(); server.close()
      }
    }, "mock-mysqld")
    thread.setDaemon(true)
    thread.start()
  }

  private val users = Encode.Table(23L, "shop", "users", Seq(
    ("id", graft.cdc.MyBinlog.ColType.LongLong, 0),
    ("name", graft.cdc.MyBinlog.ColType.Varchar, 64),
    ("score", graft.cdc.MyBinlog.ColType.Double, 8)))

  private def binlogEvents: Seq[Array[Byte]] = Seq(
    Encode.formatDescription(1L, crc32 = true),
    Encode.tableMap(users, 0L, checksum = true),
    Encode.writeRows(users,
      Seq(Seq(Some("1"), Some("ann"), Some("1.5")),
        Seq(Some("2"), Some("bob"), Some("2.5"))), checksum = true),
    Encode.deleteRows(users,
      Seq(Seq(Some("1"), Some("ann"), Some("1.5"))), checksum = true))

  test("session: handshake, native-password auth, checksum declare, dump, decode") {
    val mock = new MockMysqld(binlogEvents, password = "sekret")
    val session = new MyReplication.Session("127.0.0.1", mock.port,
      "repl", "sekret")
    val got = mutable.ArrayBuffer.empty[MyReplication.BinlogEvent]
    try {
      session.connect()
      session.declareChecksum()
      // snapshot phase: the native TEXT result-set read (no JDBC)
      val (cols, rows) = session.select("SELECT id, name FROM shop.users")
      assert(cols == Seq("id", "name"))
      assert(rows == Seq(Seq(Some("1"), Some("ann")),
        Seq(Some("2"), None)))
      session.registerSlave(serverId = 1234)
      val n = session.binlogDump(1234, "binlog.000001", 4L) { e => got += e }
      assert(n == 4)
    } finally session.close()
    assert(mock.sawRegisterSlave)
    assert(mock.dumpRequest.contains((4L, "binlog.000001")))
    assert(mock.queries.peek().contains("master_binlog_checksum"))
    // transport + codec compose: the dumped events decode + materialize
    import spark.implicits._
    val df = got.map(e => (e.seq, e.frame)).toSeq.toDF("seq", "frame")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val state = MyBinlog.materialize(df, Selection("users"), schema, Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(state == Seq((2L, "bob", 2.5)))
  }

  test("session: TLS via the mid-handshake SSLRequest upgrade — auth " +
      "and the dump stream run over the encrypted channel") {
    val mock = new MockMysqld(binlogEvents, password = "sekret", tls = true)
    val session = new MyReplication.Session("127.0.0.1", mock.port,
      "repl", "sekret", ssl = Some(graft.cdc.Tls.socketFactory(
        TestTls.truststorePath, TestTls.password)))
    val got = mutable.ArrayBuffer.empty[MyReplication.BinlogEvent]
    try {
      session.connect()
      session.declareChecksum()
      session.registerSlave(serverId = 77)
      val n = session.binlogDump(77, "binlog.000001", 4L) { e => got += e }
      assert(n == 4)
    } finally session.close()
    assert(mock.sawRegisterSlave && got.nonEmpty)
  }

  test("session: wrong password is refused by the server") {
    val mock = new MockMysqld(Nil, password = "right")
    val session = new MyReplication.Session("127.0.0.1", mock.port,
      "repl", "wrong")
    try {
      val e = intercept[IllegalStateException] { session.connect() }
      assert(e.getMessage.contains("Access denied"))
    } finally session.close()
  }

  test("session: caching_sha2_password FAST path (server cache hit) " +
      "authenticates and commands run") {
    val mock = new MockMysqld(Nil, password = "sekret",
      plugin = "caching_sha2_password")
    val session = new MyReplication.Session("127.0.0.1", mock.port,
      "repl", "sekret")
    try {
      session.connect()
      session.exec("SET @x = 1") // post-auth command round-trips
      assert(mock.queries.peek() == "SET @x = 1")
    } finally session.close()
  }

  test("session: caching_sha2_password FULL path — RSA key request, " +
      "OAEP-encrypted XORed password, server-side decrypt verify") {
    val mock = new MockMysqld(Nil, password = "sekret",
      plugin = "caching_sha2_password", cachingFullAuth = true)
    val session = new MyReplication.Session("127.0.0.1", mock.port,
      "repl", "sekret")
    try {
      session.connect()
      session.exec("SET @y = 2")
      assert(mock.queries.peek() == "SET @y = 2")
    } finally session.close()
  }

  test("session: caching_sha2 full path with a wrong password is refused " +
      "after the RSA exchange") {
    val mock = new MockMysqld(Nil, password = "right",
      plugin = "caching_sha2_password", cachingFullAuth = true)
    val session = new MyReplication.Session("127.0.0.1", mock.port,
      "repl", "wrong")
    try {
      val e = intercept[IllegalStateException] { session.connect() }
      assert(e.getMessage.contains("Access denied"))
    } finally session.close()
  }

  test("native-password proof matches the documented construction") {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    def sha1(b: Array[Byte]) = { md.reset(); md.digest(b) }
    val p1 = sha1("pw".getBytes(UTF_8))
    val p2 = sha1(p1)
    val inner = { md.reset(); md.update(Scramble); md.update(p2); md.digest() }
    val expected = p1.zip(inner).map { case (a, b) => (a ^ b).toByte }
    assert(java.util.Arrays.equals(
      MyReplication.nativePassword("pw", Scramble), expected))
    assert(MyReplication.nativePassword("", Scramble).isEmpty)
  }
}
