package graft.cdc

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** MySQL binlog replication SESSION client — the protocol half the
  * binlog decoder ([[MyBinlog]]) sits behind. Reference:
  * dozer-ingestion/mysql (mysql_async's `BinlogStream`: authenticate,
  * set `@master_binlog_checksum`, REGISTER_SLAVE, BINLOG_DUMP, then
  * consume the event stream).
  *
  * Implemented directly on the PUBLIC client/server protocol (MySQL
  * docs "Connection Phase" + "Replication Protocol"):
  *
  *  - packet framing: 3-byte little-endian length + sequence id
  *  - Initial Handshake V10 → Handshake Response 41 with
  *    `mysql_native_password` proof: SHA1(pw) XOR SHA1(scramble ·
  *    SHA1(SHA1(pw))) — pure JDK MessageDigest
  *  - `COM_QUERY` for the checksum session var (servers with
  *    binlog_checksum=CRC32 require the client to declare awareness
  *    before BINLOG_DUMP — the decoder's FDE-driven CRC regime then
  *    verifies each event)
  *  - `COM_REGISTER_SLAVE` + `COM_BINLOG_DUMP`, then the event stream:
  *    each packet `0x00 · <binlog event bytes>` — exactly the frames
  *    [[MyBinlog.changes]] decodes (header log_pos supplies the seq)
  *
  * Driver-side by design (one dump connection per server contract);
  * the data-sized decode runs distributed in [[MyBinlog.changes]].
  * Auth scope: `mysql_native_password` AND `caching_sha2_password`
  * (the MySQL-8 default — fast path + RSA-OAEP full-auth fallback,
  * pure JDK; both loopback-verified incl. wrong-password refusal).
  * Transport: plaintext or TLS via the documented Protocol::SSLRequest
  * mid-handshake upgrade (CLIENT_SSL capability + short prelude, then
  * the full HandshakeResponse rides encrypted; SAN endpoint
  * verification through [[Tls.upgrade]]).
  */
object MyReplication {

  /** One streamed binlog event (seq = arrival index; the decoder
    * prefers the event header's log_pos, same as q97's frames).
    */
  final case class BinlogEvent(seq: Long, frame: Array[Byte])

  private def sha1(parts: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    parts.foreach(md.update)
    md.digest()
  }

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach(md.update)
    md.digest()
  }

  /** caching_sha2_password scramble (the MySQL-8 default; documented
    * construction): `XOR(SHA256(pw), SHA256(SHA256(SHA256(pw)) ·
    * nonce))`.
    */
  def cachingSha2Scramble(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val p1 = sha256(password.getBytes(UTF_8))
    val p2 = sha256(sha256(p1), nonce)
    p1.indices.map(i => (p1(i) ^ p2(i)).toByte).toArray
  }

  /** Full-auth fallback on a plain connection: the XOR-obfuscated
    * NUL-terminated password, RSA-OAEP encrypted with the server's
    * public key (the documented sha256_password/caching_sha2 exchange).
    */
  def rsaEncryptPassword(password: String, nonce: Array[Byte],
      publicKeyPem: String): Array[Byte] = {
    val der = java.util.Base64.getMimeDecoder.decode(
      publicKeyPem.replace("-----BEGIN PUBLIC KEY-----", "")
        .replace("-----END PUBLIC KEY-----", "").trim)
    val key = java.security.KeyFactory.getInstance("RSA")
      .generatePublic(new java.security.spec.X509EncodedKeySpec(der))
    val plain = password.getBytes(UTF_8) :+ 0.toByte
    val obfuscated = plain.indices.map(i =>
      (plain(i) ^ nonce(i % nonce.length)).toByte).toArray
    val c = javax.crypto.Cipher.getInstance(
      "RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE, key)
    c.doFinal(obfuscated)
  }

  /** mysql_native_password proof (documented scramble). */
  def nativePassword(password: String, scramble: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val p1 = sha1(password.getBytes(UTF_8))
    val p2 = sha1(p1)
    val proof = sha1(scramble, p2)
    proof.indices.foreach(i => proof(i) = (proof(i) ^ p1(i)).toByte)
    proof
  }

  final class Session(host: String, port: Int, user: String,
      password: String, database: String = "",
      ssl: Option[javax.net.ssl.SSLSocketFactory] = None)
      extends AutoCloseable {

    // vars: the MySQL TLS upgrade happens MID-handshake (after the
    // server greeting, before the full response — Protocol::SSLRequest)
    private var socket = new Socket(host, port)
    socket.setTcpNoDelay(true)
    private var in = new DataInputStream(socket.getInputStream)
    private var out = new DataOutputStream(socket.getOutputStream)
    private var seqId = 0

    // ---------------------------------------------------------- framing

    private def readPacket(): Array[Byte] = {
      val b0 = in.read(); val b1 = in.read(); val b2 = in.read()
      require(b0 >= 0 && b1 >= 0 && b2 >= 0, "mysql: stream closed")
      val len = b0 | (b1 << 8) | (b2 << 16)
      seqId = (in.read() + 1) & 0xff
      val p = new Array[Byte](len)
      in.readFully(p)
      p
    }

    private def writePacket(payload: Array[Byte]): Unit = {
      out.writeByte(payload.length & 0xff)
      out.writeByte((payload.length >> 8) & 0xff)
      out.writeByte((payload.length >> 16) & 0xff)
      out.writeByte(seqId)
      seqId = (seqId + 1) & 0xff
      out.write(payload)
      out.flush()
    }

    private def fail(p: Array[Byte]): Nothing = {
      // ERR: 0xff, code u16le, '#', sqlstate 5, message
      val code = (p(1) & 0xff) | ((p(2) & 0xff) << 8)
      val msg = new String(p, 9, p.length - 9, UTF_8)
      throw new IllegalStateException(s"mysql error $code: $msg")
    }

    private def expectOk(p: Array[Byte]): Unit = (p(0) & 0xff) match {
      case 0x00 | 0xfe => ()
      case 0xff => fail(p)
      case other => throw new IllegalStateException(
        s"mysql: expected OK, got 0x${other.toHexString}")
    }

    // ---------------------------------------------------------- connect

    def connect(): Unit = {
      val hs = readPacket()
      require((hs(0) & 0xff) == 10, s"mysql: handshake v${hs(0)} unsupported")
      var p = 1
      while (hs(p) != 0) p += 1 // server version
      p += 1
      p += 4 // thread id
      val scramble1 = java.util.Arrays.copyOfRange(hs, p, p + 8); p += 8
      p += 1 // filler
      p += 2 // capabilities low
      p += 1 // charset
      p += 2 // status
      p += 2 // capabilities high
      val authLen = hs(p) & 0xff; p += 1
      p += 10 // reserved
      val rest = math.max(13, authLen - 8)
      val scramble2 = java.util.Arrays.copyOfRange(hs, p, p + rest - 1) // drop NUL
      p += rest
      val pluginEnd = {
        var e = p
        while (e < hs.length && hs(e) != 0) e += 1
        e
      }
      val plugin = new String(hs, p, pluginEnd - p, UTF_8)
      val scramble = scramble1 ++ scramble2
      val caching = plugin == "caching_sha2_password"
      require(caching || plugin == "mysql_native_password",
        s"mysql: unsupported auth plugin '$plugin'")
      val proof =
        if (caching) cachingSha2Scramble(password, scramble)
        else nativePassword(password, scramble)

      // CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH
      //  | CLIENT_LONG_PASSWORD (| CLIENT_CONNECT_WITH_DB | CLIENT_SSL)
      val caps = 0x00000200 | 0x00008000 | 0x00080000 | 0x00000001 |
        (if (database.nonEmpty) 0x00000008 else 0) |
        (if (ssl.isDefined) 0x00000800 else 0)
      def capsAndPrelude(d: DataOutputStream): Unit = {
        d.writeByte(caps & 0xff); d.writeByte((caps >> 8) & 0xff)
        d.writeByte((caps >> 16) & 0xff); d.writeByte((caps >> 24) & 0xff)
        d.writeInt(0x01000000) // max packet (LE 16MB)
        d.writeByte(33) // utf8
        d.write(new Array[Byte](23))
      }
      // Protocol::SSLRequest — the 32-byte capability prelude alone,
      // then TLS layers over the stream and the FULL response follows
      // encrypted (seq ids continue across the upgrade)
      ssl.foreach { f =>
        val short = new ByteArrayOutputStream()
        val sd = new DataOutputStream(short)
        capsAndPrelude(sd); sd.flush()
        writePacket(short.toByteArray)
        socket = Tls.upgrade(socket, host, f)
        in = new DataInputStream(socket.getInputStream)
        out = new DataOutputStream(socket.getOutputStream)
      }
      val body = new ByteArrayOutputStream()
      val d = new DataOutputStream(body)
      capsAndPrelude(d)
      d.write(user.getBytes(UTF_8)); d.writeByte(0)
      d.writeByte(proof.length); d.write(proof)
      if (database.nonEmpty) { d.write(database.getBytes(UTF_8)); d.writeByte(0) }
      d.write(plugin.getBytes(UTF_8)); d.writeByte(0)
      d.flush()
      writePacket(body.toByteArray)
      if (!caching) expectOk(readPacket())
      else {
        // caching_sha2 continuation (documented flow): AuthMoreData
        // 0x01 0x03 = fast-auth success (server had the cache) → OK;
        // 0x01 0x04 = perform full authentication — on a PLAIN
        // connection request the server's RSA public key (0x02),
        // receive the PEM (AuthMoreData), and send
        // RSA-OAEP(XOR(password·NUL, scramble))
        var done = false
        while (!done) {
          val r = readPacket()
          (r(0) & 0xff) match {
            case 0x00 => done = true // OK
            case 0xfe =>
              // At this point 0xfe is AuthSwitchRequest (or EOF), not
              // OK — treating it as success would desync the stream
              // while the server waits for a switch response. Loud.
              throw new IllegalStateException(
                "mysql: server requested an auth-method switch " +
                  "mid-caching_sha2 exchange — unsupported; configure " +
                  "the account for caching_sha2_password or " +
                  "mysql_native_password")
            case 0xff => fail(r)
            case 0x01 if r.length >= 2 && r(1) == 0x03 => // fast auth ok
              expectOk(readPacket())
              done = true
            case 0x01 if r.length >= 2 && r(1) == 0x04 => // full auth
              writePacket(Array(0x02.toByte)) // request RSA public key
              val keyPkt = readPacket()
              require((keyPkt(0) & 0xff) == 0x01,
                "mysql: expected AuthMoreData with the RSA key")
              val pem = new String(keyPkt, 1, keyPkt.length - 1, UTF_8)
              writePacket(rsaEncryptPassword(password, scramble, pem))
            case other => throw new IllegalStateException(
              s"mysql: unexpected auth packet 0x${other.toHexString}")
          }
        }
      }
    }

    // ---------------------------------------------------------- commands

    /** COM_QUERY expecting a bare OK (session vars, checksum declare). */
    def exec(sql: String): Unit = {
      seqId = 0
      writePacket(Array(0x03.toByte) ++ sql.getBytes(UTF_8))
      expectOk(readPacket())
    }

    /** Declare binlog-checksum awareness (replication clients must set
      * this before BINLOG_DUMP on CRC32 servers).
      */
    def declareChecksum(): Unit =
      exec("SET @master_binlog_checksum = @@global.binlog_checksum")

    // ------------------------------------------------ text result sets

    private def lenencInt(p: Array[Byte], pos: Int): (Long, Int) =
      (p(pos) & 0xff) match {
        case 0xfc => (((p(pos + 1) & 0xffL)) | ((p(pos + 2) & 0xffL) << 8), pos + 3)
        case 0xfd => ((p(pos + 1) & 0xffL) | ((p(pos + 2) & 0xffL) << 8) |
          ((p(pos + 3) & 0xffL) << 16), pos + 4)
        case 0xfe =>
          var v = 0L
          var i = 7
          while (i >= 0) { v = (v << 8) | (p(pos + 1 + i) & 0xffL); i -= 1 }
          (v, pos + 9)
        case n => (n.toLong, pos + 1)
      }

    private def lenencStr(p: Array[Byte], pos: Int): (Option[String], Int) =
      if ((p(pos) & 0xff) == 0xfb) (None, pos + 1)
      else {
        val (len, at) = lenencInt(p, pos)
        (Some(new String(p, at, len.toInt, UTF_8)), at + len.toInt)
      }

    private def isEofOrOk(p: Array[Byte]): Boolean =
      ((p(0) & 0xff) == 0xfe && p.length < 9) || (p(0) & 0xff) == 0x00

    /** SNAPSHOT read: COM_QUERY with a TEXT result set (the documented
      * protocol: column-count, ColumnDefinition41 packets, rows of
      * lenenc strings with 0xfb NULLs, EOF/OK terminators). The
      * snapshot-phase twin of [[PgReplication.Session.select]] — with
      * it the MySQL path needs no JDBC driver either. Returns (column
      * names, rows as text cells).
      */
    def select(sql: String): (Seq[String], Seq[Seq[Option[String]]]) = {
      seqId = 0
      writePacket(Array(0x03.toByte) ++ sql.getBytes(UTF_8))
      val first = readPacket()
      (first(0) & 0xff) match {
        case 0xff => fail(first)
        case 0x00 => (Nil, Nil) // OK with no result set
        case _ =>
          val (nCols, _) = lenencInt(first, 0)
          val cols = (0 until nCols.toInt).map { _ =>
            val p = readPacket()
            // ColumnDefinition41: catalog, schema, table, org_table,
            // name, … — the 5th lenenc string is the display name
            var pos = 0
            var name: Option[String] = None
            (0 until 5).foreach { i =>
              val (s, next) = lenencStr(p, pos)
              if (i == 4) name = s
              pos = next
            }
            name.getOrElse("")
          }
          var p = readPacket()
          if (isEofOrOk(p)) p = readPacket() // EOF after column defs
          val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Option[String]]]
          while (!isEofOrOk(p)) {
            if ((p(0) & 0xff) == 0xff) fail(p)
            var pos = 0
            rows += cols.map { _ =>
              val (s, next) = lenencStr(p, pos)
              pos = next
              s
            }
            p = readPacket()
          }
          (cols, rows.toSeq)
      }
    }

    /** COM_REGISTER_SLAVE — announce this client as a replica. */
    def registerSlave(serverId: Int): Unit = {
      seqId = 0
      val b = new ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.writeByte(0x15)
      d.writeByte(serverId & 0xff); d.writeByte((serverId >> 8) & 0xff)
      d.writeByte((serverId >> 16) & 0xff); d.writeByte((serverId >> 24) & 0xff)
      d.writeByte(0); d.writeByte(0); d.writeByte(0) // hostname/user/password len 0
      d.writeByte(0); d.writeByte(0) // port
      d.write(new Array[Byte](8)) // rank + master id
      d.flush()
      writePacket(b.toByteArray)
      expectOk(readPacket())
    }

    /** COM_BINLOG_DUMP from (filename, pos); invokes `handler` per
      * binlog event until EOF or `maxEvents`. Returns events consumed.
      */
    def binlogDump(serverId: Int, filename: String, pos: Long,
        maxEvents: Long = Long.MaxValue)(handler: BinlogEvent => Unit): Long = {
      seqId = 0
      val b = new ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.writeByte(0x12)
      d.writeByte((pos & 0xff).toInt); d.writeByte(((pos >> 8) & 0xff).toInt)
      d.writeByte(((pos >> 16) & 0xff).toInt); d.writeByte(((pos >> 24) & 0xff).toInt)
      d.writeByte(0); d.writeByte(0) // flags
      d.writeByte(serverId & 0xff); d.writeByte((serverId >> 8) & 0xff)
      d.writeByte((serverId >> 16) & 0xff); d.writeByte((serverId >> 24) & 0xff)
      d.write(filename.getBytes(UTF_8))
      d.flush()
      writePacket(b.toByteArray)
      var n = 0L
      var open = true
      while (open && n < maxEvents) {
        val p = readPacket()
        (p(0) & 0xff) match {
          case 0x00 =>
            handler(BinlogEvent(n, java.util.Arrays.copyOfRange(p, 1, p.length)))
            n += 1
          case 0xfe => open = false // EOF
          case 0xff => fail(p)
          case other => throw new IllegalStateException(
            s"mysql: unexpected dump packet 0x${other.toHexString}")
        }
      }
      n
    }

    override def close(): Unit = {
      try { seqId = 0; writePacket(Array(0x01.toByte)) } // COM_QUIT
      catch { case _: Exception => }
      socket.close()
    }
  }
}
