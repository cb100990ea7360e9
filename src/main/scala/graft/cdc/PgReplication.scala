package graft.cdc

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** PostgreSQL logical-replication SESSION client — the protocol half the
  * wire decoder ([[PgOutput]]) sits behind. Reference:
  * dozer-ingestion/postgres/src/replicator.rs (CDCHandler: connect in
  * replication mode, START_REPLICATION SLOT … LOGICAL with
  * proto_version/publication_names options, standby status updates) and
  * replication_slot_helper.rs (`CREATE_REPLICATION_SLOT … LOGICAL
  * "pgoutput" USE_SNAPSHOT` — the slot's consistent point + exported
  * snapshot are what make the snapshot-then-stream handoff gapless).
  *
  * Implemented directly on the PUBLIC frontend/backend message format
  * (PostgreSQL docs §55 "Frontend/Backend Protocol", §53.4 streaming
  * replication sub-protocol) over a plain socket:
  *
  *  - StartupMessage with `replication=database` (walsender mode)
  *  - simple Query for `IDENTIFY_SYSTEM` / `CREATE_REPLICATION_SLOT` /
  *    `START_REPLICATION`, row results parsed from
  *    RowDescription/DataRow frames
  *  - CopyBothResponse then CopyData frames: XLogData ('w') and primary
  *    keepalives ('k'), answered with Standby Status Update ('r') so
  *    the server can advance `confirmed_flush_lsn` — acknowledgement IS
  *    the replication slot's resume contract (dozer sends the same
  *    update from CDCHandler::handle_replication_message)
  *
  * The session yields raw replication payloads as `(wal_start_lsn,
  * frame)` pairs — exactly the `(seq, frame)` shape
  * [[PgOutput.changes]] decodes — so transport and codec compose
  * without re-buffering. Driver-side by design like every ingest edge
  * here: ONE walsender connection exists per slot by server contract;
  * the decode fan-out (the data-sized work) happens in
  * [[PgOutput.changes]]' distributed pass.
  *
  * Auth scope: `trust`, `password` (cleartext), and SCRAM-SHA-256
  * (the PostgreSQL-10+ default) — the full RFC 5802/7677 SASL
  * exchange incl. mutual authentication (the server's signature is
  * VERIFIED; a server that cannot prove knowledge of the password is
  * rejected). The proof math is pinned against RFC 7677's published
  * example vectors in PgReplicationSpec. Transport: plaintext or TLS
  * via the documented SSLRequest upgrade (`sslmode=require`
  * semantics — an 'N' refusal aborts, never a silent fallback; SAN
  * endpoint verification through [[Tls.upgrade]]).
  */
object PgReplication {

  /** One streamed replication message: WAL start LSN (0 for
    * keepalives) and the raw payload (XLogData-wrapped pgoutput frame
    * or keepalive) — feed straight into [[PgOutput.changes]].
    */
  final case class WalMessage(lsn: Long, frame: Array[Byte])

  final case class SlotInfo(slotName: String, consistentPoint: String,
      snapshotName: Option[String], outputPlugin: String)

  final case class SystemInfo(systemId: String, timeline: Int,
      xlogPos: String, dbName: Option[String])

  /** SCRAM-SHA-256 primitives (RFC 5802/7677 — the auth PostgreSQL
    * defaults to since v10). Pure JDK (PBKDF2 + HMAC); the proof math
    * is pinned against RFC 7677's published example vectors in
    * PgReplicationSpec.
    */
  object Scram {
    private def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
      val m = javax.crypto.Mac.getInstance("HmacSHA256")
      m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
      m.doFinal(msg)
    }

    private def sha256(b: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)

    /** Hi(password, salt, i) — PBKDF2-HMAC-SHA256. */
    def saltedPassword(password: String, salt: Array[Byte],
        iterations: Int): Array[Byte] = {
      val spec = new javax.crypto.spec.PBEKeySpec(
        password.toCharArray, salt, iterations, 256)
      javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
        .generateSecret(spec).getEncoded
    }

    /** ClientProof = ClientKey XOR HMAC(StoredKey, authMessage). */
    def clientProof(salted: Array[Byte], authMessage: String): Array[Byte] = {
      val clientKey = hmac(salted, "Client Key".getBytes(UTF_8))
      val storedKey = sha256(clientKey)
      val sig = hmac(storedKey, authMessage.getBytes(UTF_8))
      clientKey.zip(sig).map { case (a, b) => (a ^ b).toByte }
    }

    /** ServerSignature = HMAC(ServerKey, authMessage). */
    def serverSignature(salted: Array[Byte], authMessage: String): Array[Byte] =
      hmac(hmac(salted, "Server Key".getBytes(UTF_8)),
        authMessage.getBytes(UTF_8))
  }

  /** Parse "X/Y" LSN text into the 64-bit LSN. */
  def lsn(text: String): Long = {
    val i = text.indexOf('/')
    require(i > 0, s"bad LSN '$text'")
    (java.lang.Long.parseLong(text.substring(0, i), 16) << 32) |
      java.lang.Long.parseLong(text.substring(i + 1), 16)
  }

  def lsnText(v: Long): String =
    f"${(v >>> 32).toInt.toHexString.toUpperCase}%s/${(v & 0xffffffffL).toInt.toHexString.toUpperCase}%s"

  final class Session(host: String, port: Int, database: String,
      user: String, password: Option[String] = None,
      scramNonce: Option[String] = None,
      ssl: Option[javax.net.ssl.SSLSocketFactory] = None)
      extends AutoCloseable {

    private val socket: Socket = {
      val plain = new Socket(host, port)
      plain.setTcpNoDelay(true)
      ssl match {
        case None => plain
        case Some(f) =>
          // SSLRequest (docs §55.2.10): int32 len 8 + code 80877103;
          // 'S' → TLS layers over the same stream, anything else is a
          // refusal (sslmode=require semantics — never fall back)
          val d = new DataOutputStream(plain.getOutputStream)
          d.writeInt(8); d.writeInt(80877103); d.flush()
          val resp = plain.getInputStream.read()
          require(resp == 'S',
            s"postgres: server refused SSL (got '${resp.toChar}')")
          Tls.upgrade(plain, host, f)
      }
    }
    private val in = new DataInputStream(socket.getInputStream)
    private val out = new DataOutputStream(socket.getOutputStream)

    // ---------------------------------------------------------- framing

    private def send(typ: Char, payload: Array[Byte]): Unit = {
      out.writeByte(typ)
      out.writeInt(payload.length + 4)
      out.write(payload)
      out.flush()
    }

    private def cstr(s: String): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write(s.getBytes(UTF_8)); b.write(0); b.toByteArray
    }

    /** (type, payload) of the next backend message. */
    private def recv(): (Char, Array[Byte]) = {
      val typ = in.readByte().toChar
      val len = in.readInt()
      require(len >= 4, s"pgwire: bad length $len for '$typ'")
      val payload = new Array[Byte](len - 4)
      in.readFully(payload)
      (typ, payload)
    }

    private def fail(payload: Array[Byte]): Nothing = {
      // ErrorResponse: (code byte, cstring) pairs until a zero byte
      val fields = mutable.Map.empty[Char, String]
      var p = 0
      while (p < payload.length && payload(p) != 0) {
        val code = payload(p).toChar
        val end = payload.indexOf(0.toByte, p + 1)
        fields(code) = new String(payload, p + 1, end - p - 1, UTF_8)
        p = end + 1
      }
      throw new IllegalStateException(
        s"pg error ${fields.getOrElse('C', "?")}: ${fields.getOrElse('M', "?")}")
    }

    // ---------------------------------------------------------- startup

    /** walsender-mode startup (`replication=database`), trust or
      * cleartext-password auth, drains ParameterStatus/BackendKeyData
      * until ReadyForQuery.
      */
    def connect(): Unit = {
      val body = new ByteArrayOutputStream()
      val d = new DataOutputStream(body)
      d.writeInt(196608) // protocol 3.0
      d.write(cstr("user")); d.write(cstr(user))
      d.write(cstr("database")); d.write(cstr(database))
      d.write(cstr("replication")); d.write(cstr("database"))
      d.write(0)
      d.flush()
      out.writeInt(body.size() + 4)
      out.write(body.toByteArray)
      out.flush()
      // SCRAM exchange state (RFC 5802 message names)
      var clientFirstBare: String = null
      var clientNonce: String = null
      var serverFirst: String = null
      var salted: Array[Byte] = null
      var expectedServerSig: String = null
      def pwd: String = password.getOrElse(throw new IllegalStateException(
        "server requests a password but none was configured"))

      var ready = false
      while (!ready) {
        recv() match {
          case ('R', p) =>
            val code = java.nio.ByteBuffer.wrap(p, 0, 4).getInt
            code match {
              case 0 => // AuthenticationOk
              case 3 => // cleartext password
                send('p', cstr(pwd))
              case 10 => // AuthenticationSASL: NUL-separated mechanisms
                val mechs = new String(p, 4, p.length - 4, UTF_8)
                  .split('\u0000').filter(_.nonEmpty).toSeq
                require(mechs.contains("SCRAM-SHA-256"),
                  s"server offers no SCRAM-SHA-256 (got $mechs)")
                val nonce = scramNonce.getOrElse {
                  val b = new Array[Byte](18)
                  new java.security.SecureRandom().nextBytes(b)
                  java.util.Base64.getEncoder.encodeToString(b)
                }
                clientNonce = nonce
                clientFirstBare = s"n=,r=$nonce" // pg takes user from startup
                val initial = ("n,," + clientFirstBare).getBytes(UTF_8)
                val body = new ByteArrayOutputStream()
                val d = new DataOutputStream(body)
                d.write(cstr("SCRAM-SHA-256"))
                d.writeInt(initial.length)
                d.write(initial)
                d.flush()
                send('p', body.toByteArray)
              case 11 => // AuthenticationSASLContinue: server-first-message
                serverFirst = new String(p, 4, p.length - 4, UTF_8)
                val attrs = serverFirst.split(",").map { a =>
                  a.substring(0, 1) -> a.substring(2)
                }.toMap
                val fullNonce = attrs("r")
                // RFC 5802 MUST: the combined nonce begins with ours —
                // a server replaying someone else's exchange fails here
                // before any proof is computed
                require(fullNonce.startsWith(clientNonce),
                  "SCRAM server nonce does not begin with the client nonce")
                val salt = java.util.Base64.getDecoder.decode(attrs("s"))
                val iters = attrs("i").toInt
                salted = Scram.saltedPassword(pwd, salt, iters)
                val clientFinalWoProof = s"c=biws,r=$fullNonce"
                val authMessage =
                  s"$clientFirstBare,$serverFirst,$clientFinalWoProof"
                val proof = java.util.Base64.getEncoder.encodeToString(
                  Scram.clientProof(salted, authMessage))
                expectedServerSig = java.util.Base64.getEncoder.encodeToString(
                  Scram.serverSignature(salted, authMessage))
                send('p', s"$clientFinalWoProof,p=$proof".getBytes(UTF_8))
              case 12 => // AuthenticationSASLFinal: v=<server signature>
                val fin = new String(p, 4, p.length - 4, UTF_8)
                require(fin == s"v=$expectedServerSig",
                  "SCRAM server signature mismatch — the server does not " +
                    "know the password (possible MITM); aborting")
              case other => throw new IllegalStateException(
                s"unsupported auth request $other")
            }
          case ('S', _) | ('K', _) | ('N', _) => // params/keydata/notice
          case ('Z', _) => ready = true
          case ('E', p) => fail(p)
          case (t, _) => throw new IllegalStateException(s"unexpected '$t' in startup")
        }
      }
    }

    // ----------------------------------------------------- simple query

    /** Run a simple-protocol query, returning (column names, rows as
      * text cells).
      */
    private def queryWithCols(sql: String)
        : (Seq[String], Seq[Seq[Option[String]]]) = {
      send('Q', cstr(sql))
      var cols: Seq[String] = Nil
      val rows = mutable.ArrayBuffer.empty[Seq[Option[String]]]
      var done = false
      while (!done) {
        recv() match {
          case ('T', p) => // RowDescription
            val bb = java.nio.ByteBuffer.wrap(p)
            val n = bb.getShort.toInt
            cols = Seq.fill(n) {
              val start = bb.position()
              while (bb.get() != 0) ()
              val name = new String(p, start, bb.position() - start - 1, UTF_8)
              bb.position(bb.position() + 18) // oid/attnum/typoid/len/mod/fmt
              name
            }
          case ('D', p) =>
            val bb = java.nio.ByteBuffer.wrap(p)
            val n = bb.getShort.toInt
            rows += Seq.fill(n) {
              val len = bb.getInt
              if (len < 0) None
              else {
                val a = new Array[Byte](len); bb.get(a); Some(new String(a, UTF_8))
              }
            }
          case ('C', _) => // CommandComplete
          case ('Z', _) => done = true
          case ('N', _) => // notice
          case ('E', p) => fail(p)
          case (t, _) => throw new IllegalStateException(s"unexpected '$t' in query")
        }
      }
      (cols, rows.toSeq)
    }

    /** Run a replication command, return its rows as string cells. */
    private def query(sql: String): Seq[Seq[Option[String]]] =
      queryWithCols(sql)._2

    /** SNAPSHOT read over the SAME connection and protocol (reference
      * snapshotter.rs:70 `query_raw` parity — the reference's snapshot
      * is a plain SELECT too, not COPY): rows as text cells with their
      * RowDescription column names. Run between
      * `createSlot(useSnapshot = true)` and `startReplication` — the
      * walsender connection's transaction sees the slot's exported
      * snapshot, which is the gapless-handoff contract. With this the
      * Postgres path needs NO JDBC driver at all.
      */
    def select(sql: String): (Seq[String], Seq[Seq[Option[String]]]) =
      queryWithCols(sql)

    def identifySystem(): SystemInfo = {
      val r = query("IDENTIFY_SYSTEM").head
      SystemInfo(r(0).get, r(1).get.toInt, r(2).get, r.lift(3).flatten)
    }

    /** `CREATE_REPLICATION_SLOT "<slot>" LOGICAL "pgoutput"
      * USE_SNAPSHOT` (replication_slot_helper.rs:30) — returns the
      * consistent point; the exported snapshot read at that point plus
      * streaming FROM that point is the gapless handoff.
      */
    def createSlot(slot: String, useSnapshot: Boolean = true): SlotInfo = {
      val opts = if (useSnapshot) " USE_SNAPSHOT" else ""
      val r = query(
        s"""CREATE_REPLICATION_SLOT "$slot" LOGICAL "pgoutput"$opts""").head
      SlotInfo(r(0).get, r(1).get, r(2), r(3).getOrElse("pgoutput"))
    }

    // ------------------------------------------------------- streaming

    /** `START_REPLICATION SLOT "<slot>" LOGICAL <lsn> (proto_version
      * '1', publication_names '"<pub>"')` (replicator.rs:262) — enters
      * CopyBoth mode and invokes `handler` per replication message
      * until `maxMessages` frames or server CopyDone. Keepalives with
      * reply-requested are answered immediately; every XLogData is
      * acknowledged with a Standby Status Update carrying its end LSN
      * (the slot-advance contract). Returns the last acknowledged LSN.
      */
    def startReplication(slot: String, publication: String, startLsn: Long,
        maxMessages: Long = Long.MaxValue)(handler: WalMessage => Unit): Long = {
      send('Q', cstr(
        s"""START_REPLICATION SLOT "$slot" LOGICAL ${lsnText(startLsn)} """ +
          s"""(proto_version '1', publication_names '"$publication"')"""))
      recv() match {
        case ('W', _) => // CopyBothResponse
        case ('E', p) => fail(p)
        case (t, _) => throw new IllegalStateException(s"expected CopyBoth, got '$t'")
      }
      var acked = startLsn
      var seen = 0L
      var open = true
      while (open && seen < maxMessages) {
        recv() match {
          case ('d', p) if p.nonEmpty && p(0) == 'w' =>
            val bb = java.nio.ByteBuffer.wrap(p)
            bb.get() // 'w'
            val walStart = bb.getLong
            val walEnd = bb.getLong
            handler(WalMessage(walStart, p))
            acked = math.max(acked, walEnd)
            statusUpdate(acked, replyRequested = false)
            seen += 1
          case ('d', p) if p.nonEmpty && p(0) == 'k' =>
            val bb = java.nio.ByteBuffer.wrap(p)
            bb.get() // 'k'
            val walEnd = bb.getLong
            bb.getLong // clock
            val wantReply = bb.get() != 0
            acked = math.max(acked, walEnd)
            if (wantReply) statusUpdate(acked, replyRequested = false)
            handler(WalMessage(0L, p))
            seen += 1
          case ('c', _) => open = false // server CopyDone
          case ('C', _) | ('Z', _) => open = false
          case ('E', p) => fail(p)
          case ('N', _) =>
          case (t, _) => throw new IllegalStateException(s"unexpected '$t' in stream")
        }
      }
      acked
    }

    /** Standby Status Update ('r' inside CopyData): written = flushed =
      * applied = `lsn` (dozer acks the same three, replicator.rs).
      */
    private def statusUpdate(lsn: Long, replyRequested: Boolean): Unit = {
      val b = new ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.writeByte('r')
      d.writeLong(lsn); d.writeLong(lsn); d.writeLong(lsn)
      d.writeLong((System.currentTimeMillis() - 946684800000L) * 1000L) // pg epoch µs
      d.writeByte(if (replyRequested) 1 else 0)
      d.flush()
      send('d', b.toByteArray)
    }

    override def close(): Unit = {
      try send('X', Array.emptyByteArray) // Terminate
      catch { case _: Exception => }
      socket.close()
    }
  }

  /** The gapless snapshot-then-stream handoff (replication_slot_helper
    * USE_SNAPSHOT contract): create the slot (freezing a consistent
    * point + exported snapshot), run `snapshot` (a JDBC/batch read the
    * caller performs AT that snapshot), then stream from the consistent
    * point — every change after the snapshot appears exactly once in
    * the stream.
    */
  def snapshotThenStream[A](session: Session, slot: String,
      publication: String, maxMessages: Long)(
      snapshot: SlotInfo => A)(handler: WalMessage => Unit): (A, Long) = {
    val info = session.createSlot(slot)
    val snap = snapshot(info)
    val last = session.startReplication(slot, publication,
      lsn(info.consistentPoint), maxMessages)(handler)
    (snap, last)
  }
}
