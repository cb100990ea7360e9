package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{ServerSocket, Socket}

import scala.collection.mutable

/** HTTP/2 (RFC 9113) cleartext server framing — the transport under the
  * gRPC ingest service (/root/reference/dozer-ingestion/grpc/src/
  * connector.rs serves tonic on `http://host:port`; h2c with the
  * client connection preface is gRPC's documented wire).
  *
  * Hand-rolled on the JDK socket API like the project's other session
  * clients (PgReplication's walsender, MyReplication's binlog dump):
  * a blocking accept loop, one daemon thread per connection, frames
  * processed strictly in arrival order per connection (so stream state
  * needs no locking). Flow-control windows are replenished eagerly
  * after every DATA frame — this server's consumers (bounded
  * [[PushBuffer]] channels) provide the real backpressure, and a
  * blocked push propagates naturally: the connection thread stops
  * reading, TCP fills, the client's window runs dry.
  *
  * Interop is proven against an INDEPENDENT implementation: netty's
  * HTTP/2 client (bundled with Spark) drives this server in
  * GrpcIngestSpec, exercising Huffman-coded + incrementally-indexed
  * HPACK, SETTINGS/PING handshakes, and flow control.
  */
object Http2 {

  val Preface: Array[Byte] =
    "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes("US-ASCII")

  // frame types (RFC 9113 §6)
  val TData = 0x0
  val THeaders = 0x1
  val TPriority = 0x2
  val TRstStream = 0x3
  val TSettings = 0x4
  val TPushPromise = 0x5
  val TPing = 0x6
  val TGoaway = 0x7
  val TWindowUpdate = 0x8
  val TContinuation = 0x9

  // flags
  val FEndStream = 0x1
  val FEndHeaders = 0x4
  val FPadded = 0x8
  val FPriority = 0x20
  val FAck = 0x1

  val MaxFrameSize = 16384

  final case class Frame(typ: Int, flags: Int, streamId: Int, payload: Array[Byte])

  def readFrame(in: InputStream): Frame = {
    val hdr = readFully(in, 9)
    val len = ((hdr(0) & 0xff) << 16) | ((hdr(1) & 0xff) << 8) | (hdr(2) & 0xff)
    require(len <= (1 << 24), s"http2: frame length $len")
    val typ = hdr(3) & 0xff
    val flags = hdr(4) & 0xff
    val streamId = ((hdr(5) & 0x7f) << 24) | ((hdr(6) & 0xff) << 16) |
      ((hdr(7) & 0xff) << 8) | (hdr(8) & 0xff)
    Frame(typ, flags, streamId, readFully(in, len))
  }

  def writeFrame(out: OutputStream, typ: Int, flags: Int, streamId: Int,
      payload: Array[Byte]): Unit = {
    val len = payload.length
    require(len < (1 << 24), s"http2: frame too large ($len)")
    out.write(Array[Byte](
      ((len >> 16) & 0xff).toByte, ((len >> 8) & 0xff).toByte, (len & 0xff).toByte,
      typ.toByte, flags.toByte,
      ((streamId >> 24) & 0x7f).toByte, ((streamId >> 16) & 0xff).toByte,
      ((streamId >> 8) & 0xff).toByte, (streamId & 0xff).toByte))
    out.write(payload)
  }

  def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"http2: peer closed mid-frame ($off/$n)")
      off += r
    }
    buf
  }

  /** Strip PADDED/PRIORITY decoration from a HEADERS/DATA payload. */
  def stripPadding(typ: Int, flags: Int, payload: Array[Byte]): Array[Byte] = {
    var from = 0
    var to = payload.length
    if ((flags & FPadded) != 0) {
      val pad = payload(0) & 0xff
      from += 1
      to -= pad
      require(to >= from, "http2: padding exceeds payload")
    }
    if (typ == THeaders && (flags & FPriority) != 0) from += 5
    java.util.Arrays.copyOfRange(payload, from, to)
  }

  // --------------------------------------------------------------- server

  /** Per-stream inbound state. */
  private final class StreamState {
    var headerBlock = new java.io.ByteArrayOutputStream()
    var endStreamAfterHeaders = false
    var sink: StreamSink = null
  }

  /** The application seam: [[Handler.begin]] runs when a stream's
    * request headers are complete and returns the sink that consumes
    * its body INCREMENTALLY — DATA chunks are handed over as they
    * arrive (the reference's ingest_stream handles each message as it
    * is received, not after the stream ends), so a long-lived client
    * stream costs bounded memory: whatever the sink retains, which for
    * the gRPC layer is one partial message plus the bounded
    * [[PushBuffer]] channel.
    */
  trait Handler {
    def begin(streamHeaders: Seq[(String, String)], connection: ConnectionOps,
        streamId: Int): StreamSink
  }

  trait StreamSink {
    def onData(chunk: Array[Byte]): Unit
    def onEnd(): Unit
  }

  /** What a handler may do with the connection (thread-confined: only
    * the connection thread calls handlers, so writes are ordered).
    */
  final class ConnectionOps private[Http2] (out: OutputStream) {
    def sendHeaders(streamId: Int, headers: Seq[(String, String)],
        endStream: Boolean): Unit = {
      val block = Hpack.encode(headers)
      writeFrame(out, THeaders,
        FEndHeaders | (if (endStream) FEndStream else 0), streamId, block)
      out.flush()
    }
    def sendData(streamId: Int, data: Array[Byte]): Unit = {
      if (data.isEmpty) writeFrame(out, TData, 0, streamId, data)
      else {
        var off = 0
        while (off < data.length) {
          val n = math.min(MaxFrameSize, data.length - off)
          writeFrame(out, TData, 0, streamId,
            java.util.Arrays.copyOfRange(data, off, off + n))
          off += n
        }
      }
      out.flush()
    }
  }

  final class Server private[Http2] (ss: ServerSocket, accept: Thread) {
    def port: Int = ss.getLocalPort
    def stop(): Unit = { ss.close() }
  }

  /** Start an h2c server — or, with `tls`, an h2-over-TLS server that
    * advertises `h2` via ALPN (RFC 7540 §3.3; gRPC's required
    * transport on secured listeners). `handler` is invoked on the
    * connection thread for every completed request stream. The framing
    * layer is identical either way — TLS only wraps the byte streams.
    */
  def serve(port: Int, handler: Handler,
      tls: Option[javax.net.ssl.SSLContext] = None): Server = {
    val ss: ServerSocket = tls match {
      case None => new ServerSocket(port)
      case Some(ctx) =>
        val s = ctx.getServerSocketFactory.createServerSocket(port)
          .asInstanceOf[javax.net.ssl.SSLServerSocket]
        val params = s.getSSLParameters
        params.setApplicationProtocols(Array("h2"))
        s.setSSLParameters(params)
        s
    }
    val accept = new Thread(() => {
      try {
        while (!ss.isClosed) {
          val sock = ss.accept()
          val t = new Thread(() => runConnection(sock, handler),
            s"graft-h2c-${sock.getPort}")
          t.setDaemon(true)
          t.start()
        }
      } catch { case _: Exception => /* server closed */ }
    }, "graft-h2c-accept")
    accept.setDaemon(true)
    accept.start()
    new Server(ss, accept)
  }

  private def runConnection(sock: Socket, handler: Handler): Unit = {
    try {
      sock.setTcpNoDelay(true)
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)

      val preface = readFully(in, Preface.length)
      require(java.util.Arrays.equals(preface, Preface),
        "http2: bad connection preface")

      // our (empty = all defaults) SETTINGS
      writeFrame(out, TSettings, 0, 0, Array.emptyByteArray)
      out.flush()

      val hpack = new Hpack.Decoder()
      val ops = new ConnectionOps(out)
      val streams = mutable.Map.empty[Int, StreamState]
      var continuationOf = -1

      def finishHeaders(sid: Int, st: StreamState): Unit = {
        val headers = hpack.decode(st.headerBlock.toByteArray)
        st.headerBlock = new java.io.ByteArrayOutputStream()
        st.sink = handler.begin(headers, ops, sid)
        if (st.endStreamAfterHeaders) finishStream(sid, st)
      }

      def finishStream(sid: Int, st: StreamState): Unit = {
        st.sink.onEnd()
        streams.remove(sid)
      }

      var open = true
      while (open) {
        val f = readFrame(in)
        require(continuationOf < 0 || (f.typ == TContinuation &&
          f.streamId == continuationOf),
          "http2: header block interleaved with other frames")
        f.typ match {
          case TSettings =>
            if ((f.flags & FAck) == 0) {
              // honor nothing exotic (we never exceed default frame or
              // window limits in responses) but always acknowledge
              writeFrame(out, TSettings, FAck, 0, Array.emptyByteArray)
              out.flush()
            }
          case TPing =>
            if ((f.flags & FAck) == 0) {
              writeFrame(out, TPing, FAck, 0, f.payload)
              out.flush()
            }
          case THeaders =>
            val st = streams.getOrElseUpdate(f.streamId, new StreamState)
            st.endStreamAfterHeaders = (f.flags & FEndStream) != 0
            st.headerBlock.write(stripPadding(THeaders, f.flags, f.payload))
            if ((f.flags & FEndHeaders) != 0) finishHeaders(f.streamId, st)
            else continuationOf = f.streamId
          case TContinuation =>
            val st = streams.getOrElse(f.streamId,
              throw new IllegalStateException("http2: CONTINUATION w/o HEADERS"))
            st.headerBlock.write(f.payload)
            if ((f.flags & FEndHeaders) != 0) {
              continuationOf = -1
              finishHeaders(f.streamId, st)
            }
          case TData =>
            val st = streams.getOrElse(f.streamId,
              throw new IllegalStateException("http2: DATA w/o HEADERS"))
            require(st.sink != null, "http2: DATA before headers complete")
            val data = stripPadding(TData, f.flags, f.payload)
            if (data.nonEmpty) st.sink.onData(data)
            // replenish both windows for the full frame incl. padding
            if (f.payload.length > 0) {
              val inc = windowUpdatePayload(f.payload.length)
              writeFrame(out, TWindowUpdate, 0, 0, inc)
              writeFrame(out, TWindowUpdate, 0, f.streamId, inc)
              out.flush()
            }
            if ((f.flags & FEndStream) != 0) finishStream(f.streamId, st)
          case TRstStream =>
            streams.remove(f.streamId)
          case TGoaway =>
            open = false
          case TWindowUpdate | TPriority | TPushPromise =>
            () // responses are tiny (initial 64 KiB window suffices)
          case _ =>
            () // unknown frame types MUST be ignored (RFC 9113 §4.1)
        }
      }
    } catch {
      case _: EOFException => ()
      case _: java.net.SocketException => ()
    } finally {
      try sock.close() catch { case _: Exception => () }
    }
  }

  private def windowUpdatePayload(n: Int): Array[Byte] =
    Array[Byte](((n >> 24) & 0x7f).toByte, ((n >> 16) & 0xff).toByte,
      ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
}
