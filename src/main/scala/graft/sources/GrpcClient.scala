package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket

import scala.collection.mutable

/** Minimal gRPC CLIENT over h2c or h2-over-TLS — the counterpart
  * session role to [[GrpcIngest]]'s server, the same pairing as
  * PgReplication / MyReplication's native client sessions:
  * prior-knowledge HTTP/2 preface (h2c) or ALPN-negotiated `h2`
  * (RFC 7540 §3.3, TLS), [[Hpack]]-encoded request headers, gRPC
  * length-prefixed messages, trailer decoding. Used by the oracled
  * wire round-trip query (q102) and available to applications that
  * need to push into a remote dozer-protocol ingest endpoint.
  *
  * Flow control is honored: the client tracks the connection and
  * stream send windows (RFC 9113 §5.2, initial 65535) and consumes
  * WINDOW_UPDATE frames before sending more — without this any
  * request body over 64 KiB would violate the protocol.
  */
final class GrpcClient(host: String, port: Int,
    ssl: Option[javax.net.ssl.SSLSocketFactory] = None)
    extends AutoCloseable {
  private val sock: Socket = ssl match {
    case None => new Socket(host, port)
    case Some(f) =>
      val s = f.createSocket(host, port)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      val params = s.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      // ALPN: gRPC-over-TLS REQUIRES the h2 protocol token
      params.setApplicationProtocols(Array("h2"))
      s.setSSLParameters(params)
      s.startHandshake()
      require(s.getApplicationProtocol == "h2",
        s"grpc: server did not negotiate h2 via ALPN " +
          s"(got '${s.getApplicationProtocol}')")
      s
  }
  sock.setTcpNoDelay(true)
  private val in = new BufferedInputStream(sock.getInputStream)
  private val out = new BufferedOutputStream(sock.getOutputStream)
  private val hpack = new Hpack.Decoder()
  private var nextStream = 1
  private var connWindow = 65535L
  private val streamWindows = mutable.Map.empty[Int, Long]

  // connection preface + our SETTINGS
  out.write(Http2.Preface)
  Http2.writeFrame(out, Http2.TSettings, 0, 0, Array.emptyByteArray)
  out.flush()

  /** One call: send `messages` on a fresh stream, return
    * (headers+trailers, response messages).
    */
  def call(path: String, messages: Seq[Array[Byte]])
      : (Map[String, String], Seq[Array[Byte]]) = {
    val sid = nextStream
    nextStream += 2
    streamWindows(sid) = 65535L

    Http2.writeFrame(out, Http2.THeaders,
      Http2.FEndHeaders, sid, Hpack.encode(Seq(
        (":method", "POST"), (":scheme", "http"), (":path", path),
        (":authority", s"$host:$port"),
        ("content-type", "application/grpc"), ("te", "trailers"))))
    out.flush()

    val body = new java.io.ByteArrayOutputStream()
    messages.foreach { m =>
      body.write(Array[Byte](0,
        ((m.length >> 24) & 0xff).toByte, ((m.length >> 16) & 0xff).toByte,
        ((m.length >> 8) & 0xff).toByte, (m.length & 0xff).toByte))
      body.write(m)
    }
    val bytes = body.toByteArray
    var off = 0
    while (off < bytes.length) {
      val window = math.min(connWindow, streamWindows(sid))
      if (window <= 0) pump(sid, null, null) // wait for WINDOW_UPDATE
      else {
        val n = math.min(math.min(window, Http2.MaxFrameSize.toLong),
          (bytes.length - off).toLong).toInt
        val last = off + n == bytes.length
        Http2.writeFrame(out, Http2.TData,
          if (last) Http2.FEndStream else 0, sid,
          java.util.Arrays.copyOfRange(bytes, off, off + n))
        out.flush()
        connWindow -= n
        streamWindows(sid) -= n
        off += n
      }
    }
    if (bytes.isEmpty) {
      Http2.writeFrame(out, Http2.TData, Http2.FEndStream, sid,
        Array.emptyByteArray)
      out.flush()
    }

    // read until END_STREAM on our stream
    val headers = mutable.Map.empty[String, String]
    val respBody = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) done = pump(sid, headers, respBody)

    val rb = respBody.toByteArray
    val msgs = mutable.ArrayBuffer.empty[Array[Byte]]
    var p = 0
    while (rb.length - p >= 5) {
      val len = ((rb(p + 1) & 0xff) << 24) | ((rb(p + 2) & 0xff) << 16) |
        ((rb(p + 3) & 0xff) << 8) | (rb(p + 4) & 0xff)
      msgs += java.util.Arrays.copyOfRange(rb, p + 5, p + 5 + len)
      p += 5 + len
    }
    (headers.toMap, msgs.toSeq)
  }

  /** Read and process ONE frame; true when END_STREAM hit on `sid`. */
  private def pump(sid: Int, headers: mutable.Map[String, String],
      respBody: java.io.ByteArrayOutputStream): Boolean = {
    val f = Http2.readFrame(in)
    f.typ match {
      case Http2.TSettings =>
        if ((f.flags & Http2.FAck) == 0) {
          Http2.writeFrame(out, Http2.TSettings, Http2.FAck, 0,
            Array.emptyByteArray)
          out.flush()
        }
        false
      case Http2.TPing =>
        if ((f.flags & Http2.FAck) == 0) {
          Http2.writeFrame(out, Http2.TPing, Http2.FAck, 0, f.payload)
          out.flush()
        }
        false
      case Http2.TWindowUpdate =>
        val inc = (((f.payload(0) & 0x7f) << 24) | ((f.payload(1) & 0xff) << 16) |
          ((f.payload(2) & 0xff) << 8) | (f.payload(3) & 0xff)).toLong
        if (f.streamId == 0) connWindow += inc
        else streamWindows.updateWith(f.streamId)(_.map(_ + inc))
        false
      case Http2.THeaders =>
        val decoded = hpack.decode(
          Http2.stripPadding(Http2.THeaders, f.flags, f.payload))
        if (f.streamId == sid && headers != null)
          decoded.foreach { case (k, v) => headers(k) = v }
        f.streamId == sid && (f.flags & Http2.FEndStream) != 0
      case Http2.TData =>
        if (f.streamId == sid && respBody != null)
          respBody.write(Http2.stripPadding(Http2.TData, f.flags, f.payload))
        f.streamId == sid && (f.flags & Http2.FEndStream) != 0
      case Http2.TGoaway =>
        throw new IllegalStateException("grpc client: server sent GOAWAY")
      case _ => false
    }
  }

  override def close(): Unit = {
    try {
      Http2.writeFrame(out, Http2.TGoaway, 0, 0, new Array[Byte](8))
      out.flush()
    } catch { case _: Exception => () }
    sock.close()
  }
}
