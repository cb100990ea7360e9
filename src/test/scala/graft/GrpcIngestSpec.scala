package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.collection.mutable

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel._
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.{ArrowIngest, GrpcIngest, Hpack, PushBuffer, Sources}

/** gRPC ingest service over real HTTP/2 — interop is proven against
  * netty's INDEPENDENT client implementation (bundled with Spark):
  * netty Huffman-codes and incrementally indexes its HPACK header
  * blocks, negotiates SETTINGS, and enforces stream states, so a
  * protocol error in the hand-rolled server fails these tests.
  *
  * Reference contract: /root/reference/dozer-ingestion/grpc/src/
  * ingest.rs (service surface + error strings) and adapter/
  * {default,arrow}.rs (record mapping).
  */
class GrpcIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ----------------------------------------------------- HPACK unit layer

  test("hpack decodes the RFC 7541 C.4 Huffman request sequence " +
      "(shared dynamic table across blocks)") {
    val d = new Hpack.Decoder()
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(d.decode(hex("828684418cf1e3c2e5f23a6ba0ab90f4ff")) == Seq(
      ":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
      ":authority" -> "www.example.com"))
    assert(d.decode(hex("828684be5886a8eb10649cbf")) == Seq(
      ":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
      ":authority" -> "www.example.com", "cache-control" -> "no-cache"))
    assert(d.decode(hex(
      "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf")) == Seq(
      ":method" -> "GET", ":scheme" -> "https", ":path" -> "/index.html",
      ":authority" -> "www.example.com", "custom-key" -> "custom-value"))
  }

  test("hpack survives fuzzed header blocks: every outcome is a clean " +
      "return or a loud exception, never a hang or runaway") {
    val rnd = new scala.util.Random(20260814L)
    (0 until 2000).foreach { i =>
      val block = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(block)
      val d = new Hpack.Decoder()
      try { d.decode(block); () }
      catch { case _: Exception => () } // loud is fine; silence the loop
    }
    // huffman decode on random payloads likewise terminates
    (0 until 2000).foreach { i =>
      val bytes = new Array[Byte](rnd.nextInt(32) + 1)
      rnd.nextBytes(bytes)
      try { Hpack.huffmanDecode(bytes, 0, bytes.length); () }
      catch { case _: Exception => () }
    }
  }

  test("http2 server closes connections with a bad preface instead of " +
      "interpreting garbage") {
    val server = GrpcIngest.start(0, Map.empty)
    try {
      val sock = new java.net.Socket("127.0.0.1", server.port)
      try {
        sock.setSoTimeout(5000)
        sock.getOutputStream.write(
          "GET / HTTP/1.1\r\nHost: x\r\n\r\n".getBytes("US-ASCII"))
        sock.getOutputStream.flush()
        // server must drop the connection (EOF), not answer
        val drained = try {
          while (sock.getInputStream.read() >= 0) ()
          true
        } catch { case _: java.net.SocketException => true }
        assert(drained)
      } finally sock.close()
    } finally server.stop()
  }

  test("hpack round-trips its own literal encoding") {
    val d = new Hpack.Decoder()
    val hs = Seq(":status" -> "200", "content-type" -> "application/grpc",
      "grpc-status" -> "0", "x-unicode" -> "üñïçødé")
    assert(d.decode(Hpack.encode(hs)) == hs)
  }

  // --------------------------------------------------- netty test client

  /** One gRPC call over a netty HTTP/2 connection: returns
    * (headers+trailers merged, response gRPC messages).
    */
  private final class NettyH2(port: Int) {
    private val group = new NioEventLoopGroup(1)
    private val bootstrap = new Bootstrap()
      .group(group)
      .channel(classOf[NioSocketChannel])
      .handler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          ch.pipeline().addLast(
            Http2FrameCodecBuilder.forClient().build(),
            new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
        }
      })
    private val channel = bootstrap.connect("127.0.0.1", port).sync().channel()

    def call(path: String, messages: Seq[Array[Byte]],
        extraHeaders: Seq[(String, String)] = Nil)
        : (Map[String, String], Seq[Array[Byte]]) =
      send(path, messages.zipWithIndex.map { case (m, i) =>
        val framed = new Array[Byte](5 + m.length)
        framed(1) = ((m.length >> 24) & 0xff).toByte
        framed(2) = ((m.length >> 16) & 0xff).toByte
        framed(3) = ((m.length >> 8) & 0xff).toByte
        framed(4) = (m.length & 0xff).toByte
        System.arraycopy(m, 0, framed, 5, m.length)
        framed
      }, extraHeaders)

    /** Like call() but the chunks go on the wire verbatim (lets a test
      * craft bad gRPC framing, e.g. the compressed flag).
      */
    def send(path: String, chunks: Seq[Array[Byte]],
        extraHeaders: Seq[(String, String)] = Nil)
        : (Map[String, String], Seq[Array[Byte]]) = {
      val done = new CountDownLatch(1)
      val headers = mutable.Map.empty[String, String]
      val body = new java.io.ByteArrayOutputStream()
      val streamCh = new Http2StreamChannelBootstrap(channel)
        .handler(new ChannelInitializer[Channel] {
          override def initChannel(ch: Channel): Unit = {
            ch.pipeline().addLast(new SimpleChannelInboundHandler[Http2StreamFrame]() {
              override def channelRead0(ctx: ChannelHandlerContext,
                  frame: Http2StreamFrame): Unit = frame match {
                case h: Http2HeadersFrame =>
                  h.headers().forEach { e =>
                    headers(e.getKey.toString) = e.getValue.toString
                  }
                  if (h.isEndStream) done.countDown()
                case d: Http2DataFrame =>
                  val buf = new Array[Byte](d.content().readableBytes())
                  d.content().readBytes(buf)
                  body.write(buf)
                  if (d.isEndStream) done.countDown()
                case _ => ()
              }
            })
          }
        })
        .open().sync().getNow
      val hs = new DefaultHttp2Headers()
        .method("POST").scheme("http").path(path)
        .authority(s"127.0.0.1:$port")
      hs.add("content-type", "application/grpc")
      hs.add("te", "trailers")
      extraHeaders.foreach { case (k, v) => hs.add(k, v) }
      streamCh.write(new DefaultHttp2HeadersFrame(hs, false))
      chunks.zipWithIndex.foreach { case (c, i) =>
        streamCh.write(new DefaultHttp2DataFrame(
          Unpooled.wrappedBuffer(c), i == chunks.length - 1))
      }
      if (chunks.isEmpty)
        streamCh.write(new DefaultHttp2DataFrame(Unpooled.EMPTY_BUFFER, true))
      streamCh.flush()
      assert(done.await(20, TimeUnit.SECONDS), "gRPC call timed out")
      // split response body into gRPC messages
      val bytes = body.toByteArray
      val msgs = mutable.ArrayBuffer.empty[Array[Byte]]
      var off = 0
      while (bytes.length - off >= 5) {
        val len = ((bytes(off + 1) & 0xff) << 24) | ((bytes(off + 2) & 0xff) << 16) |
          ((bytes(off + 3) & 0xff) << 8) | (bytes(off + 4) & 0xff)
        msgs += java.util.Arrays.copyOfRange(bytes, off + 5, off + 5 + len)
        off += 5 + len
      }
      (headers.toMap, msgs.toSeq)
    }

    def close(): Unit = {
      channel.close().sync()
      group.shutdownGracefully(0, 1, TimeUnit.SECONDS).sync()
      ()
    }
  }

  // ------------------------------------------------------ request builders

  import GrpcIngest.Pbuf

  private def value(build: Pbuf.Writer => Pbuf.Writer): Pbuf.Writer =
    build(new Pbuf.Writer())

  private def ingestRequest(schema: String, typ: Int, old: Seq[Pbuf.Writer],
      nw: Seq[Pbuf.Writer], seqNo: Long): Array[Byte] = {
    val w = new Pbuf.Writer().str(1, schema).int(2, typ.toLong)
    old.foreach(v => w.embedded(3, v))
    nw.foreach(v => w.embedded(4, v))
    w.int(5, seqNo).result
  }

  private val usersSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("active", BooleanType)))

  private def userVals(id: Long, name: String, score: Double,
      active: Boolean): Seq[Pbuf.Writer] = Seq(
    value(_.int(3, id)), value(_.str(7, name)),
    value(_.fixed64(5, java.lang.Double.doubleToLongBits(score))),
    value(_.int(6, if (active) 1L else 0L)))

  // -------------------------------------------------------------- service

  test("unary ingest: typed records land as envelopes; seq_no echoes; " +
      "repeat calls on one connection reuse the hpack dynamic table") {
    PushBuffer.clear("grpc-t1")
    val server = GrpcIngest.start(0,
      Map("users" -> GrpcIngest.TableSpec(usersSchema, "grpc-t1")))
    val client = new NettyH2(server.port)
    try {
      val (h1, m1) = client.call("/dozer.ingest.IngestService/ingest",
        Seq(ingestRequest("users", GrpcIngest.OpInsert, Nil,
          userVals(1L, "ada", 9.5, active = true), 41L)))
      assert(h1("grpc-status") == "0", h1)
      assert(m1.length == 1)
      // IngestResponse{seq_no} echo (ingest.rs:60-66)
      val p = Pbuf(m1.head)
      assert(p.readTag() == ((1, 0)) && p.readVarint() == 41L)

      // second call on the SAME connection — netty's encoder now emits
      // indexed fields against its dynamic table
      val (h2, _) = client.call("/dozer.ingest.IngestService/ingest",
        Seq(ingestRequest("users", GrpcIngest.OpInsert, Nil,
          userVals(2L, "üñïçødé ☃", -0.25, active = false), 42L)))
      assert(h2("grpc-status") == "0", h2)

      val evs = PushBuffer.slice("grpc-t1", 0L, 10L)
      assert(evs.length == 2)
      assert(evs(0).value.contains(""""op":"insert""""))
      assert(evs(0).value.contains(""""name":"ada""""))
      assert(evs(1).value.contains("üñïçødé ☃"))
    } finally { client.close(); server.stop() }
  }

  test("gRPC over TLS: the server advertises h2 via ALPN, the pinned " +
      "client negotiates it and the typed ingest round-trips encrypted; " +
      "an unpinned client is refused at the handshake") {
    PushBuffer.clear("grpc-tls")
    val server = GrpcIngest.start(0,
      Map("users" -> GrpcIngest.TableSpec(usersSchema, "grpc-tls")),
      tls = Some(TestTls.serverContext))
    val client = new graft.sources.GrpcClient("127.0.0.1", server.port,
      ssl = Some(graft.cdc.Tls.socketFactory(
        TestTls.truststorePath, TestTls.password)))
    try {
      val (h, m) = client.call("/dozer.ingest.IngestService/ingest",
        Seq(ingestRequest("users", GrpcIngest.OpInsert, Nil,
          userVals(7L, "tls-user", 1.5, active = true), 99L)))
      assert(h("grpc-status") == "0", h)
      val p = Pbuf(m.head)
      assert(p.readTag() == ((1, 0)) && p.readVarint() == 99L)
      val evs = PushBuffer.slice("grpc-tls", 0L, 10L)
      assert(evs.length == 1 && evs.head.value.contains("tls-user"))

      // unpinned client: the self-signed cert fails the trust check
      intercept[Exception] {
        new graft.sources.GrpcClient("127.0.0.1", server.port,
          ssl = Some(graft.cdc.Tls.defaultFactory()))
      }
    } finally { client.close(); server.stop() }
  }

  test("client-streaming ingest_stream: insert/update/delete decode into " +
      "ChangeModel rows through the push scan") {
    PushBuffer.clear("grpc-t2")
    val server = GrpcIngest.start(0,
      Map("users" -> GrpcIngest.TableSpec(usersSchema, "grpc-t2")))
    val client = new NettyH2(server.port)
    try {
      val msgs = Seq(
        ingestRequest("users", GrpcIngest.OpInsert, Nil,
          userVals(1L, "ada", 1.0, active = true), 1L),
        ingestRequest("users", GrpcIngest.OpInsert, Nil,
          userVals(2L, "bob", 2.0, active = true), 2L),
        ingestRequest("users", GrpcIngest.OpUpdate,
          userVals(2L, "bob", 2.0, active = true),
          userVals(2L, "bob", 7.0, active = false), 3L),
        ingestRequest("users", GrpcIngest.OpDelete,
          userVals(1L, "ada", 1.0, active = true), Nil, 4L))
      val (h, m) = client.call("/dozer.ingest.IngestService/ingest_stream", msgs)
      assert(h("grpc-status") == "0", h)
      val p = Pbuf(m.head)
      assert(p.readTag() == ((1, 0)) && p.readVarint() == 4L) // last seq_no

      val feed = Sources.pushSnapshot(spark, "grpc-t2")
      val changes = GrpcIngest.changes(feed, "users", usersSchema)
      val rows = changes.orderBy("_seq", "_op").collect().toSeq
      assert(rows.map(r => (r.getAs[String]("_op"), r.getAs[Long]("id"))) == Seq(
        ("insert", 1L), ("insert", 2L),
        ("update_postimage", 2L), ("update_preimage", 2L),
        ("delete", 1L)))
      val post = rows.find(_.getAs[String]("_op") == "update_postimage").get
      assert(post.getAs[Double]("score") == 7.0 && !post.getAs[Boolean]("active"))

      // materialized state: ada deleted, bob at post-image
      val state = graft.cdc.ChangeModel.latestImages(changes, Seq("id"))
      assert(state.count() == 1)
      assert(state.head().getAs[String]("name") == "bob")
    } finally { client.close(); server.stop() }
  }

  test("ingest_arrow: IPC frames round-trip through the wire into " +
      "ArrowIngest.changes") {
    PushBuffer.clear("grpc-t3")
    val rowSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val server = GrpcIngest.start(0,
      Map("metrics" -> GrpcIngest.TableSpec(rowSchema, "grpc-t3")))
    val client = new NettyH2(server.port)
    try {
      val frame = ArrowIngest.encodePartition(
        Seq(Row(10L, "x"), Row(11L, "y")).iterator, rowSchema, 1024)
      val req = new Pbuf.Writer().str(1, "metrics").bytes(2, frame)
        .int(3, 9L).result
      val (h, m) = client.call("/dozer.ingest.IngestService/ingest_arrow", Seq(req))
      assert(h("grpc-status") == "0", h)
      val p = Pbuf(m.head)
      assert(p.readTag() == ((1, 0)) && p.readVarint() == 9L)

      val feed = Sources.pushSnapshot(spark, "grpc-t3")
      val rows = ArrowIngest.changes(feed, "metrics", rowSchema)
        .orderBy("_seq").collect().toSeq
      assert(rows.map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))) ==
        Seq((10L, "x"), (11L, "y")))
      assert(rows.forall(_.getAs[String]("_op") == "insert"))
    } finally { client.close(); server.stop() }
  }

  test("error parity: unknown schema → NOT_FOUND with the reference " +
      "message; unknown method → UNIMPLEMENTED; compressed flag rejected") {
    PushBuffer.clear("grpc-t4")
    val server = GrpcIngest.start(0,
      Map("users" -> GrpcIngest.TableSpec(usersSchema, "grpc-t4")))
    val client = new NettyH2(server.port)
    try {
      val (h1, _) = client.call("/dozer.ingest.IngestService/ingest",
        Seq(ingestRequest("ghost", GrpcIngest.OpInsert, Nil,
          userVals(1L, "x", 0.0, active = true), 1L)))
      assert(h1("grpc-status") == "5")
      assert(h1("grpc-message").contains("schema name not found: ghost"))

      val (h2, _) = client.call("/dozer.ingest.IngestService/nope", Seq(
        Array[Byte](0)))
      assert(h2("grpc-status") == "12")

      // compressed-flag message: flag byte 1 → UNIMPLEMENTED
      val msg = ingestRequest("users", GrpcIngest.OpInsert, Nil,
        userVals(1L, "x", 0.0, active = true), 1L)
      val framed = new Array[Byte](5 + msg.length)
      framed(0) = 1
      framed(4) = msg.length.toByte
      System.arraycopy(msg, 0, framed, 5, msg.length)
      val (h3, _) = client.send("/dozer.ingest.IngestService/ingest", Seq(framed))
      assert(h3("grpc-status") == "12")
      assert(h3("grpc-message").contains("compressed"))

      // truncated message (body shorter than the declared length) → INTERNAL
      val (h4, _) = client.send("/dozer.ingest.IngestService/ingest",
        Seq(Array[Byte](0, 0, 0, 0, 99, 1, 2, 3)))
      assert(h4("grpc-status") == "13")
      assert(h4("grpc-message").contains("truncated"))

      assert(PushBuffer.retained("grpc-t4") == 0)
    } finally { client.close(); server.stop() }
  }

  test("field-count and type mismatches surface as INTERNAL with the " +
      "reference message shape and nothing lands on the channel") {
    PushBuffer.clear("grpc-t5")
    val server = GrpcIngest.start(0,
      Map("users" -> GrpcIngest.TableSpec(usersSchema, "grpc-t5")))
    val client = new NettyH2(server.port)
    try {
      // 2 values vs 4 schema fields (default.rs NumFieldsMismatch)
      val (h1, _) = client.call("/dozer.ingest.IngestService/ingest",
        Seq(ingestRequest("users", GrpcIngest.OpInsert, Nil,
          Seq(value(_.int(3, 1L)), value(_.str(7, "x"))), 1L)))
      assert(h1("grpc-status") == "13")
      assert(h1("grpc-message").contains("ingestion stream error"))
      assert(h1("grpc-message").contains("mismatch"))

      // string value where double is declared (FieldTypeMismatch)
      val (h2, _) = client.call("/dozer.ingest.IngestService/ingest",
        Seq(ingestRequest("users", GrpcIngest.OpInsert, Nil,
          Seq(value(_.int(3, 1L)), value(_.str(7, "x")),
            value(_.str(7, "not-a-double")), value(_.int(6, 1L))), 2L)))
      assert(h2("grpc-status") == "13")
      assert(h2("grpc-message").contains("field type mismatch"))

      assert(PushBuffer.retained("grpc-t5") == 0)
    } finally { client.close(); server.stop() }
  }

  test("typed value matrix: timestamp, decimal, json, and null cells " +
      "decode per the default-adapter contract") {
    PushBuffer.clear("grpc-t6")
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("d", DecimalType(20, 4)),
      StructField("j", StringType), StructField("n", LongType)))
    val server = GrpcIngest.start(0,
      Map("t" -> GrpcIngest.TableSpec(schema, "grpc-t6")))
    val client = new NettyH2(server.port)
    try {
      val tsMsg = new Pbuf.Writer().int(1, 1704164645L).int(2, 123456000L)
      // rust_decimal 1234567/10^4 = 123.4567
      val decMsg = new Pbuf.Writer().int(1, 4L).int(2, 1234567L)
        .int(3, 0L).int(4, 0L).int(5, 0L)
      // google.protobuf.Value struct {"a": 1.5}
      val innerNumber =
        new Pbuf.Writer().fixed64(2, java.lang.Double.doubleToLongBits(1.5))
      val entry = new Pbuf.Writer().str(1, "a").embedded(2, innerNumber)
      val struct = new Pbuf.Writer().embedded(1, entry)
      val jsonMsg = new Pbuf.Writer().embedded(5, struct)

      val req = ingestRequest("t", GrpcIngest.OpInsert, Nil, Seq(
        value(_.embedded(10, tsMsg)), value(_.embedded(9, decMsg)),
        value(_.embedded(14, jsonMsg)), new Pbuf.Writer()), 5L)
      val (h, _) = client.call("/dozer.ingest.IngestService/ingest", Seq(req))
      assert(h("grpc-status") == "0", h)

      val feed = Sources.pushSnapshot(spark, "grpc-t6")
      val row = GrpcIngest.changes(feed, "t", schema).head()
      assert(row.getAs[java.sql.Timestamp]("ts") ==
        java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(1704164645L, 123456000L)))
      assert(row.getAs[java.math.BigDecimal]("d") ==
        new java.math.BigDecimal("123.4567"))
      assert(row.getAs[String]("j").contains("1.5"))
      assert(row.isNullAt(row.fieldIndex("n")))
      assert(GrpcIngest.decodeDecimal(decMsg.result)
        .compareTo(new java.math.BigDecimal("123.4567")) == 0)
    } finally { client.close(); server.stop() }
  }
}
