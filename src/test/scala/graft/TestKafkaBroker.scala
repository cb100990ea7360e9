package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket

import graft.cdc.KafkaClient

/** Loopback mock Kafka broker (the documented wire protocol subset the
  * native client speaks: ApiVersions v0 / Metadata v1 / ListOffsets v1
  * / Fetch v4) serving appendable in-memory logs for one topic with
  * `nPartitions` partitions. Accepts any number of connections —
  * config runs open one session for planning and one per reader.
  */
final class TestKafkaBroker(topic: String, nPartitions: Int = 1) {
  private val logs = Array.fill(nPartitions)(
    new java.util.concurrent.CopyOnWriteArrayList[Array[Byte]]())
  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort
  def broker: String = s"127.0.0.1:$port"
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

  private val accept = new Thread(() => {
    try {
      while (!server.isClosed) {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), "test-kafka-conn")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: Exception => () }
  }, "test-kafka-accept")
  accept.setDaemon(true)
  accept.start()

  private def serve(sock: java.net.Socket): Unit = {
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
        apiKey match {
          case KafkaClient.ApiVersionsKey =>
            w.i16(0); w.i32(3)
            Seq((1, 0, 12), (2, 0, 7), (3, 0, 12)).foreach { case (k, lo, hi) =>
              w.i16(k); w.i16(lo); w.i16(hi)
            }
          case KafkaClient.ApiMetadata =>
            w.i32(1); w.i32(0); w.str("127.0.0.1"); w.i32(port); w.nstr(None)
            w.i32(0)
            w.i32(1); w.i16(0); w.str(topic); w.bool(false)
            w.i32(nPartitions)
            (0 until nPartitions).foreach { p =>
              w.i16(0); w.i32(p); w.i32(0)
              w.i32(1); w.i32(0); w.i32(1); w.i32(0)
            }
          case KafkaClient.ApiListOffsets =>
            r.i32(); r.i32(); r.str(); r.i32()
            val part = r.i32()
            val ts = r.i64()
            val off = if (ts == -2L) 0L else highWatermark(part)
            w.i32(1); w.str(topic)
            w.i32(1); w.i32(part); w.i16(0); w.i64(-1L); w.i64(off)
          case KafkaClient.ApiFetch =>
            r.i32(); r.i32(); r.i32(); r.i32(); r.i8()
            r.i32(); r.str(); r.i32()
            val part = r.i32()
            val wanted = r.i64()
            val serve = log(part).filter(b => lastOffset(b) >= wanted).take(4)
            val set = new KafkaClient.Writer
            serve.foreach(b => set.raw(b))
            val setBytes = set.result
            w.i32(0)
            w.i32(1); w.str(topic)
            w.i32(1); w.i32(part); w.i16(0)
            w.i64(highWatermark(part)); w.i64(highWatermark(part))
            w.i32(0)
            w.i32(setBytes.length); w.raw(setBytes)
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

  def close(): Unit = server.close()
}
