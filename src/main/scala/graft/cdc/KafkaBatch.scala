package graft.cdc

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Native Kafka RecordBatch v2 wire codec — the transport half of the
  * reference's Kafka connector
  * (/root/reference/dozer-ingestion/kafka/src/stream_consumer_basic.rs
  * consumes topic messages via librdkafka and maps each value through
  * the Debezium envelope decoder; connector.rs wires brokers/offsets).
  * No broker exists in this environment, so — exactly like the MySQL
  * binlog and pgoutput codecs — the PUBLIC wire format is implemented
  * natively instead: RecordBatch v2 (KIP-98, the format both on the
  * wire and in on-disk segment files since Kafka 0.11):
  *
  * {{{
  * baseOffset i64 | batchLength i32 | partitionLeaderEpoch i32 |
  * magic i8 (=2) | crc u32 (CRC32C of everything after this field) |
  * attributes i16 | lastOffsetDelta i32 | baseTimestamp i64 |
  * maxTimestamp i64 | producerId i64 | producerEpoch i16 |
  * baseSequence i32 | numRecords i32 | records…
  * }}}
  *
  * each record zigzag-varint framed:
  * {{{
  * length | attributes i8 | timestampDelta | offsetDelta |
  * keyLen | key | valueLen | value | nHeaders | (hKeyLen hKey hValLen hVal)…
  * }}}
  *
  * Decode is map-only over `(seq, batch)` rows — batches decode
  * independently, so a segment dump fans out across executors with no
  * shuffle, and `(offset = baseOffset + offsetDelta)` is the total
  * order (dozer's OpIdentifier for Kafka is exactly the message
  * offset). Values then feed the existing [[Debezium]] envelope
  * decoder — the reference's content contract on this transport.
  *
  * Scope: all four compression codecs decode (gzip via the JDK;
  * snappy / lz4-frame / zstd via the natives Spark already bundles) —
  * the records block decompresses as one stream per batch, exactly the
  * wire layout producers write; control batches (attribute bit 5) are
  * consumed and skipped like every consumer does; CRC32C (JDK-native
  * since Java 9) is verified on every batch.
  */
object KafkaBatch {

  /** One decoded record: Kafka offset (the resume token / `_seq`),
    * batch-relative timestamp, key and value as UTF-8 strings (null
    * preserved — tombstones keep a null value).
    */
  final case class Rec(offset: Long, tsMillis: Long, key: String, value: String)

  /** [[Rec]]'s binary twin — the raw key/value bytes, for topics whose
    * payloads are NOT UTF-8 text (Confluent-framed Avro, protobuf).
    */
  final case class RecB(offset: Long, tsMillis: Long, key: Array[Byte],
      value: Array[Byte])

  // --------------------------------------------------------------- decode

  private final class Reader(buf: Array[Byte], var pos: Int) {
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def i16(): Int = { val v = ByteBuffer.wrap(buf, pos, 2).getShort.toInt; pos += 2; v }
    def i32(): Int = { val v = ByteBuffer.wrap(buf, pos, 4).getInt; pos += 4; v }
    def i64(): Long = { val v = ByteBuffer.wrap(buf, pos, 8).getLong; pos += 8; v }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= buf.length, s"kafka: truncated ($n bytes at $pos)")
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
    /** Unsigned varint, then zigzag-decode (Kafka's varint = protobuf). */
    def varlong(): Long = {
      var x = 0L; var shift = 0
      var b = 0
      do {
        require(shift <= 63, "kafka: varint overflow")
        b = u8()
        x |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      (x >>> 1) ^ -(x & 1) // zigzag
    }
    def varint(): Int = varlong().toInt
  }

  /** Decode one RecordBatch v2 into UTF-8 string records. */
  def decodeBatch(batch: Array[Byte]): Seq[Rec] =
    decodeBatchBytes(batch).map(b => Rec(b.offset, b.tsMillis,
      if (b.key == null) null else new String(b.key, UTF_8),
      if (b.value == null) null else new String(b.value, UTF_8)))

  /** Decode one RecordBatch v2 into raw-byte records. Verifies magic
    * and CRC32C; skips the records of control batches (returning Nil,
    * like a read_uncommitted consumer).
    */
  def decodeBatchBytes(batch: Array[Byte]): Seq[RecB] = {
    val info = decodeBatchInfo(batch)
    if (info.control) Nil else info.records
  }

  /** Transaction markers (KIP-98 control record key `type`). */
  val ControlAbort = 0
  val ControlCommit = 1

  /** A batch with its TRANSACTION metadata — what read_committed
    * filtering needs: the producer id, the transactional attribute
    * (bit 4), the control attribute (bit 5), and for control batches
    * the marker type from the control record's key (i16 version,
    * i16 type: 0 = ABORT, 1 = COMMIT).
    */
  final case class BatchInfo(baseOffset: Long, producerId: Long,
      transactional: Boolean, control: Boolean, controlType: Option[Int],
      records: Seq[RecB])

  /** Full RecordBatch v2 decode INCLUDING control batches — the
    * metadata-bearing form [[decodeBatchBytes]] and read_committed
    * filtering share.
    */
  def decodeBatchInfo(batch: Array[Byte]): BatchInfo = {
    require(batch.length >= 61, s"kafka: batch shorter than the v2 header (${batch.length})")
    val r = new Reader(batch, 0)
    val baseOffset = r.i64()
    val batchLength = r.i32()
    require(batchLength == batch.length - 12,
      s"kafka: batchLength $batchLength != ${batch.length - 12}")
    r.i32() // partitionLeaderEpoch (not covered by crc)
    val magic = r.u8()
    require(magic == 2, s"kafka: magic $magic (only v2 batches are supported)")
    val crc = r.i32() & 0xffffffffL
    val crcStart = r.pos // attributes onward
    val c = new java.util.zip.CRC32C
    c.update(batch, crcStart, batch.length - crcStart)
    require(c.getValue == crc,
      f"kafka: CRC32C mismatch (stored 0x$crc%08x, computed 0x${c.getValue}%08x)")
    val attributes = r.i16()
    val codec = attributes & 0x07
    val isTransactional = (attributes & 0x10) != 0
    val isControl = (attributes & 0x20) != 0
    r.i32() // lastOffsetDelta
    val baseTimestamp = r.i64()
    r.i64() // maxTimestamp
    val producerId = r.i64()
    r.i16() // producerEpoch
    r.i32() // baseSequence
    val n = r.i32()
    require(n >= 0, s"kafka: negative record count $n")
    // compressed batches: the RECORDS block (everything after the
    // 61-byte header) is one compressed stream; every codec's
    // decompressor ships with Spark (gzip = JDK, snappy-java / lz4-java
    // frame / zstd-jni), so nothing is rejected any more
    val r2 = codec match {
      case 0 => r
      case c =>
        val compressed = java.util.Arrays.copyOfRange(batch, r.pos, batch.length)
        val in: java.io.InputStream =
          new java.io.ByteArrayInputStream(compressed)
        val stream = c match {
          case 1 => new java.util.zip.GZIPInputStream(in)
          case 2 => new org.xerial.snappy.SnappyInputStream(in)
          case 3 => new net.jpountz.lz4.LZ4FrameInputStream(in)
          case 4 => new com.github.luben.zstd.ZstdInputStream(in)
          case other => throw new IllegalArgumentException(
            s"kafka: unknown compression codec $other")
        }
        val plain = try stream.readAllBytes() finally stream.close()
        new Reader(plain, 0)
    }
    val records = Vector.fill(n) {
      val r = r2
      val len = r.varint()
      val end = r.pos + len
      r.u8() // record attributes (unused in v2)
      val tsDelta = r.varlong()
      val offDelta = r.varint()
      val keyLen = r.varint()
      val key = if (keyLen < 0) null else r.bytes(keyLen)
      val valLen = r.varint()
      val value = if (valLen < 0) null else r.bytes(valLen)
      val nHeaders = r.varint()
      var i = 0
      while (i < nHeaders) { // headers parsed (framing) and discarded
        val hk = r.varint(); r.bytes(math.max(hk, 0))
        val hv = r.varint(); if (hv > 0) r.bytes(hv)
        i += 1
      }
      require(r.pos == end, s"kafka: record framing off by ${end - r.pos}")
      RecB(baseOffset + offDelta, baseTimestamp + tsDelta, key, value)
    }
    val controlType =
      if (!isControl) None
      else records.headOption.flatMap(rec =>
        Option(rec.key).filter(_.length >= 4).map(k =>
          ByteBuffer.wrap(k, 2, 2).getShort.toInt))
    BatchInfo(baseOffset, producerId, isTransactional, isControl,
      controlType, records)
  }

  /** read_committed filtering (KIP-98, the consumer-side algorithm):
    * walk batches in offset order; when an aborted transaction's first
    * offset is reached its producer id becomes "aborting" and every
    * TRANSACTIONAL batch from that producer is dropped until its next
    * control marker; control batches themselves never yield records.
    * `aborted` is the Fetch response's aborted-transaction list
    * (producerId, firstOffset). Non-transactional batches always pass.
    */
  def filterCommitted(batches: Seq[Array[Byte]],
      aborted: Seq[(Long, Long)]): Seq[RecB] = {
    var pending = aborted.sortBy(_._2).toList
    val aborting = scala.collection.mutable.Set.empty[Long]
    val out = Vector.newBuilder[RecB]
    batches.foreach { b =>
      val info = decodeBatchInfo(b)
      while (pending.nonEmpty && pending.head._2 <= info.baseOffset) {
        aborting += pending.head._1
        pending = pending.tail
      }
      if (info.control) aborting -= info.producerId // marker ends the txn
      else if (!(info.transactional && aborting(info.producerId)))
        out ++= info.records
    }
    out.result()
  }

  /** Split a segment (concatenated batches — the on-disk log format)
    * into individual batch byte arrays using each header's batchLength.
    */
  def splitSegment(segment: Array[Byte]): Seq[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var pos = 0
    while (pos < segment.length) {
      require(segment.length - pos >= 12, "kafka: trailing garbage in segment")
      val len = ByteBuffer.wrap(segment, pos + 8, 4).getInt
      require(len > 0 && pos + 12 + len <= segment.length,
        s"kafka: bad batchLength $len at $pos")
      out += java.util.Arrays.copyOfRange(segment, pos, pos + 12 + len)
      pos += 12 + len
    }
    out.result()
  }

  private def toRecordRows(df: Dataset[Rec]): DataFrame =
    df.toDF()
      .select(col("offset").as(ChangeModel.SeqCol),
        (col("tsMillis") / 1000).cast("timestamp").as("ts"),
        col("key"), col("value"))

  /** Decode a DataFrame of `(seq, batch binary)` rows into
    * `(_seq = Kafka offset, ts, key, value)` — map-only, strict
    * (corrupt batches are loud; see [[recordsLenient]]/[[malformed]]).
    */
  def records(batches: DataFrame): DataFrame = {
    val spark = batches.sparkSession
    import spark.implicits._
    toRecordRows(batches.select(col("frame")).as[Array[Byte]]
      .flatMap(b => decodeBatch(b)))
  }

  /** Decode whole SEGMENT payloads (each a concatenation of batches —
    * the on-disk log format, e.g. rows from Spark's `binaryFile`
    * source): split on batchLength framing, then decode — still
    * map-only, so a directory of dumped segments fans out one task per
    * file. Works identically on batch and streaming inputs.
    */
  def recordsFromSegments(files: DataFrame,
      contentCol: String = "content"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    toRecordRows(files.select(col(contentCol)).as[Array[Byte]]
      .flatMap(seg => splitSegment(seg).iterator.flatMap(decodeBatch)))
  }

  /** Lenient + dead-letter pair (the [[PgOutput.changesLenient]]
    * contract): undecodable batches skip the stream and surface in
    * [[malformed]] as `(seq, reason)`.
    */
  def recordsLenient(batches: DataFrame): DataFrame = {
    val spark = batches.sparkSession
    import spark.implicits._
    batches.select(col("seq").cast("long"), col("frame"))
      .as[(Long, Array[Byte])]
      .flatMap { case (_, b) =>
        try decodeBatch(b) catch { case _: Exception => Nil }
      }
      .toDF()
      .select(col("offset").as(ChangeModel.SeqCol),
        (col("tsMillis") / 1000).cast("timestamp").as("ts"),
        col("key"), col("value"))
  }

  def malformed(batches: DataFrame): DataFrame = {
    val spark = batches.sparkSession
    import spark.implicits._
    batches.select(col("seq").cast("long"), col("frame"))
      .as[(Long, Array[Byte])]
      .flatMap { case (seq, b) =>
        try { decodeBatch(b); Nil }
        catch { case e: Exception =>
          Seq((seq, s"${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("")}"))
        }
      }.toDF("seq", "reason")
  }

  /** Kafka-transported Debezium CDC, end-to-end: record values through
    * the [[Debezium]] envelope decoder with the Kafka offset as the
    * change sequence — stream_consumer_basic.rs's exact composition.
    */
  def debeziumChanges(batches: DataFrame,
      rowSchema: org.apache.spark.sql.types.StructType): DataFrame =
    Debezium.decode(records(batches), "value", rowSchema,
      seq = Some(col(ChangeModel.SeqCol)))

  // --------------------------------------------------------------- encode

  /** Batch encoder — the capture-tool half (same strategy as
    * [[PgOutput.Encode]]/[[MyBinlog.Encode]]: every decode in the gate
    * runs against bytes this codec produced). Records are
    * `(tsMillis, key, value)`; offsets assign as baseOffset + index.
    */
  object Encode {
    private def varlong(d: DataOutputStream, v: Long): Unit = {
      var x = (v << 1) ^ (v >> 63) // zigzag
      while ((x & ~0x7fL) != 0) {
        d.writeByte(((x & 0x7f) | 0x80).toInt); x >>>= 7
      }
      d.writeByte(x.toInt)
    }

    private def record(tsDelta: Long, offDelta: Int,
        key: Array[Byte], value: Array[Byte]): Array[Byte] = {
      val body = new ByteArrayOutputStream()
      val d = new DataOutputStream(body)
      d.writeByte(0) // record attributes
      varlong(d, tsDelta)
      varlong(d, offDelta.toLong)
      if (key == null) varlong(d, -1L)
      else { varlong(d, key.length.toLong); d.write(key) }
      if (value == null) varlong(d, -1L)
      else { varlong(d, value.length.toLong); d.write(value) }
      varlong(d, 0L) // headers
      d.flush()
      val framed = new ByteArrayOutputStream()
      val fd = new DataOutputStream(framed)
      varlong(fd, body.size().toLong)
      fd.write(body.toByteArray)
      fd.flush()
      framed.toByteArray
    }

    /** [[batchBytes]] with UTF-8 string payloads. */
    def batch(baseOffset: Long, baseTimestamp: Long,
        records: Seq[(Long, String, String)], control: Boolean = false,
        codec: Int = 0): Array[Byte] =
      batchBytes(baseOffset, baseTimestamp,
        records.map { case (ts, k, v) =>
          (ts, if (k == null) null else k.getBytes(UTF_8),
            if (v == null) null else v.getBytes(UTF_8))
        }, control, codec)

    /** Encode one RecordBatch v2 from raw-byte payloads (control =
      * bit 5; `codec` 0=none 1=gzip 2=snappy 3=lz4 4=zstd compresses
      * the records block, the same platform codecs the decoder
      * accepts).
      */
    /** One transaction MARKER batch (KIP-98 control record: key =
      * version i16 + type i16, value = version i16 + coordinator epoch
      * i32) — what a transactional producer's commit/abort writes.
      */
    def controlBatch(baseOffset: Long, ts: Long, producerId: Long,
        commit: Boolean): Array[Byte] = {
      val key = ByteBuffer.allocate(4)
        .putShort(0).putShort(if (commit) 1 else 0).array()
      val value = new Array[Byte](6) // version 0, coordinator epoch 0
      batchBytes(baseOffset, ts, Seq((ts, key, value)), control = true,
        producerId = producerId, transactional = true)
    }

    def batchBytes(baseOffset: Long, baseTimestamp: Long,
        records: Seq[(Long, Array[Byte], Array[Byte])],
        control: Boolean = false, codec: Int = 0,
        producerId: Long = -1L, transactional: Boolean = false): Array[Byte] = {
      require(records.nonEmpty, "kafka: empty batch")
      val recBytes = records.zipWithIndex.map { case ((ts, k, v), i) =>
        record(ts - baseTimestamp, i, k, v)
      }
      val recordsBlock = {
        val plain = new ByteArrayOutputStream()
        recBytes.foreach(plain.write)
        codec match {
          case 0 => plain.toByteArray
          case c =>
            val out = new ByteArrayOutputStream()
            val z: java.io.OutputStream = c match {
              case 1 => new java.util.zip.GZIPOutputStream(out)
              case 2 => new org.xerial.snappy.SnappyOutputStream(out)
              case 3 => new net.jpountz.lz4.LZ4FrameOutputStream(out)
              case 4 => new com.github.luben.zstd.ZstdOutputStream(out)
              case other => throw new IllegalArgumentException(
                s"kafka: unknown compression codec $other")
            }
            z.write(plain.toByteArray); z.close()
            out.toByteArray
        }
      }
      val tail = new ByteArrayOutputStream() // attributes onward (crc'd)
      val t = new DataOutputStream(tail)
      t.writeShort((if (control) 0x20 else 0) |
        (if (transactional) 0x10 else 0) | (codec & 0x07))
      t.writeInt(records.length - 1)  // lastOffsetDelta
      t.writeLong(baseTimestamp)
      t.writeLong(records.map(_._1).max) // maxTimestamp
      t.writeLong(producerId)
      t.writeShort(-1) // producerEpoch
      t.writeInt(-1)   // baseSequence
      t.writeInt(records.length)
      tail.write(recordsBlock)
      t.flush()
      val crc = new java.util.zip.CRC32C
      crc.update(tail.toByteArray)
      val out = new ByteArrayOutputStream()
      val d = new DataOutputStream(out)
      d.writeLong(baseOffset)
      d.writeInt(4 + 1 + 4 + tail.size()) // partitionLeaderEpoch..end
      d.writeInt(-1) // partitionLeaderEpoch
      d.writeByte(2) // magic
      d.writeInt(crc.getValue.toInt)
      d.write(tail.toByteArray)
      d.flush()
      out.toByteArray
    }

    /** Concatenate batches into a segment (the on-disk log format). */
    def segment(batches: Seq[Array[Byte]]): Array[Byte] =
      batches.foldLeft(new ByteArrayOutputStream()) { (b, a) =>
        b.write(a); b
      }.toByteArray
  }
}
