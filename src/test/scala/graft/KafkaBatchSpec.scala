package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.{ChangeModel, KafkaBatch}
import graft.cdc.KafkaBatch.{Encode, Rec}

/** Native Kafka RecordBatch v2 wire-codec tests (reference
  * dozer-ingestion/kafka consumes these frames via librdkafka; no
  * broker here, so every decode runs against bytes the sibling encoder
  * produced — the PgOutput/MyBinlog strategy).
  */
class KafkaBatchSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def framesDf(frames: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    frames.toDF("seq", "frame")
  }

  test("record batch round-trips: offsets, timestamps, keys, tombstones") {
    val batch = Encode.batch(baseOffset = 100L, baseTimestamp = 5000L,
      records = Seq(
        (5000L, "k1", """{"a":1}"""),
        (5007L, "k2", """{"a":2}"""),
        (5009L, null, null))) // null key + tombstone value
    val recs = KafkaBatch.decodeBatch(batch)
    assert(recs == Seq(
      Rec(100L, 5000L, "k1", """{"a":1}"""),
      Rec(101L, 5007L, "k2", """{"a":2}"""),
      Rec(102L, 5009L, null, null)))
  }

  test("varint framing survives large deltas and long values") {
    val big = "x" * 70000 // value length needs a 3-byte varint
    val batch = Encode.batch(7L, 0L, Seq((123456789L, "k", big)))
    val recs = KafkaBatch.decodeBatch(batch)
    assert(recs == Seq(Rec(7L, 123456789L, "k", big)))
  }

  test("CRC32C mismatch is loud; control batches decode to no records") {
    val good = Encode.batch(0L, 0L, Seq((0L, "k", "v")))
    val corrupt = good.clone()
    corrupt(good.length - 1) = (corrupt(good.length - 1) ^ 1).toByte
    val e = intercept[IllegalArgumentException] {
      KafkaBatch.decodeBatch(corrupt)
    }
    assert(e.getMessage.contains("CRC32C mismatch"))
    val control = Encode.batch(9L, 0L, Seq((0L, null, "commit-marker")),
      control = true)
    assert(KafkaBatch.decodeBatch(control).isEmpty)
  }

  test("compressed batches round-trip through every platform codec " +
      "(gzip/snappy/lz4-frame/zstd); garbage compressed payloads are loud") {
    val records = (0 until 50).map(i =>
      (1000L + i, s"k$i", if (i % 7 == 0) null else s"v$i" * 20))
    (1 to 4).foreach { codec =>
      val b = Encode.batch(10L, 1000L, records, codec = codec)
      // actually smaller than the plain form for this redundant payload
      val recs = KafkaBatch.decodeBatch(b)
      assert(recs.length == 50, s"codec $codec")
      assert(recs.head == KafkaBatch.Rec(10L, 1000L, "k0", null))
      assert(recs(1).value == "v1" * 20, s"codec $codec")
      assert(recs.map(_.offset) == (10L until 60L), s"codec $codec")
    }
    // a batch claiming gzip whose records block is not gzip → loud
    val good = Encode.batch(0L, 0L, Seq((0L, "k", "v")))
    val tampered = good.clone()
    tampered(22) = 1 // gzip
    val crc = new java.util.zip.CRC32C
    crc.update(tampered, 21, tampered.length - 21)
    java.nio.ByteBuffer.wrap(tampered).putInt(17, crc.getValue.toInt)
    intercept[Exception] { KafkaBatch.decodeBatch(tampered) }
  }

  test("segment split walks batchLength framing; garbage tails are loud") {
    val b1 = Encode.batch(0L, 0L, Seq((0L, "a", "1"), (1L, "b", "2")))
    val b2 = Encode.batch(2L, 10L, Seq((10L, "c", "3")))
    val seg = Encode.segment(Seq(b1, b2))
    val parts = KafkaBatch.splitSegment(seg)
    assert(parts.length == 2)
    assert(parts.map(p => KafkaBatch.decodeBatch(p).map(_.offset)) ==
      Seq(Seq(0L, 1L), Seq(2L)))
    intercept[IllegalArgumentException] {
      KafkaBatch.splitSegment(seg ++ Array[Byte](1, 2, 3))
    }
  }

  test("records() distributed decode; lenient + malformed dead-letter pair") {
    val good1 = Encode.batch(0L, 1000L, Seq((1000L, "k1", "v1")))
    val corrupt = good1.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 1).toByte
    val good2 = Encode.batch(1L, 2000L, Seq((2000L, "k2", "v2")))
    val frames = Seq(10L -> good1, 11L -> corrupt, 12L -> good2)
    // strict is loud
    intercept[org.apache.spark.SparkException] {
      KafkaBatch.records(framesDf(frames)).collect()
    }
    // lenient survives with the good records
    val ok = KafkaBatch.recordsLenient(framesDf(frames))
      .orderBy(ChangeModel.SeqCol).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSeq
    assert(ok == Seq((0L, "k1", "v1"), (1L, "k2", "v2")))
    val dlq = KafkaBatch.malformed(framesDf(frames)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dlq.map(_._1) == Seq(11L) && dlq.head._2.contains("CRC32C"))
  }

  test("segment files stream through binaryFile: batch + micro-batch paths") {
    import graft.sources.Sources
    val dir = java.nio.file.Files.createTempDirectory("graft_kafka_seg")
    def writeSeg(name: String, batches: Array[Byte]*): Unit =
      java.nio.file.Files.write(dir.resolve(name), Encode.segment(batches))
    writeSeg("00000000.log",
      Encode.batch(0L, 1000L, Seq((1000L, "a", "v0"), (1001L, "b", "v1"))),
      Encode.batch(2L, 2000L, Seq((2000L, "c", "v2"))))
    writeSeg("00000003.log",
      Encode.batch(3L, 3000L, Seq((3000L, "d", "v3"))))
    java.nio.file.Files.write(dir.resolve("ignored.txt"),
      "not a segment".getBytes) // pathGlobFilter skips non-.log files
    val snap = Sources.kafkaSegmentSnapshot(spark, dir.toString)
      .orderBy(ChangeModel.SeqCol).collect()
      .map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(snap == Seq((0L, "v0"), (1L, "v1"), (2L, "v2"), (3L, "v3")))
    val q = Sources.kafkaSegmentStream(spark, dir.toString)
      .writeStream.format("memory").queryName("kafka_seg_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "segment stream timed out")
    val streamed = spark.table("kafka_seg_out")
      .orderBy(ChangeModel.SeqCol).collect()
      .map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(streamed == snap)
  }

  test("debezium over kafka: values decode to change rows, offset is the seq") {
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val batch = Encode.batch(50L, 0L, Seq(
      (0L, "1", """{"after":{"id":1,"v":"a"},"op":"r"}"""),
      (1L, "1", """{"payload":{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"b"},"op":"u"}}"""),
      (2L, "2", """{"after":{"id":2,"v":"x"},"op":"r"}""")))
    val state = ChangeModel.applyChanges(
      KafkaBatch.debeziumChanges(framesDf(Seq(0L -> batch)), rowSchema),
      Seq("id"))
    assert(state.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "b"), (2L, "x")))
  }

  test("transactional attributes round-trip; control markers decode " +
      "their type; filterCommitted drops exactly the aborted ranges") {
    import KafkaBatch.Encode
    val txn = Encode.batchBytes(0L, 1000L,
      Seq((1000L, "k".getBytes, "v".getBytes)),
      producerId = 42L, transactional = true)
    val info = KafkaBatch.decodeBatchInfo(txn)
    assert(info.transactional && !info.control &&
      info.producerId == 42L && info.records.size == 1)
    val abortM = Encode.controlBatch(1L, 1001L, 42L, commit = false)
    val commitM = Encode.controlBatch(2L, 1002L, 42L, commit = true)
    assert(KafkaBatch.decodeBatchInfo(abortM).control &&
      KafkaBatch.decodeBatchInfo(abortM).controlType
        .contains(KafkaBatch.ControlAbort))
    assert(KafkaBatch.decodeBatchInfo(commitM).controlType
      .contains(KafkaBatch.ControlCommit))
    // read_uncommitted decode still skips control records
    assert(KafkaBatch.decodeBatchBytes(abortM).isEmpty)

    def tb(base: Long, pid: Long, v: String) = Encode.batchBytes(base,
      1000L + base, Seq((1000L + base, null, v.getBytes)),
      producerId = pid, transactional = true)
    val log = Seq(
      tb(0L, 7L, "dirty"),                                  // aborted
      tb(1L, 8L, "ok8"),                                    // committed
      Encode.controlBatch(2L, 1002L, 7L, commit = false),   // abort 7
      Encode.controlBatch(3L, 1003L, 8L, commit = true),    // commit 8
      tb(4L, 7L, "ok7"),                                    // 7's NEW txn
      Encode.controlBatch(5L, 1005L, 7L, commit = true),
      Encode.batchBytes(6L, 1006L,
        Seq((1006L, null, "plain".getBytes))))              // non-txn
    val got = KafkaBatch.filterCommitted(log, aborted = Seq((7L, 0L)))
      .map(r => new String(r.value, "UTF-8"))
    assert(got == Seq("ok8", "ok7", "plain"))
    // an empty aborted list keeps every transactional record
    assert(KafkaBatch.filterCommitted(log, Nil).size == 4)
  }
}
