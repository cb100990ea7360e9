package graft

import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{ArrowIngest, PushBuffer, Sources}

/** Arrow IPC ingest adapter (reference dozer-ingestion/grpc/src/adapter/
  * arrow.rs: IngestArrowRequest{schema_name, records=IPC stream} decoded
  * with StreamReader; every record maps to Operation::Insert).
  */
class ArrowIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val fullSchema = StructType(Seq(
    StructField("i", IntegerType), StructField("l", LongType),
    StructField("f", FloatType), StructField("d", DoubleType),
    StructField("s", StringType), StructField("b", BinaryType),
    StructField("bo", BooleanType), StructField("ts", TimestampType),
    StructField("nt", TimestampNTZType), StructField("dt", DateType)))

  private def fullRows = Seq(
    Row(1, 2L, 3.5f, 4.25, "hej", Array[Byte](1, 2, 3), true,
      Timestamp.valueOf("2024-01-02 03:04:05.123456"),
      java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5, 123456000),
      Date.valueOf("2024-03-04")),
    Row(null, null, null, null, null, null, null, null, null, null),
    Row(-7, Long.MaxValue, -0.5f, 1e300, "üñïçødé ☃", Array[Byte](),
      false, Timestamp.valueOf("1969-12-31 23:59:59.999999"),
      java.time.LocalDateTime.of(1969, 12, 31, 23, 59, 59, 999999000),
      Date.valueOf("1969-12-31")))

  test("full type matrix round-trips through IPC frames, nulls included") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(fullRows, 2), fullSchema)
    val back = ArrowIngest.decodeFrames(ArrowIngest.encodeFrames(df), fullSchema)
    assert(back.schema == fullSchema)
    val a = df.collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }).toSet
    val b = back.collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }).toSet
    assert(a == b)
  }

  test("one frame per input partition; batches capped at maxBatchRows") {
    import spark.implicits._
    val df = (1 to 100).toDF("n").repartition(4)
    val frames = ArrowIngest.encodeFrames(df, maxBatchRows = 8).collect()
    assert(frames.length == 4)
    val back = ArrowIngest.decodeFrames(
      spark.createDataset(frames.toSeq)(org.apache.spark.sql.Encoders.BINARY),
      df.schema)
    assert(back.select("n").collect().map(_.getInt(0)).sorted.toSeq
      == (1 to 100))
  }

  test("unsupported Spark type fails loudly at encode") {
    import spark.implicits._
    val df = Seq((1, Seq(1.0))).toDF("k", "arr")
    val e = intercept[Exception] {
      ArrowIngest.encodeFrames(df).collect()
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("frame missing a target column fails loudly at decode") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("k", "v")
    val frames = ArrowIngest.encodeFrames(df)
    val wrong = StructType(Seq(StructField("nope", IntegerType)))
    val e = intercept[Exception] {
      ArrowIngest.decodeFrames(frames, wrong).collect()
    }
    assert(e.getMessage.contains("no column 'nope'"))
  }

  test("push-channel transport: frames land as envelopes, changes decode in order") {
    import spark.implicits._
    val chan = "arrow_spec"
    PushBuffer.clear(chan)
    val rowSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    def frame(rows: (Long, String)*): Array[Byte] =
      ArrowIngest.encodePartition(
        rows.map(r => Row(r._1, r._2)).iterator, rowSchema, 1024)
    // two frames for "users", one interleaved frame for another schema
    ArrowIngest.ingest(chan, "users", frame(1L -> "a", 2L -> "b"))
    ArrowIngest.ingest(chan, "other", frame(99L -> "zz"))
    ArrowIngest.ingest(chan, "users", frame(1L -> "a2", 3L -> "c"))
    val feed = Sources.pushSnapshot(spark, chan)
    val ch = ArrowIngest.changes(feed, "users", rowSchema)
    val got = ch.orderBy("_seq").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((1L, "a", "insert"), (2L, "b", "insert"),
      (1L, "a2", "insert"), (3L, "c", "insert")))
    // latest-wins materialization over the insert stream
    val applied = graft.cdc.ChangeModel.applyChanges(ch, keyCols = Seq("k"))
    assert(applied.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a2"), (2L, "b"), (3L, "c")))
  }

  test("streaming: Arrow envelopes flow through the micro-batch scan path") {
    val chan = "arrow_stream_spec"
    PushBuffer.clear(chan)
    val rowSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    ArrowIngest.ingest(chan, "users",
      ArrowIngest.encodePartition(
        Seq(Row(10L, "x"), Row(20L, "y")).iterator, rowSchema, 1024))
    val q = ArrowIngest.changes(Sources.push(spark, chan), "users", rowSchema)
      .writeStream.format("memory").queryName("arrow_stream_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "arrow stream timed out")
    assert(spark.table("arrow_stream_out").select("k").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(10L, 20L))
  }
}
