package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.{ChangeModel, ConnectJson}

/** Connect-JSON (schema-registry path) decoder: in-band schema
  * derivation + logical type conversions (reference kafka/src/debezium/
  * {schema.rs,mapper.rs,stream_consumer.rs}).
  */
class ConnectJsonSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def b64(bytes: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bytes)

  private def decimalB64(unscaled: Long): String =
    b64(java.math.BigInteger.valueOf(unscaled).toByteArray)

  private val valueSchema =
    """{"type":"struct","name":"env","fields":[
      |  {"type":"struct","field":"before","optional":true,"fields":[]},
      |  {"type":"struct","field":"after","optional":true,"fields":[
      |    {"type":"int64","field":"id","optional":false},
      |    {"type":"string","field":"name","optional":true},
      |    {"type":"double","field":"ratio","optional":true},
      |    {"type":"boolean","field":"ok","optional":true},
      |    {"type":"bytes","field":"blob","optional":true},
      |    {"type":"int64","field":"ts_us","optional":true,
      |     "name":"io.debezium.time.MicroTimestamp"},
      |    {"type":"int64","field":"ts_ms","optional":true,
      |     "name":"org.apache.kafka.connect.data.Timestamp"},
      |    {"type":"int32","field":"day","optional":true,
      |     "name":"io.debezium.time.Date"},
      |    {"type":"bytes","field":"price","optional":true,
      |     "name":"org.apache.kafka.connect.data.Decimal",
      |     "parameters":{"scale":"2","connect.decimal.precision":"12"}},
      |    {"type":"struct","field":"vdec","optional":true,
      |     "name":"io.debezium.data.VariableScaleDecimal"},
      |    {"type":"string","field":"doc","optional":true,
      |     "name":"io.debezium.data.Json"}]}]}""".stripMargin.replace("\n", "")

  private val keySchema =
    """{"type":"struct","fields":[{"type":"int64","field":"id"}]}"""

  private def msg(payload: String) =
    s"""{"schema":$valueSchema,"payload":$payload}"""
  private def keyMsg(id: Long) =
    s"""{"schema":$keySchema,"payload":{"id":$id}}"""

  test("derive: physical schema, logical conversions, and the primary " +
      "key all come from the embedded schemas") {
    val d = ConnectJson.derive(msg("""{"op":"r","after":{"id":1}}"""),
      Some(keyMsg(1)))
    assert(d.primaryKey == Seq("id"))
    val raw = d.rawRowSchema
    assert(raw("id").dataType == LongType)
    assert(raw("blob").dataType == StringType)   // base64 carrier
    assert(raw("ts_us").dataType == LongType)
    assert(raw("price").dataType == StringType)  // base64 carrier
    assert(raw("vdec").dataType.isInstanceOf[StructType])
  }

  test("typed round-trip: every logical type decodes to its Spark value") {
    import spark.implicits._
    val after =
      s"""{"id":7,"name":"ada","ratio":0.5,"ok":true,
         |"blob":"${b64(Array[Byte](1, 2, 3))}",
         |"ts_us":1704164645123456,
         |"ts_ms":1704164645123,
         |"day":19724,
         |"price":"${decimalB64(123456L)}",
         |"vdec":{"scale":3,"value":"${decimalB64(98765L)}"},
         |"doc":"{\\"a\\":1}"}""".stripMargin.replace("\n", "")
    val feed = Seq((keyMsg(7), msg(s"""{"op":"r","after":$after}""")))
      .toDF("key", "value")
    val (ch, pk) = ConnectJson.changes(feed, "value", Some("key"),
      seq = Some(lit(1L)))
    assert(pk == Seq("id"))
    val r = ch.head()
    assert(r.getAs[Long]("id") == 7L)
    assert(r.getAs[String]("name") == "ada")
    assert(r.getAs[Double]("ratio") == 0.5)
    assert(r.getAs[Boolean]("ok"))
    assert(r.getAs[Array[Byte]]("blob").toSeq == Seq[Byte](1, 2, 3))
    assert(r.getAs[java.sql.Timestamp]("ts_us") ==
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        1704164645L, 123456000L)))
    assert(r.getAs[java.sql.Timestamp]("ts_ms") ==
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        1704164645L, 123000000L)))
    assert(r.getAs[java.sql.Date]("day").toLocalDate ==
      java.time.LocalDate.ofEpochDay(19724L))
    assert(r.getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("1234.56")) == 0)
    assert(r.getAs[java.math.BigDecimal]("vdec")
      .compareTo(new java.math.BigDecimal("98.765")) == 0)
    assert(r.getAs[String]("doc") == """{"a":1}""")
    assert(r.getAs[String](ChangeModel.OpCol) == ChangeModel.Insert)
  }

  test("negative decimals (two's-complement bytes) and nulls decode") {
    import spark.implicits._
    val after = s"""{"id":1,"price":"${decimalB64(-250L)}"}"""
    val feed = Seq((keyMsg(1), msg(s"""{"op":"c","after":$after}""")))
      .toDF("key", "value")
    val (ch, _) = ConnectJson.changes(feed, "value", Some("key"),
      seq = Some(lit(1L)))
    val r = ch.head()
    assert(r.getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("-2.50")) == 0)
    assert(r.isNullAt(r.fieldIndex("name")))
    assert(r.isNullAt(r.fieldIndex("ts_us")))
  }

  test("update emits pre+post images; applyChanges keys on the derived pk") {
    import spark.implicits._
    def row(id: Long, name: String) = s"""{"id":$id,"name":"$name"}"""
    val feed = Seq(
      (keyMsg(1), msg(s"""{"op":"r","after":${row(1, "a")},"ts_ms":1}""")),
      (keyMsg(2), msg(s"""{"op":"r","after":${row(2, "b")},"ts_ms":2}""")),
      (keyMsg(1), msg(s"""{"op":"u","before":${row(1, "a")},
        |"after":${row(1, "a2")},"ts_ms":3}""".stripMargin.replace("\n", ""))),
      (keyMsg(2), msg(s"""{"op":"d","before":${row(2, "b")},"ts_ms":4}""")))
      .toDF("key", "value")
    val (ch, pk) = ConnectJson.changes(feed, "value", Some("key"))
    val state = ChangeModel.applyChanges(ch, pk)
    assert(state.select("id", "name").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a2")))
  }

  test("error parity: unsupported type, missing schema node, and a " +
      "schema without an after struct are loud") {
    val badType = msg("""{"op":"r"}""").replace(
      """"type":"int64","field":"id"""", """"type":"uuidish","field":"id"""")
    val e1 = intercept[IllegalArgumentException](ConnectJson.derive(badType, None))
    assert(e1.getMessage.contains("type not supported"))

    val e2 = intercept[IllegalArgumentException](
      ConnectJson.derive("""{"payload":{"op":"r"}}""", None))
    assert(e2.getMessage.contains("no 'schema' node"))

    val e3 = intercept[IllegalArgumentException](ConnectJson.derive(
      """{"schema":{"type":"struct","fields":[
        |{"type":"struct","field":"source","fields":[]}]},
        |"payload":{}}""".stripMargin.replace("\n", ""), None))
    assert(e3.getMessage.contains("schema definition not found"))
  }

  test("streaming: a snapshot-derived contract decodes a live stream " +
      "(decodeWith); direct changes() on a stream is rejected") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def row(id: Long, name: String) = s"""{"id":$id,"name":"$name"}"""
    val d = ConnectJson.derive(
      msg(s"""{"op":"r","after":${row(0, "seed")}}"""), Some(keyMsg(0)))
    val mem = MemoryStream[(String, String)]
    val stream = mem.toDF.toDF("key", "value")
    intercept[IllegalArgumentException] {
      ConnectJson.changes(stream, "value", Some("key"))
    }
    val ch = ConnectJson.decodeWith(d, stream, "value",
      seq = Some(lit(0L)))
    val q = ch.writeStream.format("memory").queryName("cj_stream")
      .outputMode("append").start()
    try {
      mem.addData((keyMsg(5), msg(s"""{"op":"r","after":${row(5, "live")}}""")))
      q.processAllAvailable()
      val rows = spark.table("cj_stream").select("id", "name").collect()
      assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((5L, "live")))
    } finally q.stop()
  }

  test("composes with the Kafka transport: Connect messages inside " +
      "RecordBatch v2 frames, offsets as _seq") {
    import spark.implicits._
    import graft.cdc.KafkaBatch
    def row(id: Long, name: String) = s"""{"id":$id,"name":"$name"}"""
    val batch = KafkaBatch.Encode.batch(100L, 1700000000000L, Seq(
      (1700000000000L, keyMsg(1), msg(s"""{"op":"r","after":${row(1, "x")}}""")),
      (1700000000001L, keyMsg(2), msg(s"""{"op":"r","after":${row(2, "y")}}"""))))
    val recs = KafkaBatch.records(Seq((0L, batch)).toDF("seq", "frame"))
    val (ch, pk) = ConnectJson.changes(recs, "value", Some("key"),
      seq = Some(col(ChangeModel.SeqCol)))
    assert(pk == Seq("id"))
    val rows = ch.orderBy(ChangeModel.SeqCol).collect()
    assert(rows.map(_.getAs[Long](ChangeModel.SeqCol)).toSeq == Seq(100L, 101L))
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq("x", "y"))
  }
}
