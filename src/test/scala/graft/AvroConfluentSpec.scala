package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.{AvroConfluent, ChangeModel}

/** Confluent-framed Avro decode (the registry path's binary format):
  * schema mapping, logical types, envelope changes, error paths.
  */
class AvroConfluentSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val rowSchemaJson =
    """{"type":"record","name":"R","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"name","type":["null","string"]},
      |  {"name":"ok","type":["null","boolean"]},
      |  {"name":"ratio","type":["null","double"]},
      |  {"name":"blob","type":["null","bytes"]},
      |  {"name":"price","type":["null",{"type":"bytes",
      |    "logicalType":"decimal","precision":12,"scale":2}]},
      |  {"name":"day","type":["null",{"type":"int","logicalType":"date"}]},
      |  {"name":"ts_us","type":["null",{"type":"long",
      |    "logicalType":"timestamp-micros"}]},
      |  {"name":"ts_ms","type":["null",{"type":"long",
      |    "logicalType":"timestamp-millis"}]}]}""".stripMargin

  test("schema mapping: unions mark nullability, logical types map to " +
      "Spark types, non-records and exotic types are loud") {
    val st = AvroConfluent.sparkSchema(rowSchemaJson)
    assert(st("id").dataType == LongType && !st("id").nullable)
    assert(st("name").dataType == StringType && st("name").nullable)
    assert(st("price").dataType == DecimalType(12, 2))
    assert(st("day").dataType == DateType)
    assert(st("ts_us").dataType == TimestampType)
    assert(st("ts_ms").dataType == TimestampType)
    assert(st("blob").dataType == BinaryType)

    val e1 = intercept[IllegalArgumentException] {
      AvroConfluent.sparkSchema(""""string"""")
    }
    assert(e1.getMessage.contains("must be a record"))
    val e2 = intercept[IllegalArgumentException] {
      AvroConfluent.sparkSchema(
        """{"type":"record","name":"X","fields":[
          |{"name":"a","type":{"type":"array","items":"long"}}]}""".stripMargin)
    }
    assert(e2.getMessage.contains("type not supported"))
  }

  test("round-trip: encode → frame → decodeRecords recovers every " +
      "logical type and nulls") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456")
    val tsMs = java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123")
    val day = java.sql.Date.valueOf("2024-03-04")
    val full = AvroConfluent.Encode.record(rowSchemaJson, 7, Seq(
      1L, "ada", true, 0.5, Array[Byte](9, 8),
      new java.math.BigDecimal("1234.56"), day, ts, tsMs))
    val nulls = AvroConfluent.Encode.record(rowSchemaJson, 7, Seq(
      2L, null, null, null, null, null, null, null, null))
    val feed = Seq((0L, full), (1L, nulls)).toDF("seq", "value")
    val out = AvroConfluent.decodeRecords(feed, "value", rowSchemaJson)
      .orderBy("seq").collect()
    val r = out(0)
    assert(r.getAs[Long]("id") == 1L && r.getAs[String]("name") == "ada")
    assert(r.getAs[Boolean]("ok") && r.getAs[Double]("ratio") == 0.5)
    assert(r.getAs[Array[Byte]]("blob").toSeq == Seq[Byte](9, 8))
    assert(r.getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("1234.56")) == 0)
    assert(r.getAs[java.sql.Date]("day") == day)
    assert(r.getAs[java.sql.Timestamp]("ts_us") == ts)
    assert(r.getAs[java.sql.Timestamp]("ts_ms") == tsMs)
    val n = out(1)
    assert(n.getAs[Long]("id") == 2L)
    Seq("name", "ok", "ratio", "blob", "price", "day", "ts_us", "ts_ms")
      .foreach(c => assert(n.isNullAt(n.fieldIndex(c)), c))
  }

  private val envSchemaJson =
    """{"type":"record","name":"Envelope","fields":[
      |  {"name":"before","type":["null",{"type":"record","name":"V",
      |    "fields":[{"name":"id","type":"long"},
      |              {"name":"v","type":["null","string"]}]}]},
      |  {"name":"after","type":["null","V"]},
      |  {"name":"op","type":"string"}]}""".stripMargin

  private def env(op: String, before: Seq[Any], after: Seq[Any]) =
    AvroConfluent.Encode.record(envSchemaJson, 3, Seq(before, after, op))

  test("Debezium-envelope changes: r/u/d map to insert, pre+post, " +
      "delete; applyChanges materializes") {
    import spark.implicits._
    val feed = Seq(
      (1L, env("r", null, Seq(1L, "a"))),
      (2L, env("r", null, Seq(2L, "b"))),
      (3L, env("u", Seq(1L, "a"), Seq(1L, "a2"))),
      (4L, env("d", Seq(2L, "b"), null))).toDF("seq", "value")
    val ch = AvroConfluent.changes(feed, "value", envSchemaJson)
    val ops = ch.orderBy(ChangeModel.SeqCol, ChangeModel.OpCol).collect()
      .map(r => (r.getAs[Long](ChangeModel.SeqCol),
        r.getAs[String](ChangeModel.OpCol), r.getAs[Long]("id")))
    assert(ops.toSeq == Seq(
      (1L, ChangeModel.Insert, 1L), (2L, ChangeModel.Insert, 2L),
      (3L, ChangeModel.UpdatePost, 1L), (3L, ChangeModel.UpdatePre, 1L),
      (4L, ChangeModel.Delete, 2L)))
    val state = ChangeModel.applyChanges(ch, Seq("id"))
    assert(state.select("id", "v").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a2")))
  }

  test("bad frames and envelope shape are loud") {
    import spark.implicits._
    val e1 = intercept[IllegalArgumentException] {
      AvroConfluent.unframe(Array[Byte](1, 0, 0, 0, 7, 9))
    }
    assert(e1.getMessage.contains("bad frame"))
    assert(AvroConfluent.unframe(
      AvroConfluent.frame(123456, Array[Byte](1, 2)))._1 == 123456)

    val e2 = intercept[IllegalArgumentException] {
      AvroConfluent.changes(
        Seq((1L, Array[Byte](0))).toDF("seq", "value"), "value",
        rowSchemaJson)
    }
    assert(e2.getMessage.contains("envelope schema has no 'before'"))
  }
}
