package graft

import java.io.File

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroFiles

/** Avro object-container-file source: REAL container headers, sync
  * markers, and block compression (written with the avro library's own
  * writer — the spec's canonical implementation), decoded through the
  * native reader with the AvroConfluent logical-type conversions.
  */
class AvroFilesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val schemaJson =
    """{"type":"record","name":"Evt","fields":[
      |{"name":"id","type":"long"},
      |{"name":"name","type":["null","string"]},
      |{"name":"price","type":{"type":"bytes","logicalType":"decimal",
      |"precision":12,"scale":2}},
      |{"name":"day","type":{"type":"int","logicalType":"date"}},
      |{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}}]}"""
      .stripMargin.replace("\n", "")

  private def record(schema: AvroSchema, id: Long, name: String,
      cents: Long, day: Int, tsMicros: Long): GenericRecord = {
    val r = new GenericData.Record(schema)
    r.put("id", id)
    r.put("name", name)
    r.put("price", java.nio.ByteBuffer.wrap(
      java.math.BigInteger.valueOf(cents).toByteArray))
    r.put("day", day)
    r.put("ts", tsMicros)
    r
  }

  private def writeContainer(file: File, schema: AvroSchema,
      codec: Option[CodecFactory], recs: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    codec.foreach(w.setCodec)
    w.create(schema, file)
    try recs.foreach(w.append) finally w.close()
  }

  test("a directory of container files — plain, deflate, and snappy " +
      "blocks — reads into one typed DataFrame, logicals decoded") {
    val dir = java.nio.file.Files.createTempDirectory("avrof").toFile
    val schema = new AvroSchema.Parser().parse(schemaJson)
    val day0 = 19000 // epoch days
    writeContainer(new File(dir, "a.avro"), schema, None, Seq(
      record(schema, 1L, "one", 150L, day0, 1700000000000000L),
      record(schema, 2L, null, 225L, day0 + 1, 1700000001000000L)))
    writeContainer(new File(dir, "b.avro"), schema,
      Some(CodecFactory.deflateCodec(6)), Seq(
        record(schema, 3L, "three", 999L, day0 + 2, 1700000002000000L)))
    writeContainer(new File(dir, "c.avro"), schema,
      Some(CodecFactory.snappyCodec()), Seq(
        record(schema, 4L, "four", 1L, day0 + 3, 1700000003000000L)))
    // noise file that must be glob-filtered out
    java.nio.file.Files.write(new File(dir, "junk.txt").toPath,
      "not avro".getBytes)

    val df = AvroFiles.read(spark, dir.getAbsolutePath)
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "name", "price", "day", "ts"))
    assert(df.schema("price").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    assert(df.schema("day").dataType == org.apache.spark.sql.types.DateType)
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getString(1)).toSeq == Seq("one", null, "three", "four"))
    assert(rows.map(_.getDecimal(2).toString).toSeq ==
      Seq("1.50", "2.25", "9.99", "0.01"))
    assert(rows.head.getDate(3).toLocalDate ==
      java.time.LocalDate.ofEpochDay(day0))
    assert(rows.head.getTimestamp(4).getTime == 1700000000000L)
  }

  test("schema resolution: an explicit reader schema with an " +
      "added-with-default field reads older files (spec rules)") {
    val dir = java.nio.file.Files.createTempDirectory("avrof2").toFile
    val writerJson =
      """{"type":"record","name":"Evt","fields":[
        |{"name":"id","type":"long"}]}""".stripMargin.replace("\n", "")
    val writer = new AvroSchema.Parser().parse(writerJson)
    val w1 = new GenericData.Record(writer); w1.put("id", 10L)
    writeContainer(new File(dir, "old.avro"), writer, None, Seq(w1))
    val readerJson =
      """{"type":"record","name":"Evt","fields":[
        |{"name":"id","type":"long"},
        |{"name":"tag","type":"string","default":"none"}]}"""
        .stripMargin.replace("\n", "")
    val rows = AvroFiles.readWith(spark, dir.getAbsolutePath, readerJson)
      .collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 10L &&
      rows.head.getString(1) == "none")
  }

  test("corrupt container bytes fail loudly, not silently empty") {
    val dir = java.nio.file.Files.createTempDirectory("avrof3").toFile
    java.nio.file.Files.write(new File(dir, "bad.avro").toPath,
      Array[Byte](1, 2, 3, 4, 5))
    intercept[Exception] {
      AvroFiles.readWith(spark, dir.getAbsolutePath,
        """{"type":"record","name":"E","fields":[{"name":"id","type":"long"}]}""")
        .collect()
    }
  }

  test("config surface: format avro runs through GraftApp batch, " +
      "streaming is a loud error") {
    val dir = java.nio.file.Files.createTempDirectory("avrof4").toFile
    val out = java.nio.file.Files.createTempDirectory("avrof4o").toString
    val schema = new AvroSchema.Parser().parse(schemaJson)
    writeContainer(new File(dir, "x.avro"), schema, None, Seq(
      record(schema, 5L, "cfg", 500L, 19000, 1700000000000000L)))
    val yaml =
      s"""app_name: avro-app
         |sources:
         |  - name: evts
         |    path: ${dir.getAbsolutePath}
         |    format: avro
         |sql: |
         |  SELECT id, name INTO outp FROM evts;
         |sinks:
         |  - table_name: outp
         |    path: $out/res
         |    mode: overwrite
         |""".stripMargin
    val config = GraftConfigLoader.fromYaml(yaml)
    GraftApp.runBatch(spark, config)
    val got = spark.read.parquet(s"$out/res").collect()
    assert(got.length == 1 && got.head.getLong(0) == 5L &&
      got.head.getString(1) == "cfg")
    val e = intercept[IllegalArgumentException] {
      GraftApp.runStreaming(spark, config)
    }
    assert(e.getMessage.contains("batch-only"))
  }
}
