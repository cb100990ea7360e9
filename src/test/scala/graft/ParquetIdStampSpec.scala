package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.sources.ParquetIdStamp

/** Footer restamp for the parquet field ids Spark's writer cannot
  * emit: list `element` and map `key`/`value` members (not
  * StructFields — the Spark 4.1 converter only reads
  * `parquet.field.id` off StructField metadata). The walker must
  * compute id-paths through every container nesting shape the modern
  * 3-level layout produces, and the patched file must stay readable
  * by Spark (checksum sidecar dropped, data region untouched).
  */
class ParquetIdStampSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def onePart(dir: String): Path = {
    val d = new java.io.File(dir)
    new Path(d.listFiles().filter(_.getName.startsWith("part-"))
      .maxBy(_.getName).toString)
  }

  private def schemaOf(p: Path): org.apache.parquet.schema.GroupType = {
    val rd = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try rd.getFooter.getFileMetaData.getSchema finally rd.close()
  }

  test("stamps member ids through nested container shapes — " +
      "array<struct>, array<array>, map value struct — and Spark " +
      "still reads the patched file byte-exactly") {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_idstamp_nested").toString
    new Path(dir).getFileSystem(conf).delete(new Path(dir), true)
    val df = Seq((1L, Seq((2L, Seq(3L, 4L))), Map("k" -> (5L, "x"))))
      .toDF("a", "arr", "m")
    df.coalesce(1).write.parquet(dir)
    val part = onePart(dir)
    val ids = Map(
      "a" -> 1,
      "arr" -> 2, "arr.element" -> 3,
      "arr.element._1" -> 4,
      "arr.element._2" -> 5, "arr.element._2.element" -> 6,
      "m" -> 7, "m.key" -> 8, "m.value" -> 9,
      "m.value._1" -> 10, "m.value._2" -> 11)
    ParquetIdStamp.stamp(conf, part, ids)
    val sch = schemaOf(part)
    def id(t: org.apache.parquet.schema.Type): Int = t.getId.intValue
    assert(id(sch.getType("a")) == 1)
    val arr = sch.getType("arr").asGroupType()
    assert(id(arr) == 2)
    val el = arr.getType("list").asGroupType().getType("element")
      .asGroupType()
    assert(id(el) == 3)
    assert(id(el.getType("_1")) == 4)
    val inner = el.getType("_2").asGroupType()
    assert(id(inner) == 5)
    assert(id(inner.getType("list").asGroupType().getType("element")) == 6)
    val m = sch.getType("m").asGroupType()
    assert(id(m) == 7)
    val kv = m.getType("key_value").asGroupType()
    assert(id(kv.getType("key")) == 8)
    val mv = kv.getType("value").asGroupType()
    assert(id(mv) == 9)
    assert(id(mv.getType("_1")) == 10 && id(mv.getType("_2")) == 11)
    // the data region is untouched and the file still reads (the
    // .crc sidecar was dropped with the footer patch)
    val back = spark.read.parquet(dir)
      .select(col("a"), col("arr")(0)("_1"), element_at(col("m"), "k"))
      .collect()
    assert(back.length == 1 && back(0).getLong(0) == 1L &&
      back(0).getLong(1) == 2L)
    // idempotent: re-stamping the same ids rewrites nothing (footer
    // byte length stays put)
    val lenBefore = new java.io.File(part.toUri.getPath).length
    ParquetIdStamp.stamp(conf, part, ids)
    assert(new java.io.File(part.toUri.getPath).length == lenBefore)
  }

  test("pathIds merges named-field metadata with nested.ids maps; " +
      "hasMemberIds gates on member entries only") {
    import org.apache.spark.sql.types._
    val sub = new MetadataBuilder().putLong("tags.element", 4L).build()
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("tags", ArrayType(LongType), nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2L)
          .putMetadata("parquet.field.nested.ids", sub).build())))
    assert(ParquetIdStamp.pathIds(schema) ==
      Map("k" -> 1, "tags" -> 2, "tags.element" -> 4))
    assert(ParquetIdStamp.hasMemberIds(schema))
    val plain = StructType(Seq(
      StructField("k", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build())))
    assert(!ParquetIdStamp.hasMemberIds(plain))
    assert(ParquetIdStamp.nestedIdsOf(schema("tags")) ==
      Map("tags.element" -> 4L))
  }
}
