package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.{AvroConfluent, ChangeModel, ConnectJson, Debezium}

/** Envelope-codec TRIANGULATION: one logical change feed (snapshot
  * reads, an update, a delete) expressed in all three wire forms the
  * engine decodes — plain Debezium JSON, Connect-JSON with in-band
  * schemas, and Confluent-framed Avro — must produce IDENTICAL
  * ChangeModel rows and identical materialized state. A bug in any
  * one decoder's op mapping, image handling, or seq plumbing breaks
  * the three-way agreement.
  */
class EnvelopeParitySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  // the logical feed: (seq, op, before, after)
  private val feed: Seq[(Long, String, Option[(Long, String)], Option[(Long, String)])] = Seq(
    (1L, "r", None, Some((1L, "a"))),
    (2L, "r", None, Some((2L, "b"))),
    (3L, "u", Some((1L, "a")), Some((1L, "a2"))),
    (4L, "d", Some((2L, "b")), None))

  private def collectChanges(ch: org.apache.spark.sql.DataFrame) =
    ch.select("id", "v", ChangeModel.OpCol, ChangeModel.SeqCol)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"),
        r.getAs[String](ChangeModel.OpCol), r.getAs[Long](ChangeModel.SeqCol)))
      .sortBy(t => (t._4, t._3)).toSeq

  test("debezium-json, connect-json, and confluent-avro decode one feed " +
      "to identical change rows and state") {
    import spark.implicits._

    // 1. plain Debezium JSON (caller-declared schema)
    def img(r: Option[(Long, String)]): String =
      r.map { case (i, v) => s"""{"id":$i,"v":"$v"}""" }.getOrElse("null")
    val dbz = feed.map { case (seq, op, b, a) =>
      (seq, s"""{"op":"$op","before":${img(b)},"after":${img(a)}}""")
    }.toDF("seq", "value")
    val chDbz = Debezium.decode(dbz, "value", rowSchema,
      seq = Some(col("seq")))

    // 2. Connect-JSON (schema derived in-band from the messages)
    val connectSchema =
      """{"type":"struct","fields":[
        |{"type":"struct","field":"before","optional":true},
        |{"type":"struct","field":"after","optional":true,"fields":[
        |{"type":"int64","field":"id","optional":false},
        |{"type":"string","field":"v","optional":true}]}]}"""
        .stripMargin.replace("\n", "")
    val cj = feed.map { case (seq, op, b, a) =>
      val payload = new StringBuilder(s"""{"op":"$op"""")
      b.foreach { case (i, v) => payload.append(s""","before":{"id":$i,"v":"$v"}""") }
      a.foreach { case (i, v) => payload.append(s""","after":{"id":$i,"v":"$v"}""") }
      payload.append("}")
      (seq, s"""{"schema":$connectSchema,"payload":$payload}""")
    }.toDF("seq", "value")
    val (chConnect, pk) = ConnectJson.changes(cj, "value",
      keyCol = None, seq = Some(col("seq")))
    assert(pk.isEmpty) // no key message supplied

    // 3. Confluent-framed Avro (schema from the writer schema)
    val avroSchema =
      """{"type":"record","name":"Env","fields":[
        |{"name":"before","type":["null",{"type":"record","name":"V",
        |"fields":[{"name":"id","type":"long"},
        |{"name":"v","type":["null","string"]}]}]},
        |{"name":"after","type":["null","V"]},
        |{"name":"op","type":"string"}]}""".stripMargin.replace("\n", "")
    val avro = feed.map { case (seq, op, b, a) =>
      def rec(r: Option[(Long, String)]): Seq[Any] =
        r.map { case (i, v) => Seq[Any](i, v) }.orNull
      (seq, AvroConfluent.Encode.record(avroSchema, 1,
        Seq(rec(b), rec(a), op)))
    }.toDF("seq", "value")
    val chAvro = AvroConfluent.changes(avro, "value", avroSchema)

    val a = collectChanges(chDbz)
    val b = collectChanges(chConnect)
    val c = collectChanges(chAvro)
    assert(a == b, s"debezium vs connect:\n$a\n$b")
    assert(a == c, s"debezium vs avro:\n$a\n$c")

    // and the materialized states agree
    def state(ch: org.apache.spark.sql.DataFrame) =
      ChangeModel.applyChanges(ch, Seq("id")).select("id", "v")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val s1 = state(chDbz)
    assert(s1 == Seq((1L, "a2")))
    assert(state(chConnect) == s1 && state(chAvro) == s1)
  }
}
