package graft

import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.cdc.SchemaRegistryClient

/** Confluent Schema Registry fetch against a loopback mock serving the
  * public REST surface (reference kafka/src/debezium/
  * schema_registry.rs fetch_struct + schema_registry_basic.rs
  * get_single_schema + map_typ union handling).
  */
class SchemaRegistrySpec extends AnyFunSuite {

  private def mockRegistry(subjects: Map[String, String]): HttpServer = {
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/subjects", ex => {
      val path = ex.getRequestURI.getPath // /subjects/<s>/versions/latest
      val parts = path.split("/")
      val subject = if (parts.length >= 3) parts(2) else ""
      subjects.get(subject) match {
        case Some(schemaJson) =>
          // the registry returns the schema as a STRING field
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          val env = mapper.createObjectNode()
          env.put("subject", subject)
          env.put("version", 1)
          env.put("id", 7)
          env.put("schema", schemaJson)
          val body = mapper.writeValueAsString(env).getBytes(UTF_8)
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body)
        case None =>
          val body =
            """{"error_code":40401,"message":"Subject not found"}"""
              .getBytes(UTF_8)
          ex.sendResponseHeaders(404, body.length)
          ex.getResponseBody.write(body)
      }
      ex.close()
    })
    server.start()
    server
  }

  private val valueSchema =
    """{"type":"struct","name":"orders.Envelope","fields":[
      |  {"name":"o_orderkey","type":"int64","optional":false},
      |  {"name":"status","type":["null","string"]},
      |  {"name":"price","type":{"type":"double"},"optional":true},
      |  {"name":"flags","type":["null","boolean"]}]}"""
      .stripMargin.replace("\n", "")
  private val keySchema =
    """{"type":"struct","fields":[{"name":"o_orderkey","type":"int64"}]}"""

  test("sourceSchema: value fields + union nullability + key-derived pk") {
    val server = mockRegistry(Map(
      "orders-value" -> valueSchema, "orders-key" -> keySchema))
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val (schema, pk) = SchemaRegistryClient.sourceSchema(url, "orders")
      assert(pk == Seq("o_orderkey"))
      assert(schema == StructType(Seq(
        StructField("o_orderkey", LongType, nullable = false),
        StructField("status", StringType, nullable = true),
        StructField("price", DoubleType, nullable = true),
        StructField("flags", BooleanType, nullable = true))))
    } finally server.stop(0)
  }

  test("missing subject and unsupported types are loud") {
    val server = mockRegistry(Map("t-value" ->
      """{"type":"struct","fields":[{"name":"x","type":"uuid"}]}""",
      "t-key" -> keySchema))
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val e1 = intercept[IllegalArgumentException] {
        SchemaRegistryClient.fetchStruct(url, "ghost", isKey = false)
      }
      assert(e1.getMessage.contains("404"))
      val e2 = intercept[IllegalArgumentException] {
        SchemaRegistryClient.sourceSchema(url, "t")
      }
      assert(e2.getMessage.contains("type not supported: uuid"))
    } finally server.stop(0)
  }

  test("map_typ: all-null union and typeless objects are rejected") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val e1 = intercept[IllegalArgumentException] {
      SchemaRegistryClient.mapTyp(mapper.readTree("""["null"]"""), None)
    }
    assert(e1.getMessage.contains("Array"))
    val e2 = intercept[IllegalArgumentException] {
      SchemaRegistryClient.mapTyp(mapper.readTree("""{"noType":1}"""), None)
    }
    assert(e2.getMessage.contains("no 'type' key"))
  }
}
