package graft.cdc

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/** Confluent Schema Registry client — the schema-FETCH half of the
  * reference's registry path (kafka/src/debezium/schema_registry.rs
  * `fetch_struct`: GET the latest version of subject `<topic>-key` /
  * `<topic>-value` via the public REST API, parse the `schema` string;
  * schema_registry_basic.rs `get_single_schema`: field list from the
  * value schema, primary key from the key schema's field names;
  * `map_typ` resolves union types — `["null", T]` marks nullability —
  * and object-wrapped types).
  *
  * Pure JDK HttpClient against the PUBLIC REST surface
  * (`/subjects/{subject}/versions/latest` →
  * `{"subject","version","id","schema":"<json>"}`); driver-side and
  * model-sized by construction (one GET per table at plan time).
  * SchemaRegistrySpec drives it against a loopback mock registry.
  * Composes with [[ConnectJson]]: registry-fetched structs go through
  * the same field mapping, so a topic can be planned from the registry
  * and decoded in-band-schema-free (`schemas.enable=false` topics).
  */
object SchemaRegistryClient {

  private val mapper = new ObjectMapper()

  /** GET one subject's latest schema struct (fetch_struct parity:
    * subject = `<topic>-key` or `<topic>-value`, TopicNameStrategy).
    */
  def fetchStruct(registryUrl: String, topic: String,
      isKey: Boolean): JsonNode = {
    val subject = s"$topic-${if (isKey) "key" else "value"}"
    val uri = URI.create(
      s"${registryUrl.stripSuffix("/")}/subjects/$subject/versions/latest")
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(uri).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"schema registry: GET $uri → ${resp.statusCode()} ${resp.body()}")
    val node = mapper.readTree(resp.body())
    val schemaStr = Option(node.get("schema")).filterNot(_.isNull).map(_.asText)
      .getOrElse(throw new IllegalArgumentException(
        s"schema registry: subject '$subject' response carries no schema"))
    mapper.readTree(schemaStr)
  }

  /** map_typ (schema_registry.rs:20-65): a type value that is a plain
    * string maps directly; an ARRAY is a union whose "null" member
    * marks nullability and whose first non-null member is the type; an
    * OBJECT nests the type under its own `type` key.
    */
  def mapTyp(typeNode: JsonNode, optional: Option[Boolean]): (DataType, Boolean) = {
    if (typeNode.isTextual) {
      val dt = typeNode.asText match {
        case "int" | "int8" | "int16" | "int32" | "int64" | "long" => LongType
        case "string" => StringType
        case "bytes" => BinaryType
        case "float" | "float32" | "float64" | "double" => DoubleType
        case "boolean" => BooleanType
        case other => throw new IllegalArgumentException(
          s"schema registry: type not supported: $other")
      }
      // nullable = !optional in the reference's map_typ reading; the
      // registry's union form below overrides it
      (dt, optional.getOrElse(true))
    } else if (typeNode.isArray) {
      var nullable = false
      var member: JsonNode = null
      val it = typeNode.elements()
      while (it.hasNext) {
        val m = it.next()
        if (m.isTextual && m.asText == "null") nullable = true
        else if (member == null) member = m
      }
      if (member == null) throw new IllegalArgumentException(
        "schema registry: type not supported: Array (all-null union)")
      (mapTyp(member, Some(nullable))._1, nullable)
    } else if (typeNode.isObject) {
      mapTyp(Option(typeNode.get("type")).getOrElse(
        throw new IllegalArgumentException(
          "schema registry: object type with no 'type' key")), optional)
    } else throw new IllegalArgumentException(
      "schema registry: unexpected type value")
  }

  /** get_single_schema (schema_registry_basic.rs:18-75): the table's
    * Spark schema from the value subject, the primary key from the key
    * subject's field names.
    */
  def sourceSchema(registryUrl: String,
      topic: String): (StructType, Seq[String]) = {
    val keyStruct = fetchStruct(registryUrl, topic, isKey = true)
    val valueStruct = fetchStruct(registryUrl, topic, isKey = false)
    val pk = fieldNames(keyStruct)
    val fields = Option(valueStruct.get("fields")).map { fs =>
      val b = Seq.newBuilder[StructField]
      val it = fs.elements()
      while (it.hasNext) {
        val f = it.next()
        val name = Option(f.get("name")).map(_.asText).getOrElse(
          throw new IllegalArgumentException(
            s"schema registry: '$topic' value field with no name"))
        val (dt, nullable) = mapTyp(
          Option(f.get("type")).getOrElse(throw new IllegalArgumentException(
            s"schema registry: field '$name' has no type")),
          Option(f.get("optional")).map(_.asBoolean))
        b += StructField(name, dt, nullable)
      }
      b.result()
    }.getOrElse(Nil)
    (StructType(fields), pk)
  }

  private def fieldNames(struct: JsonNode): Seq[String] =
    Option(struct.get("fields")).map { fs =>
      val b = Seq.newBuilder[String]
      val it = fs.elements()
      while (it.hasNext) Option(it.next().get("name")).foreach(n => b += n.asText)
      b.result()
    }.getOrElse(Nil)
}
