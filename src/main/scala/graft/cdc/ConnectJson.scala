package graft.cdc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka Connect JSON-converter decoder with IN-BAND schemas — the
  * reference Kafka connector's schema-registry consumption path
  * (/root/reference/dozer-ingestion/kafka/src/debezium/
  * stream_consumer.rs: every message is `{"schema": <connect schema
  * struct>, "payload": {before, after, op}}`; schema.rs `map_schema`
  * derives the table schema from the value schema's `after` struct and
  * the primary key from the KEY message's schema; mapper.rs
  * `convert_value_to_schema` converts the JSON cells).
  *
  * Unlike [[Debezium.decode]] (caller-declared row schema), NOTHING
  * here is caller-declared: the row schema, logical types, and primary
  * key all ride in the messages themselves — the contract that lets a
  * pipeline consume a topic it has never seen.
  *
  * Type treatment (schema.rs `map_type`, with the logical conversions
  * mapper.rs declares — its `name`-branch is the documented intent;
  * dozer's live code falls back to physical types, which loses
  * Debezium's actual encodings, e.g. decimals are base64 bytes on the
  * wire — so the conversions here complete the mapping rather than
  * replicate the fallback):
  *
  *  - `int/int8/16/32/64` → LongType; `float`, `float32`, `float64`,
  *    `double` → DoubleType; `boolean` → BooleanType;
  *    `string` → StringType; `bytes` → BinaryType (base64-decoded)
  *  - `io.debezium.time.MicroTimestamp` (µs) /
  *    `io.debezium.time.Timestamp`, `o.a.k.connect.data.Timestamp`
  *    (ms) → TimestampType
  *  - `io.debezium.time.MicroTime` (µs) / `o.a.k.connect.data.Time`
  *    (ms) → TimestampType on the epoch day (map_type parity: Time
  *    maps to Timestamp)
  *  - `io.debezium.time.Date`, `o.a.k.connect.data.Date` (epoch days)
  *    → DateType
  *  - `o.a.k.connect.data.Decimal` → DecimalType(precision from
  *    `connect.decimal.precision` else 38, scale from `scale`);
  *    the value is base64 big-endian two's-complement unscaled bytes
  *    (Debezium's actual wire encoding)
  *  - `io.debezium.data.VariableScaleDecimal` (struct {scale, value})
  *    → DecimalType(38, 18), per-row rescale
  *  - `io.debezium.data.Json` → StringType (JSON text)
  *
  * Unknown types fail loudly (KafkaSchemaError::TypeNotSupported
  * parity).
  *
  * Scale: the schema rides in EVERY message but is read ONCE —
  * a 1-row driver sample (model-sized by construction) derives the
  * plan; the data path is then the same codegen'd from_json + column
  * conversions as [[Debezium.decode]], map-only. The only per-row
  * non-codegen work is the decimal byte decode (a scalar UDF — Spark
  * has no unscaled-bytes-to-decimal builtin; same documented trade as
  * the bloom-probe UDF in q55b).
  */
object ConnectJson {

  private[cdc] final case class FieldSpec(name: String, physical: DataType,
      convert: Column => Column, output: DataType)

  final case class Derived(rawRowSchema: StructType,
      primaryKey: Seq[String], private[ConnectJson] val specs: Seq[FieldSpec])

  private def textOpt(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filterNot(_.isNull).map(_.asText)

  /** schema.rs map_type + mapper.rs conversions for one field struct. */
  private def fieldSpec(f: JsonNode): FieldSpec = {
    val fname = textOpt(f, "field").getOrElse(
      throw new IllegalArgumentException("connect schema: field with no name"))
    val typ = textOpt(f, "type").getOrElse(
      throw new IllegalArgumentException(
        s"connect schema: field '$fname' has no type"))
    def params: Map[String, String] = Option(f.get("parameters")) match {
      case None => Map.empty
      case Some(p) =>
        val it = p.fields()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asText) }
        b.result()
    }
    textOpt(f, "name") match {
      case None => typ match {
        case "int" | "int8" | "int16" | "int32" | "int64" =>
          FieldSpec(fname, LongType, identity, LongType)
        case "string" =>
          FieldSpec(fname, StringType, identity, StringType)
        case "bytes" => // base64 carrier → binary
          FieldSpec(fname, StringType, unbase64, BinaryType)
        case "float" | "float32" | "float64" | "double" =>
          FieldSpec(fname, DoubleType, identity, DoubleType)
        case "boolean" =>
          FieldSpec(fname, BooleanType, identity, BooleanType)
        case other => throw new IllegalArgumentException(
          s"connect schema: type not supported: $other (field '$fname')")
      }
      case Some(logical) => logical match {
        case "io.debezium.time.MicroTimestamp" | "io.debezium.time.MicroTime" =>
          FieldSpec(fname, LongType, timestamp_micros, TimestampType)
        case "io.debezium.time.Timestamp" |
             "org.apache.kafka.connect.data.Timestamp" |
             "org.apache.kafka.connect.data.Time" =>
          FieldSpec(fname, LongType, timestamp_millis, TimestampType)
        case "io.debezium.time.Date" | "org.apache.kafka.connect.data.Date" =>
          FieldSpec(fname, LongType,
            c => date_add(to_date(lit("1970-01-01")), c.cast(IntegerType)),
            DateType)
        case "org.apache.kafka.connect.data.Decimal" =>
          val scale = params.getOrElse("scale",
            throw new IllegalArgumentException(
              s"connect schema: decimal field '$fname' has no scale")).toInt
          val precision = params.get("connect.decimal.precision")
            .map(_.toInt).getOrElse(38)
          val dt = DecimalType(precision, scale)
          val dec = udf((b64: String) =>
            if (b64 == null) null
            else new java.math.BigDecimal(
              new java.math.BigInteger(
                java.util.Base64.getDecoder.decode(b64)), scale))
          FieldSpec(fname, StringType, c => dec(c).cast(dt), dt)
        case "io.debezium.data.VariableScaleDecimal" =>
          val dt = DecimalType(38, 18)
          val dec = udf((scale: java.lang.Long, b64: String) =>
            if (b64 == null || scale == null) null
            else new java.math.BigDecimal(
              new java.math.BigInteger(
                java.util.Base64.getDecoder.decode(b64)), scale.toInt))
          FieldSpec(fname,
            StructType(Seq(StructField("scale", LongType),
              StructField("value", StringType))),
            c => dec(c.getField("scale"), c.getField("value")).cast(dt), dt)
        case "io.debezium.data.Json" =>
          FieldSpec(fname, StringType, identity, StringType)
        case other => throw new IllegalArgumentException(
          s"connect schema: type not supported: $other (field '$fname')")
      }
    }
  }

  /** Derive the table contract from one VALUE schema struct and an
    * optional KEY schema struct (map_schema semantics: row fields from
    * the value schema's `after` struct — SchemaDefinitionNotFound if
    * absent; primary key = the key schema's field names).
    */
  def deriveFromNodes(valueSchema: JsonNode,
      keySchema: Option[JsonNode]): Derived = {
    val fields = Option(valueSchema.get("fields")).getOrElse(
      throw new IllegalArgumentException(
        "connect schema: schema definition not found (no fields)"))
    var after: JsonNode = null
    val it = fields.elements()
    while (it.hasNext) {
      val f = it.next()
      if (textOpt(f, "field").contains("after")) after = f
    }
    if (after == null) throw new IllegalArgumentException(
      "connect schema: schema definition not found (no 'after' struct)")
    val afterFields = Option(after.get("fields")).map { fs =>
      val b = Seq.newBuilder[FieldSpec]
      val fit = fs.elements()
      while (fit.hasNext) b += fieldSpec(fit.next())
      b.result()
    }.getOrElse(Nil)
    val pk = keySchema.toSeq.flatMap { ks =>
      Option(ks.get("fields")).toSeq.flatMap { fs =>
        val b = Seq.newBuilder[String]
        val fit = fs.elements()
        while (fit.hasNext) textOpt(fit.next(), "field").foreach(b += _)
        b.result()
      }
    }
    val raw = StructType(afterFields.map(s => StructField(s.name, s.physical)))
    Derived(raw, pk, afterFields)
  }

  /** Derive from raw message strings (the first message's embedded
    * schema — Connect repeats it on every message).
    */
  def derive(valueJson: String, keyJson: Option[String]): Derived = {
    val mapper = new ObjectMapper()
    def schemaNode(s: String): JsonNode = {
      val n = mapper.readTree(s)
      Option(n.get("schema")).filterNot(_.isNull).getOrElse(
        throw new IllegalArgumentException(
          "connect message carries no 'schema' node — enable " +
            "schemas in the JSON converter or use Debezium.decode " +
            "with a declared schema"))
    }
    deriveFromNodes(schemaNode(valueJson), keyJson.map(schemaNode))
  }

  /** Decode a feed of Connect-JSON messages into TYPED [[ChangeModel]]
    * rows with the schema and key derived IN-BAND: one driver sample
    * row reads the embedded schema, then the distributed path is
    * `Debezium.decode` against the physical schema + per-column
    * logical conversions. Returns the change rows and the derived
    * primary key (feed both into `ChangeModel.applyChanges`).
    *
    * @param keyCol optional column carrying the Kafka KEY message
    *               (its embedded schema names the primary key —
    *               map_schema's second argument)
    */
  def changes(feed: DataFrame, valueCol: String,
      keyCol: Option[String] = None,
      seq: Option[Column] = None): (DataFrame, Seq[String]) = {
    require(!feed.isStreaming,
      "connect decode: a streaming feed cannot be sampled for its " +
        "schema — derive once from a batch snapshot (derive / " +
        "deriveFromFeed) and apply decodeWith to the stream")
    val d = deriveFromFeed(feed, valueCol, keyCol)
    (decodeWith(d, feed, valueCol, seq), d.primaryKey)
  }

  /** Sample ONE message off a batch feed and derive the contract
    * (driver-side, 1 row — model-sized by construction).
    */
  def deriveFromFeed(feed: DataFrame, valueCol: String,
      keyCol: Option[String] = None): Derived = {
    val sample = feed.select(
        col(valueCol).cast("string").as("v"),
        keyCol.map(c => col(c).cast("string")).getOrElse(lit(null)).as("k"))
      .filter(col("v").isNotNull)
      .limit(1).collect()
    require(sample.nonEmpty,
      "connect decode: feed has no non-null value to derive the schema from")
    derive(sample.head.getString(0), Option(sample.head.getString(1)))
  }

  /** Apply a derived contract to a feed — pure column work, so it runs
    * identically on batch feeds and STREAMS (derive from a snapshot
    * once, decode the stream forever; a schema change in the topic
    * then fails loudly in from_json/conversions rather than silently
    * drifting).
    */
  def decodeWith(d: Derived, feed: DataFrame, valueCol: String,
      seq: Option[Column] = None): DataFrame = {
    val ch = Debezium.decode(feed, valueCol, d.rawRowSchema, seq)
    ch.select(
      d.specs.map(s => s.convert(col(s.name)).as(s.name)) ++
        Seq(col(ChangeModel.OpCol), col(ChangeModel.SeqCol)): _*)
  }
}
