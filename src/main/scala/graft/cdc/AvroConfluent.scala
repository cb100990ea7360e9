package graft.cdc

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer


import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Confluent-framed AVRO decoder — the binary half of the reference's
  * Kafka schema-registry path (kafka/src/debezium/schema_registry.rs
  * fetches Avro schemas via `schema_registry_converter`; registry
  * topics carry Debezium envelopes as Avro binary in the PUBLIC
  * Confluent wire format: `0x00 magic | schema id i32 BE | avro
  * binary`). The reference consumes the JSON-converter form
  * (stream_consumer.rs); Avro is what the registry exists for, so this
  * completes the path the registry client opens.
  *
  * Built directly on `org.apache.avro` (Spark bundles avro-1.12 for
  * its own use; the spark-avro SQL module is not shipped, so
  * `from_avro` is unavailable — the decode here is a mapPartitions
  * with a per-partition `GenericDatumReader`, which is exactly what
  * spark-avro compiles to, minus codegen).
  *
  * Schema mapping (Avro → Spark, the dozer-relevant subset; anything
  * else fails loudly):
  *
  *  - `boolean`→Boolean, `int`/`long`→Long, `float`/`double`→Double,
  *    `string`/`enum`→String, `bytes`/`fixed`→Binary,
  *    `record`→Struct (nested — the Debezium envelope shape),
  *    union-with-`null` → nullable
  *  - logical types: `decimal(p,s)` on bytes/fixed → DecimalType(p,s)
  *    (big-endian two's-complement unscaled bytes — same encoding the
  *    Connect JSON path carries base64); `date` on int → DateType;
  *    `timestamp-micros`/`timestamp-millis` on long → TimestampType
  *
  * [[changes]] lifts a Debezium-envelope Avro feed into ChangeModel
  * rows with the same op contract as [[Debezium.decode]] /
  * [[ConnectJson]]: r/c → insert of `after`, u → pre+post images
  * sharing a `_seq`, d → delete of `before`.
  *
  * Scale: decode is map-only (reader reused across a partition,
  * `BinaryDecoder` reused across rows); the schema travels as its JSON
  * text and parses once per partition. Oracled end-to-end as q104.
  */
object AvroConfluent {

  // ------------------------------------------------------------- framing

  val Magic: Byte = 0x00

  def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + body.length)
    out(0) = Magic
    out(1) = ((schemaId >> 24) & 0xff).toByte
    out(2) = ((schemaId >> 16) & 0xff).toByte
    out(3) = ((schemaId >> 8) & 0xff).toByte
    out(4) = (schemaId & 0xff).toByte
    System.arraycopy(body, 0, out, 5, body.length)
    out
  }

  def unframe(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 5 && bytes(0) == Magic,
      s"confluent avro: bad frame (len ${bytes.length}, " +
        s"magic ${if (bytes.isEmpty) "none" else bytes(0).toString})")
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    (id, java.util.Arrays.copyOfRange(bytes, 5, bytes.length))
  }

  // -------------------------------------------------------- schema map

  /** Avro schema (JSON) → Spark type. Unions must be [null, T]. */
  def sparkType(s: AvroSchema): DataType = s.getType match {
    case AvroSchema.Type.BOOLEAN => BooleanType
    case AvroSchema.Type.INT =>
      if (s.getLogicalType != null &&
        s.getLogicalType.getName == "date") DateType else LongType
    case AvroSchema.Type.LONG => s.getLogicalType match {
      case lt if lt != null && (lt.getName == "timestamp-micros" ||
        lt.getName == "timestamp-millis") => TimestampType
      case _ => LongType
    }
    case AvroSchema.Type.FLOAT | AvroSchema.Type.DOUBLE => DoubleType
    case AvroSchema.Type.STRING | AvroSchema.Type.ENUM => StringType
    case AvroSchema.Type.BYTES | AvroSchema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
    case AvroSchema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        val (dt, nullable) = fieldType(f.schema())
        StructField(f.name(), dt, nullable)
      })
    case other => throw new IllegalArgumentException(
      s"confluent avro: type not supported: $other")
  }

  private def fieldType(s: AvroSchema): (DataType, Boolean) =
    if (s.getType == AvroSchema.Type.UNION) {
      val members = s.getTypes.asScala.toSeq
      val nonNull = members.filter(_.getType != AvroSchema.Type.NULL)
      require(nonNull.length == 1,
        s"confluent avro: only [null, T] unions are supported, got $s")
      (sparkType(nonNull.head), members.length > nonNull.length)
    } else (sparkType(s), false)

  def sparkSchema(avroSchemaJson: String): StructType =
    sparkType(new AvroSchema.Parser().parse(avroSchemaJson)) match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"confluent avro: top-level schema must be a record, got $other")
    }

  // ------------------------------------------------------ value convert

  private[graft] def convert(v: AnyRef, s: AvroSchema): Any = {
    if (v == null) return null
    s.getType match {
      case AvroSchema.Type.UNION =>
        val nonNull = s.getTypes.asScala.find(_.getType != AvroSchema.Type.NULL).get
        convert(v, nonNull)
      case AvroSchema.Type.BOOLEAN => v.asInstanceOf[java.lang.Boolean]
      case AvroSchema.Type.INT =>
        val i = v.asInstanceOf[java.lang.Integer].intValue
        if (s.getLogicalType != null && s.getLogicalType.getName == "date")
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong))
        else i.toLong
      case AvroSchema.Type.LONG =>
        val l = v.asInstanceOf[java.lang.Long].longValue
        s.getLogicalType match {
          case lt if lt != null && lt.getName == "timestamp-micros" =>
            microsToTs(l)
          case lt if lt != null && lt.getName == "timestamp-millis" =>
            microsToTs(Math.multiplyExact(l, 1000L))
          case _ => l
        }
      case AvroSchema.Type.FLOAT =>
        v.asInstanceOf[java.lang.Float].doubleValue
      case AvroSchema.Type.DOUBLE => v.asInstanceOf[java.lang.Double]
      case AvroSchema.Type.STRING | AvroSchema.Type.ENUM => v.toString
      case AvroSchema.Type.BYTES =>
        val bb = v.asInstanceOf[ByteBuffer]
        val bytes = new Array[Byte](bb.remaining())
        bb.duplicate().get(bytes)
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            new java.math.BigDecimal(
              new java.math.BigInteger(bytes), d.getScale)
          case _ => bytes
        }
      case AvroSchema.Type.FIXED =>
        val bytes = v.asInstanceOf[GenericData.Fixed].bytes()
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            new java.math.BigDecimal(
              new java.math.BigInteger(bytes), d.getScale)
          case _ => bytes
        }
      case AvroSchema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.toSeq.map(f =>
          convert(rec.get(f.pos()), f.schema())))
      case other => throw new IllegalArgumentException(
        s"confluent avro: type not supported: $other")
    }
  }

  private def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  // --------------------------------------------------------------- decode

  /** Decode a feed of `(seqCol, valueCol binary)` Confluent frames into
    * `(seq, <record fields...>)` rows — map-only; the writer schema
    * parses once per partition, the datum reader and binary decoder are
    * reused across rows.
    */
  def decodeRecords(feed: DataFrame, valueCol: String,
      avroSchemaJson: String, seqCol: String = "seq"): DataFrame = {
    val rowSchema = sparkSchema(avroSchemaJson)
    val outSchema = StructType(
      StructField(seqCol, LongType, nullable = false) +: rowSchema.fields)
    val src = feed.select(col(seqCol).cast("long"), col(valueCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      val schema = parsedSchema(avroSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var decoder: org.apache.avro.io.BinaryDecoder = null
      val fields = schema.getFields.asScala.toSeq
      it.map { case (seq, bytes) =>
        val (_, body) = unframe(bytes)
        decoder = DecoderFactory.get().binaryDecoder(body, decoder)
        val rec = reader.read(null, decoder)
        Row.fromSeq(seq +: fields.map(f => convert(rec.get(f.pos()), f.schema())))
      }
    }(Encoders.row(outSchema)).toDF()
  }

  /** Debezium envelope in Avro → ChangeModel rows. The envelope schema
    * must be a record with `before`/`after` (nullable sub-records) and
    * `op` (string) — the shape Debezium registers for every table.
    */
  def changes(feed: DataFrame, valueCol: String,
      envelopeSchemaJson: String, seqCol: String = "seq"): DataFrame = {
    val Op = ChangeModel
    val env = decodeRecords(feed, valueCol, envelopeSchemaJson, seqCol)
    Seq("before", "after", "op").foreach(c =>
      require(env.columns.contains(c),
        s"confluent avro: envelope schema has no '$c' field"))
    val images = env.select(col(seqCol).as(Op.SeqCol), col("op"), explode(array(
        struct(lit(Op.UpdatePre).as("img"), col("before").as("r")),
        struct(lit(Op.UpdatePost).as("img"), col("after").as("r")))).as("e"))
      .select(col(Op.SeqCol), col("op"), col("e.img").as("__img"),
        col("e.r").as("__r"))
    images
      .filter(
        ((col("op") === "c" || col("op") === "r") &&
          col("__img") === Op.UpdatePost) ||
        (col("op") === "d" && col("__img") === Op.UpdatePre) ||
        (col("op") === "u"))
      .select(
        col("__r.*"),
        when(col("op") === "c" || col("op") === "r", Op.Insert)
          .when(col("op") === "d", Op.Delete)
          .otherwise(col("__img")).as(Op.OpCol),
        col(Op.SeqCol))
  }

  // --------------------------------------------------------------- encode

  /** Encode twin for the correctness gate (the PgOutput/MyBinlog/
    * KafkaBatch.Encode strategy): build one Confluent frame from cell
    * values laid out in the schema's field order. Sub-records are
    * `Seq[Any]`, decimals are BigDecimal (scaled to the field's
    * declared scale), timestamps java.sql.Timestamp, dates
    * java.sql.Date.
    */
  /** Parsed-schema cache: encode runs once PER RECORD in capture
    * fixtures (q104 builds one envelope per source row) and
    * `Schema.Parser` is the dominant cost at that granularity; parsed
    * Avro schemas are immutable and safe to share across threads.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, AvroSchema]()

  private[graft] def parsedSchema(json: String): AvroSchema =
    schemaCache.computeIfAbsent(json,
      j => new AvroSchema.Parser().parse(j))

  object Encode {
    def record(avroSchemaJson: String, schemaId: Int,
        values: Seq[Any]): Array[Byte] = {
      val schema = parsedSchema(avroSchemaJson)
      val rec = buildRecord(schema, values)
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
      enc.flush()
      frame(schemaId, out.toByteArray)
    }

    private[graft] def buildRecord(schema: AvroSchema, values: Seq[Any]): GenericRecord = {
      val rec = new GenericData.Record(schema)
      schema.getFields.asScala.zip(values).foreach { case (f, v) =>
        rec.put(f.pos(), toAvro(v, f.schema()))
      }
      rec
    }

    private def toAvro(v: Any, s: AvroSchema): AnyRef = {
      if (v == null) return null
      s.getType match {
        case AvroSchema.Type.UNION =>
          toAvro(v, s.getTypes.asScala.find(_.getType != AvroSchema.Type.NULL).get)
        case AvroSchema.Type.BOOLEAN => java.lang.Boolean.valueOf(v.asInstanceOf[Boolean])
        case AvroSchema.Type.INT => v match {
          case d: java.sql.Date =>
            java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
          case n: Long => java.lang.Integer.valueOf(n.toInt)
          case n: Int => java.lang.Integer.valueOf(n)
          case other => throw new IllegalArgumentException(s"int field got $other")
        }
        case AvroSchema.Type.LONG => v match {
          case ts: java.sql.Timestamp =>
            val us = Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
            java.lang.Long.valueOf(s.getLogicalType match {
              case lt if lt != null && lt.getName == "timestamp-millis" => us / 1000L
              case _ => us
            })
          case n: Long => java.lang.Long.valueOf(n)
          case n: Int => java.lang.Long.valueOf(n.toLong)
          case other => throw new IllegalArgumentException(s"long field got $other")
        }
        case AvroSchema.Type.FLOAT =>
          java.lang.Float.valueOf(v.asInstanceOf[Double].toFloat)
        case AvroSchema.Type.DOUBLE => v match {
          case d: Double => java.lang.Double.valueOf(d)
          case other => throw new IllegalArgumentException(s"double field got $other")
        }
        case AvroSchema.Type.STRING => v.toString
        case AvroSchema.Type.BYTES => s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.getScale)
            ByteBuffer.wrap(bd.unscaledValue().toByteArray)
          case _ => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
        }
        case AvroSchema.Type.RECORD =>
          buildRecord(s, v.asInstanceOf[Seq[Any]])
        case other => throw new IllegalArgumentException(
          s"confluent avro encode: type not supported: $other")
      }
    }
  }
}
