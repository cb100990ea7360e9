package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** AVRO DATA FILES for the native iceberg reader/writer — the iceberg
  * spec's third data-file format (`file_format: AVRO`), carried by the
  * same object-container machinery [[AvroFiles]] uses for plain `.avro`
  * directories, but with the iceberg-specific pieces the spec adds:
  * `field-id` properties on every schema field, `adjust-to-utc` on
  * timestamps, and — because this codec decodes each container
  * sequentially executor-side — EXACT per-file row ordinals, so
  * position deletes (parquet delete files over avro data files are
  * spec-legal mixed-format tables) both apply and stage correctly.
  * Spark's ORC reader can't do that (no `_metadata.row_index`), which
  * is why avro data files support the full mutation surface while ORC
  * tables are scan/eq-delete only.
  *
  * Scale shape: `binaryFile` never splits a container, so one file =
  * one in-memory decode on one executor (the [[AvroFiles]] caveat:
  * right for the modest-file layout iceberg writers produce; a
  * multi-GB data file should be compacted upstream). Scans are
  * map-only; staging writes one container per shuffle partition
  * directly from the executor, tracking row counts and column bounds
  * IN the encode pass — no second scan, the footer-stats analogue for
  * a format that has no footer.
  *
  * Reference note: dozer's lake connector reads parquet only
  * (`dozer-ingestion/deltalake/src/reader.rs`); avro data-file support
  * follows the public iceberg spec (§ Avro: required `field-id`
  * attributes, timestamp `adjust-to-utc`).
  */
object IcebergAvroData {

  private[sources] def isSupported(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
        StringType | DateType | TimestampType | TimestampNTZType |
        BinaryType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Refuse loudly on a schema this codec can't carry (nested/array/map
    * columns need the iceberg runtime's avro writer).
    */
  private[sources] def requireSupported(schema: StructType): Unit =
    schema.fields.foreach(f => require(isSupported(f.dataType),
      s"avro data files: column '${f.name}' has unsupported type " +
        s"${f.dataType.sql} (nested/array/map columns need the iceberg " +
        "runtime)"))

  // ------------------------------------------------------------ schema

  /** Avro schema JSON for a table schema with iceberg `field-id`
    * properties (spec: required on every record field).
    */
  def avroSchemaJson(schema: StructType, ids: Map[String, Int]): String = {
    requireSupported(schema)
    val fields = schema.fields.map { f =>
      val t = avroTypeJson(f.dataType)
      val typed = if (f.nullable) s"""["null",$t]""" else t
      val dflt = if (f.nullable) ""","default":null""" else ""
      s"""{"name":"${f.name}","field-id":${ids.getOrElse(f.name, 0)}""" +
        s""","type":$typed$dflt}"""
    }
    s"""{"type":"record","name":"table","fields":[${fields.mkString(",")}]}"""
  }

  private def avroTypeJson(dt: DataType): String = dt match {
    case BooleanType => "\"boolean\""
    case IntegerType => "\"int\""
    case LongType => "\"long\""
    case FloatType => "\"float\""
    case DoubleType => "\"double\""
    case StringType => "\"string\""
    case BinaryType => "\"bytes\""
    case DateType => """{"type":"int","logicalType":"date"}"""
    case TimestampType =>
      """{"type":"long","logicalType":"timestamp-micros","adjust-to-utc":true}"""
    case TimestampNTZType =>
      """{"type":"long","logicalType":"timestamp-micros","adjust-to-utc":false}"""
    case d: DecimalType =>
      s"""{"type":"bytes","logicalType":"decimal","precision":${d.precision},"scale":${d.scale}}"""
    case other => throw new IllegalArgumentException(
      s"avro data files: unsupported type ${other.sql}")
  }

  // -------------------------------------------------------------- scan

  /** Distributed scan of avro data files projected BY NAME to
    * `readSchema` (a field missing from a file's writer schema reads
    * null — the same add-column evolution rule the parquet scan gets
    * from Spark). `withPos` appends `__ice_file` (the raw binaryFile
    * URI — caller normalizes) and `__ice_pos` (EXACT row ordinal within
    * the container, the iceberg position-delete coordinate).
    */
  def scan(spark: SparkSession, readSchema: StructType,
      paths: Seq[String], withPos: Boolean): DataFrame = {
    requireSupported(readSchema)
    val outSchema =
      if (!withPos) readSchema
      else StructType(readSchema.fields ++ Array(
        StructField("__ice_file", StringType, nullable = false),
        StructField("__ice_pos", LongType, nullable = false)))
    val files = spark.read.format("binaryFile").load(paths: _*)
      .select("path", "content")
    val fieldNames = readSchema.fields.map(_.name)
    val fieldTypes = readSchema.fields.map(_.dataType)
    files.mapPartitions { it =>
      it.flatMap { fr =>
        val path = fr.getString(0)
        val bytes = fr.getAs[Array[Byte]](1)
        val reader = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes),
          new GenericDatumReader[GenericRecord]())
        try {
          val writerSchema = reader.getSchema
          // per-file projection: reader field name -> writer position
          val pos: Array[Int] = fieldNames.map { n =>
            Option(writerSchema.getField(n)).map(_.pos).getOrElse(-1)
          }
          val fschemas: Array[AvroSchema] = fieldNames.map { n =>
            Option(writerSchema.getField(n)).map(_.schema).orNull
          }
          val out = Vector.newBuilder[Row]
          var ord = 0L
          while (reader.hasNext) {
            val rec = reader.next()
            val vals = new Array[Any](outSchema.length)
            var i = 0
            while (i < fieldNames.length) {
              vals(i) =
                if (pos(i) < 0) null
                else convertTo(fieldTypes(i), rec.get(pos(i)), fschemas(i),
                  fieldNames(i))
              i += 1
            }
            if (withPos) {
              vals(fieldNames.length) = path
              vals(fieldNames.length + 1) = ord
            }
            out += new org.apache.spark.sql.catalyst.expressions
              .GenericRowWithSchema(vals, outSchema)
            ord += 1L
          }
          out.result()
        } finally reader.close()
      }
    }(Encoders.row(outSchema)).toDF()
  }

  /** Avro datum → the Spark-typed value `dt` expects — TYPE-EXACT
    * (unlike [[graft.cdc.AvroConfluent]]'s int→long / float→double
    * Connect widenings, which would break `Encoders.row` against the
    * iceberg schema).
    */
  private def convertTo(dt: DataType, v: AnyRef, s: AvroSchema,
      name: String): Any = {
    if (v == null) return null
    val eff =
      if (s != null && s.getType == AvroSchema.Type.UNION)
        s.getTypes.asScala.find(_.getType != AvroSchema.Type.NULL).orNull
      else s
    (dt, v) match {
      case (BooleanType, b: java.lang.Boolean) => b.booleanValue
      case (IntegerType, i: java.lang.Integer) => i.intValue
      case (LongType, l: java.lang.Long) => l.longValue
      case (LongType, i: java.lang.Integer) => i.longValue
      case (FloatType, f: java.lang.Float) => f.floatValue
      case (DoubleType, d: java.lang.Double) => d.doubleValue
      case (StringType, s2) => s2.toString
      case (DateType, i: java.lang.Integer) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue))
      case (TimestampType | TimestampNTZType, l: java.lang.Long) =>
        val us =
          if (eff != null && eff.getLogicalType != null &&
              eff.getLogicalType.getName == "timestamp-millis")
            Math.multiplyExact(l.longValue, 1000L)
          else l.longValue
        if (dt == TimestampNTZType)
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        else {
          val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          t
        }
      case (BinaryType, bb: ByteBuffer) =>
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
      case (BinaryType, fx: GenericData.Fixed) => fx.bytes()
      case (d: DecimalType, bb: ByteBuffer) =>
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
        val scale = eff.getLogicalType match {
          case dec: LogicalTypes.Decimal => dec.getScale
          case _ => d.scale
        }
        new java.math.BigDecimal(new java.math.BigInteger(arr), scale)
      case (d: DecimalType, fx: GenericData.Fixed) =>
        val scale = eff.getLogicalType match {
          case dec: LogicalTypes.Decimal => dec.getScale
          case _ => d.scale
        }
        new java.math.BigDecimal(
          new java.math.BigInteger(fx.bytes()), scale)
      case _ => throw new IllegalArgumentException(
        s"avro data files: column '$name' holds ${v.getClass.getName}, " +
          s"cannot read as ${dt.sql}")
    }
  }

  // ------------------------------------------------------------- stage

  /** One staged container: absolute path, byte size, row count, and
    * per-eligible-column (min, max) tracked during the encode pass.
    */
  final case class StagedAvro(path: String, size: Long, rows: Long,
      bounds: Map[String, (Any, Any)])

  /** Stage `df` as avro containers under `dir`, ONE file per non-empty
    * partition, written DIRECTLY from the executors (driver sees only
    * (path, size, rows, bounds) — metadata-sized). `boundCols` names
    * the columns to track extremes for (the caller's bounds-eligible
    * set); bounds ride back as strings and re-type driver-side.
    */
  def stage(spark: SparkSession, df: DataFrame, dir: Path,
      ids: Map[String, Int]): Seq[StagedAvro] = {
    val schema = df.schema
    requireSupported(schema)
    val schemaJson = avroSchemaJson(schema, ids)
    val serConf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dirStr = dir.toString
    val tracked: Array[(Int, DataType)] = schema.fields.zipWithIndex
      .collect { case (f, i) if boundTrackable(f.dataType) =>
        (i, f.dataType)
      }
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("size", LongType),
      StructField("rows", LongType),
      StructField("bounds", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("min", StringType),
        StructField("max", StringType)))))))
    val names = schema.fieldNames
    val staged = df.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val avroSchema = new AvroSchema.Parser().parse(schemaJson)
        val afields = avroSchema.getFields.asScala.toArray
        val fs = new Path(dirStr)
          .getFileSystem(serConf.value)
        val target = new Path(dirStr,
          s"part-${java.util.UUID.randomUUID.toString}.avro")
        val os = fs.create(target, false)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(3))
        w.create(avroSchema, os)
        var n = 0L
        val mins = new Array[Any](tracked.length)
        val maxs = new Array[Any](tracked.length)
        try {
          rows.foreach { r =>
            val rec = new GenericData.Record(avroSchema)
            var i = 0
            while (i < afields.length) {
              rec.put(i, toAvroVal(r.get(i), afields(i).schema()))
              i += 1
            }
            w.append(rec)
            n += 1L
            var t = 0
            while (t < tracked.length) {
              val (idx, dt) = tracked(t)
              val v = r.get(idx)
              if (v != null) {
                if (mins(t) == null || cmpVals(dt, v, mins(t)) < 0)
                  mins(t) = v
                if (maxs(t) == null || cmpVals(dt, v, maxs(t)) > 0)
                  maxs(t) = v
              }
              t += 1
            }
          }
        } finally w.close()
        val size = fs.getFileStatus(target).getLen
        val bounds = tracked.indices.flatMap { t =>
          if (mins(t) == null) None
          else Some(Row(names(tracked(t)._1),
            boundStr(tracked(t)._2, mins(t)), boundStr(tracked(t)._2, maxs(t))))
        }
        Iterator.single(Row(target.toString, size, n, bounds))
      }
    }(Encoders.row(outSchema)).collect()
    val typeOf = schema.fields.map(f => f.name -> f.dataType).toMap
    staged.toSeq.map { r =>
      val bounds = r.getSeq[Row](3).map { b =>
        val dt = typeOf(b.getString(0))
        b.getString(0) -> (boundVal(dt, b.getString(1)),
          boundVal(dt, b.getString(2)))
      }.toMap
      StagedAvro(r.getString(0), r.getLong(1), r.getLong(2), bounds)
    }
  }

  // bounds track only the types [[IcebergLite.serializeBound]] carries
  private def boundTrackable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | DateType |
        StringType => true
    case _ => false
  }

  private def cmpVals(dt: DataType, a: Any, b: Any): Int = dt match {
    case IntegerType => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case FloatType => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case DateType => a.asInstanceOf[java.sql.Date].toLocalDate
      .compareTo(b.asInstanceOf[java.sql.Date].toLocalDate)
    case StringType => a.asInstanceOf[String].compareTo(b.asInstanceOf[String])
    case other => throw new IllegalStateException(s"untracked type $other")
  }

  private def boundStr(dt: DataType, v: Any): String = dt match {
    case DateType => v.asInstanceOf[java.sql.Date].toLocalDate.toString
    case _ => v.toString
  }

  private def boundVal(dt: DataType, s: String): Any = dt match {
    case IntegerType => s.toInt
    case LongType => s.toLong
    case FloatType => s.toFloat
    case DoubleType => s.toDouble
    case DateType => java.sql.Date.valueOf(s)
    case StringType => s
    case other => throw new IllegalStateException(s"untracked type $other")
  }

  /** Spark row value → avro datum, TYPE-EXACT per the schema this
    * object generated (float stays float, int stays int).
    */
  private def toAvroVal(v: Any, s: AvroSchema): AnyRef = {
    if (v == null) return null
    val eff =
      if (s.getType == AvroSchema.Type.UNION)
        s.getTypes.asScala.find(_.getType != AvroSchema.Type.NULL).get
      else s
    v match {
      case b: Boolean => java.lang.Boolean.valueOf(b)
      case i: Int => java.lang.Integer.valueOf(i)
      case l: Long => java.lang.Long.valueOf(l)
      case f: Float => java.lang.Float.valueOf(f)
      case d: Double => java.lang.Double.valueOf(d)
      case st: String => st
      case d: java.sql.Date =>
        java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
      case ts: java.sql.Timestamp =>
        java.lang.Long.valueOf(
          Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
      case ldt: java.time.LocalDateTime =>
        val us = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
        java.lang.Long.valueOf(us)
      case bytes: Array[Byte] => ByteBuffer.wrap(bytes)
      case bd: java.math.BigDecimal =>
        val scale = eff.getLogicalType match {
          case dec: LogicalTypes.Decimal => dec.getScale
          case _ => bd.scale
        }
        ByteBuffer.wrap(bd.setScale(scale).unscaledValue().toByteArray)
      case bd: BigDecimal =>
        toAvroVal(bd.bigDecimal, s)
      case other => throw new IllegalArgumentException(
        s"avro data files: cannot encode ${other.getClass.getName}")
    }
  }
}
