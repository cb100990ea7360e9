package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.cdc.AvroConfluent

/** Avro OBJECT CONTAINER FILE reader (the `.avro` files object stores
  * actually hold — Avro spec "Object Container Files": magic, schema
  * in the header metadata, compressed record blocks with sync
  * markers). Spark's `format("avro")` lives in the external spark-avro
  * module, which this environment does not ship; the runtime
  * avro-1.12 jar does, and `DataFileReader` + the same
  * [[AvroConfluent]] GenericData→Spark conversion (decimal/date/
  * timestamp logicals included) cover the format natively.
  *
  * Scale shape: files land via Spark's `binaryFile` source (one file
  * per row, partitioned across executors), and each file decodes
  * map-only in `mapPartitions` — no shuffle, embarrassingly parallel,
  * the same contract as the multimodal codec passes. Container-level
  * compression (deflate via the JDK, snappy via Spark's bundled
  * snappy-java) is handled by `DataFileReader` itself. The reader
  * schema is derived ONCE from the first file driver-side (or passed
  * explicitly); later files RESOLVE against it per Avro schema
  * resolution, so mixed-generation directories read consistently.
  *
  * Caveat: `binaryFile` materializes each file in memory — right for
  * the many-modest-files layout object stores produce; a single
  * multi-GB container should be split upstream (the format's sync
  * markers exist for exactly that).
  */
object AvroFiles {

  /** Writer-schema JSON from one container's header. */
  def containerSchemaJson(bytes: Array[Byte]): String = {
    val r = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    try r.getSchema.toString finally r.close()
  }

  /** Read a directory/glob of Avro container files; the reader schema
    * comes from the first file found.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val head = binary(spark, path).limit(1).collect()
    require(head.nonEmpty, s"avro files: nothing matches '$path'")
    readWith(spark, path, containerSchemaJson(head.head))
  }

  /** Read with an explicit reader schema (Avro schema resolution
    * applies per file — renamed/added fields follow the spec rules).
    */
  def readWith(spark: SparkSession, path: String,
      readerSchemaJson: String): DataFrame =
    decodeContainers(binary(spark, path), readerSchemaJson)

  /** Decode a feed of in-memory container byte blobs — the transport-
    * agnostic half [[readWith]] and the round-trip gate share.
    */
  def decodeContainers(
      files: org.apache.spark.sql.Dataset[Array[Byte]],
      readerSchemaJson: String): DataFrame = {
    val outSchema: StructType = AvroConfluent.sparkSchema(readerSchemaJson)
    files.mapPartitions { fs =>
      val expected: AvroSchema = AvroConfluent.parsedSchema(readerSchemaJson)
      val fields = expected.getFields.asScala.toSeq
      fs.flatMap { bytes =>
        val datum = new GenericDatumReader[GenericRecord]()
        datum.setExpected(expected)
        val reader = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes), datum)
        // DataFileReader is an iterator; drain it eagerly so the
        // reader can close before the next file decodes
        try {
          val out = Vector.newBuilder[Row]
          while (reader.hasNext) {
            val rec = reader.next()
            out += Row.fromSeq(fields.map(f =>
              AvroConfluent.convert(rec.get(f.pos()), f.schema())))
          }
          out.result()
        } finally reader.close()
      }
    }(Encoders.row(outSchema)).toDF()
  }

  /** Encode twin (the PgOutput/KafkaBatch/Arrow gate strategy): one
    * deflate-compressed container per input partition, built in
    * memory executor-side. Row values must align with the schema's
    * field order.
    */
  def encodeContainers(df: DataFrame, avroSchemaJson: String)
      : org.apache.spark.sql.Dataset[Array[Byte]] =
    df.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = AvroConfluent.parsedSchema(avroSchemaJson)
        val out = new java.io.ByteArrayOutputStream()
        val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
          new org.apache.avro.generic.GenericDatumWriter[GenericRecord](
            schema))
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(3))
        w.create(schema, out)
        try rows.foreach(r =>
          w.append(AvroConfluent.Encode.buildRecord(schema, r.toSeq)))
        finally w.close()
        Iterator.single(out.toByteArray)
      }
    }(Encoders.BINARY)

  private def binary(spark: SparkSession, path: String) = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .load(path)
      .select("content").as[Array[Byte]]
  }
}
