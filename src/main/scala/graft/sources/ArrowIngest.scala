package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.channels.Channels

import scala.collection.mutable

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ARROW IPC ingestion — the dozer gRPC Arrow ingest adapter analogue
  * (/root/reference/dozer-ingestion/grpc/src/adapter/arrow.rs: clients
  * push `IngestArrowRequest{schema_name, records}` where `records` is an
  * Arrow IPC *stream* — schema message + record batches — decoded with
  * `StreamReader` and mapped row-by-row to Insert operations on the
  * ingest channel).
  *
  * Spark-native shape, zero new dependencies (Spark bundles
  * arrow-vector for its own columnar interchange):
  *
  *  - [[encodeFrames]] / [[decodeFrames]]: a distributed codec between
  *    DataFrames and IPC stream frames — encode is one frame per input
  *    partition built executor-side (no driver collect), decode is a
  *    map-only flatMap, so both scale with partition count on a real
  *    cluster.
  *  - [[ingest]]: the transport edge — one IPC frame lands as ONE
  *    envelope on a bounded [[PushBuffer]] channel (the
  *    IngestArrowRequest analogue), giving Arrow push ingest the same
  *    batch-snapshot + checkpointed micro-batch scan paths and the same
  *    backpressure contract as the webhook edge.
  *  - [[changes]]: decode a push feed of Arrow envelopes into
  *    ChangeModel Insert rows (`arrow.rs` maps every record to
  *    `Operation::Insert`), ordered by `(frame seq, row index)`.
  *
  * Type matrix: the Spark types with a stable Arrow physical mapping —
  * int/bigint, float/double, utf8, binary, bool, timestamp-µs (UTC and
  * NTZ), date-day. Anything else fails loudly at encode/decode time
  * rather than producing silently lossy frames.
  */
object ArrowIngest {

  // ------------------------------------------------------------- schema map

  private def arrowType(dt: DataType): ArrowType = dt match {
    case IntegerType      => new ArrowType.Int(32, true)
    case LongType         => new ArrowType.Int(64, true)
    case FloatType        => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType       => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType       => ArrowType.Utf8.INSTANCE
    case BinaryType       => ArrowType.Binary.INSTANCE
    case BooleanType      => ArrowType.Bool.INSTANCE
    case TimestampType    => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
    case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
    case DateType         => new ArrowType.Date(DateUnit.DAY)
    case other => throw new IllegalArgumentException(
      s"arrow ingest: unsupported Spark type $other")
  }

  def toArrowSchema(schema: StructType): ArrowSchema = {
    val fields = new java.util.ArrayList[Field]()
    schema.fields.foreach { f =>
      fields.add(new Field(f.name,
        new FieldType(f.nullable, arrowType(f.dataType), null),
        java.util.Collections.emptyList[Field]()))
    }
    new ArrowSchema(fields)
  }

  private def tsToMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  // ---------------------------------------------------------------- encode

  /** Encode a DataFrame as Arrow IPC stream frames: one frame per input
    * partition (executor-side), each containing record batches of at
    * most `maxBatchRows` rows — the shape a fleet of gRPC clients
    * would push.
    */
  def encodeFrames(df: DataFrame, maxBatchRows: Int = 4096): Dataset[Array[Byte]] = {
    val schema = df.schema
    df.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else Iterator.single(encodePartition(rows, schema, maxBatchRows))
    }(Encoders.BINARY)
  }

  /** Encode one iterator of rows into a single IPC stream frame. */
  def encodePartition(rows: Iterator[Row], schema: StructType,
      maxBatchRows: Int): Array[Byte] = {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val root = VectorSchemaRoot.create(toArrowSchema(schema), alloc)
      try {
        val bos = new ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, Channels.newChannel(bos))
        writer.start()
        rows.grouped(maxBatchRows).foreach { batch =>
          root.allocateNew()
          batch.zipWithIndex.foreach { case (row, i) =>
            var j = 0
            while (j < schema.length) {
              setCell(root.getVector(j), i, row, j)
              j += 1
            }
          }
          root.setRowCount(batch.length)
          writer.writeBatch()
        }
        writer.end()
        writer.close()
        bos.toByteArray
      } finally root.close()
    } finally alloc.close()
  }

  private def setCell(vec: FieldVector, i: Int, row: Row, j: Int): Unit =
    vec match {
      case v: IntVector =>
        if (row.isNullAt(j)) v.setNull(i) else v.setSafe(i, row.getInt(j))
      case v: BigIntVector =>
        if (row.isNullAt(j)) v.setNull(i) else v.setSafe(i, row.getLong(j))
      case v: Float4Vector =>
        if (row.isNullAt(j)) v.setNull(i) else v.setSafe(i, row.getFloat(j))
      case v: Float8Vector =>
        if (row.isNullAt(j)) v.setNull(i) else v.setSafe(i, row.getDouble(j))
      case v: VarCharVector =>
        if (row.isNullAt(j)) v.setNull(i)
        else v.setSafe(i, row.getString(j).getBytes(UTF_8))
      case v: VarBinaryVector =>
        if (row.isNullAt(j)) v.setNull(i)
        else v.setSafe(i, row.getAs[Array[Byte]](j))
      case v: BitVector =>
        if (row.isNullAt(j)) v.setNull(i)
        else v.setSafe(i, if (row.getBoolean(j)) 1 else 0)
      case v: TimeStampMicroTZVector =>
        if (row.isNullAt(j)) v.setNull(i)
        else v.setSafe(i, tsToMicros(row.getAs[java.sql.Timestamp](j)))
      case v: TimeStampMicroVector =>
        if (row.isNullAt(j)) v.setNull(i)
        else {
          val ldt = row.getAs[java.time.LocalDateTime](j)
          v.setSafe(i,
            ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              ldt.getNano / 1000L)
        }
      case v: DateDayVector =>
        if (row.isNullAt(j)) v.setNull(i)
        else v.setSafe(i, row.getAs[java.sql.Date](j).toLocalDate.toEpochDay.toInt)
      case other => throw new IllegalArgumentException(
        s"arrow ingest: unsupported vector ${other.getClass.getSimpleName}")
    }

  // ---------------------------------------------------------------- decode

  /** Decode IPC stream frames into rows of `schema` — map-only;
    * vectors are matched to the target schema BY NAME and validated, so
    * a client pushing the wrong shape fails loudly per frame.
    */
  def decodeFrames(frames: Dataset[Array[Byte]], schema: StructType): DataFrame =
    frames.flatMap(frame => decodeFrame(frame, schema))(Encoders.row(schema))
      .toDF()

  /** Decode one IPC stream frame. */
  def decodeFrame(frame: Array[Byte], schema: StructType): Seq[Row] = {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val reader = new ArrowStreamReader(new ByteArrayInputStream(frame), alloc)
      try {
        val root = reader.getVectorSchemaRoot
        val out = mutable.ArrayBuffer.empty[Row]
        while (reader.loadNextBatch()) {
          val vecs = schema.fields.map { f =>
            val v = root.getVector(f.name)
            if (v == null) throw new IllegalArgumentException(
              s"arrow ingest: frame has no column '${f.name}' " +
                s"(frame columns: ${root.getSchema.getFields})")
            v
          }
          var i = 0
          val n = root.getRowCount
          while (i < n) {
            val cells = new Array[Any](vecs.length)
            var j = 0
            while (j < vecs.length) {
              cells(j) = getCell(vecs(j), i, schema.fields(j))
              j += 1
            }
            out += Row.fromSeq(cells.toIndexedSeq)
            i += 1
          }
        }
        out.toSeq
      } finally reader.close()
    } finally alloc.close()
  }

  private def getCell(vec: FieldVector, i: Int, target: StructField): Any =
    vec match {
      case v: IntVector             => if (v.isNull(i)) null else v.get(i)
      case v: BigIntVector          => if (v.isNull(i)) null else v.get(i)
      case v: Float4Vector          => if (v.isNull(i)) null else v.get(i)
      case v: Float8Vector          => if (v.isNull(i)) null else v.get(i)
      case v: VarCharVector         =>
        if (v.isNull(i)) null else new String(v.get(i), UTF_8)
      case v: VarBinaryVector       => if (v.isNull(i)) null else v.get(i)
      case v: BitVector             => if (v.isNull(i)) null else v.get(i) == 1
      case v: TimeStampMicroTZVector =>
        if (v.isNull(i)) null else microsToTs(v.get(i))
      case v: TimeStampMicroVector  =>
        if (v.isNull(i)) null
        else java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(v.get(i), 1000000L),
          (Math.floorMod(v.get(i), 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case v: DateDayVector         =>
        if (v.isNull(i)) null
        else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.get(i).toLong))
      case other => throw new IllegalArgumentException(
        s"arrow ingest: column '${target.name}' has unsupported vector " +
          s"${other.getClass.getSimpleName} for target ${target.dataType}")
    }

  // ------------------------------------------------------------- transport

  /** Push one IPC frame onto a bounded push channel — the
    * `IngestArrowRequest{schema_name, records}` analogue. One frame =
    * one channel event, so a 4k-row frame costs one slot and the
    * channel bound applies to frames (like the reference's per-request
    * channel send).
    */
  def ingest(channel: String, schemaName: String, frame: Array[Byte]): Long =
    PushBuffer.push(channel,
      s"""{"schema":"$schemaName","frame":"${
        java.util.Base64.getEncoder.encodeToString(frame)}"}""")

  /** Select the `(seq, frame)` pairs of one schema from a push feed. */
  def frames(feed: DataFrame, schemaName: String): DataFrame =
    feed
      .select(col("seq"),
        get_json_object(col("value"), "$.schema").as("__schema"),
        unbase64(get_json_object(col("value"), "$.frame")).as("frame"))
      .filter(col("__schema") === schemaName)
      .select(col("seq"), col("frame"))

  /** Decode a push feed of Arrow envelopes into ChangeModel Insert rows
    * (arrow.rs maps every record to `Operation::Insert`): row columns
    * plus `_op`/`_seq`, where `_seq = frame seq * 2^20 + row index`
    * keeps (frame, row) arrival order total without coordination.
    */
  def changes(feed: DataFrame, schemaName: String,
      rowSchema: StructType): DataFrame = {
    val Op = graft.cdc.ChangeModel
    val outSchema = rowSchema
      .add(StructField(Op.OpCol, StringType, nullable = false))
      .add(StructField(Op.SeqCol, LongType, nullable = false))
    val maxRows = 1 << 20
    val insertOp = Op.Insert // capture the string, not the object
    val src = frames(feed, schemaName)
    src.select(col("seq"), col("frame"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .flatMap { case (seq, frame) =>
        val rows = decodeFrame(frame, rowSchema)
        require(rows.length < maxRows,
          s"arrow ingest: frame $seq carries ${rows.length} rows — split " +
            s"frames below $maxRows so (frame, row) ordering stays total")
        rows.iterator.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ insertOp :+ (seq * maxRows + i))
        }
      }(Encoders.row(outSchema))
      .toDF()
  }
}
