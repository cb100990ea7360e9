package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.exec.vector.{BytesColumnVector,
  ColumnVector, DecimalColumnVector, DoubleColumnVector, LongColumnVector,
  TimestampColumnVector, VectorizedRowBatch}
import org.apache.orc.{CompressionKind, OrcFile, TypeDescription}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** ORC STAGING with the iceberg field-id assignment stamped as
  * `iceberg.id` column attributes — the ORC twin of the parquet
  * `parquet.field.id` stamping: a strict field-id-resolving foreign
  * reader (iceberg-java's default ORC resolution is BY ATTRIBUTE)
  * then reads graft-written ORC data files without the
  * `schema.name-mapping.default` fallback, and the ids survive
  * metadata-only renames because they come from the table's stored
  * assignment. Spark's own ORC sink exposes no column-attribute seam,
  * so this writes through orc-core directly (the library Spark
  * bundles and the same writer Spark's sink uses underneath) — one
  * task per partition, 1024-row `VectorizedRowBatch` filling over
  * `InternalRow`s, column statistics recorded by the writer itself so
  * [[OrcFooterStats]] reads bounds exactly as before.
  *
  * Two layouts, matching the two staging paths in [[IcebergLite]]:
  *  - [[stage]]: one `part-<pid>-<uuid>.orc` per non-empty partition
  *    directly under `stageDir` (the unpartitioned path).
  *  - [[stagePartitioned]]: rows arrive CLUSTERED on their partition
  *    tuple and sorted within partitions; the writer ROLLS to a new
  *    file whenever the tuple changes, placing each file under the
  *    hive-escaped `alias=value/` directory chain the recovery walk
  *    ([[IcebergLite.stagePartitioned]]) expects — same layout
  *    Spark's `partitionBy` produced, same `__HIVE_DEFAULT_PARTITION__`
  *    null convention, same escaping
  *    (`ExternalCatalogUtils.escapePathName`).
  */
object IcebergOrcWrite {

  /** Spark type → ORC TypeDescription, `iceberg.id` attribute stamped
    * on every top-level field present in `ids`.
    */
  private def orcSchema(schema: StructType,
      ids: Map[String, Int]): TypeDescription = {
    def leaf(dt: DataType): TypeDescription = dt match {
      case BooleanType => TypeDescription.createBoolean()
      case ByteType => TypeDescription.createByte()
      case ShortType => TypeDescription.createShort()
      case IntegerType => TypeDescription.createInt()
      case LongType => TypeDescription.createLong()
      case FloatType => TypeDescription.createFloat()
      case DoubleType => TypeDescription.createDouble()
      case StringType => TypeDescription.createString()
      case BinaryType => TypeDescription.createBinary()
      case DateType => TypeDescription.createDate()
      case TimestampType | TimestampNTZType =>
        TypeDescription.createTimestamp()
      case d: DecimalType => TypeDescription.createDecimal()
        .withPrecision(d.precision).withScale(d.scale)
      case other => throw new IllegalArgumentException(
        s"native ORC staging does not cover ${other.sql} — write " +
          "parquet (write.format.default) for nested columns")
    }
    val root = TypeDescription.createStruct()
    schema.fields.foreach { f =>
      val t = leaf(f.dataType)
      ids.get(f.name).foreach(id =>
        t.setAttribute("iceberg.id", id.toString))
      root.addField(f.name, t)
    }
    root
  }

  /** Session ORC codec (Spark's `spark.sql.orc.compression.codec`) →
    * orc-core kind, so natively-staged files match what Spark's sink
    * would have produced.
    */
  private def codec(spark: SparkSession): CompressionKind =
    spark.conf.getOption("spark.sql.orc.compression.codec")
      .getOrElse("zstd").toLowerCase match {
      case "zstd" => CompressionKind.ZSTD
      case "snappy" => CompressionKind.SNAPPY
      case "zlib" => CompressionKind.ZLIB
      case "lz4" => CompressionKind.LZ4
      case "lzo" => CompressionKind.LZO
      case "none" | "uncompressed" => CompressionKind.NONE
      case other => throw new IllegalArgumentException(
        s"unknown ORC codec $other")
    }

  /** One cell setter per column, the type dispatch hoisted out of the
    * row loop (the write-side mirror of [[IcebergOrcData.extractor]]).
    */
  private def setter(dt: DataType, ord: Int,
      v: ColumnVector): (InternalRow, Int) => Unit = dt match {
    case BooleanType =>
      val lv = v.asInstanceOf[LongColumnVector]
      (r, i) => lv.vector(i) = if (r.getBoolean(ord)) 1L else 0L
    case ByteType =>
      val lv = v.asInstanceOf[LongColumnVector]
      (r, i) => lv.vector(i) = r.getByte(ord).toLong
    case ShortType =>
      val lv = v.asInstanceOf[LongColumnVector]
      (r, i) => lv.vector(i) = r.getShort(ord).toLong
    case IntegerType | DateType =>
      val lv = v.asInstanceOf[LongColumnVector]
      (r, i) => lv.vector(i) = r.getInt(ord).toLong
    case LongType =>
      val lv = v.asInstanceOf[LongColumnVector]
      (r, i) => lv.vector(i) = r.getLong(ord)
    case FloatType =>
      val dv = v.asInstanceOf[DoubleColumnVector]
      (r, i) => dv.vector(i) = r.getFloat(ord).toDouble
    case DoubleType =>
      val dv = v.asInstanceOf[DoubleColumnVector]
      (r, i) => dv.vector(i) = r.getDouble(ord)
    case StringType =>
      val bv = v.asInstanceOf[BytesColumnVector]
      (r, i) => bv.setVal(i, r.getUTF8String(ord).getBytes)
    case BinaryType =>
      val bv = v.asInstanceOf[BytesColumnVector]
      (r, i) => bv.setVal(i, r.getBinary(ord))
    case TimestampType =>
      val tv = v.asInstanceOf[TimestampColumnVector]
      (r, i) => tv.set(i, DateTimeUtils.toJavaTimestamp(r.getLong(ord)))
    case TimestampNTZType =>
      // wall-clock preserving, the same JVM-zone round trip Spark's
      // serializer uses (and IcebergOrcData inverts)
      val tv = v.asInstanceOf[TimestampColumnVector]
      (r, i) => tv.set(i, java.sql.Timestamp.valueOf(
        DateTimeUtils.microsToLocalDateTime(r.getLong(ord))))
    case d: DecimalType =>
      val dv = v.asInstanceOf[DecimalColumnVector]
      (r, i) => dv.set(i,
        new org.apache.hadoop.hive.serde2.io.HiveDecimalWritable(
          org.apache.hadoop.hive.common.`type`.HiveDecimal.create(
            r.getDecimal(ord, d.precision, d.scale).toJavaBigDecimal)))
    case other => throw new IllegalArgumentException(
      s"native ORC staging does not cover ${other.sql}")
  }

  /** A rolling single-file writer bound to one output path. */
  private final class FileWriter(path: Path, schema: StructType,
      ids: Map[String, Int], conf: org.apache.hadoop.conf.Configuration,
      kind: CompressionKind, cols: Seq[Int]) {
    private val td = orcSchema(
      StructType(cols.map(schema.fields)), ids)
    private val writer = OrcFile.createWriter(path,
      OrcFile.writerOptions(conf).setSchema(td).compress(kind)
        .overwrite(true))
    private val batch: VectorizedRowBatch = td.createRowBatch(1024)
    private val setters: Array[(InternalRow, Int) => Unit] =
      cols.toArray.zipWithIndex.map { case (ord, out) =>
        setter(schema.fields(ord).dataType, ord, batch.cols(out))
      }
    private val ords: Array[Int] = cols.toArray

    def add(row: InternalRow): Unit = {
      val i = batch.size
      var c = 0
      while (c < setters.length) {
        if (row.isNullAt(ords(c))) {
          batch.cols(c).noNulls = false
          batch.cols(c).isNull(i) = true
        } else setters(c)(row, i)
        c += 1
      }
      batch.size += 1
      if (batch.size == batch.getMaxSize) flush()
    }
    private def flush(): Unit = if (batch.size > 0) {
      writer.addRowBatch(batch); batch.reset()
    }
    def close(): Unit = { flush(); writer.close() }
  }

  /** Unpartitioned staging: `df` → `part-<pid>-<uuid>.orc` files under
    * `stageDir`, field ids stamped. The caller lists the stage and
    * reads footers exactly as with Spark's writer.
    */
  def stage(spark: SparkSession, df: DataFrame, stageDir: Path,
      fieldIds: Map[String, Int]): Unit = {
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(stageDir)
    val serConf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val schema = df.schema
    val kind = codec(spark)
    val dir = stageDir.toString
    val allCols = schema.fields.indices
    df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val path = new Path(dir, f"part-$pid%05d-" +
          java.util.UUID.randomUUID.toString.take(8) + ".orc")
        val w = new FileWriter(path, schema, fieldIds, serConf.value,
          kind, allCols)
        var ok = false
        try { it.foreach(w.add); ok = true } finally {
          if (ok) w.close() else try w.close() catch { case _: Exception => () }
        }
        Iterator.single(1)
      }
    }.count()
    ()
  }

  /** Partitioned staging: rows arrive clustered + SORTED on the alias
    * columns; each task rolls to a new file when the tuple changes,
    * under `alias=value/` dirs (hive escaping, Spark's null marker).
    * `aliasCols` name the routing columns (excluded from the files);
    * everything else lands in the data files in schema order.
    */
  def stagePartitioned(spark: SparkSession, sorted: DataFrame,
      stageDir: Path, aliasCols: Seq[String],
      fieldIds: Map[String, Int]): Unit = {
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(stageDir)
    val serConf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val schema = sorted.schema
    val kind = codec(spark)
    val dir = stageDir.toString
    val aliasIdx: Array[Int] = aliasCols.map(schema.fieldIndex).toArray
    val aliasTypes: Array[DataType] =
      aliasIdx.map(i => schema.fields(i).dataType)
    val dataCols: Seq[Int] =
      schema.fields.indices.filterNot(aliasIdx.contains)
    sorted.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      def dirValue(r: InternalRow, k: Int): String =
        if (r.isNullAt(aliasIdx(k))) "__HIVE_DEFAULT_PARTITION__"
        else {
          val raw = aliasTypes(k) match {
            case DateType => java.time.LocalDate
              .ofEpochDay(r.getInt(aliasIdx(k)).toLong).toString
            case IntegerType => r.getInt(aliasIdx(k)).toString
            case LongType => r.getLong(aliasIdx(k)).toString
            case StringType => r.getUTF8String(aliasIdx(k)).toString
            case FloatType => r.getFloat(aliasIdx(k)).toString
            case DoubleType => r.getDouble(aliasIdx(k)).toString
            case other => throw new IllegalArgumentException(
              s"partition transform value of type ${other.sql}?")
          }
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .escapePathName(raw)
        }
      var cur: Seq[String] = null
      var w: FileWriter = null
      var n = 0
      def roll(tuple: Seq[String]): Unit = {
        if (w != null) w.close()
        val sub = aliasCols.zip(tuple).map { case (a, v) =>
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .escapePathName(a) + "=" + v
        }.mkString("/")
        val path = new Path(s"$dir/$sub", f"part-$pid%05d-$n%03d-" +
          java.util.UUID.randomUUID.toString.take(8) + ".orc")
        n += 1
        w = new FileWriter(path, schema, fieldIds, serConf.value, kind,
          dataCols)
        cur = tuple
      }
      var ok = false
      try {
        it.foreach { row =>
          val tuple = aliasIdx.indices.map(dirValue(row, _))
          if (cur == null || tuple != cur) roll(tuple)
          w.add(row)
        }
        ok = true
      } finally {
        if (w != null) {
          if (ok) w.close()
          else try w.close() catch { case _: Exception => () }
        }
      }
      Iterator.single(1)
    }.count()
    ()
  }
}
