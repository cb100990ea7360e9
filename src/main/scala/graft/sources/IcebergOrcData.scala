package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.ql.exec.vector.{BytesColumnVector, ColumnVector,
  DecimalColumnVector, DoubleColumnVector, LongColumnVector,
  TimestampColumnVector}
import org.apache.hadoop.fs.Path
import org.apache.orc.OrcFile
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** ORC scan WITH exact per-file row ordinals, through the orc-core row
  * reader Spark already bundles — the piece Spark's vectorized ORC
  * source is missing (`_metadata.row_index` is parquet-only), and the
  * piece iceberg position deletes need: a delete file's `(file_path,
  * pos)` coordinate is the row's ordinal within its data file, so both
  * APPLYING foreign deletes against ORC data files and STAGING new
  * ones from a mutation require counting rows in file order.
  *
  * Used SURGICALLY: plain scans and equality-delete application ride
  * Spark's vectorized (whole-stage-codegen'd) ORC source with null
  * ordinals; only the files position deletes actually target — or a
  * mutation's pruned candidate files — pay this row-by-row reader.
  * One task per file, `VectorizedRowBatch` iteration executor-side,
  * projection by name (missing columns read null — the same
  * add-column evolution rule as everywhere else).
  *
  * Timestamp note: ORC `timestamp` is wall-clock; values reproduce
  * Spark's own ORC reader under the same session timezone (the
  * single-JVM contract this engine runs with; cross-timezone foreign
  * wall-clock files are the documented iceberg-runtime edge).
  */
object IcebergOrcData {

  /** Distributed scan of ORC files projected BY NAME to `readSchema`,
    * appending `__ice_file` (the file path as given) and `__ice_pos`
    * (EXACT row ordinal). One task per file.
    */
  def scanWithPos(spark: SparkSession, readSchema: StructType,
      paths: Seq[String]): DataFrame = {
    val outSchema = StructType(readSchema.fields ++ Array(
      StructField("__ice_file", StringType, nullable = false),
      StructField("__ice_pos", LongType, nullable = false)))
    val serConf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fieldNames = readSchema.fields.map(_.name)
    val fieldTypes = readSchema.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .mapPartitions { it =>
        it.flatMap { p =>
          val reader = OrcFile.createReader(new Path(p),
            OrcFile.readerOptions(serConf.value))
          val fileSchema = reader.getSchema
          val names = fileSchema.getFieldNames.asScala.toIndexedSeq
          // reader field name -> file column position (-1 = absent)
          val colIdx: Array[Int] = fieldNames.map(names.indexOf)
          val rows = reader.rows()
          // LAZY batch-at-a-time emission: one VectorizedRowBatch in
          // flight per file, never the whole file in memory — a large
          // delete-targeted ORC file streams through in 1024-row
          // windows. The task-completion hook covers early-terminated
          // consumers (limits) that abandon the iterator mid-file.
          var open = true
          def closeAll(): Unit = if (open) {
            open = false; rows.close(); reader.close()
          }
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => closeAll()))
          new Iterator[Row] {
            private val batch = fileSchema.createRowBatch(1024)
            private var r = 0
            private var ord = 0L
            private def advance(): Unit = {
              while (open && r >= batch.size) {
                if (rows.nextBatch(batch)) r = 0
                else closeAll()
              }
            }
            override def hasNext: Boolean = {
              advance(); open && r < batch.size
            }
            override def next(): Row = {
              if (!hasNext) throw new NoSuchElementException(p)
              val vals = new Array[Any](outSchema.length)
              var i = 0
              while (i < fieldNames.length) {
                vals(i) =
                  if (colIdx(i) < 0) null
                  else readValue(fieldTypes(i), batch.cols(colIdx(i)),
                    r, fieldNames(i))
                i += 1
              }
              vals(fieldNames.length) = p
              vals(fieldNames.length + 1) = ord
              r += 1
              ord += 1L
              Row.fromSeq(vals.toIndexedSeq)
            }
          }
        }
      }
    spark.createDataFrame(rdd.map(identity), outSchema)
  }

  /** One vector cell → the Spark-typed value `dt` expects. */
  private def readValue(dt: DataType, v: ColumnVector, row: Int,
      name: String): Any = {
    val idx = if (v.isRepeating) 0 else row
    if (!v.noNulls && v.isNull(idx)) return null
    (dt, v) match {
      case (BooleanType, lv: LongColumnVector) => lv.vector(idx) != 0L
      case (IntegerType, lv: LongColumnVector) => lv.vector(idx).toInt
      case (LongType, lv: LongColumnVector) => lv.vector(idx)
      case (DateType, lv: LongColumnVector) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(lv.vector(idx)))
      case (FloatType, dv: DoubleColumnVector) => dv.vector(idx).toFloat
      case (DoubleType, dv: DoubleColumnVector) => dv.vector(idx)
      case (StringType, bv: BytesColumnVector) =>
        new String(bv.vector(idx), bv.start(idx), bv.length(idx), "UTF-8")
      case (BinaryType, bv: BytesColumnVector) =>
        java.util.Arrays.copyOfRange(bv.vector(idx), bv.start(idx),
          bv.start(idx) + bv.length(idx))
      case (TimestampType | TimestampNTZType, tv: TimestampColumnVector) =>
        val ts = new java.sql.Timestamp(tv.time(idx))
        ts.setNanos(tv.nanos(idx))
        if (dt == TimestampNTZType)
          ts.toLocalDateTime
        else ts
      case (d: DecimalType, dv: DecimalColumnVector) =>
        dv.vector(idx).getHiveDecimal.bigDecimalValue.setScale(d.scale)
      case _ => throw new IllegalArgumentException(
        s"orc row reader: column '$name' is ${v.getClass.getSimpleName}, " +
          s"cannot read as ${dt.sql}")
    }
  }
}
