package graft.types

import org.apache.spark.sql.types._

/** Dozer `FieldType` → Spark `DataType` mapping (SURVEY §1.2).
  *
  * Reference: dozer-types/src/types/field.rs:870-905 (FieldType),
  * dozer-types/src/types/mod.rs:80-91 (Schema with primary_index).
  *
  * Spark has no first-class primary key, so [[GraftSchema]] carries key
  * columns alongside the `StructType`; stateful operators (CDC apply,
  * upsert sinks, retractable aggregation) key their state on these.
  */
object FieldType extends Enumeration {
  val UInt, U128, Int, Int8, I128, Float, Boolean, String, Text, Binary,
      Decimal, Timestamp, Date, Json, Point, Duration = Value
}

object TypeMapping {

  /** Unsigned 64-bit and 128-bit ints land in wider signed types; the
    * unsigned range caveat is documented, matching SURVEY §1.2.
    */
  def toSpark(t: FieldType.Value, decimalScale: Int = 10): DataType = t match {
    case FieldType.UInt      => LongType // caveat: values > Long.Max unsupported
    case FieldType.U128      => DecimalType(38, 0)
    case FieldType.Int       => LongType
    case FieldType.Int8      => ByteType
    case FieldType.I128      => DecimalType(38, 0)
    case FieldType.Float     => DoubleType
    case FieldType.Boolean   => BooleanType
    case FieldType.String    => StringType
    case FieldType.Text      => StringType
    case FieldType.Binary    => BinaryType
    case FieldType.Decimal   => DecimalType(38, decimalScale)
    case FieldType.Timestamp => TimestampType // ns → µs truncation accepted
    case FieldType.Date      => DateType
    case FieldType.Json      => StringType // queried via JSON_VALUE/JSON_QUERY
    case FieldType.Point     => PointType.sparkType
    case FieldType.Duration  => DayTimeIntervalType()
  }

  def fromSpark(dt: DataType): FieldType.Value = dt match {
    case LongType | IntegerType | ShortType => FieldType.Int
    case ByteType                           => FieldType.Int8
    case DoubleType | FloatType             => FieldType.Float
    case BooleanType                        => FieldType.Boolean
    case StringType                         => FieldType.String
    case BinaryType                         => FieldType.Binary
    case _: DecimalType                     => FieldType.Decimal
    case TimestampType                      => FieldType.Timestamp
    case DateType                           => FieldType.Date
    case st: StructType if st == PointType.sparkType => FieldType.Point
    case _: DayTimeIntervalType             => FieldType.Duration
    case other => throw new IllegalArgumentException(s"no dozer type for $other")
  }
}

/** Geo point as struct(x,y) — reference: dozer-types/src/types/mod.rs:467-485. */
object PointType {
  val sparkType: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))
}

/** Schema + primary-key columns (dozer Schema.primary_index equivalent). */
final case class GraftSchema(struct: StructType, primaryKey: Seq[String]) {
  require(primaryKey.forall(struct.fieldNames.contains),
    s"primary key ${primaryKey.mkString(",")} not in schema")
}
