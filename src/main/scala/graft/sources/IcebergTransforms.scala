package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg partition TRANSFORMS (spec §Partition Transforms + Appendix
  * B bucket hashing) — the pure value→partition functions behind
  * `day(ts)` / `bucket(16, id)` / `truncate(4, s)` specs, implemented
  * from the published table-format spec (iceberg.apache.org/spec;
  * reference behavior: dozer has no iceberg support at all — this is a
  * beyond-reference capability).
  *
  * Three surfaces, kept consistent by sharing one value function:
  *  - [[expr]]: the Column expression the partitioned staging write
  *    lays files out by (distributed, single pass);
  *  - [[eval]]: driver-side evaluation for manifest partition PRUNING
  *    of literals in read predicates;
  *  - [[resultType]]: the partition value type recorded in manifests.
  */
object IcebergTransforms {

  sealed trait Transform {
    /** The spec's metadata rendering ("identity", "bucket[16]", …). */
    def render: String
  }
  case object Identity extends Transform { val render = "identity" }
  final case class Bucket(n: Int) extends Transform {
    val render = s"bucket[$n]"
  }
  final case class Truncate(w: Int) extends Transform {
    val render = s"truncate[$w]"
  }
  case object Year extends Transform { val render = "year" }
  case object Month extends Transform { val render = "month" }
  case object Day extends Transform { val render = "day" }
  case object Hour extends Transform { val render = "hour" }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  /** Parse the spec's metadata transform string. */
  def parse(s: String): Transform = s match {
    case "identity" => Identity
    case BucketRe(n) => Bucket(n.toInt)
    case TruncRe(w) => Truncate(w.toInt)
    case "year" => Year
    case "month" => Month
    case "day" => Day
    case "hour" => Hour
    case other => throw new IllegalArgumentException(
      s"unsupported partition transform '$other'")
  }

  private val CallRe = """(\w+)\s*\(\s*([^)]*)\s*\)""".r

  /** Parse the writer-facing `partitionBy` form: a bare column name
    * (identity) or `day(col)` / `bucket(16, col)` / `truncate(4, col)`.
    * Returns (source column, transform).
    */
  def parseSpec(s: String): (String, Transform) = s.trim match {
    case CallRe(fn, args) =>
      val parts = args.split(",").map(_.trim)
      fn match {
        case "identity" => (parts.head, Identity)
        case "year" => (parts.head, Year)
        case "month" => (parts.head, Month)
        case "day" => (parts.head, Day)
        case "hour" => (parts.head, Hour)
        case "bucket" =>
          require(parts.length == 2, s"bucket(N, col) expected, got '$s'")
          (parts(1), Bucket(parts(0).toInt))
        case "truncate" =>
          require(parts.length == 2, s"truncate(W, col) expected, got '$s'")
          (parts(1), Truncate(parts(0).toInt))
        case other => throw new IllegalArgumentException(
          s"unsupported partition transform '$other' in '$s'")
      }
    case bare => (bare, Identity)
  }

  /** The iceberg convention for the partition FIELD name. */
  def fieldName(srcCol: String, t: Transform): String = t match {
    case Identity => srcCol
    case Bucket(_) => s"${srcCol}_bucket"
    case Truncate(_) => s"${srcCol}_trunc"
    case Year => s"${srcCol}_year"
    case Month => s"${srcCol}_month"
    case Day => s"${srcCol}_day"
    case Hour => s"${srcCol}_hour"
  }

  /** Partition value type recorded in manifests (spec result types;
    * `day` yields a date, the time-unit counters yield ints).
    */
  def resultType(t: Transform, src: DataType): DataType = (t, src) match {
    case (Identity, dt) => dt
    case (Bucket(_), IntegerType | LongType | StringType | DateType |
        TimestampType) => IntegerType
    case (Truncate(_), IntegerType) => IntegerType
    case (Truncate(_), LongType) => LongType
    case (Truncate(_), StringType) => StringType
    case (Year | Month, DateType | TimestampType) => IntegerType
    case (Day, DateType | TimestampType) => DateType
    case (Hour, TimestampType) => IntegerType
    case (tr, dt) => throw new IllegalArgumentException(
      s"partition transform ${tr.render} does not apply to ${dt.sql}")
  }

  // ------------------------------------------------- bucket hashing
  // Spec Appendix B: 32-bit Murmur3 (x86 variant, seed 0) of the value's
  // canonical bytes: int/long/date/timestamp hash their 8-byte
  // little-endian long form; strings hash their UTF-8 bytes.

  /** Standard MurmurHash3 x86_32, seed 0 — written out longhand so the
    * tail handling matches the reference algorithm exactly (library
    * variants differ there); pinned by the spec's test vectors in
    * IcebergTransformsSpec.
    */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0 // seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tailBase = nblocks * 4
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(tailBase + 2) & 0xff) << 16
        k1 ^= (data(tailBase + 1) & 0xff) << 8
        k1 ^= data(tailBase) & 0xff
      case 2 =>
        k1 ^= (data(tailBase + 1) & 0xff) << 8
        k1 ^= data(tailBase) & 0xff
      case 1 =>
        k1 ^= data(tailBase) & 0xff
      case _ => ()
    }
    if ((data.length & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    // fmix
    h1 ^= data.length
    h1 ^= (h1 >>> 16)
    h1 *= 0x85ebca6b
    h1 ^= (h1 >>> 13)
    h1 *= 0xc2b2ae35
    h1 ^= (h1 >>> 16)
    h1
  }

  private def leLong(l: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(l)
    b.array()
  }

  /** Spec bucket hash of one value (before the modulo). */
  def bucketHash(src: DataType, v: Any): Int = (src, v) match {
    case (IntegerType, i: Int) => murmur3(leLong(i.toLong))
    case (LongType, l: Long) => murmur3(leLong(l))
    case (DateType, d: java.sql.Date) =>
      murmur3(leLong(d.toLocalDate.toEpochDay))
    case (DateType, days: Int) => murmur3(leLong(days.toLong))
    case (TimestampType, t: java.sql.Timestamp) =>
      murmur3(leLong(t.getTime * 1000L + (t.getNanos / 1000) % 1000))
    case (TimestampType, micros: Long) => murmur3(leLong(micros))
    case (StringType, s: String) => murmur3(s.getBytes(UTF_8))
    case (dt, other) => throw new IllegalArgumentException(
      s"bucket transform on ${dt.sql} value $other is unsupported")
  }

  def bucketValue(src: DataType, v: Any, n: Int): Int =
    (bucketHash(src, v) & Integer.MAX_VALUE) % n

  // --------------------------------------------------- value functions

  private def epochDays(v: Any): Long = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case t: java.sql.Timestamp =>
      Math.floorDiv(t.getTime, 86400000L)
    case i: Int => i.toLong
    case l: Long => l
  }

  /** Driver-side transform of one JVM value (nulls pass through —
    * transform(null) is null per spec).
    */
  def eval(t: Transform, src: DataType, v: Any): Any =
    if (v == null) null
    else t match {
      case Identity => v
      case Bucket(n) => bucketValue(src, v, n)
      case Truncate(w) => (src, v) match {
        case (IntegerType, i: Int) => i - Math.floorMod(i, w)
        case (LongType, l: Long) => l - Math.floorMod(l, w.toLong)
        case (StringType, s: String) =>
          if (s.codePointCount(0, s.length) <= w) s
          else s.substring(0, s.offsetByCodePoints(0, w))
        case (dt, other) => throw new IllegalArgumentException(
          s"truncate on ${dt.sql} value $other is unsupported")
      }
      case Year =>
        val ld = java.time.LocalDate.ofEpochDay(epochDays(v))
        ld.getYear - 1970
      case Month =>
        val ld = java.time.LocalDate.ofEpochDay(epochDays(v))
        (ld.getYear - 1970) * 12 + (ld.getMonthValue - 1)
      case Day => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(epochDays(v)))
      case Hour => v match {
        case ts: java.sql.Timestamp =>
          Math.floorDiv(ts.getTime, 3600000L).toInt
        case micros: Long => Math.floorDiv(micros, 3600000000L).toInt
        case other => throw new IllegalArgumentException(
          s"hour transform on $other is unsupported")
      }
    }

  /** The staging-layout Column: must agree with [[eval]] value-for-value
    * (the layout only GROUPS rows; manifests record the values [[eval]]
    * recovers, so drift between the two would mis-partition files).
    * Bucket goes through a scala UDF of the same hash — staging is a
    * one-pass write, not a hot scan loop.
    */
  def expr(t: Transform, c: Column, src: DataType): Column = t match {
    case Identity => c
    case Bucket(n) =>
      val f = src match {
        case IntegerType => udf((v: java.lang.Integer) =>
          if (v == null) null
          else Int.box(bucketValue(IntegerType, v.intValue, n)))
        case LongType => udf((v: java.lang.Long) =>
          if (v == null) null
          else Int.box(bucketValue(LongType, v.longValue, n)))
        case StringType => udf((v: String) =>
          if (v == null) null else Int.box(bucketValue(StringType, v, n)))
        case DateType => udf((v: java.sql.Date) =>
          if (v == null) null else Int.box(bucketValue(DateType, v, n)))
        case TimestampType => udf((v: java.sql.Timestamp) =>
          if (v == null) null
          else Int.box(bucketValue(TimestampType, v, n)))
        case dt => throw new IllegalArgumentException(
          s"bucket transform on ${dt.sql} is unsupported")
      }
      f(c)
    case Truncate(w) => src match {
      case IntegerType | LongType =>
        c - pmod(c, lit(w).cast(src))
      case StringType => substring(c, 1, w)
      case dt => throw new IllegalArgumentException(
        s"truncate transform on ${dt.sql} is unsupported")
    }
    case Year => (year(utcDate(c, src)) - lit(1970)).cast(IntegerType)
    case Month =>
      ((year(utcDate(c, src)) - lit(1970)) * lit(12) +
        month(utcDate(c, src)) - lit(1)).cast(IntegerType)
    case Day => utcDate(c, src)
    case Hour =>
      floor(unix_micros(c) / lit(3600000000L)).cast(IntegerType)
  }

  /** The column's UTC calendar date — timestamps convert by epoch-day
    * floor-division on the raw micros (exactly [[eval]]'s arithmetic),
    * NEVER through session-time-zone functions like `to_date`/`year`:
    * with a non-UTC `spark.sql.session.timeZone` those would lay files
    * out under partition values that disagree with the UTC values the
    * manifests record and the pruner computes, wrongly pruning matches.
    * (`year`/`month` OF A DATE are time-zone-free, so deriving them
    * from this date column is safe.)
    */
  private def utcDate(c: Column, src: DataType): Column = src match {
    case DateType => c
    case TimestampType => date_from_unix_date(
      floor(unix_micros(c) / lit(86400000000L)).cast(IntegerType))
    case dt => throw new IllegalArgumentException(
      s"time transform on ${dt.sql} is unsupported")
  }
}
