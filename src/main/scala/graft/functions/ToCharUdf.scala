package graft.functions

import java.time.format.DateTimeFormatterBuilder
import java.time.temporal.ChronoField
import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** TO_CHAR(timestamp|date, fmt) with chrono-style `%` patterns.
  *
  * Dozer formats via Rust chrono's strftime (reference:
  * dozer-sql/expression/src/scalar/string.rs:244-278); this reimplements
  * the strftime subset those tests use on top of java.time. Literal text
  * passes through; unknown specifiers are kept verbatim (chrono errors
  * instead, an accepted delta documented in SURVEY §8).
  */
object ToCharUdf {

  private val zone = ZoneOffset.UTC

  def format(epochMicros: Long, fmt: String): String = {
    val inst = Instant.ofEpochSecond(
      Math.floorDiv(epochMicros, 1000000L),
      Math.floorMod(epochMicros, 1000000L) * 1000L)
    val dt = inst.atZone(zone)
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append(f"${dt.getYear}%04d")
          case 'y' => sb.append(f"${dt.getYear % 100}%02d")
          case 'm' => sb.append(f"${dt.getMonthValue}%02d")
          case 'd' => sb.append(f"${dt.getDayOfMonth}%02d")
          case 'e' => sb.append(f"${dt.getDayOfMonth}%2d")
          case 'H' => sb.append(f"${dt.getHour}%02d")
          case 'M' => sb.append(f"${dt.getMinute}%02d")
          case 'S' => sb.append(f"${dt.getSecond}%02d")
          case 'f' => sb.append(f"${dt.getNano}%09d")
          case 'j' => sb.append(f"${dt.getDayOfYear}%03d")
          case 'a' => sb.append(dt.getDayOfWeek.getDisplayName(
            java.time.format.TextStyle.SHORT, java.util.Locale.US))
          case 'A' => sb.append(dt.getDayOfWeek.getDisplayName(
            java.time.format.TextStyle.FULL, java.util.Locale.US))
          case 'b' => sb.append(dt.getMonth.getDisplayName(
            java.time.format.TextStyle.SHORT, java.util.Locale.US))
          case 'B' => sb.append(dt.getMonth.getDisplayName(
            java.time.format.TextStyle.FULL, java.util.Locale.US))
          case 'u' => sb.append(dt.getDayOfWeek.getValue.toString)
          case 'T' => sb.append(f"${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d")
          case 'F' => sb.append(f"${dt.getYear}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02d")
          case '%' => sb.append('%')
          case other => sb.append('%').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def formatDate(daysSinceEpoch: Int, fmt: String): String =
    format(LocalDate.ofEpochDay(daysSinceEpoch.toLong)
      .atStartOfDay(zone).toInstant.getEpochSecond * 1000000L, fmt)

  private def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private val tsUdf = udf { (ts: java.sql.Timestamp, fmt: String) =>
    if (ts == null || fmt == null) null else format(micros(ts), fmt)
  }

  def apply(ts: Column, fmt: Column): Column = tsUdf(ts, fmt)

  def register(spark: SparkSession): Unit =
    spark.udf.register("to_char",
      (ts: java.sql.Timestamp, fmt: String) =>
        if (ts == null || fmt == null) null else format(micros(ts), fmt))
}
