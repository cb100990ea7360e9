package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** `hop_windows(ts, slide, size)` — the windows containing `ts`:
  * starts aligned to `slide` (epoch-based), `size` wide. TUMBLE is the
  * slide == size special case.
  *
  * Reference semantics: dozer-sql/src/window/operator.rs:59-130 —
  * TUMBLE truncates ts to the interval; HOP emits one record per
  * overlapping window. Matches Spark's own `window()` alignment
  * (epoch-aligned, start inclusive, end exclusive).
  */
object HopWindows {

  /** Parse '5 minutes' / '1 hour' / '30 seconds' / '2 days' → micros. */
  def parseDurationMicros(s: String): Long = {
    val m = "(?i)\\s*(\\d+)\\s*(second|minute|hour|day|millisecond|microsecond)s?\\s*".r
    s match {
      case m(n, unit) =>
        val mult = unit.toLowerCase match {
          case "microsecond" => 1L
          case "millisecond" => 1000L
          case "second"      => 1000000L
          case "minute"      => 60L * 1000000L
          case "hour"        => 3600L * 1000000L
          case "day"         => 86400L * 1000000L
        }
        n.toLong * mult
      case _ => throw new IllegalArgumentException(s"cannot parse interval: '$s'")
    }
  }

  def windowsFor(tsMicros: Long, slideMicros: Long, sizeMicros: Long): Seq[(Long, Long)] = {
    require(slideMicros > 0 && sizeMicros > 0, "slide/size must be positive")
    val lastStart = Math.floorDiv(tsMicros, slideMicros) * slideMicros
    Iterator.iterate(lastStart)(_ - slideMicros)
      .takeWhile(start => start + sizeMicros > tsMicros)
      .map(start => (start, start + sizeMicros))
      .toSeq
  }

  private def toTs(micros: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }

  /** Struct shape matches Spark's window() output: (start, end). */
  case class HopWindow(start: Timestamp, end: Timestamp)

  private val hopUdf = udf { (ts: Timestamp, slide: String, size: String) =>
    if (ts == null) null
    else {
      val micros = Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
      windowsFor(micros, parseDurationMicros(slide), parseDurationMicros(size))
        .map { case (s, e) => HopWindow(toTs(s), toTs(e)) }
    }
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("hop_windows", hopUdf)
    ()
  }
}
