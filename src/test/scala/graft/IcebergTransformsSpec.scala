package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.IcebergTransforms
import graft.sources.IcebergTransforms._

/** Transform functions pinned to the PUBLIC iceberg spec: the Appendix
  * B murmur3 test vectors, the documented truncate/date semantics, and
  * the invariant the writer depends on — the staging-layout Column and
  * the driver-side eval agree value-for-value.
  */
class IcebergTransformsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("bucket hashes match the spec's Appendix B test vectors") {
    // published vectors: hash(34 as int/long) = 2017239379,
    // hash("iceberg") = 1210000089, hash(date 2017-11-16) = -653330422,
    // hash(timestamp 2017-11-16T22:31:08) = -2047944441
    assert(bucketHash(IntegerType, 34) == 2017239379)
    assert(bucketHash(LongType, 34L) == 2017239379)
    assert(bucketHash(StringType, "iceberg") == 1210000089)
    assert(bucketHash(DateType, java.sql.Date.valueOf("2017-11-16")) ==
      -653330422)
    val micros = java.time.LocalDateTime.parse("2017-11-16T22:31:08")
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(bucketHash(TimestampType, micros) == -2047944441)
    // bucketValue applies (hash & MaxValue) % n
    assert(bucketValue(StringType, "iceberg", 16) ==
      (1210000089 & Int.MaxValue) % 16)
  }

  test("truncate: floor semantics for negative ints, code-point prefix " +
      "for strings") {
    assert(eval(Truncate(10), IntegerType, 1) == 0)
    assert(eval(Truncate(10), IntegerType, -1) == -10)
    assert(eval(Truncate(10), LongType, -1L) == -10L)
    assert(eval(Truncate(3), StringType, "iceberg") == "ice")
    assert(eval(Truncate(10), StringType, "ice") == "ice")
    // supplementary chars count as ONE code point
    val s = new String(Character.toChars(0x10400)) + "abc"
    assert(eval(Truncate(2), StringType, s) ==
      new String(Character.toChars(0x10400)) + "a")
  }

  test("date transforms: epoch-relative year/month ordinals, day as " +
      "date, negatives floor correctly") {
    val d = java.sql.Date.valueOf("2017-11-16")
    assert(eval(Year, DateType, d) == 47)
    assert(eval(Month, DateType, d) == 47 * 12 + 10)
    assert(eval(Day, DateType, d) == d)
    val pre = java.sql.Date.valueOf("1969-12-31")
    assert(eval(Year, DateType, pre) == -1)
    assert(eval(Month, DateType, pre) == -1)
  }

  test("parseSpec accepts bare columns and call forms; render round-" +
      "trips through parse") {
    assert(parseSpec("region") == ("region", Identity))
    assert(parseSpec("day(ts)") == ("ts", Day))
    assert(parseSpec("bucket(16, id)") == ("id", Bucket(16)))
    assert(parseSpec("truncate(4, s)") == ("s", Truncate(4)))
    Seq(Identity, Bucket(16), Truncate(4), Year, Month, Day, Hour)
      .foreach(t => assert(parse(t.render) == t))
    intercept[IllegalArgumentException](parseSpec("median(ts)"))
  }

  test("the staging-layout Column agrees with driver-side eval for " +
      "every transform (the invariant manifests depend on)") {
    val df = Seq(
      (7, 1234L, "iceberg", java.sql.Date.valueOf("2017-11-16")),
      (-3, -77L, "sparkly", java.sql.Date.valueOf("1969-06-01")),
      (100, 0L, "x", java.sql.Date.valueOf("2024-02-29")))
      .toDF("i", "l", "s", "d")
    val cases: Seq[(String, DataType, Transform)] = Seq(
      ("i", IntegerType, Bucket(16)), ("i", IntegerType, Truncate(10)),
      ("l", LongType, Bucket(8)), ("l", LongType, Truncate(100)),
      ("s", StringType, Bucket(32)), ("s", StringType, Truncate(3)),
      ("d", DateType, Bucket(16)), ("d", DateType, Year),
      ("d", DateType, Month), ("d", DateType, Day))
    cases.foreach { case (c, dt, t) =>
      val viaExpr = df.select(col(c),
        IcebergTransforms.expr(t, col(c), dt).as("tv")).collect()
      viaExpr.foreach { r =>
        assert(r.get(1) == eval(t, dt, r.get(0)),
          s"expr/eval drift for ${t.render} on ${r.get(0)}")
      }
    }
  }

  test("timestamp time transforms are UTC-pinned: expr agrees with eval " +
      "even under a non-UTC session time zone (the layout must match " +
      "the manifest values the pruner computes)") {
    val prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      // 2017-01-01T03:30:00 UTC is still 2016-12-31 in Los Angeles —
      // a session-tz year()/to_date() would disagree with eval's UTC
      // epoch-day arithmetic on exactly these boundary values
      val micros = Seq(
        java.time.LocalDateTime.parse("2017-01-01T03:30:00"),
        java.time.LocalDateTime.parse("1969-12-31T22:00:00"),
        java.time.LocalDateTime.parse("2024-02-29T23:59:59"))
        .map(_.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
      val df = micros.toDF("us")
        .select(timestamp_micros(col("us")).as("ts"))
      Seq(Year, Month, Day, Hour, Bucket(16)).foreach { t =>
        val got = df.select(col("ts"),
          IcebergTransforms.expr(t, col("ts"), TimestampType).as("tv"))
          .collect()
        got.foreach { r =>
          val raw = r.getTimestamp(0)
          assert(r.get(1) == eval(t, TimestampType, raw),
            s"UTC drift for ${t.render} on $raw")
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }
}
