package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Single-node streaming throughput measurement — the reference's
  * headline metric ("magnitudes faster than Debezium+Kafka",
  * README.md:5) is ingestion throughput, published without numbers
  * (BASELINE.md); this records ours so the claim has a figure to
  * compare against.
  *
  * The sf0.1 events table (100k rows) flows through MemoryStream in
  * multiple micro-batches into (a) a stateless projection+filter and
  * (b) a stateful watermarked tumbling-window aggregation — the two
  * ends of the per-record cost spectrum. Asserted bounds are
  * deliberately loose (CI-safe); the measured rows/sec is logged and
  * recorded in SCALE.md.
  */
case class E(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, event_type: String, value: Double)

class ThroughputSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private lazy val events: Seq[E] = {
    import spark.implicits._
    Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[E].collect().toSeq
  }

  private def run(name: String)(build: MemoryStream[E] => org.apache.spark.sql.DataFrame,
      mode: OutputMode): Double = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[E]
    val q = build(mem).writeStream.format("noop")
      .queryName(name).outputMode(mode).start()
    try {
      val batches = events.grouped(10000).toSeq
      // warm the query machinery with the first batch, then time the rest
      mem.addData(batches.head: _*)
      q.processAllAvailable()
      val timedRows = batches.tail.map(_.size).sum
      val t0 = System.nanoTime()
      batches.tail.foreach { b => mem.addData(b: _*) }
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val rps = timedRows / secs
      info(f"$name: $timedRows rows in $secs%.2f s = $rps%.0f rows/s")
      rps
    } finally q.stop()
  }

  test("stateless streaming pipe sustains bulk row rates") {
    import spark.implicits._
    val rps = run("tp_stateless")(
      m => m.toDF().filter($"value" > 0)
        .select($"event_id", $"user_id", ($"value" * 2).as("v2")),
      OutputMode.Append)
    assert(rps > 10000, s"stateless pipe unexpectedly slow: $rps rows/s")
  }

  test("stateful windowed aggregation sustains bulk row rates") {
    import spark.implicits._
    val rps = run("tp_windowed")(
      m => m.toDF().withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "10 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value").as("s")),
      OutputMode.Update)
    assert(rps > 5000, s"windowed agg unexpectedly slow: $rps rows/s")
  }
}
