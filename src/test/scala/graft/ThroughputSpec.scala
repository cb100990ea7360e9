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

  // CO-TENANCY-AWARE floors (round 20, the bench probe's discipline):
  // these wall-clock canaries measure the BOX, not the engine, whenever
  // co-tenants (including the suite's own parallel test-group JVMs —
  // build.sbt) hold the CPU: the r20 4-way grouped run failed two of
  // them at rates 2-5× below their quiet-box values. The floor is
  // asserted only when the share of host CPU burned by OTHER processes
  // over the test's window stays under 20%; the measured rate is
  // always logged (and recorded in SCALE.md).
  private def hostSnap(): (Long, Long, Long) = {
    val st = scala.io.Source.fromFile("/proc/stat")
    val f = try st.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
    finally st.close()
    val self = scala.io.Source.fromFile("/proc/self/stat")
    val s = try self.mkString finally self.close()
    val rest = s.substring(s.lastIndexOf(')') + 2).trim.split("\\s+")
    (f.sum - (f(3) + (if (f.length > 4) f(4) else 0L)), f.sum,
      rest(11).toLong + rest(12).toLong)
  }
  private var testSnap: (Long, Long, Long) = (-1L, -1L, -1L)
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    testSnap = try hostSnap() catch { case _: Exception => (-1L, -1L, -1L) }
    super.withFixture(test)
  }
  private def floorAssert(rate: Double, floor: Double, label: String): Unit = {
    val other = try {
      val a = hostSnap()
      if (testSnap._2 < 0)
        -1.0
      else math.max(0.0,
        ((a._1 - testSnap._1) - (a._3 - testSnap._3)).toDouble /
          math.max(1L, a._2 - testSnap._2))
    } catch { case _: Exception => -1.0 }
    if (other >= 0 && other <= 0.20)
      assert(rate > floor,
        f"$label unexpectedly slow on a quiet box (other-busy $other%.2f): $rate%.0f/s")
    else if (rate <= floor)
      info(f"$label below floor ($rate%.0f <= $floor%.0f) but host busy " +
        f"(other-busy $other%.2f) — canary not judged")
  }

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
    floorAssert(rps, 10000, "stateless pipe")
  }

  test("text quality-gate curation sustains bulk document rates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 40k real documents (sf0.1 corpus cycled 8x) through the map-only
    // gate stack: classifier margin + blocklist + token/quality metrics
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val corpus = (0 until 8).flatMap(r =>
      docs.map { case (id, t) => (id + r * 1000000L, t) })
    val weights = graft.operators.Classifier.trainLogOdds(
      Seq((0L, "good clean prose")).toDF("doc_id", "text"),
      Seq((0L, "spam junk noise")).toDF("doc_id", "text"), "text", dim = 1024)
    val mem = MemoryStream[(Long, String)]
    val gate = {
      val df = mem.toDF().toDF("doc_id", "text")
      val scored = graft.operators.Classifier
        .scoreLinear(df, "doc_id", "text", weights)
      val block = graft.operators.TextOps.blocklistStats(df, "doc_id", "text",
        Seq("slow", "dup", "big"), maxPerMille = 50)
        .select(col("doc_id"), col("kept"))
      scored.join(block, Seq("doc_id"))
    }
    val q = gate.writeStream.format("noop").queryName("tp_curation")
      .outputMode(OutputMode.Append).start()
    try {
      val batches = corpus.grouped(5000).toSeq
      mem.addData(batches.head: _*)
      q.processAllAvailable()
      val timedRows = batches.tail.map(_.size).sum
      val t0 = System.nanoTime()
      batches.tail.foreach(b => mem.addData(b: _*))
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val rps = timedRows / secs
      info(f"tp_curation: $timedRows docs in $secs%.2f s = $rps%.0f docs/s")
      floorAssert(rps, 2000, "curation gate")
    } finally q.stop()
  }

  test("stateful windowed aggregation sustains bulk row rates") {
    import spark.implicits._
    val rps = run("tp_windowed")(
      m => m.toDF().withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "10 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value").as("s")),
      OutputMode.Update)
    floorAssert(rps, 5000, "windowed agg")
  }

  test("webhook HTTP ingest sustains bulk request rates") {
    import graft.sources.{PushBuffer, WebhookServer}
    val chan = "tp_webhook"
    PushBuffer.clear(chan)
    val srv = WebhookServer.start(0, Map("/ingest" -> chan))
    try {
      val uri = java.net.URI.create(s"http://127.0.0.1:${srv.port}/ingest")
      val http = java.net.http.HttpClient.newHttpClient()
      def post(body: String) = http.send(
        java.net.http.HttpRequest.newBuilder(uri)
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      post("""{"warm":0}""") // connection + JIT warmup
      // 200 batched posts of 50 rows each = 10k rows through real HTTP
      val batch = (1 to 50).map(i => s"""{"k":$i}""").mkString("[", ",", "]")
      val nPosts = 200
      val t0 = System.nanoTime()
      var i = 0
      while (i < nPosts) { assert(post(batch).statusCode() == 200); i += 1 }
      val secs = (System.nanoTime() - t0) / 1e9
      val rps = nPosts * 50 / secs
      info(f"tp_webhook: ${nPosts * 50} rows in $secs%.2f s = $rps%.0f rows/s")
      assert(PushBuffer.endOffset(chan) == nPosts * 50 + 1)
      // loose floor (CI-safe): HTTP parse + Jackson + buffer append
      floorAssert(rps, 2000, "webhook ingest")
    } finally srv.stop()
  }

  test("kafka RecordBatch decode sustains bulk record rates") {
    import spark.implicits._
    import graft.cdc.KafkaBatch
    // 100k records in 1k-record batches (typical producer batching)
    val batches = (0 until 100).map { b =>
      KafkaBatch.Encode.batch(b * 1000L, 1000000L + b,
        (0 until 1000).map(i =>
          (1000000L + b, s"k${b * 1000 + i}", s"""{"n":${b * 1000 + i}}""")))
    }
    val df = batches.zipWithIndex.map { case (f, i) => (i.toLong, f) }
      .toDF("seq", "frame").repartition(8).cache()
    df.count() // materialize outside the timed window
    val t0 = System.nanoTime()
    val n = KafkaBatch.records(df).count()
    val secs = (System.nanoTime() - t0) / 1e9
    df.unpersist()
    assert(n == 100000L)
    val rps = n / secs
    info(f"tp_kafka_decode: $n records in $secs%.2f s = $rps%.0f rec/s")
    floorAssert(rps, 20000, "kafka decode")
  }

  test("arrow IPC decode sustains bulk row rates") {
    import graft.sources.ArrowIngest
    val ev = Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val frames = ArrowIngest.encodeFrames(ev.repartition(8)).cache()
    frames.count() // materialize encode outside the timed window
    val t0 = System.nanoTime()
    val n = ArrowIngest.decodeFrames(frames, ev.schema).count()
    val secs = (System.nanoTime() - t0) / 1e9
    frames.unpersist()
    assert(n == 100000L)
    val rps = n / secs
    info(f"tp_arrow_decode: $n rows in $secs%.2f s = $rps%.0f rows/s")
    floorAssert(rps, 20000, "arrow decode")
  }

  test("gRPC wire ingest sustains bulk message rates") {
    import graft.sources.{GrpcClient, GrpcIngest, PushBuffer}
    import graft.sources.GrpcIngest.Pbuf
    import org.apache.spark.sql.types._
    val chan = "tp_grpc"
    PushBuffer.clear(chan)
    PushBuffer.configure(chan, 20000)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val server = GrpcIngest.start(0,
      Map("m" -> GrpcIngest.TableSpec(schema, chan)))
    val client = new GrpcClient("127.0.0.1", server.port)
    try {
      def req(i: Long) = {
        val w = new Pbuf.Writer().str(1, "m").int(2, 0L)
        w.embedded(4, new Pbuf.Writer().int(3, i))
        w.embedded(4, new Pbuf.Writer()
          .fixed64(5, java.lang.Double.doubleToLongBits(i * 0.5)))
        w.int(5, i).result
      }
      // warm: one small call (connection + HPACK + JIT)
      client.call("/dozer.ingest.IngestService/ingest_stream",
        Seq(req(0L)))
      val n = 10000
      val msgs = (1 to n).map(i => req(i.toLong))
      val t0 = System.nanoTime()
      val (h, _) = client.call(
        "/dozer.ingest.IngestService/ingest_stream", msgs)
      val secs = (System.nanoTime() - t0) / 1e9
      assert(h("grpc-status") == "0", h)
      assert(PushBuffer.endOffset(chan) == n + 1L)
      val rps = n / secs
      info(f"tp_grpc: $n messages in $secs%.2f s = $rps%.0f msg/s")
      // loose floor (CI-safe): h2c framing + flow control + protobuf
      // decode + Jackson envelope per message, one HTTP/2 stream
      floorAssert(rps, 2000, "grpc ingest")
    } finally { client.close(); server.stop() }
  }

  test("ONNX model UDF sustains bulk inference rates") {
    import graft.functions.{OnnxMini, OnnxModels}
    // the q85 head (64->16->8 Gemm/Relu/Gemm/ArgMax) over the sf0.1
    // embeddings corpus (50k vectors) — the model-scoring map stage
    OnnxMini.register(spark, "tp_onnx",
      OnnxMini.parse(OnnxModels.q85Bytes))
    // sf0.1 has only 2k vectors — replicate 64x (~128k rows) so fixed
    // job overhead amortizes and the measured rate is the map-stage rate
    val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding"))
      .crossJoin(spark.range(64).select(col("id").as("rep")))
      .persist()
    val n = emb.count() // materialize before timing
    val t0 = System.nanoTime()
    val scored = emb.selectExpr("vec_id", "tp_onnx_vec(embedding) AS y")
      .agg(count(lit(1)), sum("y")).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val rps = n / secs
    emb.unpersist()
    info(f"tp_onnx: $n rows in $secs%.2f s = $rps%.0f rows/s")
    assert(scored.head.getLong(0) == n)
    // loose floor (CI-safe): ~1.2k mul-adds per row through the interpreter
    floorAssert(rps, 10000, "onnx inference")
  }
}
