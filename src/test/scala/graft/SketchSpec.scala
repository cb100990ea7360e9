package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Count-Min Sketch invariants on a planted corpus. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the mat"), // exact dup: grams count twice
    (3L, "a dog ran over the hill today"),
    (4L, "the cat sat on a log"),
    (5L, "short doc"), // < n tokens -> whole-doc gram
    (6L, null.asInstanceOf[String])).toDF("doc_id", "text")

  test("CMS never underestimates, and is exact when width kills collisions") {
    val n = 3
    val exact = Sketches.gramOccurrences(corpus, "text", n)
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
    val queries = exact.select("gram")
    // tiny sketch: collisions guaranteed -> est >= exact everywhere
    val tiny = Sketches.cmsEstimate(
      Sketches.cmsBuild(corpus, "text", n, depth = 2, width = 4),
      queries, "gram", depth = 2, width = 4)
      .join(exact, Seq("gram"))
      .select("gram", "est", "cnt").collect()
    assert(tiny.nonEmpty)
    for (r <- tiny)
      assert(r.getLong(1) >= r.getLong(2), s"underestimate for ${r.getString(0)}")
    // huge sketch: no collisions -> est == exact for every gram
    val wide = Sketches.cmsEstimate(
      Sketches.cmsBuild(corpus, "text", n, depth = 4, width = 1 << 20),
      queries, "gram", depth = 4, width = 1 << 20)
      .join(exact, Seq("gram"))
      .select("gram", "est", "cnt").collect()
    for (r <- wide)
      assert(r.getLong(1) == r.getLong(2), s"collision at 2^20 for ${r.getString(0)}")
    // the planted dup's grams really count with multiplicity
    val catSat = wide.find(_.getString(0) == "the cat sat").get
    assert(catSat.getLong(2) == 3L)
    // a never-seen gram estimates 0 (all its cells untouched at 2^20)
    val zero = Sketches.cmsEstimate(
      Sketches.cmsBuild(corpus, "text", n, depth = 4, width = 1 << 20),
      Seq("totally absent gram").toDF("gram"), "gram",
      depth = 4, width = 1 << 20).collect()
    assert(zero.head.getLong(1) == 0L)
  }

  test("merge(build(A), build(B)) == build(A union B) cell for cell") {
    val (a, b) = (corpus.filter($"doc_id" <= 3), corpus.filter($"doc_id" > 3))
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuild(a, "text", 3, depth = 3, width = 16),
      Sketches.cmsBuild(b, "text", 3, depth = 3, width = 16))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketches.cmsBuild(corpus, "text", 3, depth = 3, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("streaming sketch maintenance: per-batch sketches merge to the batch build") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms_stream").toString
    val rows = corpus.filter($"text".isNotNull)
      .as[(Long, String)].collect().toIndexedSeq
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*) // before start: AvailableNow snapshots offsets at start
    val q = mem.toDS().toDF("doc_id", "text").writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // append the BATCH-LOCAL sketch; merge is deferred to read time
        // (cell-wise sum = cmsMerge over all appended shards), so the
        // write is idempotent-friendly and never rewrites history
        Sketches.cmsBuild(batch, "text", 3, depth = 3, width = 16)
          .write.mode("append").parquet(s"$tmp/sketch")
        ()
      }.start()
    assert(q.awaitTermination(120000), "sketch stream timed out")
    val streamed = spark.read.parquet(s"$tmp/sketch")
      .groupBy("d", "cell").agg(org.apache.spark.sql.functions.sum("c").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketches.cmsBuild(corpus, "text", 3, depth = 3, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == whole)
  }

  test("log-linear histogram: bucket math, error bound against exact " +
      "quantiles, and additive mergeability") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    // heavy-tailed values across 5 decades, two groups
    val rows = (1 to 4000).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (g, math.round(math.exp(rnd.nextDouble() * 11.5)) + 1L)
    }
    val df = rows.toDF("g", "v")
    val bits = 5
    // bucket mapping invariants: lo <= v < lo + width, width/lo <= 2^-bits
    val mapped = df.select(col("g"), col("v"),
        graft.operators.Sketches.logBucketLo(col("v"), bits).as("lo"))
      .collect()
    mapped.foreach { r =>
      val v = r.getLong(1); val lo = r.getLong(2)
      assert(lo <= v, s"v=$v lo=$lo")
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val width = 1L << math.max(e - bits, 0)
      assert(v < lo + width, s"v=$v lo=$lo width=$width")
    }
    // quantile estimates: lower bound within 2^-bits relative error
    val est = graft.operators.Sketches.logHistQuantiles(
        df, Seq("g"), "v", bits, Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    Seq("a", "b").foreach { g =>
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      Seq(50, 90, 99).foreach { p =>
        val exact = vs((math.ceil(p / 100.0 * vs.size) - 1).toInt.max(0))
        val lo = est((g, p))
        assert(lo <= exact, s"g=$g p=$p exact=$exact lo=$lo")
        assert((exact - lo).toDouble / exact <= math.pow(2.0, -bits) + 1e-12,
          s"g=$g p=$p exact=$exact lo=$lo")
      }
    }
    // mergeability: histogram(A ∪ B) == bucket-wise sum of shard
    // histograms (the property that lets per-day shards roll up)
    val (sa, sb) = rows.splitAt(1700)
    val merged = graft.operators.Sketches
      .logHistogram(sa.toDF("g", "v"), Seq("g"), "v", bits)
      .unionByName(graft.operators.Sketches
        .logHistogram(sb.toDF("g", "v"), Seq("g"), "v", bits))
      .groupBy("g", "bucket_lo").agg(sum("n").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = graft.operators.Sketches.logHistogram(df, Seq("g"), "v", bits)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
    // bounded state: bucket count per group stays under 64 * 2^bits
    val perGroup = whole.keys.groupBy(_._1).map(_._2.size)
    assert(perGroup.forall(_ <= 64 * (1 << bits)))
    // plan pin: ONE exchange (the group-key shuffle) with a map-side
    // partial aggregate below it — the shape that holds at 100×
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.operators.Sketches
        .logHistogram(df, Seq("g"), "v", bits)
        .queryExecution.executedPlan.toString
      assert("Exchange ".r.findAllIn(plan).size == 1, plan.take(800))
      assert(plan.contains("partial_count") ||
        "HashAggregate".r.findAllIn(plan).size == 2, plan.take(800))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("streaming histogram maintenance: per-batch shard histograms " +
      "merge to the batch build (same pattern as the CMS stream)") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_hist_stream").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val rnd = new scala.util.Random(5)
    val all = (1 to 900).map(i =>
      (if (i % 3 == 0) "x" else "y", rnd.nextInt(100000).toLong + 1))
    val q = mem.toDF().toDF("g", "v").writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // append the BATCH-LOCAL histogram; merge deferred to read time
        // (bucket-wise sum) — idempotent-friendly, never rewrites
        Sketches.logHistogram(batch, Seq("g"), "v", bits = 4)
          .write.mode("append").parquet(s"$tmp/hist")
        ()
      }.start()
    all.grouped(300).foreach(mem.addData(_: _*))
    assert(q.awaitTermination(120000), "histogram stream timed out")
    val streamed = spark.read.parquet(s"$tmp/hist")
      .groupBy("g", "bucket_lo").agg(sum("n").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketches.logHistogram(
        all.toDF("g", "v"), Seq("g"), "v", bits = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == whole)
  }

  test("sketch size is bounded by depth*width and the estimate join broadcasts") {
    val sk = Sketches.cmsBuild(corpus, "text", 3, depth = 2, width = 4)
    assert(sk.count() <= 8)
    val plan = Sketches.cmsEstimate(sk,
      Seq("the cat sat").toDF("gram"), "gram", depth = 2, width = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"sketch lookup should broadcast:\n$plan")
  }
}
