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
