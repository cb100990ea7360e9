package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every registry query
  * on SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Method: one untimed warmup (JVM/codegen/parquet-footer caches), then
  * each query timed end-to-end writing to the `noop` datasource — forces
  * full evaluation of every column with zero sink I/O, unlike count()
  * which lets Catalyst prune projections.
  *
  * Each query is timed SPARK_GRAFT_BENCH_RUNS times back-to-back
  * (default 3 since round 11) and the per-query figure is the median
  * (mean of the two middle samples for an even count) — single-run
  * machine jitter on this box has repeatedly shown ±2 s swings that
  * read as fake regressions/speedups (round-5/6 trajectory), and with
  * 2 runs the recorded value is the MEAN of an outlier pair (round-10
  * q36: 0.22s → recorded 1.19s off a [0.31, 2.08] spread). A true
  * median over 3 kills a single outlier entirely. `runs` is carried in
  * the JSON so trajectories across rounds compare like with like.
  * Round 16 adds ADAPTIVE RE-SAMPLING: a sub-2s query whose sample
  * spread exceeds half its median gets two extra samples (median of
  * 5) — rounds 14/15 both recorded ~2× round-over-round "regressions"
  * on untouched fast queries that were pure spread; only noisy fast
  * queries pay the extra runs.
  */
object Bench {

  /** CO-TENANCY PROBE: the box this bench runs on is shared, and two
    * rounds of drift adjudication (r17/r18) had to INFER co-tenant load
    * from symptom uniformity. These helpers read /proc so each query's
    * record carries the host state it was measured under — a noisy run
    * is labeled by data, not argued from spread shapes.
    *
    * Per query we record `[loadavg1, other_busy_frac, steal_frac]`:
    * - loadavg1: 1-minute load average sampled when the query finishes
    *   (>> the bench's own concurrency ⇒ co-tenants queued for CPU);
    * - other_busy_frac: host busy jiffies MINUS this JVM's own
    *   utime+stime, over total jiffies, across the query's sampling
    *   window — the share of the box other tenants consumed while this
    *   query was being timed;
    * - steal_frac: hypervisor steal share over the same window (VM
    *   co-tenancy that /proc/self can't see).
    * All reads are best-effort: on any parse failure the probe yields
    * -1 markers rather than failing the bench.
    */
  private def hostJiffies(): (Long, Long, Long) = {
    // /proc/stat first line: cpu user nice system idle iowait irq softirq steal ...
    val src = scala.io.Source.fromFile("/proc/stat")
    val f = try src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
    finally src.close()
    val total = f.sum
    val idle = f(3) + (if (f.length > 4) f(4) else 0L)
    val steal = if (f.length > 7) f(7) else 0L
    (total - idle, total, steal)
  }
  private def selfJiffies(): Long = {
    // fields 14/15 (utime/stime) counted after the ')' that ends comm;
    // the token right after ')' is field 3 (state), so utime is idx 11
    val src = scala.io.Source.fromFile("/proc/self/stat")
    val s = try src.mkString finally src.close()
    val rest = s.substring(s.lastIndexOf(')') + 2).trim.split("\\s+")
    rest(11).toLong + rest(12).toLong
  }
  private def loadavg1(): Double = {
    val src = scala.io.Source.fromFile("/proc/loadavg")
    try src.mkString.trim.split("\\s+")(0).toDouble finally src.close()
  }
  /** Snapshot for windowed deltas; all -1 on failure. */
  private def probeSnap(): (Long, Long, Long, Long) =
    try { val (b, t, st) = hostJiffies(); (b, t, st, selfJiffies()) }
    catch { case _: Exception => (-1L, -1L, -1L, -1L) }
  /** `[loadavg1, other_busy_frac, steal_frac]` over the window. */
  private def probeDelta(before: (Long, Long, Long, Long)): (Double, Double, Double) =
    try {
      val after = probeSnap()
      if (before._2 < 0 || after._2 < 0) (-1.0, -1.0, -1.0)
      else {
        val dTotal = math.max(1L, after._2 - before._2).toDouble
        val dBusy = (after._1 - before._1).toDouble
        val dSelf = (after._4 - before._4).toDouble
        val dSteal = (after._3 - before._3).toDouble
        (loadavg1(),
          math.max(0.0, (dBusy - dSelf) / dTotal),
          math.max(0.0, dSteal / dTotal))
      }
    } catch { case _: Exception => (-1.0, -1.0, -1.0) }
  private def loadJson(l: (Double, Double, Double)): String =
    f"[${l._1}%.2f,${l._2}%.3f,${l._3}%.3f]"

  /** ISOLATED mode (SPARK_GRAFT_BENCH_ISOLATED=qA,qB,...): one FRESH
    * JVM per listed query — no shared JIT profile, cache residue, GC
    * debt, or run-order effects — with the query itself run once
    * untimed in the child before its timed samples (codegen + footer
    * caches warm, matching the in-suite method's steady state).
    * Round-over-round drift adjudication reads these medians instead
    * of in-suite spreads. Writes BENCH_ISOLATED.json.
    */
  private def runIsolated(list: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val names = list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3")
    val cp = sys.env.getOrElse("SPARK_GRAFT_CLASSPATH",
      "target/scala-2.13/classes:/opt/spark/jars/*")
    val results = names.map { n =>
      val tmp = java.nio.file.Files.createTempFile("bench_iso_", ".json")
      // same module opens build.sbt gives forked runs (Spark 4 on
      // JDK 17 outside spark-submit)
      val opens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).map(p => s"--add-opens=$p=ALL-UNNAMED")
      val cmd = Seq("java", "-Xmx16g", "-cp", cp) ++ opens :+ "graft.Bench"
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", n)
      pb.environment().put("SPARK_GRAFT_BENCH_CHILD", "1")
      pb.environment().put("SPARK_GRAFT_BENCH_RUNS", runs)
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", tmp.toString)
      pb.environment().remove("SPARK_GRAFT_BENCH_ISOLATED")
      pb.redirectErrorStream(false)
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val rc = pb.start().waitFor()
      val json =
        try new String(java.nio.file.Files.readAllBytes(tmp), "UTF-8")
        catch { case _: Exception => "" }
      java.nio.file.Files.deleteIfExists(tmp)
      // child output is the same one-line JSON main() prints; parse it
      // structurally (a regex scrape broke the moment the record gained
      // nested fields — r18 "What's wrong" #3)
      val node =
        try Option(mapper.readTree(json)).filter(_.isObject)
        catch { case _: Exception => None }
      def numAt(obj: String, key: String): Double = node
        .flatMap(r => Option(r.get(obj))).flatMap(q => Option(q.get(key)))
        .filter(_.isNumber).map(_.asDouble()).getOrElse(-1.0)
      def arrAt(obj: String, key: String): Seq[Double] = node
        .flatMap(r => Option(r.get(obj))).flatMap(q => Option(q.get(key)))
        .filter(_.isArray).toSeq
        .flatMap(a => (0 until a.size()).map(a.get(_).asDouble()))
      val med = numAt("queries", n)
      val spr = arrAt("spread", n) match {
        case Seq(lo, hi, _*) => (lo, hi)
        case _ => (-1.0, -1.0)
      }
      val load = arrAt("load", n) match {
        case Seq(l, o, st, _*) => (l, o, st)
        case _ => (-1.0, -1.0, -1.0)
      }
      System.err.println(
        f"[bench-isolated] $n%-28s ${med}%8.3f s rc=$rc " +
          f"load=${load._1}%.1f other=${load._2}%.2f")
      (n, med, spr, load)
    }
    // CUMULATIVE record: merge this run's per-query medians into the
    // existing BENCH_ISOLATED.json (latest measurement wins per query)
    // so the file holds every query ever isolated-adjudicated, not just
    // the last invocation's set. Failed children (rc!=0 / unparseable
    // output) are recorded IN-BAND in a "failed" array rather than
    // silently shrinking the summed value.
    val path = java.nio.file.Paths.get("BENCH_ISOLATED.json")
    val priorText =
      try new String(java.nio.file.Files.readAllBytes(path), "UTF-8").trim
      catch { case _: Exception => "" }
    // a present-but-corrupt history file is a hard error — silently
    // starting a fresh record would drop every prior adjudication
    val prior: Option[com.fasterxml.jackson.databind.JsonNode] =
      if (priorText.isEmpty) None
      else try {
        val n = mapper.readTree(priorText)
        require(n != null && n.isObject, "not a JSON object")
        Some(n)
      } catch { case e: Exception =>
        System.err.println(
          s"[bench-isolated] REFUSING: $path exists but is unparseable " +
            s"(${e.getMessage}); move it aside to start a fresh record")
        sys.exit(2)
      }
    def priorMap(obj: String): Map[String, String] = prior
      .flatMap(r => Option(r.get(obj))).filter(_.isObject).toSeq
      .flatMap { o =>
        val it = o.fields()
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
          .map(e => e.getKey -> e.getValue.toString).toSeq
      }.toMap
    val priorQs = priorMap("queries")
    val priorSpread = priorMap("spread")
    val priorLoad = priorMap("load")
    val priorFailed = prior.flatMap(r => Option(r.get("failed")))
      .filter(_.isArray).toSeq
      .flatMap(a => (0 until a.size()).map(a.get(_).asText())).toSet
    val (okRuns, badRuns) = results.partition(_._2 >= 0)
    // prior-format files recorded failures as -1 medians: reclassify
    val (priorOk, priorBad) = priorQs.partition(_._2.toDouble >= 0)
    val badNames = badRuns.map(_._1).toSet
    // a query that failed in THIS run must not keep its stale prior
    // median in the map/total while also being listed as failed — the
    // latest adjudication could not reproduce that measurement
    val mergedQs = (priorOk -- badNames) ++
      okRuns.map { case (k, v, _, _) => k -> v.toString }
    val mergedSpread = (priorSpread ++
      okRuns.map { case (k, _, (lo, hi), _) => k -> s"[$lo,$hi]" })
      .filter { case (k, _) => mergedQs.contains(k) }
    val mergedLoad = (priorLoad ++
      okRuns.map { case (k, _, _, l) => k -> loadJson(l) })
      .filter { case (k, _) => mergedQs.contains(k) }
    val failed = (priorFailed ++ priorBad.keys -- okRuns.map(_._1)) ++
      badRuns.map(_._1)
    def obj(m: Map[String, String]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = mergedQs.values.map(_.toDouble).filter(_ >= 0).sum
    val failedJson = failed.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total_isolated","value":$total,"unit":"sec","queries":${obj(mergedQs)},"spread":${obj(mergedSpread)},"load":${obj(mergedLoad)},"failed":$failedJson,"runs":$runs,"sf":"${sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")}"}"""
    println(json)
    try java.nio.file.Files.write(path,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write BENCH_ISOLATED.json: " +
        e.getMessage)
    }
    if (badRuns.nonEmpty)
      System.err.println("[bench-isolated] FAILED children: " +
        badRuns.map(_._1).mkString(", "))
  }

  def main(args: Array[String]): Unit = {
    sys.env.get("SPARK_GRAFT_BENCH_ISOLATED") match {
      case Some(list) if !sys.env.contains("SPARK_GRAFT_BENCH_CHILD") =>
        runIsolated(list); return
      case _ => ()
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // static conf, set at creation (rationale: GraftSession.create)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      val sec =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      // per-query isolation: operators that persist an index for multiple
      // consumers (e.g. the banded LSH index) leave cache blocks behind;
      // dropping them keeps each timing independent of run order.
      spark.sharedState.cacheManager.clearCache()
      // streaming rigs (TTL replay, lake tails) leave loaded state-store
      // providers and terminated-query bookkeeping in the shared JVM;
      // unload them so queries that SORT AFTER them aren't taxed
      // (measured: q34g 1.6s isolated vs 2.2-2.5s right after
      // q140/q142 without this)
      spark.streams.active.foreach(_.stop())
      spark.streams.resetTerminated()
      try org.apache.spark.sql.graft.StreamingStateBridge.unloadAll()
      catch { case _: Throwable => () }
      // Spark's ContextCleaner reclaims broadcast/shuffle state only on
      // driver GC; 70+ queries in one JVM otherwise accumulate until
      // late queries pay multi-second GC pauses (measured 16s->58s on
      // the same query isolated vs in-suite). One explicit GC per query
      // keeps timings order-independent.
      System.gc()
      // progress line per query (stderr, driver-diagnosable if a run
      // stalls or the whole suite's wall-clock blows up)
      System.err.println(f"[bench] $name%-28s $sec%8.3f s")
      sec
    }

    // local-iteration filter: comma-separated query names (driver unset)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val runs = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0
      else {
        val s = ok.sorted
        if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
      }
    }
    runOnce("q1_agg") // warmup: JIT + codegen + FS metadata
    // isolated-mode child: warm the TARGET query itself once untimed —
    // a fresh JVM would otherwise charge codegen/JIT of this query's
    // plan to its first sample, which the in-suite method amortizes
    val childWarm = sys.env.contains("SPARK_GRAFT_BENCH_CHILD")
    val results = names.map { n =>
      if (childWarm) runOnce(n)
      val snap = probeSnap() // window = this query's timed samples only
      val base = Seq.fill(runs)(runOnce(n))
      // sub-second queries: one more sample so the median is a true
      // middle-of-3 — their relative jitter is the suite's noise floor
      val widened =
        if (runs == 2 && base.forall(s => s >= 0 && s < 1.0))
          base :+ runOnce(n)
        else base
      // ADAPTIVE RE-SAMPLE for drifty fast queries: rounds 14/15 both
      // recorded 1.8-2.1× round-over-round "regressions" on untouched
      // sub-2s queries whose sample spread was itself ~2× (JIT/machine
      // drift, not plan changes). When a fast query's spread exceeds
      // half its median, two more samples make the median a true
      // middle-of-5 — cheap (only noisy fast queries pay) and it keeps
      // cross-round ratios meaningful.
      // (widened round 16 from sub-2s to sub-5s: an afternoon of
      // co-tenant load showed the same 2-6× spreads on mid-size
      // queries — only noisy ones pay the extra samples either way)
      val samples =
        if (widened.count(_ >= 0) >= 2 && median(widened) < 5.0 &&
            median(widened) > 0 &&
            (widened.filter(_ >= 0).max - widened.filter(_ >= 0).min)
              > 0.5 * median(widened))
          widened ++ Seq(runOnce(n), runOnce(n))
        else widened
      (n, median(samples), samples.filter(_ >= 0), probeDelta(snap))
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query [min,max] sample spread, persisted so a reader can tell
    // run-to-run jitter from a real regression without a re-run (a 1.9 s
    // median whose samples span [1.4, 2.0] is noise; [1.9, 1.9] is not)
    val spread = results.map { case (k, _, ss, _) =>
      val lo = if (ss.isEmpty) -1.0 else ss.min
      val hi = if (ss.isEmpty) -1.0 else ss.max
      "\"" + k + "\":[" + lo + "," + hi + "]"
    }.mkString("{", ",", "}")
    // per-query co-tenancy record [loadavg1, other_busy_frac, steal_frac]
    // over each query's sampling window (see probe Scaladoc) — the data
    // the next round's drift adjudication reads instead of inferring
    // host load from spread uniformity
    val load = results.map { case (k, _, _, l) =>
      "\"" + k + "\":" + loadJson(l)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // MEASUREMENT-CONTRACT FIX (round 20): the driver captures only a
    // ~2000-char stdout TAIL, and the one-line JSON with 227-query
    // `queries`/`spread`/`load` maps is ~15 KB — every BENCH_r*.json
    // back to r10 holds a line truncated mid-map (`parsed: null`, so
    // PERF_r*.json never had totals or a scaling block). stdout now
    // carries a SHORT line that fits the cap; the full per-query record
    // (same fields as before, nothing removed) moves to
    // BENCH_FULL_c<cpus>.json — keyed by core count so the driver's
    // low-core scaling run stops clobbering the 32-core record.
    // A FILTERED run (SPARK_GRAFT_BENCH_ONLY) must not clobber it —
    // that record is what round-over-round comparisons read.
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"load":$load,"runs":$runs,"cpus":$cpus,"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) s"BENCH_PARTIAL_c$cpus.json"
      else s"BENCH_FULL_c$cpus.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (fullJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"cpus":$cpus,"sf":"$sfDir","detail":"$out"}""")
    spark.stop()
  }
}
