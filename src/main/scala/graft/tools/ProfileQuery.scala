package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool (guide §1: measure first): run registry queries under a
  * SparkListener and print a per-job / per-stage breakdown — wall time,
  * executor CPU, shuffle bytes — so optimization targets the measured
  * hotspot, not a guess. Mirrors Bench's method (noop sink, same
  * session config) so numbers are comparable with BENCH_FULL_c<cpus>.json.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   runMain graft.tools.ProfileQuery <queryName>... [-runs N]
  */
object ProfileQuery {

  private final case class StageRec(
      name: String, var wallMs: Long = 0, var cpuNs: Long = 0,
      var runNs: Long = 0, var tasks: Int = 0,
      var shufReadB: Long = 0, var shufWriteB: Long = 0,
      var inputB: Long = 0, var spillB: Long = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runsIdx = args.indexOf("-runs")
    val runs = if (runsIdx >= 0) args(runsIdx + 1).toInt else 2
    val names =
      args.filterNot(_ == "-runs").filterNot(a => runsIdx >= 0 && a == args(runsIdx + 1))
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // static conf, set at creation (rationale: GraftSession.create);
      // keeps this tool's numbers comparable with Bench's
      .config("spark.sql.codegen.cache.maxEntries", "4096")
    // A/B config experiments: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foldLeft(b0) { (b, kv) =>
        val i = kv.indexOf('=')
        b.config(kv.take(i), kv.drop(i + 1))
      }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)

    val jobs = mutable.LinkedHashMap[Int, (String, Long, Long)]() // id -> (desc, start, end)
    val stages = mutable.LinkedHashMap[Int, StageRec]()
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (collecting) {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized { jobs(e.jobId) = (desc, e.time, 0L) }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (collecting) {
        jobs.synchronized {
          jobs.get(e.jobId).foreach { case (d, s, _) => jobs(e.jobId) = (d, s, e.time) }
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = if (collecting) {
        val si = e.stageInfo
        // attribute the stage to the first graft frame in its call site
        // (si.details is the submitting stack trace)
        val site = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("ProfileQuery"))
          .map(_.trim.stripPrefix("at ").takeWhile(_ != ')') + ")")
          .getOrElse(si.name)
        val r = stages.synchronized {
          stages.getOrElseUpdate(si.stageId, StageRec(site))
        }
        r.wallMs += si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        r.tasks += si.numTasks
        val m = si.taskMetrics
        if (m != null) {
          r.cpuNs += m.executorCpuTime
          r.runNs += m.executorRunTime * 1000000L
          r.shufReadB += m.shuffleReadMetrics.totalBytesRead
          r.shufWriteB += m.shuffleWriteMetrics.bytesWritten
          r.inputB += m.inputMetrics.bytesRead
          r.spillB += m.memoryBytesSpilled
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      val run = () => {
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      // warmup (codegen/JIT/footer caches) — matches Bench's method
      run()
      spark.sharedState.cacheManager.clearCache()
      spark.streams.active.foreach(_.stop())
      System.gc()
      jobs.clear(); stages.clear()
      collecting = true
      def statSnap(): (Long, Long) = try {
        val st = scala.io.Source.fromFile("/proc/stat")
        val f = try st.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        finally st.close()
        (f.sum, if (f.length > 7) f(7) else 0L)
      } catch { case _: Exception => (-1L, 0L) }
      val snap0 = statSnap()
      val t0 = System.nanoTime()
      (1 to runs).foreach { _ =>
        run()
        spark.sharedState.cacheManager.clearCache()
        spark.streams.active.foreach(_.stop())
      }
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      val loadLine = try {
        val snap1 = statSnap()
        val la = scala.io.Source.fromFile("/proc/loadavg")
        val l1 = try la.mkString.trim.split("\\s+")(0) finally la.close()
        val steal =
          if (snap0._1 < 0 || snap1._1 < 0) -1.0
          else (snap1._2 - snap0._2).toDouble /
            math.max(1L, snap1._1 - snap0._1)
        f"load1=$l1 steal=$steal%.3f"
      } catch { case _: Exception => "probe-failed" }
      println(s"\n===== $n  wall=${f"$wall%.2f"}s over $runs runs " +
        s"(${f"${wall / runs}%.2f"}s/run) [$loadLine] =====")
      val js = jobs.synchronized(jobs.toSeq)
      println(s"-- jobs: ${js.size} (${js.size / runs}/run)")
      js.groupBy(_._2._1).map { case (desc, g) =>
        (desc, g.map(j => j._2._3 - j._2._2).sum, g.size)
      }.toSeq.sortBy(-_._2).take(20).foreach { case (desc, ms, cnt) =>
        println(f"  ${ms / 1000.0}%7.2fs  n=$cnt%-4d ${desc.take(90)}")
      }
      println("-- stage groups by wall (site, n stages):")
      stages.synchronized(stages.values.toSeq).groupBy(_.name).map {
        case (site, g) =>
          val t = StageRec(site)
          g.foreach { s =>
            t.wallMs += s.wallMs; t.cpuNs += s.cpuNs; t.runNs += s.runNs
            t.tasks += s.tasks; t.shufReadB += s.shufReadB
            t.shufWriteB += s.shufWriteB; t.inputB += s.inputB
            t.spillB += s.spillB
          }
          (t, g.size)
      }.toSeq.sortBy(-_._1.wallMs).take(25).foreach { case (s, cnt) =>
        println(f"  ${s.wallMs / 1000.0}%7.2fs cpu=${s.cpuNs / 1e9}%6.2fs " +
          f"run=${s.runNs / 1e9}%6.2fs stages=$cnt%-3d tasks=${s.tasks}%-5d " +
          f"in=${s.inputB / 1048576.0}%6.1fM sr=${s.shufReadB / 1048576.0}%5.1fM " +
          f"sw=${s.shufWriteB / 1048576.0}%5.1fM " +
          s"${s.name.take(80)}")
      }
    }
    spark.stop()
  }
}
