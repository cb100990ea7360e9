package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for registry queries.
  * Usage: runMain graft.tools.Explain <sfDir> <queryName>...
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)
    // "-run" prints the FINAL adaptive plan after execution (AQE's
    // exchange reuse / coalescing / join demotions only show there)
    val run = names.contains("-run")
    names.filter(_ != "-run").foreach { n =>
      println(s"========== $n ==========")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      if (run) {
        // collect() drives THIS Dataset's QueryExecution (a write would
        // clone the plan and leave this one un-finalized)
        df.collect()
        println(s"---------- $n (executed, final adaptive plan) ----------")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
