package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory for the graft engine.
  *
  * Mirrors the role of dozer's orchestrator bootstrap
  * (reference: dozer-cli/src/simple/orchestrator.rs:77) but Spark-first:
  * one `SparkSession` with AQE on, UTC, and the graft scalar-function
  * parity layer registered (see [[graft.functions.GraftFunctions]]).
  *
  * Scale notes (100 TB / 1000-executor target):
  *  - AQE handles runtime shuffle-partition coalescing and skew joins, so
  *    `spark.sql.shuffle.partitions` is only an upper bound locally.
  *  - `autoBroadcastJoinThreshold` stays at Spark's default; dimension
  *    tables (region/nation/supplier/part at TPC-H ratios) broadcast
  *    automatically, and [[Tables]] marks them explicitly too.
  */
object GraftSession {

  /** Build (or reuse) a configured session and register graft functions. */
  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata events.parquet stores TIMESTAMP(NANOS); Spark reads it as
      // LongType under this flag and Tables.load converts to µs timestamps
      // (values are whole µs, so the truncation is lossless — TESTDATA.md).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    configure(spark)
  }

  /** Idempotently registers the engine's SQL surface on an existing session
    * (used by Verify/Bench, which build their own sessions, and by tests).
    */
  def configure(spark: SparkSession): SparkSession = {
    graft.functions.GraftFunctions.registerAll(spark)
    // same rule the extension injects, for sessions built without
    // spark.sql.extensions (Verify/Bench/tests)
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.RewriteRangeJoin]))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.RewriteRangeJoin(spark))
    spark
  }
}

/** Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Sources in dozer are connector-introspected schemas
  * (reference: dozer-ingestion/connector/src/lib.rs:83-86); here the
  * parquet footer is the schema and Catalyst prunes columns/pushes
  * predicates into the scan automatically.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should broadcast in joins at any SF:
    * region (5 rows) and nation (25 rows) are constant-size in TPC-H.
    */
  val broadcastable: Set[String] = Set("region", "nation")

  /** Columns stored as TIMESTAMP(NANOS) in the driver's parquet; Spark
    * surfaces them as LongType (nanosAsLong) and we restore µs timestamps.
    */
  private val nanoTsColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    nanoTsColumns.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      if (df.schema(c).dataType == org.apache.spark.sql.types.LongType)
        // integer `div`, NOT `/`: double division loses µs precision on
        // nano epochs (~1.7e18 > 2^53)
        df.withColumn(c,
          org.apache.spark.sql.functions.expr(s"timestamp_micros($c div 1000)"))
      else df
    }
  }

  /** Register every table as a temp view (for spark.sql / GraftSqlRunner). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach { t =>
      load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
