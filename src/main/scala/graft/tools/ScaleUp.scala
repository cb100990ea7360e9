package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the sf1.0 SCALE SMOKE: replicates an
  * existing testdata directory `factor`× with KEY-SHIFTED copies, so
  * join fan-outs, group cardinalities, and dedup cluster shapes grow
  * linearly the way a larger TPC-H SF does — rather than replaying
  * identical keys (which would explode join multiplicity quadratically
  * and measure the wrong thing).
  *
  * Key columns shift by `replica * 10^ceil(log10(max+1))` — disjoint
  * ranges per replica, foreign keys shifted by the SAME offset as
  * their referenced primary key so referential integrity holds within
  * each replica. Fixed-size dimensions (region, nation) stay as-is,
  * like TPC-H. Text/payload columns repeat — fine for scan/shuffle
  * scaling (compression ratios stay constant), documented caveat for
  * content-dedup operators (each replica repeats the corpus, so near-dup
  * families grow in CLUSTER SIZE not count; the scale smoke therefore
  * reads dedup timings as shuffle-volume checks, not recall checks).
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [factor=10]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <dstDir> [factor]")
    val (src, dst) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** One power-of-ten offset covering every value of `key` in df. */
    def offsetFor(df: DataFrame, key: String): Long = {
      val mx = df.agg(max(col(key))).head.getLong(0)
      var off = 1L
      while (off <= mx) off *= 10
      off
    }

    def load(t: String): DataFrame =
      spark.read.parquet(s"$src/$t.parquet")

    /** Replicate with the named key columns shifted per replica. */
    def scaled(df: DataFrame, keys: Map[String, Long]): DataFrame =
      (0 until factor).map { i =>
        keys.foldLeft(df) { case (d, (k, off)) =>
          d.withColumn(k, col(k) + lit(i * off))
        }
      }.reduce(_ unionByName _)

    def save(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      System.err.println(s"[scaleup] $t done")
    }

    val customer = load("customer"); val cOff = offsetFor(customer, "c_custkey")
    val supplier = load("supplier"); val sOff = offsetFor(supplier, "s_suppkey")
    val part = load("part"); val pOff = offsetFor(part, "p_partkey")
    val orders = load("orders"); val oOff = offsetFor(orders, "o_orderkey")
    val lineitem = load("lineitem")
    val events = load("events")
    val documents = load("documents")
    val embeddings = load("embeddings")
    val eOff = offsetFor(events, "event_id")
    val uOff = offsetFor(events, "user_id")
    val dOff = offsetFor(documents, "doc_id")
    val vOff = offsetFor(embeddings, "vec_id")

    // fixed-size dimensions copy verbatim (TPC-H shape)
    save(load("region"), "region")
    save(load("nation"), "nation")
    save(scaled(customer, Map("c_custkey" -> cOff)), "customer")
    save(scaled(supplier, Map("s_suppkey" -> sOff)), "supplier")
    save(scaled(part, Map("p_partkey" -> pOff)), "part")
    save(scaled(orders,
      Map("o_orderkey" -> oOff, "o_custkey" -> cOff)), "orders")
    save(scaled(lineitem, Map("l_orderkey" -> oOff, "l_partkey" -> pOff,
      "l_suppkey" -> sOff)), "lineitem")
    save(scaled(events,
      Map("event_id" -> eOff, "user_id" -> uOff)), "events")
    save(scaled(documents, Map("doc_id" -> dOff)), "documents")
    save(scaled(embeddings, Map("vec_id" -> vOff)), "embeddings")
    spark.stop()
  }
}
