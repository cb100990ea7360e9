package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph PageRank for crawl curation — the domain-authority signal
  * web-scale corpus pipelines rank and threshold on (Common-Crawl-style
  * host ranking; the quality companion to [[TextOps.domainFilter]]'s
  * blocklist gate: keep/weight documents by their host's link
  * authority).
  *
  * Computed in INTEGER FIXED POINT so the whole computation is exact
  * and engine-independent: ranks are micro-units of `scale`, each
  * iteration is
  *
  *   r'(v) = ((100 − d)·(scale div N)) div 100
  *         + (d · Σ_{(u,v)∈E} (r(u) div deg(u))) div 100
  *
  * — integer divisions floor, integer sums are shuffle-order-proof, so
  * (unlike float PageRank, whose per-node sums depend on reduce order)
  * the result replays bit-exactly in SQL and across cluster sizes.
  * Documented fixed-point semantics: flooring loses ≤1 micro-unit per
  * edge per iteration, dangling-node mass is dropped (the standard
  * simplification), and `scale` must be ≥ N × desired precision (pick
  * 1e15 for a 1e9-host graph).
  *
  * 100 TB shape: one out-degree aggregation, then per iteration ONE
  * join of the edge list with the rank vector on the source key and ONE
  * sum shuffle on the destination key — both hash-partitioned on node
  * ids, the classic message-passing shape (same as [[Dedup]]'s
  * hash-min connected components). The edge+degree table is persisted
  * across iterations; ranks are O(N) rows. Iterations are a fixed
  * small count (authority ordering stabilizes in a handful of rounds —
  * the curation use case thresholds/ranks, it does not need 1e-9
  * convergence).
  */
object GraphRank {

  /** PageRank over `edges` (srcCol, dstCol node ids, any type; self
    * -loops allowed and counted in the out-degree). Returns one row per
    * node: `(node, rank_int BIGINT)` in micro-units of `scale`.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of range")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct=$dampingPct out of range")
    require(scale >= 1L, "scale must be positive")
    val src = col(srcCol)
    val dst = col(dstCol)
    val nodes = edges.select(src.as("node"))
      .unionByName(edges.select(dst.as("node")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // driver-side long: sizes the base share
    require(n > 0, "empty graph")
    val init = scale / n
    val base = ((100L - dampingPct) * init) / 100L
    val withDeg = edges
      .join(edges.groupBy(src.as("__s")).agg(count(lit(1)).as("__deg")),
        src === col("__s"))
      .select(src.as("__src"), dst.as("__dst"), col("__deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var r = nodes.select(col("node"), lit(init).as("rank_int"))
    (1 to iters).foreach { _ =>
      // `div` (true integer division), NOT `/`: Spark's `/` on longs
      // produces a rounded double, and floor-of-rounded is off by one
      // precisely when rank is large and degree high — the exactness
      // this operator exists for
      val sums = withDeg
        .join(r, col("__src") === col("node"))
        .select(col("__dst"), expr("rank_int div __deg").as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__in"))
      r = nodes.join(sums, col("node") === col("__dst"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"(${dampingPct}L * coalesce(__in, 0L)) div 100"))
            .as("rank_int"))
    }
    r
  }
}
