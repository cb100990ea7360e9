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

  /** Per-node TRIANGLE counts over the undirected simple graph induced
    * by `edges` (direction, duplicates, and self-loops are normalized
    * away) — the clustering-coefficient numerator, a standard
    * link-spam / community-density signal on host graphs (spam farms
    * show abnormal triangle density next to their PageRank).
    *
    * Algorithm: degree-ORIENTED wedge closing (the compact-forward /
    * node-iterator++ scheme): orient each undirected edge from the
    * (degree, id)-smaller endpoint to the larger, form wedges u→v→w,
    * and close them against oriented edges u→w. Each triangle is found
    * exactly once, and — the scale property — every node's oriented
    * out-degree is O(√m) on any graph, so wedge fan-out is bounded even
    * on power-law host graphs where a hub's undirected degree is
    * millions (the naive all-wedges join explodes exactly there).
    * Two self-joins hash-partitioned on node keys; all integers, so
    * the whole computation replays exactly in SQL.
    *
    * Output: `(node, n_triangles BIGINT)` for every node of the graph
    * (0 when the node closes none).
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val src = col(srcCol)
    val dst = col(dstCol)
    // canonical undirected simple edges: (lo, hi), lo < hi, distinct
    val und = edges
      .select(least(src, dst).as("lo"), greatest(src, dst).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = und.select(col("lo").as("node"))
      .unionByName(und.select(col("hi").as("node"))).distinct()
    val deg = und.select(col("lo").as("node"))
      .unionByName(und.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient from (deg, id)-smaller endpoint to larger
    val withDeg = und
      .join(deg.select(col("node").as("lo"), col("deg").as("dlo")), "lo")
      .join(deg.select(col("node").as("hi"), col("deg").as("dhi")), "hi")
    val oriented = withDeg.select(
        when(col("dlo") < col("dhi") ||
            (col("dlo") === col("dhi") && col("lo") < col("hi")),
          struct(col("lo").as("a"), col("hi").as("b")))
          .otherwise(struct(col("hi").as("a"), col("lo").as("b")))
          .as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges a→b→c closed by a→c
    val e1 = oriented.select(col("a").as("u"), col("b").as("v"))
    val e2 = oriented.select(col("a").as("v"), col("b").as("w"))
    val e3 = oriented.select(col("a").as("u"), col("b").as("w"))
    val tris = e1.join(e2, "v").join(e3, Seq("u", "w"))
      .select(col("u"), col("v"), col("w"))
    val perNode = tris.select(explode(array(col("u"), col("v"), col("w")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    nodes.join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
