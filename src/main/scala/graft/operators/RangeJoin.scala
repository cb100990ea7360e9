package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join — the missing-in-OSS-Spark join shape.
  *
  * A join whose only condition is a range predicate
  * (`l.point >= r.start AND l.point < r.end` — half-open, see
  * [[pointInInterval]]) has no equi keys, so Catalyst plans a
  * nested-loop join: O(|L|·|R|) comparisons, broadcast or cartesian.
  * The reference engine's interval-bounded joins (TTL windows,
  * dozer-sql JOIN with time bounds) and common analytics shapes
  * (IP-to-range lookup, price-band matching, event-to-window
  * attribution) all hit this wall at scale.
  *
  * The classic fix is binning: quantize the domain into fixed-width
  * bins, explode each interval onto the bins it covers, tag each point
  * with its single bin, equi-join on the bin id, and re-check the exact
  * range as a residual filter. Each qualifying (point, interval) pair
  * meets exactly once — in the point's bin — so no dedup is needed.
  * Cost: O(|L| + |R|·(len/binWidth)) shuffled rows into one hash join;
  * AQE's skew handling covers hot bins.
  *
  * Pick `binWidth` near the median interval length: much smaller
  * multiplies the interval replication factor; much larger degrades
  * toward per-bin nested loops.
  *
  * [[graft.plans.RewriteRangeJoin]] applies the same binning
  * automatically (as a Catalyst optimizer rule) to qualifying
  * nested-loop range joins when `spark.graft.rangeJoin.binWidth` is
  * set — there it preserves whatever bound strictness the original
  * predicate used (the original condition stays as the residual),
  * while this explicit operator is fixed to half-open `[start, end)`.
  */
object RangeJoin {

  /** Inner join of `left` points into `right` intervals:
    * keeps (l, r) pairs with `l.point ∈ [r.start, r.end)`.
    * Column names must be disjoint across the two sides.
    */
  def pointInInterval(
      left: DataFrame, pointCol: String,
      right: DataFrame, startCol: String, endCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty,
      s"left and right share columns ${overlap.mkString(", ")}")
    val lb = left.withColumn("__graft_bin",
      floor(col(pointCol).cast("double") / binWidth).cast("long"))
    val rb = right
      // empty/degenerate intervals can't match and would make
      // sequence() run backwards
      .filter(col(startCol) <= col(endCol))
      .withColumn("__graft_bin", explode(sequence(
        floor(col(startCol).cast("double") / binWidth).cast("long"),
        floor(col(endCol).cast("double") / binWidth).cast("long"))))
    lb.join(rb, Seq("__graft_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__graft_bin")
  }
}
