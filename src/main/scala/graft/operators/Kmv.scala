package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketches with SET OPERATIONS — the
  * mergeable Theta-sketch workhorse (Bar-Yossef et al. 2002; the
  * DataSketches theta family): keep the k smallest hash values of a
  * key per segment, and you can (a) estimate the segment's distinct
  * count, (b) MERGE sketches across partitions/segments (union = merge
  * + truncate), and (c) estimate INTERSECTION sizes between segments
  * via the Jaccard of their union sketch — the audience-overlap
  * question HLL alone cannot answer.
  *
  * Everything here is ORACLE-REPLAYABLE, unlike the usual sketch: the
  * hash family is the repo's GF(2^61−1) polynomial (q34d/q38b — DuckDB
  * replays it with HUGEINT list_reduce), the sketch is literally "the k
  * smallest distinct hashes" (ORDER BY hash LIMIT k in SQL), and the
  * estimators are one or two IEEE double operations in a fixed order —
  * so even the float estimates hash-match cross-engine (q115/q115b).
  *
  * 100 TB shape: one hash shuffle for the per-group distinct, then a
  * rank-limited window on the group key (WindowGroupLimit keeps the
  * sort partial — the k smallest survive per partition before the
  * final merge) and a collect on the SAME group key. Sketch size is
  * O(k) per segment regardless of cardinality; unions/intersections
  * are array ops over k-bounded sketches — result-sized, never
  * data-sized.
  */
object Kmv {

  /** Affine finalizer over GF(2^61−1): the polynomial string hash is
    * fine for EQUALITY (minhash/fingerprints) but its small-value tail
    * is lattice-structured for short keys, which wrecks the MINIMUM
    * order statistics KMV lives on (a 4-digit key's hash is a sparse
    * combination of p³·digit terms). One multiplicative scatter fixes
    * it — and stays one HUGEINT expression in the SQL oracle.
    */
  private val FinA = 1250284240999530269L
  private val FinB = 558566537817138577L

  /** Scalar form of the finalized 61-bit key hash. */
  def hash61Value(s: String): Long =
    (Mod61.mulMod(Mod61.hashString(s), FinA) + FinB) % Mod61.MOD

  private val hashUdf = udf { (s: String) =>
    if (s == null) null else java.lang.Long.valueOf(hash61Value(s))
  }

  /** Hash a key column into the oracle 61-bit family (via its string
    * form, the cross-engine convention), finalized for uniformity.
    */
  def hash61(key: Column): Column = hashUdf(key.cast("string"))

  /** One KMV sketch row per group: `kmv` = the k smallest DISTINCT
    * hash values of `keyCol`, ascending. A group with fewer than k
    * distinct keys keeps them all (the estimate is then exact).
    */
  def sketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k=$k: a KMV sketch needs at least 2 slots")
    val gs = groupCols.map(col)
    val hashed = df
      .select(gs :+ hash61(col(keyCol)).as("__h"): _*)
      .filter(col("__h").isNotNull)
      .distinct()
    val w = Window.partitionBy(gs: _*).orderBy(col("__h"))
    hashed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(gs: _*)
      .agg(sort_array(collect_list(col("__h"))).as("kmv"))
  }

  /** Distinct-count estimate from a sketch array: exact (= size) when
    * the sketch is under-full; otherwise (k−1)·M / kth-smallest — the
    * standard KMV estimator over hashes uniform in [0, M). Two IEEE
    * ops in a fixed order, mirrored verbatim by the SQL oracle.
    */
  def estimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(
        lit((k - 1).toDouble) * lit(Mod61.MOD.toDouble) /
          element_at(kmv, k).cast("double"))

  /** Scalar twin of [[estimate]] for driver-side / stream-state use
    * (identical arithmetic, identical value).
    */
  def estimateValue(kmv: Array[Long], k: Int): Double =
    if (kmv.length < k) kmv.length.toDouble
    else (k - 1).toDouble * Mod61.MOD.toDouble / kmv(k - 1).toDouble

  /** Typed KMV aggregator for the SQL surface (`kmv_sketch(key)` in
    * GROUP BY): the per-partition buffer IS the sketch (sorted, ≤ k),
    * merge is the union rule — same arrays the [[sketch]] operator
    * builds, so SQL-surface sketches compose with [[estimate]]/
    * [[union]]/[[jaccard]] and with the streaming state.
    */
  def sketchAggregator(k: Int)
      : org.apache.spark.sql.expressions.Aggregator[String, Array[Long], Array[Long]] = {
    require(k >= 2)
    new org.apache.spark.sql.expressions.Aggregator[String, Array[Long], Array[Long]] {
      def zero: Array[Long] = Array.empty[Long]
      def reduce(b: Array[Long], key: String): Array[Long] =
        if (key == null) b
        else {
          val h = hash61Value(key)
          if (b.length >= k && h >= b(b.length - 1)) b
          else if (java.util.Arrays.binarySearch(b, h) >= 0) b
          else {
            val nb = (b :+ h).sorted
            if (nb.length > k) nb.take(k) else nb
          }
        }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] =
        (a ++ b).distinct.sorted.take(k)
      def finish(a: Array[Long]): Array[Long] = a
      def bufferEncoder =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      def outputEncoder =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
  }

  /** Union sketch of two sketches (merge, dedup, keep k smallest) —
    * the mergeability that lets per-partition / per-day sketches roll
    * up without touching raw data again.
    */
  def union(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Roll an ARRAY-of-sketches column up into one sketch (k smallest
    * of the union) — the hierarchical merge that turns per-partition /
    * per-day / per-nation sketches into coarser segments without ever
    * re-touching raw data. Union is associative and commutative, so the
    * result is independent of collection order.
    */
  def unionAll(sketches: Column, k: Int): Column =
    slice(array_sort(array_distinct(flatten(sketches))), 1, k)

  /** Jaccard estimate between two sketched segments: the fraction of
    * the union sketch's values present in BOTH input sketches (the
    * standard KMV set-operation rule — only values below the union's
    * k-th threshold vote).
    */
  def jaccard(a: Column, b: Column, k: Int): Column = {
    val u = union(a, b, k)
    size(array_intersect(array_intersect(u, a), b)).cast("double") /
      size(u).cast("double")
  }

  /** Intersection-size estimate: jaccard × union estimate. */
  def intersectEstimate(a: Column, b: Column, k: Int): Column =
    jaccard(a, b, k) * estimate(union(a, b, k), k)
}
