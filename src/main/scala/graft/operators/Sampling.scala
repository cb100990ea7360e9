package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `sample(fraction)` on a DataFrame is partition-dependent (a
  * repartition changes the kept set) and row-independent (two tables
  * sampled separately lose referential integrity). Pipelines need the
  * opposite: the SAME key must be kept or dropped everywhere, on every
  * run, at any partitioning — so membership is a pure function of the
  * key hash. This is how large corpus curation splits train/val and
  * downsamples sources consistently across document/embedding/metadata
  * tables.
  */
object Sampling {

  /** Keep rows whose key hashes into the lowest `fraction` of the hash
    * space: membership is deterministic, partition-independent, and
    * identical across any table sharing the key. `seed` decorrelates
    * independent sampling decisions over the same keys.
    */
  def byKeyHash(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 0L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    val buckets = 1000000L
    df.filter(
      pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets)) <
        (lit(fraction) * buckets).cast("long"))
  }

  /** Exactly `n` rows per stratum, chosen deterministically by
    * `orderCol` (ties broken by it being unique, e.g. a primary key) —
    * one shuffle on the stratum key, rank-limited per group (Spark's
    * WindowGroupLimit keeps the sort partial).
    */
  def stratifiedExact(df: DataFrame, strataCol: String, orderCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Train/validation/test split tag as a pure function of the key:
    * stable across runs and tables. Fractions must sum to ≤ 1; the
    * remainder is "train".
    */
  def splitTag(keyCol: Column, valFraction: Double, testFraction: Double,
      seed: Long = 0L): Column = {
    require(valFraction + testFraction <= 1.0, "fractions must sum to <= 1")
    val buckets = 1000000L
    val h = pmod(xxhash64(keyCol, lit(seed)), lit(buckets))
    when(h < (lit(testFraction) * buckets).cast("long"), "test")
      .when(h < (lit(testFraction + valFraction) * buckets).cast("long"), "val")
      .otherwise("train")
  }
}
