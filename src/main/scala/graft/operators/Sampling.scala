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

  /** Deterministic WEIGHTED SOURCE MIXING — the "data mixture" step of
    * a pretraining pipeline: each source (domain, dump, corpus shard)
    * is downsampled to its mixture weight, with membership a pure
    * function of the row key, so the same key survives in every table
    * and on every run regardless of partitioning.
    *
    * Membership: the first 8 hex chars of `md5("<key>:<seed>")`
    * compared against the weight's hex threshold
    * (`floor(weight · 16^8)` zero-padded) — lowercase-hex string order
    * IS numeric order, and md5 hex is identical in every engine, so
    * the decision is portable to plain SQL (unlike xxhash64, which has
    * no cross-engine twin). Per-row cost is one md5 over a short key —
    * fine for a curation pass; use [[byKeyHash]] when portability
    * doesn't matter and the hash is on the hot path.
    *
    * Sources absent from `weights` get `defaultWeight` (1.0 keeps
    * them whole).
    */
  def weightedBySource(df: DataFrame, sourceCol: String, keyCol: String,
      weights: Map[String, Double], seed: Long = 0L,
      defaultWeight: Double = 1.0): DataFrame = {
    (weights.values ++ Seq(defaultWeight)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"weight $f must be in [0,1]"))
    val h = substring(
      md5(concat(col(keyCol).cast("string"), lit(":" + seed))), 1, 8)
    def keep(f: Double): Column =
      if (f >= 1.0) lit(true)
      else if (f <= 0.0) lit(false)
      else h < lit(f"${(f * 4294967296.0).toLong}%08x")
    val cond = weights.toSeq.sortBy(_._1)
      .foldLeft(null: Column) { case (acc, (s, f)) =>
        val branch = col(sourceCol) === s
        if (acc == null) when(branch, keep(f)) else acc.when(branch, keep(f))
      } match {
      case null => keep(defaultWeight)
      case w => w.otherwise(keep(defaultWeight))
    }
    df.filter(cond)
  }

  /** Deterministic EPOCH SHUFFLE — the training-order step: a
    * pseudorandom total order over the corpus that is a pure function
    * of (key, epoch), so every run, every partitioning, and every
    * engine derives the same order, and each epoch gets a fresh
    * permutation.
    *
    * No global sort appears at any scale: the md5 of "<key>:<epoch>"
    * yields a bucket (first two hex nibbles → 0..255) and rows are
    * ranked only WITHIN their bucket (window partitions bounded at
    * ~corpus/256); `shuffle_pos = rank·256 + bucket` interleaves the
    * buckets into one strictly-ordered key. Positions are sparse
    * (buckets differ in size) — consumers sort by `shuffle_pos`, they
    * don't index by it. All string/integer math (md5 hex, instr,
    * row_number), portable to plain SQL — fully oracled (q84).
    */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int): DataFrame = {
    val h = md5(concat(col(keyCol).cast("string"), lit(":" + epoch)))
    df.select(col(keyCol).as("doc_id"), h.as("__hx"))
      .withColumn("bucket",
        conv(substring(col("__hx"), 1, 2), 16, 10).cast("int"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("__hx"), col("doc_id"))))
      .select(col("doc_id"), col("bucket"),
        (col("__rk") - 1).cast("long").as("rank_in_bucket"),
        ((col("__rk") - 1) * 256 + col("bucket")).cast("long").as("shuffle_pos"))
  }

  /** Train/validation/test split tag as a pure function of the key:
    * stable across runs and tables. Fractions must sum to ≤ 1; the
    * remainder is "train".
    */
  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    * "Weighted random sampling with a reservoir", IPL 2006): each row
    * draws `u ∈ (0,1)` and competes with priority `u^(1/w)`; the k
    * largest priorities are EXACTLY a weighted sample without
    * replacement. The draw is DETERMINISTIC — `u` comes from the md5
    * of `key:seed` (the [[weightedBySource]] portability argument:
    * md5 is identical in every engine and independent of partitioning),
    * so the same keys win on every run, at any partitioning, across
    * every table sharing the key.
    *
    * This is the data-mixing primitive [[weightedBySource]] cannot
    * express: an EXACT budget `k` with inclusion probability
    * proportional to per-row weight (quality score, token count,
    * source multiplier), not an expected fraction per source.
    *
    * Scale shape: priority is map-only column work; selection is a
    * global TakeOrdered top-k (never a full sort); ascending tie-break
    * on the key makes the result total-order stable. Weights must be
    * strictly positive.
    */
  def weightedSampleExact(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 0, s"k=$k must be >= 0")
    // u from the first 12 md5 hex digits: 48 uniform bits, exact in a
    // double, never 0 (we add 1) so ln/pow stay finite
    val u = (conv(substring(md5(concat(col(keyCol).cast("string"),
        lit(":" + seed))), 1, 12), 16, 10).cast("double") + 1.0) /
      lit(281474976710656.0) // 2^48
    val priority = pow(u, lit(1.0) / col(weightCol).cast("double"))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_aes_priority", priority)
      .orderBy(col("_aes_priority").desc, col(keyCol))
      .limit(k)
      .drop("_aes_priority")
  }

  /** Fully-ORACLED A-ES variant: [[weightedSampleExact]] with weights
    * restricted to powers of two in [1, 64], which makes the float
    * priority itself bit-exact cross-engine. General `pow(u, 1/w)` is
    * only 1-ulp-accurate and library-dependent — un-oracleable — but
    * `u^(1/2^j)` is j iterated `sqrt` calls, and IEEE-754 requires
    * sqrt to be CORRECTLY rounded, so any engine composing the same
    * sqrt chain produces the identical double. u is exact by
    * construction (48 md5 bits scaled by 2⁻⁴⁸). Weights outside the
    * allowed set raise at runtime (no silent drop — this variant's
    * whole point is replayability). Output = input columns plus the
    * `priority` double; selection is the same TakeOrdered top-k.
    */
  def weightedSamplePow2(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 0, s"k=$k must be >= 0")
    val u = (conv(substring(md5(concat(col(keyCol).cast("string"),
        lit(":" + seed))), 1, 12), 16, 10).cast("double") + 1.0) /
      lit(281474976710656.0) // 2^48
    // match on the DOUBLE value, not a truncating int cast: a
    // fractional weight like 2.5 must fall through to the raise, not
    // silently sample as weight 2
    val wcol = col(weightCol).cast("double")
    val priority = Seq(1, 2, 4, 8, 16, 32, 64)
      .foldLeft(null: Column) { (acc, wv) =>
        val p = (0 until Integer.numberOfTrailingZeros(wv))
          .foldLeft(u)((c, _) => sqrt(c))
        if (acc == null) when(wcol === wv, p) else acc.when(wcol === wv, p)
      }
      .otherwise(raise_error(concat(
        lit("weightedSamplePow2: weight must be a power of two in " +
          "[1, 64], got "), col(weightCol).cast("string"))))
    df.withColumn("priority", priority)
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)
  }

  /** PER-GROUP exact-budget weighted sampling — the "k docs per domain,
    * weight-biased" curation quota: [[weightedSamplePow2]]'s replayable
    * priorities ranked WITHIN each group (one shuffle on the group key,
    * WindowGroupLimit keeps the sort partial), so every group gets
    * exactly min(k, |group|) rows with inclusion odds ∝ weight. Fully
    * oracled for power-of-two weights like the global variant.
    */
  def weightedSamplePow2PerGroup(df: DataFrame, groupCols: Seq[String],
      keyCol: String, weightCol: String, kPerGroup: Int,
      seed: Long = 0L): DataFrame = {
    require(kPerGroup >= 1, s"kPerGroup=$kPerGroup must be >= 1")
    val u = (conv(substring(md5(concat(col(keyCol).cast("string"),
        lit(":" + seed))), 1, 12), 16, 10).cast("double") + 1.0) /
      lit(281474976710656.0)
    // match on the DOUBLE value, not a truncating int cast: a
    // fractional weight like 2.5 must fall through to the raise, not
    // silently sample as weight 2
    val wcol = col(weightCol).cast("double")
    val priority = Seq(1, 2, 4, 8, 16, 32, 64)
      .foldLeft(null: Column) { (acc, wv) =>
        val p = (0 until Integer.numberOfTrailingZeros(wv))
          .foldLeft(u)((c, _) => sqrt(c))
        if (acc == null) when(wcol === wv, p) else acc.when(wcol === wv, p)
      }
      .otherwise(raise_error(concat(
        lit("weightedSamplePow2PerGroup: weight must be a power of two " +
          "in [1, 64], got "), col(weightCol).cast("string"))))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("priority").desc, col(keyCol))
    df.withColumn("priority", priority)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= kPerGroup)
      .drop("__rn")
  }

  def splitTag(keyCol: Column, valFraction: Double, testFraction: Double,
      seed: Long = 0L): Column = {
    require(valFraction + testFraction <= 1.0, "fractions must sum to <= 1")
    val buckets = 1000000L
    val h = pmod(xxhash64(keyCol, lit(seed)), lit(buckets))
    when(h < (lit(testFraction) * buckets).cast("long"), "test")
      .when(h < (lit(testFraction + valFraction) * buckets).cast("long"), "val")
      .otherwise("train")
  }

  /** [[splitTag]]'s fully-ORACLED twin, generalized to any split list:
    * deterministic leakage-safe split assignment — every row sharing
    * `keyCol` (a dedup-cluster canonical, an exact-dup digest, a
    * document family id) lands in the SAME split BY CONSTRUCTION, the
    * property that keeps near-duplicates of a training document out of
    * the eval split. `splits` are (name, permille) summing to 1000.
    *
    * Determinism contract: the 48-bit uniform comes from
    * md5(key:seed) (identical in every engine, independent of
    * partitioning — the [[weightedSampleExact]] portability argument)
    * and split boundaries are INTEGER thresholds
    * floor(2^48·cum/1000), so assignment replays bit-exactly in SQL —
    * unlike [[splitTag]]'s xxhash64, which DuckDB lacks (rows-only).
    * Map-only column work; no shuffle.
    */
  def splitByKey(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)], seed: Long = 0L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      splits.map(_._2).sum == 1000,
      s"split permilles must be positive and sum to 1000: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"duplicate split names: $splits")
    require(!df.columns.contains("split"),
      "input already has a 'split' column; rename it first")
    val u = conv(substring(md5(concat(col(keyCol).cast("string"),
        lit(":" + seed))), 1, 12), 16, 10).cast("long")
    val cum = splits.map(_._2).scanLeft(0)(_ + _).tail
    val named = splits.map(_._1).zip(cum)
    val head = named.init.foldLeft(null: Column) { case (acc, (name, c)) =>
      val hi = (281474976710656L * c) / 1000L // floor(2^48·cum/1000)
      if (acc == null) when(u < hi, name) else acc.when(u < hi, name)
    }
    val split =
      if (head == null) lit(named.last._1)
      else head.otherwise(named.last._1)
    df.withColumn("split", split)
  }
}
