package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling — select raw-corpus documents whose
  * hashed n-gram distribution looks like a target corpus (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"; the standard pretraining-data curation move). The
  * reference engine has no analogue — this is part of the
  * training-data-pipeline surface the engine adds on top of SURVEY §2.
  *
  * Model: hashed bag of unigrams+bigrams into `dim` buckets; bucket
  * log-ratios lambda_b = log p_target(b) - log p_raw(b) with add-1
  * smoothing. A document's log importance weight is the sum of its
  * feature buckets' lambdas.
  *
  * Scale shape: training is two dim-bounded aggregations (one shuffle
  * each over bucket ids — dim keys, not corpus keys); the fitted model
  * is O(dim) doubles and rides into the scoring plan as a foldable
  * literal array, so scoring is a map-only pass — no shuffle, no state,
  * embarrassingly parallel at 100 TB. Selection is a TakeOrdered top-k,
  * never a full sort at the driver.
  */
object Dsir {

  /** Bucket of one feature string — bit-identical to Spark's
    * `pmod(hash(s), dim)` (murmur3 over UTF8 bytes, seed 42), so SQL
    * formulations and the kernel agree; the closed-form spec asserts
    * the equivalence.
    */
  def bucketOf(s: String, dim: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType, 42L).toInt
    ((h % dim) + dim) % dim
  }

  private def tokenize(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  /** Unigram + bigram feature buckets of a document — row-local UDF
    * kernel. The builtin-HOF formulation (transform/zip_with/concat_ws
    * over split) runs interpreted per element and measured 1.8x slower
    * end-to-end on q79 (2.30 s vs 1.28 s at sf0.1, median of 2) — the
    * q53 text-metrics trap again (HOFs are not codegen'd).
    */
  def featureBucketsUdf(dim: Int) = udf { (text: String) =>
    if (text == null) null
    else {
      val toks = tokenize(text)
      val out = new Array[Int](math.max(2 * toks.length - 1, 0))
      var i = 0
      while (i < toks.length) {
        out(i) = bucketOf(toks(i), dim)
        if (i > 0) out(toks.length + i - 1) =
          bucketOf(toks(i - 1) + " " + toks(i), dim)
        i += 1
      }
      out
    }
  }

  /** Per-bucket feature-instance counts of a corpus (dim-keyed shuffle). */
  private def bucketCounts(df: DataFrame, textCol: String, dim: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(featureBucketsUdf(dim)(col(textCol))).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))

  /** Fit bucket log-ratios from a target corpus and the raw corpus.
    * Returns a dense Array[Double] of length `dim` — a model, not data.
    */
  def fitLogRatios(target: DataFrame, raw: DataFrame, textCol: String,
      dim: Int): Array[Double] = {
    require(dim >= 2, s"dim=$dim must be >= 2")
    val t = bucketCounts(target, textCol, dim).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val r = bucketCounts(raw, textCol, dim).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val tTot = t.values.sum.toDouble + dim
    val rTot = r.values.sum.toDouble + dim
    Array.tabulate(dim) { b =>
      math.log((t.getOrElse(b, 0L) + 1.0) / tTot) -
        math.log((r.getOrElse(b, 0L) + 1.0) / rTot)
    }
  }

  /** Score documents with fitted log-ratios: (idCol.., n_features,
    * log_weight). NULL-text rows are dropped (per-doc kernel contract).
    * Map-only — the model is a foldable literal array.
    */
  def scoreLogWeights(df: DataFrame, idCol: String, textCol: String,
      logRatios: Array[Double]): DataFrame = {
    val dim = logRatios.length
    // one row-local kernel: no intermediate bucket array, no HOF — the
    // model rides in the UDF closure (dim doubles per task)
    val scoreU = udf { (text: String) =>
      if (text == null) null
      else {
        val toks = tokenize(text)
        var sum = 0.0
        var i = 0
        while (i < toks.length) {
          sum += logRatios(bucketOf(toks(i), dim))
          if (i > 0) sum += logRatios(bucketOf(toks(i - 1) + " " + toks(i), dim))
          i += 1
        }
        (math.max(2L * toks.length - 1, 0L), sum)
      }
    }
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), scoreU(col(textCol)).as("s"))
      .select(col("doc_id"), col("s._1").as("n_features"),
        col("s._2").as("log_weight"))
  }

  /** Deterministic top-k selection by log importance weight (doc-id
    * tie-break) — the Gumbel-free variant; k is a budget, executed as
    * TakeOrdered, never a driver-side sort.
    */
  def selectTopK(scored: DataFrame, k: Int): DataFrame =
    scored.orderBy(col("log_weight").desc, col("doc_id")).limit(k)

  /** End-to-end: fit on target vs raw, score raw, keep the top-k
    * target-like documents.
    */
  def resample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, dim: Int, k: Int): DataFrame =
    selectTopK(
      scoreLogWeights(raw, idCol, textCol,
        fitLogRatios(target, raw, textCol, dim)), k)

  /** ORACLE twin of the model's sufficient statistics: per-bucket
    * target/raw feature counts with the GF(2^61-1) rolling hash (the
    * q34d cross-engine-exact family) instead of murmur3 — everything
    * downstream of these integers is O(dim) driver-side log-ratio
    * arithmetic (closed-form-checked in PipelineSpec), so hash-matching
    * the counts pins the distributed 99% of DSIR cross-engine.
    *
    * One shared scan computes both sides (`isTarget` marks the target
    * rows — the common "target is a labeled subset of raw" setup; the
    * general two-corpus fit stays [[fitLogRatios]]). Output:
    * `(bucket BIGINT, target_n BIGINT, raw_n BIGINT)`; a bucket no
    * feature hashes into emits nothing (add-1 smoothing is model math,
    * not data).
    */
  def oracleBucketStats(raw: DataFrame, isTarget: Column, textCol: String,
      dim: Int): DataFrame = {
    require(dim >= 2, s"dim=$dim must be >= 2")
    val fb = udf { (text: String) =>
      if (text == null) null
      else {
        val toks = tokenize(text)
        val out = new Array[Long](math.max(2 * toks.length - 1, 0))
        var i = 0
        while (i < toks.length) {
          out(i) = Mod61.hashString(toks(i)) % dim
          if (i > 0) out(toks.length + i - 1) =
            Mod61.hashString(toks(i - 1) + " " + toks(i)) % dim
          i += 1
        }
        out
      }
    }
    raw.filter(col(textCol).isNotNull)
      .select(isTarget.as("__t"), explode(fb(col(textCol))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("target_n"),
        count(lit(1)).as("raw_n"))
  }
}
