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

  /** Unigram + bigram feature buckets of a text column (murmur3 hash
    * trick, same bucketing as [[Classifier.bucket]]).
    */
  def featureBuckets(text: Column, dim: Int): Column = {
    val toks = filter(Dedup.tokens(text), t => length(t) > 0)
    // zip_with pads the shorter side with null, so the zip of toks with
    // its tail has n elements — slice to the n-1 true bigrams
    val bigrams = slice(
      zip_with(toks, slice(toks, lit(2), size(toks)),
        (a, b) => concat_ws(" ", a, b)),
      lit(1), greatest(size(toks) - 1, lit(0)))
    concat(
      transform(toks, t => pmod(hash(t), lit(dim))),
      transform(bigrams, g => pmod(hash(g), lit(dim))))
  }

  /** Per-bucket feature-instance counts of a corpus (dim-keyed shuffle). */
  private def bucketCounts(df: DataFrame, textCol: String, dim: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(featureBuckets(col(textCol), dim)).as("b"))
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
    val w = lit(logRatios)
    val feats = featureBuckets(col(textCol), dim)
    val perFeat = transform(feats, b => element_at(w, b + 1))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(feats).cast("long").as("n_features"),
        aggregate(perFeat, lit(0.0), _ + _).as("log_weight"))
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
}
