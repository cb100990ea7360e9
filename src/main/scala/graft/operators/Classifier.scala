package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FastText-style linear quality classifier — the Spark-first analogue of
  * the reference's model-scoring UDFs (ONNX session over column batches,
  * /root/reference/dozer-sql/expression/src/onnx/udf.rs): a broadcast
  * weight vector applied to hashed bag-of-words features, entirely in
  * codegen'd builtins. Training-data pipelines use exactly this shape for
  * quality/domain classifiers (hash trick + linear head).
  *
  * Features: token t maps to bucket pmod(murmur3(t), dim); a document's
  * score is sigmoid(mean(w[bucket(t)]) + bias). No explode, no shuffle —
  * scoring is a map-only pass, and the model (dim doubles) rides into the
  * plan as a foldable literal array, so 100 TB scoring scans are embarrass-
  * ingly parallel.
  *
  * Training: one-pass log-odds weights (the naive-Bayes bootstrap every
  * quality-classifier pipeline starts from): w[b] = ln((pos_b + 1) /
  * (neg_b + 1)) − ln((pos_tot + dim) / (neg_tot + dim)). Two aggregations
  * over the labeled corpora; the collected model is O(dim) — a model, not
  * data.
  */
object Classifier {

  /** Feature bucket of one token (murmur3, Spark's `hash`). */
  def bucket(token: Column, dim: Int): Column =
    pmod(hash(token), lit(dim))

  /** Per-bucket token-instance counts of a corpus. */
  private def bucketCounts(df: DataFrame, textCol: String, dim: Int): DataFrame =
    df.select(explode(Dedup.tokens(col(textCol))).as("t"))
      .filter(length(col("t")) > 0)
      .select(bucket(col("t"), dim).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))

  /** Train log-odds weights from positive/negative example corpora.
    * Returns a dense Array[Double] of length `dim` (the model).
    */
  def trainLogOdds(pos: DataFrame, neg: DataFrame, textCol: String,
      dim: Int): Array[Double] = {
    require(dim >= 2, s"dim=$dim must be >= 2")
    val p = bucketCounts(pos, textCol, dim).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = bucketCounts(neg, textCol, dim).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pTot = p.values.sum.toDouble + dim
    val nTot = n.values.sum.toDouble + dim
    val norm = math.log(pTot / nTot)
    Array.tabulate(dim) { b =>
      math.log((p.getOrElse(b, 0L) + 1.0) / (n.getOrElse(b, 0L) + 1.0)) - norm
    }
  }

  /** Score `df.textCol` with a broadcast weight vector: (doc_id, n_tokens,
    * margin, score). margin = mean token weight + bias; score = sigmoid.
    * Documents with zero tokens get margin = bias. NULL-text rows are
    * DROPPED — the same contract every per-doc text kernel here enforces
    * (topNgramPerDoc, repetitionStats): an unscorable row must not leak
    * downstream looking like a scored one.
    */
  /** Exact-arithmetic classifier variant: per-token polarity votes.
    * A token votes +1 if its rate in the positive corpus exceeds its
    * rate in the negative corpus, -1 if below, 0 on an exact tie; a
    * document's margin is the sum of its tokens' votes. The rate
    * comparison is done by cross-multiplication over exact integers
    * (pos_n·neg_tot vs neg_n·pos_tot, in Decimal(38,0) so 100 TB-scale
    * counts cannot overflow), so the whole pipeline is integer-exact and
    * replays bit-identically in any engine — unlike the log-odds head,
    * whose float weights are libm-dependent.
    *
    * Shape at scale: one vocab-keyed shuffle for the rates, a broadcast
    * of the vocab-sized vote table back onto the exploded corpus, one
    * doc-keyed shuffle for the margins. NULL-text rows are dropped (the
    * per-doc kernel contract).
    */
  def scoreTokenPolarity(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, posLabel: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        (col(labelCol) === posLabel).as("pos"),
        explode(Dedup.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val rates = toks.groupBy(col("token")).agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("pos_n"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("neg_n"))
    val tot = rates.agg(sum(col("pos_n")).as("pos_tot"),
      sum(col("neg_n")).as("neg_tot"))
    val votes = rates.crossJoin(broadcast(tot))
      .select(col("token"),
        when(col("pos_n").cast(dec) * col("neg_tot").cast(dec) >
             col("neg_n").cast(dec) * col("pos_tot").cast(dec), 1)
          .when(col("pos_n").cast(dec) * col("neg_tot").cast(dec) <
                col("neg_n").cast(dec) * col("pos_tot").cast(dec), -1)
          .otherwise(0).as("vote"))
    toks.join(broadcast(votes), "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("vote")).cast("long").as("margin"))
  }

  def scoreLinear(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], bias: Double = 0.0): DataFrame = {
    val dim = weights.length
    require(dim >= 2, s"weights.length=$dim must be >= 2")
    val w = lit(weights) // foldable literal array — broadcast by the plan
    // `split("", ...)` yields [""] — drop empty tokens so blank docs
    // score the bias rather than the empty-string bucket's weight
    val tok = filter(Dedup.tokens(col(textCol)), t => length(t) > 0)
    val perTok = transform(tok, t => element_at(w, bucket(t, dim) + 1))
    val margin = when(size(tok) > 0,
      aggregate(perTok, lit(0.0), _ + _) / size(tok) + bias)
      .otherwise(lit(bias))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(tok).cast("long").as("n_tokens"),
        margin.as("margin"))
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("margin"))))
  }
}
