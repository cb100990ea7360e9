package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring — the CCNet-style "perplexity
  * against a reference-corpus LM" filter (CCNet buckets web documents by
  * Wikipedia-LM perplexity; cf. also Gopher/RefinedWeb quality gates).
  *
  * Model = bigram + left-unigram counts over a REFERENCE corpus with
  * add-alpha smoothing:  p(w2|w1) = (c(w1 w2) + α) / (c(w1·) + α·V).
  * Per scored document: cross-entropy H = mean(−log2 p) over its bigrams
  * and perplexity 2^H.
  *
  * Shape at scale: the trained model is an aggregation of the reference
  * corpus (bounded — reference corpora are curated, ~vocab² worst case,
  * in practice a few million rows) that BROADCASTS into the scoring
  * pass, so scoring a 100 TB corpus is one explode + two broadcast
  * joins + a per-doc rollup; the corpus text never shuffles. Float log
  * arithmetic has no bit-exact cross-engine twin, so queries over this
  * operator are rows-only; closed-form checks live in PipelineSpec.
  */
object LangModel {

  /** Bigram counts over the reference corpus: ("w1 w2" gram, cnt). */
  def bigramCounts(ref: DataFrame, textCol: String): DataFrame =
    ref.select(explode(Dedup.shinglesFast(col(textCol), 2)).as("gram"))
      .filter(size(split(col("gram"), " ")) === 2) // drop <2-token docs
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))

  /** Integer-exact model-coverage companion to [[perplexity]]: per doc,
    * how many bigram instances appear in the reference model at all.
    * Same broadcast-model scan shape; count math only, so the result is
    * oracle-checkable bit-for-bit. Documents with <2 tokens are omitted
    * (no bigrams — length-filter them separately).
    */
  def bigramCoverage(df: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String): DataFrame = {
    val known = bigramCounts(ref, refTextCol)
      .select(col("gram")).withColumn("__in", lit(1))
    df.select(col(idCol).as("doc_id"),
        explode(Dedup.shinglesFast(col(textCol), 2)).as("gram"))
      .filter(size(split(col("gram"), " ")) === 2)
      .join(broadcast(known), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("__in").isNull, 0L).otherwise(1L)).as("n_known"))
      .withColumn("coverage", col("n_known").cast("double") / col("n_bigrams"))
  }

  /** Score every document in `df` against the reference model.
    * Output: (doc_id, n_bigrams, cross_entropy, perplexity); documents
    * with fewer than two tokens have no bigrams and are omitted (they
    * carry no LM evidence — filter them on length instead).
    */
  def perplexity(df: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha=$alpha must be > 0")
    val bigrams = bigramCounts(ref, refTextCol)
    // left-context counts derive from the bigram table (c(w1·) = Σ_w2)
    val lefts = bigrams
      .select(substring_index(col("gram"), " ", 1).as("w1"), col("cnt"))
      .groupBy(col("w1")).agg(sum(col("cnt")).as("c1"))
    // V = reference vocabulary size, as a broadcast scalar
    val vocabSize = ref
      .select(explode(Dedup.tokens(col(refTextCol))).as("w"))
      .filter(length(col("w")) > 0)
      .agg(countDistinct(col("w")).as("__v"))

    val docBigrams = df.select(col(idCol).as("doc_id"),
        explode(Dedup.shinglesFast(col(textCol), 2)).as("gram"))
      .filter(size(split(col("gram"), " ")) === 2)
      .withColumn("w1", substring_index(col("gram"), " ", 1))

    docBigrams
      .join(broadcast(bigrams), Seq("gram"), "left")
      .join(broadcast(lefts), Seq("w1"), "left")
      .crossJoin(broadcast(vocabSize))
      .withColumn("__p",
        (coalesce(col("cnt"), lit(0L)) + alpha) /
          (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("__v")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(-log2(col("__p"))).as("cross_entropy"))
      .withColumn("perplexity", pow(lit(2.0), col("cross_entropy")))
  }
}
