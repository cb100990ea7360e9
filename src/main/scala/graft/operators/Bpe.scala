package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge learning — the tokenizer-TRAINING step of a
  * pretraining data pipeline (Sennrich et al. 2016 semantics: greedy
  * highest-frequency adjacent-pair merges, learned over word counts).
  *
  * Distributed shape: the working set after the first aggregation is the
  * DISTINCT-WORD table (word-symbol array, corpus count) — O(vocabulary),
  * not O(corpus), which is what makes 100 TB feasible: a trillion-token
  * corpus has ~10⁷–10⁸ distinct words, and every merge round is
  *   (a) one explode of adjacent symbol pairs + one weighted count
  *       aggregation (map-side combined, so the shuffle is O(distinct
  *       pairs)), reduced to a single argmax row via min(struct(-freq,
  *       a, b)) — lexicographic struct ordering IS (freq desc, pair asc),
  *       so the tie-break is deterministic and partial aggregation
  *       forwards one candidate per map task;
  *   (b) one map-only pass rewriting the symbol arrays (a per-WORD UDF —
  *       off the per-token hot path by construction).
  * Only the single winning (pair, freq) row ever reaches the driver per
  * round — the model being trained, not data.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** One greedy left-to-right merge pass of (a,b) -> a+b over a symbol
    * sequence — the classic BPE apply step ("aaa" with pair (a,a) gives
    * ["aa","a"], matching the reference implementations).
    */
  def mergeOnce(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Learn up to `numMerges` merges from the corpus in `df.textCol`.
    * Stops early when the best remaining pair's weighted frequency drops
    * below `minPairFreq`. Word boundaries are whitespace (the same
    * tokenizer as every other TextOps metric); merges never cross words.
    *
    * HYBRID execution (the q48 connected-components trade): the corpus
    * collapses to the distinct-word count table in ONE distributed
    * aggregation — O(vocabulary) rows. When that vocabulary fits under
    * `driverVocabBudget` (it does for any human-language corpus: ~10⁷
    * distinct words ≪ the budget only at extreme web scale), the merge
    * loop runs on the driver over the collected table — merge rounds
    * are pure model training on model-sized data, and numMerges × Spark
    * -job scheduling overhead would dominate the real work. Above the
    * budget, every round runs distributed: a weighted pair-count
    * aggregation reduced to a single argmax row via min(struct(-freq,
    * a, b)) (partial-aggregatable, deterministic tie-break) + a
    * map-only symbol rewrite. Both paths implement identical semantics
    * (spec-enforced, including overlap counting).
    *
    * Lineage/caching (distributed path): each round persists the
    * rewritten word table and materializes it before dropping its
    * parent, so the active plan stays one UDF layer deep
    * (persist-with-recompute lineage rather than localCheckpoint —
    * executor loss recomputes instead of failing the job).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minPairFreq: Long = 2L, driverVocabBudget: Long = 4_000_000L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges=$numMerges must be >= 1")
    var words = df
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(split(col("w"), "").as("syms"), col("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vocabSize = words.count()

    if (vocabSize <= driverVocabBudget) {
      val local = words.collect().map { r =>
        (r.getSeq[String](0).toIndexedSeq, r.getLong(1))
      }.toIndexedSeq
      words.unpersist()
      return trainLocal(local, numMerges, minPairFreq)
    }

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // argmax over weighted adjacent-pair counts; ties (freq, a, b) asc
      val best = words.filter(size(col("syms")) >= 2)
        .select(posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1))
          .as(Seq("i", "a")), col("syms"), col("n"))
        .select(col("a"), element_at(col("syms"), col("i") + 2).as("b"), col("n"))
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("freq"))
        .agg(min(struct((-col("freq")).as("nf"),
          col("a").as("a"), col("b").as("b"))).as("m"))
        .select(col("m.a"), col("m.b"), (-col("m.nf")).as("freq"))
        .collect()

      if (best.isEmpty || best(0).isNullAt(0) || best(0).getLong(2) < minPairFreq) {
        done = true
      } else {
        val a = best(0).getString(0)
        val b = best(0).getString(1)
        val f = best(0).getLong(2)
        merges += Merge(rank, a, b, f)
        val applyMerge = udf((s: Seq[String]) =>
          mergeOnce(s.toIndexedSeq, a, b))
        val next = words.select(applyMerge(col("syms")).as("syms"), col("n"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        words.unpersist()
        words = next
        rank += 1
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** Driver-side merge loop over the collected (symbols, count) table —
    * identical argmax/tie-break/overlap semantics to the distributed
    * rounds (PipelineSpec holds the two paths equal).
    */
  private def trainLocal(vocab: IndexedSeq[(IndexedSeq[String], Long)],
      numMerges: Int, minPairFreq: Long): Seq[Merge] = {
    var words = vocab
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var continue = true
    while (continue && merges.length < numMerges) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      words.foreach { case (syms, n) =>
        var i = 0
        while (i + 1 < syms.length) { pairs((syms(i), syms(i + 1))) += n; i += 1 }
      }
      if (pairs.isEmpty) continue = false
      else {
        val ((a, b), f) = pairs.minBy { case ((a, b), f) => (-f, a, b) }(
          Ordering.Tuple3(Ordering.Long, codePointOrder, codePointOrder))
        if (f < minPairFreq) continue = false
        else {
          merges += Merge(merges.length + 1, a, b, f)
          words = words.map { case (s, n) => (mergeOnce(s, a, b), n) }
        }
      }
    }
    merges.toSeq
  }

  /** Code-point string ordering == UTF-8 binary order == Spark's string
    * `min`/struct ordering. Scala/Java's default `String` compare is
    * UTF-16 code-UNIT order, which disagrees above the BMP (surrogates
    * 0xD800–0xDFFF sort below U+E000–U+FFFF but encode code points
    * ≥ 0x10000) — using it in [[trainLocal]] would let equal-frequency
    * tie-breaks diverge from the distributed argmax on emoji/CJK-ext
    * symbols.
    */
  private val codePointOrder: Ordering[String] = (x: String, y: String) => {
    val nx = x.length; val ny = y.length
    var i = 0
    var r = 0
    while (r == 0 && i < nx && i < ny) {
      val cx = x.codePointAt(i); val cy = y.codePointAt(i)
      r = Integer.compare(cx, cy)
      if (r == 0) i += Character.charCount(cx)
    }
    if (r != 0) r else Integer.compare(nx - i, ny - i)
  }

  /** Split a token into code-POINT symbols — the same decomposition as
    * the training side's `split(col, "")` (Java regex is code-point
    * aware), so supplementary-plane characters stay whole instead of
    * being broken into unpaired surrogates that no learned merge could
    * ever match.
    */
  private def codePointSyms(token: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < token.length) {
      val cp = token.codePointAt(i)
      val n = Character.charCount(cp)
      out += token.substring(i, i + n)
      i += n
    }
    out.toIndexedSeq
  }

  /** Compile a merge list into the pair→rank lookup [[segmentToken]]
    * scans with — build once per model, reuse across every token.
    */
  def compileRanks(merges: Seq[Merge]): Map[(String, String), Int] =
    merges.sortBy(_.rank).zipWithIndex
      .map { case (m, i) => (m.left, m.right) -> i }.toMap

  /** Apply a learned merge list to one token — the ENCODE step.
    * Instead of replaying the full merge list in rank order
    * (O(merges · |token|) — dominated by model size, not token size),
    * repeatedly merge the lowest-RANK adjacent pair present
    * (O(applied · |token|), applied ≤ |token|−1). The two are
    * equivalent for any trained model: a merge's operands are formed
    * at strictly earlier ranks, so applying rank r can only create
    * pairs involving the new symbol — all of rank > r — never a pair
    * an earlier rank should have consumed (spec-held against the
    * replay implementation).
    */
  def segmentToken(token: String, merges: Seq[Merge]): IndexedSeq[String] =
    segmentTokenRanked(token, compileRanks(merges))

  /** [[segmentToken]] against a precompiled [[compileRanks]] lookup. */
  def segmentTokenRanked(token: String,
      ranks: Map[(String, String), Int]): IndexedSeq[String] = {
    var syms = codePointSyms(token)
    var go = syms.length >= 2
    while (go) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) go = false
      else {
        syms = mergeOnce(syms, syms(bestI), syms(bestI + 1))
        go = syms.length >= 2
      }
    }
    syms
  }

  /** Per-document subword segmentation stats under a learned merge list:
    * (doc_id, n_tokens, n_subwords) — the compression a tokenizer buys.
    * The compiled rank lookup is tiny (the trained model) and closes
    * over the UDF; map-only, no shuffle.
    */
  def segmentStats(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val ranks = compileRanks(merges)
    val nSubwords = udf((toks: Seq[String]) =>
      if (toks == null) 0L
      else toks.iterator.map(t => segmentTokenRanked(t, ranks).length.toLong).sum)
    val tok = Dedup.tokens(col(textCol))
    df.select(col(idCol).as("doc_id"),
      size(tok).cast("long").as("n_tokens"),
      nSubwords(tok).as("n_subwords"))
  }

  /** Merge list as a DataFrame for query/driver surfaces. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }
}
