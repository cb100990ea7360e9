package graft.operators

import org.apache.spark.sql.{Column}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language-ID scoring, content fingerprinting.
  *
  * Counting/ratio metrics are pure built-ins (codegen'd, and exactly
  * reproducible in an external SQL engine for oracle checks). The
  * 64-bit fingerprints (simhash, rolling hash) are deterministic Scala
  * UDFs — they run once per document, not per token, so the UDF
  * boundary is off the hot path.
  */
object TextOps {

  def tokens(text: Column): Column = Dedup.tokens(text)

  /** Whitespace token count (BPE-ish subword estimate: see tokenEstimate). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Rough BPE token estimate: words + ceil(chars/4) blend used by
    * pipeline cost models; deterministic integer math.
    */
  def tokenEstimate(text: Column): Column =
    (tokenCount(text) + floor((length(text) + 3) / 4)).cast("long")

  /** Count of characters matching a regex character class. */
  def charClassCount(text: Column, cls: String): Column =
    length(text) - length(regexp_replace(text, cls, ""))

  /** Quality metrics tuple: all ratios are double divisions of integer
    * counts, so they reproduce bit-identically anywhere.
    */
  def punctRatio(text: Column): Column =
    charClassCount(text, "[.!?,;:]").cast("double") / length(text)

  def alphaRatio(text: Column): Column =
    charClassCount(text, "[A-Za-z]").cast("double") / length(text)

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(lit): _*)))
      .cast("double") / size(tokens(text))

  def meanTokenLen(text: Column): Column = {
    val tok = tokens(text)
    aggregate(transform(tok, t => length(t).cast("long")), lit(0L), _ + _)
      .cast("double") / size(tok)
  }

  /** Composite quality score in [0,1]-ish range: weights chosen to favor
    * prose-like text (moderate punctuation, high stopword incidence,
    * mid-length tokens). Deterministic double math over integer counts.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    stopwordRatio(text, stopwords) * 0.5 +
      punctRatio(text) * 0.2 +
      (lit(1.0) - abs(meanTokenLen(text) - 5.0) / 10.0) * 0.3

  // ---- repetition metrics (Gopher-style quality filters) ---------------

  /** Fraction of word n-gram INSTANCES in a document that are repeats
    * of an earlier n-gram in the same document — the within-doc
    * repetition signal quality filters threshold on (boilerplate and
    * degenerate generations score high). Pure builtins over the
    * shingle array: `1 - distinct/total`, integer-exact and therefore
    * oracle-checkable in any SQL engine.
    */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val grams = Dedup.shingles(text, n)
    (size(grams) - size(array_distinct(grams))).cast("double") / size(grams)
  }

  /** Ratio of non-alphanumeric-non-space symbols to whitespace tokens —
    * the symbol-to-word quality heuristic.
    */
  def symbolWordRatio(text: Column): Column =
    charClassCount(text, "[^A-Za-z0-9\\s]").cast("double") / size(tokens(text))

  /** Row-local top-gram kernel: one hash-map pass over a doc's n-grams.
    * Semantics mirror [[Dedup.shingles]] exactly (docs shorter than n
    * collapse to one whole-text gram); ties break on the gram string
    * ascending (ASCII/BMP-safe vs engines comparing UTF-8 bytes).
    */
  final case class TopGramStats(top_gram: String, top_n: Long,
      n_grams: Long, n_distinct: Long)

  def topGramStats(toks: Seq[String], n: Int): TopGramStats = {
    val grams: Iterator[String] =
      if (toks == null) Iterator.empty
      else if (toks.length < n) Iterator(toks.mkString(" "))
      else toks.iterator.sliding(n).withPartial(false).map(_.mkString(" "))
    val counts = new java.util.HashMap[String, Long]()
    var total = 0L
    grams.foreach { g => total += 1; counts.merge(g, 1L, _ + _) }
    var topG: String = null
    var topN = 0L
    counts.forEach { (g, c) =>
      if (c > topN || (c == topN && (topG == null || g.compareTo(topG) < 0))) {
        topG = g; topN = c
      }
    }
    TopGramStats(topG, topN, total, counts.size.toLong)
  }

  private val topGramUdf = udf((toks: Seq[String], n: Int) => topGramStats(toks, n))

  /** Combined per-doc repetition kernel: top-gram stats at `nTop` plus
    * instance/distinct counts at `nDup`, one row-local UDF call (the
    * higher-order-function formulation of the dup fraction runs
    * interpreted per gram — measurably slower than one hash pass).
    */
  final case class RepetitionStats(top_gram: String, top_n: Long,
      n_grams: Long, n_distinct: Long, dup_total: Long, dup_distinct: Long)

  private val repetitionUdf = udf((toks: Seq[String], nTop: Int, nDup: Int) => {
    val t = topGramStats(toks, nTop)
    val set = new java.util.HashSet[String]()
    var total = 0L
    val grams: Iterator[String] =
      if (toks == null) Iterator.empty
      else if (toks.length < nDup) Iterator(toks.mkString(" "))
      else toks.iterator.sliding(nDup).withPartial(false).map(_.mkString(" "))
    grams.foreach { g => total += 1; set.add(g) }
    RepetitionStats(t.top_gram, t.top_n, t.n_grams, t.n_distinct,
      total, set.size.toLong)
  })

  /** One-pass per-doc repetition metrics (q53 shape): top `nTop`-gram +
    * dup fractions at both widths. Map-only, zero exchanges.
    */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, nTop: Int, nDup: Int): org.apache.spark.sql.DataFrame =
    df.filter(col(textCol).isNotNull) // match the explode-formulation contract
      .withColumn("__s", repetitionUdf(tokens(col(textCol)), lit(nTop), lit(nDup)))
      .select(col(idCol).as("doc_id"),
        col("__s.top_gram").as("top_gram"), col("__s.top_n").as("top_n"),
        col("__s.n_grams").as("n_grams"),
        ((col("__s.n_grams") - col("__s.n_distinct")).cast("double") /
          col("__s.n_grams")).as("dup2_fraction"),
        ((col("__s.dup_total") - col("__s.dup_distinct")).cast("double") /
          col("__s.dup_total")).as("dup3_fraction"),
        (col("__s.top_n").cast("double") / col("__s.n_grams")).as("top_fraction"))

  /** Per-document most-frequent word n-gram: (doc_id, top_gram, top_n,
    * n_grams, n_distinct, top_fraction). Ties break on the gram string
    * ascending — deterministic across engines.
    *
    * Shape: a single MAP-ONLY pass — per-doc gram counting is row-local,
    * so exploding into (doc, gram) rows and shuffling them (the
    * aggregation formulation) ships the whole tokenized corpus across
    * the network to compute values each row already had. One UDF
    * hash-map per doc (the minhash trade: measured ~7× on this query's
    * bench shape), zero exchanges; at 100 TB the scan parallelism is
    * the only knob.
    */
  /** Extra input columns (beyond the text) ride through untouched, so
    * callers can co-compute other row-local metrics in the same pass.
    */
  def topNgramPerDoc(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val carried = df.columns.filter(c => c != idCol && c != textCol)
      .map(col).toSeq
    // null text drops the doc — the contract of the original explode
    // formulation (and of the SQL oracles, whose joins produce no row)
    df.filter(col(textCol).isNotNull)
      .withColumn("__s", topGramUdf(tokens(col(textCol)), lit(n)))
      .select(col(idCol).as("doc_id") +: carried :+
        col("__s.top_gram").as("top_gram") :+
        col("__s.top_n").as("top_n") :+ col("__s.n_grams").as("n_grams") :+
        col("__s.n_distinct").as("n_distinct") :+
        (col("__s.top_n").cast("double") / col("__s.n_grams")).as("top_fraction"): _*)
  }

  /** Exact grouped token-length percentiles via a bounded HISTOGRAM —
    * the 100 TB shape for distribution stats on a data card. A naive
    * exact percentile sorts the corpus (a full-width shuffle of every
    * row); here the only corpus-wide operation is `groupBy(group, len)`,
    * whose aggregation state is bounded by (#groups × #distinct
    * lengths) — map-side combine collapses each task to that grid, the
    * shuffle moves only histogram cells, and the window + percentile
    * selection run on the (tiny) histogram. Integer-only selection rule
    * (`100·cum ≥ p·total`, percentile_disc semantics: smallest length
    * whose cumulative count reaches p%), so results hash-match a SQL
    * replay (q87).
    */
  def lengthPercentiles(df: org.apache.spark.sql.DataFrame,
      groupCol: String, textCol: String,
      ps: Seq[Int]): org.apache.spark.sql.DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]: $ps")
    val hist = df.filter(col(textCol).isNotNull)
      .select(col(groupCol).as("grp"),
        tokenCount(col(textCol)).cast("long").as("len"))
      .groupBy("grp", "len").agg(count(lit(1)).as("cnt"))
    val byLen = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("len")
    val whole = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    val cum = hist
      .withColumn("cum", sum("cnt").over(byLen))
      .withColumn("total", sum("cnt").over(whole))
    val aggs = ps.map(p =>
      min(when(col("cum") * 100 >= col("total") * p, col("len"))).as(s"p$p"))
    cum.groupBy(col("grp").as(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  // ---- chunking / sequence packing -------------------------------------

  /** Split documents into overlapping token windows (`window` tokens,
    * step `stride`) — context-window chunking for training/embedding
    * pipelines. One chunk per start offset 0, stride, 2·stride, … < n;
    * the final chunk may be shorter. Pure builtins (sequence + slice):
    * row explosion happens AFTER the cheap tokenize, so the shuffle-free
    * map stage emits (doc_id, chunk_idx, chunk_text, n_tokens) directly.
    */
  def chunkDocs(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, window: Int, stride: Int)
      : org.apache.spark.sql.DataFrame = {
    require(window >= 1 && stride >= 1, s"window=$window stride=$stride must be >= 1")
    val tok = tokens(col(textCol))
    df.select(col(idCol).as("doc_id"), tok.as("__tok"))
      .select(col("doc_id"),
        posexplode(sequence(lit(0), size(col("__tok")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "__start")),
        col("__tok"))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", slice(col("__tok"), col("__start") + 1, lit(window)))
          .as("chunk_text"),
        least(lit(window), size(col("__tok")) - col("__start")).cast("long")
          .as("n_tokens"))
  }

  /** Concat-and-cut sequence PACKING — how pretraining runs turn a
    * document stream into fixed-budget training sequences: within each
    * `groupCol` stream, documents are laid out in `orderCol` order and
    * the token stream is cut every `budget` tokens. Per doc:
    * cumulative offset, owning sequence index, and offset within that
    * sequence. Integer window math only (one shuffle on the group key)
    * — deterministic and oracle-checkable; at scale each group packs
    * independently, so parallelism = number of groups (shards).
    */
  def packSequences(df: org.apache.spark.sql.DataFrame, groupCol: String,
      orderCol: String, tokenCountCol: String, budget: Long)
      : org.apache.spark.sql.DataFrame = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("cum_before",
        coalesce(sum(col(tokenCountCol)).over(w), lit(0L)).cast("long"))
      .withColumn("seq_idx", floor(col("cum_before") / budget).cast("long"))
      .withColumn("seq_offset", (col("cum_before") % budget).cast("long"))
  }

  /** CCNet-style corpus-level SPAN dedup: cut each document into
    * non-overlapping `unit`-token spans, keep only the FIRST occurrence
    * of each span corpus-wide (order = (doc_id, span position)), and
    * reassemble the surviving spans per document. Boilerplate that
    * repeats across documents (headers, navigation, license blocks)
    * disappears from every copy but the first; documents whose every
    * span was seen earlier vanish entirely.
    *
    * Scale shape: the explode emits (doc, span_idx, span) rows; the
    * keep-first decision is ONE row_number window partitioned by the
    * span's 64-bit hash — so the shuffle key is 8 bytes and the state
    * per key is the single winning row, exactly the CCNet sharded-hash
    * layout. Reassembly groups back by doc_id (second shuffle,
    * collect_list of kept spans is bounded by the original doc size).
    */
  def spanDedup(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, unit: Int): org.apache.spark.sql.DataFrame = {
    require(unit >= 1, s"unit=$unit must be >= 1")
    val spans = chunkDocs(df, idCol, textCol, window = unit, stride = unit)
      .withColumnRenamed("chunk_idx", "span_idx")
      .withColumnRenamed("chunk_text", "span")
    val firstOcc = org.apache.spark.sql.expressions.Window
      .partitionBy(xxhash64(col("span")))
      .orderBy(col("doc_id"), col("span_idx"))
    spans.withColumn("__occ", row_number().over(firstOcc))
      .filter(col("__occ") === 1)
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("span_idx"), col("span")))),
          x => x("span")), " ").as("text_dedup"),
        count(lit(1)).as("n_spans_kept"))
  }

  /** Exact-substring duplication stats (the deduplicating-training-data
    * signal of Lee et al. 2022, window-hash approximation of their
    * suffix-array pass): a length-`w` token window duplicated ANYWHERE
    * in the corpus (incl. within the same doc) marks its positions as
    * duplicated; per doc, the fraction of token positions covered.
    *
    * Shape at scale: stride-1 windows explode to O(corpus tokens) rows,
    * but each carries only (doc_id, pos, 8-byte xxhash64) — the ONE
    * corpus-wide shuffle is on the hash; the duplicated-window count
    * re-derives via a COUNT window over the hash partition (same
    * single-shuffle trick as keyTerms/corpusDupNgramStats, measured
    * cheaper than a re-aggregation+join); coverage is a distinct-count
    * of exploded positions per doc. Integer math throughout, so the
    * whole operator oracle-checks despite the internal hashing (2⁻⁶⁴
    * collision caveat).
    */
  def substringDupStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, w: Int): org.apache.spark.sql.DataFrame = {
    require(w >= 1, s"w=$w must be >= 1")
    val tok = tokens(col(textCol))
    val base = df.select(col(idCol).as("doc_id"), tok.as("__tok"),
      size(tok).cast("long").as("n_tokens"))
    val windows = base.filter(size(col("__tok")) >= w)
      .select(col("doc_id"),
        posexplode(Dedup.shinglesFast(concat_ws(" ", col("__tok")), w))
          .as(Seq("pos", "__g")))
      .select(col("doc_id"), col("pos"), xxhash64(col("__g")).as("__h"))
    val dupPositions = windows
      .withColumn("__cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))))
      .filter(col("__cnt") >= 2)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (w - 1))).as("dup_pos"))
    val coverage = dupPositions.groupBy(col("doc_id"))
      .agg(countDistinct(col("dup_pos")).as("n_dup_tokens"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(coverage, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"))
      .withColumn("dup_fraction",
        col("n_dup_tokens").cast("double") / col("n_tokens"))
  }

  // ---- corpus-level n-gram dedup / decontamination ---------------------

  /** Per-document CORPUS-duplicate n-gram stats — the RefinedWeb-style
    * signal: how much of this document's content also appears elsewhere
    * in the corpus. For each doc: total n-gram instances, instances
    * whose gram occurs in ≥2 distinct docs, and the duplicate fraction.
    *
    * Shape at scale: ONE explode into a (doc, gram) count aggregation;
    * gram doc-frequency is a COUNT window over the gram partition of
    * that same aggregated relation (one row per (doc, gram), so the
    * partition row count IS the doc frequency) — a re-aggregation or
    * self-join would tokenize and shuffle the corpus twice (measured:
    * AQE stage reuse does not fire across such consumers); then a
    * per-doc rollup of instance counts. With
    * `hashGrams` the join/shuffle keys are 64-bit xxhash64 values
    * instead of gram strings — the 100 TB path (set false only for
    * cross-engine oracle checks where the hash has no SQL twin; the
    * fractions are identical either way up to 2⁻⁶⁴ collisions).
    */
  def corpusDupNgramStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int, hashGrams: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    // hash AFTER the explode (a generator cannot nest inside xxhash64)
    val counts = df.select(col(idCol).as("doc_id"),
      explode(Dedup.shinglesFast(col(textCol), n)).as("__g"))
      .select(col("doc_id"),
        (if (hashGrams) xxhash64(col("__g")) else col("__g")).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("__cnt"))
    // one row per (doc, gram) -> gram-partition row count IS the doc freq
    counts
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("__cnt")).as("n_grams"),
        sum(when(col("__df") >= 2, col("__cnt")).otherwise(0L)).as("n_shared"))
      .withColumn("shared_fraction",
        col("n_shared").cast("double") / col("n_grams"))
  }

  /** Benchmark DECONTAMINATION: flag training documents sharing any
    * word n-gram with an evaluation set — the contamination check every
    * training-data pipeline runs before a model sees the data. Returns
    * every training doc with the count of distinct shared n-grams
    * (0 = clean).
    *
    * The eval side is aggregated to distinct shingles first (tiny next
    * to the corpus — benchmarks are thousands of docs, not billions),
    * so the join is corpus-scan × broadcast-able eval-shingle set; with
    * `hashGrams` the key is a long. No shuffle of the corpus text
    * itself — only (doc_id, gram) pairs.
    */
  def decontaminate(train: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, eval: org.apache.spark.sql.DataFrame,
      evalTextCol: String, n: Int, hashGrams: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    // explode first, hash second (generators cannot nest in expressions)
    def hashed(c: Column) = if (hashGrams) xxhash64(c) else c
    val evalGrams = eval
      .select(explode(array_distinct(Dedup.shinglesFast(col(evalTextCol), n))).as("__g"))
      .select(hashed(col("__g")).as("gram")).distinct()
    val trainGrams = train
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(Dedup.shinglesFast(col(textCol), n))).as("__g"))
      .select(col("doc_id"), hashed(col("__g")).as("gram"))
    val shared = trainGrams.join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
    train.select(col(idCol).as("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("contaminated", col("n_shared_grams") > 0)
  }

  /** [[decontaminate]] for eval sets too large to broadcast-join: a
    * Bloom filter over the eval shingle hashes rides to every executor
    * (a few MB for millions of grams at `fpp`), the corpus grams are
    * pre-filtered by might-contain — a map-only pass that discards the
    * overwhelmingly-clean majority — and ONLY the Bloom survivors pay
    * the exact anti-contamination join. False positives therefore cost
    * a little extra join input, never a wrong verdict: results are
    * bit-identical to [[decontaminate]] (spec-asserted).
    *
    * 100 TB shape: eval sets are 1e6–1e9 grams; a broadcast hash set at
    * the top of that range is tens of GB, while the Bloom at fpp=1e-3
    * stays under ~2 GB and the exact join's left side shrinks by ~1000×.
    */
  def decontaminateBloom(train: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, eval: org.apache.spark.sql.DataFrame,
      evalTextCol: String, n: Int, expectedGrams: Long = 1000000L,
      fpp: Double = 0.001): org.apache.spark.sql.DataFrame = {
    // persist: the gram set feeds two consumers — the bloomFilter
    // ACTION and the exact verify join — and shingling the eval set
    // twice is the avoidable cost at 1e9 grams
    val evalGrams = eval
      .select(explode(array_distinct(Dedup.shinglesFast(col(evalTextCol), n))).as("__g"))
      .select(xxhash64(col("__g")).as("gram")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bloom = evalGrams.stat.bloomFilter("gram", expectedGrams, fpp)
    val spark = train.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((g: Long) => bloomBc.value.mightContainLong(g))
    val trainGrams = train
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(Dedup.shinglesFast(col(textCol), n))).as("__g"))
      .select(col("doc_id"), xxhash64(col("__g")).as("gram"))
      .filter(mightContain(col("gram")))          // map-only prune
    val shared = trainGrams.join(evalGrams, Seq("gram")) // exact verify
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
    train.select(col(idCol).as("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("contaminated", col("n_shared_grams") > 0)
  }

  /** Length-bucketed training-batch assignment: docs land in a
    * power-of-two token-length bucket (map-only: bit length of
    * n_tokens), batches of `batchSize` are numbered within each
    * (bucket, salt) group, ordered by doc id. Length-homogeneous
    * batches waste less padding at train time; the salt bounds every
    * window partition at ~corpus/(buckets·saltGroups) rows, so no
    * single-partition sort appears at any scale — batches never span
    * salt groups by design, and batch homogeneity depends only on the
    * bucket. Raise `saltGroups` with corpus size (it only adds
    * parallelism). All integer arithmetic — fully oracled (q82).
    */
  def lengthBatches(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, batchSize: Int, saltGroups: Int = 32)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(batchSize >= 1 && saltGroups >= 1)
    df.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("bucket", length(bin(col("n_tokens"))).cast("int"))
      .withColumn("salt", (col("doc_id") % saltGroups).cast("int"))
      .withColumn("batch_id",
        (((row_number().over(Window.partitionBy(col("bucket"), col("salt"))
          .orderBy(col("doc_id")))) - 1) / batchSize).cast("long"))
  }

  // ---- vocabulary statistics -------------------------------------------

  /** Corpus vocabulary counts — the input to tokenizer/BPE training
    * and frequency-based filtering: per token, total occurrences and
    * document frequency. One explode + one hash aggregation (map-side
    * partial combine makes the shuffle O(distinct tokens), not
    * O(token instances)).
    */
  def vocabulary(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_total"),
        countDistinct(col("doc_id")).as("n_docs"))

  // ---- vocabulary coverage (OOV-rate quality filter) -------------------

  /** Per-document out-of-vocabulary stats against a reference vocabulary
    * (the CCNet-style "does this look like the reference corpus" gate,
    * integer-exact where the perplexity variant in [[LangModel]] is
    * float): token instances, instances missing from the vocabulary, and
    * the OOV rate. `vocab` is any DataFrame whose `token` column holds
    * the reference vocabulary (deduplicated here).
    *
    * Shape at scale: ONE explode of the corpus into (doc, token) rows,
    * a BROADCAST left join against the vocabulary (reference vocabs are
    * bounded — top-K words of a curated corpus — so they broadcast even
    * when the corpus is 100 TB), and one per-doc hash rollup. The corpus
    * text itself is never shuffled.
    */
  def oovStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocab: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val v = vocab.select(col("token")).distinct().withColumn("__in", lit(1))
    df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .join(broadcast(v), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
  }

  // ---- blocklist filtering ---------------------------------------------

  /** Blocklist hit counting + keep decision (the word-filter gate every
    * web-corpus pipeline runs, LDNOOBW-style): token instances, flagged
    * instances, and `kept` = flagged instances stay under `maxPerMille`
    * per thousand tokens. The threshold compare is INTEGER math
    * (n_flagged·1000 < n_tokens·maxPerMille) so the decision reproduces
    * bit-exactly in any SQL engine. Pure builtins — codegen'd filter
    * over the token array, no explode, no shuffle.
    */
  def blocklistStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, blocklist: Seq[String], maxPerMille: Int)
      : org.apache.spark.sql.DataFrame = {
    require(blocklist.nonEmpty, "blocklistStats needs at least one word")
    val tok = tokens(col(textCol))
    df.select(col(idCol).as("doc_id"),
        size(tok).cast("long").as("n_tokens"),
        size(filter(tok, t => t.isin(blocklist.map(lit): _*)))
          .cast("long").as("n_flagged"))
      .withColumn("kept",
        col("n_flagged") * 1000 < col("n_tokens") * maxPerMille)
  }

  // ---- tf-idf key-term extraction --------------------------------------

  /** Top-k characteristic terms per document by a tf-idf-style score
    * tf·N/df (rarity weight WITHOUT the log so the score is a single
    * IEEE multiply+divide — bit-identical across engines, making the
    * whole extraction oracle-checkable; log-scaled variants differ in
    * libm ulps). Ties break on token ascending.
    *
    * Shape at scale: ONE corpus scan — explode into a (doc, token)
    * count aggregation, then document frequency as a COUNT window over
    * the token partition of that same aggregated relation (a
    * re-aggregation or self-join would tokenize and shuffle the corpus
    * twice: measured, AQE stage reuse does not fire across the two
    * consumers). N arrives as a broadcast scalar; the per-doc top-k is
    * a rank window that Spark executes with partial WindowGroupLimit
    * pushdown (each map task forwards at most k candidates per doc
    * before the shuffle).
    */
  def keyTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val counts = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val wDf = org.apache.spark.sql.expressions.Window.partitionBy(col("token"))
    val nDocs = df.select(countDistinct(col(idCol)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").asc)
    counts.withColumn("df", count(lit(1)).over(wDf))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf").cast("double") * col("__n") / col("df"))
      .withColumn("term_rank", row_number().over(w).cast("int"))
      .filter(col("term_rank") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("score"), col("term_rank"))
  }

  // ---- full-text inverted index ----------------------------------------

  /** Inverted index: one posting row per (distinct token, doc) — the
    * dozer `IndexDefinition::FullText` analogue materialized as a
    * table. At scale, write it out bucketed/partitioned by token so a
    * query's term lookups are partition-pruned scans of just those
    * postings instead of a full-corpus text scan.
    */
  def invertedIndex(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("token"))

  /** AND-query over the index: docs containing ALL terms. Posting-list
    * intersection as one filter + one count aggregation — the rows
    * touched are O(Σ posting sizes of the query terms), independent of
    * corpus size. (Index rows are distinct per (token, doc), so a
    * plain count equals the distinct-term count.)
    */
  def searchAll(index: org.apache.spark.sql.DataFrame, terms: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "searchAll needs at least one term")
    index.filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === terms.distinct.length)
      .select(col("doc_id"))
  }

  /** BM25 sufficient statistics for a query's terms — every column an
    * integer, so the distributed 99% of lexical retrieval is
    * DuckDB-oracled (q109b): per matching (doc, term) the term
    * frequency and document length, per term the document frequency,
    * plus the corpus totals the idf/avgdl terms need. The float BM25
    * arithmetic on top is O(matching postings), map-only
    * ([[bm25TopK]], rows-only by the float-output convention).
    *
    * Scale shape: the `isin(query terms)` filter lands BEFORE the
    * explode's shuffle, so the aggregation carries only the query
    * terms' postings — O(Σ posting sizes), independent of corpus
    * width; corpus totals are one cheap no-explode aggregation; df is
    * a reduction of the already-tiny tf frame, broadcast back.
    */
  def bm25Stats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, terms: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val base = df.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("__tk"))
    val tf = base
      .select(col("doc_id"), size(col("__tk")).as("dl"),
        explode(col("__tk")).as("token"))
      .filter(col("token").isin(terms.distinct: _*))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfCounts = tf.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val totals = base.select(count(lit(1)).as("n_docs"),
      sum(size(col("__tk"))).as("total_len"))
    tf.join(broadcast(dfCounts), Seq("token"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("token"), col("tf").cast("long").as("tf"),
        col("dl").cast("long").as("dl"), col("df").cast("long").as("df"),
        col("n_docs"), col("total_len").cast("long").as("total_len"))
  }

  /** BM25 top-k lexical retrieval (Robertson/Spärck Jones; the Lucene
    * formulation: idf = ln(1 + (N − df + ½)/(df + ½)), tf norm with
    * k1/b length normalization). Scores sum per doc over the query
    * terms; ties break on doc id. Float output → rows-only; the
    * integer statistics underneath are the oracled [[bm25Stats]].
    */
  def bm25TopK(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val s = bm25Stats(df, idCol, textCol, terms)
    val avgdl = col("total_len").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = col("tf").cast("double") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    s.withColumn("__s", idf * tfNorm)
      .groupBy(col("doc_id"))
      .agg(sum(col("__s")).as("score"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  // ---- PII scrubbing ---------------------------------------------------

  /** Email/IPv4 redaction patterns — deliberately restricted to regex
    * constructs with identical semantics in Java regex and RE2
    * (DuckDB), so scrubbed output is oracle-checkable bit-for-bit.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails then IPv4 addresses (order is part of the contract —
    * an email's domain can contain digits but an IP never contains
    * `@`). Pure `regexp_replace` chain: codegen'd, no UDF.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      Ipv4Re, "<IP>")

  // ---- language ID -----------------------------------------------------

  /** Small marker-word profiles; extend per deployment. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "que", "un"),
    "fr" -> Seq("le", "la", "de", "et", "est", "que", "un"),
    "zh" -> Seq("的", "是", "了", "我", "不", "在", "有"))

  /** Marker hits for one language: distinct tokens ∩ markers. */
  def langHits(text: Column, lang: String): Column =
    size(array_intersect(array_distinct(tokens(text)),
      array(langMarkers(lang).map(lit): _*)))

  /** Predicted language: argmax of marker hits, ties broken by language
    * code order (deterministic). 'und' when no marker hits at all.
    */
  def langId(text: Column): Column = {
    val scored = langMarkers.keys.toSeq.sorted.map(l => struct(
      langHits(text, l).as("hits"), lit(l).as("lang")))
    val best = sort_array(array(scored: _*), asc = false)(0)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  // ---- fingerprints ----------------------------------------------------

  /** 64-bit rolling polynomial content fingerprint over the normalized
    * text (lowercased, whitespace collapsed) — base 1000003 mod 2^61-1.
    * Used for cheap exact-dup detection where md5 strings are too fat.
    */
  val fingerprint64 = udf { (text: String) =>
    if (text == null) null.asInstanceOf[java.lang.Long]
    else {
      val norm = text.toLowerCase.trim.replaceAll("\\s+", " ")
      val MOD = (1L << 61) - 1
      var h = 0L
      var i = 0
      while (i < norm.length) {
        // h*base mod 2^61-1 via the exact 128-bit product: with
        // product = hi*2^64 + lo and 2^64 ≡ 8, 2^61 ≡ 1 (mod 2^61-1),
        // the residue is hi*8 + (lo >>> 61) + (lo & MOD), folded twice.
        val hi = Math.multiplyHigh(h, 1000003L)
        val lo = h * 1000003L
        var r = hi * 8 + (lo >>> 61) + (lo & MOD)
        if (r >= MOD) r -= MOD
        if (r >= MOD) r -= MOD
        h = (r + norm.charAt(i)) % MOD
        i += 1
      }
      java.lang.Long.valueOf(h)
    }
  }

  /** 64-bit simhash of a token array: per-token MurmurHash3, bitwise
    * majority vote. Deterministic across JVMs.
    */
  val simhash64 = udf { (toks: Seq[String]) =>
    if (toks == null) null.asInstanceOf[java.lang.Long]
    else {
      val counts = new Array[Int](64)
      toks.foreach { t =>
        val h1 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong & 0xFFFFFFFFL
        val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b).toLong & 0xFFFFFFFFL
        val h = (h1 << 32) | h2
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      var fp = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
      java.lang.Long.valueOf(fp)
    }
  }

  /** URL canonicalization — the dedup key of a web-curation pipeline
    * (Common-Crawl-style corpora dedup by canonical URL before any
    * content pass; one page is crawled under scheme/case/port/
    * tracking-param variants that would all survive content-blind
    * exact dedup). Pure NATIVE column work on Spark's `parse_url` +
    * array functions — no UDF, no shuffle; a 100 TB crawl
    * canonicalizes map-only and pays one hash shuffle only at the
    * group-by-canonical step.
    *
    * Rules (the industry-standard safe subset):
    *  - scheme and host lowercase; leading `www.` stripped
    *  - default ports dropped (`:80` http, `:443` https); explicit
    *    non-default ports kept
    *  - path: trailing `/` stripped (root `/` collapses to empty)
    *  - query: `utm_*`, `fbclid`, `gclid` tracking params dropped,
    *    the rest SORTED for order-independence; empty query dropped
    *  - fragment dropped
    *
    * Malformed urls (no parseable host) canonicalize to null — flag,
    * not poison.
    */
  def canonicalizeUrl(url: Column): Column = {
    val proto = lower(try_parse_url(url, lit("PROTOCOL")))
    val auth = try_parse_url(url, lit("AUTHORITY"))
    val hostRaw = lower(try_parse_url(url, lit("HOST")))
    val host = regexp_replace(hostRaw, "^www\\.", "")
    // AUTHORITY keeps the port; HOST drops it — their delta is the port
    val port = when(lower(auth).contains(":"),
      regexp_extract(lower(auth), ":(\\d+)$", 1)).otherwise(lit(""))
    val keepPort = (port =!= "") &&
      !(proto === "http" && port === "80") &&
      !(proto === "https" && port === "443")
    val path0 = coalesce(try_parse_url(url, lit("PATH")), lit(""))
    val path = regexp_replace(path0, "/$", "")
    val query0 = try_parse_url(url, lit("QUERY"))
    val params = filter(split(query0, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !p.startsWith("fbclid=") && !p.startsWith("gclid="))
    val query = when(query0.isNull || size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(params), "&")))
    when(proto.isNull || hostRaw.isNull, lit(null).cast("string"))
      .otherwise(concat(
        proto, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path, query))
  }

  /** Canonical host of a URL: lowercase, `www.` stripped, null when
    * unparseable — the grouping key of host-level crawl stats.
    */
  def urlHost(url: Column): Column =
    regexp_replace(lower(try_parse_url(url, lit("HOST"))), "^www\\.", "")

  /** Registered (registrable) domain of a host under the public-suffix
    * list — the DOMAIN-level filter key of web curation pipelines
    * (spam/SEO domain blocklists act here, not per-host). Backed by
    * [[Psl]]: the full publicsuffix.org algorithm (wildcards,
    * exceptions, longest match) over a vendored snapshot of the public
    * data, so ccTLD registries slice correctly (`a.example.co.uk` →
    * `example.co.uk`, not `co.uk`). A host that IS a public suffix —
    * including every single-label host, per the implicit `*` default
    * rule — has no registrable domain and yields null (which
    * [[domainFilter]] fails closed on). Codegen'd `StaticInvoke`, no
    * UDF: O(#labels) JVM-local hash probes per row inside the
    * whole-stage span.
    */
  def registeredDomain(host: Column): Column = {
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.types.StringType
    GraftShims.column(StaticInvoke(
      Psl.getClass, StringType, "registrableUtf8",
      Seq(GraftShims.expression(host)),
      inputTypes = Seq(StringType)))
  }

  /** Domain-blocklist gate: adds `domain` and `domain_kept` (false when
    * the registered domain is blocklisted OR the URL is unparseable —
    * unattributable rows fail closed). Map-only, no UDF, no shuffle.
    */
  def domainFilter(df: org.apache.spark.sql.DataFrame, urlCol: String,
      blockedDomains: Seq[String]): org.apache.spark.sql.DataFrame = {
    val domain = registeredDomain(urlHost(col(urlCol)))
    df.withColumn("domain", domain)
      .withColumn("domain_kept",
        domain.isNotNull && !domain.isin(blockedDomains.map(lit): _*))
  }

  /** Keep one row per canonical URL (lowest `orderCol` wins — the
    * crawl's first fetch), adding the `canonical_url` column. Rows
    * whose URL cannot be canonicalized are KEPT (null is not a dedup
    * group). One hash shuffle on the canonical key.
    */
  def urlDedup(df: org.apache.spark.sql.DataFrame, urlCol: String,
      orderCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withCanon = df.withColumn("canonical_url",
      canonicalizeUrl(col(urlCol)))
    val w = Window.partitionBy(col("canonical_url"))
      .orderBy(col(orderCol).asc)
    // null canonicals split off BEFORE the window: they skip the
    // shuffle entirely AND the plain rank-filter shape lets Catalyst
    // insert WindowGroupLimit (partial sort + per-group top-1 before
    // the exchange) — a when()-guarded rank would block both
    val kept = withCanon.filter(col("canonical_url").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    kept.unionByName(withCanon.filter(col("canonical_url").isNull))
  }

  /** 61-bit simhash over the ORACLED token-hash family: each token
    * (multiplicity counted, same as [[simhash64]]) is hashed with the
    * q38b mod-(2^61-1) rolling hash, and bit j of the fingerprint is the
    * strict majority vote of bit j across token hashes. All integer
    * arithmetic — DuckDB replays it exactly (bit-sum per j via
    * `(h >> j) & 1`, q35c), which [[simhash64]]'s MurmurHash3 kernel
    * cannot. Same normalization contract as q38b: lower → trim →
    * collapse whitespace; null/blank text → null.
    */
  val simhash61Oracle = udf { (text: String) =>
    if (text == null) null.asInstanceOf[java.lang.Long]
    else {
      val norm = text.toLowerCase.trim.replaceAll("\\s+", " ")
      if (norm.isEmpty) null.asInstanceOf[java.lang.Long]
      else {
        val counts = new Array[Int](61)
        norm.split(" ").foreach { t =>
          val h = graft.operators.Mod61.hashString(t)
          var b = 0
          while (b < 61) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        var fp = 0L
        var b = 0
        while (b < 61) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
        java.lang.Long.valueOf(fp)
      }
    }
  }
}
