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
}
