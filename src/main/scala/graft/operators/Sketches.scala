package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketches for corpus-scale counting.
  *
  * Count-Min Sketch (Cormode & Muthukrishnan 2005): a depth×width grid
  * of counters; every gram occurrence increments one cell per row
  * (affine hash per row), a point query reads the MIN of its depth
  * cells — an overestimate, never an underestimate, with error ≤
  * corpus_size·e/width at confidence 1-e^-depth.
  *
  * Why this matters at 100 TB: EXACT gram counting keeps one aggregation
  * state per distinct gram — at corpus scale that is billions of keys
  * shuffled and spilled. The CMS aggregation state is capped at
  * depth×width cells PER TASK no matter how big the corpus is (the
  * hash-aggregate's key space IS the cell grid), the shuffle moves at
  * most depth×width rows per map task, and the finished sketch is a few
  * MB — small enough to BROADCAST, so lookups are map-side. This is the
  * standard scale path for "how often does each eval-set n-gram appear
  * in the training corpus" (decontamination triage, q86) and heavy-
  * hitter screens, with the exact join (q55) reserved for the
  * candidates the sketch flags.
  *
  * Cross-engine exactness: grams use q54's tokenization (trim, split on
  * whitespace, n-gram with multiplicity, whole-doc fallback below n
  * tokens); the row hashes are the q38b/q34d family — polynomial rolling
  * hash and affine maps g_d(h) = ((2d+1)·h + d·999983) mod (2^61-1) —
  * all integer arithmetic, so DuckDB replays sketch construction AND
  * lookups bit-exactly (HUGEINT). Reference analogue: probabilistic
  * state in dozer's record store (bloom.rs) — same sketch-vs-exact
  * trade, applied to counting.
  */
object Sketches {

  /** All n-gram occurrences (with multiplicity) of a text column —
    * q54's contract: tokens = trim+split `\s+`, docs shorter than n
    * tokens contribute their whole token string as one gram.
    */
  private val gramsUdf = udf { (text: String, n: Int) =>
    if (text == null) null
    else {
      val tok = text.trim.split("\\s+")
      if (tok.length < n) Seq(tok.mkString(" "))
      else tok.sliding(n).map(_.mkString(" ")).toSeq
    }
  }

  /** One row per gram occurrence: (gram). */
  def gramOccurrences(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(gramsUdf(col(textCol), lit(n))).as("gram"))

  /** CMS cell coordinates of one gram string for every sketch row:
    * cell_d = g_d(hash(gram)) mod width. Row-local integer math.
    */
  private[operators] final case class CmsCell(d: Int, cell: Long)
  private def cellsUdf = udf { (gram: String, depth: Int, width: Int) =>
    val h = Mod61.hashString(gram)
    (0 until depth).map { d =>
      val g = (Mod61.mulMod(2L * d + 1L, h) + d * 999983L) % Mod61.MOD
      CmsCell(d, g % width)
    }
  }

  /** Build the sketch: (d, cell, c) — at most depth×width rows total.
    * One pass over the gram stream; the hash-aggregate key space is the
    * cell grid, so per-task state and shuffle volume are bounded by
    * depth×width regardless of corpus size.
    */
  def cmsBuild(docs: DataFrame, textCol: String, n: Int,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"depth=$depth width=$width must be >= 1")
    gramOccurrences(docs, textCol, n)
      .select(explode(cellsUdf(col("gram"), lit(depth), lit(width))).as("dc"))
      .groupBy(col("dc.d").as("d"), col("dc.cell").as("cell"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge sketches built with the SAME (n, depth, width): cell-wise
    * counter addition. This is why CMS fits incremental corpora — a
    * per-batch/per-shard sketch merges into the running sketch without
    * revisiting any data (streaming decontamination counters, per-day
    * corpus snapshots), and merge(build(A), build(B)) == build(A ∪ B)
    * exactly (SketchSpec).
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("d", "cell").agg(sum("c").as("c"))

  /** Point-query the sketch for each distinct gram in `queries`:
    * est = MIN over d of the gram's cell counters (0 for an untouched
    * cell). The sketch side is broadcast — it is ≤ depth×width rows by
    * construction — so the lookup adds no shuffle of the query stream.
    */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, gramCol: String,
      depth: Int, width: Int): DataFrame =
    queries.select(col(gramCol).as("gram")).distinct()
      .select(col("gram"),
        explode(cellsUdf(col("gram"), lit(depth), lit(width))).as("dc"))
      .join(broadcast(sketch),
        col("dc.d") === sketch("d") && col("dc.cell") === sketch("cell"),
        "left")
      .groupBy(col("gram"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))

  // ------------------------------------------- log-linear histograms

  /** Bucket LOWER BOUND of a non-negative integer value in an
    * HdrHistogram-style log-linear layout with `bits` sub-bucket bits:
    * values below 2^bits map to themselves (exact); above, the top
    * bits+1 binary digits are kept and the rest zeroed, so the bucket
    * width at magnitude 2^e is 2^(e-bits) and the RELATIVE error is
    * bounded by 2^-bits everywhere. Every step is integer arithmetic
    * (`length(bin(v))-1` is the cross-engine integer log2; the zeroing
    * is `v - v % 2^(e-bits)`), so the mapping replays exactly in SQL.
    */
  def logBucketLo(v: Column, bits: Int): Column = {
    val e = (length(bin(v)) - 1).cast("int")
    val shift = greatest(e - bits, lit(0))
    // 2^shift exact in a double up to 2^62, cast back lossless
    val p = pow(lit(2.0), shift).cast("long")
    when(v <= 0L, lit(0L)).otherwise(v - (v % p))
  }

  /** Per-group log-linear HISTOGRAM: `(groupCols…, bucket_lo, n)` —
    * the mergeable quantile sketch every latency/size dashboard keeps
    * (HdrHistogram / Prometheus-style): counts are ADDITIVE, so
    * per-shard or per-day histograms roll up by bucket-wise sum
    * without revisiting data, and state is bounded by
    * O(64 · 2^bits) buckets per group regardless of input size.
    * One hash aggregation with map-side partial combine; all integers.
    */
  def logHistogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
      bits: Int = 5): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits=$bits out of range")
    df.filter(col(valueCol).isNotNull && col(valueCol) >= 0L)
      .groupBy(groupCols.map(col) :+
        logBucketLo(col(valueCol).cast("long"), bits).as("bucket_lo"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Quantile estimates read off the histogram: for each requested
    * `q`, the smallest bucket_lo whose cumulative count reaches
    * ceil(q · total) — the standard histogram walk, a LOWER bound on
    * the true quantile with relative error ≤ 2^-bits. Output:
    * `(groupCols…, q_pct INT, est_lo BIGINT, n_total BIGINT)`. All
    * integer arithmetic on integer inputs → exact cross-engine replay.
    */
  def logHistQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, bits: Int = 5,
      qPcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(p => p >= 1 && p <= 100),
      s"quantile percents must be in [1,100]: $qPcts")
    import org.apache.spark.sql.expressions.Window
    val hist = logHistogram(df, groupCols, valueCol, bits)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket_lo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tw = Window.partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("n")).over(w))
      .withColumn("__total", sum(col("n")).over(tw))
    val qs = explode(array(qPcts.map(lit): _*)).as("q_pct")
    cum.select(groupCols.map(col) :+ col("bucket_lo") :+ col("__cum") :+
        col("__total") :+ qs: _*)
      // cum ≥ ceil(q·total/100) without division: 100·cum ≥ q·total
      // (integer comparison — the percentile_disc rank rule)
      .filter(col("__cum") * 100L >= col("q_pct") * col("__total"))
      .groupBy(groupCols.map(col) :+ col("q_pct"): _*)
      .agg(min(col("bucket_lo")).as("est_lo"),
        first(col("__total")).as("n_total"))
  }
}
