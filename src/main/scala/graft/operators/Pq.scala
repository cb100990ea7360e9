package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-compression ANN path: split
  * each d-dim vector into `m` subvectors, k-means each subspace to `k`
  * centroids (k ≤ 256), store each vector as `m` one-byte codes. A
  * 1024-dim float vector (4 KiB) becomes m=16 bytes — 256× smaller —
  * so a 100 TB embedding corpus's index fits in cluster memory, which
  * is the entire point at scale.
  *
  * Search is ADC (asymmetric distance computation): per query, one
  * m×k lookup table of subspace inner products against the EXACT query
  * vector; a candidate's score is m table lookups + adds — no float
  * vector is ever read at scan time. Training mirrors
  * [[Ivf.trainCentroids]]: one TakeOrdered sample job, driver-local
  * seeded Lloyd (model is m×k×(d/m) doubles = the same few KB a coarse
  * quantizer ships), bit-deterministic regardless of partitioning.
  *
  * Reference has no ANN surface; this extends the brief's similarity
  * family (SURVEY §2 extension table) alongside LSH and IVF.
  */
object Pq {

  /** Trained codebooks: `centroids(sub)(code)(dim within subspace)`.
    * Subspace s covers dims [bounds(s), bounds(s+1)).
    */
  final case class Model(centroids: Array[Array[Array[Double]]], dim: Int) {
    def m: Int = centroids.length
    def k: Int = centroids.head.length
    def bounds: Array[Int] = Array.tabulate(m + 1)(s => s * dim / m)
  }

  /** Train per-subspace codebooks with deterministic Lloyd iterations
    * on a hash-ordered sample (one distributed job; see
    * [[Ivf.trainCentroids]] for why driver-local beats distributed
    * Lloyd for few-KB models).
    */
  def train(corpus: DataFrame, vecCol: String, m: Int, k: Int = 16,
      iters: Int = 4, maxTrainVectors: Int = 1 << 17): Model = {
    require(k <= 256, s"PQ codes are single bytes; k=$k > 256")
    val cap = math.min(maxTrainVectors, math.max(1 << 13, k * 512))
    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol).as("__v"))
      .withColumn("_h", xxhash64(col("__v")))
      .orderBy(col("_h"))
      .limit(cap)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "PQ training corpus is empty")
    val dim = sample.head.length
    require(m >= 1 && m <= dim, s"m=$m must be in [1, dim=$dim]")
    val bounds = Array.tabulate(m + 1)(s => s * dim / m)
    val centroids = Array.tabulate(m) { s =>
      val lo = bounds(s); val hi = bounds(s + 1); val dsub = hi - lo
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, lo, hi))
      // seed with the first k sample subvectors (hash order = stable)
      var cents = sub.take(math.min(k, sub.length)).map(_.clone)
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val counts = new Array[Long](cents.length)
        var i = 0
        while (i < sub.length) {
          val v = sub(i)
          val c = nearestSub(cents, v)
          counts(c) += 1
          val acc = sums(c)
          var d = 0
          while (d < dsub) { acc(d) += v(d); d += 1 }
          i += 1
        }
        cents = Array.tabulate(cents.length) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(dsub)(d => sums(c)(d) / counts(c))
        }
        it += 1
      }
      cents
    }
    Model(centroids, dim)
  }

  private def nearestSub(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0; var i = 0
      while (i < cent.length) { val df = v(i) - cent(i); d += df * df; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Encode vectors to m-byte PQ codes (BinaryType). Vectors are
    * unit-normalized first so ADC inner products rank by cosine.
    */
  def encode(df: DataFrame, vecCol: String, model: Model): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val enc = udf { (v: Seq[Float]) =>
      if (v == null) null
      else {
        val mod = bc.value
        val vec = normalized(v)
        val bounds = mod.bounds
        val code = new Array[Byte](mod.m)
        var s = 0
        while (s < mod.m) {
          val lo = bounds(s); val hi = bounds(s + 1)
          val sub = java.util.Arrays.copyOfRange(vec, lo, hi)
          code(s) = nearestSub(mod.centroids(s), sub).toByte
          s += 1
        }
        code
      }
    }
    enc(col(vecCol))
  }

  private def normalized(v: Seq[Float]): Array[Double] = {
    val arr = new Array[Double](v.length)
    var n = 0.0
    var i = 0
    while (i < v.length) { val x = v(i).toDouble; arr(i) = x; n += x * x; i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    i = 0
    while (i < arr.length) { arr(i) *= inv; i += 1 }
    arr
  }

  /** Exact inner product of a (normalized) query with a code's
    * reconstruction — the invariant ADC scores must satisfy; used by
    * tests and by rerank stages that keep the codes.
    */
  def reconstructScore(model: Model, query: Array[Double], code: Array[Byte]): Double = {
    val bounds = model.bounds
    var score = 0.0
    var s = 0
    while (s < model.m) {
      val cent = model.centroids(s)(code(s) & 0xFF)
      val lo = bounds(s)
      var d = 0
      while (d < cent.length) { score += query(lo + d) * cent(d); d += 1 }
      s += 1
    }
    score
  }

  /** ADC top-k: scan the m-byte codes, score = Σ_s lut(s·k + code(s)).
    * The per-query LUT (m×k doubles) is built once on the query side
    * and rides through the broadcast — the corpus side touches only
    * (id, code). At 1000 executors this is the classic
    * memory-resident-PQ scan: corpus I/O is m bytes/vector.
    *
    * `rerank > kNeighbors` enables the standard two-stage shape: ADC
    * shortlists `rerank` candidates per query, then ONLY those rows'
    * full float vectors are read for an exact cosine re-rank — the
    * expensive I/O is O(queries × rerank), not O(corpus), which is
    * precisely why PQ indexes pair with a rerank stage in production.
    * `rerank = 0` returns raw ADC ranks (`score` is then the
    * quantized inner product).
    */
  /** Per-query LUT of subspace inner products (m×k doubles, flat). */
  private def lutUdfFor(spark: org.apache.spark.sql.SparkSession,
      model: Model): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(model)
    udf { (q: Seq[Float]) =>
      if (q == null) null
      else {
        val mod = bc.value
        val qn = normalized(q)
        val bounds = mod.bounds
        val lut = new Array[Double](mod.m * mod.k)
        var s = 0
        while (s < mod.m) {
          val lo = bounds(s)
          val cents = mod.centroids(s)
          var c = 0
          while (c < cents.length) {
            val cent = cents(c)
            var acc = 0.0
            var d = 0
            while (d < cent.length) { acc += qn(lo + d) * cent(d); d += 1 }
            lut(s * mod.k + c) = acc
            c += 1
          }
          s += 1
        }
        lut.toSeq
      }
    }
  }

  /** ADC score = Σ_s lut(s·k + code(s)) — m lookups + adds per row. */
  private def adcScoreUdfFor(spark: org.apache.spark.sql.SparkSession,
      model: Model): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val k = model.k
    udf { (lut: Seq[Double], code: Array[Byte]) =>
      if (lut == null || code == null) null.asInstanceOf[java.lang.Double]
      else {
        var score = 0.0
        var s = 0
        while (s < code.length) {
          score += lut(s * k + (code(s) & 0xFF))
          s += 1
        }
        java.lang.Double.valueOf(score)
      }
    }
  }

  def adcTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      kNeighbors: Int, model: Model, rerank: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    val lutUdf = lutUdfFor(spark, model)
    val scoreUdf = adcScoreUdfFor(spark, model)
    // guide §2.5: the per-row PQ encode is the scan's CPU hotspot; widen
    // a one-split corpus before it (no-op on a multi-split input)
    val c = Similarity.parIfNarrow(corpus)
      .select(col(corpusId).as("neighbor_id"),
        encode(corpus, corpusVec, model).as("code"))
    val q = queries.select(col(queryId).as("query_id"),
      lutUdf(col(queryVec)).as("__lut"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val shortlistK = if (rerank > kNeighbors) rerank else kNeighbors
    val adc = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        scoreUdf(col("__lut"), col("code")).as("score"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= shortlistK)
    if (rerank <= kNeighbors) adc
    else {
      // exact rerank: fetch full vectors for the shortlist only
      val cv = corpus.select(col(corpusId).as("neighbor_id"),
        Similarity.normalize(col(corpusVec)).as("__cvec"))
      val qv = queries.select(col(queryId).as("query_id"),
        Similarity.normalize(col(queryVec)).as("__qvec"))
      val exact = adc.select(col("query_id"), col("neighbor_id"))
        .join(cv, Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.dot(col("__qvec"), col("__cvec")).as("score"))
      exact.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= kNeighbors)
    }
  }

  /** IVF-PQ — the production 100 TB ANN shape: an IVF coarse quantizer
    * prunes the corpus to `nprobe` cells per query, PQ codes make the
    * within-cell scan m bytes/vector, and an exact rerank touches only
    * `rerank` full float vectors per query. Versus [[adcTopK]]'s full
    * scan, the candidate set shrinks by ~nlist/nprobe; versus
    * [[Ivf.ivfTopK]]'s exact within-cell cosine, the scan reads codes,
    * not floats. Cell ids and codes are both computed in one corpus
    * pass (index-build analogue); the query side (LUT + probed cells)
    * broadcasts.
    */
  def ivfAdcTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      kNeighbors: Int, centroids: Array[Array[Double]], nprobe: Int,
      model: Model, rerank: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    val lutUdf = lutUdfFor(spark, model)
    val scoreUdf = adcScoreUdfFor(spark, model)
    // guide §2.5: cell-assign + PQ encode are per-row UDF CPU; widen a
    // one-split corpus before them (no-op on a multi-split input)
    val c = Similarity.parIfNarrow(corpus)
      .select(col(corpusId).as("neighbor_id"),
        Ivf.assignCells(corpus, corpusVec, centroids).as("cell"),
        encode(corpus, corpusVec, model).as("code"))
    val q = queries.select(col(queryId).as("query_id"),
      lutUdf(col(queryVec)).as("__lut"),
      explode(Ivf.probeCells(queries, queryVec, centroids, nprobe)).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val shortlistK = if (rerank > kNeighbors) rerank else kNeighbors
    val adc = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        scoreUdf(col("__lut"), col("code")).as("score"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= shortlistK)
    if (rerank <= kNeighbors) adc
    else {
      val cv = corpus.select(col(corpusId).as("neighbor_id"),
        Similarity.normalize(col(corpusVec)).as("__cvec"))
      val qv = queries.select(col(queryId).as("query_id"),
        Similarity.normalize(col(queryVec)).as("__qvec"))
      val exact = adc.select(col("query_id"), col("neighbor_id"))
        .join(cv, Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.dot(col("__qvec"), col("__cvec")).as("score"))
      exact.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= kNeighbors)
    }
  }

  // ---- persisted IVF-PQ index (build once, query many) -----------------

  /** Materialize the full IVF-PQ index — the production serving shape
    * of [[ivfAdcTopK]]: coarse centroids + PQ codebooks in one JSON
    * model file (written through the Hadoop FileSystem, same contract
    * as [[Ivf.buildIndex]]), and cell-assigned rows as parquet
    * PARTITIONED BY cell carrying (neighbor_id, cvec, code) — codes
    * feed the ADC scan, the normalized vectors make exact rerank
    * index-local (no join back to the source corpus at query time).
    * The build is the one corpus-scale pass; serving jobs load a
    * few-KB model and read only the probed cell partitions.
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, m: Int, k: Int, path: String): Unit = {
    val coarse = Ivf.trainCentroids(corpus, vecCol, nlist)
    require(coarse.nonEmpty,
      s"buildIndex: corpus has no vectors to index at $path")
    val model = train(corpus, vecCol, m, k)
    corpus.select(col(idCol).as("neighbor_id"),
        Similarity.normalize(col(vecCol)).as("cvec"),
        encode(corpus, vecCol, model).as("code"),
        Ivf.assignCells(corpus, vecCol, coarse).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def arr2(a: Array[Array[Double]]) = {
      val n = mapper.createArrayNode()
      a.foreach { row =>
        val r = mapper.createArrayNode(); row.foreach(r.add); n.add(r)
      }
      n
    }
    val root = mapper.createObjectNode()
    root.put("dim", model.dim)
    root.set[com.fasterxml.jackson.databind.JsonNode]("coarse", arr2(coarse))
    val cb = mapper.createArrayNode()
    model.centroids.foreach(sub => cb.add(arr2(sub)))
    root.set[com.fasterxml.jackson.databind.JsonNode]("codebooks", cb)
    val mp = new org.apache.hadoop.fs.Path(path, "model.json")
    val fs = mp.getFileSystem(
      corpus.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(mp, true)
    try out.write(mapper.writeValueAsBytes(root)) finally out.close()
  }

  /** Append a batch of new vectors under the FROZEN model (coarse
    * centroids AND codebooks from build time — same maintenance
    * contract as [[Ivf.appendToIndex]]; rebuild when quantization
    * drift matters). Only the touched cell partitions gain files.
    */
  def appendToIndex(batch: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val (coarse, model) = loadIndexModel(path)
    batch.select(col(idCol).as("neighbor_id"),
        Similarity.normalize(col(vecCol)).as("cvec"),
        encode(batch, vecCol, model).as("code"),
        Ivf.assignCells(batch, vecCol, coarse).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Load the (coarse centroids, PQ model) pair written by
    * [[buildIndex]] (any Hadoop FS).
    */
  def loadIndexModel(path: String): (Array[Array[Double]], Model) = {
    val mp = new org.apache.hadoop.fs.Path(path, "model.json")
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = mp.getFileSystem(conf)
    val len = fs.getFileStatus(mp).getLen.toInt // model-sized
    val bytes = new Array[Byte](len)
    val in = fs.open(mp)
    try in.readFully(bytes) finally in.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(bytes)
    def arr2(n: com.fasterxml.jackson.databind.JsonNode): Array[Array[Double]] = {
      val out = new Array[Array[Double]](n.size())
      var i = 0
      while (i < n.size()) {
        val row = n.get(i)
        val r = new Array[Double](row.size())
        var j = 0
        while (j < row.size()) { r(j) = row.get(j).asDouble(); j += 1 }
        out(i) = r; i += 1
      }
      out
    }
    val coarse = arr2(root.get("coarse"))
    val cbNode = root.get("codebooks")
    val codebooks = Array.tabulate(cbNode.size())(s => arr2(cbNode.get(s)))
    (coarse, Model(codebooks, root.get("dim").asInt()))
  }

  /** Query a persisted IVF-PQ index. The probed cell set is collected
    * first (bounded by nlist regardless of query count) and applied as
    * a LITERAL `cell IN (...)` predicate, so the partitioned layout
    * statically prunes to the probed cells (same contract as
    * [[Ivf.queryIndex]]); ADC + exact rerank then run exactly as in
    * [[ivfAdcTopK]], but against index-held codes and vectors — the
    * source corpus is never read.
    */
  def queryIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, queryId: String, queryVec: String,
      kNeighbors: Int, nprobe: Int, rerank: Int = 0): DataFrame = {
    val (coarse, model) = loadIndexModel(path)
    val lutUdf = lutUdfFor(spark, model)
    val scoreUdf = adcScoreUdfFor(spark, model)
    val q = queries.select(col(queryId).as("query_id"),
      lutUdf(col(queryVec)).as("__lut"),
      explode(Ivf.probeCells(queries, queryVec, coarse, nprobe)).as("cell"))
    val probedCells: Array[Int] = q.select(col("cell")).distinct()
      .collect().map(_.getInt(0)) // ≤ nlist rows — a model-sized action
    val cells = spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val shortlistK = if (rerank > kNeighbors) rerank else kNeighbors
    val adc = cells.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        scoreUdf(col("__lut"), col("code")).as("score"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= shortlistK)
    if (rerank <= kNeighbors) adc
    else {
      val cv = cells.select(col("neighbor_id"), col("cvec").as("__cvec"))
      val qv = queries.select(col(queryId).as("query_id"),
        Similarity.normalize(col(queryVec)).as("__qvec"))
      adc.select(col("query_id"), col("neighbor_id"))
        .join(cv, Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.dot(col("__qvec"), col("__cvec")).as("score"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= kNeighbors)
    }
  }
}
