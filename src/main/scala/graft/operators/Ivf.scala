package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the classic
  * centroid-partitioned ANN: k-means coarse quantizer over the corpus,
  * each vector indexed under its nearest centroid, queries probe the
  * `nprobe` closest cells.
  *
  * Corpus assignment and query probing are one scan each; the candidate
  * join is an equi-join on the cell id — O(corpus/nlist × nprobe) pairs
  * per query instead of O(corpus). Centroids are a driver-side model of
  * nlist×dim doubles (a few KB) broadcast into the UDFs, exactly like a
  * production IVF index's coarse quantizer.
  */
object Ivf {

  /** Train a coarse quantizer with deterministic Lloyd iterations.
    *
    * The training sample is gathered in ONE distributed no-shuffle job:
    * `orderBy(hash).limit(cap)` + collect compiles to
    * TakeOrderedAndProject — each partition keeps a cap-sized heap and
    * the driver merges, so even a 10⁸-row corpus contributes one scan
    * and ships back only `cap × dim` floats (~512 points per centroid,
    * a few MB — the same order as the centroid broadcast a distributed
    * Lloyd ships EVERY iteration). Lloyd then runs driver-local on the
    * sample: nlist×dim is a few KB of model, and iterating in sorted
    * hash order makes the centroids bit-deterministic regardless of
    * cluster partitioning — which a distributed FP aggregation cannot
    * guarantee. Assignment of the full corpus still happens
    * distributed, downstream.
    *
    * Two iterations suffice: cells only bucket candidates, they don't
    * rank them, so convergence past "roughly balanced Voronoi cells"
    * buys recall nothing.
    */
  def trainCentroids(corpus: DataFrame, vecCol: String, nlist: Int,
      iters: Int = 2, maxTrainVectors: Int = 1 << 17): Array[Array[Double]] = {
    val cap = math.min(maxTrainVectors, math.max(1 << 13, nlist * 512))
    // deterministic sample: the cap smallest vector hashes (partition-
    // independent); the nlist smallest seed the centroids
    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol).as("__v"))
      .withColumn("_h", xxhash64(col("__v")))
      .orderBy(col("_h"))
      .limit(cap)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    if (sample.isEmpty) return Array.empty
    var centroids = sample.take(nlist).map(_.clone)
    val k = centroids.length // corpus may hold fewer than nlist vectors
    val dim = centroids.head.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var i = 0
      while (i < sample.length) {
        val v = sample(i)
        val c = nearestArr(centroids, v)
        counts(c) += 1
        val s = sums(c)
        var d = 0
        while (d < dim) { s(d) += v(d); d += 1 }
        i += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else {
          val s = sums(c); val n = counts(c).toDouble
          Array.tabulate(dim)(d => s(d) / n)
        }
      }
      it += 1
    }
    centroids
  }

  private def nearestArr(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      val cent = cents(c)
      val n = math.min(cent.length, v.length)
      while (i < n) {
        val diff = v(i) - cent(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def nearest(cents: Array[Array[Double]], v: Seq[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      val cent = cents(c)
      while (i < cent.length && i < v.length) {
        val diff = v(i) - cent(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def nearestN(cents: Array[Array[Double]], v: Seq[Float], n: Int): Seq[Int] = {
    cents.indices.map { c =>
      var d = 0.0; var i = 0
      val cent = cents(c)
      while (i < cent.length && i < v.length) {
        val diff = v(i) - cent(i); d += diff * diff; i += 1
      }
      (c, d)
    }.sortBy(_._2).take(n).map(_._1)
  }

  /** Nearest-cell id column for a trained coarse quantizer — exposed so
    * other operators (semantic dedup, partition-by-cell layouts) can
    * reuse the same broadcast model + assignment the index uses.
    */
  def assignCells(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Float]) => nearest(bc.value, v))
    assignUdf(col(vecCol))
  }

  /** Query-side multi-probe: the `nprobe` nearest cell ids (array
    * column) — exposed so composed indexes (IVF-PQ) can reuse the
    * coarse quantizer's probing exactly as [[ivfTopK]] does.
    */
  def probeCells(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], nprobe: Int): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val probeUdf = udf((v: Seq[Float]) => nearestN(bc.value, v, nprobe))
    probeUdf(col(vecCol))
  }

  /** Shared candidate-ranking tail: cell-equi-join the (neighbor_id,
    * cvec, cell) corpus side with the broadcast (query_id, qvec, cell)
    * probe side, exact cosine, top-k per query. Both the in-memory and
    * persisted-index paths rank through here, so they cannot diverge.
    */
  private def rankCandidates(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.dot(col("qvec"), col("cvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def probeSide(queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[Array[Double]], nprobe: Int): DataFrame =
    queries.select(col(queryId).as("query_id"),
      Similarity.normalize(col(queryVec)).as("qvec"),
      explode(probeCells(queries, queryVec, centroids, nprobe)).as("cell"))

  /** Approximate top-k: corpus indexed by nearest cell, queries probe
    * their `nprobe` nearest cells, exact cosine within candidates.
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = trainCentroids(corpus, corpusVec, nlist)
    // guide §2.5: the per-row cell-assign UDF is the scan's CPU hotspot;
    // widen a one-split corpus before it (no-op on a multi-split input)
    val c = Similarity.parIfNarrow(corpus)
      .select(col(corpusId).as("neighbor_id"),
        Similarity.normalize(col(corpusVec)).as("cvec"),
        assignCells(corpus, corpusVec, centroids).as("cell"))
    rankCandidates(c, probeSide(queries, queryId, queryVec, centroids, nprobe), k)
  }

  // ---- persisted index (build once, query many) ------------------------

  /** Materialize the IVF index: centroids as a tiny JSON model file,
    * cell-assigned normalized vectors as parquet PARTITIONED BY cell —
    * so query-time probes are partition-pruned scans of exactly the
    * nprobe cells, not a full-corpus read. The build is the one
    * corpus-scale pass; serving jobs only load.
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, path: String): Unit = {
    val centroids = trainCentroids(corpus, vecCol, nlist)
    require(centroids.nonEmpty,
      s"buildIndex: corpus has no vectors to index at $path")
    corpus.select(col(idCol).as("neighbor_id"),
        Similarity.normalize(col(vecCol)).as("cvec"),
        assignCells(corpus, vecCol, centroids).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    val json = centroids.map(_.mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    // Hadoop FileSystem API, same as the cell parquet above — the model
    // file must land NEXT TO the cells on whatever FS `path` names
    // (HDFS/S3/local), not on the driver's local disk.
    val model = new org.apache.hadoop.fs.Path(path, "centroids.json")
    val fs = model.getFileSystem(
      corpus.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(model, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Append a batch of new vectors to an existing index under the
    * FROZEN model: cells are assigned with the centroids trained at
    * build time (k-means models are not incrementally retrained — the
    * standard IVF maintenance contract; rebuild when drift matters)
    * and the rows parquet-APPEND into their cell partitions, so only
    * the touched partitions gain files and concurrent queries keep
    * reading committed data. This is the streaming-ingest shape: call
    * it per micro-batch from foreachBatch.
    */
  def appendToIndex(batch: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val centroids = loadCentroids(path)
    batch.select(col(idCol).as("neighbor_id"),
        Similarity.normalize(col(vecCol)).as("cvec"),
        assignCells(batch, vecCol, centroids).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Load the model file written by [[buildIndex]] (any Hadoop FS). */
  def loadCentroids(path: String): Array[Array[Double]] = {
    val model = new org.apache.hadoop.fs.Path(path, "centroids.json")
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = model.getFileSystem(conf)
    val len = fs.getFileStatus(model).getLen.toInt // model-sized: nlist×dim
    val bytes = new Array[Byte](len)
    val in = fs.open(model)
    try in.readFully(bytes) finally in.close()
    val json = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    // minimal [[...],[...]] parser — the file is machine-written above
    val body = json.trim.stripPrefix("[").stripSuffix("]").trim
    require(body.nonEmpty, s"empty IVF index (no centroids) at $path")
    body.split("\\]\\s*,\\s*\\[")
      .map(_.replaceAll("[\\[\\]]", "").split(",").map(_.trim.toDouble))
  }

  /** Query a persisted index. The probed cell set is collected first
    * (bounded by nlist regardless of query count) and applied as a
    * LITERAL `cell IN (...)` predicate, so the partitioned layout
    * statically prunes to at most queries×nprobe cells — dynamic
    * partition pruning alone does not fire on an unfiltered probe side.
    * Exact cosine within candidates; same ranking path as [[ivfTopK]].
    */
  def queryIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nprobe: Int): DataFrame = {
    val centroids = loadCentroids(path)
    val q = probeSide(queries, queryId, queryVec, centroids, nprobe)
    val probedCells: Array[Int] = q.select(col("cell")).distinct()
      .collect().map(_.getInt(0)) // ≤ nlist rows — a model-sized action
    val cells = spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
    rankCandidates(cells, q, k)
  }
}
