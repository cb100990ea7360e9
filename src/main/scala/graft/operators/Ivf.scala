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

  /** Train a coarse quantizer with deterministic Lloyd iterations on
    * distributed aggregations (k-means++-less: seeded hash init keeps it
    * reproducible across runs and partitionings).
    */
  def trainCentroids(corpus: DataFrame, vecCol: String, nlist: Int,
      iters: Int = 2, maxTrainVectors: Int = 1 << 17): Array[Array[Double]] = {
    // Train on a deterministic hash-ordered sample capped at
    // maxTrainVectors (~256+ points per centroid is plenty for a coarse
    // quantizer) — at 10⁸+ corpus vectors the full set buys nothing and
    // multiplies every Lloyd pass. The capped sample is cached and
    // feeds every iteration; assignment of the full corpus still
    // happens downstream on the whole table.
    // Two iterations suffice: cells only bucket candidates, they don't
    // rank them, so convergence past "roughly balanced Voronoi cells"
    // buys recall nothing.
    val vecs = corpus.select(col(vecCol).as("__v"))
      .withColumn("_h", xxhash64(col("__v").cast("array<double>").cast("string")))
      .orderBy(col("_h"))
      .limit(maxTrainVectors)
      .persist()
    try {
      // deterministic init: the nlist smallest hashes seed the
      // centroids; dim comes from the seeds, avoiding a separate probe
      var centroids: Array[Array[Double]] = vecs
        .orderBy(col("_h"))
        .limit(nlist)
        .collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      val dim = centroids.headOption.map(_.length).getOrElse(0)
      var it = 0
      while (it < iters) {
        val bc = vecs.sparkSession.sparkContext.broadcast(centroids)
        val assignUdf = udf((v: Seq[Float]) => nearest(bc.value, v))
        // mean per cell via one aggregation over element-wise sums
        val assigned = vecs.select(assignUdf(col("__v")).as("cell"),
          col("__v").cast("array<double>").as("v"))
        val sums = assigned.groupBy(col("cell"))
          .agg(count(lit(1)).as("n"),
            array((0 until dim).map(d => sum(col("v")(d))): _*).as("vsum"))
          .collect()
        val next = centroids.clone()
        sums.foreach { r =>
          val cell = r.getInt(0)
          val n = r.getLong(1).toDouble
          next(cell) = r.getSeq[Double](2).map(_ / n).toArray
        }
        centroids = next
        it += 1
      }
      centroids
    } finally { vecs.unpersist(); () }
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

  /** Approximate top-k: corpus indexed by nearest cell, queries probe
    * their `nprobe` nearest cells, exact cosine within candidates.
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = trainCentroids(corpus, corpusVec, nlist)
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Float]) => nearest(bc.value, v))
    val probeUdf = udf((v: Seq[Float]) => nearestN(bc.value, v, nprobe))
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      Similarity.normalize(col(corpusVec)).as("cvec"),
      assignUdf(col(corpusVec)).as("cell"))
    val q = queries.select(col(queryId).as("query_id"),
      Similarity.normalize(col(queryVec)).as("qvec"),
      explode(probeUdf(col(queryVec))).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.dot(col("qvec"), col("cvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
