package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode / feature-extraction /
  * frame-sampling as batched partition-local transforms.
  *
  * The Spark-side plumbing (schema, batching, partition locality) is
  * real; the codec calls are STUBBED with deterministic fakes because
  * no image/audio library ships in this environment — swap
  * [[MediaCodecs]] for a real decoder (JavaCV, TwelveMonkeys, ...) in
  * production. Batch shape mirrors a Pandas-UDF / mapInPandas pipeline:
  * rows are processed in fixed-size chunks so a vectorized codec can
  * amortize per-call overhead.
  */
object Multimodal {

  /** Typed metadata carried alongside the binary payload. */
  case class MediaMeta(kind: String, declaredWidth: Int, declaredHeight: Int)

  case class MediaRow(id: Long, payload: Array[Byte], kind: String)

  case class DecodedRow(
      id: Long, kind: String, nBytes: Long,
      width: Int, height: Int, channels: Int,
      meanLuma: Double)

  /** Stubbed codecs — deterministic functions of the payload bytes. */
  object MediaCodecs {
    val BatchSize = 64

    /** STUB: a real implementation decodes the image header; the fake
      * derives stable dimensions from the byte content so tests and
      * downstream plumbing behave like production.
      */
    def decodeImage(payload: Array[Byte]): (Int, Int, Int, Double) = {
      // ??? <- real codec goes here; deterministic fake below
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      val width = 64 + math.floorMod(h, 449L).toInt // 64..512
      val height = 64 + math.floorMod(h >>> 16, 449L).toInt
      val channels = 1 + math.floorMod(h >>> 32, 3L).toInt // 1..3
      val meanLuma = math.floorMod(h >>> 40, 256L).toDouble / 255.0
      (width, height, channels, meanLuma)
    }

    /** STUB: frame sampling — returns `n` pseudo-frame offsets. */
    def sampleFrameOffsets(payload: Array[Byte], n: Int): Seq[Long] = {
      val len = math.max(payload.length.toLong, 1L)
      (0 until n).map(i => i * len / n)
    }

    /** STUB: resize — a real implementation rescales pixels; the fake
      * deterministically folds the payload into width*height bytes so
      * output size is exactly what a real resize would produce.
      */
    def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // ??? <- real codec goes here; deterministic fake below
      val out = new Array[Byte](w * h)
      if (payload.nonEmpty) {
        var i = 0
        while (i < out.length) {
          out(i) = payload(i % payload.length)
          i += 1
        }
      }
      out
    }

    /** STUB: feature extraction — a real implementation runs a vision/
      * audio encoder; the fake hashes payload chunks into a stable
      * unit-normalized Float vector with the exact embedding shape, so
      * the output composes with the ANN operators
      * ([[graft.operators.Similarity]]) like a real encoder's would.
      */
    def extractFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      // ??? <- real encoder goes here; deterministic fake below
      val v = new Array[Float](dim)
      var h = -3750763034362895579L // FNV offset
      var i = 0
      while (i < payload.length) {
        h = (h ^ payload(i)) * 1099511628211L
        v(math.floorMod(h, dim.toLong).toInt) += 1.0f
        i += 1
      }
      var s = 0.0
      v.foreach(x => s += x.toDouble * x.toDouble)
      val n = math.sqrt(s)
      if (n > 0) { i = 0; while (i < dim) { v(i) = (v(i) / n).toFloat; i += 1 } }
      v
    }
  }

  /** Attach a binary payload column built from a string column — the
    * ingestion shape for blob-in-parquet multimodal datasets.
    */
  def withBinaryPayload(df: DataFrame, textCol: String, kind: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("kind", lit(kind))

  /** Batched decode over partitions — the mapInPandas analogue: each
    * partition is consumed in [[MediaCodecs.BatchSize]] chunks, one
    * codec call per row but grouped so a vectorized codec can be
    * dropped in without changing the plan shape. No shuffle.
    */
  def decodeBatched(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    ds.mapPartitions { rows =>
      rows.grouped(MediaCodecs.BatchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, c, luma) = MediaCodecs.decodeImage(r.payload)
          DecodedRow(r.id, r.kind, r.payload.length.toLong, w, h, c, luma)
        }
      }
    }
  }

  case class ResizedRow(id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  case class FeatureRow(id: Long, embedding: Array[Float])

  case class FrameRow(id: Long, frameIdx: Int, offset: Long)

  /** Batched resize — partition-local, no shuffle; output rows carry
    * the resized payload and its dimensions.
    */
  def resizeBatched(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedRow] = {
    implicit val enc = Encoders.product[ResizedRow]
    ds.mapPartitions { rows =>
      rows.grouped(MediaCodecs.BatchSize).flatMap(_.map { r =>
        ResizedRow(r.id, r.kind, MediaCodecs.resizeImage(r.payload, w, h), w, h)
      })
    }
  }

  /** Batched feature extraction → `(id, embedding)` with unit-norm
    * Float vectors, directly consumable by the ANN operators.
    */
  def featureExtractBatched(ds: Dataset[MediaRow], dim: Int): Dataset[FeatureRow] = {
    implicit val enc = Encoders.product[FeatureRow]
    ds.mapPartitions { rows =>
      rows.grouped(MediaCodecs.BatchSize).flatMap(_.map { r =>
        FeatureRow(r.id, MediaCodecs.extractFeatures(r.payload, dim))
      })
    }
  }

  /** Frame sampling: one output row per sampled frame offset —
    * the video-to-frames explosion of a multimodal pipeline.
    */
  def frameSample(ds: Dataset[MediaRow], framesPerDoc: Int): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaCodecs.sampleFrameOffsets(r.payload, framesPerDoc)
          .zipWithIndex.map { case (off, idx) => FrameRow(r.id, idx, off) }
      }
    }
  }

  /** End-to-end: documents text → binary payload → stub-decoded features.
    * Returns a DataFrame with deterministic columns (n_bytes is real;
    * width/height/channels/meanLuma come from the stub codec).
    */
  def decodeDocuments(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val media = withBinaryPayload(df, textCol, "image")
      .select(col(idCol).cast("long").as("id"), col("payload"), col("kind"))
      .as[MediaRow]
    decodeBatched(media).toDF()
  }
}
