package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode / feature-extraction /
  * frame-sampling as batched partition-local transforms.
  *
  * The IMAGE path is real: decode and re-encode run on the JDK's
  * `javax.imageio` (PNG/JPEG/BMP/GIF), resize is an exact bilinear
  * raster rescale — no non-JDK dependency. Frame sampling stays a
  * documented stub (the JDK ships no video codec) and feature
  * extraction is a deterministic encoder stand-in (a real one is a
  * vision model, not a codec). Batch shape mirrors a Pandas-UDF /
  * mapInPandas pipeline: rows are processed in fixed-size chunks so a
  * vectorized codec can amortize per-call overhead.
  */
object Multimodal {

  /** Typed metadata carried alongside the binary payload. */
  case class MediaMeta(kind: String, declaredWidth: Int, declaredHeight: Int)

  case class MediaRow(id: Long, payload: Array[Byte], kind: String)

  case class DecodedRow(
      id: Long, kind: String, nBytes: Long,
      ok: Boolean, width: Int, height: Int, channels: Int,
      meanLuma: Double)

  /** Image codecs on `javax.imageio` + raster math; video/encoder
    * entries are deterministic stand-ins (documented per method).
    */
  object MediaCodecs {
    val BatchSize = 64

    // ImageIO's default stream cache is a TEMP FILE per read/write —
    // per-row disk I/O that dominates a corpus-scale decode stage.
    // Byte-array payloads never need it; keep everything in memory.
    javax.imageio.ImageIO.setUseCache(false)

    /** Cheap magic-byte sniff for the formats the JDK can decode —
      * lets a mixed corpus skip the full reader-lookup + decode attempt
      * on rows that can't possibly be images (e.g. text bytes).
      */
    def looksLikeImage(p: Array[Byte]): Boolean =
      p.length >= 4 && (
        ((p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        ((p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8) || // JPEG
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
        (p(0) == 'B' && p(1) == 'M') ||
        ((p(0) & 0xFF) == 0x49 && (p(1) & 0xFF) == 0x49 &&
          (p(2) & 0xFF) == 0x2A) || // TIFF LE
        ((p(0) & 0xFF) == 0x4D && (p(1) & 0xFF) == 0x4D &&
          (p(3) & 0xFF) == 0x2A))   // TIFF BE

    /** Decode an image header+pixels: (width, height, bands, mean
      * sample value / 255). None for undecodable bytes (not an image,
      * truncated, unsupported format) — never throws.
      */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Double)] =
      try {
        if (!looksLikeImage(payload)) return None
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val raster = img.getRaster
          val w = img.getWidth; val h = img.getHeight
          val bands = raster.getNumBands
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h * bands
          Some((w, h, bands, (sum.toDouble / n.toDouble) / 255.0))
        }
      } catch { case _: Exception => None }

    /** Encode a constant-gray PNG — the deterministic image generator
      * for fixtures and synthetic multimodal corpora (real PNG bytes;
      * round-trips exactly through [[decodeImage]]).
      */
    def encodeGrayPng(w: Int, h: Int, gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, gray); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    // ---- audio: REAL RIFF/WAVE PCM16 codec (byte-level, no deps) ----

    /** Encode mono/stereo PCM16 samples as a standards-conformant WAV
      * file (RIFF header + fmt + data chunks, little-endian) — real
      * bytes any audio tool plays.
      */
    def encodeWavPcm16(sampleRate: Int, samples: Array[Short],
        channels: Int = 1): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort)                       // PCM
        .putShort(channels.toShort)
        .putInt(sampleRate)
        .putInt(sampleRate * channels * 2)         // byte rate
        .putShort((channels * 2).toShort)          // block align
        .putShort(16.toShort)                      // bits per sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Decode a PCM16 WAV: walk the RIFF chunk list (fmt before data,
      * unknown chunks skipped — real files carry LIST/INFO etc.),
      * validate PCM/16-bit, return (sampleRate, channels, nFrames,
      * meanAbsAmplitude in [0,1]). None on anything malformed — a
      * corrupt corpus row must flag, not throw.
      */
    def decodeWav(payload: Array[Byte]): Option[(Int, Int, Long, Double)] = {
      if (payload == null || payload.length < 44) return None
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag4(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      try {
        if (tag4() != "RIFF") return None
        bb.getInt // riff size (trust chunk walk, not this)
        if (tag4() != "WAVE") return None
        var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
        while (bb.remaining() >= 8) {
          val id = tag4()
          val len = bb.getInt
          if (len < 0 || len > bb.remaining()) return None
          id match {
            case "fmt " =>
              if (len < 16) return None
              val pos = bb.position()
              val audioFormat = bb.getShort
              val channels = bb.getShort.toInt
              val sampleRate = bb.getInt
              bb.getInt; bb.getShort // byte rate, block align
              val bits = bb.getShort
              if (audioFormat != 1 || bits != 16 || channels < 1 ||
                sampleRate <= 0) return None // rate 0 ⇒ duration = ∞
              fmt = Some((channels, sampleRate))
              bb.position(pos + len + (len & 1)) // chunks pad to even
            case "data" =>
              val (channels, sampleRate) = fmt.getOrElse(return None)
              val nSamples = len / 2
              var sumAbs = 0.0
              var i = 0
              val pos = bb.position()
              while (i < nSamples) {
                sumAbs += math.abs(bb.getShort(pos + i * 2).toInt)
                i += 1
              }
              val nFrames = nSamples.toLong / channels
              val mean = if (nSamples == 0) 0.0 else sumAbs / nSamples / 32768.0
              return Some((sampleRate, channels, nFrames, mean))
            case _ =>
              bb.position(bb.position() + len + (len & 1))
          }
        }
        None // no data chunk
      } catch { case _: RuntimeException => None }
    }

    /** Decode a PCM16 WAV to its raw samples (same chunk walk as
      * [[decodeWav]], materializing the data chunk).
      */
    def decodeWavPcm(payload: Array[Byte]): Option[(Int, Int, Array[Short])] = {
      decodeWav(payload).flatMap { case (_, _, _, _) =>
        // re-walk to slice the data chunk (decodeWav validated shape)
        val bb = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.position(12)
        var fmt: Option[(Int, Int)] = None
        while (bb.remaining() >= 8) {
          val a = new Array[Byte](4); bb.get(a)
          val id = new String(a, "US-ASCII")
          val len = bb.getInt
          id match {
            case "fmt " =>
              val pos = bb.position()
              bb.getShort
              val channels = bb.getShort.toInt
              val sampleRate = bb.getInt
              fmt = Some((channels, sampleRate))
              bb.position(pos + len + (len & 1))
            case "data" =>
              val (channels, sampleRate) = fmt.get
              val n = len / 2
              val out = new Array[Short](n)
              var i = 0
              val pos = bb.position()
              while (i < n) { out(i) = bb.getShort(pos + i * 2); i += 1 }
              return Some((sampleRate, channels, out))
            case _ => bb.position(bb.position() + len + (len & 1))
          }
        }
        None
      }
    }

    /** REAL audio features: per `window`-FRAME window, RMS amplitude
      * (normalized to [0,1]) and zero-crossing rate (strict sign flips
      * / (window length − 1); 0 for length-1 windows). The final window
      * may be short. Multi-channel audio is downmixed to mono first
      * (per-frame channel mean) — windowing the raw interleaved array
      * would count cross-channel sign flips as crossings. Deterministic
      * double math.
      */
    def audioFeatures(payload: Array[Byte], window: Int)
        : Option[IndexedSeq[(Double, Double)]] = {
      require(window >= 1, s"window=$window must be >= 1")
      decodeWavPcm(payload).map { case (_, channels, interleaved) =>
        val samples: Array[Short] =
          if (channels <= 1) interleaved
          else Array.tabulate(interleaved.length / channels) { f =>
            var c = 0; var sum = 0
            while (c < channels) { sum += interleaved(f * channels + c); c += 1 }
            (sum / channels).toShort
          }
        samples.grouped(window).map { frame =>
          var sumSq = 0.0
          var flips = 0
          var i = 0
          while (i < frame.length) {
            val s = frame(i).toDouble
            sumSq += s * s
            if (i > 0 && frame(i).toInt * frame(i - 1).toInt < 0) flips += 1
            i += 1
          }
          val rms = math.sqrt(sumSq / frame.length) / 32768.0
          val zcr = if (frame.length > 1) flips.toDouble / (frame.length - 1) else 0.0
          (rms, zcr)
        }.toIndexedSeq
      }
    }

    /** Audio content fingerprint over the REAL WAV decode path — the
      * acoustic analogue of [[perceptualHash]]: bit w is set iff the
      * RMS energy of window w+1 exceeds window w (first 64 windows ⇒ ≤
      * 63 bits). The energy-delta SIGN pattern is what survives gain
      * changes poorly but re-encodings well — the classic
      * Haitsma-Kalker fingerprint shape reduced to the energy band the
      * PCM decoder provides (no FFT in the JDK). None for undecodable
      * bytes.
      */
    def audioFingerprint(payload: Array[Byte], window: Int): Option[Long] =
      audioFeatures(payload, window).map { wins =>
        var f = 0L
        val n = math.min(wins.length, 64)
        var w = 0
        while (w < n - 1) {
          if (wins(w + 1)._1 > wins(w)._1) f |= 1L << w
          w += 1
        }
        f
      }

    // ---- frame container ("GFRM") ----------------------------------
    // The JDK ships no video codec, so commercial containers (mp4/webm)
    // stay out of reach — but frame SAMPLING is a container-parsing
    // problem, not a codec problem. GFRM is a minimal keyframe-only
    // container (magic "GFRM", u32-BE frame count, then per frame a
    // u32-BE length + an intact still-image payload, e.g. PNG). Parsing
    // it is real byte-level work: seek the index, slice the sampled
    // frames, hand each to the REAL image decoder. The same code path
    // works for any keyframe container once a demuxer for it exists.

    private val FrameMagic = Array[Byte]('G', 'F', 'R', 'M')

    /** Serialize still-image payloads into a GFRM container. */
    def encodeFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.write(FrameMagic)
      dos.writeInt(frames.length)
      frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
      dos.flush()
      out.toByteArray
    }

    /** Frame count from the container header without touching frame
      * bytes — the metadata probe. None if not a GFRM payload.
      */
    def frameCount(payload: Array[Byte]): Option[Int] =
      if (payload.length < 8 ||
          !java.util.Arrays.equals(payload.slice(0, 4), FrameMagic)) None
      else Some(java.nio.ByteBuffer.wrap(payload, 4, 4).getInt)

    /** Parse a GFRM container into its frame payloads. None on a
      * non-GFRM or structurally corrupt payload (bad length prefix,
      * truncated frame) — never throws.
      */
    def decodeFrames(payload: Array[Byte]): Option[IndexedSeq[Array[Byte]]] =
      frameCount(payload).flatMap { n =>
        try {
          val buf = java.nio.ByteBuffer.wrap(payload, 8, payload.length - 8)
          val frames = Vector.newBuilder[Array[Byte]]
          var i = 0
          var ok = n >= 0
          while (ok && i < n) {
            if (buf.remaining() < 4) ok = false
            else {
              val len = buf.getInt
              if (len < 0 || buf.remaining() < len) ok = false
              else {
                val f = new Array[Byte](len)
                buf.get(f)
                frames += f
                i += 1
              }
            }
          }
          if (ok && buf.remaining() == 0) Some(frames.result()) else None
        } catch { case _: Exception => None }
      }

    /** Uniform temporal sampling: `k` frame indices spread over `n`
      * frames — index i ↦ floor(i·n/k), the standard stride sampler
      * (every frame once when k ≥ n would repeat; callers cap k at n).
      */
    def uniformFrameIndices(n: Int, k: Int): Seq[Int] = {
      val kk = math.min(math.max(k, 0), n)
      (0 until kk).map(i => (i.toLong * n / kk).toInt)
    }

    /** Real resize: decode via `javax.imageio`, exact bilinear rescale
      * on the raster (deterministic double math, no AWT rendering
      * pipeline), re-encode as PNG. None if the payload doesn't decode.
      */
    def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      try {
        if (!looksLikeImage(payload)) return None
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (src == null || w <= 0 || h <= 0) None
        else {
          val sr = src.getRaster
          val sw = src.getWidth; val sh = src.getHeight
          val bands = sr.getNumBands
          // 1 band = gray, 2 bands = gray+alpha (alpha dropped, NOT a
          // color channel); 3+ = color (alpha dropped)
          val outType =
            if (bands <= 2) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
            else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
          val outBands = if (bands <= 2) 1 else 3
          val dst = new java.awt.image.BufferedImage(w, h, outType)
          val dr = dst.getRaster
          val xScale = sw.toDouble / w
          val yScale = sh.toDouble / h
          var y = 0
          while (y < h) {
            // sample at the scaled pixel center, clamped to the source
            val sy = math.min(math.max((y + 0.5) * yScale - 0.5, 0.0), sh - 1.0)
            val y0 = sy.toInt; val y1 = math.min(y0 + 1, sh - 1)
            val fy = sy - y0
            var x = 0
            while (x < w) {
              val sx = math.min(math.max((x + 0.5) * xScale - 0.5, 0.0), sw - 1.0)
              val x0 = sx.toInt; val x1 = math.min(x0 + 1, sw - 1)
              val fx = sx - x0
              var b = 0
              while (b < outBands) {
                val sb = b // outBands ≤ color bands by construction
                val v =
                  sr.getSample(x0, y0, sb) * (1 - fx) * (1 - fy) +
                  sr.getSample(x1, y0, sb) * fx * (1 - fy) +
                  sr.getSample(x0, y1, sb) * (1 - fx) * fy +
                  sr.getSample(x1, y1, sb) * fx * fy
                dr.setSample(x, y, b, math.min(255, math.max(0,
                  math.rint(v).toInt)))
                b += 1
              }
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", out)
          Some(out.toByteArray)
        }
      } catch { case _: Exception => None }

    /** STAND-IN: feature extraction — a real implementation runs a
      * vision/audio encoder model (not a codec, so out of JDK reach);
      * this deterministic byte-hash produces a stable unit-normalized
      * Float vector with the exact embedding shape, so the output
      * composes with the ANN operators ([[graft.operators.Similarity]])
      * like a real encoder's would.
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

    /** A REAL (non-learned) encoder through the pluggable seam: decode
      * via the genuine javax.imageio path, histogram the luma samples
      * into `bins` buckets, unit-normalize — an actual pixel-space
      * feature (two images with different brightness distributions get
      * different vectors; undecodable payloads get the zero vector so
      * the row is visibly unembedded rather than dropped or faked).
      * Stands where a vision model would plug in via
      * [[Multimodal.featureExtractBatched]]'s encoder parameter.
      */
    def lumaHistogramEncoder(bins: Int): Array[Byte] => Array[Float] =
      payload =>
        try {
          val img =
            if (!looksLikeImage(payload)) null
            else javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
          if (img == null) new Array[Float](bins)
          else {
            val v = new Array[Float](bins)
            val raster = img.getRaster
            val w = img.getWidth; val h = img.getHeight
            val bands = raster.getNumBands
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                var s = 0
                var b = 0
                while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
                val luma = s / bands // 0..255 mean over bands
                v(math.min(bins - 1, luma * bins / 256)) += 1.0f
                x += 1
              }
              y += 1
            }
            var ss = 0.0
            v.foreach(f => ss += f.toDouble * f.toDouble)
            val n = math.sqrt(ss)
            if (n > 0) {
              var i = 0
              while (i < bins) { v(i) = (v(i) / n).toFloat; i += 1 }
            }
            v
          }
        } catch { case _: Exception => new Array[Float](bins) }

    /** Perceptual image hashes over the REAL decode path: the image's
      * luma plane is bilinearly resampled (the [[resizeImage]] kernel,
      * kept in exact doubles) to an 8×8 grid, then
      *   - aHash (64 bits): bit i=gy·8+gx set iff grid(gx,gy) > grid
      *     mean (strict; ties clear);
      *   - dHash (56 bits): bit i=gy·7+gx set iff grid(gx+1,gy) >
      *     grid(gx,gy) — the horizontal-gradient variant computed from
      *     the same grid (classic dHash resamples to 9×8; one grid
      *     keeps the kernel single-pass and the SQL replay exact).
      * Luma: band 0 for gray; ITU-R 601 (0.299, 0.587, 0.114) for
      * color. None for undecodable bytes.
      */
    def perceptualHash(payload: Array[Byte]): Option[(Long, Long)] =
      try {
        if (!looksLikeImage(payload)) return None
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) return None
        val r = img.getRaster
        val sw = img.getWidth; val sh = img.getHeight
        val bands = r.getNumBands
        def luma(x: Int, y: Int): Double =
          if (bands >= 3)
            0.299 * r.getSample(x, y, 0) + 0.587 * r.getSample(x, y, 1) +
              0.114 * r.getSample(x, y, 2)
          else r.getSample(x, y, 0).toDouble
        val grid = new Array[Double](64)
        val xScale = sw / 8.0; val yScale = sh / 8.0
        var gy = 0
        while (gy < 8) {
          val sy = math.min(math.max((gy + 0.5) * yScale - 0.5, 0.0), sh - 1.0)
          val y0 = sy.toInt; val y1 = math.min(y0 + 1, sh - 1); val fy = sy - y0
          var gx = 0
          while (gx < 8) {
            val sx = math.min(math.max((gx + 0.5) * xScale - 0.5, 0.0), sw - 1.0)
            val x0 = sx.toInt; val x1 = math.min(x0 + 1, sw - 1); val fx = sx - x0
            grid(gy * 8 + gx) =
              luma(x0, y0) * (1 - fx) * (1 - fy) + luma(x1, y0) * fx * (1 - fy) +
                luma(x0, y1) * (1 - fx) * fy + luma(x1, y1) * fx * fy
            gx += 1
          }
          gy += 1
        }
        var sum = 0.0
        grid.foreach(sum += _)
        val mean = sum / 64.0
        var a = 0L; var d = 0L
        var i = 0
        while (i < 64) {
          if (grid(i) > mean) a |= 1L << i
          i += 1
        }
        gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 7) {
            if (grid(gy * 8 + gx + 1) > grid(gy * 8 + gx))
              d |= 1L << (gy * 7 + gx)
            gx += 1
          }
          gy += 1
        }
        Some((a, d))
      } catch { case _: Exception => None }
  }

  /** Attach a binary payload column built from a string column — the
    * ingestion shape for blob-in-parquet multimodal datasets.
    */
  def withBinaryPayload(df: DataFrame, textCol: String, kind: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("kind", lit(kind))

  // ---- content-defined chunking (binary dedup) -----------------------

  /** Gear table for FastCDC-style content-defined chunking (Xia et al.,
    * USENIX ATC'16): 256 pseudo-random 64-bit constants from a fixed
    *-seed SplitMix64 so boundaries are deterministic everywhere.
    */
  private val gearTable: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      // SplitMix64 step
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** Gear constants as unsigned decimal strings — embedded in the q80
    * DuckDB oracle so the oracle replays the SAME table this kernel
    * uses (one source of truth; the rolling hash is pure integer math
    * mod 2^64, which DuckDB replays in HUGEINT).
    */
  def gearConstantsUnsigned: IndexedSeq[String] =
    gearTable.map(java.lang.Long.toUnsignedString).toIndexedSeq

  /** Content-defined chunk boundaries of a byte payload: gear rolling
    * hash, cut when the top `avgBits` bits are zero and the chunk is at
    * least `minSize`; hard cut at `maxSize`. Because boundaries depend
    * only on local content, a shared segment chunks identically at ANY
    * byte offset — the property fixed-size chunking lacks and the whole
    * point for cross-document binary dedup (common headers, embedded
    * assets, re-encoded copies). Returns (offset, length, md5) per
    * chunk. Row-local kernel: map-only at any scale; the cross-corpus
    * dedup is then one digest-keyed shuffle.
    */
  def cdcChunks(bytes: Array[Byte], minSize: Int, avgBits: Int,
      maxSize: Int): Seq[(Long, Long, String)] = {
    require(minSize >= 1 && maxSize >= minSize && avgBits >= 1)
    if (bytes == null || bytes.isEmpty) return Nil
    val mask = (1L << avgBits) - 1 // cut when (h & mask) == 0
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + gearTable(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize ||
          i == bytes.length - 1) {
        md.reset()
        md.update(bytes, start, len)
        out += ((start.toLong, len.toLong,
          md.digest().map("%02x".format(_)).mkString))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    out.toSeq
  }

  /** Explode a binary column into content-defined chunks:
    * (idCol, chunk_offset, chunk_len, digest). One kernel pass, no
    * shuffle; defaults give ~2^avgBits-byte average chunks.
    */
  def chunkify(df: DataFrame, idCol: String, binCol: String,
      minSize: Int = 64, avgBits: Int = 8, maxSize: Int = 4096): DataFrame = {
    val u = udf { (b: Array[Byte]) => cdcChunks(b, minSize, avgBits, maxSize) }
    df.filter(col(binCol).isNotNull)
      .select(col(idCol).as("doc_id"), explode(u(col(binCol))).as("c"))
      .select(col("doc_id"), col("c._1").as("chunk_offset"),
        col("c._2").as("chunk_len"), col("c._3").as("digest"))
  }

  /** Cross-corpus chunk dedup report: per duplicated digest, the number
    * of holders and total duplicated bytes (digest-keyed shuffle — the
    * only exchange in the job).
    */
  def chunkDedup(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("digest"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_copies"),
        first(col("chunk_len")).as("chunk_len"))
      .filter(col("n_copies") > 1)

  /** Batched decode over partitions — the mapInPandas analogue: each
    * partition is consumed in [[MediaCodecs.BatchSize]] chunks, one
    * codec call per row but grouped so a vectorized codec can be
    * dropped in without changing the plan shape. No shuffle.
    * Undecodable payloads keep their row (`nBytes` is always real)
    * with `ok = false` and sentinel dimensions.
    */
  def decodeBatched(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    ds.mapPartitions { rows =>
      rows.grouped(MediaCodecs.BatchSize).flatMap { batch =>
        batch.map { r =>
          MediaCodecs.decodeImage(r.payload) match {
            case Some((w, h, c, luma)) =>
              DecodedRow(r.id, r.kind, r.payload.length.toLong,
                ok = true, w, h, c, luma)
            case None =>
              DecodedRow(r.id, r.kind, r.payload.length.toLong,
                ok = false, -1, -1, 0, -1.0)
          }
        }
      }
    }
  }

  case class ResizedRow(id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  case class FeatureRow(id: Long, embedding: Array[Float])

  case class FrameRow(id: Long, frameIdx: Int, nFrames: Int,
      ok: Boolean, width: Int, height: Int, meanLuma: Double)

  /** Batched resize — partition-local, no shuffle; output rows carry
    * the re-encoded PNG payload and the target dimensions. Payloads
    * that don't decode as images are dropped (count them upstream via
    * [[decodeBatched]]'s `ok` flag if lossiness matters).
    */
  def resizeBatched(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedRow] = {
    implicit val enc = Encoders.product[ResizedRow]
    ds.mapPartitions { rows =>
      rows.grouped(MediaCodecs.BatchSize).flatMap(_.flatMap { r =>
        MediaCodecs.resizeImage(r.payload, w, h)
          .map(png => ResizedRow(r.id, r.kind, png, w, h))
      })
    }
  }

  /** Batched feature extraction → `(id, embedding)` with unit-norm
    * Float vectors, directly consumable by the ANN operators. Default
    * encoder is the deterministic byte-hash stand-in
    * ([[MediaCodecs.extractFeatures]]).
    */
  def featureExtractBatched(ds: Dataset[MediaRow], dim: Int): Dataset[FeatureRow] =
    featureExtractBatched(ds, MediaCodecs.extractFeatures(_, dim))

  /** The pluggable-encoder seam: any `Array[Byte] => Array[Float]` —
    * a real vision/audio model wrapper, [[MediaCodecs.lumaHistogramEncoder]],
    * or the stand-in. The encoder closure ships to executors; keep its
    * captured state model-sized (weights, not data). Plan shape is
    * unchanged: partition-local batched map, no shuffle.
    */
  def featureExtractBatched(ds: Dataset[MediaRow],
      encoder: Array[Byte] => Array[Float]): Dataset[FeatureRow] = {
    implicit val enc = Encoders.product[FeatureRow]
    ds.mapPartitions { rows =>
      rows.grouped(MediaCodecs.BatchSize).flatMap(_.map { r =>
        FeatureRow(r.id, encoder(r.payload))
      })
    }
  }

  /** REAL frame sampling: parse the GFRM container index, slice `k`
    * uniformly-spread keyframes, decode each with the REAL image
    * decoder — the video-to-frames explosion of a multimodal pipeline.
    * Partition-local (no shuffle); only the sampled frames are ever
    * decoded, so cost is O(k), not O(container frames). A payload that
    * is not a parseable container yields one `ok = false` row with
    * sentinel dimensions (corpus-hygiene accounting, same contract as
    * [[decodeBatched]]).
    */
  def frameSample(ds: Dataset[MediaRow], framesPerDoc: Int): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    ds.mapPartitions { rows =>
      rows.grouped(MediaCodecs.BatchSize).flatMap(_.flatMap { r =>
        MediaCodecs.decodeFrames(r.payload) match {
          case Some(frames) if frames.nonEmpty =>
            MediaCodecs.uniformFrameIndices(frames.length, framesPerDoc)
              .map { idx =>
                MediaCodecs.decodeImage(frames(idx)) match {
                  case Some((w, h, _, luma)) =>
                    FrameRow(r.id, idx, frames.length, ok = true, w, h, luma)
                  case None =>
                    FrameRow(r.id, idx, frames.length, ok = false, -1, -1, -1.0)
                }
              }
          case _ =>
            Seq(FrameRow(r.id, -1, 0, ok = false, -1, -1, -1.0))
        }
      })
    }
  }

  final case class VideoFpRow(id: Long, ok: Boolean, nFrames: Int, fp: Long)

  /** Temporal video fingerprint — the sequence analogue of the image
    * and audio fingerprints: parse the container (REAL byte-level GFRM
    * demux), decode every frame with the REAL image decoder, and set
    * bit f iff mean luma rises from frame f to f+1 (first 64 frames).
    * The luma-delta sign contour survives re-encoding and per-frame
    * brightness detail loss; shot-boundary-ish content changes flip
    * many bits. Shuffle-free batched map like the other codec stages.
    */
  def videoFingerprintBatched(ds: Dataset[MediaRow]): Dataset[VideoFpRow] = {
    implicit val enc = Encoders.product[VideoFpRow]
    ds.mapPartitions(_.map { r =>
      val decoded = MediaCodecs.decodeFrames(r.payload).flatMap { frames =>
        val lumas = frames.map(f => MediaCodecs.decodeImage(f).map(_._4))
        if (frames.isEmpty || lumas.exists(_.isEmpty)) None
        else Some((frames.length, lumas.map(_.get)))
      }
      decoded match {
        case Some((n, l)) =>
          var fp = 0L
          var i = 0
          while (i < math.min(l.length - 1, 63)) {
            if (l(i + 1) > l(i)) fp |= 1L << i
            i += 1
          }
          VideoFpRow(r.id, ok = true, n, fp)
        case None => VideoFpRow(r.id, ok = false, 0, 0L)
      }
    })
  }

  /** End-to-end: documents text → binary payload → decode attempt.
    * `n_bytes` is real for every row; text bytes are not an image, so
    * the codec columns come back `ok = false` with sentinels — the
    * corpus-hygiene shape (count undecodable rows) of a real pipeline.
    */
  def decodeDocuments(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val media = withBinaryPayload(df, textCol, "image")
      .select(col(idCol).cast("long").as("id"), col("payload"), col("kind"))
      .as[MediaRow]
    decodeBatched(media).toDF()
  }

  /** Deterministic REAL-PNG corpus from a keyed table: each row gets a
    * constant-gray PNG whose dimensions and gray level are closed-form
    * functions of the id —
    *
    *   width = 16 + id % 32,  height = 16 + id % 17,  gray = id % 200
    *
    * so any decode/resize stage downstream is oracle-checkable in SQL
    * (mean luma of a constant image = gray/255). The bytes are genuine
    * `javax.imageio` PNG output, not a fake.
    */
  /** Deterministic REAL-VIDEO corpus: each row gets a GFRM container of
    * `2 + id % 4` genuine PNG frames with closed-form per-frame pixels —
    *
    *   frame f of id: width = 8 + id % 8, height = 8 + id % 5,
    *                  gray = (id·31 + f·17) % 200
    *
    * so a frame-sampling stage downstream is oracle-checkable in SQL
    * (sampled indices = floor(i·n/k); mean luma of a constant frame =
    * gray/255). The container and every frame are real bytes through
    * the real encoder — nothing in the read path knows the content is
    * synthetic.
    */
  def renderVideos(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 2 + math.floorMod(id, 4L).toInt
          val w = 8 + math.floorMod(id, 8L).toInt
          val h = 8 + math.floorMod(id, 5L).toInt
          val frames = (0 until n).map { f =>
            MediaCodecs.encodeGrayPng(w, h,
              math.floorMod(id * 31 + f * 17, 200L).toInt)
          }
          MediaRow(id, MediaCodecs.encodeFrames(frames), "video")
        }
      }
  }

  /** Render real ISO-BMFF (MP4-family) files with the [[renderVideos]]
    * closed forms: `2 + id % 4` constant-gray PNG samples (gray =
    * `(id·31 + idx·17) % 200`), timescale 1000 with a 100-tick sample
    * delta (→ ts_ms = idx·100), and an `stss` marking every 2nd sample
    * sync. Every byte goes through [[IsoBmff.mux]] — a real box tree
    * with real sample tables; only the sample payload codec is PNG
    * instead of H.264 (the JDK ships no video codec — documented).
    */
  def renderMp4s(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 2 + math.floorMod(id, 4L).toInt
          val w = 8 + math.floorMod(id, 8L).toInt
          val h = 8 + math.floorMod(id, 5L).toInt
          val frames = (0 until n).map { f =>
            MediaCodecs.encodeGrayPng(w, h,
              math.floorMod(id * 31 + f * 17, 200L).toInt)
          }
          MediaRow(id, IsoBmff.mux(frames, codec = "png ", width = w,
            height = h, timescale = 1000, sampleDelta = 100,
            keyframeEvery = 2), "video")
        }
      }
  }

  case class Mp4FrameRow(id: Long, frameIdx: Int, nFrames: Int,
      kfCount: Int, ok: Boolean, width: Int, height: Int,
      tsMs: Double, meanLuma: Double)

  /** REAL MP4 keyframe sampling: walk the ISO-BMFF sample tables
    * ([[IsoBmff.parse]]), take `k` uniformly-spread KEYFRAMES (`stss`
    * sync samples — the frames a real demuxer can decode standalone),
    * slice each sample's byte range out of `mdat`, and decode it with
    * the REAL image decoder. Container metadata (declared dims, sample
    * timestamps from `stts`, keyframe census) rides along. Only sampled
    * samples are ever touched: O(index + k), not O(file). Shuffle-free
    * batched map, same contract as [[frameSample]].
    */
  def mp4FrameSample(ds: Dataset[MediaRow], framesPerDoc: Int): Dataset[Mp4FrameRow] = {
    implicit val enc = Encoders.product[Mp4FrameRow]
    ds.mapPartitions { rows =>
      rows.grouped(MediaCodecs.BatchSize).flatMap(_.flatMap { r =>
        IsoBmff.parse(r.payload) match {
          case Some(track) if track.samples.nonEmpty =>
            val kfs = track.keyframes
            MediaCodecs.uniformFrameIndices(kfs.length, framesPerDoc)
              .map(kfs)
              .map { s =>
                val decoded = IsoBmff.sampleBytes(r.payload, s)
                  .flatMap(MediaCodecs.decodeImage)
                decoded match {
                  case Some((w, h, _, luma)) =>
                    Mp4FrameRow(r.id, s.index, track.samples.length,
                      kfs.length, ok = true, w, h, track.timeMs(s), luma)
                  case None =>
                    Mp4FrameRow(r.id, s.index, track.samples.length,
                      kfs.length, ok = false, -1, -1, track.timeMs(s), -1.0)
                }
              }
          case _ =>
            Seq(Mp4FrameRow(r.id, -1, 0, 0, ok = false, -1, -1, -1.0, -1.0))
        }
      })
    }
  }

  /** Render AVC-declared MP4s: each file is a REAL box tree whose
    * `avc1` sample entry carries a REAL avcC (AVCDecoderConfiguration-
    * Record with a spec-encoded SPS/PPS) — profile, level, and coded
    * resolution all closed-form in doc_id. The mdat samples are opaque
    * (H.264 payload decode is the documented out-of-JDK delta; the
    * probe never touches them — that's the point).
    */
  def renderAvcMp4s(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val profile = Seq(66, 77, 100)(math.floorMod(id, 3L).toInt)
          val level = 30 + math.floorMod(id, 3L).toInt * 10
          val w = 2 * (50 + math.floorMod(id, 37L).toInt)
          val h = 2 * (40 + math.floorMod(id, 29L).toInt)
          val cfg = IsoBmff.AvcEncode.avcC(
            IsoBmff.AvcEncode.sps(profile, level, w, h),
            IsoBmff.AvcEncode.pps())
          val frames = (0 until 2).map(f =>
            Array.fill(16)((id + f).toByte): Array[Byte])
          MediaRow(id, IsoBmff.mux(frames, codec = "avc1", width = w,
            height = h, timescale = 1000, sampleDelta = 40,
            keyframeEvery = 2, avcC = Some(cfg)), "video")
        }
      }
  }

  case class AvcProbeRow(id: Long, ok: Boolean, codec: String,
      profileIdc: Int, levelIdc: Int, width: Int, height: Int,
      nalLengthSize: Int, nSps: Int, nPps: Int)

  /** No-decode H.264 stream probe: walk the container to the avcC box
    * and read profile/level/SPS resolution — the ffprobe-style metadata
    * pass a 100 TB video corpus runs before any transcode. Map-only,
    * O(box tree) per file, payload bytes never touched.
    */
  def mp4AvccProbe(ds: Dataset[MediaRow]): Dataset[AvcProbeRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        IsoBmff.parse(r.payload).flatMap(t => t.avc.map((t, _))) match {
          case Some((track, a)) =>
            AvcProbeRow(r.id, ok = true, track.codec, a.profileIdc,
              a.levelIdc, a.spsWidth, a.spsHeight, a.nalLengthSize,
              a.nSps, a.nPps)
          case None =>
            AvcProbeRow(r.id, ok = false, "", -1, -1, -1, -1, -1, -1, -1)
        }
      }
    }
  }

  /** AVC MP4s whose mdat holds REAL length-framed coded-slice NAL
    * units forming a GOP structure closed-form in the id: nFrames =
    * 4 + id%5, gop = 2 + id%3; frame j is IDR-I at j%gop==0, P at
    * j%gop==1, B otherwise. Slice HEADERS are spec-complete for this
    * encoder's SPS/PPS ([[IsoBmff.AvcEncode.slice]]); slice DATA is
    * the documented opaque stand-in (classification never reads it).
    */
  def renderAvcGopMp4s(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 2 * (50 + math.floorMod(id, 37L).toInt)
          val h = 2 * (40 + math.floorMod(id, 29L).toInt)
          val cfg = IsoBmff.AvcEncode.avcC(
            IsoBmff.AvcEncode.sps(66, 30, w, h), IsoBmff.AvcEncode.pps())
          val n = 4 + math.floorMod(id, 5L).toInt
          val gop = 2 + math.floorMod(id, 3L).toInt
          val frames = (0 until n).map { j =>
            val pos = j % gop
            val nal =
              if (pos == 0) IsoBmff.AvcEncode.slice(idr = true, 7, 0, 0,
                Array.fill(8)((id + j).toByte))
              else if (pos == 1) IsoBmff.AvcEncode.slice(idr = false, 0,
                pos % 16, (2 * pos) % 16, Array.fill(8)((id + j).toByte))
              else IsoBmff.AvcEncode.slice(idr = false, 1,
                pos % 16, (2 * pos) % 16, Array.fill(8)((id + j).toByte))
            // 4-byte length framing (avcC lengthSizeMinusOne = 3)
            java.nio.ByteBuffer.allocate(4 + nal.length)
              .putInt(nal.length).put(nal).array(): Array[Byte]
          }
          MediaRow(id, IsoBmff.mux(frames, codec = "avc1", width = w,
            height = h, timescale = 1000, sampleDelta = 40,
            keyframeEvery = gop, avcC = Some(cfg)), "video")
        }
      }
  }

  /** HEVC mirror of [[renderAvcGopMp4s]] — same GOP law (nFrames =
    * 4 + id%5, gop = 2 + id%3; IDR_W_RADL / TRAIL_R(P) / TRAIL_N(B)),
    * real hvcC + length-framed slice NALs.
    */
  def renderHevcGopMp4s(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 2 * (60 + math.floorMod(id, 33L).toInt)
          val h = 2 * (40 + math.floorMod(id, 23L).toInt)
          val sps = IsoBmff.HevcEncode.sps(1, 0, 60, w, h)
          val cfg = IsoBmff.HevcEncode.hvcC(1, 0, 60, sps)
          val n = 4 + math.floorMod(id, 5L).toInt
          val gop = 2 + math.floorMod(id, 3L).toInt
          val frames = (0 until n).map { j =>
            val pos = j % gop
            val nal =
              if (pos == 0)
                IsoBmff.HevcEncode.slice(idr = true, 2,
                  Array.fill(8)((id + j).toByte))
              else if (pos == 1)
                IsoBmff.HevcEncode.slice(idr = false, 1,
                  Array.fill(8)((id + j).toByte))
              else IsoBmff.HevcEncode.slice(idr = false, 0,
                Array.fill(8)((id + j).toByte))
            java.nio.ByteBuffer.allocate(4 + nal.length)
              .putInt(nal.length).put(nal).array(): Array[Byte]
          }
          MediaRow(id, IsoBmff.mux(frames, codec = "hvc1", width = w,
            height = h, timescale = 1000, sampleDelta = 40,
            keyframeEvery = gop, hvcC = Some(cfg)), "video")
        }
      }
  }

  case class GopRow(id: Long, ok: Boolean, codec: String, nSamples: Long,
      nIdr: Long, nI: Long, nP: Long, nB: Long, nOther: Long,
      stssAgrees: Boolean)

  /** GOP-structure census WITHOUT payload decode — the pass that tells
    * a transcode/curation pipeline each video's keyframe cadence and
    * frame-type mix before it spends any decode budget: walk every
    * sample's length-framed NAL units, classify coded slices from the
    * slice header alone ([[IsoBmff.avcSliceInfo]] / `hevcSliceInfo`),
    * and cross-check the container's `stss` keyframe table against the
    * stream's own IDR/IRAP marks (a mismatch is the classic "seek
    * breaks on this file" corruption). Map-only, O(bytes) per file.
    */
  def mp4GopProbe(ds: Dataset[MediaRow]): Dataset[GopRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        IsoBmff.parse(r.payload) match {
          case Some(track) if track.avc.isDefined || track.hevc.isDefined =>
            val lenSize = track.avc.map(_.nalLengthSize)
              .orElse(track.hevc.map(_.nalLengthSize)).get
            val classify: Array[Byte] => Option[(String, Boolean)] =
              if (track.avc.isDefined) IsoBmff.avcSliceInfo
              else IsoBmff.hevcSliceInfo
            var (nIdr, nI, nP, nB, nOther) = (0L, 0L, 0L, 0L, 0L)
            var agrees = true
            track.samples.foreach { s =>
              val slice = IsoBmff.sampleBytes(r.payload, s).toSeq
                .flatMap(IsoBmff.nalUnits(_, lenSize))
                .flatMap(classify(_)).headOption
              slice match {
                case Some((kind, idr)) =>
                  if (idr) nIdr += 1
                  kind match {
                    case "I" => nI += 1
                    case "P" => nP += 1
                    case "B" => nB += 1
                    case _ => nOther += 1
                  }
                  if (idr != s.keyframe) agrees = false
                case None => nOther += 1
              }
            }
            GopRow(r.id, ok = true, track.codec, track.samples.length,
              nIdr, nI, nP, nB, nOther, agrees)
          case _ =>
            GopRow(r.id, ok = false, "", 0, 0, 0, 0, 0, 0,
              stssAgrees = false)
        }
      }
    }
  }

  /** Deterministic hvc1 MP4s: real hvcC boxes (spec-encoded H.265 SPS)
    * with closed-form profile/tier/level/resolution in the id — the
    * HEVC mirror of [[renderAvcMp4s]].
    */
  def renderHevcMp4s(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val profile = 1 + math.floorMod(id, 2L).toInt // Main / Main 10
          val tier = math.floorMod(id, 2L).toInt
          val level = 60 + 30 * math.floorMod(id, 3L).toInt
          val w = 2 * (60 + math.floorMod(id, 33L).toInt)
          val h = 2 * (40 + math.floorMod(id, 23L).toInt)
          val sps = IsoBmff.HevcEncode.sps(profile, tier, level, w, h)
          val cfg = IsoBmff.HevcEncode.hvcC(profile, tier, level, sps)
          val frames = (0 until 2).map(f =>
            Array.fill(16)((id + f).toByte): Array[Byte])
          MediaRow(id, IsoBmff.mux(frames, codec = "hvc1", width = w,
            height = h, timescale = 1000, sampleDelta = 40,
            keyframeEvery = 2, hvcC = Some(cfg)), "video")
        }
      }
  }

  case class HevcProbeRow(id: Long, ok: Boolean, codec: String,
      profileSpace: Int, tierFlag: Int, profileIdc: Int, levelIdc: Int,
      chromaFormat: Int, width: Int, height: Int, nalLengthSize: Int,
      nArrays: Int)

  /** No-decode H.265 stream probe — the hvcC mirror of
    * [[mp4AvccProbe]]: map-only container walk to the config record,
    * payload bytes never touched.
    */
  def mp4HvccProbe(ds: Dataset[MediaRow]): Dataset[HevcProbeRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        IsoBmff.parse(r.payload).flatMap(t => t.hevc.map((t, _))) match {
          case Some((track, h)) =>
            HevcProbeRow(r.id, ok = true, track.codec, h.profileSpace,
              h.tierFlag, h.profileIdc, h.levelIdc, h.chromaFormat,
              h.spsWidth, h.spsHeight, h.nalLengthSize, h.numArrays)
          case None =>
            HevcProbeRow(r.id, ok = false, "", -1, -1, -1, -1, -1, -1,
              -1, -1, -1)
        }
      }
    }
  }

  /** Deterministic av01 MP4s: real av1C boxes (spec-encoded Sequence
    * Header OBUs) with closed-form profile/level/tier/resolution — the
    * AV1 leg of the codec-probe trio.
    */
  def renderAv1Mp4s(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val profile = math.floorMod(id, 3L).toInt
          val level = 8 + math.floorMod(id, 5L).toInt // >7: tier coded
          val tier = math.floorMod(id, 2L).toInt
          val w = 100 + math.floorMod(id, 37L).toInt
          val h = 60 + math.floorMod(id, 23L).toInt
          val seq = IsoBmff.Av1Encode.sequenceHeader(profile, level, tier, w, h)
          val cfg = IsoBmff.Av1Encode.av1C(profile, level, tier, seq)
          val frames = (0 until 2).map(f =>
            Array.fill(16)((id + f).toByte): Array[Byte])
          MediaRow(id, IsoBmff.mux(frames, codec = "av01", width = w,
            height = h, timescale = 1000, sampleDelta = 40,
            keyframeEvery = 2, av1C = Some(cfg)), "video")
        }
      }
  }

  case class Av1ProbeRow(id: Long, ok: Boolean, codec: String,
      seqProfile: Int, seqLevelIdx: Int, seqTier: Int, highBitdepth: Int,
      monochrome: Int, width: Int, height: Int)

  /** No-decode AV1 stream probe — the av1C mirror of [[mp4AvccProbe]]. */
  def mp4Av1Probe(ds: Dataset[MediaRow]): Dataset[Av1ProbeRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        IsoBmff.parse(r.payload).flatMap(t => t.av1.map((t, _))) match {
          case Some((track, a)) =>
            Av1ProbeRow(r.id, ok = true, track.codec, a.seqProfile,
              a.seqLevelIdx, a.seqTier, a.highBitdepth, a.monochrome,
              a.maxWidth, a.maxHeight)
          case None =>
            Av1ProbeRow(r.id, ok = false, "", -1, -1, -1, -1, -1, -1, -1)
        }
      }
    }
  }

  case class AudioRow(id: Long, ok: Boolean, sampleRate: Int,
      channels: Int, nFrames: Long, durationMs: Double, meanAmp: Double)

  /** Batched REAL WAV decode over binary payloads (same mapPartitions
    * shape as [[decodeBatched]] — shuffle-free, corpus-scale map work).
    */
  def decodeWavBatched(ds: Dataset[MediaRow]): Dataset[AudioRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        MediaCodecs.decodeWav(r.payload) match {
          case Some((sr, ch, n, mean)) =>
            AudioRow(r.id, ok = true, sr, ch, n,
              n.toDouble * 1000.0 / sr, mean)
          case None => AudioRow(r.id, ok = false, 0, 0, 0L, 0.0, 0.0)
        }
      }
    }
  }

  case class AudioFeatureRow(id: Long, ok: Boolean, nWindows: Long,
      meanRms: Double, meanZcr: Double)

  /** Batched audio feature extraction: per doc, window count and the
    * unweighted means of window RMS / zero-crossing rate. Map-only.
    */
  def audioFeaturesBatched(ds: Dataset[MediaRow], window: Int)
      : Dataset[AudioFeatureRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        MediaCodecs.audioFeatures(r.payload, window) match {
          case Some(ws) if ws.nonEmpty =>
            AudioFeatureRow(r.id, ok = true, ws.length.toLong,
              ws.map(_._1).sum / ws.length, ws.map(_._2).sum / ws.length)
          case _ => AudioFeatureRow(r.id, ok = false, 0L, 0.0, 0.0)
        }
      }
    }
  }

  /** Deterministic real WAV corpus: per id, a constant-|amplitude|
    * square wave (every sample ±A) so the decoded mean amplitude is
    * A/32768 in closed form — the audio analogue of [[renderPngs]].
    */
  def renderWavs(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 400 + math.floorMod(id, 256L).toInt
          val amp = (math.floorMod(id * 37, 16384L) + 1).toInt
          val samples = Array.tabulate(n)(i =>
            (if (i % 2 == 0) amp else -amp).toShort)
          MediaRow(id, MediaCodecs.encodeWavPcm16(8000, samples), "audio")
        }
      }
  }

  /** Render STAIRCASE WAVs: 32 windows × 128 samples of a ±A_w square
    * wave with per-window amplitude A_w = (id·31 + w·57) mod 16384 + 1.
    * Each window's RMS is exactly A_w/32768 (constant |sample| per
    * window; the sqrt of an exactly-representable square is exact), so
    * the [[MediaCodecs.audioFingerprint]] bit pattern is CLOSED-FORM in
    * doc_id — the fixture that lets audio fingerprinting be fully
    * oracled (q89).
    */
  def renderStaircaseWavs(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val samples = Array.tabulate(32 * 128) { i =>
            val w = i / 128
            val amp = (math.floorMod(id * 31 + w * 57L, 16384L) + 1).toInt
            (if (i % 2 == 0) amp else -amp).toShort
          }
          MediaRow(id, MediaCodecs.encodeWavPcm16(8000, samples), "audio")
        }
      }
  }

  final case class AudioFpRow(id: Long, ok: Boolean, fp: Long)

  /** Audio fingerprints per media row — batched, shuffle-free. */
  def audioFingerprintBatched(ds: Dataset[MediaRow],
      window: Int): Dataset[AudioFpRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      MediaCodecs.audioFingerprint(m.payload, window) match {
        case Some(f) => AudioFpRow(m.id, ok = true, f)
        case None => AudioFpRow(m.id, ok = false, 0L)
      }
    })
  }

  def renderPngs(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + math.floorMod(id, 32L).toInt
          val h = 16 + math.floorMod(id, 17L).toInt
          val gray = math.floorMod(id, 200L).toInt
          MediaRow(id, MediaCodecs.encodeGrayPng(w, h, gray), "image")
        }
      }
  }

  /** Render 64×64 gray GRADIENT PNGs, pixel(x,y) = (g0 + 3x + 5y) mod
    * 256 with g0 = id mod 97 — real non-constant images whose 8×8
    * bilinear luma grid is CLOSED-FORM (64/8 = 8 ⇒ every grid sample
    * sits at fraction .5, so each cell is the exact mean of 4 integer
    * pixels — a dyadic rational, bit-reproducible in any engine). The
    * fixture that lets perceptual hashing be fully oracled (q88).
    */
  def renderGradientPngs(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val g0 = math.floorMod(id, 97L).toInt
          val img = new java.awt.image.BufferedImage(
            64, 64, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < 64) {
            var x = 0
            while (x < 64) {
              raster.setSample(x, y, 0, (g0 + 3 * x + 5 * y) % 256)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          MediaRow(id, out.toByteArray, "image")
        }
      }
  }

  final case class PHashRow(id: Long, ok: Boolean, ahash: Long, dhash: Long)

  /** Perceptual hashes per media row — batched mapPartitions like the
    * other codec stages: shuffle-free, decode cost only.
    */
  def perceptualHashBatched(ds: Dataset[MediaRow]): Dataset[PHashRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      MediaCodecs.perceptualHash(m.payload) match {
        case Some((a, d)) => PHashRow(m.id, ok = true, a, d)
        case None => PHashRow(m.id, ok = false, 0L, 0L)
      }
    })
  }

  /** Image near-dup candidate pairs by Hamming distance on a 64-bit
    * perceptual hash: pigeonhole the hash into `maxHamming + 1` chunks
    * (two hashes within maxHamming MUST agree on at least one chunk),
    * bucket-join on (chunk index, chunk value), verify with
    * `bit_count(xor) <= maxHamming`. Never all-pairs — the same scale
    * shape as the simhash text pairer (`Dedup.simhashPairs`).
    */
  def phashNearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming=$maxHamming")
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val chunked = hashes.select(col(idCol).as("id"), col(hashCol).as("h"))
      .select(col("id"), col("h"),
        explode(sequence(lit(0), lit(chunks - 1))).as("ci"))
      .withColumn("cv",
        // last chunk takes the remaining high bits
        when(col("ci") === chunks - 1,
          shiftrightunsigned(col("h"), (chunks - 1) * width))
          .otherwise(expr(s"shiftrightunsigned(h, ci * $width)")
            .bitwiseAND(lit((1L << width) - 1))))
    val l = chunked.select(col("ci"), col("cv"), col("id").as("id_a"), col("h").as("h_a"))
    val r = chunked.select(col("ci"), col("cv"), col("id").as("id_b"), col("h").as("h_b"))
    l.join(r, Seq("ci", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(h_a ^ h_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
