package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IsoBmff, Multimodal}
import graft.operators.Multimodal.MediaCodecs

/** The real ISO-BMFF demuxer: box walk, sample tables, keyframe
  * extraction, and corrupt-input behavior (never throw, never invent).
  */
class IsoBmffSpec extends AnyFunSuite {

  private val frames: Seq[Array[Byte]] =
    (0 until 5).map(i => MediaCodecs.encodeGrayPng(12, 9, 40 + i * 10))

  private def muxed(keyEvery: Int = 2): Array[Byte] =
    IsoBmff.mux(frames, codec = "png ", width = 12, height = 9,
      timescale = 1000, sampleDelta = 100, keyframeEvery = keyEvery)

  test("mux → parse round-trips the full sample table") {
    val track = IsoBmff.parse(muxed()).get
    assert(track.codec == "png ")
    assert(track.width == 12 && track.height == 9)
    assert(track.timescale == 1000)
    assert(track.samples.length == 5)
    assert(track.samples.map(_.size) == frames.map(_.length))
    // dts ramps by the stts delta; ms conversion uses mdhd timescale
    assert(track.samples.map(_.dts) == IndexedSeq(0L, 100L, 200L, 300L, 400L))
    assert(track.samples.map(track.timeMs) ==
      IndexedSeq(0.0, 100.0, 200.0, 300.0, 400.0))
    // stss every 2nd sample → keyframes at even indices
    assert(track.samples.map(_.keyframe) ==
      IndexedSeq(true, false, true, false, true))
    // offsets are contiguous within mdat
    assert(track.samples.sliding(2).forall {
      case Seq(a, b) => b.offset == a.offset + a.size
      case _         => true
    })
  }

  test("sampleBytes slices the exact original payloads") {
    val bytes = muxed()
    val track = IsoBmff.parse(bytes).get
    track.samples.zip(frames).foreach { case (s, f) =>
      assert(IsoBmff.sampleBytes(bytes, s).get.toSeq == f.toSeq)
    }
    // ...and each slice decodes with the real image decoder
    val (w, h, _, _) =
      MediaCodecs.decodeImage(IsoBmff.sampleBytes(bytes, track.samples.head).get).get
    assert(w == 12 && h == 9)
  }

  test("no stss box → every sample is a sync sample (spec semantics)") {
    val track = IsoBmff.parse(muxed(keyEvery = 1)).get
    assert(track.samples.forall(_.keyframe))
    assert(track.keyframes.length == 5)
  }

  test("corrupt inputs return None, never throw") {
    val good = muxed()
    assert(IsoBmff.parse(Array[Byte](1, 2, 3)).isEmpty)
    assert(IsoBmff.parse(new Array[Byte](0)).isEmpty)
    // a GFRM container is not ISO-BMFF
    assert(IsoBmff.parse(MediaCodecs.encodeFrames(frames)).isEmpty)
    // truncating inside moov kills the sample tables
    assert(IsoBmff.parse(good.take(good.length - 40)).isEmpty)
    // flipping the ftyp magic fails the leading-box check
    val bad = good.clone(); bad(4) = 'X'
    assert(IsoBmff.parse(bad).isEmpty)
  }

  test("non-video handler is skipped") {
    val bytes = muxed()
    // patch the hdlr handler type 'vide' → 'soun'
    val idx = bytes.indexOfSlice("vide".getBytes("ISO-8859-1"))
    assert(idx > 0)
    val patched = bytes.clone()
    "soun".getBytes("ISO-8859-1").zipWithIndex.foreach { case (b, i) =>
      patched(idx + i) = b }
    assert(IsoBmff.parse(patched).isEmpty)
  }

  test("sampleBytes refuses ranges beyond the payload (truncated mdat)") {
    val bytes = muxed()
    val track = IsoBmff.parse(bytes).get
    val last = track.samples.last
    val truncated = bytes.take((last.offset + 2).toInt)
    assert(IsoBmff.sampleBytes(truncated, last).isEmpty)
  }

  test("mp4FrameSample: corrupt payloads yield one ok=false row") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, muxed(), "video"),
      Multimodal.MediaRow(2L, Array[Byte](9, 9, 9), "video"))
    val out = Multimodal.mp4FrameSample(rows.toDS(), framesPerDoc = 2)
      .collect().sortBy(r => (r.id, r.frameIdx))
    val good = out.filter(_.id == 1L)
    assert(good.forall(_.ok))
    assert(good.map(_.frameIdx).toSeq == Seq(0, 2)) // keyframes 0,2,4 → sampled 0,2
    assert(good.head.kfCount == 3 && good.head.nFrames == 5)
    assert(good.map(_.tsMs).toSeq == Seq(0.0, 200.0))
    val bad = out.filter(_.id == 2L)
    assert(bad.length == 1 && !bad.head.ok && bad.head.nFrames == 0)
  }

  test("SPS encode → parse round-trips profile/level/resolution for " +
      "every profile branch, including frame cropping") {
    // non-multiple-of-16 dims exercise the cropping window; profile
    // 100 exercises the high-profile chroma/bit-depth block
    for {
      profile <- Seq(66, 77, 100)
      (w, h) <- Seq((320, 240), (100, 82), (1920, 1080), (16, 16))
    } {
      val sps = IsoBmff.AvcEncode.sps(profile, 31, w, h)
      val parsed = IsoBmff.parseSps(sps)
      assert(parsed.contains((profile, 0, 31, w, h)),
        s"profile=$profile ${w}x$h → $parsed")
    }
  }

  test("avcC record round-trips through parseAvcC; malformed records " +
      "and truncated SPS return None") {
    val sps = IsoBmff.AvcEncode.sps(100, 42, 638, 478)
    val cfg = IsoBmff.AvcEncode.avcC(sps, IsoBmff.AvcEncode.pps())
    val parsed = IsoBmff.parseAvcC(cfg)
    assert(parsed.contains(IsoBmff.AvcConfig(100, 0, 42,
      nalLengthSize = 4, nSps = 1, nPps = 1,
      spsWidth = 638, spsHeight = 478)))
    assert(IsoBmff.parseAvcC(Array[Byte](2, 0, 0, 0, 0, 0, 0)).isEmpty)
    assert(IsoBmff.parseAvcC(cfg.take(9)).isEmpty)
    // SPS bytes corrupted → the record parses but the SPS does not
    val broken = cfg.clone()
    broken(8) = 0x00 // nal type no longer 7
    assert(IsoBmff.parseAvcC(broken).isEmpty)
  }

  test("an avc1 sample entry's avcC surfaces on the parsed track; " +
      "non-avc entries carry none") {
    val sps = IsoBmff.AvcEncode.sps(77, 30, 640, 360)
    val cfg = IsoBmff.AvcEncode.avcC(sps, IsoBmff.AvcEncode.pps())
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6))
    val withAvc = IsoBmff.mux(frames, "avc1", 640, 360,
      timescale = 1000, sampleDelta = 40, avcC = Some(cfg))
    val track = IsoBmff.parse(withAvc).get
    assert(track.codec == "avc1")
    assert(track.avc.exists(a => a.profileIdc == 77 && a.levelIdc == 30 &&
      a.spsWidth == 640 && a.spsHeight == 360))
    // sample tables stay intact next to the child box
    assert(track.samples.length == 2)
    val plain = IsoBmff.parse(IsoBmff.mux(frames, "png ", 8, 8,
      timescale = 1000, sampleDelta = 40)).get
    assert(plain.avc.isEmpty)
  }

  test("RBSP emulation-prevention bytes are stripped before SPS bit " +
      "parsing") {
    // plant a known 00 00 pair after the stop bit (spec-legal trailing
    // zero bytes), then escape it as 00 00 03 00 the way an encoder
    // must — both forms carry the same RBSP and must parse identically
    val sps = IsoBmff.AvcEncode.sps(66, 30, 320, 240)
    val plain = sps ++ Array[Byte](0, 0, 0)
    val escaped = sps ++ Array[Byte](0, 0, 3, 0)
    val want = IsoBmff.parseSps(sps)
    assert(want.isDefined)
    assert(IsoBmff.parseSps(plain) == want)
    assert(IsoBmff.parseSps(escaped) == want)
  }

  test("H.265 SPS encode → parse round-trips profile/tier/level and the " +
      "conformance-window resolution") {
    // 100x50: luma grid pads to 104x56, window crops 2 and 3 chroma
    // units back — the non-multiple-of-8 path
    for ((p, t, l, w, h) <- Seq((1, 0, 93, 100, 50), (2, 1, 120, 1920, 1080),
        (1, 0, 60, 8, 8), (4, 1, 153, 3838, 2158))) {
      val sps = IsoBmff.HevcEncode.sps(p, t, l, w, h)
      assert(IsoBmff.parseHevcSps(sps).contains((p, t, l, w, h)),
        s"$p/$t/$l ${w}x$h -> ${IsoBmff.parseHevcSps(sps)}")
    }
    // wrong NAL type rejected
    val sps = IsoBmff.HevcEncode.sps(1, 0, 93, 64, 64)
    val notSps = sps.clone(); notSps(0) = (34 << 1).toByte
    assert(IsoBmff.parseHevcSps(notSps).isEmpty)
  }

  test("hvcC record round-trips through parseHvcC; malformed and " +
      "truncated records return None") {
    val sps = IsoBmff.HevcEncode.sps(2, 1, 123, 638, 478)
    val cfg = IsoBmff.HevcEncode.hvcC(2, 1, 123, sps)
    assert(IsoBmff.parseHvcC(cfg).contains(IsoBmff.HevcConfig(
      profileSpace = 0, tierFlag = 1, profileIdc = 2, levelIdc = 123,
      chromaFormat = 1, nalLengthSize = 4, numArrays = 1,
      spsWidth = 638, spsHeight = 478)))
    assert(IsoBmff.parseHvcC(Array.fill[Byte](23)(0)).isEmpty) // bad version
    assert(IsoBmff.parseHvcC(cfg.take(25)).isEmpty)            // truncated
    val broken = cfg.clone()
    broken(23) = (0x80 | 34).toByte // array advertises PPS, no SPS anywhere
    assert(IsoBmff.parseHvcC(broken).isEmpty)
  }

  test("an hvc1 sample entry's hvcC surfaces on the parsed track next " +
      "to an intact sample table; avc stays empty") {
    val sps = IsoBmff.HevcEncode.sps(1, 0, 93, 640, 360)
    val cfg = IsoBmff.HevcEncode.hvcC(1, 0, 93, sps)
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6))
    val track = IsoBmff.parse(IsoBmff.mux(frames, "hvc1", 640, 360,
      timescale = 1000, sampleDelta = 40, hvcC = Some(cfg))).get
    assert(track.codec == "hvc1")
    assert(track.hevc.exists(h => h.profileIdc == 1 && h.levelIdc == 93 &&
      h.spsWidth == 640 && h.spsHeight == 360 && h.chromaFormat == 1))
    assert(track.avc.isEmpty)
    assert(track.samples.length == 2)
  }

  test("AV1 sequence-header encode → parse round-trips profile/level/" +
      "tier/resolution; low levels omit the tier bit") {
    for ((p, l, t, w, h) <- Seq((0, 8, 0, 101, 61), (1, 12, 1, 1920, 1080),
        (2, 10, 1, 100, 60), (0, 4, 0, 64, 64), (0, 9, 1, 1, 1))) {
      val seq = IsoBmff.Av1Encode.sequenceHeader(p, l, t, w, h)
      val cfg = IsoBmff.Av1Encode.av1C(p, l, t, seq)
      val got = IsoBmff.parseAv1C(cfg)
      assert(got.contains(IsoBmff.Av1Config(p, l, t, 0, 0, w, h)),
        s"$p/$l/$t ${w}x$h -> $got")
    }
    // reduced_still_picture_header path (not emitted by the encoder):
    // profile 0, still, reduced, level 9, 8x6 — hand-packed bits
    def pack(bits: Seq[(Int, Int)]): Array[Byte] = {
      var acc = Vector.empty[Int]
      bits.foreach { case (n, v) =>
        acc = acc ++ (n - 1 to 0 by -1).map(i => (v >> i) & 1) }
      acc = acc :+ 1 // trailing stop bit
      while (acc.length % 8 != 0) acc = acc :+ 0
      acc.grouped(8).map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte)
        .toArray
    }
    val reduced = pack(Seq((3, 0), (1, 1), (1, 1), (5, 9),
      (4, 3), (4, 3), (4, 7), (4, 5)))
    assert(IsoBmff.parseAv1SeqHeader(reduced).contains((0, 9, 0, 8, 6)))
  }

  test("av1C malformed records return None; av01 tracks surface the " +
      "config next to an intact sample table") {
    val seq = IsoBmff.Av1Encode.sequenceHeader(0, 8, 0, 320, 240)
    val cfg = IsoBmff.Av1Encode.av1C(0, 8, 0, seq)
    assert(IsoBmff.parseAv1C(cfg.updated(0, 0x01.toByte)).isEmpty) // marker
    assert(IsoBmff.parseAv1C(cfg.take(6)).isEmpty)                 // truncated
    // a config carrying only a padding OBU (type 15) has no resolution
    val pad = Array[Byte](0x81.toByte, 0x08, 0x0c, 0x00,
      ((15 << 3) | 0x2).toByte, 0x01, 0x00)
    assert(IsoBmff.parseAv1C(pad).isEmpty)
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6))
    val track = IsoBmff.parse(IsoBmff.mux(frames, "av01", 320, 240,
      timescale = 1000, sampleDelta = 40, av1C = Some(cfg))).get
    assert(track.codec == "av01")
    assert(track.av1.exists(a => a.seqLevelIdx == 8 && a.maxWidth == 320 &&
      a.maxHeight == 240))
    assert(track.avc.isEmpty && track.hevc.isEmpty)
    assert(track.samples.length == 2)
  }

  test("H.264 coded-slice encode → avcSliceInfo round-trips I/P/B and " +
      "the IDR flag; non-slice NALs and garbage return None") {
    import IsoBmff.AvcEncode
    val idr = AvcEncode.slice(idr = true, 7, 0, 0, Array[Byte](1, 2))
    val p = AvcEncode.slice(idr = false, 0, 3, 6, Array[Byte](1))
    val b = AvcEncode.slice(idr = false, 1, 3, 6, Array[Byte](1))
    assert(IsoBmff.avcSliceInfo(idr).contains(("I", true)))
    assert(IsoBmff.avcSliceInfo(p).contains(("P", false)))
    assert(IsoBmff.avcSliceInfo(b).contains(("B", false)))
    // B NALs are unreferenced here (nal_ref_idc 0), P/IDR referenced
    assert((b(0) >> 5 & 3) == 0 && (p(0) >> 5 & 3) == 3)
    assert(IsoBmff.avcSliceInfo(
      AvcEncode.sps(66, 30, 64, 48)).isEmpty) // SPS is not a slice
    assert(IsoBmff.avcSliceInfo(Array[Byte](0x41)).isEmpty) // truncated
    // a hand-built NAL using the +5 "whole picture" slice_type form
    // (spec mod-5 alias): first_mb ue(0)=1, slice_type ue(5)=00110
    // → bits 100110.. = 0x9B; classifies as plain P
    assert(IsoBmff.avcSliceInfo(Array(0x61.toByte, 0x9B.toByte, 0x80.toByte))
      .contains(("P", false)))
  }

  test("H.265 coded-slice encode → hevcSliceInfo round-trips I/P/B with " +
      "the IRAP flag; dependent/garbage NALs return None") {
    import IsoBmff.HevcEncode
    assert(IsoBmff.hevcSliceInfo(
      HevcEncode.slice(idr = true, 2, Array[Byte](9))).contains(("I", true)))
    assert(IsoBmff.hevcSliceInfo(
      HevcEncode.slice(idr = false, 1, Array[Byte](9))).contains(("P", false)))
    assert(IsoBmff.hevcSliceInfo(
      HevcEncode.slice(idr = false, 0, Array[Byte](9))).contains(("B", false)))
    // a non-VCL NAL (SPS, type 33) is not a slice
    assert(IsoBmff.hevcSliceInfo(
      HevcEncode.sps(1, 0, 60, 64, 48)).isEmpty)
    assert(IsoBmff.hevcSliceInfo(Array[Byte](2)).isEmpty)
  }

  test("nalUnits walks multi-NAL length framing and tolerates a " +
      "truncated tail") {
    val n1 = Array[Byte](0x65, 1, 2, 3)
    val n2 = Array[Byte](0x41, 9)
    def framed(n: Array[Byte]) =
      java.nio.ByteBuffer.allocate(4 + n.length).putInt(n.length)
        .put(n).array()
    val sample = framed(n1) ++ framed(n2)
    val got = IsoBmff.nalUnits(sample, 4)
    assert(got.length == 2 && got(0).sameElements(n1) &&
      got(1).sameElements(n2))
    // truncated second frame: first survives, walk stops cleanly
    assert(IsoBmff.nalUnits(sample.dropRight(1), 4).length == 1)
    // 2-byte framing too
    val s2 = Array[Byte](0, 4) ++ n1
    assert(IsoBmff.nalUnits(s2, 2).head.sameElements(n1))
  }

  test("mp4GopProbe counts the closed-form GOP law and flags an " +
      "stss/IDR disagreement") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val ids = Seq(7L).toDF("doc_id") // n = 4+2 = 6, gop = 2+1 = 3
    val rows = graft.operators.Multimodal.mp4GopProbe(
      graft.operators.Multimodal.renderAvcGopMp4s(ids, "doc_id"))
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.ok && r.codec == "avc1" && r.nSamples == 6 &&
      r.nIdr == 2 && r.nI == 2 && r.nP == 2 && r.nB == 2 &&
      r.nOther == 0 && r.stssAgrees)
    // a stream whose container CLAIMS every sample is sync (no stss)
    // but whose NALs are mostly non-IDR must NOT agree
    val cfg = IsoBmff.AvcEncode.avcC(
      IsoBmff.AvcEncode.sps(66, 30, 64, 48), IsoBmff.AvcEncode.pps())
    def framed(n: Array[Byte]) =
      java.nio.ByteBuffer.allocate(4 + n.length).putInt(n.length)
        .put(n).array()
    val frames = Seq(
      framed(IsoBmff.AvcEncode.slice(idr = true, 7, 0, 0, Array[Byte](1))),
      framed(IsoBmff.AvcEncode.slice(idr = false, 0, 1, 2, Array[Byte](1))))
    val lying = IsoBmff.mux(frames, "avc1", 64, 48, 1000, 40,
      keyframeEvery = 1, avcC = Some(cfg)) // no stss → all "sync"
    val probed = graft.operators.Multimodal.mp4GopProbe(
      Seq(graft.operators.Multimodal.MediaRow(1L, lying, "video")).toDS())
      .collect().head
    assert(probed.ok && !probed.stssAgrees && probed.nIdr == 1 &&
      probed.nP == 1)
  }
}
