package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** HPACK header compression (RFC 7541) — the header codec under every
  * gRPC transport (the reference's gRPC ingest service,
  * /root/reference/dozer-ingestion/grpc/src/connector.rs, serves tonic
  * over HTTP/2; HPACK is the public header-block wire format).
  *
  * Pure JDK, hand-rolled like the project's other wire codecs
  * (PgOutput, MyBinlog, KafkaBatch):
  *
  *  - [[Hpack.Decoder]]: full RFC 7541 §6 instruction set — indexed
  *    fields, literals with/without/never indexing, dynamic-table size
  *    updates — plus §5.2 Huffman-coded string literals (the canonical
  *    code table from Appendix B) and the §2.3 static/dynamic index
  *    address space. Stateful per connection, exactly as the RFC
  *    requires (netty's encoder exercises incremental indexing and
  *    Huffman against this decoder in GrpcIngestSpec).
  *  - [[Hpack.encode]]: a stateless encoder emitting literal
  *    never-indexed fields with raw (non-Huffman) strings — always
  *    legal, keeps the server's response path free of shared encoder
  *    state across streams.
  */
object Hpack {

  // ------------------------------------------------- static table (App. A)

  private val Static: Array[(String, String)] = Array(
    (":authority", ""), (":method", "GET"), (":method", "POST"),
    (":path", "/"), (":path", "/index.html"), (":scheme", "http"),
    (":scheme", "https"), (":status", "200"), (":status", "204"),
    (":status", "206"), (":status", "304"), (":status", "400"),
    (":status", "404"), (":status", "500"), ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"), ("accept-language", ""),
    ("accept-ranges", ""), ("accept", ""),
    ("access-control-allow-origin", ""), ("age", ""), ("allow", ""),
    ("authorization", ""), ("cache-control", ""),
    ("content-disposition", ""), ("content-encoding", ""),
    ("content-language", ""), ("content-length", ""),
    ("content-location", ""), ("content-range", ""), ("content-type", ""),
    ("cookie", ""), ("date", ""), ("etag", ""), ("expect", ""),
    ("expires", ""), ("from", ""), ("host", ""), ("if-match", ""),
    ("if-modified-since", ""), ("if-none-match", ""), ("if-range", ""),
    ("if-unmodified-since", ""), ("last-modified", ""), ("link", ""),
    ("location", ""), ("max-forwards", ""), ("proxy-authenticate", ""),
    ("proxy-authorization", ""), ("range", ""), ("referer", ""),
    ("refresh", ""), ("retry-after", ""), ("server", ""),
    ("set-cookie", ""), ("strict-transport-security", ""),
    ("transfer-encoding", ""), ("user-agent", ""), ("vary", ""),
    ("via", ""), ("www-authenticate", ""))

  // --------------------------------------------- Huffman table (App. B)

  private val HuffCodes: Array[Int] = Array(
    0x00001ff8, 0x007fffd8, 0x0fffffe2, 0x0fffffe3, 0x0fffffe4, 0x0fffffe5, 0x0fffffe6, 0x0fffffe7,
    0x0fffffe8, 0x00ffffea, 0x3ffffffc, 0x0fffffe9, 0x0fffffea, 0x3ffffffd, 0x0fffffeb, 0x0fffffec,
    0x0fffffed, 0x0fffffee, 0x0fffffef, 0x0ffffff0, 0x0ffffff1, 0x0ffffff2, 0x3ffffffe, 0x0ffffff3,
    0x0ffffff4, 0x0ffffff5, 0x0ffffff6, 0x0ffffff7, 0x0ffffff8, 0x0ffffff9, 0x0ffffffa, 0x0ffffffb,
    0x00000014, 0x000003f8, 0x000003f9, 0x00000ffa, 0x00001ff9, 0x00000015, 0x000000f8, 0x000007fa,
    0x000003fa, 0x000003fb, 0x000000f9, 0x000007fb, 0x000000fa, 0x00000016, 0x00000017, 0x00000018,
    0x00000000, 0x00000001, 0x00000002, 0x00000019, 0x0000001a, 0x0000001b, 0x0000001c, 0x0000001d,
    0x0000001e, 0x0000001f, 0x0000005c, 0x000000fb, 0x00007ffc, 0x00000020, 0x00000ffb, 0x000003fc,
    0x00001ffa, 0x00000021, 0x0000005d, 0x0000005e, 0x0000005f, 0x00000060, 0x00000061, 0x00000062,
    0x00000063, 0x00000064, 0x00000065, 0x00000066, 0x00000067, 0x00000068, 0x00000069, 0x0000006a,
    0x0000006b, 0x0000006c, 0x0000006d, 0x0000006e, 0x0000006f, 0x00000070, 0x00000071, 0x00000072,
    0x000000fc, 0x00000073, 0x000000fd, 0x00001ffb, 0x0007fff0, 0x00001ffc, 0x00003ffc, 0x00000022,
    0x00007ffd, 0x00000003, 0x00000023, 0x00000004, 0x00000024, 0x00000005, 0x00000025, 0x00000026,
    0x00000027, 0x00000006, 0x00000074, 0x00000075, 0x00000028, 0x00000029, 0x0000002a, 0x00000007,
    0x0000002b, 0x00000076, 0x0000002c, 0x00000008, 0x00000009, 0x0000002d, 0x00000077, 0x00000078,
    0x00000079, 0x0000007a, 0x0000007b, 0x00007ffe, 0x000007fc, 0x00003ffd, 0x00001ffd, 0x0ffffffc,
    0x000fffe6, 0x003fffd2, 0x000fffe7, 0x000fffe8, 0x003fffd3, 0x003fffd4, 0x003fffd5, 0x007fffd9,
    0x003fffd6, 0x007fffda, 0x007fffdb, 0x007fffdc, 0x007fffdd, 0x007fffde, 0x00ffffeb, 0x007fffdf,
    0x00ffffec, 0x00ffffed, 0x003fffd7, 0x007fffe0, 0x00ffffee, 0x007fffe1, 0x007fffe2, 0x007fffe3,
    0x007fffe4, 0x001fffdc, 0x003fffd8, 0x007fffe5, 0x003fffd9, 0x007fffe6, 0x007fffe7, 0x00ffffef,
    0x003fffda, 0x001fffdd, 0x000fffe9, 0x003fffdb, 0x003fffdc, 0x007fffe8, 0x007fffe9, 0x001fffde,
    0x007fffea, 0x003fffdd, 0x003fffde, 0x00fffff0, 0x001fffdf, 0x003fffdf, 0x007fffeb, 0x007fffec,
    0x001fffe0, 0x001fffe1, 0x003fffe0, 0x001fffe2, 0x007fffed, 0x003fffe1, 0x007fffee, 0x007fffef,
    0x000fffea, 0x003fffe2, 0x003fffe3, 0x003fffe4, 0x007ffff0, 0x003fffe5, 0x003fffe6, 0x007ffff1,
    0x03ffffe0, 0x03ffffe1, 0x000fffeb, 0x0007fff1, 0x003fffe7, 0x007ffff2, 0x003fffe8, 0x01ffffec,
    0x03ffffe2, 0x03ffffe3, 0x03ffffe4, 0x07ffffde, 0x07ffffdf, 0x03ffffe5, 0x00fffff1, 0x01ffffed,
    0x0007fff2, 0x001fffe3, 0x03ffffe6, 0x07ffffe0, 0x07ffffe1, 0x03ffffe7, 0x07ffffe2, 0x00fffff2,
    0x001fffe4, 0x001fffe5, 0x03ffffe8, 0x03ffffe9, 0x0ffffffd, 0x07ffffe3, 0x07ffffe4, 0x07ffffe5,
    0x000fffec, 0x00fffff3, 0x000fffed, 0x001fffe6, 0x003fffe9, 0x001fffe7, 0x001fffe8, 0x007ffff3,
    0x003fffea, 0x003fffeb, 0x01ffffee, 0x01ffffef, 0x00fffff4, 0x00fffff5, 0x03ffffea, 0x007ffff4,
    0x03ffffeb, 0x07ffffe6, 0x03ffffec, 0x03ffffed, 0x07ffffe7, 0x07ffffe8, 0x07ffffe9, 0x07ffffea,
    0x07ffffeb, 0x0ffffffe, 0x07ffffec, 0x07ffffed, 0x07ffffee, 0x07ffffef, 0x07fffff0, 0x03ffffee,
    0x3fffffff)

  private val HuffLens: Array[Int] = Array(
    13, 23, 28, 28, 28, 28, 28, 28, 28, 24, 30, 28, 28, 30, 28, 28,
    28, 28, 28, 28, 28, 28, 30, 28, 28, 28, 28, 28, 28, 28, 28, 28,
    6, 10, 10, 12, 13, 6, 8, 11, 10, 10, 8, 11, 8, 6, 6, 6,
    5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 7, 8, 15, 6, 12, 10,
    13, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7, 8, 7, 8, 13, 19, 13, 14, 6,
    15, 5, 6, 5, 6, 5, 6, 6, 6, 5, 7, 7, 6, 6, 6, 5,
    6, 7, 6, 5, 5, 6, 7, 7, 7, 7, 7, 15, 11, 14, 13, 28,
    20, 22, 20, 20, 22, 22, 22, 23, 22, 23, 23, 23, 23, 23, 24, 23,
    24, 24, 22, 23, 24, 23, 23, 23, 23, 21, 22, 23, 22, 23, 23, 24,
    22, 21, 20, 22, 22, 23, 23, 21, 23, 22, 22, 24, 21, 22, 23, 23,
    21, 21, 22, 21, 23, 22, 23, 23, 20, 22, 22, 22, 23, 22, 22, 23,
    26, 26, 20, 19, 22, 23, 22, 25, 26, 26, 26, 27, 27, 26, 24, 25,
    19, 21, 26, 27, 27, 26, 27, 24, 21, 21, 26, 26, 28, 27, 27, 27,
    20, 24, 20, 21, 22, 21, 21, 23, 22, 22, 25, 25, 24, 24, 26, 23,
    26, 27, 26, 26, 27, 27, 27, 27, 27, 28, 27, 27, 27, 27, 27, 26,
    30)

  /** Binary decode tree: node i holds children at tree(2i), tree(2i+1);
    * leaves are encoded as -(symbol+1). Built once.
    */
  private val HuffTree: Array[Int] = {
    // generous bound: at most one internal node per code bit
    val tree = new Array[Int](2 * (HuffCodes.map(_ => 30).sum + 2))
    var nextNode = 1 // node 0 is the root
    var sym = 0
    while (sym < 257) {
      val code = HuffCodes(sym)
      val len = HuffLens(sym)
      var node = 0
      var bit = len - 1
      while (bit >= 0) {
        val b = (code >>> bit) & 1
        val slot = 2 * node + b
        if (bit == 0) {
          require(tree(slot) == 0, s"huffman table conflict at symbol $sym")
          tree(slot) = -(sym + 1)
        } else {
          if (tree(slot) == 0) { tree(slot) = nextNode; nextNode += 1 }
          require(tree(slot) > 0, s"huffman prefix conflict at symbol $sym")
          node = tree(slot)
        }
        bit -= 1
      }
      sym += 1
    }
    tree
  }

  /** Huffman-decode a string literal (§5.2): walk the canonical code
    * tree bit-by-bit; trailing padding must be a prefix of EOS (all
    * ones, at most 7 bits).
    */
  def huffmanDecode(bytes: Array[Byte], from: Int, len: Int): String = {
    val out = new java.io.ByteArrayOutputStream(len * 2)
    var node = 0
    var depth = 0
    var i = from
    val end = from + len
    while (i < end) {
      val b = bytes(i) & 0xff
      var bit = 7
      while (bit >= 0) {
        val v = HuffTree(2 * node + ((b >>> bit) & 1))
        if (v < 0) {
          val sym = -v - 1
          if (sym == 256) throw new IllegalArgumentException(
            "hpack: EOS symbol inside Huffman data")
          out.write(sym)
          node = 0; depth = 0
        } else {
          node = v; depth += 1
        }
        bit -= 1
      }
      i += 1
    }
    // mid-tree at the end: every bit walked so far must have been a 1
    // (EOS prefix) and fewer than 8 of them
    if (depth >= 8) throw new IllegalArgumentException(
      s"hpack: Huffman padding of $depth bits (max 7)")
    if (depth > 0) {
      // EOS is all-ones: following 1-bits from wherever we are must
      // keep to the EOS path; verify by walking 1s to a total of 30
      var n = node
      var d = depth
      var ok = true
      while (d < 30 && ok) {
        val v = HuffTree(2 * n + 1)
        if (v == -(256 + 1) && d == 29) { ok = true; d = 30 }
        else if (v > 0) { n = v; d += 1 }
        else ok = false
      }
      if (!ok) throw new IllegalArgumentException(
        "hpack: Huffman padding is not an EOS prefix")
    }
    new String(out.toByteArray, UTF_8)
  }

  // ------------------------------------------------------------- decoder

  /** Stateful HPACK decoder — one per HTTP/2 connection.
    *
    * `settingsMaxTableSize` is the ceiling this endpoint advertised in
    * SETTINGS_HEADER_TABLE_SIZE (RFC 7541 §4.2: a size update may not
    * exceed it) — an untrusted peer cannot grow the table beyond it.
    */
  final class Decoder(var maxTableSize: Int = 4096,
      val settingsMaxTableSize: Int = 4096) {
    private val dynamic = mutable.ArrayDeque.empty[(String, String)]
    private var dynSize = 0

    private def entrySize(e: (String, String)): Int =
      e._1.getBytes(UTF_8).length + e._2.getBytes(UTF_8).length + 32

    private def evictTo(limit: Int): Unit =
      while (dynSize > limit && dynamic.nonEmpty) {
        dynSize -= entrySize(dynamic.removeLast())
      }

    private def add(name: String, value: String): Unit = {
      val e = (name, value)
      val sz = entrySize(e)
      evictTo(maxTableSize - sz)
      if (sz <= maxTableSize) { dynamic.prepend(e); dynSize += sz }
      // an entry larger than the table empties it (RFC 7541 §4.4)
    }

    private def lookup(index: Int): (String, String) = {
      require(index >= 1, s"hpack: index 0 is invalid")
      if (index <= Static.length) Static(index - 1)
      else {
        val di = index - Static.length - 1
        require(di < dynamic.length,
          s"hpack: index $index beyond table (${Static.length} static + " +
            s"${dynamic.length} dynamic)")
        dynamic(di)
      }
    }

    /** Decode one complete header block into (name, value) pairs. */
    def decode(block: Array[Byte]): Seq[(String, String)] = {
      val out = mutable.ArrayBuffer.empty[(String, String)]
      var pos = 0

      def readInt(prefixBits: Int): Long = {
        val mask = (1 << prefixBits) - 1
        var v: Long = block(pos) & mask
        pos += 1
        if (v < mask) v
        else {
          var shift = 0
          var more = true
          while (more) {
            require(pos < block.length, "hpack: truncated integer")
            val b = block(pos) & 0xff
            pos += 1
            v += (b & 0x7f).toLong << shift
            shift += 7
            more = (b & 0x80) != 0
            require(shift <= 56, "hpack: integer overflow")
          }
          v
        }
      }

      def readString(): String = {
        require(pos < block.length, "hpack: truncated string")
        val huff = (block(pos) & 0x80) != 0
        val len = readInt(7).toInt
        require(pos + len <= block.length, "hpack: string past block end")
        val s =
          if (huff) huffmanDecode(block, pos, len)
          else new String(block, pos, len, UTF_8)
        pos += len
        s
      }

      while (pos < block.length) {
        val b = block(pos) & 0xff
        if ((b & 0x80) != 0) { // indexed field
          out += lookup(readInt(7).toInt)
        } else if ((b & 0xc0) == 0x40) { // literal, incremental indexing
          val idx = readInt(6).toInt
          val name = if (idx == 0) readString() else lookup(idx)._1
          val value = readString()
          add(name, value)
          out += ((name, value))
        } else if ((b & 0xe0) == 0x20) { // dynamic table size update
          // readInt(5) can carry up to 2^56; compare as Long BEFORE any
          // toInt (which could overflow negative) and reject updates
          // above the advertised SETTINGS_HEADER_TABLE_SIZE — RFC 7541
          // §4.2 makes oversize updates a decoding error, which also
          // closes the memory-DoS a hostile h2c client would otherwise
          // have (grow the table arbitrarily, then stuff it)
          val szL = readInt(5)
          require(szL >= 0 && szL <= settingsMaxTableSize,
            s"hpack: dynamic table size update $szL exceeds advertised " +
              s"SETTINGS_HEADER_TABLE_SIZE $settingsMaxTableSize")
          val sz = szL.toInt
          maxTableSize = sz
          evictTo(sz)
        } else { // literal without indexing (0000) / never indexed (0001)
          val idx = readInt(4).toInt
          val name = if (idx == 0) readString() else lookup(idx)._1
          out += ((name, readString()))
        }
      }
      out.toSeq
    }
  }

  // ------------------------------------------------------------- encoder

  /** Stateless encode: literal never-indexed fields, raw strings. */
  def encode(headers: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def writeInt(prefixBits: Int, first: Int, v0: Int): Unit = {
      val mask = (1 << prefixBits) - 1
      if (v0 < mask) out.write(first | v0)
      else {
        out.write(first | mask)
        var v = v0 - mask
        while (v >= 0x80) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
        out.write(v)
      }
    }
    def writeString(s: String): Unit = {
      val bytes = s.getBytes(UTF_8)
      writeInt(7, 0x00, bytes.length)
      out.write(bytes)
    }
    headers.foreach { case (name, value) =>
      out.write(0x10) // literal never indexed, new name
      writeString(name)
      writeString(value)
    }
    out.toByteArray
  }
}
