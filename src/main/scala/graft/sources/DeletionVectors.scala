package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Delta Lake DELETION VECTORS — the merge-on-read half of the advanced
  * protocol, decoded natively from the PUBLIC formats:
  * delta.io PROTOCOL.md (descriptor fields, Z85 path/inline encoding,
  * the `<size BE><data><crc32 BE>` on-disk framing) and the
  * RoaringFormatSpec (the portable 32-bit bitmap serialization the
  * 64-bit "RoaringBitmapArray" wraps per PROTOCOL.md). The reference's
  * delta connector (a `deltalake`-crate wrapper) has no DV support at
  * all — this closes the advanced-protocol read gap without the
  * delta-spark jars.
  *
  * A decoded DV is the sorted array of 0-based ROW INDEXES deleted from
  * one data file; [[DeltaLite.readFiles]] applies it as a row_index
  * anti-filter (same mechanism as iceberg position deletes).
  */
object DeletionVectors {

  /** One `add.deletionVector` descriptor. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Long, cardinality: Long)

  // ------------------------------------------------------------- Z85

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val t = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  /** Z85 decode (4 bytes per 5 chars, big-endian groups) — the encoding
    * PROTOCOL.md specifies for inline DVs and the path UUID.
    */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"Z85 length must be a multiple of 5, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val v = if (c < 128) Z85Decode(c.toInt) else -1
        require(v >= 0, s"invalid Z85 character '$c'")
        acc = acc * 85 + v
        j += 1
      }
      val base = i / 5 * 4
      out(base) = ((acc >>> 24) & 0xff).toByte
      out(base + 1) = ((acc >>> 16) & 0xff).toByte
      out(base + 2) = ((acc >>> 8) & 0xff).toByte
      out(base + 3) = (acc & 0xff).toByte
      i += 5
    }
    out
  }

  /** Resolve a `u`-storage pathOrInlineDv (`<optional prefix><20-char
    * Z85 UUID>`) to the DV file path under the table root:
    * `<prefix>/deletion_vector_<uuid>.bin`.
    */
  def uuidPath(tablePath: String, pathOrInlineDv: String): Path = {
    require(pathOrInlineDv.length >= 20,
      s"u-storage DV id too short: '$pathOrInlineDv'")
    val prefix = pathOrInlineDv.dropRight(20)
    val bytes = z85Decode(pathOrInlineDv.takeRight(20))
    val bb = ByteBuffer.wrap(bytes) // UUID bytes are big-endian
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) new Path(tablePath, name)
    else new Path(new Path(tablePath, prefix), name)
  }

  // -------------------------------------------------------- bitmaps

  private val MagicNumber = 1681511377

  /** Decode the serialized RoaringBitmapArray: int32 LE magic, int64 LE
    * bitmap count, then per bitmap an int32 LE key (the high 32 bits)
    * followed by a standard portable 32-bit roaring bitmap.
    */
  def decodeBitmap(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == MagicNumber,
      s"deletion vector magic $magic != $MagicNumber")
    val nBitmaps = buf.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue,
      s"implausible DV bitmap count $nBitmaps")
    val out = Array.newBuilder[Long]
    var b = 0L
    while (b < nBitmaps) {
      val high = (buf.getInt.toLong & 0xffffffffL) << 32
      readRoaring32(buf, high, out)
      b += 1
    }
    val arr = out.result()
    java.util.Arrays.sort(arr)
    arr
  }

  private val SerialCookieNoRun = 12346
  private val SerialCookieRun = 12347
  private val NoOffsetThreshold = 4

  /** One portable 32-bit roaring bitmap (RoaringFormatSpec), values
    * emitted as `high | value`.
    */
  private def readRoaring32(buf: ByteBuffer, high: Long,
      out: scala.collection.mutable.Builder[Long, Array[Long]]): Unit = {
    val cookie = buf.getInt
    val hasRun = (cookie & 0xffff) == SerialCookieRun
    val size =
      if (hasRun) (cookie >>> 16) + 1
      else {
        require(cookie == SerialCookieNoRun,
          s"unknown roaring cookie $cookie")
        buf.getInt
      }
    val runFlags: Array[Byte] =
      if (hasRun) {
        val fl = new Array[Byte]((size + 7) / 8)
        buf.get(fl)
        fl
      } else Array.empty
    def isRun(i: Int): Boolean =
      hasRun && ((runFlags(i / 8) & (1 << (i % 8))) != 0)
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = buf.getShort & 0xffff
      cards(i) = (buf.getShort & 0xffff) + 1
      i += 1
    }
    // the offsets header is redundant for sequential reads — skip it
    // when present (always for the no-run cookie, and for run bitmaps
    // with >= NoOffsetThreshold containers)
    if (!hasRun || size >= NoOffsetThreshold)
      buf.position(buf.position() + 4 * size)
    i = 0
    while (i < size) {
      val base = high | (keys(i).toLong << 16)
      if (isRun(i)) {
        val nRuns = buf.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort & 0xffff
          val len = buf.getShort & 0xffff
          var v = start
          while (v <= start + len) { out += (base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) {
        // bitset container: 1024 little-endian longs
        var w = 0
        while (w < 1024) {
          var word = buf.getLong
          val wordBase = base | (w.toLong << 6)
          while (word != 0L) {
            val t = java.lang.Long.numberOfTrailingZeros(word)
            out += (wordBase | t)
            word &= word - 1
          }
          w += 1
        }
      } else {
        var v = 0
        while (v < cards(i)) { out += (base | (buf.getShort & 0xffff)); v += 1 }
      }
      i += 1
    }
  }

  /** Union of two sorted-unique row-index runs (the executor-side
    * prior-DV merge) — two-pointer, deduping, never materializing more
    * than the merged result.
    */
  def unionSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = Array.newBuilder[Long]
    out.sizeHint(a.length + b.length)
    var i = 0; var j = 0
    var last = Long.MinValue; var has = false
    def push(v: Long): Unit =
      if (!has || v != last) { out += v; last = v; has = true }
    while (i < a.length && j < b.length) {
      if (a(i) <= b(j)) { push(a(i)); i += 1 } else { push(b(j)); j += 1 }
    }
    while (i < a.length) { push(a(i)); i += 1 }
    while (j < b.length) { push(b(j)); j += 1 }
    out.result()
  }

  // ------------------------------------------------------------ encode

  /** Serialize row indexes to the RoaringBitmapArray portable format —
    * the write half of the DV-based merge-on-read DELETE. Array
    * containers for ≤4096 values per 16-bit chunk, bitset containers
    * above (runs are a reader-side-only concern; writers may always
    * choose the simpler forms).
    */
  def encodeBitmap(rows0: Array[Long]): Array[Byte] = {
    val rows = rows0.distinct.sorted
    val o = new java.io.ByteArrayOutputStream
    def i32(v: Int): Unit = { o.write(v & 0xff); o.write((v >>> 8) & 0xff)
      o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff) }
    def i16(v: Int): Unit = { o.write(v & 0xff); o.write((v >>> 8) & 0xff) }
    i32(MagicNumber)
    val byHigh = rows.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    i32(byHigh.size); i32(0) // int64 LE bitmap count (< 2^31 always)
    byHigh.foreach { case (high, vs) =>
      i32(high.toInt)
      val byKey = vs.map(v => (v & 0xffffffffL).toInt)
        .groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      i32(SerialCookieNoRun)
      i32(byKey.size)
      byKey.foreach { case (key, cvs) =>
        i16(key); i16(cvs.length - 1)
      }
      var off = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, cvs) =>
        i32(off)
        off += (if (cvs.length > 4096) 8192 else 2 * cvs.length)
      }
      byKey.foreach { case (_, cvs) =>
        if (cvs.length > 4096) {
          val words = new Array[Long](1024)
          cvs.foreach(v => words((v & 0xffff) >>> 6) |= (1L << (v & 63)))
          words.foreach { w =>
            i32((w & 0xffffffffL).toInt); i32((w >>> 32).toInt)
          }
        } else cvs.foreach(v => i16(v & 0xffff))
      }
    }
    o.toByteArray
  }

  /** Write one DV FILE holding the given per-key bitmaps at distinct
    * offsets: version byte, then per DV `<size BE><data><crc32 BE>`.
    * Returns (pathOrInlineDv id, key → (offset, sizeInBytes)).
    */
  def writeDvFile(fs: FileSystem, tablePath: String,
      dvs: Seq[(String, Array[Long])]): (String, Map[String, (Long, Long)]) =
    writeDvFileBytes(fs, tablePath,
      dvs.map { case (k, rows) => (k, encodeBitmap(rows)) })

  /** [[writeDvFile]] over PRE-ENCODED bitmap bytes — the distributed
    * delete path stages each file's serialized RoaringBitmapArray on
    * executors and hands the driver only these KB-order blobs.
    */
  def writeDvFileBytes(fs: FileSystem, tablePath: String,
      dvs: Seq[(String, Array[Byte])]): (String, Map[String, (Long, Long)]) = {
    val uuid = java.util.UUID.randomUUID()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val id = z85Encode(bb.array())
    val o = new java.io.ByteArrayOutputStream
    o.write(1) // format version
    val dos = new java.io.DataOutputStream(o)
    val offsets = dvs.map { case (key, data) =>
      val off = o.size().toLong
      dos.writeInt(data.length)
      dos.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(data)
      dos.writeInt(crc.getValue.toInt)
      key -> (off, data.length.toLong)
    }.toMap
    val out = fs.create(
      new Path(tablePath, s"deletion_vector_$uuid.bin"), false)
    try out.write(o.toByteArray) finally out.close()
    (id, offsets)
  }

  /** Inverse of [[z85Decode]] (exposed for the writer: the uuid id). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "z85 encodes 4-byte groups")
    val sb = new StringBuilder
    var i = 0
    while (i < bytes.length) {
      var acc = 0L
      var j = 0
      while (j < 4) { acc = (acc << 8) | (bytes(i + j) & 0xff); j += 1 }
      val chars = new Array[Char](5)
      var k = 4
      while (k >= 0) {
        chars(k) = Z85Alphabet((acc % 85).toInt); acc /= 85; k -= 1
      }
      sb.appendAll(chars)
      i += 4
    }
    sb.toString
  }

  /** Load + decode one descriptor to sorted deleted row indexes;
    * sizeInBytes and cardinality are verified against the bytes.
    */
  def load(fs: FileSystem, tablePath: String,
      d: Descriptor): Array[Long] = {
    val data: Array[Byte] = d.storageType match {
      case "i" => z85Decode(d.pathOrInlineDv)
      case "u" | "p" =>
        val path =
          if (d.storageType == "u") uuidPath(tablePath, d.pathOrInlineDv)
          else new Path(d.pathOrInlineDv)
        val off = d.offset.getOrElse(throw new IllegalArgumentException(
          s"deletion vector at $path has no offset"))
        val in = fs.open(path)
        try {
          in.seek(off)
          // framing: int32 BE size, data, int32 BE crc32 of the data
          val dis = new java.io.DataInputStream(in)
          val size = dis.readInt()
          require(size == d.sizeInBytes,
            s"DV at $path+$off: framed size $size != descriptor " +
              s"sizeInBytes ${d.sizeInBytes}")
          val bytes = new Array[Byte](size)
          dis.readFully(bytes)
          val crc = dis.readInt()
          val c = new java.util.zip.CRC32
          c.update(bytes)
          require(crc == c.getValue.toInt,
            s"DV at $path+$off: checksum mismatch")
          bytes
        } finally in.close()
      case other => throw new IllegalArgumentException(
        s"deletion vector storageType '$other' is not in the protocol " +
          "(expected u/i/p)")
    }
    if (d.storageType == "i")
      require(data.length >= d.sizeInBytes,
        s"inline DV decodes to ${data.length} bytes < declared " +
          s"${d.sizeInBytes}")
    val rows = decodeBitmap(
      if (d.storageType == "i") data.take(d.sizeInBytes.toInt) else data)
    require(rows.length == d.cardinality,
      s"DV decodes to ${rows.length} rows != declared cardinality " +
        s"${d.cardinality}")
    rows
  }
}
