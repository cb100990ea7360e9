package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import graft.sources.{DeletionVectors, DeltaLite}

/** Test-side ENCODER for deletion vectors, written independently from
  * the reader against the same public specs (PROTOCOL.md framing + Z85,
  * RoaringFormatSpec containers) so the round-trip pins both.
  */
object DvTestUtil {
  private val Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "z85 encodes 4-byte groups")
    val sb = new StringBuilder
    bytes.grouped(4).foreach { g =>
      var acc = 0L
      g.foreach(b => acc = (acc << 8) | (b & 0xff))
      val chars = new Array[Char](5)
      var i = 4
      while (i >= 0) { chars(i) = Alphabet((acc % 85).toInt); acc /= 85; i -= 1 }
      sb.appendAll(chars)
    }
    sb.toString
  }

  private def writeIntLE(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }
  private def writeShortLE(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }
  private def writeLongLE(o: ByteArrayOutputStream, v: Long): Unit = {
    writeIntLE(o, (v & 0xffffffffL).toInt)
    writeIntLE(o, (v >>> 32).toInt)
  }

  /** RoaringBitmapArray portable bytes for a set of row indexes —
    * ARRAY containers only (cardinality ≤ 4096 per 16-bit chunk, plenty
    * for fixtures).
    */
  def dvBytes(rows: Seq[Long]): Array[Byte] = {
    val o = new ByteArrayOutputStream
    writeIntLE(o, 1681511377) // magic
    val byHigh = rows.distinct.sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    writeLongLE(o, byHigh.size.toLong)
    byHigh.foreach { case (high, vs) =>
      writeIntLE(o, high.toInt)
      val byKey = vs.map(v => (v & 0xffffffffL).toInt)
        .groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      writeIntLE(o, 12346) // SERIAL_COOKIE_NO_RUNCONTAINER
      writeIntLE(o, byKey.size)
      byKey.foreach { case (key, cvs) =>
        writeShortLE(o, key)
        writeShortLE(o, cvs.size - 1)
      }
      // offsets header: container start from the bitmap's beginning
      var off = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, cvs) =>
        writeIntLE(o, off)
        off += 2 * cvs.size
      }
      byKey.foreach { case (_, cvs) =>
        cvs.sorted.foreach(v => writeShortLE(o, v & 0xffff))
      }
    }
    o.toByteArray
  }

  /** Inline descriptor triple: (pathOrInlineDv, sizeInBytes, cardinality). */
  def inlineDv(rows: Seq[Long]): (String, Long, Long) = {
    val data = dvBytes(rows)
    val padded = data ++ new Array[Byte]((4 - data.length % 4) % 4)
    (z85Encode(padded), data.length.toLong, rows.distinct.size.toLong)
  }

  /** Write a `u`-storage DV FILE for one uuid: version byte, pad to
    * `offset`, then `<size BE><data><crc32 BE>`. Returns (pathOrInlineDv,
    * offset, sizeInBytes, cardinality).
    */
  def writeDvFile(fs: org.apache.hadoop.fs.FileSystem, tablePath: String,
      rows: Seq[Long], prefix: String = ""): (String, Long, Long, Long) = {
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val id = prefix + z85Encode(bb.array())
    val data = dvBytes(rows)
    val o = new ByteArrayOutputStream
    o.write(1) // format version
    val offset = o.size().toLong
    // size + crc are BIG-endian per the protocol's DV file layout
    val dos = new java.io.DataOutputStream(o)
    dos.writeInt(data.length)
    dos.write(data)
    val crc = new java.util.zip.CRC32
    crc.update(data)
    dos.writeInt(crc.getValue.toInt)
    val dir = if (prefix.isEmpty) new Path(tablePath)
      else new Path(tablePath, prefix)
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, s"deletion_vector_$uuid.bin"), true)
    try out.write(o.toByteArray) finally out.close()
    (id, offset, data.length.toLong, rows.distinct.size.toLong)
  }
}

class DeletionVectorsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("z85 round-trips bytes and rejects bad lengths/characters") {
    val bytes = Array.tabulate(16)(i => (i * 37 % 256).toByte)
    assert(DeletionVectors.z85Decode(DvTestUtil.z85Encode(bytes))
      .toSeq == bytes.toSeq)
    intercept[IllegalArgumentException](DeletionVectors.z85Decode("abc"))
    intercept[IllegalArgumentException](DeletionVectors.z85Decode("a b,c"))
  }

  test("bitmap decode: array containers across 16-bit chunks and 32-bit " +
      "bitmaps, sorted output") {
    val rows = Seq(0L, 3L, 65536L + 7L, (1L << 32) + 5L, 10L)
    val got = DeletionVectors.decodeBitmap(DvTestUtil.dvBytes(rows))
    assert(got.toSeq == rows.distinct.sorted)
  }

  test("bitmap decode: BITSET container (cardinality > 4096) and RUN " +
      "container forms") {
    // bitset: 5000 even values in chunk 0
    val o = new ByteArrayOutputStream
    def i32(v: Int) = { o.write(v & 0xff); o.write((v >>> 8) & 0xff)
      o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff) }
    def i16(v: Int) = { o.write(v & 0xff); o.write((v >>> 8) & 0xff) }
    i32(1681511377)
    i32(1); i32(0) // int64 LE count = 1
    i32(0)         // bitmap key (high 32)
    i32(12346)     // cookie
    i32(1)         // 1 container
    i16(0); i16(5000 - 1)
    i32(4 + 4 + 4 + 4) // offsets header (1 entry)
    // bitset container: 1024 longs, bits set for even values < 10000
    val words = new Array[Long](1024)
    (0 until 10000 by 2).foreach(v => words(v >>> 6) |= (1L << (v & 63)))
    words.foreach { w =>
      i32((w & 0xffffffffL).toInt); i32((w >>> 32).toInt)
    }
    val got = DeletionVectors.decodeBitmap(o.toByteArray)
    assert(got.toSeq == (0 until 10000 by 2).map(_.toLong))
    // run container: cookie 12347, values 10..20 and 30..32
    val r = new ByteArrayOutputStream
    def r32(v: Int) = { r.write(v & 0xff); r.write((v >>> 8) & 0xff)
      r.write((v >>> 16) & 0xff); r.write((v >>> 24) & 0xff) }
    def r16(v: Int) = { r.write(v & 0xff); r.write((v >>> 8) & 0xff) }
    r32(1681511377)
    r32(1); r32(0)
    r32(0)
    r32((0 << 16) | 12347) // (size-1)=0, run cookie
    r.write(1)             // run flags: container 0 is a run
    r16(0); r16(14 - 1)    // key 0, cardinality 14
    // size(1) < NoOffsetThreshold → NO offsets header
    r16(2)                 // 2 runs
    r16(10); r16(10)       // 10..20
    r16(30); r16(2)        // 30..32
    val runGot = DeletionVectors.decodeBitmap(r.toByteArray)
    assert(runGot.toSeq == ((10L to 20L) ++ (30L to 32L)))
  }

  test("uuidPath derives <prefix>/deletion_vector_<uuid>.bin from the " +
      "z85 uuid id") {
    val uuid = java.util.UUID.fromString(
      "00112233-4455-6677-8899-aabbccddeeff")
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val id = DvTestUtil.z85Encode(bb.array())
    assert(DeletionVectors.uuidPath("/t", id).toString ==
      s"/t/deletion_vector_$uuid.bin")
    assert(DeletionVectors.uuidPath("/t", "ab" + id).toString ==
      s"/t/ab/deletion_vector_$uuid.bin")
  }

  test("encodeBitmap: round-trips through decodeBitmap (array + bitset " +
      "containers, multiple chunks) and agrees byte-for-byte with the " +
      "independent test encoder on array forms") {
    val small = Array(0L, 3L, 10L, 65536L + 7L, (1L << 32) + 5L)
    assert(DeletionVectors.decodeBitmap(
      DeletionVectors.encodeBitmap(small)).toSeq == small.sorted.toSeq)
    assert(DeletionVectors.encodeBitmap(small).toSeq ==
      DvTestUtil.dvBytes(small.toSeq).toSeq,
      "two independent spec implementations disagree")
    val big = (0L until 10000L by 2).toArray // bitset container
    assert(DeletionVectors.decodeBitmap(
      DeletionVectors.encodeBitmap(big)).toSeq == big.toSeq)
    // mixed: one bitset chunk + one array chunk
    val mixed = big ++ Array(200000L, 200001L)
    assert(DeletionVectors.decodeBitmap(
      DeletionVectors.encodeBitmap(mixed)).toSeq == mixed.sorted.toSeq)
  }

  test("DeltaLite.deleteWhere: merge-on-read DV delete — zero data-file " +
      "rewrites, stacking deletes union bitmaps, a fully-deleted file " +
      "is removed, time travel sees the pre-delete state") {
    import graft.sources.DeltaLite
    val t = java.nio.file.Files.createTempDirectory("delta_dvdel")
      .toString + "/tbl"
    DeltaLite.write(spark,
      (0L to 9L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), t)
    DeltaLite.write(spark,
      (10L to 14L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1), t)
    val filesBefore = DeltaLite.snapshot(spark, t).files.keySet
    val v1 = DeltaLite.deleteWhere(spark, t, col("k") % 2 === 0)
    assert(DeltaLite.read(spark, t).as[(Long, String)].collect()
      .map(_._1).toSet == Set(1L, 3L, 5L, 7L, 9L, 11L, 13L))
    val snap1 = DeltaLite.snapshot(spark, t)
    assert(snap1.files.keySet == filesBefore,
      "a DV delete must not rewrite or drop data files")
    assert(snap1.dvs.size == 2)
    // stacked delete UNIONS with the existing DVs
    DeltaLite.deleteWhere(spark, t, col("k") === 1L)
    assert(DeltaLite.read(spark, t).as[(Long, String)].collect()
      .map(_._1).toSet == Set(3L, 5L, 7L, 9L, 11L, 13L))
    // no-match delete is a no-op version-wise
    val vSame = DeltaLite.deleteWhere(spark, t, col("k") === 999L)
    assert(vSame == DeltaLite.snapshot(spark, t).version)
    // deleting EVERY remaining row of file 2 removes it outright
    DeltaLite.deleteWhere(spark, t, col("k") >= 10L)
    val snap3 = DeltaLite.snapshot(spark, t)
    assert(snap3.files.size == 1,
      s"fully-deleted file must be removed: ${snap3.files.keySet}")
    assert(DeltaLite.read(spark, t).as[(Long, String)].collect()
      .map(_._1).toSet == Set(3L, 5L, 7L, 9L))
    // time travel BEFORE the first delete sees all 15 rows
    assert(DeltaLite.read(spark, t, Some(v1 - 1)).count() == 15)
    // appends continue to work next to live DVs; MERGE reads through
    // them (deleted keys stay deleted, touched bitmaps are absorbed)
    DeltaLite.write(spark, Seq((100L, "new")).toDF("k", "v"), t)
    assert(DeltaLite.read(spark, t).count() == 5)
    DeltaLite.upsert(spark, Seq((3L, "Z")).toDF("k", "v"), t, Seq("k"))
    val merged = DeltaLite.read(spark, t).as[(Long, String)].collect().toMap
    assert(merged(3L) == "Z" &&
      merged.keySet == Set(3L, 5L, 7L, 9L, 100L), merged.toString)
  }

  test("a DV'd table reads natively: inline and u-storage vectors " +
      "suppress their rows; vacuum keeps the live DV file; MERGE " +
      "reads through them; the DV counts toward nothing it shouldn't") {
    val t = java.nio.file.Files.createTempDirectory("delta_dv").toString
    // two files, 5 rows each, written as single files
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = t + "_stage"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val f = fs(t).listStatus(new Path(stage))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      fs(t).mkdirs(new Path(t))
      assert(fs(t).rename(f, new Path(t, name)))
      fs(t).delete(new Path(stage), true)
      ()
    }
    writeOne((0L to 4L).map(i => (i, s"a$i")).toDF("k", "v"), "f1.parquet")
    writeOne((10L to 14L).map(i => (i, s"b$i")).toDF("k", "v"), "f2.parquet")
    val schema = Seq((1L, "x")).toDF("k", "v").schema
    // f1: inline DV deleting row indexes 1, 3 → keeps k = 0, 2, 4
    val (inline, iSize, iCard) = DvTestUtil.inlineDv(Seq(1L, 3L))
    // f2: u-storage DV file deleting row index 0 → keeps k = 11..14
    val (uId, uOff, uSize, uCard) =
      DvTestUtil.writeDvFile(fs(t), t, Seq(0L))
    def esc(s: String) =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val logDir = new Path(t, "_delta_log")
    fs(t).mkdirs(logDir)
    val out = fs(t).create(new Path(logDir, f"${0L}%020d.json"), true)
    try out.write((Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"dv","format":{"provider":"parquet","options":{}},"schemaString":${esc(schema.json)},"partitionColumns":[],"configuration":{},"createdTime":1}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":${esc(inline)},"sizeInBytes":$iSize,"cardinality":$iCard}}}""",
      s"""{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":${esc(uId)},"offset":$uOff,"sizeInBytes":$uSize,"cardinality":$uCard}}}""")
      .mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val got = DeltaLite.read(spark, t).as[(Long, String)].collect().toSet
    assert(got == Set((0L, "a0"), (2L, "a2"), (4L, "a4"),
      (11L, "b11"), (12L, "b12"), (13L, "b13"), (14L, "b14")), got.toString)
    // version-pinned read applies the same DVs
    assert(DeltaLite.read(spark, t, Some(0L)).count() == 7)
    // vacuum must NOT delete the live DV file
    assert(DeltaLite.vacuum(spark, t) == 0)
    assert(fs(t).listStatus(new Path(t)).exists(
      _.getPath.getName.startsWith("deletion_vector_")))
    // the native MERGE reads THROUGH live DVs: the replaced key lands,
    // every DV-deleted key stays deleted (inline AND u-storage)
    DeltaLite.upsert(spark, Seq((2L, "Z")).toDF("k", "v"), t, Seq("k"))
    val merged = DeltaLite.read(spark, t).as[(Long, String)].collect().toMap
    assert(merged(2L) == "Z" && merged.keySet ==
      Set(0L, 2L, 4L, 11L, 12L, 13L, 14L), merged.toString)
  }
}
