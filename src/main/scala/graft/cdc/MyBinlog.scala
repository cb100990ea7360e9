package graft.cdc

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Native decoder for the MySQL binary log's row-based replication
  * events — the byte stream `COM_BINLOG_DUMP` returns, documented in
  * the MySQL Internals manual ("Binary log event structure", "Rows
  * event") and the 8.0 source (libbinlogevents). This is the surface
  * the reference consumes through its binlog client
  * (dozer-ingestion/mysql/src/binlog.rs maps Write/Update/DeleteRows
  * events to operations), re-expressed with the same two-pass shape as
  * [[PgOutput]]:
  *
  *   - **Frames** arrive as `(seq, frame)` rows — one binlog event per
  *     row including its 19-byte v4 header. All integers are
  *     LITTLE-endian (the opposite of pgoutput). The header's
  *     `log_pos` (next event position) overrides `seq` when non-zero,
  *     so a capture tool can dump events with seq=0 and ordering still
  *     derives from the log itself.
  *   - **Schema is in-band.** `TABLE_MAP_EVENT` precedes every rows
  *     event and carries column types + metadata; column NAMES ride
  *     the 8.0 optional-metadata TLV block (`binlog_row_metadata=FULL`,
  *     COLUMN_NAME type 4) — the self-describing shape. Pass 1 collects
  *     TABLE_MAP and FORMAT_DESCRIPTION frames driver-side (model-sized
  *     by protocol design); pass 2 decodes rows events map-only in
  *     parallel, binary-searching the table-map version at-or-before
  *     each frame — `table_id` reuse across tables is legal and
  *     handled by the same versioning.
  *   - **Checksums.** FORMAT_DESCRIPTION_EVENT's trailing algorithm
  *     byte declares whether subsequent events carry a CRC32 trailer;
  *     the decoder strips AND VERIFIES it (corrupt frame = loud error,
  *     not silent garbage).
  *   - **Output** is [[ChangeModel]]'s envelope — WriteRows → Insert,
  *     DeleteRows → Delete (full before-image; `binlog_row_image=FULL`
  *     is the default), UpdateRows → preimage + postimage pair sharing
  *     one `_seq`. A column absent from the event's columns-present
  *     bitmap is omitted from the JSON (same carry-over contract as a
  *     TOAST-unchanged pgoutput cell); a NULL-bitmap hit is an explicit
  *     JSON null.
  *
  * Column-type subset: TINY/SHORT/LONG/LONGLONG (signed), FLOAT,
  * DOUBLE, VARCHAR/VAR_STRING (1- or 2-byte length by declared max) —
  * the types the TPC-H-shaped tables need; an unmapped type code fails
  * loudly with the code, like the reference's unsupported-type errors.
  *
  * Scale: identical to [[PgOutput]] — the log is serial but decode is
  * embarrassingly parallel (pass 2 is one flatMap over the frames),
  * and the single wide op is `applyChanges`' key shuffle downstream.
  */
object MyBinlog extends Serializable {

  object EventType {
    val Query = 2; val Rotate = 4; val FormatDescription = 15
    val Xid = 16; val TableMap = 19
    val WriteRowsV2 = 30; val UpdateRowsV2 = 31; val DeleteRowsV2 = 32
  }

  object ColType {
    val Tiny = 1; val Short = 2; val Long = 3; val Float = 4
    val Double = 5; val LongLong = 8; val Varchar = 15
    val VarString = 253
  }

  /** Which tables to decode, by `schema.table` (or bare table). */
  final case class Selection(table: String)

  private final case class ColMeta(name: String, typeCode: Int, meta: Int)
  private final case class TableMeta(qualified: String, cols: Vector[ColMeta])

  // ---------------------------------------------------------------- wire

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def i8(): Int = { val v = buf(pos).toInt; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def i16(): Int = u16().toShort.toInt
    def u32(): Long = (u16().toLong) | (u16().toLong << 16)
    def i32(): Int = u32().toInt
    def u48(): Long = u32() | (u16().toLong << 32)
    def i64(): Long = u32() | (u32() << 32)
    def lenenc(): Long = u8() match {
      case 0xfc => u16().toLong
      case 0xfd => u8().toLong | (u8().toLong << 8) | (u8().toLong << 16)
      case 0xfe => i64()
      case v => v.toLong
    }
    def bytes(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
    def str(n: Int): String = new String(bytes(n), UTF_8)
    def remaining: Int = end - pos
  }

  private final case class Header(eventType: Int, logPos: Long, bodyEnd: Int)

  /** Parse the 19-byte v4 header; `checksummed` strips (and verifies)
    * the 4-byte CRC32 trailer.
    */
  private def readHeader(frame: Array[Byte], checksummed: Boolean): (Header, Reader) = {
    require(frame.length >= 19, "binlog: frame shorter than v4 header")
    val r = new Reader(frame, 0, frame.length)
    r.u32() // timestamp
    val typ = r.u8()
    r.u32() // server_id
    val evLen = r.u32()
    val logPos = r.u32()
    r.u16() // flags
    require(evLen == frame.length,
      s"binlog: header event_length $evLen != frame ${frame.length}")
    // FORMAT_DESCRIPTION itself is checksummed too when alg=CRC32, but
    // its alg byte sits before the trailer; callers handle FDE directly.
    val end =
      if (checksummed && typ != EventType.FormatDescription) {
        val stored = new Reader(frame, frame.length - 4, frame.length).u32()
        val crc = new CRC32()
        crc.update(frame, 0, frame.length - 4)
        require(crc.getValue == stored,
          f"binlog: CRC32 mismatch (stored 0x$stored%08x, computed 0x${crc.getValue}%08x)")
        frame.length - 4
      } else frame.length
    (Header(typ, logPos, end), new Reader(frame, 19, end))
  }

  private def eventType(frame: Array[Byte]): Int =
    if (frame.length >= 5) frame(4) & 0xff else -1

  // ------------------------------------------------------- format/table

  /** FORMAT_DESCRIPTION body: 2 binlog_version, 50 server_version,
    * 4 create_ts, 1 header_len, per-type post-header lengths...; the
    * LAST body byte is the checksum algorithm (1 = CRC32) when the
    * server writes checksums (5.6+ always writes the byte).
    */
  private def checksumAlg(frame: Array[Byte]): Int = {
    // alg byte is last when no checksum (alg declared 0), else 5th-last
    // (alg byte + its own 4-byte CRC trailer)
    val last = frame(frame.length - 1) & 0xff
    val fifth = if (frame.length >= 5) frame(frame.length - 5) & 0xff else 0
    if (fifth == 1) 1 else if (last == 1) 1 else 0
  }

  private object Tlv { val ColumnName = 4 }

  private def readTableMap(r: Reader): (Long, TableMeta) = {
    val tableId = r.u48()
    r.u16() // flags
    val schemaLen = r.u8(); val schema = r.str(schemaLen); r.u8() // NUL
    val tableLen = r.u8(); val table = r.str(tableLen); r.u8() // NUL
    val ncols = r.lenenc().toInt
    val types = Vector.fill(ncols)(r.u8())
    val metaLen = r.lenenc().toInt
    val metaEnd = r.pos + metaLen
    val metas = types.map {
      case ColType.Varchar | ColType.VarString => r.u16()
      case ColType.Float | ColType.Double => r.u8()
      case _ => 0
    }
    require(r.pos == metaEnd,
      s"binlog: table-map metadata length mismatch (${r.pos} != $metaEnd)")
    r.bytes((ncols + 7) / 8) // nullability bitmap (informational)
    // 8.0 optional metadata TLVs; COLUMN_NAME carries the names
    var names: Vector[String] = Vector.empty
    while (r.remaining > 0) {
      val t = r.u8()
      val len = r.lenenc().toInt
      val valueEnd = r.pos + len
      if (t == Tlv.ColumnName) {
        val b = Vector.newBuilder[String]
        while (r.pos < valueEnd) { val n = r.lenenc().toInt; b += r.str(n) }
        names = b.result()
      } else r.pos = valueEnd
    }
    require(names.length == ncols,
      s"binlog: table map for $schema.$table carries ${names.length} column " +
        s"names for $ncols columns — binlog_row_metadata=FULL required " +
        "(COLUMN_NAME TLV), like the reference's information_schema lookup")
    val qualified = if (schema.isEmpty) table else s"$schema.$table"
    val cols = names.lazyZip(types).lazyZip(metas).map(ColMeta.apply).toVector
    (tableId, TableMeta(qualified, cols))
  }

  // ------------------------------------------------------------ registry

  private type Registry = Map[Long, Vector[(Long, TableMeta)]]

  private def buildRegistry(frames: Dataset[(Long, Array[Byte])],
      selections: Seq[Selection], lenient: Boolean = false)
      : (Registry, Vector[(Long, Int)]) = {
    val metaFrames = frames.filter { f =>
      try {
        val t = eventType(f._2)
        t == EventType.TableMap || t == EventType.FormatDescription
      } catch { case _: Exception => false } // truncated header
    }.collect()
    // checksum regime: (seq, alg) switch points from FDE frames
    val algs = metaFrames.iterator
      .filter(f => eventType(f._2) == EventType.FormatDescription)
      .flatMap { case (seq, frame) =>
        try {
          val logPos = new Reader(frame, 13, frame.length).u32()
          Some((if (logPos > 0) logPos else seq, checksumAlg(frame)))
        } catch {
          case e: Exception if lenient => None // corrupt FDE → malformed()
        }
      }.toVector.sortBy(_._1)
    def checksummedAt(seq: Long): Boolean = {
      val at = algs.takeWhile(_._1 <= seq)
      at.nonEmpty && at.last._2 == 1
    }
    // register ALL table maps — selection applies at emit time, because
    // a reused table_id must still resolve to the table actually in
    // force at that seq even when that table is unselected
    val versions = metaFrames.iterator
      .filter(f => eventType(f._2) == EventType.TableMap)
      .flatMap { case (seq0, frame) =>
        try {
          val (h, r) = readHeader(frame, checksummedAt(
            if (frameLogPos(frame) > 0) frameLogPos(frame) else seq0))
          val seq = if (h.logPos > 0) h.logPos else seq0
          val (tableId, meta) = readTableMap(r)
          Some((tableId, (seq, meta)))
        } catch {
          case e: Exception if lenient => None // corrupt map → malformed()
        }
      }.toVector
    val reg = versions.groupBy(_._1).map { case (id, vs) =>
      val sorted = vs.map(_._2).sortBy(_._1)
      // a type change for the SAME qualified table is an error (the
      // reference re-resolves schema and fails the table); table_id
      // reuse by a different table is normal rotation
      sorted.map(_._2).sliding(2).foreach {
        case Seq(a, b) if a.qualified == b.qualified =>
          a.cols.foreach { ca =>
            b.cols.find(_.name == ca.name).foreach { cb =>
              if (cb.typeCode != ca.typeCode)
                throw new IllegalArgumentException(
                  s"binlog: column type changed for ${a.qualified}.${ca.name}: " +
                    s"${ca.typeCode} -> ${cb.typeCode}")
            }
          }
        case _ =>
      }
      id -> sorted
    }
    (reg, algs)
  }

  private def frameLogPos(frame: Array[Byte]): Long =
    if (frame.length >= 17) new Reader(frame, 13, frame.length).u32() else 0L

  private def metaAt(reg: Registry, tableId: Long, seq: Long): Option[TableMeta] =
    reg.get(tableId).flatMap { versions =>
      val at = versions.takeWhile(_._1 <= seq)
      (if (at.nonEmpty) at else versions.take(1)).lastOption.map(_._2)
    }

  // ---------------------------------------------------------------- json

  private def esc(text: String): String = {
    val sb = new StringBuilder(text.length + 2)
    sb.append('"')
    text.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  private def readValue(r: Reader, c: ColMeta): String = c.typeCode match {
    case ColType.Tiny => r.i8().toString
    case ColType.Short => r.i16().toString
    case ColType.Long => r.i32().toString
    case ColType.LongLong => r.i64().toString
    case ColType.Float =>
      java.lang.Float.intBitsToFloat(r.i32()).toString
    case ColType.Double =>
      java.lang.Double.longBitsToDouble(r.i64()).toString
    case ColType.Varchar | ColType.VarString =>
      val n = if (c.meta > 255) r.u16() else r.u8()
      esc(r.str(n))
    case other => throw new IllegalArgumentException(
      s"binlog: unsupported column type $other for ${c.name}")
  }

  private def bit(bm: Array[Byte], i: Int): Boolean =
    (bm(i / 8) & (1 << (i % 8))) != 0

  /** One row image: null bitmap over PRESENT columns, then values. */
  private def rowJson(r: Reader, meta: TableMeta,
      present: Array[Byte]): String = {
    val presentCols = meta.cols.zipWithIndex.filter(p => bit(present, p._2))
    val nullBm = r.bytes((presentCols.length + 7) / 8)
    val parts = presentCols.zipWithIndex.map { case ((c, _), pi) =>
      if (bit(nullBm, pi)) s""""${c.name}":null"""
      else s""""${c.name}":${readValue(r, c)}"""
    }
    parts.mkString("{", ",", "}")
  }

  // -------------------------------------------------------------- decode

  private def selected(sels: Seq[Selection], qualified: String): Boolean = {
    val bare = qualified.substring(qualified.indexOf('.') + 1)
    sels.exists(s => s.table == qualified || s.table == bare)
  }

  private def decodeFrame(reg: Registry, algs: Vector[(Long, Int)],
      sels: Seq[Selection], seq0: Long, frame: Array[Byte])
      : Seq[PgOutput.Change] = {
    val typ = eventType(frame)
    import EventType._
    typ match {
      case WriteRowsV2 | UpdateRowsV2 | DeleteRowsV2 =>
        val pos = frameLogPos(frame)
        val seqGuess = if (pos > 0) pos else seq0
        val checksummed = {
          val at = algs.takeWhile(_._1 <= seqGuess)
          at.nonEmpty && at.last._2 == 1
        }
        val (h, r) = readHeader(frame, checksummed)
        val seq = if (h.logPos > 0) h.logPos else seq0
        val tableId = r.u48()
        r.u16() // flags
        val extraLen = r.u16()
        if (extraLen > 2) r.bytes(extraLen - 2)
        val width = r.lenenc().toInt
        val present1 = r.bytes((width + 7) / 8)
        val present2 =
          if (typ == UpdateRowsV2) r.bytes((width + 7) / 8) else present1
        metaAt(reg, tableId, seq) match {
          case None => Nil // no table map seen for this id
          case Some(meta) if !selected(sels, meta.qualified) => Nil
          case Some(meta) =>
            require(meta.cols.length == width,
              s"binlog: rows event width $width != table map ${meta.cols.length}")
            val out = Seq.newBuilder[PgOutput.Change]
            while (r.remaining > 0) {
              typ match {
                case WriteRowsV2 =>
                  out += PgOutput.Change(meta.qualified, ChangeModel.Insert,
                    seq, rowJson(r, meta, present1))
                case DeleteRowsV2 =>
                  out += PgOutput.Change(meta.qualified, ChangeModel.Delete,
                    seq, rowJson(r, meta, present1))
                case UpdateRowsV2 =>
                  out += PgOutput.Change(meta.qualified, ChangeModel.UpdatePre,
                    seq, rowJson(r, meta, present1))
                  out += PgOutput.Change(meta.qualified, ChangeModel.UpdatePost,
                    seq, rowJson(r, meta, present2))
              }
            }
            out.result()
        }
      // Query/Xid/Rotate/FormatDescription/TableMap: bookkeeping, no change
      case Query | Xid | Rotate | FormatDescription | TableMap => Nil
      case other => throw new IllegalArgumentException(
        s"binlog: unknown event type $other")
    }
  }

  /** Decode a frame DataFrame — columns `(seq: long, frame: binary)`,
    * one binlog event per row — into ChangeModel envelope rows.
    */
  def changes(frames: DataFrame, selections: Seq[Selection]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val ds = frames.select(col("seq").cast("long"), col("frame"))
      .as[(Long, Array[Byte])]
    val (reg, algs) = buildRegistry(ds, selections)
    ds.flatMap { case (seq, frame) =>
      decodeFrame(reg, algs, selections, seq, frame) }
      .toDF()
  }

  /** Lenient decode + dead-letter companions — the same contract as
    * [[PgOutput.changesLenient]]/[[PgOutput.malformed]]: corrupt events
    * (truncated headers, CRC32 mismatches, bad metadata) skip the
    * change stream and land in `malformed` with reasons, map-only.
    */
  def changesLenient(frames: DataFrame, selections: Seq[Selection]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val ds = frames.select(col("seq").cast("long"), col("frame"))
      .as[(Long, Array[Byte])]
    val (reg, algs) = buildRegistry(ds, selections, lenient = true)
    ds.flatMap { case (seq, frame) =>
      try decodeFrame(reg, algs, selections, seq, frame)
      catch { case _: Exception => Nil }
    }.toDF()
  }

  /** Dead-letter rows `(seq, reason)` for events [[changesLenient]]
    * skipped.
    */
  def malformed(frames: DataFrame, selections: Seq[Selection]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val ds = frames.select(col("seq").cast("long"), col("frame"))
      .as[(Long, Array[Byte])]
    val (reg, algs) = buildRegistry(ds, selections, lenient = true)
    ds.flatMap { case (seq, frame) =>
      try { decodeFrame(reg, algs, selections, seq, frame); Nil }
      catch { case e: Exception =>
        Seq((seq, s"${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("")}"))
      }
    }.toDF("seq", "reason")
  }

  /** Decode + materialize current state for one table. */
  def materialize(frames: DataFrame, selection: Selection,
      rowSchema: StructType, keyCols: Seq[String]): DataFrame =
    ChangeModel.applyChanges(
      PgOutput.table(changes(frames, Seq(selection)), selection.table,
        rowSchema),
      keyCols)

  // -------------------------------------------------------------- encode

  /** Event encoders — the capture-tool half; every decode in the gate
    * runs against bytes this codec produced (same strategy as
    * [[PgOutput.Encode]]). `checksum=true` appends the CRC32 trailer.
    */
  object Encode {
    private def out(f: DataOutputStream => Unit): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      f(d); d.flush(); b.toByteArray
    }
    private def w16(d: DataOutputStream, v: Int): Unit = {
      d.writeByte(v & 0xff); d.writeByte((v >> 8) & 0xff)
    }
    private def w32(d: DataOutputStream, v: Long): Unit = {
      w16(d, (v & 0xffff).toInt); w16(d, ((v >> 16) & 0xffff).toInt)
    }
    private def w48(d: DataOutputStream, v: Long): Unit = {
      w32(d, v & 0xffffffffL); w16(d, ((v >> 32) & 0xffff).toInt)
    }
    private def w64(d: DataOutputStream, v: Long): Unit = {
      w32(d, v & 0xffffffffL); w32(d, (v >>> 32) & 0xffffffffL)
    }
    private def lenenc(d: DataOutputStream, v: Long): Unit =
      if (v < 251) d.writeByte(v.toInt)
      else if (v < (1L << 16)) { d.writeByte(0xfc); w16(d, v.toInt) }
      else if (v < (1L << 24)) {
        d.writeByte(0xfd); d.writeByte((v & 0xff).toInt)
        d.writeByte(((v >> 8) & 0xff).toInt); d.writeByte(((v >> 16) & 0xff).toInt)
      } else { d.writeByte(0xfe); w64(d, v) }

    /** @param cols (name, typeCode, meta) — meta is VARCHAR max length
      *             or float/double pack length
      */
    final case class Table(tableId: Long, schema: String, name: String,
        cols: Seq[(String, Int, Int)])

    private def event(eventType: Int, logPos: Long, checksum: Boolean)(
        body: DataOutputStream => Unit): Array[Byte] = {
      val b = out(body)
      val len = 19 + b.length + (if (checksum) 4 else 0)
      val full = out { d =>
        w32(d, 0L) // timestamp
        d.writeByte(eventType)
        w32(d, 1L) // server_id
        w32(d, len.toLong)
        w32(d, logPos)
        w16(d, 0) // flags
        d.write(b)
      }
      if (!checksum) full
      else {
        val crc = new CRC32(); crc.update(full, 0, full.length)
        out { d => d.write(full); w32(d, crc.getValue) }
      }
    }

    /** FORMAT_DESCRIPTION declaring the checksum algorithm. */
    def formatDescription(logPos: Long, crc32: Boolean): Array[Byte] =
      event(EventType.FormatDescription, logPos, checksum = false) { d =>
        w16(d, 4) // binlog version
        val ver = "8.0.0-graft".getBytes(UTF_8)
        d.write(java.util.Arrays.copyOf(ver, 50))
        w32(d, 0L) // create ts
        d.writeByte(19) // header length
        (1 to 38).foreach(_ => d.writeByte(0)) // post-header lens (unused)
        d.writeByte(if (crc32) 1 else 0)
        if (crc32) w32(d, 0L) // trailer placeholder (FDE crc unverified)
      }

    def tableMap(t: Table, logPos: Long, checksum: Boolean): Array[Byte] =
      event(EventType.TableMap, logPos, checksum) { d =>
        w48(d, t.tableId); w16(d, 1)
        val s = t.schema.getBytes(UTF_8)
        d.writeByte(s.length); d.write(s); d.writeByte(0)
        val n = t.name.getBytes(UTF_8)
        d.writeByte(n.length); d.write(n); d.writeByte(0)
        lenenc(d, t.cols.length.toLong)
        t.cols.foreach(c => d.writeByte(c._2))
        val meta = out { m =>
          t.cols.foreach {
            case (_, ColType.Varchar | ColType.VarString, mx) => w16(m, mx)
            case (_, ColType.Float, _) => m.writeByte(4)
            case (_, ColType.Double, _) => m.writeByte(8)
            case _ =>
          }
        }
        lenenc(d, meta.length.toLong); d.write(meta)
        (0 until (t.cols.length + 7) / 8).foreach(_ => d.writeByte(0xff))
        // optional metadata: COLUMN_NAME TLV (binlog_row_metadata=FULL)
        val names = out { m =>
          t.cols.foreach { c =>
            val b = c._1.getBytes(UTF_8); lenenc(m, b.length.toLong); m.write(b)
          }
        }
        d.writeByte(Tlv.ColumnName)
        lenenc(d, names.length.toLong); d.write(names)
      }

    /** Cell = None for SQL NULL, Some(text) per the column's type. */
    type Row = Seq[Option[String]]

    private def writeRow(d: DataOutputStream, t: Table, row: Row): Unit = {
      val bm = new Array[Byte]((t.cols.length + 7) / 8)
      row.zipWithIndex.foreach { case (c, i) =>
        if (c.isEmpty) bm(i / 8) = (bm(i / 8) | (1 << (i % 8))).toByte
      }
      d.write(bm)
      row.zip(t.cols).foreach {
        case (None, _) =>
        case (Some(text), (name, typ, meta)) => typ match {
          case ColType.Tiny => d.writeByte(text.toInt)
          case ColType.Short => w16(d, text.toInt)
          case ColType.Long => w32(d, text.toLong & 0xffffffffL)
          case ColType.LongLong => w64(d, text.toLong)
          case ColType.Float =>
            w32(d, java.lang.Float.floatToIntBits(text.toFloat).toLong & 0xffffffffL)
          case ColType.Double =>
            w64(d, java.lang.Double.doubleToLongBits(text.toDouble))
          case ColType.Varchar | ColType.VarString =>
            val b = text.getBytes(UTF_8)
            if (meta > 255) w16(d, b.length) else d.writeByte(b.length)
            d.write(b)
          case other => throw new IllegalArgumentException(
            s"binlog encode: unsupported type $other for $name")
        }
      }
    }

    private def rowsEvent(typ: Int, t: Table, logPos: Long,
        checksum: Boolean)(body: DataOutputStream => Unit): Array[Byte] =
      event(typ, logPos, checksum) { d =>
        w48(d, t.tableId); w16(d, 1)
        w16(d, 2) // extra-data length (just itself)
        lenenc(d, t.cols.length.toLong)
        val present = new Array[Byte]((t.cols.length + 7) / 8)
        java.util.Arrays.fill(present, 0xff.toByte)
        d.write(present)
        if (typ == EventType.UpdateRowsV2) d.write(present)
        body(d)
      }

    def writeRows(t: Table, rows: Seq[Row], logPos: Long = 0L,
        checksum: Boolean = false): Array[Byte] =
      rowsEvent(EventType.WriteRowsV2, t, logPos, checksum) { d =>
        rows.foreach(writeRow(d, t, _))
      }

    def deleteRows(t: Table, rows: Seq[Row], logPos: Long = 0L,
        checksum: Boolean = false): Array[Byte] =
      rowsEvent(EventType.DeleteRowsV2, t, logPos, checksum) { d =>
        rows.foreach(writeRow(d, t, _))
      }

    def updateRows(t: Table, rows: Seq[(Row, Row)], logPos: Long = 0L,
        checksum: Boolean = false): Array[Byte] =
      rowsEvent(EventType.UpdateRowsV2, t, logPos, checksum) { d =>
        rows.foreach { case (before, after) =>
          writeRow(d, t, before); writeRow(d, t, after)
        }
      }

    def xid(id: Long, logPos: Long = 0L, checksum: Boolean = false): Array[Byte] =
      event(EventType.Xid, logPos, checksum)(d => w64(d, id))
  }
}
