package graft.cdc

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Native decoder for PostgreSQL's `pgoutput` logical-replication wire
  * format — the byte stream a replication slot emits, documented in the
  * PostgreSQL manual ("Logical Streaming Replication Protocol" /
  * "Logical Replication Message Formats"). This is the same surface the
  * reference consumes through the `postgres_protocol` crate
  * (dozer-ingestion/postgres/src/replicator.rs streams XLogData frames;
  * xlog_mapper.rs:55-136 maps Relation/Begin/Commit/Insert/Update/
  * Delete to operations), re-expressed for Spark:
  *
  *   - **Frames** arrive as `(seq, frame)` rows — one pgoutput message
  *     per row, either raw or wrapped in the stream's `w` (XLogData)
  *     envelope; `k` keepalives are recognized and skipped. When the
  *     `w` wrapper is present its WAL-start LSN overrides `seq`.
  *   - **Two-pass decode.** `Relation` messages are in-band schema:
  *     rare (one per table per connection, re-sent on schema change)
  *     and tiny. Pass 1 filters them out and builds a driver-side
  *     registry (model-sized collect, same budget class as an IVF
  *     centroid set); pass 2 decodes data messages **map-only in
  *     parallel** with the registry in the closure — no shuffle, no
  *     serial driver loop over the WAL. A mid-stream schema change is
  *     handled by keeping registry versions sorted by seq and binary-
  *     searching the latest version at-or-before each frame; a column
  *     *type* change raises, like the reference's ColumnTypeChanged
  *     (xlog_mapper.rs:207-215).
  *   - **Output** is [[ChangeModel]]'s envelope — `(table, _op, _seq,
  *     row_json)`, an Update becoming a preimage + postimage pair
  *     sharing one `_seq` — so the stream feeds `applyChanges` /
  *     retractable aggregation unchanged. `row_json` carries the tuple
  *     by column name (values typed by the column's type OID); a
  *     TOAST-unchanged cell is *omitted* from the JSON (the value
  *     lives in prior state, merge at apply time), a wire NULL is an
  *     explicit JSON null.
  *
  * Update/Delete images follow xlog_mapper.rs:89-131 +
  * convert_old_value_to_fields: a Delete's image is its key tuple
  * (key columns valued, the rest null); an Update's preimage is the
  * old-key tuple (`K`) or old-row tuple (`O`) when the wire carries
  * one, else derived key-only from the new tuple; replica identity
  * NOTHING yields an empty preimage object. Begin/Commit/Origin/Type/
  * Message/Truncate frames decode and are skipped (the reference maps
  * Truncate to no operation too — xlog_mapper.rs:132).
  *
  * Scale: the WAL of one slot is a serial log, but its *decode* here is
  * embarrassingly parallel — pass 2 is one whole-partition map over
  * however the frames are stored (files, Kafka partitions), and the
  * single key shuffle happens downstream in `applyChanges`, exactly
  * where any CDC materialization pays it.
  */
object PgOutput extends Serializable {

  /** Which relations to decode, by `namespace.relname` (or bare
    * relname); optional column subset in wanted order — the
    * `tables_columns` selection of xlog_mapper.rs:48-53, keyed by name
    * instead of OID because OIDs are only knowable from the stream.
    * Empty `columns` = all columns in relation order.
    */
  final case class Selection(table: String, columns: Seq[String] = Nil)

  /** One emitted change image (ChangeModel envelope, JSON row). */
  final case class Change(table: String, _op: String, _seq: Long,
      row_json: String)

  private final case class ColMeta(name: String, key: Boolean,
      typeOid: Int, colIndex: Int)

  private final case class RelMeta(qualified: String,
      replicaIdentity: Char, cols: Vector[ColMeta])

  // ---------------------------------------------------------------- wire

  private object Msg {
    val Begin = 'B'; val Commit = 'C'; val Origin = 'O'; val Relation = 'R'
    val Type = 'Y'; val Insert = 'I'; val Update = 'U'; val Delete = 'D'
    val Truncate = 'T'; val LogicalMsg = 'M'
    val XLogData = 'w'; val Keepalive = 'k'
  }

  /** Strip the stream envelope if present: XLogData (`w`) yields
    * (payload offset, Some(walStart)); a keepalive yields None payload.
    */
  private def unwrap(frame: Array[Byte]): Option[(Int, Option[Long])] = {
    if (frame.isEmpty) return None
    frame(0).toChar match {
      case Msg.XLogData =>
        // Byte1('w'), Int64 walStart, Int64 walEnd, Int64 clock, payload
        val walStart = ByteBuffer.wrap(frame, 1, 8).getLong
        Some((25, Some(walStart)))
      case Msg.Keepalive => None
      case _ => Some((0, None))
    }
  }

  private final class Reader(buf: Array[Byte], var pos: Int) {
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def i8(): Byte = { val v = buf(pos); pos += 1; v }
    def i16(): Int = { val v = ByteBuffer.wrap(buf, pos, 2).getShort.toInt; pos += 2; v }
    def i32(): Int = { val v = ByteBuffer.wrap(buf, pos, 4).getInt; pos += 4; v }
    def i64(): Long = { val v = ByteBuffer.wrap(buf, pos, 8).getLong; pos += 8; v }
    def cstr(): String = {
      val end = buf.indexOf(0.toByte, pos)
      require(end >= 0, "pgoutput: unterminated string")
      val s = new String(buf, pos, end - pos, UTF_8); pos = end + 1; s
    }
    def bytes(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
  }

  /** A decoded tuple: per wire column index, None = TOAST-unchanged,
    * Some(None) = NULL, Some(Some(text)) = text value.
    */
  private def readTuple(r: Reader): Vector[Option[Option[String]]] = {
    val n = r.i16()
    Vector.fill(n) {
      r.u8().toChar match {
        case 'n' => Some(None)
        case 'u' => None
        case 't' =>
          val len = r.i32()
          Some(Some(new String(r.bytes(len), UTF_8)))
        case 'b' => throw new IllegalArgumentException(
          "pgoutput: binary-format tuple cells ('b') are not requested " +
            "by this decoder (text format only, like the reference)")
        case other => throw new IllegalArgumentException(
          s"pgoutput: unknown tuple cell kind '$other'")
      }
    }
  }

  private def readRelation(r: Reader): (Int, String, Char, Vector[ColMeta]) = {
    val relId = r.i32()
    val namespace = r.cstr()
    val relname = r.cstr()
    val identity = r.u8().toChar // 'd' | 'n' | 'f' | 'i'
    val ncols = r.i16()
    val cols = Vector.tabulate(ncols) { i =>
      val flags = r.i8() // 1 = part of replica-identity key
      val name = r.cstr()
      val typeOid = r.i32()
      r.i32() // atttypmod, unused
      ColMeta(name, key = (flags & 1) == 1, typeOid, i)
    }
    val qualified =
      if (namespace.isEmpty || namespace == "public") relname
      else s"$namespace.$relname"
    (relId, qualified, identity, cols)
  }

  // ------------------------------------------------------------ registry

  /** Versioned relation registry: relId -> versions sorted by seq. */
  private type Registry = Map[Int, Vector[(Long, RelMeta)]]

  private def isRelationFrame(frame: Array[Byte]): Boolean =
    unwrap(frame).exists { case (off, _) =>
      off < frame.length && frame(off).toChar == Msg.Relation
    }

  private def selectionFor(sels: Seq[Selection], qualified: String)
      : Option[Selection] = {
    val bare = qualified.substring(qualified.indexOf('.') + 1)
    sels.find(s => s.table == qualified || s.table == bare)
  }

  /** Build the driver-side registry from the stream's Relation frames.
    * Relation messages are one-per-table-per-connection (plus schema
    * changes) — a model-sized collect, NOT data-sized.
    */
  private def buildRegistry(frames: Dataset[(Long, Array[Byte])],
      selections: Seq[Selection], lenient: Boolean = false): Registry = {
    val relFrames = frames.filter { f =>
      try isRelationFrame(f._2)
      catch { case _: Exception => false } // corrupt wrap: not a Relation
    }.collect()
    val versions = relFrames.flatMap { case (seq, frame) =>
      try {
        val (off, lsn) = unwrap(frame).get
        val r = new Reader(frame, off + 1)
        val (relId, qualified, identity, allCols) = readRelation(r)
        selectionFor(selections, qualified).map { sel =>
          val wanted =
            if (sel.columns.isEmpty) allCols
            else {
              val byName = allCols.map(c => c.name -> c).toMap
              sel.columns.toVector.map(n => byName.getOrElse(n,
                throw new IllegalArgumentException(
                  s"pgoutput: relation $qualified has no column '$n' " +
                    s"(has ${allCols.map(_.name).mkString(", ")})")))
            }
          (relId, (lsn.getOrElse(seq), RelMeta(qualified, identity, wanted)))
        }
      } catch {
        // corrupt Relation frame: skipped here, surfaced by [[malformed]]
        case e: Exception if lenient => None
      }
    }
    versions.groupBy(_._1).map { case (relId, vs) =>
      val sorted = vs.map(_._2).sortBy(_._1).toVector
      // reference parity: a column type change mid-stream is an error
      // (xlog_mapper.rs:207-215); identical re-sends (reconnects) are fine
      sorted.map(_._2).sliding(2).foreach {
        case Seq(a, b) =>
          a.cols.foreach { ca =>
            b.cols.find(_.name == ca.name).foreach { cb =>
              if (cb.typeOid != ca.typeOid)
                throw new IllegalArgumentException(
                  s"pgoutput: column type changed for ${a.qualified}." +
                    s"${ca.name}: oid ${ca.typeOid} -> ${cb.typeOid}")
            }
          }
        case _ =>
      }
      relId -> sorted
    }
  }

  private def metaAt(reg: Registry, relId: Int, seq: Long): Option[RelMeta] =
    reg.get(relId).flatMap { versions =>
      val at = versions.takeWhile(_._1 <= seq)
      (if (at.nonEmpty) at else versions.take(1)).lastOption.map(_._2)
    }

  // ---------------------------------------------------------------- json

  /** Text-protocol value -> JSON token by type OID. Integers, numeric
    * and floats pass through as JSON numbers (the text IS a valid JSON
    * number); bool maps t/f; everything else is a JSON string.
    */
  private def jsonValue(typeOid: Int, text: String): String = typeOid match {
    case 16 => if (text == "t") "true" else "false"
    case 20 | 21 | 23 | 26 | 700 | 701 | 1700 => text
    case _ =>
      val sb = new StringBuilder(text.length + 2)
      sb.append('"')
      text.foreach {
        case '"'  => sb.append("\\\"")
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

  /** Assemble the row JSON in selection order. `onlyKey` nulls non-key
    * columns (convert_values_to_fields(_, _, only_key=true),
    * xlog_mapper.rs:228-255); TOAST-unchanged cells are omitted.
    */
  private def rowJson(meta: RelMeta,
      tuple: Vector[Option[Option[String]]], onlyKey: Boolean): String = {
    val parts = meta.cols.flatMap { c =>
      if (onlyKey && !c.key) Some(s""""${c.name}":null""")
      else tuple.lift(c.colIndex).flatten match {
        case None => None // absent cell or TOAST-unchanged: omit
        case Some(None) => Some(s""""${c.name}":null""")
        case Some(Some(text)) =>
          Some(s""""${c.name}":${jsonValue(c.typeOid, text)}""")
      }
    }
    parts.mkString("{", ",", "}")
  }

  // -------------------------------------------------------------- decode

  private def decodeFrame(reg: Registry, seq0: Long,
      frame: Array[Byte]): Seq[Change] = {
    unwrap(frame) match {
      case None => Nil // keepalive
      case Some((off, lsn)) if off < frame.length =>
        val seq = lsn.getOrElse(seq0)
        val r = new Reader(frame, off + 1)
        frame(off).toChar match {
          case Msg.Insert =>
            val relId = r.i32()
            metaAt(reg, relId, seq).toSeq.flatMap { meta =>
              require(r.u8().toChar == 'N', "pgoutput: Insert expects 'N'")
              val tuple = readTuple(r)
              Seq(Change(meta.qualified, ChangeModel.Insert, seq,
                rowJson(meta, tuple, onlyKey = false)))
            }
          case Msg.Update =>
            val relId = r.i32()
            metaAt(reg, relId, seq).toSeq.flatMap { meta =>
              var oldTuple: Option[(Char, Vector[Option[Option[String]]])] = None
              var kind = r.u8().toChar
              if (kind == 'K' || kind == 'O') {
                oldTuple = Some((kind, readTuple(r)))
                kind = r.u8().toChar
              }
              require(kind == 'N', "pgoutput: Update expects 'N' tuple")
              val newTuple = readTuple(r)
              // preimage: wire old tuple if present, else key-only from
              // the new tuple; identity NOTHING -> empty record
              // (convert_old_value_to_fields, xlog_mapper.rs:257-270)
              val pre =
                if (meta.replicaIdentity == 'n') "{}"
                else oldTuple match {
                  case Some((k, t)) => rowJson(meta, t, onlyKey = k == 'K')
                  case None => rowJson(meta, newTuple, onlyKey = true)
                }
              Seq(
                Change(meta.qualified, ChangeModel.UpdatePre, seq, pre),
                Change(meta.qualified, ChangeModel.UpdatePost, seq,
                  rowJson(meta, newTuple, onlyKey = false)))
            }
          case Msg.Delete =>
            val relId = r.i32()
            metaAt(reg, relId, seq).toSeq.flatMap { meta =>
              val kind = r.u8().toChar
              require(kind == 'K' || kind == 'O',
                s"pgoutput: Delete expects 'K' or 'O', got '$kind'")
              val tuple = readTuple(r)
              Seq(Change(meta.qualified, ChangeModel.Delete, seq,
                rowJson(meta, tuple, onlyKey = kind == 'K')))
            }
          // transaction / metadata frames: decoded, no change emitted —
          // Begin/Commit are stream bookkeeping (the reference forwards
          // them as markers, xlog_mapper.rs:63-68; _seq ordering already
          // carries commit order here), Truncate maps to no operation
          // in the reference too (xlog_mapper.rs:132)
          case Msg.Begin | Msg.Commit | Msg.Origin | Msg.Type |
               Msg.Relation | Msg.Truncate | Msg.LogicalMsg => Nil
          case other => throw new IllegalArgumentException(
            s"pgoutput: unknown message type '$other'")
        }
      case _ => Nil
    }
  }

  /** Decode a frame DataFrame — columns `(seq: long, frame: binary)` —
    * into ChangeModel envelope rows `(table, _op, _seq, row_json)`.
    * Pass 1 collects the (tiny) Relation frames into a registry; pass 2
    * is a parallel map-only flatMap over all frames.
    */
  def changes(frames: DataFrame, selections: Seq[Selection]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val ds = frames.select(col("seq").cast("long"), col("frame"))
      .as[(Long, Array[Byte])]
    val reg = buildRegistry(ds, selections)
    ds.flatMap { case (seq, frame) => decodeFrame(reg, seq, frame) }.toDF()
  }

  private def describeFailure(e: Throwable): String =
    s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"

  /** Lenient decode for pipelines that must survive corrupt frames
    * (the [[Debezium.malformed]] dead-letter pattern, applied to the
    * binary codec): frames that fail to decode are skipped here and
    * surface with reasons in [[malformed]]; corrupt Relation frames are
    * likewise skipped when building the registry. The strict
    * [[changes]] stays loud — in a healthy replication session a
    * corrupt frame is a protocol violation worth stopping for; route
    * `changesLenient` + `malformed` when availability wins.
    */
  def changesLenient(frames: DataFrame, selections: Seq[Selection]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val ds = frames.select(col("seq").cast("long"), col("frame"))
      .as[(Long, Array[Byte])]
    val reg = buildRegistry(ds, selections, lenient = true)
    ds.flatMap { case (seq, frame) =>
      try decodeFrame(reg, seq, frame)
      catch { case _: Exception => Nil }
    }.toDF()
  }

  /** Dead-letter rows `(seq, reason)` for frames [[changesLenient]]
    * skipped — map-only, same scan shape as the decode itself.
    */
  def malformed(frames: DataFrame, selections: Seq[Selection]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val ds = frames.select(col("seq").cast("long"), col("frame"))
      .as[(Long, Array[Byte])]
    val reg = buildRegistry(ds, selections, lenient = true)
    ds.flatMap { case (seq, frame) =>
      try { decodeFrame(reg, seq, frame); Nil }
      catch { case e: Exception => Seq((seq, describeFailure(e))) }
    }.toDF("seq", "reason")
  }

  /** Flatten one table's envelope rows to ChangeModel change rows with
    * real columns: `from_json(row_json)` against the caller's schema.
    * Missing keys (TOAST-unchanged) and explicit nulls both land as
    * column NULL here; callers needing TOAST carry-over merge against
    * prior state at apply time.
    */
  def table(changes: DataFrame, name: String, rowSchema: StructType)
      : DataFrame = {
    val bare = name.substring(name.indexOf('.') + 1)
    changes
      .filter(col("table") === name || col("table") === bare ||
        substring_index(col("table"), ".", -1) === name)
      .withColumn("_row", from_json(col("row_json"), rowSchema))
      .select((rowSchema.fieldNames.map(f => col(s"_row.$f").as(f)) ++
        Seq(col("_op"), col("_seq"))): _*)
  }

  /** Decode + materialize current state for one table (key columns =
    * replica identity), the full snapshot-free CDC path: frames ->
    * changes -> latest surviving image per key.
    */
  def materialize(frames: DataFrame, selection: Selection,
      rowSchema: StructType, keyCols: Seq[String]): DataFrame =
    ChangeModel.applyChanges(
      table(changes(frames, Seq(selection)), selection.table, rowSchema),
      keyCols)

  // -------------------------------------------------------------- encode

  /** Frame encoders — the other half of the wire codec. Used by specs
    * and the oracled query so every decode in the gate runs against
    * bytes *this* codec produced and the format round-trips; also what
    * a capture tool writes when recording a slot to files.
    */
  object Encode {
    private def out(f: DataOutputStream => Unit): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      f(d); d.flush(); b.toByteArray
    }
    private def cstr(d: DataOutputStream, s: String): Unit = {
      d.write(s.getBytes(UTF_8)); d.writeByte(0)
    }
    private def tuple(d: DataOutputStream,
        cells: Seq[Option[String]]): Unit = {
      d.writeShort(cells.length)
      cells.foreach {
        case None => d.writeByte('n')
        case Some(text) =>
          val bytes = text.getBytes(UTF_8)
          d.writeByte('t'); d.writeInt(bytes.length); d.write(bytes)
      }
    }
    /** A TOAST-unchanged cell in [[update]]'s new tuple — matched by
      * reference identity (unique instance), so no data string can
      * collide with the sentinel.
      */
    val Toast: Option[String] = Some(new String("<toast-unchanged>"))
    private def tupleWithToast(d: DataOutputStream,
        cells: Seq[Option[String]]): Unit = {
      d.writeShort(cells.length)
      cells.foreach {
        case None => d.writeByte('n')
        case Some(t) if t.asInstanceOf[AnyRef] eq Toast.get => d.writeByte('u')
        case Some(text) =>
          val bytes = text.getBytes(UTF_8)
          d.writeByte('t'); d.writeInt(bytes.length); d.write(bytes)
      }
    }

    def begin(finalLsn: Long, commitTsMicros: Long, xid: Int): Array[Byte] =
      out { d =>
        d.writeByte(Msg.Begin)
        d.writeLong(finalLsn); d.writeLong(commitTsMicros); d.writeInt(xid)
      }

    def commit(commitLsn: Long, endLsn: Long, tsMicros: Long): Array[Byte] =
      out { d =>
        d.writeByte(Msg.Commit); d.writeByte(0)
        d.writeLong(commitLsn); d.writeLong(endLsn); d.writeLong(tsMicros)
      }

    /** @param cols (name, typeOid, isKey) in relation order */
    def relation(relId: Int, namespace: String, relname: String,
        replicaIdentity: Char, cols: Seq[(String, Int, Boolean)])
        : Array[Byte] = out { d =>
      d.writeByte(Msg.Relation)
      d.writeInt(relId); cstr(d, namespace); cstr(d, relname)
      d.writeByte(replicaIdentity); d.writeShort(cols.length)
      cols.foreach { case (name, oid, key) =>
        d.writeByte(if (key) 1 else 0); cstr(d, name)
        d.writeInt(oid); d.writeInt(-1)
      }
    }

    def insert(relId: Int, cells: Seq[Option[String]]): Array[Byte] =
      out { d =>
        d.writeByte(Msg.Insert); d.writeInt(relId); d.writeByte('N')
        tuple(d, cells)
      }

    /** @param oldTuple (kind 'K' or 'O', cells) when the wire carries an
      *                 old image; new-tuple cells may be [[Toast]]
      */
    def update(relId: Int, oldTuple: Option[(Char, Seq[Option[String]])],
        newCells: Seq[Option[String]]): Array[Byte] = out { d =>
      d.writeByte(Msg.Update); d.writeInt(relId)
      oldTuple.foreach { case (kind, cells) =>
        d.writeByte(kind); tuple(d, cells)
      }
      d.writeByte('N'); tupleWithToast(d, newCells)
    }

    def delete(relId: Int, kind: Char,
        cells: Seq[Option[String]]): Array[Byte] = out { d =>
      d.writeByte(Msg.Delete); d.writeInt(relId)
      d.writeByte(kind); tuple(d, cells)
    }

    def truncate(relIds: Seq[Int], options: Int = 0): Array[Byte] =
      out { d =>
        d.writeByte(Msg.Truncate)
        d.writeInt(relIds.length); d.writeByte(options)
        relIds.foreach(d.writeInt)
      }

    def origin(commitLsn: Long, name: String): Array[Byte] = out { d =>
      d.writeByte(Msg.Origin); d.writeLong(commitLsn); cstr(d, name)
    }

    def typeMsg(typeOid: Int, namespace: String, name: String): Array[Byte] =
      out { d =>
        d.writeByte(Msg.Type); d.writeInt(typeOid)
        cstr(d, namespace); cstr(d, name)
      }

    /** Wrap a message in the stream's XLogData envelope. */
    def xlogData(walStart: Long, walEnd: Long, clock: Long,
        payload: Array[Byte]): Array[Byte] = out { d =>
      d.writeByte(Msg.XLogData)
      d.writeLong(walStart); d.writeLong(walEnd); d.writeLong(clock)
      d.write(payload)
    }

    def keepalive(walEnd: Long, clock: Long,
        replyRequested: Boolean): Array[Byte] = out { d =>
      d.writeByte(Msg.Keepalive)
      d.writeLong(walEnd); d.writeLong(clock)
      d.writeByte(if (replyRequested) 1 else 0)
    }
  }
}
