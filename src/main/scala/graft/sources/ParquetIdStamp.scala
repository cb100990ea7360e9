package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.{ConvertedType, FieldRepetitionType, SchemaElement, Util}
import org.apache.spark.sql.types._

/** Stamp parquet `field_id`s that Spark's writer cannot: the implicit
  * `element` member of LIST columns and the `key`/`value` members of
  * MAP columns (Spark's `SparkToParquetSchemaConverter` reads
  * `parquet.field.id` from `StructField` metadata, and those members
  * are not StructFields — verified absent from the Spark 4.1 writer).
  * Delta's icebergCompatV2 (UniForm) requires them: iceberg numbers
  * list/map members, so a strict field-id-resolving iceberg reader of
  * the synced table needs the ids IN the data files
  * (delta PROTOCOL.md "IcebergCompatV2 … requires that nested field
  * IDs be written for ArrayType and MapType"; delta-spark ships its
  * own parquet WriteSupport for the same reason).
  *
  * Mechanism: rewrite the file's FOOTER in place. The parquet layout
  * is `[PAR1][row groups…][FileMetaData thrift][len:4 LE][PAR1]` —
  * column-chunk offsets all point into the untouched data region, so
  * re-serializing the (KB-sized) footer with `field_id` set on the
  * member SchemaElements is a metadata-only edit, the same IO class as
  * writing the commit entry for the file. Local files are patched with
  * a seek+truncate; other filesystems pay a copy-rewrite (staging in
  * graft is always local-then-move, so the copy path is a correctness
  * fallback, not a hot path).
  */
object ParquetIdStamp {

  /** `files`' footers gain `field_id` on every schema element whose
    * id-path (dot-joined names; list members as `element`, map members
    * as `key`/`value`) appears in `ids`. Bounded-parallel like
    * [[ParquetFooterStats.readAll]] — a wide commit stages hundreds of
    * part files and serializing footer round-trips is pure latency.
    */
  def stampAll(conf: Configuration, files: Seq[Path],
      ids: Map[String, Int], parallelism: Int = 16): Unit = {
    if (files.isEmpty || ids.isEmpty) return
    if (files.lengthCompare(1) == 0) { stamp(conf, files.head, ids); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, files.length))
    try {
      val tasks = new java.util.ArrayList[
        java.util.concurrent.Callable[Unit]](files.length)
      files.foreach(f => tasks.add(() => stamp(conf, f, ids)))
      pool.invokeAll(tasks).forEach { fut =>
        try fut.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause
        }
      }
    } finally { pool.shutdown(); () }
  }

  /** The file's footer `FileMetaData` (one KB-sized tail read) plus
    * where the footer begins — shared by [[stamp]], the detect-only
    * [[lacksIds]], and the copy-rewrite [[stampedCopy]].
    */
  private def readFooterMeta(conf: Configuration, file: Path)
      : (org.apache.parquet.format.FileMetaData, Long) = {
    val fs = file.getFileSystem(conf)
    val len = fs.getFileStatus(file).getLen
    require(len > 12, s"$file is not a parquet file (too short)")
    val tail = new Array[Byte](8)
    val in = fs.open(file)
    val footer =
      try {
        in.readFully(len - 8, tail)
        require(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' &&
          tail(7) == '1', s"$file carries no parquet magic trailer")
        val fLen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
          ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
        val buf = new Array[Byte](fLen)
        in.readFully(len - 8 - fLen, buf)
        buf
      } finally in.close()
    (Util.readFileMetaData(new ByteArrayInputStream(footer)),
      len - 8 - footer.length)
  }

  /** Detect-only twin of [[stamp]]: whether `file`'s footer MISSES (or
    * disagrees with) any id `ids` declares — the per-file check behind
    * [[DeltaLite]]'s UniForm footer verification. Reads only the KB
    * footer; paths absent from the footer's schema (columns added
    * after the file was written) simply never match, so pre-evolution
    * files probe clean.
    */
  def lacksIds(conf: Configuration, file: Path,
      ids: Map[String, Int]): Boolean = {
    val (md, _) = readFooterMeta(conf, file)
    applyIds(md.getSchema.asScala.toIndexedSeq, ids)
  }

  /** Bounded-parallel [[lacksIds]] over many files: the subset whose
    * footers lag the declared ids, input order preserved. Same pool
    * shape as [[stampAll]] — serializing KB footer reads over a large
    * table is pure latency.
    */
  def lacksIdsAll(conf: Configuration, files: Seq[Path],
      ids: Map[String, Int], parallelism: Int = 16): Seq[Path] = {
    if (files.isEmpty || ids.isEmpty) return Nil
    if (files.lengthCompare(1) == 0)
      return files.filter(lacksIds(conf, _, ids))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, files.length))
    try {
      val tasks = new java.util.ArrayList[
        java.util.concurrent.Callable[Boolean]](files.length)
      files.foreach(f => tasks.add(() => lacksIds(conf, f, ids)))
      val res = pool.invokeAll(tasks)
      files.zipWithIndex.filter { case (_, i) =>
        try res.get(i).get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause
        }
      }.map(_._1)
    } finally { pool.shutdown(); () }
  }

  /** Copy `file` to `target` byte-identical through the data region
    * with the footer re-serialized to carry `ids` — the footer-only
    * file rewrite behind `DeltaLite.reorgUpgradeUniform` (a committed
    * remove+add must NOT patch the original in place: its recorded
    * size feeds foreign readers' footer seeks). Returns the new
    * file's length and the footer's recorded row count.
    */
  def stampedCopy(conf: Configuration, file: Path, target: Path,
      ids: Map[String, Int]): (Long, Long) = {
    val (md, footerStart) = readFooterMeta(conf, file)
    applyIds(md.getSchema.asScala.toIndexedSeq, ids)
    val out = new ByteArrayOutputStream(1 << 13)
    Util.writeFileMetaData(md, out)
    val bytes = out.toByteArray
    val fs = file.getFileSystem(conf)
    val src = fs.open(file)
    val dst = fs.create(target, true)
    try {
      val buf = new Array[Byte](1 << 20)
      var left = footerStart
      while (left > 0) {
        val n = src.read(buf, 0, math.min(left, buf.length.toLong).toInt)
        require(n > 0, s"$file truncated mid-copy")
        dst.write(buf, 0, n); left -= n
      }
      dst.write(bytes)
      dst.write(Array[Byte](
        (bytes.length & 0xff).toByte, ((bytes.length >> 8) & 0xff).toByte,
        ((bytes.length >> 16) & 0xff).toByte,
        ((bytes.length >> 24) & 0xff).toByte,
        'P', 'A', 'R', '1'))
    } finally { src.close(); dst.close() }
    (footerStart + bytes.length + 8, md.getNum_rows)
  }

  def stamp(conf: Configuration, file: Path, ids: Map[String, Int]): Unit = {
    val fs = file.getFileSystem(conf)
    val (md, footerStart) = readFooterMeta(conf, file)
    if (!applyIds(md.getSchema.asScala.toIndexedSeq, ids)) return
    val out = new ByteArrayOutputStream(1 << 13)
    Util.writeFileMetaData(md, out)
    val bytes = out.toByteArray
    val local = "file".equalsIgnoreCase(
      Option(file.toUri.getScheme).getOrElse(fs.getScheme))
    if (local) {
      val raf = new java.io.RandomAccessFile(
        new java.io.File(file.toUri.getPath), "rw")
      try {
        raf.seek(footerStart)
        raf.write(bytes)
        raf.write(Array[Byte](
          (bytes.length & 0xff).toByte, ((bytes.length >> 8) & 0xff).toByte,
          ((bytes.length >> 16) & 0xff).toByte,
          ((bytes.length >> 24) & 0xff).toByte,
          'P', 'A', 'R', '1'))
        raf.setLength(footerStart + bytes.length + 8)
      } finally raf.close()
      // the local fs pairs data files with `.name.crc` sidecars; the
      // patched bytes invalidate the recorded checksum, so drop it
      // (ChecksumFileSystem reads would otherwise refuse the file)
      val crc = new Path(file.getParent, "." + file.getName + ".crc")
      if (fs.exists(crc)) { fs.delete(crc, false); () }
    } else {
      // object stores have no random write: stream-copy the data
      // region, append the new footer, swap in atomically
      val tmp = new Path(file.getParent,
        "." + file.getName + ".stamp." +
          java.util.UUID.randomUUID.toString.take(8))
      val src = fs.open(file)
      val dst = fs.create(tmp, true)
      try {
        val buf = new Array[Byte](1 << 20)
        var left = footerStart
        while (left > 0) {
          val n = src.read(buf, 0, math.min(left, buf.length.toLong).toInt)
          require(n > 0, s"$file truncated mid-copy")
          dst.write(buf, 0, n); left -= n
        }
        dst.write(bytes)
        dst.write(Array[Byte](
          (bytes.length & 0xff).toByte, ((bytes.length >> 8) & 0xff).toByte,
          ((bytes.length >> 16) & 0xff).toByte,
          ((bytes.length >> 24) & 0xff).toByte,
          'P', 'A', 'R', '1'))
      } finally { src.close(); dst.close() }
      fs.delete(file, false)
      require(fs.rename(tmp, file), s"footer-stamp rename failed: $file")
    }
  }

  /** Walk the flattened pre-order SchemaElement list computing each
    * element's id-path and set `field_id` on matches. LIST columns in
    * the modern 3-level layout have a repeated single-child group
    * wrapper that carries NO id (parquet LogicalTypes.md); the legacy
    * 2-level layouts (repeated element directly, or a repeated group
    * that IS the element — multiple fields, or named `array`/
    * `*_tuple`) are also recognized. Returns whether anything changed.
    */
  private def applyIds(elems: IndexedSeq[SchemaElement],
      ids: Map[String, Int]): Boolean = {
    var changed = false
    def mark(e: SchemaElement, path: String): Unit =
      ids.get(path).foreach { id =>
        if (!e.isSetField_id || e.getField_id != id) {
          e.setField_id(id); changed = true
        }
      }
    def isList(e: SchemaElement): Boolean =
      (e.isSetConverted_type && e.getConverted_type == ConvertedType.LIST) ||
        (e.isSetLogicalType && e.getLogicalType.isSetLIST)
    def isMap(e: SchemaElement): Boolean =
      (e.isSetConverted_type &&
        (e.getConverted_type == ConvertedType.MAP ||
          e.getConverted_type == ConvertedType.MAP_KEY_VALUE)) ||
        (e.isSetLogicalType && e.getLogicalType.isSetMAP)
    // visit element at `i` whose own id-path is `path`; returns the
    // index just past its subtree
    def visit(i: Int, path: String): Int = {
      val e = elems(i)
      if (path.nonEmpty) mark(e, path)
      val n = if (e.isSetNum_children) e.getNum_children else 0
      if (n == 0) return i + 1
      if (isList(e)) {
        val w = elems(i + 1)
        val threeLevel = n == 1 &&
          w.getRepetition_type == FieldRepetitionType.REPEATED &&
          w.isSetNum_children && w.getNum_children == 1 &&
          w.getName != "array" && !w.getName.endsWith("_tuple")
        if (threeLevel)
          // wrapper (conventionally `list`) carries no id; skip to its
          // single child = the element
          visit(i + 2, s"$path.element")
        else
          // legacy 2-level: the repeated child IS the element
          visit(i + 1, s"$path.element")
      } else if (isMap(e)) {
        // repeated key_value wrapper (no id) with key, value children
        val afterKey = visit(i + 2, s"$path.key")
        visit(afterKey, s"$path.value")
      } else {
        var j = i + 1
        var k = 0
        while (k < n) {
          val childPath =
            if (path.isEmpty) elems(j).getName
            else s"$path.${elems(j).getName}"
          j = visit(j, childPath)
          k += 1
        }
        j
      }
    }
    visit(0, "") // root message element: children are top-level columns
    changed
  }

  /** Full id-path → field id map a schema declares: every named field
    * (at any depth) carrying `parquet.field.id` metadata — or, for
    * nested fields of a delta-staged frame, `delta.columnMapping.id`
    * (the physical projection renames nested fields but carries their
    * mapping metadata through the cast rather than re-minting
    * `parquet.field.id` per depth) — plus every entry of
    * `parquet.field.nested.ids` (the delta-spark key for list/map
    * member ids; keys are already full physical paths).
    */
  def pathIds(schema: StructType): Map[String, Int] = {
    val acc = collection.mutable.Map.empty[String, Int]
    def field(f: StructField, prefix: String): Unit = {
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      if (f.metadata.contains("parquet.field.id"))
        acc(p) = f.metadata.getLong("parquet.field.id").toInt
      else if (f.metadata.contains("delta.columnMapping.id"))
        acc(p) = f.metadata.getLong("delta.columnMapping.id").toInt
      nestedIdsOf(f).foreach { case (k, v) => acc(k) = v.toInt }
      walk(f.dataType, p)
    }
    def walk(dt: DataType, p: String): Unit = dt match {
      case st: StructType => st.fields.foreach(field(_, p))
      case a: ArrayType => walk(a.elementType, s"$p.element")
      case m: MapType =>
        walk(m.keyType, s"$p.key"); walk(m.valueType, s"$p.value")
      case _ => ()
    }
    schema.fields.foreach(field(_, ""))
    acc.toMap
  }

  /** Whether any field (at any depth) carries list/map member ids —
    * the gate for paying the footer restamp at staging time.
    */
  def hasMemberIds(schema: StructType): Boolean = {
    def field(f: StructField): Boolean =
      f.metadata.contains("parquet.field.nested.ids") || walk(f.dataType)
    def walk(dt: DataType): Boolean = dt match {
      case st: StructType => st.fields.exists(field)
      case a: ArrayType => walk(a.elementType)
      case m: MapType => walk(m.keyType) || walk(m.valueType)
      case _ => false
    }
    schema.fields.exists(field)
  }

  /** The full staging-restamp gate: true when the written footers would
    * MISS an id the schema declares. Two ways that happens: (a) list/
    * map member ids ([[hasMemberIds]] — those members are not
    * StructFields, Spark's writer cannot stamp them at all); (b) a
    * NESTED named field that carries its id only as
    * `delta.columnMapping.id` — the physicalize projection rides
    * mapping metadata through without re-minting `parquet.field.id`
    * per depth, and Spark's writer reads only the latter, so a
    * struct-only mapped schema (no array/map anywhere) would otherwise
    * write inner struct fields with NO ids while the UniForm sync
    * registers explicit ids for them. Top-level fields always carry
    * `parquet.field.id` from the projection, so only depth ≥ 1 is
    * checked.
    */
  def needsStamp(schema: StructType): Boolean = {
    def unstamped(f: StructField): Boolean =
      f.metadata.contains("delta.columnMapping.id") &&
        !f.metadata.contains("parquet.field.id")
    def field(f: StructField, nested: Boolean): Boolean =
      (nested && unstamped(f)) || walk(f.dataType)
    def walk(dt: DataType): Boolean = dt match {
      case st: StructType => st.fields.exists(field(_, nested = true))
      case a: ArrayType => walk(a.elementType)
      case m: MapType => walk(m.keyType) || walk(m.valueType)
      case _ => false
    }
    hasMemberIds(schema) || schema.fields.exists(field(_, nested = false))
  }

  /** One field's `parquet.field.nested.ids` entries (full-path key →
    * id), empty when absent.
    */
  def nestedIdsOf(f: StructField): Map[String, Long] =
    if (!f.metadata.contains("parquet.field.nested.ids")) Map.empty
    else {
      val m = f.metadata.getMetadata("parquet.field.nested.ids")
      val node = jsonMapper.readTree(m.json)
      node.fields.asScala
        .map(e => e.getKey -> e.getValue.asLong).toMap
    }

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()
}
