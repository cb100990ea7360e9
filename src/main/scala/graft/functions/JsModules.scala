package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Driver-side ES-module bundler: reads an entry script and its
  * TRANSITIVE relative imports from any Hadoop filesystem (HDFS/S3/
  * local) into a self-contained `(entryKey, sources)` bundle.
  *
  * This is the loader seam of the reference's TypeScript module loader
  * (dozer-deno/src/ts_module_loader/mod.rs: ES `resolve_import` + file
  * fetch + execute-once per specifier) re-expressed for a distributed
  * engine: resolution and IO happen ONCE on the driver, the bundle
  * ships inside UDF closures, and executors resolve imports from the
  * in-memory map via [[JsMini.loadBundle]] — no executor ever touches a
  * filesystem, so cluster submission works unchanged (conceptually what
  * deno bundling/eszip does for deploy).
  *
  * TypeScript modules (`.ts`/`.mts`) transpile at load via
  * [[TsStrip]] — position-preserving type erasure, the same
  * media-type dispatch the reference loader does with swc
  * (mod.rs:101-141: extension decides transpilation). `.tsx`/`.jsx`
  * stay rejected (no JSX in the subset).
  *
  * Documented delta from the reference loader: no network fetch (the
  * zero-egress rule — [[JsMini.resolveSpecifier]] rejects URL schemes
  * loudly); modules must be vendored locally.
  */
object JsModules {

  /** Bundle keys are slash paths relative to the ENTRY module's
    * directory; the entry key is the entry file's name. Imports that
    * `..`-escape the entry directory are rejected (the bundle root is
    * the sharing boundary).
    */
  def bundleFromPath(spark: SparkSession,
      path: String): (String, Map[String, String]) = {
    val entryPath = new org.apache.hadoop.fs.Path(path)
    val fs = entryPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseDir = entryPath.getParent
    val entryKey = entryPath.getName
    val sources = mutable.LinkedHashMap.empty[String, String]

    def read(p: org.apache.hadoop.fs.Path): String = {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    }

    def visit(key: String): Unit =
      if (!sources.contains(key)) {
        if (key.endsWith(".tsx") || key.endsWith(".jsx"))
          throw new JsMini.JsSyntaxError(
            s"module '$key': JSX is outside the JsMini subset " +
              "(TsStrip erases types only)")
        val raw = read(new org.apache.hadoop.fs.Path(baseDir, key))
        // media-type dispatch (ts_module_loader/mod.rs:101-141 parity):
        // .ts/.mts transpile by type erasure; everything else is JS
        val src =
          if (key.endsWith(".ts") || key.endsWith(".mts")) TsStrip.strip(raw)
          else raw
        sources(key) = src
        JsMini.moduleImports(src).foreach { spec =>
          visit(JsMini.resolveSpecifier(spec, key))
        }
      }

    visit(entryKey)
    (entryKey, sources.toMap)
  }
}
