package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard against the round-16 regression class: HotSpot never
  * JIT-compiles a method whose bytecode exceeds 8000 bytes
  * (`-XX:+DontCompileHugeMethods`, the default), and the failure is
  * SILENT — the JS interpreter's fused method dispatch crossed the
  * limit when the regex surface landed and q93 quietly ran 3× slower,
  * interpreted. This spec parses the compiled classfiles of the
  * interpreter's hot objects (plain JVM classfile format: constant
  * pool → method_info → Code attribute `code_length`) and fails when
  * any method approaches the limit, so the next added case trips a
  * test instead of a benchmark.
  */
class JitLimitSpec extends AnyFunSuite {

  /** method name → bytecode size, parsed from the classfile. */
  private def methodCodeSizes(className: String): Map[String, Int] = {
    val res = "/" + className.replace('.', '/') + ".class"
    val in = getClass.getResourceAsStream(res)
    require(in != null, s"classfile $res not on the test classpath")
    val bytes = try in.readAllBytes() finally in.close()
    val b = java.nio.ByteBuffer.wrap(bytes)
    def u1 = b.get() & 0xFF
    def u2 = b.getShort() & 0xFFFF
    def u4 = b.getInt()
    require(u4 == 0xCAFEBABE, "not a classfile")
    u4 // minor+major
    val cpCount = u2
    val utf8 = scala.collection.mutable.Map.empty[Int, String]
    var i = 1
    while (i < cpCount) {
      val tag = u1
      tag match {
        case 1 => // Utf8
          val len = u2
          val arr = new Array[Byte](len); b.get(arr)
          utf8(i) = new String(arr, "UTF-8")
        case 7 | 8 | 16 | 19 | 20 => u2
        case 15 => u1; u2
        case 3 | 4 | 9 | 10 | 11 | 12 | 17 | 18 => u4
        case 5 | 6 => b.getLong(); i += 1 // long/double take two slots
        case t => fail(s"unknown constant pool tag $t")
      }
      i += 1
    }
    u2; u2; u2 // access, this, super
    val ifCount = u2; (0 until ifCount).foreach(_ => u2)
    def skipAttrs(): Unit = {
      val n = u2
      (0 until n).foreach { _ => u2; val len = u4; b.position(b.position() + len) }
    }
    val fieldCount = u2
    (0 until fieldCount).foreach { _ => u2; u2; u2; skipAttrs() }
    val methodCount = u2
    val out = scala.collection.mutable.Map.empty[String, Int]
    (0 until methodCount).foreach { _ =>
      u2 // access
      val name = utf8(u2)
      u2 // descriptor
      val attrN = u2
      (0 until attrN).foreach { _ =>
        val aName = utf8(u2)
        val aLen = u4
        if (aName == "Code") {
          val end = b.position() + aLen
          u2; u2 // max_stack, max_locals
          val codeLen = u4
          out(name) = math.max(out.getOrElse(name, 0), codeLen)
          b.position(end)
        } else b.position(b.position() + aLen)
      }
    }
    out.toMap
  }

  test("JS interpreter hot methods stay JIT-compilable (< 8000 bytes " +
      "of bytecode, with headroom for the next few cases)") {
    val sizes = methodCodeSizes("graft.functions.JsMini$")
    val limit = 7500 // headroom under HotSpot's 8000
    val over = sizes.filter(_._2 > limit)
    assert(over.isEmpty,
      s"methods nearing the DontCompileHugeMethods limit (8000): " +
        s"$over — split the dispatch (see the round-16 q93 3× " +
        "regression: a fused match crossed the limit and the hot " +
        "path silently ran interpreted)")
    // the split dispatch itself must exist and stay tiny
    assert(sizes.get("method").exists(_ < 1000),
      s"method() should be a small receiver-type fan-out: ${sizes.get("method")}")
  }

  test("the per-row dispatch of the other interpreter-style hot paths " +
      "stays JIT-compilable too") {
    Seq("graft.functions.JsUdf$", "graft.cdc.PgOutput$",
        "graft.cdc.MyBinlog$", "graft.operators.IsoBmff$").foreach { c =>
      val over = methodCodeSizes(c).filter(_._2 > 7500)
      assert(over.isEmpty, s"$c methods over the JIT limit: $over")
    }
  }
}
