package graft.functions

import scala.collection.mutable

/** JavaScript UDF runtime: a zero-dependency ES-subset interpreter.
  *
  * The reference runs config-declared JS UDFs (`UdfType::JavaScript
  * { module }`, dozer-types/src/models/udf_config.rs:28-33) on an
  * embedded Deno: the module's DEFAULT EXPORT is called with exactly one
  * JSON argument and returns JSON (dozer-sql/expression/src/javascript/
  * evaluate.rs:104-127, validate.rs:10-27 pins the 1-arg/Json contract;
  * dozer-deno/src/runtime/mod.rs:235-241 resolves the default export).
  *
  * JDK 17 ships no JS engine (Nashorn was removed in JDK 15), so the
  * idiomatic-JVM answer is a small interpreter over the language subset
  * UDFs actually use, not an embedded browser runtime. Supported: numbers
  * /strings/booleans/null/undefined, objects/arrays, the operator set
  * through ternary and logical and/or, member/index access, assignment
  * (plain + compound), template literals with interpolation, spread in
  * array literals and call arguments, array/object destructuring
  * declarations (holes, defaults, aliases, nesting, rest), `function`
  * declarations and expressions, arrow
  * functions, if/else, while, classic for, for-of, return/throw/
  * try-catch-finally/break/continue, `Math`/`JSON`/`Object`/`Number`
  * builtins and the common String/Array prototype methods, and REGEX:
  * literals (`/…/gims`, one-token-lookbehind division disambiguation),
  * `new RegExp(p, f)`, `RegExp.prototype.{test,exec,source,flags,
  * global,lastIndex}` (g-flag lastIndex statefulness included), and
  * `String.prototype.{match,search,split,replace,replaceAll}` with
  * regex arguments, `$n`/`$&` templates and function replacements —
  * all on the JDK regex engine; unsupported flags (u/v) and
  * JDK-rejected constructs refuse loudly by name. Semicolons are
  * optional between statements.
  *
  * Everything is single-threaded per evaluator instance; Spark-side the
  * registered UDF keeps one evaluator per task thread (same shape as
  * [[PyUdf]]'s workers), so a 1000-executor scan runs embarrassingly
  * parallel with zero shuffle and no per-row process or lock.
  */
object JsMini {

  // ---------------------------------------------------------------- values

  sealed trait V
  case object VUndef extends V
  case object VNull extends V
  final case class VNum(v: Double) extends V
  final case class VStr(v: String) extends V
  final case class VBool(v: Boolean) extends V
  final class VObj(val fields: mutable.LinkedHashMap[String, V]) extends V {
    /** Set when the object was constructed by a `class` — instance
      * method lookup walks the class chain; `fields` stay data-only
      * (JSON round-trips never see methods).
      */
    var klass: Option[VClass] = None
  }
  class VArr(val items: mutable.ArrayBuffer[V]) extends V
  final case class VFun(params: Seq[String], body: Seq[Stmt], closure: Env,
      name: String, arrow: Boolean = false,
      home: Option[VClass] = None, gen: Boolean = false,
      /** Per-parameter default expressions (ES2015): applied when the
        * call site passes `undefined` (or nothing), evaluated left to
        * right with earlier parameters in scope. Empty = no defaults.
        */
      defaults: Seq[Option[Expr]] = Nil) extends V

  /** A generator instance (`function*` call). EAGER SUBSET SEMANTICS,
    * documented: the body runs TO COMPLETION on first consumption,
    * collecting every yield — correct for all terminating generators
    * (the transform/flatten scripts ingest pipelines write), while an
    * infinite generator raises the interpreter's fuel-budget error
    * instead of producing values lazily. `yield` evaluates to
    * undefined (no two-way `next(v)` protocol).
    */
  final class VGen private[functions] (private[functions] val fun: VFun,
      private[functions] val args: Seq[V],
      private[functions] val thisV: Option[V]) extends V {
    private[functions] var out: Option[IndexedSeq[V]] = None
    private[functions] var idx = 0
  }
  final case class VNative(name: String, f: Seq[V] => V) extends V

  /** A RegExp value: the JS flag subset g/i/m/s on the JDK regex
    * engine (the reference runs full V8 — dozer-deno/src/runtime.rs;
    * this subset covers the match/replace/split/test/exec idioms
    * ingest scripts actually use). Unsupported flags (u/v) and
    * JDK-rejected constructs refuse LOUDLY at construction naming the
    * flag/construct. `lastIndex` advances on g-flag test/exec — JS's
    * stateful iteration contract.
    */
  final class VRegExp(val source: String, val flags: String) extends V {
    var lastIndex: Int = 0
    def global: Boolean = flags.indexOf('g') >= 0
    /** the `u` flag: pattern ran through [[translateUnicodeMode]]; the
      * empty-match advance steps by CODE POINT */
    def unicode: Boolean = flags.indexOf('u') >= 0
    val pattern: java.util.regex.Pattern = compileRegex(source, flags)
    /** the `d` flag: match results carry `indices` */
    def hasIndices: Boolean = flags.indexOf('d') >= 0
    /** the `y` flag: matches anchor EXACTLY at lastIndex */
    def sticky: Boolean = flags.indexOf('y') >= 0
    /** named capture groups, scanned once — match results read these
      * per match for the `groups` object */
    lazy val groupNames: Seq[String] = namedGroupNames(source)
  }

  /** Compiled-pattern cache: scripts evaluate a regex literal once per
    * row inside UDF bodies — recompiling per evaluation would dominate
    * the hot path. Keyed by flags+source; shared across task threads
    * (Pattern is immutable/thread-safe; matchers are per-call).
    * SIZE-CAPPED: a script building per-row patterns via
    * `new RegExp(rowValue)` must not grow executor memory without
    * bound over a long-running job — past the cap, new patterns
    * compile uncached (script literals are few and land first; only
    * unbounded dynamic-pattern churn pays the recompile).
    */
  private val RegexCacheMax = 2048
  private val regexCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.regex.Pattern]()

  private[functions] def compileRegex(source: String,
      flags: String): java.util.regex.Pattern = {
    import java.util.regex.Pattern
    flags.foreach { f =>
      if ("gimsdyu".indexOf(f.toInt) < 0) throw new JsError(VStr(
        s"unsupported regex flag '$f' in /$source/$flags — the JS " +
          "subset supports g/i/m/s/d/y plus a unicode-mode (u) SUBSET " +
          "on the JDK engine; the v flag (set notation, string " +
          "properties) refuses because the JDK has no class-set " +
          "engine, and u-mode patterns touching a named JDK↔ECMA " +
          "divergence " +
          "(\\b/\\B boundaries — JsMiniSpec's 'u-flag divergence " +
          "matrix') refuse individually at construction"))
    }
    def build(): Pattern = {
      var bits = 0
      if (flags.indexOf('i') >= 0)
        bits |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
      if (flags.indexOf('m') >= 0) bits |= Pattern.MULTILINE
      if (flags.indexOf('s') >= 0) bits |= Pattern.DOTALL
      val src =
        if (flags.indexOf('u') >= 0) translateUnicodeMode(source)
        else source
      try Pattern.compile(src, bits)
      catch {
        case e: java.util.regex.PatternSyntaxException =>
          throw new JsError(VStr(
            s"regex /$source/ is not supported by the JDK engine: " +
              e.getDescription))
      }
    }
    val key = flags + "/" + source
    val hit = regexCache.get(key)
    if (hit != null) hit
    else {
      val p = build() // syntax errors surface first, with JDK detail
      assertBackrefsSafe(source) // throws BEFORE caching — a refused
                                 // pattern must refuse on every call
      if (regexCache.size < RegexCacheMax) regexCache.putIfAbsent(key, p)
      p
    }
  }

  /** ECMA-262 `u`-flag SUBSET: translate a unicode-mode pattern to an
    * equivalent JDK pattern, refusing loudly on any construct whose
    * JDK semantics diverge from ECMA u (the named rows of JsMiniSpec's
    * "u-flag divergence matrix"). What makes the subset broad is that
    * the JDK engine is ALREADY u-flavored in two of ECMA u's three
    * semantic changes: it matches by code point (astral atomicity,
    * matrix row 4) and `i` maps to UNICODE_CASE folding (row 5) — so
    * the translation is about SYNTAX and the few class-semantics gaps:
    *  - `\u{...}` code-point escapes → the JDK's `\x{...}` spelling;
    *  - `\s`/`\S` → ECMA's exact WhiteSpace ∪ LineTerminator set (the
    *    JDK default `\s` is ASCII-only; UNICODE_CHARACTER_CLASS would
    *    also widen `\w`, which ECMA u keeps ASCII);
    *  - `\p{...}`/`\P{...}` property escapes (u-mode syntax) → the
    *    JDK's property grammar for general categories, Script=, and
    *    the binary properties the JDK supports — unknown properties
    *    refuse by name;
    *  - class-literal `[`, `&` → escaped (the JDK reads them as
    *    nested-class / intersection operators; ECMA reads literals);
    *  - class `\b` → backspace `\x08` (the JDK rejects it in a class);
    *    `\0` → `\x00` (the JDK wants octal digits); `\v` → `\x0B`
    *    (the JDK `\v` is a vertical-whitespace CLASS);
    *  - u-mode STRICTNESS: lone quantifier braces, a stray `]`, and
    *    identity escapes outside ECMA's allowed set are syntax errors
    *    (Annex-B leniencies the JDK would silently accept);
    *  - REFUSED by name: `\b`/`\B` word boundaries (the JDK boundary
    *    keys on unicode word chars, ECMA on ASCII — row 2), class
    *    digit escapes, and properties with no JDK equivalent.
    * The translation never changes group structure, so `source`,
    * group names, and the backreference safety scan all read the
    * ORIGINAL pattern.
    */
  private[functions] def translateUnicodeMode(source: String): String = {
    // ECMA WhiteSpace ∪ LineTerminator, as JDK class content
    val EcmaSpace = "\\t\\n\\x0B\\f\\r \\u00a0\\u1680\\u2000-\\u200a" +
      "\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff"
    val out = new StringBuilder(source.length + 16)
    var i = 0
    var inClass = false
    def err(msg: String): Nothing = throw new JsError(VStr(
      s"unicode-mode (u) regex /$source/: $msg"))
    def hex(c: Char): Boolean = Character.digit(c, 16) >= 0
    def translateProperty(): Unit = {
      val neg = source.charAt(i + 1) == 'P'
      if (i + 2 >= source.length || source.charAt(i + 2) != '{')
        err("\\p needs a {Property} braces form in unicode mode")
      val end = source.indexOf('}', i + 3)
      if (end < 0) err("unterminated \\p{...}")
      val body = source.substring(i + 3, end)
      val (emit, negatable) = unicodePropertyToJdk(body).getOrElse(
        err(s"property \\p{$body} has no JDK equivalent the subset " +
          "can vouch for (general categories, Script=, and the JDK's " +
          "binary properties translate; Emoji/ID_Start/etc. refuse)"))
      if (neg && !negatable)
        err(s"\\P{$body} (negated multi-class property) cannot be " +
          "expressed in a JDK class union")
      if (emit.startsWith("\\p")) // single JDK property: negate in place
        out.append(if (neg) "\\P" else "\\p").append(emit.substring(2))
      else if (inClass) {
        if (neg) err(s"\\P{$body} inside a class cannot be expanded")
        out.append(emit) // class content union
      } else out.append(if (neg) s"[^$emit]" else s"[$emit]")
      i = end + 1
    }
    while (i < source.length) {
      val c = source.charAt(i)
      if (c == '\\') {
        if (i + 1 >= source.length) err("dangling backslash")
        val e = source.charAt(i + 1)
        e match {
          case 'u' =>
            if (i + 2 < source.length && source.charAt(i + 2) == '{') {
              val end = source.indexOf('}', i + 3)
              if (end < 0) err("unterminated \\u{...} escape")
              val h = source.substring(i + 3, end)
              if (h.isEmpty || h.length > 6 || !h.forall(hex))
                err(s"invalid code-point escape \\u{$h}")
              val cp = java.lang.Long.parseLong(h, 16)
              if (cp > 0x10ffffL)
                err(s"code point \\u{$h} exceeds U+10FFFF")
              out.append("\\x{").append(java.lang.Long.toHexString(cp))
                .append('}')
              i = end + 1
            } else {
              val h = source.slice(i + 2, i + 6)
              if (h.length < 4 || !h.forall(hex))
                err("\\u needs exactly 4 hex digits (or the \\u{...} " +
                  "form) in unicode mode")
              out.append(source.substring(i, i + 6)) // JDK pairs adjacent
              i += 6                       // surrogates natively
            }
          case 'b' | 'B' if !inClass =>
            err(s"\\$e refuses: the JDK word boundary keys on UNICODE " +
              "word characters while ECMA keys on ASCII \\w in both " +
              "modes (JsMiniSpec 'u-flag divergence matrix' row 2) — " +
              "spell the boundary explicitly, e.g. lookarounds over " +
              "[0-9A-Za-z_]")
          case 'b' => out.append("\\x08"); i += 2 // class: backspace
          case 's' =>
            out.append(if (inClass) EcmaSpace else s"[$EcmaSpace]")
            i += 2
          case 'S' =>
            // JDK class UNION accepts a nested negated class, so the
            // in-class expansion composes ([a\S] = a ∪ non-space)
            out.append(s"[^$EcmaSpace]"); i += 2
          case 'p' | 'P' => translateProperty()
          case 'v' => out.append("\\x0B"); i += 2
          case '0' if i + 2 >= source.length ||
              !source.charAt(i + 2).isDigit =>
            out.append("\\x00"); i += 2
          case 'w' | 'W' | 'd' | 'D' | 'n' | 'r' | 't' | 'f' =>
            out.append('\\').append(e); i += 2
          case 'x' =>
            val h = source.slice(i + 2, i + 4)
            if (h.length < 2 || !h.forall(hex))
              err("\\x needs exactly 2 hex digits in unicode mode")
            out.append(source.substring(i, i + 4)); i += 4
          case 'c' =>
            if (i + 2 >= source.length ||
                !source.charAt(i + 2).isLetter ||
                source.charAt(i + 2) > 'z')
              err("\\c needs an ASCII letter in unicode mode")
            out.append(source.substring(i, i + 3)); i += 3
          case 'k' if !inClass =>
            val end = source.indexOf('>', i + 2)
            if (i + 2 >= source.length || source.charAt(i + 2) != '<' ||
                end < 0)
              err("\\k needs a <name> in unicode mode")
            out.append(source.substring(i, end + 1)); i = end + 1
          case d if d.isDigit && !inClass =>
            if (d == '0') // \0<digit> — a legacy octal escape, which
              err("octal escapes are a syntax error in unicode mode")
            var j = i + 1
            while (j < source.length && source.charAt(j).isDigit) j += 1
            out.append(source.substring(i, j)); i = j // backref; safety scan
                                            // runs on the original
          case d if d.isDigit =>
            err(s"\\$d inside a class is a syntax error in unicode " +
              "mode (only \\0 names a code point)")
          case o =>
            // identity escapes: ECMA u allows only syntax characters
            // and '/' (plus '-' inside a class)
            val allowed = "^$\\.*+?()[]{}|/" +
              (if (inClass) "-" else "")
            if (allowed.indexOf(o.toInt) < 0)
              err(s"identity escape \\$o is a syntax error in unicode " +
                "mode (Annex-B leniency the JDK would silently accept)")
            out.append('\\').append(o); i += 2
        }
      } else if (inClass) {
        c match {
          case ']' => inClass = false; out.append(']'); i += 1
          case '[' => out.append("\\["); i += 1 // JDK: nested class
          case '&' => out.append("\\&"); i += 1 // JDK: intersection
          case o => out.append(o); i += 1
        }
      } else c match {
        case '[' =>
          // ECMA empty classes the JDK rejects: [] never matches,
          // [^] matches ANY code point
          if (source.startsWith("[]", i)) { out.append("(?!)"); i += 2 }
          else if (source.startsWith("[^]", i)) {
            out.append("[\\x00-\\x{10ffff}]"); i += 3
          } else {
            inClass = true
            out.append('[')
            i += 1
            if (i < source.length && source.charAt(i) == '^') {
              out.append('^'); i += 1
            }
          }
        case ']' => err("lone ']' is a syntax error in unicode mode")
        case '{' =>
          // only the quantifier brace forms are legal outside a class
          var j = i + 1
          while (j < source.length && source.charAt(j).isDigit) j += 1
          val digits = j > i + 1
          val comma = j < source.length && source.charAt(j) == ','
          if (comma) {
            j += 1
            while (j < source.length && source.charAt(j).isDigit) j += 1
          }
          if (!digits || j >= source.length || source.charAt(j) != '}')
            err("lone '{' is a syntax error in unicode mode (escape " +
              "a literal brace as \\{)")
          out.append(source.substring(i, j + 1)); i = j + 1
        case '}' =>
          err("lone '}' is a syntax error in unicode mode (escape a " +
            "literal brace as \\})")
        case o => out.append(o); i += 1
      }
    }
    if (inClass) err("unterminated character class")
    out.toString
  }

  /** One ECMA u-mode property name/value → JDK spelling.
    * Returns (emission, negatable): emissions starting with `\p` are
    * single JDK properties (negate by flipping to `\P`); anything else
    * is CLASS CONTENT (a union of properties / ranges) that composes
    * inside a class but can only negate standalone.
    */
  private def unicodePropertyToJdk(
      body: String): Option[(String, Boolean)] = {
    val gcShort = Set("L", "Lu", "Ll", "Lt", "Lm", "Lo", "M", "Mn",
      "Mc", "Me", "N", "Nd", "Nl", "No", "P", "Pc", "Pd", "Ps", "Pe",
      "Pi", "Pf", "Po", "S", "Sm", "Sc", "Sk", "So", "Z", "Zs", "Zl",
      "Zp", "C", "Cc", "Cf", "Co", "Cn", "Cs")
    val gcLong = Map(
      "Letter" -> "L", "Uppercase_Letter" -> "Lu",
      "Lowercase_Letter" -> "Ll", "Titlecase_Letter" -> "Lt",
      "Modifier_Letter" -> "Lm", "Other_Letter" -> "Lo",
      "Mark" -> "M", "Combining_Mark" -> "M",
      "Nonspacing_Mark" -> "Mn", "Spacing_Mark" -> "Mc",
      "Enclosing_Mark" -> "Me",
      "Number" -> "N", "Decimal_Number" -> "Nd", "digit" -> "Nd",
      "Letter_Number" -> "Nl", "Other_Number" -> "No",
      "Punctuation" -> "P", "punct" -> "P",
      "Connector_Punctuation" -> "Pc", "Dash_Punctuation" -> "Pd",
      "Open_Punctuation" -> "Ps", "Close_Punctuation" -> "Pe",
      "Initial_Punctuation" -> "Pi", "Final_Punctuation" -> "Pf",
      "Other_Punctuation" -> "Po",
      "Symbol" -> "S", "Math_Symbol" -> "Sm",
      "Currency_Symbol" -> "Sc", "Modifier_Symbol" -> "Sk",
      "Other_Symbol" -> "So",
      "Separator" -> "Z", "Space_Separator" -> "Zs",
      "Line_Separator" -> "Zl", "Paragraph_Separator" -> "Zp",
      "Other" -> "C", "Control" -> "Cc", "cntrl" -> "Cc",
      "Format" -> "Cf", "Private_Use" -> "Co", "Unassigned" -> "Cn",
      "Surrogate" -> "Cs")
    // the JDK's supported binary properties, by their ECMA spelling
    val binary = Set("Alphabetic", "Assigned", "Hex_Digit",
      "Ideographic", "Join_Control", "Lowercase", "Uppercase",
      "Noncharacter_Code_Point", "White_Space")
    val eq = body.indexOf('=')
    if (eq >= 0) {
      val (k, v) = (body.substring(0, eq), body.substring(eq + 1))
      k match {
        case "Script" | "sc" =>
          Some((s"\\p{Is$v}", true)) // JDK script property
        case "General_Category" | "gc" =>
          if (gcShort(v)) Some((s"\\p{$v}", true))
          else gcLong.get(v).map(s => (s"\\p{$s}", true))
        case _ => None // Script_Extensions and friends: no JDK support
      }
    }
    else if (gcShort(body)) Some((s"\\p{$body}", true))
    else if (gcLong.contains(body))
      Some((s"\\p{${gcLong(body)}}", true))
    else if (body == "Cased_Letter" || body == "LC")
      Some(("\\p{Lu}\\p{Ll}\\p{Lt}", false))
    else if (body == "ASCII") Some(("\\p{ASCII}", true))
    else if (body == "Any") Some(("\\x00-\\x{10ffff}", false))
    else if (binary(body)) Some((s"\\p{Is$body}", true))
    else None
  }

  /** ECMA AdvanceStringIndex: the next attempt position after an empty
    * match — unicode-mode regexes step by CODE POINT (past a surrogate
    * pair), others by one UTF-16 unit.
    */
  private def advanceIndex(s: String, i: Int, unicode: Boolean): Int =
    if (unicode && i >= 0 && i < s.length)
      i + Character.charCount(s.codePointAt(i))
    else i + 1

  /** REFUSE backreferences that can observe an UNSET group — the one
    * place the JDK and ECMA-262 engines silently disagree: JS treats a
    * backreference to a group that has not participated as matching
    * the EMPTY string (/(a)?\1b/.test("b") is true); the JDK fails the
    * backreference (false). Rather than silently diverge, patterns
    * where the referenced group may be unset at the reference point
    * refuse loudly at construction. Conservative static rule — a
    * backreference is SAFE only when its group (a) closes before the
    * reference, (b) is not optionally quantified (question mark, star,
    * or a zero-minimum brace count), and (c)
    * shares every alternation branch / optional scope / lookaround
    * with the reference up to their common enclosing scope. Common
    * idioms like a quote-matching group referenced later in the same
    * branch pass untouched.
    */
  private[functions] def assertBackrefsSafe(source: String): Unit = {
    if (source.indexOf('\\') < 0) return // no escapes → no backrefs
    val parentOf = mutable.ArrayBuffer[Int](-1)
    val kindOf = mutable.ArrayBuffer[Char]('g') // 'g' group, '!' neg-look
    val branchAt = mutable.ArrayBuffer[Int](0)
    val hasAlt = mutable.ArrayBuffer[Boolean](false)
    val optional = mutable.ArrayBuffer[Boolean](false)
    val entryBranch = mutable.ArrayBuffer[Int](0)
    val closedAt = mutable.ArrayBuffer[Int](Int.MaxValue)
    // capture number -> its scope id; named -> number
    val capScope = mutable.ArrayBuffer.empty[Int]
    val nameToNum = mutable.Map.empty[String, Int]
    // (resolved-late group number or -name, position, scope, branch)
    val refs = mutable.ArrayBuffer.empty[(Either[Int, String], Int, Int,
      Int)]
    var cur = 0
    var i = 0
    def openScope(kind: Char, capturing: Boolean,
        name: Option[String]): Unit = {
      parentOf += cur; kindOf += kind; branchAt += 0; hasAlt += false
      optional += false; entryBranch += branchAt(cur)
      closedAt += Int.MaxValue
      val id = parentOf.length - 1
      if (capturing) {
        capScope += id
        name.foreach(n => nameToNum(n) = capScope.length)
      }
      cur = id
    }
    while (i < source.length) {
      source.charAt(i) match {
        case '\\' if i + 1 < source.length =>
          val c = source.charAt(i + 1)
          if (c.isDigit && c != '0') {
            var j = i + 1; var n = 0
            while (j < source.length && source.charAt(j).isDigit &&
                n < 1000) { n = n * 10 + (source.charAt(j) - '0'); j += 1 }
            refs += ((Left(n), i, cur, branchAt(cur)))
            i = j
          } else if (c == 'k' && i + 2 < source.length &&
              source.charAt(i + 2) == '<') {
            val end = source.indexOf('>', i + 3)
            if (end > 0) {
              refs += ((Right(source.substring(i + 3, end)), i, cur,
                branchAt(cur)))
              i = end + 1
            } else i += 2
          } else i += 2
        case '[' =>
          i += 1
          if (i < source.length && source.charAt(i) == '^') i += 1
          if (i < source.length && source.charAt(i) == ']') i += 1
          while (i < source.length && source.charAt(i) != ']') {
            if (source.charAt(i) == '\\') i += 2 else i += 1
          }
          i += 1
        case '(' =>
          if (source.startsWith("(?:", i)) { openScope('g', false, None); i += 3 }
          else if (source.startsWith("(?=", i)) { openScope('g', false, None); i += 3 }
          else if (source.startsWith("(?!", i)) { openScope('!', false, None); i += 3 }
          else if (source.startsWith("(?<=", i)) { openScope('g', false, None); i += 4 }
          else if (source.startsWith("(?<!", i)) { openScope('!', false, None); i += 4 }
          else if (source.startsWith("(?<", i)) {
            val end = source.indexOf('>', i + 3)
            val nm = if (end > 0) Some(source.substring(i + 3, end)) else None
            openScope('g', true, nm)
            i = if (end > 0) end + 1 else i + 3
          }
          else if (source.startsWith("(?", i)) { openScope('g', false, None); i += 2 }
          else { openScope('g', true, None); i += 1 }
        case ')' =>
          closedAt(cur) = i
          // optional quantifier directly after the close?
          val q = if (i + 1 < source.length) source.charAt(i + 1) else ' '
          optional(cur) = q == '?' || q == '*' ||
            (q == '{' && source.startsWith("{0", i + 1))
          cur = parentOf(cur)
          if (cur < 0) return // unbalanced — the JDK compile already vetted
          i += 1
        case '|' =>
          branchAt(cur) += 1; hasAlt(cur) = true; i += 1
        case _ => i += 1
      }
    }
    def refuse(pos: Int, why: String): Nothing = throw new JsError(VStr(
      s"regex /$source/: the backreference at index $pos can observe " +
        s"an UNSET group ($why) — ECMA-262 matches empty there, the " +
        "JDK engine fails the match; rewrite the pattern so the group " +
        "always participates before the reference"))
    refs.foreach { case (which, pos, refScope, refBranch) =>
      val num = which match {
        case Left(n) =>
          if (n <= capScope.length) n
          else { val d = n.toString.charAt(0) - '0'
            if (d <= capScope.length) d else 0 }
        case Right(nm) => nameToNum.getOrElse(nm, 0)
      }
      if (num > 0) {
        val gScope = capScope(num - 1)
        if (closedAt(gScope) > pos) refuse(pos,
          s"group $num does not close before the reference")
        if (optional(gScope)) refuse(pos,
          s"group $num is optionally quantified")
        // ancestors of each, bottom-up, for the LCA walk
        def chain(s0: Int): List[Int] = {
          var s = s0; var acc = List(s)
          while (parentOf(s) >= 0) { s = parentOf(s); acc = s :: acc }
          acc
        }
        val gc = chain(gScope); val rc = chain(refScope)
        val lca = gc.zip(rc).takeWhile(t => t._1 == t._2).last._1
        // scopes strictly BETWEEN the group and the LCA must be
        // mandatory, branch-free, and not negative lookarounds — the
        // reference sits outside them, so any skip leaves the group
        // unset. The group's OWN scope is exempt: branching inside it
        // cannot leave it unset (its quantifier was checked above).
        gc.dropWhile(_ != lca).drop(1).dropRight(1).foreach { s =>
          if (optional(s)) refuse(pos,
            s"group $num sits inside an optionally-quantified scope")
          if (hasAlt(s)) refuse(pos,
            s"group $num sits inside an alternation the reference is " +
              "outside of")
          if (kindOf(s) == '!') refuse(pos,
            s"group $num sits inside a negative lookaround")
        }
        // different branches of the LCA scope never co-execute
        def branchAtLca(leafScope: Int, leafBranch: Int): Int = {
          var s = leafScope; var b = leafBranch
          while (s != lca) { b = entryBranch(s); s = parentOf(s) }
          b
        }
        if (branchAtLca(gScope, 0) != branchAtLca(refScope, refBranch)) {
          // group's own branch position inside the LCA: the branch its
          // child-of-LCA ancestor entered at — or, when the group's
          // PARENT is the LCA, the branch current when the group opened
          refuse(pos, s"group $num and the reference sit in different " +
            "alternation branches")
        }
      }
    }
  }

  /** A `class` value: constructor + method tables + parent link. The
    * member maps are filled right after construction (methods carry a
    * `home` reference back to the class for `super` resolution).
    */
  final class VClass(val name: String, val parent: Option[VClass]) extends V {
    var ctor: Option[VFun] = None
    var methods: Map[String, VFun] = Map.empty
    var statics: Map[String, VFun] = Map.empty
    def findMethod(n: String): Option[VFun] =
      methods.get(n).orElse(parent.flatMap(_.findMethod(n)))
    def findStatic(n: String): Option[VFun] =
      statics.get(n).orElse(parent.flatMap(_.findStatic(n)))
  }

  /** `Map`/`Set` (insertion-ordered). Key identity approximates JS
    * SameValueZero: primitives by value, objects/arrays/functions by
    * reference.
    */
  final class VMapV(
      val entries: mutable.LinkedHashMap[String, (V, V)]) extends V
  final class VSetV(val items: mutable.LinkedHashMap[String, V]) extends V

  private def sameValueKey(v: V): String = v match {
    case VStr(s)  => "s:" + s
    case VNum(n)  => "n:" + numToString(n)
    case VBool(b) => "b:" + b
    case VNull    => "null"
    case VUndef   => "undef"
    case o        => "o:" + System.identityHashCode(o)
  }

  final class JsError(val value: V)
    extends RuntimeException(s"js exception: ${toDisplay(value)}")
  final class JsSyntaxError(msg: String) extends RuntimeException(msg)

  def obj(kvs: (String, V)*): VObj = new VObj(mutable.LinkedHashMap(kvs: _*))
  def arr(vs: V*): VArr = new VArr(mutable.ArrayBuffer(vs: _*))

  // ------------------------------------------------------------------- AST

  sealed trait Expr
  final case class ENum(v: Double) extends Expr
  final case class EStr(v: String) extends Expr
  final case class ERegex(source: String, flags: String) extends Expr
  final case class EBool(v: Boolean) extends Expr
  case object ENull extends Expr
  case object EUndef extends Expr
  final case class EIdent(name: String) extends Expr
  final case class EArr(items: Seq[Expr]) extends Expr
  final case class EObj(fields: Seq[(String, Expr)]) extends Expr
  final case class EFun(params: Seq[String], body: Seq[Stmt], name: String,
      arrow: Boolean = false, gen: Boolean = false,
      defaults: Seq[Option[Expr]] = Nil) extends Expr
  /** `yield x` / `yield* iterable` (generator bodies only). */
  final case class EYield(e: Expr, delegate: Boolean) extends Expr
  /** `class Name extends Parent { constructor(){} m(){} static s(){} }` */
  final case class EClass(name: String, parent: Option[Expr],
      ctor: Option[EFun], methods: Seq[(String, EFun)],
      statics: Seq[(String, EFun)]) extends Expr
  /** Template literal: literal chunks (Left) and `${}` interpolations
    * (Right), concatenated with display coercion at eval.
    */
  final case class ETemplate(parts: Seq[Either[String, Expr]]) extends Expr
  /** Tagged template `tag\`a${x}b\`` — the tag called with the cooked
    * strings array + one argument per interpolation (no `.raw`: the
    * documented subset cooks escapes before the call).
    */
  final case class ETagged(tag: Expr, parts: Seq[Either[String, Expr]])
    extends Expr
  /** `...expr` — valid only inside array literals and call arguments. */
  final case class ESpread(e: Expr) extends Expr

  /** Destructuring binding patterns (`const [a, , b = 1, ...r] = …`,
    * `const {x, y: alias, ...rest} = …`) — recursive, with defaults on
    * identifier targets.
    */
  sealed trait Pat
  final case class PIdent(name: String, default: Option[Expr]) extends Pat
  final case class PArr(items: Seq[Option[Pat]], rest: Option[String]) extends Pat
  final case class PObj(fields: Seq[(String, Pat)], rest: Option[String]) extends Pat
  final case class EUnary(op: String, e: Expr) extends Expr
  final case class EBin(op: String, l: Expr, r: Expr) extends Expr
  final case class ELogical(op: String, l: Expr, r: Expr) extends Expr
  final case class ECond(c: Expr, t: Expr, f: Expr) extends Expr
  final case class EMember(target: Expr, name: String) extends Expr
  final case class EIndex(target: Expr, idx: Expr) extends Expr
  final case class ECall(target: Expr, args: Seq[Expr]) extends Expr
  final case class EAssign(op: String, target: Expr, value: Expr) extends Expr

  sealed trait Stmt
  final case class SExpr(e: Expr) extends Stmt
  final case class SLet(decls: Seq[(String, Option[Expr])]) extends Stmt
  final case class SDestructure(pat: Pat, init: Expr) extends Stmt
  final case class SIf(c: Expr, t: Seq[Stmt], f: Seq[Stmt]) extends Stmt
  final case class SWhile(c: Expr, body: Seq[Stmt]) extends Stmt
  final case class SFor(init: Option[Stmt], cond: Option[Expr],
      update: Option[Expr], body: Seq[Stmt]) extends Stmt
  final case class SForOf(name: String, iter: Expr, body: Seq[Stmt]) extends Stmt
  final case class SReturn(e: Option[Expr]) extends Stmt
  final case class SThrow(e: Expr) extends Stmt
  final case class STry(body: Seq[Stmt], catchName: Option[String],
      catchBody: Seq[Stmt], finallyBody: Seq[Stmt]) extends Stmt
  case object SBreak extends Stmt
  case object SContinue extends Stmt
  final case class SFunDecl(name: String, fn: EFun) extends Stmt
  final case class SClassDecl(name: String, cls: EClass) extends Stmt
  final case class SExportDefault(e: Expr) extends Stmt
  /** `import d from…` / `import {a as b} from…` / `import * as ns from…`
    * / bare `import './m.js'` (module top level only). `named` pairs are
    * (exportedName, localBinding).
    */
  final case class SImport(default: Option[String],
      named: Seq[(String, String)], ns: Option[String],
      from: String) extends Stmt
  /** `export {a, b as c}` (pairs = (localName, exportedName)) or the
    * re-export form `export {a} from './m.js'` (pairs =
    * (sourceExportName, exportedName)).
    */
  final case class SExportNamed(names: Seq[(String, String)],
      from: Option[String]) extends Stmt
  /** `export function f…` / `export class C…` / `export const x = …` —
    * the declaration executes normally and `names` also become exports.
    */
  final case class SExportDecl(decl: Stmt, names: Seq[String]) extends Stmt
  /** `export * from './m.js'` — re-export every NAMED export of the
    * target (the default export is not forwarded, per ES semantics).
    */
  final case class SExportAll(from: String) extends Stmt
  final case class SBlock(body: Seq[Stmt]) extends Stmt

  // ----------------------------------------------------------------- lexer

  private final case class Tok(kind: String, text: String, pos: Int)

  private val keywords = Set("function", "return", "if", "else", "while",
    "for", "of", "let", "const", "var", "true", "false", "null", "undefined",
    "throw", "try", "catch", "finally", "break", "continue", "new", "typeof",
    "export", "default", "in", "async", "await")

  private val punct = Seq("===", "!==", "**=", "...", "=>", "==", "!=", "<=",
    ">=", "&&", "||", "**", "+=", "-=", "*=", "/=", "%=", "++", "--",
    "(", ")", "[", "]", "{", "}", ",", ";", ":", "?", ".", "+", "-", "*",
    "/", "%", "<", ">", "=", "!")

  /** Index just past the closing backtick of a template-literal body that
    * starts at `from` (just after the opening backtick). Recurses through
    * `${…}` regions via [[interpEnd]], so templates nest to arbitrary
    * depth — the raw body is sub-lexed later, which re-enters here for
    * each inner template.
    */
  private def templateEnd(src: String, from: Int, base: Int = 0): Int = {
    val n = src.length
    var i = from
    while (i < n) {
      src.charAt(i) match {
        case '\\' if i + 1 < n                             => i += 2
        case '`'                                           => return i + 1
        case '$' if i + 1 < n && src.charAt(i + 1) == '{'  =>
          i = interpEnd(src, i + 2, base)
        case _                                             => i += 1
      }
    }
    // `base` shifts re-lex-path offsets (parseTemplate works on the raw
    // template BODY) back to module coordinates, so nested-template
    // diagnostics point into the source the user wrote
    throw new JsSyntaxError(
      s"unterminated template literal at offset ${base + from}")
  }

  /** Index just past the `}` matching a `${` whose body starts at `from`.
    * Brace-depth aware; quoted strings are skipped opaquely and nested
    * backtick templates recurse through [[templateEnd]].
    */
  private def interpEnd(src: String, from: Int, base: Int = 0): Int = {
    val n = src.length
    var i = from
    var depth = 1
    while (i < n && depth > 0) {
      src.charAt(i) match {
        case '\\' if i + 1 < n => i += 2
        case '{'               => depth += 1; i += 1
        case '}'               => depth -= 1; i += 1
        case '`'               => i = templateEnd(src, i + 1, base)
        case q @ ('"' | '\'')  =>
          i += 1
          var qdone = false
          while (i < n && !qdone) {
            if (src.charAt(i) == '\\' && i + 1 < n) i += 2
            else { qdone = src.charAt(i) == q; i += 1 }
          }
          if (!qdone)
            throw new JsSyntaxError(
              s"unterminated string in $${…} at offset ${base + from}")
        case _                 => i += 1
      }
    }
    if (depth > 0)
      throw new JsSyntaxError(
        s"unterminated $${ in template literal at offset ${base + from}")
    i
  }

  /** Whether a `/` at this point starts a REGEX LITERAL: true unless
    * the previous token can END an expression (value, identifier,
    * closing bracket, or a value-like keyword) — then it's division.
    */
  private def regexCanStart(prev: Option[Tok]): Boolean = prev match {
    case None => true
    case Some(t) => t.kind match {
      case "num" | "str" | "template" | "ident" | "regex" | ")" | "]" =>
        false
      case "this" | "true" | "false" | "null" | "undefined" => false
      case _ => true
    }
  }

  private def lex(src: String): IndexedSeq[Tok] = {
    val out = mutable.ArrayBuffer.empty[Tok]
    var i = 0
    val n = src.length
    def err(msg: String) = throw new JsSyntaxError(s"$msg at offset $i")
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '/') {
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(src.charAt(i) == '*' && src.charAt(i + 1) == '/')) i += 1
        i += 2
      } else if (c == '/' && regexCanStart(out.lastOption)) {
        // regex literal vs division: a `/` begins a regex whenever the
        // PREVIOUS significant token cannot end an expression — the
        // classic one-token-lookbehind disambiguation
        val start = i
        i += 1
        val sb = new StringBuilder
        var inClass = false
        var closed = false
        while (i < n && !closed) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            sb += ch; sb += src.charAt(i + 1); i += 2
          } else if (ch == '\n') err("unterminated regex literal")
          else if (ch == '[') { inClass = true; sb += ch; i += 1 }
          else if (ch == ']') { inClass = false; sb += ch; i += 1 }
          else if (ch == '/' && !inClass) { closed = true; i += 1 }
          else { sb += ch; i += 1 }
        }
        if (!closed) err("unterminated regex literal")
        val fStart = i
        while (i < n && src.charAt(i).isLetter) i += 1
        // body and flags ride one token, newline-separated (a newline
        // can appear in neither)
        out += Tok("regex",
          sb.toString + "\n" + src.substring(fStart, i), start)
      } else if (c.isDigit || (c == '.' && i + 1 < n && src.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (src.charAt(i).isDigit || src.charAt(i) == '.' ||
          src.charAt(i) == 'e' || src.charAt(i) == 'E' ||
          ((src.charAt(i) == '+' || src.charAt(i) == '-') && i > start &&
            (src.charAt(i - 1) == 'e' || src.charAt(i - 1) == 'E')) ||
          (src.charAt(i) == 'x' && i == start + 1 && src.charAt(start) == '0') ||
          (i > start + 1 && src.charAt(start) == '0' && src.charAt(start + 1) == 'x' &&
            "0123456789abcdefABCDEF".indexOf(src.charAt(i)) >= 0))) i += 1
        out += Tok("num", src.substring(start, i), start)
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        val start = i
        i += 1
        while (i < n && src.charAt(i) != quote) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            src.charAt(i + 1) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'
              case 'r' => sb += '\r'; case '\\' => sb += '\\'
              case '\'' => sb += '\''; case '"' => sb += '"'
              case 'u' =>
                if (i + 5 >= n) err("bad \\u escape")
                sb += Integer.parseInt(src.substring(i + 2, i + 6), 16).toChar
                i += 4
              case other => sb += other
            }
            i += 2
          } else { sb += ch; i += 1 }
        }
        if (i >= n) err("unterminated string")
        i += 1
        out += Tok("str", sb.toString, start)
      } else if (c == '`') {
        // template literal: capture the RAW inner text (escapes and
        // ${…} regions intact — the parser splits and sub-parses, which
        // re-lexes inner templates, so nesting is arbitrary-depth).
        val start = i
        val end = templateEnd(src, i + 1)
        out += Tok("template", src.substring(i + 1, end - 1), start)
        i = end
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_' ||
          src.charAt(i) == '$')) i += 1
        val w = src.substring(start, i)
        out += Tok(if (keywords(w)) w else "ident", w, start)
      } else {
        punct.find(p => src.startsWith(p, i)) match {
          case Some(p) => out += Tok(p, p, i); i += p.length
          case None    => err(s"unexpected character '$c'")
        }
      }
    }
    out += Tok("eof", "", n)
    out.toIndexedSeq
  }

  // ---------------------------------------------------------------- parser

  private final class Parser(toks: IndexedSeq[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def at(kind: String): Boolean = peek.kind == kind
    private def eat(kind: String): Tok = {
      if (!at(kind))
        throw new JsSyntaxError(s"expected '$kind' but found '${peek.text}' " +
          s"(offset ${peek.pos})")
      val t = peek; pos += 1; t
    }
    private def opt(kind: String): Boolean = { if (at(kind)) { pos += 1; true } else false }

    def parseModule(): Seq[Stmt] = {
      val out = mutable.ArrayBuffer.empty[Stmt]
      while (!at("eof")) out += statement()
      out.toSeq
    }

    private def block(): Seq[Stmt] = {
      eat("{")
      val out = mutable.ArrayBuffer.empty[Stmt]
      while (!at("}")) out += statement()
      eat("}")
      out.toSeq
    }

    private def statement(): Stmt = {
      val s = statementInner()
      opt(";")
      s
    }

    // `{ a, b as c }` — shared by import clauses and export lists;
    // returns (sourceName, boundName) pairs
    private def nameList(): Seq[(String, String)] = {
      eat("{")
      val out = mutable.ArrayBuffer.empty[(String, String)]
      while (!at("}")) {
        val n = eat("ident").text
        val bound =
          if (at("ident") && peek.text == "as") { pos += 1; eat("ident").text }
          else n
        out += ((n, bound))
        if (!at("}")) eat(",")
      }
      eat("}")
      out.toSeq
    }

    // `import` is contextual (scripts may use it as a plain identifier);
    // only the statement shapes `import "…"`, `import {…} from`,
    // `import * as ns from`, `import d from`, `import d, {…} from`
    // start an import declaration
    private def importAhead: Boolean = {
      val t1 = toks(pos + 1)
      t1.kind == "str" || t1.kind == "{" || t1.kind == "*" ||
        (t1.kind == "ident" && pos + 2 < toks.length &&
          (toks(pos + 2).kind == "," ||
            (toks(pos + 2).kind == "ident" && toks(pos + 2).text == "from")))
    }

    private def parseImport(): Stmt = {
      eat("ident") // 'import'
      if (at("str")) return SImport(None, Nil, None, eat("str").text)
      var default: Option[String] = None
      var ns: Option[String] = None
      var named: Seq[(String, String)] = Nil
      if (at("ident")) {
        default = Some(eat("ident").text)
        opt(",")
      }
      if (at("*")) {
        eat("*")
        val as = eat("ident")
        if (as.text != "as") throw new JsSyntaxError(
          s"expected 'as' after 'import *' (offset ${as.pos})")
        ns = Some(eat("ident").text)
      } else if (at("{")) named = nameList()
      val fromTok = eat("ident")
      if (fromTok.text != "from") throw new JsSyntaxError(
        s"expected 'from' in import statement (offset ${fromTok.pos})")
      SImport(default, named, ns, eat("str").text)
    }

    private def statementInner(): Stmt = peek.kind match {
      case "export" =>
        eat("export")
        if (at("default")) { eat("default"); SExportDefault(expression()) }
        else if (at("*")) {
          eat("*")
          val fromTok = eat("ident")
          if (fromTok.text != "from") throw new JsSyntaxError(
            s"expected 'from' after 'export *' (offset ${fromTok.pos})")
          SExportAll(eat("str").text)
        }
        else if (at("{")) {
          val names = nameList()
          val from =
            if (at("ident") && peek.text == "from") {
              pos += 1; Some(eat("str").text)
            } else None
          SExportNamed(names, from)
        } else {
          val decl = statementInner()
          val names = decl match {
            case SFunDecl(n, _)   => Seq(n)
            case SClassDecl(n, _) => Seq(n)
            case SLet(ds)         => ds.map(_._1)
            case _ => throw new JsSyntaxError(
              "export must be followed by default, a {name list}, or a " +
                s"function/class/let/const/var declaration (offset ${peek.pos})")
          }
          SExportDecl(decl, names)
        }
      case "ident" if peek.text == "import" && importAhead =>
        parseImport()
      case "async" if toks(pos + 1).kind == "function" =>
        eat("async")
        val f = functionExpr()
        SFunDecl(f.name, f)
      case "function" =>
        val f = functionExpr()
        SFunDecl(f.name, f)
      // `class` is contextual (not a reserved word here): only a
      // `class <Name>` pair in statement position starts a declaration
      case "ident" if peek.text == "class" &&
          toks(pos + 1).kind == "ident" =>
        classDecl()
      case "let" | "const" | "var" =>
        pos += 1
        if (at("[") || at("{")) {
          // one destructuring declaration per statement
          val pat = pattern()
          eat("=")
          val init = assignExpr()
          if (at(","))
            throw new JsSyntaxError(
              "one destructuring declaration per statement")
          SDestructure(pat, init)
        } else {
          val decls = mutable.ArrayBuffer.empty[(String, Option[Expr])]
          var more = true
          while (more) {
            val name = eat("ident").text
            val init = if (opt("=")) Some(assignExpr()) else None
            decls += ((name, init))
            more = opt(",")
          }
          SLet(decls.toSeq)
        }
      case "if" =>
        eat("if"); eat("(")
        val c = expression()
        eat(")")
        val t = branchBody()
        val f = if (opt("else")) branchBody() else Nil
        SIf(c, t, f)
      case "while" =>
        eat("while"); eat("(")
        val c = expression()
        eat(")")
        SWhile(c, branchBody())
      case "for" =>
        eat("for"); eat("(")
        // for (let x of arr) | for (init; cond; update)
        if ((at("let") || at("const") || at("var")) &&
            toks(pos + 2).kind == "of") {
          pos += 1
          val name = eat("ident").text
          eat("of")
          val it = expression()
          eat(")")
          SForOf(name, it, branchBody())
        } else {
          val init = if (at(";")) None else Some(statementInner())
          eat(";")
          val cond = if (at(";")) None else Some(expression())
          eat(";")
          val update = if (at(")")) None else Some(expression())
          eat(")")
          SFor(init, cond, update, branchBody())
        }
      case "return" =>
        eat("return")
        if (at(";") || at("}") || at("eof")) SReturn(None)
        else SReturn(Some(expression()))
      case "throw" =>
        eat("throw"); SThrow(expression())
      case "break"    => eat("break"); SBreak
      case "continue" => eat("continue"); SContinue
      case "try" =>
        eat("try")
        val body = block()
        var catchName: Option[String] = None
        var catchBody: Seq[Stmt] = Nil
        var hasCatch = false
        if (opt("catch")) {
          hasCatch = true
          if (opt("(")) { catchName = Some(eat("ident").text); eat(")") }
          catchBody = block()
        }
        val fin = if (opt("finally")) block() else Nil
        if (!hasCatch && fin.isEmpty)
          throw new JsSyntaxError("try needs catch or finally")
        STry(body, catchName, catchBody, fin)
      case "{" => SBlock(block())
      case _   => SExpr(expression())
    }

    private def branchBody(): Seq[Stmt] =
      if (at("{")) block() else Seq(statement())

    /** >0 while parsing a generator body — gates `yield` (which stays a
      * plain identifier everywhere else, like real JS outside
      * generators). Non-generator function/method/arrow bodies reset it
      * (yield may not cross a function boundary).
      */
    private var genDepth = 0

    private def functionExpr(): EFun = {
      eat("function")
      val isGen = opt("*")
      val name = if (at("ident")) eat("ident").text else ""
      eat("(")
      val params = mutable.ArrayBuffer.empty[String]
      val defaults = mutable.ArrayBuffer.empty[Option[Expr]]
      while (!at(")")) {
        params += eat("ident").text
        defaults += (if (opt("=")) Some(assignExpr()) else None)
        if (!at(")")) eat(",")
      }
      eat(")")
      val saved = genDepth
      genDepth = if (isGen) genDepth + 1 else 0
      val body = try block() finally genDepth = saved
      EFun(params.toSeq, body, name, gen = isGen,
        defaults = defaults.toSeq)
    }

    /** `class Name [extends Expr] { constructor/methods/static methods }`.
      * Members are `name(params){body}` — fields, getters/setters and
      * computed names stay outside the subset.
      */
    private def classDecl(): Stmt = {
      eat("ident") // the contextual 'class'
      val name = eat("ident").text
      val parent =
        if (at("ident") && peek.text == "extends") { pos += 1; Some(postfixExpr()) }
        else None
      eat("{")
      var ctor: Option[EFun] = None
      val methods = mutable.ArrayBuffer.empty[(String, EFun)]
      val statics = mutable.ArrayBuffer.empty[(String, EFun)]
      while (!at("}")) {
        if (!opt(";")) {
          // 'static' is contextual too: `static m(` is a static method,
          // `static(` a method literally named static. Method names may
          // be keywords (`of`, `in`, …), same as member access.
          def nameLike(t: Tok): Boolean = t.kind == "ident" || keywords(t.kind)
          val isStatic = at("ident") && peek.text == "static" &&
            nameLike(toks(pos + 1))
          if (isStatic) pos += 1
          val t = peek
          if (!nameLike(t))
            throw new JsSyntaxError(
              s"expected method name, got '${t.text}' (offset ${t.pos})")
          pos += 1
          val mname = t.text
          eat("(")
          val params = mutable.ArrayBuffer.empty[String]
          val defaults = mutable.ArrayBuffer.empty[Option[Expr]]
          while (!at(")")) {
            params += eat("ident").text
            defaults += (if (opt("=")) Some(assignExpr()) else None)
            if (!at(")")) eat(",")
          }
          eat(")")
          val saved = genDepth
          genDepth = 0 // methods are non-generator in this subset
          val mbody = try block() finally genDepth = saved
          val fn = EFun(params.toSeq, mbody, mname,
            defaults = defaults.toSeq)
          if (!isStatic && mname == "constructor") ctor = Some(fn)
          else if (isStatic) statics += ((mname, fn))
          else methods += ((mname, fn))
        }
      }
      eat("}")
      SClassDecl(name,
        EClass(name, parent, ctor, methods.toSeq, statics.toSeq))
    }

    def expression(): Expr = assignExpr()

    private def assignExpr(): Expr = {
      if (genDepth > 0 && at("ident") && peek.text == "yield") {
        pos += 1
        val delegate = opt("*")
        val stops = Set(";", ")", "]", "}", ",", "eof")
        val arg = if (stops(peek.kind)) EUndef else assignExpr()
        return EYield(arg, delegate)
      }
      val left = condExpr()
      peek.kind match {
        case op @ ("=" | "+=" | "-=" | "*=" | "/=" | "%=") =>
          left match {
            case _: EIdent | _: EMember | _: EIndex =>
              pos += 1
              EAssign(op, left, assignExpr())
            case _ => left // `a == b` handled below; bare `=` on non-target is an error later
          }
        case _ => left
      }
    }

    private def condExpr(): Expr = {
      val c = orExpr()
      if (opt("?")) {
        val t = assignExpr()
        eat(":")
        ECond(c, t, assignExpr())
      } else c
    }

    private def orExpr(): Expr = {
      var l = andExpr()
      while (at("||")) { pos += 1; l = ELogical("||", l, andExpr()) }
      l
    }
    private def andExpr(): Expr = {
      var l = eqExpr()
      while (at("&&")) { pos += 1; l = ELogical("&&", l, eqExpr()) }
      l
    }
    private def eqExpr(): Expr = {
      var l = relExpr()
      while (at("==") || at("!=") || at("===") || at("!==")) {
        val op = peek.kind; pos += 1
        l = EBin(op, l, relExpr())
      }
      l
    }
    private def relExpr(): Expr = {
      var l = addExpr()
      while (at("<") || at(">") || at("<=") || at(">=")) {
        val op = peek.kind; pos += 1
        l = EBin(op, l, addExpr())
      }
      l
    }
    private def addExpr(): Expr = {
      var l = mulExpr()
      while (at("+") || at("-")) {
        val op = peek.kind; pos += 1
        l = EBin(op, l, mulExpr())
      }
      l
    }
    private def mulExpr(): Expr = {
      var l = powExpr()
      while (at("*") || at("/") || at("%")) {
        val op = peek.kind; pos += 1
        l = EBin(op, l, powExpr())
      }
      l
    }
    private def powExpr(): Expr = {
      val l = unaryExpr()
      if (at("**")) { pos += 1; EBin("**", l, powExpr()) } // right-assoc
      else l
    }
    private def unaryExpr(): Expr = peek.kind match {
      // single-threaded synchronous evaluator: `await` is identity, so
      // deno-style async ingest scripts run unchanged
      case "await" => pos += 1; unaryExpr()
      case "!" => pos += 1; EUnary("!", unaryExpr())
      case "-" => pos += 1; EUnary("-", unaryExpr())
      case "+" => pos += 1; EUnary("+", unaryExpr())
      case "typeof" => pos += 1; EUnary("typeof", unaryExpr())
      case "++" => pos += 1
        val t = unaryExpr(); EAssign("+=", t, ENum(1))
      case "--" => pos += 1
        val t = unaryExpr(); EAssign("-=", t, ENum(1))
      case _ => postfixExpr()
    }

    private def postfixExpr(): Expr = {
      var e = primary()
      var done = false
      while (!done) {
        if (opt(".")) {
          // allow keyword-named members (a.in, a.of, …)
          val t = peek
          if (t.kind == "ident" || keywords(t.kind)) { pos += 1; e = EMember(e, t.text) }
          else throw new JsSyntaxError(s"expected member name, got '${t.text}'")
        } else if (opt("[")) {
          val idx = expression(); eat("]"); e = EIndex(e, idx)
        } else if (opt("(")) {
          val args = mutable.ArrayBuffer.empty[Expr]
          while (!at(")")) {
            args += (if (opt("...")) ESpread(assignExpr()) else assignExpr())
            if (!at(")")) eat(",")
          }
          eat(")")
          e = ECall(e, args.toSeq)
        } else if (at("template")) {
          // tagged template: a template token directly after a callable
          val t = eat("template")
          e = ETagged(e, parseTemplate(t.text, t.pos + 1).parts)
        } else if (at("++")) { pos += 1; e = EAssign("+=", e, ENum(1)) }
        else if (at("--")) { pos += 1; e = EAssign("-=", e, ENum(1)) }
        else done = true
      }
      e
    }

    private def arrowFrom(params: Seq[String],
        defaults: Seq[Option[Expr]] = Nil): Expr = {
      eat("=>")
      val saved = genDepth
      genDepth = 0 // arrows are never generators; yield can't cross in
      val body: Seq[Stmt] =
        try { if (at("{")) block() else Seq(SReturn(Some(assignExpr()))) }
        finally genDepth = saved
      EFun(params, body, "", arrow = true, defaults = defaults)
    }

    /** Binding pattern for destructuring declarations. */
    private def pattern(): Pat = peek.kind match {
      case "[" =>
        eat("[")
        val items = mutable.ArrayBuffer.empty[Option[Pat]]
        var rest: Option[String] = None
        while (!at("]")) {
          if (at(",")) { items += None; pos += 1 } // elision hole
          else if (at("...")) {
            pos += 1
            rest = Some(eat("ident").text)
            if (!at("]"))
              throw new JsSyntaxError("rest element must be last")
          } else {
            items += Some(pattern())
            if (!at("]")) eat(",")
          }
        }
        eat("]")
        PArr(items.toSeq, rest)
      case "{" =>
        eat("{")
        val fields = mutable.ArrayBuffer.empty[(String, Pat)]
        var rest: Option[String] = None
        while (!at("}")) {
          if (at("...")) {
            pos += 1
            rest = Some(eat("ident").text)
            if (!at("}"))
              throw new JsSyntaxError("rest element must be last")
          } else {
            val key = eat("ident").text
            val target: Pat =
              if (opt(":")) pattern()
              else PIdent(key,
                if (opt("=")) Some(assignExpr()) else None)
            fields += ((key, target))
            if (!at("}")) eat(",")
          }
        }
        eat("}")
        PObj(fields.toSeq, rest)
      case _ =>
        val n = eat("ident").text
        PIdent(n, if (opt("=")) Some(assignExpr()) else None)
    }

    private def primary(): Expr = {
      val t = peek
      t.kind match {
        case "num" =>
          pos += 1
          val v = if (t.text.startsWith("0x") || t.text.startsWith("0X"))
            java.lang.Long.parseLong(t.text.substring(2), 16).toDouble
          else t.text.toDouble
          ENum(v)
        case "str"   => pos += 1; EStr(t.text)
        case "regex" =>
          pos += 1
          val sep = t.text.lastIndexOf('\n')
          ERegex(t.text.substring(0, sep), t.text.substring(sep + 1))
        case "template" => pos += 1; parseTemplate(t.text, t.pos + 1)
        case "true"  => pos += 1; EBool(true)
        case "false" => pos += 1; EBool(false)
        case "null"  => pos += 1; ENull
        case "undefined" => pos += 1; EUndef
        case "function"  => functionExpr()
        case "async" =>
          pos += 1 // `async function` / `async () =>`: evaluated synchronously
          primary()
        case "ident" =>
          // arrow shorthand: `x => …`
          if (toks(pos + 1).kind == "=>") { pos += 1; arrowFrom(Seq(t.text)) }
          else { pos += 1; EIdent(t.text) }
        case "(" =>
          // try arrow params `(a, b) =>`; else parenthesized expression
          val save = pos
          pos += 1
          val params = mutable.ArrayBuffer.empty[String]
          val defaults = mutable.ArrayBuffer.empty[Option[Expr]]
          var isArrow = true
          // tentative: `(a, b = expr) =>` — a failed default parse or a
          // missing `=>` after `)` backtracks to a parenthesized
          // expression (`(a = 1)` alone is an assignment, not params)
          try {
            if (!at(")")) {
              var more = true
              while (more && isArrow) {
                if (at("ident")) {
                  params += peek.text; pos += 1
                  defaults +=
                    (if (at("=")) { pos += 1; Some(assignExpr()) } else None)
                  if (at(",")) { pos += 1 } else more = false
                } else isArrow = false
              }
            }
          } catch { case _: JsSyntaxError => isArrow = false }
          if (isArrow && at(")") && toks(pos + 1).kind == "=>") {
            pos += 1
            arrowFrom(params.toSeq, defaults.toSeq)
          } else {
            pos = save
            eat("(")
            val e = expression()
            eat(")")
            e
          }
        case "[" =>
          pos += 1
          val items = mutable.ArrayBuffer.empty[Expr]
          while (!at("]")) {
            items += (if (opt("...")) ESpread(assignExpr()) else assignExpr())
            if (!at("]")) eat(",")
          }
          eat("]")
          EArr(items.toSeq)
        case "{" =>
          pos += 1
          val fields = mutable.ArrayBuffer.empty[(String, Expr)]
          while (!at("}")) {
            val key = peek.kind match {
              case "str" | "num" | "ident" => val k = peek.text; pos += 1; k
              case k if keywords(k)        => pos += 1; k
              case other => throw new JsSyntaxError(s"bad object key '$other'")
            }
            if (opt(":")) fields += ((key, assignExpr()))
            else fields += ((key, EIdent(key))) // shorthand {x}
            if (!at("}")) eat(",")
          }
          eat("}")
          EObj(fields.toSeq)
        case "new" =>
          pos += 1
          // `new Error(msg)` and friends: evaluate as a plain call
          primaryNewTarget()
        case other => throw new JsSyntaxError(s"unexpected token '$other'")
      }
    }

    private def primaryNewTarget(): Expr = {
      val callee = postfixExpr()
      callee match {
        case c: ECall => c
        case e        => ECall(e, Nil)
      }
    }
  }

  def parse(src: String): Seq[Stmt] = new Parser(lex(src)).parseModule()

  /** Split a raw template-literal body into literal chunks and
    * sub-parsed `${…}` interpolations (the lexer kept it verbatim).
    */
  /** `base` = module-source offset of `raw`'s first character, so
    * diagnostics from this re-lex path stay module-relative.
    */
  private def parseTemplate(raw: String, base: Int = 0): ETemplate = {
    val parts = mutable.ArrayBuffer.empty[Either[String, Expr]]
    val lit = new StringBuilder
    var i = 0
    val n = raw.length
    def flush(): Unit =
      if (lit.nonEmpty) { parts += Left(lit.toString); lit.clear() }
    while (i < n) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < n) {
        raw.charAt(i + 1) match {
          case 'n' => lit += '\n'; case 't' => lit += '\t'
          case 'r' => lit += '\r'; case '\\' => lit += '\\'
          case '`' => lit += '`'; case '$' => lit += '$'
          case 'u' =>
            require(i + 5 < n, "js: bad \\u escape in template")
            lit += Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar
            i += 4
          case other => lit += other
        }
        i += 2
      } else if (c == '$' && i + 1 < n && raw.charAt(i + 1) == '{') {
        flush()
        val exprStart = i + 2
        val end = interpEnd(raw, exprStart, base)
        val src = raw.substring(exprStart, end - 1)
        parts += Right(
          try new Parser(lex(src)).expression()
          catch { case e: JsSyntaxError =>
            throw new JsSyntaxError(
              s"${e.getMessage} (inside template interpolation at module " +
                s"offset ${base + exprStart})")
          })
        i = end
      } else { lit += c; i += 1 }
    }
    flush()
    ETemplate(parts.toSeq)
  }

  // ------------------------------------------------------------ evaluation

  final class Env(val vars: mutable.Map[String, V], val parent: Option[Env]) {
    def lookup(name: String): Option[V] =
      vars.get(name).orElse(parent.flatMap(_.lookup(name)))
    def set(name: String, v: V): Unit = {
      def walk(e: Env): Boolean =
        if (e.vars.contains(name)) { e.vars(name) = v; true }
        else e.parent.exists(walk)
      if (!walk(this)) vars(name) = v
    }
    def declare(name: String, v: V): Unit = vars(name) = v
    def child: Env = new Env(mutable.Map.empty, Some(this))
  }

  private final class ReturnSignal(val value: V) extends RuntimeException
  private object BreakSignal extends RuntimeException
  private object ContinueSignal extends RuntimeException

  def truthy(v: V): Boolean = v match {
    case VUndef | VNull => false
    case VBool(b)       => b
    case VNum(n)        => n != 0 && !n.isNaN
    case VStr(s)        => s.nonEmpty
    case _              => true
  }

  def numToString(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Infinity"
    else if (d.isNegInfinity) "-Infinity"
    else if (d == Math.floor(d) && Math.abs(d) < 1e21)
      BigDecimal(d).toBigInt.toString
    else d.toString

  def toDisplay(v: V): String = v match {
    case VUndef   => "undefined"
    case VNull    => "null"
    case VNum(n)  => numToString(n)
    case VStr(s)  => s
    case VBool(b) => b.toString
    case o: VObj  =>
      // Error-shaped objects display their message (new Error(msg) parity)
      o.fields.get("message") match {
        case Some(VStr(m)) if o.fields.contains("__error__") => s"Error: $m"
        case _ => stringify(o)
      }
    case a: VArr     => a.items.map(toDisplay).mkString(",")
    case f: VFun     => s"function ${f.name}"
    case n: VNative  => s"function ${n.name}"
    case k: VClass   => s"class ${k.name}"
    case _: VGen     => "[object Generator]"
    case _: VMapV    => "[object Map]"
    case _: VSetV    => "[object Set]"
    case r: VRegExp  => s"/${r.source}/${r.flags}"
  }

  def toNum(v: V): Double = v match {
    case VNum(n)  => n
    case VBool(b) => if (b) 1 else 0
    case VNull    => 0
    case VUndef   => Double.NaN
    case VStr(s)  =>
      val t = s.trim
      if (t.isEmpty) 0
      else try t.toDouble catch { case _: NumberFormatException => Double.NaN }
    case _ => Double.NaN
  }

  /** JSON.stringify subset: deterministic, insertion-ordered keys. */
  def stringify(v: V): String = v match {
    case VUndef      => "null" // top-level undefined is really undefined; callers guard
    case VNull       => "null"
    case VNum(n)     => if (n.isNaN || n.isInfinite) "null" else numToString(n)
    case VBool(b)    => b.toString
    case VStr(s)     => quote(s)
    case a: VArr     => a.items.map(stringify).mkString("[", ",", "]")
    case o: VObj =>
      o.fields.iterator
        .filter { case (_, fv) => !fv.isInstanceOf[VFun] && fv != VUndef }
        .map { case (k, fv) => quote(k) + ":" + stringify(fv) }
        .mkString("{", ",", "}")
    case _: VFun | _: VNative | _: VClass | _: VGen => "null"
    case _: VMapV | _: VSetV => "{}" // JSON.stringify(Map/Set) parity
    case _: VRegExp => "{}" // JSON.stringify(/x/) === "{}" parity
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c    => sb += c
    }
    (sb += '"').toString
  }

  private def strictEq(l: V, r: V): Boolean = (l, r) match {
    case (VNum(a), VNum(b))   => a == b
    case (VStr(a), VStr(b))   => a == b
    case (VBool(a), VBool(b)) => a == b
    case (VNull, VNull)       => true
    case (VUndef, VUndef)     => true
    case (a: AnyRef, b: AnyRef) => a eq b
  }

  private def looseEq(l: V, r: V): Boolean = (l, r) match {
    case (VNull | VUndef, VNull | VUndef) => true
    case (VNum(_), VStr(_)) | (VStr(_), VNum(_)) |
         (VBool(_), _) | (_, VBool(_)) => toNum(l) == toNum(r)
    case _ => strictEq(l, r)
  }

  /** Flatten `...spread` elements into the evaluated argument list. */
  private def spreadArgs(items: Seq[Expr], env: Env): Seq[V] =
    items.flatMap {
      case ESpread(e) => iterableItems(eval(e, env), "spread")
      case e => Seq(eval(e, env))
    }

  /** Recursive destructuring bind (array/object patterns, identifier
    * defaults applied on undefined, rest collectors).
    */
  private def bindPattern(p: Pat, v: V, env: Env): Unit = p match {
    case PIdent(n, d) =>
      env.declare(n,
        if (v == VUndef) d.map(eval(_, env)).getOrElse(VUndef) else v)
    case PArr(items, rest) =>
      val arr: Seq[V] = v match {
        case a: VArr => a.items.toSeq
        case VStr(str) => str.map(c => VStr(c.toString))
        case other => throw new JsError(
          VStr(s"${toDisplay(other)} is not iterable (destructuring)"))
      }
      items.zipWithIndex.foreach { case (slot, i) =>
        slot.foreach(pp =>
          bindPattern(pp, if (i < arr.length) arr(i) else VUndef, env))
      }
      rest.foreach(r => env.declare(r,
        new VArr(mutable.ArrayBuffer(arr.drop(items.length): _*))))
    case PObj(fields, rest) =>
      val o = v match {
        case o: VObj => o
        case other => throw new JsError(
          VStr(s"cannot destructure ${toDisplay(other)} as an object"))
      }
      fields.foreach { case (k, pp) =>
        bindPattern(pp, o.fields.getOrElse(k, VUndef), env)
      }
      rest.foreach { r =>
        val keep = o.fields.filter { case (k, _) => !fields.exists(_._1 == k) }
        env.declare(r, new VObj(mutable.LinkedHashMap(keep.toSeq: _*)))
      }
  }

  private def add(l: V, r: V): V = (l, r) match {
    case (VStr(a), b) => VStr(a + toDisplay(b))
    case (a, VStr(b)) => VStr(toDisplay(a) + b)
    case _            => VNum(toNum(l) + toNum(r))
  }

  def callFunction(f: V, args: Seq[V]): V = callWith(f, args, None)

  /** Call with an explicit `this`. Arrows skip both bindings, so their
    * `this`/`super` resolve lexically through the closure chain — the
    * one semantic split between the two function forms the subset
    * models. Non-arrow calls always bind (to undefined outside a
    * method), matching strict-mode JS. Calling a class constructs.
    */
  private def callWith(f: V, args: Seq[V], thisV: Option[V]): V = f match {
    case VNative(_, nf) => nf(args)
    case k: VClass      => construct(k, args)
    case fn: VFun if fn.gen => new VGen(fn, args, thisV)
    case fn: VFun      => invoke(fn, args, thisV)
    case other =>
      throw new JsError(VStr(s"${toDisplay(other)} is not a function"))
  }

  private def invoke(fn: VFun, args: Seq[V], thisV: Option[V]): V = {
    val env = fn.closure.child
    if (!fn.arrow) {
      env.declare("this", thisV.getOrElse(VUndef))
      env.declare("__super__",
        fn.home.flatMap(_.parent).getOrElse(VUndef: V))
    }
    fn.params.zipWithIndex.foreach { case (p, i) =>
      val provided = if (i < args.length) args(i) else VUndef
      val v =
        if (provided == VUndef)
          // ES default semantics: missing OR explicit undefined takes
          // the default, evaluated with earlier params already bound
          fn.defaults.lift(i).flatten.map(eval(_, env)).getOrElse(VUndef)
        else provided
      env.declare(p, v)
    }
    try { fn.body.foreach(exec(_, env)); VUndef }
    catch { case r: ReturnSignal => r.value }
  }

  // --------------------------------------------------------- generators

  /** Active yield collectors, innermost last (nested generator
    * materialization pushes its own sink).
    */
  private val yieldSinks =
    new ThreadLocal[List[mutable.ArrayBuffer[V]]] {
      override def initialValue(): List[mutable.ArrayBuffer[V]] = Nil
    }

  /** Run the generator body to completion (once) and return its yields
    * — the eager subset semantics documented on [[VGen]]. The fuel
    * budget bounds runaway bodies.
    */
  private def force(g: VGen): IndexedSeq[V] = {
    if (g.out.isEmpty) {
      val sink = mutable.ArrayBuffer.empty[V]
      yieldSinks.set(sink :: yieldSinks.get)
      try invoke(g.fun, g.args, g.thisV)
      finally yieldSinks.set(yieldSinks.get.tail)
      g.out = Some(sink.toIndexedSeq)
    }
    g.out.get
  }

  /** The values a for-of / spread / yield* walks; loud on anything
    * non-iterable.
    */
  private def iterableItems(v: V, what: String): Seq[V] = v match {
    case a: VArr => a.items.toSeq
    case VStr(s) => s.map(c => VStr(c.toString))
    case g: VGen => force(g)
    case m: VMapV =>
      m.entries.valuesIterator.map { case (k, x) => arr(k, x): V }.toSeq
    case s: VSetV => s.items.valuesIterator.toSeq
    case other =>
      throw new JsError(VStr(s"${toDisplay(other)} is not iterable ($what)"))
  }

  /** `new K(args)`: fresh instance, constructor chain run with `this`
    * bound (a parentless missing constructor is a no-op; a subclass
    * missing one forwards its arguments up, per spec default).
    */
  private def construct(k: VClass, args: Seq[V]): VObj = {
    val o = new VObj(mutable.LinkedHashMap.empty)
    o.klass = Some(k)
    runCtor(k, o, args)
    o
  }

  private def runCtor(k: VClass, o: VObj, args: Seq[V]): Unit =
    k.ctor match {
      case Some(f) => callWith(f, args, Some(o))
      case None    => k.parent.foreach(p => runCtor(p, o, args))
    }

  // ---------------------------------------------------------------- budget

  /** Per-entry step budget. An in-JVM interpreter cannot be killed like
    * the reference's Deno worker process (dozer-deno runs scripts in a
    * separate runtime the host can terminate), so every statement and
    * expression evaluation counts against a fuel budget; `while(true){}`
    * in a UDF or ingest script raises loudly instead of hanging the
    * executor task forever. The budget resets at each top-level entry
    * (module load, per-row callDefault) — NOT inside callFunction, or a
    * loop invoking callbacks would refresh its own fuel.
    */
  val DefaultBudget: Long = 20000000L

  final class BudgetExceeded(budget: Long) extends RuntimeException(
    s"JsMini execution budget exceeded ($budget steps) — the script is " +
      "likely stuck in an infinite loop; split the work or simplify the UDF")

  private val fuel = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = Array(DefaultBudget)
  }

  private[functions] def resetBudget(steps: Long = DefaultBudget): Unit =
    fuel.get()(0) = steps

  @inline private def tick(): Unit = {
    val a = fuel.get()
    a(0) -= 1
    if (a(0) <= 0) {
      a(0) = DefaultBudget // don't poison the thread's next entry
      throw new BudgetExceeded(DefaultBudget)
    }
  }

  private def exec(s: Stmt, env: Env): Unit = { tick(); execStmt(s, env) }

  private def execStmt(s: Stmt, env: Env): Unit = s match {
    case SExpr(e) => eval(e, env)
    case SLet(decls) =>
      decls.foreach { case (name, init) =>
        env.declare(name, init.map(eval(_, env)).getOrElse(VUndef))
      }
    case SDestructure(pat, init) =>
      bindPattern(pat, eval(init, env), env)
    case SIf(c, t, f) =>
      if (truthy(eval(c, env))) { val e = env.child; t.foreach(exec(_, e)) }
      else { val e = env.child; f.foreach(exec(_, e)) }
    case SWhile(c, body) =>
      try {
        while (truthy(eval(c, env))) {
          val e = env.child
          try body.foreach(exec(_, e))
          catch { case ContinueSignal => }
        }
      } catch { case BreakSignal => }
    case SFor(init, cond, update, body) =>
      val outer = env.child
      init.foreach(exec(_, outer))
      try {
        while (cond.forall(c => truthy(eval(c, outer)))) {
          val e = outer.child
          try body.foreach(exec(_, e))
          catch { case ContinueSignal => }
          update.foreach(eval(_, outer))
        }
      } catch { case BreakSignal => }
    case SForOf(name, iter, body) =>
      val it = iterableItems(eval(iter, env), "for-of")
      try {
        it.foreach { v =>
          val e = env.child
          e.declare(name, v)
          try body.foreach(exec(_, e))
          catch { case ContinueSignal => }
        }
      } catch { case BreakSignal => }
    case SReturn(e) => throw new ReturnSignal(e.map(eval(_, env)).getOrElse(VUndef))
    case SThrow(e)  => throw new JsError(eval(e, env))
    case STry(body, catchName, catchBody, fin) =>
      try {
        try { val e = env.child; body.foreach(exec(_, e)) }
        catch {
          case je: JsError if catchBody.nonEmpty || catchName.isDefined =>
            val e = env.child
            catchName.foreach(n => e.declare(n, je.value))
            catchBody.foreach(exec(_, e))
        }
      } finally { val e = env.child; fin.foreach(exec(_, e)) }
    case SBreak    => throw BreakSignal
    case SContinue => throw ContinueSignal
    case SFunDecl(name, fn) =>
      env.declare(name,
        VFun(fn.params, fn.body, env, name, fn.arrow, gen = fn.gen,
          defaults = fn.defaults))
    case SClassDecl(name, cls) =>
      env.declare(name, eval(cls, env))
    case SBlock(body) =>
      val e = env.child; body.foreach(exec(_, e))
    case SExportDefault(_) => // handled at module load
    case _: SImport | _: SExportNamed | _: SExportDecl | _: SExportAll =>
      throw new JsSyntaxError(
        "import/export is only allowed at module top level")
  }

  private def eval(e: Expr, env: Env): V = { tick(); evalExpr(e, env) }

  private def evalExpr(e: Expr, env: Env): V = e match {
    case ENum(v)  => VNum(v)
    case EStr(v)  => VStr(v)
    case ERegex(s, f) => new VRegExp(s, f)
    case ETemplate(parts) => VStr(parts.map {
      case Left(s)  => s
      case Right(e) => toDisplay(eval(e, env))
    }.mkString)
    case EBool(v) => VBool(v)
    case ENull    => VNull
    case EUndef   => VUndef
    case EIdent(name) =>
      env.lookup(name).getOrElse(
        throw new JsError(VStr(s"$name is not defined")))
    case EArr(items) =>
      new VArr(mutable.ArrayBuffer(spreadArgs(items, env): _*))
    case ESpread(_) => throw new JsSyntaxError(
      "spread is only valid in array literals and call arguments")
    case EObj(fields) =>
      new VObj(mutable.LinkedHashMap(fields.map { case (k, v) => k -> eval(v, env) }: _*))
    case EFun(params, body, name, arrow, gen, defaults) =>
      VFun(params, body, env, name, arrow, gen = gen, defaults = defaults)
    case EYield(x, delegate) =>
      yieldSinks.get.headOption match {
        case Some(sink) =>
          if (delegate) sink ++= iterableItems(eval(x, env), "yield*")
          else sink += eval(x, env)
          VUndef
        case None => throw new JsError(VStr(
          "yield outside a running generator body"))
      }
    case EClass(name, parentE, ctorE, methodsE, staticsE) =>
      val parent = parentE.map(eval(_, env)).map {
        case k: VClass => k
        case other => throw new JsError(VStr(
          s"class $name extends a non-class (${toDisplay(other)})"))
      }
      val k = new VClass(name, parent)
      def bind(f: EFun): VFun =
        VFun(f.params, f.body, env, f.name, arrow = false, home = Some(k),
          defaults = f.defaults)
      k.ctor = ctorE.map(bind)
      k.methods = methodsE.map { case (n, f) => n -> bind(f) }.toMap
      k.statics = staticsE.map { case (n, f) => n -> bind(f) }.toMap
      k
    case ETagged(tagE, parts) =>
      val tag = eval(tagE, env)
      val strings = mutable.ArrayBuffer("")
      val exprVs = mutable.ArrayBuffer.empty[V]
      parts.foreach {
        case Left(s)  => strings(strings.length - 1) += s
        case Right(x) => exprVs += eval(x, env); strings += ""
      }
      callFunction(tag,
        new VArr(mutable.ArrayBuffer(strings.map(VStr(_): V).toSeq: _*)) +:
          exprVs.toSeq)
    case EUnary(op, x) =>
      val v = eval(x, env)
      op match {
        case "!" => VBool(!truthy(v))
        case "-" => VNum(-toNum(v))
        case "+" => VNum(toNum(v))
        case "typeof" => VStr(v match {
          case VUndef => "undefined"
          case VNull => "object"
          case _: VNum => "number"
          case _: VStr => "string"
          case _: VBool => "boolean"
          case _: VFun | _: VNative | _: VClass => "function"
          case _ => "object"
        })
      }
    case ELogical(op, l, r) =>
      val lv = eval(l, env)
      op match {
        case "&&" => if (truthy(lv)) eval(r, env) else lv
        case "||" => if (truthy(lv)) lv else eval(r, env)
      }
    case EBin(op, l, r) =>
      val lv = eval(l, env)
      val rv = eval(r, env)
      op match {
        case "+"   => add(lv, rv)
        case "-"   => VNum(toNum(lv) - toNum(rv))
        case "*"   => VNum(toNum(lv) * toNum(rv))
        case "/"   => VNum(toNum(lv) / toNum(rv))
        case "%"   => VNum(toNum(lv) % toNum(rv))
        case "**"  => VNum(Math.pow(toNum(lv), toNum(rv)))
        case "=="  => VBool(looseEq(lv, rv))
        case "!="  => VBool(!looseEq(lv, rv))
        case "===" => VBool(strictEq(lv, rv))
        case "!==" => VBool(!strictEq(lv, rv))
        case "<" | ">" | "<=" | ">=" =>
          val res = (lv, rv) match {
            case (VStr(a), VStr(b)) => op match {
              case "<" => a < b; case ">" => a > b
              case "<=" => a <= b; case _ => a >= b
            }
            case _ =>
              val (a, b) = (toNum(lv), toNum(rv))
              op match {
                case "<" => a < b; case ">" => a > b
                case "<=" => a <= b; case _ => a >= b
              }
          }
          VBool(res)
      }
    case ECond(c, t, f) =>
      if (truthy(eval(c, env))) eval(t, env) else eval(f, env)
    case EMember(target, name) => member(eval(target, env), name)
    case EIndex(target, idx) =>
      val t = eval(target, env)
      val i = eval(idx, env)
      (t, i) match {
        case (a: VArr, VNum(n)) =>
          val j = n.toInt
          if (j >= 0 && j < a.items.length) a.items(j) else VUndef
        case (VStr(s), VNum(n)) =>
          val j = n.toInt
          if (j >= 0 && j < s.length) VStr(s.charAt(j).toString) else VUndef
        case (o: VObj, k) => o.fields.getOrElse(toDisplay(k), VUndef)
        case (a: VArr, k) => member(a, toDisplay(k))
        case (other, _) =>
          throw new JsError(VStr(s"cannot index ${toDisplay(other)}"))
      }
    case ECall(EIdent("super"), args) =>
      // super(...) — run the parent constructor chain on this instance
      (env.lookup("__super__"), env.lookup("this")) match {
        case (Some(p: VClass), Some(o: VObj)) =>
          runCtor(p, o, spreadArgs(args, env)); VUndef
        case _ => throw new JsError(VStr(
          "'super(...)' is only valid inside a subclass constructor"))
      }
    case ECall(EMember(EIdent("super"), name), args)
        if env.lookup("__super__").exists(_.isInstanceOf[VClass]) =>
      val p = env.lookup("__super__").get.asInstanceOf[VClass]
      val f = p.findMethod(name).getOrElse(throw new JsError(VStr(
        s"super.$name is not a method of class ${p.name}")))
      callWith(f, spreadArgs(args, env), env.lookup("this"))
    case ECall(EMember(targetE, name), args) =>
      // method call: bind `this` value for prototype methods
      val target = eval(targetE, env)
      val argVs = spreadArgs(args, env)
      method(target, name, argVs)
    case ECall(target, args) =>
      callFunction(eval(target, env), spreadArgs(args, env))
    case EAssign(op, target, valueE) =>
      val rhs = eval(valueE, env)
      def combined(cur: V): V = op match {
        case "="  => rhs
        case "+=" => add(cur, rhs)
        case "-=" => VNum(toNum(cur) - toNum(rhs))
        case "*=" => VNum(toNum(cur) * toNum(rhs))
        case "/=" => VNum(toNum(cur) / toNum(rhs))
        case "%=" => VNum(toNum(cur) % toNum(rhs))
      }
      target match {
        case EIdent(name) =>
          val nv = combined(env.lookup(name).getOrElse(VUndef))
          env.set(name, nv); nv
        case EMember(te, name) =>
          eval(te, env) match {
            case o: VObj =>
              val nv = combined(o.fields.getOrElse(name, VUndef))
              o.fields(name) = nv; nv
            case r: VRegExp if name == "lastIndex" =>
              val nv = combined(VNum(r.lastIndex))
              r.lastIndex = toNum(nv).toInt; nv
            case other =>
              throw new JsError(VStr(s"cannot set .$name on ${toDisplay(other)}"))
          }
        case EIndex(te, ie) =>
          val t = eval(te, env)
          val i = eval(ie, env)
          (t, i) match {
            case (a: VArr, VNum(n)) =>
              val j = n.toInt
              while (a.items.length <= j) a.items += VUndef
              val nv = combined(a.items(j))
              a.items(j) = nv; nv
            case (o: VObj, k) =>
              val key = toDisplay(k)
              val nv = combined(o.fields.getOrElse(key, VUndef))
              o.fields(key) = nv; nv
            case (other, _) =>
              throw new JsError(VStr(s"cannot index-assign ${toDisplay(other)}"))
          }
        case other =>
          throw new JsError(VStr(s"invalid assignment target $other"))
      }
  }

  // ------------------------------------------------ members & prototypes

  private def member(v: V, name: String): V = (v, name) match {
    case (VStr(s), "length") => VNum(s.length)
    case (a: VMatchArr, "index") => VNum(a.index)
    case (a: VMatchArr, "input") => VStr(a.input)
    case (a: VMatchArr, "groups") => a.groups
    case (a: VMatchArr, "indices") => a.indices
    case (a: VArr, "length") => VNum(a.items.length)
    case (o: VObj, n)        => o.fields.getOrElse(n,
      o.klass.flatMap(_.findMethod(n)).getOrElse(VUndef))
    case (k: VClass, "name") => VStr(k.name)
    case (k: VClass, n)      => k.findStatic(n).getOrElse(VUndef)
    case (m: VMapV, "size")  => VNum(m.entries.size)
    case (s: VSetV, "size")  => VNum(s.items.size)
    case (r: VRegExp, "source")    => VStr(r.source)
    case (r: VRegExp, "flags")     => VStr(r.flags)
    case (r: VRegExp, "global")    => VBool(r.global)
    case (r: VRegExp, "sticky")    => VBool(r.sticky)
    case (r: VRegExp, "hasIndices") => VBool(r.hasIndices)
    case (r: VRegExp, "lastIndex") => VNum(r.lastIndex)
    case (VUndef, n) =>
      throw new JsError(VStr(s"cannot read '$n' of undefined"))
    case (VNull, n) =>
      throw new JsError(VStr(s"cannot read '$n' of null"))
    case _ => VUndef // unbound prototype method references resolve at call time
  }

  // ------------------------------------------------------------ regex ops

  /** A JS match result: the array shape [full, group1, …] (unmatched
    * groups → undefined) PLUS the spec's `index`/`input`/`groups`
    * properties (`groups` is an object of named captures, undefined
    * when the pattern declares none).
    */
  final class VMatchArr(items: mutable.ArrayBuffer[V], val index: Int,
      val input: String, val groups: V, val indices: V = VUndef)
    extends VArr(items)

  /** Named capture groups declared in a pattern source (`(?<name>`,
    * lookbehinds excluded), in declaration order.
    */
  private def namedGroupNames(source: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < source.length) {
      source.charAt(i) match {
        case '\\' => i += 2
        case '[' =>
          i += 1
          if (i < source.length && source.charAt(i) == '^') i += 1
          if (i < source.length && source.charAt(i) == ']') i += 1
          while (i < source.length && source.charAt(i) != ']') {
            if (source.charAt(i) == '\\') i += 2 else i += 1
          }
          i += 1
        case '(' if source.startsWith("(?<", i) &&
            i + 3 < source.length && source.charAt(i + 3) != '=' &&
            source.charAt(i + 3) != '!' =>
          val end = source.indexOf('>', i + 3)
          if (end > 0) { out += source.substring(i + 3, end); i = end + 1 }
          else i += 3
        case _ => i += 1
      }
    }
    out.toSeq
  }

  private def matchArr(m: java.util.regex.Matcher,
      input: String, names: Seq[String],
      withIndices: Boolean = false): VArr = {
    val out = mutable.ArrayBuffer.empty[V]
    out += VStr(m.group())
    var g = 1
    while (g <= m.groupCount) {
      out += (if (m.group(g) == null) VUndef else VStr(m.group(g)))
      g += 1
    }
    val groups: V =
      if (names.isEmpty) VUndef
      else {
        val o = new VObj(mutable.LinkedHashMap.empty)
        names.foreach { n =>
          val v = try Option(m.group(n)) catch {
            case _: IllegalArgumentException => None
          }
          o.fields(n) = v.map(VStr(_): V).getOrElse(VUndef)
        }
        o
      }
    // the `d` flag: [start, end] per group (undefined for unmatched),
    // plus indices.groups for named captures — ECMA hasIndices shape
    val indices: V =
      if (!withIndices) VUndef
      else {
        def span(st: Int, en: Int): V =
          if (st < 0) VUndef
          else new VArr(mutable.ArrayBuffer[V](VNum(st), VNum(en)))
        val items = mutable.ArrayBuffer[V](span(m.start, m.end))
        var k = 1
        while (k <= m.groupCount) {
          items += span(m.start(k), m.end(k)); k += 1
        }
        val gobj: V =
          if (names.isEmpty) VUndef
          else {
            val o = new VObj(mutable.LinkedHashMap.empty)
            names.foreach { n =>
              val sp = try span(m.start(n), m.end(n)) catch {
                case _: IllegalArgumentException => VUndef
              }
              o.fields(n) = sp
            }
            o
          }
        new VMatchArr(items, m.start, input, gobj)
      }
    new VMatchArr(out, m.start, input, groups, indices)
  }

  /** `RegExp.prototype.exec` semantics: global regexes scan from (and
    * advance) `lastIndex`, resetting to 0 on a miss — JS's stateful
    * iteration contract; non-global always scans from 0.
    */
  private def execRegex(r: VRegExp, s: String): V = {
    val stateful = r.global || r.sticky
    val from = if (stateful) r.lastIndex else 0
    if (from > s.length) { if (stateful) r.lastIndex = 0; return VNull }
    val m = r.pattern.matcher(s)
    val hit =
      if (r.sticky) stickyAt(m, s, from)
      else m.find(from)
    if (!hit) { if (stateful) r.lastIndex = 0; VNull }
    else {
      if (stateful) r.lastIndex = m.end
      matchArr(m, s, r.groupNames, r.hasIndices)
    }
  }

  /** One STICKY match attempt anchored exactly at `from` — JS `y`
    * semantics on the JDK matcher: the region pins the start,
    * transparent bounds keep `\b`/lookbehind seeing the full input,
    * and non-anchoring bounds keep `^` meaning true input/line start
    * rather than region start.
    */
  private def stickyAt(m: java.util.regex.Matcher, s: String,
      from: Int): Boolean = {
    m.region(from, s.length)
    m.useTransparentBounds(true)
    m.useAnchoringBounds(false)
    m.lookingAt()
  }

  /** String.prototype.{match,search} accept a string too — JS converts
    * it to a RegExp treating it AS A PATTERN (not a literal).
    */
  private def asRegex(v: V): VRegExp = v match {
    case r: VRegExp => r
    case other => new VRegExp(toDisplay(other), "")
  }

  /** `$$`/`$&`/`` $` ``/`$'`/`$n`/`$<name>` replacement-template
    * expansion (JS GetSubstitution: unknown `$x` stays literal;
    * two-digit group wins when it exists; `$<…>` is literal unless the
    * pattern has named groups, and a named group that did not match
    * expands empty).
    */
  private def expandReplacement(m: java.util.regex.Matcher,
      tmpl: String, input: String, hasNamed: Boolean): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < tmpl.length) {
      val c = tmpl.charAt(i)
      if (c == '$' && i + 1 < tmpl.length) {
        tmpl.charAt(i + 1) match {
          case '$' => sb += '$'; i += 2
          case '&' => sb ++= m.group(); i += 2
          case '`' => sb ++= input.substring(0, m.start); i += 2
          case '\'' => sb ++= input.substring(m.end); i += 2
          case '<' if hasNamed =>
            val end = tmpl.indexOf('>', i + 2)
            if (end < 0) { sb += '$'; i += 1 }
            else {
              val nm = tmpl.substring(i + 2, end)
              sb ++= (try Option(m.group(nm)).getOrElse("")
                catch { case _: IllegalArgumentException => "" })
              i = end + 1
            }
          case d if d.isDigit =>
            val one = d - '0'
            val two =
              if (i + 2 < tmpl.length && tmpl.charAt(i + 2).isDigit)
                Some(one * 10 + (tmpl.charAt(i + 2) - '0'))
              else None
            two match {
              case Some(t) if t >= 1 && t <= m.groupCount() =>
                sb ++= Option(m.group(t)).getOrElse(""); i += 3
              case _ if one >= 1 && one <= m.groupCount() =>
                sb ++= Option(m.group(one)).getOrElse(""); i += 2
              case _ => sb += '$'; i += 1
            }
          case _ => sb += '$'; i += 1
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def regexReplace(s: String, r: VRegExp, repl: V,
      all: Boolean): String = {
    val m = r.pattern.matcher(s)
    // `$<name>` expands only when the PATTERN declares named groups
    // (JS: otherwise it stays literal); lookbehinds share the "(?<"
    // prefix and must not count
    val hasNamed = {
      val p = r.pattern.pattern
      var j = p.indexOf("(?<"); var found = false
      while (j >= 0 && !found) {
        val c = if (j + 3 < p.length) p.charAt(j + 3) else ' '
        if (c != '=' && c != '!') found = true
        else j = p.indexOf("(?<", j + 3)
      }
      found
    }
    val sb = new StringBuilder
    var last = 0
    // sticky non-global replace anchors at lastIndex (JS RegExpExec);
    // sticky GLOBAL starts at 0 and replaces only CONSECUTIVE matches
    var from = if (r.sticky && !all) r.lastIndex else 0
    var matchedEnd = -1
    var done = false
    if (from > s.length) from = s.length + 1 // out-of-range lastIndex
    while (!done && from <= s.length &&
        (if (r.sticky) stickyAt(m, s, from) else m.find(from))) {
      matchedEnd = m.end
      sb.append(s.substring(last, m.start))
      repl match {
        case f @ (_: VFun | _: VNative) =>
          // function replacement: (match, p1…, offset, string)
          val groups = (1 to m.groupCount()).map(g =>
            if (m.group(g) == null) VUndef else VStr(m.group(g)): V)
          sb ++= toDisplay(callFunction(f,
            (VStr(m.group()) +: groups) ++ Seq(VNum(m.start), VStr(s))))
        case other => sb ++= expandReplacement(m, toDisplay(other), s,
          hasNamed)
      }
      last = m.end
      from = if (m.end == m.start) advanceIndex(s, m.end, r.unicode)
        else m.end
      if (!all) done = true
    }
    sb.append(s.substring(last))
    // JS lastIndex bookkeeping: global (and failed sticky) resets to
    // 0, a successful sticky non-global advances to the match end, a
    // non-global non-sticky regex never touches it
    if (r.sticky && !all)
      r.lastIndex = if (matchedEnd >= 0) matchedEnd else 0
    else if (r.global || r.sticky) r.lastIndex = 0
    sb.toString
  }

  /** Regex split, JS shape: separators between fields, CAPTURED GROUPS
    * spliced into the output, optional limit.
    */
  private def regexSplit(s: String, r: VRegExp,
      limit: Option[Int]): VArr = {
    val out = mutable.ArrayBuffer.empty[V]
    val lim = limit.getOrElse(Int.MaxValue)
    // ECMA-262 SplitMatcher on the empty string: a pattern matching
    // "" yields [] (not [""])
    if (s.isEmpty) {
      val m0 = r.pattern.matcher(s)
      if (!m0.find(0) && lim > 0) out += VStr("")
      return new VArr(out)
    }
    val m = r.pattern.matcher(s)
    var last = 0
    var from = 0
    var stop = false
    while (!stop && out.length < lim && from <= s.length &&
        m.find(from)) {
      if (m.end == last)
        // ECMA SplitMatcher's e == p rule: an empty match AT the last
        // split point is not a split ("a1b".split(/(\d)?/) has no ""
        // between "1" and "b"; the leading empty match is the p = 0
        // case of the same rule)
        from = advanceIndex(s, m.end, r.unicode)
      else if (m.start == s.length)
        // JS attempts split points only at q < size: an empty match
        // AT the end is not a split point ("abc".split(/(?:)/) has no
        // trailing "")
        stop = true
      else {
        out += VStr(s.substring(last, m.start))
        var g = 1
        while (g <= m.groupCount && out.length < lim) {
          out += (if (m.group(g) == null) VUndef else VStr(m.group(g)))
          g += 1
        }
        last = m.end
        from = if (m.end == m.start) advanceIndex(s, m.end, r.unicode)
          else m.end
      }
      if (from > s.length) stop = true
    }
    if (out.length < lim) out += VStr(s.substring(last))
    new VArr(out)
  }

  /** Method dispatch, SPLIT per receiver type: one fused tuple match
    * crossed HotSpot's huge-method bytecode limit (8000 bytes,
    * -XX:+DontCompileHugeMethods default) when the regex surface
    * landed, and the interpreter's hottest path silently stopped
    * JIT-compiling (q93 went 3x slower). Each per-type arm stays far
    * under the limit; semantics are byte-identical to the old order.
    */
  private def method(target: V, name: String, args: Seq[V]): V =
    target match {
      case o: VObj    => objMethod(o, name, args)
      case k: VClass  =>
        k.findStatic(name) match {
          case Some(f) => callWith(f, args, Some(k))
          case None    => methodTail(k, name, args)
        }
      case m: VMapV   => mapMethod(m, name, args)
      case sv: VSetV  => setMethod(sv, name, args)
      case g: VGen    => genMethod(g, name, args)
      case r: VRegExp => regexMethod(r, name, args)
      case sv: VStr   => strMethod(sv, name, args)
      case a: VArr    => arrMethod(a, name, args)
      case nv: VNum   => numMethod(nv, name, args)
      case b: VBool   =>
        if (name == "toString") VStr(b.v.toString)
        else methodTail(b, name, args)
      case other      => methodTail(other, name, args)
    }

  private def objMethod(o: VObj, name: String, args: Seq[V]): V = {
    // function-valued fields and class-chain methods get `this`
    if (o.fields.contains(name))
      return callWith(o.fields(name), args, Some(o))
    o.klass.flatMap(_.findMethod(name)) match {
      case Some(f) => callWith(f, args, Some(o))
      case None => name match {
        case "hasOwnProperty" =>
          VBool(o.fields.contains(toDisplay(args.head)))
        case "toString" => VStr(toDisplay(o))
        case _ => methodTail(o, name, args)
      }
    }
  }

  private def mapMethod(m: VMapV, name: String, args: Seq[V]): V = {
    name match {
      case "get" =>
        m.entries.get(sameValueKey(args.head)).map(_._2).getOrElse(VUndef)
      case "set" =>
        m.entries(sameValueKey(args.head)) =
          (args.head, args.lift(1).getOrElse(VUndef)); m
      case "has" =>
        VBool(m.entries.contains(sameValueKey(args.head)))
      case "delete" =>
        VBool(m.entries.remove(sameValueKey(args.head)).isDefined)
      case "clear" => m.entries.clear(); VUndef
      case "keys" =>
        new VArr(mutable.ArrayBuffer(
          m.entries.valuesIterator.map(_._1).toSeq: _*))
      case "values" =>
        new VArr(mutable.ArrayBuffer(
          m.entries.valuesIterator.map(_._2).toSeq: _*))
      case "entries" =>
        new VArr(mutable.ArrayBuffer(
          m.entries.valuesIterator.map { case (k, v) => arr(k, v): V }.toSeq: _*))
      case "forEach" =>
        m.entries.values.toSeq.foreach { case (k, v) =>
          callFunction(args.head, Seq(v, k, m)) }
        VUndef
      case _ => methodTail(m, name, args)
    }
  }

  private def setMethod(sv: VSetV, name: String, args: Seq[V]): V = {
    val s = sv
    name match {
      case "add" =>
        s.items(sameValueKey(args.head)) = args.head; s
      case "has" =>
        VBool(s.items.contains(sameValueKey(args.head)))
      case "delete" =>
        VBool(s.items.remove(sameValueKey(args.head)).isDefined)
      case "clear" => s.items.clear(); VUndef
      case "values" | "keys" =>
        new VArr(mutable.ArrayBuffer(s.items.valuesIterator.toSeq: _*))
      case "forEach" =>
        s.items.values.toSeq.foreach(v => callFunction(args.head, Seq(v, v, s)))
        VUndef

      // ---- Generator.prototype (eager subset — see VGen)
      case _ => methodTail(sv, name, args)
    }
  }

  private def genMethod(g: VGen, name: String, args: Seq[V]): V = {
    name match {
      case "next" =>
        val items = force(g)
        if (g.idx < items.length) {
          val v = items(g.idx); g.idx += 1
          obj("value" -> v, "done" -> VBool(false))
        } else obj("value" -> VUndef, "done" -> VBool(true))

      // ---- RegExp.prototype (JDK-engine subset — see VRegExp)
      case _ => methodTail(g, name, args)
    }
  }

  private def regexMethod(r: VRegExp, name: String, args: Seq[V]): V = {
    name match {
      case "test" =>
        VBool(execRegex(r, toDisplay(args.head)) != VNull)
      case "exec" => execRegex(r, toDisplay(args.head))
      case "toString" => VStr(toDisplay(r))

      // ---- String.prototype
      case _ => methodTail(r, name, args)
    }
  }

  private def strMethod(sv: VStr, name: String, args: Seq[V]): V = {
    val s = sv.v
    name match {
      case "match" =>
        val r = asRegex(args.head)
        if (r.global) {
          // JS Symbol.match (global): lastIndex reset first, sticky
          // regexes collect only CONSECUTIVE matches, lastIndex ends 0
          val m = r.pattern.matcher(s)
          val out = mutable.ArrayBuffer.empty[V]
          var from = 0
          while (from <= s.length &&
              (if (r.sticky) stickyAt(m, s, from) else m.find(from))) {
            out += VStr(m.group())
            from = if (m.end == m.start) advanceIndex(s, m.end, r.unicode)
              else m.end
          }
          r.lastIndex = 0
          if (out.isEmpty) VNull else new VArr(out)
        } else
          // non-global match IS RegExpExec (sticky honors lastIndex)
          execRegex(r, s)
      case "matchAll" =>
        // JS: non-global regex throws; result is an iterator of FULL
        // match results — materialized as an array here (the subset's
        // for-of/spread consume arrays). ECMA-262 clones the regex
        // WITH its current lastIndex, so iteration STARTS there while
        // the original's lastIndex stays untouched
        val r = asRegex(args.head)
        if (!r.global) throw new JsError(VStr(
          "matchAll must be called with a global RegExp"))
        val m = r.pattern.matcher(s)
        val out = mutable.ArrayBuffer.empty[V]
        var from = math.max(0, r.lastIndex)
        while (from <= s.length &&
            (if (r.sticky) stickyAt(m, s, from) else m.find(from))) {
          out += matchArr(m, s, r.groupNames, r.hasIndices)
          from = if (m.end == m.start) advanceIndex(s, m.end, r.unicode)
            else m.end
        }
        new VArr(out)
      case "search" =>
        val m = asRegex(args.head).pattern.matcher(s)
        VNum(if (m.find()) m.start else -1)
      case "split"
          if args.headOption.exists(_.isInstanceOf[VRegExp]) =>
        regexSplit(s, args.head.asInstanceOf[VRegExp],
          args.lift(1).map(v => toNum(v).toInt))
      case "replace"
          if args.headOption.exists(_.isInstanceOf[VRegExp]) =>
        val r = args.head.asInstanceOf[VRegExp]
        VStr(regexReplace(s, r, args(1), all = r.global))
      case "replaceAll"
          if args.headOption.exists(_.isInstanceOf[VRegExp]) =>
        val r = args.head.asInstanceOf[VRegExp]
        if (!r.global) throw new JsError(VStr(
          "replaceAll must be called with a global RegExp"))
        VStr(regexReplace(s, r, args(1), all = true))
      case "toUpperCase" => VStr(s.toUpperCase)
      case "toLowerCase" => VStr(s.toLowerCase)
      case "trim"        => VStr(s.trim)
      case "charAt" =>
        val i = toNum(args.head).toInt
        VStr(if (i >= 0 && i < s.length) s.charAt(i).toString else "")
      case "charCodeAt" =>
        val i = toNum(args.headOption.getOrElse(VNum(0))).toInt
        if (i >= 0 && i < s.length) VNum(s.charAt(i)) else VNum(Double.NaN)
      case "indexOf"   => VNum(s.indexOf(toDisplay(args.head)))
      case "includes"  => VBool(s.contains(toDisplay(args.head)))
      case "startsWith" => VBool(s.startsWith(toDisplay(args.head)))
      case "endsWith"  => VBool(s.endsWith(toDisplay(args.head)))
      case "slice" =>
        val len = s.length
        def norm(i: Double, dflt: Int): Int = {
          if (i.isNaN) 0
          else { val j = i.toInt; if (j < 0) Math.max(0, len + j) else Math.min(j, len) }
        }
        val from = args.headOption.map(a => norm(toNum(a), 0)).getOrElse(0)
        val to = args.lift(1).map(a => norm(toNum(a), len)).getOrElse(len)
        VStr(if (from < to) s.substring(from, to) else "")
      case "substring" =>
        val len = s.length
        def clamp(i: Double): Int = Math.max(0, Math.min(len, if (i.isNaN) 0 else i.toInt))
        val a = args.headOption.map(x => clamp(toNum(x))).getOrElse(0)
        val b = args.lift(1).map(x => clamp(toNum(x))).getOrElse(len)
        VStr(s.substring(Math.min(a, b), Math.max(a, b)))
      case "split" =>
        val sep = toDisplay(args.head)
        val parts =
          if (sep.isEmpty) s.map(_.toString)
          else {
            // literal (non-regex) split, JS semantics: keep trailing empties
            val out = mutable.ArrayBuffer.empty[String]
            var i = 0
            var last = 0
            while ({ i = s.indexOf(sep, last); i >= 0 }) {
              out += s.substring(last, i); last = i + sep.length
            }
            out += s.substring(last)
            out.toSeq
          }
        new VArr(mutable.ArrayBuffer(parts.map(VStr(_)): _*))
      case "replace" =>
        val from = toDisplay(args.head)
        val i = s.indexOf(from)
        if (i < 0) VStr(s)
        else {
          val to = args(1) match {
            case f @ (_: VFun | _: VNative) => // (match, offset, string)
              toDisplay(callFunction(f, Seq(VStr(from), VNum(i), VStr(s))))
            case other => toDisplay(other)
          }
          VStr(s.substring(0, i) + to + s.substring(i + from.length))
        }
      case "replaceAll" =>
        VStr(s.replace(toDisplay(args.head), toDisplay(args(1))))
      case "repeat" => VStr(s * toNum(args.head).toInt)
      case "padStart" =>
        val w = toNum(args.head).toInt
        val p = args.lift(1).map(toDisplay).getOrElse(" ")
        var r = s
        while (r.length < w && p.nonEmpty) r = (p * ((w - r.length + p.length - 1) / p.length)).take(w - r.length) + r
        VStr(r)
      case "toString" => VStr(s)

      // ---- Array.prototype
      case _ => methodTail(sv, name, args)
    }
  }

  private def arrMethod(a: VArr, name: String, args: Seq[V]): V = {
    name match {
      case "push" => args.foreach(a.items += _); VNum(a.items.length)
      case "pop" =>
        if (a.items.isEmpty) VUndef else a.items.remove(a.items.length - 1)
      case "indexOf" =>
        VNum(a.items.indexWhere(strictEq(_, args.head)))
      case "includes" => VBool(a.items.exists(strictEq(_, args.head)))
      case "join" =>
        val sep = args.headOption.map(toDisplay).getOrElse(",")
        VStr(a.items.map {
          case VNull | VUndef => ""
          case v              => toDisplay(v)
        }.mkString(sep))
      case "slice" =>
        val len = a.items.length
        def norm(i: Double): Int = {
          val j = if (i.isNaN) 0 else i.toInt
          if (j < 0) Math.max(0, len + j) else Math.min(j, len)
        }
        val from = args.headOption.map(x => norm(toNum(x))).getOrElse(0)
        val to = args.lift(1).map(x => norm(toNum(x))).getOrElse(len)
        new VArr(mutable.ArrayBuffer(
          (if (from < to) a.items.slice(from, to) else mutable.ArrayBuffer.empty[V]).toSeq: _*))
      case "concat" =>
        val out = mutable.ArrayBuffer(a.items.toSeq: _*)
        args.foreach {
          case b: VArr => out ++= b.items
          case v       => out += v
        }
        new VArr(out)
      case "map" =>
        new VArr(a.items.zipWithIndex.map { case (v, i) =>
          callFunction(args.head, Seq(v, VNum(i))) })
      case "filter" =>
        new VArr(a.items.zipWithIndex.collect {
          case (v, i) if truthy(callFunction(args.head, Seq(v, VNum(i)))) => v })
      case "reduce" =>
        val f = args.head
        var (acc, start) = args.lift(1) match {
          case Some(init) => (init, 0)
          case None =>
            if (a.items.isEmpty)
              throw new JsError(VStr("reduce of empty array with no initial value"))
            (a.items.head, 1)
        }
        var i = start
        while (i < a.items.length) {
          acc = callFunction(f, Seq(acc, a.items(i), VNum(i)))
          i += 1
        }
        acc
      case "forEach" =>
        a.items.zipWithIndex.foreach { case (v, i) =>
          callFunction(args.head, Seq(v, VNum(i))) }
        VUndef
      case "some" =>
        VBool(a.items.zipWithIndex.exists { case (v, i) =>
          truthy(callFunction(args.head, Seq(v, VNum(i)))) })
      case "every" =>
        VBool(a.items.zipWithIndex.forall { case (v, i) =>
          truthy(callFunction(args.head, Seq(v, VNum(i)))) })
      case "sort" =>
        val sorted = args.headOption match {
          case Some(cmp) =>
            a.items.sortWith((x, y) => toNum(callFunction(cmp, Seq(x, y))) < 0)
          case None => a.items.sortBy(toDisplay)
        }
        a.items.clear(); a.items ++= sorted; a
      case "reverse" =>
        val r = a.items.reverse
        a.items.clear(); a.items ++= r; a
      case "flat" =>
        val out = mutable.ArrayBuffer.empty[V]
        a.items.foreach {
          case b: VArr => out ++= b.items
          case v       => out += v
        }
        new VArr(out)
      case "toString" => VStr(toDisplay(a))

      // ---- Number.prototype
      case _ => methodTail(a, name, args)
    }
  }

  private def numMethod(nv: VNum, name: String, args: Seq[V]): V = {
    val n = nv.v
    name match {
      case "toString" => VStr(numToString(n))
      case "toFixed" =>
        val digits = args.headOption.map(a => toNum(a).toInt).getOrElse(0)
        VStr(String.format(java.util.Locale.ROOT, s"%.${digits}f",
          java.lang.Double.valueOf(n)))
      case _ => methodTail(nv, name, args)
    }
  }

  private def methodTail(other: V, n: String, args: Seq[V]): V =
    member(other, n) match {
      case f @ (_: VFun | _: VNative) => callFunction(f, args)
      case _ =>
        throw new JsError(VStr(
          s"${toDisplay(other)}.$n is not a function"))
    }

  // --------------------------------------------------------------- globals

  private def native(name: String)(f: Seq[V] => V): (String, V) =
    name -> VNative(name, f)

  private def num1(f: Double => Double): Seq[V] => V =
    args => VNum(f(toNum(args.headOption.getOrElse(VUndef))))

  def globalEnv(): Env = {
    val mathObj = obj(
      native("floor")(num1(Math.floor)),
      native("ceil")(num1(Math.ceil)),
      native("round")(num1(d => Math.floor(d + 0.5))), // JS round, not HALF_EVEN
      native("trunc")(num1(d => d.toLong.toDouble)),
      native("abs")(num1(Math.abs)),
      native("sqrt")(num1(Math.sqrt)),
      native("log")(num1(Math.log)),
      native("log2")(num1(d => Math.log(d) / Math.log(2))),
      native("exp")(num1(Math.exp)),
      native("sign")(num1(Math.signum)),
      native("min")(args => VNum(if (args.isEmpty) Double.PositiveInfinity
        else args.map(toNum).min)),
      native("max")(args => VNum(if (args.isEmpty) Double.NegativeInfinity
        else args.map(toNum).max)),
      native("pow")(args => VNum(Math.pow(toNum(args.head), toNum(args(1))))),
      "PI" -> VNum(Math.PI),
      "E" -> VNum(Math.E))

    val jsonObj = obj(
      native("stringify")(args => VStr(stringify(args.headOption.getOrElse(VUndef)))),
      native("parse")(args => parseJson(toDisplay(args.head))))

    val objectObj = obj(
      native("keys")(args => args.head match {
        case o: VObj => new VArr(mutable.ArrayBuffer(
          o.fields.keysIterator.map(VStr(_)).toSeq: _*))
        case a: VArr => new VArr(mutable.ArrayBuffer(
          a.items.indices.map(i => VStr(i.toString)): _*))
        case _ => arr()
      }),
      native("values")(args => args.head match {
        case o: VObj => new VArr(mutable.ArrayBuffer(o.fields.valuesIterator.toSeq: _*))
        case a: VArr => new VArr(mutable.ArrayBuffer(a.items.toSeq: _*))
        case _ => arr()
      }),
      native("entries")(args => args.head match {
        case o: VObj => new VArr(mutable.ArrayBuffer(
          o.fields.iterator.map { case (k, v) => arr(VStr(k), v) }.toSeq: _*))
        case _ => arr()
      }))

    val numberObj = obj(
      native("isInteger")(args => VBool(args.head match {
        case VNum(n) => n == Math.floor(n) && !n.isInfinite
        case _       => false
      })),
      native("isFinite")(args => VBool(args.head match {
        case VNum(n) => !n.isNaN && !n.isInfinite
        case _       => false
      })),
      "MAX_SAFE_INTEGER" -> VNum(9007199254740991.0))

    val arrayObj = obj(
      native("isArray")(args => VBool(args.head.isInstanceOf[VArr])),
      native("from")(args => args.head match {
        case a: VArr => new VArr(mutable.ArrayBuffer(a.items.toSeq: _*))
        case VStr(s) => new VArr(mutable.ArrayBuffer(s.map(c => VStr(c.toString)): _*))
        case o: VObj =>
          val len = o.fields.get("length").map(toNum).getOrElse(0.0).toInt
          new VArr(mutable.ArrayBuffer(Seq.fill(len)(VUndef: V): _*))
        case _ => arr()
      }))

    val vars = mutable.Map[String, V](
      "Math" -> mathObj,
      "JSON" -> jsonObj,
      "Object" -> objectObj,
      "Number" -> numberObj,
      "Array" -> arrayObj,
      // `new RegExp(pattern, flags)` — `new` evaluates as a plain
      // call; a RegExp first argument clones (flags override)
      native("RegExp")(args => {
        val (src0, defFl) = args.headOption match {
          case Some(r: VRegExp) => (r.source, r.flags)
          case Some(VUndef) | None => ("(?:)", "")
          case Some(v) => (toDisplay(v), "")
        }
        val fl = args.lift(1) match {
          case Some(VUndef) | None => defFl
          case Some(v) => toDisplay(v)
        }
        new VRegExp(src0, fl)
      }),
      "NaN" -> VNum(Double.NaN),
      "Infinity" -> VNum(Double.PositiveInfinity),
      // `new Map([[k,v],...])` / `new Set(iterable)` — `new` evaluates
      // as a plain call, so the natives ARE the constructors
      native("Map")(args => {
        val m = new VMapV(mutable.LinkedHashMap.empty)
        args.headOption.filterNot(a => a == VUndef || a == VNull)
          .foreach { init =>
            iterableItems(init, "Map") .foreach {
              case pair: VArr if pair.items.length >= 2 =>
                m.entries(sameValueKey(pair.items(0))) =
                  (pair.items(0), pair.items(1))
              case other => throw new JsError(VStr(
                s"Map entries must be [key, value] pairs, got ${toDisplay(other)}"))
            }
          }
        m
      }),
      native("Set")(args => {
        val s = new VSetV(mutable.LinkedHashMap.empty)
        args.headOption.filterNot(a => a == VUndef || a == VNull)
          .foreach(init => iterableItems(init, "Set")
            .foreach(v => s.items(sameValueKey(v)) = v))
        s
      }),
      native("parseInt")(args => {
        val s = toDisplay(args.head).trim
        val radix = args.lift(1).map(a => toNum(a).toInt).filter(_ != 0).getOrElse(10)
        val neg = s.startsWith("-")
        val body = s.stripPrefix("-").stripPrefix("+")
        val digits = body.takeWhile(c => Character.digit(c, radix) >= 0)
        if (digits.isEmpty) VNum(Double.NaN)
        else VNum((if (neg) -1 else 1) * java.lang.Long.parseLong(digits, radix).toDouble)
      }),
      native("parseFloat")(args => {
        // longest numeric prefix, JS semantics
        val s = toDisplay(args.head).trim
        val m = "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?".r.findFirstIn(s)
        VNum(m.map(_.toDouble).getOrElse(Double.NaN))
      }),
      native("isNaN")(args => VBool(toNum(args.head).isNaN)),
      native("String")(args => VStr(args.headOption.map(toDisplay).getOrElse(""))),
      native("Boolean")(args => VBool(args.headOption.exists(truthy))),
      // `new Error(msg)` parity: an Error-shaped object whose display is
      // "Error: msg" (matches the deno module surface UDFs rely on)
      native("Error")(args => obj(
        "__error__" -> VBool(true),
        "message" -> VStr(args.headOption.map(toDisplay).getOrElse("")),
        "name" -> VStr("Error"))))
    new Env(vars, None)
  }

  def parseJson(s: String): V = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def conv(n: com.fasterxml.jackson.databind.JsonNode): V = {
      if (n.isNull) VNull
      else if (n.isTextual) VStr(n.asText())
      else if (n.isNumber) VNum(n.asDouble())
      else if (n.isBoolean) VBool(n.asBoolean())
      else if (n.isArray) {
        val out = mutable.ArrayBuffer.empty[V]
        n.forEach(x => out += conv(x))
        new VArr(out)
      } else {
        val out = mutable.LinkedHashMap.empty[String, V]
        n.fieldNames().forEachRemaining(k => out(k) = conv(n.get(k)))
        new VObj(out)
      }
    }
    try conv(mapper.readTree(s))
    catch {
      case e: Exception => throw new JsError(VStr(s"JSON.parse: ${e.getMessage}"))
    }
  }

  // ---------------------------------------------------------------- module

  /** Lexical ES-style specifier resolution over bundle keys (the
    * file-URL half of deno_core::resolve_import,
    * dozer-deno/src/ts_module_loader/mod.rs:79-86, re-expressed over
    * relative slash paths): `./` and `../` resolve against the importing
    * module's directory, a leading `/` is bundle-root-absolute. Bare
    * specifiers (package names) and URL schemes are rejected LOUDLY —
    * deno would fetch over the network; this runtime is zero-egress by
    * design, so the module must be vendored into the bundle.
    */
  def resolveSpecifier(spec: String, referrer: String): String = {
    if (spec.matches("^[A-Za-z][A-Za-z0-9+.\\-]*:.*"))
      throw new JsSyntaxError(
        s"import '$spec': URL-scheme imports are not supported (this " +
          "runtime is zero-egress; vendor the module into the bundle)")
    if (!spec.startsWith("./") && !spec.startsWith("../") &&
        !spec.startsWith("/"))
      throw new JsSyntaxError(
        s"import '$spec': bare specifiers are not resolvable (no package " +
          "registry in the JsMini subset; use a relative './…' path)")
    val segs = mutable.ArrayBuffer.empty[String]
    if (!spec.startsWith("/"))
      referrer.split("/").dropRight(1).foreach(s => if (s.nonEmpty) segs += s)
    spec.split("/").foreach {
      case "" | "." => ()
      case ".." =>
        if (segs.isEmpty)
          throw new JsSyntaxError(
            s"import '$spec' (from '$referrer') escapes the bundle root")
        segs.remove(segs.length - 1)
      case s => segs += s
    }
    segs.mkString("/")
  }

  /** Top-level import / re-export specifiers of a module source — the
    * edges a bundler must follow ([[graft.functions.JsModules]]).
    */
  def moduleImports(src: String): Seq[String] =
    parse(src).collect {
      case SImport(_, _, _, from)      => from
      case SExportNamed(_, Some(from)) => from
      case SExportAll(from)            => from
    }

  /** Execute-once module cache with loud cycle detection for a
    * multi-module program. Modules load EAGERLY in import order; the
    * subset has no live bindings, so cyclic imports are rejected with
    * the cycle named (a documented delta from ES module semantics —
    * dozer-deno's loader tolerates cycles via deno_core's graph).
    */
  final class ModuleRegistry private[JsMini] (
      sources: String => Option[String],
      extraGlobals: Map[String, V]) {
    private val loaded = mutable.Map.empty[String, Module]
    private val loading = mutable.Set.empty[String]
    private[JsMini] def moduleAt(key: String, spec: String,
        referrer: String, entry: Boolean = false): Module =
      loaded.getOrElse(key, {
        if (loading(key))
          throw new JsSyntaxError(
            s"import cycle: '$spec' (from '$referrer') is already " +
              "loading — the JsMini subset loads modules eagerly with no " +
              "live bindings, so cyclic imports are rejected")
        val src = sources(key).getOrElse(throw new JsSyntaxError(
          s"module not found: '$spec' (from '$referrer') resolved to " +
            s"'$key', which is not in the bundle"))
        loading += key
        try {
          val m = new Module(src, extraGlobals, key, this, entry)
          loaded(key) = m
          m
        } finally loading -= key
      })
    private[JsMini] def resolve(spec: String, referrer: String): Module =
      moduleAt(resolveSpecifier(spec, referrer), spec, referrer)
  }

  /** A loaded module: top-level statements executed once, default export
    * captured (dozer-deno/src/runtime/mod.rs:235-241's resolution),
    * named exports collected, imports resolved through the registry.
    */
  final class Module private[JsMini] (src: String,
      extraGlobals: Map[String, V],
      key: String,
      registry: ModuleRegistry,
      entry: Boolean) {
    private val stmts = parse(src)
    private val env = globalEnv().child
    extraGlobals.foreach { case (k, v) => env.declare(k, v) }
    private var default: Option[V] = None
    /** Named exports, insertion-ordered. */
    private[JsMini] val exports = mutable.LinkedHashMap.empty[String, V]
    // only the ENTRY module resets the interpreter budget: an imported
    // module loading mid-run must not hand the program a fresh
    // infinite-loop allowance
    if (entry) resetBudget()
    private val deferredNamed = mutable.ArrayBuffer.empty[(String, String)]
    stmts.foreach {
      case SExportDefault(e) =>
        default = Some(eval(e, env))
      case SImport(d, named, ns, from) =>
        val m = registry.resolve(from, key)
        d.foreach(n => env.declare(n, m.defaultOr(from)))
        named.foreach { case (exported, local) =>
          env.declare(local, m.namedExport(exported, from))
        }
        ns.foreach(n => env.declare(n, m.namespaceObject))
      case SExportDecl(decl, names) =>
        exec(decl, env)
        names.foreach(n => deferredNamed += ((n, n)))
      case SExportNamed(names, Some(from)) =>
        val m = registry.resolve(from, key)
        names.foreach { case (srcName, exported) =>
          exports(exported) = m.namedExport(srcName, from)
        }
      case SExportNamed(names, None) =>
        names.foreach { case (local, exported) =>
          deferredNamed += ((local, exported))
        }
      case SExportAll(from) =>
        registry.resolve(from, key).exports.foreach { case (n, v) =>
          exports(n) = v
        }
      case s => exec(s, env)
    }
    // local named exports resolve AFTER the top-level pass, so
    // `export {f}` may precede `function f` — declaration-order
    // independence, the useful half of ES hoisting
    deferredNamed.foreach { case (local, exported) =>
      exports(exported) = env.lookup(local).getOrElse(
        throw new JsSyntaxError(
          s"module '$key' exports '$local', which is not defined"))
    }
    private def defaultOpt: Option[V] = default
    private[JsMini] def defaultOr(spec: String): V = defaultOpt.getOrElse(
      throw new JsSyntaxError(s"module '$spec' has no default export"))
    lazy val defaultExport: V = defaultOpt.getOrElse(
      throw new JsSyntaxError("module has no default export"))
    /** The `import * as ns` object: named exports plus `default`. */
    private[JsMini] lazy val namespaceObject: V = {
      val fields = mutable.LinkedHashMap.empty[String, V]
      exports.foreach { case (k, v) => fields(k) = v }
      defaultOpt.foreach(d => fields("default") = d)
      new VObj(fields)
    }
    private[JsMini] def namedExport(name: String, spec: String): V =
      exports.getOrElse(name, throw new JsSyntaxError(
        s"module '$spec' has no export named '$name'" +
          (if (exports.isEmpty) ""
           else s" (exports: ${exports.keys.mkString(", ")})")))

    /** The UDF contract: one JSON-shaped argument in, JSON out
      * (javascript/validate.rs:10-27).
      */
    def callDefault(arg: V): V = {
      resetBudget() // top-level entry: each row gets a fresh budget
      callFunction(defaultExport, Seq(arg))
    }
    /** Named export lookup for host integration / tests. */
    def namedOpt(name: String): Option[V] = exports.get(name)
  }

  def load(src: String): Module = loadBundle(Map("main.js" -> src), "main.js")

  /** Load with host-injected globals (e.g. an `ingest` op for source
    * scripts) — top-level statements run during load; a default export
    * is not required for this entry point.
    */
  def loadWithGlobals(src: String, globals: Map[String, V]): Module =
    loadBundle(Map("main.js" -> src), "main.js", globals)

  /** Load a multi-module program from an in-memory bundle: `sources`
    * maps bundle keys (relative slash paths) to module text; imports
    * resolve between them via [[resolveSpecifier]]. Driver-side file
    * loading builds the bundle once ([[graft.functions.JsModules]]) so
    * executors never touch a filesystem — the closure ships the sources.
    */
  def loadBundle(sources: Map[String, String], entry: String,
      globals: Map[String, V] = Map.empty): Module = {
    val reg = new ModuleRegistry(sources.get, globals)
    reg.moduleAt(entry, entry, "<entry>", entry = true)
  }
}
