package graft.functions

import scala.collection.mutable

/** TypeScript → JavaScript for the JsMini runtime: the TRANSPILE half
  * of the reference's TS module loader (dozer-deno/src/ts_module_loader/
  * mod.rs:101-141 — swc transpile, no typecheck, Deno `--no-check`
  * parity), re-expressed as position-preserving TYPE ERASURE: every
  * type-only construct is overwritten with spaces (newlines kept), so
  * the output is plain JS whose character offsets EQUAL the input's —
  * JsMini diagnostics keep pointing at the line/offset the user wrote.
  * (The blank-in-place technique is public practice — Node's
  * `--experimental-strip-types` / the ts-blank-space approach.)
  *
  * Erased constructs:
  *  - `: T` annotations (let/const/var declarators, parameters, function
  *    and method return positions, arrow return positions, class fields)
  *  - optional-parameter `?`, definite-assignment `!` on declarators
  *  - `as T` casts and postfix non-null `!`
  *  - generic parameter/argument lists on `function`/`class`/method
  *    declarations and on call sites (`f<T>(x)`)
  *  - `interface` declarations, `type` aliases, `declare` statements
  *  - `implements` clauses; TYPE ARGUMENTS of `extends` (the base-class
  *    expression itself is kept)
  *  - `import type` / `export type` statements and inline `type`
  *    specifiers in import/export lists; `readonly` on class members
  *
  * Rejected LOUDLY (value-level codegen or out-of-subset — silent
  * erasure would change behavior):
  *  - `enum` (emits a value; write a frozen object literal instead)
  *  - constructor parameter properties (`constructor(public x)` declares
  *    AND assigns a field)
  *  - `abstract`, `namespace` blocks, decorators (lexer rejects `@`)
  *
  * Known subset ambiguities (documented): `a < b > (c)` parses as a
  * call-site generic when the angle interior looks type-like (the same
  * ambiguity TS itself resolves parser-side); arrow return annotations
  * that are THEMSELVES function types need parentheses
  * (`(): ((x) => y) => …`).
  */
object TsStrip {

  final class TsStripError(msg: String) extends RuntimeException(msg)

  private final case class Tok(kind: String, start: Int, end: Int) {
    def text(src: String): String = src.substring(start, end)
  }

  private val punct = Seq("===", "!==", "**=", "...", "=>", "==", "!=",
    "<=", ">=", "&&", "||", "??", "**", "+=", "-=", "*=", "/=", "%=",
    "++", "--", "?.", "(", ")", "[", "]", "{", "}", ",", ";", ":", "?",
    ".", "+", "-", "*", "/", "%", "<", ">", "=", "!", "&", "|", "^", "~")

  /** Kind-only lexer: strings/templates/comments are skipped opaquely
    * (never inspected, never blanked); values are not decoded — the
    * stripper only needs spans. Mirrors JsMini's token rules so every
    * stripped program lexes identically downstream.
    */
  private def lex(src: String): IndexedSeq[Tok] = {
    val out = mutable.ArrayBuffer.empty[Tok]
    val n = src.length
    var i = 0
    def err(msg: String) =
      throw new TsStripError(s"$msg at offset $i")
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '/') {
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(src.charAt(i) == '*' && src.charAt(i + 1) == '/'))
          i += 1
        i += 2
      } else if (c.isDigit || (c == '.' && i + 1 < n && src.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '.' ||
          ((src.charAt(i) == '+' || src.charAt(i) == '-') && i > start &&
            (src.charAt(i - 1) == 'e' || src.charAt(i - 1) == 'E')))) i += 1
        out += Tok("num", start, i)
      } else if (c == '"' || c == '\'') {
        val start = i
        i += 1
        var done = false
        while (i < n && !done) {
          if (src.charAt(i) == '\\' && i + 1 < n) i += 2
          else { done = src.charAt(i) == c; i += 1 }
        }
        if (!done) err("unterminated string")
        out += Tok("str", start, i)
      } else if (c == '`') {
        val start = i
        var depth = 0
        i += 1
        var done = false
        while (i < n && !done) {
          src.charAt(i) match {
            case '\\' if i + 1 < n => i += 2
            case '`' if depth == 0 => done = true; i += 1
            case '$' if i + 1 < n && src.charAt(i + 1) == '{' =>
              depth += 1; i += 2
            case '}' if depth > 0 => depth -= 1; i += 1
            case _ => i += 1
          }
        }
        if (!done) err("unterminated template literal")
        out += Tok("template", start, i)
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit ||
          src.charAt(i) == '_' || src.charAt(i) == '$')) i += 1
        out += Tok("ident", start, i)
      } else {
        punct.find(p => src.startsWith(p, i)) match {
          case Some(p) => out += Tok(p, i, i + p.length); i += p.length
          case None => err(s"unexpected character '$c'")
        }
      }
    }
    out += Tok("eof", n, n)
    out.toIndexedSeq
  }

  /** Strip `src` (TypeScript) to plain JavaScript of IDENTICAL length
    * and line structure.
    */
  def strip(src: String): String = {
    val toks = lex(src)
    val chars = src.toCharArray
    def blank(from: Int, until: Int): Unit = {
      var i = from
      while (i < until) {
        if (chars(i) != '\n' && chars(i) != '\r') chars(i) = ' '
        i += 1
      }
    }
    def blankTok(t: Tok): Unit = blank(t.start, t.end)

    def text(idx: Int): String = toks(idx).text(src)
    def kind(idx: Int): String = toks(idx).kind
    def isIdent(idx: Int, w: String): Boolean =
      kind(idx) == "ident" && text(idx) == w

    /** Token kinds that END an expression — what must precede a postfix
      * `!`, an `as` cast, or a call-site generic.
      */
    def endsExpr(t: Tok): Boolean = t.kind match {
      case "ident" | "num" | "str" | "template" | ")" | "]" | "}" => true
      case _ => false
    }

    /** Scan a type expression starting at `from`; returns the index of
      * the first token AFTER the type. `stop` lists depth-0 token kinds
      * that terminate the type (checked only at zero bracket/angle
      * depth). Inside brackets/angles everything type-like is allowed.
      */
    def scanType(from: Int, stop: Set[String]): Int = {
      var i = from
      var paren = 0; var brack = 0; var brace = 0; var angle = 0
      var consumed = 0
      def depth0 = paren == 0 && brack == 0 && brace == 0 && angle == 0
      var done = false
      while (!done) {
        val k = kind(i)
        if (k == "eof") {
          if (consumed == 0)
            throw new TsStripError(
              s"expected a type at offset ${toks(from).start}")
          done = true
        } else if (depth0 && consumed > 0 && stop(k)) done = true
        else {
          k match {
            case "(" => paren += 1
            case ")" =>
              if (paren == 0) done = true else paren -= 1
            case "[" => brack += 1
            case "]" =>
              if (brack == 0) done = true else brack -= 1
            case "{" => brace += 1
            case "}" =>
              if (brace == 0) done = true else brace -= 1
            case "<" => angle += 1
            case ">" =>
              if (angle == 0) done = true else angle -= 1
            case _ => ()
          }
          if (!done) { consumed += 1; i += 1 }
        }
      }
      if (consumed == 0)
        throw new TsStripError(
          s"expected a type at offset ${toks(from).start}")
      i
    }

    /** Try to scan `<…>` as a type-argument/parameter list starting at
      * the `<` at `from`. Returns Some(indexAfterClosingAngle) when the
      * interior is type-like and balances; None → treat as less-than.
      */
    val typeArgAllowed: Set[String] = Set("ident", "str", "num", ",", ".",
      "<", ">", "[", "]", "(", ")", "{", "}", "|", "&", "=>", ":", "?",
      "...", "extends", "=")
    def tryAngles(from: Int): Option[Int] = {
      var i = from + 1
      var angle = 1
      while (angle > 0) {
        val k = kind(i)
        if (k == "eof" || !typeArgAllowed(k)) return None
        if (k == "<") angle += 1
        if (k == ">") angle -= 1
        i += 1
      }
      Some(i)
    }

    /** Blank a `: Type` annotation at `idx` (the colon). Returns the
      * index after the type.
      */
    def blankAnnotation(idx: Int, stop: Set[String]): Int = {
      val end = scanType(idx + 1, stop)
      blank(toks(idx).start, toks(end - 1).end)
      end
    }

    // bracket-context stack: what the innermost `(`/`{`/`[` means
    sealed trait Ctx
    case object ParamList extends Ctx
    case object ClassBody extends Ctx
    case object Other extends Ctx
    val stack = mutable.ArrayBuffer.empty[(String, Ctx)] // (bracket, ctx)
    def innermost: Ctx =
      stack.lastOption.map(_._2).getOrElse(Other)

    // pending ternary `?`s per stack depth — a `:` that matches an open
    // ternary is NEVER an annotation
    val ternary = mutable.ArrayBuffer[Int](0)

    var lastKept: Tok = Tok("", 0, 0) // sentinel: statement position
    def atStatementPos: Boolean = lastKept.kind match {
      case "" | ";" | "{" | "}" => true
      case _ => false
    }

    // declarator flags: a `let/const/var` statement is live until its
    // `;`, and annotations only fire at the SAME bracket depth it
    // started at (colons inside initializer object literals/parens are
    // at deeper depths and never match)
    var inDeclarator = false
    var declDepth = -1
    var pendingParams = false // a `(` opening next is a parameter list
    var pendingClassBrace = false // a `{` opening next is a class body

    def isImportListTypeSpecifier(i: Int): Boolean =
      isIdent(i, "type") && kind(i + 1) == "ident" &&
        (kind(i + 2) == "," || kind(i + 2) == "}" ||
          (isIdent(i + 2, "as") && kind(i + 3) == "ident" &&
            (kind(i + 4) == "," || kind(i + 4) == "}")))

    var i = 0
    var importBraceDepth = -1 // stack depth of an import/export brace list

    while (kind(i) != "eof") {
      val t = toks(i)
      val k = t.kind

      // ---- statement-level type-only declarations -------------------
      if (atStatementPos && (isIdent(i, "interface") ||
          (isIdent(i, "export") && isIdent(i + 1, "interface")))) {
        // blank `export? interface X (extends …)? { … }` entirely
        var j = i
        while (!(kind(j) == "{")) {
          if (kind(j) == "eof")
            throw new TsStripError(
              s"interface at offset ${t.start} has no body")
          j += 1
        }
        var depth = 0
        var done = false
        while (!done) {
          if (kind(j) == "{") depth += 1
          if (kind(j) == "}") { depth -= 1; if (depth == 0) done = true }
          if (kind(j) == "eof")
            throw new TsStripError(
              s"unterminated interface body at offset ${t.start}")
          j += 1
        }
        blank(t.start, toks(j - 1).end)
        i = j
      } else if (atStatementPos && (isIdent(i, "type") ||
          (isIdent(i, "export") && isIdent(i + 1, "type"))) && {
            val nameAt = if (isIdent(i, "type")) i + 1 else i + 2
            kind(nameAt) == "ident" &&
              (kind(nameAt + 1) == "=" || kind(nameAt + 1) == "<")
          }) {
        // `export? type X (<…>)? = T ;` — the `;` is required (loud)
        var j = if (isIdent(i, "type")) i + 2 else i + 3
        if (kind(j) == "<") j = tryAngles(j).getOrElse(
          throw new TsStripError(
            s"unparsable type parameters at offset ${toks(j).start}"))
        if (kind(j) != "=")
          throw new TsStripError(
            s"expected '=' in type alias at offset ${toks(j).start}")
        j = scanType(j + 1, Set(";"))
        if (kind(j) != ";")
          throw new TsStripError(
            s"type alias at offset ${t.start} must end with ';' " +
              "(TsStrip subset)")
        blank(t.start, toks(j).end)
        i = j + 1
      } else if (atStatementPos && isIdent(i, "declare")) {
        var j = i
        while (kind(j) != ";") {
          if (kind(j) == "eof")
            throw new TsStripError(
              s"declare statement at offset ${t.start} must end with ';' " +
                "(TsStrip subset)")
          j += 1
        }
        blank(t.start, toks(j).end)
        i = j + 1
      } else if (atStatementPos && isIdent(i, "import") &&
          isIdent(i + 1, "type")) {
        // type-only import: blank through the module specifier + `;`
        var j = i
        while (kind(j) != "str") {
          if (kind(j) == "eof" || kind(j) == ";")
            throw new TsStripError(
              s"import type at offset ${t.start} has no module specifier")
          j += 1
        }
        if (kind(j + 1) == ";") j += 1
        blank(t.start, toks(j).end)
        i = j + 1
      } else if (atStatementPos && isIdent(i, "export") &&
          isIdent(i + 1, "type") && kind(i + 2) == "{") {
        var j = i + 2
        while (kind(j) != "}") {
          if (kind(j) == "eof")
            throw new TsStripError(
              s"unterminated export type list at offset ${t.start}")
          j += 1
        }
        if (kind(j + 1) == "str") j += 1 // `from 'x'` — str token
        else if (isIdent(j + 1, "from") && kind(j + 2) == "str") j += 2
        if (kind(j + 1) == ";") j += 1
        blank(t.start, toks(j).end)
        i = j + 1
      } else if (atStatementPos &&
          (isIdent(i, "enum") || (isIdent(i, "const") && isIdent(i + 1, "enum")) ||
            (isIdent(i, "export") && (isIdent(i + 1, "enum") ||
              (isIdent(i + 1, "const") && isIdent(i + 2, "enum")))))) {
        throw new TsStripError(
          s"enum at offset ${t.start}: enums emit VALUES and cannot be " +
            "type-erased — write a frozen object literal " +
            "(const E = Object.freeze({A: 0, B: 1}))")
      } else if (atStatementPos && (isIdent(i, "namespace") ||
          (isIdent(i, "export") && isIdent(i + 1, "namespace")))) {
        throw new TsStripError(
          s"namespace at offset ${t.start}: namespaces emit values and " +
            "are outside the TsStrip subset — use ES modules")
      } else if (isIdent(i, "abstract")) {
        throw new TsStripError(
          s"abstract at offset ${t.start} is outside the TsStrip subset")

      // ---- class headers -------------------------------------------
      } else if (isIdent(i, "class")) {
        lastKept = t
        i += 1
        if (kind(i) == "ident") { lastKept = toks(i); i += 1 }
        if (kind(i) == "<") {
          val after = tryAngles(i).getOrElse(throw new TsStripError(
            s"unparsable class type parameters at offset ${toks(i).start}"))
          blank(toks(i).start, toks(after - 1).end)
          i = after
        }
        if (isIdent(i, "extends")) {
          lastKept = toks(i); i += 1
          // base expression: Ident(.Ident)* — keep; type args — blank
          if (kind(i) != "ident")
            throw new TsStripError(
              s"expected a base-class name at offset ${toks(i).start} " +
                "(TsStrip subset: extends Ident(.Ident)*)")
          lastKept = toks(i); i += 1
          while (kind(i) == "." && kind(i + 1) == "ident") {
            lastKept = toks(i + 1); i += 2
          }
          if (kind(i) == "<") {
            val after = tryAngles(i).getOrElse(throw new TsStripError(
              s"unparsable extends type arguments at offset ${toks(i).start}"))
            blank(toks(i).start, toks(after - 1).end)
            i = after
          }
        }
        if (isIdent(i, "implements")) {
          var j = i
          while (kind(j) != "{") {
            if (kind(j) == "eof")
              throw new TsStripError(
                s"implements clause at offset ${toks(i).start} has no " +
                  "class body")
            j += 1
          }
          blank(toks(i).start, toks(j - 1).end)
          i = j
        }
        pendingClassBrace = true

      // ---- brackets with context -----------------------------------
      } else if (k == "(") {
        val isParams = pendingParams || {
          // arrow lookahead: balanced `)` then `=>` or `: Type =>`
          var j = i + 1
          var depth = 1
          var ok = true
          while (depth > 0 && ok) {
            kind(j) match {
              case "(" => depth += 1
              case ")" => depth -= 1
              case "eof" => ok = false
              case _ => ()
            }
            if (depth > 0) j += 1
          }
          ok && {
            if (kind(j + 1) == "=>") true
            else if (kind(j + 1) == ":") {
              try { kind(scanType(j + 2, Set("=>", ";", ",", ")"))) == "=>" }
              catch { case _: TsStripError => false }
            } else false
          }
        }
        pendingParams = false
        stack += (("(", if (isParams) ParamList else Other))
        ternary += 0
        lastKept = t
        i += 1
      } else if (k == "{") {
        stack += (("{",
          if (pendingClassBrace) ClassBody else Other))
        pendingClassBrace = false
        ternary += 0
        lastKept = t
        i += 1
      } else if (k == "[") {
        stack += (("[", Other))
        ternary += 0
        lastKept = t
        i += 1
      } else if (k == ")" || k == "}" || k == "]") {
        val wasParams = k == ")" && innermost == ParamList
        if (stack.nonEmpty) stack.remove(stack.length - 1)
        if (ternary.length > 1) ternary.remove(ternary.length - 1)
        if (wasParams) {
          // optional return annotation: `): T {` / `): T =>`
          if (kind(i + 1) == ":") {
            // scanType consumes a leading `{` as an object type (depth
            // rule: stops are only checked once something is consumed),
            // so `: {a: X} | Y {` and `: T {` both terminate correctly
            val end = scanType(i + 2,
              Set("{", "=>", ";", ",", ")", "]", "}", "="))
            blank(toks(i + 1).start, toks(end - 1).end)
            lastKept = t
            i = end
          } else {
            lastKept = t
            i += 1
          }
        } else {
          lastKept = t
          i += 1
        }
        if (k == "}" && importBraceDepth == stack.length + 1)
          importBraceDepth = -1

      // ---- function/method heads -----------------------------------
      } else if (isIdent(i, "function")) {
        lastKept = t
        i += 1
        if (kind(i) == "*") { lastKept = toks(i); i += 1 }
        if (kind(i) == "ident") { lastKept = toks(i); i += 1 }
        if (kind(i) == "<") {
          val after = tryAngles(i).getOrElse(throw new TsStripError(
            s"unparsable function type parameters at offset ${toks(i).start}"))
          blank(toks(i).start, toks(after - 1).end)
          i = after
        }
        pendingParams = true

      // ---- import/export value lists (inline `type` specifiers) ----
      } else if (atStatementPos &&
          (isIdent(i, "import") || isIdent(i, "export")) &&
          (kind(i + 1) == "{" ||
            (kind(i + 1) == "ident" && kind(i + 2) == ","))) {
        importBraceDepth = stack.length + 1
        lastKept = t
        i += 1
      } else if (importBraceDepth == stack.length && stack.nonEmpty &&
          stack.last._1 == "{" && isImportListTypeSpecifier(i)) {
        var j = i + 2
        if (isIdent(j, "as")) j += 2
        if (kind(j) == ",") j += 1 // take the trailing comma too
        blank(t.start, toks(j - 1).end)
        i = j

      // ---- class members -------------------------------------------
      } else if (innermost == ClassBody && isIdent(i, "readonly") &&
          kind(i + 1) == "ident") {
        blankTok(t)
        i += 1
      } else if (innermost == ClassBody && kind(i) == "ident" &&
          (kind(i + 1) == "(" || kind(i + 1) == "<")) {
        // method name (possibly generic)
        lastKept = t
        i += 1
        if (kind(i) == "<") {
          val after = tryAngles(i).getOrElse(throw new TsStripError(
            s"unparsable method type parameters at offset ${toks(i).start}"))
          blank(toks(i).start, toks(after - 1).end)
          i = after
        }
        pendingParams = kind(i) == "("
      } else if (innermost == ClassBody && kind(i) == "ident" &&
          (kind(i + 1) == ":" ||
            ((kind(i + 1) == "!" || kind(i + 1) == "?") &&
              kind(i + 2) == ":"))) {
        // annotated class field. Without an initializer it is TYPE-ONLY
        // (classic TS emit drops it — swc's default in the reference
        // loader) and erases entirely; with an initializer it would
        // emit a VALUE field, which the JsMini class subset (methods
        // only) cannot represent — loud.
        val nameTok = t
        i += 1
        if (kind(i) == "!" || kind(i) == "?") { blankTok(toks(i)); i += 1 }
        i = blankAnnotation(i, Set("=", ";", "}"))
        if (kind(i) == ";") {
          blankTok(nameTok)
          blankTok(toks(i))
          lastKept = toks(i)
          i += 1
        } else if (kind(i) == "}") {
          blankTok(nameTok)
          lastKept = nameTok
        } else throw new TsStripError(
          s"class field '${nameTok.text(src)}' at offset ${nameTok.start} " +
            "has an initializer — value fields are outside the JsMini " +
            "class subset (methods only); assign in the constructor")

      // ---- parameter-list interior ---------------------------------
      } else if (innermost == ParamList && kind(i) == "ident" &&
          Set("public", "private", "protected", "readonly")(text(i)) &&
          kind(i + 1) == "ident") {
        throw new TsStripError(
          s"parameter property '${text(i)}' at offset ${t.start}: it " +
            "declares AND assigns a class field — erasure would change " +
            "behavior; declare the field and assign in the constructor body")
      } else if (innermost == ParamList && k == "?" &&
          (kind(i + 1) == ":" || kind(i + 1) == "," || kind(i + 1) == ")") &&
          ternary.last == 0) {
        blankTok(t) // optional parameter marker
        i += 1
      } else if (innermost == ParamList && k == ":" && ternary.last == 0) {
        i = blankAnnotation(i, Set(",", ")", "="))

      // ---- declarators ---------------------------------------------
      } else if (kind(i) == "ident" &&
          Set("let", "const", "var")(text(i)) && kind(i + 1) == "ident") {
        inDeclarator = true
        declDepth = stack.length
        lastKept = t
        i += 1
      } else if (inDeclarator && stack.length == declDepth && k == ":" &&
          ternary.last == 0) {
        i = blankAnnotation(i, Set("=", ";", ","))
      } else if (inDeclarator && stack.length == declDepth && k == "!" &&
          kind(i + 1) == ":") {
        blankTok(t) // definite-assignment assertion
        i += 1

      // ---- expression-level TS -------------------------------------
      } else if (isIdent(i, "as") && endsExpr(lastKept)) {
        val end = scanType(i + 1,
          Set(",", ";", ")", "]", "}", "=", "?", "+", "-", "*", "/", "%",
            "==", "===", "!=", "!==", "<=", ">=", "&&", "||", "??", "."))
        blank(t.start, toks(end - 1).end)
        i = end
      } else if (k == "!" && endsExpr(lastKept) &&
          Set(".", "(", "[", ")", "]", ",", ";", "}")(kind(i + 1))) {
        blankTok(t) // non-null assertion
        i += 1
      } else if (k == "<" && lastKept.kind == "ident") {
        tryAngles(i) match {
          case Some(after) if kind(after) == "(" =>
            blank(t.start, toks(after - 1).end) // call-site type args
            i = after
          case _ =>
            lastKept = t
            i += 1
        }

      // ---- ternary bookkeeping + default ---------------------------
      } else if (k == "?") {
        // conditional operator (the optional-param case was handled
        // above); its `:` must not be taken for an annotation
        ternary(ternary.length - 1) += 1
        lastKept = t
        i += 1
      } else if (k == ":" && ternary.last > 0) {
        ternary(ternary.length - 1) -= 1
        lastKept = t
        i += 1
      } else {
        if (k == ";" && stack.length <= declDepth) inDeclarator = false
        lastKept = t
        i += 1
      }
    }
    new String(chars)
  }
}
