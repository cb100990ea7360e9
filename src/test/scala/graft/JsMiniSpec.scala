package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JsMini
import graft.functions.JsMini._

/** The ES-subset interpreter behind JavaScript UDFs (reference
  * dozer-sql/expression/src/javascript/ + dozer-deno runtime). The first
  * two cases are the reference's own test modules, verbatim
  * (dozer-deno/src/runtime/square.js, exception.js).
  */
class JsMiniSpec extends AnyFunSuite {

  private def run(src: String, arg: V): V = JsMini.load(src).callDefault(arg)

  test("reference square.js module verbatim") {
    val m = "export default function (input) {\n    return input * input;\n}"
    assert(run(m, VNum(7)) == VNum(49))
  }

  test("reference exception.js module verbatim") {
    val m = "export default function () {\n    throw new Error(\"exception from javascript\");\n}"
    val e = intercept[JsError] { run(m, VNull) }
    assert(e.getMessage.contains("exception from javascript"))
  }

  test("module has no default export → load error") {
    intercept[JsSyntaxError] {
      JsMini.load("function f(x) { return x }").defaultExport
    }
  }

  test("template literals: interpolation, nesting, escapes, multiline, " +
      "display coercion") {
    val m =
      """export default function (x) {
        |  const who = "world";
        |  const n = 2;
        |  const a = `hello ${who}!`;
        |  const b = `${n} + ${n} = ${n + n}`;
        |  const c = `outer ${`inner ${who}`} done`;
        |  const d = `esc \` \${not} \n${"q"}`;
        |  const e = `obj ${ {k: 1}.k } arr ${[1,2][1]} null ${null}`;
        |  const f = `line1
        |line2`;
        |  return a + "|" + b + "|" + c + "|" + d + "|" + e + "|" + f;
        |}""".stripMargin
    val got = run(m, VNull).asInstanceOf[VStr].v
    assert(got ==
      "hello world!|2 + 2 = 4|outer inner world done|esc ` ${not} \nq|" +
        "obj 1 arr 2 null null|line1\nline2")
  }

  test("template literals: arbitrary-depth nesting with interpolation at " +
      "every level; unterminated nesting is a loud syntax error") {
    // Three levels deep, each level interpolating — the lexer's boundary
    // scan recurses, then sub-parsing re-lexes each inner template.
    val m =
      """export default function (x) {
        |  const w = "w";
        |  return `L1 ${`L2 ${`L3 ${w}${"`"}`} ${w}`} end`;
        |}""".stripMargin
    assert(run(m, VNull) == VStr("L1 L2 L3 w` w end"))
    // Level-2 template left unterminated inside level-1's ${…}
    intercept[JsSyntaxError] {
      JsMini.parse("const a = `one ${`two ${x} ` ;")
    }
    // Unterminated ${ inside a nested template
    intercept[JsSyntaxError] {
      JsMini.parse("const a = `one ${`two ${x`}`;")
    }
    // Re-lex-path diagnostics are MODULE-relative: a bad expression
    // inside an interpolation reports the offset in the source the user
    // wrote, not an offset into the extracted template body
    val src = "const pad = 12345; const a = `ab${1 +}cd`;"
    val e = intercept[JsSyntaxError] { JsMini.parse(src) }
    assert(e.getMessage.contains(s"module offset ${src.indexOf("1 +")}"),
      e.getMessage)
  }

  test("spread in array literals and calls; array/object destructuring " +
      "with defaults, holes, aliases, and rest") {
    val m =
      """export default function (x) {
        |  const a = [1, 2];
        |  const b = [0, ...a, 3];                 // [0,1,2,3]
        |  const sum = Math.max(...b);             // 3
        |  const [p, , q = 9, ...tail] = b;        // p=0 q=2 tail=[3]
        |  const [u = 7] = [];                     // default on undefined
        |  const obj = {x: 1, y: {z: 5}, w: 4};
        |  const {x: alias, y: {z}, missing = 8, ...rest} = obj;
        |  const chars = [..."ab"];                // string spread
        |  return [b.length, sum, p, q, tail[0], u,
        |          alias, z, missing, rest.w, chars[1]];
        |}""".stripMargin
    val got = run(m, VNull).asInstanceOf[VArr].items.toSeq
    assert(got == Seq(VNum(4), VNum(3), VNum(0), VNum(2), VNum(3), VNum(7),
      VNum(1), VNum(5), VNum(8), VNum(4), VStr("b")))
  }

  test("destructuring errors are loud: non-iterable array pattern, " +
      "non-object object pattern, rest not last") {
    intercept[JsError] { run(
      "export default function () { const [a] = 5; return a; }", VNull) }
    intercept[JsError] { run(
      "export default function () { const {a} = null; return a; }", VNull) }
    intercept[JsSyntaxError] { JsMini.parse(
      "const [...r, a] = [1, 2];") }
  }

  test("objects, arrays, methods, control flow") {
    val m =
      """function clean(s) { return s.trim().toLowerCase(); }
        |export default function (doc) {
        |  let words = clean(doc.text).split(" ").filter(w => w.length > 0);
        |  let counts = {};
        |  for (let w of words) {
        |    counts[w] = (counts[w] || 0) + 1;
        |  }
        |  let top = "";
        |  let best = 0;
        |  for (let w of Object.keys(counts)) {
        |    if (counts[w] > best) { best = counts[w]; top = w; }
        |  }
        |  return { n: words.length, top: top, best: best };
        |}""".stripMargin
    val out = run(m, obj("text" -> VStr("  The cat the DOG the bird "))).asInstanceOf[VObj]
    assert(out.fields("n") == VNum(6))
    assert(out.fields("top") == VStr("the"))
    assert(out.fields("best") == VNum(3))
  }

  test("arithmetic, ternary, logical, template of ops") {
    val m =
      """export default function (x) {
        |  let a = x % 5;
        |  let b = x > 10 ? "big" : "small";
        |  let c = (x > 0 && x < 100) || x === -1;
        |  return [a, b, c, x ** 2, -x, !c, typeof x, typeof b];
        |}""".stripMargin
    val out = run(m, VNum(12)).asInstanceOf[VArr]
    assert(out.items.toSeq == Seq(VNum(2), VStr("big"), VBool(true),
      VNum(144), VNum(-12), VBool(false), VStr("number"), VStr("string")))
  }

  test("classic for, while, break/continue, compound assignment") {
    val m =
      """export default function (n) {
        |  let sum = 0;
        |  for (let i = 0; i < n; i++) {
        |    if (i % 2 === 0) continue;
        |    if (i > 20) break;
        |    sum += i;
        |  }
        |  let j = 0;
        |  while (j < 3) { sum *= 2; j++; }
        |  return sum;
        |}""".stripMargin
    // odd i in [0,n) capped at 20: 1+3+...; n=10 → 1+3+5+7+9=25; 25*8=200
    assert(run(m, VNum(10)) == VNum(200))
  }

  test("closures and higher-order functions") {
    val m =
      """function mkAdder(k) { return function (x) { return x + k; }; }
        |export default function (arr) {
        |  const add10 = mkAdder(10);
        |  return arr.map(add10).reduce((a, b) => a + b, 0);
        |}""".stripMargin
    assert(run(m, arr(VNum(1), VNum(2), VNum(3))) == VNum(36))
  }

  test("default parameters: functions, arrows, methods; explicit " +
      "undefined takes the default; earlier params are in scope; " +
      "`(a = 1)` alone stays an assignment expression") {
    val m =
      """function f(a, b = a + 1, c = 2) { return a + b + c; }
        |const g = (x = 5, y = x * 2) => x + y;
        |class K {
        |  constructor(n = 3) { this.n = n; }
        |  bump(by = 10) { return this.n + by; }
        |}
        |export default function (arg) {
        |  let a = 0;
        |  const paren = (a = 9); // assignment, NOT an arrow param list
        |  const viaUndef = f(1, undefined, undefined);
        |  return [f(1), g(), new K().bump(), new K(7).bump(1),
        |    viaUndef, paren, a, f(arg, 100)];
        |}""".stripMargin
    val got = run(m, VNum(4)) match {
      case a: graft.functions.JsMini.VArr => a.items.toSeq
      case other => fail(s"expected array, got $other")
    }
    assert(got == Seq(VNum(5), VNum(15), VNum(13), VNum(8),
      VNum(5), VNum(9), VNum(9), VNum(106)))
  }

  test("string prototype surface") {
    val m =
      """export default function (s) {
        |  return {
        |    up: s.toUpperCase(),
        |    head: s.slice(0, 3),
        |    tail: s.slice(-3),
        |    mid: s.substring(2, 5),
        |    idx: s.indexOf("lo"),
        |    has: s.includes("ell"),
        |    rep: s.replace("l", "L"),
        |    repAll: s.replaceAll("l", "L"),
        |    code: s.charCodeAt(0)
        |  };
        |}""".stripMargin
    val out = run(m, VStr("hello")).asInstanceOf[VObj]
    assert(out.fields("up") == VStr("HELLO"))
    assert(out.fields("head") == VStr("hel"))
    assert(out.fields("tail") == VStr("llo"))
    assert(out.fields("mid") == VStr("llo"))
    assert(out.fields("idx") == VNum(3))
    assert(out.fields("has") == VBool(true))
    assert(out.fields("rep") == VStr("heLlo"))
    assert(out.fields("repAll") == VStr("heLLo"))
    assert(out.fields("code") == VNum(104))
  }

  test("array prototype surface") {
    val m =
      """export default function (a) {
        |  return {
        |    sorted: a.slice().sort((x, y) => x - y),
        |    sum: a.reduce((s, x) => s + x),
        |    even: a.filter(x => x % 2 === 0),
        |    joined: a.join("-"),
        |    has3: a.includes(3),
        |    some: a.some(x => x > 8),
        |    every: a.every(x => x > 0),
        |    flat: [[1, 2], [3]].flat()
        |  };
        |}""".stripMargin
    val out = run(m, arr(VNum(5), VNum(3), VNum(8), VNum(2))).asInstanceOf[VObj]
    assert(out.fields("sorted").asInstanceOf[VArr].items.toSeq ==
      Seq(VNum(2), VNum(3), VNum(5), VNum(8)))
    assert(out.fields("sum") == VNum(18))
    assert(out.fields("even").asInstanceOf[VArr].items.toSeq == Seq(VNum(8), VNum(2)))
    assert(out.fields("joined") == VStr("5-3-8-2"))
    assert(out.fields("has3") == VBool(true))
    assert(out.fields("some") == VBool(false))
    assert(out.fields("every") == VBool(true))
    assert(out.fields("flat").asInstanceOf[VArr].items.toSeq ==
      Seq(VNum(1), VNum(2), VNum(3)))
  }

  test("Math / JSON / parseInt globals") {
    val m =
      """export default function (x) {
        |  const s = JSON.stringify({ a: x, b: [1.5, true, null], c: "q\"z" });
        |  const back = JSON.parse(s);
        |  return {
        |    floor: Math.floor(x), round: Math.round(x), abs: Math.abs(-x),
        |    mx: Math.max(1, x, 3), pw: Math.pow(2, 10),
        |    pi: parseInt("42px"), pf: parseFloat("3.5rest"),
        |    json: s, a: back.a, b1: back.b[0]
        |  };
        |}""".stripMargin
    val out = run(m, VNum(7.6)).asInstanceOf[VObj]
    assert(out.fields("floor") == VNum(7))
    assert(out.fields("round") == VNum(8))
    assert(out.fields("abs") == VNum(7.6))
    assert(out.fields("mx") == VNum(7.6))
    assert(out.fields("pw") == VNum(1024))
    assert(out.fields("pi") == VNum(42))
    assert(out.fields("pf") == VNum(3.5))
    assert(out.fields("json") == VStr("""{"a":7.6,"b":[1.5,true,null],"c":"q\"z"}"""))
    assert(out.fields("a") == VNum(7.6))
    assert(out.fields("b1") == VNum(1.5))
  }

  test("try/catch/finally and throw of values") {
    val m =
      """export default function (x) {
        |  let log = [];
        |  try {
        |    if (x > 5) throw { code: 42 };
        |    log.push("no-throw");
        |  } catch (e) {
        |    log.push(e.code);
        |  } finally {
        |    log.push("fin");
        |  }
        |  return log;
        |}""".stripMargin
    assert(run(m, VNum(9)).asInstanceOf[VArr].items.toSeq == Seq(VNum(42), VStr("fin")))
    assert(run(m, VNum(1)).asInstanceOf[VArr].items.toSeq == Seq(VStr("no-throw"), VStr("fin")))
  }

  test("JS number formatting: integers print without decimal point") {
    assert(stringify(VNum(3.0)) == "3")
    assert(stringify(VNum(3.25)) == "3.25")
    assert(stringify(VNum(1e9)) == "1000000000")
    assert(toDisplay(VNum(-0.0)) == "0")
  }

  test("equality semantics: strict vs loose") {
    val m =
      """export default function (x) {
        |  return [x == "7", x === 7, null == undefined, null === undefined,
        |          "" == 0, "" === 0];
        |}""".stripMargin
    assert(run(m, VNum(7)).asInstanceOf[VArr].items.toSeq ==
      Seq(VBool(true), VBool(true), VBool(true), VBool(false),
        VBool(true), VBool(false)))
  }

  test("undefined access raises like JS") {
    val e = intercept[JsError] {
      run("export default function (o) { return o.a.b; }", obj("x" -> VNum(1)))
    }
    assert(e.getMessage.contains("of undefined"))
  }

  test("execution budget: while(true) in a UDF fails fast, loudly") {
    val t0 = System.nanoTime()
    val e = intercept[JsMini.BudgetExceeded] {
      run("export default function () { while (true) {} }", VNull)
    }
    assert(e.getMessage.contains("budget exceeded"))
    assert((System.nanoTime() - t0) / 1e9 < 60, "budget trip took too long")
    // the thread is not poisoned: the next call gets a fresh budget
    assert(run("export default function (x) { return x + 1; }", VNum(1)) == VNum(2))
  }

  test("execution budget: infinite top-level module load fails fast") {
    intercept[JsMini.BudgetExceeded] {
      JsMini.load("let i = 0; while (true) { i = i + 1; }")
    }
  }

  test("execution budget: callbacks do not refresh the loop's fuel") {
    intercept[JsMini.BudgetExceeded] {
      run(
        """export default function () {
          |  while (true) { [1, 2, 3].map(function (x) { return x; }); }
          |}""".stripMargin, VNull)
    }
  }

  test("execution budget: legitimate heavy-but-finite work completes") {
    val m =
      """export default function (n) {
        |  let s = 0;
        |  for (let i = 0; i < n; i = i + 1) { s = s + i; }
        |  return s;
        |}""".stripMargin
    assert(run(m, VNum(100000)) == VNum(4999950000.0))
  }

  test("classes: constructor/this, methods, extends + super chain, " +
      "statics, implicit subclass constructor, arrow lexical this") {
    val m =
      """class Counter {
        |  constructor(start) { this.n = start }
        |  inc(by) { this.n = this.n + by; return this.n }
        |  get() { return this.n }
        |  static of(x) { return new Counter(x) }
        |}
        |class Double extends Counter {
        |  constructor(start) { super(start) }
        |  inc(by) { return super.inc(by * 2) }
        |  describe() {
        |    const f = () => this.get();
        |    return `n=${f()}`;
        |  }
        |}
        |class Triple extends Double {}
        |export default function (x) {
        |  const c = Counter.of(10);
        |  c.inc(5);
        |  const d = new Double(1);
        |  d.inc(3);
        |  const t = new Triple(2);
        |  t.inc(1);
        |  return {
        |    base: c.get(), dbl: d.get(), txt: d.describe(),
        |    tri: t.get(), stat: Triple.of(4).get(),
        |    kind: typeof Counter, nm: Counter.name
        |  };
        |}""".stripMargin
    val o = run(m, VNull).asInstanceOf[VObj]
    assert(o.fields("base") == VNum(15))
    assert(o.fields("dbl") == VNum(7))     // super.inc doubled 3
    assert(o.fields("txt") == VStr("n=7")) // arrow saw the instance
    assert(o.fields("tri") == VNum(4))     // implicit ctor forwarded 2
    assert(o.fields("stat") == VNum(4))    // static inherited down 2 levels
    assert(o.fields("kind") == VStr("function"))
    assert(o.fields("nm") == VStr("Counter"))
    // instances JSON-serialize as data only (methods never leak)
    assert(JsMini.stringify(run(
      "class P { constructor(x) { this.x = x } m() {} }\n" +
        "export default function (v) { return new P(3) }", VNull)) ==
      """{"x":3}""")
    // super outside a subclass constructor is a loud error
    intercept[JsError] {
      run("export default function (v) { super(1); }", VNull)
    }
    // extending a non-class is a loud error
    intercept[JsError] {
      run("const B = 5;\nclass A extends B {}\n" +
        "export default function (v) { return 0 }", VNull)
    }
  }

  test("tagged templates: cooked strings array + one arg per " +
      "interpolation, empty-chunk padding, expression tags") {
    val m =
      """function tag(strings, a, b) {
        |  return strings.join('|') + '#' + a + '#' + b;
        |}
        |const tags = { t: tag };
        |export default function (x) {
        |  const plain = tag`one ${1 + 1} two ${'z'} three`;
        |  const edges = tag`${x}${x}`;
        |  const viaMember = tags.t`a${x}b`;
        |  return [plain, edges, viaMember];
        |}""".stripMargin
    val got = run(m, VNum(9)).asInstanceOf[VArr].items
    assert(got(0) == VStr("one | two | three#2#z"))
    assert(got(1) == VStr("||#9#9")) // 3 empty cooked chunks, 2 args
    assert(got(2) == VStr("a|b#9#undefined"))
  }

  test("generators (eager subset): function*, yield/yield*, for-of, " +
      "spread, next() protocol, closure capture, budget guard on " +
      "infinite bodies, yield is a plain identifier elsewhere") {
    val m =
      """function* range(n) {
        |  for (let i = 0; i < n; i++) yield i * 10;
        |}
        |function* both(n) {
        |  yield -1;
        |  yield* range(n);      // delegation
        |  yield* [100, 200];    // array delegation
        |}
        |export default function (n) {
        |  let sum = 0;
        |  for (const v of range(n)) sum += v;
        |  const spreadOut = [...both(2)];
        |  const g = range(2);
        |  const a = g.next(); const b = g.next(); const c = g.next();
        |  return { sum: sum, s: spreadOut,
        |           n1: a.value, n2: b.value, d2: b.done, d3: c.done };
        |}""".stripMargin
    val o = run(m, VNum(4)).asInstanceOf[VObj]
    assert(o.fields("sum") == VNum(60)) // 0+10+20+30
    assert(o.fields("s").asInstanceOf[VArr].items.toSeq ==
      Seq(VNum(-1), VNum(0), VNum(10), VNum(100), VNum(200)))
    assert(o.fields("n1") == VNum(0) && o.fields("n2") == VNum(10))
    assert(o.fields("d2") == VBool(false) && o.fields("d3") == VBool(true))
    // generator closes over outer state like any function
    assert(run(
      """let base = 5;
        |function* g() { yield base; base = base + 1; yield base; }
        |export default function (v) { return [...g()]; }""".stripMargin,
      VNull).asInstanceOf[VArr].items.toSeq == Seq(VNum(5), VNum(6)))
    // an INFINITE generator raises the fuel budget loudly (the eager
    // subset's documented behavior) instead of hanging
    intercept[JsMini.BudgetExceeded] {
      run(
        """function* forever() { while (true) yield 1; }
          |export default function (v) { return forever().next(); }""".stripMargin,
        VNull)
    }
    // outside generator bodies, yield stays an ordinary identifier
    assert(run(
      "export default function (v) { const yield = 3; return yield + 1; }",
      VNull) == VNum(4))
    // arrows inside a generator cannot yield across the boundary:
    // the arrow body parses yield as an identifier -> undefined var
    intercept[JsError] {
      run(
        """function* g() { const f = () => yield 1; f(); }
          |export default function (v) { return [...g()]; }""".stripMargin,
        VNull)
    }
  }

  test("Map/Set: construction from iterables, SameValueZero-style keys, " +
      "size, iteration/spread, reference identity for object keys") {
    val m =
      """export default function (x) {
        |  const m = new Map([["a", 1], ["b", 2]]);
        |  m.set("a", 10).set(3, "three");
        |  m.delete("b");
        |  const keyObj = {id: 1};
        |  m.set(keyObj, "obj");
        |  const entries = [...m].map(e => `${e[0]}=${e[1]}`).join(",");
        |  const s = new Set([1, 2, 2, 3]);
        |  s.add(2); s.add(4); s.delete(3);
        |  let total = 0;
        |  for (const v of s) total += v;
        |  const fromGen = new Set((function* () { yield 7; yield 7; })());
        |  return {
        |    mSize: m.size, got: m.get("a"), miss: m.get("zz"),
        |    hasNum: m.has(3), entries: entries,
        |    objHit: m.get(keyObj), objMiss: m.get({id: 1}),
        |    sSize: s.size, total: total, genSize: fromGen.size,
        |    json: JSON.stringify({m: m, s: s})
        |  };
        |}""".stripMargin
    val o = run(m, VNull).asInstanceOf[VObj]
    assert(o.fields("mSize") == VNum(3)) // {a, 3, keyObj} after delete(b)
    assert(o.fields("got") == VNum(10))
    assert(o.fields("miss") == VUndef)
    assert(o.fields("hasNum") == VBool(true))
    assert(o.fields("entries") ==
      VStr("""a=10,3=three,{"id":1}=obj""")) // objects display as JSON here
    assert(o.fields("objHit") == VStr("obj"))
    assert(o.fields("objMiss") == VUndef, "distinct objects are distinct keys")
    assert(o.fields("sSize") == VNum(3)) // {1, 2, 4}
    assert(o.fields("total") == VNum(7))
    assert(o.fields("genSize") == VNum(1))
    assert(o.fields("json") == VStr("""{"m":{},"s":{}}"""))
    // a non-pair Map initializer is loud
    intercept[JsError] {
      run("export default function (v) { return new Map([1, 2]); }", VNull)
    }
  }

  // ------------------------------------------------------ ES modules
  // (dozer-deno/src/ts_module_loader/mod.rs: resolve_import + fetch +
  // execute-once; here over in-memory bundles — JsModules does the IO)

  test("ES modules: default + named imports, alias, namespace, " +
      "export-decl forms, deferred export lists") {
    val helper =
      """export const TWO = 2;
        |export function triple(x) { return x * 3; }
        |const hidden = 99;
        |function late(x) { return x + TWO; }
        |export { late, hidden as leaked };
        |export default function (x) { return x * 10; }""".stripMargin
    val entry =
      """import tenX, { TWO, triple as t3, late, leaked } from './lib/helper.js';
        |import * as h from './lib/helper.js';
        |export default function (x) {
        |  return tenX(x) + t3(x) + TWO + late(1) + leaked +
        |    h.triple(1) + h['default'](1) + h.TWO;
        |}""".stripMargin
    val m = JsMini.loadBundle(
      Map("main.js" -> entry, "lib/helper.js" -> helper), "main.js")
    // 10x + 3x + 2 + 3 + 99 + 3 + 10 + 2 = 13x + 119
    assert(m.callDefault(VNum(2)) == VNum(13 * 2 + 119))
  }

  test("ES modules: diamond imports execute a shared module ONCE; " +
      "re-export `from`; relative ../ resolution in subdirectories") {
    val counter =
      """let n = 0;
        |export function bump() { n = n + 1; return n; }
        |export function count() { return n; }""".stripMargin
    val a =
      """import { bump } from '../counter.js';
        |export const aSaw = bump();""".stripMargin
    val b =
      """import { bump } from '../counter.js';
        |export const bSaw = bump();
        |export { count } from '../counter.js';""".stripMargin
    val entry =
      """import { aSaw } from './sub/a.js';
        |import { bSaw, count } from './sub/b.js';
        |export default function () { return [aSaw, bSaw, count()]; }""".stripMargin
    val m = JsMini.loadBundle(Map(
      "main.js" -> entry, "sub/a.js" -> a, "sub/b.js" -> b,
      "counter.js" -> counter), "main.js")
    val got = m.callDefault(VUndef).asInstanceOf[VArr]
    // one shared instance: a bumps to 1, b to 2, final count 2
    assert(got.items.toSeq == Seq(VNum(1), VNum(2), VNum(2)))
  }

  test("ES modules: export * from re-exports every named export " +
      "but not the default") {
    val base =
      """export const A = 1;
        |export function f(x) { return x + 1; }
        |export default function () { return "base-default"; }""".stripMargin
    val hub = "export * from './base.js';"
    val entry =
      """import { A, f } from './hub.js';
        |export default function () { return f(A); }""".stripMargin
    val m = JsMini.loadBundle(Map(
      "main.js" -> entry, "hub.js" -> hub, "base.js" -> base), "main.js")
    assert(m.callDefault(VUndef) == VNum(2))
    // the default is NOT forwarded through export *
    val noDefault = intercept[JsSyntaxError] {
      JsMini.loadBundle(Map(
        "main.js" -> "import d from './hub.js';",
        "hub.js" -> hub, "base.js" -> base), "main.js")
    }
    assert(noDefault.getMessage.contains("no default export"))
  }

  test("ES modules: loud failures — cycle, missing module, missing " +
      "export, bare specifier, URL scheme, root escape, nested import") {
    def bundle(ms: (String, String)*): Unit = {
      JsMini.loadBundle(ms.toMap, "main.js")
      ()
    }
    val cyc = intercept[JsSyntaxError] {
      bundle(
        "main.js" -> "import { x } from './a.js'; export default function(){}",
        "a.js" -> "import { y } from './main.js'; export const x = 1;")
    }
    assert(cyc.getMessage.contains("cycle"))
    val missing = intercept[JsSyntaxError] {
      bundle("main.js" -> "import { x } from './nope.js';")
    }
    assert(missing.getMessage.contains("not in the bundle"))
    val noExport = intercept[JsSyntaxError] {
      bundle(
        "main.js" -> "import { absent } from './a.js';",
        "a.js" -> "export const present = 1;")
    }
    assert(noExport.getMessage.contains("no export named 'absent'") &&
      noExport.getMessage.contains("present"))
    val bare = intercept[JsSyntaxError] {
      bundle("main.js" -> "import { x } from 'lodash';")
    }
    assert(bare.getMessage.contains("bare specifier"))
    val url = intercept[JsSyntaxError] {
      bundle("main.js" -> "import { x } from 'https://example.com/m.js';")
    }
    assert(url.getMessage.contains("zero-egress"))
    val escape = intercept[JsSyntaxError] {
      bundle("main.js" -> "import { x } from '../outside.js';")
    }
    assert(escape.getMessage.contains("escapes the bundle root"))
    val nested = intercept[JsSyntaxError] {
      JsMini.loadBundle(Map(
        "main.js" ->
          "export default function () { import { x } from './a.js'; }",
        "a.js" -> "export const x = 1;"), "main.js")
        .callDefault(VUndef) // function bodies run at call time
    }
    assert(nested.getMessage.contains("top level"))
    // an undefined name in an export list is loud too
    val undef = intercept[JsSyntaxError] {
      bundle("main.js" -> "export { ghost };")
    }
    assert(undef.getMessage.contains("not defined"))
  }

  test("ES modules: `import` stays usable as a plain identifier in " +
      "scripts (contextual keyword)") {
    val m =
      """export default function (x) {
        |  const import_ = 5;
        |  let obj = { value: 2 };
        |  return import_ + obj.value + x;
        |}""".stripMargin
    assert(run(m, VNum(1)) == VNum(8))
  }

  test("regex: literals lex (vs division), test/exec/lastIndex, " +
      "match/search/split, replace with $n templates and function " +
      "replacements, new RegExp, flags i/m/s/g") {
    def js(body: String, arg: V = VNull): V =
      run(s"export default function (x) { $body }", arg)
    // literal vs division disambiguation
    assert(js("const a = 10; const b = 4; return a / b / 1;") == VNum(2.5))
    assert(js("return /ab+c/.test('xabbbcy');") == VBool(true))
    assert(js("return /ab+c/.test('xakcy');") == VBool(false))
    // flags: i, m, s
    assert(js("return /HELLO/i.test('say hello');") == VBool(true))
    assert(js("return /^b$/m.test('a\\nb');") == VBool(true))
    assert(js("return /a.b/s.test('a\\nb');") == VBool(true))
    // exec: groups; unmatched group → undefined
    assert(js("const m = /(\\d+)-(\\d+)?/.exec('ab 12- cd'); " +
      "return m[0] + '|' + m[1] + '|' + (m[2] === undefined);")
      == VStr("12-|12|true"))
    assert(js("return /x/.exec('abc');") == VNull)
    // g-flag lastIndex statefulness + reset on miss
    assert(js("const r = /\\d+/g; const a = []; let m; " +
      "while ((m = r.exec('a1b22c333')) !== null) a.push(m[0]); " +
      "return a.join(',');") == VStr("1,22,333"))
    assert(js("const r = /\\d/g; r.exec('a1'); const i = r.lastIndex; " +
      "r.lastIndex = 0; return i + '|' + r.lastIndex;") == VStr("2|0"))
    // String.match: global → all matches, non-global → groups, miss → null
    assert(js("return 'a1b22c'.match(/\\d+/g).join('|');") == VStr("1|22"))
    assert(js("const m = 'key=val'.match(/(\\w+)=(\\w+)/); " +
      "return m[1] + ':' + m[2];") == VStr("key:val"))
    assert(js("return 'abc'.match(/\\d/);") == VNull)
    // search (string arg is a PATTERN, like JS)
    assert(js("return 'xxabc'.search(/b/);") == VNum(3))
    assert(js("return 'xxabc'.search('a.c');") == VNum(2))
    assert(js("return 'abc'.search(/z/);") == VNum(-1))
    // split with regex (+ captured group splicing, + limit)
    assert(js("return 'a1b22c'.split(/\\d+/).join('|');") == VStr("a|b|c"))
    assert(js("return 'a1b'.split(/(\\d)/).join('|');") == VStr("a|1|b"))
    assert(js("return 'a,b,c'.split(/,/, 2).join('|');") == VStr("a|b"))
    // replace: first vs global, $n/$& templates, function replacement
    assert(js("return 'a1b2'.replace(/\\d/, 'X');") == VStr("aXb2"))
    assert(js("return 'a1b2'.replace(/\\d/g, 'X');") == VStr("aXbX"))
    assert(js("return '2026-08-16'.replace(/(\\d+)-(\\d+)-(\\d+)/, " +
      "'$3/$2/$1');") == VStr("16/08/2026"))
    assert(js("return 'ab'.replace(/b/, '[$&$$]');") == VStr("a[b$]"))
    assert(js("return 'a1b22'.replace(/\\d+/g, " +
      "(m) => String(m.length));") == VStr("a1b2"))
    assert(js("return 'v=7'.replace(/v=(\\d)/, (m, p1) => p1 * 2);")
      == VStr("14"))
    // function replacement with a string pattern
    assert(js("return 'aXb'.replace('X', (m, i) => 'at' + i);")
      == VStr("aat1b"))
    // replaceAll: regex must be global
    assert(js("return 'a1b2'.replaceAll(/\\d/g, '.');") == VStr("a.b."))
    intercept[JsError](js("return 'x'.replaceAll(/\\d/, '.');"))
    // new RegExp: string pattern, flags, clone-with-flags
    assert(js("const r = new RegExp('a(\\\\d)c', 'i'); " +
      "return r.exec('xA5c')[1];") == VStr("5"))
    assert(js("const r = new RegExp(/b+/, 'g'); " +
      "return 'abba'.match(r).join(',');") == VStr("bb"))
    // properties
    assert(js("const r = /a(b)/gi; return r.source + '|' + r.flags + " +
      "'|' + r.global;") == VStr("a(b)|gi|true"))
    // unsupported flag and bad construct refuse loudly by name
    val ef = intercept[JsError](js("return /a/v.test('a');"))
    assert(ef.getMessage.contains("flag 'v'"), ef.getMessage)
    val ec = intercept[JsError](js("return new RegExp('a(').test('a');"))
    assert(ec.getMessage.contains("JDK engine"), ec.getMessage)
    // JSON/typeof/display integration
    assert(js("return typeof /a/;") == VStr("object"))
    assert(js("return JSON.stringify({r: /a/g});") == VStr("{\"r\":{}}"))
    assert(js("return String(/a(b)?/im);") == VStr("/a(b)?/im"))
  }

  test("regex edge matrix: ECMA-262 split/replace/boundary behaviors " +
      "pinned against V8-verified strings; backreference shapes where " +
      "the JDK silently diverges (unset group: JS matches empty, JDK " +
      "fails) refuse loudly at construction") {
    def js(body: String, arg: V = VNull): V =
      run(s"export default function (x) { $body }", arg)
    // -- split edges (ECMA SplitMatcher) --
    assert(js("return 'abc'.split(/(?:)/).join('|');") == VStr("a|b|c"))
    assert(js("return 'abc'.split(/(?:)/).length;") == VNum(3))
    assert(js("return ''.split(/(?:)/).length;") == VNum(0))
    assert(js("return ''.split(/x/).length;") == VNum(1))
    assert(js("return ''.split(/x/)[0];") == VStr(""))
    assert(js("return 'ab'.split(/b/).join('|');") == VStr("a|"))
    assert(js("return 'a,b,'.split(/,/).length;") == VNum(3))
    assert(js("return 'aaa'.split(/a/).length;") == VNum(4))
    // the e == p skip rule with an optional group: no phantom empty
    // field (and no spliced capture) between "1" and "b"
    assert(js("return 'a1b'.split(/(\\d)?/).join('|');") == VStr("a|1|b"))
    assert(js("return 'abc'.split(/(?:)/, 2).join('|');") == VStr("a|b"))
    // -- replacement template edges (ECMA GetSubstitution) --
    assert(js("return 'abcd'.replace(/bc/, '[$`]');") == VStr("a[a]d"))
    assert(js("return 'abcd'.replace(/bc/, \"[$']\");") == VStr("a[d]d"))
    assert(js("return 'ab'.replace(/b/, '$9');") == VStr("a$9"))
    assert(js("return 'ab'.replace(/(b)/, '$1$2');") == VStr("ab$2"))
    assert(js("return 'ab'.replace(/b/, '$x');") == VStr("a$x"))
    assert(js("return 'ab'.replace(/b/, 'c$');") == VStr("ac$"))
    // $<name>: expands from a named group; an UNMATCHED named group
    // expands empty; with NO named groups in the pattern it stays
    // literal
    assert(js("return 'v=7'.replace(/v=(?<n>\\d)/, '[$<n>]');")
      == VStr("[7]"))
    assert(js("return 'ab'.replace(/(?<p>x)?b/, '[$<p>]');")
      == VStr("a[]"))
    assert(js("return 'ab'.replace(/b/, '[$<p>]');") == VStr("a[$<p>]"))
    // two-digit group wins when it exists; otherwise $1 + literal
    assert(js("return 'j' + 'abcdefghij'.replace(" +
      "/(a)(b)(c)(d)(e)(f)(g)(h)(i)(j)/, '$10');") == VStr("jj"))
    assert(js("return 'ab'.replace(/(a)b/, '$12');") == VStr("a2"))
    // empty global replace hits every boundary, end included
    assert(js("return 'aa'.replace(/(?:)/g, '-');") == VStr("-a-a-"))
    // -- \b is the ASCII word boundary on BOTH engines --
    assert(js("return /\\bcafe\\b/.test('a cafe!');") == VBool(true))
    assert(js("return '1a_b-c'.replace(/\\b/g, '|');")
      == VStr("|1a_b|-|c|"))
    // -- SAFE backreference shapes run (group always participates) --
    assert(js("return /(\"|')abc\\1/.test(\"'abc'\");") == VBool(true))
    assert(js("return 'xx yy'.match(/(\\w)\\1/g).join(',');")
      == VStr("xx,yy"))
    assert(js("return /(a)+\\1/.test('aaa');") == VBool(true))
    assert(js("return /((a)b\\2)/.test('aba');") == VBool(true))
    assert(js("return /(?<q>')x\\k<q>/.test(\"'x'\");") == VBool(true))
    // -- JDK-divergent shapes REFUSE by name (JS matches empty where
    // the JDK fails the backreference) --
    val e1 = intercept[JsError](js("return /(a)?\\1b/.test('b');"))
    assert(e1.getMessage.contains("UNSET"), e1.getMessage)
    val e2 = intercept[JsError](js("return /\\1(a)/.test('a');"))
    assert(e2.getMessage.contains("close"), e2.getMessage)
    val e3 = intercept[JsError](js("return /(?:(a)|b)\\1/.test('b');"))
    assert(e3.getMessage.contains("alternation"), e3.getMessage)
    val e4 = intercept[JsError](js("return /(a)*x\\1/.test('x');"))
    assert(e4.getMessage.contains("quantified"), e4.getMessage)
    val e5 = intercept[JsError](js("return /(a)|\\1/.test('z');"))
    assert(e5.getMessage.contains("branches"), e5.getMessage)
    val e6 = intercept[JsError](js("return /(?:(a)x)?y\\1/.test('y');"))
    assert(e6.getMessage.contains("scope"), e6.getMessage)
    val e7 = intercept[JsError](js("return /(?<g>a)?\\k<g>/.test('');"))
    assert(e7.getMessage.contains("UNSET"), e7.getMessage)
    // -- match result properties: index/input/groups --
    assert(js("const m = 'ab 12'.match(/(\\d)(\\d)/); " +
      "return m.index + '|' + m.input + '|' + m[1] + m[2];")
      == VStr("3|ab 12|12"))
    assert(js("const m = /(?<y>\\d{4})-(?<mo>\\d{2})/.exec('on 2026-08!');" +
      " return m.groups.y + '/' + m.groups.mo + '@' + m.index;")
      == VStr("2026/08@3"))
    assert(js("return 'x'.match(/x/).groups === undefined;")
      == VBool(true))
    assert(js("const m = /(?<a>p)?q/.exec('q'); " +
      "return m.groups.a === undefined;") == VBool(true))
    // -- matchAll: full results per match, spread/for-of, non-global
    // refuses like JS --
    assert(js("const all = [...'a1b22'.matchAll(/(\\d+)/g)]; " +
      "return all.length + '|' + all[0][1] + '|' + all[1][1] + '|' + " +
      "all[1].index;") == VStr("2|1|22|3"))
    assert(js("let t = ''; for (const m of 'x1y2'.matchAll(/\\d/g)) " +
      "t += m[0]; return t;") == VStr("12"))
    assert(js("return [...'abc'.matchAll(/z/g)].length;") == VNum(0))
    val e8 = intercept[JsError](js("return 'a'.matchAll(/a/);"))
    assert(e8.getMessage.contains("global"), e8.getMessage)
    // -- the d flag: [start, end] spans per group, unmatched groups
    // undefined, indices.groups for named captures; without d the
    // property is undefined --
    assert(js("const m = /a(b)(x)?/d.exec('zab'); " +
      "return m.indices[0].join(',') + '|' + m.indices[1].join(',') + " +
      "'|' + (m.indices[2] === undefined);") == VStr("1,3|2,3|true"))
    assert(js("const m = /(?<mid>b)/d.exec('abc'); " +
      "return m.indices.groups.mid.join(',');") == VStr("1,2"))
    assert(js("return /a/.exec('a').indices === undefined;")
      == VBool(true))
    assert(js("return String(/a(b)?/dg);") == VStr("/a(b)?/dg"))
    // -- the y (sticky) flag: matches anchor EXACTLY at lastIndex --
    assert(js("const r = /\\d+/y; const a = r.exec('12ab'); " +
      "return a[0] + '|' + r.lastIndex;") == VStr("12|2"))
    assert(js("const r = /\\d+/y; r.exec('12ab'); " +
      "const b = r.exec('12ab'); " + // 'ab' at 2: sticky miss resets
      "return (b === null) + '|' + r.lastIndex;") == VStr("true|0"))
    assert(js("const r = /a/y; r.lastIndex = 1; " +
      "return r.test('ba') + '|' + r.lastIndex;") == VStr("true|2"))
    assert(js("return /b/y.test('ab');") == VBool(false))
    // ^ stays a TRUE input/line anchor under sticky (not region start)
    assert(js("const r = /^a/y; r.lastIndex = 1; return r.test('aa');")
      == VBool(false))
    // \b sees the character BEFORE lastIndex (transparent bounds)
    assert(js("const r = /\\ba/y; r.lastIndex = 1; return r.test('aa');")
      == VBool(false))
    assert(js("const r = /\\bc/y; r.lastIndex = 2; return r.test('a c');")
      == VBool(true))
    // global+sticky collects only CONSECUTIVE matches
    assert(js("return 'aab'.match(/a/gy).join(',');") == VStr("a,a"))
    assert(js("return 'xaa'.match(/a/gy);") == VNull)
    assert(js("return 'aab'.replace(/a/gy, '-');") == VStr("--b"))
    assert(js("return 'baa'.replace(/a/gy, '-');") == VStr("baa"))
    // non-global sticky replace honors AND advances lastIndex
    assert(js("const r = /a/y; r.lastIndex = 1; " +
      "return 'aa'.replace(r, '-') + '|' + r.lastIndex;")
      == VStr("a-|2"))
    // Symbol.split forces y internally, so the input flag is a no-op
    assert(js("return 'a1b'.split(/\\d/y).join('|');") == VStr("a|b"))
    assert(js("const r = /a/y; " +
      "return r.sticky + '|' + /a/d.hasIndices + '|' + /a/.sticky;")
      == VStr("true|true|false"))
  }

  test("u-flag divergence matrix: the named JDK↔ECMA-262 unicode-mode " +
      "divergences behind the u/v refusal, each DEMONSTRATED against " +
      "the engine (JDK 17) rather than asserted from folklore — the " +
      "compileRegex refusal message cites this matrix. The JDK engine " +
      "sits BETWEEN ECMA's two modes: astral handling and case folding " +
      "are already u-flavored, while \\w/\\b and escape syntax are " +
      "not, so neither mode can be claimed exactly without a custom " +
      "engine") {
    import java.util.regex.Pattern
    def js(body: String): V =
      run(s"export default function (x) { $body }", VNull)
    // ── row 1: \w under UNICODE_CHARACTER_CLASS (the JDK's only
    // unicode mode for classes) matches ALL unicode letters; ECMA u
    // keeps \w ASCII-only — V8: /\w/u.test('é') === false. Adding UCC
    // to "implement u" would silently widen every \w/\W/\b.
    val ucc = Pattern.compile("^\\w$", Pattern.UNICODE_CHARACTER_CLASS)
    assert(ucc.matcher("é").matches && ucc.matcher("Ω").matches,
      "JDK UCC \\w matches unicode letters; ECMA u does not")
    assert(!Pattern.compile("^\\w$").matcher("é").matches,
      "JDK default \\w is ASCII like ECMA")
    // ── row 2: \b is unicode-aware in the JDK EVEN WITHOUT UCC
    // (boundary keys on unicode word chars), while ECMA \b keys on
    // ASCII \w in BOTH modes: V8 /a\b/.test('aé') === true (é is not
    // a word char), the JDK finds no boundary. A current-surface
    // divergence on non-ASCII-adjacent boundaries, documented here.
    assert(!Pattern.compile("a\\b").matcher("aé").find,
      "JDK \\b treats é as a word char; ECMA (both modes) does not")
    assert(js("return /a\\b/.test('aé');") == VBool(false)) // JDK side
    // ── row 3: \u{...} code-point escapes are u-mode SYNTAX in ECMA;
    // the JDK rejects them loudly (its spelling is \x{...}) — a user
    // porting a /\u{1F600}/u pattern gets a construction error, never
    // a silently different match
    // (string split keeps scalac's own \u pre-processing out of the way)
    intercept[JsError] { js("return /\\" + "u{1F600}/.test('x');") }
    // ── row 4: ASTRAL ATOMICITY — the JDK matches by code point, which
    // is ECMA's *u-mode* behavior; ECMA NON-u matches by UTF-16 unit.
    // V8 non-u: '😀'.match(/./g).length === 2, /\uD83D/.test('😀')
    // === true. The subset (JDK) gives 1 / false — current-surface
    // astral divergence FROM NON-U, agreement with u.
    assert(js("return '😀'.match(/./g).length;") == VNum(1))
    assert(js("return /\\uD83D/.test('😀');") == VBool(false))
    // ── row 5: CASE FOLDING — the subset maps i →
    // CASE_INSENSITIVE|UNICODE_CASE (full unicode simple folding,
    // ECMA's *u-mode* rule). ECMA NON-u canonicalizes via toUpperCase
    // and never folds across the ASCII boundary: V8 /s/i.test('ſ')
    // === false and /k/i.test('K') === false, both TRUE here.
    // The alternative (drop UNICODE_CASE) diverges worse: plain
    // CASE_INSENSITIVE is ASCII-only and would stop folding Ω/ω,
    // which ECMA non-u DOES fold.
    assert(js("return /s/i.test('ſ');") == VBool(true)) // V8 non-u: false
    assert(js("return /k/i.test('K');") == VBool(true)) // V8: false
    assert(js("return /ω/i.test('Ω');") == VBool(true)) // V8 non-u: true
    assert(!Pattern.compile("ω", Pattern.CASE_INSENSITIVE)
      .matcher("Ω").find,
      "ASCII-only folding would lose the non-ASCII pairs ECMA folds")
    // ── the refusals: v refuses wholesale (no JDK class-set engine);
    // u is a SUBSET since round 19 — patterns touching a named
    // divergence refuse individually (next test), the rest run
    val ev = intercept[JsError] { js("return /a/v.test('a');") }
    assert(ev.getMessage.contains("unicode"), ev.getMessage)
    assert(js("return /a/u.test('a');") == VBool(true))
    val eb = intercept[JsError] { js("return /a\\b/u.test('a');") }
    assert(eb.getMessage.contains("divergence matrix"), eb.getMessage)
  }

  test("u-flag SUBSET: unicode-mode patterns outside the divergence " +
      "matrix run with ECMA semantics on the JDK engine — each " +
      "accept row's expectation is V8's, each refuse row is a V8 " +
      "SyntaxError or a named JDK divergence") {
    def js(body: String): V =
      run(s"export default function (x) { $body }", VNull)
    // \u{...} code-point escapes (u-mode syntax; JDK spells it \x{...})
    assert(js("return /\\" + "u{1F600}/u.test('😀');") == VBool(true))
    assert(js("return /\\" + "u{48}/u.test('H');") == VBool(true))
    assert(js("return 'a😀b'.replace(/\\" + "u{1F600}/u, '-');")
      == VStr("a-b"))
    // astral atomicity + code-point classes (the JDK is already
    // u-flavored here — matrix row 4)
    assert(js("return '😀'.match(/./gu).length;") == VNum(1))
    assert(js("return /^.$/u.test('😀');") == VBool(true))
    // AdvanceStringIndex: empty-match iteration steps by CODE POINT
    // under u (V8: 3 empty matches over '😀a' — positions 0, 2, 3),
    // by UTF-16 unit otherwise (4)
    assert(js("return '😀a'.matchAll(/(?:)/gu).length;") == VNum(3))
    assert(js("return '😀a'.matchAll(/(?:)/g).length;") == VNum(4))
    // split on an empty pattern keeps surrogate pairs whole under u
    assert(js("return 'a😀b'.split(/(?:)/u).length;") == VNum(3))
    assert(js("return 'a😀b'.split(/(?:)/).length;") == VNum(4))
    // \s is ECMA's exact WhiteSpace ∪ LineTerminator set (JDK default
    // \s is ASCII-only — the translation expands it): V8
    // /\s/u.test(' ') === true
    assert(js("return /\\s/u.test('\\u00a0');") == VBool(true))
    assert(js("return /\\s/u.test('\\ufeff');") == VBool(true))
    assert(js("return /\\S/u.test('\\u00a0');") == VBool(false))
    assert(js("return /[x\\s]/u.test('\\u2028');") == VBool(true))
    // \w stays ASCII under u (ECMA rule; JDK default agrees)
    assert(js("return /\\w/u.test('é');") == VBool(false))
    // property escapes: general categories, long names, Script=
    assert(js("return /\\p{L}/u.test('é');") == VBool(true))
    assert(js("return /\\p{L}/u.test('1');") == VBool(false))
    assert(js("return /\\P{L}/u.test('1');") == VBool(true))
    assert(js("return /\\p{Letter}/u.test('Ω');") == VBool(true))
    assert(js("return /\\p{Nd}/u.test('٣');") == VBool(true)) // ARABIC 3
    assert(js("return /\\p{Script=Greek}/u.test('Ω');") == VBool(true))
    assert(js("return /\\p{Script=Greek}/u.test('a');") == VBool(false))
    assert(js("return /[\\p{L}\\p{Nd}]/u.test('7');") == VBool(true))
    // class literals the JDK would read as operators: '[' nests,
    // '&&' intersects — ECMA reads literals (V8-verified semantics)
    assert(js("return /[[]/u.test('[');") == VBool(true))
    assert(js("return /[a&]/u.test('&');") == VBool(true))
    assert(js("return /[a&&b]/u.test('&');") == VBool(true)) // literal
    // ECMA empty classes the JDK rejects outright
    assert(js("return /x[]/u.test('x');") == VBool(false))
    assert(js("return /[^]/u.test('\\n');") == VBool(true))
    // class \b is BACKSPACE; \0 is NUL; \v is exactly U+000B (the JDK
    // \v is a vertical-whitespace CLASS — translated away)
    assert(js("return /[\\b]/u.test('\\u0008');") == VBool(true))
    assert(js("return /\\0/u.test('\\u0000');") == VBool(true))
    assert(js("return /\\v/u.test('\\u000b');") == VBool(true))
    assert(js("return /\\v/u.test('\\n');") == VBool(false))
    // i+u: unicode simple folding (the JDK's UNICODE_CASE — row 5)
    assert(js("return /s/iu.test('ſ');") == VBool(true))
    assert(js("return /στιγμας/iu.test('ΣΤΙΓΜΑΣ');") == VBool(true))
    // groups/backrefs/quantifiers translate untouched
    assert(js("return /(ab)\\1/u.test('abab');") == VBool(true))
    assert(js("return /a{2,3}/u.test('aaa');") == VBool(true))
    assert(js("const m = /(?<g>😀)/u.exec('x😀'); return m.groups.g;")
      == VStr("😀"))
    // u-mode STRICTNESS — each a V8 SyntaxError the JDK (or the
    // non-u subset) would silently accept:
    intercept[JsError] { js("return /a{/u.test('a{');") } // lone brace
    intercept[JsError] { js("return /a}/u.test('a}');") }
    intercept[JsError] { js("return /a]/u.test('a]');") } // stray ]
    intercept[JsError] { js("return /\\q/u.test('q');") } // identity esc
    intercept[JsError] { js("return /\\" + "u12/u.test('x');") }
    intercept[JsError] { js("return /\\01/u.test('\\x01');") } // octal
    intercept[JsError] { js("return /[\\1]/u.test('x');") }
    // named JDK divergences refuse BY NAME (matrix rows 1-2)
    intercept[JsError] { js("return /\\b/u.test('a');") }
    intercept[JsError] { js("return /\\B/u.test('a');") }
    // properties with no JDK equivalent refuse by name
    intercept[JsError] { js("return /\\p{Emoji}/u.test('😀');") }
    intercept[JsError] { js("return /\\p{ID_Start}/u.test('a');") }
    // the non-u surface is untouched by the translator (a stray ']'
    // is an Annex-B leniency both V8 non-u and the JDK accept)
    assert(js("return 'a]b'.replace(/a]/, '-');") == VStr("-b"))
  }
}
