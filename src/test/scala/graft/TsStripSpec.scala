package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JsMini, TsStrip}
import graft.functions.TsStrip.TsStripError

/** Type erasure for the TS module loader seam: stripped output must be
  * (a) length/line-identical to the input and (b) runnable JS whose
  * JsMini evaluation matches the type-free program.
  */
class TsStripSpec extends AnyFunSuite {

  private def run(ts: String, arg: JsMini.V = JsMini.VNum(0)): JsMini.V = {
    val js = TsStrip.strip(ts)
    assert(js.length == ts.length, "erasure must preserve length")
    assert(js.count(_ == '\n') == ts.count(_ == '\n'),
      "erasure must preserve line structure")
    JsMini.load(js).callDefault(arg)
  }

  private def num(v: JsMini.V): Double = v match {
    case JsMini.VNum(d) => d
    case other => fail(s"expected number, got $other")
  }

  private def str(v: JsMini.V): String = v match {
    case JsMini.VStr(s) => s
    case other => fail(s"expected string, got $other")
  }

  test("annotations on declarators, params, and returns erase") {
    val v = run(
      """const base: number = 10;
        |function add(a: number, b: number = 2): number {
        |  let x: number = a + b;
        |  return x + base;
        |}
        |export default function(n: number): number { return add(n, 5); }
        |""".stripMargin, JsMini.VNum(1))
    assert(num(v) == 16.0)
  }

  test("arrow params, arrow return annotations, optional params") {
    val v = run(
      """const f = (a: number, b?: number): number => a + (b === undefined ? 1 : b);
        |const g = (x: string): string => x + "!";
        |export default function(n: number) { return f(n) + g("a").length; }
        |""".stripMargin, JsMini.VNum(3))
    assert(num(v) == 6.0) // f(3)=4, "a!".length=2
  }

  test("interfaces, type aliases, declare, import type, as casts, " +
      "non-null all erase; object-literal colons survive") {
    val v = run(
      """interface Point { x: number; y: number; }
        |type Pair = { a: number, b: number };
        |declare const window: unknown;
        |function mk(): Point { return { x: 3, y: 4 }; }
        |export default function(n: number): number {
        |  const p = mk() as Point;
        |  const q: Pair = { a: p.x!, b: n ? p.y : 0 };
        |  return q.a + q.b;
        |}
        |""".stripMargin, JsMini.VNum(1))
    assert(num(v) == 7.0)
  }

  test("generics on functions, classes, methods, and call sites erase; " +
      "extends keeps the base but drops its type args") {
    val v = run(
      """function id<T>(x: T): T { return x; }
        |class Box<T> {
        |  constructor(v) { this.v = v; }
        |  get2(): number { return 2; }
        |}
        |class NumBox extends Box<number> {
        |  total(): number { return this.v + this.get2(); }
        |}
        |export default function(n: number): number {
        |  const b = new NumBox(id<number>(n));
        |  return b.total();
        |}
        |""".stripMargin, JsMini.VNum(5))
    assert(num(v) == 7.0)
  }

  test("implements clause erases; class field annotations erase") {
    val v = run(
      """interface Sized { size(): number; }
        |class Bag implements Sized {
        |  n: number;
        |  label?: string;
        |  constructor(n: number) { this.n = n; }
        |  size(): number { return this.n; }
        |}
        |export default function(k: number) { return new Bag(k).size(); }
        |""".stripMargin, JsMini.VNum(9))
    assert(num(v) == 9.0)
  }

  test("ternaries in defaults and bodies never lose their colons") {
    val v = run(
      """function pick(flag: number, a: number = flag ? 10 : 20): number {
        |  return flag ? a : a + 1;
        |}
        |export default function(n: number) { return pick(n); }
        |""".stripMargin, JsMini.VNum(0))
    assert(num(v) == 21.0)
    val v1 = run(
      """export default function(n: number) {
        |  const m = { k: n ? "y" : "n" };
        |  return m.k;
        |}""".stripMargin, JsMini.VNum(1))
    assert(str(v1) == "y")
  }

  test("less-than stays less-than; type-like angles before a call strip") {
    val v = run(
      """export default function(n: number): number {
        |  const cmp = n < 3 ? 1 : 0;
        |  return cmp;
        |}""".stripMargin, JsMini.VNum(2))
    assert(num(v) == 1.0)
    // `a < b && c > (d)`: interior has `&&`, not type-like — comparison
    val v2 = run(
      """export default function(n: number) {
        |  const a = 1, b = 5, c = 9;
        |  return (a < b && c > (n)) ? "cmp" : "no";
        |}""".stripMargin, JsMini.VNum(7))
    assert(str(v2) == "cmp")
  }

  test("inline type specifiers in import lists erase; modules compose " +
      "across .ts files through the bundle loader") {
    val helper =
      """export interface Opts { scale: number; }
        |export const factor: number = 3;
        |export function apply(n: number, o: Opts): number {
        |  return n * o.scale + factor;
        |}
        |""".stripMargin
    val entry =
      """import { type Opts, apply, factor } from './helper.ts';
        |export default function(n: number): number {
        |  const o = { scale: 2 } as Opts;
        |  return apply(n, o) - factor;
        |}
        |""".stripMargin
    val bundle = Map(
      "main.ts" -> TsStrip.strip(entry),
      "helper.ts" -> TsStrip.strip(helper))
    val m = JsMini.loadBundle(bundle, "main.ts")
    assert(num(m.callDefault(JsMini.VNum(4))) == 8.0)
  }

  test("offsets survive erasure: a downstream JsMini syntax error " +
      "points at the SAME offset the .ts source has") {
    val ts =
      """const ok: number = 1;
        |const bad: number = (1 + 2;
        |""".stripMargin // missing `)` — JsMini reports the `;`'s offset
    val js = TsStrip.strip(ts)
    val e = intercept[JsMini.JsSyntaxError](JsMini.load(js))
    val off = "offset (\\d+)".r.findFirstMatchIn(e.getMessage)
      .map(_.group(1).toInt).getOrElse(fail(e.getMessage))
    assert(ts.charAt(off) == ';',
      s"offset $off points at '${ts.charAt(off)}' in the TS source")
  }

  test("value-level TS is rejected loudly: enum, parameter properties, " +
      "abstract, namespace") {
    val eEnum = intercept[TsStripError](TsStrip.strip("enum E { A, B }"))
    assert(eEnum.getMessage.contains("frozen object literal"))
    val eParam = intercept[TsStripError](TsStrip.strip(
      "class C { constructor(public x: number) {} }"))
    assert(eParam.getMessage.contains("parameter property"))
    val eAbs = intercept[TsStripError](TsStrip.strip(
      "abstract class C {}"))
    assert(eAbs.getMessage.contains("abstract"))
    val eNs = intercept[TsStripError](TsStrip.strip(
      "namespace N { }"))
    assert(eNs.getMessage.contains("namespace"))
  }

  test("strings, templates, and comments are never touched") {
    val ts =
      """const s = "x: number, as T, <A>()";
        |const t = `y: ${s} : more`;
        |// comment with : number and <T> and as X
        |export default function(): string { return s + t; }
        |""".stripMargin
    val js = TsStrip.strip(ts)
    assert(js.contains("\"x: number, as T, <A>()\""))
    assert(js.contains("`y: ${s} : more`"))
    assert(js.contains("// comment with : number and <T> and as X"))
    assert(str(JsMini.load(js).callDefault(JsMini.VNum(0)))
      == "x: number, as T, <A>()y: x: number, as T, <A>() : more")
  }

  test("complex nested types erase: generics-of-generics, function " +
      "types, unions, object types, readonly members") {
    val v = run(
      """type Handler = (x: number) => Map<string, Array<{ n: number }>>;
        |class Svc {
        |  readonly limit: number;
        |  constructor() { this.limit = 5; }
        |  run(xs: Array<number>, f?: (n: number) => number): number {
        |    let total: number | undefined = 0;
        |    for (const x of xs) { total = total + x; }
        |    return total + this.limit;
        |  }
        |}
        |export default function(n: number): number {
        |  return new Svc().run([n, 2 * n]);
        |}
        |""".stripMargin, JsMini.VNum(1))
    assert(num(v) == 8.0)
  }
}
