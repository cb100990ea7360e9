package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r19 token-hash-combining shingle kernel to the original
  * per-shingle-string hashing it replaced (the oracle hash family's
  * cross-engine contract must not move): for any text,
  * `Mod61.shingleHashes` must equal hashing each materialized shingle
  * string — distinctness, values, everything.
  */
class Mod61Spec extends AnyFunSuite {

  /** The pre-r19 reference path: materialize each width-token shingle
    * string (after the normalization contract) and hash it whole.
    */
  private def referenceHashes(text: String, width: Int): Array[Long] = {
    if (text == null) return null
    val norm = text.toLowerCase.trim.replaceAll("\\s+", " ")
    if (norm.isEmpty) return null
    val tk = norm.split(" ")
    val shingles = new scala.collection.mutable.LinkedHashSet[String]
    if (tk.length < width) shingles += tk.mkString(" ")
    else tk.sliding(width).foreach(s => shingles += s.mkString(" "))
    // distinct-by-string then hash; collapse hash collisions like the
    // long-set does (both engines read only h downstream)
    shingles.toArray.map(Mod61.hashString).distinct
  }

  test("shingleHashes ≡ per-string hashing (oracle hash family)") {
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "Beta", "GAMMA", "d", "ee2", "ffff",
      "Gg", "hい", "WORD-with-punct,", "x" * 40)
    def randText(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.size)))
      .mkString(if (rnd.nextBoolean()) " " else "  \t ") // collapse path
    for (w <- Seq(1, 2, 3, 5); n <- Seq(1, 2, 3, 4, 5, 10, 50, 200)) {
      val text = randText(n)
      val got = Mod61.shingleHashes(text, w)
      val want = referenceHashes(text, w)
      assert(got.sorted.toSeq == want.sorted.toSeq,
        s"mismatch for width=$w tokens=$n text='${text.take(80)}'")
    }
  }

  test("shingleHashes edge contract: null/blank → null; repeats dedup") {
    assert(Mod61.shingleHashes(null, 3) == null)
    assert(Mod61.shingleHashes("   \t  ", 3) == null)
    // one token repeated: every shingle identical → exactly one hash
    val rep = Mod61.shingleHashes("a a a a a a a a", 3)
    assert(rep.length == 1)
    assert(rep(0) == Mod61.hashString("a a a"))
    // fewer tokens than width: the single all-token shingle
    val few = Mod61.shingleHashes("Ab cD", 5)
    assert(few.toSeq == Seq(Mod61.hashString("ab cd")))
  }

  test("powB chain beyond the table matches direct folding") {
    // a single 5000-char token exercises the >4096 power fallback
    val tok = "q" * 5000
    val got = Mod61.shingleHashes(s"$tok $tok", 2)
    assert(got.toSeq == Seq(Mod61.hashString(s"$tok $tok")))
  }
}
