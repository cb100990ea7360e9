package graft.operators

import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix-list lookup — the registrable-domain rule web curation
  * pipelines key domain blocklists and per-domain quotas on.
  *
  * Implements the FULL publicsuffix.org algorithm (longest matching
  * rule wins; `*` wildcard labels; `!` exception rules prevail over
  * wildcards; the implicit `*` default rule makes every bare TLD a
  * public suffix; a host that IS a public suffix has no registrable
  * domain → null) over a vendored snapshot of the public data
  * (`graft/public_suffix_snapshot.dat` on the classpath, standard PSL
  * file syntax — swap the file for a full publicsuffix.org dump for
  * complete coverage; the snapshot carries the rules that change the
  * default outcome: multi-label ccTLD registries, wildcard TLDs with
  * their exceptions, and common private-section hosts).
  *
  * 100 TB shape: the rule tables are three immutable hash sets built
  * once per JVM from the jar resource (~300 entries; a full PSL is
  * ~10k — still trivially JVM-local, no broadcast needed), and the
  * lookup is O(#labels) hash probes per row, invoked from inside
  * whole-stage codegen via `StaticInvoke` (no UDF, no codegen break —
  * the same pattern as [[graft.functions.GeoUtils]]).
  */
object Psl {

  /** (exact rules, wildcard bases, exception rules) — a wildcard
    * `*.ck` is stored by its base `ck`; an exception `!www.ck` by its
    * full labels `www.ck`.
    */
  private[operators] val (rules, wildcardBases, exceptions):
      (Set[String], Set[String], Set[String]) = {
    val in = getClass.getClassLoader
      .getResourceAsStream("graft/public_suffix_snapshot.dat")
    require(in != null,
      "graft/public_suffix_snapshot.dat missing from the classpath")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val cleaned = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      // a full publicsuffix.org dump uses the same syntax; lowercase
      // defensively (rules are defined lowercase)
      .map(_.toLowerCase)
    val ex = cleaned.filter(_.startsWith("!")).map(_.substring(1)).toSet
    val wild = cleaned.filter(_.startsWith("*."))
      .map(_.substring(2)).toSet
    val exact = cleaned.filterNot(l => l.startsWith("!") ||
      l.startsWith("*.")).toSet
    (exact, wild, ex)
  }

  /** Registrable ("registered") domain of a lowercase host, or null
    * when the host is itself a public suffix (incl. every single-label
    * host, per the implicit `*` default rule) or null/empty.
    */
  def registrable(host: String): String = {
    if (host == null) return null
    val h = host
    if (h.isEmpty || h.startsWith(".") || h.endsWith(".") ||
        h.contains("..")) return null
    val labels = h.split('.')
    val n = labels.length
    // suffix of the last k labels, built right-to-left incrementally
    var ps = 1 // the implicit `*` default rule
    var k = 1
    var suffix = labels(n - 1)
    var exception = false
    while (k <= n && !exception) {
      if (exceptions.contains(suffix)) {
        // exception prevails: its public suffix drops the leftmost label
        ps = k - 1
        exception = true
      } else {
        if (rules.contains(suffix) && k > ps) ps = k
        // wildcard `*.base`: matches a (k+1)-label suffix over base
        if (wildcardBases.contains(suffix) && k + 1 > ps && k + 1 <= n)
          ps = k + 1
      }
      k += 1
      if (k <= n) suffix = labels(n - k) + "." + suffix
    }
    if (n <= ps) null
    else labels.slice(n - ps - 1, n).mkString(".")
  }

  /** Codegen entry point ([[org.apache.spark.sql.catalyst.expressions
    * .objects.StaticInvoke]] target): StringType columns arrive as
    * UTF8String; null propagation happens before the call.
    */
  def registrableUtf8(host: UTF8String): UTF8String = {
    val r = registrable(host.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}
