package graft.ops

import org.apache.spark.unsafe.types.UTF8String

/** Public-suffix-list registrable-domain resolution — the precise form
  * of `UrlOps.registrableDomain`'s documented 90% heuristic, for the
  * pipeline stages where the heuristic's misses matter (URL-keyed
  * dedup, blocklists, per-site stats: `a.github.io` and `b.github.io`
  * are DIFFERENT sites, which only suffix rules can know).
  *
  * The rule snapshot below is assembled from public knowledge (the
  * publicsuffix.org list format and its widely known entries: ICANN
  * gTLD/ccTLD registrations, registry second-levels, the classic
  * wildcard/exception pair `*.ck` / `!www.ck`, and well-known
  * private-section hosting suffixes). It is deliberately a SMALL
  * checked-in subset, not the full ~15k-line list — the loader accepts
  * the standard PSL line format, so a deployment swaps in the full
  * file without code changes.
  *
  * Scale shape: the parsed rule sets are static JVM tables (~150
  * entries here, ~15k for the full list — still kilobytes), loaded
  * once per executor from the classpath like Bpe's merge table and
  * QualityModel's weights. Resolution is a per-row O(labels) hash
  * lookup inside whole-stage codegen — never a join, never a shuffle.
  *
  * Algorithm (the PSL spec's matching rules):
  *  1. normalize: ASCII-lower (TextNorm canon), strip trailing dots;
  *  2. among all rules matching some label-suffix of the host, an
  *     EXCEPTION rule (`!www.ck`) prevails; otherwise the rule with
  *     the MOST labels; no match → the implicit `*` rule (the bare
  *     TLD is the public suffix);
  *  3. the public suffix is the matched suffix (for an exception: the
  *     rule minus its leftmost label); the registrable domain is the
  *     public suffix plus one more label — uniformly, the host's last
  *     `min(ps + 1, n)` labels (a host that IS a public suffix
  *     resolves to itself, the blocklist-join-friendly total form).
  */
object Psl {

  /** PSL-format rules: plain = exact suffix, `*.` = wildcard (any one
    * label under the base), `!` = exception to a wildcard. */
  val rules: Seq[String] = Seq(
    // ICANN gTLDs
    "com", "net", "org", "io", "ai", "co", "dev", "app", "info", "biz",
    "edu", "gov", "mil", "int", "xyz", "me", "tv", "cc", "us",
    // ccTLDs with registry second-levels (each bare TLD is also a rule)
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk",
    "ltd.uk", "plc.uk", "sch.uk",
    "au", "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "jp", "co.jp", "ac.jp", "ne.jp", "or.jp", "go.jp", "ed.jp", "gr.jp", "lg.jp",
    "br", "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "in", "co.in", "net.in", "org.in", "gov.in", "ac.in", "res.in",
    "kr", "co.kr", "or.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "cn", "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "mx", "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    "ar", "com.ar", "org.ar", "gob.ar", "net.ar", "edu.ar",
    "za", "co.za", "org.za", "gov.za", "net.za", "ac.za", "web.za",
    "nz", "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "tr", "com.tr", "org.tr", "net.tr", "gov.tr", "edu.tr",
    "tw", "com.tw", "org.tw", "net.tw", "gov.tw", "edu.tw",
    "sg", "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg",
    "hk", "com.hk", "org.hk", "net.hk", "gov.hk", "edu.hk",
    "il", "co.il", "org.il", "net.il", "gov.il", "ac.il", "muni.il",
    "th", "co.th", "go.th", "ac.th", "or.th", "in.th",
    "my", "com.my", "gov.my", "edu.my", "net.my", "org.my",
    "ke", "co.ke", "go.ke", "or.ke", "ac.ke", "ne.ke",
    "de", "fr", "nl", "eu", "ch", "it", "es", "se", "no", "pl", "ru", "ca",
    // wildcard ccTLDs (every 2-label suffix is a public suffix) + the
    // canonical exception
    "*.ck", "!www.ck", "*.bd", "*.np", "*.kw", "*.er", "*.mm",
    // private-section hosting suffixes (each customer is its own site)
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "netlify.app", "herokuapp.com", "web.app", "pages.dev", "vercel.app",
    "s3.amazonaws.com", "cloudfront.net", "fastly.net",
    "azurewebsites.net", "appspot.com"
  )

  private val exact: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    rules.foreach(r => if (!r.startsWith("*.") && !r.startsWith("!")) s.add(r))
    s
  }
  private val wildcardBase: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    rules.foreach(r => if (r.startsWith("*.")) s.add(r.substring(2)))
    s
  }
  private val exception: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    rules.foreach(r => if (r.startsWith("!")) s.add(r.substring(1)))
    s
  }

  /** Label count of the public suffix for `labels` (≥1: the implicit
    * `*` rule). */
  def publicSuffixLabels(labels: Array[String]): Int = {
    val n = labels.length
    // exception rules prevail over everything (PSL spec step 2)
    var i = n
    while (i >= 1) {
      if (exception.contains(suffixOf(labels, i))) return i - 1
      i -= 1
    }
    var best = 1 // implicit '*' rule
    i = 2 // a 1-label match can't beat the default
    while (i <= n) {
      val sfx = suffixOf(labels, i)
      if (exact.contains(sfx)) best = i
      else if (wildcardBase.contains(suffixOf(labels, i - 1)) && i > best)
        best = i
      i += 1
    }
    best
  }

  private def suffixOf(labels: Array[String], k: Int): String = {
    val n = labels.length
    if (k == 1) return labels(n - 1)
    val sb = new java.lang.StringBuilder
    var j = n - k
    while (j < n) {
      if (j > n - k) sb.append('.')
      sb.append(labels(j))
      j += 1
    }
    sb.toString
  }

  /** Registrable domain ("" for an empty host). TOTAL: any string in,
    * its registrable suffix out — IP literals and garbage fall through
    * the label logic unchanged in kind (documented; a crawl pipeline
    * filters non-DNS hosts upstream). */
  def registrable(host0: String): String = {
    var host = TextNorm.asciiLower(host0)
    var end = host.length
    while (end > 0 && host.charAt(end - 1) == '.') end -= 1
    if (end < host.length) host = host.substring(0, end)
    if (host.isEmpty) return ""
    val labels = splitLabels(host)
    val ps = publicSuffixLabels(labels)
    val take = math.min(ps + 1, labels.length)
    suffixOf(labels, take)
  }

  /** Split on '.' KEEPING interior/leading empty labels (Java split
    * drops trailing empties; trailing dots are already stripped, so
    * the two conventions agree — and match DuckDB string_split). */
  private def splitLabels(host: String): Array[String] = {
    var count = 1
    var i = 0
    while (i < host.length) { if (host.charAt(i) == '.') count += 1; i += 1 }
    val out = new Array[String](count)
    var start = 0; var k = 0; i = 0
    while (i <= host.length) {
      if (i == host.length || host.charAt(i) == '.') {
        out(k) = host.substring(start, i); k += 1; start = i + 1
      }
      i += 1
    }
    out
  }

  /** Codegen entry point. */
  def registrableU8(host: UTF8String): UTF8String =
    UTF8String.fromString(registrable(host.toString))

  /** The rule table as DuckDB VALUES rows `(kind, name, nlab)` —
    * kind 'x' exact / 'w' wildcard (name = base, matches nlab+1-label
    * suffixes) / 'e' exception (name = full suffix). Generated from
    * `rules`, so the oracle can never drift from the JVM table (the
    * QualityModel weight-literal pattern). */
  def duckdbRulesValues: String =
    rules.map { r =>
      if (r.startsWith("*.")) {
        val base = r.substring(2)
        s"('w','$base',${base.count(_ == '.') + 1})"
      } else if (r.startsWith("!")) {
        val sfx = r.substring(1)
        s"('e','$sfx',${sfx.count(_ == '.') + 1})"
      } else s"('x','$r',${r.count(_ == '.') + 1})"
    }.mkString(", ")
}
