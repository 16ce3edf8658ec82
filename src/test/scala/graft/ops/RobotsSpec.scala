package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 robots.txt evaluation pins: group selection, combined
  * groups, wildcard/anchor matching, specificity + tie-breaks,
  * totality on malformed input. */
class RobotsSpec extends AnyFunSuite {

  test("pattern matcher: wildcards, anchors, backtracking") {
    assert(Robots.patternMatches("/", "/anything"))
    assert(Robots.patternMatches("/p", "/p"))
    assert(Robots.patternMatches("/p", "/page")) // prefix semantics
    assert(!Robots.patternMatches("/p$", "/page"))
    assert(Robots.patternMatches("/p$", "/p"))
    assert(Robots.patternMatches("/*.php", "/a/b/c.php?x=1"))
    assert(Robots.patternMatches("/*.php$", "/a/b/c.php"))
    assert(!Robots.patternMatches("/*.php$", "/a/b/c.php?x=1"))
    // backtracking: first '*' absorbs past a false 'b' match
    assert(Robots.patternMatches("/a*bc", "/axbxbc"))
    assert(!Robots.patternMatches("/a*bc", "/axbxbd"))
    assert(Robots.patternMatches("/a**b", "/ab")) // star runs collapse
    assert(!Robots.patternMatches("", "/x"))      // empty pattern: no match
  }

  test("longest match wins; Allow wins exact-length ties") {
    val r = "User-agent: *\nDisallow: /dir\nAllow: /dir/open\n"
    assert(!Robots.allows(r, "bot", "/dir/closed"))
    assert(Robots.allows(r, "bot", "/dir/open/file"))
    val tie = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    assert(Robots.allows(tie, "bot", "/page")) // equal length → Allow
  }

  test("specific agent group replaces the * group entirely") {
    val r = "User-agent: special\nDisallow: /s\n\nUser-agent: *\nDisallow: /\n"
    assert(!Robots.allows(r, "Special/2.0", "/s/x")) // case-insensitive token
    assert(Robots.allows(r, "special", "/other"))    // * Disallow:/ NOT applied
    assert(!Robots.allows(r, "somebody-else", "/anything"))
  }

  test("consecutive user-agent lines share one group; repeated groups combine") {
    val shared = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert(!Robots.allows(shared, "a", "/x"))
    assert(!Robots.allows(shared, "b", "/x"))
    val combined = "User-agent: *\nDisallow: /one\n\nUser-agent: *\nDisallow: /two\n"
    assert(!Robots.allows(combined, "bot", "/one") &&
      !Robots.allows(combined, "bot", "/two"))
  }

  test("comments, unknown keys, malformed lines, empty bodies are total") {
    val r = "# header\nUser-agent: * # inline\nCrawl-delay: 10\n" +
      "Disallow: /blocked # why\nSitemap: https://e.com/s.xml\n" +
      "no colon line\n: empty key\nDisallow\n"
    assert(!Robots.allows(r, "bot", "/blocked/x"))
    assert(Robots.allows(r, "bot", "/fine"))
    assert(Robots.allows("", "bot", "/x"))
    assert(Robots.allows(null, "bot", "/x"))
    assert(Robots.allows("User-agent: *\nDisallow:\n", "bot", "/x")) // empty = none
    assert(!Robots.allows("User-agent: *\nDisallow: /\n", "bot", "/")) // root block
    assert(Robots.allows("User-agent: *\nDisallow: /x\n", "bot", null)) // null path → "/"
  }

  test("meta: sitemap file order, group-scoped crawl-delay, totality") {
    val r = "Sitemap: https://e.com/a.xml # first\n" +
      "User-agent: bot\nCrawl-delay: 7\nCrawl-delay: 9\nDisallow: /x\n" +
      "User-agent: *\nCrawl-delay: 3\n" +
      "Sitemap: https://e.com/b.xml\nSITEMAP: https://e.com/c.xml\n"
    // sitemaps are location-independent, file order, case-insensitive key
    assert(Robots.meta(r, "botty/1.0") == ((Seq("https://e.com/a.xml",
      "https://e.com/b.xml", "https://e.com/c.xml"), "7"))) // FIRST specific
    assert(Robots.meta(r, "other/2.0")._2 == "3")           // wildcard group
    assert(Robots.meta("User-agent: *\nDisallow:\n", "b") == ((Nil, null)))
    assert(Robots.meta("", "b") == ((Nil, null)))
    assert(Robots.meta(null, "b") == ((Nil, null)))
    assert(Robots.meta("Sitemap:\nno colon\n: x\n", "b") == ((Nil, null)))
    // a crawl-delay OUTSIDE any matching group is invisible
    assert(Robots.meta("User-agent: z\nCrawl-delay: 4\n", "b") == ((Nil, null)))
  }

  test("a user-agent line after rules starts a NEW group (does not extend)") {
    val r = "User-agent: a\nDisallow: /a-only\nUser-agent: b\nDisallow: /b-only\n"
    assert(!Robots.allows(r, "a", "/a-only") && Robots.allows(r, "a", "/b-only"))
    assert(!Robots.allows(r, "b", "/b-only") && Robots.allows(r, "b", "/a-only"))
  }
}
