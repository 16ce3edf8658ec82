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

  test("a user-agent line after rules starts a NEW group (does not extend)") {
    val r = "User-agent: a\nDisallow: /a-only\nUser-agent: b\nDisallow: /b-only\n"
    assert(!Robots.allows(r, "a", "/a-only") && Robots.allows(r, "a", "/b-only"))
    assert(!Robots.allows(r, "b", "/b-only") && Robots.allows(r, "b", "/a-only"))
  }
}
