package graft.ops

/** robots.txt evaluation (RFC 9309) — the crawl-policy gate a web-scale
  * ingestion pipeline applies before a URL's content may enter the
  * corpus. Pure function of (robots body, agent product token, path):
  *
  *  - groups: consecutive `User-agent:` lines start a group; all groups
  *    whose agent matches are COMBINED (RFC 9309 §2.2.1); a specific
  *    agent token match (case-insensitive substring per the de-facto
  *    standard) beats the `*` groups, which apply only when no specific
  *    group matched.
  *  - rules: `Allow:` / `Disallow:` path patterns with `*` wildcards
  *    and a `$` end anchor; comments (`#…`) stripped; keys
  *    case-insensitive; unknown keys ignored (Crawl-delay, Sitemap, …).
  *  - decision: the longest-pattern match wins (octet length = the RFC's
  *    specificity order); Allow wins length ties; an empty Disallow
  *    pattern matches nothing; no matching rule → allowed; an empty or
  *    missing robots body → allowed.
  *
  * Totality: any malformed line is skipped, never a throw.
  */
object Robots {
  private final case class Rule(allow: Boolean, pattern: String)

  /** Greedy `*`/`$` matcher: does `pattern` match a PREFIX of `path`
    * (full path when the pattern ends in `$`)? Iterative two-pointer
    * with backtracking over the last `*` — linear in practice, total. */
  private[ops] def patternMatches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    while (si < path.length) {
      if (pi < pat.length && (pat.charAt(pi) == path.charAt(si))) {
        pi += 1; si += 1
      } else if (pi < pat.length && pat.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (starPi >= 0) {
        pi = starPi + 1; starSi += 1; si = starSi
      } else {
        return false // mismatch with no star to absorb it
      }
      if (pi == pat.length && !anchored) return true // prefix matched
    }
    // path exhausted: remaining pattern must be all '*'
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** Parse the rule set applying to `agent` (combined specific groups,
    * else combined `*` groups). */
  private def rulesFor(robots: String, agent: String): Seq[Rule] = {
    val agentLower = agent.toLowerCase(java.util.Locale.ROOT)
    val specific = scala.collection.mutable.ArrayBuffer.empty[Rule]
    val wildcard = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var groupSpecific = false
    var groupWildcard = false
    var inAgentRun = false // consecutive user-agent lines share one group
    robots.linesIterator.foreach { raw =>
      val noComment = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) { groupSpecific = false; groupWildcard = false }
            inAgentRun = true
            val v = value.toLowerCase(java.util.Locale.ROOT)
            if (v == "*") groupWildcard = true
            else if (v.nonEmpty && agentLower.contains(v)) groupSpecific = true
          case "allow" | "disallow" =>
            inAgentRun = false
            val rule = Rule(key == "allow", value)
            if (groupSpecific) specific += rule
            if (groupWildcard) wildcard += rule
          case _ =>
            inAgentRun = false // Crawl-delay etc. end the agent run only
        }
      }
    }
    if (specific.nonEmpty) specific.toSeq else wildcard.toSeq
  }

  // A crawl frontier evaluates the SAME robots body for every URL of a
  // host (and a plan-literal body for every row) — re-parsing per row
  // was 80% of the q_crawl_policy cost. Four-slot per-thread memo of
  // parsed rule groups, keyed by (robots, agent) CONTENT equality (the
  // row decode makes a fresh String each call, so reference equality
  // never hits); front-insert LRU, linear scan — host-grouped or
  // literal workloads hit slot 0.
  private final class CacheEntry(val robots: String, val agent: String,
                                 val rules: Seq[Rule])
  private val ruleCache = new ThreadLocal[Array[CacheEntry]] {
    override def initialValue(): Array[CacheEntry] = new Array[CacheEntry](4)
  }
  private def rulesForCached(robots: String, agent: String): Seq[Rule] = {
    val cache = ruleCache.get()
    var i = 0
    while (i < cache.length) {
      val e = cache(i)
      if (e != null && e.agent == agent && e.robots == robots) {
        if (i > 0) { // move to front
          System.arraycopy(cache, 0, cache, 1, i)
          cache(0) = e
        }
        return e.rules
      }
      i += 1
    }
    val rules = rulesFor(robots, agent)
    System.arraycopy(cache, 0, cache, 1, cache.length - 1)
    cache(0) = new CacheEntry(robots, agent, rules)
    rules
  }

  /** Non-rule directives a frontier also consumes: every `Sitemap:`
    * value in FILE order (location-independent per sitemaps.org — the
    * discovery hand-off to the sitemap parser), plus the group-scoped
    * `Crawl-delay` politeness knob (de-facto extension, not RFC 9309:
    * first value in a specific-matching group beats first in a `*`
    * group; null when absent). Group tracking mirrors [[allows]]'
    * parser exactly — consecutive User-agent lines share a group, any
    * other key ends the agent run. Total on malformed input. */
  def meta(robots: String, agent: String): (Seq[String], String) = {
    if (robots == null || robots.isEmpty) return (Nil, null)
    val agentLower =
      (if (agent == null) "" else agent).toLowerCase(java.util.Locale.ROOT)
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var specificDelay: String = null
    var wildcardDelay: String = null
    var groupSpecific = false
    var groupWildcard = false
    var inAgentRun = false
    robots.linesIterator.foreach { raw =>
      val noComment = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) { groupSpecific = false; groupWildcard = false }
            inAgentRun = true
            val v = value.toLowerCase(java.util.Locale.ROOT)
            if (v == "*") groupWildcard = true
            else if (v.nonEmpty && agentLower.contains(v)) groupSpecific = true
          case "sitemap" =>
            inAgentRun = false
            if (value.nonEmpty) sitemaps += value
          case "crawl-delay" =>
            inAgentRun = false
            if (value.nonEmpty) {
              if (groupSpecific && specificDelay == null) specificDelay = value
              if (groupWildcard && wildcardDelay == null) wildcardDelay = value
            }
          case _ =>
            inAgentRun = false
        }
      }
    }
    (sitemaps.toSeq, if (specificDelay != null) specificDelay else wildcardDelay)
  }

  /** The crawl verdict: may `agent` fetch `path` under this robots
    * body? */
  def allows(robots: String, agent: String, path: String): Boolean = {
    if (robots == null || robots.isEmpty) return true
    val p = if (path == null || path.isEmpty) "/" else path
    var bestLen = -1
    var bestAllow = true
    rulesForCached(robots, agent).foreach { r =>
      if (r.pattern.nonEmpty && patternMatches(r.pattern, p)) {
        val len = r.pattern.length
        if (len > bestLen) { bestLen = len; bestAllow = r.allow }
        else if (len == bestLen && r.allow) bestAllow = true // Allow wins ties
      }
    }
    if (bestLen < 0) true else bestAllow
  }
}
