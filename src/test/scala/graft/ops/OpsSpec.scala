package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("dedup clusters: label propagation finds connected components") {
    import spark.implicits._
    // components: {1,2,3,4} via chain 1-2,2-3,3-4; {10,11}; singletons 20,21
    val ids = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.clusters(ids, "id", pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("redirects: exact hop counts, terminals, cycles, lead-ins, cap, nulls") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"),        // chain a->b->c->d (terminal)
      ("s", "s"),                                // self-loop
      ("p", "q"), ("q", "r"), ("r", "q"),        // lead-in p into cycle q<->r
      (null, "z"), ("y", null)                   // dropped endpoints
    ).toDF("src", "dst")
    val got = Redirects.resolve(edges, "src", "dst", maxHops = 8).collect()
      .map(r => r.getString(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getBoolean(3)))).toMap
    assert(got == Map(
      "a" -> ((Some("d"), Some(3L), false)),
      "b" -> ((Some("d"), Some(2L), false)),
      "c" -> ((Some("d"), Some(1L), false)),
      "s" -> ((None, None, true)),
      "p" -> ((None, None, true)),
      "q" -> ((None, None, true)),
      "r" -> ((None, None, true))))
    // over-cap acyclic chain is declared cyclic — the cap IS the semantics
    val long = (0 until 10).map(i => (s"n$i", s"n${i + 1}")).toDF("src", "dst")
    val capped = Redirects.resolve(long, "src", "dst", maxHops = 4).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(capped("n9") == false)   // 1 hop to the n10 terminal
    assert(capped("n0") == true)    // 10 hops > cap 4
    // and wide enough caps resolve it exactly
    val full = Redirects.resolve(long, "src", "dst", maxHops = 16).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(full("n0") == (("n10", 10L)) && full("n5") == (("n10", 5L)))
  }

  test("perKeyTopStrings: count order, codepoint tie-break, cap, null drop") {
    import spark.implicits._
    val counted = Seq(
      ("d1", "beta", 5L), ("d1", "alpha", 5L), ("d1", "zeta", 9L),
      ("d1", "gamma", 1L), ("d1", "delta", 1L),
      // astral tie-break: U+10000 (astral) must rank BELOW U+FFFD in
      // codepoint order even though String.compareTo says otherwise
      ("d2", "�", 3L), ("d2", new String(Character.toChars(0x10000)), 3L),
      ("d3", null, 7L), ("d3", "only", 1L)
    ).toDF("key", "text", "cnt")
    val got = TopK.perKeyTopStrings(counted, k = 3).collect()
      .map(r => (r.getString(0), r.getInt(3)) -> r.getString(1)).toMap
    assert(got(("d1", 1)) == "zeta" && got(("d1", 2)) == "alpha" &&
      got(("d1", 3)) == "beta")
    assert(!got.contains(("d1", 4)))                  // gamma/delta capped
    assert(got(("d2", 1)) == "�")                // codepoint < astral
    assert(got(("d2", 2)) == new String(Character.toChars(0x10000)))
    assert(got(("d3", 1)) == "only")                  // null text dropped
    assert(TextNorm.cpCompare(new String(Character.toChars(0x10000)), "�") > 0
      && new String(Character.toChars(0x10000)).compareTo("�") < 0)
  }

  test("sitemap kernel: urlset + index, first-match fields, null vs empty, recovery") {
    import spark.implicits._
    graft.spark.GraftFunctions.registerAll(spark)
    val xml =
      "<?xml version=\"1.0\"?><urlset>" +
        "<url><loc>https://a.com/&amp;x</loc><lastmod>2024-01-01</lastmod>" +
        "<lastmod>ignored-second</lastmod><priority>0.5</priority></url>" +
        "<url><lastmod>2024-02-02</lastmod></url>" + // loc ABSENT -> null
        "<url><loc></loc></url>" +                    // loc EMPTY  -> ''
        "<sitemap><loc>https://a.com/s1.xml</loc></sitemap>" +
        "</urlset>"
    val rows = Seq(xml).toDF("x")
      .selectExpr("inline(graft_sitemap(x))")
      .orderBy("entry_id").collect()
    assert(rows.length == 4)
    assert(rows(0).getString(1) == "url" &&
      rows(0).getString(2) == "https://a.com/&x" &&      // entity decoded
      rows(0).getString(3) == "2024-01-01" &&            // FIRST lastmod
      rows(0).getString(4) == "0.5")
    assert(rows(1).isNullAt(2) && rows(1).getString(3) == "2024-02-02")
    assert(rows(2).getString(2) == "" && rows(2).isNullAt(3))
    assert(rows(3).getString(1) == "sitemap" &&
      rows(3).getString(2) == "https://a.com/s1.xml" && rows(3).isNullAt(3))
    // tolerant recovery: unclosed <url>, stray text, truncated file
    val broken = "<urlset><url><loc>https://b.com/p?a=1&b=2</loc>junk<url>" +
      "<loc>https://b.com/q"
    val r2 = Seq(broken).toDF("x")
      .selectExpr("inline(graft_sitemap(x))").orderBy("entry_id").collect()
    assert(r2.length == 2 &&
      r2(0).getString(2) == "https://b.com/p?a=1&b=2" && // bare & recovered
      r2(1).getString(2) == "https://b.com/q")           // EOF-truncated loc
  }

  test("feed kernel: rss item void-link recovery, atom href, first-match, nulls") {
    import spark.implicits._
    graft.spark.GraftFunctions.registerAll(spark)
    val rss = "<rss><channel><title>chan</title>" +
      "<item><title>T1 &amp; more</title><link>https://a.com/1</link>" +
      "<pubDate>Mon, 01 Jan 2024</pubDate><guid>g1</guid>" +
      "<title>second-ignored</title></item>" +
      "<item><pubDate>Tue</pubDate></item>" + // no title/link/guid -> nulls
      "</channel></rss>"
    val r = Seq(rss).toDF("x").selectExpr("inline(graft_feed(x))")
      .orderBy("entry_id").collect()
    assert(r.length == 2)
    // channel title must NOT leak into the item; &amp; decodes; the
    // void <link> recovers its URL from the following text sibling
    assert(r(0).getString(1) == "item" && r(0).getString(2) == "T1 & more" &&
      r(0).getString(3) == "https://a.com/1" &&
      r(0).getString(4) == "Mon, 01 Jan 2024" && r(0).getString(5) == "g1")
    assert(r(1).isNullAt(2) && r(1).isNullAt(3) &&
      r(1).getString(4) == "Tue" && r(1).isNullAt(5))
    val atom = "<feed><entry><title>A</title>" +
      "<link rel=\"alternate\" href=\"https://b.com/e1\"/>" +
      "<updated>2024-02-02</updated><id>i1</id></entry>" +
      "<entry><title>B</title><link/></entry>" + // href-less void link -> ''
      "</feed>"
    val a = Seq(atom).toDF("x").selectExpr("inline(graft_feed(x))")
      .orderBy("entry_id").collect()
    assert(a(0).getString(1) == "entry" && a(0).getString(3) == "https://b.com/e1" &&
      a(0).getString(4) == "2024-02-02" && a(0).getString(5) == "i1")
    assert(a(1).getString(3) == "" && a(1).isNullAt(4))
  }

  test("minhash catches planted near-duplicates end to end") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again " * 5
    val docs = Seq(
      (0L, base),
      (1L, base + " tail"),                      // near-dup of 0
      (2L, base.replace("quick", "rapid")),      // near-dup of 0
      (3L, "completely different content with nothing shared at all " * 5)
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
      k = 64, bands = 16, jaccardThreshold = 0.5)
    val found = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((0L, 1L)))
    assert(found.contains((0L, 2L)))
    assert(!found.exists(p => p._1 == 3L || p._2 == 3L))
    // clusters: {0,1,2} together, 3 alone
    val cl = Dedup.clusters(docs.select("doc_id"), "doc_id", pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(0L) == 0L && cl(1L) == 0L && cl(2L) == 0L && cl(3L) == 3L)
  }

  test("simhash hamming on near-identical texts is small") {
    val a = TextOps.simhash64("the quick brown fox jumps over the lazy dog " * 10)
    val b = TextOps.simhash64(("the quick brown fox jumps over the lazy dog " * 10) + "tail words")
    val c = TextOps.simhash64("entirely unrelated writing about spark plans " * 10)
    assert(TextOps.hamming64(a, b) < 12)
    assert(TextOps.hamming64(a, c) > TextOps.hamming64(a, b))
  }

  test("langid marker heuristic picks the dominant language") {
    assert(TextOps.langIdHeuristic("the cat and the dog is on the mat") == "en")
    assert(TextOps.langIdHeuristic("der hund und die katze ist nicht da") == "de")
    assert(TextOps.langIdHeuristic("") == "und")
  }

  test("line dedup: common lines dropped, order kept, all-boilerplate docs empty") {
    import spark.implicits._
    val docs = (0 until 20).map { i =>
      if (i == 19) (i.toLong, "SHARED HEADER\nshared footer") // fully boilerplate
      else (i.toLong, s"SHARED HEADER\nunique first $i\nmiddle $i common-ish\nshared footer\nunique last $i")
    }.toDF("doc_id", "t")
    val out = Dedup.lineDedup(docs, "doc_id", "t", maxDocFreq = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 20, "every input row must come back")
    assert(out(3L) == "unique first 3\nmiddle 3 common-ish\nunique last 3",
      s"order/selection wrong: ${out(3L)}")
    assert(out(19L) == "", "fully-boilerplate doc must come back empty")
    // normalization: case/whitespace variants of a common line still drop
    val varied = ((0 until 10).map(i => (i.toLong, s"  Shared Header \nkeep $i")) :+
      (10L, "SHARED HEADER\nkeep 10")).toDF("doc_id", "t")
    val out2 = Dedup.lineDedup(varied, "doc_id", "t", maxDocFreq = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2(10L) == "keep 10" && out2(0L) == "keep 0")
    // production hash path agrees with the oracle path
    val p = Dedup.lineDedup(docs, "doc_id", "t", maxDocFreq = 5, oracleHash = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(p == out)
  }

  test("paragraph dedup: first occurrence wins, within-doc dups drop, ws-exempt") {
    import spark.implicits._
    val docs = Seq(
      (5L, "BANNER\n\nunique five\n\nunique five\n\n \n\ntail"),
      (2L, "BANNER\n\nunique two\n\ntail"),
      (9L, "BANNER\n\nunique nine")).toDF("doc_id", "t")
    val out = Dedup.paragraphDedup(docs, "doc_id", "t")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out.size == 3, "every input row must come back")
    // doc 2 has the smallest id: keeps BANNER and the first 'tail'
    assert(out(2L)._1 == "BANNER\n\nunique two\n\ntail", s"got ${out(2L)}")
    assert(out(2L)._2 == 0L)
    // doc 5: loses BANNER (first-wins at doc 2), loses the WITHIN-DOC
    // body duplicate and the corpus-dup 'tail'; the ws-only separator
    // is exempt and survives
    assert(out(5L)._1 == "unique five\n\n ", s"got ${out(5L)}")
    assert(out(5L)._2 == 3L)
    assert(out(9L)._1 == "unique nine" && out(9L)._2 == 1L)
    // normalization: case/pad variants of a paragraph are the same key
    val varied = Seq((1L, "Shared Para\n\nkeep one"),
      (3L, "  shared para \n\nkeep three")).toDF("doc_id", "t")
    val v = Dedup.paragraphDedup(varied, "doc_id", "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v(1L) == "Shared Para\n\nkeep one" && v(3L) == "keep three")
    // totality: null text comes back ("", 0); oracle path agrees
    val withNull = docs.unionByName(Seq((7L, null: String)).toDF("doc_id", "t"))
    val t = Dedup.paragraphDedup(withNull, "doc_id", "t", oracleHash = true)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(t(7L) == ("", 0L))
    assert(t(5L) == out(5L) && t(2L) == out(2L))
  }

  test("capPerKey: quota, tie-break on id, null/NaN scores lose") {
    import spark.implicits._
    val rows = Seq(
      ("a.com", 1L, Some(10.0)), ("a.com", 2L, Some(30.0)),
      ("a.com", 3L, Some(30.0)), ("a.com", 4L, None),
      ("a.com", 5L, Some(Double.NaN)),
      ("b.com", 9L, Some(1.0))).toDF("domain", "doc_id", "score")
    val out = Sample.capPerKey(rows, "domain", "doc_id", "score", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    // ties (2,3) break on id; null (4) and NaN (5) lose to every real
    // score but may not enter the k=3 quota at all here
    assert(out == Map(("a.com", 2L) -> 1, ("a.com", 3L) -> 2,
      ("a.com", 1L) -> 3, ("b.com", 9L) -> 1), s"got $out")
    // under-quota key with only a null score still fills a slot
    val solo = Sample.capPerKey(
        Seq(("c.com", 7L, None: Option[Double])).toDF("domain", "doc_id", "score"),
        "domain", "doc_id", "score", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(solo.toSeq == Seq(("c.com", 7L, 1)))
  }

  test("domainBoilerplate: template drops only inside its domain; order kept") {
    import spark.implicits._
    // "promo" saturates domain A (3 docs > maxDomainFreq=2) but appears
    // once in domain B — it must drop from A's docs and SURVIVE in B's.
    val rows = Seq(
      (1L, Some("a"), "promo\nbody one"),
      (2L, Some("a"), "body two\npromo"),
      (3L, Some("a"), "PROMO \nbody three"), // TextNorm trim+lower key
      (4L, Some("b"), "promo\nbody four"),
      (5L, None: Option[String], "solo"), // null domain → '' scope, total
      (6L, Some("a"), null.asInstanceOf[String])).toDF("doc_id", "dom", "t")
    val out = Dedup.domainBoilerplate(rows, "doc_id", "dom", "t",
        maxDomainFreq = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ("a", "body one", 1L, 1L))
    assert(out(2L) == ("a", "body two", 1L, 1L))
    assert(out(3L) == ("a", "body three", 1L, 1L))
    assert(out(4L) == ("b", "promo\nbody four", 2L, 0L), s"got ${out(4L)}")
    assert(out(5L) == ("", "solo", 1L, 0L))
    assert(out(6L) == ("a", "", 0L, 0L)) // null text: zero lines, total
  }

  test("invertedIndex: per-doc-distinct df, ascending posting cap, band cuts") {
    import spark.implicits._
    val rows = Seq(
      (10L, "alpha alpha beta common"), // repeated token counts ONCE for df
      (7L, "alpha common"), (3L, "alpha common"),
      (5L, "alpha common"), (9L, "alpha common"), (11L, "alpha common"),
      (2L, "alpha common solo"), (4L, "common"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "t")
    val out = graft.ops.TextOps.invertedIndex(rows, "doc_id", "t",
        k = 5, minDf = 2, maxDf = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // common df=8 > maxDf (cut); beta/solo df=1 < minDf (cut). alpha
    // survives ONLY because the doubled token in doc 10 counts once:
    // double-counting would read df=8 and cut it too.
    assert(out.forall(_._1 == "alpha"), s"got ${out.toSeq}")
    val alpha = out.sortBy(_._4)
    assert(alpha.map(_._2).forall(_ == 7L), s"per-doc-distinct df: $alpha")
    // postings: the 5 SMALLEST doc ids, rank ascending (10, 11 capped)
    assert(alpha.map(x => (x._3, x._4)).toSeq ==
      Seq((2L, 1), (3L, 2), (5L, 3), (7L, 4), (9L, 5)))
  }

  test("snapshotDiff: delta classes, null-content canon, unchanged rows drop") {
    import spark.implicits._
    val a = Seq(
      (1L, Some("same"), Some("en")), (2L, Some("old"), Some("en")),
      (3L, Some("gone"), None), (5L, None, Some("de")),
      (6L, None, None)).toDF("doc_id", "text", "lang")
    val b = Seq(
      (1L, Some("same"), Some("en")), (2L, Some("new"), Some("en")),
      (4L, Some("born"), Some("fr")), (5L, Some(""), Some("de")),
      (6L, None, Some(""))).toDF("doc_id", "text", "lang")
    val out = SnapshotDiff.delta(a, b, "doc_id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 unchanged (dropped), 2 changed, 3 removed, 4 added,
    // 5 unchanged (null text == '' under the canon — dropped),
    // 6 unchanged (null lang == '')
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"),
      s"got $out")
    // added/removed coalesce their absent hash to ''
    val byId = SnapshotDiff.delta(a, b, "doc_id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    assert(byId(3L)._2 == "" && byId(4L)._1 == "")
    assert(byId(2L)._1.nonEmpty && byId(2L)._2.nonEmpty && byId(2L)._1 != byId(2L)._2)
  }

  test("slidingChunks: codepoint windows, overlap reconstruction, totality") {
    import spark.implicits._
    // astral-heavy corpus: every element is ONE codepoint, many are two
    // UTF-16 units — charAt-based window arithmetic would split surrogates
    val cps = (0 until 487).map(i =>
      if (i % 3 == 0) new String(Character.toChars(0x1D400 + (i % 80)))
      else ('a' + i % 26).toChar.toString)
    val text = cps.mkString
    val (size, overlap, stride) = (50, 10, 40)
    val df = Seq((1L, text), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, cps.take(50).mkString), (5L, cps.take(51).mkString))
      .toDF("doc_id", "text")
    val out = Pack.slidingChunks(df, "doc_id", "text", size, overlap)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    // totality: null and empty text emit zero chunks
    assert(!out.exists(r => r._1 == 2L || r._1 == 3L))
    // len == size → 1 chunk; len == size+1 → 2 (final extends one cp past)
    assert(out.count(_._1 == 4L) == 1 && out.count(_._1 == 5L) == 2)
    val c1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(c1.length == 12, s"n = 2 + (487-51) div 40 = 12, got ${c1.length}")
    c1.foreach { case (_, i, st, txt) =>
      assert(st == i.toLong * stride)
      assert(txt == cps.slice(i * stride, i * stride + size).mkString,
        s"chunk $i window drifted")
    }
    // stripping each tail chunk's overlap reconstructs the document
    val rebuilt = c1.head._4 + c1.tail.map { case (_, _, _, txt) =>
      val a = txt.codePoints.toArray
      new String(a, overlap, a.length - overlap)
    }.mkString
    assert(rebuilt == text)
  }

  test("compression-ratio quality signal separates repetition from prose") {
    val template = "click here buy now " * 200
    val prose = (0 until 120).map(i =>
      s"sentence $i mentions topic${i % 37} and idea${(i * 7) % 53} differently").mkString(". ")
    val rTemplate = TextOps.compressRatioPermille(template)
    val rProse = TextOps.compressRatioPermille(prose)
    assert(rTemplate < 100, s"heavy repetition must compress hard: $rTemplate")
    assert(rProse > rTemplate * 2, s"prose must compress less: $rProse vs $rTemplate")
    assert(TextOps.compressRatioPermille("") == 1000)
    // deterministic across calls (fixed deflate level)
    assert(TextOps.compressRatioPermille(prose) == rProse)
    // SQL surface
    import spark.implicits._
    graft.spark.GraftFunctions.registerAll(spark)
    val got = Seq(template, prose).toDF("t")
      .selectExpr("graft_compress_ratio(t) AS r").collect().map(_.getInt(0))
    assert(got(0) == rTemplate && got(1) == rProse)
  }

  test("char-shingle kernels fix the CJK token-degeneration gap") {
    // unsegmented text: token kernels see ONE token, so near-dups read
    // J=0 (or 1 for exact) — the shingle kernels measure real overlap
    val a = "这是一个很长的中文句子没有任何空格分词在这里完全失效"
    val b = "这是一个很长的中文句子没有任何空格分词在这里基本失效"  // 2-char diff
    assert(TextOps.jaccardTokens(a, b) == 0.0, "token jaccard must degenerate")
    val js = TextOps.jaccardShingles(a, b, 3)
    assert(js > 0.6 && js < 1.0, s"shingle jaccard should see the overlap: $js")
    assert(TextOps.jaccardShingles(a, a, 3) == 1.0)
    // signature agreement follows the same pattern
    val sa = TextOps.minhashShingle(a, 32, 3)
    val sb = TextOps.minhashShingle(b, 32, 3)
    val agree = sa.zip(sb).count { case (x, y) => x == y } / 32.0
    assert(agree > 0.4, s"shingle signature agreement too low: $agree")
    // short-text edge: below n, one whole-text shingle
    assert(TextOps.jaccardShingles("ab", "ab", 3) == 1.0)
    assert(TextOps.jaccardShingles("ab", "cd", 3) == 0.0)
    // whitespace normalization shared with the token path
    assert(TextOps.jaccardShingles("x  y", "x y", 3) == 1.0)
  }

  test("url canonicalization: ports, fragments, query sort, registrable domain") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://WWW.Ex.COM:80/a/b?z=1&a=2#frag",   // default port + case + sort + frag
      "https://ex.com:443/",                      // https default port
      "http://ex.com:8080/x",                     // non-default port kept
      "https://sub.shop.co.uk",                   // empty path, registry-prefix TLD
      "http://localhost/p",                       // single-label host
      "not a url at all")
      .toDF("u")
    import graft.ops.UrlOps
    val got = urls.select(
      UrlOps.normalize(col("u")).as("n"),
      UrlOps.registrableDomain(UrlOps.host(col("u"))).as("d")).collect()
    assert(got(0).getString(0) == "http://www.ex.com/a/b?a=2&z=1")
    assert(got(0).getString(1) == "ex.com")
    assert(got(1).getString(0) == "https://ex.com/")
    assert(got(2).getString(0) == "http://ex.com:8080/x")
    assert(got(3).getString(0) == "https://sub.shop.co.uk/")
    assert(got(3).getString(1) == "shop.co.uk")
    assert(got(4).getString(1) == "localhost")
    // non-URL: scheme/host empty, normalize degrades to "://" + "/" —
    // callers filter on scheme != '' first; must not throw
    assert(got(5).getString(0) != null)
    // blocklist: subdomain + port + case variants of a blocked domain
    // all drop; an empty blocklist keeps everything
    val rows = Seq(
      (1L, "https://a.b.Example.COM:8443/x"), // subdomain+port+case → blocked
      (2L, "https://example.com/y"),          // apex → blocked
      (3L, "https://examplexcom.org/z"),      // different domain → kept
      (4L, "https://sub.bad.co.uk/w"))        // registry-prefix TLD → blocked
      .toDF("id", "url")
    val blocked = Seq("Example.com", "bad.co.uk").toDF("domain")
    val kept = UrlOps.blocklistFilter(rows, "url", blocked, "domain")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
    val none = Seq.empty[String].toDF("domain")
    assert(UrlOps.blocklistFilter(rows, "url", none, "domain").count() == 4)
  }

  test("multimodal real header decode: png/jpeg/gif byte formats") {
    import graft.spark.MediaUdfs.decodeHeader
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // PNG 640x480, bit depth 8, color type 6
    val png = bytes("89504E470D0A1A0A0000000D49484452" +
      "00000280000001E0" + "0806000000000000")
    assert(decodeHeader(png) == ("png", 640, 480, 8))
    // PNG with a non-IHDR first chunk is malformed per spec
    val badPng = bytes("89504E470D0A1A0A0000000D73524742" +
      "00000280000001E0" + "0806000000000000")
    assert(decodeHeader(badPng)._1 == "unknown")
    // JPEG: APP0 + COM + DRI + fill bytes + RST before a PROGRESSIVE SOF2
    val jpg = bytes("FFD8" +
      "FFE000104A46494600010100000100010000" + // APP0 (16)
      "FFFE0005414141" +                       // COM len 5, 3 bytes payload
      "FFDD0004001E" +                         // DRI len 4
      "FFFFFF" + "D3" +                        // fill bytes + RST3 (standalone)
      "FFC2000B08" + "0100" + "0200" + "01011100" + // SOF2: h=256 w=512 prec 8
      "FFD9")
    assert(decodeHeader(jpg) == ("jpeg", 512, 256, 8))
    // JPEG with EOI before any SOF → unknown
    assert(decodeHeader(bytes("FFD8FFD9"))._1 == "unknown")
    // GIF89a 322x204 little-endian, color resolution 8 (flags F7)
    val gif = bytes("474946383961" + "4201" + "CC00" + "F70000")
    assert(decodeHeader(gif) == ("gif", 322, 204, 8))
    // GIF87a variant + lower color resolution (flags 0x22 → depth 3)
    val gif87 = bytes("474946383761" + "1000" + "2000" + "220000")
    assert(decodeHeader(gif87) == ("gif", 16, 32, 3))
    // WEBP lossy (VP8): start code + 14-bit LE dims (here 322x204),
    // scale bits (top 2) masked off the width
    val webp = bytes("52494646" + "16000000" + "57454250" +
      "56503820" + "0A000000" + "000000" + "9D012A" + "4241" + "CC00")
    assert(decodeHeader(webp) == ("webp", 322, 204, 8)) // 0x4142 & 0x3FFF
    // WEBP lossless (VP8L): 2F sig + packed minus-one dims (16x32)
    val bitsL = (16 - 1) | ((32 - 1) << 14) // 0x7C00F
    val webpl = bytes("52494646" + "12000000" + "57454250" +
      "5650384C" + "05000000" + "2F" + "0FC00700" + "00")
    assert((bitsL & 0xFF, (bitsL >> 8) & 0xFF, (bitsL >> 16) & 0xFF) ==
      ((0x0F, 0xC0, 0x07)))
    assert(decodeHeader(webpl) == ("webp", 16, 32, 8))
    // WEBP extended (VP8X) behind a skipped leading chunk with an ODD
    // size (word-alignment walk): 24-bit LE canvas minus-one (640x480)
    val webpx = bytes("52494646" + "24000000" + "57454250" +
      "4A554E4B" + "03000000" + "414141" + "00" + // JUNK size 3 + pad
      "56503858" + "0A000000" + "00000000" + "7F0200" + "DF0100")
    assert(decodeHeader(webpx) == ("webp", 640, 480, 8))
    // bad VP8 start code → unknown
    val badWebp = bytes("52494646" + "16000000" + "57454250" +
      "56503820" + "0A000000" + "000000" + "9D012B" + "4201" + "CC00")
    assert(decodeHeader(badWebp)._1 == "unknown")
    // truncation at every prefix length never throws, short ones unknown
    for (full <- Seq(png, jpg, gif, webp, webpl, webpx); n <- 0 until full.length)
      decodeHeader(full.take(n)) // total function — must not throw
    assert(decodeHeader(Array.emptyByteArray)._1 == "unknown")
    assert(decodeHeader(null)._1 == "unknown")
    // typed Dataset path agrees with the kernel
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow("p", "image", png, 0, 0, 0L),
      Multimodal.MediaRow("j", "image", jpg, 0, 0, 0L),
      Multimodal.MediaRow("g", "image", gif, 0, 0, 0L),
      Multimodal.MediaRow("x", "image", "garbage".getBytes, 0, 0, 0L)).toDS()
    val hdrs = Multimodal.decodeHeaders(rows).collect().map(h => h.media_id -> h).toMap
    assert(hdrs("p").width == 640 && hdrs("p").height == 480 && hdrs("p").ok)
    assert(hdrs("j").format == "jpeg" && hdrs("j").width == 512)
    assert(hdrs("g").format == "gif" && hdrs("g").height == 204)
    assert(!hdrs("x").ok && hdrs("x").width == -1)
  }

  test("wav header decode: fmt chunk walk, junk skipping, alignment, totality") {
    import graft.spark.MediaUdfs.decodeAudioHeader
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // canonical PCM: stereo 44100 Hz 16-bit
    val wav = bytes("52494646" + "24000000" + "57415645" +
      "666D7420" + "10000000" + "0100" + "0200" + "44AC0000" +
      "10B10200" + "0400" + "1000" + "64617461" + "00000000")
    assert(decodeAudioHeader(wav) == ("wav", 2, 44100, 16))
    // a JUNK chunk with an ODD size before fmt: the walk must honor the
    // RIFF word-alignment pad or land misaligned and miss fmt
    val junked = bytes("52494646" + "24000000" + "57415645" +
      "4A554E4B" + "03000000" + "41414100" + // JUNK size 3 + 1 pad byte
      "666D7420" + "10000000" + "0100" + "0100" + "80BB0000" +
      "00EE0200" + "0200" + "1800" + "64617461" + "00000000")
    assert(decodeAudioHeader(junked) == ("wav", 1, 48000, 24))
    // truncation at every prefix never throws; non-RIFF unknown
    for (n <- 0 until wav.length) decodeAudioHeader(wav.take(n))
    assert(decodeAudioHeader("RIFFxxxxWAVE".getBytes)._1 == "unknown") // no chunks
    assert(decodeAudioHeader("OggS anything".getBytes)._1 == "unknown")
    assert(decodeAudioHeader(null)._1 == "unknown")
  }

  test("mp4 box walk: ftyp brand, mvhd v0/v1, largesize, totality") {
    import graft.spark.MediaUdfs.decodeVideoHeader
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // ftyp(isom) + free + moov[mvhd v0: timescale 1000, duration 5000]
    val v0 = bytes("0000001066747970" + "69736F6D" + "00000000" +
      "0000000866726565" +
      "000000246D6F6F76" +
      "0000001C6D766864" + "00000000" + "00000000" + "00000000" +
      "000003E8" + "00001388")
    assert(decodeVideoHeader(v0) == ("isom", 1000, 5000L, true))
    // mvhd v1: 64-bit times, timescale 90000, duration 450000 -> 5000ms
    val v1 = bytes("0000001066747970" + "6D703432" + "00000000" +
      "000000306D6F6F76" +
      "000000286D766864" + "01000000" +
      "0000000000000000" + "0000000000000000" +
      "00015F90" + "000000000006DDD0")
    assert(decodeVideoHeader(v1) == ("mp42", 90000, 5000L, true))
    // largesize (size==1 + u64) wrapping a free box before ftyp
    val large = bytes("0000000166726565" + "0000000000000010" +
      "0000001066747970" + "61766331" + "00000000")
    val (brand, _, _, _) = decodeVideoHeader(large)
    assert(brand == "avc1")
    // truncation at every prefix never throws; garbage unknown
    for (n <- 0 until v1.length) decodeVideoHeader(v1.take(n))
    assert(!decodeVideoHeader("RIFFxxxxWAVE".getBytes)._4)
    assert(decodeVideoHeader(null)._1 == "")
  }

  test("multimodal stub: deterministic features, batch plumbing") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow("a", "image", "payload-bytes".getBytes, 8, 8, 0L),
      Multimodal.MediaRow("b", "video", "other".getBytes, 8, 8, 7000L),
      Multimodal.MediaRow("c", "audio", Array.emptyByteArray, 0, 0, 0L)
    ).toDS()
    val feats = Multimodal.extractFeatures(rows, dim = 8).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats("a").ok && feats("a").feature.length == 8)
    assert(feats("b").frames_sampled == 7)
    assert(!feats("c").ok)
    // deterministic: same payload, same features
    val again = Multimodal.extractFeatures(rows, dim = 8).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(again("a") == feats("a").feature.toSeq)
  }

  test("repetition signals: hand-computed pins, codepoint lengths, totality") {
    // text: dup line pair, two paragraphs, repeated "a b" / "c d" bigrams
    val r = TextOps.repetition("a b\na b\n\nc d c d")
    assert(r.toSeq == Seq(
      3, 1, 13, 3,  // lines: {a b, a b, c d c d}; one dup of 3 chars
      2, 0,         // paras: {a b\na b, c d c d}
      15,           // tokens a b a b c d c d joined = 15 chars
      6,            // top2: "a b"x2 (ties with "c d"x2 -> lexicographic min), 2*3
      5,            // top3: all count 1 -> min "a b a", 1*5
      7),           // top4: min "a b a b", 1*7
      s"got ${r.toSeq}")
    // lengths are CODE POINTS (DuckDB length() semantics): the 4-byte
    // emoji counts as one char, not two UTF-16 units
    val e = TextOps.repetition("😀 x\n😀 x")
    assert(e.toSeq.take(4) == Seq(2, 1, 6, 3), s"got ${e.toSeq}")
    // totality: empty and whitespace-only inputs
    assert(TextOps.repetition("").toSeq == Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    assert(TextOps.repetition(" \n \n ").toSeq ==
      Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    // single token: no bigrams
    assert(TextOps.repetition("word").toSeq ==
      Seq(1, 0, 4, 0, 1, 0, 4, 0, 0, 0))
  }

  test("lm familiarity: trained table pinned, separation floor, codepoint windows") {
    // the table trains at class load from QualityModel.GoodSeed — these
    // pins move DELIBERATELY with any seed change
    assert(LmModel.levels.max == 5, s"max level ${LmModel.levels.max}")
    assert(LmModel.levels.count(_ > 0) == 358,
      s"trained buckets ${LmModel.levels.count(_ > 0)}")
    // the mean-level >= 2 gate separates held-out prose from junk
    val good = Seq(
      "the committee discussed the annual report and the public transit study",
      "researchers observed the coastal region over the spring and summer")
    val junk = Seq("xq zv qq kk vw jj zz xq zv qq",
      "zzzz qqqq wwww kkkk jjjj xxxx")
    good.foreach(t => assert(LmModel.score(t) >= 2L * LmModel.nTrigrams(t),
      s"prose under the gate: $t"))
    junk.foreach(t => assert(LmModel.score(t) < 2L * LmModel.nTrigrams(t),
      s"junk over the gate: $t"))
    // totality + canon stream (ws collapse, ASCII-lower fold)
    assert(LmModel.score("") == 0 && LmModel.nTrigrams("") == 0)
    assert(LmModel.score("ab") == 0)
    assert(LmModel.score("  a  b  ") == LmModel.score("a b"))
    assert(LmModel.score("The Committee") == LmModel.score("the committee"))
    // astral char is ONE window position (DuckDB substr semantics)
    assert(LmModel.nTrigrams("a🚀b") == 1)
  }

  test("c4/gopher battery: hand-computed pins, char-class edges, totality") {
    // lines: "Good line." kept; "- bullet" bullet; "trails off..."
    // ellipsis AND kept (it ends in '.'); "• dot bullet" bullet;
    // the last line neither. 13 tokens, 10 with an ASCII letter
    // ('-', '•', '42' without); stop hits: with, the.
    val t = "Good line.\n- bullet\ntrails off...\n• dot bullet\nplain with the 42"
    val r = TextOps.c4Rules(t)
    assert(r.toSeq == Seq(5, 2, 2, 1, 13, 10, 2, 0, 0), s"got ${r.toSeq}")
    // C4 page flags: lowered lorem-ipsum match; brace anywhere
    assert(TextOps.c4Rules("LoReM IpSuM dolor").toSeq(7) == 1)
    assert(TextOps.c4Rules("code { }").toSeq(8) == 1)
    // quote and ? and ! terminal lines kept; U+2026 is an ellipsis end;
    // a CRLF line end trims its CR before the last-char test (6 lines)
    assert(TextOps.c4Rules("He said \"hi.\"\nReally?\nYes!\nwait…\nmid.\r\nline").toSeq.take(4)
      == Seq(6, 4, 0, 1))
    // astral last char is not terminal (surrogate half never equals BMP)
    assert(TextOps.c4Rules("ends astral 𝕏").toSeq.take(2) == Seq(1, 0))
    // totality
    assert(TextOps.c4Rules("").toSeq == Seq(0, 0, 0, 0, 0, 0, 0, 0, 0))
    assert(TextOps.c4Rules(" \n \n ").toSeq == Seq(0, 0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("bpe: trained merges pinned, true-BPE encodes, oracle-chain equivalence, ratios") {
    // merge-table head pin: the seed corpus is checked in, so training
    // is deterministic — a drift here silently moves q_token_count
    assert(Bpe.merges.size == 32)
    assert(Bpe.merges.take(8) == Seq(("h", "e"), ("t", "he"), ("e", "n"),
      ("i", "n"), ("a", "t"), ("d", "e"), ("o", "n"), ("i", "on")),
      s"merge head drifted: ${Bpe.merges.take(8)}")
    // encoder pins (true iterative BPE)
    assert(Bpe.encodeWord("the") == Vector("the"))
    assert(Bpe.encodeWord("training") == Vector("tra", "in", "in", "g"))
    assert(Bpe.encodeWord("tokens") == Vector("token", "s"))
    assert(Bpe.encodeWord("attention") == Vector("att", "ent", "ion"))
    assert(Bpe.encodeWord("xyzzy").length == 5) // untrained chars stay chars
    // EVERY planted q_token_count word must encode identically under
    // the SQL rank-order replace chain the oracle replays (3 passes)
    def sqlChainCount(w: String): Int = {
      var s = " " + w.map(_.toString).mkString(" ") + " "
      for ((a, b) <- Bpe.merges; _ <- 0 until 3)
        s = s.replace(s" $a $b ", s" $a$b ")
      s.trim.split(" ").length
    }
    def sqlChainTokens(w: String): String = {
      var s = " " + w.map(_.toString).mkString(" ") + " "
      for ((a, b) <- Bpe.merges; _ <- 0 until 3)
        s = s.replace(s" $a $b ", s" $a$b ")
      s.trim
    }
    for (w <- Seq("the", "training", "data", "tokens", "documents",
        "extraction", "attention", "information")) {
      assert(Bpe.encodeWord(w).length == sqlChainCount(w),
        s"oracle chain diverges from true BPE on '$w'")
      // the q_token_ids oracle replays the SEQUENCE, not just the count
      assert(Bpe.encodeWord(w).mkString(" ") == sqlChainTokens(w),
        s"oracle token string diverges on '$w'")
    }
    // full-text encode: flattened per-word streams, space-joined
    assert(Bpe.encode("the training data") ==
      (Bpe.encodeWord("the") ++ Bpe.encodeWord("training") ++
        Bpe.encodeWord("data")).mkString(" "))
    assert(Bpe.encode("THE") == "the") // canonical lower first
    assert(Bpe.encode("") == "" && Bpe.encode("   ") == "")
    // token/char ratio floors: trained text compresses, noise does not
    assert(Bpe.count("the training data") == 7) // 1 + 4 + 2
    assert(Bpe.count("the training data").toDouble / "the training data".length < 0.5)
    assert(Bpe.count("xyzzy") == 5) // ratio 1.0 on untrained noise
    assert(Bpe.count("") == 0 && Bpe.count("   ") == 0)
    // pre-tokenization lowercases (merge table is lowercase)
    assert(Bpe.count("THE") == 1)
  }

  test("quality model: deterministic training, seed separation, held-out floor, kernel parity") {
    import QualityModel._
    // training pins: the seeds are checked in, so training is
    // deterministic — drift here silently moves q_quality_model
    assert(bias == 0L, s"bias drifted: $bias")
    assert(weights.count(_ != 0) == 136, s"support drifted: ${weights.count(_ != 0)}")
    assert(weights.take(8).toSeq == Seq(1L, 1L, -1L, 0L, 0L, 1L, 2L, 0L),
      s"weight head drifted: ${weights.take(8).toSeq}")
    // hash pins: the md5-bucket arithmetic must match the oracle's
    // CAST('0x' || substr(md5(g), 1, 4) AS BIGINT) % 256 replay
    assert(bucket("the city") == 50 && bucket("click here") == 234)
    // 100% train separation (perceptron converged to a clean pass)
    GoodSeed.foreach(t => assert(score(t) > 0, s"good seed misclassified: $t"))
    BadSeed.foreach(t => assert(score(t) < 0, s"bad seed misclassified: $t"))
    // held-out floor: unseen recombinations of seed vocabulary classify
    // correctly (DETERMINISTIC pins, not statistics — a failure means
    // the learned weights moved)
    val heldGood = Seq(
      "the committee approved the study of the region after a long debate",
      "researchers tested the new design against historical records last spring",
      "volunteers planted trees along the river through the old town")
    val heldBad = Seq(
      "click here to register now free bonus click here buy now",
      "cheap deals casino bonus free spins buy now limited offer",
      "share on facebook sign up login page 1 page 2 next page")
    heldGood.foreach(t => assert(score(t) > 0, s"held-out good dropped: $t"))
    heldBad.foreach(t => assert(score(t) < 0, s"held-out bad kept: $t"))
    // retraining reproduces the model bit-for-bit
    val (w2, b2) = train(GoodSeed, BadSeed)
    assert(w2.toSeq == weights.toSeq && b2 == bias, "training is not deterministic")
    // totality: < 2 tokens scores exactly bias, zero bigrams
    assert(score("") == bias && score("   ") == bias && score("word") == bias)
    assert(nBigrams("") == 0 && nBigrams("word") == 0 && nBigrams("a b c") == 2)
    // kernel parity: the native expression replays score/nBigrams exactly
    import spark.implicits._
    graft.spark.GraftFunctions.registerAll(spark)
    val probe = (GoodSeed.take(2) ++ BadSeed.take(2) ++ Seq("", "word")).toDF("t")
      .select(col("t"), expr("graft_quality_model(t)").as("q"))
      .select(col("t"), col("q.score"), col("q.n_bigrams")).collect()
    probe.foreach { r =>
      assert(r.getLong(1) == score(r.getString(0)) &&
        r.getInt(2) == nBigrams(r.getString(0)), s"kernel diverges on '${r.getString(0)}'")
    }
  }

  test("pii detectors: counts, adjacency, unicode digits, redaction order") {
    import spark.implicits._
    def run(s: String): (Int, Int, Int, Int, Int, String) = {
      val r = Seq(s).toDF("t").select(
        Pii.emailCount(col("t")), Pii.ipv4Count(col("t")),
        Pii.ipv6Count(col("t")), Pii.phoneCount(col("t")),
        Pii.idNumCount(col("t")), Pii.redact(col("t"))).collect()(0)
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getString(5))
    }
    // dotted-run adjacency: the scan restarts after each non-overlapping
    // match, so 8 octets = exactly 2 dotted quads (same in RE2)
    assert(run("1.2.3.4.5.6.7.8")._2 == 2)
    // NON-ASCII digits must not match \d (Java default == RE2): a
    // unicode-aware engine would disagree with the oracle here
    assert(run("١٢٣٤٥٦٧٨٩٠١٢")
      ._5 == 0)
    // 20-digit run = ONE greedy match, not overlapping windows
    val longRun = run("x 12345678901234567890 y")
    assert(longRun._5 == 1 && longRun._6 == "x <NUM> y")
    // email flush against a phone: both fire, no character stolen
    val adj = run("a@b.co+1234567890")
    assert(adj._1 == 1 && adj._4 == 1 && adj._6 == "<EMAIL><PHONE>")
    // ipv6 floor: 5+ hex groups match, clock times don't
    assert(run("at fe80:12:34:56:78:9a up")._3 == 1)
    assert(run("meet at 12:30 or 1:2:3")._3 == 0)
    // phone digits also count as an id run (documented independence),
    // but redaction order keeps the output unambiguous
    val ph = run("call +33123456789 from 10.1.2.3")
    assert(ph._4 == 1 && ph._5 == 1 &&
      ph._6 == "call <PHONE> from <IP>")
    // redaction leaves clean text untouched
    assert(run("no pii here 1234")._6 == "no pii here 1234")
  }

  test("psl: rule classes, prevailing order, normalization, totality") {
    def r(h: String) = Psl.registrable(h)
    // exact gTLD / registry second-level / private section
    assert(r("a.example.com") == "example.com")
    assert(r("x.y.co.uk") == "y.co.uk")
    assert(r("user.github.io") == "user.github.io")
    assert(r("d.b.s3.amazonaws.com") == "b.s3.amazonaws.com")
    // longest rule wins over shorter (blogspot.com over com)
    assert(r("me.blogspot.com") == "me.blogspot.com")
    // wildcard: every 2-label .ck suffix is public
    assert(r("deep.x.y.ck") == "x.y.ck")
    // exception beats the wildcard
    assert(r("www.ck") == "www.ck")
    assert(r("sub.www.ck") == "www.ck")
    // host IS a public suffix → itself (total, blocklist-join friendly)
    assert(r("co.uk") == "co.uk")
    assert(r("uk") == "uk")
    // implicit '*' rule for unlisted TLDs
    assert(r("a.b.invalid") == "b.invalid")
    // normalization: ASCII case + trailing dot(s)
    assert(r("Sub.Example.COM.") == "example.com")
    assert(r("A.B.github.IO..") == "b.github.io")
    // totality: empty, bare label, IP-ish, degenerate dots — no throw
    assert(r("") == "")
    assert(r("localhost") == "localhost")
    assert(r("10.1.2.3") == "2.3")
    assert(r("...") == "")
    assert(r(".com") == ".com")
    // rules table generator stays in sync with the parsed sets
    val v = Psl.duckdbRulesValues
    assert(v.contains("('e','www.ck',2)") && v.contains("('w','ck',1)") &&
      v.contains("('x','co.uk',2)"))
  }

  test("psl: column surface matches the JVM kernel") {
    import spark.implicits._
    graft.spark.GraftFunctions.registerAll(spark)
    val hosts = Seq("a.example.com", "www.ck", "deep.x.y.ck", "USER.GitHub.io",
      "co.uk", "weird..host.org", "").toDF("host")
    val got = hosts.select(UrlOps.registrableDomainPsl(col("host")))
      .as[String].collect().toSeq
    assert(got == hosts.as[String].collect().toSeq.map(Psl.registrable))
  }
}
