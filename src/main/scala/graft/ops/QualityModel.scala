package graft.ops

/** Trained document-quality classifier (round 7, VERDICT r6 #5): a
  * hashed-bigram linear model — the production replacement for the
  * hand-weighted `TextOps.qualityScore` heuristic. Real pipelines gate
  * on a TRAINED classifier (fastText-style linear over hashed n-gram
  * features); this is that shape with everything constructible in-repo,
  * following the `Bpe` pattern: the weight table is trained at class
  * load from the checked-in seed corpus with a deterministic perceptron
  * (fixed epoch count, fixed example order, integer updates), so the
  * model is versioned with the code and needs no external file.
  *
  * Why it is oracle-able (the CLAUDE.md int/string rule): every piece
  * is integer arithmetic both sides can replay exactly —
  *  - features: token BIGRAMS over the TextNorm canonical alphabet
  *    (explicit ws class + ASCII lower; never `\s`/toLowerCase);
  *  - hashing: bucket = int(md5(gram)[0:4], 16) % Buckets — DuckDB
  *    replays it with `CAST('0x' || substr(md5(g), 1, 4) AS BIGINT)`;
  *  - score: bias + Σ weight[bucket] over bigram OCCURRENCES (counts
  *    weighted), an integer sum replayed by `list_sum` + a generated
  *    256-int list literal (CAST AS BIGINT — list_sum is HUGEINT).
  *
  * Perceptron, not logistic: integer weights fall out of the update
  * rule directly (w += y·x on mistakes), which is what keeps the oracle
  * exact — a float sigmoid would put the whole model behind the
  * float-allowlist. Deterministic tie-breaks: examples are visited in
  * checked-in order, epochs are fixed, and training stops early only on
  * a full clean pass.
  *
  * 100 TB shape: scoring is a single codegen'd kernel pass per row
  * (one tokenization, one md5 per bigram, one array lookup each) with
  * no shuffle, no broadcast, no state — embarrassingly parallel.
  */
object QualityModel {

  /** Hash buckets. 256 keeps seed-corpus collisions rare enough for
    * linear separability while the generated oracle list literal stays
    * small (~1.5 KB of SQL). */
  val Buckets = 256

  /** Fixed perceptron epochs (early exit on a clean pass). */
  val Epochs = 50

  /** Checked-in GOOD seed — clean web prose (the class a cleaning
    * pipeline keeps). Changing ANY line retrains the model; the oracle
    * regenerates itself from `weights`, but the OpsSpec pins move. */
  val GoodSeed: Seq[String] = Seq(
    "the city council approved the new transit plan after a long public debate",
    "researchers published a detailed study of coastal erosion in the region",
    "the recipe calls for two cups of flour and a pinch of salt",
    "her latest novel explores memory and migration across three generations",
    "the team released the library under an open source license last spring",
    "local farmers reported a strong harvest despite the dry summer",
    "the museum opened a new exhibit on early photography this weekend",
    "engineers tested the bridge design against historical flood records",
    "the documentary follows three students through their final year of school",
    "volunteers planted several hundred trees along the river bank",
    "the committee will publish its findings in the annual report",
    "astronomers observed the comet for six weeks before it faded from view",
    "the orchestra performed the complete cycle over two evenings",
    "a quiet morning walk through the old town reveals its layered history",
    "the clinic expanded its hours to serve patients in rural districts",
    "the study compares reading habits across age groups and regions")

  /** Checked-in BAD seed — boilerplate, keyword stuffing, spam, and
    * navigation chrome (the class a cleaning pipeline drops). */
  val BadSeed: Seq[String] = Seq(
    "click here to subscribe now buy now limited offer click here",
    "home about contact privacy policy terms of service cookie settings",
    "best cheap deals best cheap deals discount casino bonus free spins",
    "lorem ipsum dolor sit amet lorem ipsum dolor sit amet lorem ipsum",
    "sign up login register forgot password sign up login register",
    "viagra cialis cheap pills online pharmacy no prescription fast shipping",
    "copyright all rights reserved powered by theme designed by",
    "next page previous page page 1 page 2 page 3 next page",
    "win big jackpot casino slots poker bet now win big jackpot",
    "free download crack serial keygen torrent free download crack",
    "share on facebook share on twitter share on pinterest share share",
    "skip to content skip to navigation skip to footer menu toggle",
    "xz qq ww zx vv kk jj qq xz zx vv ww kk jj xq",
    "cheap flights cheap hotels cheap cars book now cheap flights cheap",
    "error 404 page not found the page you requested does not exist",
    "accept cookies we use cookies to improve your experience accept cookies")

  /** Bucket of one bigram: first 16 bits of md5(gram) mod Buckets —
    * exactly `CAST('0x' || substr(md5(g), 1, 4) AS BIGINT) % 256` in
    * DuckDB (md5 of the UTF-8 bytes on both sides). */
  def bucket(gram: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % Buckets
  }

  /** Bucket-count feature vector of a text (canonical alphabet). */
  def featurize(text: String): Array[Int] = {
    val toks = TextNorm.tokens(TextNorm.asciiLower(text))
    val x = new Array[Int](Buckets)
    var i = 0
    while (i + 1 < toks.length) {
      x(bucket(toks(i) + " " + toks(i + 1))) += 1
      i += 1
    }
    x
  }

  /** Deterministic perceptron training: returns (weights, bias). */
  def train(good: Seq[String], bad: Seq[String]): (Array[Long], Long) = {
    val examples: Seq[(Array[Int], Int)] =
      good.map(t => (featurize(t), 1)) ++ bad.map(t => (featurize(t), -1))
    val w = new Array[Long](Buckets)
    var b = 0L
    var epoch = 0
    var clean = false
    while (epoch < Epochs && !clean) {
      clean = true
      examples.foreach { case (x, y) =>
        var s = b
        var j = 0
        while (j < Buckets) { s += w(j) * x(j); j += 1 }
        if (s * y <= 0) {
          clean = false
          j = 0
          while (j < Buckets) { w(j) += y.toLong * x(j); j += 1 }
          b += y
        }
      }
      epoch += 1
    }
    (w, b)
  }

  /** The trained model. */
  val (weights: Array[Long], bias: Long) = train(GoodSeed, BadSeed)

  /** Integer quality score: bias + Σ weight[bucket(bigram)] over all
    * bigram occurrences. Positive = keep. Total on any input; a text
    * with fewer than 2 tokens scores exactly `bias`. */
  def score(text: String): Long = {
    val toks = TextNorm.tokens(TextNorm.asciiLower(text))
    var s = bias
    var i = 0
    while (i + 1 < toks.length) {
      s += weights(bucket(toks(i) + " " + toks(i + 1)))
      i += 1
    }
    s
  }

  /** Bigram count of a text (the score's support size). */
  def nBigrams(text: String): Int =
    math.max(TextNorm.tokens(TextNorm.asciiLower(text)).length - 1, 0)

  /** DuckDB bigram list over a tokens-list-valued SQL expression
    * (1-based indexing; range's exclusive end gives len-1 bigrams). */
  def sqlGrams(tkExpr: String): String =
    s"list_transform(range(1, len($tkExpr)), i -> $tkExpr[i] || ' ' || $tkExpr[i+1])"

  /** Generated DuckDB replay of `score` over a bigram-list-valued SQL
    * expression: hash each gram through the md5 arithmetic, index the
    * embedded weight-list literal, sum. list_sum promotes to HUGEINT —
    * the CAST AS BIGINT is load-bearing (the round-6 driver-divergence
    * class; tools/oracle_check.py now hard-fails it). */
  def sqlScoreFromGrams(gramsExpr: String): String = {
    val wlist = weights.mkString("[", ", ", "]")
    s"""CAST($bias + coalesce(list_sum(list_transform($gramsExpr,
       |  g -> $wlist[1 + CAST('0x' || substr(md5(g), 1, 4) AS BIGINT) % $Buckets])),
       |  0) AS BIGINT)""".stripMargin
  }

  /** Full replay over a text-valued SQL expression (tokenize through
    * the TextNorm canon first). Inlines the token expression three
    * times — prefer a tokens CTE + sqlGrams/sqlScoreFromGrams in big
    * oracles. */
  def sqlScore(textExpr: String): String = {
    val tk = TextNorm.sqlTokens(TextNorm.sqlLower(textExpr))
    sqlScoreFromGrams(sqlGrams(tk))
  }
}
