package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines. Everything that
  * can be a built-in-function composition IS one (codegen'd, no UDF);
  * the heuristics that need JVM logic (langid, fingerprints, hashes)
  * are deterministic scalar UDFs kept off the extract hot path. */
object TextOps {

  /** Whitespace token count — `size(split(trim(s), '\s+'))`. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(split(trim(c), "\\s+")).cast("long"))

  /** BPE-ish subword count: word-boundary pieces + digit runs + punct
    * (regex approximation of byte-pair tokenizer granularity). */
  def subwordCount(c: Column): Column =
    size(filter(split(c, "(?=[A-Z])|(?<=[a-z])(?=[0-9])|[^A-Za-z0-9]+"),
      x => length(x) > 0)).cast("long")

  def charCount(c: Column): Column = length(c).cast("long")

  def uniqueTokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(array_distinct(split(trim(c), "\\s+"))).cast("long"))

  /** Quality-scoring signals (integer outputs — oracle-stable). */
  def alphaChars(c: Column): Column =
    length(regexp_replace(c, "[^A-Za-z]", "")).cast("long")
  def digitChars(c: Column): Column =
    length(regexp_replace(c, "[^0-9]", "")).cast("long")
  def punctChars(c: Column): Column =
    length(regexp_replace(c, "[^.,;:!?'\"()\\[\\]-]", "")).cast("long")

  /** Composite quality score in [0,100]: length + alpha-ratio +
    * mean-word-length sanity (a cheap C4/Gopher-style filter). */
  def qualityScore(c: Column): Column = {
    val toks = tokenCount(c)
    val chars = length(c).cast("double")
    val alphaRatio = alphaChars(c).cast("double") / greatest(chars, lit(1.0))
    val meanWord = chars / greatest(toks.cast("double"), lit(1.0))
    val lenScore = least(chars / lit(5000.0), lit(1.0)) * 40
    val alphaScore = alphaRatio * 40
    val wordScore = when(meanWord.between(3, 12), lit(20.0)).otherwise(lit(0.0))
    round(lenScore + alphaScore + wordScore, 1)
  }

  // ------------------------------------------------------------- langid

  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is "),
    "de" -> Seq(" der ", " die ", " und ", " ist ", " nicht "),
    "fr" -> Seq(" le ", " la ", " et ", " est ", " les "),
    "es" -> Seq(" el ", " la ", " y ", " es ", " los "),
    "zh" -> Seq("的", "是", "不", "了", "在")
  )

  /** n-gram/stopword language-ID heuristic (the public fastText-style
    * marker approach compressed to 5 langs; returns "und" when nothing
    * scores). Deterministic; registered as `graft_lang_id`. */
  def langIdHeuristic(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val padded = " " + text.toLowerCase + " "
    var best = "und"
    var bestScore = 0
    markers.foreach { case (lang, ms) =>
      var score = 0
      ms.foreach { m =>
        var i = padded.indexOf(m)
        while (i >= 0) { score += 1; i = padded.indexOf(m, i + 1) }
      }
      if (score > bestScore) { bestScore = score; best = lang }
    }
    best
  }

  // -------------------------------------------------------- fingerprint

  /** 64-bit rolling (polynomial) document fingerprint over normalized
    * tokens — stable under whitespace differences. */
  def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    var h = 1125899906842597L
    var i = 0
    var prevSpace = true
    val n = text.length
    while (i < n) {
      val c0 = text.charAt(i)
      val isSpace = Character.isWhitespace(c0)
      if (!isSpace) {
        val c = Character.toLowerCase(c0)
        h = h * 31 + c
      } else if (!prevSpace) h = h * 31 + ' '
      prevSpace = isSpace
      i += 1
    }
    h
  }

  /** 64-bit SimHash over 3-word shingles. */
  def simhash64(text: String): Long = {
    if (text == null || text.isEmpty) return 0L
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return 0L
    val counts = new Array[Int](64)
    var i = 0
    while (i + 2 < toks.length + 1) {
      val shingle =
        if (i + 2 < toks.length) toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
        else toks.slice(i, toks.length).mkString(" ")
      val h = scala.util.hashing.MurmurHash3.stringHash(shingle).toLong * 0x9E3779B97F4A7C15L
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** MinHash signature: k permutation-hashes over 3-word shingles
    * (standard a*h+b mod p family, seeded — public MMDS construction). */
  def minhash(text: String, k: Int = 64): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (text == null) return sig
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length == 0) return sig
    val prime = 2305843009213693951L // 2^61 - 1
    var i = 0
    val last = math.max(toks.length - 2, 1)
    while (i < last) {
      val end = math.min(i + 3, toks.length)
      val shingle = toks.slice(i, end).mkString(" ")
      val h = scala.util.hashing.MurmurHash3.stringHash(shingle).toLong & 0x7FFFFFFFFFFFFFFFL
      var j = 0
      while (j < k) {
        // seeded affine permutations; constants from splitmix of j
        var z = (j + 1).toLong * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        val a = (z | 1L) & 0x3FFFFFFFFFFFFFFFL
        val b = (z >>> 13) & 0x3FFFFFFFFFFFFFFFL
        val v = (a * (h % prime) + b) % prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Exact token-set Jaccard similarity. */
  def jaccardTokens(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val sa = a.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val sb = b.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    if (sa.isEmpty && sb.isEmpty) return 1.0
    val inter = sa.intersect(sb).size
    inter.toDouble / (sa.size + sb.size - inter)
  }

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("graft_lang_id", (s: String) => langIdHeuristic(s))
    spark.udf.register("graft_fingerprint64", (s: String) => fingerprint64(s))
    spark.udf.register("graft_simhash64", (s: String) => simhash64(s))
    spark.udf.register("graft_minhash", (s: String, k: Int) => minhash(s, k))
    spark.udf.register("graft_jaccard", (a: String, b: String) => jaccardTokens(a, b))
  }
}
