package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions

/** THE shared oracle-safe text alphabet (round 6, VERDICT r5 next-#3).
  *
  * Every operator whose DuckDB oracle replays tokenization /
  * normalization MUST go through these helpers — on all three surfaces
  * (JVM kernel, Spark Column, oracle SQL) — because the engines'
  * defaults genuinely differ:
  *
  *   - Java regex `\s` includes U+000B (VT); RE2's `\s` is
  *     `[ \t\n\f\r]`. Canonical: the RE2 set, spelled as an explicit
  *     class so neither engine's default is trusted.
  *   - `String.trim` strips every char <= U+0020 (VT, control bytes);
  *     DuckDB `trim` strips spaces only. Canonical: strip exactly the
  *     whitespace set above, both ends.
  *   - `String.toLowerCase` applies locale/contextual rules (Greek
  *     final sigma Σ→ς, Turkish İ→i+combining-dot); DuckDB `lower` is
  *     utf8proc simple mapping (Σ→σ, İ→i). Canonical: ASCII-only
  *     A-Z→a-z via `translate` — identical everywhere, and the only
  *     case mapping both engines can replay byte-for-byte.
  *   - `String.compareTo` orders by UTF-16 code unit (supplementary
  *     chars sort below U+E000..U+FFFF); DuckDB compares UTF-8 bytes
  *     (= codepoint order). Canonical: codepoint order.
  *   - Lengths are Unicode CODE POINTS (DuckDB `length`, Spark
  *     `length`, Java `codePointCount`) — never UTF-16 units.
  *
  * NULL story: queries coalesce nullable inputs to '' at first use,
  * identically in the DataFrame construction and the oracle SQL, so
  * kernels never see null and `concat_ws`-vs-`||` asymmetry cannot
  * arise. (Spark `concat_ws` skips null pieces; SQL `||` nulls the
  * whole chain — the round-5 q_repetition driver hash-fail.)
  *
  * `wsClass` is regex SOURCE text (contains backslash-t etc.), valid
  * verbatim in Java regex, Spark `split`, and RE2 — one constant, three
  * engines. OpsSpec pins the VT/NBSP/Σ/İ/astral behavior of every
  * helper; the adversarial corpus gate (tools/make_adversarial.py)
  * enforces the DuckDB half end-to-end.
  */
object TextNorm {
  /** Canonical whitespace as regex source — the RE2 `\s` set, explicit. */
  final val wsClass: String = "[ \\t\\n\\f\\r]+"
  /** The same set as raw characters (for trim / char tests). */
  final val wsChars: String = " \t\n\f\r"

  final val upperAz = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  final val lowerAz = "abcdefghijklmnopqrstuvwxyz"

  private val wsPat = java.util.regex.Pattern.compile(wsClass)

  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  @inline def asciiLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** ASCII-only lowercase; allocation-free when nothing changes. */
  def asciiLower(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n && !(s.charAt(i) >= 'A' && s.charAt(i) <= 'Z')) i += 1
    if (i == n) return s
    val a = s.toCharArray
    while (i < n) { a(i) = asciiLower(a(i)); i += 1 }
    new String(a)
  }

  /** Strip the canonical whitespace set from both ends (nothing else). */
  def trimWs(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && isWs(s.charAt(b))) b += 1
    while (e > b && isWs(s.charAt(e - 1))) e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Canonical tokens: split on ws runs, drop empties. Equals
    * `list_filter(string_split_regex(s, wsClass), x -> x <> '')`. */
  def tokens(s: String): Array[String] = {
    val parts = wsPat.split(s)
    var empties = 0
    var i = 0
    while (i < parts.length) { if (parts(i).isEmpty) empties += 1; i += 1 }
    if (empties == 0) return parts
    val out = new Array[String](parts.length - empties)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) { out(j) = parts(i); j += 1 }
      i += 1
    }
    out
  }

  /** Codepoint (= UTF-8 byte = DuckDB) order; differs from
    * String.compareTo only on supplementary vs U+E000..U+FFFF. */
  def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  // ---------------------------------------------- Spark Column surface

  /** ASCII-only lower as a codegen'd built-in (same table as sqlLower). */
  def lowerCol(c: Column): Column = functions.translate(c, upperAz, lowerAz)

  /** Canonical token array (leading/trailing ws handled by the empty
    * filter — no trim needed, so no trim semantics to diverge). */
  def tokensCol(c: Column): Column =
    functions.filter(functions.split(c, wsClass), t => t =!= "")

  /** Canonical both-ends trim. */
  def trimCol(c: Column): Column = functions.trim(c, wsChars)

  /** Canonical token count, total on null/empty input (null → 0). */
  def tokenCountCol(c: Column): Column =
    functions.when(c.isNull, functions.lit(0L))
      .otherwise(functions.size(tokensCol(c)).cast("long"))

  // ------------------------------------------------ DuckDB SQL surface

  /** `translate(e, 'A..Z', 'a..z')` — ASCII-only lower. */
  def sqlLower(e: String): String = s"translate($e, '$upperAz', '$lowerAz')"

  /** `list_filter(string_split_regex(e, wsClass), x -> x <> '')`. */
  def sqlTokens(e: String): String =
    s"list_filter(string_split_regex($e, '$wsClass'), x -> x <> '')"

  /** Canonical both-ends trim in DuckDB. */
  def sqlTrim(e: String): String =
    s"trim($e, ' ' || chr(9) || chr(10) || chr(12) || chr(13))"

  /** Canonical token count (total: '' → 0; caller coalesces null). */
  def sqlTokenCount(e: String): String =
    s"CAST(len(${sqlTokens(e)}) AS BIGINT)"
}
