package graft.html

/** Input-stream preprocessing (reference: mycore/mystring.c:24-129 —
  * CRLF/CR → LF; NUL handling is per-tokenizer-state, done there). */
object TextPrep {
  def normalize(s: String): String = {
    if (s.indexOf('\r') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\r') {
        sb.append('\n')
        if (i + 1 < n && s.charAt(i + 1) == '\n') i += 1
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  @inline def isWhitespace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Extraction-side "inter-element whitespace" test — matches the
    * reference recipe's byte-mode Perl `\s` (clear_text.pl), which is
    * HTML5 whitespace PLUS vertical tab \x0B (binary-probed: a VT-only
    * text node is dropped, an NBSP-only one is kept). The tokenizer's
    * per-char isWhitespace stays strictly HTML5 — tag parsing and the
    * token whitespace flag must NOT treat VT as whitespace. */
  def isWhitespaceOnly(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!isWhitespace(c) && c != '\u000B') return false
      i += 1
    }
    true
  }
}
