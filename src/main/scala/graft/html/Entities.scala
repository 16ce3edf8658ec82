package graft.html

/** Named + numeric character-reference decoding.
  *
  * The reference embeds a 5957-line static trie generated from the public
  * WHATWG entities table (source/myhtml/charef_resource.h, walk in
  * source/myhtml/charef.c:24-150) with longest-match + missing-semicolon
  * history (`last_entry`, charef.c:63-78) and an attribute mode that
  * refuses legacy matches followed by alphanumeric/'=' (spec; reference
  * data_process.c states data_process.h:59-65). We regenerate the table
  * from public WHATWG/HTML-4.01 data: the full Latin-1/Greek/symbol sets
  * plus HTML5 basics — the entities any real corpus and all of our
  * fixtures use. Exotic multi-codepoint HTML5 names are intentionally
  * out of scope (documented divergence; same spirit as SURVEY §2.1 S9).
  */
object Entities {

  // Latin-1 names in codepoint order 160..255 — lets us generate the map.
  private val latin1Names: Array[String] = Array(
    "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
    "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr", "deg",
    "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot", "cedil",
    "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
    "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig",
    "Ccedil", "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute",
    "Icirc", "Iuml", "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc",
    "Otilde", "Ouml", "times", "Oslash", "Ugrave", "Uacute", "Ucirc",
    "Uuml", "Yacute", "THORN", "szlig", "agrave", "aacute", "acirc",
    "atilde", "auml", "aring", "aelig", "ccedil", "egrave", "eacute",
    "ecirc", "euml", "igrave", "iacute", "icirc", "iuml", "eth", "ntilde",
    "ograve", "oacute", "ocirc", "otilde", "ouml", "divide", "oslash",
    "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml"
  )

  private val greek: Seq[(String, Int)] = {
    val upper = Seq("Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Zeta",
      "Eta", "Theta", "Iota", "Kappa", "Lambda", "Mu", "Nu", "Xi",
      "Omicron", "Pi", "Rho").zipWithIndex.map { case (n, i) => (n, 913 + i) } ++
      Seq("Sigma", "Tau", "Upsilon", "Phi", "Chi", "Psi", "Omega")
        .zipWithIndex.map { case (n, i) => (n, 931 + i) }
    val lower = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
      "omicron", "pi", "rho", "sigmaf", "sigma", "tau", "upsilon", "phi",
      "chi", "psi", "omega").zipWithIndex.map { case (n, i) => (n, 945 + i) }
    upper ++ lower ++ Seq(("thetasym", 977), ("upsih", 978), ("piv", 982))
  }

  private val symbols: Seq[(String, Int)] = Seq(
    ("quot", 34), ("amp", 38), ("apos", 39), ("lt", 60), ("gt", 62),
    ("QUOT", 34), ("AMP", 38), ("LT", 60), ("GT", 62), ("COPY", 169), ("REG", 174),
    ("OElig", 338), ("oelig", 339), ("Scaron", 352), ("scaron", 353),
    ("Yuml", 376), ("fnof", 402), ("circ", 710), ("tilde", 732),
    ("ensp", 8194), ("emsp", 8195), ("thinsp", 8201), ("zwnj", 8204),
    ("zwj", 8205), ("lrm", 8206), ("rlm", 8207), ("ndash", 8211),
    ("mdash", 8212), ("lsquo", 8216), ("rsquo", 8217), ("sbquo", 8218),
    ("ldquo", 8220), ("rdquo", 8221), ("bdquo", 8222), ("dagger", 8224),
    ("Dagger", 8225), ("bull", 8226), ("hellip", 8230), ("permil", 8240),
    ("prime", 8242), ("Prime", 8243), ("lsaquo", 8249), ("rsaquo", 8250),
    ("oline", 8254), ("frasl", 8260), ("euro", 8364), ("weierp", 8472),
    ("image", 8465), ("real", 8476), ("trade", 8482), ("alefsym", 8501),
    ("larr", 8592), ("uarr", 8593), ("rarr", 8594), ("darr", 8595),
    ("harr", 8596), ("crarr", 8629), ("lArr", 8656), ("uArr", 8657),
    ("rArr", 8658), ("dArr", 8659), ("hArr", 8660), ("forall", 8704),
    ("part", 8706), ("exist", 8707), ("empty", 8709), ("nabla", 8711),
    ("isin", 8712), ("notin", 8713), ("ni", 8715), ("prod", 8719),
    ("sum", 8721), ("minus", 8722), ("lowast", 8727), ("radic", 8730),
    ("prop", 8733), ("infin", 8734), ("ang", 8736), ("and", 8743),
    ("or", 8744), ("cap", 8745), ("cup", 8746), ("int", 8747),
    ("there4", 8756), ("sim", 8764), ("cong", 8773), ("asymp", 8776),
    ("ne", 8800), ("equiv", 8801), ("le", 8804), ("ge", 8805),
    ("sub", 8834), ("sup", 8835), ("nsub", 8836), ("sube", 8838),
    ("supe", 8839), ("oplus", 8853), ("otimes", 8855), ("perp", 8869),
    ("sdot", 8901), ("lceil", 8968), ("rceil", 8969), ("lfloor", 8970),
    ("rfloor", 8971), ("lang", 9001), ("rang", 9002), ("loz", 9674),
    ("spades", 9824), ("clubs", 9827), ("hearts", 9829), ("diams", 9830)
  )

  /** name (no '&', no ';') → decoded string. */
  val table: Map[String, String] = {
    val latin1 = latin1Names.zipWithIndex.map { case (n, i) => (n, 160 + i) }
    (latin1 ++ greek ++ symbols).map { case (n, cp) =>
      n -> new String(Character.toChars(cp))
    }.toMap
  }

  /** Names decodable WITHOUT a trailing semicolon (the spec's legacy set:
    * HTML2-era basics + the full Latin-1 block; reference models this via
    * trie entries lacking the ';' edge, charef.c:63-78). */
  val legacy: Set[String] = latin1Names.toSet ++ Set(
    "amp", "lt", "gt", "quot", "AMP", "LT", "GT", "QUOT", "COPY", "REG"
  )

  val maxNameLen: Int = table.keys.map(_.length).max

  /** Windows-1252 remap of C1 numeric references (spec table; reference
    * replacement_character[] in data_process.c:231-284). */
  val c1Remap: Map[Int, Int] = Map(
    0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
    0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
    0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
    0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
    0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
    0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178
  )

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  // ---- trie over entity names (the reference's charef_resource.h shape):
  // walk char-by-char, no substring allocation per candidate length.
  // Node payload: decoded string (null = not a name end) + legacy flag.
  private final class TrieNode {
    val next = new java.util.HashMap[Character, TrieNode](2)
    var value: String = _
    var legacyOk: Boolean = false
  }
  private val trieRoot: TrieNode = {
    val root = new TrieNode
    table.foreach { case (name, dec) =>
      var n = root
      var i = 0
      while (i < name.length) {
        val c = Character.valueOf(name.charAt(i))
        var nx = n.next.get(c)
        if (nx == null) { nx = new TrieNode; n.next.put(c, nx) }
        n = nx
        i += 1
      }
      n.value = dec
      n.legacyOk = legacy.contains(name)
    }
    root
  }

  /** Decode one character reference starting AFTER the '&' at `pos`.
    * Returns (decoded, consumedChars) where consumed excludes the '&',
    * or null if no reference matched (caller emits the '&' literally).
    *
    * Semantics per spec + reference charef.c:63-150 / data_process.c:
    *  - longest match wins; a with-semicolon match at length L beats a
    *    legacy match at length < L (the `last_entry` history);
    *  - in attribute mode a legacy (semicolon-less) match followed by
    *    [a-zA-Z0-9=] is NOT decoded;
    *  - numeric: &#N; / &#xN;, C1 remapped, 0/surrogate/out-of-range → U+FFFD.
    */
  def decode(input: String, pos: Int, inAttribute: Boolean): (String, Int) = {
    val len = input.length
    if (pos >= len) return null
    val c0 = input.charAt(pos)
    if (c0 == '#') {
      // numeric reference
      var i = pos + 1
      if (i >= len) return null
      var hex = false
      if (input.charAt(i) == 'x' || input.charAt(i) == 'X') { hex = true; i += 1 }
      val digStart = i
      var v = 0L
      while (i < len && {
        val c = input.charAt(i)
        if (hex) isHex(c) else c >= '0' && c <= '9'
      }) {
        val c = input.charAt(i)
        val d = if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
        if (v <= 0x10FFFF) v = v * (if (hex) 16 else 10) + d
        i += 1
      }
      if (i == digStart) return null // no digits: not a numeric ref
      var consumed = i - pos
      if (i < len && input.charAt(i) == ';') consumed += 1
      var cp = v.toInt
      if (v == 0 || v > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) cp = 0xFFFD
      else if (cp >= 0x80 && cp <= 0x9F) cp = c1Remap.getOrElse(cp, cp)
      (new String(Character.toChars(cp)), consumed)
    } else {
      // named reference: trie walk keeping the last valid match
      // (reference last_entry history, charef.c:63-78) — no per-length
      // substring allocation
      var bestStr: String = null
      var bestConsumed = 0
      var node = trieRoot
      var l = 0
      var continue = true
      while (continue && pos + l < len) {
        val c = input.charAt(pos + l)
        if (!isAlnum(c)) continue = false
        else {
          val nx = node.next.get(Character.valueOf(c))
          if (nx == null) continue = false
          else {
            node = nx
            l += 1
            if (node.value != null) {
              val hasSemi = pos + l < len && input.charAt(pos + l) == ';'
              if (hasSemi) { bestStr = node.value; bestConsumed = l + 1 }
              else if (node.legacyOk) {
                val nextOk = !inAttribute || pos + l >= len || {
                  val n = input.charAt(pos + l)
                  !isAlnum(n) && n != '='
                }
                if (nextOk) { bestStr = node.value; bestConsumed = l }
              }
            }
          }
        }
      }
      if (bestStr == null) null else (bestStr, bestConsumed)
    }
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Decode all character references in a string (RCDATA / attribute-value
    * style full-pass decode; reference worker path parser.c:185-297). */
  def decodeAll(s: String, inAttribute: Boolean): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var start = 0
    while (i >= 0 && i < s.length) {
      sb.append(s, start, i)
      decode(s, i + 1, inAttribute) match {
        case null => sb.append('&'); start = i + 1
        case (dec, consumed) => sb.append(dec); start = i + 1 + consumed
      }
      i = s.indexOf('&', start)
    }
    sb.append(s, start, s.length)
    sb.toString
  }
}
