package graft.html

import java.nio.charset.{Charset, StandardCharsets, CodingErrorAction}

/** Charset sniffing + decode.
  *
  * Reference: source/myencoding/detect.c — BOM (detect.c:164-231), WHATWG
  * meta-prescan (detect.c:559-996), UTF-8 validity scoring
  * (detect.c:78-134), Cyrillic trigram heuristics (detect.c:25-50,
  * 233-337). Decoders: we use JDK charsets for the long tail instead of
  * re-porting the 40 per-byte state machines (encoding.c, 1244 LoC) —
  * behavioral parity is pinned to UTF-8 / windows-1252 / UTF-16, where
  * the JDK matches WHATWG exactly (SURVEY §2.1 S9 decision).
  */
object Encodings {

  /** COMPLETE WHATWG label registry → (canonical WHATWG name, decoder id)
    * — all 213 labels across the 39 encodings the reference recognizes
    * (its table: source/myencoding/detect_resource.h:130-520, enum
    * myosi.h:47-89; same registry as encoding.spec.whatwg.org). The
    * decoder id is a JDK charset chosen to match the WHATWG *index* —
    * for the East-Asian legacy encodings that is the wider Windows/HKSCS
    * variant, not the JDK charset that happens to share the label:
    * shift_jis ⇒ windows-31j (cp932 superset — WHATWG's index IS cp932),
    * euc-kr ⇒ x-windows-949 (WHATWG euc-kr is the full UHC/cp949 table),
    * big5 ⇒ Big5-HKSCS (WHATWG's index carries the HKSCS extensions),
    * windows-874 ⇒ x-windows-874 (cp874 with €, not bare TIS-620),
    * macintosh ⇒ x-MacRoman, iso-8859-8-i ⇒ iso-8859-8 (identical byte
    * table; the -I only flips bidi PRESENTATION order). Ids prefixed
    * with '@' are hand-written decoders for tables the JDK lacks
    * entirely (x-user-defined, iso-8859-10, iso-8859-14). Residual
    * single-slot divergences are tabled in BASELINE.md §encodings. */
  val whatwgLabels: Map[String, (String, String)] = {
    def all(canon: String, jdk: String, labels: String*) =
      labels.map(_ -> (canon, jdk))
    (all("Big5", "Big5-HKSCS",
        "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5") ++
     all("EUC-JP", "EUC-JP",
        "cseucpkdfmtjapanese", "euc-jp", "x-euc-jp") ++
     all("EUC-KR", "x-windows-949",
        "cseuckr", "csksc56011987", "euc-kr", "iso-ir-149", "korean",
        "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601", "windows-949") ++
     all("gb18030", "GB18030", "gb18030") ++
     all("GBK", "GBK",
        "chinese", "csgb2312", "csiso58gb231280", "gb2312", "gb_2312",
        "gb_2312-80", "gbk", "iso-ir-58", "x-gbk") ++
     all("IBM866", "IBM866", "866", "cp866", "csibm866", "ibm866") ++
     all("ISO-2022-JP", "ISO-2022-JP", "csiso2022jp", "iso-2022-jp") ++
     all("ISO-8859-10", "@iso-8859-10",
        "csisolatin6", "iso-8859-10", "iso-ir-157", "iso8859-10",
        "iso885910", "l6", "latin6") ++
     all("ISO-8859-13", "ISO-8859-13", "iso-8859-13", "iso8859-13", "iso885913") ++
     all("ISO-8859-14", "@iso-8859-14", "iso-8859-14", "iso8859-14", "iso885914") ++
     all("ISO-8859-15", "ISO-8859-15",
        "csisolatin9", "iso-8859-15", "iso8859-15", "iso885915", "iso_8859-15", "l9") ++
     all("ISO-8859-16", "ISO-8859-16", "iso-8859-16") ++
     all("ISO-8859-2", "ISO-8859-2",
        "csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2", "iso88592",
        "iso_8859-2", "iso_8859-2:1987", "l2", "latin2") ++
     all("ISO-8859-3", "ISO-8859-3",
        "csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3", "iso88593",
        "iso_8859-3", "iso_8859-3:1988", "l3", "latin3") ++
     all("ISO-8859-4", "ISO-8859-4",
        "csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4", "iso88594",
        "iso_8859-4", "iso_8859-4:1988", "l4", "latin4") ++
     all("ISO-8859-5", "ISO-8859-5",
        "csisolatincyrillic", "cyrillic", "iso-8859-5", "iso-ir-144",
        "iso8859-5", "iso88595", "iso_8859-5", "iso_8859-5:1988") ++
     all("ISO-8859-6", "ISO-8859-6",
        "arabic", "asmo-708", "csiso88596e", "csiso88596i", "csisolatinarabic",
        "ecma-114", "iso-8859-6", "iso-8859-6-e", "iso-8859-6-i", "iso-ir-127",
        "iso8859-6", "iso88596", "iso_8859-6", "iso_8859-6:1987") ++
     all("ISO-8859-7", "ISO-8859-7",
        "csisolatingreek", "ecma-118", "elot_928", "greek", "greek8",
        "iso-8859-7", "iso-ir-126", "iso8859-7", "iso88597", "iso_8859-7",
        "iso_8859-7:1987", "sun_eu_greek") ++
     all("ISO-8859-8", "ISO-8859-8",
        "csiso88598e", "csisolatinhebrew", "hebrew", "iso-8859-8",
        "iso-8859-8-e", "iso-ir-138", "iso8859-8", "iso88598", "iso_8859-8",
        "iso_8859-8:1988", "visual") ++
     all("ISO-8859-8-I", "ISO-8859-8", "csiso88598i", "iso-8859-8-i", "logical") ++
     all("KOI8-R", "KOI8-R", "cskoi8r", "koi", "koi8", "koi8-r", "koi8_r") ++
     all("KOI8-U", "KOI8-U", "koi8-ru", "koi8-u") ++
     all("macintosh", "x-MacRoman", "csmacintosh", "mac", "macintosh", "x-mac-roman") ++
     all("Shift_JIS", "windows-31j",
        "csshiftjis", "ms932", "ms_kanji", "shift-jis", "shift_jis", "sjis",
        "windows-31j", "x-sjis") ++
     all("UTF-16BE", "UTF-16BE", "utf-16be") ++
     all("UTF-16LE", "UTF-16LE", "utf-16", "utf-16le") ++
     all("UTF-8", "UTF-8", "unicode-1-1-utf-8", "utf-8", "utf8") ++
     all("windows-1250", "windows-1250", "cp1250", "windows-1250", "x-cp1250") ++
     all("windows-1251", "windows-1251", "cp1251", "windows-1251", "x-cp1251") ++
     all("windows-1252", "windows-1252",
        "ansi_x3.4-1968", "ascii", "cp1252", "cp819", "csisolatin1", "ibm819",
        "iso-8859-1", "iso-ir-100", "iso8859-1", "iso88591", "iso_8859-1",
        "iso_8859-1:1987", "l1", "latin1", "us-ascii", "windows-1252", "x-cp1252") ++
     all("windows-1253", "windows-1253", "cp1253", "windows-1253", "x-cp1253") ++
     all("windows-1254", "windows-1254",
        "cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148", "iso8859-9",
        "iso88599", "iso_8859-9", "iso_8859-9:1989", "l5", "latin5",
        "windows-1254", "x-cp1254") ++
     all("windows-1255", "windows-1255", "cp1255", "windows-1255", "x-cp1255") ++
     all("windows-1256", "windows-1256", "cp1256", "windows-1256", "x-cp1256") ++
     all("windows-1257", "windows-1257", "cp1257", "windows-1257", "x-cp1257") ++
     all("windows-1258", "windows-1258", "cp1258", "windows-1258", "x-cp1258") ++
     all("windows-874", "x-windows-874",
        "dos-874", "iso-8859-11", "iso8859-11", "iso885911", "tis-620", "windows-874") ++
     all("x-mac-cyrillic", "x-MacCyrillic", "x-mac-cyrillic", "x-mac-ukrainian") ++
     all("x-user-defined", "@x-user-defined", "x-user-defined")).toMap
  }

  /** Resolve any WHATWG label (ASCII-trimmed, case-insensitive) to
    * (canonical name, decoder id); None for labels outside the registry.
    * '@'-prefixed ids are the hand-written decoders below. */
  def resolveLabel(label: String): Option[(String, String)] =
    if (label == null) None
    else whatwgLabels.get(label.trim.toLowerCase(java.util.Locale.ROOT))

  /** BOM detection (reference detect.c:164-231). Returns (charsetName,
    * bomLength) or null. */
  def detectBom(bytes: Array[Byte]): (String, Int) = {
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF && (bytes(1) & 0xFF) == 0xBB &&
        (bytes(2) & 0xFF) == 0xBF) ("UTF-8", 3)
    else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xFE)
      ("UTF-16LE", 2)
    else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
      ("UTF-16BE", 2)
    else null
  }

  /** WHATWG meta-prescan over the first `limit` bytes (reference
    * prescan_stream_to_determine_encoding, detect.c:559-996).
    * Scans for <meta charset=...> / <meta http-equiv="content-type"
    * content="...charset=...">; skips comments and other tags. */
  def prescanMeta(bytes: Array[Byte], limit: Int = 1024): Option[String] = {
    val n = math.min(bytes.length, limit)
    val s = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i < s.length) {
      if (s.startsWith("<!--", i)) {
        val e = s.indexOf("-->", i + 4)
        i = if (e < 0) s.length else e + 3
      } else if (s.startsWith("<meta", i) && i + 5 < s.length &&
                 (s.charAt(i + 5) == ' ' || s.charAt(i + 5) == '\t' ||
                  s.charAt(i + 5) == '\n' || s.charAt(i + 5) == '\f' ||
                  s.charAt(i + 5) == '/')) {
        val end = s.indexOf('>', i)
        val tag = if (end < 0) s.substring(i) else s.substring(i, end)
        // charset=... attribute
        val mCharset = "charset\\s*=\\s*[\"']?([a-z0-9_:.\\-]+)".r
        val httpEquiv = tag.contains("http-equiv") && tag.contains("content-type")
        val direct = mCharset.findAllMatchIn(tag).toList
        val got: Option[String] =
          if (tag.contains(" charset") || tag.contains("\tcharset") ||
              tag.contains(";charset") || tag.contains("; charset") || httpEquiv)
            direct.lastOption.map(_.group(1))
          else direct.headOption.filter(_ => tag.contains("charset")).map(_.group(1))
        got match {
          case Some(cs0) =>
            // utf-16 family and x-user-defined get rewritten per spec
            // (HTML "changing the encoding" steps 1-2: utf-16 → utf-8,
            // x-user-defined → windows-1252; reference detect.c honors
            // the same rewrites via myencoding_extracting_character_
            // encoding_from_charset)
            val cs = cs0 match {
              case "utf-16" | "utf-16le" | "utf-16be" => "utf-8"
              case "x-user-defined" => "windows-1252"
              case other => other
            }
            whatwgLabels.get(cs) match {
              case Some((canonical, jdk)) =>
                // '@' ids are our hand decoders — always available
                if (jdk.startsWith("@") || Charset.isSupported(jdk))
                  return Some(canonical)
                // fall through to the plain JDK lookup if the preferred
                // variant charset is missing from this JVM
              case None =>
            }
            if (try Charset.isSupported(cs) catch { case _: Exception => false })
              return Some(Charset.forName(cs).name())
            return None
          case None =>
        }
        i = if (end < 0) s.length else end + 1
      } else if (s.charAt(i) == '<') {
        val e = s.indexOf('>', i)
        i = if (e < 0) s.length else e + 1
      } else i += 1
    }
    None
  }

  /** UTF-8 validity heuristic (reference detect_utf_8, detect.c:78-134):
    * ratio of well-formed multibyte sequences. */
  def looksLikeUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    var bad = 0
    var multi = 0
    val n = math.min(bytes.length, 4096)
    val windowTruncated = bytes.length > n
    while (i < n) {
      val b = bytes(i) & 0xFF
      if (b < 0x80) i += 1
      else {
        val need =
          if ((b & 0xE0) == 0xC0) 1
          else if ((b & 0xF0) == 0xE0) 2
          else if ((b & 0xF8) == 0xF0) 3
          else -1
        if (need < 0) { bad += 1; i += 1 }
        else {
          var ok = true
          var j = 1
          while (j <= need && ok) {
            if (i + j >= n) ok = windowTruncated // cut off by window, not by data
            else if ((bytes(i + j) & 0xC0) != 0x80) { ok = false }
            j += 1
          }
          if (ok) { multi += 1; i += need + 1 } else { bad += 1; i += 1 }
        }
      }
    }
    bad == 0 || (multi > 0 && bad.toDouble / (multi + bad) < 0.1)
  }

  /** Cyrillic candidate codecs (reference detect.c:233-337 —
    * encoding_detect_russian scores windows-1251 / koi8-r / ibm866 /
    * iso-8859-5 / x-mac-cyrillic via trigram frequency; we re-derive
    * with a common-Russian-letter frequency score over each candidate
    * decode — same decision shape, public letter-frequency data). */
  private val cyrillicCandidates = Seq(
    "windows-1251", "KOI8-R", "IBM866", "ISO-8859-5", "x-MacCyrillic")

  // most frequent Russian letters (о е а и н т с р в л), both cases
  private val freqCyr = "оеаинтсрвлОЕАИНТСРВЛ".toSet

  private def cyrillicScore(s: String): Int = {
    var score = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x0400 && c <= 0x04FF) {
        score += 1
        if (freqCyr.contains(c)) score += 2
      } else if (c == 0xFFFD || (c >= 0x2500 && c <= 0x25FF)) score -= 1
      i += 1
    }
    score
  }

  /** Pick the best Cyrillic codec for a non-UTF-8 byte stream, or None
    * when nothing scores convincingly (reference myencoding_detect_russian). */
  def detectCyrillic(bytes: Array[Byte]): Option[String] = {
    val n = math.min(bytes.length, 4096)
    var has8bit = false
    var i = 0
    while (i < n && !has8bit) { has8bit = (bytes(i) & 0x80) != 0; i += 1 }
    if (!has8bit) return None
    val window = java.util.Arrays.copyOf(bytes, n)
    val scored = cyrillicCandidates.flatMap { cs =>
      if (!Charset.isSupported(cs)) None
      else {
        val dec = Charset.forName(cs).newDecoder()
          .onMalformedInput(CodingErrorAction.REPLACE)
          .onUnmappableCharacter(CodingErrorAction.REPLACE)
        val s = dec.decode(java.nio.ByteBuffer.wrap(window)).toString
        Some(cs -> cyrillicScore(s))
      }
    }
    val (best, score) = scored.maxBy(_._2)
    // demand a clear Cyrillic majority among 8-bit chars
    val eightBit = window.count(b => (b & 0x80) != 0)
    if (score > math.max(8, eightBit / 2)) Some(best) else None
  }

  /** Full sniff: BOM → meta-prescan → UTF-8 heuristic → Cyrillic
    * heuristics → windows-1252 fallback (the WHATWG default for legacy
    * content). */
  def sniff(bytes: Array[Byte]): String = {
    val bom = detectBom(bytes)
    if (bom != null) return bom._1
    prescanMeta(bytes) match {
      case Some(cs) => cs
      case None =>
        if (looksLikeUtf8(bytes)) "UTF-8"
        else detectCyrillic(bytes).getOrElse("windows-1252")
    }
  }

  /** WHATWG `x-user-defined` decoder — absent from the JDK entirely
    * (reference enum myencoding/myosi.h:47-89 carries it): bytes < 0x80
    * map to themselves, bytes 0x80-0xFF map to U+F780 + (byte - 0x80)
    * (private-use plane, round-trippable). Single pass, never fails. */
  def decodeXUserDefined(bytes: Array[Byte], offset: Int = 0): String = {
    val sb = new java.lang.StringBuilder(bytes.length - offset)
    var i = offset
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      sb.append(if (b < 0x80) b.toChar else (0xF780 + (b - 0x80)).toChar)
      i += 1
    }
    sb.toString
  }

  /** ISO-8859-10 / ISO-8859-14 high-byte tables — hand-written per-byte
    * decoders for the two WHATWG single-byte encodings absent from the
    * JDK (reference: myencoding_map_iso_8859_10 / _14,
    * source/myencoding/encoding.c:193,229 + resource.h tables; values
    * regenerated from the public ISO/WHATWG index data). Char at index i
    * is the mapping of byte 0x80+i; bytes < 0x80 map to themselves. */
  private val iso885910High: String =
    "\u0080\u0081\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008A\u008B" +
    "\u008C\u008D\u008E\u008F\u0090\u0091\u0092\u0093\u0094\u0095\u0096\u0097" +
    "\u0098\u0099\u009A\u009B\u009C\u009D\u009E\u009F\u00A0\u0104\u0112\u0122" +
    "\u012A\u0128\u0136\u00A7\u013B\u0110\u0160\u0166\u017D\u00AD\u016A\u014A" +
    "\u00B0\u0105\u0113\u0123\u012B\u0129\u0137\u00B7\u013C\u0111\u0161\u0167" +
    "\u017E\u2015\u016B\u014B\u0100\u00C1\u00C2\u00C3\u00C4\u00C5\u00C6\u012E" +
    "\u010C\u00C9\u0118\u00CB\u0116\u00CD\u00CE\u00CF\u00D0\u0145\u014C\u00D3" +
    "\u00D4\u00D5\u00D6\u0168\u00D8\u0172\u00DA\u00DB\u00DC\u00DD\u00DE\u00DF" +
    "\u0101\u00E1\u00E2\u00E3\u00E4\u00E5\u00E6\u012F\u010D\u00E9\u0119\u00EB" +
    "\u0117\u00ED\u00EE\u00EF\u00F0\u0146\u014D\u00F3\u00F4\u00F5\u00F6\u0169" +
    "\u00F8\u0173\u00FA\u00FB\u00FC\u00FD\u00FE\u0138"

  private val iso885914High: String =
    "\u0080\u0081\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008A\u008B" +
    "\u008C\u008D\u008E\u008F\u0090\u0091\u0092\u0093\u0094\u0095\u0096\u0097" +
    "\u0098\u0099\u009A\u009B\u009C\u009D\u009E\u009F\u00A0\u1E02\u1E03\u00A3" +
    "\u010A\u010B\u1E0A\u00A7\u1E80\u00A9\u1E82\u1E0B\u1EF2\u00AD\u00AE\u0178" +
    "\u1E1E\u1E1F\u0120\u0121\u1E40\u1E41\u00B6\u1E56\u1E81\u1E57\u1E83\u1E60" +
    "\u1EF3\u1E84\u1E85\u1E61\u00C0\u00C1\u00C2\u00C3\u00C4\u00C5\u00C6\u00C7" +
    "\u00C8\u00C9\u00CA\u00CB\u00CC\u00CD\u00CE\u00CF\u0174\u00D1\u00D2\u00D3" +
    "\u00D4\u00D5\u00D6\u1E6A\u00D8\u00D9\u00DA\u00DB\u00DC\u00DD\u0176\u00DF" +
    "\u00E0\u00E1\u00E2\u00E3\u00E4\u00E5\u00E6\u00E7\u00E8\u00E9\u00EA\u00EB" +
    "\u00EC\u00ED\u00EE\u00EF\u0175\u00F1\u00F2\u00F3\u00F4\u00F5\u00F6\u1E6B" +
    "\u00F8\u00F9\u00FA\u00FB\u00FC\u00FD\u0177\u00FF"

  private def decodeHighTable(bytes: Array[Byte], table: String): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      sb.append(if (b < 0x80) b.toChar else table.charAt(b - 0x80))
      i += 1
    }
    sb.toString
  }

  /** Decode with the sniffed (or given) charset; never throws — bad bytes
    * become U+FFFD ("is not afraid of binary files and other trash",
    * /root/reference/Changes:33). Any of the 213 WHATWG labels resolves;
    * unknown names fall back to a direct JDK lookup, then UTF-8. */
  def decode(bytes: Array[Byte], charsetName: String = null): String = {
    val name = if (charsetName != null) charsetName else sniff(bytes)
    val resolved = resolveLabel(name)
    resolved.map(_._2) match {
      case Some("@x-user-defined") => return decodeXUserDefined(bytes)
      case Some("@iso-8859-10") => return decodeHighTable(bytes, iso885910High)
      case Some("@iso-8859-14") => return decodeHighTable(bytes, iso885914High)
      case _ =>
    }
    val mapped = resolved match {
      case Some((_, jdk)) if Charset.isSupported(jdk) => jdk
      case _ => name
    }
    val canonical = resolved.map(_._1).getOrElse(name)
    val bomLen = detectBom(bytes) match {
      case null => 0
      case (cs, l) if canonical != null && cs.equalsIgnoreCase(canonical) => l
      case _ => 0
    }
    val cs =
      try Charset.forName(mapped)
      catch { case _: Exception => StandardCharsets.UTF_8 }
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, bomLen, bytes.length - bomLen)).toString
  }
}
