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

  /** WHATWG label → (canonical WHATWG name, closest JDK charset).
    * The JDK column is chosen to match the WHATWG *index*, which for the
    * East-Asian legacy encodings is the wider Windows/HKSCS variant, not
    * the JDK charset that happens to share the label:
    * shift_jis ⇒ windows-31j (cp932 superset — WHATWG's index IS cp932),
    * euc-kr ⇒ x-windows-949 (WHATWG euc-kr is the full UHC/cp949 table),
    * big5 ⇒ Big5-HKSCS (WHATWG's index carries the HKSCS extensions).
    * Divergence notes live in BASELINE.md §encodings. Reference: the 40
    * per-byte decoders in source/myencoding/encoding.c + enum
    * myencoding/myosi.h:47-89. */
  val whatwgLabels: Map[String, (String, String)] = {
    def all(canon: String, jdk: String, labels: String*) =
      labels.map(_ -> (canon, jdk))
    (all("Shift_JIS", "windows-31j",
        "shift_jis", "shift-jis", "sjis", "ms_kanji", "ms932", "csshiftjis",
        "windows-31j", "x-sjis") ++
     all("EUC-KR", "x-windows-949",
        "euc-kr", "cseuckr", "korean", "ks_c_5601-1987", "ks_c_5601-1989",
        "ksc_5601", "ksc5601", "iso-ir-149", "csksc56011987", "windows-949") ++
     all("Big5", "Big5-HKSCS",
        "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5") ++
     all("gb18030", "GB18030", "gb18030") ++
     all("GBK", "GBK",
        "gbk", "gb2312", "gb_2312", "gb_2312-80", "chinese", "csgb2312",
        "csiso58gb231280", "iso-ir-58", "x-gbk") ++
     all("EUC-JP", "EUC-JP",
        "euc-jp", "cseucpkdfmtjapanese", "x-euc-jp")).toMap
  }

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
    val s = new String(bytes, 0, n, StandardCharsets.ISO_8859_1).toLowerCase
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
                if (Charset.isSupported(jdk)) return Some(canonical)
                // fall through to the plain JDK lookup if the preferred
                // variant charset is missing from this JVM
              case None =>
            }
            if (Charset.isSupported(cs)) return Some(Charset.forName(cs).name())
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

  /** Decode with the sniffed (or given) charset; never throws — bad bytes
    * become U+FFFD ("is not afraid of binary files and other trash",
    * /root/reference/Changes:33). */
  def decode(bytes: Array[Byte], charsetName: String = null): String = {
    val name = if (charsetName != null) charsetName else sniff(bytes)
    if (name != null && name.equalsIgnoreCase("x-user-defined"))
      return decodeXUserDefined(bytes)
    // canonical WHATWG name (or any alias) → the JDK charset whose table
    // matches the WHATWG index (cp932 / cp949 / HKSCS variants)
    val mapped = whatwgLabels.get(if (name == null) "" else name.toLowerCase) match {
      case Some((_, jdk)) if Charset.isSupported(jdk) => jdk
      case _ => name
    }
    val bomLen = detectBom(bytes) match {
      case null => 0
      case (cs, l) if cs == name => l
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
