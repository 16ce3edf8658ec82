package graft.html

import scala.collection.mutable.ArrayBuffer

/** HTML5 tokenizer.
  *
  * Spec-equivalent re-expression of the reference's 70-state
  * function-pointer machine (source/myhtml/tokenizer.c:85-89 dispatch;
  * states enum source/myhtml/myosi.h:126-199; script sub-machine
  * tokenizer_script.c; doctype tokenizer_doctype.c; EOF flush table
  * tokenizer_end.c). Instead of a per-character state table we use
  * grouped scanners — one per content model — which the JIT compiles to
  * tight loops; EOF handling is folded into each scanner (the reference
  * keeps a parallel `state_f[state + LAST_ENTRY]` table for the same
  * purpose, tokenizer.c:161-176).
  *
  * Content-model switching (RCDATA/RAWTEXT/SCRIPT/PLAINTEXT) is done by
  * the tree builder setting `state` — the single tokenizer↔builder
  * feedback edge (reference: tree.c:2247-2255 / tokenizer.c:357-374).
  */
object ContentModel {
  final val DATA = 0
  final val RCDATA = 1
  final val RAWTEXT = 2
  final val SCRIPT = 3
  final val PLAINTEXT = 4
}

final class Tokenizer(src0: String, sink: TokenSink) {
  import ContentModel._

  val src: String = TextPrep.normalize(src0)
  private val len = src.length

  /** Content model; the tree builder mutates this (generic raw-text
    * element algorithm, reference tree.c:2247). */
  var state: Int = DATA
  /** Scripting flag — gates noscript's content model
    * (reference myhtml_tokenizer_set_state, tokenizer.c:358-377). */
  var scripting: Boolean = false
  /** Last emitted start tag name — "appropriate end tag" checks
    * (reference tmp_tag_id, tokenizer.c:440-483). */
  var lastStartTag: String = null

  private var pos = 0
  private var eofEmitted = false

  // reusable buffers (one tokenizer instance per document — per-token
  // allocation is the GC hot spot at 10^9 rows; reference pools the
  // same way via mchar_async, SURVEY §2.6 X4).
  // The DATA text run is VERBATIM SOURCE (charrefs decode at flush over
  // the token's raw slice — the reference's worker model, parser.c:185;
  // decoding inline at '&' would let the walk see past the token
  // boundary, which changes the reference's end-of-name resolution).
  private var textStart = -1
  private var runEnd = -1
  /** Reference WHITESPACE flag for the current run (token.c:178 default;
    * cleared only by the DATA scanner, tokenizer.c:775-777). */
  private var runWs = true
  /** First NUL in a run sets the NULL type without clearing the
    * whitespace flag (tokenizer.c:769-773 branch order); later NULs fall
    * through to the whitespace check and clear it. */
  private var runNullSeen = false
  private val nameBuf = new java.lang.StringBuilder(16)
  private val attrNameBuf = new java.lang.StringBuilder(16)
  private val attrValBuf = new java.lang.StringBuilder(32)

  def run(): Unit = {
    while (!eofEmitted) step()
  }

  private def flushText(): Unit = {
    if (textStart >= 0 && runEnd > textStart) {
      val raw = src.substring(textStart, runEnd)
      // the token's raw slice decodes as one unit (DATA type)
      val t = if (raw.indexOf('&') >= 0)
        Entities.decodeAll(raw, inAttribute = false) else raw
      sink.process(CharsTok(t, textStart, runWs))
    }
    textStart = -1
    runEnd = -1
    runWs = true
    runNullSeen = false
  }

  /** Extend the verbatim source run to cover [from, to). All DATA-state
    * text is contiguous source by construction. */
  private def appendRun(from: Int, to: Int): Unit = {
    if (textStart < 0) textStart = from
    runEnd = to
  }

  private def emitEof(): Unit = {
    flushText()
    eofEmitted = true
    sink.process(EofTok)
  }

  @inline private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def step(): Unit = state match {
    case DATA      => stepData()
    case PLAINTEXT => stepPlaintext()
    case RCDATA    => stepRawish(decodeCharrefs = true)
    case RAWTEXT   => stepRawish(decodeCharrefs = false)
    case SCRIPT    => stepScript()
  }

  // ---------------------------------------------------------------- DATA

  private def stepData(): Unit = {
    while (pos < len) {
      val c = src.charAt(pos)
      if (c == '<') {
        if (handleTagOpen()) return // state may have changed
      } else {
        // NUL stays in DATA (tree builder drops/replaces it per mode);
        // the FIRST NUL sets the NULL type without touching the ws flag
        if (c == '\u0000' && !runNullSeen) runNullSeen = true
        else if (runWs && !TextPrep.isWhitespace(c)) runWs = false
        appendRun(pos, pos + 1)
        pos += 1
      }
    }
    emitEof()
  }

  /** At '<' in DATA. Returns true if the content model may have changed
    * (a start tag was emitted) and the dispatch loop must re-enter. */
  private def handleTagOpen(): Boolean = {
    val start = pos
    if (pos + 1 >= len) {
      // reference parity (end_state_tag_open, tokenizer_end.c:32-54):
      // EOF right after '<'. If the run began at document offset 0
      // (raw_begin==0), the run + '<' flush as ONE text token with the
      // whitespace flag force-cleared ("y<"→text "y<"). Otherwise the
      // pending run + '<' collapse into a GARBAGE START TAG whose name is
      // the raw slice [runStart, EOF) — "<p>x<" inserts an element named
      // "x<" and the text is lost (verified against the built reference).
      val runStart = if (textStart >= 0) textStart else pos
      if (runStart == 0) {
        appendRun(pos, pos + 1)
        runWs = false
      } else {
        textStart = -1; runEnd = -1; runWs = true; runNullSeen = false
        val garbage = src.substring(runStart, len).toLowerCase
        sink.process(StartTagTok(garbage, emptyAttrs, selfClosing = false, runStart))
      }
      pos += 1
      return false
    }
    val c1 = src.charAt(pos + 1)
    if (isAsciiLetter(c1)) {
      flushText()
      pos += 1
      emitTag(start, isEnd = false)
      true
    } else if (c1 == '/') {
      if (pos + 2 >= len) {
        // EOF after "</": run + "</" flush as one text token, whitespace
        // flag force-cleared (end_state_end_tag_open, tokenizer_end.c:65-77)
        appendRun(pos, len); runWs = false; pos = len; return false
      }
      val c2 = src.charAt(pos + 2)
      if (isAsciiLetter(c2)) {
        flushText()
        pos += 2
        emitTag(start, isEnd = true)
        true
      } else if (c2 == '>') {
        // reference parity: "</>" emits NO token and does NOT flush the
        // pending run — the raw text run absorbs it ("a</>b" is one text
        // node; tokenizer.c:869-876 just advances past '>'). Current
        // WHATWG would drop the three chars instead.
        appendRun(pos, pos + 3)
        pos += 3
        false
      } else {
        flushText()
        pos += 2
        bogusComment(start)
        false
      }
    } else if (c1 == '!') {
      flushText()
      markupDeclaration(start)
      true // builder may have reacted to comment/doctype; harmless
    } else if (c1 == '?') {
      flushText()
      pos += 1
      bogusComment(start)
      false
    } else {
      // '<' + other: the tag_open else-branch force-clears the whitespace
      // flag (tokenizer.c:838-845) before re-scanning the char in DATA
      appendRun(pos, pos + 1)
      runWs = false
      pos += 1
      false
    }
  }

  // --------------------------------------------------------- tag parsing

  /** Parse a tag at `pos` pointing at the first name char; '<'('/') are
    * already consumed. EOF inside a tag drops the token (reference
    * tokenizer_end.c) — EXCEPT EOF inside a START tag's name, where the
    * reference re-emits the raw name as character data (verified against
    * the built reference binary: "x<div"+EOF → text "xdiv" in original
    * case; the current WHATWG spec would drop it — we match the
    * reference, per the span-equality invariant). */
  private def emitTag(rawBegin: Int, isEnd: Boolean): Unit = {
    val nameStart = pos
    val t = parseTagBody(rawBegin, isEnd)
    if (t == null) {
      if (!isEnd && eofInTagName && nameStart < len) {
        // EOF in a START tag's name: the raw name is re-emitted as a text
        // token that KEEPS the whitespace flag (tokenizer_end.c:56-62 does
        // not clear it; fresh tokens default to it, token.c:178, and
        // tag-name chars never pass through the DATA scanner). EOF in an
        // END tag's name emits a CLOSE-typed text token the tree ignores
        // ("any other end tag" finds no element) — we skip it entirely.
        sink.process(CharsTok(src.substring(nameStart, len), nameStart, ws = true))
      }
      emitEof()
      return
    }
    t match {
      case st: StartTagTok =>
        lastStartTag = st.name
        sink.process(st)
        // content-model switching is BUILDER-driven: in the reference's
        // single mode, myhtml_queue_add -> calc_current_namespace
        // overwrites the tokenizer state with tree->state_of_builder
        // after EVERY token (myhtml.c:1580), so only rules.c's switches
        // survive — the sink (tree builder) has already set our state
      case et: EndTagTok =>
        sink.process(et)
      case _ =>
    }
  }

  private def decodeAttrValue(raw0: String): String = {
    val raw = if (raw0.indexOf('\u0000') >= 0)
      raw0.replace('\u0000', '\uFFFD') else raw0
    if (raw.indexOf('&') >= 0) Entities.decodeAll(raw, inAttribute = true)
    else raw
  }

  private val emptyAttrs = new ArrayBuffer[DomAttr](0)
  private var eofInTagName = false

  /** Per-tag content model (reference tag_init.c data_parser column). */
  private def dataParserFor(name: String): Int = name match {
    case "title" | "textarea" => RCDATA
    case "style" | "xmp" | "iframe" | "noembed" | "noframes" => RAWTEXT
    case "noscript" => if (scripting) RAWTEXT else DATA
    case "script" => SCRIPT
    case "plaintext" => PLAINTEXT
    case _ => DATA
  }

  /** Returns null when the tag is DROPPED at EOF (reference
    * tokenizer_end.c: EOF in a QUOTED attribute value or in the
    * self-closing-start state queues nothing); EOF in the attribute-name
    * family (before/in/after attr name, before value, UNQUOTED value)
    * EMITS the partial token exactly like the reference
    * (tokenizer_end.c:128-215 all call myhtml_queue_add — verified
    * against the binary: "x<div a" ⇒ <div a="">, "x<div a=b" ⇒
    * <div a="b">, "x<div a=\"b" ⇒ nothing; end tags are emitted too and
    * the tree's not-in-scope rule usually drops them).
    *
    * Stray '/' mid-tag follows the reference's flag model, which
    * diverges from WHATWG: '/' seen in before-attr-name or while
    * scanning an attr NAME sets the self-closing flag immediately
    * (tokenizer.c before_attribute_name '/': type |= CLOSE_SELF) — so
    * `<svg><g / >c` self-closes g — while '/' right after the tag name
    * or after a QUOTED value enters self-closing-start, which on
    * anything but '>' reconsumes WITHOUT the flag (tokenizer.c
    * state_self_closing_start_tag) — so `<svg><g/ >c` keeps c inside g.
    * Verified against the binary for all six slash positions. */
  private def parseTagBody(rawBegin: Int, isEnd: Boolean): Token = {
    eofInTagName = false
    // tag name
    val nameSb = nameBuf
    nameSb.setLength(0)
    var c: Char = 0
    while (pos < len && {
      c = src.charAt(pos)
      !(TextPrep.isWhitespace(c) || c == '/' || c == '>')
    }) {
      nameSb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar
                    else if (c == 0) '�' else c)
      pos += 1
    }
    if (pos >= len) { eofInTagName = true; return null }
    val name = Tags.Names.internTag(nameSb)
    var attrs: ArrayBuffer[DomAttr] = null
    var selfClosing = false

    def mkToken(): Token =
      if (isEnd) EndTagTok(name, rawBegin)
      else StartTagTok(name, if (attrs == null) emptyAttrs else attrs,
        selfClosing, rawBegin)

    def addAttr(anm: String, value: String): Unit = {
      if (anm.isEmpty) return
      // duplicate attributes are kept VERBATIM in token order — the
      // reference's tokenizer never dedups the attr chain (WHATWG's
      // duplicate-attribute drop is a spec divergence it doesn't have).
      // Binary-probed: "<body><body a=x a='&amp;'>" merges a=x into the
      // existing body (copy-if-absent sees the FIRST chain entry), while
      // the Perl binding's attr HASH view shows the LAST — both only
      // reproducible when the chain holds both entries. Lookup by name
      // (Node.attr) returns the first match, like attr_by_name.
      if (attrs == null) attrs = new ArrayBuffer[DomAttr](4)
      attrs += DomAttr(anm, value)
    }

    var done = false
    var dropped = false
    var emitted: Token = null

    /** self-closing-start state: '>' sets the flag and finishes; EOF
      * drops the whole token; anything else reconsumes (no flag). */
    def selfClosingStart(): Unit = {
      pos += 1 // the '/'
      if (pos >= len) { dropped = true; done = true }
      else if (src.charAt(pos) == '>') {
        selfClosing = true; pos += 1; emitted = mkToken(); done = true
      }
      // else: reconsume in before-attr-name, flag NOT set
    }

    // SCS entered directly from the tag name's '/' terminator
    if (src.charAt(pos) == '/') selfClosingStart()

    while (!done) {
      // before attribute name: skip whitespace
      while (pos < len && TextPrep.isWhitespace(src.charAt(pos))) pos += 1
      if (pos >= len) { emitted = mkToken(); done = true }
      else {
        c = src.charAt(pos)
        if (c == '>') { pos += 1; emitted = mkToken(); done = true }
        else if (c == '/') { selfClosing = true; pos += 1 } // CLOSE_SELF, stay
        else {
          // attribute name
          val an = attrNameBuf
          an.setLength(0)
          if (c == '=') { an.append('='); pos += 1 } // unexpected-equals: goes into name
          var brk = false
          while (!brk && pos < len) {
            c = src.charAt(pos)
            if (TextPrep.isWhitespace(c) || c == '/' || c == '>' || c == '=') brk = true
            else {
              an.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar
                        else if (c == 0) '�' else c)
              pos += 1
            }
          }
          val anm = Tags.Names.intern(an)
          if (pos >= len) { // EOF in attr name: emit with the empty-valued attr
            addAttr(anm, ""); emitted = mkToken(); done = true
          } else {
            // after attribute name
            while (pos < len && TextPrep.isWhitespace(src.charAt(pos))) pos += 1
            if (pos >= len) { addAttr(anm, ""); emitted = mkToken(); done = true }
            else if (src.charAt(pos) != '=') {
              addAttr(anm, "") // '/', '>' or next attr handled by the loop
            } else {
              pos += 1
              while (pos < len && TextPrep.isWhitespace(src.charAt(pos))) pos += 1
              if (pos >= len) { addAttr(anm, ""); emitted = mkToken(); done = true }
              else {
                val q = src.charAt(pos)
                // slice the RAW value first, then decode it as one unit —
                // the reference decodes the attr token's raw range (worker
                // model); decoding inline at '&' would let the entity walk
                // see PAST the value terminator and change end-of-name
                // resolution
                if (q == '"' || q == '\'') {
                  pos += 1
                  val vStart = pos
                  while (pos < len && src.charAt(pos) != q) pos += 1
                  if (pos >= len) { dropped = true; done = true } // EOF in quoted value
                  else {
                    addAttr(anm, decodeAttrValue(src.substring(vStart, pos)))
                    pos += 1
                    // after-attribute-value-quoted: '/' enters SCS
                    if (pos < len && src.charAt(pos) == '/') selfClosingStart()
                  }
                } else {
                  // unquoted ('/' stays part of the value)
                  val vStart = pos
                  while (pos < len && {
                    c = src.charAt(pos)
                    !TextPrep.isWhitespace(c) && c != '>'
                  }) pos += 1
                  addAttr(anm, decodeAttrValue(src.substring(vStart, pos)))
                  if (pos >= len) { emitted = mkToken(); done = true } // EOF in unquoted value: emit
                }
              }
            }
          }
        }
      }
    }
    if (dropped) null else emitted
  }

  // ------------------------------------------------- markup declarations

  private def markupDeclaration(rawBegin: Int): Unit = {
    // pos at '<', pos+1 at '!'
    val after = pos + 2
    if (after + 2 <= len && src.startsWith("--", after)) { pos += 4; comment(rawBegin) }
    else if (after + 7 > len) {
      // reference parity: markup_declaration_open needs 2 lookahead chars
      // for "--" and 7 for DOCTYPE/[CDATA[; with fewer left it WAITS for
      // the next chunk, so EOF lands in this state and
      // end_state_markup_declaration_open (tokenizer_end.c:87-126) runs a
      // bogus-comment scan over the tail: '>' found → comment up to it
      // plus one ws-cleared TEXT token for the rest; no '>' → the whole
      // tail becomes the comment.
      var j = after
      while (j < len && src.charAt(j) != '>') j += 1
      if (j < len) {
        sink.process(CommentTok(src.substring(after, j).replace('\u0000', '�'), rawBegin))
        if (j + 1 < len)
          sink.process(CharsTok(Entities.decodeAll(
            src.substring(j + 1, len), inAttribute = false), j + 1, ws = false))
      } else {
        sink.process(CommentTok(src.substring(after, len).replace('\u0000', '�'), rawBegin))
      }
      pos = len
      emitEof()
    }
    else if (src.regionMatches(true, after, "DOCTYPE", 0, 7)) { pos += 9; doctype() }
    else if (src.startsWith("[CDATA[", after)) {
      if (sink.inForeignContent) { pos += 9; cdata(rawBegin) }
      else { pos += 2; bogusComment(rawBegin) }
    } else { pos += 2; bogusComment(rawBegin) }
  }

  /** Bogus comment: data = everything from `pos` to '>' or EOF
    * (reference tokenizer.c bogus comment states). */
  private def bogusComment(rawBegin: Int): Unit = {
    val end = src.indexOf('>', pos)
    val data =
      if (end < 0) { val d = src.substring(pos); pos = len; d }
      else { val d = src.substring(pos, end); pos = end + 1; d }
    sink.process(CommentTok(data.replace('\u0000', '�'), rawBegin))
  }

  /** Proper comment; pos just after "<!--" (reference tokenizer.c:1457-1672). */
  private def comment(rawBegin: Int): Unit = {
    // spec shortcuts: "<!-->" and "<!--->"
    if (pos < len && src.charAt(pos) == '>') {
      pos += 1; sink.process(CommentTok("", rawBegin)); return
    }
    if (src.startsWith("->", pos)) {
      pos += 2; sink.process(CommentTok("", rawBegin)); return
    }
    // scan for "-->" or "--!>"
    var i = pos
    var endData = -1
    var consumedTo = -1
    var found = false
    while (!found && i < len) {
      val j = src.indexOf("--", i)
      if (j < 0) found = true // EOF
      else if (j + 2 < len && src.charAt(j + 2) == '>') {
        endData = j; consumedTo = j + 3; found = true
      } else if (j + 3 < len && src.charAt(j + 2) == '!' && src.charAt(j + 3) == '>') {
        endData = j; consumedTo = j + 4; found = true
      } else i = j + 1
    }
    if (endData < 0) {
      // EOF in a comment — per-state flush, binary-probed:
      //  - "<!--"+EOF (zero raw chars): the reference's token keeps tag
      //    UNDEF and queues it → a "-undef" ELEMENT enters the tree
      //    through the normal start-tag rules (fosters in tables, forces
      //    body creation — tokenizer_end.c comment handler + rules);
      //  - EOF in comment-end state (content ends with "--"): the two
      //    dashes are stripped; if nothing remains the token is dropped;
      //  - EOF in comment or comment-end-dash: emit content as-is
      //    (single pending dash kept: "<!---" → comment "-").
      val d = src.substring(pos)
      pos = len
      if (d.isEmpty) {
        val undefSb = new java.lang.StringBuilder("-undef")
        // rawBegin = one before the (empty) content, matching the
        // '<'-before-name convention (the reference's raw_begin for the
        // UNDEF token is the comment-content offset, i.e. ours + 1)
        sink.process(StartTagTok(Tags.Names.internTag(undefSb),
          new ArrayBuffer[DomAttr](0), false, pos - 1))
      } else if (d.endsWith("--")) {
        val stripped = d.substring(0, d.length - 2)
        if (stripped.nonEmpty)
          sink.process(CommentTok(stripped.replace('\u0000', '�'), rawBegin))
      } else {
        sink.process(CommentTok(d.replace('\u0000', '�'), rawBegin))
      }
      return
    }
    val data = src.substring(pos, endData)
    pos = consumedTo
    sink.process(CommentTok(data.replace('\u0000', '�'), rawBegin))
  }

  /** CDATA section in foreign content; pos just after "<![CDATA["
    * (reference tokenizer.c:708-750). */
  private def cdata(rawBegin: Int): Unit = {
    val end = src.indexOf("]]>", pos)
    val data =
      if (end < 0) { val d = src.substring(pos); pos = len; d }
      else { val d = src.substring(pos, end); pos = end + 3; d }
    if (data.nonEmpty) sink.process(CharsTok(data, rawBegin))
  }

  // -------------------------------------------------------------- DOCTYPE

  /** pos just after "<!DOCTYPE" (reference tokenizer_doctype.c:27-510). */
  private def doctype(): Unit = {
    var name: String = null
    var publicId: String = null
    var systemId: String = null
    var forceQuirks = false

    def skipWs(): Unit = while (pos < len && TextPrep.isWhitespace(src.charAt(pos))) pos += 1

    def emit(): Unit = sink.process(DoctypeTok(name, publicId, systemId, forceQuirks))

    def bogusToGt(): Unit = {
      val end = src.indexOf('>', pos)
      pos = if (end < 0) len else end + 1
    }

    skipWs()
    if (pos >= len) { forceQuirks = true; emit(); emitEof(); return }
    if (src.charAt(pos) == '>') { pos += 1; forceQuirks = true; emit(); return }
    // name
    val nb = new java.lang.StringBuilder(8)
    var c: Char = 0
    while (pos < len && { c = src.charAt(pos); !(TextPrep.isWhitespace(c) || c == '>') }) {
      nb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else if (c == 0) '�' else c)
      pos += 1
    }
    name = nb.toString
    if (pos >= len) { forceQuirks = true; emit(); emitEof(); return }
    skipWs()
    if (pos >= len) { forceQuirks = true; emit(); emitEof(); return }
    if (src.charAt(pos) == '>') { pos += 1; emit(); return }

    var abrupt = false
    var eofInDoctype = false
    def quotedId(): String = {
      val q = src.charAt(pos)
      if (q != '"' && q != '\'') return null
      pos += 1
      val sb = new java.lang.StringBuilder(16)
      while (pos < len) {
        val ch = src.charAt(pos)
        if (ch == q) { pos += 1; return sb.toString }
        if (ch == '>') { forceQuirks = true; abrupt = true; pos += 1; return sb.toString }
        sb.append(if (ch == 0) '�' else ch)
        pos += 1
      }
      forceQuirks = true
      eofInDoctype = true
      sb.toString
    }

    if (src.regionMatches(true, pos, "PUBLIC", 0, 6)) {
      pos += 6
      skipWs()
      if (pos >= len) { forceQuirks = true; emit(); emitEof(); return }
      publicId = quotedId()
      if (publicId == null) { forceQuirks = true; bogusToGt(); emit(); return }
      if (eofInDoctype) { emit(); emitEof(); return }
      if (abrupt) { emit(); return }
      skipWs()
      if (pos >= len) { forceQuirks = true; emit(); emitEof(); return }
      if (src.charAt(pos) == '>') { pos += 1; emit(); return }
      systemId = quotedId()
      if (systemId == null) { forceQuirks = true; bogusToGt(); emit(); return }
      if (eofInDoctype) { emit(); emitEof(); return }
      if (abrupt) { emit(); return }
    } else if (src.regionMatches(true, pos, "SYSTEM", 0, 6)) {
      pos += 6
      skipWs()
      if (pos >= len) { forceQuirks = true; emit(); emitEof(); return }
      systemId = quotedId()
      if (systemId == null) { forceQuirks = true; bogusToGt(); emit(); return }
      if (eofInDoctype) { emit(); emitEof(); return }
      if (abrupt) { emit(); return }
    } else {
      forceQuirks = true
      bogusToGt()
      emit()
      return
    }
    skipWs()
    if (pos >= len) { emit(); emitEof(); return }
    if (src.charAt(pos) == '>') { pos += 1; emit(); return }
    bogusToGt() // chars after system id: bogus but NOT force-quirks
    emit()
  }

  // ------------------------------------------------------ PLAINTEXT

  private def stepPlaintext(): Unit = {
    if (pos < len) {
      // one raw token: no charref decode, whitespace flag force-cleared
      // (reference tokenizer.c:684-702, clear at :689)
      sink.process(CharsTok(
        src.substring(pos).replace('\u0000', '\uFFFD'), pos, ws = false))
      pos = len
    }
    emitEof()
  }

  // ------------------------------------------- RCDATA / RAWTEXT scanners

  /** True if "</" at `i` begins an appropriate end tag (matches
    * lastStartTag, followed by ws / '/' / '>'). */
  private def appropriateEndTagAt(i: Int): Boolean = {
    if (lastStartTag == null) return false
    val nameLen = lastStartTag.length
    if (!src.regionMatches(true, i + 2, lastStartTag, 0, nameLen)) return false
    val after = i + 2 + nameLen
    if (after >= len) return false // EOF right after name: stays text per spec
    val c = src.charAt(after)
    TextPrep.isWhitespace(c) || c == '/' || c == '>'
  }

  /** RCDATA / RAWTEXT section scanner — reference-parity semantics
    * established by black-box probing the built reference binary
    * (tokenizer.c an-data states + tokenizer_end.c):
    *  - the section is ONE token, charref-decoded at materialization iff
    *    its final type is RCDATA — which includes RAWTEXT sections where
    *    a MISMATCHED end-tag attempt occurred (the shared mismatch branch
    *    hardcodes STATE_RCDATA, tokenizer.c:450: `<iframe>&amp;a</p>&amp;b`
    *    decodes BOTH refs);
    *  - after a mismatch, EOF landing inside a partial `<`/`</name`
    *    DROPS the whole section text (the token's tag_id is no longer
    *    UNDEF, so the EOF flush refuses to emit it);
    *  - without a mismatch, EOF keeps the partial tail literally. */
  private def stepRawish(decodeCharrefs: Boolean): Unit = {
    // Scan-only: every char the section consumes is VERBATIM source (the
    // only transform, NUL -> U+FFFD, is same-length), so the token text is
    // always a substring — no per-char builder (hot path: <script>/<style>
    // bodies are the largest text runs in real documents).
    val sectionStart = pos
    var mismatch = false
    var nulSeen = false
    var dropped = false // EOF inside a partial tag AFTER a mismatch: the
                        // token's tag_id is no longer UNDEF, so the EOF
                        // flush refuses to emit it (tokenizer_end.c)
    var matched = -1    // position of the matching "</name" when found
    while (pos < len && matched < 0 && !dropped) {
      val c = src.charAt(pos)
      if (c == '<') {
        if (pos + 1 < len && src.charAt(pos + 1) == '/') {
          if (pos + 2 < len && isAsciiLetter(src.charAt(pos + 2))) {
            var j = pos + 2
            while (j < len && isAsciiLetter(src.charAt(j))) j += 1
            if (j >= len) {
              // EOF mid end-tag name: keep the partial tail unless a
              // mismatch poisoned the section
              if (mismatch) dropped = true
              pos = len
            } else {
              val term = src.charAt(j)
              if (TextPrep.isWhitespace(term) || term == '/' || term == '>') {
                val nameLen = j - (pos + 2)
                val isMatch = lastStartTag != null &&
                  nameLen == lastStartTag.length &&
                  src.regionMatches(true, pos + 2, lastStartTag, 0, nameLen)
                if (isMatch) matched = pos
                else { mismatch = true; pos = j + 1 } // "</name"+term stay text
              } else pos += 1 // only '<' consumed; rest re-scans
            }
          } else if (pos + 2 >= len) {
            if (mismatch) dropped = true
            pos = len
          } else pos += 1
        } else if (pos + 1 >= len) {
          if (mismatch) dropped = true
          pos = len
        } else pos += 1
      } else {
        if (c == '\u0000') nulSeen = true
        pos += 1
      }
    }
    val sectionEnd = if (matched >= 0) matched else pos
    if (!dropped && sectionEnd > sectionStart) {
      var t = src.substring(sectionStart, sectionEnd)
      if (nulSeen) t = t.replace('\u0000', '\uFFFD')
      // the section is ONE token, charref-decoded iff its final type is
      // RCDATA — which includes RAWTEXT sections where a MISMATCHED
      // end-tag attempt occurred (the shared mismatch branch hardcodes
      // STATE_RCDATA, tokenizer.c:450: "<iframe>&amp;a</p>&amp;b"
      // decodes BOTH refs); verified against the built reference
      if (decodeCharrefs || mismatch)
        t = Entities.decodeAll(t, inAttribute = false)
      sink.process(CharsTok(t, sectionStart))
    }
    if (matched >= 0) {
      val rawBegin = pos
      pos += 2
      emitTag(rawBegin, isEnd = true)
      state = DATA
    } else {
      emitEof()
    }
  }

  // -------------------------------------------------- SCRIPT_DATA states

  /** Script data incl. escaped / double-escaped sub-machine
    * (reference tokenizer_script.c:24-600, 18 states compressed to a
    * 3-mode scanner with identical observable behavior). */
  private def stepScript(): Unit = {
    var mode = 0 // 0 normal, 1 escaped, 2 double-escaped
    val sectionStart = pos
    var nulSeen = false
    @inline def delimAt(i: Int): Boolean =
      i >= len || { val c = src.charAt(i); TextPrep.isWhitespace(c) || c == '/' || c == '>' }
    def flushSection(end: Int): Unit =
      if (end > sectionStart) {
        var t = src.substring(sectionStart, end)
        if (nulSeen) t = t.replace('\u0000', '\uFFFD')
        // script text: no charref decode, ws flag cleared (section token)
        sink.process(CharsTok(t, sectionStart, ws = false))
      }
    while (pos < len) {
      val c = src.charAt(pos)
      if (c == '<') {
        if (mode != 2 && pos + 1 < len && src.charAt(pos + 1) == '/' &&
            appropriateEndTagAt(pos)) {
          flushSection(pos)
          val rawBegin = pos
          pos += 2
          emitTag(rawBegin, isEnd = true)
          state = DATA
          return
        } else if (mode == 2 && src.regionMatches(true, pos, "</script", 0, 8) &&
                   delimAt(pos + 8)) {
          pos += 8; mode = 1 // double-escape end: chars stay text
        } else if (mode == 0 && src.startsWith("<!--", pos)) {
          pos += 4; mode = 1
        } else if (mode == 1 && src.regionMatches(true, pos, "<script", 0, 7) &&
                   delimAt(pos + 7)) {
          pos += 7; mode = 2
        } else {
          pos += 1
        }
      } else if (c == '-' && mode != 0 && src.startsWith("-->", pos)) {
        pos += 3; mode = 0
      } else {
        if (c == '\u0000') nulSeen = true
        pos += 1
      }
    }
    flushSection(len)
    emitEof()
  }
}
