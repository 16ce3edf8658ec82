package graft.html

/** HTML fragment serialization + html5lib-style tree dumps.
  *
  * Reference: source/myhtml/serialization.c — start tags + attrs with
  * ns prefixes (xml:/xmlns:/xlink:, serialization.c:195-221), text
  * escaping & < > nbsp (serialization.c:322-391), attribute escaping
  * & " nbsp (serialization.c:400-459), raw text under
  * style/script/xmp/iframe/noembed/noframes/plaintext
  * (serialization.c:283-313), comments/doctype (serialization.c:113-156),
  * end tags for non-void elements (serialization.c:254-274).
  */
object Serializer {

  private val rawTextTags = Set(
    "style", "script", "xmp", "iframe", "noembed", "noframes", "plaintext"
  )

  private def escapeText(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case ' ' => sb.append("&nbsp;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def escapeAttr(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '"' => sb.append("&quot;")
        case ' ' => sb.append("&nbsp;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Output driver shared by the buffer and callback serialization
    * entry points (the reference has the same pair:
    * serialization.c:36-55 buffer driver wrapping the callback driver).
    * With `cb == null` everything accumulates in `sb` (buffer mode);
    * otherwise `sb` is a bounded staging buffer flushed to `cb` at node
    * boundaries once it reaches `chunkChars` — multi-MB subtrees stream
    * without ever materializing one giant String. */
  private final class Emitter(chunkChars: Int, cb: CharSequence => Unit) {
    val sb = new java.lang.StringBuilder(
      if (cb == null) 256 else math.min(chunkChars + 64, 1 << 16))
    @inline def maybeFlush(): Unit =
      if (cb != null && sb.length >= chunkChars) { cb(sb); sb.setLength(0) }
    def finish(): Unit = if (cb != null && sb.length > 0) { cb(sb); sb.setLength(0) }
    /** Append a potentially huge piece SLICED across flushes, so one
      * multi-MB text node / attribute value never materializes a single
      * giant chunk (ADVICE r3: node-boundary flushing alone bounds the
      * chunk by the largest syntactic piece, not by chunkChars). The
      * escapers are per-character (no cross-char state), so escaping a
      * slice at a time emits identical bytes. */
    def appendSliced(s: String, escaper: String => String): Unit = {
      // slice well under chunkChars: an escaper can expand a slice up to
      // 6x ("&nbsp;"), and maybeFlush only fires between slices — with
      // slices of chunkChars/4 the emitted chunks stay <= ~2.5x
      // chunkChars even on pathological all-escape input
      val slice = math.max(16, chunkChars / 4)
      if (cb == null || s.length <= slice) {
        sb.append(if (escaper == null) s else escaper(s))
      } else {
        var i = 0
        while (i < s.length) {
          val end = math.min(i + slice, s.length)
          val piece = s.substring(i, end)
          sb.append(if (escaper == null) piece else escaper(piece))
          maybeFlush()
          i = end
        }
      }
    }
  }

  /** Serialize a node's subtree to HTML (the node itself included unless
    * it is a Document). */
  def toHtml(node: Node): String = {
    val em = new Emitter(0, null)
    serialize(node, em)
    em.sb.toString
  }

  /** Serialize only the children (innerHTML semantics — what the
    * reference's tree serializer does from the root). */
  def innerHtml(node: Node): String = {
    val em = new Emitter(0, null)
    var c = node.firstChild
    while (c != null) { serialize(c, em); c = c.next }
    em.sb.toString
  }

  /** Streaming/callback serialization driver (reference
    * serialization.c:466-555 + callback.c): emits exactly the bytes
    * `toHtml` would, as ordered chunks of ~`chunkChars` through `cb` —
    * the memory-bounded path for multi-MB serialized output. The
    * CharSequence handed to `cb` is a reused staging buffer: consume it
    * before returning (copy if retaining). */
  def serializeWith(node: Node, chunkChars: Int = 64 * 1024)
                   (cb: CharSequence => Unit): Unit = {
    require(chunkChars > 0, "chunkChars must be positive")
    val em = new Emitter(chunkChars, cb)
    serialize(node, em)
    em.finish()
  }

  private def serialize(n: Node, em: Emitter): Unit = {
    val sb = em.sb
    n.kind match {
      case NodeKind.Document =>
        var c = n.firstChild
        while (c != null) { serialize(c, em); c = c.next }
      case NodeKind.Doctype =>
        sb.append("<!DOCTYPE ").append(n.name)
        if (n.publicId != null) {
          sb.append(" PUBLIC \"").append(n.publicId).append('"')
          if (n.systemId != null) sb.append(" \"").append(n.systemId).append('"')
        } else if (n.systemId != null) {
          sb.append(" SYSTEM \"").append(n.systemId).append('"')
        }
        sb.append('>')
        em.maybeFlush()
      case NodeKind.Comment =>
        sb.append("<!--")
        em.appendSliced(n.text, null)
        sb.append("-->")
        em.maybeFlush()
      case NodeKind.Text =>
        val parentRaw = n.parent != null && n.parent.kind == NodeKind.Element &&
          n.parent.ns == Ns.HTML && rawTextTags.contains(n.parent.name)
        em.appendSliced(n.text, if (parentRaw) null else escapeText)
        em.maybeFlush()
      case NodeKind.Element =>
        sb.append('<').append(n.name)
        if (n.attrs != null) n.attrs.foreach { a =>
          sb.append(' ').append(a.name).append("=\"")
          em.appendSliced(a.value, escapeAttr)
          sb.append('"')
        }
        sb.append('>')
        em.maybeFlush()
        if (!(n.ns == Ns.HTML && Tags.void.contains(n.name))) {
          var c = n.firstChild
          while (c != null) { serialize(c, em); c = c.next }
          sb.append("</").append(n.name).append('>')
          em.maybeFlush()
        }
    }
  }

  // ------------------------------------------------- html5lib dump style

  /** Render the tree in html5lib tree-construction `.dat` dump format —
    * the golden format our tree-builder fixtures use (the reference's
    * conformance corpus format; see /root/reference/README.md:21). */
  def dump(doc: Node): String = {
    val sb = new java.lang.StringBuilder(256)
    var c = doc.firstChild
    while (c != null) { dumpNode(c, 0, sb); c = c.next }
    sb.toString
  }

  private def dumpNode(n: Node, depth: Int, sb: java.lang.StringBuilder): Unit = {
    sb.append("| ")
    var i = 0
    while (i < depth) { sb.append("  "); i += 1 }
    n.kind match {
      case NodeKind.Doctype =>
        sb.append("<!DOCTYPE ").append(n.name)
        if ((n.publicId != null && n.publicId.nonEmpty) ||
            (n.systemId != null && n.systemId.nonEmpty)) {
          sb.append(" \"").append(if (n.publicId == null) "" else n.publicId)
          sb.append("\" \"").append(if (n.systemId == null) "" else n.systemId)
          sb.append('"')
        }
        sb.append(">\n")
      case NodeKind.Comment =>
        sb.append("<!-- ").append(n.text).append(" -->\n")
      case NodeKind.Text =>
        sb.append('"').append(n.text).append("\"\n")
      case NodeKind.Element =>
        sb.append('<')
        if (n.ns != Ns.HTML) sb.append(Ns.names(n.ns)).append(' ')
        sb.append(n.name).append(">\n")
        // attributes: sorted by name, one per line (html5lib format)
        if (n.attrs != null)
          n.attrs.sortBy(_.name).foreach { a =>
            sb.append("| ")
            var j = 0
            while (j < depth + 1) { sb.append("  "); j += 1 }
            sb.append(a.name).append("=\"").append(a.value).append("\"\n")
          }
        var c = n.firstChild
        while (c != null) { dumpNode(c, depth + 1, sb); c = c.next }
      case _ =>
        var c = n.firstChild
        while (c != null) { dumpNode(c, depth + 1, sb); c = c.next }
    }
  }

  /** Indented debug print (reference tree print wrappers,
    * MyHTML.xs:1040+). */
  def pretty(n: Node, depth: Int = 0): String = {
    val sb = new java.lang.StringBuilder
    def go(x: Node, d: Int): Unit = {
      sb.append("  " * d).append(x.toString).append('\n')
      var c = x.firstChild
      while (c != null) { go(c, d + 1); c = c.next }
    }
    go(n, depth)
    sb.toString
  }
}
