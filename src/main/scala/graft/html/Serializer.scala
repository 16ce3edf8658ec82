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

  /** Serialize a node's subtree to HTML (the node itself included unless
    * it is a Document). */
  def toHtml(node: Node): String = {
    val sb = new java.lang.StringBuilder(256)
    serialize(node, sb)
    sb.toString
  }

  /** Serialize only the children (innerHTML semantics — what the
    * reference's tree serializer does from the root). */
  def innerHtml(node: Node): String = {
    val sb = new java.lang.StringBuilder(256)
    var c = node.firstChild
    while (c != null) { serialize(c, sb); c = c.next }
    sb.toString
  }

  private def serialize(n: Node, sb: java.lang.StringBuilder): Unit = n.kind match {
    case NodeKind.Document =>
      var c = n.firstChild
      while (c != null) { serialize(c, sb); c = c.next }
    case NodeKind.Doctype =>
      sb.append("<!DOCTYPE ").append(n.name)
      if (n.publicId != null) {
        sb.append(" PUBLIC \"").append(n.publicId).append('"')
        if (n.systemId != null) sb.append(" \"").append(n.systemId).append('"')
      } else if (n.systemId != null) {
        sb.append(" SYSTEM \"").append(n.systemId).append('"')
      }
      sb.append('>')
    case NodeKind.Comment =>
      sb.append("<!--").append(n.text).append("-->")
    case NodeKind.Text =>
      val parentRaw = n.parent != null && n.parent.kind == NodeKind.Element &&
        n.parent.ns == Ns.HTML && rawTextTags.contains(n.parent.name)
      sb.append(if (parentRaw) n.text else escapeText(n.text))
    case NodeKind.Element =>
      sb.append('<').append(n.name)
      if (n.attrs != null) n.attrs.foreach { a =>
        sb.append(' ').append(a.name).append("=\"").append(escapeAttr(a.value)).append('"')
      }
      sb.append('>')
      if (!(n.ns == Ns.HTML && Tags.void.contains(n.name))) {
        var c = n.firstChild
        while (c != null) { serialize(c, sb); c = c.next }
        sb.append("</").append(n.name).append('>')
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
