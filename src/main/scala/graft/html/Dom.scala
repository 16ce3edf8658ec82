package graft.html

import scala.collection.mutable.ArrayBuffer

/** DOM node kinds — mirrors the reference's node taxonomy
  * (reference: source/myhtml/tree.h:78-95, node types via tag ids
  * MyHTML_TAG__TEXT/_COMMENT/_DOCTYPE in source/myhtml/tag_init.c).
  */
object NodeKind {
  final val Document = 0
  final val Element  = 1
  final val Text     = 2
  final val Comment  = 3
  final val Doctype  = 4
}

object Ns {
  final val HTML   = 0
  final val SVG    = 1
  final val MathML = 2
  // foreign-ATTRIBUTE namespaces (WHATWG "adjust foreign attributes";
  // reference tokens carry these as myhtml namespace ids on the attr)
  final val XLink  = 3
  final val XML    = 4
  final val XMLNS  = 5
  val names: Array[String] = Array("html", "svg", "math", "xlink", "xml", "xmlns")
}

/** A single attribute; document order is preserved (the reference keeps
  * attrs as an ordered linked list, source/myhtml/token.h:60-73). */
final case class DomAttr(var name: String, var value: String, var ns: Int = Ns.HTML)

/** Mutable first-child/next-sibling style DOM node, re-expressed with a
  * children buffer (reference: source/myhtml/tree.h:78-95).
  *
  * `rawBegin` is the char offset of the node's source text in the
  * normalized document (reference keeps raw byte positions on tokens,
  * source/myhtml/token.h:80-84, exposed via myhtml_node_raw_position
  * api.h:1379) — this is where extracted span offsets come from.
  */
final class Node(
    kind0: Int,
    name0: String,
    ns0: Int = Ns.HTML
) {
  var kind: Int = _
  var name: String = _
  var ns: Int = _
  /** Tag category bits (Tags.flagsFor) — set at (re)initialization. */
  var flags: Int = _
  // first-child/last-child + sibling links — the reference's exact node
  // layout (source/myhtml/tree.h:78-95). O(1) attach, detach, and
  // sibling navigation, and no per-element child-buffer allocations
  // (the ArrayBuffer wrapper + Object[] backing were the #2/#4
  // allocation sources in the parse kernel's JFR profile; foster
  // parenting's insert-before-table was an arraycopy per character
  // token in the worst case).
  var parent: Node = _
  var firstChild: Node = _
  var lastChild: Node = _
  /** next sibling (null at the end). */
  var next: Node = _
  /** previous sibling (null at the start). */
  var prev: Node = _

  @inline def hasChildren: Boolean = firstChild != null
  /** O(children) — walk firstChild/next directly in hot paths. */
  def childCount: Int = {
    var c = firstChild; var n = 0
    while (c != null) { n += 1; c = c.next }
    n
  }
  /** Materializing snapshot, document order — for tests/tools; hot
    * paths walk firstChild/next directly. */
  def children: ArrayBuffer[Node] = {
    val b = new ArrayBuffer[Node](4)
    var c = firstChild
    while (c != null) { b += c; c = c.next }
    b
  }
  var attrs: ArrayBuffer[DomAttr] = _
  var text: String = ""
  var rawBegin: Int = -1
  // doctype fields
  var publicId: String = _
  var systemId: String = _

  /** (Re)initialize every field — the arena-reuse contract (NodeArena):
    * a reset node is indistinguishable from a fresh `new Node(...)`.
    * Any field added to this class MUST be cleared here. */
  def reset(k: Int, nm: String, n: Int): Node = {
    kind = k; name = nm; ns = n
    flags =
      if (k != NodeKind.Element) 0
      else if (n == Ns.HTML) Tags.Names.htmlFlags(nm)
      else Tags.flagsFor(nm, n)
    parent = null; firstChild = null; lastChild = null; next = null; prev = null
    attrs = null; text = ""; rawBegin = -1; publicId = null; systemId = null
    this
  }
  reset(kind0, name0, ns0)

  def attr(key: String): Option[String] = {
    if (attrs == null) return None
    var i = 0
    while (i < attrs.length) {
      if (attrs(i).name == key) return Some(attrs(i).value)
      i += 1
    }
    None
  }

  def hasAttr(key: String): Boolean = attr(key).isDefined

  def setAttr(key: String, value: String): Unit = {
    if (attrs == null) attrs = new ArrayBuffer[DomAttr](4)
    attrs.find(_.name == key) match {
      case Some(a) => a.value = value
      case None    => attrs += DomAttr(key, value)
    }
  }

  /** Remove an attribute (reference attr surgery, myhtml.c:1380-1431). */
  def removeAttr(key: String): Boolean = {
    if (attrs == null) return false
    val i = attrs.indexWhere(_.name == key)
    if (i >= 0) { attrs.remove(i); true } else false
  }

  /** Replace this node's text, optionally decoding character references
    * (reference myhtml_node_text_set[_with_charef], myhtml.c:614-698). */
  def setText(s: String, decodeCharrefs: Boolean = false): Unit = {
    text = if (decodeCharrefs) Entities.decodeAll(s, inAttribute = false) else s
  }

  /** Detach and discard the whole subtree (reference
    * myhtml_node_delete_recursive, tree.c:386-529). */
  def deleteRecursive(): Unit = {
    remove()
    firstChild = null
    lastChild = null
  }

  def appendChild(c: Node): Unit = {
    if (c.parent != null) c.remove()
    c.parent = this
    if (lastChild == null) { firstChild = c; lastChild = c }
    else { lastChild.next = c; c.prev = lastChild; lastChild = c }
  }

  def insertBefore(c: Node, ref: Node): Unit = {
    if (ref == null || (ref.parent ne this)) { appendChild(c); return }
    if (c.parent != null) c.remove()
    c.parent = this
    c.next = ref
    c.prev = ref.prev
    if (ref.prev == null) firstChild = c else ref.prev.next = c
    ref.prev = c
  }

  def remove(): Unit = {
    if (parent != null) {
      if (prev == null) parent.firstChild = next else prev.next = next
      if (next == null) parent.lastChild = prev else next.prev = prev
      parent = null
      prev = null
      next = null
    }
  }

  @inline def nextSibling: Node = next
  @inline def prevSibling: Node = prev

  /** Pre-order DFS over the subtree rooted here, excluding `this` —
    * pure pointer walk, zero allocation (reference iterative DFS:
    * source/myhtml/myhtml.c:435-483). */
  def descendants: Iterator[Node] = new Iterator[Node] {
    private var cur: Node = firstChild
    def hasNext: Boolean = cur != null
    def next(): Node = {
      val n = cur
      if (n.firstChild != null) cur = n.firstChild
      else {
        // ascend until a sibling exists or we're back at the iteration
        // root; the null guard covers concurrent detachment of the
        // subtree being walked (ancestor chain ends early)
        var x = n
        while (x != null && (x ne Node.this) && x.next == null) x = x.parent
        cur = if (x == null || (x eq Node.this)) null else x.next
      }
      n
    }
  }

  /** Ancestor chain from parent to root. */
  def ancestors: Iterator[Node] = Iterator.iterate(parent)(_.parent).takeWhile(_ != null)

  def isElement(n: String): Boolean =
    kind == NodeKind.Element && ns == Ns.HTML && name == n

  override def toString: String = kind match {
    case NodeKind.Element  => s"<${Ns.names(ns)}:$name>"
    case NodeKind.Text     => s"#text(${text.take(20)})"
    case NodeKind.Comment  => s"#comment(${text.take(20)})"
    case NodeKind.Doctype  => s"#doctype($name)"
    case NodeKind.Document => "#document"
  }
}

/** Bump-pointer Node arena for parse→extract→DISCARD lifecycles — the
  * JVM analog of the reference's mcobject node pools
  * (source/mycore/utils/mcobject_async.c): the extraction kernel parses
  * a document, reads the tree, and throws it away, so nodes can be
  * recycled wholesale with one index reset per document. Reused nodes
  * stay cache-resident instead of burning allocation bandwidth — the
  * measured wall at 32-wide (BASELINE.md). NOT thread-safe: use one
  * arena per thread (Extractor keeps a ThreadLocal). Never hand an
  * arena to a parse whose tree outlives the next `releaseAll()`. */
final class NodeArena(initialCapacity: Int = 256) {
  private var buf = new Array[Node](initialCapacity)
  private var used = 0
  /** High-water mark cap: after releaseAll a giant document's node array
    * shrinks back so one outlier doc doesn't pin memory per thread. */
  private val maxRetained = 1 << 16

  def alloc(kind: Int, name: String, ns: Int): Node = {
    if (used == buf.length)
      buf = java.util.Arrays.copyOf(buf, buf.length * 2)
    val slot = buf(used)
    used += 1
    if (slot == null) {
      val n = new Node(kind, name, ns)
      buf(used - 1) = n
      n
    } else slot.reset(kind, name, ns)
  }

  /** Allocation watermark — pair with `releaseTo` for nested
    * parse→read→discard scopes on the same thread (ArenaParse saves the
    * mark on entry so an inner scope's release can't recycle the outer
    * document's nodes out from under it). */
  def mark: Int = used

  /** Recycle every node handed out since `m` was taken. */
  def releaseTo(m: Int): Unit = {
    if (m == 0 && buf.length > maxRetained)
      buf = java.util.Arrays.copyOf(buf, maxRetained)
    used = m
  }

  /** Recycle every node handed out since the last full release. The
    * nodes' object graphs (attrs/strings of the PREVIOUS doc) stay
    * reachable until their slot is reused — bounded by one document per
    * thread. */
  def releaseAll(): Unit = releaseTo(0)
}

object Node {
  def document(): Node = new Node(NodeKind.Document, "#document")
  def element(name: String, ns: Int = Ns.HTML): Node = new Node(NodeKind.Element, name, ns)
  def text(s: String, rawBegin: Int = -1): Node = {
    val n = new Node(NodeKind.Text, "#text"); n.text = s; n.rawBegin = rawBegin; n
  }
  def comment(s: String): Node = {
    val n = new Node(NodeKind.Comment, "#comment"); n.text = s; n
  }
  def doctype(name: String, pub: String, sys: String): Node = {
    val n = new Node(NodeKind.Doctype, name); n.publicId = pub; n.systemId = sys; n
  }
}

/** CSS attribute-selector semantics over the DOM
  * (reference: source/myhtml/myhtml.c:922-1301 — six match modes, each
  * with a case-insensitive variant). */
object AttrMatch {
  sealed trait Mode
  case object Eq extends Mode                // [k=v]    myhtml.c:922-926
  case object WhitespaceSep extends Mode     // [k~=v]   myhtml.c:927-951
  case object Begin extends Mode             // [k^=v]   myhtml.c:952-959
  case object End extends Mode               // [k$=v]   myhtml.c:960-967
  case object Contain extends Mode           // [k*=v]   myhtml.c:968-984
  case object HyphenSep extends Mode         // [k|=v]   myhtml.c:985-1001

  def mode(s: String): Mode = s match {
    case "eq" | "="        => Eq
    case "ws" | "~="       => WhitespaceSep
    case "begin" | "^="    => Begin
    case "end" | "$="      => End
    case "contains" | "*=" => Contain
    case "hyphen" | "|="   => HyphenSep
    case other => throw new IllegalArgumentException(s"unknown attr match mode: $other")
  }

  def matches(actual: String, expected: String, m: Mode, ci: Boolean): Boolean = {
    val a = if (ci) actual.toLowerCase else actual
    val e = if (ci) expected.toLowerCase else expected
    m match {
      case Eq            => a == e
      case Begin         => e.nonEmpty && a.startsWith(e)
      case End           => e.nonEmpty && a.endsWith(e)
      case Contain       => e.nonEmpty && a.contains(e)
      case WhitespaceSep => e.nonEmpty && a.split("[ \t\n\f\r]+").contains(e)
      case HyphenSep     => a == e || a.startsWith(e + "-")
    }
  }

  def select(root: Node, key: String, value: String, m: Mode, ci: Boolean = false): Seq[Node] =
    // the reference walks the node's WHOLE attr chain (myhtml.c:1131
    // while(attr)) — with duplicate attrs kept verbatim, every value of
    // a repeated key participates in matching
    root.descendants.filter { n =>
      n.kind == NodeKind.Element && n.attrs != null &&
        n.attrs.exists(a => a.name == key && matches(a.value, value, m, ci))
    }.toSeq
}
