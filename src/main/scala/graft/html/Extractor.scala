package graft.html

import scala.collection.mutable.ArrayBuffer

/** One extracted content span — the engine's output row element
  * (BASELINE.json input_hint; schema ancestor is the reference's node
  * info record, MyHTML.xs:189-227: tag→kind, materialized text,
  * raw_begin→offset). */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** Extraction config.
  * @param skipTags subtrees never emitted (reference recipe skips
  *        comments, script, style, textarea — examples/clear_text.pl:34-60)
  * @param boilerplate enable block-level boilerplate stripping via
  *        text-density / link-density / tag-depth scoring (north_star)
  * @param minBlockChars blocks shorter than this with high link density
  *        are dropped when boilerplate=true
  * @param maxLinkDensity link-density cutoff for boilerplate blocks
  */
final case class ExtractConfig(
    skipTags: Set[String] = Set("script", "style", "textarea", "template"),
    boilerplate: Boolean = false,
    minBlockChars: Int = 25,
    maxLinkDensity: Double = 0.5,
    maxTagDepth: Int = 600 // > TreeBuilder's 512 open-element cap: never drops real content
)

/** DOM → ordered content spans.
  *
  * Semantics seeded by the reference's plain-text recipe
  * (/root/reference/examples/clear_text.pl:34-60: DFS in document order,
  * skip comment/script/style/textarea subtrees, drop whitespace-only
  * text) extended per the north star with media passthrough, span kinds
  * from the nearest block ancestor, and optional boilerplate scoring.
  */
object Extractor {

  val Strict: ExtractConfig = ExtractConfig()
  val Boiler: ExtractConfig = ExtractConfig(boilerplate = true)

  /** Block-kind mapping: nearest block ancestor decides the span kind. */
  private def kindFor(ancestorsAndSelf: List[String]): String = {
    var cur = ancestorsAndSelf
    while (cur.nonEmpty) {
      val n = cur.head
      if (Tags.headings.contains(n)) return "heading"
      if (n == "li") return "list_item"
      if (n == "pre" || n == "listing") return "pre"
      cur = cur.tail
    }
    "text"
  }

  /** Extract spans from a parsed document (or fragment root). */
  def extract(doc: Node, cfg: ExtractConfig = Strict): Seq[Span] = {
    val out = new ArrayBuffer[Span](16)
    // path of HTML-ns element names from the current node up (head=nearest)
    def walk(n: Node, path: List[String], depth: Int): Unit = {
      if (depth > cfg.maxTagDepth) return
      n.kind match {
        case NodeKind.Comment => // skip subtree (clear_text.pl:36)
        case NodeKind.Doctype =>
        case NodeKind.Text =>
          if (!TextPrep.isWhitespaceOnly(n.text))
            out += Span(kindFor(path), n.text, "", math.max(n.rawBegin, 0))
        case NodeKind.Element | NodeKind.Document =>
          val name = if (n.kind == NodeKind.Element && n.ns == Ns.HTML) n.name else null
          if (name != null && cfg.skipTags.contains(name)) return
          if (name != null) {
            Tags.mediaRefAttr.get(name).foreach { attrKey =>
              n.attr(attrKey).foreach { ref =>
                if (ref.nonEmpty)
                  out += Span("media", "", ref, math.max(n.rawBegin, 0))
              }
            }
          }
          val childPath = if (name != null) name :: path else path
          n.children.foreach(walk(_, childPath, depth + 1))
      }
    }
    walk(doc, Nil, 0)
    if (cfg.boilerplate) stripBoilerplate(doc, out, cfg) else out.toSeq
  }

  /** Parse + extract in one call — the per-row kernel body
    * (SURVEY §3.1 Spark realization). */
  def extractHtml(html: String, cfg: ExtractConfig = Strict): Seq[Span] =
    extract(HtmlParser.parse(html), cfg)

  // ------------------------------------------------ boilerplate scoring

  /** Block-level candidates scored by text density vs link density
    * (north_star: text-density, link-density, tag-depth scoring).
    * A span is dropped when its nearest block candidate is
    * link-dominated navigation/footer chrome. */
  private val blockTags = Set(
    "p", "div", "article", "section", "li", "td", "blockquote", "aside",
    "nav", "footer", "header", "ul", "ol", "main", "h1", "h2", "h3", "h4",
    "h5", "h6", "pre"
  )

  private def stripBoilerplate(doc: Node, spans: ArrayBuffer[Span],
                               cfg: ExtractConfig): Seq[Span] = {
    // per-block stats: total text chars, text chars under <a>
    final case class Stat(var text: Int = 0, var link: Int = 0)
    val stats = new java.util.IdentityHashMap[Node, Stat]()
    def collect(n: Node, block: Node, inLink: Boolean): Unit = {
      n.kind match {
        case NodeKind.Text =>
          if (block != null && !TextPrep.isWhitespaceOnly(n.text)) {
            val s = stats.computeIfAbsent(block, _ => Stat())
            s.text += n.text.length
            if (inLink) s.link += n.text.length
          }
        case NodeKind.Element =>
          if (n.ns == Ns.HTML && cfg.skipTags.contains(n.name)) return
          val nb = if (n.ns == Ns.HTML && blockTags.contains(n.name)) n else block
          val il = inLink || (n.ns == Ns.HTML && n.name == "a")
          n.children.foreach(collect(_, nb, il))
        case NodeKind.Document => n.children.foreach(collect(_, block, inLink))
        case _ =>
      }
    }
    collect(doc, null, inLink = false)

    // decide keep/drop per block
    val dropped = new java.util.IdentityHashMap[Node, java.lang.Boolean]()
    val it = stats.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val s = e.getValue
      val ld = if (s.text == 0) 1.0 else s.link.toDouble / s.text
      if (s.text < cfg.minBlockChars && ld > cfg.maxLinkDensity)
        dropped.put(e.getKey, java.lang.Boolean.TRUE)
    }
    if (dropped.isEmpty) return spans.toSeq

    // re-walk emitting only spans whose nearest block is kept; cheapest
    // correct approach: recompute extraction with a drop predicate.
    val out = new ArrayBuffer[Span](spans.length)
    def walk(n: Node, path: List[String], blocked: Boolean): Unit = {
      n.kind match {
        case NodeKind.Comment | NodeKind.Doctype =>
        case NodeKind.Text =>
          if (!blocked && !TextPrep.isWhitespaceOnly(n.text))
            out += Span(kindFor(path), n.text, "", math.max(n.rawBegin, 0))
        case NodeKind.Element | NodeKind.Document =>
          val name = if (n.kind == NodeKind.Element && n.ns == Ns.HTML) n.name else null
          if (name != null && cfg.skipTags.contains(name)) return
          val nowBlocked = blocked || dropped.containsKey(n)
          if (name != null && !nowBlocked) {
            Tags.mediaRefAttr.get(name).foreach { attrKey =>
              n.attr(attrKey).foreach { ref =>
                if (ref.nonEmpty)
                  out += Span("media", "", ref, math.max(n.rawBegin, 0))
              }
            }
          }
          val childPath = if (name != null) name :: path else path
          n.children.foreach(walk(_, childPath, nowBlocked))
      }
    }
    walk(doc, Nil, blocked = false)
    out.toSeq
  }
}
