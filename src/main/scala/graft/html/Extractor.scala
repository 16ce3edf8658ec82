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
  * @param minTextDensity text-density scoring (0 = off): a TEXT-BEARING
  *        block is dropped when its codepoint count is below
  *        minTextDensity × (descendant elements + 1) — markup-heavy
  *        chrome (icon menus, widget shells) carries many tags per
  *        character of prose. Text-less wrapper blocks are never
  *        density-dropped (they hold the real content blocks).
  * @param maxBlockDepth tag-depth scoring (0 = off): a text-bearing
  *        block nested deeper than this is dropped — deep nests are
  *        nav/widget chrome, real prose sits shallow (north_star's
  *        tag-depth scoring axis).
  */
final case class ExtractConfig(
    skipTags: Set[String] = Set("script", "style", "textarea", "template"),
    boilerplate: Boolean = false,
    minBlockChars: Int = 25,
    maxLinkDensity: Double = 0.5,
    maxTagDepth: Int = 600, // > TreeBuilder's 512 open-element cap: never drops real content
    minTextDensity: Int = 0,
    maxBlockDepth: Int = 0
)

/** DOM → ordered content spans.
  *
  * Semantics seeded by the reference's plain-text recipe
  * (/root/reference/examples/clear_text.pl:34-60: DFS in document order,
  * skip comment/script/style/textarea subtrees, drop whitespace-only
  * text) extended per the north star with media passthrough, span kinds
  * from the nearest block ancestor, and optional boilerplate scoring.
  *
  * The walk is allocation-free per node (span kind is inherited down
  * instead of scanning an ancestor path) — this function runs once per
  * document at 10^12-row scale.
  */
object Extractor {

  val Strict: ExtractConfig = ExtractConfig()
  val Boiler: ExtractConfig = ExtractConfig(boilerplate = true)
  /** All three north-star scoring axes on: link density (Boiler's rule)
    * + text density (≥10 codepoints per descendant element) + tag depth
    * (text blocks nested >24 deep are chrome). */
  val Density: ExtractConfig =
    ExtractConfig(boilerplate = true, minTextDensity = 10, maxBlockDepth = 24)

  private final val KindText = "text"

  /** Kind for children of element `name`, given the inherited kind —
    * equivalent to "nearest block ancestor decides" computed top-down. */
  @inline private def childKind(name: String, inherited: String): String =
    name match {
      case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" => "heading"
      case "li" => "list_item"
      case "pre" | "listing" => "pre"
      case _ => inherited
    }

  /** Extract spans from a parsed document (or fragment root). */
  def extract(doc: Node, cfg: ExtractConfig = Strict): Seq[Span] = {
    val out = new ArrayBuffer[Span](16)
    def walk(n: Node, kind: String, depth: Int): Unit = {
      if (depth > cfg.maxTagDepth) return
      (n.kind: @annotation.switch) match {
        case NodeKind.Comment => // skip subtree (clear_text.pl:36)
        case NodeKind.Doctype =>
        case NodeKind.Text =>
          if (!TextPrep.isWhitespaceOnly(n.text))
            out += Span(kind, n.text, "", if (n.rawBegin > 0) n.rawBegin else 0)
        case _ => // Element | Document
          var k = kind
          // skip applies in ANY namespace (the reference recipe skips by
          // tag id — <script> inside <svg> is skipped too, clear_text.pl)
          if (n.kind == NodeKind.Element && cfg.skipTags.contains(n.name)) return
          if (n.kind == NodeKind.Element && n.ns == Ns.HTML) {
            val name = n.name
            val refAttr = Tags.mediaRefAttr.getOrElse(name, null)
            if (refAttr != null) {
              val ref = n.attr(refAttr)
              if (ref.isDefined && ref.get.nonEmpty)
                out += Span("media", "", ref.get, if (n.rawBegin > 0) n.rawBegin else 0)
            }
            k = childKind(name, kind)
          }
          var c = n.firstChild
          while (c != null) { walk(c, k, depth + 1); c = c.next }
      }
    }
    walk(doc, KindText, 0)
    // ArraySeq wrap, not toSeq: Seq.from builds a cons LIST — one cell
    // per span per document showed up as ~15% of the extract kernel's
    // allocation samples (JFR, round 3)
    if (cfg.boilerplate) stripBoilerplate(doc, out, cfg)
    else scala.collection.immutable.ArraySeq.unsafeWrapArray(out.toArray)
  }

  /** Parse + extract in one call — the per-row kernel body
    * (SURVEY §3.1 Spark realization). The tree is born and dies inside
    * this call, so it parses into the thread's node arena (ArenaParse). */
  def extractHtml(html: String, cfg: ExtractConfig = Strict): Seq[Span] =
    ArenaParse.withDoc(html)(doc => extract(doc, cfg))

  /** Fragment-parse + extract, same arena lifecycle as extractHtml. */
  def extractFragment(html: String, contextTag: String,
                      cfg: ExtractConfig = Strict): Seq[Span] =
    ArenaParse.withFragment(html, contextTag)(root => extract(root, cfg))

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

  /** Per-block density REPORT — the observability face of the Density
    * config: one row per TEXT-BEARING block (the same blocks
    * stripBoilerplate scores; wrapper blocks never appear) with the
    * exact quantities the keep/drop rule reads. block_id = pre-order
    * ordinal over ALL block-tag elements (stable whether or not a
    * block bears text); depth = ancestor element count (document
    * excluded); text/link are CODEPOINT counts (the canonical length
    * alphabet); kept replays stripBoilerplate's rule verbatim —
    * OpsSpec pins agreement against the actual extraction. */
  final case class BlockScore(blockId: Int, tag: String, depth: Int,
                              textCp: Int, linkCp: Int, tags: Int,
                              kept: Boolean)

  def densityBlocks(html: String,
                    cfg: ExtractConfig = Density): Seq[BlockScore] =
    ArenaParse.withDoc(html) { doc =>
      final class B(val id: Int, val tag: String, val depth: Int) {
        var text = 0; var link = 0; var tags = 0
      }
      val order = new ArrayBuffer[B](8)
      var nextId = 0
      def walk(n: Node, block: B, depth: Int, inLink: Boolean): Unit = {
        n.kind match {
          case NodeKind.Text =>
            if (block != null && !TextPrep.isWhitespaceOnly(n.text)) {
              val cp = n.text.codePointCount(0, n.text.length)
              if (block.text == 0 && block.link == 0 && cp > 0)
                order += block
              block.text += cp
              if (inLink) block.link += cp
            }
          case NodeKind.Element =>
            if (cfg.skipTags.contains(n.name)) return
            if (block != null) block.tags += 1
            val isBlock = n.ns == Ns.HTML && blockTags.contains(n.name)
            val nb =
              if (isBlock) { val b = new B(nextId, n.name, depth); nextId += 1; b }
              else block
            val il = inLink || (n.ns == Ns.HTML && n.name == "a")
            var c = n.firstChild
            while (c != null) { walk(c, nb, depth + 1, il); c = c.next }
          case NodeKind.Document =>
            var c = n.firstChild
            while (c != null) { walk(c, block, depth, inLink); c = c.next }
          case _ =>
        }
      }
      walk(doc, null, 0, inLink = false)
      order.map { b =>
        val ld = if (b.text == 0) 1.0 else b.link.toDouble / b.text
        var drop = b.text < cfg.minBlockChars && ld > cfg.maxLinkDensity
        if (!drop && cfg.minTextDensity > 0 &&
            b.text.toLong < cfg.minTextDensity.toLong * (b.tags + 1)) drop = true
        if (!drop && cfg.maxBlockDepth > 0 && b.depth > cfg.maxBlockDepth)
          drop = true
        BlockScore(b.id, b.tag, b.depth, b.text, b.link, b.tags, !drop)
      }.toSeq
    }

  private def stripBoilerplate(doc: Node, spans: ArrayBuffer[Span],
                               cfg: ExtractConfig): Seq[Span] = {
    val density = cfg.minTextDensity > 0 || cfg.maxBlockDepth > 0
    // per-block stats: text CODEPOINTS (canonical length alphabet — the
    // oracle's len() counts codepoints, UTF-16 units diverge on astral)
    // and link codepoints. Stats are created only by text contributions:
    // a text-less wrapper block is never scored (dropping it would kill
    // the content blocks inside).
    final class Stat { var text = 0; var link = 0 }
    val stats = new java.util.IdentityHashMap[Node, Stat]()
    // element counts accrue before we know whether the block ever bears
    // text, so they live in their own map keyed by the same block node
    val tagCounts = if (density) new java.util.IdentityHashMap[Node, Integer]() else null
    def collect(n: Node, block: Node, inLink: Boolean): Unit = {
      n.kind match {
        case NodeKind.Text =>
          if (block != null && !TextPrep.isWhitespaceOnly(n.text)) {
            var s = stats.get(block)
            if (s == null) { s = new Stat; stats.put(block, s) }
            val cp = n.text.codePointCount(0, n.text.length)
            s.text += cp
            if (inLink) s.link += cp
          }
        case NodeKind.Element =>
          if (cfg.skipTags.contains(n.name)) return
          if (density && block != null) {
            val c0 = tagCounts.get(block)
            tagCounts.put(block, if (c0 == null) 1 else c0 + 1)
          }
          val isBlock = n.ns == Ns.HTML && blockTags.contains(n.name)
          val nb = if (isBlock) n else block
          val il = inLink || (n.ns == Ns.HTML && n.name == "a")
          var c = n.firstChild
          while (c != null) { collect(c, nb, il); c = c.next }
        case NodeKind.Document =>
          var c = n.firstChild
          while (c != null) { collect(c, block, inLink); c = c.next }
        case _ =>
      }
    }
    collect(doc, null, inLink = false)

    // tag-depth of a block = its ancestor count (document excluded);
    // blocks are few per doc, so the parent walk is cheaper than
    // threading depth through every stat site
    def nodeDepth(n: Node): Int = {
      var d = 0; var p = n.parent
      while (p != null && p.kind != NodeKind.Document) { d += 1; p = p.parent }
      d
    }

    // decide keep/drop per text-bearing block
    val dropped = new java.util.IdentityHashMap[Node, java.lang.Boolean]()
    val it = stats.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val s = e.getValue
      val ld = if (s.text == 0) 1.0 else s.link.toDouble / s.text
      var drop = s.text < cfg.minBlockChars && ld > cfg.maxLinkDensity
      if (!drop && density) {
        val tags = if (tagCounts == null) 0 else {
          val t = tagCounts.get(e.getKey); if (t == null) 0 else t.intValue()
        }
        if (cfg.minTextDensity > 0 &&
            s.text.toLong < cfg.minTextDensity.toLong * (tags + 1)) drop = true
        if (!drop && cfg.maxBlockDepth > 0 &&
            nodeDepth(e.getKey) > cfg.maxBlockDepth) drop = true
      }
      if (drop) dropped.put(e.getKey, java.lang.Boolean.TRUE)
    }
    if (dropped.isEmpty)
      return scala.collection.immutable.ArraySeq.unsafeWrapArray(spans.toArray)

    // re-walk emitting only spans whose nearest block is kept
    val out = new ArrayBuffer[Span](spans.length)
    def walk(n: Node, kind: String, blocked: Boolean): Unit = {
      n.kind match {
        case NodeKind.Comment | NodeKind.Doctype =>
        case NodeKind.Text =>
          if (!blocked && !TextPrep.isWhitespaceOnly(n.text))
            out += Span(kind, n.text, "", if (n.rawBegin > 0) n.rawBegin else 0)
        case _ =>
          var k = kind
          val nowBlocked = blocked || dropped.containsKey(n)
          if (n.kind == NodeKind.Element && cfg.skipTags.contains(n.name)) return
          if (n.kind == NodeKind.Element && n.ns == Ns.HTML) {
            val name = n.name
            if (!nowBlocked) {
              val refAttr = Tags.mediaRefAttr.getOrElse(name, null)
              if (refAttr != null) {
                val ref = n.attr(refAttr)
                if (ref.isDefined && ref.get.nonEmpty)
                  out += Span("media", "", ref.get, if (n.rawBegin > 0) n.rawBegin else 0)
              }
            }
            k = childKind(name, kind)
          }
          var c = n.firstChild
          while (c != null) { walk(c, k, nowBlocked); c = c.next }
      }
    }
    walk(doc, KindText, blocked = false)
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out.toArray)
  }
}
