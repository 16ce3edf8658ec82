package graft.html

/** Static tag metadata, the Spark-side analog of the reference's compiled
  * tag table (source/myhtml/tag_init.c — 272 entries of per-namespace
  * category bits + data_parser tokenizer state; lookup source/myhtml/tag.c:125-144).
  * We keep name-keyed Sets/Maps instead of a binary-search id table: the
  * JIT turns these into perfect-hash lookups and the kernel is per-row
  * JVM code, not a plan node.
  */
object Tags {

  /** HTML5 "special" category — elements that end-tag/implied-end logic
    * treats specially (reference encodes this as category bits per tag,
    * source/myhtml/myosi.h:101-111 + tag_init.c). */
  val special: Set[String] = Set(
    "address", "applet", "area", "article", "aside", "base", "basefont",
    "bgsound", "blockquote", "body", "br", "button", "caption", "center",
    "col", "colgroup", "dd", "details", "dir", "div", "dl", "dt", "embed",
    "fieldset", "figcaption", "figure", "footer", "form", "frame",
    "frameset", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header",
    "hgroup", "hr", "html", "iframe", "img", "input", "keygen", "li",
    "link", "listing", "main", "marquee", "menu", "meta", "nav", "noembed",
    "noframes", "noscript", "object", "ol", "p", "param", "plaintext",
    "pre", "script", "section", "select", "source", "style", "summary",
    "table", "tbody", "td", "template", "textarea", "tfoot", "th", "thead",
    "title", "tr", "track", "ul", "wbr", "xmp"
  )

  /** SVG specials in foreign-content end-of-scope handling. */
  val svgSpecial: Set[String] = Set("foreignObject", "desc", "title")
  val mathmlSpecial: Set[String] = Set("mi", "mo", "mn", "ms", "mtext", "annotation-xml")

  /** Formatting elements tracked on the active-formatting list
    * (reference: tree.c:1324-1557; spec list). */
  val formatting: Set[String] = Set(
    "a", "b", "big", "code", "em", "font", "i", "nobr", "s", "small",
    "strike", "strong", "tt", "u"
  )

  /** Void elements (reference: myhtml_node_is_void switch,
    * source/myhtml/myhtml.c:760-789 — 16 tags). */
  val void: Set[String] = Set(
    "area", "base", "br", "col", "command", "embed", "hr", "img", "input",
    "keygen", "link", "menuitem", "meta", "param", "source", "track", "wbr"
  )

  /** Tags whose contents tokenize as RAWTEXT (reference data_parser state
    * per tag: tag_init.c:562,754,762,770,986,1170). noscript is RAWTEXT
    * only when scripting is enabled; we model scripting=off like a
    * non-executing consumer, except the tree builder may still opt in. */
  val rawtext: Set[String] = Set("style", "xmp", "iframe", "noembed", "noframes")

  /** RCDATA tags (charrefs decoded, no markup): tag_init.c:1058,1098. */
  val rcdata: Set[String] = Set("title", "textarea")

  /** Default scope barrier set (HTML ns) — "has an element in scope"
    * (reference: tree.c:705-757 via category bits). */
  val scopeBase: Set[String] = Set(
    "applet", "caption", "html", "table", "td", "th", "marquee", "object",
    "template"
  )
  // foreign-content barriers for the base scope
  val scopeBaseMathML: Set[String] = Set("mi", "mo", "mn", "ms", "mtext", "annotation-xml")
  val scopeBaseSVG: Set[String] = Set("foreignObject", "desc", "title")

  val listItemScopeExtra: Set[String] = Set("ol", "ul")
  val buttonScopeExtra: Set[String] = Set("button")
  val tableScope: Set[String] = Set("html", "table", "template")

  /** "Generate implied end tags" set (reference: tree.c:1068-1157). */
  val impliedEnd: Set[String] = Set(
    // menuitem: the reference keeps it in the implied-end set
    // (tree.c generate_implied_end_tags MyHTML_TAG_MENUITEM; pre-2017
    // spec) — "<ruby><menuitem><rt>" closes menuitem before rt
    "dd", "dt", "li", "menuitem", "optgroup", "option", "p", "rb", "rp", "rt", "rtc"
  )

  /** "Generate all implied end tags thoroughly" set. */
  val impliedEndThorough: Set[String] = impliedEnd ++ Set(
    "caption", "colgroup", "tbody", "td", "tfoot", "th", "thead", "tr"
  )

  /** Heading tags. */
  val headings: Set[String] = Set("h1", "h2", "h3", "h4", "h5", "h6")

  /** Elements that close an open <p> when they start (subset of in-body
    * rules, reference rules.c:735-1965). */
  val closesP: Set[String] = Set(
    "address", "article", "aside", "blockquote", "center", "details",
    "dialog", "dir", "div", "dl", "fieldset", "figcaption", "figure",
    "footer", "header", "hgroup", "main", "menu", "nav", "ol", "p",
    "section", "summary", "ul", "h1", "h2", "h3", "h4", "h5", "h6", "pre",
    "listing", "form", "plaintext", "table", "hr", "xmp"
  )

  /** SVG tag-name case adjustments (foreign content; reference:
    * myhtml_token_adjust_svg_tags via static table, token.h:141-143 —
    * spec table, public WHATWG data). */
  val svgTagAdjust: Map[String, String] = Map(
    "altglyph" -> "altGlyph", "altglyphdef" -> "altGlyphDef",
    "altglyphitem" -> "altGlyphItem", "animatecolor" -> "animateColor",
    "animatemotion" -> "animateMotion", "animatetransform" -> "animateTransform",
    "clippath" -> "clipPath", "feblend" -> "feBlend",
    "fecolormatrix" -> "feColorMatrix", "fecomponenttransfer" -> "feComponentTransfer",
    "fecomposite" -> "feComposite", "feconvolvematrix" -> "feConvolveMatrix",
    "fediffuselighting" -> "feDiffuseLighting", "fedisplacementmap" -> "feDisplacementMap",
    "fedistantlight" -> "feDistantLight", "fedropshadow" -> "feDropShadow",
    "feflood" -> "feFlood", "fefunca" -> "feFuncA", "fefuncb" -> "feFuncB",
    "fefuncg" -> "feFuncG", "fefuncr" -> "feFuncR",
    "fegaussianblur" -> "feGaussianBlur", "feimage" -> "feImage",
    "femerge" -> "feMerge", "femergenode" -> "feMergeNode",
    "femorphology" -> "feMorphology", "feoffset" -> "feOffset",
    "fepointlight" -> "fePointLight", "fespecularlighting" -> "feSpecularLighting",
    "fespotlight" -> "feSpotLight", "fetile" -> "feTile",
    "feturbulence" -> "feTurbulence", "foreignobject" -> "foreignObject",
    "glyphref" -> "glyphRef", "lineargradient" -> "linearGradient",
    "radialgradient" -> "radialGradient", "textpath" -> "textPath"
  )

  /** SVG attribute case adjustments (spec table). */
  val svgAttrAdjust: Map[String, String] = Map(
    "attributename" -> "attributeName", "attributetype" -> "attributeType",
    "basefrequency" -> "baseFrequency", "baseprofile" -> "baseProfile",
    "calcmode" -> "calcMode", "clippathunits" -> "clipPathUnits",
    "diffuseconstant" -> "diffuseConstant", "edgemode" -> "edgeMode",
    "filterunits" -> "filterUnits", "glyphref" -> "glyphRef",
    "gradienttransform" -> "gradientTransform", "gradientunits" -> "gradientUnits",
    "kernelmatrix" -> "kernelMatrix", "kernelunitlength" -> "kernelUnitLength",
    "keypoints" -> "keyPoints", "keysplines" -> "keySplines",
    "keytimes" -> "keyTimes", "lengthadjust" -> "lengthAdjust",
    "limitingconeangle" -> "limitingConeAngle", "markerheight" -> "markerHeight",
    "markerunits" -> "markerUnits", "markerwidth" -> "markerWidth",
    "maskcontentunits" -> "maskContentUnits", "maskunits" -> "maskUnits",
    "numoctaves" -> "numOctaves", "pathlength" -> "pathLength",
    "patterncontentunits" -> "patternContentUnits",
    "patterntransform" -> "patternTransform", "patternunits" -> "patternUnits",
    "pointsatx" -> "pointsAtX", "pointsaty" -> "pointsAtY",
    "pointsatz" -> "pointsAtZ", "preservealpha" -> "preserveAlpha",
    "preserveaspectratio" -> "preserveAspectRatio",
    "primitiveunits" -> "primitiveUnits", "refx" -> "refX", "refy" -> "refY",
    "repeatcount" -> "repeatCount", "repeatdur" -> "repeatDur",
    "requiredextensions" -> "requiredExtensions",
    "requiredfeatures" -> "requiredFeatures", "specularconstant" -> "specularConstant",
    "specularexponent" -> "specularExponent", "spreadmethod" -> "spreadMethod",
    "startoffset" -> "startOffset", "stddeviation" -> "stdDeviation",
    "stitchtiles" -> "stitchTiles", "surfacescale" -> "surfaceScale",
    "systemlanguage" -> "systemLanguage", "tablevalues" -> "tableValues",
    "targetx" -> "targetX", "targety" -> "targetY",
    "textlength" -> "textLength", "viewbox" -> "viewBox",
    "viewtarget" -> "viewTarget", "xchannelselector" -> "xChannelSelector",
    "ychannelselector" -> "yChannelSelector", "zoomandpan" -> "zoomAndPan"
  )

  /** MathML attribute adjustment. */
  val mathmlAttrAdjust: Map[String, String] = Map("definitionurl" -> "definitionURL")

  /** Media-bearing tags and their ref attribute, used by the extractor to
    * emit `media` spans (north-star media passthrough; reference has no
    * media concept — this is the interleaved-payload extension). */
  val mediaRefAttr: Map[String, String] = Map(
    "img" -> "src", "video" -> "src", "audio" -> "src", "embed" -> "src",
    "source" -> "src", "iframe" -> "src", "track" -> "src"
  )

  // ---- per-tag category bits (reference myosi.h:101-111 tag categories)
  final val FlagScopeBase = 1       // default-scope barrier
  final val FlagListItemExtra = 2   // additional list-item-scope barrier (ol/ul)
  final val FlagButtonExtra = 4     // additional button-scope barrier
  final val FlagTableScope = 8      // table-scope barrier (html/table/template)
  final val FlagSpecial = 16        // "special" category

  /** Category bitmask for an element — computed once per node so the
    * per-token scope loops are bit tests, not Set hashing (the JVM
    * analog of the reference's per-tag category bits). */
  def flagsFor(name: String, ns: Int): Int = ns match {
    case Ns.HTML =>
      var f = 0
      if (scopeBase.contains(name)) f |= FlagScopeBase
      if (name == "ol" || name == "ul") f |= FlagListItemExtra
      if (name == "button") f |= FlagButtonExtra
      if (name == "html" || name == "table" || name == "template") f |= FlagTableScope
      if (special.contains(name)) f |= FlagSpecial
      f
    case Ns.SVG =>
      var f = 0
      if (scopeBaseSVG.contains(name)) f |= FlagScopeBase | FlagSpecial
      f
    case Ns.MathML =>
      var f = 0
      if (scopeBaseMathML.contains(name)) f |= FlagScopeBase | FlagSpecial
      f
    case _ => 0
  }

  /** Interning table for tag/attribute names: maps StringBuilder content
    * to a canonical String WITHOUT allocating when the name is known —
    * the JVM analog of the reference's static tag table lookup
    * (tag.c:125-144 binary search; dynamic names still allocate, like
    * its mctree fallback). Open-addressed, immutable after init. */
  object Names {
    private val known: Array[String] = (
      special ++ formatting ++ void ++ rawtext ++ rcdata ++ headings ++
        svgTagAdjust.keySet ++
        Set("html", "a", "span", "i", "b", "u", "em", "strong", "font",
          "option", "optgroup", "br", "body", "head", "svg", "math",
          "circle", "rect", "path", "g", "text", "tspan", "image", "line",
          // common attribute names
          "id", "class", "href", "src", "style", "title", "alt", "name",
          "type", "value", "rel", "target", "width", "height", "lang",
          "dir", "data", "content", "charset", "http-equiv", "placeholder",
          "role", "method", "action", "srcset", "loading", "media",
          "property", "itemprop", "aria-label", "aria-hidden", "tabindex",
          "disabled", "checked", "selected", "multiple", "readonly",
          "required", "xmlns", "d", "fill", "stroke", "viewBox", "points",
          "encoding", "color", "face", "size", "border", "colspan",
          "rowspan", "align", "valign", "onclick", "datetime")
      ).toArray
    private val mask = {
      var cap = 1
      while (cap < known.length * 4) cap <<= 1
      cap - 1
    }
    private val table = new Array[String](mask + 1)
    known.foreach { s =>
      var i = s.hashCode & mask
      while (table(i) != null && table(i) != s) i = (i + 1) & mask
      table(i) = s
    }
    /** Per-slot precomputed HTML-namespace category bits — element
      * creation pays one cached-hash probe instead of four Set lookups
      * (reference: the static tag table carries its category bits,
      * tag_init.c). */
    private val htmlFlagsTable: Array[Int] = {
      val arr = new Array[Int](mask + 1)
      var i = 0
      while (i <= mask) {
        if (table(i) != null) arr(i) = flagsFor(table(i), Ns.HTML)
        i += 1
      }
      arr
    }

    /** Fast flagsFor(name, Ns.HTML) for interned names. */
    def htmlFlags(name: String): Int = {
      var idx = name.hashCode & mask
      var probes = 0
      while (probes <= mask) {
        val cand = table(idx)
        if (cand eq name) return htmlFlagsTable(idx)
        if (cand == null) return flagsFor(name, Ns.HTML)
        if (cand == name) return htmlFlagsTable(idx)
        idx = (idx + 1) & mask
        probes += 1
      }
      flagsFor(name, Ns.HTML)
    }

    /** Per-slot canonical TAG name — the myhtml tag-table model: tag
      * identity is a case-insensitive id whose NAME string comes from
      * the static table (tag_init.c), so `<foreignobject>` reports as
      * `foreignObject` in EVERY namespace, plain HTML included
      * (verified against the binary), and `</foreignobject>` matches it
      * because end tags canonicalize identically. */
    private val canonicalTable: Array[String] = {
      val arr = new Array[String](mask + 1)
      var i = 0
      while (i <= mask) {
        if (table(i) != null) arr(i) = svgTagAdjust.getOrElse(table(i), table(i))
        i += 1
      }
      arr
    }

    /** intern + tag-table canonicalization (see canonicalTable) — used
      * for TAG names; attribute names use plain `intern`. */
    def internTag(sb: java.lang.StringBuilder): String = {
      var h = 0
      var i = 0
      val n = sb.length
      while (i < n) { h = h * 31 + sb.charAt(i); i += 1 }
      var idx = h & mask
      var probes = 0
      while (probes <= mask) {
        val cand = table(idx)
        if (cand == null) return sb.toString
        if (cand.length == n && cand.contentEquals(sb)) return canonicalTable(idx)
        idx = (idx + 1) & mask
        probes += 1
      }
      sb.toString
    }

    /** Canonical string for the builder's content; allocates only for
      * unknown names. */
    def intern(sb: java.lang.StringBuilder): String = {
      // String.hashCode-compatible rolling hash over the builder
      var h = 0
      var i = 0
      val n = sb.length
      while (i < n) { h = h * 31 + sb.charAt(i); i += 1 }
      var idx = h & mask
      var probes = 0
      while (probes <= mask) {
        val cand = table(idx)
        if (cand == null) return sb.toString
        if (cand.length == n && cand.contentEquals(sb)) return cand
        idx = (idx + 1) & mask
        probes += 1
      }
      sb.toString
    }
  }
}
