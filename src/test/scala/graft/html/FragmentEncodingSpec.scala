package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Round-2 additions: fragment-parse surface + x-user-defined decoder
  * (reference myhtml_parse_fragment myhtml.c:240-262; encoding enum
  * myencoding/myosi.h:47-89). */
class FragmentEncodingSpec extends AnyFunSuite {

  private def fragText(html: String, ctx: String): String = {
    val root = HtmlParser.parseFragment(html, ctx)
    Extractor.extract(root).filter(_.kind != "media").map(_.text).mkString(" ")
  }

  test("fragment in tr context builds cells") {
    assert(fragText("<td>a</td><td>b", "tr") == "a b")
  }

  test("fragment in td context keeps inline formatting text") {
    assert(fragText("<b>bold</b>rest", "td") == "bold rest")
  }

  test("fragment in textarea context is RCDATA — tags stay literal") {
    assert(fragText("<b>notatag", "textarea") == "<b>notatag")
  }

  test("fragment in script context is script data — '<' stays literal") {
    // the context element itself is NOT part of the fragment tree (spec:
    // context only seeds tokenizer state + insertion mode), so the raw
    // text node hangs off the root and extraction returns it verbatim
    assert(fragText("if (a<b) x();", "script") == "if (a<b) x();")
  }

  test("node-level insert/remove callbacks fire like the reference's tree primitives") {
    val inserted = scala.collection.mutable.ArrayBuffer[String]()
    val removed = scala.collection.mutable.ArrayBuffer[String]()
    def label(n: Node) = if (n.kind == NodeKind.Text) "#text" else n.name
    // AAA with a furthest block: <b>…<div>…</b> — the adoption agency
    // MOVES nodes (div reparents, div's children migrate into the new
    // b), so both hooks must fire (reference tree.c:465 remove + :399
    // insert around the same node)
    HtmlParser.parseWithNodeCallbacks("<b>1<div>2</b>3</div>",
      n => inserted += label(n), n => removed += label(n))
    assert(inserted.take(4) == Seq("html", "head", "body", "b"))
    assert(inserted.count(_ == "b") >= 2, s"AAA should insert the cloned b: $inserted")
    assert(removed.nonEmpty, "adoption agency must fire remove on moved nodes")
    // plain document: inserts only, no removes
    removed.clear(); inserted.clear()
    HtmlParser.parseWithNodeCallbacks("<div><p>x</p></div>",
      n => inserted += label(n), n => removed += label(n))
    assert(inserted == Seq("html", "head", "body", "div", "p", "#text"))
    assert(removed.isEmpty)
  }

  test("foreign-context fragments never loop or pop the root (r2 crashers)") {
    // breakout tag at a foreign fragment root used to reprocess forever
    val r1 = HtmlParser.parseFragment("<h1>x", "annotation-xml", Ns.MathML)
    assert(r1.firstChild != null && r1.firstChild.name == "h1")
    assert(r1.firstChild.ns == Ns.MathML) // foreign insert, not breakout
    // end tag matching the root name used to pop the root (NPE on insert)
    val r2 = HtmlParser.parseFragment("</html/>t", "desc", Ns.SVG)
    assert(r2.firstChild != null && r2.firstChild.kind == NodeKind.Text &&
      r2.firstChild.text == "t")
    // template context drives in_template: td builds a real cell
    val r3 = HtmlParser.parseFragment("<td>a</td>", "template")
    assert(Extractor.extract(r3).map(_.text) == Seq("a"))
  }

  test("x-user-defined decoder maps high bytes into U+F780..U+F7FF") {
    val bytes = Array[Byte]('A', 0x80.toByte, 0xFF.toByte, 'z')
    val s = Encodings.decode(bytes, "x-user-defined")
    assert(s == "A" + 0xF780.toChar + 0xF7FF.toChar + "z")
  }

  test("meta prescan rewrites x-user-defined to windows-1252 per spec") {
    val bytes = "<meta charset=\"x-user-defined\"><p>x</p>".getBytes("ISO-8859-1")
    assert(Encodings.sniff(bytes) == "windows-1252")
  }

  test("meta prescan resolves top non-Latin codec labels to WHATWG canonical names") {
    def sniffOf(label: String): String =
      Encodings.sniff(s"""<meta charset="$label"><p>x</p>""".getBytes("ISO-8859-1"))
    assert(sniffOf("shift_jis") == "Shift_JIS")
    assert(sniffOf("sjis") == "Shift_JIS")        // alias
    assert(sniffOf("euc-kr") == "EUC-KR")
    assert(sniffOf("ks_c_5601-1987") == "EUC-KR") // alias
    assert(sniffOf("gb18030") == "gb18030")
    assert(sniffOf("gb2312") == "GBK")            // WHATWG folds gb2312 into GBK
    assert(sniffOf("big5") == "Big5")
    assert(sniffOf("euc-jp") == "EUC-JP")
  }

  test("shift_jis decodes through the cp932 index (the WHATWG table), not plain SJIS") {
    val bytes = "①".getBytes("windows-31j") // ① — NEC extension row, cp932-only
    assert(Encodings.decode(bytes, "Shift_JIS") == "①")
    assert(Encodings.decode(bytes, "shift_jis") == "①")
  }

  test("euc-kr decodes through the cp949/UHC index (the WHATWG table)") {
    val s = "갂" // 갂 — outside KS X 1001, inside UHC
    val bytes = s.getBytes("x-windows-949")
    assert(Encodings.decode(bytes, "EUC-KR") == s)
  }

  test("decode never throws on trash bytes for the top non-Latin codecs") {
    val trash = Array.tabulate[Byte](512)(i => (i * 37 + 11).toByte)
    Seq("Shift_JIS", "EUC-KR", "GB18030", "Big5", "EUC-JP", "x-user-defined")
      .foreach { cs =>
        val s = Encodings.decode(trash, cs)
        assert(s.nonEmpty)
      }
  }
}
