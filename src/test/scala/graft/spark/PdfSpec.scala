package graft.spark

import org.scalatest.funsuite.AnyFunSuite

/** Real-PDF parser pins (north rule "PDF/layout parse"): structure scan,
  * FlateDecode, content-stream text semantics, totality. */
class PdfSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  private def minimalPdf(content: String, version: String = "1.4"): String =
    s"""%PDF-$version
       |1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj
       |2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj
       |3 0 obj<</Type/Page/Parent 2 0 R/Contents 4 0 R>>endobj
       |4 0 obj<</Length ${content.length}>>stream
       |$content
       |endstream endobj
       |trailer<</Root 1 0 R>>
       |%%EOF""".stripMargin

  test("info: version, pages, objects, ok") {
    val pdf = minimalPdf("BT (x) Tj ET", version = "1.7")
    val (v, pages, objects, ok) = PdfUdfs.info(b(pdf))
    assert(v == "1.7" && pages == 1 && objects == 4 && ok)
    // nested page tree: the ROOT /Count (max) wins, not an inner node
    val nested = """%PDF-1.5
      |1 0 obj<</Type/Pages/Kids[2 0 R 3 0 R]/Count 3>>endobj
      |2 0 obj<</Type/Pages/Kids[4 0 R]/Count 1>>endobj
      |%%EOF""".stripMargin
    assert(PdfUdfs.info(b(nested))._2 == 3)
    // no /Pages dict: fall back to counting /Type/Page leaves
    val leaves = "%PDF-1.4\n1 0 obj<</Type/Page>>endobj\n2 0 obj<</Type/Page>>endobj\n%%EOF"
    assert(PdfUdfs.info(b(leaves))._2 == 2)
    // not a PDF / truncated: ok=false, never a throw
    assert(PdfUdfs.info(b("GIF89a"))._4 == false)
    assert(PdfUdfs.info(b(pdf.take(20)))._4 == false)
    assert(PdfUdfs.info(null)._4 == false)
  }

  test("text: literal-string escape set, nesting, octal, continuation") {
    val content = """BT (Par \(nested\) \\ done) Tj (oct:\101\102) Tj (nl:\n) Tj ((deep)) Tj ET"""
    val got = PdfUdfs.text(b(minimalPdf(content)))
    assert(got == "Par (nested) \\ done" + "oct:AB" + "nl:\n" + "(deep)")
    // backslash line continuation disappears
    val cont = "BT (ab\\\ncd) Tj ET"
    assert(PdfUdfs.text(b(minimalPdf(cont))) == "abcd")
  }

  test("text: hex strings, TJ arrays with kern numbers, quote operators") {
    val content = "BT <48656C6C6F> Tj [(A) -120 (B) 5 <43>] TJ ET"
    assert(PdfUdfs.text(b(minimalPdf(content))) == "HelloABC")
    // odd final hex digit pads with 0: <5> = 0x50 = 'P'
    assert(PdfUdfs.text(b(minimalPdf("BT <5> Tj ET"))) == "P")
    // ' and " show on the NEXT line; Td starts a new line
    val lines = "BT (l1) Tj (l2) ' 2 2 (l3) \" 0 0 Td (l4) Tj ET"
    assert(PdfUdfs.text(b(minimalPdf(lines))) == "l1\nl2\nl3\nl4")
    // initial Td before any output emits no leading newline
    assert(PdfUdfs.text(b(minimalPdf("BT 72 720 Td (x) Tj ET"))) == "x")
    // strings OUTSIDE BT..ET are not shown
    assert(PdfUdfs.text(b(minimalPdf("(hidden) Tj BT (vis) Tj ET"))) == "vis")
  }

  test("FlateDecode: compressed content streams inflate and extract") {
    val content = "BT (compressed payload) Tj ( and more) Tj ET"
    val raw = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val compressed = java.util.Arrays.copyOf(buf, n)
    val head = b(s"""%PDF-1.4
      |1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj
      |2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj
      |3 0 obj<</Type/Page/Contents 4 0 R>>endobj
      |4 0 obj<</Length $n/Filter/FlateDecode>>stream
      |""".stripMargin)
    val tail = b("\nendstream endobj\ntrailer<</Root 1 0 R>>\n%%EOF")
    val pdf = head ++ compressed ++ tail
    assert(PdfUdfs.text(pdf) == "compressed payload and more")
    val (v, pages, _, ok) = PdfUdfs.info(pdf)
    assert(v == "1.4" && pages == 1 && ok)
  }

  test("nested sub-dict does not shadow /FlateDecode in the stream dict") {
    val content = "BT (deep dict) Tj ET"
    val raw = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val pdf = b(s"""%PDF-1.4
      |1 0 obj<</Type/Pages/Kids[2 0 R]/Count 1>>endobj
      |2 0 obj<</Length $n/Filter/FlateDecode/DecodeParms<</Columns 1>>>>stream
      |""".stripMargin) ++ java.util.Arrays.copyOf(buf, n) ++
      b("\nendstream endobj\n%%EOF")
    assert(PdfUdfs.text(pdf) == "deep dict")
  }

  test("two content streams join with newline in document order") {
    val pdf = s"""%PDF-1.4
      |1 0 obj<</Type/Pages/Kids[2 0 R 3 0 R]/Count 2>>endobj
      |2 0 obj<</Length 0>>stream
      |BT (first) Tj ET
      |endstream endobj
      |3 0 obj<</Length 0>>stream
      |BT (second) Tj ET
      |endstream endobj
      |%%EOF""".stripMargin
    assert(PdfUdfs.text(b(pdf)) == "first\nsecond")
  }

  test("totality: every prefix of a real pdf, garbage, encrypted") {
    val pdf = b(minimalPdf("BT (x) Tj ET"))
    for (n <- 0 until pdf.length) {
      PdfUdfs.info(pdf.take(n)); PdfUdfs.text(pdf.take(n)) // must not throw
    }
    val rnd = new scala.util.Random(11)
    (0 until 50).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      PdfUdfs.info(junk); PdfUdfs.text(junk)
    }
    val enc = minimalPdf("BT (secret) Tj ET")
      .replace("trailer<</Root 1 0 R>>", "trailer<</Root 1 0 R/Encrypt 9 0 R>>")
    assert(PdfUdfs.text(b(enc)) == "")
    assert(!PdfUdfs.info(b(enc))._4)
  }

  test("ToUnicode CMap: bfchar, ligature dst, bfrange, fallback, no-cmap unchanged") {
    val content = "BT <00010002> Tj (lit ) Tj <0003> Tj <00ff> Tj ET"
    val cmapStream = """5 0 obj<</Length 0>>stream
/CIDInit /ProcSet findresource begin begincmap
2 beginbfchar
<0001> <0041>
<0002> <00660069>
endbfchar
1 beginbfrange
<0003> <0005> <0061>
endbfrange
endcmap end
endstream endobj
"""
    val pdf = minimalPdf(content).replace("trailer", cmapStream + "trailer")
    val got = PdfUdfs.text(b(pdf))
    // <0001>→A, <0002>→fi (ligature), literal passthrough, <0003>→a
    // (range), <00ff> unmapped → raw bytes 0x00 0xFF
    assert(got == "Afi" + "lit " + "a" + "\u0000\u00ff", s"got ${got.toList}")
    // same content with NO CMap: hex bytes stay byte-transparent
    val plain = PdfUdfs.text(b(minimalPdf(content)))
    assert(plain == "\u0000\u0001\u0000\u0002" + "lit " + "\u0000\u0003" + "\u0000\u00ff")
    // surrogate-pair dst composes to one astral codepoint
    val astral = """%PDF-1.4
1 0 obj<</Length 0>>stream
BT <0007> Tj ET
endstream endobj
2 0 obj<</Length 0>>stream
1 beginbfchar
<0007> <D835DD4F>
endbfchar
endstream endobj
%%EOF"""
    assert(PdfUdfs.text(b(astral)) == new String(Character.toChars(0x1D54F)))
  }

  test("ToUnicode CMap: bracketed bfrange form maps one dst per code") {
    val pdf = """%PDF-1.4
1 0 obj<</Length 0>>stream
BT <00200021 0022> Tj ET
endstream endobj
2 0 obj<</Length 0>>stream
1 beginbfrange
<0020> <0022> [<0058> <0059005A> <005A>]
endbfrange
endstream endobj
%%EOF"""
    // 0020→X, 0021→YZ (multi-unit dst), 0022→Z; whitespace inside the
    // hex string is the PDF hex-string convention (ignored)
    assert(PdfUdfs.text(b(pdf)) == "XYZZ")
  }
}
