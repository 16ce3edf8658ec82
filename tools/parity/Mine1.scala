import graft.html._
object Mine1 extends App {
  val out = new java.io.PrintStream(System.out, true, "UTF-8")
  val html = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))), "UTF-8")
  val cfg = ExtractConfig(skipTags = Set("script", "style", "textarea"))
  Extractor.extractHtml(html, cfg).foreach { s =>
    if (s.kind != "media") {
      val t = s.text.replace("\\", "\\\\").replace("\n", "\\n")
        .replace("\t", "\\t").replace("\r", "\\r")
      out.println(t)
    }
  }
}
