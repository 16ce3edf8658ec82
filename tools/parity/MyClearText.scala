import graft.html._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

object MyClearText extends App {
  private val out = new java.io.PrintStream(System.out, true, "UTF-8")
  def println(s: String): Unit = out.println(s)
  val dir = Paths.get("/tmp/parity/docs")
  // exact clear_text.pl semantics: skip comment/style/script/textarea only
  val cfg = ExtractConfig(skipTags = Set("script", "style", "textarea"))
  val files = Files.list(dir).iterator().asScala.toSeq
    .filter(_.toString.endsWith(".html")).sortBy(_.getFileName.toString)
  files.foreach { f =>
    val html = new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
    println(s"### ${f.getFileName}")
    Extractor.extractHtml(html, cfg).foreach { s =>
      if (s.kind != "media") {
        val t = s.text.replace("\\", "\\\\").replace("\n", "\\n")
          .replace("\t", "\\t").replace("\r", "\\r")
        println(t)
      }
    }
  }
}
