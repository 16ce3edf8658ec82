import graft.html._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
object MineAttrs extends App {
  val out = new java.io.PrintStream(System.out, true, "UTF-8")
  def esc(t: String): String = t.replace("\\", "\\\\").replace("\n", "\\n")
    .replace("\t", "\\t").replace("\r", "\\r")
  val dir = Paths.get("/tmp/parity/docs9")
  val files = Files.list(dir).iterator().asScala.toSeq
    .filter(_.toString.endsWith(".html")).sortBy(_.getFileName.toString)
  files.foreach { f =>
    val html = new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
    out.println(s"### ${f.getFileName}")
    def walk(n: Node): Unit = {
      n.kind match {
        case NodeKind.Text => if (n.text != null && n.text.nonEmpty) out.println("T " + esc(n.text))
        case NodeKind.Element =>
          if (n.attrs != null)
            n.attrs.toSeq.sortBy(_.name).foreach(a => out.println("A " + n.name + " " + esc(a.name) + "=" + esc(a.value)))
        case _ =>
      }
      if (n.kind != NodeKind.Comment) {
        var i = 0; val cc = n.childCount
        while (i < cc) { walk(n.childAt(i)); i += 1 }
      }
    }
    HtmlParser.parse(html).children.foreach(walk)
  }
}
