import graft.html._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

object MyPos extends App {
  private val out = new java.io.PrintStream(System.out, true, "UTF-8")
  val dir = Paths.get(args(0))
  val files = Files.list(dir).iterator().asScala.toSeq
    .filter(_.toString.endsWith(".html")).sortBy(_.getFileName.toString)
  def label(n: Node): String = n.kind match {
    case NodeKind.Doctype => "!doctype"
    case NodeKind.Text    => "-text"
    case NodeKind.Comment => "_comment"
    case _                => n.name
  }
  def walk(n0: Node, d: Int): Unit = {
    var n = n0
    while (n != null) {
      val rb = if (n.rawBegin > 0) n.rawBegin else 0
      out.println(("  " * d) + label(n) + " @" + rb)
      if (n.firstChild != null) walk(n.firstChild, d + 1)
      n = n.next
    }
  }
  files.foreach { f =>
    val html = new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
    out.println(s"### ${f.getFileName}")
    val doc = HtmlParser.parse(html)
    if (doc.firstChild != null) walk(doc.firstChild, 0)
  }
}
