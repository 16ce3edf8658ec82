import graft.html._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

object MyFrag extends App {
  private val out = new java.io.PrintStream(System.out, true, "UTF-8")
  val dir = Paths.get(args(0))
  val files = Files.list(dir).iterator().asScala.toSeq
    .filter(_.toString.endsWith(".html")).sortBy(_.getFileName.toString)
  def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\n", "\\n").replace("\r", "\\r")
  def label(n: Node): String = n.kind match {
    case NodeKind.Doctype => "!doctype"
    case NodeKind.Text    => "-text"
    case NodeKind.Comment => "_comment"
    case _                => n.name
  }
  def walk(n0: Node, d: Int): Unit = {
    var n = n0
    while (n != null) {
      val t = if (n.kind == NodeKind.Text || n.kind == NodeKind.Comment) n.text else ""
      out.println(("  " * d) + label(n) + (if (t.nonEmpty) " [" + esc(t) + "]" else ""))
      if (n.firstChild != null) walk(n.firstChild, d + 1)
      n = n.next
    }
  }
  files.foreach { f =>
    val name = f.getFileName.toString
    val ctx = name.stripPrefix("ctx-").takeWhile(_ != '_')
    val html = new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
    out.println(s"### $name")
    val root = HtmlParser.parseFragment(html, ctx)
    // the reference dumps the synthetic html root itself
    walk(root, 0)
  }
}
