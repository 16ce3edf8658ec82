import graft.html._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
object MineAttrsAll extends App {
  val out = new java.io.PrintStream(System.out, true, "UTF-8")
  def esc(t: String): String = t.replace("\\", "\\\\").replace("\n", "\\n")
    .replace("\t", "\\t").replace("\r", "\\r")
  val dir = Paths.get(args(0))
  val files = Files.list(dir).iterator().asScala.toSeq
    .filter(_.toString.endsWith(".html")).sortBy(_.getFileName.toString)
  files.foreach { f =>
    val html = new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
    out.println(s"### ${f.getFileName}")
    def walk(n: Node): Unit = {
      n.kind match {
        case NodeKind.Text => if (n.text != null && n.text.nonEmpty) out.println("T " + esc(n.text))
        case NodeKind.Element =>
          if (n.attrs != null) {
            // match the Perl binding's attr HASH view: last value per key
            val collapsed = scala.collection.mutable.LinkedHashMap[String, String]()
            n.attrs.foreach(a => collapsed(a.name) = a.value)
            collapsed.toSeq.sortBy(_._1).foreach { case (k, v) =>
              out.println("A " + n.name + " " + esc(k) + "=" + esc(v)) }
          }
        case NodeKind.Doctype =>
          // the reference stores doctype parts as token ATTRS: an
          // empty-key attr carrying system-id (else public-id), plus
          // name= with empty value (empty key sorts first)
          val id = if (n.systemId != null && n.systemId.nonEmpty) n.systemId
                   else if (n.publicId != null && n.publicId.nonEmpty) n.publicId
                   else null
          if (id != null) out.println("A !doctype =" + esc(id))
          if (n.name != null && n.name.nonEmpty) out.println("A !doctype " + esc(n.name) + "=")
        case _ =>
      }
      if (n.kind != NodeKind.Comment) {
        var c = n.firstChild
        while (c != null) { walk(c); c = c.next }
      }
    }
    HtmlParser.parse(html).children.foreach(walk)
  }
}
