import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

/** Corpus 19: kitchen-sink generalization — every grammar family at
  * once, fresh seeds: formatting misnests, tables, forms, frameset,
  * template, foreign content incl. integration points, entities in text
  * and attrs, comments/doctype/CDATA, content models, stray slashes,
  * dup attrs; 20% of docs truncated at a random valid offset. */
object GenFinal2 extends App {
  val dir = Paths.get("/tmp/parity/docs20")
  Files.createDirectories(dir)
  val tags = Seq("b", "i", "a", "font", "nobr", "p", "div", "li", "ul", "td",
    "tr", "table", "caption", "select", "option", "form", "input", "template",
    "frameset", "frame", "noframes", "svg", "math", "mi", "g", "desc",
    "foreignobject", "annotation-xml", "title", "style", "script", "textarea",
    "h1", "h2", "menu", "menuitem", "ruby", "rb", "rt", "body", "html", "head", "br")
  val ents = Seq("&amp;", "&notin;", "&noti", "&curren", "&#x41;", "&#300;",
    "&copy1", "&ampx", "&GT;", "&prod;")
  val words = Seq("alpha", "beta", "g2", "x")
  def gen(rnd: Random, n: Int): String = {
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      rnd.nextInt(12) match {
        case 0 | 1 | 2 =>
          sb.append('<').append(tags(rnd.nextInt(tags.length)))
          rnd.nextInt(4) match {
            case 0 => sb.append(" a=").append(words(rnd.nextInt(words.length)))
              .append(" a='").append(ents(rnd.nextInt(ents.length))).append("'")
            case 1 => sb.append(" / ")
            case 2 => sb.append("/")
            case _ =>
          }
          sb.append('>')
        case 3 | 4 =>
          sb.append("</").append(tags(rnd.nextInt(tags.length))).append('>')
        case 5 | 6 | 7 =>
          sb.append(words(rnd.nextInt(words.length))).append(' ')
        case 8 =>
          sb.append(ents(rnd.nextInt(ents.length)))
        case 9 =>
          sb.append(Seq("<!--c-->", "<!---->", "<!--", "<![CDATA[x]]>",
            "<!doctype html>", "</>", "<?pi x>")(rnd.nextInt(7)))
        case 10 =>
          sb.append("<table>").append(words(rnd.nextInt(words.length)))
            .append("<tr><td>")
        case 11 =>
          sb.append("<svg><g a/ >").append(words(rnd.nextInt(words.length)))
      }
    }
    sb.toString
  }
  (0 until 1500).foreach { i =>
    val rnd = new Random(1990000 + i)
    var s = gen(rnd, 15 + rnd.nextInt(120))
    if (rnd.nextInt(5) == 0 && s.length > 10) s = s.substring(0, 1 + rnd.nextInt(s.length - 1))
    Files.write(dir.resolve(f"k$i%04d.html"), s.getBytes(UTF_8))
  }
  println("ok")
}
