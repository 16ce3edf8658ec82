import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

/** Corpus 15: fragment-parsing parity — (context, soup) pairs; the
  * context tag is encoded in the filename (ctx-<tag>__NNN.html). */
object GenFrag extends App {
  val dir = Paths.get("/tmp/parity/docs15")
  Files.createDirectories(dir)
  val contexts = Seq("div", "p", "b", "td", "tr", "tbody", "table", "caption",
    "select", "option", "optgroup", "ul", "li", "dl", "head", "body", "html",
    "form", "noscript", "template", "frameset", "title", "textarea",
    "script", "style", "plaintext", "xmp", "iframe")
  val tags = Seq("td", "tr", "table", "div", "p", "b", "i", "li", "ul", "option",
    "select", "span", "h1", "caption", "col", "frame", "head", "body", "html",
    "form", "input", "template", "a", "img")
  val words = Seq("one", "two", "three", "x")
  def soup(rnd: Random, n: Int): String = {
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      rnd.nextInt(8) match {
        case 0 | 1 | 2 => sb.append('<').append(tags(rnd.nextInt(tags.length))).append('>')
        case 3 | 4 => sb.append("</").append(tags(rnd.nextInt(tags.length))).append('>')
        case 5 | 6 => sb.append(words(rnd.nextInt(words.length))).append(' ')
        case 7 => sb.append(Seq("<!--c-->", "&amp;", "<b>x", "</p>")(rnd.nextInt(4)))
      }
    }
    sb.toString
  }
  var n = 0
  contexts.foreach { ctx =>
    (0 until 25).foreach { k =>
      val rnd = new Random(1500000 + n)
      Files.write(dir.resolve(f"ctx-$ctx%s__$n%04d.html"),
        soup(rnd, 10 + rnd.nextInt(60)).getBytes(UTF_8))
      n += 1
    }
  }
  println(s"ok $n")
}
