import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

/** Corpus 21 (round 3): integration-point and scoping-marker families the
  * earlier grammars under-sampled — annotation-xml with VARIED encoding
  * attributes (the HTML-integration-point rule keys on its value,
  * rules.c foreign dispatch), marquee/applet/object (scoping markers for
  * the AFE reconstruct + in-scope walks), the <image>→<img> token
  * rewrite, ruby rt/rp implied ends, details/summary/dialog/hgroup, and
  * breakout tags inside both integration-point kinds. */
object GenSoup21 extends App {
  val dir = Paths.get("/tmp/parity/docs21")
  Files.createDirectories(dir)
  val encodings = Seq("text/html", "TEXT/HTML", "application/xhtml+xml",
    "text/plain", "Application/XHTML+xml", "")
  val scopers = Seq("marquee", "applet", "object", "template", "caption", "td")
  val rubyish = Seq("ruby", "rt", "rp", "rb", "rtc")
  val misc = Seq("details", "summary", "dialog", "hgroup", "figure",
    "figcaption", "image", "wbr", "data", "time")
  val fmt = Seq("b", "i", "em", "font", "s", "u")
  val foreign = Seq("math", "mi", "mtext", "annotation-xml", "svg", "desc",
    "foreignObject", "circle")
  val breakout = Seq("p", "h1", "div", "li", "table", "body", "br", "img")
  val words = Seq("alpha", "beta", "gamma", "x")
  def soup(rnd: Random, n: Int): String = {
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      rnd.nextInt(18) match {
        case 0 | 1 =>
          val enc = encodings(rnd.nextInt(encodings.length))
          sb.append("<annotation-xml")
          if (enc.nonEmpty) sb.append(" encoding=")
            .append(if (rnd.nextBoolean()) "\"" + enc + "\"" else enc)
          sb.append('>')
        case 2 => sb.append("</annotation-xml>")
        case 3 | 4 => sb.append('<').append(scopers(rnd.nextInt(scopers.length))).append('>')
        case 5 => sb.append("</").append(scopers(rnd.nextInt(scopers.length))).append('>')
        case 6 => sb.append('<').append(rubyish(rnd.nextInt(rubyish.length))).append('>')
        case 7 => sb.append("</").append(rubyish(rnd.nextInt(rubyish.length))).append('>')
        case 8 | 9 => sb.append('<').append(misc(rnd.nextInt(misc.length))).append('>')
        case 10 => sb.append("</").append(misc(rnd.nextInt(misc.length))).append('>')
        case 11 => sb.append('<').append(fmt(rnd.nextInt(fmt.length))).append('>')
        case 12 => sb.append("</").append(fmt(rnd.nextInt(fmt.length))).append('>')
        case 13 => sb.append('<').append(foreign(rnd.nextInt(foreign.length))).append('>')
        case 14 => sb.append("</").append(foreign(rnd.nextInt(foreign.length))).append('>')
        case 15 => sb.append('<').append(breakout(rnd.nextInt(breakout.length))).append('>')
        case _ => sb.append(words(rnd.nextInt(words.length))).append(' ')
      }
    }
    sb.toString
  }
  val rnd = new Random(2103)
  (0 until 600).foreach { i =>
    val body = soup(rnd, 12 + rnd.nextInt(60))
    val doc =
      if (i % 5 == 0) body // no scaffolding: INITIAL-mode entry
      else s"<!DOCTYPE html><html><body>$body</body></html>"
    Files.write(dir.resolve(f"u$i%04d.html"), doc.getBytes(UTF_8))
  }
  println(s"wrote 600 docs to $dir")
}
