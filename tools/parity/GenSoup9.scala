import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

/** Corpus 11: forms / frameset / template / head-machinery stress —
  * the insertion-mode families the earlier grammars under-sampled:
  * form pointer rules, isindex-era controls, select-in-table, frameset
  * takeover vs framesetOk, template content + mode stack, head/noscript
  * edge tags, optgroup/option closing. */
object GenSoup9 extends App {
  val dir = Paths.get("/tmp/parity/docs11")
  Files.createDirectories(dir)
  val formish = Seq("form", "input", "button", "select", "option", "optgroup",
    "textarea", "label", "fieldset", "legend", "output", "progress", "keygen", "datalist")
  val framish = Seq("frameset", "frame", "noframes", "iframe")
  val headish = Seq("base", "basefont", "bgsound", "link", "meta", "title",
    "noscript", "style", "script")
  val blocks = Seq("p", "div", "li", "td", "table", "tr", "template", "caption", "body", "html")
  val words = Seq("one", "two", "three", "four", "five", "x")
  def soup(rnd: Random, n: Int): String = {
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      rnd.nextInt(16) match {
        case 0 | 1 =>
          sb.append('<').append(formish(rnd.nextInt(formish.length))).append('>')
        case 2 =>
          sb.append("</").append(formish(rnd.nextInt(formish.length))).append('>')
        case 3 =>
          sb.append('<').append(framish(rnd.nextInt(framish.length))).append('>')
        case 4 =>
          sb.append("</").append(framish(rnd.nextInt(framish.length))).append('>')
        case 5 =>
          sb.append('<').append(headish(rnd.nextInt(headish.length))).append('>')
        case 6 =>
          sb.append("</").append(headish(rnd.nextInt(headish.length))).append('>')
        case 7 | 8 =>
          sb.append('<').append(blocks(rnd.nextInt(blocks.length))).append('>')
        case 9 =>
          sb.append("</").append(blocks(rnd.nextInt(blocks.length))).append('>')
        case 10 =>
          val t = Seq("input", "form", "option", "frame")(rnd.nextInt(4))
          sb.append('<').append(t)
            .append(" type=").append(Seq("hidden", "text", "submit")(rnd.nextInt(3)))
            .append(" name=\"n").append(rnd.nextInt(9)).append("\"")
            .append(if (rnd.nextBoolean()) " disabled" else " value='v&amp;1'")
            .append('>')
        case 11 | 12 | 13 =>
          sb.append(words(rnd.nextInt(words.length))).append(' ')
        case 14 =>
          sb.append(Seq("<!--c-->", "\n", "&amp;", "<![CDATA[x]]>", "<!doctype html>")(rnd.nextInt(5)))
        case 15 =>
          // template nesting burst
          sb.append("<template>").append(words(rnd.nextInt(words.length)))
            .append(if (rnd.nextBoolean()) "</template>" else "<td>")
      }
    }
    sb.toString
  }
  (0 until 700).foreach { i =>
    val rnd = new Random(911000 + i)
    Files.write(dir.resolve(f"soup$i%03d.html"), soup(rnd, 30 + rnd.nextInt(300)).getBytes(UTF_8))
  }
  println("ok")
}
