import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

object GenEnt extends App {
  val dir = Paths.get("/tmp/parity/docs9")
  Files.createDirectories(dir)
  val ents = Seq("&not", "&notin;", "&notinva;", "&amp", "&amp;", "&ampx", "&AMP",
    "&lt", "&ltx", "&lt=", "&lt;=", "&copy1", "&copy;1", "&curren", "&curre",
    "&GT", "&gT;", "&aacute", "&Aacute;", "&nbsp", "&nbsp;x", "&#", "&#x", "&#;",
    "&#0;", "&#x0;", "&#38;", "&#x26;", "&#X26;", "&#9731;", "&#x2603;",
    "&#1114111;", "&#1114112;", "&#xD800;", "&#x110000;", "&#999999999999;",
    "&;", "&&amp;", "&a", "&0", "& amp;", "&am p;", "&thetasym;", "&ThickSpace;",
    "&fjlig;", "&sqcaps;", "&bne;", "&nang;", "&CounterClockwiseContourIntegral;",
    "&notindot;", "&notinE;", "&prod;", "&pi;&Pi;&piv;")
  val seps = Seq("", " ", "x", "=", "a1", ";")
  def doc(rnd: Random, n: Int): String = {
    val sb = new StringBuilder
    sb.append("<p>")
    (0 until n).foreach { _ =>
      rnd.nextInt(6) match {
        case 0 | 1 | 2 => sb.append(ents(rnd.nextInt(ents.length))).append(seps(rnd.nextInt(seps.length)))
        case 3 =>
          // entity in attribute value, three quoting styles
          val e = ents(rnd.nextInt(ents.length))
          val sep = seps(rnd.nextInt(seps.length))
          rnd.nextInt(3) match {
            case 0 => sb.append("<a href=\"").append(e).append(sep).append("\">in</a>")
            case 1 => sb.append("<a href='").append(e).append(sep).append("'>in</a>")
            case 2 => sb.append("<a href=").append(e.replace(" ", "")).append(">in</a>")
          }
        case 4 => sb.append(" word ")
        case 5 => sb.append("<b>").append(ents(rnd.nextInt(ents.length))).append("</b>")
      }
    }
    sb.toString
  }
  (0 until 400).foreach { i =>
    val rnd = new Random(331000 + i)
    Files.write(dir.resolve(f"ent$i%03d.html"), doc(rnd, 5 + rnd.nextInt(60)).getBytes(UTF_8))
  }
  println("ok")
}
