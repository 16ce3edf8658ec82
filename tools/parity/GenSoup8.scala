import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

object GenSoup8 extends App {
  val dir = Paths.get("/tmp/parity/docs8")
  Files.createDirectories(dir)
  val fmt = Seq("b","i","em","strong","u","s","small","big","tt","code","font","nobr","a")
  val blocks = Seq("p","div","li","td","th","caption","h1","h2","blockquote","section")
  val tableish = Seq("table","tr","td","th","tbody","thead","tfoot","caption","colgroup","col","select","option","optgroup","template")
  val words = Seq("alpha","beta","gamma","delta","epsilon","η-greek","x")
  val attrVals = Seq("v&amp;1","a b c","&copy;","x&notsemi","&#65;&#x42;","plain","&ampoops")
  def soup(rnd: Random, n: Int): String = {
    val sb = new StringBuilder
    var depth = 0
    (0 until n).foreach { _ =>
      rnd.nextInt(14) match {
        case 0 | 1 =>
          sb.append('<').append(fmt(rnd.nextInt(fmt.length))).append('>'); depth += 1
        case 2 =>
          // misnest: close a RANDOM formatting tag (AAA trigger)
          sb.append("</").append(fmt(rnd.nextInt(fmt.length))).append('>')
        case 3 | 4 =>
          sb.append('<').append(blocks(rnd.nextInt(blocks.length))).append('>')
        case 5 =>
          sb.append("</").append(blocks(rnd.nextInt(blocks.length))).append('>')
        case 6 | 7 =>
          sb.append('<').append(tableish(rnd.nextInt(tableish.length))).append('>')
        case 8 =>
          sb.append("</").append(tableish(rnd.nextInt(tableish.length))).append('>')
        case 9 =>
          val t = Seq("a","td","div","span")(rnd.nextInt(4))
          sb.append('<').append(t)
            .append(" href=\"").append(attrVals(rnd.nextInt(attrVals.length))).append('"')
            .append(" title='").append(attrVals(rnd.nextInt(attrVals.length))).append("'")
            .append(" data-x=").append(attrVals(rnd.nextInt(attrVals.length)).replace(" ", ""))
            .append('>')
        case 10 | 11 | 12 =>
          sb.append(words(rnd.nextInt(words.length))).append(' ')
        case 13 =>
          sb.append(Seq("&amp;","&AMP","&Kappa;","&#x1F600;","<!--c-->","\n\t")(rnd.nextInt(6)))
      }
    }
    sb.toString
  }
  (0 until 600).foreach { i =>
    val rnd = new Random(777000 + i)
    Files.write(dir.resolve(f"soup$i%03d.html"), soup(rnd, 40 + rnd.nextInt(360)).getBytes(UTF_8))
  }
  println("ok")
}
