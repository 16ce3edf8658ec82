import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

object GenSoup5 extends App {
  val dir = Paths.get("/tmp/parity/docs5")
  Files.createDirectories(dir)
  val tags = Seq("p","div","b","i","table","td","tr","th","li","ul","ol","h1","h3",
    "pre","span","em","strong","a","u","s","small","dl","dd","dt","blockquote",
    "section","article","nav","header","footer","caption","colgroup","col",
    "tbody","thead","tfoot","select","option","optgroup","button","form","fieldset",
    "label","ruby","rt","rb","rtc","marquee","center","font","nobr","big","code",
    "svg","math","mi","mo","mn","ms","mtext","annotation-xml","foreignObject",
    "desc","rect","g","path","template","title","textarea","style","script",
    "noscript","noembed","noframes","xmp","iframe","plaintext","br","img","hr",
    "input","frameset","frame","body","html","head","base","meta","link",
    "DIV","TaBle","SvG","applet","object","param","embed","area","wbr",
    "keygen","source","track","listing","summary","details","dialog","menu",
    "menuitem","main","figure","figcaption","address","hgroup","bdi","bdo",
    "data","time","mark","q","cite","abbr","dfn","kbd","samp","var","sub","sup",
    "isindex","image","a")
  val words = Seq("alpha","beta","gamma","delta","words","text","content","xyz",
    "тест","日本語","emoji\u00a0nbsp","x")
  val specials = Seq("&amp;","&#65;","&copy","&copy;","&bogus;","&notin;","&not;",
    "&#x10FFFF;","&#0;","&#xD800;","&#X41;","&#938;","&lt","&GT;","&amp",
    "<!--x-->","<!-- -- >","<!--a--!>","<!>","</ y>","<?php ?>","<![CDATA[z]]>",
    "<!doctype html>","<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01//EN\">",
    "\\n","\t","</br>","</p>","</h1>","</table>","</template>","</form>",
    "<a href=x>","<a HREF='y y'>","<img src=\"m.png\" alt=a>","<input type=hidden>",
    "<font color=red>","<font other=1>","<b/>","<br/>","<svg/>","<td co%20l=1>")
  def soup(rnd: Random, n: Int): String = {
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      rnd.nextInt(12) match {
        case 0 | 1 | 2 => sb.append('<').append(tags(rnd.nextInt(tags.length))).append('>')
        case 3 | 4 => sb.append("</").append(tags(rnd.nextInt(tags.length))).append('>')
        case 5 => sb.append('<').append(tags(rnd.nextInt(tags.length)))
          .append(rnd.nextInt(4) match {
            case 0 => " a" + rnd.nextInt(5) + "='v" + rnd.nextInt(9) + "'"
            case 1 => " a" + rnd.nextInt(5) + "=\"v" + rnd.nextInt(9) + "\""
            case 2 => " a" + rnd.nextInt(5) + "=v" + rnd.nextInt(9)
            case _ => " disabled data-x=&amp;1"
          }).append(if (rnd.nextInt(6) == 0) "/>" else ">")
        case 6 | 7 | 8 => sb.append(words(rnd.nextInt(words.length))).append(' ')
        case 9 | 10 => sb.append(specials(rnd.nextInt(specials.length)))
        case 11 => sb.append(Seq("< div>","<3","</>","<","</","<!","a<b>c",
          " < ","=\"","'","`x`")(rnd.nextInt(11)))
      }
    }
    sb.toString
  }
  (0 until 800).foreach { i =>
    val rnd = new Random(91000 + i)
    Files.write(dir.resolve(f"soup$i%03d.html"), soup(rnd, 8 + rnd.nextInt(160)).getBytes(UTF_8))
  }
  println("ok")
}
