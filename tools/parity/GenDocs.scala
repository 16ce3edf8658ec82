import graft.spark.CorpusGen
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
object GenDocs extends App {
  val dir = Paths.get("/tmp/parity/docs")
  Files.createDirectories(dir)
  var written = 0
  (0 until 400).foreach { i =>
    val g = CorpusGen.genDoc(i)
    if (!g.garbage) {
      // only the html spans; reference parses whole docs
      g.spans.filter(_.kind == "html").zipWithIndex.foreach { case (s, j) =>
        Files.write(dir.resolve(f"doc$i%04d-$j.html"), s.text.getBytes(UTF_8))
        written += 1
      }
    }
  }
  // plus the extraction fixtures and a few adversarial inputs
  val extra = Seq(
    "adv1" -> "<a><p>X<a>Y</a>Z</p></a>",
    "adv2" -> "<b><table><td></b><i></table>X",
    "adv3" -> "<table><tr><p><td>c",
    "adv4" -> "<p>1<b>2<i>3</b>4</i>5</p>",
    "adv5" -> "<ul><li>a<li>b</ul><p>c<p>d<dl><dd>e<dd>f</dl>",
    "adv6" -> "<table>foo<td>x</td></table>",
    "adv7" -> "<svg><g><div>x</div>",
    "adv8" -> "<select><table><tr><td>inner",
    "adv9" -> "<p><b><b><b><b>x</p><p>y</p>",
    "adv10" -> "<title>a&amp;b</title><pre>\nkeep</pre>"
  )
  extra.foreach { case (n, h) =>
    Files.write(dir.resolve(s"x$n.html"), h.getBytes(UTF_8)); written += 1
  }
  println(s"wrote $written docs")
}
