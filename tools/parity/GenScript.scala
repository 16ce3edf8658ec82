import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

/** Corpus 17: script-data sub-machine stress — escaped (<!--),
  * double-escaped (<script> inside the escape), bogus </script tails,
  * dash runs, '<' '</' '<s' partials, case-mixed end tags. */
object GenScript extends App {
  val dir = Paths.get("/tmp/parity/docs17")
  Files.createDirectories(dir)
  val pieces = Seq(
    "var a=1;", "if(a<b){}", "x-->y", "<!--", "-->", "<script>", "</script",
    "</script >", "</SCRIPT>", "<script", "a--b", "---", "<", "</", "<s",
    "//c\n", "'</script>'", "\"<!--\"", "s<!--x", "--!>", "<scr", "ipt>",
    " ", "y=z;")
  def body(rnd: Random, n: Int): String = {
    val sb = new StringBuilder
    (0 until n).foreach(_ => sb.append(pieces(rnd.nextInt(pieces.length))))
    sb.toString
  }
  (0 until 500).foreach { i =>
    val rnd = new Random(1700000 + i)
    val sb = new StringBuilder("<p>pre</p><script>")
    sb.append(body(rnd, 3 + rnd.nextInt(25)))
    // half the docs get a proper closer + tail content, half end at EOF
    if (rnd.nextBoolean()) sb.append("</script><p>post</p>")
    Files.write(dir.resolve(f"s$i%03d.html"), sb.toString.getBytes(UTF_8))
  }
  println("ok")
}
