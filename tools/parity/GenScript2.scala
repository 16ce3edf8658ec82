import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

/** Corpus 17: script-data sub-machine stress — escaped (<!--),
  * double-escaped (<script> inside the escape), bogus </script tails,
  * dash runs, '<' '</' '<s' partials, case-mixed end tags. */
object GenScript2 extends App {
  val dir = Paths.get("/tmp/parity/docs18")
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
    val rnd = new Random(1800000 + i)
    val container = Seq("title","textarea","style","xmp","iframe","noembed","noframes","plaintext")(rnd.nextInt(8)); val sb = new StringBuilder(s"<p>pre</p><$container>")
    sb.append(body(rnd, 3 + rnd.nextInt(25)))
    // half the docs get a proper closer + tail content, half end at EOF
    if (rnd.nextBoolean()) sb.append(s"</$container><p>post</p>")
    Files.write(dir.resolve(f"s$i%03d.html"), sb.toString.getBytes(UTF_8))
  }
  println("ok")
}
