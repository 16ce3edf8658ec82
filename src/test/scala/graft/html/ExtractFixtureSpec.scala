package graft.html

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Extraction golden fixtures (FIXTURES.md §5): *.html + *.spans.json
  * with hand-derived (kind, text|media_ref) sequences; "strict" is
  * clear_text semantics, "boilerplate" adds link-density stripping. */
class ExtractFixtureSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private val cases = Seq("article", "malformed")

  private def spansOf(html: String, cfg: ExtractConfig): Seq[(String, String)] =
    Extractor.extractHtml(html, cfg).map { s =>
      (s.kind, if (s.kind == "media") s.media_ref else s.text)
    }

  cases.foreach { name =>
    val html = Fixtures.resource(s"/fixtures/extract/$name.html")
    val spec = mapper.readTree(Fixtures.resource(s"/fixtures/extract/$name.spans.json"))

    def expected(mode: String): Option[Seq[(String, String)]] =
      Option(spec.get(mode)).map(_.elements().asScala.map { e =>
        (e.get(0).asText(), e.get(1).asText())
      }.toSeq)

    test(s"extract golden: $name (strict)") {
      assert(spansOf(html, Extractor.Strict) == expected("strict").get)
    }
    expected("boilerplate").foreach { exp =>
      test(s"extract golden: $name (boilerplate)") {
        assert(spansOf(html, Extractor.Boiler) == exp)
      }
    }
  }
}
