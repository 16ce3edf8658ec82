package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Deterministic synthetic corpus (FIXTURES.md §1-§2, seed=42, no
  * external data): interleaved html/text/media input docs PLUS the
  * constructively-known expected extraction — the generator records
  * where it plants every piece of content, so expectations come from
  * construction, not from running the engine. */
object CorpusGen {

  private val words = Array(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu")

  private def sentence(rnd: Random, n: Int): String =
    (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" ")

  /** Builder that tracks global char offsets while assembling one html
    * input span, recording planted spans as it goes. */
  private final class HtmlBuilder(baseOffset: Int) {
    val sb = new java.lang.StringBuilder(512)
    val expected = new ArrayBuffer[SpanRow](16)
    def pos: Int = baseOffset + sb.length
    def raw(s: String): Unit = sb.append(s)
    /** Append visible text and record it as an expected span. */
    def content(kind: String, text: String): Unit = {
      expected += SpanRow(kind, text, "", pos)
      sb.append(text)
    }
    def media(ref: String): Unit = {
      expected += SpanRow("media", "", ref, pos)
      sb.append(s"""<img src="$ref">""")
    }
  }

  /** One block of planted content; the repertoire covers the parser
    * features the fixtures demand (FIXTURES.md §4-§5). */
  private def addBlock(b: HtmlBuilder, rnd: Random, docId: Long): Unit = {
    rnd.nextInt(12) match {
      case 0 => // heading
        b.raw("<h1>"); b.content("heading", sentence(rnd, 3)); b.raw("</h1>")
      case 1 => // plain paragraph
        b.raw("<p>"); b.content("text", sentence(rnd, 8)); b.raw("</p>")
      case 2 => // list
        b.raw("<ul>")
        (0 until 2 + rnd.nextInt(3)).foreach { _ =>
          b.raw("<li>"); b.content("list_item", sentence(rnd, 4)); b.raw("</li>")
        }
        b.raw("</ul>")
      case 3 => // pre with suppressed first newline
        b.raw("<pre>\n"); b.content("pre", sentence(rnd, 5)); b.raw("</pre>")
      case 4 => // entities: engine must decode &#32; back to spaces
        val t = sentence(rnd, 6)
        b.raw("<p>")
        b.expected += SpanRow("text", t, "", b.pos)
        b.raw(t.replace(" ", "&#32;"))
        b.raw("</p>")
      case 5 => // misnesting → adoption agency
        b.raw("<p>"); b.content("text", sentence(rnd, 2))
        b.raw("<b>"); b.content("text", sentence(rnd, 2))
        b.raw("<i>"); b.content("text", sentence(rnd, 2))
        b.raw("</b>"); b.content("text", sentence(rnd, 2))
        b.raw("</i>"); b.content("text", sentence(rnd, 2)); b.raw("</p>")
      case 6 => // table with fostered leak (DOM order == source order here)
        b.raw("<table>"); b.content("text", sentence(rnd, 2))
        b.raw("<tr><td>"); b.content("text", sentence(rnd, 3))
        b.raw("</td></tr></table>")
      case 7 => // media interleaved in paragraph
        b.raw("<p>"); b.content("text", sentence(rnd, 3))
        b.media(s"media://img-$docId-${rnd.nextInt(1000)}")
        b.content("text", sentence(rnd, 3)); b.raw("</p>")
      case 8 => // skipped subtrees: script/style noise
        b.raw(s"<script>var x = '<p>${sentence(rnd, 3)}</p>';</script>")
        b.raw(s"<style>.c${rnd.nextInt(100)} { color: red }</style>")
      case 9 => // comment + textarea noise
        b.raw(s"<!-- ${sentence(rnd, 4)} -->")
        b.raw(s"<textarea>${sentence(rnd, 4)}</textarea>")
      case 10 => // headings h2..h6
        val h = 2 + rnd.nextInt(5)
        b.raw(s"<h$h>"); b.content("heading", sentence(rnd, 2)); b.raw(s"</h$h>")
      case 11 => // div/section nesting with attributes
        b.raw(s"""<section id="s${rnd.nextInt(100)}"><div class="c x">""")
        b.content("text", sentence(rnd, 6))
        b.raw("</div></section>")
    }
  }

  final case class GenDoc(doc_id: String, spans: Seq[SpanRow],
                          expected: Seq[SpanRow], garbage: Boolean)

  /** Deterministic per-doc generation — pure function of (seed, id).
    * `blocksScale` multiplies document size (bench corpora use heavier
    * docs so compute dominates fixed overheads; default 1 for tests). */
  def genDoc(id: Long, seed: Long = 42L, giantEvery: Int = 1000,
             blocksScale: Int = 1): GenDoc = {
    val rnd = new Random(seed * 1000003L + id)
    val isGarbage = rnd.nextInt(100) == 0
    val docId = if (isGarbage) f"garbage-$id%012d" else f"doc-$id%012d"
    if (isGarbage) {
      val bytes = Array.fill(50 + rnd.nextInt(500))(rnd.nextInt(256).toByte)
      val junk = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      return GenDoc(docId, Seq(SpanRow("html", junk, "", 0)), null, garbage = true)
    }
    val giant = id > 0 && id % giantEvery == 0
    val nBlocks = (if (giant) 400 else 2 + rnd.nextInt(6)) * blocksScale

    val inputSpans = new ArrayBuffer[SpanRow](4)
    val expected = new ArrayBuffer[SpanRow](16)
    var offset = 0

    // html span with head + body
    val hb = new HtmlBuilder(offset)
    hb.raw("<!DOCTYPE html><html><head><title>")
    hb.content("text", s"Doc $id")
    hb.raw("</title></head><body>")
    (0 until nBlocks).foreach(_ => addBlock(hb, rnd, id))
    hb.raw("</body></html>")
    inputSpans += SpanRow("html", hb.sb.toString, "", offset)
    expected ++= hb.expected
    offset += hb.sb.length()

    // interleaved plain-text span
    if (rnd.nextBoolean()) {
      val t = sentence(rnd, 10)
      inputSpans += SpanRow("text", t, "", offset)
      expected += SpanRow("text", t, "", offset)
      offset += t.length
    }
    // interleaved media span
    if (rnd.nextBoolean()) {
      val ref = s"media://blob-$id"
      inputSpans += SpanRow("media", "", ref, offset)
      expected += SpanRow("media", "", ref, offset)
    }
    GenDoc(docId, inputSpans.toSeq, expected.toSeq, garbage = false)
  }

  /** Distributed generation: ids parallelized, docs built on executors
    * (nothing is collected on the driver — generator scales with the
    * corpus). */
  def inputDs(spark: SparkSession, n: Long, seed: Long = 42L,
              giantEvery: Int = 1000, parallelism: Int = 32,
              blocksScale: Int = 1): Dataset[DocRow] = {
    import spark.implicits._
    spark.range(0, n, 1, parallelism)
      .map { id =>
        val g = genDoc(id, seed, giantEvery, blocksScale); DocRow(g.doc_id, g.spans)
      }
  }

  def expectedDf(spark: SparkSession, n: Long, seed: Long = 42L,
                 giantEvery: Int = 1000, parallelism: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, parallelism)
      .map { id => val g = genDoc(id, seed, giantEvery); DocRow(g.doc_id, g.expected) }
      .toDF()
  }

  // ------------------------------------------------------- media blobs
  // Every media ref the corpus plants resolves to a REAL image payload
  // (valid PNG / JPEG / GIF bytes) whose header fields are a pure
  // function of the ref — so the interleaved text+media E2E can verify
  // the real decoder (graft.spark.MediaUdfs) against constructively-
  // known dimensions, the same construction-not-execution discipline as
  // the span expectations above.

  private def fnv(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001B3L; i += 1 }
    h
  }

  /** Constructive expected header for a ref: (format, width, height, depth). */
  def mediaHeaderExpected(ref: String): (String, Int, Int, Int) = {
    val h = fnv(ref)
    val fmt = (((h >>> 8) % 3) + 3) % 3
    val w = 16 + ((((h >>> 16) % 300) + 300) % 300).toInt
    val ht = 8 + ((((h >>> 32) % 200) + 200) % 200).toInt
    (Seq("png", "jpeg", "gif")(fmt.toInt), w, ht, 8)
  }

  /** Real image bytes for a ref (format/dims per mediaHeaderExpected). */
  def mediaPayload(ref: String): Array[Byte] = {
    val (fmt, w, h, _) = mediaHeaderExpected(ref)
    val comN = ((fnv(ref) >>> 48) % 7).toInt.abs
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    fmt match {
      case "png" =>
        Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
          be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
          Array[Byte](8, 6, 0, 0, 0) ++ be32(0)
      case "jpeg" =>
        Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10).map(_.toByte) ++
          "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++
          Array(0xFF, 0xFE).map(_.toByte) ++ be16(comN + 2) ++
          Array.fill[Byte](comN)(0x41) ++
          Array(0xFF, 0xC0, 0x00, 0x11, 0x08).map(_.toByte) ++ be16(h) ++ be16(w) ++
          Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1) ++
          Array(0xFF, 0xD9).map(_.toByte)
      case _ =>
        "GIF89a".getBytes ++ le16(w) ++ le16(h) ++
          Array(0xF7, 0x00, 0x00).map(_.toByte)
    }
  }

  /** The media table for a generated corpus: one row per DISTINCT media
    * ref appearing in `docs`, payloads built on executors (never
    * collected). At production scale this is the blob side of the
    * interleaved input; here it is the constructive stand-in with the
    * same schema (media_id, payload). */
  def mediaTable(docs: Dataset[DocRow]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    docs.toDF()
      .select(explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media" && length(col("s.media_ref")) > 0)
      .select(col("s.media_ref").as("media_id")).distinct()
      .as[String]
      .map(ref => (ref, mediaPayload(ref)))
      .toDF("media_id", "payload")
  }
}
