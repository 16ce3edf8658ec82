package graft.html

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** Runs the checked-in fixture corpus (FIXTURES.md §3-§4):
  * html5lib-tokenizer-style JSON and tree-construction `.dat` golden
  * dumps — the in-repo stand-in for the upstream conformance suite the
  * reference claims (README.md:21). */
object Fixtures {
  def resource(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing fixture resource $path")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Parse html5lib `.dat`: sections separated by blank lines, keys
    * #data / #document-fragment / #document. */
  final case class TreeCase(data: String, fragmentContext: Option[String],
                            expected: String)

  def loadDat(path: String): Seq[TreeCase] = {
    val text = resource(path)
    val out = ListBuffer.empty[TreeCase]
    var data = new StringBuilder
    var doc = new StringBuilder
    var frag: Option[String] = None
    var mode = ""
    def flush(): Unit = {
      if (mode.nonEmpty) {
        out += TreeCase(data.toString.stripSuffix("\n"), frag,
          doc.toString.stripSuffix("\n"))
        data = new StringBuilder; doc = new StringBuilder; frag = None; mode = ""
      }
    }
    text.split("\n", -1).foreach {
      case "#data" => flush(); mode = "data"
      case "#document" => mode = "doc"
      case "#document-fragment" => mode = "frag"
      case "#errors" => mode = "errors"
      case line =>
        mode match {
          case "data" => data.append(line).append('\n')
          case "doc" => doc.append(line).append('\n')
          case "frag" => if (line.nonEmpty) frag = Some(line.trim)
          case _ =>
        }
    }
    flush()
    out.toSeq
  }
}

class TreeFixtureSpec extends AnyFunSuite {
  private val files = Seq("formatting.dat", "tables.dat", "misc.dat",
    "foreign.dat", "quirks.dat", "fragments.dat", "adversarial.dat",
    "adversarial2.dat")

  files.foreach { f =>
    Fixtures.loadDat(s"/fixtures/tree/$f").zipWithIndex.foreach { case (tc, i) =>
      test(s"$f #$i: ${tc.data.take(50).replace("\n", "\\n")}") {
        val dump = tc.fragmentContext match {
          case Some(ctx) =>
            val root = HtmlParser.parseFragment(tc.data, ctx)
            val sb = new java.lang.StringBuilder
            val d = Node.document()
            root.children.toSeq.foreach(d.appendChild)
            Serializer.dump(d)
          case None =>
            Serializer.dump(HtmlParser.parse(tc.data))
        }
        assert(dump.stripTrailing == tc.expected.stripTrailing,
          s"\ninput: ${tc.data}\ngot:\n$dump\nexpected:\n${tc.expected}")
      }
    }
  }
}

class TokenizerFixtureSpec extends AnyFunSuite {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import scala.jdk.CollectionConverters._

  private val mapper = new ObjectMapper()

  private def runCase(t: JsonNode): Unit = {
    val input = t.get("input").asText()
    val model = Option(t.get("initialStates"))
      .map(_.get(0).asText()) match {
      case Some("RCDATA state") => ContentModel.RCDATA
      case Some("RAWTEXT state") => ContentModel.RAWTEXT
      case Some("Script data state") => ContentModel.SCRIPT
      case Some("PLAINTEXT state") => ContentModel.PLAINTEXT
      case _ => ContentModel.DATA
    }
    val lastStart = Option(t.get("lastStartTag")).map(_.asText()).orNull

    val toks = ArrayBuffer.empty[Token]
    val sink = new TokenSink { def process(tok: Token): Unit = toks += tok }
    val tk = new Tokenizer(input, sink)
    tk.state = model
    if (lastStart != null) tk.lastStartTag = lastStart
    tk.run()

    // normalize: drop EOF, merge adjacent Character tokens (html5lib style)
    val got = ArrayBuffer.empty[Vector[Any]]
    toks.foreach {
      case CharsTok(s, _, _) =>
        if (got.nonEmpty && got.last.head == "Character")
          got(got.length - 1) = Vector("Character", got.last(1).toString + s)
        else got += Vector("Character", s)
      case StartTagTok(name, attrs, selfClosing, _) =>
        val m = attrs.map(a => a.name -> a.value).toMap
        got += (if (selfClosing) Vector("StartTag", name, m, true)
                else Vector("StartTag", name, m))
      case EndTagTok(name, _) => got += Vector("EndTag", name)
      case CommentTok(s, _) => got += Vector("Comment", s)
      case DoctypeTok(name, pub, sys, fq) =>
        got += Vector("DOCTYPE", name, pub, sys, !fq)
      case EofTok =>
    }

    val expected = t.get("output").elements().asScala.map { o =>
      val arr = o.elements().asScala.toVector
      arr.head.asText() match {
        case "Character" => Vector[Any]("Character", arr(1).asText())
        case "Comment" => Vector[Any]("Comment", arr(1).asText())
        case "EndTag" => Vector[Any]("EndTag", arr(1).asText())
        case "StartTag" =>
          val attrs = arr(2).properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap
          if (arr.length > 3 && arr(3).asBoolean())
            Vector[Any]("StartTag", arr(1).asText(), attrs, true)
          else Vector[Any]("StartTag", arr(1).asText(), attrs)
        case "DOCTYPE" =>
          Vector[Any]("DOCTYPE",
            if (arr(1).isNull) null else arr(1).asText(),
            if (arr(2).isNull) null else arr(2).asText(),
            if (arr(3).isNull) null else arr(3).asText(),
            arr(4).asBoolean())
      }
    }.toVector

    assert(got.toVector == expected,
      s"\ninput: $input\ngot:      ${got.toVector}\nexpected: $expected")
  }

  Seq("basic.test", "eof.test").foreach { f =>
    val root = mapper.readTree(Fixtures.resource(s"/fixtures/tokenizer/$f"))
    root.get("tests").elements().asScala.zipWithIndex.foreach { case (t, i) =>
      test(f"$f #$i%02d: ${t.get("description").asText()}") { runCase(t) }
    }
  }
}
