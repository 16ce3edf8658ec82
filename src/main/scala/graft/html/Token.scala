package graft.html

import scala.collection.mutable.ArrayBuffer

/** Tokenizer output tokens (reference token node: source/myhtml/token.h:75-90;
  * we materialize text eagerly — the zero-copy position trick collapses
  * because the whole document is one JVM String per row, SURVEY §2.3 W1).
  * `rawBegin` keeps the char offset into the normalized source — the
  * analog of the reference's raw_begin (token.h:80-84). */
sealed trait Token

final case class StartTagTok(
    var name: String,
    attrs: ArrayBuffer[DomAttr],
    var selfClosing: Boolean,
    rawBegin: Int
) extends Token {
  def attr(k: String): Option[String] = attrs.find(_.name == k).map(_.value)
}

final case class EndTagTok(name: String, rawBegin: Int) extends Token

/** A run of character data. May mix whitespace and non-whitespace; the
  * tree builder splits as needed.
  *
  * `ws` is the reference's MyHTML_TOKEN_TYPE_WHITESPACE flag: fresh
  * tokens default to it (token.c:178) and ONLY the DATA-state scanner
  * clears it on a non-whitespace char (tokenizer.c:775-777). Chars a tag
  * state absorbs into the run without the data loop seeing them — e.g.
  * the literal "</>" (tokenizer.c:869-876) or an EOF-truncated tag name
  * re-emitted as text (tokenizer_end.c:56-62) — keep the flag even though
  * the content is non-whitespace. The tree builder's insertion modes test
  * THIS FLAG, never the content (rules.c:91,181,244,354,544,617,1170,
  * 2261,2458,3295,3392,3484,3560,3617). */
final case class CharsTok(text: String, rawBegin: Int, ws: Boolean = false)
    extends Token

final case class CommentTok(text: String, rawBegin: Int) extends Token

final case class DoctypeTok(
    name: String, publicId: String, systemId: String, forceQuirks: Boolean
) extends Token

case object EofTok extends Token

/** Where tokens go — implemented by the TreeBuilder and by test fixture
  * collectors (the reference's callback surface, MyHTML.xs:325-401 /
  * api.h:2388-2482, maps to exactly this hook). */
trait TokenSink {
  def process(tok: Token): Unit
  /** True when the adjusted current node is a non-HTML element — gates
    * CDATA sections (reference: tokenizer.c:939-961). */
  def inForeignContent: Boolean = false
}
