package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic REAL-HTML page for a text column — the fixture
  * generator behind the vs_parse_html oracle: a crawl-shaped page
  * with the boilerplate a real site carries (head with title + style
  * + script, a header/nav link bar, an aside, a footer) around the
  * document text as main content.
  *
  * Layout, all recomputable from the text in SQL:
  *  - `<title>` = the first 40 chars of the text;
  *  - one `<p>` per [[graft.operators.DocParse.PageSize]]-char chunk
  *    under `<main>` (DOM path `/html[1]/body[1]/main[1]/p[i+1]`),
  *    and every third paragraph carries an inline `<img>` whose
  *    `data:` URI payload is the chunk's 8-char md5 prefix, width/
  *    height from the GFT bbox formulas;
  *  - deliberate TAG SOUP on every `i % 4 == 2` paragraph: uppercase
  *    `<P`, an unquoted attribute, and NO closing tag — the next
  *    start tag (or `</main>`) must close it implicitly, so the
  *    oracle hash-checks the tolerant-parse rules, not just the
  *    happy path. The script body contains a bare `<` for the same
  *    reason (raw-text scan, not tag open).
  *
  * CHARSET shares — the page ENCODING routes on the text's md5 first
  * hex nibble mod 3 (SQL-replayable:
  * `(strpos('0123456789abcdef', substr(md5(text),1,1)) - 1) % 3`),
  * and each share's `<aside>` carries a static NON-ASCII string only
  * a correct decode round-trips (a wrong-charset decode yields U+FFFD
  * replacements and fails the hash):
  *  - share 0: UTF-8 with a BOM and NO meta declaration — the BOM
  *    sniff path; the aside includes a char outside windows-1252;
  *  - share 1: windows-1252, declared `<meta charset=windows-1252>`
  *    — the modern meta form; the aside's bytes (0xE9, 0xA9, ...)
  *    are invalid UTF-8 sequences;
  *  - share 2: Shift_JIS, declared via the legacy
  *    `<meta http-equiv="Content-Type" content="...; charset=...">`
  *    form; the aside is Japanese text.
  * Document text must stay encodable in every share's charset (the
  * driver corpus is ASCII); an unencodable char fails LOUDLY rather
  * than synthesizing a corrupt fixture.
  * Empty text -> a valid page with boilerplate only. */
case class SynthHtml(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthHtml needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthHtml.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthHtml =
    copy(child = c)
}

object SynthHtml {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthHtml(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  private val PageSize = 200 // = DocParse.PageSize (no cyclic dep)

  /** The per-share static aside strings (escape-only — the literals
    * stay ASCII in source; the oracle SQL interpolates these same
    * vals so the two sides share one definition). */
  val Aside0 = "na\u00efve caf\u00e9 \u2014 d\u00e9j\u00e0 vu \u2713"
  val Aside1 = "r\u00e9sum\u00e9 \u00a9 caf\u00e9 \u2014 na\u00efve"
  val Aside2 = "\u3053\u3093\u306b\u3061\u306f \u4e16\u754c \u30ab\u30bf\u30ab\u30ca"

  /** Charset label per share — what the page declares AND encodes
    * in; [[SynthWarc]] reuses it for the HTTP Content-Type. */
  private[graft] def charsetNameOf(share: Int): String = share match {
    case 1 => "windows-1252"
    case 2 => "shift_jis"
    case _ => "utf-8"
  }

  private[graft] def asideOf(share: Int): String = share match {
    case 1 => Aside1
    case 2 => Aside2
    case _ => Aside0
  }

  /** text-md5 first hex nibble mod 3 — SQL-replayable share route. */
  private[graft] def shareOf(text: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) >> 4) & 0xF) % 3
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private[graft] def build(text: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val share = shareOf(text)
    val chunks =
      if (text.isEmpty) Seq.empty[String] else text.grouped(PageSize).toSeq
    val sb = new StringBuilder(512 + text.length * 2)
    sb ++= "<!DOCTYPE html>\n<html><head>\n"
    share match {
      case 1 => sb ++= "<meta charset=windows-1252>\n"
      case 2 => sb ++= "<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=Shift_JIS\">\n"
      case _ => () // share 0 declares nothing: the BOM is the signature
    }
    sb ++= s"<title>${esc(text.take(40))}</title>\n"
    sb ++= "<style>body { margin: 0; color: #222; }</style>\n"
    sb ++= "<script>var t = 1; if (t < 2) { t = t + 1; }</script>\n"
    sb ++= "</head>\n<body>\n<header><nav><a href=\"/\">Home</a> " +
      "<a href=\"/about\">About</a> <a href=\"/contact\">Contact</a>" +
      "</nav></header>\n<main>\n"
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val img =
        if (i % 3 != 0) ""
        else {
          val md5p = java.security.MessageDigest.getInstance("MD5")
            .digest(chunk.getBytes(utf8)).map("%02x".format(_))
            .mkString.take(8)
          val b64 = java.util.Base64.getEncoder
            .encodeToString(md5p.getBytes(utf8))
          val w = 100 + (i * 7) % 200
          val h = 80 + (i * 11) % 160
          s"""<img src="data:application/octet-stream;base64,$b64"""" +
            s""" width=$w height=$h alt="">"""
        }
      if (i % 4 == 2) sb ++= s"<P class=note>${esc(chunk)}$img\n"
      else sb ++= s"<p>${esc(chunk)}$img</p>\n"
    }
    sb ++= s"</main>\n<aside>${asideOf(share)}</aside>\n"
    sb ++= "<footer>(c) example.com - static footer</footer>\n"
    sb ++= "</body></html>\n"
    val page = sb.result()
    val cs = java.nio.charset.Charset.forName(charsetNameOf(share))
    val enc = cs.newEncoder() // loud-fail: a corrupt fixture is worse
    if (!enc.canEncode(page))
      throw new IllegalArgumentException(
        s"SynthHtml: text not encodable in share-$share charset ${cs.name}")
    val encoded = cs.encode(page)
    val body = new Array[Byte](encoded.remaining())
    encoded.get(body)
    if (share == 0) Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ body
    else body
  }
}
