package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic REAL-HTML page for a text column — the fixture
  * generator behind the vs_parse_html oracle: a crawl-shaped page
  * with the boilerplate a real site carries (head with title + style
  * + script, a header/nav link bar, a footer) around the document
  * text as main content.
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
  * Empty text → a valid page with boilerplate only. */
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

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private[graft] def build(text: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val chunks =
      if (text.isEmpty) Seq.empty[String] else text.grouped(PageSize).toSeq
    val sb = new StringBuilder(512 + text.length * 2)
    sb ++= "<!DOCTYPE html>\n<html><head>\n<meta charset=utf-8>\n"
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
    sb ++= "</main>\n<footer>(c) example.com - static footer</footer>\n"
    sb ++= "</body></html>\n"
    sb.result().getBytes(utf8)
  }
}
