package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Markdown document for a text column — the fixture
  * generator behind the vs_parse_md oracle, a README-shaped page:
  *
  *  - `# <first 40 chars>` title heading;
  *  - one block per [[graft.operators.DocParse.PageSize]]-char chunk:
  *    every `i % 4 == 1` chunk ships as a FENCED CODE BLOCK (parsed
  *    verbatim — whitespace preservation hash-checked), the rest as
  *    paragraphs; every third chunk's paragraph carries an inline
  *    `![fig](data:…;base64,…)` image whose payload is the chunk's
  *    8-char md5 prefix (skipped on code chunks — fences are opaque);
  *  - a static blockquote and a two-item list, so the quote/list
  *    block paths are exercised on every document;
  *  - `---` thematic breaks between sections (skipped by the parser).
  *
  * Ordinals recompute in SQL: code blocks sit at chunk indices
  * 1, 5, 9, … so `codeBefore(i) = (i+2)//4`, paragraph ordinal =
  * `i - codeBefore(i) + 1`, code ordinal = `codeBefore(i) + 1`. */
case class SynthMd(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthMd needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthMd.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthMd =
    copy(child = c)
}

object SynthMd {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthMd(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  private val PageSize = 200 // = DocParse.PageSize (no cyclic dep)

  private[graft] def build(text: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val chunks =
      if (text.isEmpty) Seq.empty[String] else text.grouped(PageSize).toSeq
    val sb = new StringBuilder(256 + text.length * 2)
    val title = text.take(40).replaceAll("\\s+", " ")
    if (title.trim.nonEmpty) sb ++= s"# $title\n\n"
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      if (i % 4 == 1) sb ++= s"```\n$chunk\n```\n\n"
      else {
        val img =
          if (i % 3 != 0) ""
          else {
            val md5p = java.security.MessageDigest.getInstance("MD5")
              .digest(chunk.getBytes(utf8)).map("%02x".format(_))
              .mkString.take(8)
            val b64 = java.util.Base64.getEncoder
              .encodeToString(md5p.getBytes(utf8))
            s" ![fig](data:application/octet-stream;base64,$b64)"
          }
        sb ++= s"$chunk$img\n\n"
      }
    }
    sb ++= "---\n\n> static quote\n\n- alpha item\n- beta item\n"
    sb.result().getBytes(utf8)
  }
}
