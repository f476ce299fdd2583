package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic REAL-RTF payload for a text column — the fixture
  * generator behind the vs_parse_rtf oracle: a structurally valid
  * RTF 1 document with the non-text destinations a real writer
  * emits (`\fonttbl`, `{\*\generator}`, `\info` with a title), one
  * `\pard...\par` paragraph per
  * [[graft.operators.DocParse.PageSize]]-char chunk, and every
  * third paragraph followed by a `{\pict}` whose hex payload is the
  * chunk's 8-char md5 prefix with `\picw`/`\pich` from the GFT bbox
  * formulas. Escaping is the real writer's: `\{ \} \\` for the
  * specials, `\'xx` for 0xA0–0xFF, `\uN?` for anything past Latin-1
  * (with the default `\uc1` fallback). Empty text → a valid
  * zero-paragraph document. */
case class SynthRtf(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthRtf needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthRtf.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthRtf =
    copy(child = c)
}

object SynthRtf {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthRtf(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  private val PageSize = 200 // = DocParse.PageSize (no cyclic dep)

  private[graft] def rtfEsc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case c @ ('{' | '}' | '\\') => sb.append('\\').append(c)
      // raw CR/LF in an RTF file is IGNORED by readers (spec), so
      // newline CONTENT must travel escaped or the round trip is lossy
      case c @ ('\r' | '\n') => sb.append(f"\\'${c.toInt}%02x")
      case c if c < 0x80 => sb.append(c)
      case c if c <= 0xFF => sb.append(f"\\'$c%02x")
      case c => sb.append(s"\\u${c.toInt.toShort}?") // \uc1 fallback
    }
    sb.result()
  }

  private[graft] def build(text: String): Array[Byte] = {
    val chunks =
      if (text.isEmpty) Seq.empty[String] else text.grouped(PageSize).toSeq
    val sb = new StringBuilder(256 + text.length * 2)
    sb ++= "{\\rtf1\\ansi\\deff0\\uc1{\\fonttbl{\\f0\\froman Times New Roman;}}"
    sb ++= "{\\*\\generator graft synthetic writer;}"
    sb ++= "{\\info{\\title graft fixture}{\\author graft}}\n"
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      sb ++= s"\\pard\\f0 ${rtfEsc(chunk)}\\par\n"
      if (i % 3 == 0) {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(chunk.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(8)
          .getBytes("ISO-8859-1").map("%02x".format(_)).mkString
        val w = 100 + (i * 7) % 200
        val h = 80 + (i * 11) % 160
        sb ++= s"{\\pict\\pngblip\\picw$w\\pich$h $hex}\n"
      }
    }
    // a static 2x2 table: \cell ends each cell's run (ids nc, nc+1 /
    // nc+3, nc+4 — each \row's flush claims the empty ordinal between
    // rows), so the oracle replays cell-aware table text
    sb ++= "\\trowd\\cellx4000\\cellx8000 cell alpha\\cell cell beta\\cell\\row\n"
    sb ++= "\\trowd\\cellx4000\\cellx8000 cell gamma\\cell cell delta\\cell\\row\n"
    sb ++= "}"
    sb.result().getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
