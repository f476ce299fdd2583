package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parser for Markdown payloads — with [[ParseHtml]] this closes the
  * markup half of the ingest seam (README/docs corpora are Markdown,
  * crawl corpora are HTML). A line-based CommonMark-subset BLOCK
  * parser; like the HTML extractor it is TOLERANT — Markdown has no
  * invalid documents, every input parses to something.
  *
  * Blocks, each with a kind-ordinal content id:
  *  - ATX headings (`#`–`######`) → `heading` rows at `/hN[k]`;
  *    setext underlines (`===`/`---` under a paragraph) promote the
  *    open paragraph to h1/h2.
  *  - paragraphs (blank-line separated) → `text_block` at `/p[k]`,
  *    lines joined and whitespace collapsed.
  *  - fenced code (``` or ~~~, ≥3) → `code` rows at `/code[k]` with
  *    the body VERBATIM (code is content where whitespace matters);
  *    an unclosed fence runs to end-of-input.
  *  - list items (`-`/`*`/`+`/`N.`) → `list_item` at `/li[k]`,
  *    single-line items (lazy continuation is out of scope and
  *    documented — a continuation line reads as a paragraph).
  *  - blockquotes (`>` runs) → `quote` at `/bq[k]`.
  *  - thematic breaks (`---` with no open paragraph) are skipped.
  *
  * Inline handling inside text rows: images `![alt](url)` emit an
  * `image` row at `<block>/img[m]` (content_raw = the base64 payload
  * of a `data:` URI, else the url verbatim — fetch is out of scope;
  * Markdown carries no dimensions, bbox stays 0); links `[t](u)`
  * keep their text; `*` emphasis markers and backticks are stripped
  * (`_` is NOT — intraword underscores are identifiers far more
  * often than emphasis in a code-adjacent corpus). page_num is 0
  * throughout. Output schema = [[ParseGft]]'s. */
case class ParseMd(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(new StructType()
    .add("page_num", LongType)
    .add("content_type", StringType)
    .add("content_id", StringType)
    .add("content_raw", StringType)
    .add("x0", DoubleType).add("y0", DoubleType)
    .add("x1", DoubleType).add("y1", DoubleType))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ParseMd needs a binary payload, got ${child.dataType.catalogString}")

  // markdown has no in-band charset declaration: the sniff is BOM or
  // the UTF-8 default (CharsetSniff with no transport layer)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ParseMd.parse(
      CharsetSniff.decode(input.asInstanceOf[Array[Byte]], null)))

  override protected def withNewChildInternal(c: Expression): ParseMd =
    copy(child = c)
}

object ParseMd {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParseMd(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  private val Image = """!\[([^\]]*)\]\(([^)]*)\)""".r
  private val Link = """(?<!!)\[([^\]]*)\]\(([^)]*)\)""".r
  private val DataUri = "^data:[^,]*;base64,(.*)$".r
  private val ListItem = """^\s*(?:[-*+]|\d{1,9}\.)\s+(.*)$""".r

  private[graft] def parse(md: String): Array[Any] = {
    val out = ArrayBuffer.empty[Any]
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    def ordinal(kind: String): Int = {
      val k = counts.getOrElse(kind, 0) + 1
      counts.update(kind, k)
      k
    }
    def row(tpe: String, id: String, raw: String): Unit =
      out += InternalRow(0L, UTF8String.fromString(tpe),
        UTF8String.fromString(id), UTF8String.fromString(raw),
        0.0, 0.0, 0.0, 0.0)

    /** Emit images, strip markers, collapse ws; emit the text row
      * under `tpe`/`path` when nonempty. */
    def emitInline(tpe: String, path: String, text: String): Unit = {
      var imgOrd = 0
      val noImg = Image.replaceAllIn(text, m => {
        imgOrd += 1
        val url = m.group(2).trim
        val payload = url match {
          case DataUri(b64) => b64
          case other => other
        }
        if (payload.nonEmpty)
          row("image", s"$path/img[$imgOrd]", payload)
        scala.util.matching.Regex.quoteReplacement("")
      })
      val noLink = Link.replaceAllIn(noImg,
        m => scala.util.matching.Regex.quoteReplacement(m.group(1)))
      val clean = noLink.replace("*", "").replace("`", "")
        .replaceAll("\\s+", " ").trim
      if (clean.nonEmpty) row(tpe, path, clean)
    }

    val lines = md.split("\n", -1)
    val para = ArrayBuffer.empty[String]
    def flushPara(): Unit = if (para.nonEmpty) {
      emitInline("text_block", s"/p[${ordinal("p")}]", para.mkString(" "))
      para.clear()
    }
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val t = line.trim
      if (t.isEmpty) flushPara()
      else if (t.startsWith("```") || t.startsWith("~~~")) {
        flushPara()
        val fence = t.take(3)
        val body = ArrayBuffer.empty[String]
        i += 1
        while (i < lines.length && !lines(i).trim.startsWith(fence)) {
          body += lines(i)
          i += 1
        }
        row("code", s"/code[${ordinal("code")}]", body.mkString("\n"))
      } else if (t.startsWith("#")) {
        flushPara()
        val level = math.min(6, t.takeWhile(_ == '#').length)
        val body = t.dropWhile(_ == '#')
        if (body.isEmpty || body.startsWith(" ") || body.startsWith("\t"))
          emitInline("heading", s"/h$level[${ordinal(s"h$level")}]", body)
        else para += line // "#hashtag" is a paragraph, not a heading
      } else if (para.nonEmpty && t.nonEmpty && t.forall(_ == '=')) {
        // setext h1: promote the open paragraph
        emitInline("heading", s"/h1[${ordinal("h1")}]", para.mkString(" "))
        para.clear()
      } else if (para.nonEmpty && t.length >= 1 && t.forall(_ == '-')) {
        emitInline("heading", s"/h2[${ordinal("h2")}]", para.mkString(" "))
        para.clear()
      } else if (para.isEmpty && t.length >= 3 &&
          (t.forall(_ == '-') || t.forall(_ == '*') || t.forall(_ == '_'))) {
        () // thematic break
      } else if (t.startsWith("> ") || t == ">") {
        flushPara()
        val body = ArrayBuffer.empty[String]
        var more = true
        while (more && i < lines.length) {
          val q = lines(i).trim
          if (q == ">") { body += ""; i += 1 }
          else if (q.startsWith("> ")) { body += q.drop(2); i += 1 }
          else if (q.startsWith(">")) { body += q.drop(1); i += 1 }
          else more = false
        }
        i -= 1 // the outer loop advances once
        emitInline("quote", s"/bq[${ordinal("bq")}]", body.mkString(" "))
      } else t match {
        case ListItem(item) =>
          flushPara()
          emitInline("list_item", s"/li[${ordinal("li")}]", item)
        case _ => para += line
      }
      i += 1
    }
    flushPara()
    out.toArray
  }
}
