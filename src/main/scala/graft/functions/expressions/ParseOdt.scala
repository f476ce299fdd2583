package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.w3c.dom.Element

/** Parser for REAL ODT payloads — OpenDocument Text (ISO 26300, the
  * LibreOffice default), the fifth zip+XML container through the
  * shared machinery ([[ParsePptx.unzip]] + JDK DOM). Enterprise and
  * public-sector corpora carry ODT beside DOCX; the walk mirrors
  * [[ParseDocx]]'s semantics on the ODF vocabulary:
  *
  *  - `office:body/office:text` paragraphs (`text:p`) AND headings
  *    (`text:h`) in document order: text content with `text:s`
  *    expanded to its `text:c` spaces, `text:tab` → TAB and
  *    `text:line-break` → newline (odfpy's teletype semantics),
  *    stripped, empty skipped; content_id = the document-order
  *    ordinal counting empty ones (ODF paragraphs carry no ids);
  *  - a `draw:image` resolves `xlink:href` against the package
  *    (leading `./` stripped), bytes base64'd; content_id =
  *    `draw:frame/@draw:name` (the author-visible identity), bbox =
  *    (0, 0, svg:width, svg:height) with the unit suffix stripped —
  *    the declared number in its declared unit, no conversion;
  *  - `page_num` is 0 throughout: like WordprocessingML, ODF text
  *    has no pages until layout.
  *
  * The container is strict (loud on a broken zip / missing
  * content.xml / wrong namespace — machine-written packages), like
  * every OPC parser here. Output schema = [[ParseGft]]'s. */
case class ParseOdt(child: Expression)
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
      s"ParseOdt needs a binary payload, got ${child.dataType.catalogString}")

  private val TextBlock = UTF8String.fromString("text_block")
  private val Image = UTF8String.fromString("image")

  override def nullSafeEval(input: Any): Any = {
    import ParseOdt._
    import ParsePptx.{descendants, parseXml, unzip}
    val entries = unzip(input.asInstanceOf[Array[Byte]], "ODT")
    val content = entries.getOrElse("content.xml",
      fail("package has no content.xml (not an ODT?)"))
    val dom = parseXml(content, "content.xml")
    if (dom.getDocumentElement.getNamespaceURI != NsOffice)
      fail(s"unsupported root namespace ${dom.getDocumentElement.getNamespaceURI}")
    val out = ArrayBuffer.empty[Any]
    var pIdx = 0
    descendants(dom.getDocumentElement).foreach { el =>
      (el.getLocalName, el.getNamespaceURI) match {
        case ("p", NsText) | ("h", NsText) =>
          val text = paragraphText(el)
          if (text.nonEmpty)
            out += InternalRow(0L, TextBlock,
              UTF8String.fromString(pIdx.toString),
              UTF8String.fromString(text), 0.0, 0.0, 0.0, 0.0)
          pIdx += 1 // empty paragraphs still claim their ordinal
        case ("image", NsDraw) =>
          val href = el.getAttributeNS(NsXlink, "href")
          if (href.isEmpty) fail("draw:image without xlink:href")
          val part = href.stripPrefix("./")
          val bytes = entries.getOrElse(part,
            fail(s"missing image part $part"))
          val frame = Option(el.getParentNode).collect {
            case e: Element if e.getNamespaceURI == NsDraw &&
              e.getLocalName == "frame" => e
          }
          val name = frame.map(_.getAttributeNS(NsDraw, "name"))
            .filter(_.nonEmpty).getOrElse(fail("draw:image outside a named frame"))
          def dim(attr: String): Double =
            frame.map(_.getAttributeNS(NsSvg, attr)).filter(_.nonEmpty)
              .map(v => v.takeWhile(c => c.isDigit || c == '.' || c == '-'))
              .filter(_.nonEmpty)
              .map(_.toDouble).getOrElse(0.0)
          out += InternalRow(0L, Image, UTF8String.fromString(name),
            UTF8String.fromString(
              java.util.Base64.getEncoder.encodeToString(bytes)),
            0.0, 0.0, dim("width"), dim("height"))
        case _ => ()
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): ParseOdt =
    copy(child = c)
}

object ParseOdt {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParseOdt(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  private[expressions] val NsOffice =
    "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  private[expressions] val NsText =
    "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
  private[expressions] val NsDraw =
    "urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"
  private[expressions] val NsXlink = "http://www.w3.org/1999/xlink"
  private[expressions] val NsSvg =
    "urn:oasis:names:tc:opendocument:xmlns:svg-compatible:1.0"

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"ODT parse: $what")

  /** odfpy teletype semantics: the paragraph's own text nodes,
    * `text:s` → its text:c spaces (default 1), `text:tab` → TAB,
    * `text:line-break` → newline; nested `text:p` (a frame's text
    * box) owns its text — the document walk emits it separately. */
  private def paragraphText(p: Element): String = {
    val sb = new StringBuilder
    def walk(n: org.w3c.dom.Node): Unit = {
      val kids = n.getChildNodes
      (0 until kids.getLength).foreach { i =>
        kids.item(i) match {
          case e: Element if e.getNamespaceURI == NsText &&
              (e.getLocalName == "p" || e.getLocalName == "h") => ()
          case e: Element if e.getNamespaceURI == NsText =>
            e.getLocalName match {
              case "s" =>
                val c = e.getAttributeNS(NsText, "c")
                val k = if (c.isEmpty) 1 else c.toInt
                sb.append(" " * k)
              case "tab" => sb.append('\t')
              case "line-break" => sb.append('\n')
              case _ => walk(e)
            }
          case e: Element => walk(e)
          case t: org.w3c.dom.Text => sb.append(t.getData)
          case _ => ()
        }
      }
    }
    walk(p)
    ParsePptx.stripDocWs(sb.result())
  }
}
