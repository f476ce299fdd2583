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

/** Parser for REAL DOCX payloads — WordprocessingML through the same
  * OPC machinery as [[ParsePptx]] (zip via java.util.zip, XML via the
  * JDK DOM; both fully in scope, no grammar carve-outs). DOCX is the
  * most common real-world document format after PDF in a crawl
  * pipeline, and the reference's binary-ingest seam is format-agnostic
  * by design — this is the third real container through it.
  *
  *  - `w:body` paragraphs (`w:p`, WordprocessingML namespace) in
  *    document order: runs' `w:t` text concatenated (python-docx
  *    paragraph.text), stripped, empty skipped; content_id = the
  *    paragraph's document-order ordinal (counting empty ones — DOCX
  *    paragraphs carry no ids, and the ordinal is the stable
  *    document-derived identity). Paragraphs inside tables are plain
  *    `w:p` descendants and count like any other.
  *  - an inline drawing (`w:drawing`) resolves `a:blip/@r:embed`
  *    through word/_rels/document.xml.rels to the media bytes,
  *    base64'd; content_id = `wp:docPr/@id`, bbox = (0, 0, cx, cy)
  *    from `wp:extent` EMUs (flow layout has no absolute position).
  *  - page_num is 0 throughout: pagination is a RENDER-time concept
  *    in WordprocessingML — a .docx has no pages until layout.
  *
  * Output schema = [[ParseGft]]'s. */
case class ParseDocx(child: Expression)
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
      s"ParseDocx needs a binary payload, got ${child.dataType.catalogString}")

  private val TextBlock = UTF8String.fromString("text_block")
  private val Image = UTF8String.fromString("image")

  override def nullSafeEval(input: Any): Any = {
    import ParseDocx._
    import ParsePptx.{descendants, firstAttr, firstLocal, parseXml, resolve, slideRels, unzip}
    val entries = unzip(input.asInstanceOf[Array[Byte]], "DOCX")
    val docPath = "word/document.xml"
    val docBytes = entries.getOrElse(docPath,
      fail("package has no word/document.xml (not a DOCX?)"))
    val dom = parseXml(docBytes, docPath)
    // Strict Open XML (purl.oclc.org namespaces) would otherwise parse
    // to a silently EMPTY document — loud, like every other scope edge
    val rootNs = dom.getDocumentElement.getNamespaceURI
    if (rootNs != NsW)
      fail(s"unsupported WordprocessingML namespace $rootNs " +
        "(Strict Open XML? only the transitional namespace is in scope)")
    val rels = slideRels(entries, docPath) // same _rels/<name>.rels shape
    val out = ArrayBuffer.empty[Any]
    var pIdx = 0
    descendants(dom.getDocumentElement).foreach { el =>
      (el.getLocalName, el.getNamespaceURI) match {
        case ("p", NsW) =>
          val text = paragraphText(el)
          if (text.nonEmpty)
            out += InternalRow(0L, TextBlock,
              UTF8String.fromString(pIdx.toString),
              UTF8String.fromString(text), 0.0, 0.0, 0.0, 0.0)
          pIdx += 1 // empty paragraphs still claim their ordinal
        case ("drawing", NsW) =>
          val id = firstLocal(el, "docPr").map(_.getAttribute("id"))
            .filter(_.nonEmpty).getOrElse(fail("drawing without docPr id"))
          def emu(attr: String): Double =
            firstLocal(el, "extent").map(_.getAttribute(attr))
              .filter(_.nonEmpty).map(_.toDouble).getOrElse(0.0)
          firstAttr(el, "blip", "embed").foreach { rid =>
            val target = rels.getOrElse(rid,
              fail(s"drawing references undeclared relationship $rid"))
            val media = resolve(docPath, target)
            val bytes = entries.getOrElse(media,
              fail(s"missing media part $media"))
            out += InternalRow(0L, Image, UTF8String.fromString(id),
              UTF8String.fromString(
                java.util.Base64.getEncoder.encodeToString(bytes)),
              0.0, 0.0, emu("cx"), emu("cy"))
          }
        case _ => ()
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): ParseDocx =
    copy(child = c)
}

object ParseDocx {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParseDocx(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  private[expressions] val NsW =
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"DOCX parse: $what")

  /** python-docx paragraph.text: the paragraph's OWN `w:t` runs
    * concatenated, `w:tab` → TAB and `w:br`/`w:cr` → newline, then
    * stripped. "Own" = the walk does NOT descend into nested `w:p`
    * elements (a text box's `w:txbxContent` paragraphs), which the
    * top-level loop visits and emits as their own rows — without the
    * stop, text-box content would be ingested twice. */
  private def paragraphText(p: Element): String = {
    val sb = new StringBuilder
    def walk(n: org.w3c.dom.Node): Unit = {
      val kids = n.getChildNodes
      (0 until kids.getLength).foreach { i =>
        kids.item(i) match {
          case e: Element if e.getNamespaceURI == NsW &&
              e.getLocalName == "p" => () // a nested paragraph owns its text
          case e: Element if e.getNamespaceURI == NsW =>
            e.getLocalName match {
              case "t" => sb.append(e.getTextContent)
              case "tab" => sb.append('\t')
              case "br" | "cr" => sb.append('\n')
              case _ => walk(e)
            }
          case e: Element => walk(e)
          case _ => ()
        }
      }
    }
    walk(p)
    ParsePptx.stripDocWs(sb.result())
  }
}
