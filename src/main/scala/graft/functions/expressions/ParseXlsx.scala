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

/** Parser for REAL XLSX payloads — SpreadsheetML through the same OPC
  * machinery as [[ParsePptx]]/[[ParseDocx]] (zip via java.util.zip,
  * XML via the JDK DOM). Spreadsheets are a standing share of
  * enterprise RAG corpora; this is the fourth real container through
  * the format-agnostic ingest seam.
  *
  *  - sheets come from xl/workbook.xml in DECLARED order (the tab
  *    order a user sees), each resolved through the workbook rels to
  *    its worksheet part; page_num = the sheet ordinal (0-based).
  *  - each `c` cell emits one row: content_id = `SheetName!A1` (the
  *    name a formula would use), x0/y0 = 1-based column/row decoded
  *    from the cell reference, content_raw = the cell's TEXT —
  *    shared strings (`t="s"`, rich-text runs concatenated), inline
  *    strings (`t="inlineStr"`), formula string results (`t="str"`)
  *    are content_type `text_block`; everything else (numbers,
  *    booleans, errors) keeps the raw `v` text VERBATIM as
  *    content_type `number` — no float re-formatting, so the bytes
  *    in the file are the bytes in the row.
  *  - cells with no value are skipped; structural defects (missing
  *    workbook, unresolvable sheet rel, shared-string index out of
  *    range, a cell without a reference) fail LOUDLY like the other
  *    OPC parsers — an OPC package is machine-written, tag soup
  *    tolerance has no place here.
  *
  * Output schema = [[ParseGft]]'s (x1/y1 unused, 0). */
case class ParseXlsx(child: Expression)
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
      s"ParseXlsx needs a binary payload, got ${child.dataType.catalogString}")

  private val TextBlock = UTF8String.fromString("text_block")
  private val Number = UTF8String.fromString("number")

  override def nullSafeEval(input: Any): Any = {
    import ParseXlsx._
    import ParsePptx.{descendants, firstLocal, parseXml, resolve, slideRels, unzip}
    val entries = unzip(input.asInstanceOf[Array[Byte]], "XLSX")
    val wbPath = "xl/workbook.xml"
    val wb = parseXml(entries.getOrElse(wbPath,
      fail("package has no xl/workbook.xml (not an XLSX?)")), wbPath)
    val rels = slideRels(entries, wbPath)
    // shared strings: one si per index, rich-text runs concatenated.
    // `t` elements under `rPh` are PHONETIC readings (Excel furigana,
    // ECMA-376 §18.4.6) — guide text, not cell content; concatenating
    // them would double-ingest every Japanese cell
    def insidePhonetic(e: Element): Boolean = {
      var p: org.w3c.dom.Node = e.getParentNode
      while (p != null) {
        if (p.getLocalName == "rPh") return true
        p = p.getParentNode
      }
      false
    }
    val shared: IndexedSeq[String] =
      entries.get("xl/sharedStrings.xml").map { b =>
        val dom = parseXml(b, "xl/sharedStrings.xml")
        descendants(dom.getDocumentElement)
          .filter(e => e.getLocalName == "si" && e.getNamespaceURI == NsMain)
          .map(si => descendants(si).filter(e =>
            e.getLocalName == "t" && e.getNamespaceURI == NsMain &&
              !insidePhonetic(e))
            .map(_.getTextContent).mkString).toIndexedSeq
      }.getOrElse(IndexedSeq.empty)
    val out = ArrayBuffer.empty[Any]
    val sheets = descendants(wb.getDocumentElement).filter(e =>
      e.getLocalName == "sheet" && e.getNamespaceURI == NsMain)
    sheets.zipWithIndex.foreach { case (sheet, ord) =>
      val name = Option(sheet.getAttribute("name")).filter(_.nonEmpty)
        .getOrElse(fail(s"sheet $ord has no name"))
      val rid = Option(sheet.getAttributeNS(NsR, "id")).filter(_.nonEmpty)
        .getOrElse(fail(s"sheet '$name' has no r:id"))
      val target = rels.getOrElse(rid,
        fail(s"sheet '$name' references undeclared relationship $rid"))
      val partPath = resolve(wbPath, target)
      val part = entries.getOrElse(partPath,
        fail(s"missing worksheet part $partPath"))
      val dom = parseXml(part, partPath)
      descendants(dom.getDocumentElement).filter(e =>
        e.getLocalName == "c" && e.getNamespaceURI == NsMain).foreach { c =>
        val ref = Option(c.getAttribute("r")).filter(_.nonEmpty)
          .getOrElse(fail(s"cell without a reference on sheet '$name'"))
        val (col, row) = colRow(ref, name)
        val t = c.getAttribute("t")
        def vText: Option[String] =
          firstLocal(c, "v").map(_.getTextContent)
        val cell: Option[(UTF8String, String)] = t match {
          case "s" => vText.map { v =>
            val idx = v.trim.toInt
            if (idx < 0 || idx >= shared.length)
              fail(s"shared-string index $idx out of range " +
                s"(${shared.length} strings) at $name!$ref")
            (TextBlock, shared(idx))
          }
          case "inlineStr" => firstLocal(c, "is").map { is =>
            (TextBlock, descendants(is).filter(e =>
              e.getLocalName == "t" && e.getNamespaceURI == NsMain)
              .map(_.getTextContent).mkString)
          }
          case "str" => vText.map((TextBlock, _))
          case _ => vText.map((Number, _)) // n/b/e/d: raw v, verbatim
        }
        cell.foreach { case (tpe, raw) =>
          out += InternalRow(ord.toLong, tpe,
            UTF8String.fromString(s"$name!$ref"),
            UTF8String.fromString(raw),
            col.toDouble, row.toDouble, 0.0, 0.0)
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): ParseXlsx =
    copy(child = c)
}

object ParseXlsx {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParseXlsx(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  private[expressions] val NsMain =
    "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private[expressions] val NsR =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"XLSX parse: $what")

  /** "BA12" → (53, 12); 1-based column from the letter prefix. */
  private[graft] def colRow(ref: String, sheet: String): (Int, Int) = {
    var i = 0
    var col = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      col = col * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    if (i == 0 || i == ref.length)
      fail(s"malformed cell reference '$ref' on sheet '$sheet'")
    val row = ref.substring(i).toInt
    (col, row)
  }
}
