package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic REAL-XLSX workbook for a text column — the fixture
  * generator behind the vs_parse_xlsx oracle: a structurally valid
  * OPC package ([Content_Types].xml, package rels, xl/workbook.xml,
  * workbook rels, two worksheets, xl/sharedStrings.xml) built with
  * java.util.zip, entry timestamps pinned for bit-determinism.
  *
  * Layout, all recomputable from the text in SQL:
  *  - sheet "Data", one row per
  *    [[graft.operators.DocParse.PageSize]]-char chunk i: `A(i+1)` =
  *    the chunk as a SHARED string (the table deduplicates repeated
  *    chunks, so the parser's index resolution is exercised for
  *    real), `B(i+1)` = the chunk's octet length as a number cell,
  *    and every third row `C(i+1)` = the chunk's 8-char md5 prefix
  *    as an INLINE string;
  *  - sheet "Meta": `A1` = inline string "chunks", `B1` = the chunk
  *    count as a number — a second sheet so the workbook walk and
  *    sheet ordinals are hash-checked, not just sheet1.
  * Empty text → a valid workbook whose Data sheet is empty. */
case class SynthXlsx(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthXlsx needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthXlsx.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthXlsx =
    copy(child = c)
}

object SynthXlsx {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthXlsx(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  private val PageSize = 200 // = DocParse.PageSize (no cyclic dep)
  private val NsMain = ParseXlsx.NsMain
  private val NsR = ParseXlsx.NsR
  private val NsRel = "http://schemas.openxmlformats.org/package/2006/relationships"

  private def xmlEsc(s: String): String = ParsePptx.xmlEsc(s)

  private[graft] def build(text: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val chunks =
      if (text.isEmpty) Seq.empty[String] else text.grouped(PageSize).toSeq
    val bo = new java.io.ByteArrayOutputStream(1024 + text.length * 2)
    val zip = new java.util.zip.ZipOutputStream(bo)
    def put(name: String, content: String): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(0L) // bit-deterministic package
      zip.putNextEntry(e)
      zip.write(content.getBytes(utf8))
      zip.closeEntry()
    }
    put("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        s"""<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        s"""<Default Extension="xml" ContentType="application/xml"/>""" +
        s"""<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        s"""<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        s"""<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        s"""<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
        "</Types>")
    put("_rels/.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<Relationships xmlns="$NsRel">""" +
        s"""<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>")
    put("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<workbook xmlns="$NsMain" xmlns:r="$NsR"><sheets>""" +
        s"""<sheet name="Data" sheetId="1" r:id="rId1"/>""" +
        s"""<sheet name="Meta" sheetId="2" r:id="rId2"/>""" +
        "</sheets></workbook>")
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<Relationships xmlns="$NsRel">""" +
        s"""<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        s"""<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>""" +
        s"""<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
        "</Relationships>")
    // shared strings deduplicate in first-occurrence order
    val sstIndex = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    chunks.foreach(c => sstIndex.getOrElseUpdate(c, sstIndex.size))
    val dataRows = chunks.zipWithIndex.map { case (chunk, i) =>
      val r = i + 1
      val md5p = java.security.MessageDigest.getInstance("MD5")
        .digest(chunk.getBytes(utf8)).map("%02x".format(_)).mkString.take(8)
      val cC =
        if (i % 3 != 0) ""
        else s"""<c r="C$r" t="inlineStr"><is><t>$md5p</t></is></c>"""
      s"""<row r="$r">""" +
        s"""<c r="A$r" t="s"><v>${sstIndex(chunk)}</v></c>""" +
        s"""<c r="B$r"><v>${chunk.getBytes(utf8).length}</v></c>""" +
        cC + "</row>"
    }.mkString
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<worksheet xmlns="$NsMain"><sheetData>$dataRows</sheetData></worksheet>""")
    put("xl/worksheets/sheet2.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<worksheet xmlns="$NsMain"><sheetData><row r="1">""" +
        s"""<c r="A1" t="inlineStr"><is><t>chunks</t></is></c>""" +
        s"""<c r="B1"><v>${chunks.length}</v></c>""" +
        "</row></sheetData></worksheet>")
    put("xl/sharedStrings.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<sst xmlns="$NsMain" count="${chunks.length}" uniqueCount="${sstIndex.size}">""" +
        sstIndex.keysIterator.map(c =>
          s"""<si><t xml:space="preserve">${xmlEsc(c)}</t></si>""").mkString +
        "</sst>")
    zip.close()
    bo.toByteArray
  }
}
