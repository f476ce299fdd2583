package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic REAL-DOCX payload for a text column — the fixture
  * generator behind the vs_parse_docx oracle: a structurally valid OPC
  * package ([Content_Types].xml, package rels, word/document.xml,
  * document rels, media parts) built with java.util.zip — entry
  * timestamps pinned so the bytes are bit-deterministic.
  *
  * Layout, all recomputable from the text in SQL: one `w:p` per
  * [[graft.operators.DocParse.PageSize]]-char chunk (content_id = the
  * paragraph ordinal), and every third paragraph carries an inline
  * picture (wp:docPr id = 1000 + i) whose media bytes are the chunk's
  * 8-char md5 prefix, with wp:extent = the GFT width/height formulas
  * × 9525 (px → EMU). Empty text → a valid zero-paragraph document. */
case class SynthDocx(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthDocx needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthDocx.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthDocx =
    copy(child = c)
}

object SynthDocx {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthDocx(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  private val PageSize = 200 // = DocParse.PageSize (no cyclic dep)
  private val NsW = ParseDocx.NsW
  private val NsR = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  private val NsWp = "http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing"
  private val NsA = "http://schemas.openxmlformats.org/drawingml/2006/main"
  private val NsPic = "http://schemas.openxmlformats.org/drawingml/2006/picture"
  private val NsRel = "http://schemas.openxmlformats.org/package/2006/relationships"

  private def xmlEsc(s: String): String = ParsePptx.xmlEsc(s)

  private[graft] def build(text: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val chunks =
      if (text.isEmpty) Seq.empty[String]
      else text.grouped(PageSize).toSeq
    val bo = new java.io.ByteArrayOutputStream(1024 + text.length * 2)
    val zip = new java.util.zip.ZipOutputStream(bo)
    def put(name: String, bytes: Array[Byte]): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(0L) // bit-deterministic package
      zip.putNextEntry(e)
      zip.write(bytes)
      zip.closeEntry()
    }
    put("[Content_Types].xml",
      (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        s"""<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        s"""<Default Extension="xml" ContentType="application/xml"/>""" +
        s"""<Default Extension="bin" ContentType="application/octet-stream"/>""" +
        s"""<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
        "</Types>").getBytes(utf8))
    put("_rels/.rels",
      (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<Relationships xmlns="$NsRel">""" +
        s"""<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
        "</Relationships>").getBytes(utf8))
    val paras = chunks.zipWithIndex.map { case (chunk, i) =>
      val pic =
        if (i % 3 != 0) ""
        else {
          val cx = (100 + (i * 7) % 200).toLong * 9525
          val cy = (80 + (i * 11) % 160).toLong * 9525
          s"""<w:r><w:drawing><wp:inline>""" +
            s"""<wp:extent cx="$cx" cy="$cy"/>""" +
            s"""<wp:docPr id="${1000 + i}" name="Picture ${i / 3 + 1}"/>""" +
            s"""<a:graphic><a:graphicData uri="$NsPic">""" +
            s"""<pic:pic><pic:nvPicPr><pic:cNvPr id="0" name=""/>""" +
            s"""<pic:cNvPicPr/></pic:nvPicPr>""" +
            s"""<pic:blipFill><a:blip r:embed="rId${i / 3 + 1}"/>""" +
            s"""<a:stretch><a:fillRect/></a:stretch></pic:blipFill>""" +
            s"""<pic:spPr/></pic:pic>""" +
            s"""</a:graphicData></a:graphic></wp:inline></w:drawing></w:r>"""
        }
      s"""<w:p><w:r><w:t xml:space="preserve">${xmlEsc(chunk)}</w:t></w:r>$pic</w:p>"""
    }.mkString
    // a static 2x2 table after the body paragraphs: its cell w:p's
    // are ordinary paragraph descendants, so the parse walk's
    // document-order ordinals (nChunks..nChunks+3) pin that TABLE
    // TEXT is captured — the oracle replays the four cells
    val table = "<w:tbl>" + Seq(
      Seq("cell alpha", "cell beta"), Seq("cell gamma", "cell delta"))
      .map(row => "<w:tr>" + row.map(c =>
        s"""<w:tc><w:p><w:r><w:t>$c</w:t></w:r></w:p></w:tc>""").mkString +
        "</w:tr>").mkString + "</w:tbl>"
    put("word/document.xml",
      (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<w:document xmlns:w="$NsW" xmlns:r="$NsR" xmlns:wp="$NsWp" """ +
        s"""xmlns:a="$NsA" xmlns:pic="$NsPic">""" +
        s"""<w:body>$paras$table</w:body></w:document>""").getBytes(utf8))
    val imgIdx = chunks.indices.filter(_ % 3 == 0)
    if (imgIdx.nonEmpty) {
      val imgRels = imgIdx.map { i =>
        s"""<Relationship Id="rId${i / 3 + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="media/image${i / 3 + 1}.bin"/>"""
      }.mkString
      put("word/_rels/document.xml.rels",
        (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          s"""<Relationships xmlns="$NsRel">$imgRels</Relationships>""").getBytes(utf8))
      imgIdx.foreach { i =>
        val img = java.security.MessageDigest.getInstance("MD5")
          .digest(chunks(i).getBytes(utf8)).map("%02x".format(_)).mkString.take(8)
        put(s"word/media/image${i / 3 + 1}.bin", img.getBytes(utf8))
      }
    }
    zip.close()
    bo.toByteArray
  }
}
