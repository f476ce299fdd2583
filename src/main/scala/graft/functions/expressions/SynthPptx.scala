package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic REAL-PPTX payload for a text column — the fixture
  * generator behind the vs_parse_pptx oracle: a structurally valid OPC
  * package ([Content_Types].xml, presentation.xml + rels with the
  * declared sldIdLst order, DrawingML slides, slide rels, media parts)
  * built with java.util.zip — entry timestamps pinned so the bytes are
  * bit-deterministic.
  *
  * Layout, all recomputable from the text in SQL: one slide per
  * [[graft.operators.DocParse.PageSize]]-char chunk; slide i carries a
  * text shape (id 2) holding the chunk at EMU bbox
  * (914400 + 1000i, 457200 + 2000i) + (6096000, 1143000), and every
  * third slide a picture (id 3) whose media bytes are the chunk's
  * 8-char md5 prefix, at the GFT coordinate formulas × 9525 (px →
  * EMU). Empty text → a valid zero-slide deck. */
case class SynthPptx(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthPptx needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthPptx.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthPptx =
    copy(child = c)
}

object SynthPptx {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthPptx(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  private val PageSize = 200 // = DocParse.PageSize (no cyclic dep)
  private val NsA = "http://schemas.openxmlformats.org/drawingml/2006/main"
  private val NsR = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  private val NsP = "http://schemas.openxmlformats.org/presentationml/2006/main"
  private val NsRel = "http://schemas.openxmlformats.org/package/2006/relationships"

  private def xmlEsc(s: String): String = ParsePptx.xmlEsc(s)

  private[expressions] def build(text: String): Array[Byte] = {
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
    val slideOverrides = chunks.indices.map(i =>
      s"""<Override PartName="/ppt/slides/slide${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>""").mkString
    put("[Content_Types].xml",
      (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        s"""<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        s"""<Default Extension="xml" ContentType="application/xml"/>""" +
        s"""<Default Extension="bin" ContentType="application/octet-stream"/>""" +
        s"""<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>""" +
        slideOverrides + "</Types>").getBytes(utf8))
    put("_rels/.rels",
      (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<Relationships xmlns="$NsRel">""" +
        s"""<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>""" +
        "</Relationships>").getBytes(utf8))
    val sldIds = chunks.indices.map(i =>
      s"""<p:sldId id="${256 + i}" r:id="rId${i + 1}"/>""").mkString
    put("ppt/presentation.xml",
      (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<p:presentation xmlns:p="$NsP" xmlns:r="$NsR">""" +
        s"""<p:sldIdLst>$sldIds</p:sldIdLst></p:presentation>""").getBytes(utf8))
    val presRels = chunks.indices.map(i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide" Target="slides/slide${i + 1}.xml"/>""").mkString
    put("ppt/_rels/presentation.xml.rels",
      (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<Relationships xmlns="$NsRel">$presRels</Relationships>""").getBytes(utf8))
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val tx = 914400L + 1000L * i
      val ty = 457200L + 2000L * i
      val pic =
        if (i % 3 != 0) ""
        else {
          val px = ((i * 37) % 500).toLong * 9525
          val py = ((i * 53) % 700).toLong * 9525
          val pcx = (100 + (i * 7) % 200).toLong * 9525
          val pcy = (80 + (i * 11) % 160).toLong * 9525
          s"""<p:pic><p:nvPicPr><p:cNvPr id="3" name="Picture 2"/>""" +
            s"""<p:cNvPicPr/><p:nvPr/></p:nvPicPr>""" +
            s"""<p:blipFill><a:blip r:embed="rId1"/><a:stretch/></p:blipFill>""" +
            s"""<p:spPr><a:xfrm><a:off x="$px" y="$py"/>""" +
            s"""<a:ext cx="$pcx" cy="$pcy"/></a:xfrm></p:spPr></p:pic>"""
        }
      put(s"ppt/slides/slide${i + 1}.xml",
        (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          s"""<p:sld xmlns:a="$NsA" xmlns:r="$NsR" xmlns:p="$NsP">""" +
          s"""<p:cSld><p:spTree>""" +
          s"""<p:nvGrpSpPr><p:cNvPr id="1" name=""/><p:cNvGrpSpPr/><p:nvPr/></p:nvGrpSpPr><p:grpSpPr/>""" +
          s"""<p:sp><p:nvSpPr><p:cNvPr id="2" name="TextBox 1"/><p:cNvSpPr/><p:nvPr/></p:nvSpPr>""" +
          s"""<p:spPr><a:xfrm><a:off x="$tx" y="$ty"/><a:ext cx="6096000" cy="1143000"/></a:xfrm></p:spPr>""" +
          s"""<p:txBody><a:bodyPr/><a:p><a:r><a:t>${xmlEsc(chunk)}</a:t></a:r></a:p></p:txBody></p:sp>""" +
          pic +
          s"""</p:spTree></p:cSld></p:sld>""").getBytes(utf8))
      if (i % 3 == 0) {
        put(s"ppt/slides/_rels/slide${i + 1}.xml.rels",
          (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            s"""<Relationships xmlns="$NsRel">""" +
            s"""<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="../media/image${i / 3 + 1}.bin"/>""" +
            "</Relationships>").getBytes(utf8))
        val img = java.security.MessageDigest.getInstance("MD5")
          .digest(chunk.getBytes(utf8)).map("%02x".format(_)).mkString.take(8)
        put(s"ppt/media/image${i / 3 + 1}.bin", img.getBytes(utf8))
      }
    }
    zip.close()
    bo.toByteArray
  }
}
