package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic REAL-ODT payload for a text column — the fixture
  * generator behind the vs_parse_odt oracle: a structurally valid
  * OpenDocument Text package (STORED `mimetype` first entry per
  * ODF 1.2 §3.3, META-INF/manifest.xml, content.xml, image parts)
  * built with java.util.zip — entry timestamps pinned so the bytes
  * are bit-deterministic.
  *
  * Layout, all recomputable from the text in SQL: one `text:p` per
  * [[graft.operators.DocParse.PageSize]]-char chunk (content_id =
  * the paragraph ordinal), and every third paragraph is followed by
  * an anchored `draw:frame` (name = 1000 + i) whose image bytes are
  * the chunk's 8-char md5 prefix, svg:width/height = the GFT bbox
  * formulas in pt. Empty text → a valid zero-paragraph document. */
case class SynthOdt(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthOdt needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthOdt.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthOdt =
    copy(child = c)
}

object SynthOdt {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthOdt(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  private val PageSize = 200 // = DocParse.PageSize (no cyclic dep)
  private val Mime = "application/vnd.oasis.opendocument.text"

  private def xmlEsc(s: String): String = ParsePptx.xmlEsc(s)

  private[graft] def build(text: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val chunks =
      if (text.isEmpty) Seq.empty[String] else text.grouped(PageSize).toSeq
    val bo = new java.io.ByteArrayOutputStream(1024 + text.length * 2)
    val zip = new java.util.zip.ZipOutputStream(bo)
    def put(name: String, bytes: Array[Byte]): Unit =
      ParsePptx.putEntry(zip, name, bytes)
    ParsePptx.putStoredMimetype(zip, Mime) // ODF 1.2 §3.3: first, STORED
    val imgIdx = chunks.indices.filter(_ % 3 == 0)
    put("META-INF/manifest.xml",
      (s"""<?xml version="1.0" encoding="UTF-8"?>""" +
        s"""<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">""" +
        s"""<manifest:file-entry manifest:full-path="/" manifest:media-type="$Mime"/>""" +
        s"""<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>""" +
        imgIdx.map(i =>
          s"""<manifest:file-entry manifest:full-path="Pictures/img$i.png" manifest:media-type="image/png"/>""").mkString +
        "</manifest:manifest>").getBytes(utf8))
    val body = chunks.zipWithIndex.map { case (chunk, i) =>
      val img =
        if (i % 3 != 0) ""
        else {
          val w = 100 + (i * 7) % 200
          val h = 80 + (i * 11) % 160
          // anchored INSIDE the chunk's paragraph (as-char frames are
          // the common writer output), so paragraph ordinals stay 1:1
          // with chunks; the frame carries no text nodes
          s"""<draw:frame draw:name="${1000 + i}" svg:width="${w}pt" svg:height="${h}pt">""" +
            s"""<draw:image xlink:href="Pictures/img$i.png"/></draw:frame>"""
        }
      s"""<text:p>${xmlEsc(chunk)}$img</text:p>"""
    }.mkString
    // a static 2x2 table after the paragraphs: cell text:p's are
    // ordinary descendants, so ordinals nChunks..nChunks+3 pin that
    // table:table-cell content is captured (the DOCX discipline)
    val table = """<table:table table:name="T1">""" + Seq(
      Seq("cell alpha", "cell beta"), Seq("cell gamma", "cell delta"))
      .map(row => "<table:table-row>" + row.map(c =>
        s"""<table:table-cell><text:p>$c</text:p></table:table-cell>""").mkString +
        "</table:table-row>").mkString + "</table:table>"
    put("content.xml",
      (s"""<?xml version="1.0" encoding="UTF-8"?>""" +
        s"""<office:document-content xmlns:office="${ParseOdt.NsOffice}" """ +
        s"""xmlns:text="${ParseOdt.NsText}" xmlns:draw="${ParseOdt.NsDraw}" """ +
        s"""xmlns:xlink="${ParseOdt.NsXlink}" xmlns:svg="${ParseOdt.NsSvg}" """ +
        s"""xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" """ +
        s"""office:version="1.2"><office:body><office:text>$body$table""" +
        "</office:text></office:body></office:document-content>").getBytes(utf8))
    imgIdx.foreach { i =>
      val img = java.security.MessageDigest.getInstance("MD5")
        .digest(chunks(i).getBytes(utf8)).map("%02x".format(_)).mkString.take(8)
      put(s"Pictures/img$i.png", img.getBytes(utf8))
    }
    zip.close()
    bo.toByteArray
  }
}
