package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic REAL-EPUB payload for a text column — the fixture
  * generator behind the vs_parse_epub oracle: a structurally valid
  * EPUB (OCF zip per the EPUB 3 spec: a STORED `mimetype` first
  * entry, `META-INF/container.xml` naming the OPF rootfile, an OPF
  * package with manifest + spine, XHTML chapters, image parts) built
  * with java.util.zip — entry timestamps pinned so the bytes are
  * bit-deterministic.
  *
  * Layout, all recomputable from the text in SQL:
  *  - one [[graft.operators.DocParse.PageSize]]-char chunk per
  *    paragraph, TWO paragraphs per chapter (chunk i lands in chapter
  *    i/2 as its (i%2)+1-th `<p>`); chapter c's title is
  *    `Chapter c+1`;
  *  - every third chunk carries an `<img src="../images/img{i}.png">`
  *    whose part bytes are the chunk's 8-char md5 prefix, width/
  *    height from the GFT bbox formulas;
  *  - chapter entries and manifest items are written in REVERSE spine
  *    order, so a parser that walks zip order instead of the spine
  *    produces reversed page numbers — the spine IS the reading
  *    order and the oracle hash-checks that.
  * Empty text → a valid zero-chapter book (empty spine). */
case class SynthEpub(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthEpub needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthEpub.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthEpub =
    copy(child = c)
}

object SynthEpub {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthEpub(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  private val PageSize = 200 // = DocParse.PageSize (no cyclic dep)
  private val ParasPerChapter = 2

  private def xmlEsc(s: String): String = ParsePptx.xmlEsc(s)

  private[graft] def build(text: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val chunks =
      if (text.isEmpty) Seq.empty[String] else text.grouped(PageSize).toSeq
    val chapters = chunks.zipWithIndex.grouped(ParasPerChapter).toSeq
    val bo = new java.io.ByteArrayOutputStream(1024 + text.length * 2)
    val zip = new java.util.zip.ZipOutputStream(bo)
    def put(name: String, bytes: Array[Byte]): Unit =
      ParsePptx.putEntry(zip, name, bytes)
    // OCF 3.0 §3.3: mimetype FIRST and STORED, so byte 30 of the
    // file starts the ASCII string the magic sniffers read
    ParsePptx.putStoredMimetype(zip, "application/epub+zip")
    put("META-INF/container.xml",
      ("""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">""" +
        """<rootfiles><rootfile full-path="OEBPS/content.opf" """ +
        """media-type="application/oebps-package+xml"/></rootfiles>""" +
        "</container>").getBytes(utf8))
    // manifest + chapter entries in REVERSE order; spine in reading
    // order — the declaration order is not the reading order
    val manifest = (chapters.indices.reverse.map { c =>
      s"""<item id="chap${c + 1}" href="text/chap${c + 1}.xhtml" media-type="application/xhtml+xml"/>"""
    } ++ chunks.indices.filter(_ % 3 == 0).map { i =>
      s"""<item id="img$i" href="images/img$i.png" media-type="image/png"/>"""
    }).mkString
    val spine = chapters.indices.map { c =>
      s"""<itemref idref="chap${c + 1}"/>"""
    }.mkString
    put("OEBPS/content.opf",
      ("""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">""" +
        """<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">""" +
        """<dc:identifier id="uid">urn:graft:book</dc:identifier>""" +
        s"""<dc:title>${xmlEsc(text.take(40))}</dc:title>""" +
        """</metadata>""" +
        s"""<manifest>$manifest</manifest>""" +
        s"""<spine>$spine</spine></package>""").getBytes(utf8))
    chapters.zipWithIndex.reverse.foreach { case (paras, c) =>
      val body = paras.map { case (chunk, i) =>
        val img =
          if (i % 3 != 0) ""
          else {
            val w = 100 + (i * 7) % 200
            val h = 80 + (i * 11) % 160
            s"""<img src="../images/img$i.png" width="$w" height="$h" alt=""/>"""
          }
        s"<p>${xmlEsc(chunk)}$img</p>"
      }.mkString("\n")
      put(s"OEBPS/text/chap${c + 1}.xhtml",
        (s"""<?xml version="1.0" encoding="UTF-8"?>\n""" +
          s"""<html xmlns="http://www.w3.org/1999/xhtml"><head>""" +
          s"""<title>Chapter ${c + 1}</title></head>\n""" +
          s"""<body>\n$body\n</body></html>\n""").getBytes(utf8))
    }
    chunks.zipWithIndex.filter(_._2 % 3 == 0).foreach { case (chunk, i) =>
      val img = java.security.MessageDigest.getInstance("MD5")
        .digest(chunk.getBytes(utf8)).map("%02x".format(_)).mkString.take(8)
      put(s"OEBPS/images/img$i.png", img.getBytes(utf8))
    }
    zip.close()
    bo.toByteArray
  }
}
