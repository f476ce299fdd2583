package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parser for REAL EPUB payloads — the dominant container for book
  * corpora (Project Gutenberg-class sources ship EPUB first), and the
  * composition of machinery this library already carries: the OCF
  * container is a zip ([[ParsePptx.unzip]]), the package metadata is
  * XML (JDK DOM), and the content documents are XHTML read by the
  * TOLERANT extractor ([[ParseHtml.parse]] — book XHTML in the wild
  * is as soupy as crawl HTML).
  *
  * Container walk (EPUB 3 / OCF 3.0):
  *  - `META-INF/container.xml` names the OPF rootfile (`rootfile/
  *    @full-path`, first one wins per spec);
  *  - the OPF `<manifest>` maps item ids to hrefs (resolved against
  *    the OPF's own directory, the OPC rule [[ParsePptx.resolve]]
  *    implements); the `<spine>` itemref order IS the reading order —
  *    zip entry order and manifest order mean nothing;
  *  - each spine document parses with [[ParseHtml.parse]]; its rows
  *    get `page_num` = the spine ordinal (books DO have a page axis —
  *    the chapter sequence) and `content_id` = `href#dom-path`, the
  *    stable book-derived identity;
  *  - an `<img src>` that resolves (against the chapter's directory)
  *    to a package part is replaced by that part's bytes base64'd —
  *    the in-container analog of the data-URI payload; a src outside
  *    the package (remote image) stays verbatim, fetch is out of
  *    scope. `<head>`/`<nav>` rows keep [[ParseHtml]]'s boilerplate
  *    tag: chapter titles and EPUB 3 nav documents are chrome, not
  *    training text.
  *
  * The CONTAINER is strict (a broken zip/OPF is loud, like the OPC
  * parsers — EPUB is a packaging spec, not tag soup); the CONTENT is
  * tolerant (ParseHtml never throws). Output schema = [[ParseGft]]'s. */
case class ParseEpub(child: Expression)
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
      s"ParseEpub needs a binary payload, got ${child.dataType.catalogString}")

  private val Image = UTF8String.fromString("image")

  override def nullSafeEval(input: Any): Any = {
    import ParseEpub._
    import ParsePptx.{descendants, parseXml, resolve, unzip}
    val entries = unzip(input.asInstanceOf[Array[Byte]], "EPUB")
    val container = entries.getOrElse("META-INF/container.xml",
      fail("package has no META-INF/container.xml (not an EPUB?)"))
    val opfPath = descendants(
      parseXml(container, "META-INF/container.xml").getDocumentElement)
      .find(_.getLocalName == "rootfile")
      .map(_.getAttribute("full-path")).filter(_.nonEmpty)
      .getOrElse(fail("container.xml declares no rootfile full-path"))
    val opfBytes = entries.getOrElse(opfPath,
      fail(s"missing OPF rootfile $opfPath"))
    val opf = parseXml(opfBytes, opfPath).getDocumentElement
    val hrefById = descendants(opf).filter(_.getLocalName == "item")
      .map(it => it.getAttribute("id") -> it.getAttribute("href"))
      .filter { case (id, href) => id.nonEmpty && href.nonEmpty }.toMap
    val spine = descendants(opf).filter(_.getLocalName == "itemref")
      .map(_.getAttribute("idref")).filter(_.nonEmpty)
    val out = ArrayBuffer.empty[Any]
    spine.zipWithIndex.foreach { case (idref, ord) =>
      val href = hrefById.getOrElse(idref,
        fail(s"spine itemref $idref has no manifest item"))
      val docPath = resolve(opfPath, pctDecode(href))
      val docBytes = entries.getOrElse(docPath,
        fail(s"missing spine document $docPath"))
      // EPUB XHTML is UTF-8/UTF-16 by spec; the sniff honors a BOM or
      // an xml-decl encoding and defaults UTF-8 (no transport layer)
      ParseHtml.parse(CharsetSniff.decode(docBytes, null)).foreach { r =>
        val row = r.asInstanceOf[InternalRow]
        val ctype = row.getUTF8String(1)
        val raw = row.getUTF8String(3)
        // in-container image refs become their part's bytes; anything
        // that does not name a package part (data-URI payloads came
        // through ParseHtml already decoded, remote refs stay) passes
        val raw2 =
          if (ctype == Image)
            entries.get(resolve(docPath, pctDecode(raw.toString)))
              .map(b => UTF8String.fromString(
                java.util.Base64.getEncoder.encodeToString(b)))
              .getOrElse(raw)
          else raw
        out += InternalRow(ord.toLong, ctype,
          UTF8String.fromString(s"$href#${row.getUTF8String(2)}"),
          raw2, row.getDouble(4), row.getDouble(5),
          row.getDouble(6), row.getDouble(7))
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): ParseEpub =
    copy(child = c)
}

object ParseEpub {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParseEpub(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"EPUB parse: $what")

  /** Percent-decode an href/src before zip lookup — OCF/IRI rules
    * require reserved characters in entry names (a space in a
    * chapter filename) to travel percent-encoded in the OPF and in
    * content-document references. Pure %XX decoding over UTF-8
    * bytes; a malformed escape leaves the text as-is (tolerant — the
    * lookup then misses and the normal loud/verbatim path applies). */
  private[expressions] def pctDecode(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val bo = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        bo.write(Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16))
        i += 3
      } else {
        // surrogate pairs encode as one code point, not two halves
        val n = if (Character.isHighSurrogate(c) && i + 1 < s.length &&
          Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1
        val bytes = s.substring(i, i + n)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        bo.write(bytes, 0, bytes.length)
        i += n
      }
    }
    new String(bo.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}
