package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.w3c.dom.{Element, Node}

/** Parser for REAL PPTX payloads — the other half of the reference's
  * binary ingest (embed_pptx, vector_db.py:344-418: per slide, text
  * shapes → stripped text with the shape's EMU bbox, picture shapes →
  * the embedded image blob base64'd, content_id = the shape id).
  *
  * PPTX is OPC: a zip (java.util.zip) of XML parts (JDK DOM) — both
  * fully in scope, so unlike the PDF subset this reads the real format
  * end-to-end with no grammar carve-outs:
  *  - slide ORDER follows presentation.xml's sldIdLst through
  *    ppt/_rels/presentation.xml.rels (the declared order, exactly
  *    python-pptx's), falling back to slideN.xml numeric order when a
  *    package omits them;
  *  - a shape (`p:sp`) contributes its txBody text — runs concatenated
  *    within a paragraph, paragraphs joined with newlines (python-pptx
  *    shape.text), stripped, empty skipped — with content_id =
  *    `p:cNvPr/@id` and bbox = a:xfrm off/ext as
  *    [x, y, x+cx, y+cy] EMUs (a shape inheriting its placeholder
  *    position has no xfrm → zeros, documented);
  *  - a picture (`p:pic`) resolves `a:blip/@r:embed` through the
  *    slide's rels part to the media bytes, base64'd.
  *
  * All element matching is by LOCAL name (namespace-prefix agnostic —
  * real packages vary their prefixes). Output schema = [[ParseGft]]'s.
  */
case class ParsePptx(child: Expression)
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
      s"ParsePptx needs a binary payload, got ${child.dataType.catalogString}")

  private val TextBlock = UTF8String.fromString("text_block")
  private val Image = UTF8String.fromString("image")

  override def nullSafeEval(input: Any): Any = {
    import ParsePptx._
    val entries = unzip(input.asInstanceOf[Array[Byte]])
    val out = ArrayBuffer.empty[Any]
    slidesInOrder(entries).zipWithIndex.foreach { case (slidePath, slideIdx) =>
      val dom = parseXml(entries(slidePath), slidePath)
      val rels = slideRels(entries, slidePath)
      descendants(dom.getDocumentElement).foreach { el =>
        el.getLocalName match {
          case "sp" =>
            val id = cNvPrId(el)
            val text = shapeText(el)
            if (text.nonEmpty) {
              val (x0, y0, x1, y1) = bboxOf(el)
              out += InternalRow(slideIdx.toLong, TextBlock,
                UTF8String.fromString(id), UTF8String.fromString(text),
                x0, y0, x1, y1)
            }
          case "pic" =>
            val id = cNvPrId(el)
            firstAttr(el, "blip", "embed").foreach { rid =>
              val target = rels.getOrElse(rid,
                fail(s"picture references undeclared relationship $rid"))
              val media = resolve(slidePath, target)
              val bytes = entries.getOrElse(media,
                fail(s"missing media part $media"))
              val (x0, y0, x1, y1) = bboxOf(el)
              out += InternalRow(slideIdx.toLong, Image,
                UTF8String.fromString(id),
                UTF8String.fromString(
                  java.util.Base64.getEncoder.encodeToString(bytes)),
                x0, y0, x1, y1)
            }
          case _ => ()
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): ParsePptx =
    copy(child = c)
}

object ParsePptx {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParsePptx(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"PPTX parse: $what")

  /** The ONE escaper every synthetic OPC writer shares. Beyond the
    * mandatory &/</> entities: a carriage return must ride a character
    * reference (&#13;) or the XML parser's line-ending normalization
    * (XML 1.0 §2.11) silently turns it into \n and the round trip
    * drifts; characters illegal in XML 1.0 (< 0x20 except TAB/LF/CR)
    * cannot be represented at all and fail loudly. */
  private[expressions] def xmlEsc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '\r' => "&#13;"
      case c if c < ' ' && c != '\t' && c != '\n' =>
        throw new IllegalArgumentException(
          f"OPC write: character U+${c.toInt}%04X is illegal in XML 1.0")
      case c => c.toString
    }

  private[expressions] def unzip(bytes: Array[Byte],
      what: String = "PPTX"): Map[String, Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.Map.empty[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val bo = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n > 0) { bo.write(buf, 0, n); n = zin.read(buf) }
          out(e.getName) = bo.toByteArray
        }
        e = zin.getNextEntry
      }
    } catch {
      case ex: java.util.zip.ZipException => throw new IllegalArgumentException(
        s"$what parse: not a zip package: ${ex.getMessage}")
    } finally zin.close()
    if (out.isEmpty) throw new IllegalArgumentException(
      s"$what parse: empty package (not a $what?)")
    out.toMap
  }

  // DocumentBuilderFactory.newInstance walks the service loader —
  // creating one per XML part made the parser factory-bound, not
  // parse-bound (measured ~3x on a corpus sweep); a per-thread
  // builder with reset() amortizes it across every part of every
  // payload the task parses
  private val builderTl =
    ThreadLocal.withInitial[javax.xml.parsers.DocumentBuilder] { () =>
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(true)
      // OPC parts are self-contained: no DTDs, no external entities
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      f.setExpandEntityReferences(false)
      f.newDocumentBuilder()
    }

  private[expressions] def parseXml(bytes: Array[Byte], what: String): org.w3c.dom.Document =
    try {
      val b = builderTl.get()
      b.reset()
      b.parse(new java.io.ByteArrayInputStream(bytes))
    } catch {
      // neutral prefix: this parser is shared by every OPC container
      // (PPTX, DOCX) — the part name localizes the failure
      case e: org.xml.sax.SAXException => throw new IllegalArgumentException(
        s"OPC parse: bad XML in $what: ${e.getMessage}")
    }

  private[expressions] def descendants(el: Element): Seq[Element] = {
    val out = ArrayBuffer.empty[Element]
    def walk(n: Node): Unit = {
      val kids = n.getChildNodes
      (0 until kids.getLength).foreach { i =>
        kids.item(i) match {
          case e: Element => out += e; walk(e)
          case _ => ()
        }
      }
    }
    walk(el)
    out.toSeq
  }

  private[expressions] def firstLocal(el: Element, local: String): Option[Element] =
    descendants(el).find(_.getLocalName == local)

  private[expressions] def firstAttr(el: Element, local: String, attr: String): Option[String] =
    firstLocal(el, local).flatMap { e =>
      val attrs = e.getAttributes
      (0 until attrs.getLength).map(attrs.item)
        .find(a => a.getLocalName == attr || a.getNodeName.endsWith(s":$attr"))
        .map(_.getNodeValue)
    }

  private def cNvPrId(shape: Element): String =
    firstLocal(shape, "cNvPr").map(_.getAttribute("id"))
      .filter(_.nonEmpty).getOrElse(fail("shape without cNvPr id"))

  /** python-pptx shape.text: runs concatenated within each paragraph,
    * paragraphs joined with newlines, then stripped by the caller. */
  private def shapeText(sp: Element): String =
    firstLocal(sp, "txBody").map { tx =>
      descendants(tx).filter(_.getLocalName == "p").map { p =>
        descendants(p).filter(_.getLocalName == "t")
          .map(_.getTextContent).mkString
      }.mkString("\n").trim
    }.getOrElse("")

  private def bboxOf(shape: Element): (Double, Double, Double, Double) =
    firstLocal(shape, "xfrm") match {
      case None => (0.0, 0.0, 0.0, 0.0) // inherited placeholder geometry
      case Some(x) =>
        def lv(local: String, attr: String): Double =
          firstLocal(x, local).map(_.getAttribute(attr))
            .filter(_.nonEmpty).map(_.toDouble).getOrElse(0.0)
        val (ox, oy) = (lv("off", "x"), lv("off", "y"))
        (ox, oy, ox + lv("ext", "cx"), oy + lv("ext", "cy"))
    }

  /** Slide part names in the presentation's declared order
    * (sldIdLst → presentation rels), slideN-numeric fallback. */
  private[expressions] def slidesInOrder(
      entries: Map[String, Array[Byte]]): Seq[String] = {
    val declared =
      for {
        relsBytes <- entries.get("ppt/_rels/presentation.xml.rels")
        presBytes <- entries.get("ppt/presentation.xml")
      } yield {
        val rels = parseXml(relsBytes, "presentation rels")
        val byId = descendants(rels.getDocumentElement)
          .filter(_.getLocalName == "Relationship")
          .map(r => r.getAttribute("Id") -> resolve("ppt/presentation.xml",
            r.getAttribute("Target"))).toMap
        val pres = parseXml(presBytes, "presentation.xml")
        descendants(pres.getDocumentElement)
          .filter(_.getLocalName == "sldId")
          .flatMap { s =>
            val attrs = s.getAttributes
            (0 until attrs.getLength).map(attrs.item)
              .find(a => a.getLocalName == "id" &&
                Option(a.getNamespaceURI).exists(_.contains("relationships")))
              .map(_.getNodeValue)
          }
          .flatMap(byId.get)
          .filter(entries.contains)
      }
    declared match {
      // the declaration is authoritative when the parts exist — an
      // EMPTY sldIdLst is a legitimate zero-slide deck (parse = empty
      // array), not a cue to guess from file names
      case Some(order) => order
      case None =>
        val re = """ppt/slides/slide(\d+)\.xml""".r
        val named = entries.keys.collect { case n @ re(i) => (i.toInt, n) }.toSeq
        if (named.isEmpty) fail("no slides in package")
        named.sortBy(_._1).map(_._2)
    }
  }

  private[expressions] def slideRels(entries: Map[String, Array[Byte]],
      slidePath: String): Map[String, String] = {
    val name = slidePath.substring(slidePath.lastIndexOf('/') + 1)
    val relsPath = slidePath.substring(0, slidePath.lastIndexOf('/') + 1) +
      s"_rels/$name.rels"
    entries.get(relsPath).map { bytes =>
      descendants(parseXml(bytes, relsPath).getDocumentElement)
        .filter(_.getLocalName == "Relationship")
        .map(r => r.getAttribute("Id") -> r.getAttribute("Target")).toMap
    }.getOrElse(Map.empty)
  }

  /** Deterministic zip-entry writers shared by every synth container
    * (timestamps pinned to 0 so package bytes are bit-stable). */
  private[expressions] def putEntry(zip: java.util.zip.ZipOutputStream,
      name: String, bytes: Array[Byte]): Unit = {
    val e = new java.util.zip.ZipEntry(name)
    e.setTime(0L)
    zip.putNextEntry(e)
    zip.write(bytes)
    zip.closeEntry()
  }

  /** The STORED first entry OCF (EPUB 3 §3.3) and ODF (1.2 §3.3)
    * both require for their `mimetype`: no compression, so the magic
    * string sits at a sniffable offset; STORED needs size + crc up
    * front. */
  private[expressions] def putStoredMimetype(
      zip: java.util.zip.ZipOutputStream, mime: String): Unit = {
    val mt = mime.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val e = new java.util.zip.ZipEntry("mimetype")
    e.setTime(0L)
    e.setMethod(java.util.zip.ZipOutputStream.STORED)
    e.setSize(mt.length.toLong)
    e.setCompressedSize(mt.length.toLong)
    val crc = new java.util.zip.CRC32
    crc.update(mt)
    e.setCrc(crc.getValue)
    zip.putNextEntry(e)
    zip.write(mt)
    zip.closeEntry()
  }

  /** Strip exactly space/tab/CR/LF from both ends — the whitespace
    * set the SQL oracles strip with trim(pg, ' '||chr(9)||chr(10)||
    * chr(13)). Scala's String.trim strips every char <= U+0020
    * (form feed, vertical tab, NUL...), which a SQL trim cannot
    * express — parity demands one exact set on both sides. */
  private[expressions] def stripDocWs(s: String): String = {
    var a = 0
    var b = s.length
    def ws(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    while (a < b && ws(s.charAt(a))) a += 1
    while (b > a && ws(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** Resolve an OPC relative target against the part that declares
    * it ("../media/x" from "ppt/slides/slideN.xml" → "ppt/media/x"). */
  private[expressions] def resolve(fromPart: String, target: String): String = {
    if (target.startsWith("/")) return target.stripPrefix("/")
    val base = fromPart.split('/').dropRight(1)
    val segs = scala.collection.mutable.ArrayBuffer(base: _*)
    target.split('/').foreach {
      case ".." => if (segs.nonEmpty) segs.remove(segs.length - 1)
      case "." => ()
      case s => segs += s
    }
    segs.mkString("/")
  }
}
