package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic REAL-PDF payload for a text column — the fixture
  * generator behind the vs_parse_pdf oracle (the PDF counterpart of
  * [[graft.operators.DocParse.synthPayload]]'s GFT): the output is a
  * structurally valid PDF 1.4 file — catalog → pages tree → page
  * objects with Flate-or-raw content streams, image XObjects, a
  * correct byte-offset xref table and trailer — that [[ParsePdf]] (or
  * any PDF reader handling classic-xref files) consumes.
  *
  * Layout, all derived from the text so a SQL oracle can recompute the
  * parse output without touching the bytes:
  *  - [[graft.operators.DocParse.PageSize]]-char pages; page i shows
  *    its chunk as one BT…ET block at Tm origin
  *    (50 + 7i mod 100, 720 − 37i mod 600), font size 12;
  *  - EVERY SECOND page's content stream is /FlateDecode-compressed
  *    (java.util.zip.Deflater, deterministic), so the driver-gate
  *    query exercises the codec path, not just the grammar;
  *  - every FIFTH page (i % 5 == 2) shows its chunk through a
  *    composite /Type0 /Identity-H font: the text rides a hex string
  *    of 2-byte CIDs (code = char + 0x0100) that [[ParsePdf]] must
  *    decode through the font's embedded /ToUnicode CMap (one
  *    bfrange), so the driver gate exercises the CID path with the
  *    SAME recovered text — the oracle is unchanged by encoding;
  *  - every third page embeds an image XObject: 8 ASCII bytes (the
  *    chunk's md5 prefix — base64 recomputable in SQL), placed by
  *    `q w 0 0 h x y cm /Im0 Do Q` with the GFT coordinate formulas;
  *  - object numbering is closed-form for the oracle: 1 catalog,
  *    2 pages, 3 simple font, 4 CID font, 5 its /ToUnicode CMap,
  *    pages at 6…5+p, contents at 6+p…5+2p, images at 6+2p+⌊i/3⌋.
  * Empty text → a valid zero-page PDF (parse = empty array). */
case class SynthPdf(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthPdf needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthPdf.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthPdf =
    copy(child = c)
}

object SynthPdf {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthPdf(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  private val PageSize = 200 // = DocParse.PageSize (no cyclic dep)

  private def esc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '(' => "\\("
      case ')' => "\\)"
      case c =>
        require(c.toInt <= 0xFF,
          s"SynthPdf: non-Latin-1 character U+${c.toInt.toHexString} " +
            "cannot ride a simple-font literal string")
        c.toString
    }

  private val PredictorColumns = 40

  /** PNG-row-predict `data` (RFC 2083 §6, bpp = 1): pad with '\n' to
    * whole rows (inert whitespace in a content stream), then filter
    * each row, CYCLING Sub/Up/Average/Paeth/None so the decoder's
    * per-row dispatch is exercised by every predictor page. */
  private[graft] def pngPredict(data: Array[Byte],
      columns: Int): Array[Byte] = {
    val padded =
      if (data.length % columns == 0) data
      else data ++ Array.fill(columns - data.length % columns)('\n'.toByte)
    val rows = padded.length / columns
    val out = new Array[Byte](rows * (columns + 1))
    var r = 0
    while (r < rows) {
      val ft = Array(1, 2, 3, 4, 0)(r % 5)
      out(r * (columns + 1)) = ft.toByte
      var i = 0
      while (i < columns) {
        val x = padded(r * columns + i) & 0xFF
        val a = if (i >= 1) padded(r * columns + i - 1) & 0xFF else 0
        val b = if (r > 0) padded((r - 1) * columns + i) & 0xFF else 0
        val c = if (r > 0 && i >= 1) padded((r - 1) * columns + i - 1) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        out(r * (columns + 1) + 1 + i) = ((x - pred) & 0xFF).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private[expressions] def build(text: String): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val chunks =
      if (text.isEmpty) Seq.empty[String]
      else text.grouped(PageSize).toSeq
    val p = chunks.length
    val nImages = (0 until p).count(_ % 3 == 0)
    val buf = new java.io.ByteArrayOutputStream(1024 + text.length * 2)
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def emit(s: String): Unit = buf.write(s.getBytes(latin1))
    def obj(num: Int)(body: => Unit): Unit = {
      offsets += num -> buf.size()
      emit(s"$num 0 obj\n"); body; emit("endobj\n")
    }
    emit("%PDF-1.4\n")
    obj(1)(emit("<< /Type /Catalog /Pages 2 0 R >>\n"))
    val kids = (0 until p).map(i => s"${6 + i} 0 R").mkString(" ")
    obj(2)(emit(s"<< /Type /Pages /Kids [$kids] /Count $p >>\n"))
    obj(3)(emit("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"))
    // the composite font: 2-byte CIDs (code = char + 0x0100) resolved
    // through the one-bfrange /ToUnicode CMap below — the Identity-H
    // shape real writers emit for subset-embedded text
    obj(4)(emit("<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID " +
      "/Encoding /Identity-H /ToUnicode 5 0 R >>\n"))
    val cmap = "/CIDInit /ProcSet findresource begin\nbegincmap\n" +
      "1 beginbfrange\n<0100> <01FF> <0000>\nendbfrange\nendcmap\n" +
      "CMapName currentdict /CMap defineresource pop\nend\n"
    obj(5) {
      emit(s"<< /Length ${cmap.length} >>\nstream\n")
      emit(cmap)
      emit("\nendstream\n")
    }
    chunks.zipWithIndex.foreach { case (_, i) =>
      val res = new StringBuilder("/Font << /F1 3 0 R /F2 4 0 R >>")
      if (i % 3 == 0)
        res.append(s" /XObject << /Im0 ${6 + 2 * p + i / 3} 0 R >>")
      obj(6 + i)(emit(s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Resources << ${res} >> " +
        s"/Contents ${6 + p + i} 0 R >>\n"))
    }
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val x = 50 + (i * 7) % 100
      val y = 720 - (i * 37) % 600
      val shown =
        if (i % 5 == 2) // CID page: hex string of offset 2-byte codes
          s"/F2 12 Tf 1 0 0 1 $x $y Tm <${
            chunk.map(c => f"${c.toInt + 0x0100}%04X").mkString}> Tj"
        else s"/F1 12 Tf 1 0 0 1 $x $y Tm (${esc(chunk)}) Tj"
      val sb = new StringBuilder(s"BT $shown ET\n")
      if (i % 3 == 0) {
        val w = 100 + (i * 7) % 200
        val h = 80 + (i * 11) % 160
        val ix = (i * 37) % 500
        val iy = (i * 53) % 700
        sb.append(s"q $w 0 0 $h $ix $iy cm /Im0 Do Q\n")
      }
      val raw = sb.toString.getBytes(latin1)
      // every 4th page routes through a PNG row predictor UNDER the
      // Flate stage (the /DecodeParms shape real writers emit for xref
      // streams and rasters) so the parse gate exercises the full
      // unpredict path; other odd pages stay plain Flate
      val (body, filter) =
        if (i % 4 == 3)
          (deflate(pngPredict(raw, PredictorColumns)),
            " /Filter /FlateDecode /DecodeParms << /Predictor 12" +
              s" /Colors 1 /BitsPerComponent 8 /Columns $PredictorColumns >>")
        else if (i % 2 == 1) (deflate(raw), " /Filter /FlateDecode")
        else (raw, "")
      obj(6 + p + i) {
        emit(s"<< /Length ${body.length}$filter >>\nstream\n")
        buf.write(body)
        emit("\nendstream\n")
      }
    }
    (0 until p).filter(_ % 3 == 0).zipWithIndex.foreach { case (i, j) =>
      val img = java.security.MessageDigest.getInstance("MD5")
        .digest(chunks(i).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8).getBytes(latin1)
      val w = 100 + (i * 7) % 200
      val h = 80 + (i * 11) % 160
      obj(6 + 2 * p + j) {
        emit(s"<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
          s"/ColorSpace /DeviceGray /BitsPerComponent 8 " +
          s"/Length ${img.length} >>\nstream\n")
        buf.write(img)
        emit("\nendstream\n")
      }
    }
    val xrefAt = buf.size()
    val total = 6 + 2 * p + nImages
    emit(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.sortBy(_._1).foreach { case (_, off) =>
      emit(f"$off%010d 00000 n \n")
    }
    emit(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    buf.toByteArray
  }
}
