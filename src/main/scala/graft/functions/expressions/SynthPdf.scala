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
  *  - content-stream encodings cycle so the driver-gate query
  *    exercises every codec path, not just the grammar: page i%4==3
  *    is PNG-row-predicted under Flate, i%4==2 rides /LZWDecode
  *    (EarlyChange=1), other odd pages are plain /FlateDecode
  *    (java.util.zip.Deflater, deterministic), i%4==0 stays raw;
  *  - a deterministic ~quarter of DOCS (text-md5 first byte mod 4)
  *    ship RC4-128 standard-security encrypted (owner-locked, empty
  *    user password) — transparent to the parse output, so the
  *    oracle is unchanged while the gate exercises decryption;
  *  - every FIFTH page (i % 5 == 2) shows its chunk through a
  *    composite /Type0 /Identity-H font: the text rides a hex string
  *    of 2-byte CIDs (code = char + 0x0100) that [[ParsePdf]] must
  *    decode through the font's embedded /ToUnicode CMap (one
  *    bfrange) — or, for a deterministic ~third of DOCS (text-md5
  *    second byte mod 3), through an embedded TrueType program's own
  *    cmap (/DescendantFonts → /FontFile2, NO /ToUnicode — the
  *    [[TrueTypeCmap]] fallback), so the driver gate exercises BOTH
  *    CID paths with the SAME recovered text — the oracle is
  *    unchanged by encoding;
  *  - every third page embeds an image XObject: 8 ASCII bytes (the
  *    chunk's md5 prefix — base64 recomputable in SQL), placed by
  *    `q w 0 0 h x y cm /Im0 Do Q` with the GFT coordinate formulas;
  *  - a deterministic ~quarter of DOCS (text-md5 third byte mod 4)
  *    render their SIMPLE-font pages through a /Differences-encoded
  *    font — +1-shifted bytes as hex strings, unshifted by the
  *    font's 256-entry `uniXXXX` /Differences array — so the gate
  *    exercises the glyph-name decode path with the oracle unchanged;
  *  - object numbering is closed-form for the oracle: 1 catalog,
  *    2 pages, 3 simple font, 4 CID font, 5 its /ToUnicode CMap (or
  *    its descendant font), pages at 6…5+p, contents at 6+p…5+2p,
  *    images at 6+2p+⌊i/3⌋; the optional /Encrypt, the optional
  *    font descriptor + /FontFile2, and the optional /Differences
  *    font close the file.
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

  /** TIFF6/ISO 32000 LZW with the spec-default EarlyChange=1 timing
    * (the encoder widens at table size 2^w — see [[ParsePdf.lzwDecode]]
    * for the decoder's lagged threshold). Prefix table keyed by
    * (prefixCode << 8 | byte) so encode stays O(n). */
  private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 16)
    var bitBuf = 0L; var bitCnt = 0; var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xFF).toInt); bitCnt -= 8
      }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var next = 258
    put(256)
    if (data.nonEmpty) {
      var prefix = data(0) & 0xFF
      var i = 1
      while (i < data.length) {
        val k = (prefix << 8) | (data(i) & 0xFF)
        val e = dict.get(k)
        if (e != null) prefix = e.intValue()
        else {
          put(prefix)
          if (next < 4096) {
            dict.put(k, next); next += 1
            if (next >= (1 << width) && width < 12) width += 1
          }
          prefix = data(i) & 0xFF
        }
        i += 1
      }
      put(prefix)
      // the decoder builds one more table entry from this final code
      // and sizes its NEXT read from that table — when the final code
      // is exactly the one that carries the table to 2^w - 1 (the
      // 254th-code tail boundary), EOD must be written at the widened
      // width the decoder will read it with. Mid-stream emits don't
      // need this: the add-then-check above stays one entry AHEAD of
      // the decoder, but the final emit adds nothing, so the encoder
      // and decoder tables are EQUAL here and the threshold shifts by
      // one.
      if (next >= (1 << width) - 1 && width < 12) width += 1
    }
    put(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
  }

  // ── standard security handler, forward direction (ISO 32000 §7.6.3):
  // a deterministic share of synthetic docs ship RC4-128-encrypted
  // (owner-locked, EMPTY user password — the openable crawl shape) so
  // the driver's hash gate exercises the decryption path, not just the
  // specs. All derivations recompute from the text alone.
  private val PdfPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5b(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update); d.digest()
  }

  private def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = (0 until 256).toArray
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
    }
    var i = 0; j = 0
    data.map { b =>
      i = (i + 1) & 0xFF; j = (j + s(i)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      (b ^ s((s(i) + s(j)) & 0xFF)).toByte
    }
  }

  private val EncP = -44

  /** Does this text's synthetic PDF ship encrypted? Deterministic in
    * the text (md5 first byte mod 4), so the oracle's view of the
    * PARSED output is unchanged — encryption is transparent. */
  private[graft] def encrypts(text: String): Boolean =
    (md5b(text.getBytes("UTF-8"))(0) & 0xFF) % 4 == 0

  /** Does this text's synthetic PDF render its SIMPLE-font pages
    * through a /Differences-encoded font? Deterministic in the text
    * (md5 third byte mod 4 — independent of [[encrypts]] and
    * [[embedsFont]]) and transparent to the parse output: the page
    * bytes ship shifted by +1 (as hex strings — no literal-escape
    * interactions) and the font's 256-entry /Differences array maps
    * every byte back through `uniXXXX` names, so the decoded text (and
    * the hash oracle) is unchanged while the gate exercises the
    * glyph-name decode path. */
  private[graft] def shiftsEncoding(text: String): Boolean =
    (md5b(text.getBytes("UTF-8"))(2) & 0xFF) % 4 == 0

  /** The full-byte-range /Differences array for the +1 shift: code b
    * names the character (b − 1) mod 256. */
  private[graft] val ShiftDifferences: String =
    (0 until 256).map(b => f"/uni${(b + 255) % 256}%04X")
      .mkString("[ 0 ", " ", " ]")

  /** Does this text's synthetic PDF encode its CID pages through the
    * PREDEFINED /UniJIS-UCS2-H registry CMap — no /ToUnicode, no
    * descendant program, codes = the characters' UCS-2 values —
    * instead of Identity-H? Deterministic in the text (md5 FOURTH
    * byte mod 3, independent of the other shares) and transparent to
    * the parse output: the UTF-16BE decode recovers exactly the
    * chunk, so the oracle is unchanged while the gate exercises the
    * registry-CMap path CJK crawl PDFs need. */
  private[graft] def ucs2Encodes(text: String): Boolean =
    (md5b(text.getBytes("UTF-8"))(3) & 0xFF) % 3 == 0

  /** Which predefined registry CMap rides a [[ucs2Encodes]] document's
    * CID pages (md5 FIFTH byte mod 4 — a sub-share): 0 = UniJIS-UCS2-H
    * (UTF-16BE codes, the original share), 1 = 90ms-RKSJ-H (Shift-JIS
    * bytes), 2 = GBK-EUC-H (GBK bytes), 3 = ETen-B5-H (Big5 bytes).
    * ASCII text is single-byte-identical in all three legacy charsets,
    * so the parse output — and the oracle — stays share-transparent
    * while the gate drives every byte-oriented decode path; the
    * two-byte CJK proof lives in DocParseSpec's fixtures. */
  private[graft] def registryVariant(text: String): Int =
    (md5b(text.getBytes("UTF-8"))(4) & 0xFF) % 4

  private[graft] val RegistryEncodings: Seq[(String, String)] = Seq(
    "UniJIS-UCS2-H" -> "UTF-16BE", "90ms-RKSJ-H" -> "windows-31j",
    "GBK-EUC-H" -> "GBK", "ETen-B5-H" -> "Big5")

  /** Does this text's synthetic PDF carry its CID font in the
    * embedded-program form — /DescendantFonts → /FontFile2, NO
    * /ToUnicode — instead of the /ToUnicode CMap? Deterministic in the
    * text (md5 SECOND byte mod 3 — independent of [[encrypts]], so the
    * corpus covers all four combinations), and transparent to the
    * parse output: the font's cmap recovers the same characters the
    * bfrange did, so the oracle is unchanged while the driver gate
    * exercises [[TrueTypeCmap]]. */
  private[graft] def embedsFont(text: String): Boolean =
    (md5b(text.getBytes("UTF-8"))(1) & 0xFF) % 3 == 0

  /** The embedded TrueType program for the no-/ToUnicode share: a
    * minimal sfnt whose (3,1) format-4 cmap maps char c → glyph
    * c + 0x0100 in ONE idDelta segment — under /CIDToGIDMap /Identity
    * that glyph IS the 2-byte CID the content stream emits, so the
    * inverted cmap recovers exactly the bfrange's mapping. */
  private[graft] val CidFontProgram: Array[Byte] = {
    def u16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def u32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val sub = u16(4) ++ u16(32) ++ u16(0) ++ u16(4) ++
      u16(0) ++ u16(0) ++ u16(0) ++
      u16(0x00FF) ++ u16(0xFFFF) ++ u16(0) ++ // endCode[2], reservedPad
      u16(0x0000) ++ u16(0xFFFF) ++ // startCode[2]
      u16(0x0100) ++ u16(1) ++ // idDelta[2]
      u16(0) ++ u16(0) // idRangeOffset[2]
    val cmap = u16(0) ++ u16(1) ++ u16(3) ++ u16(1) ++ u32(12) ++ sub
    u32(0x00010000L) ++ u16(1) ++ u16(0) ++ u16(0) ++ u16(0) ++
      u32(0x636D6170L) ++ u32(0) ++ u32(28) ++ u32(cmap.length) ++ cmap
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

  private[graft] def build(text: String): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val chunks =
      if (text.isEmpty) Seq.empty[String]
      else text.grouped(PageSize).toSeq
    val p = chunks.length
    val nImages = (0 until p).count(_ % 3 == 0)
    // RC4-128 standard security for the deterministic doc share:
    // Algorithm 3 (/O from the fixed owner password), Algorithm 2
    // (file key, empty user password), Algorithm 5 (/U) — /ID = the
    // text's md5, so everything recomputes from the text.
    // ONE digest drives /ID and all four share predicates — the
    // standalone predicate functions recompute it for tests/docs, but
    // the per-row hot path hashes the text once
    val docId = md5b(text.getBytes("UTF-8"))
    val doEncrypt = (docId(0) & 0xFF) % 4 == 0
    val embed = (docId(1) & 0xFF) % 3 == 0
    val shifted = (docId(2) & 0xFF) % 4 == 0
    val ucs2 = (docId(3) & 0xFF) % 3 == 0
    // the round-16 metrics share: plain-F1 pages ride a /Widths font
    // (w(c) = 400 + (c % 16)·25 — arithmetic the SQL oracle replays
    // per character), so the driver gate hash-checks ParsePdf's
    // declared-metrics extent path; shifted docs keep their F3 route
    val widthsShare = (docId(4) & 0xFF) % 3 == 0 && !shifted
    // (file key, /O entry, /U entry) when this doc ships encrypted
    val encState: Option[(Array[Byte], Array[Byte], Array[Byte])] =
      if (!doEncrypt) None
      else {
        val ownerPad = ("graft-owner".getBytes(latin1) ++ PdfPad).take(32)
        var h = md5b(ownerPad)
        (0 until 50).foreach(_ => h = md5b(h.take(16)))
        val oKey = h.take(16)
        var o = rc4(oKey, PdfPad)
        (1 to 19).foreach(i => o = rc4(oKey.map(b => (b ^ i).toByte), o))
        val pLe = Array[Byte](EncP.toByte, (EncP >> 8).toByte,
          (EncP >> 16).toByte, (EncP >> 24).toByte)
        var fh = md5b(PdfPad, o, pLe, docId)
        (0 until 50).foreach(_ => fh = md5b(fh.take(16)))
        val key = fh.take(16)
        var t = md5b(PdfPad, docId)
        (0 until 20).foreach(i => t = rc4(key.map(b => (b ^ i).toByte), t))
        Some((key, o, t.take(16) ++ Array.fill[Byte](16)(0x61)))
      }
    def encBytes(num: Int, data: Array[Byte]): Array[Byte] = encState match {
      case None => data
      case Some((k, _, _)) =>
        val ext = Array[Byte](num.toByte, (num >> 8).toByte,
          (num >> 16).toByte, 0, 0)
        rc4(md5b(k, ext).take(math.min(k.length + 5, 16)), data)
    }
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
    // through the one-bfrange /ToUnicode CMap below — or, for the
    // embedsFont doc share, through the embedded TrueType program's
    // own cmap (/DescendantFonts → /FontFile2, NO /ToUnicode): the two
    // Identity-H shapes real writers emit for subset-embedded text
    val tail = 6 + 2 * p + nImages
    val encNum = tail
    val fdNum = tail + (if (encState.isDefined) 1 else 0)
    val diffNum = fdNum + (if (embed) 2 else 0)
    val widNum = diffNum + (if (shifted) 1 else 0)
    // the ucs2 share references NEITHER helper object — obj 5 still
    // ships (unreferenced) so object numbering is share-independent
    val (regName, regCharset) =
      if (ucs2) RegistryEncodings(registryVariant(text)) else ("", "")
    obj(4)(emit(
      if (ucs2)
        "<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID " +
          s"/Encoding /$regName >>\n"
      else "<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID " +
        "/Encoding /Identity-H " +
        (if (embed) "/DescendantFonts [5 0 R]" else "/ToUnicode 5 0 R") +
        " >>\n"))
    if (embed)
      obj(5)(emit("<< /Type /Font /Subtype /CIDFontType2 /BaseFont " +
        s"/Synth-CID /CIDToGIDMap /Identity /FontDescriptor $fdNum 0 R >>\n"))
    else {
      val cmap = "/CIDInit /ProcSet findresource begin\nbegincmap\n" +
        "1 beginbfrange\n<0100> <01FF> <0000>\nendbfrange\nendcmap\n" +
        "CMapName currentdict /CMap defineresource pop\nend\n"
      obj(5) {
        val cb = encBytes(5, cmap.getBytes(latin1))
        emit(s"<< /Length ${cb.length} >>\nstream\n")
        buf.write(cb)
        emit("\nendstream\n")
      }
    }
    chunks.zipWithIndex.foreach { case (_, i) =>
      val res = new StringBuilder(
        if (shifted) s"/Font << /F1 3 0 R /F2 4 0 R /F3 $diffNum 0 R >>"
        else if (widthsShare)
          s"/Font << /F1 3 0 R /F2 4 0 R /F4 $widNum 0 R >>"
        else "/Font << /F1 3 0 R /F2 4 0 R >>")
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
        if (i % 5 == 2 && ucs2) {
          // registry page: the codes are the chars themselves — as
          // UTF-16BE units (UCS2 variant) or as the legacy charset's
          // byte sequences (the byte-oriented variants)
          val codes =
            if (regCharset == "UTF-16BE")
              chunk.map { c =>
                require(!Character.isSurrogate(c),
                  "SynthPdf: non-BMP character cannot ride the UCS2 share")
                f"${c.toInt}%04X"
              }.mkString
            else {
              val cs = java.nio.charset.Charset.forName(regCharset)
              require(cs.newEncoder().canEncode(chunk),
                s"SynthPdf: text not encodable in $regCharset for the " +
                  s"$regName share")
              val bb = cs.encode(chunk)
              val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
              bytes.map(b => f"${b & 0xFF}%02X").mkString
            }
          s"/F2 12 Tf 1 0 0 1 $x $y Tm <$codes> Tj"
        }
        else if (i % 5 == 2) // CID page: hex string of offset 2-byte codes
          s"/F2 12 Tf 1 0 0 1 $x $y Tm <${
            chunk.map(c => f"${c.toInt + 0x0100}%04X").mkString}> Tj"
        else if (shifted) // /Differences page: +1-shifted hex bytes
          s"/F3 12 Tf 1 0 0 1 $x $y Tm <${
            chunk.map { c =>
              require(c.toInt <= 0xFF,
                s"SynthPdf: non-Latin-1 character U+${c.toInt.toHexString} " +
                  "cannot ride a byte-shifted simple-font string")
              f"${(c.toInt + 1) % 256}%02X"
            }.mkString}> Tj"
        else if (widthsShare)
          s"/F4 12 Tf 1 0 0 1 $x $y Tm (${esc(chunk)}) Tj"
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
      // unpredict path; pages at i%4==2 ride /LZWDecode (spec-default
      // EarlyChange=1), other odd pages stay plain Flate
      val (body, filter) =
        if (i % 4 == 3)
          (deflate(pngPredict(raw, PredictorColumns)),
            " /Filter /FlateDecode /DecodeParms << /Predictor 12" +
              s" /Colors 1 /BitsPerComponent 8 /Columns $PredictorColumns >>")
        else if (i % 4 == 2) (lzwEncode(raw), " /Filter /LZWDecode")
        else if (i % 2 == 1) (deflate(raw), " /Filter /FlateDecode")
        else (raw, "")
      val enc = encBytes(6 + p + i, body)
      obj(6 + p + i) {
        emit(s"<< /Length ${enc.length}$filter >>\nstream\n")
        buf.write(enc)
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
        val eimg = encBytes(6 + 2 * p + j, img)
        emit(s"<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
          s"/ColorSpace /DeviceGray /BitsPerComponent 8 " +
          s"/Length ${eimg.length} >>\nstream\n")
        buf.write(eimg)
        emit("\nendstream\n")
      }
    }
    def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString
    encState.foreach { case (_, o, u) =>
      obj(encNum)(emit(s"<< /Filter /Standard /V 2 /R 3 /Length 128 " +
        s"/P $EncP /O <${hex(o)}> /U <${hex(u)}> >>\n"))
    }
    if (embed) {
      obj(fdNum)(emit("<< /Type /FontDescriptor /FontName /Synth-CID " +
        s"/Flags 4 /FontFile2 ${fdNum + 1} 0 R >>\n"))
      obj(fdNum + 1) {
        val fb = encBytes(fdNum + 1, CidFontProgram)
        emit(s"<< /Length ${fb.length} >>\nstream\n")
        buf.write(fb)
        emit("\nendstream\n")
      }
    }
    if (shifted)
      obj(diffNum)(emit("<< /Type /Font /Subtype /Type1 /BaseFont " +
        "/Shifted /Encoding << /Type /Encoding /Differences " +
        s"$ShiftDifferences >> >>\n"))
    if (widthsShare)
      obj(widNum)(emit("<< /Type /Font /Subtype /Type1 /BaseFont " +
        "/Metric /FirstChar 0 /Widths [" +
        (0 until 256).map(c => 400 + (c % 16) * 25).mkString(" ") +
        "] >>\n"))
    val xrefAt = buf.size()
    val total = tail + (if (encState.isDefined) 1 else 0) +
      (if (embed) 2 else 0) + (if (shifted) 1 else 0) +
      (if (widthsShare) 1 else 0)
    emit(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.sortBy(_._1).foreach { case (_, off) =>
      emit(f"$off%010d 00000 n \n")
    }
    val encEntry = encState.map(_ =>
      s" /Encrypt $encNum 0 R /ID [<${hex(docId)}> <${hex(docId)}>]")
      .getOrElse("")
    emit(s"trailer\n<< /Size $total /Root 1 0 R$encEntry >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    buf.toByteArray
  }
}
