package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.ContentTypes
import graft.functions.expressions.ParsePdf
import graft.operators.{DocParse, GraftVectorDB}

/** The binary-ingest seam end-to-end: GFT payloads → ParseGft →
  * VectorRecord rows → store → search (the reference's
  * embed_pdf/embed_pptx flow, vector_db.py:247-418). */
class DocParseSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("parsed pages reassemble to the original document text") {
    val reassembled = DocParse.parse(spark, sf)
      .filter($"content_type" === "text_block")
      .groupBy($"doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct($"page_num", $"content_raw"))),
        r => r.getField("content_raw")), "").as("rt"))
    val docs = Tables.load(spark, sf, "documents").select($"doc_id", $"text")
    val mismatches = reassembled.join(docs, "doc_id")
      .filter($"rt" =!= $"text").count()
    assert(mismatches == 0)
  }

  test("image records carry bboxes read from the payload") {
    val img = DocParse.parse(spark, sf).filter($"content_type" === "image")
    assert(img.count() > 0)
    val bad = img.filter(
      $"x1" - $"x0" < 100 || $"x1" - $"x0" > 300 ||
      $"y1" - $"y0" < 80 || $"y1" - $"y0" > 240 ||
      $"page_num" % 3 =!= 0).count()
    assert(bad == 0, "bbox extents must match the synthesized figure geometry")
  }

  test("empty text yields an empty payload and zero records") {
    val rows = Seq(("", 0L), ("short page", 1L)).toDF("text", "doc_id")
    val parsed = rows.select($"doc_id",
      DocParse.synthPayload($"text").as("p"))
      .select($"doc_id", $"p",
        size(graft.functions.expressions.ParseGft($"p")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(parsed(0L) == ("", 0), "empty doc must parse to zero records")
    assert(parsed(1L)._2 == 2, "one page + its page-0 image record")
  }

  test("byte-true framing survives non-BMP characters") {
    // U+1F600 is 4 UTF-8 bytes / 2 UTF-16 code units: a code-unit
    // walker desyncs on it, a byte walker must round-trip it
    val text = "emoji 😀 page body"
    val parsed = Seq(text).toDF("text")
      .select(explode(graft.functions.expressions.ParseGft(
        DocParse.synthPayload($"text"))).as("r"))
      .filter($"r.content_type" === "text_block")
      .select($"r.content_raw").as[String].collect()
    assert(parsed.mkString("") == text)
  }

  test("GFT payloads ingest as store records and search end-to-end") {
    val dir = "target/vdb_parse"
    val f = new java.io.File(s"$dir/vector_store")
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete()
    }
    if (f.exists()) rm(f)

    val db = new GraftVectorDB(spark, dir)
    val payloads = Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 50)
      .select(concat(lit("bin/doc_"), $"doc_id", lit(".gft")).as("doc_name"),
        DocParse.synthPayload($"text").as("payload"))
    val n = db.ingestRecords(DocParse.records(payloads))
    assert(n > 0)
    assert(db.store.filter($"content_type" === ContentTypes.Image).count() > 0)

    val hits = db.search("fast query join table", topN = 5).collect()
    assert(hits.length == 5)
    assert(hits.forall(_.getAs[String]("content_type") === ContentTypes.TextChunk))

    val multi = db.searchMultimodal("fast query join table", topN = 3).collect()
    assert(multi.exists(_.getAs[String]("channel") == "image"),
      "parsed image records must be searchable through the image space")
  }

  // ───────── real formats: PDF ─────────

  private def parsePdfBytes(bytes: Array[Byte]) =
    Seq(1).toDF("i")
      .select(explode(graft.functions.expressions.ParsePdf(lit(bytes))).as("r"))
      .select($"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .collect()

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    val in = s.getBytes("ISO-8859-1")
    d.setInput(in); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** Assemble a one-page PDF whose content streams exercise the
    * grammar edges the synthesized corpus never hits: literal-string
    * escapes incl. octal, hex strings, TJ arrays, the ' operator,
    * MULTIPLE content streams for one page, and a Flate-compressed
    * stream — byte-built here, not via SynthPdf, so the parser is
    * tested against the format, not against its own writer twin. */
  private def edgePdf(): Array[Byte] = {
    val s1 = "BT 1 0 0 1 10 20 Tm (Hel\\)lo) Tj [(wo) (rld) (\\101)] TJ ET\n"
    val s2raw = "BT 1 0 0 1 30 40 Tm <48692121> Tj (nl)' ET\n" +
      "q 50 0 0 60 5 7 cm /ImX Do Q\n"
    val s2 = deflate(s2raw)
    val sb = new java.io.ByteArrayOutputStream()
    def emit(s: String): Unit = sb.write(s.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n")
    emit("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] " +
      "/Resources << /XObject << /ImX 6 0 R >> >> >> endobj\n")
    emit(s"4 0 obj << /Length ${s1.length} >>\nstream\n$s1\nendstream endobj\n")
    // ARRAY filter form — what real writers emit even for one filter;
    // missing it once meant silently returning the Flate bytes raw
    emit(s"5 0 obj << /Length ${s2.length} /Filter [/FlateDecode] >>\nstream\n")
    sb.write(s2)
    emit("\nendstream endobj\n")
    emit("6 0 obj << /Type /XObject /Subtype /Image /Width 2 /Height 2 " +
      "/Length 4 >>\nstream\nABCD\nendstream endobj\n")
    emit("trailer << /Size 7 /Root 1 0 R >>\n%%EOF\n")
    sb.toByteArray
  }

  test("PDF: escapes, hex strings, TJ, ', multi-stream pages, Flate — parsed exactly") {
    val rows = parsePdfBytes(edgePdf())
    val texts = rows.filter(_.getString(1) == "text_block")
      .map(r => (r.getString(2), r.getString(3),
        (r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))))
    // block 0: escapes + octal through Tj and a TJ array, one block
    assert(texts(0) == ("0", "Hel)loworldA", (10.0, 20.0, 10 + 0.5 * 12 * 12, 32.0)),
      s"got ${texts(0)}")
    // block 1 (from the FLATE stream): hex string then ' = newline+show
    assert(texts(1) == ("1", "Hi!!\nnl", (30.0, 40.0, 30 + 0.5 * 12 * 6, 52.0)),
      s"got ${texts(1)}")
    // the image: object number as id, raw bytes base64'd, CTM bbox
    val imgs = rows.filter(_.getString(1) == "image")
    assert(imgs.length == 1)
    val img = imgs(0)
    assert(img.getString(2) == "6")
    assert(img.getString(3) ==
      java.util.Base64.getEncoder.encodeToString("ABCD".getBytes("ISO-8859-1")))
    assert((img.getDouble(4), img.getDouble(5), img.getDouble(6), img.getDouble(7))
      == (5.0, 7.0, 55.0, 67.0))
  }

  test("PDF: an INDIRECT /Length falls through to the endstream scan, never truncates") {
    // most real writers emit `/Length N 0 R`; a backtracking direct
    // match (123 0 R read as length 12) silently truncated streams
    val s1 = "BT 1 0 0 1 10 20 Tm (indirect length body here) Tj ET\n"
    val pdf = ("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length 123 0 R >>\nstream\n$s1\nendstream endobj\n" +
      s"123 0 obj ${s1.length} endobj\n" +
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    val rows = parsePdfBytes(pdf)
    assert(rows.length == 1 &&
      rows(0).getString(3) == "indirect length body here", rows.toSeq.toString)
  }

  test("PDF: two catalogs (incremental update) resolve to the HIGHEST object number") {
    // an incremental update appends a NEW catalog under a new object
    // number; unordered Map iteration used to pick whichever /Catalog
    // it met first — the page tree parsed was nondeterministic
    val sOld = "BT 1 0 0 1 10 20 Tm (old tree) Tj ET\n"
    val sNew = "BT 1 0 0 1 10 20 Tm (new tree) Tj ET\n"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${sOld.length} >>\nstream\n$sOld\nendstream endobj\n" +
      "7 0 obj << /Type /Catalog /Pages 8 0 R >> endobj\n" +
      "8 0 obj << /Type /Pages /Kids [9 0 R] /Count 1 >> endobj\n" +
      "9 0 obj << /Type /Page /Parent 8 0 R /Contents 10 0 R >> endobj\n" +
      s"10 0 obj << /Length ${sNew.length} >>\nstream\n$sNew\nendstream endobj\n" +
      "trailer << /Size 11 /Root 7 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    val rows = parsePdfBytes(pdf)
    assert(rows.length == 1 && rows(0).getString(3) == "new tree",
      rows.toSeq.toString)
  }

  // ── independent spec-side encoders for the transport filters: the
  // decoder is tested against a second implementation of the public
  // algorithm, not against itself ──

  private def a85(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      (0 until 4).foreach(k =>
        v = (v << 8) | (if (k < n) data(i + k) & 0xFF else 0))
      if (n == 4 && v == 0) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var x = v
        (4 to 0 by -1).foreach { k => cs(k) = ((x % 85) + 33).toChar; x /= 85 }
        sb.appendAll(cs, 0, n + 1)
      }
      i += n
    }
    sb.append("~>").toString.getBytes("ISO-8859-1")
  }

  /** TIFF6/ISO 32000-conformant LZW encoder. EarlyChange=1 (default)
    * widens the code width as soon as the table reaches 2^w — one
    * code earlier than strictly needed (the PDFBox `size - 1 >=
    * 512 - earlyChange` encoder timing); EarlyChange=0 widens only
    * when the next code (2^w) would overflow the current width. */
  private def lzw(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val dict = scala.collection.mutable.Map[Seq[Byte], Int]()
    (0 until 256).foreach(i => dict(Seq(i.toByte)) = i)
    var next = 258
    var width = 9
    val out = new java.io.ByteArrayOutputStream
    var bitBuf = 0L; var bitCnt = 0
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xFF).toInt); bitCnt -= 8
      }
    }
    put(256)
    var w = Seq.empty[Byte]
    data.foreach { b =>
      val wb = w :+ b
      if (dict.contains(wb)) w = wb
      else {
        put(dict(w))
        dict(wb) = next; next += 1
        if (next >= (1 << width) + 1 - earlyChange && width < 12) width += 1
        w = Seq(b)
      }
    }
    if (w.nonEmpty) {
      put(dict(w))
      // tail boundary: the decoder adds an entry for this final code
      // before reading EOD — encoder and decoder tables are EQUAL here
      // (no add above), so the width check shifts by one entry
      if (next >= (1 << width) - earlyChange && width < 12) width += 1
    }
    put(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
  }

  private def rle(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    data.grouped(128).foreach { g => out.write(g.length - 1); out.write(g, 0, g.length) }
    out.write(128)
    out.toByteArray
  }

  private def hexEnc(data: Array[Byte]): Array[Byte] =
    (data.map("%02x".format(_)).mkString + ">").getBytes("ISO-8859-1")

  test("PDF: LZW, ASCII85∘Flate, and Hex∘RunLength filter chains decode exactly") {
    val s1 = "BT 1 0 0 1 10 20 Tm (lzw page text) Tj ET\n"
    val s2 = "BT 1 0 0 1 10 20 Tm (ascii85 flate page) Tj ET\n"
    val s3 = "BT 1 0 0 1 10 20 Tm (hex runlength page) Tj ET\n"
    val b1 = lzw(s1.getBytes("ISO-8859-1"))
    val b2 = a85(deflate(s2)) // decode order: ASCII85 THEN Flate
    val b3 = hexEnc(rle(s3.getBytes("ISO-8859-1")))
    val sb = new java.io.ByteArrayOutputStream()
    def emit(s: String): Unit = sb.write(s.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n")
    emit("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R 5 0 R] /Count 3 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    emit("4 0 obj << /Type /Page /Parent 2 0 R /Contents 7 0 R >> endobj\n")
    emit("5 0 obj << /Type /Page /Parent 2 0 R /Contents 8 0 R >> endobj\n")
    emit(s"6 0 obj << /Length ${b1.length} /Filter /LZWDecode >>\nstream\n")
    sb.write(b1); emit("\nendstream endobj\n")
    emit(s"7 0 obj << /Length ${b2.length} /Filter [/ASCII85Decode /FlateDecode] >>\nstream\n")
    sb.write(b2); emit("\nendstream endobj\n")
    emit(s"8 0 obj << /Length ${b3.length} /Filter [/ASCIIHexDecode /RunLengthDecode] >>\nstream\n")
    sb.write(b3); emit("\nendstream endobj\n")
    emit("trailer << /Size 9 /Root 1 0 R >>\n%%EOF\n")
    val rows = parsePdfBytes(sb.toByteArray)
    assert(rows.map(r => (r.getLong(0), r.getString(3))).toSeq == Seq(
      (0L, "lzw page text"), (1L, "ascii85 flate page"),
      (2L, "hex runlength page")), rows.toSeq.toString)
  }

  test("PDF: LZW survives a table-width growth round trip (9→12-bit codes)") {
    // enough distinct digrams to push the table past 511 and 1023 —
    // the EarlyChange width bumps must stay in sync with the encoder
    val text = (0 until 1500).map(i => s"w${i % 97}x${(i * 31) % 89}")
      .mkString(" ")
    val s = s"BT 1 0 0 1 10 20 Tm (${text}) Tj ET\n"
    val b = lzw(s.getBytes("ISO-8859-1"))
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    emit(s"4 0 obj << /Length ${b.length} /Filter /LZWDecode >>\nstream\n")
    pdf.write(b); emit("\nendstream endobj\n")
    emit("trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n")
    val rows = parsePdfBytes(pdf.toByteArray)
    assert(rows.length == 1 && rows(0).getString(3) == text)
  }

  test("PDF: LZW decoder matches the ecosystem width timing on a hand-scheduled stream") {
    // A bitstream assembled code-by-code with the width schedule real
    // encoders (PDFBox/pdf.js, EarlyChange=1) use — independent of the
    // `lzw` helper above, so the encoder and decoder can never drift
    // one-early in lockstep. 256 distinct literals: the encoder emits
    // codes #1..#254 (literals 0..253) at 9 bits (its next-free index
    // reaches 512 after adding entry #254), then literals 254 and 255
    // and the EOD at 10 bits. The decoder, one table entry behind,
    // must widen for reading code #255 when ITS table size is 511.
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    def put(code: Int, width: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xFF).toInt); bitCnt -= 8
      }
    }
    put(256, 9)                          // clear
    (0 until 254).foreach(put(_, 9))     // literals 0..253, 9-bit
    put(254, 10); put(255, 10)           // next-free hit 512 -> 10-bit
    put(257, 10)                         // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    val decoded = ParsePdf.lzwDecode(out.toByteArray)
    assert(decoded.toSeq == (0 until 256).map(_.toByte).toSeq)
  }

  test("PDF: LZW honors /DecodeParms /EarlyChange 0 across the same width growth") {
    val text = (0 until 1500).map(i => s"u${i % 101}v${(i * 37) % 83}")
      .mkString(" ")
    val s = s"BT 1 0 0 1 10 20 Tm (${text}) Tj ET\n"
    val b = lzw(s.getBytes("ISO-8859-1"), earlyChange = 0)
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    emit(s"4 0 obj << /Length ${b.length} /Filter /LZWDecode " +
      "/DecodeParms << /EarlyChange 0 >> >>\nstream\n")
    pdf.write(b); emit("\nendstream endobj\n")
    emit("trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n")
    val rows = parsePdfBytes(pdf.toByteArray)
    assert(rows.length == 1 && rows(0).getString(3) == text)
  }

  test("PDF: /ObjStm object streams expand (the PDF 1.5+ layout where the catalog lives packed)") {
    // catalog, pages node, page dict and a CID font all packed in ONE
    // Flate'd object stream — a linear top-level scan finds only the
    // container and the content stream, the modern-writer layout
    val cmap = "1 beginbfchar\n<0001> <0051>\nendbfchar\n"
    val packedObjs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Resources << /Font " +
        "<< /F2 6 0 R >> >> /Contents 4 0 R >>"),
      6 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /Packed-CID " +
        "/Encoding /Identity-H /ToUnicode 7 0 R >>"))
    val bodies = packedObjs.map(_._2)
    val offsets = bodies.scanLeft(0)(_ + _.length + 1).init
    val header = packedObjs.map(_._1).zip(offsets)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val payload = header + bodies.mkString("\n") + "\n"
    val objStm = deflate(payload.substring(0, payload.length))
    val s = "BT /F2 12 Tf 1 0 0 1 5 6 Tm <0001> Tj ET\n"
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.5\n")
    emit(s"5 0 obj << /Type /ObjStm /N ${packedObjs.length} " +
      s"/First ${header.length} /Length ${objStm.length} " +
      "/Filter /FlateDecode >>\nstream\n")
    pdf.write(objStm); emit("\nendstream endobj\n")
    emit(s"4 0 obj << /Length ${s.length} >>\nstream\n$s\nendstream endobj\n")
    emit(s"7 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\nendstream endobj\n")
    emit("trailer << /Size 8 /Root 1 0 R >>\n%%EOF\n")
    val rows = parsePdfBytes(pdf.toByteArray)
    assert(rows.length == 1 && rows(0).getString(3) == "Q", rows.toSeq.toString)
  }

  // ── standard security handler fixtures (independent encryptor) ──
  private val pdfPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)
  private def md5b(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update); d.digest()
  }
  private def rc4t(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
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
  private def padPw(pw: String): Array[Byte] =
    (pw.getBytes("ISO-8859-1") ++ pdfPad).take(32)
  /** Algorithm 3: the /O entry from owner+user passwords. */
  private def oEntry(owner: String, user: String, keyLen: Int, r: Int): Array[Byte] = {
    var h = md5b(padPw(owner))
    if (r >= 3) (0 until 50).foreach(_ => h = md5b(h))
    val k = h.take(keyLen)
    var o = rc4t(k, padPw(user))
    if (r >= 3) (1 to 19).foreach(i => o = rc4t(k.map(b => (b ^ i).toByte), o))
    o
  }
  /** Algorithm 2: the file key from the user password. `metaPlain`
    * enables step f — /R >= 4 with /EncryptMetadata false appends
    * 0xFFFFFFFF to the MD5 input after the /ID bytes. */
  private def fileKey(user: String, o: Array[Byte], p: Int, id: Array[Byte],
      keyLen: Int, r: Int, metaPlain: Boolean = false): Array[Byte] = {
    val pLe = Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte, (p >> 24).toByte)
    var h =
      if (r >= 4 && metaPlain)
        md5b(padPw(user), o, pLe, id, Array[Byte](-1, -1, -1, -1))
      else md5b(padPw(user), o, pLe, id)
    if (r >= 3) (0 until 50).foreach(_ => h = md5b(h.take(keyLen)))
    h.take(keyLen)
  }
  /** Algorithm 5 (R≥3): the /U entry. */
  private def uEntry(key: Array[Byte], id: Array[Byte]): Array[Byte] = {
    var t = md5b(pdfPad, id)
    (0 until 20).foreach(i => t = rc4t(key.map(b => (b ^ i).toByte), t))
    t.take(16) ++ Array.fill[Byte](16)(0x61)
  }
  private def objKeyT(key: Array[Byte], num: Int, aes: Boolean): Array[Byte] = {
    val ext = Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte, 0, 0)
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
    md5b(key, ext, salt).take(math.min(key.length + 5, 16))
  }
  private def aesEnc(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val iv = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(data)
  }
  /** Assemble a 2-page encrypted PDF (page 1 raw-stream, page 2 Flate)
    * whose CMap-less simple text must survive decryption + inflate. */
  private def encryptedPdf(encDict: Array[Byte] => String,
      encStream: (Array[Byte], Int) => Array[Byte]): Array[Byte] = {
    val id = Array.tabulate[Byte](16)(i => (i * 31 + 7).toByte)
    val encD = encDict(id) // FIRST: derives the file key encStream uses
    val s1 = "BT 1 0 0 1 10 20 Tm (rc4 secured page one) Tj ET\n"
    val s2 = "BT 1 0 0 1 10 20 Tm (flate under crypt two) Tj ET\n"
    val b1 = encStream(s1.getBytes("ISO-8859-1"), 5)
    val b2 = encStream(deflate(s2), 6)
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n")
    emit("4 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    emit(s"5 0 obj << /Length ${b1.length} >>\nstream\n")
    pdf.write(b1); emit("\nendstream endobj\n")
    emit(s"6 0 obj << /Length ${b2.length} /Filter /FlateDecode >>\nstream\n")
    pdf.write(b2); emit("\nendstream endobj\n")
    emit(s"7 0 obj $encD endobj\n")
    val idHex = id.map("%02X".format(_)).mkString
    emit(s"trailer << /Size 8 /Root 1 0 R /Encrypt 7 0 R " +
      s"/ID [<$idHex> <$idHex>] >>\n%%EOF\n")
    pdf.toByteArray
  }
  private def hexStr(b: Array[Byte]): String =
    "<" + b.map("%02X".format(_)).mkString + ">"

  test("PDF: RC4-128 standard security (V2 R3, empty user password) decrypts both raw and Flate streams") {
    val p = -44
    var key: Array[Byte] = null
    val pdf = encryptedPdf(
      id => {
        val o = oEntry("hunter2owner", "", 16, 3)
        key = fileKey("", o, p, id, 16, 3)
        val u = uEntry(key, id)
        s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $p " +
          s"/O ${hexStr(o)} /U ${hexStr(u)} >>"
      },
      (data, num) => rc4t(objKeyT(key, num, aes = false), data))
    val rows = parsePdfBytes(pdf)
    assert(rows.map(r => (r.getLong(0), r.getString(3))).toSeq == Seq(
      (0L, "rc4 secured page one"), (1L, "flate under crypt two")),
      rows.toSeq.toString)
  }

  test("PDF: RC4-40 standard security (V1 R2) decrypts; wrong user password fails loudly") {
    val p = -1
    var key: Array[Byte] = null
    val pdf = encryptedPdf(
      id => {
        val o = oEntry("ownerpw", "", 5, 2)
        key = fileKey("", o, p, id, 5, 2)
        val u = rc4t(key, pdfPad) // Algorithm 4
        s"<< /Filter /Standard /V 1 /R 2 /P $p /O ${hexStr(o)} /U ${hexStr(u)} >>"
      },
      (data, num) => rc4t(objKeyT(key, num, aes = false), data))
    val rows = parsePdfBytes(pdf)
    assert(rows.map(_.getString(3)).toSeq ==
      Seq("rc4 secured page one", "flate under crypt two"))
    // a NON-empty user password: /U no longer matches the empty-pw
    // derivation — the reader must refuse, not emit garbage
    var key2: Array[Byte] = null
    val locked = encryptedPdf(
      id => {
        val o = oEntry("ownerpw", "realuserpw", 5, 2)
        key2 = fileKey("realuserpw", o, p, id, 5, 2)
        val u = rc4t(key2, pdfPad)
        s"<< /Filter /Standard /V 1 /R 2 /P $p /O ${hexStr(o)} /U ${hexStr(u)} >>"
      },
      (data, num) => rc4t(objKeyT(key2, num, aes = false), data))
    val e = intercept[Exception](parsePdfBytes(locked))
    assert((Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage)
      .contains("non-empty user password"))
  }

  test("PDF: AES-128 standard security (V4 /AESV2, empty user password) decrypts") {
    val p = -3904
    var key: Array[Byte] = null
    val pdf = encryptedPdf(
      id => {
        val o = oEntry("aesowner", "", 16, 4)
        key = fileKey("", o, p, id, 16, 4)
        val u = uEntry(key, id)
        s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P $p " +
          "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> " +
          "/StmF /StdCF /StrF /StdCF " +
          s"/O ${hexStr(o)} /U ${hexStr(u)} >>"
      },
      (data, num) => aesEnc(objKeyT(key, num, aes = true), data))
    val rows = parsePdfBytes(pdf)
    assert(rows.map(_.getString(3)).toSeq ==
      Seq("rc4 secured page one", "flate under crypt two"),
      rows.toSeq.toString)
  }

  test("PDF: R4 /EncryptMetadata false changes the file key (Algorithm 2 step f)") {
    // the independent encryptor appends 0xFFFFFFFF after /ID; a
    // decoder that honors /EncryptMetadata only for stream exemption
    // derives the wrong key and misreports a password lock
    val p = -3904
    var key: Array[Byte] = null
    val pdf = encryptedPdf(
      id => {
        val o = oEntry("metaowner", "", 16, 4)
        key = fileKey("", o, p, id, 16, 4, metaPlain = true)
        val u = uEntry(key, id)
        s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P $p " +
          "/EncryptMetadata false " +
          "/CF << /StdCF << /CFM /V2 /AuthEvent /DocOpen >> >> " +
          "/StmF /StdCF /StrF /StdCF " +
          s"/O ${hexStr(o)} /U ${hexStr(u)} >>"
      },
      (data, num) => rc4t(objKeyT(key, num, aes = false), data))
    val rows = parsePdfBytes(pdf)
    assert(rows.map(_.getString(3)).toSeq ==
      Seq("rc4 secured page one", "flate under crypt two"),
      rows.toSeq.toString)
  }

  test("PDF: V4 dict with the crypt-filter /Length FIRST still derives a 128-bit key") {
    // Acrobat-shaped ordering: /CF << /StdCF << ... /Length 16 >> >>
    // (key length in BYTES) precedes the top-level /Length 128 (bits).
    // A flat first-match regex would read 16 bits → a 5-byte key and a
    // spurious wrong-password refusal; the top-level view must skip it.
    val p = -3904
    var key: Array[Byte] = null
    val pdf = encryptedPdf(
      id => {
        val o = oEntry("aesowner", "", 16, 4)
        key = fileKey("", o, p, id, 16, 4)
        val u = uEntry(key, id)
        s"<< /Filter /Standard /V 4 /R 4 " +
          "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> " +
          s"/StmF /StdCF /StrF /StdCF /Length 128 /P $p " +
          s"/O ${hexStr(o)} /U ${hexStr(u)} >>"
      },
      (data, num) => aesEnc(objKeyT(key, num, aes = true), data))
    val rows = parsePdfBytes(pdf)
    assert(rows.map(_.getString(3)).toSeq ==
      Seq("rc4 secured page one", "flate under crypt two"),
      rows.toSeq.toString)
  }

  test("PDF: topLevelView masks subdict keys and string contents, keeps top-level entries") {
    val view = ParsePdf.topLevelView(
      "7 0 obj << /O (ab\\)/U (x)c) /U <4142> " +
        "/CF << /StdCF << /Length 16 >> >> /Length 128 >> endobj")
    assert(view.contains("/Length 128"), view)
    assert(!view.contains("16"), view)
    // the only /U the view exposes is the real top-level key, not the
    // '/U' byte run inside the /O literal string
    assert("/U".r.findAllMatchIn(view).length == 1, view)
    assert(!view.contains("endobj") && !view.contains("7 0 obj"), view)
    // value-opening delimiters survive so the value parse can anchor
    assert(view.contains("/O (") && view.contains("/U <"), view)
  }

  test("PDF: an unencrypted /Type /XRef stream inside an encrypted document is left alone") {
    // §7.5.8.2: cross-reference streams are never encrypted. Feeding
    // one through the AES path would fail the IV+whole-blocks check
    // (15/16 chance) and abort the whole parse.
    val p = -3904
    var key: Array[Byte] = null
    val base = encryptedPdf(
      id => {
        val o = oEntry("aesowner", "", 16, 4)
        key = fileKey("", o, p, id, 16, 4)
        val u = uEntry(key, id)
        s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P $p " +
          "/CF << /StdCF << /CFM /AESV2 >> >> /StmF /StdCF " +
          s"/O ${hexStr(o)} /U ${hexStr(u)} >>"
      },
      (data, num) => aesEnc(objKeyT(key, num, aes = true), data))
    // splice a plaintext xref stream object ahead of the trailer
    val xref = "xref!" // 5 bytes: not IV + whole AES blocks
    val obj = s"8 0 obj << /Type /XRef /Size 9 /W [1 2 1] " +
      s"/Length ${xref.length} >>\nstream\n$xref\nendstream endobj\n"
    val at = new String(base, "ISO-8859-1").indexOf("trailer")
    val pdf = base.take(at) ++ obj.getBytes("ISO-8859-1") ++ base.drop(at)
    val rows = parsePdfBytes(pdf)
    assert(rows.map(_.getString(3)).toSeq ==
      Seq("rc4 secured page one", "flate under crypt two"),
      rows.toSeq.toString)
  }

  // ── AES-256 (/V 5) forward encryptor — ISO 32000-2 algorithms 2.B/8/9/10 ──
  private def shaT(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(s"SHA-$bits")
    parts.foreach(d.update); d.digest()
  }
  /** Algorithm 2.B in its GENERAL form (password + optional udata) —
    * the decoder only ever runs the empty-password user form, so the
    * fixtures exercise it from an independent implementation. */
  private def hash2b(pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = shaT(256, pwd, salt, udata)
    var round = 0
    var e: Array[Byte] = Array.emptyByteArray
    while (round < 64 || (e.last & 0xFF) > round - 32) {
      val one = pwd ++ k ++ udata
      val k1 = new Array[Byte](one.length * 64)
      (0 until 64).foreach(i => System.arraycopy(one, 0, k1, i * one.length, one.length))
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      e = c.doFinal(k1)
      val mod = e.take(16).map(_ & 0xFF).sum % 3
      k = shaT(if (mod == 0) 256 else if (mod == 1) 384 else 512, e)
      round += 1
    }
    k.take(32)
  }
  private def aesCbcZeroIvEnc(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    c.doFinal(data)
  }
  /** /U /UE /O /OE /Perms for a chosen 32-byte file key (algorithms
    * 8, 9, 10 forward; r = 5 legacy SHA-256 or 6 hardened). */
  private def v5Entries(fileKey: Array[Byte], userPw: String, ownerPw: String,
      p: Int, r: Int): (Array[Byte], Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    def kdf(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte]) =
      if (r == 5) shaT(256, pwd, salt, udata) else hash2b(pwd, salt, udata)
    val upw = userPw.getBytes("UTF-8")
    val opw = ownerPw.getBytes("UTF-8")
    val uVs = Array.tabulate[Byte](8)(i => (i * 13 + 5).toByte)
    val uKs = Array.tabulate[Byte](8)(i => (i * 29 + 11).toByte)
    val uEnt = kdf(upw, uVs, Array.emptyByteArray) ++ uVs ++ uKs
    val ueEnt = aesCbcZeroIvEnc(kdf(upw, uKs, Array.emptyByteArray), fileKey)
    val oVs = Array.tabulate[Byte](8)(i => (i * 7 + 3).toByte)
    val oKs = Array.tabulate[Byte](8)(i => (i * 23 + 17).toByte)
    val oEnt = kdf(opw, oVs, uEnt) ++ oVs ++ oKs
    val oeEnt = aesCbcZeroIvEnc(kdf(opw, oKs, uEnt), fileKey)
    val permsPlain = Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte,
      (p >> 24).toByte, -1, -1, -1, -1, 'T', 'a', 'd', 'b',
      0x21, 0x42, 0x63, 0x7E)
    val ec = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    ec.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
    (uEnt, ueEnt, oEnt, oeEnt, ec.doFinal(permsPlain))
  }
  private def v5Dict(fileKey: Array[Byte], userPw: String, p: Int, r: Int): String = {
    val (uE, ueE, oE, oeE, pmE) = v5Entries(fileKey, userPw, "aes256owner", p, r)
    s"<< /Filter /Standard /V 5 /R $r /Length 256 /P $p " +
      "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen >> >> " +
      "/StmF /StdCF /StrF /StdCF " +
      s"/O ${hexStr(oE)} /OE ${hexStr(oeE)} /U ${hexStr(uE)} " +
      s"/UE ${hexStr(ueE)} /Perms ${hexStr(pmE)} >>"
  }

  test("PDF: AES-256 standard security (V5 R6 hardened hash, empty user password) decrypts; /Perms round-trips") {
    val key = Array.tabulate[Byte](32)(i => (i * 47 + 9).toByte)
    val pdf = encryptedPdf(_ => v5Dict(key, "", -4, 6),
      (data, _) => aesEnc(key, data)) // /V 5: file key directly, no per-object MD5
    val rows = parsePdfBytes(pdf)
    assert(rows.map(_.getString(3)).toSeq ==
      Seq("rc4 secured page one", "flate under crypt two"),
      rows.toSeq.toString)
  }

  test("PDF: AES-256 legacy R5 (single SHA-256 KDF) decrypts") {
    val key = Array.tabulate[Byte](32)(i => (i * 31 + 21).toByte)
    val pdf = encryptedPdf(_ => v5Dict(key, "", -44, 5),
      (data, _) => aesEnc(key, data))
    assert(parsePdfBytes(pdf).map(_.getString(3)).toSeq ==
      Seq("rc4 secured page one", "flate under crypt two"))
  }

  test("PDF: AES-256 R6 with a non-empty user password refuses loudly; tampered /P fails the /Perms check") {
    val key = Array.tabulate[Byte](32)(i => (i * 11 + 6).toByte)
    val locked = encryptedPdf(_ => v5Dict(key, "realuserpw", -4, 6),
      (data, _) => aesEnc(key, data))
    val e = intercept[Exception](parsePdfBytes(locked))
    assert((Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage)
      .contains("non-empty user password"))
    // /P in the dict disagreeing with the signed /Perms plaintext must
    // fail loudly (tampering / wrong-key detector), not decode anyway
    val (uE, ueE, oE, oeE, pmE) = v5Entries(key, "", "aes256owner", -4, 6)
    val tamperDict = s"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -8 " +
      "/CF << /StdCF << /CFM /AESV3 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O ${hexStr(oE)} /OE ${hexStr(oeE)} /U ${hexStr(uE)} " +
      s"/UE ${hexStr(ueE)} /Perms ${hexStr(pmE)} >>"
    val tampered = encryptedPdf(_ => tamperDict, (data, _) => aesEnc(key, data))
    val e2 = intercept[Exception](parsePdfBytes(tampered))
    assert((Option(e2.getCause).map(_.getMessage).getOrElse("") + e2.getMessage)
      .contains("/Perms"), e2.toString)
  }

  test("PDF: a SUPPLIED non-empty user password opens RC4 and AES-256 documents; a wrong one stays loud") {
    def parseWithPw(bytes: Array[Byte], pw: String) =
      Seq(1).toDF("i")
        .select(explode(graft.functions.expressions.ParsePdf(lit(bytes), pw)).as("r"))
        .select($"r.content_raw").collect().map(_.getString(0)).toSeq
    val bothPages = Seq("rc4 secured page one", "flate under crypt two")
    def loudWrong(bytes: Array[Byte], pw: String): Unit = {
      val e = intercept[Exception](parseWithPw(bytes, pw))
      assert((Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage)
        .contains("does not match /U"), e.toString)
    }
    // RC4-40 V1 R2, user password "realuserpw"
    val p = -1
    var key2: Array[Byte] = null
    val r2 = encryptedPdf(
      id => {
        val o = oEntry("ownerpw", "realuserpw", 5, 2)
        key2 = fileKey("realuserpw", o, p, id, 5, 2)
        s"<< /Filter /Standard /V 1 /R 2 /P $p /O ${hexStr(o)} " +
          s"/U ${hexStr(rc4t(key2, pdfPad))} >>"
      },
      (data, num) => rc4t(objKeyT(key2, num, aes = false), data))
    assert(parseWithPw(r2, "realuserpw") == bothPages)
    loudWrong(r2, "wrongpw")
    // RC4-128 V2 R3 (the 20x xor-keyed /U form over the PAD constant)
    var key3: Array[Byte] = null
    val r3 = encryptedPdf(
      id => {
        val o = oEntry("ownerpw", "realuserpw", 16, 3)
        key3 = fileKey("realuserpw", o, -44, id, 16, 3)
        s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44 " +
          s"/O ${hexStr(o)} /U ${hexStr(uEntry(key3, id))} >>"
      },
      (data, num) => rc4t(objKeyT(key3, num, aes = false), data))
    assert(parseWithPw(r3, "realuserpw") == bothPages)
    // AES-128 V4 /AESV2 with a user password
    var key4: Array[Byte] = null
    val r4 = encryptedPdf(
      id => {
        val o = oEntry("aesowner", "realuserpw", 16, 4)
        key4 = fileKey("realuserpw", o, -3904, id, 16, 4)
        s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -3904 " +
          "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> " +
          "/StmF /StdCF /StrF /StdCF " +
          s"/O ${hexStr(o)} /U ${hexStr(uEntry(key4, id))} >>"
      },
      (data, num) => aesEnc(objKeyT(key4, num, aes = true), data))
    assert(parseWithPw(r4, "realuserpw") == bothPages)
    // AES-256: R6 hardened hash and R5 legacy, password in the KDF
    val k6 = Array.tabulate[Byte](32)(i => (i * 19 + 4).toByte)
    val v6 = encryptedPdf(_ => v5Dict(k6, "realuserpw", -4, 6),
      (data, _) => aesEnc(k6, data))
    assert(parseWithPw(v6, "realuserpw") == bothPages)
    loudWrong(v6, "wrongpw")
    val k5 = Array.tabulate[Byte](32)(i => (i * 37 + 2).toByte)
    val v5 = encryptedPdf(_ => v5Dict(k5, "realuserpw", -44, 5),
      (data, _) => aesEnc(k5, data))
    assert(parseWithPw(v5, "realuserpw") == bothPages)
    // an EMPTY-password document still opens when a password is
    // (unnecessarily) supplied — the empty candidate is tried first
    var keyE: Array[Byte] = null
    val open = encryptedPdf(
      id => {
        val o = oEntry("ownerpw", "", 16, 3)
        keyE = fileKey("", o, -44, id, 16, 3)
        s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44 " +
          s"/O ${hexStr(o)} /U ${hexStr(uEntry(keyE, id))} >>"
      },
      (data, num) => rc4t(objKeyT(keyE, num, aes = false), data))
    assert(parseWithPw(open, "whatever") == bothPages)
  }

  test("PDF: indirect /Font tables and Pages-inherited /Resources resolve (CID decodes, no mojibake)") {
    // real writers share one font table via '/Resources 8 0 R' on the
    // PAGES node (inherited) with '/Font 9 0 R' indirect — a reader
    // that only sees inline dicts would silently decode the CID hex
    // string as Latin-1 mojibake through the keep-prior-mode recovery
    val cmap = "1 beginbfchar\n<0001> <0048>\nendbfchar\n" +
      "1 beginbfrange\n<0010> <0012> <0061>\nendbfrange\n"
    val s = "BT /F2 12 Tf 1 0 0 1 5 6 Tm <0001001000110012> Tj ET\n"
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/Resources 8 0 R >> endobj\n")
    // the page declares NO /Resources: inheritance must find 8 0 R
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    emit(s"4 0 obj << /Length ${s.length} >>\nstream\n$s\nendstream endobj\n")
    emit("6 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake-CID " +
      "/Encoding /Identity-H /ToUnicode 7 0 R >> endobj\n")
    emit(s"7 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\nendstream endobj\n")
    emit("8 0 obj << /Font 9 0 R >> endobj\n") // indirect resources...
    emit("9 0 obj << /F2 6 0 R >> endobj\n")   // ...and indirect font table
    emit("trailer << /Size 10 /Root 1 0 R >>\n%%EOF\n")
    val rows = parsePdfBytes(pdf.toByteArray)
    assert(rows.length == 1 && rows(0).getString(3) == "Habc",
      rows.toSeq.toString)
  }

  test("PDF: inline image (BI..ID..EI) binary payload is skipped, not tokenized as text") {
    // the raster bytes deliberately contain '(', unbalanced ')', 'BT',
    // high bytes, and an EI NOT preceded by whitespace — none of which
    // may reach the text extractor or break tokenization
    val nasty = Array[Byte]('(', 'B', 'T', ')', ')', 0xFF.toByte, 0x00,
      '<', '\\', 'E', 'I', '(', 0x80.toByte)
    val content = new java.io.ByteArrayOutputStream()
    content.write("BT 1 0 0 1 10 20 Tm (before raster) Tj ET\n".getBytes("ISO-8859-1"))
    content.write("q 4 0 0 2 30 40 cm\nBI /W 4 /H 2 /BPC 8 /CS /G ID ".getBytes("ISO-8859-1"))
    content.write(nasty)
    content.write("\nEI\nQ\n".getBytes("ISO-8859-1"))
    content.write("BT 1 0 0 1 10 60 Tm (after raster) Tj ET\n".getBytes("ISO-8859-1"))
    val s = content.toByteArray
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    emit(s"4 0 obj << /Length ${s.length} >>\nstream\n")
    pdf.write(s)
    emit("\nendstream endobj\n")
    emit("trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n")
    val rows = parsePdfBytes(pdf.toByteArray)
    assert(rows.map(_.getString(3)).toSeq == Seq("before raster", "after raster"),
      rows.toSeq.toString)
  }

  test("PDF: PNG predictor rows (Sub/Up/Average/Paeth/None) undo exactly under Flate") {
    val text = "png predictor page survives every row filter type in one stream"
    val s = s"BT 1 0 0 1 10 20 Tm (${text}) Tj ET\n"
    val cols = 7 // small columns → many rows → all five filter types cycle
    val predicted = graft.functions.expressions.SynthPdf
      .pngPredict(s.getBytes("ISO-8859-1"), cols)
    val b = deflate(new String(predicted, "ISO-8859-1"))
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    emit(s"4 0 obj << /Length ${b.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Colors 1 /BitsPerComponent 8 " +
      s"/Columns $cols >> >>\nstream\n")
    pdf.write(b); emit("\nendstream endobj\n")
    emit("trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n")
    val rows = parsePdfBytes(pdf.toByteArray)
    assert(rows.length == 1 && rows(0).getString(3) == text, rows.toSeq.toString)
  }

  test("PDF: TIFF predictor 2 (horizontal differencing) undoes exactly under Flate") {
    val text = "tiff horizontal differencing page"
    val s = s"BT 1 0 0 1 10 20 Tm (${text}) Tj ET\n"
    val raw = s.getBytes("ISO-8859-1")
    val cols = raw.length // one row, Colors 1 → difference the whole line
    val diffed = raw.clone()
    var i = diffed.length - 1
    while (i >= 1) { diffed(i) = (raw(i) - raw(i - 1)).toByte; i -= 1 }
    val b = deflate(new String(diffed, "ISO-8859-1"))
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    emit(s"4 0 obj << /Length ${b.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 2 /Colors 1 /BitsPerComponent 8 " +
      s"/Columns $cols >> >>\nstream\n")
    pdf.write(b); emit("\nendstream endobj\n")
    emit("trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n")
    val rows = parsePdfBytes(pdf.toByteArray)
    assert(rows.length == 1 && rows(0).getString(3) == text, rows.toSeq.toString)
  }

  private def parseHtmlStr(html: String) = {
    import spark.implicits._
    Seq(html.getBytes("UTF-8")).toDF("payload")
      .select(explode(graft.functions.expressions.ParseHtml($"payload")).as("r"))
      .select($"r.content_type", $"r.content_id", $"r.content_raw",
        $"r.x1", $"r.y1")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4)))
      .toSeq
  }

  test("HTML: tag soup, entities, raw-text drop, DOM-path ids, boilerplate split") {
    val rows = parseHtmlStr(
      """<!DOCTYPE html><html><head><title>T&amp;A</title>
        |<script>if (a<b) { x("</div>") }</script></head>
        |<body><main>
        |<ul><li>one<li>two &#65;&#x42; &unknown; &nbsp;done</ul>
        |<P>first
        |<p>second <b>bo<i>ld</i></b> tail</p>
        |<div/><div>after</div>
        |</main><aside>ad text</aside></body></html>""".stripMargin)
    assert(rows == Seq(
      ("boilerplate", "/html[1]/head[1]/title[1]", "T&A", 0.0, 0.0),
      ("text_block", "/html[1]/body[1]/main[1]/ul[1]/li[1]", "one", 0.0, 0.0),
      ("text_block", "/html[1]/body[1]/main[1]/ul[1]/li[2]",
        "two AB &unknown; done", 0.0, 0.0),
      ("text_block", "/html[1]/body[1]/main[1]/p[1]", "first", 0.0, 0.0),
      ("text_block", "/html[1]/body[1]/main[1]/p[2]", "second bold tail", 0.0, 0.0),
      ("text_block", "/html[1]/body[1]/main[1]/div[2]", "after", 0.0, 0.0),
      ("boilerplate", "/html[1]/body[1]/aside[1]", "ad text", 0.0, 0.0)),
      rows.toString)
  }

  test("HTML: data-URI images with dimensions; comments/PIs skipped; remote src verbatim") {
    val rows = parseHtmlStr(
      """<main><p>pic <img src="data:image/png;base64,QUJD" width=10 height="20" alt="x"> here</p>
        |<!-- <p>commented out</p> --><?php echo ?>
        |<p><img src=http://x/y.png width=abc></p></main>""".stripMargin)
    assert(rows == Seq(
      ("image", "/main[1]/p[1]/img[1]", "QUJD", 10.0, 20.0),
      ("text_block", "/main[1]/p[1]", "pic here", 0.0, 0.0),
      ("image", "/main[1]/p[2]/img[1]", "http://x/y.png", 0.0, 0.0)),
      rows.toString)
  }

  test("HTML: fragments, lone '<', stray end tags, unterminated comments survive") {
    val rows = parseHtmlStr("a < b <p>x</p></nope><!-- open")
    assert(rows == Seq(
      ("text_block", "/", "a < b", 0.0, 0.0),
      ("text_block", "/p[1]", "x", 0.0, 0.0)), rows.toString)
  }

  test("HTML: boilerplateRatio splits chrome from main content") {
    import spark.implicits._
    val parsed = Seq((1L, "hello world")).toDF("doc_id", "text")
      .select($"doc_id", explode(graft.functions.expressions.ParseHtml(
        graft.functions.expressions.SynthHtml($"text"))).as("r"))
      .select($"doc_id", $"r.content_type", $"r.content_id", $"r.content_raw")
    val ratio = DocParse.boilerplateRatio(parsed).collect()
    // title 11 + nav 18 + footer 31 + the charset-share aside
    // ("hello world" routes to share 2, the 13-char Shift_JIS string)
    // boilerplate chars vs 11 main chars
    assert(graft.functions.expressions.SynthHtml.shareOf("hello world") == 2)
    assert(ratio.length == 1 &&
      ratio(0).getDouble(1) == BigDecimal(73.0 / 84)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      ratio.toSeq.toString)
  }


  test("HTML charset: BOM, meta, http-equiv, transport hint, precedence, fallbacks") {
    import graft.functions.expressions.CharsetSniff
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val sjis = java.nio.charset.Charset.forName("Shift_JIS")
    val s1 = "r\u00e9sum\u00e9 \u00a9 caf\u00e9 \u2014 na\u00efve"
    val s2 = "\u3053\u3093\u306b\u3061\u306f \u4e16\u754c \u30ab\u30bf\u30ab\u30ca"
    // meta charset attr, windows-1252 bytes (invalid as UTF-8)
    val metaPage = s"<html><head><meta charset=windows-1252></head>" +
      s"<body><p>$s1</p></body></html>"
    assert(CharsetSniff.decode(metaPage.getBytes(cp1252), null) == metaPage)
    // legacy http-equiv form, Shift_JIS bytes
    val eqPage = "<html><head><meta http-equiv=\"Content-Type\" " +
      s"content=\"text/html; charset=Shift_JIS\"></head><body><p>$s2</p></body></html>"
    assert(CharsetSniff.decode(eqPage.getBytes(sjis), null) == eqPage)
    // UTF-8 BOM: consumed, decides the decode with no declaration
    val plain = s"<p>$s2</p>"
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    assert(CharsetSniff.decode(bom ++ plain.getBytes("UTF-8"), null) == plain)
    // UTF-16 BOMs
    assert(CharsetSniff.decode(
      Array[Byte](0xFF.toByte, 0xFE.toByte) ++ plain.getBytes("UTF-16LE"), null) == plain)
    assert(CharsetSniff.decode(
      Array[Byte](0xFE.toByte, 0xFF.toByte) ++ plain.getBytes("UTF-16BE"), null) == plain)
    // transport hint (HTTP Content-Type) OUTRANKS a lying meta...
    val lying = "<html><head><meta charset=windows-1252></head>" +
      s"<body><p>$s2</p></body></html>"
    assert(CharsetSniff.decode(lying.getBytes(sjis),
      "text/html; charset=shift_jis") == lying)
    // ...but a BOM outranks the transport hint (spec order)
    assert(CharsetSniff.decode(bom ++ plain.getBytes("UTF-8"),
      "text/html; charset=windows-1252") == plain)
    // bare charset label works as a hint; mime with no charset is no hint
    assert(CharsetSniff.decode(s2.getBytes(sjis), "shift_jis") == s2)
    assert(CharsetSniff.decode(s1.getBytes(cp1252),
      "text/html") != s1) // falls to UTF-8, replacement chars
    // a meta claim of UTF-16 found by the ASCII prescan reads as UTF-8
    val u16claim = "<meta charset=utf-16><p>ascii only</p>"
    assert(CharsetSniff.decode(u16claim.getBytes("UTF-8"), null) == u16claim)
    // ...but the TRANSPORT layer's utf-16 claim is honored as declared
    // (a BOM-less UTF-16LE page with the right Content-Type is real)
    val bomless = s"<p>$s2</p>"
    assert(CharsetSniff.decode(bomless.getBytes("UTF-16LE"),
      "text/html; charset=utf-16le") == bomless)
    // x-user-defined maps to windows-1252 (spec fixup)
    assert(CharsetSniff.decode(s1.getBytes(cp1252),
      "charset=x-user-defined") == s1)
    // unknown label: falls through, never throws
    val junk = s"<p>$s1</p>"
    assert(CharsetSniff.decode(junk.getBytes("UTF-8"),
      "text/html; charset=klingon-8") == junk)
    // wrong charset degrades to replacement, never throws
    val wrong = CharsetSniff.decode(s2.getBytes(sjis), null)
    assert(wrong.contains('\uFFFD'))
  }

  test("HTML charset: the synth shares round-trip their per-share asides") {
    import spark.implicits._
    import graft.functions.expressions.SynthHtml
    // one text per share (md5 first-nibble routing)
    val texts = Seq("warc fixture text body", "slow filter vector", "hello world")
    assert(texts.map(SynthHtml.shareOf) == Seq(0, 1, 2), texts.map(SynthHtml.shareOf))
    val rows = texts.toDF("text")
      .select($"text", explode(graft.functions.expressions.ParseHtml(
        SynthHtml($"text"))).as("r"))
      .select($"text", $"r.content_id", $"r.content_raw")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // each share's aside decodes to its exact Unicode content...
    val asides = rows.filter(_._2 == "/html[1]/body[1]/aside[1]")
      .map(r => r._1 -> r._3).toMap
    assert(asides == Map(
      "warc fixture text body" -> SynthHtml.Aside0,
      "slow filter vector" -> SynthHtml.Aside1,
      "hello world" -> SynthHtml.Aside2), asides.toString)
    // ...and the ASCII document text is untouched in every charset
    val mains = rows.filter(_._2 == "/html[1]/body[1]/main[1]/p[1]")
      .map(r => r._1 -> r._3).toMap
    assert(texts.forall(t => mains(t) == t), mains.toString)
    // share-0 pages carry the UTF-8 BOM and no meta declaration
    val p0 = SynthHtml.build("warc fixture text body")
    assert((p0(0) & 0xFF) == 0xEF && (p0(1) & 0xFF) == 0xBB && (p0(2) & 0xFF) == 0xBF)
    assert(!new String(p0, "UTF-8").contains("<meta"))
    // share-1/2 pages are NOT valid UTF-8 reads (the decode matters)
    val p1 = SynthHtml.build("slow filter vector")
    assert(new String(p1, "UTF-8").contains('\uFFFD'))
  }

  test("WARC: record walk, HTTP opening, warcHtml bridge; defects loud") {
    import spark.implicits._
    import graft.functions.expressions.{Inflate, ParseWarc, SynthWarc}
    val warc = Inflate.maybeInflate(SynthWarc.build("warc fixture text body"))
    val recs = Seq(warc).toDF("p")
      .select(explode(ParseWarc($"p")).as("w"))
      .select($"w.rec_type", $"w.target_uri", $"w.status", $"w.mime")
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3))).toSeq
    val md5p = java.security.MessageDigest
      .getInstance("MD5").digest("warc fixture text body".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    // the capture records the MESSY raw URI (canonicalization is the
    // pipeline's job, not the container walker's)
    val uri = s"HTTP://Example.COM:80//$md5p/?utm_source=feed&fbclid=xyz#top"
    assert(recs == Seq(
      ("warcinfo", null, -1L, "application/warc-fields"),
      ("request", uri, -1L, "application/http; msgtype=request"),
      ("response", uri, 200L, "text/html; charset=utf-8")), recs.toString)
    // the response body is the EXACT page bytes (HTTP headers stripped)
    val body = Seq(warc).toDF("p")
      .select(explode(ParseWarc($"p")).as("w"))
      .filter($"w.rec_type" === "response")
      .select($"w.body").collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(body,
      graft.functions.expressions.SynthHtml.build("warc fixture text body")))
    // warcHtml bridges to the html ingest path under the capture URI
    val viaWarc = DocParse.records(DocParse.warcHtml(
      Seq(("f.warc.gz", SynthWarc.build("warc fixture text body")))
        .toDF("doc_name", "payload")), "html").collect()
    assert(viaWarc.nonEmpty && viaWarc.forall(_.getAs[String]("doc_name") == uri))
    // machine-written container: defects are loud
    val e1 = intercept[Exception](ParseWarc.parse("not a warc".getBytes))
    assert(e1.getMessage.contains("WARC/ magic"), e1.getMessage)
    val e2 = intercept[Exception](ParseWarc.parse(
      "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes))
    assert(e2.getMessage.contains("Content-Length"), e2.getMessage)
    val e3 = intercept[Exception](ParseWarc.parse(
      "WARC/1.0\r\nContent-Length: 999\r\n\r\nshort".getBytes))
    assert(e3.getMessage.contains("past end of file"), e3.getMessage)
  }

  test("gzip/zstd/xz/bzip2/lz4/snappy payloads inflate transparently by magic sniff; corruption is loud") {
    import spark.implicits._
    import graft.functions.expressions.Inflate
    val html = graft.functions.expressions.SynthHtml.build("gzipped page body")
    val names = Seq("plain.html", "packed.html.gz", "packed.html.zst",
      "packed.html.xz", "packed.html.bz2", "packed.html.lz4",
      "packed.html.sz")
    val payloads = Seq(
      ("plain.html", html),
      ("packed.html.gz", Inflate.gzip(html)),
      ("packed.html.zst", Inflate.zstd(html)),
      ("packed.html.xz", Inflate.xz(html)),
      ("packed.html.bz2", Inflate.bzip2(html)),
      ("packed.html.lz4", Inflate.lz4(html)),
      ("packed.html.sz", Inflate.snappy(html)))
      .toDF("doc_name", "payload")
    val recs = DocParse.records(payloads, "html").collect()
    val byDoc = recs.groupBy(_.getAs[String]("doc_name"))
    // identical parse output all five ways...
    val plainRows = byDoc("plain.html").map(r => (r.getAs[String]("content_id"),
      r.getAs[String]("content_raw"))).toSet
    names.tail.foreach { d =>
      assert(plainRows == byDoc(d).map(r =>
        (r.getAs[String]("content_id"), r.getAs[String]("content_raw"))).toSet, d)
    }
    // ...but the file hash is of the bytes AS STORED
    assert(names.toSet.map((d: String) =>
      byDoc(d).head.getAs[String]("file_hash")).size == 7)
    // multi-member (concatenated) members/frames/streams inflate whole
    // — the pigz / dump-concatenation shape (framed snappy appends
    // chunks rather than whole streams, so it sits out this clause)
    for (codec <- Seq[Array[Byte] => Array[Byte]](
        Inflate.gzip, Inflate.zstd, Inflate.xz, Inflate.bzip2,
        Inflate.lz4)) {
      val two = codec("hello ".getBytes("UTF-8")) ++
        codec("world".getBytes("UTF-8"))
      assert(new String(Inflate.maybeInflate(two), "UTF-8") == "hello world")
    }
    // corruption: loud, not a silent pass-through
    for ((codec, name) <- Seq[(Array[Byte] => Array[Byte], String)](
        (Inflate.gzip, "gzip"), (Inflate.zstd, "zstd"),
        (Inflate.xz, "xz"), (Inflate.bzip2, "bzip2"),
        (Inflate.lz4, "lz4"), (Inflate.snappy, "snappy"))) {
      val e = intercept[Exception](Inflate.maybeInflate(codec(html).dropRight(6)))
      assert(e.getMessage.contains(name), s"$name: ${e.getMessage}")
    }
  }


  test("image files ingest as single image records with decoded dims") {
    import spark.implicits._
    import graft.functions.expressions.{Inflate, SynthPng}
    // a real PNG (the gray share) and the same raster as BMP/GIF via
    // the synth's format shares; plus a gz-wrapped copy and junk bytes
    val pngText = (0 until 99).map(i => s"img probe $i")
      .find(t => SynthPng.formatOf(t) <= 2).get
    val gifText = (0 until 99).map(i => s"img probe $i")
      .find(t => SynthPng.formatOf(t) == 3).get
    val payloads = Seq(
      ("a.png", SynthPng.build(pngText)),
      ("b.gif", SynthPng.build(gifText)),
      ("c.png.gz", Inflate.gzip(SynthPng.build(pngText))),
      ("junk.png", "not an image at all".getBytes("UTF-8")))
      .toDF("doc_name", "payload")
    val recs = DocParse.records(payloads, "image").collect()
    assert(recs.length == 4, recs.toSeq.toString)
    assert(recs.forall(r => r.getAs[String]("doc_type") == "image" &&
      r.getAs[String]("content_type") == ContentTypes.Image))
    val byDoc = recs.map(r => r.getAs[String]("doc_name") -> r).toMap
    // dims decode from the container header; the gz wrapper is
    // transparent for the parse but not for the file hash
    Seq("a.png", "b.gif", "c.png.gz").foreach { d =>
      assert(byDoc(d).getAs[scala.collection.Seq[Double]]("bbox").toSeq ==
        Seq(0.0, 0.0, SynthPng.W.toDouble, SynthPng.H.toDouble), d)
    }
    assert(byDoc("a.png").getAs[String]("file_hash") !=
      byDoc("c.png.gz").getAs[String]("file_hash"))
    assert(byDoc("a.png").getAs[String]("content_raw") ==
      byDoc("c.png.gz").getAs[String]("content_raw"))
    // an unrecognized header keeps the row (bytes still embed) with
    // a 0x0 bbox — an image corpus with one odd file must not abort
    assert(byDoc("junk.png").getAs[scala.collection.Seq[Double]]("bbox").toSeq ==
      Seq(0.0, 0.0, 0.0, 0.0))
    assert(recs.forall(_.getAs[scala.collection.Seq[Double]]("embedding").nonEmpty))
  }

  test("HTML: records() routes the format and never embeds boilerplate") {
    import spark.implicits._
    val payloads = Seq(("a.html",
      graft.functions.expressions.SynthHtml.build("hello world")))
      .toDF("doc_name", "payload")
    val recs = DocParse.records(payloads, "html").collect()
    assert(recs.length == 2, recs.toSeq.toString) // 1 text chunk + 1 image
    val byType = recs.groupBy(_.getAs[String]("content_type"))
    assert(byType.keySet == Set(ContentTypes.TextChunk, ContentTypes.Image))
    assert(byType(ContentTypes.TextChunk).head
      .getAs[String]("content_raw") == "hello world")
    assert(recs.forall(_.getAs[String]("doc_type") == "html"))
  }

  private def zipStrOf(entries: (String, String)*): Array[Byte] =
    zipOf(entries.map { case (n, c) => (n, c.getBytes("UTF-8")) }: _*)

  private def parseXlsxBytes(bytes: Array[Byte]) = {
    import spark.implicits._
    Seq(bytes).toDF("payload")
      .select(explode(graft.functions.expressions.ParseXlsx($"payload")).as("r"))
      .select($"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getDouble(4), r.getDouble(5)))
      .toSeq
  }

  private val XlsxNs =
    "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val XlsxNsR =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  private val OpcNsRel =
    "http://schemas.openxmlformats.org/package/2006/relationships"

  private def xlsxOf(sheetXml: String, sst: Option[String] = None) = zipStrOf(
    Seq(
      "xl/workbook.xml" ->
        (s"""<workbook xmlns="$XlsxNs" xmlns:r="$XlsxNsR"><sheets>""" +
          s"""<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        (s"""<Relationships xmlns="$OpcNsRel">""" +
          s"""<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>""" +
          "</Relationships>"),
      "xl/worksheets/sheet1.xml" ->
        s"""<worksheet xmlns="$XlsxNs"><sheetData>$sheetXml</sheetData></worksheet>""") ++
      sst.map("xl/sharedStrings.xml" -> _): _*)

  test("XLSX: rich-text shared strings, formula strings, booleans, valueless cells") {
    val sst = s"""<sst xmlns="$XlsxNs"><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"""
    val rows = parseXlsxBytes(xlsxOf(
      """<row r="2"><c r="A2" t="s"><v>0</v></c>""" +
        """<c r="B2" t="str"><v>=SUM says 7</v></c>""" +
        """<c r="C2" t="b"><v>1</v></c>""" +
        """<c r="D2" s="1"/>""" + // styled but valueless: skipped
        """<c r="AA2"><v>2.5</v></c></row>""", Some(sst)))
    assert(rows == Seq(
      (0L, "text_block", "S!A2", "rich", 1.0, 2.0),
      (0L, "text_block", "S!B2", "=SUM says 7", 2.0, 2.0),
      (0L, "number", "S!C2", "1", 3.0, 2.0),
      (0L, "number", "S!AA2", "2.5", 27.0, 2.0)), rows.toString)
  }

  test("XLSX: phonetic rPh runs are guide text, never cell content") {
    val sst = s"""<sst xmlns="$XlsxNs"><si><r><t>value</t></r>""" +
      s"""<rPh sb="0" eb="2"><t>furigana</t></rPh><phoneticPr/></si></sst>"""
    val rows = parseXlsxBytes(xlsxOf(
      """<row r="1"><c r="A1" t="s"><v>0</v></c></row>""", Some(sst)))
    assert(rows == Seq((0L, "text_block", "S!A1", "value", 1.0, 1.0)),
      rows.toString)
  }

  test("XLSX: structural defects are loud — bad sst index, missing part, bad ref") {
    val e1 = intercept[Exception](parseXlsxBytes(xlsxOf(
      """<row r="1"><c r="A1" t="s"><v>3</v></c></row>""",
      Some(s"""<sst xmlns="$XlsxNs"><si><t>x</t></si></sst>"""))))
    assert(e1.getMessage.contains("out of range"), e1.getMessage)
    val e2 = intercept[Exception](parseXlsxBytes(zipStrOf(
      "xl/workbook.xml" ->
        (s"""<workbook xmlns="$XlsxNs" xmlns:r="$XlsxNsR"><sheets>""" +
          s"""<sheet name="S" sheetId="1" r:id="rId9"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        s"""<Relationships xmlns="$OpcNsRel"></Relationships>""")))
    assert(e2.getMessage.contains("undeclared relationship"), e2.getMessage)
    val e3 = intercept[Exception](parseXlsxBytes(xlsxOf(
      """<row r="1"><c r="11" t="str"><v>x</v></c></row>""")))
    assert(e3.getMessage.contains("malformed cell reference"), e3.getMessage)
  }

  test("XLSX: records() routes the format; shared strings deduplicate across rows") {
    import spark.implicits._
    // 400 chars of the same 200-char chunk → ONE shared string, two rows
    val text = "y" * 400
    val payloads = Seq(("t.xlsx",
      graft.functions.expressions.SynthXlsx.build(text)))
      .toDF("doc_name", "payload")
    val recs = DocParse.records(payloads, "xlsx").collect()
    // Data: 2×(A,B) + C1; Meta: A1+B1 → 7 records
    assert(recs.length == 7, recs.toSeq.toString)
    val a2 = recs.find(_.getAs[String]("content_id") == "Data!A2").get
    assert(a2.getAs[String]("content_raw") == "y" * 200)
    assert(recs.forall(_.getAs[String]("doc_type") == "xlsx"))
  }

  /** One-page PDF whose only font is `fontObjs`' object 5 (extra
    * objects 6.. appended verbatim); content shows `hexCodes`. */
  private def cidPdf(fontObj5: String, extraObjs: Seq[String],
      hexCodes: String): Array[Byte] = {
    val s = s"BT /F2 12 Tf 1 0 0 1 5 6 Tm <$hexCodes> Tj ET\n"
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font " +
      "<< /F2 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    emit(s"4 0 obj << /Length ${s.length} >>\nstream\n$s\nendstream endobj\n")
    emit(s"5 0 obj $fontObj5 endobj\n")
    extraObjs.zipWithIndex.foreach { case (o, i) =>
      emit(s"${6 + i} 0 obj $o endobj\n")
    }
    emit(s"trailer << /Size ${6 + extraObjs.length} /Root 1 0 R >>\n%%EOF\n")
    pdf.toByteArray
  }

  private def streamObj(body: String): String =
    s"<< /Length ${body.length} >>\nstream\n$body\nendstream"

  private def parseMdStr(md: String) = {
    import spark.implicits._
    Seq(md.getBytes("UTF-8")).toDF("payload")
      .select(explode(graft.functions.expressions.ParseMd($"payload")).as("r"))
      .select($"r.content_type", $"r.content_id", $"r.content_raw")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq
  }

  test("MD: headings, code fences, lists, quotes, links, inline images") {
    val rows = parseMdStr(
      """# Title *one*
        |
        |Para with [a link](http://x) and ![pic](data:image/png;base64,QUJD) inline.
        |It continues here.
        |
        |Setext Head
        |===
        |
        |```
        |raw   code * [not](a-link)
        |  indented
        |```
        |
        |---
        |
        |> quoted line
        |> continues
        |
        |- first
        |2. second numbered
        |
        |#hashtag is a paragraph""".stripMargin)
    assert(rows == Seq(
      ("heading", "/h1[1]", "Title one"),
      ("image", "/p[1]/img[1]", "QUJD"),
      ("text_block", "/p[1]", "Para with a link and inline. It continues here."),
      ("heading", "/h1[2]", "Setext Head"),
      ("code", "/code[1]", "raw   code * [not](a-link)\n  indented"),
      ("quote", "/bq[1]", "quoted line continues"),
      ("list_item", "/li[1]", "first"),
      ("list_item", "/li[2]", "second numbered"),
      ("text_block", "/p[2]", "#hashtag is a paragraph")), rows.toString)
  }

  test("MD: tolerance — unclosed fence, setext dash vs thematic break, remote images") {
    val rows = parseMdStr(
      "para becomes h2\n---\n\n---\n\n![r](http://img/x.png)\n\nopen fence\n```\nnever closed")
    assert(rows == Seq(
      ("heading", "/h2[1]", "para becomes h2"),
      ("image", "/p[1]/img[1]", "http://img/x.png"),
      ("text_block", "/p[2]", "open fence"),
      ("code", "/code[1]", "never closed")), rows.toString)
  }

  test("MD: records() routes the format; code and images embed as records") {
    import spark.implicits._
    val payloads = Seq(("r.md",
      graft.functions.expressions.SynthMd.build("hello world")))
      .toDF("doc_name", "payload")
    val recs = DocParse.records(payloads, "md").collect()
    // h1 + p + img + quote + 2 list items = 6
    assert(recs.length == 6, recs.toSeq.toString)
    assert(recs.count(_.getAs[String]("content_type") == ContentTypes.Image) == 1)
    assert(recs.forall(_.getAs[String]("doc_type") == "md"))
  }

  test("PDF: predefined UCS2 CMaps decode CJK without /ToUnicode; ToUnicode still wins") {
    // UniJIS-UCS2-H: the codes ARE UCS-2 — 漢字 and ASCII mix
    val text = "漢字kanji"
    val codes = text.map(c => f"${c.toInt}%04X").mkString
    for (enc <- Seq("UniJIS-UCS2-H", "UniGB-UCS2-V", "UniJIS-UCS2-HW-H",
        "UniKS-UCS2-H")) {
      val rows = parsePdfBytes(cidPdf(
        s"<< /Type /Font /Subtype /Type0 /BaseFont /CJK /Encoding /$enc >>",
        Nil, codes))
      assert(rows.length == 1 && rows(0).getString(3) == text,
        s"$enc: ${rows.toSeq}")
    }
    // an explicit /ToUnicode overrides the registry identity
    val cmap = "begincmap\n1 beginbfchar\n<6F22> <0058>\nendbfchar\nendcmap\n"
    val rows = parsePdfBytes(cidPdf(
      "<< /Type /Font /Subtype /Type0 /BaseFont /CJK " +
        "/Encoding /UniJIS-UCS2-H /ToUnicode 6 0 R >>",
      Seq(streamObj(cmap)), "6F22"))
    assert(rows.length == 1 && rows(0).getString(3) == "X", rows.toSeq.toString)
    // scope edges stay loud: lone surrogate, a registry ordering with
    // no byte-level charset story (Johab)
    val e1 = intercept[Exception](parsePdfBytes(cidPdf(
      "<< /Type /Font /Subtype /Type0 /BaseFont /CJK /Encoding /UniJIS-UCS2-H >>",
      Nil, "D800")))
    assert(e1.getMessage.contains("surrogate"), e1.getMessage)
    val e2 = intercept[Exception](parsePdfBytes(cidPdf(
      "<< /Type /Font /Subtype /Type0 /BaseFont /CJK /Encoding /Johab-H >>",
      Nil, "4141")))
    assert(e2.getMessage.contains("unsupported composite-font CMap"), e2.getMessage)
  }


  test("PDF: byte-oriented registry CMaps decode legacy CJK bytes; ToUnicode wins; defects loud") {
    // golden byte sequences from the public charset tables: the CMaps'
    // character codes ARE these charsets' bytes (mixed 1-/2-byte)
    def cid(enc: String, hex: String) = parsePdfBytes(cidPdf(
      s"<< /Type /Font /Subtype /Type0 /BaseFont /CJK /Encoding /$enc >>",
      Nil, hex))
    // 90ms-RKSJ (windows-31j): kanji + ASCII + half-width katakana
    val sj = cid("90ms-RKSJ-H", "8ABF8E9A61B6C5")
    assert(sj.length == 1 && sj(0).getString(3) == "漢字aｶﾅ",
      sj.toSeq.toString)
    // GBK-EUC and ETen-B5: the same two hanzi under both collections
    val gb = cid("GBK-EUC-H", "D6D0CEC4")
    assert(gb.length == 1 && gb(0).getString(3) == "中文", gb.toSeq.toString)
    val b5 = cid("ETen-B5-V", "A4A4A4E5")
    assert(b5.length == 1 && b5(0).getString(3) == "中文", b5.toSeq.toString)
    // EUC-JP and Korean UHC
    val eu = cid("EUC-H", "C6FCCBDCB8EC")
    assert(eu.length == 1 && eu(0).getString(3) == "日本語", eu.toSeq.toString)
    val ko = cid("KSCms-UHC-H", "C7D1B1B9BEEE")
    assert(ko.length == 1 && ko(0).getString(3) == "한국어", ko.toSeq.toString)
    // the UTF16 registry names carry surrogate PAIRS the UCS2 decode
    // validates and keeps (U+20000)
    val sp = cid("UniJIS-UTF16-H", "D840DC00")
    assert(sp.length == 1 && sp(0).getString(3) == new String(Character.toChars(0x20000)),
      sp.toSeq.toString)
    // an explicit /ToUnicode overrides the byte-oriented name too
    val cmap = "begincmap\n1 beginbfchar\n<D6D0> <0059>\nendbfchar\nendcmap\n"
    val tu = parsePdfBytes(cidPdf(
      "<< /Type /Font /Subtype /Type0 /BaseFont /CJK " +
        "/Encoding /GBK-EUC-H /ToUnicode 6 0 R >>",
      Seq(streamObj(cmap)), "D6D0"))
    assert(tu.length == 1 && tu(0).getString(3) == "Y", tu.toSeq.toString)
    // malformed bytes under the declared charset: loud, never U+FFFD
    val bad = intercept[Exception](cid("90ms-RKSJ-H", "8A"))
    assert(bad.getMessage.contains("not valid windows-31j"), bad.getMessage)
    // the pre-Unicode ISO-2022 JIS orderings (round 14): H / V / Add /
    // Ext carry RAW 2-byte JIS X 0208 codes — the JDK's x-JIS0208
    // decodes them directly. Golden bytes: 0x306C = U+4E00 (one),
    // 0x2121 = U+3000 (ideographic space)
    for (enc <- Seq("H", "V", "Add-H", "Ext-H")) {
      val jis = cid(enc, "306C2121306C")
      assert(jis.length == 1 && jis(0).getString(3) == "一　一",
        s"$enc: ${jis.toSeq}")
    }
    // the 83pv/90pv Mac flavors are Shift-JIS-coded: the standard rows
    // decode (same golden kanji bytes as the 90ms fixture); their
    // Apple-gaiji tail REPORT-fails loudly rather than substituting
    for (enc <- Seq("83pv-RKSJ-H", "90pv-RKSJ-H")) {
      val pv = cid(enc, "8ABF8E9A")
      assert(pv.length == 1 && pv(0).getString(3) == "漢字", s"$enc: ${pv.toSeq}")
    }
    // round 15: the raw 94x94 Korean/Chinese orderings decode via the
    // EUC offset (codes = EUC bytes minus the high bit). Golden
    // bytes: raw 0x2121 = ideographic space in BOTH collections; raw
    // 0x3021 -> EUC 0xB0A1 = U+AC00 (KS X 1001's first hangul) /
    // U+554A (GB 2312's first level-1 hanzi)
    for (enc <- Seq("KSC-H", "KSC-V")) {
      val ks = cid(enc, "21213021")
      assert(ks.length == 1 && ks(0).getString(3) == "　가",
        s"$enc: ${ks.toSeq}")
    }
    for (enc <- Seq("GB-H", "GB-V")) {
      val gb0 = cid(enc, "21213021")
      assert(gb0.length == 1 && gb0(0).getString(3) == "　啊",
        s"$enc: ${gb0.toSeq}")
    }
    // bytes outside the 94x94 space / odd length: loud, never offset
    // into accidental EUC
    val oob = intercept[Exception](cid("KSC-H", "2110"))
    assert(oob.getMessage.contains("94x94"), oob.getMessage)
    val odd = intercept[Exception](cid("GB-H", "212130"))
    assert(odd.getMessage.contains("odd-length"), odd.getMessage)
    // orderings with no byte-level charset story stay out of scope
    val iso = intercept[Exception](cid("Johab-H", "4141"))
    assert(iso.getMessage.contains("unsupported composite-font CMap"), iso.getMessage)
  }

  test("PDF: embedded CMap stream encodings resolve through the font's own tables") {
    // descendant with the spec fixture font program: its inverted cmap
    // reads CID 0x0100+c as character c
    def descendant(extraAt: Int) =
      // objects land at extraAt(cmap), +1(descendant), +2(fd), +3(program)
      Seq(s"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /E " +
        s"/CIDToGIDMap /Identity /FontDescriptor ${extraAt + 2} 0 R >>",
        s"<< /Type /FontDescriptor /FontName /E /Flags 4 " +
          s"/FontFile2 ${extraAt + 3} 0 R >>")
    val prog = graft.functions.expressions.SynthPdf.CidFontProgram
    val progObj = new String(
      (s"<< /Length ${prog.length} >>\nstream\n".getBytes("ISO-8859-1") ++
        prog ++ "\nendstream".getBytes("ISO-8859-1"))
        .map(b => (b & 0xFF).toChar))
    // cidrange: codes 'A'..'Z' -> CIDs 0x161.. -> chars 'a'..'z'
    val cmap1 = "begincmap\n1 begincodespacerange\n<0000> <FFFF>\n" +
      "endcodespacerange\n1 begincidrange\n<0041> <005A> 353\nendcidrange\n" +
      "endcmap\n"
    val rows1 = parsePdfBytes(cidPdf(
      "<< /Type /Font /Subtype /Type0 /BaseFont /E /Encoding 6 0 R " +
        "/DescendantFonts [7 0 R] >>",
      streamObj(cmap1) +: descendant(6) :+ progObj, "004100420043"))
    assert(rows1.length == 1 && rows1(0).getString(3) == "abc",
      rows1.toSeq.toString)
    // Identity base via usecmap + a cidchar override
    val cmap2 = "begincmap\n/Identity-H usecmap\n" +
      "1 begincidchar\n<0041> 322\nendcidchar\nendcmap\n" // 322 = 0x142 -> 'B'
    val rows2 = parsePdfBytes(cidPdf(
      "<< /Type /Font /Subtype /Type0 /BaseFont /E /Encoding 6 0 R " +
        "/DescendantFonts [7 0 R] >>",
      streamObj(cmap2) +: descendant(6) :+ progObj, "01610041"))
    assert(rows2.length == 1 && rows2(0).getString(3) == "aB",
      rows2.toSeq.toString)
    // loud: non-2-byte code space, foreign usecmap base, missing encoding
    val e1 = intercept[Exception](parsePdfBytes(cidPdf(
      "<< /Type /Font /Subtype /Type0 /BaseFont /E /Encoding 6 0 R " +
        "/DescendantFonts [7 0 R] >>",
      streamObj("begincmap\n1 begincodespacerange\n<00> <FF>\n" +
        "endcodespacerange\nendcmap\n") +: descendant(6) :+ progObj, "41")))
    assert(e1.getMessage.contains("2-byte scope"), e1.getMessage)
    val e2 = intercept[Exception](parsePdfBytes(cidPdf(
      "<< /Type /Font /Subtype /Type0 /BaseFont /E /Encoding 6 0 R " +
        "/DescendantFonts [7 0 R] >>",
      streamObj("begincmap\n/UniJIS-UCS2-H usecmap\nendcmap\n")
        +: descendant(6) :+ progObj, "0041")))
    assert(e2.getMessage.contains("Identity-H/V bases"), e2.getMessage)
    val e3 = intercept[Exception](parsePdfBytes(cidPdf(
      "<< /Type /Font /Subtype /Type0 /BaseFont /E >>", Nil, "0041")))
    assert(e3.getMessage.contains("no usable /Encoding"), e3.getMessage)
  }

  test("PDF: the SynthPdf registry share round-trips and covers every CMap variant") {
    import graft.functions.expressions.{SynthPdf => SP}
    val texts = (0 until 120).map(i => s"ucs2 share text $i " + ("pad " * 60))
    val regTexts = texts.filter(SP.ucs2Encodes)
    assert(regTexts.nonEmpty, "share never drawn in 120 texts?")
    // one round trip per registry variant: UniJIS-UCS2-H plus the
    // three byte-oriented CMaps (90ms-RKSJ / GBK-EUC / ETen-B5)
    val byVariant = regTexts.groupBy(SP.registryVariant)
    assert(byVariant.keySet == Set(0, 1, 2, 3),
      s"registry variants not covered: ${byVariant.keySet}")
    byVariant.values.map(_.head).foreach { t =>
      val rows = parsePdfBytes(SP.build(t))
      val joined = rows.filter(_.getString(1) == "text_block")
        .sortBy(_.getLong(0)).map(_.getString(3)).mkString
      assert(joined == t.grouped(200).map(_.trim).mkString,
        s"${t.take(40)} (variant ${SP.registryVariant(t)})")
    }
  }

  test("PDF: array-form /DecodeParms binds per stage in a double-Flate chain") {
    // the predictor belongs to stage 2 ONLY — a decoder that re-applies
    // the one parsed predictor after every Flate stage corrupts stage 1
    val text = "double flate with the predictor on the second stage only"
    val s = s"BT 1 0 0 1 10 20 Tm (${text}) Tj ET\n"
    val cols = 9
    val predicted = graft.functions.expressions.SynthPdf
      .pngPredict(s.getBytes("ISO-8859-1"), cols)
    val b = deflate(new String(
      deflate(new String(predicted, "ISO-8859-1")), "ISO-8859-1"))
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    emit(s"4 0 obj << /Length ${b.length} " +
      "/Filter [/FlateDecode /FlateDecode] " +
      "/DecodeParms [null << /Predictor 12 /Colors 1 " +
      s"/BitsPerComponent 8 /Columns $cols >>] >>\nstream\n")
    pdf.write(b); emit("\nendstream endobj\n")
    emit("trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n")
    val rows = parsePdfBytes(pdf.toByteArray)
    assert(rows.length == 1 && rows(0).getString(3) == text, rows.toSeq.toString)
  }

  test("PDF: /DecodeParms parsing — array alignment, single-dict binding, ambiguity is loud") {
    import graft.functions.expressions.{ParsePdf => PP}
    // array form maps index-for-index, null = absent
    assert(PP.decodeParmsOf(
      "<< /Filter [/ASCIIHexDecode /FlateDecode] /DecodeParms [null << /Predictor 12 >>] >>",
      Seq("ASCIIHexDecode", "FlateDecode"), 7) ==
      Seq(None, Some("<< /Predictor 12 >>")))
    // single dict binds to the chain's ONE Flate/LZW stage
    assert(PP.decodeParmsOf(
      "<< /Filter [/ASCIIHexDecode /LZWDecode] /DecodeParms << /EarlyChange 0 >> >>",
      Seq("ASCIIHexDecode", "LZWDecode"), 7) ==
      Seq(None, Some("<< /EarlyChange 0 >>")))
    // a NESTED dict's own /DecodeParms never binds to this stream
    assert(PP.decodeParmsOf(
      "<< /SMask << /DecodeParms << /Predictor 12 >> >> /Filter /FlateDecode >>",
      Seq("FlateDecode"), 7) == Seq(None))
    // one dict over two predictor-capable stages: ambiguous → loud
    val e = intercept[Exception](PP.decodeParmsOf(
      "<< /Filter [/FlateDecode /FlateDecode] /DecodeParms << /Predictor 12 >> >>",
      Seq("FlateDecode", "FlateDecode"), 7))
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("PDF: an un-undoable predictor on an IMAGE stream does not abort the document") {
    // 16-bit TIFF differencing is out of scope — a text stream fails
    // loudly, but an image raster ships opaque (decoded minus the
    // predictor step) instead of killing the page
    val s = "BT 1 0 0 1 10 20 Tm (text next to a predicted image) Tj ET\n" +
      "q 10 0 0 10 0 0 cm /Im0 Do Q\n"
    val img = deflate("rawrasterbytes!!")
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /XObject " +
      "<< /Im0 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    emit(s"4 0 obj << /Length ${s.length} >>\nstream\n$s\nendstream endobj\n")
    emit(s"5 0 obj << /Type /XObject /Subtype /Image /Width 4 /Height 2 " +
      s"/ColorSpace /DeviceGray /BitsPerComponent 16 " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 2 /Colors 1 " +
      s"/BitsPerComponent 16 /Columns 4 >> /Length ${img.length} >>\nstream\n")
    pdf.write(img); emit("\nendstream endobj\n")
    emit("trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n")
    val rows = parsePdfBytes(pdf.toByteArray)
    val types = rows.map(_.getString(1)).toSet
    assert(types == Set("text_block", "image"), rows.toSeq.toString)
    val imgRow = rows.find(_.getString(1) == "image").get
    assert(java.util.Base64.getDecoder.decode(imgRow.getString(3))
      .sameElements("rawrasterbytes!!".getBytes("ISO-8859-1")))
  }

  test("PDF: Identity-H CID text decodes through the /ToUnicode CMap, mixed with a simple font") {
    // bfchar singles (incl. a multi-unit destination), a bfrange
    // offset run, and a bfrange ARRAY form — all in one CMap; the
    // page mixes CID and simple-font runs inside one BT block
    val cmap = "/CIDInit /ProcSet findresource begin\nbegincmap\n" +
      "2 beginbfchar\n<0001> <0048>\n<0002> <00690021>\nendbfchar\n" +
      "1 beginbfrange\n<0010> <0012> <0061>\nendbfrange\n" +
      "1 beginbfrange\n<0020> <0021> [<0058> <0059005A>]\nendbfrange\n" +
      "endcmap\nend\n"
    // codes: 0001→H  0002→i!  0010..0012→a,b,c  0020→X  0021→YZ
    val s = "BT /F2 12 Tf 1 0 0 1 5 6 Tm " +
      "<0001000200100011001200200021> Tj /F1 12 Tf ( plain) Tj ET\n"
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font " +
      "<< /F1 5 0 R /F2 6 0 R >> >> /Contents 4 0 R >> endobj\n")
    emit(s"4 0 obj << /Length ${s.length} >>\nstream\n$s\nendstream endobj\n")
    emit("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    emit("6 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake-CID " +
      "/Encoding /Identity-H /ToUnicode 7 0 R >> endobj\n")
    emit(s"7 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\nendstream endobj\n")
    emit("trailer << /Size 8 /Root 1 0 R >>\n%%EOF\n")
    val rows = parsePdfBytes(pdf.toByteArray)
    assert(rows.length == 1 && rows(0).getString(3) == "Hi!abcXYZ plain",
      rows.toSeq.toString)
  }

  test("PDF: CID/predictor scope edges fail loudly") {
    def err(bytes: Array[Byte]): String = {
      val e = intercept[Exception](parsePdfBytes(bytes))
      (Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage)
    }
    def onePage(fontDict: String, content: String,
        extra: String = ""): Array[Byte] =
      ("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
        "3 0 obj << /Type /Page /Parent 2 0 R /Resources " +
        "<< /Font << /F2 5 0 R >> >> /Contents 4 0 R >> endobj\n" +
        s"4 0 obj << /Length ${content.length} >>\nstream\n" +
        s"$content\nendstream endobj\n" +
        s"5 0 obj $fontDict endobj\n" + extra +
        "trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    // Identity-H with no /ToUnicode: text is unrecoverable — loud
    assert(err(onePage(
      "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H >>",
      "BT /F2 12 Tf <0001> Tj ET\n")).contains("no /ToUnicode"))
    // registry orderings with no byte-level charset story (Johab,
    // post-2000 names) stay out of scope — loud (the UCS2/UTF16,
    // byte-oriented, JIS/pv, and raw 94x94 families now decode)
    assert(err(onePage(
      "<< /Type /Font /Subtype /Type0 /Encoding /Johab-H >>",
      "BT /F2 12 Tf (x) Tj ET\n")).contains("unsupported composite-font CMap"))
    // a CID without a mapping — loud, names the code
    val cmapSmall = "1 beginbfchar\n<0001> <0041>\nendbfchar\n"
    assert(err(onePage(
      "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 6 0 R >>",
      "BT /F2 12 Tf <9999> Tj ET\n",
      extra = s"6 0 obj << /Length ${cmapSmall.length} >>\nstream\n" +
        s"$cmapSmall\nendstream endobj\n"))
      .contains("no Unicode mapping"))
    // a declared PNG predictor whose row shape doesn't divide the
    // stream would emit scrambled text — loud, not silent garbage
    val s = "BT (x) Tj ET\n" // 13 bytes: not a multiple of (4+1)
    assert(err(("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${deflate(s).length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 12 /Columns 4 >> >>\nstream\n").getBytes("ISO-8859-1") ++
      deflate(s) ++ ("\nendstream endobj\n" +
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1"))
      .contains("PNG row shape mismatch"))
    // an unknown predictor NUMBER stays loud
    assert(err(("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${deflate(s).length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 7 /Columns 4 >> >>\nstream\n").getBytes("ISO-8859-1") ++
      deflate(s) ++ ("\nendstream endobj\n" +
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1"))
      .contains("unsupported /Predictor 7"))
  }

  test("LZW: the 254th-code tail boundary round-trips (EOD rides the widened width)") {
    import graft.functions.expressions.{ParsePdf => PP, SynthPdf => SP}
    // 254 distinct bytes → every pair is a dict miss → exactly 254
    // data codes and the table hits 2^9 - 1 = 511 ON the final code:
    // the decoder's add-for-the-final-code widens it to 10 bits before
    // reading EOD, so the encoder must write a 10-bit EOD. Found live
    // at sf1 (82/50000 synthetic docs — any CID page whose hex content
    // compresses to exactly 254 codes); neighbors pin both sides of
    // the boundary, and the longer lengths cross it mid-stream.
    Seq(250, 253, 254, 255, 256, 300, 600, 1200).foreach { n =>
      val data = Array.tabulate(n)(i => i.toByte)
      val rt = PP.lzwDecode(SP.lzwEncode(data))
      assert(java.util.Arrays.equals(rt, data),
        s"in-repo encoder round-trip failed at n=$n")
      val rt1 = PP.lzwDecode(lzw(data), earlyChange = 1)
      assert(java.util.Arrays.equals(rt1, data),
        s"spec encoder EC=1 round-trip failed at n=$n")
      // EC=0 shifts the boundary by one: n=255 is ITS tail case
      val rt0 = PP.lzwDecode(lzw(data, earlyChange = 0), earlyChange = 0)
      assert(java.util.Arrays.equals(rt0, data),
        s"spec encoder EC=0 round-trip failed at n=$n")
    }
  }

  test("SynthPdf: LZW pages and the encrypted x embedded-font doc shares round-trip") {
    import graft.functions.expressions.{ParsePdf => PP, SynthPdf => SP}
    // five 200-char pages → page 2 rides /LZWDecode (i%4==2); pick one
    // text the md5 predicate encrypts and one it does not
    // the tag itself joins the text — a hash-only mix collapses to 26
    // distinct texts (everything mod 26), far too few for 16 combos
    def mk(tag: String): String = (tag + " ").padTo(8, 'x') +
      (0 until 1000).map(i => ('a' + (i * 7 + tag.hashCode.abs + i * i) % 26).toChar)
        .mkString
    val texts = (0 until 2000).map(i => mk(s"doc$i"))
    // all sixteen (encrypted × embedded-font × shifted-encoding × ucs2)
    // combinations must exist in the draw and round-trip identically
    val combos = for (e <- Seq(true, false); f <- Seq(true, false);
      d <- Seq(true, false); u <- Seq(true, false)) yield (e, f, d, u)
    combos.foreach { case (e, f, d, u) =>
      val t = texts.find(t => SP.encrypts(t) == e && SP.embedsFont(t) == f &&
          SP.shiftsEncoding(t) == d && SP.ucs2Encodes(t) == u)
        .getOrElse(fail(
          s"no fixture text with encrypts=$e embedsFont=$f shifted=$d ucs2=$u"))
      val bytes = SP.build(t)
      val s = new String(bytes, "ISO-8859-1")
      assert(s.contains("/Filter /LZWDecode"), "page i%4==2 must ride LZW")
      assert(s.contains("/Encrypt ") == e,
        s"encryption share predicate mismatch for ${t.take(8)}")
      assert(s.contains("/FontFile2") == f,
        s"embedded-font share predicate mismatch for ${t.take(8)}")
      // the ucs2 share references neither /ToUnicode nor descendants —
      // the registry CMap alone carries the decode
      assert(s.contains("/ToUnicode") == (!f && !u),
        "the embedded-font and ucs2 forms must carry NO /ToUnicode")
      val regNames = graft.functions.expressions.SynthPdf
        .RegistryEncodings.map(_._1)
      assert(regNames.exists(n => s.contains(s"/Encoding /$n")) == u,
        s"registry share predicate mismatch for ${t.take(8)}")
      assert(s.contains("/Differences") == d,
        s"shifted-encoding share predicate mismatch for ${t.take(8)}")
      val rows = parsePdfBytes(bytes)
      val rt = rows.filter(_.getString(1) == "text_block")
        .sortBy(_.getLong(0)).map(_.getString(3)).mkString
      assert(rt == t,
        s"round-trip mismatch (encrypted=$e, embeddedFont=$f, shifted=$d, ucs2=$u)")
    }
  }

  test("empty documents synthesize to valid zero-page/zero-slide containers") {
    val rows = Seq("").toDF("t").select(
      size(graft.functions.expressions.ParsePdf(
        graft.functions.expressions.SynthPdf($"t"))).as("npdf"),
      size(graft.functions.expressions.ParsePptx(
        graft.functions.expressions.SynthPptx($"t"))).as("npptx"),
      size(graft.functions.expressions.ParseDocx(
        graft.functions.expressions.SynthDocx($"t"))).as("ndocx"))
      .collect()(0)
    assert(rows.getInt(0) == 0, "empty text must parse to a zero-page PDF")
    assert(rows.getInt(1) == 0,
      "an empty declared sldIdLst is a zero-slide deck, not a parse failure")
    // the DOCX body also carries the static 2x2 table (4 cell rows)
    assert(rows.getInt(2) == 4,
      "an empty w:body still parses (and the table fixture's 4 cells land)")
  }

  test("PDF: unsupported filters, corrupt Flate, and non-PDF bytes fail loudly") {
    // constant payloads fold locally, so the parse error surfaces
    // directly; a file-backed plan would wrap it in a SparkException
    def err(bytes: Array[Byte]): String = {
      val e = intercept[Exception](parsePdfBytes(bytes))
      (Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage)
    }
    val dct = ("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 3 /Filter /DCTDecode >>\nstream\nabc\nendstream endobj\n")
      .getBytes("ISO-8859-1")
    assert(err(dct).contains("unsupported stream filter /DCTDecode"))
    val corrupt = ("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 4 /Filter /FlateDecode >>\nstream\nXYZW\nendstream endobj\n")
      .getBytes("ISO-8859-1")
    val ce = err(corrupt)
    assert(ce.contains("Flate"), s"wanted a Flate error, got: $ce")
    assert(err("just some text, definitely not a PDF".getBytes("UTF-8"))
      .contains("no objects found"))
  }

  // ───────── real formats: PPTX ─────────

  private def zipOf(entries: (String, Array[Byte])*): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bo)
    entries.foreach { case (name, bytes) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(0L)
      z.putNextEntry(e); z.write(bytes); z.closeEntry()
    }
    z.close(); bo.toByteArray
  }

  private def parsePptxBytes(bytes: Array[Byte]) =
    Seq(1).toDF("i")
      .select(explode(graft.functions.expressions.ParsePptx(lit(bytes))).as("r"))
      .select($"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .collect()

  private val nsA = "http://schemas.openxmlformats.org/drawingml/2006/main"
  private val nsR = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  private val nsP = "http://schemas.openxmlformats.org/presentationml/2006/main"
  private val nsRel = "http://schemas.openxmlformats.org/package/2006/relationships"

  private def slideXml(body: String): Array[Byte] =
    (s"""<?xml version="1.0"?><p:sld xmlns:a="$nsA" xmlns:r="$nsR" """ +
      s"""xmlns:p="$nsP"><p:cSld><p:spTree>$body</p:spTree></p:cSld></p:sld>""")
      .getBytes("UTF-8")

  private def textShape(id: Int, paras: Seq[String], xfrm: Boolean): String = {
    val geo = if (xfrm)
      """<a:xfrm><a:off x="100" y="200"/><a:ext cx="300" cy="400"/></a:xfrm>"""
    else ""
    s"""<p:sp><p:nvSpPr><p:cNvPr id="$id" name="t"/><p:cNvSpPr/><p:nvPr/></p:nvSpPr>""" +
      s"""<p:spPr>$geo</p:spPr><p:txBody><a:bodyPr/>""" +
      paras.map(p => s"""<a:p><a:r><a:t>$p</a:t></a:r></a:p>""").mkString +
      "</p:txBody></p:sp>"
  }

  test("PPTX: declared slide order, multi-paragraph text, inherited-geometry shapes") {
    // sldIdLst declares 3, 1, 2 — the parser must follow the
    // DECLARATION through the rels, not the part file names
    val pres = (s"""<?xml version="1.0"?><p:presentation xmlns:p="$nsP" """ +
      s"""xmlns:r="$nsR"><p:sldIdLst>""" +
      """<p:sldId id="256" r:id="rA"/><p:sldId id="257" r:id="rB"/>""" +
      """<p:sldId id="258" r:id="rC"/></p:sldIdLst></p:presentation>""")
      .getBytes("UTF-8")
    val presRels = (s"""<?xml version="1.0"?><Relationships xmlns="$nsRel">""" +
      """<Relationship Id="rA" Type="s" Target="slides/slide3.xml"/>""" +
      """<Relationship Id="rB" Type="s" Target="slides/slide1.xml"/>""" +
      """<Relationship Id="rC" Type="s" Target="slides/slide2.xml"/>""" +
      "</Relationships>").getBytes("UTF-8")
    val pkg = zipOf(
      "ppt/presentation.xml" -> pres,
      "ppt/_rels/presentation.xml.rels" -> presRels,
      // slide3 declared FIRST: two paragraphs join with a newline
      "ppt/slides/slide3.xml" -> slideXml(
        textShape(7, Seq("line one", "line two"), xfrm = true)),
      // slide1: placeholder-positioned shape (no xfrm) → zero bbox
      "ppt/slides/slide1.xml" -> slideXml(
        textShape(4, Seq("first by name"), xfrm = false)),
      "ppt/slides/slide2.xml" -> slideXml(
        textShape(5, Seq("second by name"), xfrm = true)))
    val rows = parsePptxBytes(pkg)
    assert(rows.map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSeq ==
      Seq((0L, "7", "line one\nline two"), (1L, "4", "first by name"),
        (2L, "5", "second by name")))
    assert((rows(0).getDouble(4), rows(0).getDouble(5),
      rows(0).getDouble(6), rows(0).getDouble(7)) == (100.0, 200.0, 400.0, 600.0))
    assert((rows(1).getDouble(4), rows(1).getDouble(7)) == (0.0, 0.0),
      "xfrm-less shape must degrade to a zero bbox, not crash")
    // a package WITHOUT presentation.xml falls back to numeric order
    val bare = zipOf(
      "ppt/slides/slide2.xml" -> slideXml(textShape(2, Seq("b"), xfrm = true)),
      "ppt/slides/slide1.xml" -> slideXml(textShape(2, Seq("a"), xfrm = true)),
      "ppt/slides/slide10.xml" -> slideXml(textShape(2, Seq("c"), xfrm = true)))
    assert(parsePptxBytes(bare).map(_.getString(3)).toSeq == Seq("a", "b", "c"),
      "fallback order must be numeric (slide10 after slide2), not lexicographic")
  }

  test("PPTX: pictures resolve through slide rels; missing media and non-zip fail loudly") {
    val pic =
      s"""<p:pic><p:nvPicPr><p:cNvPr id="9" name="p"/><p:cNvPicPr/><p:nvPr/></p:nvPicPr>""" +
        s"""<p:blipFill><a:blip r:embed="rId1"/></p:blipFill>""" +
        s"""<p:spPr><a:xfrm><a:off x="10" y="20"/><a:ext cx="30" cy="40"/></a:xfrm></p:spPr></p:pic>"""
    val rels = (s"""<?xml version="1.0"?><Relationships xmlns="$nsRel">""" +
      """<Relationship Id="rId1" Type="i" Target="../media/pix.bin"/>""" +
      "</Relationships>").getBytes("UTF-8")
    val ok = zipOf(
      "ppt/slides/slide1.xml" -> slideXml(pic),
      "ppt/slides/_rels/slide1.xml.rels" -> rels,
      "ppt/media/pix.bin" -> "PIXELS".getBytes("UTF-8"))
    val rows = parsePptxBytes(ok)
    assert(rows.length == 1 && rows(0).getString(1) == "image")
    assert(rows(0).getString(2) == "9")
    assert(rows(0).getString(3) ==
      java.util.Base64.getEncoder.encodeToString("PIXELS".getBytes("UTF-8")))
    assert((rows(0).getDouble(4), rows(0).getDouble(5),
      rows(0).getDouble(6), rows(0).getDouble(7)) == (10.0, 20.0, 40.0, 60.0))
    val broken = zipOf(
      "ppt/slides/slide1.xml" -> slideXml(pic),
      "ppt/slides/_rels/slide1.xml.rels" -> rels)
    def perr(bytes: Array[Byte]): String = {
      val e = intercept[Exception](parsePptxBytes(bytes))
      (Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage)
    }
    assert(perr(broken).contains("missing media part"))
    assert(perr("PK is not enough".getBytes("UTF-8")).contains("PPTX parse"))
  }

  test("real-format payloads ingest as store records and serve end-to-end") {
    val dir = "target/vdb_parse_real"
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rm))
      x.delete()
    }
    rm(new java.io.File(dir))
    val db = new GraftVectorDB(spark, dir)
    val docs = Tables.load(spark, sf, "documents").filter($"doc_id" < 40)
    val pdfs = docs.select(
      concat(lit("bin/doc_"), $"doc_id", lit(".pdf")).as("doc_name"),
      graft.functions.expressions.SynthPdf($"text").as("payload"))
    val pptx = docs.filter($"doc_id" >= 20).select(
      concat(lit("bin/doc_"), $"doc_id", lit(".pptx")).as("doc_name"),
      graft.functions.expressions.SynthPptx($"text").as("payload"))
    val n1 = db.ingestRecords(DocParse.records(pdfs, "pdf"))
    val n2 = db.ingestRecords(DocParse.records(pptx, "pptx"))
    assert(n1 > 0 && n2 > 0)
    val types = db.store.select($"doc_type").distinct().collect()
      .map(_.getString(0)).toSet
    assert(types == Set("pdf", "pptx"))
    assert(db.store.filter($"content_type" === ContentTypes.Image).count() > 0)
    val hits = db.search("fast query join table", topN = 5).collect()
    assert(hits.length == 5)
    val err = intercept[IllegalArgumentException](DocParse.records(pdfs, "tar"))
    assert(err.getMessage.contains("unknown container format"))
    // docx is the third real container through the same seam
    val docx = docs.filter($"doc_id" < 10).select(
      concat(lit("bin/doc_"), $"doc_id", lit(".docx")).as("doc_name"),
      graft.functions.expressions.SynthDocx($"text").as("payload"))
    val n3 = db.ingestRecords(DocParse.records(docx, "docx"))
    assert(n3 > 0)
    assert(db.store.filter($"doc_type" === "docx").count() == n3)
  }

  test("DOCX: paragraphs, inline pictures, and XML specials round-trip through the OPC parser") {
    import graft.functions.expressions.{ParseDocx, SynthDocx}
    def parseDocxBytes(bytes: Array[Byte]) =
      Seq(1).toDF("i")
        .select(explode(ParseDocx(lit(bytes))).as("r"))
        .select($"r.page_num", $"r.content_type", $"r.content_id",
          $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
        .collect()
    val text = (0 until 1000).map(i => ('a' + (i * 13 + i / 200) % 26).toChar)
      .mkString // 5 paragraphs
    val rows = parseDocxBytes(SynthDocx.build(text))
    val texts = rows.filter(_.getString(1) == "text_block")
      .sortBy(_.getString(2).toInt)
    assert(texts.map(_.getString(2)).toSeq ==
      Seq("0", "1", "2", "3", "4", "5", "6", "7", "8"),
      "paragraph ordinals are the content ids (5 chunks + 4 table cells)")
    assert(texts.take(5).map(_.getString(3)).mkString == text,
      "text must round-trip")
    assert(texts.drop(5).map(_.getString(3)).toSeq ==
      Seq("cell alpha", "cell beta", "cell gamma", "cell delta"),
      "w:tbl cell paragraphs land as ordinal rows after the body")
    assert(rows.forall(_.getLong(0) == 0L),
      "WordprocessingML has no pages until layout: page_num is 0")
    val imgs = rows.filter(_.getString(1) == "image").sortBy(_.getString(2))
    assert(imgs.map(_.getString(2)).toSeq == Seq("1000", "1003"),
      "inline pictures carry their wp:docPr ids")
    imgs.zip(Seq(0, 3)).foreach { case (r, i) =>
      val chunk = text.substring(i * 200, i * 200 + 200)
      val md5p = java.security.MessageDigest.getInstance("MD5")
        .digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      assert(new String(java.util.Base64.getDecoder.decode(r.getString(3)),
        "ISO-8859-1") == md5p, "media bytes resolve through the document rels")
      assert(r.getDouble(6) == (100 + (i * 7) % 200) * 9525.0 &&
        r.getDouble(7) == (80 + (i * 11) % 160) * 9525.0,
        "bbox = wp:extent EMUs")
    }
    // XML specials survive the escape/unescape round trip
    val special = "a & b < c > d " * 14 // one paragraph with all three
    val sp = parseDocxBytes(SynthDocx.build(special))
    // 1 paragraph + 1 image + the 4 static table cells
    assert(sp.length == 6 && sp.exists(_.getString(3) == special.trim),
      sp.map(_.getString(3)).toSeq.toString)
    // a zip with no word/document.xml is loud — not silently empty
    def pack(parts: (String, String)*): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bo)
      parts.foreach { case (n, c) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n))
        z.write(c.getBytes("UTF-8")); z.closeEntry()
      }
      z.close(); bo.toByteArray
    }
    def errMsg(bytes: Array[Byte]): String = {
      val e = intercept[Exception](parseDocxBytes(bytes))
      Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    }
    assert(errMsg(pack("other.xml" -> "<x/>")).contains("no word/document.xml"))
    // w:tab → TAB, w:br → newline, and a TEXT BOX's inner paragraph is
    // its OWN row — never doubled into the host paragraph's text
    val nsW = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    val hand = pack("word/document.xml" ->
      (s"""<?xml version="1.0"?><w:document xmlns:w="$nsW"><w:body>""" +
        """<w:p><w:r><w:t>col1</w:t><w:tab/><w:t>col2</w:t><w:br/>""" +
        """<w:t>line2</w:t></w:r><w:r><w:pict><w:txbxContent>""" +
        """<w:p><w:r><w:t>boxed</w:t></w:r></w:p>""" +
        """</w:txbxContent></w:pict></w:r></w:p></w:body></w:document>"""))
    assert(parseDocxBytes(hand).map(r => (r.getString(2), r.getString(3))).toSet ==
      Set(("0", "col1\tcol2\nline2"), ("1", "boxed")),
      parseDocxBytes(hand).toSeq.toString)
    // Strict Open XML namespaces are out of scope — loud, not empty
    assert(errMsg(pack("word/document.xml" ->
      ("""<?xml version="1.0"?><w:document """ +
        """xmlns:w="http://purl.oclc.org/ooxml/wordprocessingml/main">""" +
        """<w:body/></w:document>""")))
      .contains("unsupported WordprocessingML namespace"))
    // a drawing whose r:embed has no relationship entry is loud
    val dangling = pack("word/document.xml" ->
      (s"""<?xml version="1.0"?><w:document xmlns:w="$nsW" """ +
        """xmlns:wp="http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing" """ +
        """xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<w:body><w:p><w:r><w:drawing><wp:inline>""" +
        """<wp:extent cx="10" cy="10"/><wp:docPr id="7" name=""/>""" +
        """<a:graphic><a:graphicData uri="u"><a:blip r:embed="rId9"/>""" +
        """</a:graphicData></a:graphic>""" +
        """</wp:inline></w:drawing></w:r></w:p></w:body></w:document>"""))
    assert(errMsg(dangling).contains("undeclared relationship rId9"))
    // carriage returns survive the escape round trip as &#13; — the
    // XML parser's line-ending normalization must not turn them into \n
    val cr = "line one\rline two" + " x" * 91 // one chunk
    val crRows = parseDocxBytes(graft.functions.expressions.SynthDocx.build(cr))
    assert(crRows.exists(_.getString(3) == cr.trim), crRows.map(_.getString(3)).toSeq)
    // XML-illegal control characters fail the WRITE loudly
    val bad = intercept[Exception](
      graft.functions.expressions.SynthDocx.build("a" + 1.toChar + "b"))
    assert(bad.getMessage.contains("illegal in XML 1.0"), bad.getMessage)
  }

  // ---- Identity-H WITHOUT /ToUnicode: the embedded TrueType cmap ----

  private def ttfU16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
  private def ttfU32(v: Long): Array[Byte] = Array((v >> 24).toByte,
    (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** A minimal-but-real sfnt with one cmap table. `sub` is the raw
    * subtable; `platEnc` its (platformID, encodingID) record(s) — the
    * LAST record points at `sub`, earlier ones at `decoy`. */
  private def ttfFont(sub: Array[Byte], platEnc: Seq[(Int, Int)],
      decoy: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val n = platEnc.length
    val hdrLen = 4 + n * 8
    val cmap = ttfU16(0) ++ ttfU16(n) ++
      platEnc.zipWithIndex.flatMap { case ((p, e), i) =>
        val off = if (i == n - 1) hdrLen + decoy.length else hdrLen
        ttfU16(p) ++ ttfU16(e) ++ ttfU32(off)
      } ++ decoy ++ sub
    ttfU32(0x00010000L) ++ ttfU16(1) ++ ttfU16(0) ++ ttfU16(0) ++ ttfU16(0) ++
      ttfU32(0x636D6170L) ++ ttfU32(0) ++ ttfU32(28) ++ ttfU32(cmap.length) ++
      cmap
  }

  /** Format-4 subtable: H→1, i→2, !→3 via the idDelta arm and
    * a,b,c→5,6,7 via the glyphIdArray (idRangeOffset) arm. */
  private def fmt4Sub(): Array[Byte] = {
    val ends = Seq(0x21, 0x48, 0x63, 0x69, 0xFFFF)
    val starts = Seq(0x21, 0x48, 0x61, 0x69, 0xFFFF)
    val deltas = Seq((3 - 0x21) & 0xFFFF, (1 - 0x48) & 0xFFFF, 0,
      (2 - 0x69) & 0xFFFF, 1)
    val ranges = Seq(0, 0, 2 * (ends.length - 2), 0, 0) // a..c → glyphIdArray[0..2]
    val glyphs = Seq(5, 6, 7)
    val len = 16 + 8 * ends.length + 2 * glyphs.length
    ttfU16(4) ++ ttfU16(len) ++ ttfU16(0) ++ ttfU16(ends.length * 2) ++
      ttfU16(0) ++ ttfU16(0) ++ ttfU16(0) ++
      ends.flatMap(ttfU16).toArray ++ ttfU16(0) ++
      starts.flatMap(ttfU16).toArray ++ deltas.flatMap(ttfU16).toArray ++
      ranges.flatMap(ttfU16).toArray ++ glyphs.flatMap(ttfU16).toArray
  }

  /** An Identity-H page whose font embeds `fontBytes` and carries NO
    * /ToUnicode; `cidToGid` is the descendant's /CIDToGIDMap entry. */
  private def embeddedFontPdf(fontBytes: Array[Byte], content: String,
      cidToGid: String = " /CIDToGIDMap /Identity",
      gidStream: Option[Array[Byte]] = None): Array[Byte] = {
    val pdf = new java.io.ByteArrayOutputStream()
    def emit(x: String): Unit = pdf.write(x.getBytes("ISO-8859-1"))
    emit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    emit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    emit("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font " +
      "<< /F2 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    emit(s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream endobj\n")
    emit("5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Emb " +
      "/Encoding /Identity-H /DescendantFonts [6 0 R] >> endobj\n")
    emit("6 0 obj << /Type /Font /Subtype /CIDFontType2" + cidToGid +
      " /FontDescriptor 7 0 R >> endobj\n")
    emit("7 0 obj << /Type /FontDescriptor /FontName /Emb /FontFile2 8 0 R >> endobj\n")
    emit(s"8 0 obj << /Length ${fontBytes.length} >>\nstream\n")
    pdf.write(fontBytes)
    emit("\nendstream endobj\n")
    gidStream.foreach { g =>
      emit(s"9 0 obj << /Length ${g.length} >>\nstream\n")
      pdf.write(g)
      emit("\nendstream endobj\n")
    }
    emit("trailer << /Size 10 /Root 1 0 R >>\n%%EOF\n")
    pdf.toByteArray
  }

  test("PDF: Identity-H without /ToUnicode decodes through the embedded TrueType cmap (format 4, both arms)") {
    val content = "BT /F2 12 Tf <000100020005000600070003> Tj ET\n"
    // explicit /CIDToGIDMap /Identity and the spec-default ABSENT form
    Seq(" /CIDToGIDMap /Identity", "").foreach { c2g =>
      val rows = parsePdfBytes(embeddedFontPdf(
        ttfFont(fmt4Sub(), Seq((3, 1))), content, cidToGid = c2g))
      assert(rows.length == 1 && rows(0).getString(3) == "Hiabc!",
        s"cidToGid='$c2g': " + rows.toSeq.toString)
    }
  }

  test("PDF: Identity-V decodes like Identity-H (vertical mode shapes layout, not content)") {
    val content = "BT /F2 12 Tf <000100020003> Tj ET\n"
    val pdf = embeddedFontPdf(ttfFont(fmt4Sub(), Seq((3, 1))), content)
    val vertical = new String(pdf, "ISO-8859-1")
      .replace("/Encoding /Identity-H", "/Encoding /Identity-V")
      .getBytes("ISO-8859-1")
    val rows = parsePdfBytes(vertical)
    assert(rows.length == 1 && rows(0).getString(3) == "Hi!",
      rows.toSeq.toString)
  }

  test("PDF: the stream /CIDToGIDMap remaps CIDs before the font cmap") {
    // cid1→gid3(!), cid2→gid1(H), cid3→gid2(i)
    val gidTable = Array[Byte](0, 0, 0, 3, 0, 1, 0, 2)
    val rows = parsePdfBytes(embeddedFontPdf(
      ttfFont(fmt4Sub(), Seq((3, 1))), "BT /F2 12 Tf <000100020003> Tj ET\n",
      cidToGid = " /CIDToGIDMap 9 0 R", gidStream = Some(gidTable)))
    assert(rows.length == 1 && rows(0).getString(3) == "!Hi",
      rows.toSeq.toString)
  }

  test("PDF: a (3,10) format-12 subtable outranks the BMP table; astral glyphs decode as surrogate pairs") {
    // decoy (3,1) format 4 maps A→gid1; the preferred (3,10) format 12
    // maps U+1F600..01 → gid 1..2 — preference decides which wins
    val decoy = {
      val ends = Seq(0x41, 0xFFFF)
      val starts = Seq(0x41, 0xFFFF)
      val deltas = Seq((1 - 0x41) & 0xFFFF, 1)
      ttfU16(4) ++ ttfU16(16 + 8 * 2) ++ ttfU16(0) ++ ttfU16(4) ++
        ttfU16(0) ++ ttfU16(0) ++ ttfU16(0) ++
        ends.flatMap(ttfU16).toArray ++ ttfU16(0) ++
        starts.flatMap(ttfU16).toArray ++ deltas.flatMap(ttfU16).toArray ++
        ttfU16(0) ++ ttfU16(0)
    }
    val fmt12 = ttfU16(12) ++ ttfU16(0) ++ ttfU32(16 + 12) ++ ttfU32(0) ++
      ttfU32(1) ++ ttfU32(0x1F600L) ++ ttfU32(0x1F601L) ++ ttfU32(1)
    val rows = parsePdfBytes(embeddedFontPdf(
      ttfFont(fmt12, Seq((3, 1), (3, 10)), decoy = decoy),
      "BT /F2 12 Tf <00010002> Tj ET\n"))
    assert(rows.length == 1 && rows(0).getString(3) == "😀😁",
      rows.toSeq.toString)
  }

  test("PDF: simple-font /Differences remap bytes through AGL names; base bytes stay Latin-1") {
    def onePage(fontDict: String, content: String, extra: String = ""): Array[Byte] =
      ("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
        "3 0 obj << /Type /Page /Parent 2 0 R /Resources " +
        "<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n" +
        s"4 0 obj << /Length ${content.length} >>\nstream\n" +
        s"$content\nendstream endobj\n" +
        s"5 0 obj $fontDict endobj\n" + extra +
        "trailer << /Size 8 /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    // inline dict form: named bytes remap (AGL, uniXXXX, uXXXXX —
    // astral via surrogate pair), unnamed bytes keep Latin-1
    val content = "BT /F1 12 Tf <4142C1C278> Tj ET\n"
    val inline = onePage(
      "<< /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding " +
        "<< /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
        "/Differences [ 65 /adieresis /uni0042 193 /emdash /u1F600 ] >> >>",
      content)
    val rows = parsePdfBytes(inline)
    assert(rows.length == 1 && rows(0).getString(3) == "äB—😀x",
      rows.toSeq.toString)
    // indirect /Encoding object form
    val indirect = onePage(
      "<< /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding 6 0 R >>",
      content,
      extra = "6 0 obj << /Type /Encoding /Differences " +
        "[ 65 /adieresis /uni0042 193 /emdash /u1F600 ] >> endobj\n")
    assert(parsePdfBytes(indirect)(0).getString(3) == "äB—😀x")
    // a name outside the AGL subset fails loudly naming the glyph
    val e = intercept[Exception](parsePdfBytes(onePage(
      "<< /Type /Font /Subtype /Type1 /Encoding " +
        "<< /Differences [ 65 /notarealglyph ] >> >>",
      content)))
    assert((Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage)
      .contains("glyph name /notarealglyph"), e.getMessage)
    // a bare-name /Encoding stays plain Latin-1 (no differences)
    val plain = onePage(
      "<< /Type /Font /Subtype /Type1 /Encoding /WinAnsiEncoding >>",
      "BT /F1 12 Tf (Ax) Tj ET\n")
    assert(parsePdfBytes(plain)(0).getString(3) == "Ax")
    // Type3 fonts carry their encoding EXCLUSIVELY as /Differences
    // (ISO 32000 §9.6.4) — same decode path, so glyph-drawn text reads
    val t3 = onePage(
      "<< /Type /Font /Subtype /Type3 /FontMatrix [0.001 0 0 0.001 0 0] " +
        "/CharProcs 7 0 R /Encoding << /Differences [ 1 /H /i /exclam ] >> >>",
      "BT /F1 12 Tf <010203> Tj ET\n")
    assert(parsePdfBytes(t3)(0).getString(3) == "Hi!")
    // a '>>' inside a string VALUE must not truncate the encoding dict
    // (the balancedDict string-skip — same hazard class as /Encrypt)
    val strVal = onePage(
      "<< /Type /Font /Subtype /Type1 /Encoding " +
        "<< /Foo (a>>b) /Differences [ 65 /adieresis ] >> >>",
      "BT /F1 12 Tf <41> Tj ET\n")
    assert(parsePdfBytes(strVal)(0).getString(3) == "ä",
      "a >> inside a literal string must not close the /Encoding dict")
    // an INDIRECT /Differences array (any dict value may be a ref)
    val indArr = onePage(
      "<< /Type /Font /Subtype /Type1 /Encoding " +
        "<< /Type /Encoding /Differences 6 0 R >> >>",
      "BT /F1 12 Tf <41> Tj ET\n",
      extra = "6 0 obj [ 65 /adieresis ] endobj\n")
    assert(parsePdfBytes(indArr)(0).getString(3) == "ä")
    def err(bytes: Array[Byte]): String = {
      val ex = intercept[Exception](parsePdfBytes(bytes))
      (Option(ex.getCause).map(_.getMessage).getOrElse("") + ex.getMessage)
    }
    // surrogate-range uni names and non-integer codes fail loudly
    assert(err(onePage(
      "<< /Type /Font /Subtype /Type1 /Encoding " +
        "<< /Differences [ 65 /uniD800 ] >> >>",
      "BT /F1 12 Tf <41> Tj ET\n")).contains("surrogate"))
    assert(err(onePage(
      "<< /Type /Font /Subtype /Type1 /Encoding " +
        "<< /Differences [ 65.5 /A ] >> >>",
      "BT /F1 12 Tf <41> Tj ET\n")).contains("non-integer /Differences code"))
  }

  test("PDF: embedded-font cmap scope edges fail loudly") {
    def err(bytes: Array[Byte]): String = {
      val e = intercept[Exception](parsePdfBytes(bytes))
      (Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage)
    }
    val content = "BT /F2 12 Tf <0001> Tj ET\n"
    // descendant chain present but no /FontFile2
    val noFile = ("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font " +
      "<< /F2 5 0 R >> >> /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream endobj\n" +
      "5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
      "/DescendantFonts [6 0 R] >> endobj\n" +
      "6 0 obj << /Type /Font /Subtype /CIDFontType2 /FontDescriptor 7 0 R >> endobj\n" +
      "7 0 obj << /Type /FontDescriptor /FontName /Bare >> endobj\n" +
      "trailer << /Size 8 /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    assert(err(noFile).contains("no embedded /FontFile2"))
    // a cmap subtable format the reader doesn't speak
    val fmt6 = ttfU16(6) ++ ttfU16(14) ++ ttfU16(0) ++ ttfU16(0x41) ++
      ttfU16(1) ++ ttfU16(1)
    assert(err(embeddedFontPdf(ttfFont(fmt6, Seq((3, 1))), content))
      .contains("unsupported cmap subtable format 6"))
    // a font with no cmap table at all
    val bare = ttfU32(0x00010000L) ++ ttfU16(1) ++ ttfU16(0) ++ ttfU16(0) ++
      ttfU16(0) ++ ttfU32(0x676C7966L /* 'glyf' */) ++ ttfU32(0) ++
      ttfU32(28) ++ ttfU32(4) ++ ttfU32(0)
    assert(err(embeddedFontPdf(bare, content)).contains("no cmap table"))
  }

  test("EPUB: synth round-trips — spine order, href#path ids, titles, image parts") {
    import graft.functions.expressions.{ParseEpub, SynthEpub}
    // 3 chunks (200+200+50 chars) -> chapters (p1,p2) + (p1); chunk 0
    // carries the image part
    val text = ("a" * 200) + ("b" * 200) + ("c" * 50)
    val rows = Seq(text).toDF("text")
      .select(explode(ParseEpub(SynthEpub($"text"))).as("r"))
      .select($"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x1", $"r.y1")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getDouble(4), r.getDouble(5))).toSeq
      .sortBy(r => (r._1, r._2, r._3))
    val md5p = java.security.MessageDigest.getInstance("MD5")
      .digest(("a" * 200).getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(8)
    val b64 = java.util.Base64.getEncoder.encodeToString(md5p.getBytes("UTF-8"))
    assert(rows == Seq(
      (0L, "boilerplate", "text/chap1.xhtml#/html[1]/head[1]/title[1]",
        "Chapter 1", 0.0, 0.0),
      (0L, "image", "text/chap1.xhtml#/html[1]/body[1]/p[1]/img[1]",
        b64, 100.0, 80.0),
      (0L, "text_block", "text/chap1.xhtml#/html[1]/body[1]/p[1]",
        "a" * 200, 0.0, 0.0),
      (0L, "text_block", "text/chap1.xhtml#/html[1]/body[1]/p[2]",
        "b" * 200, 0.0, 0.0),
      (1L, "boilerplate", "text/chap2.xhtml#/html[1]/head[1]/title[1]",
        "Chapter 2", 0.0, 0.0),
      (1L, "text_block", "text/chap2.xhtml#/html[1]/body[1]/p[1]",
        "c" * 50, 0.0, 0.0)), rows.toString)
    // the zip stores chapters in REVERSE order — page_num above came
    // from the spine — and the mimetype is the first, STORED entry:
    // its name sits at the fixed OCF header offset and its payload is
    // plaintext in the file (the property magic sniffers rely on; the
    // exact payload offset shifts with the JDK's extra fields)
    val bytes = SynthEpub.build(text)
    assert(new String(bytes.slice(30, 38), "UTF-8") == "mimetype")
    assert(new String(bytes.take(100), "ISO-8859-1")
      .contains("application/epub+zip"))
  }

  private def epubZip(entries: (String, String)*): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bo)
    entries.foreach { case (name, body) =>
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(body.getBytes("UTF-8"))
      zip.closeEntry()
    }
    zip.close()
    bo.toByteArray
  }

  private val epubContainer =
    """<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
      |<rootfiles><rootfile full-path="book.opf"/></rootfiles></container>""".stripMargin

  test("EPUB: container defects are loud; content stays tolerant; remote src verbatim") {
    import graft.functions.expressions.ParseEpub
    def parse(bytes: Array[Byte]) = Seq(bytes).toDF("p")
      .select(explode(ParseEpub($"p")).as("r"))
      .select($"r.page_num", $"r.content_type", $"r.content_raw").collect()
    def err(bytes: Array[Byte]): String =
      intercept[Exception](parse(bytes)).getMessage
    assert(err(epubZip("other.txt" -> "x"))
      .contains("no META-INF/container.xml"))
    assert(err(epubZip("META-INF/container.xml" -> epubContainer))
      .contains("missing OPF rootfile"))
    val opfDangling =
      """<package xmlns="http://www.idpf.org/2007/opf">
        |<manifest/><spine><itemref idref="nope"/></spine></package>""".stripMargin
    assert(err(epubZip("META-INF/container.xml" -> epubContainer,
      "book.opf" -> opfDangling)).contains("no manifest item"))
    // soupy chapter XHTML parses tolerantly; a remote img src passes
    // through verbatim (fetch out of scope)
    val opf =
      """<package xmlns="http://www.idpf.org/2007/opf">
        |<manifest><item id="c1" href="ch1.html"/></manifest>
        |<spine><itemref idref="c1"/></spine></package>""".stripMargin
    val got = parse(epubZip("META-INF/container.xml" -> epubContainer,
      "book.opf" -> opf,
      "ch1.html" -> "<body><P>unclosed soup<p>next<img src=http://x/y.png></body>"))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((0L, "text_block", "unclosed soup"),
      (0L, "image", "http://x/y.png"), (0L, "text_block", "next")), got.toString)
  }

  test("JSONL: escape round-trip, junk lines drop, records() routes the format") {
    import graft.functions.JsonlCodec
    // quotes + backslashes must survive the to_json/from_json round
    // trip; 230 chars -> 2 records under the 200-char chunking
    val tricky = """he said "x\y" and""" + (" pad" * 54)
    val rows = Seq(tricky).toDF("text")
      .select(explode(JsonlCodec.parse(JsonlCodec.synth($"text"))).as("r"))
      .select($"r.content_id", $"r.content_raw").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sortBy(_._1)
    val md5p = java.security.MessageDigest.getInstance("MD5")
      .digest(tricky.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    assert(rows == Seq(
      (s"http://example.com/$md5p#0", tricky.take(200)),
      (s"http://example.com/$md5p#1", tricky.drop(200))), rows.toString)
    // junk lines and textless records drop; a url-less record falls
    // back to its line ordinal
    val dump = Seq(
      """{"url":"http://a/1","text":"alpha"}""",
      "not json at all",
      """{"url":"http://a/2"}""",
      "",
      """{"text":"gamma"}""").mkString("\n").getBytes("UTF-8")
    val got = Seq(dump).toDF("p")
      .select(explode(JsonlCodec.parse($"p")).as("r"))
      .select($"r.content_id", $"r.content_raw").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("http://a/1", "alpha"), ("line-3", "gamma")),
      got.toString)
    // the ingest path: doc_type jsonl, gzip transparent
    import graft.functions.expressions.Inflate
    val recs = DocParse.records(
      Seq(("d.jsonl.gz", Inflate.gzip(dump))).toDF("doc_name", "payload"),
      "jsonl").collect()
    assert(recs.length == 2 &&
      recs.forall(_.getAs[String]("doc_type") == "jsonl"), recs.toSeq.toString)
  }

  test("CSV: quoting round-trip, header skipped by ordinal, junk drops") {
    import graft.functions.CsvCodec
    // commas and quotes force real CSV escaping on the synth side
    val tricky = """before, "quoted, part" after""" + (" pad" * 50)
    val rows = Seq(tricky).toDF("text")
      .select(explode(CsvCodec.parse(CsvCodec.synth($"text"))).as("r"))
      .select($"r.content_id", $"r.content_raw").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sortBy(_._1)
    val md5p = java.security.MessageDigest.getInstance("MD5")
      .digest(tricky.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    assert(rows == Seq(
      (s"http://example.com/$md5p#0", tricky.take(200)),
      (s"http://example.com/$md5p#1", tricky.drop(200))), rows.toString)
    // a hand-written dump: header never ingested (even though its
    // text cell is non-empty), quoted commas survive, short/empty
    // records drop, url-less records fall back to the line ordinal
    val dump = Seq(
      "id,url,text",
      """7,http://a/1,"alpha, beta"""",
      "8,http://a/2,",
      """9,,gamma""").mkString("\n").getBytes("UTF-8")
    val got = Seq(dump).toDF("p")
      .select(explode(CsvCodec.parse($"p")).as("r"))
      .select($"r.content_id", $"r.content_raw").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("http://a/1", "alpha, beta"), ("line-3", "gamma")),
      got.toString)
    val recs = DocParse.records(
      Seq(("d.csv", dump)).toDF("doc_name", "payload"), "csv").collect()
    assert(recs.length == 2 &&
      recs.forall(_.getAs[String]("doc_type") == "csv"), recs.toSeq.toString)
  }

  test("line-framed codecs: CRLF endings clean, multi-line CSV records drop whole") {
    import graft.functions.{CsvCodec, JsonlCodec}
    def parse(codec: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        payload: Array[Byte]) =
      Seq(payload).toDF("p").select(explode(codec($"p")).as("r"))
        .select($"r.content_raw").collect().map(_.getString(0)).toSeq
    // an Excel-style CRLF dump must not leave \r inside the last field
    val crlfCsv = "id,url,text\r\n7,http://a/1,hello\r\n8,http://a/2,world\r\n"
    assert(parse(CsvCodec.parse, crlfCsv.getBytes("UTF-8")) ==
      Seq("hello", "world"))
    val crlfJsonl =
      "{\"url\":\"u1\",\"text\":\"alpha\"}\r\n{\"url\":\"u2\",\"text\":\"beta\"}\r\n"
    assert(parse(JsonlCodec.parse, crlfJsonl.getBytes("UTF-8")) ==
      Seq("alpha", "beta"))
    // a quoted field with an embedded newline (out of scope) DROPS
    // whole — both physical-line fragments carry unbalanced quotes —
    // instead of truncating to the pre-newline prefix
    val multiline =
      "id,url,text\n7,http://a/1,\"abc\ndef\"\n8,http://a/2,ok\n"
    assert(parse(CsvCodec.parse, multiline.getBytes("UTF-8")) == Seq("ok"))
  }

  test("EPUB: percent-encoded hrefs and image refs resolve to their parts") {
    import graft.functions.expressions.ParseEpub
    val opf =
      """<package xmlns="http://www.idpf.org/2007/opf">
        |<manifest><item id="c1" href="text/my%20chapter.xhtml"/></manifest>
        |<spine><itemref idref="c1"/></spine></package>""".stripMargin
    val got = Seq(epubZip("META-INF/container.xml" -> epubContainer,
      "book.opf" -> opf,
      "text/my chapter.xhtml" ->
        """<body><p>spaced out<img src="../images/cover%20art.png"/></p></body>""",
      "images/cover art.png" -> "PNGBYTES"))
      .toDF("p").select(explode(ParseEpub($"p")).as("r"))
      .select($"r.content_type", $"r.content_id", $"r.content_raw").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(got == Seq(
      ("image", "text/my%20chapter.xhtml#/body[1]/p[1]/img[1]",
        java.util.Base64.getEncoder.encodeToString("PNGBYTES".getBytes("UTF-8"))),
      ("text_block", "text/my%20chapter.xhtml#/body[1]/p[1]", "spaced out")),
      got.toString)
  }

  test("ODT: synth round-trips; teletype whitespace; container defects loud") {
    import graft.functions.expressions.{ParseOdt, SynthOdt}
    val text = ("a" * 200) + ("b" * 50)
    val rows = Seq(text).toDF("text")
      .select(explode(ParseOdt(SynthOdt($"text"))).as("r"))
      .select($"r.content_type", $"r.content_id", $"r.content_raw",
        $"r.x1", $"r.y1")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4))).toSeq.sortBy(r => (r._1, r._2))
    val md5p = java.security.MessageDigest.getInstance("MD5")
      .digest(("a" * 200).getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(8)
    val b64 = java.util.Base64.getEncoder.encodeToString(md5p.getBytes("UTF-8"))
    assert(rows == Seq(
      ("image", "1000", b64, 100.0, 80.0),
      ("text_block", "0", "a" * 200, 0.0, 0.0),
      ("text_block", "1", "b" * 50, 0.0, 0.0),
      ("text_block", "2", "cell alpha", 0.0, 0.0),
      ("text_block", "3", "cell beta", 0.0, 0.0),
      ("text_block", "4", "cell gamma", 0.0, 0.0),
      ("text_block", "5", "cell delta", 0.0, 0.0)), rows.toString)
    // teletype semantics: text:s expands to its count, tab/line-break
    // map to their characters, spans flatten, nested frames' own
    // paragraphs emit separately
    val content =
      s"""<?xml version="1.0"?>
        |<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        | xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
        |<office:body><office:text>
        |<text:p>a<text:s text:c="3"/>b<text:tab/>c<text:line-break/>d</text:p>
        |<text:h text:outline-level="1">head<text:span>ing</text:span></text:h>
        |<text:p/>
        |<text:p>after empty</text:p>
        |</office:text></office:body></office:document-content>""".stripMargin
    val got = Seq(epubZip("content.xml" -> content)).toDF("p")
      .select(explode(ParseOdt($"p")).as("r"))
      .select($"r.content_id", $"r.content_raw").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("0", "a   b\tc\nd"), ("1", "heading"),
      ("3", "after empty")), got.toString)
    // machine-written container: defects are loud
    def err(z: Array[Byte]) = intercept[Exception](
      Seq(z).toDF("p").select(explode(ParseOdt($"p")).as("r"))
        .select($"r.content_id").collect()).getMessage
    assert(err(epubZip("styles.xml" -> "<a/>")).contains("no content.xml"))
    assert(err(epubZip("content.xml" -> "<wrong xmlns=\"urn:nope\"/>"))
      .contains("unsupported root namespace"))
    // records() routing: doc_type odt, images embed in the image space
    val recs = DocParse.records(
      Seq(("f.odt", SynthOdt.build("hello odt world"))).toDF("doc_name", "payload"),
      "odt").collect()
    // 1 chunk + 1 image + the 4 static table cells
    assert(recs.length == 6 &&
      recs.forall(_.getAs[String]("doc_type") == "odt"), recs.toSeq.toString)
  }

  test("line codecs: adversarial content round-trips (jsonl: anything; csv: newline-free)") {
    import graft.functions.{CsvCodec, JsonlCodec}
    val rng = new scala.util.Random(42)
    // generation units, not UTF-16 chars: a lone surrogate is not
    // valid Unicode text and no codec can round-trip it through UTF-8
    val alphabet = ("ab ,\"\\'<>&{}[]:;\t\u0001\u00e9\u4e2d|=%\n\rxyz0"
      .map(_.toString) :+ "\ud83d\ude00").toIndexedSeq
    val nasty = Seq(
      "\"", "\\", "{\"a\":1}", "a,b,c", "tab\there", "nl\ninside",
      "cr\rinside", "\u0000ctl", " lead and trail ", "e\u0301combining",
      "\ud83d\ude00emoji", "a" * 401) ++
      (0 until 60).map { _ =>
        (0 until (1 + rng.nextInt(450)))
          .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      }
    def roundTrip(codec: (org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        org.apache.spark.sql.Column => org.apache.spark.sql.Column), texts: Seq[String]): Unit = {
      val (synth, parse) = codec
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select($"id", explode(parse(synth($"text"))).as("r"))
        .select($"id", $"r.content_id", $"r.content_raw").collect()
      val byId = rows.groupBy(_.getLong(0))
      texts.zipWithIndex.foreach { case (t, i) =>
        val got = byId.getOrElse(i.toLong, Array.empty)
          .sortBy(_.getString(1).split('#').last.toInt)
          .map(_.getString(2)).mkString
        assert(got == t, s"codec mangled [$t] -> [$got]")
      }
    }
    roundTrip((JsonlCodec.synth _, JsonlCodec.parse _), nasty)
    // CSV's declared scope excludes record-internal newlines; within
    // it, the same adversarial set must survive
    roundTrip((CsvCodec.synth _, CsvCodec.parse _),
      nasty.map(_.replace('\n', '~').replace('\r', '~')))
  }


  test("tables: DOCX/ODT cell paragraphs land as ordinal rows, RTF cells split on \\cell") {
    import graft.functions.expressions.{ParseRtf, SynthDocx, SynthOdt}
    // RTF, hand-written: two cells + \row, then a plain paragraph;
    // nested-table words split too, and cells never CONCATENATE
    val rtf = ("{\\rtf1\\ansi " +
      "\\trowd\\cellx4000\\cellx8000 alpha one\\cell beta two\\cell\\row " +
      "tail para\\par}").getBytes("ISO-8859-1")
    val rows = ParseRtf.parse(rtf).map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      .map(r => (r.getUTF8String(2).toString, r.getUTF8String(3).toString))
    assert(rows.toSeq == Seq(("0", "alpha one"), ("1", "beta two"), ("3", "tail para")),
      rows.toSeq.toString)
    // DOCX/ODT: the synthetic table's four cells land after the chunk
    // paragraphs with document-order ordinals ("one chunk" = 1 chunk)
    def cellsOf(payload: Array[Byte], parse: Array[Byte] => Array[Any]) =
      parse(payload).map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
        .filter(_.getUTF8String(1).toString == "text_block")
        .map(r => (r.getUTF8String(2).toString, r.getUTF8String(3).toString)).toSeq
    val expected = Seq(("0", "one chunk"), ("1", "cell alpha"),
      ("2", "cell beta"), ("3", "cell gamma"), ("4", "cell delta"))
    val docxRows = {
      import org.apache.spark.sql.catalyst.expressions.Literal
      val e = graft.functions.expressions.ParseDocx(Literal(SynthDocx.build("one chunk")))
      e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
        .filter(_.getUTF8String(1).toString == "text_block")
        .map(r => (r.getUTF8String(2).toString, r.getUTF8String(3).toString)).toSeq
    }
    assert(docxRows == expected, docxRows.toString)
    val odtRows = {
      import org.apache.spark.sql.catalyst.expressions.Literal
      val e = graft.functions.expressions.ParseOdt(Literal(SynthOdt.build("one chunk")))
      e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
        .filter(_.getUTF8String(1).toString == "text_block")
        .map(r => (r.getUTF8String(2).toString, r.getUTF8String(3).toString)).toSeq
    }
    assert(odtRows == expected, odtRows.toString)
  }

  test("RTF: round-trip, escapes, destination skip, pict rows; non-RTF loud") {
    import graft.functions.expressions.{ParseRtf, SynthRtf}
    // synth round-trip: paragraphs verbatim, pict bytes + bbox
    val text = ("a" * 200) + " b{c}\\d " + ("e" * 50)
    val rows = Seq(text).toDF("text")
      .select(explode(ParseRtf(SynthRtf($"text"))).as("r"))
      .select($"r.content_type", $"r.content_id", $"r.content_raw",
        $"r.x1", $"r.y1").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4))).toSeq.sortBy(r => (r._1, r._2))
    val md5p = java.security.MessageDigest.getInstance("MD5")
      .digest(("a" * 200).getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(8)
    val b64 = java.util.Base64.getEncoder.encodeToString(md5p.getBytes("UTF-8"))
    // table cells land at nc + [0,1] and nc + [3,4] (each \row's
    // flush claims the empty ordinal between rows); nc = 2 chunks
    assert(rows == Seq(
      ("image", "1000", b64, 100.0, 80.0),
      ("text_block", "0", "a" * 200, 0.0, 0.0),
      ("text_block", "1", text.drop(200), 0.0, 0.0),
      ("text_block", "2", "cell alpha", 0.0, 0.0),
      ("text_block", "3", "cell beta", 0.0, 0.0),
      ("text_block", "5", "cell gamma", 0.0, 0.0),
      ("text_block", "6", "cell delta", 0.0, 0.0)), rows.toString)
    // hand-written dialect: unicode escapes with fallback, hex bytes,
    // line/tab, optional destinations, stray '}' and unknown words
    def parse(rtf: String) = Seq(rtf.getBytes("ISO-8859-1")).toDF("p")
      .select(explode(ParseRtf($"p")).as("r"))
      .select($"r.content_id", $"r.content_raw").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val got = parse(
      "{\\rtf1\\ansi\\uc1{\\fonttbl{\\f0 X;}}{\\*\\weird junk}" +
        "\\pard caf\\'e9 \\u1087?\\u1080? ok\\line two\\tab t\\par" +
        "{\\info{\\title hidden}}\\unknownword \\pard last}")
    assert(got == Seq(("0", "café пи ok\ntwo\tt"),
      ("1", "last")), got.toString)
    // Word's symbol words are CONTENT (an export writes every quote
    // and dash this way); raw newlines round-trip via escapes
    // (\'xx is 4 fixed chars, NO delimiter consumption — the space
    // after it is content, unlike the one after \enspace)
    val sym = parse("{\\rtf1 a\\emdash b\\lquote c\\rquote\\bullet\\enspace d\\'0a e\\par}")
    assert(sym == Seq(("0", "a—b‘c’• d\n e")), sym.toString)
    assert(Seq("nl\ninside").toDF("text")
      .select(explode(graft.functions.expressions.ParseRtf(
        graft.functions.expressions.SynthRtf($"text"))).as("r"))
      .select($"r.content_raw").collect()(0).getString(0) == "nl\ninside")
    // Word's dual-representation picture: ONE image row, the shppict
    // primary — the \nonshppict WMF fallback must not double it
    val dual = Seq(("{\\rtf1{\\*\\shppict{\\pict\\picw9\\pich7 4142}}" +
      "{\\nonshppict{\\pict\\picw9\\pich7 9999}}\\pard x\\par}")
      .getBytes("ISO-8859-1")).toDF("p")
      .select(explode(graft.functions.expressions.ParseRtf($"p")).as("r"))
      .select($"r.content_type", $"r.content_raw").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(dual == Seq(
      ("image", java.util.Base64.getEncoder.encodeToString("AB".getBytes)),
      ("text_block", "x")), dual.toString)
    // \binN raw bytes skip whole — the 0x7D/0x7B bytes inside the
    // blob must not touch group nesting; a binary pict emits no row
    // (out of decode scope, documented)
    val bin = parse("{\\rtf1{\\pict\\bin4 A}B{}\\pard ok\\par}")
    assert(bin == Seq(("0", "ok")), bin.toString)
    // non-RTF payloads are loud (machine-written container)
    val e = intercept[Exception](parse("plain text"))
    assert(e.getMessage.contains("{\\rtf"), e.getMessage)
    // records() routing
    val recs = DocParse.records(
      Seq(("f.rtf", SynthRtf.build("hello rtf world"))).toDF("doc_name", "payload"),
      "rtf").collect()
    // 1 paragraph + 1 pict + the 4 static table cells
    assert(recs.length == 6 &&
      recs.forall(_.getAs[String]("doc_type") == "rtf"), recs.toSeq.toString)
  }

  test("EPUB: records() routes the format; chapter titles never embed") {
    import graft.functions.expressions.SynthEpub
    val payloads = Seq(("b.epub", SynthEpub.build("hello epub world")))
      .toDF("doc_name", "payload")
    val recs = DocParse.records(payloads, "epub").collect()
    assert(recs.length == 2, recs.toSeq.toString) // 1 text chunk + 1 image
    val byType = recs.groupBy(_.getAs[String]("content_type"))
    assert(byType.keySet == Set(ContentTypes.TextChunk, ContentTypes.Image))
    assert(byType(ContentTypes.TextChunk).head
      .getAs[String]("content_raw") == "hello epub world")
    assert(recs.forall(_.getAs[String]("doc_type") == "epub"))
  }

  test("widthsOf: every declared-metrics branch parses; undeclared shapes estimate") {
    import graft.functions.expressions.ParsePdf
    import graft.functions.expressions.ParsePdf.{CidWidths, EstimateWidths, SimpleWidths}
    def doc(objs: (Int, String)*): Map[Int, (String, Option[Array[Byte]])] =
      objs.map { case (n, src) => n -> (src, None) }.toMap
    // simple font, direct /Widths + /MissingWidth via /FontDescriptor
    val d1 = doc(9 -> "<< /Type /FontDescriptor /MissingWidth 333 >>")
    ParsePdf.widthsOf(d1,
      "<< /Type /Font /FirstChar 32 /Widths [500 600 700] /FontDescriptor 9 0 R >>") match {
      case sw: SimpleWidths =>
        assert(sw.of(32) == 500.0 && sw.of(34) == 700.0)
        assert(sw.of(31) == 333.0 && sw.of(99) == 333.0, "MissingWidth outside range")
      case other => fail(s"expected SimpleWidths, got $other")
    }
    // INDIRECT /Widths array object; no descriptor -> 500 default
    val d2 = doc(7 -> "[400 410 420]")
    ParsePdf.widthsOf(d2,
      "<< /Type /Font /FirstChar 65 /Widths 7 0 R >>") match {
      case sw: SimpleWidths =>
        assert(sw.of(66) == 410.0 && sw.of(64) == 500.0)
      case other => fail(s"expected SimpleWidths, got $other")
    }
    // composite: inline /DescendantFonts, /W BOTH grammar forms + /DW
    val d3 = doc(5 -> "<< /Type /Font /Subtype /CIDFontType2 /DW 800 /W [ 1 [600 650] 10 12 700 ] >>")
    ParsePdf.widthsOf(d3,
      "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H /DescendantFonts [5 0 R] >>") match {
      case cw: CidWidths =>
        assert(cw.of(1) == 600.0 && cw.of(2) == 650.0, "c [w...] form")
        assert(cw.of(10) == 700.0 && cw.of(12) == 700.0, "c1 c2 w form")
        assert(cw.of(99) == 800.0, "/DW default")
      case other => fail(s"expected CidWidths, got $other")
    }
    // composite with an INDIRECT /DescendantFonts ARRAY object (the
    // round-16 fix: the indirect object is the array, never the dict)
    val d4 = doc(8 -> "[5 0 R]",
      5 -> "<< /Type /Font /Subtype /CIDFontType2 /DW 900 >>")
    ParsePdf.widthsOf(d4,
      "<< /Type /Font /Subtype /Type0 /DescendantFonts 8 0 R >>") match {
      case cw: CidWidths => assert(cw.of(3) == 900.0)
      case other => fail(s"expected CidWidths via the indirect array, got $other")
    }
    // undeclared shapes -> estimate: no /Widths; /Widths without
    // /FirstChar; composite with neither /W nor a non-default /DW
    assert(ParsePdf.widthsOf(doc(), "<< /Type /Font /BaseFont /Helvetica >>")
      == EstimateWidths)
    assert(ParsePdf.widthsOf(doc(), "<< /Type /Font /Widths [500] >>")
      == EstimateWidths)
    val d5 = doc(5 -> "<< /Type /Font /Subtype /CIDFontType2 >>")
    assert(ParsePdf.widthsOf(d5,
      "<< /Type /Font /DescendantFonts [5 0 R] >>") == EstimateWidths)
    // an unrecognized /W token must fail LOUDLY, never reparse as a
    // different grammar form (r17: '/W [1 3 0 R]' used to drop the R
    // and read range form c1=1,c2=3,w=0 — silent zero-width glyphs)
    val d6 = doc(5 ->
      "<< /Type /Font /Subtype /CIDFontType2 /W [1 3 0 R] >>")
    val e = intercept[IllegalArgumentException] {
      ParsePdf.widthsOf(d6,
        "<< /Type /Font /Subtype /Type0 /DescendantFonts [5 0 R] >>")
    }
    assert(e.getMessage.contains("unsupported token 'R'"))
    val d7 = doc(5 ->
      "<< /Type /Font /Subtype /CIDFontType2 /W [1 [600 /Bogus]] >>")
    assert(intercept[IllegalArgumentException] {
      ParsePdf.widthsOf(d7,
        "<< /Type /Font /Subtype /Type0 /DescendantFonts [5 0 R] >>")
    }.getMessage.contains("unsupported token"))
  }
}
