package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic REAL PNG for a text column — the fixture generator
  * behind the perceptual-hash gate (mm_phash_px): a 64x48 image whose
  * CONTENT derives from the text's 20-char PREFIX (an 8x6 grid of
  * md5-seeded blocks over a fixed gradient) plus a +/-1 noise term
  * from the full text. Documents sharing a prefix therefore render
  * NEAR-DUPLICATE images — same structure, different pixel noise —
  * which is exactly the planted signal a perceptual hash must recall,
  * while different prefixes avalanche into unrelated images.
  *
  * The ENCODING routes on the full-text md5, independent of content:
  *  - FORMAT share (byte-1 high nibble mod 6): PNG / PNG / PNG / GIF
  *    (half interlaced) / BMP / WebP VP8L — the same raster
  *    re-encoded across four container formats hashes IDENTICALLY
  *    (BT.601 weights sum to 256, so the gray/identity-palette
  *    layouts all decode to the same luma): the
  *    recompressed-duplicate case across formats;
  *  - PNG color share (nibble 0 mod 3): grayscale (type 0) / RGB
  *    with equal channels (type 2) / identity-palette indexed
  *    (type 3) — three byte layouts of the SAME pixels;
  *  - PNG layout share (nibble 1 mod 3): all-None rows, a rotating
  *    None/Sub/Up/Average/Paeth schedule, or ADAM7 interlace (seven
  *    sub-image passes, rotating filters within each) — so every row
  *    filter and the interlace walk decode inside the driver gate,
  *    not just in fixtures.
  * PNG chunks carry real CRCs; IDAT is one zlib stream. */
case class SynthPng(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthPng needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthPng.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthPng =
    copy(child = c)
}

object SynthPng {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthPng(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  val W = 64
  val H = 48

  private def md5(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The luma raster for a text — exposed so specs can compare the
    * decoded PNG against the intended pixels. The 8x8 block field is
    * seeded per CELL by splitmix64 over the prefix digest (a periodic
    * reuse of the 16 digest bytes would repeat every two block rows,
    * zero out all odd vertical DCT frequencies for EVERY document,
    * and collapse the hash's entropy — measured 200 spurious <=7
    * pairs at sf0.01 before the mix); the shared gradient is a mild
    * +/-16 texture so block content, not common structure, decides
    * the hash bits. */
  private[graft] def pixels(text: String): Array[Byte] = {
    val block = md5(text.take(20)) // content: prefix-seeded
    val seed = java.nio.ByteBuffer.wrap(block, 0, 8).getLong
    val noise = md5(text) // identity: full-text-seeded
    def cell(i: Long): Int = { // splitmix64 finalizer (public domain)
      var z = seed + i * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 56).toInt
    }
    val out = new Array[Byte](W * H)
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        val b = cell((y / 8).toLong * 8 + (x / 8))
        val grad = ((2 * x + 3 * y) & 0xFF) - 128
        val n = ((noise((x * 7 + y * 13) % 16) >> (x % 5)) & 3) - 1
        val v = math.max(0, math.min(255, b + (grad >> 3) + n))
        out(y * W + x) = v.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val t = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32()
    crc.update(t)
    crc.update(data)
    val len = data.length
    val out = new java.io.ByteArrayOutputStream(len + 12)
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    be32(len); out.write(t); out.write(data); be32(crc.getValue)
    out.toByteArray
  }

  /** Forward PNG row filter (RFC 2083 §6) — the encoder side of
    * [[PixelDecode.unfilterRows]]. */
  private def filterRow(ft: Int, cur: Array[Byte], prev: Array[Byte],
      bpp: Int): Array[Byte] = {
    val n = cur.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = cur(i) & 0xFF
      val a = if (i >= bpp) cur(i - bpp) & 0xFF else 0
      val b = if (prev != null) prev(i) & 0xFF else 0
      val c = if (prev != null && i >= bpp) prev(i - bpp) & 0xFF else 0
      val v = ft match {
        case 0 => x
        case 1 => x - a
        case 2 => x - b
        case 3 => x - (a + b) / 2
        case 4 =>
          val p = a + b - c
          val pa = math.abs(p - a); val pb = math.abs(p - b)
          val pc = math.abs(p - c)
          x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
      }
      out(i) = (v & 0xFF).toByte
      i += 1
    }
    out
  }

  /** Container format share (md5 byte-1 high nibble mod 6): 0-2 PNG
    * (the color/filter shares pick the flavor), 3 GIF (half of those
    * INTERLACED), 4 BMP, 5 WebP VP8L (subtract-green transform +
    * literal prefix codes — [[WebpDecode]]'s spec fixtures carry the
    * LZ77/cache/predictor burden). All encode the same [[pixels]]
    * raster, so the perceptual hash is container-invariant by
    * construction — the recompressed-duplicate case across FORMATS,
    * not just within PNG. */
  private[graft] def formatOf(text: String): Int =
    ((md5(text)(1) >> 4) & 0xF) % 6

  /** GIF89a writer: identity 256-entry palette, the fixed-width LZW
    * form (9-bit literal codes with a CLEAR every 253 pixels, so the
    * decoder's table never forces a width bump — the classic
    * "uncompressed GIF" technique); half the share interlaced (rows
    * written in the 4-pass order, flag set). Real compressed streams
    * with width growth and KwKwK are PixelSpec's round-trip burden. */
  private def buildGif(px: Array[Byte], interlaced: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(W * H * 2)
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(W); le16(H)
    out.write(0xF7) // GCT present, 8-bit color res, 256 entries
    out.write(0); out.write(0)
    (0 until 256).foreach { i => out.write(i); out.write(i); out.write(i) }
    out.write(0x2C); le16(0); le16(0); le16(W); le16(H)
    out.write(if (interlaced) 0x40 else 0x00)
    out.write(8) // LZW min code size
    val rows: Seq[Int] =
      if (!interlaced) 0 until H
      else (0 until H by 8) ++ (4 until H by 8) ++
        (2 until H by 4) ++ (1 until H by 2)
    // 9-bit LSB-first code stream: CLEAR, then literals with a CLEAR
    // every 253 codes (decoder table stays under the width-bump line)
    val codes = new java.io.ByteArrayOutputStream(W * H * 2)
    var acc = 0L; var bits = 0
    def putCode(c: Int): Unit = {
      acc |= (c.toLong & 0x1FF) << bits; bits += 9
      while (bits >= 8) { codes.write((acc & 0xFF).toInt); acc >>>= 8; bits -= 8 }
    }
    putCode(256)
    var since = 0
    rows.foreach { y =>
      var x = 0
      while (x < W) {
        if (since == 253) { putCode(256); since = 0 }
        putCode(px(y * W + x) & 0xFF)
        since += 1
        x += 1
      }
    }
    putCode(257) // end of information
    if (bits > 0) codes.write((acc & 0xFF).toInt)
    val cb = codes.toByteArray
    var p = 0
    while (p < cb.length) {
      val n = math.min(255, cb.length - p)
      out.write(n); out.write(cb, p, n)
      p += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** VP8L bit writer: plain fields go LSB-first, prefix codes go
    * MSB-of-code-first (the RFC 1951 convention the spec adopts).
    * Exposed to PixelSpec for hand-assembling streams that exercise
    * decoder paths (LZ77, color cache, transforms) this encoder's
    * literal form never emits. */
  private[graft] final class Vp8lWriter {
    private val out = new java.io.ByteArrayOutputStream(4096)
    private var acc = 0L
    private var nbits = 0
    def bits(v: Int, n: Int): this.type = {
      acc |= (v.toLong & ((1L << n) - 1)) << nbits
      nbits += n
      while (nbits >= 8) { out.write((acc & 0xFF).toInt); acc >>>= 8; nbits -= 8 }
      this
    }
    def code(c: Int, len: Int): this.type = {
      var i = len - 1
      while (i >= 0) { bits((c >> i) & 1, 1); i -= 1 }
      this
    }
    /** Finished VP8L payload wrapped in a RIFF/WEBP container. */
    def toWebp: Array[Byte] = {
      if (nbits > 0) { out.write((acc & 0xFF).toInt); acc = 0; nbits = 0 }
      val payload = out.toByteArray
      val o = new java.io.ByteArrayOutputStream(payload.length + 24)
      def le32(v: Int): Unit = {
        o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
        o.write((v >> 16) & 0xFF); o.write((v >> 24) & 0xFF)
      }
      o.write("RIFF".getBytes("US-ASCII"))
      le32(4 + 8 + payload.length + (payload.length & 1))
      o.write("WEBP".getBytes("US-ASCII"))
      o.write("VP8L".getBytes("US-ASCII"))
      le32(payload.length)
      o.write(payload)
      if ((payload.length & 1) == 1) o.write(0) // RIFF pad
      o.toByteArray
    }
  }

  /** VP8L header + the subtract-green transform announcement — shared
    * by [[buildWebp]] and the spec's hand-built streams. */
  private[graft] def vp8lHeader(bw: Vp8lWriter, w: Int, h: Int): Vp8lWriter =
    bw.bits(0x2F, 8).bits(w - 1, 14).bits(h - 1, 14).bits(0, 1).bits(0, 3)

  /** Write the flat 256-literal green code (all lengths 8 — complete
    * by Kraft, canonical code i = i) via the normal form, plus
    * single-symbol simple codes for the other four alphabets; gray
    * value rides in GREEN, red/blue are zero under subtract-green.
    * Exposed so the spec's hand-built streams reuse the exact
    * prelude. */
  private[graft] def writeFlatCodes(bw: Vp8lWriter): Vp8lWriter = {
    bw.bits(0, 1) // green: normal form
    bw.bits(10, 4) // num_code_lengths - 4 = 14 (covers CL symbols 0 and 8)
    // CL order [17,18,0,1,2,3,4,5,16,6,7,8,9,10]: length 1 for
    // symbols 0 and 8 → a complete 2-symbol CL code (0→bit 0, 8→bit 1)
    val clLens = Seq(0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0)
    clLens.foreach(l => bw.bits(l, 3))
    bw.bits(0, 1) // no max_symbol cap
    (0 until 256).foreach(_ => bw.bits(1, 1)) // '8' × 256
    (0 until 24).foreach(_ => bw.bits(0, 1)) // '0' × 24 length symbols
    // red, blue: simple 1-symbol (0) — zero bits per pixel
    bw.bits(1, 1).bits(0, 1).bits(0, 1).bits(0, 1)
    bw.bits(1, 1).bits(0, 1).bits(0, 1).bits(0, 1)
    // alpha: simple 1-symbol 255 (8-bit form)
    bw.bits(1, 1).bits(0, 1).bits(1, 1).bits(255, 8)
    // distance: simple 1-symbol 0 (present but never consulted)
    bw.bits(1, 1).bits(0, 1).bits(0, 1).bits(0, 1)
    bw
  }

  /** WebP VP8L: subtract-green transform (so the gray value lives in
    * the green channel alone — red/blue collapse to single-symbol
    * codes) + flat literal prefix codes, one 8-bit code per pixel. */
  private def buildWebp(px: Array[Byte]): Array[Byte] = {
    val bw = vp8lHeader(new Vp8lWriter, W, H)
    bw.bits(1, 1).bits(2, 2) // one transform: subtract green
    bw.bits(0, 1) // no more transforms
    bw.bits(0, 1) // no color cache
    bw.bits(0, 1) // no meta prefix groups
    writeFlatCodes(bw)
    px.foreach(v => bw.code(v & 0xFF, 8)) // green literal = luma
    bw.toWebp
  }

  /** Uncompressed 24-bit bottom-up BMP (BGR = the gray value). */
  private def buildBmp(px: Array[Byte]): Array[Byte] = {
    val rowLen = ((W * 24 + 31) / 32) * 4
    val size = 54 + rowLen * H
    val out = new java.io.ByteArrayOutputStream(size)
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    out.write('B'); out.write('M'); le32(size); le32(0); le32(54)
    le32(40); le32(W); le32(H); le16(1); le16(24)
    le32(0); le32(rowLen * H); le32(0); le32(0); le32(0); le32(0)
    var y = H - 1
    while (y >= 0) {
      var x = 0
      while (x < W) {
        val v = px(y * W + x) & 0xFF
        out.write(v); out.write(v); out.write(v)
        x += 1
      }
      var pad = rowLen - W * 3
      while (pad > 0) { out.write(0); pad -= 1 }
      y -= 1
    }
    out.toByteArray
  }

  private[graft] def build(text: String): Array[Byte] = {
    val px = pixels(text)
    val d = md5(text)
    formatOf(text) match {
      case 3 => return buildGif(px, interlaced = (d(1) & 1) == 1)
      case 4 => return buildBmp(px)
      case 5 => return buildWebp(px)
      case _ => () // PNG flavors below
    }
    val colorShare = ((d(0) >> 4) & 0xF) % 3 // 0 gray, 1 rgb, 2 palette
    // layout share: 0 all-None rows, 1 rotating filters, 2 Adam7
    val layout = (d(0) & 0xF) % 3
    val (colorType, channels) = colorShare match {
      case 1 => (2, 3)
      case 2 => (3, 1)
      case _ => (0, 1)
    }
    def rowBytes(ys: Seq[Int], xs: Seq[Int]): Array[Array[Byte]] =
      ys.map { y =>
        val row = new Array[Byte](xs.length * channels)
        xs.zipWithIndex.foreach { case (x, i) =>
          val v = px(y * W + x)
          if (channels == 3) {
            row(i * 3) = v; row(i * 3 + 1) = v; row(i * 3 + 2) = v
          } else row(i) = v
        }
        row
      }.toArray
    val filtered = new java.io.ByteArrayOutputStream(H * (W * channels + 1))
    def writePass(rows: Array[Array[Byte]], rotate: Boolean): Unit = {
      var prev: Array[Byte] = null
      rows.zipWithIndex.foreach { case (row, y) =>
        val ft = if (rotate) y % 5 else 0
        filtered.write(ft)
        filtered.write(filterRow(ft, row, prev, channels))
        prev = row
      }
    }
    if (layout == 2) {
      // Adam7: seven passes, each its own filtered scanline run
      val xStart = Array(0, 4, 0, 2, 0, 1, 0); val xStep = Array(8, 8, 4, 4, 2, 2, 1)
      val yStart = Array(0, 0, 4, 0, 2, 0, 1); val yStep = Array(8, 8, 8, 4, 4, 2, 2)
      (0 until 7).foreach { p =>
        val xs = xStart(p) until W by xStep(p)
        val ys = yStart(p) until H by yStep(p)
        if (xs.nonEmpty && ys.nonEmpty)
          writePass(rowBytes(ys, xs), rotate = true)
      }
    } else writePass(rowBytes(0 until H, 0 until W), rotate = layout == 1)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray)
    deflater.finish()
    val idat = new java.io.ByteArrayOutputStream(filtered.size())
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = new Array[Byte](13)
    def putBe32(p: Int, v: Int): Unit = {
      ihdr(p) = (v >> 24).toByte; ihdr(p + 1) = (v >> 16).toByte
      ihdr(p + 2) = (v >> 8).toByte; ihdr(p + 3) = v.toByte
    }
    putBe32(0, W); putBe32(4, H)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // depth 8
    if (layout == 2) ihdr(12) = 1 // Adam7
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    val plte =
      if (colorType == 3)
        chunk("PLTE", Array.tabulate[Byte](768)(i => (i / 3).toByte))
      else Array.emptyByteArray
    sig ++ chunk("IHDR", ihdr) ++ plte ++
      chunk("IDAT", idat.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
  }
}
