package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.expressions.{PixelDecode, SynthPng}
import graft.functions.expressions.PixelDecode.Raster

/** The pixel decoder + perceptual hash, fixture by fixture: every PNG
  * color type / depth / row filter, BMP layouts, loud structural
  * defects, encode-variant hash identity, resized-near-dup recall,
  * and the pigeonhole completeness of the mm_phash_px banding. */
class PixelSpec extends AnyFunSuite {

  // ---- a minimal local PNG encoder (independent of SynthPng's) ----

  private def crcChunk(t: String, data: Array[Byte]): Array[Byte] = {
    val tb = t.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
    be32(data.length) ++ tb ++ data ++ be32(crc.getValue.toInt)
  }
  private def be32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def zlib(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }
  private val Sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  /** raw = the FILTERED scanline stream (filter byte + row bytes). */
  private def png(w: Int, h: Int, depth: Int, colorType: Int,
      raw: Array[Byte], plte: Array[Byte] = null,
      interlace: Int = 0): Array[Byte] = {
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](depth.toByte, colorType.toByte, 0, 0, interlace.toByte)
    Sig ++ crcChunk("IHDR", ihdr) ++
      (if (plte != null) crcChunk("PLTE", plte) else Array.emptyByteArray) ++
      crcChunk("IDAT", zlib(raw)) ++ crcChunk("IEND", Array.emptyByteArray)
  }

  private def lumaOf(b: Array[Byte]): Raster =
    PixelDecode.decodeLuma(b).getOrElse(fail("decode returned None"))

  test("PNG gray-8 decodes verbatim; filters None/Sub/Up/Average/Paeth all undo") {
    val w = 5; val h = 5
    val pix = Array.tabulate[Byte](w * h)(i => ((i * 37 + 11) % 256).toByte)
    // encode the SAME pixels under each fixed filter type
    for (ft <- 0 to 4) {
      val raw = new java.io.ByteArrayOutputStream()
      var prev: Array[Byte] = null
      for (y <- 0 until h) {
        val row = pix.slice(y * w, y * w + w)
        raw.write(ft)
        for (i <- 0 until w) {
          val x = row(i) & 0xFF
          val a = if (i >= 1) row(i - 1) & 0xFF else 0
          val b = if (prev != null) prev(i) & 0xFF else 0
          val c = if (prev != null && i >= 1) prev(i - 1) & 0xFF else 0
          val v = ft match {
            case 0 => x
            case 1 => x - a
            case 2 => x - b
            case 3 => x - (a + b) / 2
            case 4 =>
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          }
          raw.write(v & 0xFF)
        }
        prev = row
      }
      val r = lumaOf(png(w, h, 8, 0, raw.toByteArray))
      assert(r.w == w && r.h == h)
      assert(r.luma.sameElements(pix), s"filter $ft")
    }
  }

  test("PNG color types: RGB luma weights, palette lookup, alpha ignored") {
    // 2x1 RGB: red and white
    val rgb = png(2, 1, 8, 2, Array[Byte](0,
      255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte))
    assert(lumaOf(rgb).luma.toSeq == Seq(((77 * 255 + 128) >> 8).toByte, 255.toByte))
    // palette: entry 0 = red, entry 1 = white
    val pal = png(2, 1, 8, 3, Array[Byte](0, 0, 1),
      plte = Array[Byte](255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte))
    assert(lumaOf(pal).luma.sameElements(lumaOf(rgb).luma))
    // gray+alpha / RGBA: alpha byte never moves luma
    val ga = png(1, 1, 8, 4, Array[Byte](0, 42, 7))
    assert(lumaOf(ga).luma.toSeq == Seq(42.toByte))
    val rgba = png(1, 1, 8, 6,
      Array[Byte](0, 10, 20, 30, 99.toByte))
    val rgbOnly = png(1, 1, 8, 2, Array[Byte](0, 10, 20, 30))
    assert(lumaOf(rgba).luma.sameElements(lumaOf(rgbOnly).luma))
  }

  test("PNG depths: 16-bit takes the MSB, 1-bit gray scales to 0/255, 4-bit palette unpacks") {
    val g16 = png(2, 1, 16, 0, Array[Byte](0, 0xAB.toByte, 0x01, 0x12, 0xFF.toByte))
    assert(lumaOf(g16).luma.toSeq == Seq(0xAB.toByte, 0x12.toByte))
    // 1-bit gray, 10 pixels over 2 rows: bits 10110 / 01001 (MSB first)
    val g1 = png(5, 2, 1, 0, Array[Byte](0, 0xB0.toByte, 0, 0x48.toByte))
    assert(lumaOf(g1).luma.map(_ & 0xFF).toSeq ==
      Seq(255, 0, 255, 255, 0, 0, 255, 0, 0, 255))
    // 4-bit palette: indexes 0x1, 0x0 in one byte
    val p4 = png(2, 1, 4, 3, Array[Byte](0, 0x10),
      plte = Array[Byte](0, 0, 0, 255.toByte, 255.toByte, 255.toByte))
    assert(lumaOf(p4).luma.map(_ & 0xFF).toSeq == Seq(255, 0))
  }

  test("PNG defects are loud: bad CRC, truncated IDAT, Adam7, bad palette index") {
    val ok = png(2, 2, 8, 0, Array[Byte](0, 1, 2, 0, 3, 4))
    assert(lumaOf(ok).luma.toSeq == Seq[Byte](1, 2, 3, 4))
    val badCrc = ok.clone(); badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 1).toByte
    assert(intercept[Exception](PixelDecode.decodeLuma(badCrc))
      .getMessage.contains("CRC"))
    // 4 filtered bytes cannot tile 2x(2+1)-byte rows
    val trunc = png(2, 2, 8, 0, Array[Byte](0, 1, 2, 0))
    assert(intercept[Exception](PixelDecode.decodeLuma(trunc))
      .getMessage.toLowerCase.contains("row shape"))
    // a whole missing row tiles cleanly but contradicts IHDR dims
    val short = png(2, 2, 8, 0, Array[Byte](0, 1, 2))
    assert(intercept[Exception](PixelDecode.decodeLuma(short))
      .getMessage.contains("IHDR dims"))
    // Adam7 with too few pass bytes: loud truncation, never garbage
    val adam7Short = png(2, 2, 8, 0, Array[Byte](0, 1, 2, 0, 3, 4), interlace = 1)
    assert(intercept[Exception](PixelDecode.decodeLuma(adam7Short))
      .getMessage.contains("Adam7"))
    val oob = png(1, 1, 8, 3, Array[Byte](0, 9), plte = Array[Byte](0, 0, 0))
    assert(intercept[Exception](PixelDecode.decodeLuma(oob))
      .getMessage.contains("palette index"))
    // not an image at all: None, not an exception
    assert(PixelDecode.decodeLuma("plain text".getBytes).isEmpty)
  }

  private def bmp24(w: Int, h: Int, bgr: Array[Byte], topDown: Boolean = false): Array[Byte] = {
    val rowLen = ((w * 24 + 31) / 32) * 4
    val px = new Array[Byte](rowLen * h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px(y * rowLen + x * 3 + c) = bgr((y * w + x) * 3 + c)
    val hh = if (topDown) -h else h
    "BM".getBytes ++ le32(54 + px.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(hh) ++ Array[Byte](1, 0) ++
      Array[Byte](24, 0) ++ le32(0) ++ le32(px.length) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ px
  }
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  test("BMP: 24-bit bottom-up rows flip, top-down do not, compression is loud") {
    // STORAGE rows: row0=white, row1=black. Bottom-up: storage row 0
    // is the image's BOTTOM row, so the image reads black-then-white.
    val storage = Array[Byte](255.toByte, 255.toByte, 255.toByte, 0, 0, 0)
    val up = bmp24(1, 2, storage)
    assert(lumaOf(up).luma.map(_ & 0xFF).toSeq == Seq(0, 255))
    // top-down (negative height): storage order IS image order
    val down = bmp24(1, 2, storage, topDown = true)
    assert(lumaOf(down).luma.map(_ & 0xFF).toSeq == Seq(255, 0))
    val bf = up.clone(); bf(30) = 3 // BI_BITFIELDS
    assert(intercept[Exception](PixelDecode.decodeLuma(bf))
      .getMessage.contains("compression"))
    val rle = up.clone(); rle(30) = 1 // BI_RLE8 on a 24-bpp image
    assert(intercept[Exception](PixelDecode.decodeLuma(rle))
      .getMessage.contains("BI_RLE8 with 24 bpp"))
  }

  test("BMP: RLE8/RLE4 and 1/4-bpp palette decode; ImageIO cross-checks; loud edges") {
    System.setProperty("java.awt.headless", "true")
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def bmpPal(w: Int, h: Int, bpp: Int, comp: Int, pal: Array[Byte],
        data: Array[Byte]): Array[Byte] = {
      val dataOff = 54 + pal.length
      "BM".getBytes ++ le32(dataOff + data.length) ++ le32(0) ++
        le32(dataOff) ++ le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++
        le16(bpp) ++ le32(comp) ++ le32(data.length) ++ le32(0) ++
        le32(0) ++ le32(pal.length / 4) ++ le32(0) ++ pal ++ data
    }
    def gray4(vs: Int*): Array[Byte] =
      vs.flatMap(v => Array[Byte](v.toByte, v.toByte, v.toByte, 0)).toArray
    // hand-built RLE8 (bottom-up): a run, absolute mode with its pad
    // byte, EOL, a delta skip (skipped pixels stay index 0), EOB
    val pal8 = gray4(0, 255, 128, 64)
    val rle8 = Array[Byte](
      3, 1, // run: 3x index 1
      0, 3, 2, 3, 2, 0, // absolute: 2,3,2 (+ pad to even)
      0, 0, // end of line
      0, 2, 2, 0, // delta dx=2 dy=0
      4, 2, // run: 4x index 2
      0, 1) // end of bitmap
    val r8 = lumaOf(bmpPal(6, 2, 8, 1, pal8, rle8))
    assert(r8.luma.map(_ & 0xFF).toSeq ==
      Seq(0, 0, 128, 128, 128, 128, // top row (encoded second)
        255, 255, 255, 128, 64, 128), r8.luma.map(_ & 0xFF).toSeq.toString)
    // hand-built RLE4: a run alternates the value's nibbles; absolute
    // packs two per byte and pads to even bytes
    val pal4 = gray4((0 until 16).map(_ * 17): _*)
    val rle4 = Array[Byte](
      3, 0x12, // run: 1,2,1
      0, 3, 0x31, 0x30, // absolute (escape counts >= 3): 3,1,3
      0, 1) // end of bitmap
    val r4 = lumaOf(bmpPal(6, 1, 4, 2, pal4, rle4))
    assert(r4.luma.map(_ & 0xFF).toSeq == Seq(17, 34, 17, 51, 17, 51))
    // 4-bpp uncompressed, MSB-first nibbles, 4-byte-aligned rows
    val flat4 = lumaOf(bmpPal(3, 1, 4, 0, pal4,
      Array[Byte](0x12, 0x30, 0, 0)))
    assert(flat4.luma.map(_ & 0xFF).toSeq == Seq(17, 34, 51))
    // ImageIO cross-checks: the JDK writes RLE8 when asked, and 1-bpp
    // for binary images — both independent encoders
    val idx = new BufferedImage(23, 9, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 9; x <- 0 until 23) {
      val v = (x * 11 + y * 29) % 256
      idx.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val wr = ImageIO.getImageWritersByFormatName("bmp").next()
    val prm = wr.getDefaultWriteParam
    prm.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    prm.setCompressionType("BI_RLE8")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(idx, null, null), prm)
    ios.close()
    val rleBytes = bos.toByteArray
    assert(rleBytes(30) == 1, "fixture must really be BI_RLE8")
    val ours = lumaOf(rleBytes)
    val theirs = ImageIO.read(new java.io.ByteArrayInputStream(rleBytes))
    for (y <- 0 until 9; x <- 0 until 23) {
      val rgb = theirs.getRGB(x, y)
      val e = (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) +
        29 * (rgb & 0xFF) + 128) >> 8
      assert((ours.luma(y * 23 + x) & 0xFF) == e, s"rle8 pixel ($x,$y)")
    }
    val bin = new BufferedImage(19, 5, BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 5; x <- 0 until 19)
      bin.setRGB(x, y, if ((x + y * 3) % 5 < 2) 0xFFFFFF else 0)
    val bos1 = new java.io.ByteArrayOutputStream()
    ImageIO.write(bin, "bmp", bos1)
    val r1 = lumaOf(bos1.toByteArray)
    for (y <- 0 until 5; x <- 0 until 19)
      assert((r1.luma(y * 19 + x) & 0xFF) ==
        (if ((x + y * 3) % 5 < 2) 255 else 0), s"1-bpp pixel ($x,$y)")
    // loud edges: a run past the row end; a truncated RLE stream
    assert(intercept[Exception](PixelDecode.decodeLuma(
      bmpPal(4, 1, 8, 1, pal8, Array[Byte](6, 1, 0, 1))))
      .getMessage.contains("past the row end"))
    assert(intercept[Exception](PixelDecode.decodeLuma(
      bmpPal(4, 1, 8, 1, pal8, Array[Byte](2, 1))))
      .getMessage.contains("truncated"))
  }

  test("SynthPng: every encoding share decodes to the intended pixels (hash identity)") {
    // enough texts that all six FORMAT shares (3x png flavors, gif,
    // bmp, webp), the png color/filter shares, and both gif interlace
    // variants occur
    val texts = (0 until 60).map(i => s"pixel share text $i")
    val shares = texts.map { t =>
      val b = SynthPng.build(t)
      val r = lumaOf(b)
      assert(r.w == SynthPng.W && r.h == SynthPng.H, t)
      assert(r.luma.sameElements(SynthPng.pixels(t)),
        s"'$t' (format ${SynthPng.formatOf(t)}) decode != intended pixels")
      val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      (SynthPng.formatOf(t), ((d(0) >> 4) & 0xF) % 3, (d(0) & 0xF) % 3, d(1) & 1)
    }
    assert(shares.map(_._1).distinct.size == 6, "format shares unexercised")
    val pngShares = shares.filter(_._1 <= 2)
    assert(pngShares.map(_._2).distinct.size == 3, "png color shares unexercised")
    assert(pngShares.map(_._3).distinct.size == 3,
      "png layout shares (plain/filters/Adam7) unexercised")
    assert(shares.filter(_._1 == 3).map(_._4).distinct.size == 2,
      "gif interlace variants unexercised")
    // the hash is a function of PIXELS alone: re-encodings of one
    // raster — png gray here, whatever container the share picked for
    // the same text above — hash identically (decode equality holds
    // for every share, so this one end-to-end pin covers them all)
    val px = SynthPng.pixels("alpha")
    val gray = {
      val raw = new java.io.ByteArrayOutputStream()
      for (y <- 0 until SynthPng.H) {
        raw.write(0); raw.write(px, y * SynthPng.W, SynthPng.W)
      }
      png(SynthPng.W, SynthPng.H, 8, 0, raw.toByteArray)
    }
    assert(PixelDecode.phash64(lumaOf(gray)) ==
      PixelDecode.phash64(lumaOf(SynthPng.build("alpha"))))
  }

  test("GIF: LZW round-trips with width growth, clears, KwKwK; interlace; defects loud") {
    import graft.functions.expressions.SynthPng
    // a REAL compressed-LZW encoder living test-side: emits variable
    // width codes mirroring the decoder's table state (the decoder
    // adds one entry per code AFTER the first of each clear segment,
    // and widens when ITS table size reaches 1<<width)
    def gifOf(w: Int, h: Int, idx: Array[Byte], interlaced: Boolean = false,
        palette: Int => (Int, Int, Int) = i => (i, i, i)): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      out.write("GIF89a".getBytes); le16(w); le16(h); out.write(0xF7)
      out.write(0); out.write(0)
      (0 until 256).foreach { i =>
        val (r, g, b) = palette(i); out.write(r); out.write(g); out.write(b) }
      // a skippable extension before the frame (graphic control)
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0); le16(0); out.write(0); out.write(0)
      out.write(0x2C); le16(0); le16(0); le16(w); le16(h)
      out.write(if (interlaced) 0x40 else 0)
      out.write(8)
      // encoder
      val codes = new java.io.ByteArrayOutputStream()
      var acc = 0L; var bits = 0; var width = 9
      def put(c: Int): Unit = {
        acc |= (c.toLong & ((1L << width) - 1)) << bits; bits += width
        while (bits >= 8) { codes.write((acc & 0xFF).toInt); acc >>>= 8; bits -= 8 }
      }
      val table = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
      var next = 258
      var emitted = 0 // codes since the last clear
      def emit(c: Int): Unit = {
        put(c)
        emitted += 1
        // the decoder's table size after receiving `emitted` codes is
        // emitted - 1; it widens when 258 + (emitted - 1) == 1<<width
        if (258 + emitted - 1 == (1 << width) && width < 12) width += 1
      }
      put(256)
      val rowOrder: Seq[Int] =
        if (!interlaced) 0 until h
        else (0 until h by 8) ++ (4 until h by 8) ++
          (2 until h by 4) ++ (1 until h by 2)
      val stream = rowOrder.flatMap(y => (0 until w).map(x => idx(y * w + x) & 0xFF))
      var cur = stream.head
      stream.tail.foreach { c =>
        table.get((cur, c)) match {
          case Some(code) => cur = code
          case None =>
            emit(cur)
            if (next < 4096) { table((cur, c)) = next; next += 1 }
            else { put(256); table.clear(); next = 258; width = 9; emitted = 0 }
            cur = c
        }
      }
      emit(cur)
      put(257)
      if (bits > 0) codes.write((acc & 0xFF).toInt)
      val cb = codes.toByteArray
      var p = 0
      while (p < cb.length) {
        val n = math.min(255, cb.length - p)
        out.write(n); out.write(cb, p, n); p += n
      }
      out.write(0); out.write(0x3B)
      out.toByteArray
    }
    // pseudorandom indexes big enough to grow the width past 10 bits
    val rng = new scala.util.Random(7)
    val w = 64; val h = 64
    val idx = Array.fill[Byte](w * h)(rng.nextInt(256).toByte)
    val r = lumaOf(gifOf(w, h, idx))
    assert(r.w == w && r.h == h)
    assert(r.luma.sameElements(idx), "identity palette: luma == indexes")
    // KwKwK appears in runs; a constant image is all KwKwK
    val flat = Array.fill[Byte](w * h)(42)
    assert(lumaOf(gifOf(w, h, flat)).luma.sameElements(flat))
    // interlaced rows land back in display order
    val ri = lumaOf(gifOf(w, h, idx, interlaced = true))
    assert(ri.luma.sameElements(idx), "interlace pass order must undo")
    // a non-identity palette routes through BT.601 luma
    val two = gifOf(2, 1, Array[Byte](0, 1),
      palette = i => if (i == 0) (255, 0, 0) else (255, 255, 255))
    assert(lumaOf(two).luma.toSeq ==
      Seq(((77 * 255 + 128) >> 8).toByte, 255.toByte))
    // defects loud: truncated stream, missing trailer, bad block
    val ok = gifOf(4, 4, Array.fill[Byte](16)(9))
    val trunc = ok.dropRight(12)
    assert(intercept[Exception](PixelDecode.decodeLuma(trunc))
      .getMessage.toLowerCase.contains("gif"))
    // SynthPng's gif share round-trips through the driver expression
    val gifText = (0 until 200).map(i => s"gif probe $i")
      .find(t => SynthPng.formatOf(t) == 3).get
    assert(lumaOf(SynthPng.build(gifText)).luma
      .sameElements(SynthPng.pixels(gifText)))
  }

  test("animation frame-N: GIF disposal/transparency, APNG fcTL/fdAT, static re-encode hashes") {
    import graft.functions.expressions.SynthPng
    // minimal valid LZW: literal 9-bit codes with a CLEAR every <=252
    // (the uncompressed-GIF technique — decoder table never widens)
    def lzw(idx: Array[Byte]): Array[Byte] = {
      val codes = new java.io.ByteArrayOutputStream()
      var acc = 0L; var bits = 0
      def put(c: Int): Unit = {
        acc |= (c.toLong & 0x1FF) << bits; bits += 9
        while (bits >= 8) { codes.write((acc & 0xFF).toInt); acc >>>= 8; bits -= 8 }
      }
      put(256)
      idx.zipWithIndex.foreach { case (v, i) =>
        if (i > 0 && i % 250 == 0) put(256)
        put(v & 0xFF)
      }
      put(257)
      if (bits > 0) codes.write((acc & 0xFF).toInt)
      codes.toByteArray
    }
    // multi-frame GIF builder: (rect, idx, disposal, transparentIdx)
    def gif(sw: Int, sh: Int, bg: Int,
        frames: Seq[((Int, Int, Int, Int), Array[Byte], Int, Int)]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      out.write("GIF89a".getBytes); le16(sw); le16(sh)
      out.write(0xF7); out.write(bg); out.write(0)
      (0 until 256).foreach { i => out.write(i); out.write(i); out.write(i) }
      frames.foreach { case ((fx, fy, w, h), idx, disposal, trans) =>
        out.write(0x21); out.write(0xF9); out.write(4)
        out.write((disposal << 2) | (if (trans >= 0) 1 else 0))
        le16(0); out.write(math.max(trans, 0)); out.write(0)
        out.write(0x2C); le16(fx); le16(fy); le16(w); le16(h); out.write(0)
        out.write(8)
        val cb = lzw(idx)
        var p = 0
        while (p < cb.length) {
          val n = math.min(255, cb.length - p)
          out.write(n); out.write(cb, p, n); p += n
        }
        out.write(0)
      }
      out.write(0x3B)
      out.toByteArray
    }
    // frame 0 full screen, frame 1 a rect with a TRANSPARENT pixel
    // (underlying canvas shows through), frame 2 after a disposal-2
    // frame (rect restored to background before it draws)
    val f0 = Array.tabulate[Byte](8 * 4)(i => (10 + i).toByte)
    val f1 = Array[Byte](99, 7, 98.toByte, 97.toByte) // 2x2, idx 7 transparent
    val g = gif(8, 4, 5, Seq(
      ((0, 0, 8, 4), f0, 0, -1),
      ((2, 1, 2, 2), f1, 0, 7)))
    val r0 = PixelDecode.decodeFrame(g, 0)
    assert(r0.w == 8 && r0.h == 4 && r0.luma.sameElements(f0))
    val r1 = PixelDecode.decodeFrame(g, 1)
    val want1 = f0.clone()
    want1(1 * 8 + 2) = 99 // (2,1)
    // (3,1) = idx 7 transparent -> keeps f0's value
    want1(2 * 8 + 2) = 98.toByte
    want1(2 * 8 + 3) = 97.toByte
    assert(r1.luma.sameElements(want1),
      s"${r1.luma.toSeq} vs ${want1.toSeq}")
    // disposal 2: frame 1's rect restores to BACKGROUND before frame 2
    val g2 = gif(8, 4, 5, Seq(
      ((0, 0, 8, 4), f0, 0, -1),
      ((2, 1, 2, 2), Array[Byte](40, 41, 42, 43), 2, -1),
      ((0, 0, 1, 1), Array[Byte](77), 0, -1)))
    val r2 = PixelDecode.decodeFrame(g2, 2)
    val want2 = f0.clone()
    want2(0) = 77
    want2(1 * 8 + 2) = 5; want2(1 * 8 + 3) = 5 // bg index 5 -> luma 5
    want2(2 * 8 + 2) = 5; want2(2 * 8 + 3) = 5
    assert(r2.luma.sameElements(want2), r2.luma.toSeq.toString)
    // disposal 3: restore to PREVIOUS canvas instead
    val g3 = gif(8, 4, 5, Seq(
      ((0, 0, 8, 4), f0, 0, -1),
      ((2, 1, 2, 2), Array[Byte](40, 41, 42, 43), 3, -1),
      ((0, 0, 1, 1), Array[Byte](77), 0, -1)))
    val want3 = f0.clone(); want3(0) = 77
    assert(PixelDecode.decodeFrame(g3, 2).luma.sameElements(want3))
    // the static-re-encode near-dup case: an animated GIF whose first
    // frame is a static raster hashes WITH the static original
    val text = "animated re-encode probe"
    val static = SynthPng.pixels(text) // 64x48 luma
    val anim = gif(64, 48, 0, Seq(
      ((0, 0, 64, 48), static, 0, -1),
      ((0, 0, 4, 4), Array.fill[Byte](16)(0), 0, -1)))
    val staticHash = PixelDecode.phash64(
      PixelDecode.decodeLuma(SynthPng.build(text)).get)
    assert(PixelDecode.phash64(PixelDecode.decodeFrame(anim, 0)) == staticHash,
      "frame 0 of the animated re-encode must hash with the static twin")
    // ---- APNG: fcTL/fdAT with independent zlib streams ----
    def pngChunk(out: java.io.ByteArrayOutputStream, name: String,
        body: Array[Byte]): Unit = {
      def be(v: Int): Unit = { out.write(v >>> 24); out.write((v >> 16) & 0xFF)
        out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
      be(body.length)
      val nb = name.getBytes("US-ASCII")
      out.write(nb); out.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(nb); crc.update(body)
      be(crc.getValue.toInt)
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    def grayRows(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      (0 until h).foreach { y => o.write(0); o.write(px, y * w, w) }
      o.toByteArray
    }
    def be32b(v: Int) = Array[Byte]((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def fctl(seq: Int, w: Int, h: Int, x: Int, y: Int,
        dispose: Int, blend: Int): Array[Byte] =
      be32b(seq) ++ be32b(w) ++ be32b(h) ++ be32b(x) ++ be32b(y) ++
        Array[Byte](0, 1, 0, 100, dispose.toByte, blend.toByte)
    val aw = 6; val ah = 5
    val apx0 = Array.tabulate[Byte](aw * ah)(i => (50 + i).toByte)
    val patch = Array[Byte](9, 8, 7, 6) // 2x2 at (3,2)
    val ao = new java.io.ByteArrayOutputStream()
    ao.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    pngChunk(ao, "IHDR", be32b(aw) ++ be32b(ah) ++
      Array[Byte](8, 0, 0, 0, 0)) // gray-8
    pngChunk(ao, "acTL", be32b(2) ++ be32b(0))
    pngChunk(ao, "fcTL", fctl(0, aw, ah, 0, 0, 0, 0))
    pngChunk(ao, "IDAT", deflate(grayRows(apx0, aw, ah)))
    pngChunk(ao, "fcTL", fctl(1, 2, 2, 3, 2, 0, 1)) // blend-over, no alpha
    pngChunk(ao, "fdAT", be32b(2) ++ deflate(grayRows(patch, 2, 2)))
    pngChunk(ao, "IEND", Array.empty[Byte])
    val apng = ao.toByteArray
    assert(PixelDecode.decodeFrame(apng, 0).luma.sameElements(apx0))
    val a1 = PixelDecode.decodeFrame(apng, 1)
    val wantA = apx0.clone()
    wantA(2 * aw + 3) = 9; wantA(2 * aw + 4) = 8
    wantA(3 * aw + 3) = 7; wantA(3 * aw + 4) = 6
    assert(a1.luma.sameElements(wantA), a1.luma.toSeq.toString)
    // plain decodeLuma still reads the default image (frame 0 here)
    assert(PixelDecode.decodeLuma(apng).get.luma.sameElements(apx0))
    // loud edges: past the frame count, past MaxFrames, single-frame
    // formats, blend-over with an alpha-capable color type
    assert(intercept[Exception](PixelDecode.decodeFrame(apng, 2))
      .getMessage.contains("2 frames"))
    assert(intercept[Exception](PixelDecode.decodeFrame(g, 5))
      .getMessage.contains("frames"))
    assert(intercept[Exception](
      PixelDecode.decodeFrame(g, PixelDecode.MaxFrames))
      .getMessage.contains("out of scope"))
    val bmp = SynthPng.build((0 until 99).map(i => s"bmp probe $i")
      .find(t => SynthPng.formatOf(t) == 4).get)
    assert(PixelDecode.decodeFrame(bmp, 0).w > 0)
    assert(intercept[Exception](PixelDecode.decodeFrame(bmp, 1))
      .getMessage.contains("single-frame"))
    // blend-over + tRNS (keyed transparency) is the declared loud edge
    val to = new java.io.ByteArrayOutputStream()
    to.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    pngChunk(to, "IHDR", be32b(aw) ++ be32b(ah) ++ Array[Byte](8, 0, 0, 0, 0))
    pngChunk(to, "tRNS", Array[Byte](0, 50))
    pngChunk(to, "acTL", be32b(2) ++ be32b(0))
    pngChunk(to, "fcTL", fctl(0, aw, ah, 0, 0, 0, 0))
    pngChunk(to, "IDAT", deflate(grayRows(apx0, aw, ah)))
    pngChunk(to, "fcTL", fctl(1, 2, 2, 3, 2, 0, 1))
    pngChunk(to, "fdAT", be32b(2) ++ deflate(grayRows(patch, 2, 2)))
    pngChunk(to, "IEND", Array.empty[Byte])
    assert(intercept[Exception](PixelDecode.decodeFrame(to.toByteArray, 1))
      .getMessage.contains("blend-over"))
    // PixelFramePhash column: tolerant nulls past the count
    import SparkTestSession._
    import spark.implicits._
    val df = Seq(Tuple1(anim)).toDF("img")
    val hashes = df.select(
      graft.functions.expressions.PixelFramePhash(
        org.apache.spark.sql.functions.col("img"), 0).as("h0")).head()
    assert(hashes.getLong(0) == staticHash)
  }

  test("phash: recompression is hamming 0, noise/resize small, different content far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = PixelDecode.phash64(Raster(SynthPng.W, SynthPng.H, SynthPng.pixels("the fast table scan runs")))
    // same prefix, different tail = same blocks + different noise
    val noisy = PixelDecode.phash64(Raster(SynthPng.W, SynthPng.H, SynthPng.pixels("the fast table scan walks")))
    assert(ham(base, noisy) <= operators.Multimodal.PxMaxHamming,
      s"noise variant drifted ${ham(base, noisy)} bits")
    // a 2x box downscale of the same content
    val px = SynthPng.pixels("the fast table scan runs")
    val half = PixelDecode.resample(Raster(SynthPng.W, SynthPng.H, px), 24)
      .map(v => v.toByte)
    val resized = PixelDecode.phash64(Raster(24, 24, half))
    assert(ham(base, resized) <= operators.Multimodal.PxMaxHamming,
      s"resized variant drifted ${ham(base, resized)} bits")
    // different prefix = unrelated blocks
    val other = PixelDecode.phash64(Raster(SynthPng.W, SynthPng.H, SynthPng.pixels("completely different doc")))
    assert(ham(base, other) > operators.Multimodal.PxMaxHamming,
      s"unrelated content landed ${ham(base, other)} bits")
    // determinism + the median split (<= 32 bits set, ties below)
    assert(base == PixelDecode.phash64(Raster(SynthPng.W, SynthPng.H, SynthPng.pixels("the fast table scan runs"))))
    assert(java.lang.Long.bitCount(base) <= 32)
  }


  test("JPEG baseline: from-scratch decode cross-validated against an independent decoder") {
    System.setProperty("java.awt.headless", "true")
    import graft.functions.expressions.JpegDecode
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def jpegOf(img: BufferedImage): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", bo), "ImageIO jpeg writer missing")
      bo.toByteArray
    }
    def maxDiff(mine: PixelDecode.Raster, ref: BufferedImage): Int = {
      // the reference luma of ImageIO's decode: gray images read the
      // RASTER samples (getRGB would apply a gray->sRGB colorspace
      // conversion and shift every level); color decodes convert via
      // the same BT.601 integer weights as PixelDecode
      val gray = ref.getType == BufferedImage.TYPE_BYTE_GRAY
      var worst = 0
      for (y <- 0 until ref.getHeight; x <- 0 until ref.getWidth) {
        val l =
          if (gray) ref.getRaster.getSample(x, y, 0)
          else {
            val rgb = ref.getRGB(x, y)
            (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) +
              29 * (rgb & 0xFF) + 128) >> 8
          }
        worst = math.max(worst, math.abs(l - (mine.luma(y * mine.w + x) & 0xFF)))
      }
      worst
    }
    // grayscale: smooth gradient + blocks (ImageIO emits 1-component)
    val g = new BufferedImage(37, 29, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 29; x <- 0 until 37)
      g.getRaster.setSample(x, y, 0, (x * 5 + y * 3 + (x / 8) * 40) % 256)
    val gj = jpegOf(g)
    val mineG = JpegDecode.decodeLuma(gj)
    assert(mineG.w == 37 && mineG.h == 29)
    val refG = ImageIO.read(new java.io.ByteArrayInputStream(gj))
    // JPEG decode is not bit-specified; IDCT rounding differs by
    // implementation within the spec's accuracy bounds — a small
    // tolerance IS the correctness contract here
    assert(maxDiff(mineG, refG) <= 2,
      s"gray decode drifts ${maxDiff(mineG, refG)} levels from the reference")
    // color (3-component YCbCr, 4:2:0-subsampled chroma by default):
    // my luma plane vs the reference's BT.601 of its full decode.
    // chroma subsampling perturbs the reference's reconstructed R/G/B
    // slightly, so the tolerance is wider — still single-digit levels
    val c = new BufferedImage(41, 33, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 33; x <- 0 until 41)
      c.setRGB(x, y, ((x * 6 % 256) << 16) | ((y * 7 % 256) << 8) | ((x + y) * 3 % 256))
    val cj = jpegOf(c)
    val mineC = JpegDecode.decodeLuma(cj)
    assert(mineC.w == 41 && mineC.h == 33)
    val refC = ImageIO.read(new java.io.ByteArrayInputStream(cj))
    assert(maxDiff(mineC, refC) <= 6,
      s"color decode drifts ${maxDiff(mineC, refC)} levels from the reference")
    // determinism: byte-identical output on repeat decode
    assert(JpegDecode.decodeLuma(cj).luma.sameElements(mineC.luma))
    // the perceptual seam: a JPEG recompression of a raster lands
    // within the near-dup hamming bound of its lossless encoding
    import graft.functions.expressions.SynthPng
    val px = SynthPng.pixels("jpeg recompression probe")
    val src = new BufferedImage(SynthPng.W, SynthPng.H, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until SynthPng.H; x <- 0 until SynthPng.W)
      src.getRaster.setSample(x, y, 0, px(y * SynthPng.W + x) & 0xFF)
    val viaJpeg = PixelDecode.phash64(JpegDecode.decodeLuma(jpegOf(src)))
    val exact = PixelDecode.phash64(PixelDecode.Raster(SynthPng.W, SynthPng.H, px))
    val ham = java.lang.Long.bitCount(viaJpeg ^ exact)
    assert(ham <= operators.Multimodal.PxMaxHamming,
      s"jpeg recompression drifted $ham bits")
    // PixelPhash routes jpegs end-to-end
    import SparkTestSession._
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val viaExpr = Seq(jpegOf(src)).toDF("p")
      .select(graft.functions.expressions.PixelPhash($"p")).collect()(0).getLong(0)
    assert(viaExpr == viaJpeg)
    // scope edges loud: progressive SOF2, truncation, CMYK-ish SOF
    val prog = gj.clone()
    // rewrite the SOF0 marker to SOF2 (find FF C0)
    val at = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(at + 1) = 0xC2.toByte
    assert(intercept[Exception](JpegDecode.decodeLuma(prog))
      .getMessage.contains("progressive"))
    val trunc = gj.dropRight(gj.length / 3)
    assert(intercept[Exception](JpegDecode.decodeLuma(trunc))
      .getMessage.nonEmpty)
    assert(PixelDecode.decodeLuma("not an image".getBytes).isEmpty)
  }


  test("review hardening: dimension ceiling is loud; gray JPEG with 2x2 factors decodes non-interleaved") {
    System.setProperty("java.awt.headless", "true")
    import graft.functions.expressions.JpegDecode
    // a tiny payload DECLARING huge dims must fail before allocating
    val huge = png(60000, 60000, 8, 0, Array[Byte](0, 1))
    assert(intercept[Exception](PixelDecode.decodeLuma(huge))
      .getMessage.contains("decode ceiling"))
    // gray JPEG whose SOF declares 2x2 sampling factors: a single-
    // component scan is non-interleaved per ISO 10918-1 A.2.2, so the
    // decode must equal the 1x1 original (factors ignored), not
    // desynchronize
    val img = new java.awt.image.BufferedImage(37, 29,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 29; x <- 0 until 37)
      img.getRaster.setSample(x, y, 0, (x * 5 + y * 3) % 256)
    val bo = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bo)
    val orig = bo.toByteArray
    val base = JpegDecode.decodeLuma(orig)
    val patched = orig.clone()
    // find SOF0 and rewrite the component's sampling byte (1 comp:
    // marker + len(2) + prec(1) + h(2) + w(2) + n(1) + id(1) + hv(1))
    val at = (0 until patched.length - 1).find(i =>
      (patched(i) & 0xFF) == 0xFF && (patched(i + 1) & 0xFF) == 0xC0).get
    assert((patched(at + 9) & 0xFF) == 1, "expected a 1-component SOF")
    assert((patched(at + 11) & 0xFF) == 0x11, "expected 1x1 factors")
    patched(at + 11) = 0x22.toByte
    val re = JpegDecode.decodeLuma(patched)
    assert(re.luma.sameElements(base.luma),
      "2x2-factor grayscale must decode identically (non-interleaved scan)")
  }


  test("CMYK JPEG: 4-component decode cross-validated against the JDK raster reader; Adobe transforms pinned") {
    System.setProperty("java.awt.headless", "true")
    import graft.functions.expressions.JpegDecode
    import java.awt.image.{DataBuffer, Raster => JRaster}
    import javax.imageio.{ImageIO, IIOImage}
    // the INDEPENDENT encoder: the JDK jpeg writer accepts a 4-band
    // raster and emits a bare 4-component baseline JPEG (no APP14)
    val (w9, h5) = (24, 11)
    val wr4 = JRaster.createInterleavedRaster(DataBuffer.TYPE_BYTE, w9, h5, 4, null)
    for (y <- 0 until h5; x <- 0 until w9; b <- 0 until 4)
      wr4.setSample(x, y, b, (x * 7 + y * 11 + b * 53) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val jw = ImageIO.getImageWritersByFormatName("jpeg").next()
    jw.setOutput(ios)
    jw.write(null, new IIOImage(wr4, null, null), jw.getDefaultWriteParam)
    ios.close()
    val bare = bos.toByteArray
    // the INDEPENDENT decoder: readRaster returns the raw decoded
    // samples with no color conversion — the per-plane ground truth
    def rawPlanes(bytes: Array[Byte]): JRaster = {
      val rd = ImageIO.getImageReadersByFormatName("jpeg").next()
      rd.setInput(ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      rd.readRaster(0, null)
    }
    // replicate the documented composite exactly; only per-plane IDCT
    // rounding may differ between the two decoders
    def expectLuma(s: Array[Int], transform: Int): Int = {
      val inverted = transform >= 0
      var (c, m, y2) = (s(0), s(1), s(2))
      if (transform == 2) {
        val cb = s(1) - 128.0; val cr = s(2) - 128.0
        def cl(d: Double) = math.max(0, math.min(255, math.round(d).toInt))
        c = cl(s(0) + 1.402 * cr)
        m = cl(s(0) - 0.344136 * cb - 0.714136 * cr)
        y2 = cl(s(0) + 1.772 * cb)
      }
      val kEnc = if (inverted) s(3) else 255 - s(3)
      def chan(v: Int) = {
        val enc = if (inverted) v else 255 - v
        (enc * kEnc + 128) / 255
      }
      (77 * chan(c) + 150 * chan(m) + 29 * chan(y2) + 128) >> 8
    }
    def checkAgainstRaster(bytes: Array[Byte], transform: Int): Unit = {
      val rr = rawPlanes(bytes)
      val got = JpegDecode.decodeLuma(bytes)
      assert(got.w == w9 && got.h == h5)
      for (y <- 0 until h5; x <- 0 until w9) {
        val s = Array.tabulate(4)(b => rr.getSample(x, y, b))
        val e = expectLuma(s, transform)
        assert(math.abs((got.luma(y * w9 + x) & 0xFF) - e) <= 6,
          s"cmyk pixel ($x,$y) transform $transform: got " +
            s"${got.luma(y * w9 + x) & 0xFF} want ~$e from ${s.toSeq}")
      }
    }
    checkAgainstRaster(bare, -1)
    // inject an Adobe APP14 right after SOI: same entropy data, now
    // under the inverted-ink convention (transform 0) and YCCK (2)
    def withApp14(bytes: Array[Byte], tf: Int): Array[Byte] =
      bytes.take(2) ++ Array[Byte](0xFF.toByte, 0xEE.toByte, 0, 14,
        'A', 'd', 'o', 'b', 'e', 0, 100, 0, 0, 0, 0, tf.toByte) ++
        bytes.drop(2)
    checkAgainstRaster(withApp14(bare, 0), 0)
    checkAgainstRaster(withApp14(bare, 2), 2)
    // a writer that pads the APP14 past its 14 defined bytes must not
    // shift the transform read — it sits at a FIXED offset, not at the
    // segment end (the padding byte 9 would be misread as transform 9)
    def withPaddedApp14(bytes: Array[Byte], tf: Int): Array[Byte] =
      bytes.take(2) ++ Array[Byte](0xFF.toByte, 0xEE.toByte, 0, 17,
        'A', 'd', 'o', 'b', 'e', 0, 100, 0, 0, 0, 0, tf.toByte,
        9, 9, 9) ++ bytes.drop(2)
    checkAgainstRaster(withPaddedApp14(bare, 0), 0)
    checkAgainstRaster(withPaddedApp14(bare, 2), 2)
    // deterministic: the same payload decodes bit-identically
    val a = JpegDecode.decodeLuma(withApp14(bare, 2)).luma
    val b = JpegDecode.decodeLuma(withApp14(bare, 2)).luma
    assert(a.sameElements(b))
    // an unsupported precision stays loud (SOF precision byte patched)
    val ten = bare.clone()
    val at = (0 until ten.length - 1).find(i =>
      (ten(i) & 0xFF) == 0xFF && (ten(i + 1) & 0xFF) == 0xC0).get
    ten(at + 4) = 10
    assert(intercept[Exception](JpegDecode.decodeLuma(ten))
      .getMessage.contains("10-bit precision"))
  }

  test("12-bit JPEG: extended-sequential precision decodes with hand-pinned constants") {
    import graft.functions.expressions.JpegDecode
    // hand-built SOF1 precision-12 fixture: 16x8 gray, two DC-only
    // blocks through one-symbol Huffman tables and a 16-bit DQT. A
    // DC-only block IDCTs to the constant DC*q/8, so every expected
    // pixel is hand arithmetic: block 1 DC=1024, q=2 -> 2048/8=256
    // -> +2048 -> 2304 >> 4 = 144; block 2 pred+1500=2524 -> 5048/8
    // = 631 -> 2679 >> 4 = 167.
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int) = out.write(v & 0xFF)
    def u16(v: Int) = { u8(v >> 8); u8(v) }
    u16(0xFFD8) // SOI
    u16(0xFFDB); u16(2 + 1 + 128); u8(0x10) // DQT pq=1 tq=0
    u16(2); (1 until 64).foreach(_ => u16(1)) // q0=2, rest 1
    u16(0xFFC1); u16(11); u8(12); u16(8); u16(16); u8(1) // SOF1 12-bit
    u8(1); u8(0x11); u8(0) // comp 1, 1x1, tq 0
    def dht(cls: Int, sym: Int): Unit = {
      u16(0xFFC4); u16(2 + 17 + 1); u8(cls << 4)
      u8(1); (1 until 16).foreach(_ => u8(0)) // one len-1 code
      u8(sym)
    }
    dht(0, 11) // DC: category 11
    dht(1, 0x00) // AC: EOB
    u16(0xFFDA); u16(8); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0) // SOS
    // entropy, MSB-first: [0][1024:11][0] [0][1500:11][0], 1-padded
    var acc = 0L; var nb = 0
    def put(v: Int, n: Int): Unit = { acc = (acc << n) | (v & ((1L << n) - 1)); nb += n }
    put(0, 1); put(1024, 11); put(0, 1)
    put(0, 1); put(1500, 11); put(0, 1)
    val pad = (8 - nb % 8) % 8
    put((1 << pad) - 1, pad)
    val bytes = (nb / 8 - 1 to 0 by -1).map(i => ((acc >> (i * 8)) & 0xFF).toInt)
    bytes.foreach { b2 => u8(b2); if (b2 == 0xFF) u8(0) }
    u16(0xFFD9)
    val r = JpegDecode.decodeLuma(out.toByteArray)
    assert(r.w == 16 && r.h == 8)
    for (y <- 0 until 8; x <- 0 until 16)
      assert((r.luma(y * 16 + x) & 0xFF) == (if (x < 8) 144 else 167),
        s"12-bit pixel ($x,$y): ${r.luma(y * 16 + x) & 0xFF}")
  }

  test("12-bit JPEG: DC categories 12-15 decode (F.1.2.1.2 wide DIFF); 8-bit stays capped at 11") {
    import graft.functions.expressions.JpegDecode
    // same hand-built shape as the fixture above, but the DC table
    // carries category 12 and the single block's DIFF is 3000 — a
    // high-contrast 12-bit value (2048 <= 3000 < 4096) that any real
    // 12-bit writer emits routinely. DC=3000, q=2 -> 6000/8 = 750
    // -> +2048 = 2798 -> >> 4 = 174.
    def fixture(sofPrec: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u8(v: Int) = out.write(v & 0xFF)
      def u16(v: Int) = { u8(v >> 8); u8(v) }
      u16(0xFFD8)
      u16(0xFFDB); u16(2 + 1 + 128); u8(0x10) // DQT pq=1 tq=0
      u16(2); (1 until 64).foreach(_ => u16(1))
      u16(0xFFC1); u16(11); u8(sofPrec); u16(8); u16(8); u8(1)
      u8(1); u8(0x11); u8(0)
      def dht(cls: Int, sym: Int): Unit = {
        u16(0xFFC4); u16(2 + 17 + 1); u8(cls << 4)
        u8(1); (1 until 16).foreach(_ => u8(0))
        u8(sym)
      }
      dht(0, 12) // DC: category 12 — legal ONLY at 12-bit precision
      dht(1, 0x00)
      u16(0xFFDA); u16(8); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
      var acc = 0L; var nb = 0
      def put(v: Int, n: Int): Unit = { acc = (acc << n) | (v & ((1L << n) - 1)); nb += n }
      put(0, 1); put(3000, 12); put(0, 1)
      val pad = (8 - nb % 8) % 8
      put((1 << pad) - 1, pad)
      val bytes = (nb / 8 - 1 to 0 by -1).map(i => ((acc >> (i * 8)) & 0xFF).toInt)
      bytes.foreach { b2 => u8(b2); if (b2 == 0xFF) u8(0) }
      u16(0xFFD9)
      out.toByteArray
    }
    val r = JpegDecode.decodeLuma(fixture(12))
    assert(r.w == 8 && r.h == 8)
    assert(r.luma.forall(b => (b & 0xFF) == 174),
      s"12-bit cat-12 pixel: ${r.luma(0) & 0xFF}")
    // the same table at 8-bit precision is corrupt — the cap holds
    val e = intercept[IllegalArgumentException] {
      JpegDecode.decodeLuma(fixture(8))
    }
    assert(e.getMessage.contains("DC category 12"), e.getMessage)
  }

  test("EXIF orientation: all 8 transforms hand-pinned; a rotated-with-tag jpeg hashes with its upright twin") {
    System.setProperty("java.awt.headless", "true")
    import graft.functions.expressions.{JpegDecode, SynthPng}
    // 2x3 source: a b / c d / e f
    val src = Raster(2, 3, "abcdef".getBytes("US-ASCII"))
    def grid(o: Int): String = {
      val r = PixelDecode.orient(src, o)
      r.luma.map(_.toChar).mkString.grouped(r.w).mkString("/")
    }
    assert(grid(1) == "ab/cd/ef")
    assert(grid(2) == "ba/dc/fe", "mirror horizontal")
    assert(grid(3) == "fe/dc/ba", "rotate 180")
    assert(grid(4) == "ef/cd/ab", "mirror vertical")
    assert(grid(5) == "ace/bdf", "transpose")
    assert(grid(6) == "eca/fdb", "rotate 90 CW")
    assert(grid(7) == "fdb/eca", "transverse")
    assert(grid(8) == "bdf/ace", "rotate 270 CW")
    assert(grid(0) == "ab/cd/ef" && grid(9) == "ab/cd/ef",
      "out-of-range orientation tags are ignored")
    // end to end: store the image rotated 90 CCW with orientation 6 —
    // decodeLuma must return the DISPLAY image, so its phash lands by
    // its upright twin (jpeg quantization noise is the only drift)
    val px = SynthPng.pixels("orientation probe text")
    val W = SynthPng.W; val H = SynthPng.H
    def jpegOf(w: Int, h: Int, at: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, at(x, y))
      val bo = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bo)
      bo.toByteArray
    }
    val upright = jpegOf(W, H, (x, y) => px(y * W + x) & 0xFF)
    // stored-rotated: src(sx,sy) of the DISPLAY image lands at the
    // 90-CCW position; orientation 6 must rotate it back
    val rotated = jpegOf(H, W, (x, y) => px(x * W + (W - 1 - y)) & 0xFF)
    def withOrientation(jpeg: Array[Byte], o: Int): Array[Byte] = {
      def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
      def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      val tiff = "MM".getBytes ++ be16(42) ++ be32(8) ++ be16(1) ++
        be16(0x0112) ++ be16(3) ++ be32(1) ++ be16(o) ++ be16(0) ++ be32(0)
      val app1len = 2 + 6 + tiff.length
      jpeg.take(2) ++ Array[Byte](0xFF.toByte, 0xE1.toByte,
        (app1len >> 8).toByte, app1len.toByte) ++
        "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff ++ jpeg.drop(2)
    }
    val hu = PixelDecode.phash64(PixelDecode.decodeLuma(upright).get)
    val oriented = PixelDecode.decodeLuma(withOrientation(rotated, 6)).get
    assert(oriented.w == W && oriented.h == H, "orientation 6 must swap dims back")
    val hr = PixelDecode.phash64(oriented)
    val ham = java.lang.Long.bitCount(hu ^ hr)
    assert(ham <= operators.Multimodal.PxMaxHamming,
      s"rotated-with-tag twin drifted $ham bits")
    // WITHOUT the tag the rotation is a different image entirely
    val hNoTag = PixelDecode.phash64(PixelDecode.decodeLuma(rotated).get)
    assert(java.lang.Long.bitCount(hu ^ hNoTag) > operators.Multimodal.PxMaxHamming,
      "an untagged rotation must NOT hash with the upright twin (control)")
  }


  test("progressive JPEG (SOF2): multi-scan decode cross-validated against the independent decoder") {
    System.setProperty("java.awt.headless", "true")
    import graft.functions.expressions.JpegDecode
    import java.awt.image.BufferedImage
    import javax.imageio.{ImageIO, IIOImage, ImageWriteParam}
    def progressiveJpeg(img: BufferedImage): Array[Byte] = {
      val w = ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      val bo = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bo)
      w.setOutput(ios)
      w.write(null, new IIOImage(img, null, null), p)
      ios.close() // flush the image stream's cache into bo
      w.dispose()
      bo.toByteArray
    }
    def maxDiff(mine: PixelDecode.Raster, ref: BufferedImage): Int = {
      val gray = ref.getType == BufferedImage.TYPE_BYTE_GRAY
      var worst = 0
      for (y <- 0 until ref.getHeight; x <- 0 until ref.getWidth) {
        val l =
          if (gray) ref.getRaster.getSample(x, y, 0)
          else {
            val rgb = ref.getRGB(x, y)
            (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) +
              29 * (rgb & 0xFF) + 128) >> 8
          }
        worst = math.max(worst, math.abs(l - (mine.luma(y * mine.w + x) & 0xFF)))
      }
      worst
    }
    // grayscale progressive (DC first/refine + AC first/refine scans)
    val g = new BufferedImage(53, 41, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 41; x <- 0 until 53)
      g.getRaster.setSample(x, y, 0, (x * 7 + y * 5 + (y / 8) * 30) % 256)
    val gj = progressiveJpeg(g)
    // really progressive? (SOF2 + several scans)
    assert((0 until gj.length - 1).exists(i =>
      (gj(i) & 0xFF) == 0xFF && (gj(i + 1) & 0xFF) == 0xC2), "fixture not SOF2")
    val nScans = (0 until gj.length - 1).count(i =>
      (gj(i) & 0xFF) == 0xFF && (gj(i + 1) & 0xFF) == 0xDA)
    assert(nScans >= 3, s"fixture has only $nScans scans")
    val mineG = JpegDecode.decodeLuma(gj)
    assert(mineG.w == 53 && mineG.h == 41)
    val refG = ImageIO.read(new java.io.ByteArrayInputStream(gj))
    assert(maxDiff(mineG, refG) <= 2,
      s"progressive gray drifts ${maxDiff(mineG, refG)} levels")
    // color progressive (interleaved DC scans + per-component AC
    // scans over subsampled chroma — the history-driven refinement
    // bit consumption must stay in sync across all three components)
    // smooth gradients: a sawtooth chroma channel would make the
    // Y-vs-BT.601-of-upsampled-RGB comparison itself noisy (the
    // decisive coefficient-level check is the self-consistency below)
    val c = new BufferedImage(61, 47, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 47; x <- 0 until 61)
      c.setRGB(x, y, ((x * 4 % 256) << 16) | ((y * 5 % 256) << 8) | ((x + y) * 2 % 256))
    val cj = progressiveJpeg(c)
    val mineC = JpegDecode.decodeLuma(cj)
    val refC = ImageIO.read(new java.io.ByteArrayInputStream(cj))
    assert(maxDiff(mineC, refC) <= 6,
      s"progressive color drifts ${maxDiff(mineC, refC)} levels")
    // determinism
    assert(JpegDecode.decodeLuma(cj).luma.sameElements(mineC.luma))
    // DECISIVE: baseline and progressive encodes of one image carry
    // the SAME coefficients — the two decode paths must agree
    // bit-for-bit (any drift in the multi-scan accumulation, EOB
    // runs, or refinement bits would break exact equality)
    val boc = new java.io.ByteArrayOutputStream()
    ImageIO.write(c, "jpg", boc)
    assert(JpegDecode.decodeLuma(boc.toByteArray).luma.sameElements(mineC.luma),
      "progressive decode must equal the baseline decode of the same image")
    val bo = new java.io.ByteArrayOutputStream()
    ImageIO.write(g, "jpg", bo)
    val hBase = PixelDecode.phash64(JpegDecode.decodeLuma(bo.toByteArray))
    val hProg = PixelDecode.phash64(mineG)
    assert(java.lang.Long.bitCount(hBase ^ hProg) <= operators.Multimodal.PxMaxHamming,
      "progressive re-encode must hash with its baseline twin")
    // truncation mid-scan stays loud
    val trunc = gj.dropRight(gj.length / 4)
    assert(intercept[Exception](JpegDecode.decodeLuma(trunc)).getMessage.nonEmpty)
    // a corrupt spectral band end (Se > 63) must be loud, never write
    // into neighboring blocks' coefficient planes
    val badSe = gj.clone()
    val sosAt = (0 until badSe.length - 1).find(i =>
      (badSe(i) & 0xFF) == 0xFF && (badSe(i + 1) & 0xFF) == 0xDA).get
    val ns = badSe(sosAt + 4) & 0xFF
    val seAt = sosAt + 6 + 2 * ns
    if ((badSe(seAt) & 0xFF) > 0) { // an AC scan: corrupt its band end
      badSe(seAt + 1) = 0xFF.toByte
      assert(intercept[Exception](JpegDecode.decodeLuma(badSe))
        .getMessage.contains("spectral band"))
    }
  }


  test("TIFF: none/LZW/PackBits strips cross-validated; predictor, photometrics, palette") {
    System.setProperty("java.awt.headless", "true")
    import javax.imageio.{ImageIO, IIOImage, ImageWriteParam}
    import java.awt.image.BufferedImage
    def tiffOf(img: BufferedImage, compression: String): Array[Byte] = {
      val w = ImageIO.getImageWritersByFormatName("tiff").next()
      val p = w.getDefaultWriteParam
      if (compression != null) {
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionType(compression)
      }
      val bo = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bo)
      w.setOutput(ios)
      w.write(null, new IIOImage(img, null, null), p)
      ios.close() // flush the image stream's cache into bo
      w.dispose()
      bo.toByteArray
    }
    val g = new BufferedImage(37, 23, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 23; x <- 0 until 37)
      g.getRaster.setSample(x, y, 0, (x * 13 + y * 5) % 256)
    for (comp <- Seq(null, "LZW", "PackBits")) {
      val t = tiffOf(g, comp)
      val r = lumaOf(t)
      assert(r.w == 37 && r.h == 23, s"$comp dims")
      for (y <- 0 until 23; x <- 0 until 37)
        assert((r.luma(y * 37 + x) & 0xFF) == (x * 13 + y * 5) % 256,
          s"$comp pixel ($x,$y)")
    }
    // RGB with LZW (the predictor-2 + 3-sample path ImageIO emits)
    val c = new BufferedImage(29, 17, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 17; x <- 0 until 29)
      c.setRGB(x, y, ((x * 8 % 256) << 16) | ((y * 9 % 256) << 8) | ((x + y) * 4 % 256))
    val ct = tiffOf(c, "LZW")
    val cr = lumaOf(ct)
    for (y <- 0 until 17; x <- 0 until 29) {
      val l = (77 * (x * 8 % 256) + 150 * (y * 9 % 256) + 29 * ((x + y) * 4 % 256) + 128) >> 8
      assert((cr.luma(y * 29 + x) & 0xFF) == l, s"rgb pixel ($x,$y)")
    }
    // hand-built little-endian palette TIFF with WhiteIsZero twin
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def entry(tag: Int, typ: Int, count: Int, value: Array[Byte]) =
      le16(tag) ++ le16(typ) ++ le32(count) ++ value.padTo(4, 0.toByte)
    // 2x1 palette image: indexes 1, 0; palette 0 -> black, 1 -> white
    val pxData = Array[Byte](1, 0)
    val cmOff = 8 + 2 + 8 * 12 + 4 // header + count + entries + next
    val pxOff = cmOff + 6 * 2 // 3 * 2^? — we declare a 2-entry map
    val tiff = "II".getBytes ++ Array[Byte](42, 0) ++ le32(8) ++
      le16(8) ++
      entry(256, 3, 1, le16(2)) ++ entry(257, 3, 1, le16(1)) ++
      entry(258, 3, 1, le16(8)) ++ entry(259, 3, 1, le16(1)) ++
      entry(262, 3, 1, le16(3)) ++
      entry(273, 4, 1, le32(pxOff)) ++ entry(279, 4, 1, le32(2)) ++
      entry(320, 3, 6, le32(cmOff)) ++
      le32(0) ++
      (le16(0) ++ le16(0xFFFF) ++ le16(0) ++ le16(0xFFFF) ++
        le16(0) ++ le16(0xFFFF)) ++ // R0 R1 G0 G1 B0 B1
      pxData
    assert(lumaOf(tiff).luma.map(_ & 0xFF).toSeq == Seq(255, 0))
    // WhiteIsZero: photometric 0 inverts gray
    val w0 = "II".getBytes ++ Array[Byte](42, 0) ++ le32(8) ++
      le16(7) ++
      entry(256, 3, 1, le16(2)) ++ entry(257, 3, 1, le16(1)) ++
      entry(258, 3, 1, le16(8)) ++ entry(259, 3, 1, le16(1)) ++
      entry(262, 3, 1, le16(0)) ++
      entry(273, 4, 1, le32(8 + 2 + 7 * 12 + 4)) ++ entry(279, 4, 1, le32(2)) ++
      le32(0) ++ Array[Byte](0, 100)
    assert(lumaOf(w0).luma.map(_ & 0xFF).toSeq == Seq(255, 155))
    // RowsPerStrip = 2^32-1 (the TIFF 6.0 single-strip convention)
    // clamps to the image height instead of overflowing toInt
    val inf = "II".getBytes ++ Array[Byte](42, 0) ++ le32(8) ++
      le16(8) ++
      entry(256, 3, 1, le16(2)) ++ entry(257, 3, 1, le16(1)) ++
      entry(258, 3, 1, le16(8)) ++ entry(259, 3, 1, le16(1)) ++
      entry(262, 3, 1, le16(1)) ++
      entry(273, 4, 1, le32(8 + 2 + 8 * 12 + 4)) ++ entry(279, 4, 1, le32(2)) ++
      entry(278, 4, 1, Array[Byte](-1, -1, -1, -1)) ++
      le32(0) ++ Array[Byte](7, 9)
    assert(lumaOf(inf).luma.map(_ & 0xFF).toSeq == Seq(7, 9))
    // scope edges loud: CCITT compression (tiles decode since r14 —
    // their coverage lives in the tiled/planar test below)
    val ccitt = "II".getBytes ++ Array[Byte](42, 0) ++ le32(8) ++ le16(7) ++
      entry(256, 3, 1, le16(2)) ++ entry(257, 3, 1, le16(1)) ++
      entry(258, 3, 1, le16(8)) ++ entry(259, 3, 1, le16(2)) ++
      entry(262, 3, 1, le16(1)) ++
      entry(273, 4, 1, le32(8 + 2 + 7 * 12 + 4)) ++
      entry(279, 4, 1, le32(2)) ++ le32(0) ++
      Array[Byte](1, 2)
    assert(intercept[Exception](PixelDecode.decodeLuma(ccitt))
      .getMessage.contains("compression 2"))
    assert(PixelDecode.decodeLuma("II but not tiff".getBytes).isEmpty)
  }

  test("TIFF tiles cross-validated against ImageIO; planar-2 strips hand-pinned; edges loud") {
    System.setProperty("java.awt.headless", "true")
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    // tiled: ImageIO's INDEPENDENT TIFF writer emits the tile tables;
    // 37x21 forces padded edge tiles in both axes
    def tiledTiff(img: BufferedImage, lzw: Boolean): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val p = writer.getDefaultWriteParam
      p.setTilingMode(ImageWriteParam.MODE_EXPLICIT)
      p.setTiling(32, 16, 0, 0)
      if (lzw) {
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionType("LZW")
      }
      val bo = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bo)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), p)
      ios.close(); writer.dispose()
      bo.toByteArray
    }
    val g = new BufferedImage(37, 21, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 21; x <- 0 until 37)
      g.getRaster.setSample(x, y, 0, (x * 11 + y * 7) % 256)
    for (lzw <- Seq(false, true)) {
      val r = lumaOf(tiledTiff(g, lzw))
      assert(r.w == 37 && r.h == 21)
      for (y <- 0 until 21; x <- 0 until 37)
        assert((r.luma(y * 37 + x) & 0xFF) == (x * 11 + y * 7) % 256,
          s"tiled gray lzw=$lzw mismatch at ($x,$y)")
    }
    val c = new BufferedImage(37, 21, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 21; x <- 0 until 37)
      c.setRGB(x, y, ((x * 5 % 256) << 16) | ((y * 9 % 256) << 8) | ((x + y) % 256))
    val rc = lumaOf(tiledTiff(c, lzw = true))
    for (y <- 0 until 21; x <- 0 until 37)
      assert((rc.luma(y * 37 + x) & 0xFF) ==
        ((77 * (x * 5 % 256) + 150 * (y * 9 % 256) + 29 * ((x + y) % 256) + 128) >> 8),
        s"tiled rgb mismatch at ($x,$y)")
    // planar configuration 2: hand-built 3x2 RGB, one row per strip,
    // plane-ordered strips (R0 R1 G0 G1 B0 B1), predictor 2 at
    // sample-stride 1 WITHIN each plane
    val pxs = Array(Array(10, 20, 30), Array(40, 50, 60), Array(70, 80, 90),
      Array(5, 5, 5), Array(200, 100, 50), Array(0, 255, 128)) // (r,g,b) row-major
    def hdiff(row: Array[Int]): Array[Byte] = row.zipWithIndex.map {
      case (v, i) => ((v - (if (i > 0) row(i - 1) else 0)) & 0xFF).toByte
    }
    val strips: Seq[Array[Byte]] = for {
      s <- 0 to 2; y <- 0 to 1
    } yield hdiff(Array(pxs(y * 3 + 0)(s), pxs(y * 3 + 1)(s), pxs(y * 3 + 2)(s)))
    def le16b(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32b(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val nEntries = 10
    val ifdSize = 2 + nEntries * 12 + 4
    val extBase = 8 + ifdSize // offset arrays + bits array live here
    val offArr = extBase
    val cntArr = extBase + 24
    val bitsArr = extBase + 48
    val dataAt = extBase + 54
    def entry(tag: Int, typ: Int, count: Int, value: Array[Byte]): Array[Byte] =
      le16b(tag) ++ le16b(typ) ++ le32b(count) ++ value.padTo(4, 0.toByte)
    val entries =
      entry(256, 3, 1, le16b(3)) ++ entry(257, 3, 1, le16b(2)) ++
      entry(258, 3, 3, le32b(bitsArr)) ++ entry(262, 3, 1, le16b(2)) ++
      entry(273, 4, 6, le32b(offArr)) ++ entry(277, 3, 1, le16b(3)) ++
      entry(278, 3, 1, le16b(1)) ++ entry(279, 4, 6, le32b(cntArr)) ++
      entry(284, 3, 1, le16b(2)) ++ entry(317, 3, 1, le16b(2))
    val stripOffs = strips.indices.flatMap(i => le32b(dataAt + i * 3)).toArray
    val stripCnts = strips.indices.flatMap(_ => le32b(3)).toArray
    val planarTiff = "II".getBytes ++ Array[Byte](42, 0) ++ le32b(8) ++
      le16b(nEntries) ++ entries ++ le32b(0) ++
      stripOffs ++ stripCnts ++ le16b(8) ++ le16b(8) ++ le16b(8) ++
      strips.flatten.toArray
    val rp = lumaOf(planarTiff)
    assert(rp.w == 3 && rp.h == 2)
    for (y <- 0 to 1; x <- 0 to 2) {
      val p = pxs(y * 3 + x)
      assert((rp.luma(y * 3 + x) & 0xFF) ==
        ((77 * p(0) + 150 * p(1) + 29 * p(2) + 128) >> 8),
        s"planar mismatch at ($x,$y)")
    }
    // 16-bit gray samples: ImageIO's writer emits a USHORT TIFF; the
    // decode takes each sample's high byte (the 8-bit projection) —
    // strips and LZW (whose 16-bit predictor differencing carries)
    val g16 = new BufferedImage(19, 7, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 7; x <- 0 until 19)
      g16.getRaster.setSample(x, y, 0, ((x * 37 + y * 101) % 256) * 256 + x)
    for (lzw <- Seq(false, true)) {
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val p = writer.getDefaultWriteParam
      if (lzw) {
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionType("LZW")
      }
      val bo = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bo)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(g16, null, null), p)
      ios.close(); writer.dispose()
      val r16 = lumaOf(bo.toByteArray)
      assert(r16.w == 19 && r16.h == 7)
      for (y <- 0 until 7; x <- 0 until 19)
        assert((r16.luma(y * 19 + x) & 0xFF) == (x * 37 + y * 101) % 256,
          s"16-bit gray lzw=$lzw mismatch at ($x,$y)")
    }
    // loud edges: tiled planar, non-16-multiple tile size
    val tiledPlanar = "II".getBytes ++ Array[Byte](42, 0) ++ le32b(8) ++
      le16b(6) ++
      entry(256, 3, 1, le16b(16)) ++ entry(257, 3, 1, le16b(16)) ++
      entry(258, 3, 1, le16b(8)) ++
      entry(277, 3, 1, le16b(3)) ++ entry(284, 3, 1, le16b(2)) ++
      entry(322, 3, 1, le16b(16)) ++ le32b(0)
    assert(intercept[Exception](PixelDecode.decodeLuma(tiledPlanar))
      .getMessage.contains("tiled planar"))
    val badTile = "II".getBytes ++ Array[Byte](42, 0) ++ le32b(8) ++
      le16b(6) ++
      entry(256, 3, 1, le16b(8)) ++ entry(257, 3, 1, le16b(8)) ++
      entry(258, 3, 1, le16b(8)) ++ entry(262, 3, 1, le16b(1)) ++
      entry(322, 3, 1, le16b(8)) ++ entry(323, 3, 1, le16b(8)) ++ le32b(0)
    assert(intercept[Exception](PixelDecode.decodeLuma(badTile))
      .getMessage.contains("16-multiples"))
  }

  test("TIFF 16-bit predictor-2 chunky: hand-built fixtures accumulate at the pixel stride") {
    // ImageIO's LZW writer emits predictor 1 for USHORT images, so the
    // cross-validated 16-bit test above never reaches this branch —
    // these hand-built uncompressed predictor-2 files pin that a
    // 16-bit sample differences against the SAME sample of the
    // PREVIOUS pixel (sample stride spp), not two pixels back.
    def le16b(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32b(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def entry(tag: Int, typ: Int, count: Int, value: Array[Byte]): Array[Byte] =
      le16b(tag) ++ le16b(typ) ++ le32b(count) ++ value.padTo(4, 0.toByte)
    def hdiff16(row: Array[Int], spp: Int): Array[Byte] = {
      val d = row.indices.map { i =>
        if (i < spp) row(i) else (row(i) - row(i - spp)) & 0xFFFF
      }
      d.flatMap(le16b).toArray
    }
    // gray 3x1 (the ADVICE repro): values 0x1000 0x1100 0x1100 —
    // diffs 0x1000 0x0100 0x0000; the buggy stride read high bytes
    // 10 01 10, the fix reads 10 11 11
    def tiff16(w: Int, h: Int, spp: Int, rows: Seq[Array[Int]]): Array[Byte] = {
      val nE = if (spp == 1) 9 else 10
      val ifdSize = 2 + nE * 12 + 4
      val extBase = 8 + ifdSize
      val bitsArr = extBase // only for spp=3 (3 shorts)
      val dataAt = if (spp == 1) extBase else extBase + 6
      val data = rows.flatMap(r => hdiff16(r, spp)).toArray
      val common =
        entry(256, 3, 1, le16b(w)) ++ entry(257, 3, 1, le16b(h)) ++
        (if (spp == 1) entry(258, 3, 1, le16b(16))
         else entry(258, 3, 3, le32b(bitsArr))) ++
        entry(262, 3, 1, le16b(if (spp == 1) 1 else 2)) ++
        entry(273, 4, 1, le32b(dataAt)) ++ entry(277, 3, 1, le16b(spp)) ++
        entry(278, 3, 1, le16b(h)) ++ entry(279, 4, 1, le32b(data.length)) ++
        entry(317, 3, 1, le16b(2)) ++
        (if (spp == 1) Array.empty[Byte] else entry(284, 3, 1, le16b(1)))
      "II".getBytes ++ Array[Byte](42, 0) ++ le32b(8) ++
        le16b(nE) ++ common ++ le32b(0) ++
        (if (spp == 1) Array.empty[Byte]
         else le16b(16) ++ le16b(16) ++ le16b(16)) ++ data
    }
    val rg = lumaOf(tiff16(3, 1, 1, Seq(Array(0x1000, 0x1100, 0x1100))))
    assert(rg.w == 3 && rg.h == 1)
    assert(rg.luma.map(_ & 0xFF).toSeq == Seq(0x10, 0x11, 0x11))
    // RGB 3x2 chunky 16-bit: sample stride 3, diffs wrap mod 2^16
    // (carry into the high byte must survive the reconstruction)
    val rgbRows = Seq(
      Array(0x1000, 0x2000, 0x3000, 0x1100, 0x1F00, 0x3080, 0x10FF, 0x2001, 0x2FFF),
      Array(0xFF80, 0x0040, 0x8000, 0x0001, 0xFFFF, 0x7FFF, 0x1234, 0x5678, 0x9ABC))
    val rrgb = lumaOf(tiff16(3, 2, 3, rgbRows))
    assert(rrgb.w == 3 && rrgb.h == 2)
    for (y <- 0 to 1; x <- 0 to 2) {
      val row = rgbRows(y)
      val (r, g, b) = (row(x * 3) >> 8, row(x * 3 + 1) >> 8, row(x * 3 + 2) >> 8)
      assert((rrgb.luma(y * 3 + x) & 0xFF) == ((77 * r + 150 * g + 29 * b + 128) >> 8),
        s"16-bit rgb predictor-2 mismatch at ($x,$y)")
    }
  }

  test("TIFF sub-byte samples: 1/2/4-bit gray and palette decode; loud edges hold") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def entry(tag: Int, typ: Int, count: Int, value: Array[Byte]) =
      le16(tag) ++ le16(typ) ++ le32(count) ++ value.padTo(4, 0.toByte)
    def lumaOf(bytes: Array[Byte]) = PixelDecode.decodeLuma(bytes).get

    // 1-bit bilevel cross-validated against ImageIO's INDEPENDENT
    // writer (TYPE_BYTE_BINARY -> a packed bilevel TIFF)
    val bi = new BufferedImage(21, 7, BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 7; x <- 0 until 21)
      bi.setRGB(x, y, if ((x * 3 + y * 5) % 7 < 3) 0xFFFFFF else 0)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val wr = ImageIO.getImageWritersByFormatName("tiff").next()
    wr.setOutput(ios); wr.write(bi); ios.close()
    val r1 = lumaOf(bos.toByteArray)
    assert(r1.w == 21 && r1.h == 7)
    for (y <- 0 until 7; x <- 0 until 21)
      assert((r1.luma(y * 21 + x) & 0xFF) ==
        (if ((x * 3 + y * 5) % 7 < 3) 255 else 0), s"1-bit pixel ($x,$y)")

    // hand-built 2-bit gray, 5x2 (rows pad to byte boundaries): gray
    // scales by 85 so full scale is exactly 255
    val g2Rows = Seq(Seq(0, 1, 2, 3, 0), Seq(3, 2, 1, 0, 3))
    def pack(bits: Int, row: Seq[Int]): Array[Byte] = {
      val out = new Array[Byte]((row.size * bits + 7) / 8)
      for ((v, i) <- row.zipWithIndex)
        out((i * bits) / 8) = (out((i * bits) / 8) |
          (v << (8 - bits - (i * bits) % 8))).toByte
      out
    }
    val g2px = g2Rows.flatMap(pack(2, _)).toArray
    def grayTiff(bits: Int, w: Int, h: Int, comp: Int, px: Array[Byte],
        photometric: Int = 1, predictor: Int = 1): Array[Byte] = {
      val n = if (predictor != 1) 8 else 7
      val pxOff = 8 + 2 + n * 12 + 4
      "II".getBytes ++ Array[Byte](42, 0) ++ le32(8) ++
        le16(n) ++
        entry(256, 3, 1, le16(w)) ++ entry(257, 3, 1, le16(h)) ++
        entry(258, 3, 1, le16(bits)) ++ entry(259, 3, 1, le16(comp)) ++
        entry(262, 3, 1, le16(photometric)) ++
        entry(273, 4, 1, le32(pxOff)) ++
        entry(279, 4, 1, le32(px.length)) ++
        (if (predictor != 1) entry(317, 3, 1, le16(predictor))
         else Array.empty[Byte]) ++
        le32(0) ++ px
    }
    val r2 = lumaOf(grayTiff(2, 5, 2, 1, g2px))
    assert(r2.luma.map(_ & 0xFF).toSeq ==
      Seq(0, 85, 170, 255, 0, 255, 170, 85, 0, 255))
    // the same payload through PackBits (literal runs) decompresses
    // into the identical packed rows
    val packed2 = Array[Byte]((g2px.length - 1).toByte) ++ g2px
    val r2p = lumaOf(grayTiff(2, 5, 2, 32773, packed2))
    assert(r2p.luma.toSeq == r2.luma.toSeq)
    // 1-bit WhiteIsZero inverts: bit 1 -> black
    val r1w = lumaOf(grayTiff(1, 2, 1, 1, Array[Byte](0x40), photometric = 0))
    assert(r1w.luma.map(_ & 0xFF).toSeq == Seq(255, 0))

    // hand-built 4-bit palette, 3x1: indexes 0/1/2 into a 16-entry
    // ColorMap (16-bit entries, high byte read)
    val cmOff = 8 + 2 + 8 * 12 + 4
    val pxOff4 = cmOff + 48 * 2
    val cm = (0 until 16).flatMap(i => le16(i match {
      case 0 => 0xFF00; case 1 => 0x8000; case _ => 0x0000 })) ++
      (0 until 16).flatMap(i => le16(if (i == 1) 0x8000 else 0)) ++
      (0 until 16).flatMap(i => le16(if (i == 1) 0x8000 else 0))
    val p4 = "II".getBytes ++ Array[Byte](42, 0) ++ le32(8) ++
      le16(8) ++
      entry(256, 3, 1, le16(3)) ++ entry(257, 3, 1, le16(1)) ++
      entry(258, 3, 1, le16(4)) ++ entry(259, 3, 1, le16(1)) ++
      entry(262, 3, 1, le16(3)) ++
      entry(273, 4, 1, le32(pxOff4)) ++ entry(279, 4, 1, le32(2)) ++
      entry(320, 3, 48, le32(cmOff)) ++
      le32(0) ++ cm ++ Array[Byte](0x01, 0x20)
    // index 0 -> R=255 only, 1 -> gray 128, 2 -> black
    assert(lumaOf(p4).luma.map(_ & 0xFF).toSeq ==
      Seq((77 * 255 + 128) >> 8, 128, 0))

    // hand-built TILED 1-bit: 16-multiple tile columns land on byte
    // boundaries, edge tile padded
    val tileHdr = 8 + 2 + 9 * 12 + 4
    val tOffArr = tileHdr
    val tCntArr = tileHdr + 8
    val t0 = tileHdr + 16
    val t1 = t0 + 32
    val tile0 = (Array[Byte](0xAA.toByte, 0xAA.toByte) ++
      Array[Byte](0x55, 0x55) ++ new Array[Byte](28))
    val tile1 = (Array[Byte](0xC0.toByte, 0x00) ++
      Array[Byte](0x30, 0x00) ++ new Array[Byte](28))
    val tiled = "II".getBytes ++ Array[Byte](42, 0) ++ le32(8) ++
      le16(9) ++
      entry(256, 3, 1, le16(20)) ++ entry(257, 3, 1, le16(2)) ++
      entry(258, 3, 1, le16(1)) ++ entry(259, 3, 1, le16(1)) ++
      entry(262, 3, 1, le16(1)) ++
      entry(322, 3, 1, le16(16)) ++ entry(323, 3, 1, le16(16)) ++
      entry(324, 4, 2, le32(tOffArr)) ++
      entry(325, 4, 2, le32(tCntArr)) ++
      le32(0) ++ le32(t0) ++ le32(t1) ++ le32(32) ++ le32(32) ++
      tile0 ++ tile1
    val rt = lumaOf(tiled)
    assert(rt.w == 20 && rt.h == 2)
    val row0 = (0 until 16).map(x => if (x % 2 == 0) 255 else 0) ++
      Seq(255, 255, 0, 0)
    val row1 = (0 until 16).map(x => if (x % 2 == 0) 0 else 255) ++
      Seq(0, 0, 255, 255)
    assert(rt.luma.take(20).map(_ & 0xFF).toSeq == row0)
    assert(rt.luma.drop(20).map(_ & 0xFF).toSeq == row1)

    // loud edges: sub-byte predictor 2; sub-byte multi-sample
    val pred = intercept[Exception](PixelDecode.decodeLuma(
      grayTiff(2, 5, 2, 1, g2px, predictor = 2)))
    assert(pred.getMessage.contains("sub-byte TIFF horizontal differencing"))
    val multi = "II".getBytes ++ Array[Byte](42, 0) ++ le32(8) ++
      le16(8) ++
      entry(256, 3, 1, le16(2)) ++ entry(257, 3, 1, le16(1)) ++
      entry(258, 3, 3, le32(8 + 2 + 8 * 12 + 4)) ++
      entry(259, 3, 1, le16(1)) ++ entry(262, 3, 1, le16(2)) ++
      entry(277, 3, 1, le16(3)) ++
      entry(273, 4, 1, le32(8 + 2 + 8 * 12 + 4 + 6)) ++
      entry(279, 4, 1, le32(3)) ++
      le32(0) ++ le16(4) ++ le16(4) ++ le16(4) ++ Array[Byte](0x12, 0x34, 0x56)
    assert(intercept[Exception](PixelDecode.decodeLuma(multi))
      .getMessage.contains("sub-byte TIFF with 3 samples"))
  }

  // ---- WebP VP8L: hand-assembled bitstreams, one per decoder path
  // the literal-only synth encoder never emits. Every fixture is
  // spelled bit-by-bit from the lossless spec, so these are
  // spec-conformance pins, not encoder/decoder round-trips. ----

  private def luma(r: Int, g: Int, b: Int): Byte =
    ((77 * r + 150 * g + 29 * b + 128) >> 8).toByte

  /** Simple-form prefix code with one symbol (0 bits per read). */
  private def single(bw: SynthPng.Vp8lWriter, sym: Int): Unit = {
    bw.bits(1, 1).bits(0, 1)
    if (sym < 2) bw.bits(0, 1).bits(sym, 1)
    else bw.bits(1, 1).bits(sym, 8)
  }

  /** Simple-form prefix code with two symbols (canonical by value). */
  private def pairCode(bw: SynthPng.Vp8lWriter, s0: Int, s1: Int): Unit = {
    bw.bits(1, 1).bits(1, 1)
    if (s0 < 2) bw.bits(0, 1).bits(s0, 1)
    else bw.bits(1, 1).bits(s0, 8)
    bw.bits(s1, 8)
  }

  /** Normal-form prefix code assigning length `L` (1 or 2) to exactly
    * `syms`: the code-length code is the complete 2-bit set over
    * {0, L, 17, 18}, zero runs via the 17/18 repeats. */
  private def normalCode(bw: SynthPng.Vp8lWriter, syms: Seq[Int], L: Int,
      alphabet: Int): Unit = {
    bw.bits(0, 1) // normal form
    bw.bits((if (L == 1) 4 else 5) - 4, 4) // num_code_lengths - 4
    bw.bits(2, 3).bits(2, 3).bits(2, 3) // CL lens: 17, 18, 0
    if (L == 1) bw.bits(2, 3) else bw.bits(0, 3).bits(2, 3) // 1 [, 2]
    bw.bits(0, 1) // no max_symbol cap
    // canonical CL codes: 0→00, L→01, 17→10, 18→11
    def zeros(n0: Int): Unit = {
      var n = n0
      while (n > 0) {
        if (n <= 2) { (0 until n).foreach(_ => bw.code(0, 2)); n = 0 }
        else if (n <= 10) { bw.code(2, 2).bits(n - 3, 3); n = 0 }
        else {
          var m = math.min(138, n)
          if (n - m == 1 || n - m == 2) m -= 2
          bw.code(3, 2).bits(m - 11, 7)
          n -= m
        }
      }
    }
    var at = 0
    syms.sorted.foreach { s => zeros(s - at); bw.code(1, 2); at = s + 1 }
    zeros(alphabet - at)
  }

  private def webpLuma(bw: SynthPng.Vp8lWriter): Seq[Int] =
    lumaOf(bw.toWebp).luma.map(_ & 0xFF).toSeq

  test("VP8L: LZ77 copies through both distance forms (the 2D map and linear)") {
    // 4x1: one literal + three dist-code-2 copies — map entry (1, 0)
    // = the left pixel, dist 1
    val a = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, 4, 1)
    a.bits(0, 1).bits(0, 1).bits(0, 1) // no transforms / cache / meta
    normalCode(a, Seq(50, 256), 1, 280) // green: literal 50 + length code 0
    single(a, 1); single(a, 2); single(a, 255) // red / blue / alpha
    single(a, 1) // distance code 1 → prefix value 2 → map[1] = (1, 0)
    a.code(0, 1) // literal 50 → (255, 1, 50, 2)
    a.code(1, 1); a.code(1, 1); a.code(1, 1) // three len-1 copies
    assert(webpLuma(a) == Seq.fill(4)(luma(1, 50, 2) & 0xFF))
    // 2x2: two literals + two dist-code-1 copies — map entry (0, 1)
    // = the pixel ABOVE (dist = width)
    val b = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, 2, 2)
    b.bits(0, 1).bits(0, 1).bits(0, 1)
    normalCode(b, Seq(40, 60, 256, 257), 2, 280)
    single(b, 0); single(b, 0); single(b, 255)
    single(b, 0) // distance code 0 → value 1 → map[0] = (0, 1)
    b.code(0, 2); b.code(1, 2) // literals 40, 60
    b.code(2, 2); b.code(2, 2) // copy row above, twice
    assert(webpLuma(b) == Seq(luma(0, 40, 0) & 0xFF, luma(0, 60, 0) & 0xFF,
      luma(0, 40, 0) & 0xFF, luma(0, 60, 0) & 0xFF))
    // 5x1: literal + linear distance (dval > 120): dist 2 needs
    // dval 122 → prefix code 13 + 5 extra bits (25)
    val c = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, 5, 1)
    c.bits(0, 1).bits(0, 1).bits(0, 1)
    normalCode(c, Seq(70, 90, 256, 257), 2, 280) // 257 pads Kraft to 1
    single(c, 0); single(c, 0); single(c, 255)
    single(c, 13)
    c.code(0, 2); c.code(1, 2) // literals 70, 90
    c.code(2, 2); c.bits(25, 5) // len 1, dist 96+25+1-120 = 2 → copies 70
    c.code(2, 2); c.bits(25, 5) // copies 90
    c.code(2, 2); c.bits(25, 5) // copies 70
    assert(webpLuma(c) == Seq(70, 90, 70, 90, 70).map(g => luma(0, g, 0) & 0xFF))
  }

  test("VP8L: color cache round-trips through the spec hash") {
    val p = 0xFF006400 // (255, 0, 100, 0) — the literal below
    val idx = (0x1e35a7bd * p) >>> 31 // cache_bits = 1
    val bw = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, 2, 1)
    bw.bits(0, 1) // no transforms
    bw.bits(1, 1).bits(1, 4) // color cache, 1 bit → 2 slots
    bw.bits(0, 1) // no meta
    normalCode(bw, Seq(100, 280 + idx), 1, 282) // literal + cache ref
    single(bw, 0); single(bw, 0); single(bw, 255); single(bw, 0)
    bw.code(0, 1) // literal 100 → inserted at `idx`
    bw.code(1, 1) // cache hit
    assert(webpLuma(bw) == Seq.fill(2)(luma(0, 100, 0) & 0xFF))
  }

  test("VP8L: predictor transform (block mode T) reconstructs from residuals") {
    val bw = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, 2, 2)
    bw.bits(1, 1).bits(0, 2) // transform: predictor
    bw.bits(2, 3) // size_bits 4 → 16x16 blocks → one 1x1 mode image
    // the mode sub-image: every code single-symbol, mode 2 (= top)
    bw.bits(0, 1) // its color-cache bit
    single(bw, 2); single(bw, 0); single(bw, 0); single(bw, 0); single(bw, 0)
    bw.bits(0, 1).bits(0, 1).bits(0, 1) // end transforms / cache / meta
    pairCode(bw, 0, 80) // green residuals: 80 once, 0 after
    single(bw, 0); single(bw, 0); single(bw, 0); single(bw, 0)
    // (0,0) predicts opaque black, row 0 predicts L, column 0
    // predicts T, (1,1) predicts the BLOCK mode = T
    bw.code(1, 1) // residual green 80
    bw.code(0, 1); bw.code(0, 1); bw.code(0, 1) // zero residuals
    assert(webpLuma(bw) == Seq.fill(4)(luma(0, 80, 0) & 0xFF))
  }

  test("VP8L: color-indexing transform unpacks 1-bit bundled indices") {
    val bw = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, 8, 1)
    bw.bits(1, 1).bits(3, 2) // transform: color indexing
    bw.bits(1, 8) // palette size 2 → 1-bit bundling, packed width 1
    // palette sub-image (2x1), entries DELTA-coded: (255,0,10,0) then
    // +(0,0,190,0) → (255,0,200,0)
    bw.bits(0, 1)
    pairCode(bw, 10, 190); single(bw, 0); single(bw, 0)
    pairCode(bw, 0, 255); single(bw, 0)
    bw.code(0, 1); bw.code(1, 1) // entry0: g=10, a=255
    bw.code(1, 1); bw.code(0, 1) // entry1: g+=190, a+=0
    bw.bits(0, 1).bits(0, 1).bits(0, 1) // end transforms / cache / meta
    // packed image: one pixel, green byte 154 = indices 0,1,0,1,1,0,0,1
    single(bw, 154); single(bw, 0); single(bw, 0); single(bw, 255); single(bw, 0)
    val l0 = luma(0, 10, 0) & 0xFF
    val l1 = luma(0, 200, 0) & 0xFF
    assert(webpLuma(bw) == Seq(l0, l1, l0, l1, l1, l0, l0, l1))
  }

  test("VP8L: cross-color transform applies signed (int8*int8)>>5 deltas") {
    val bw = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, 2, 1)
    bw.bits(1, 1).bits(1, 2) // transform: cross-color
    bw.bits(2, 3) // size_bits 4 → one element
    // element pixel: green_to_red rides in BLUE = 0xE0 (int8 -32)
    bw.bits(0, 1)
    single(bw, 0); single(bw, 0); single(bw, 224); single(bw, 0); single(bw, 0)
    bw.bits(0, 1).bits(0, 1).bits(0, 1)
    single(bw, 64); single(bw, 100); single(bw, 50); single(bw, 255); single(bw, 0)
    // delta = (-32 * 64) >> 5 = -64 → red 100 → 36; blue untouched
    assert(webpLuma(bw) == Seq.fill(2)(luma(36, 64, 50) & 0xFF))
  }

  test("VP8L: meta prefix groups route pixels to their own codes") {
    val bw = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, 8, 1)
    bw.bits(0, 1).bits(0, 1) // no transforms, no cache
    bw.bits(1, 1).bits(0, 3) // meta groups, bits 2 → entropy image 2x1
    bw.bits(0, 1) // entropy image's cache bit
    pairCode(bw, 0, 1); single(bw, 0); single(bw, 0); single(bw, 0); single(bw, 0)
    bw.code(0, 1); bw.code(1, 1) // groups 0, 1 ((r<<8)|g)
    // group 0: constant green 30; group 1: constant green 200
    single(bw, 30); single(bw, 0); single(bw, 0); single(bw, 255); single(bw, 0)
    single(bw, 200); single(bw, 0); single(bw, 0); single(bw, 255); single(bw, 0)
    val (l0, l1) = (luma(0, 30, 0) & 0xFF, luma(0, 200, 0) & 0xFF)
    assert(webpLuma(bw) == Seq(l0, l0, l0, l0, l1, l1, l1, l1))
  }

  test("VP8L scope edges are loud: lossy, animation, truncation, version, incomplete code") {
    def riff(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = (0 until 4).foreach(i => o.write((v >> (8 * i)) & 0xFF))
      o.write("RIFF".getBytes("US-ASCII")); le32(4 + 8 + body.length)
      o.write("WEBP".getBytes("US-ASCII"))
      o.write(fourcc.getBytes("US-ASCII")); le32(body.length); o.write(body)
      o.toByteArray
    }
    // a well-formed lossy key frame: the header PARSES (tag, start
    // code, 14-bit dims) and the loud edge names the geometry and the
    // precise blocker (RFC 6386's normative probability tables)
    val vp8 = Array[Byte](
      0x50, 0x2A, 0x00, // tag: key frame, version 0, show, size 338
      0x9D.toByte, 0x01, 0x2A, // start code
      0x40, 0x00, // width 64 (scale 0)
      0x30, 0x40) // height 48 (scale 1 - parsed, ignored)
    val e = intercept[Exception](PixelDecode.decodeLuma(riff("VP8 ", vp8)))
    assert(e.getMessage.contains("lossy VP8 key frame 64x48"), e.getMessage)
    assert(e.getMessage.contains("probability tables"), e.getMessage)
    // corrupted start code / interframe tag / truncation all loud
    val noCode = vp8.clone(); noCode(4) = 0x77
    assert(intercept[Exception](PixelDecode.decodeLuma(riff("VP8 ", noCode)))
      .getMessage.contains("start code"))
    val inter = vp8.clone(); inter(0) = (inter(0) | 1).toByte
    assert(intercept[Exception](PixelDecode.decodeLuma(riff("VP8 ", inter)))
      .getMessage.contains("interframe"))
    assert(intercept[Exception](PixelDecode.decodeLuma(
      riff("VP8 ", vp8.take(8)))).getMessage.contains("truncated"))
    assert(intercept[Exception](PixelDecode.decodeLuma(
      riff("ANIM", new Array[Byte](16)))).getMessage.contains("animated"))
    // a declared chunk size near Int.MaxValue must fail BY NAME (the
    // Long-widened extent check), not via overflowed index arithmetic
    val bomb = riff("VP8L", new Array[Byte](8))
    // patch the VP8L chunk's size field to 0x7FFFFFF0
    val sizeAt = 16
    bomb(sizeAt) = 0xF0.toByte; bomb(sizeAt + 1) = 0xFF.toByte
    bomb(sizeAt + 2) = 0xFF.toByte; bomb(sizeAt + 3) = 0x7F
    assert(intercept[IllegalArgumentException](PixelDecode.decodeLuma(bomb))
      .getMessage.contains("overruns"))
    val good = SynthPng.build((0 until 99).map(i => s"webp probe $i")
      .find(t => SynthPng.formatOf(t) == 5).get)
    assert(intercept[Exception](PixelDecode.decodeLuma(good.dropRight(40)))
      .getMessage.contains("overruns"))
    val badVer = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, 2, 1)
    // rebuild the 3 version bits by hand: header writes 0; emit a
    // fresh stream with version 1 instead
    val bv = new SynthPng.Vp8lWriter
    bv.bits(0x2F, 8).bits(1, 14).bits(0, 14).bits(0, 1).bits(1, 3)
    assert(intercept[Exception](PixelDecode.decodeLuma(bv.toWebp))
      .getMessage.contains("version"))
    val inc = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, 2, 1)
    inc.bits(0, 1).bits(0, 1).bits(0, 1)
    normalCode(inc, Seq(10, 20), 2, 280) // two len-2 codes: Kraft 1/2
    assert(intercept[Exception](PixelDecode.decodeLuma(inc.toWebp))
      .getMessage.contains("incomplete"))
  }

  test("animated WebP: ANMF composition, disposal, blend guard, loud edges") {
    import graft.functions.expressions.WebpDecode
    def le32b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le24b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte)
    def chunk(cc: String, body: Array[Byte]): Array[Byte] =
      cc.getBytes("US-ASCII") ++ le32b(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
    // a solid-color VP8L payload: single-symbol codes read 0 bits per
    // pixel, so any rect is header + code tables only
    def solidVp8l(w: Int, h: Int, g: Int, alpha: Int = 255): Array[Byte] = {
      val bw = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, w, h)
      bw.bits(0, 1).bits(0, 1).bits(0, 1) // no transforms / cache / meta
      single(bw, g); single(bw, 0); single(bw, 0) // green / red / blue
      single(bw, alpha); single(bw, 0) // alpha / distance
      val webp = bw.toWebp
      val size = (webp(16) & 0xFF) | ((webp(17) & 0xFF) << 8) |
        ((webp(18) & 0xFF) << 16) | ((webp(19) & 0xFF) << 24)
      webp.slice(20, 20 + size)
    }
    def anmf(x: Int, y: Int, w: Int, h: Int, flags: Int,
        vp8l: Array[Byte]): Array[Byte] = {
      require(x % 2 == 0 && y % 2 == 0, "ANMF offsets store halved")
      chunk("ANMF", le24b(x / 2) ++ le24b(y / 2) ++ le24b(w - 1) ++
        le24b(h - 1) ++ le24b(4) ++ Array[Byte](flags.toByte) ++
        chunk("VP8L", vp8l))
    }
    def anim(cw: Int, ch: Int, bg: Int, frames: Array[Byte]*): Array[Byte] = {
      val vp8x = chunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++
        le24b(cw - 1) ++ le24b(ch - 1))
      val an = chunk("ANIM",
        Array[Byte](bg.toByte, bg.toByte, bg.toByte, 255.toByte, 0, 0))
      val body = vp8x ++ an ++ frames.flatten
      "RIFF".getBytes("US-ASCII") ++ le32b(4 + body.length) ++
        "WEBP".getBytes("US-ASCII") ++ body
    }
    // luma of a solid green-g frame under no transform: (150g+128)>>8
    def gl(g: Int) = (150 * g + 128) >> 8
    // two frames: full 4x3 canvas at g=200, then a 2x1 rect at (2,2)
    val twoF = anim(4, 3, 50,
      anmf(0, 0, 4, 3, 0, solidVp8l(4, 3, 200)),
      anmf(2, 2, 2, 1, 0, solidVp8l(2, 1, 10)))
    val f0 = PixelDecode.decodeFrame(twoF, 0)
    assert(f0.w == 4 && f0.h == 3)
    assert(f0.luma.map(_ & 0xFF).toSeq == Seq.fill(12)(gl(200)))
    val f1 = PixelDecode.decodeFrame(twoF, 1)
    assert(f1.luma.map(_ & 0xFF).toSeq ==
      Seq.fill(8)(gl(200)) ++ Seq(gl(200), gl(200), gl(10), gl(10)))
    // the near-dup seam: frame 0 of the animation equals its static twin
    val statik = {
      val bw = SynthPng.vp8lHeader(new SynthPng.Vp8lWriter, 4, 3)
      bw.bits(0, 1).bits(0, 1).bits(0, 1)
      single(bw, 200); single(bw, 0); single(bw, 0)
      single(bw, 255); single(bw, 0)
      bw.toWebp
    }
    assert(PixelDecode.decodeLuma(statik).get.luma.sameElements(f0.luma))
    // disposal bit: frame 0 disposes its rect to the ANIM background
    val disp = anim(4, 3, 50,
      anmf(0, 0, 4, 3, 1, solidVp8l(4, 3, 200)),
      anmf(0, 0, 2, 1, 0, solidVp8l(2, 1, 10)))
    val d1 = PixelDecode.decodeFrame(disp, 1)
    assert(d1.luma.map(_ & 0xFF).toSeq ==
      Seq(gl(10), gl(10)) ++ Seq.fill(10)(50))
    // blend guard: a non-opaque frame under blend-over is loud; the
    // same frame under do-not-blend (bit 1) decodes, alpha ignored
    val translucent = anim(4, 3, 50,
      anmf(0, 0, 4, 3, 0, solidVp8l(4, 3, 99, alpha = 128)))
    assert(intercept[Exception](PixelDecode.decodeFrame(translucent, 0))
      .getMessage.contains("alpha blending"))
    val noBlend = anim(4, 3, 50,
      anmf(0, 0, 4, 3, 2, solidVp8l(4, 3, 99, alpha = 128)))
    assert(PixelDecode.decodeFrame(noBlend, 0).luma.map(_ & 0xFF).toSeq ==
      Seq.fill(12)(gl(99)))
    // loud edges: frame index past the count; an ANMF with no VP8L
    // payload; a frame rect past the canvas; the single-frame path
    // stays loud on animated files
    assert(intercept[Exception](PixelDecode.decodeFrame(twoF, 2))
      .getMessage.contains("2 frames"))
    val empty = anim(4, 3, 50, chunk("ANMF", le24b(0) ++ le24b(0) ++
      le24b(3) ++ le24b(2) ++ le24b(4) ++ Array[Byte](0)))
    assert(intercept[Exception](PixelDecode.decodeFrame(empty, 0))
      .getMessage.contains("no VP8L payload"))
    val oob = anim(4, 3, 50, anmf(2, 0, 4, 3, 0, solidVp8l(4, 3, 1)))
    assert(intercept[Exception](PixelDecode.decodeFrame(oob, 0))
      .getMessage.contains("exceeds the canvas"))
    assert(intercept[Exception](PixelDecode.decodeLuma(twoF))
      .getMessage.contains("animated"))
    assert(WebpDecode.isAnimated(twoF) && !WebpDecode.isAnimated(statik))
  }

  test("mm_phash_px: the banded join finds EXACTLY the exhaustive hamming<=7 pairs") {
    import SparkTestSession._
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val found = operators.Multimodal.phashPx(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = Tables.spread(Tables.load(spark, sf, "documents"))
      .select($"doc_id", graft.functions.expressions.PixelPhash(
        graft.functions.expressions.SynthPng($"text")).as("ph"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exhaustive = (for {
      (a, pa) <- hashes; (b, pb) <- hashes if a < b
      h = java.lang.Long.bitCount(pa ^ pb)
      if h <= operators.Multimodal.PxMaxHamming
    } yield (a, b, h.toLong)).toSet
    assert(found == exhaustive,
      s"banding missed ${(exhaustive -- found).size}, invented ${(found -- exhaustive).size}")
    assert(exhaustive.nonEmpty, "corpus planted no near-dup pairs — fixture broken")
  }
}
