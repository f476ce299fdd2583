package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** From-scratch PIXEL decode for the self-contained raster formats a
  * JDK-only engine can open exactly — PNG (RFC 2083 / ISO 15948:
  * chunk walk, zlib inflate, the five row filters, all five color
  * types, sub-byte and 16-bit depths, palette, Adam7 interlace),
  * BMP (BITMAPINFOHEADER, 1/4/8/24/32 bpp, bottom-up and top-down,
  * BI_RLE8/BI_RLE4), GIF 87a/89a (LSB-first LZW, local/global palettes,
  * 4-pass interlace, first frame), and JPEG — baseline AND
  * progressive ([[JpegDecode]]: Huffman entropy decode across
  * multi-scan spectral-selection/successive-approximation files,
  * dequant, IDCT, the luma plane), baseline TIFF (strips —
  * none/LZW/PackBits, predictor 2, gray/RGB/palette photometrics),
  * and WebP VP8L ([[WebpDecode]]: prefix codes, LZ77 + color cache,
  * all four transforms; lossy VP8 is its loud edge) —
  * plus the 32x32-DCT perceptual hash over the decoded
  * LUMA raster (the pHash construction: downscale, 2D DCT-II, the
  * 8x8 low-frequency block thresholded at its median → 64 bits).
  *
  * This is what makes image near-dup detection PERCEPTUAL: a
  * recompressed duplicate (same pixels, different filter schedule /
  * color type / palette layout) hashes IDENTICALLY, and a resized
  * duplicate lands within a small hamming distance — where any hash
  * of the container bytes sees unrelated inputs. The PNG row
  * unfilter is shared with [[ParsePdf]]'s /Predictor 10-15 path
  * (one implementation, two callers).
  *
  * Defect policy mirrors [[Inflate]]: an unrecognized magic returns
  * None (not an image — the caller decides), a structural defect
  * inside a recognized format fails LOUDLY ([[decodeLuma]]) — a
  * truncated IDAT is data loss. [[tryDecodeLuma]] is the tolerant
  * wrapper for feature extraction, where a fake or exotic payload
  * degrades to byte-level features instead of failing the fit.
  * The exotic JPEG modes (arithmetic coding, lossless) are declared
  * out of scope (loud, with the precise blocker named); 12-bit
  * precision, four-component CMYK/YCCK, RLE/sub-byte BMP, and
  * sub-byte TIFF all decode. */
object PixelDecode {

  /** A decoded grayscale raster; luma = BT.601 integer weights
    * (77 R + 150 G + 29 B + 128) >> 8 — the weights sum to 256, so
    * gray inputs round-trip bit-exactly. */
  final case class Raster(w: Int, h: Int, luma: Array[Byte])

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"pixel decode: $what")

  /** Raster size ceiling (2^24 pixels — a 4096x4096 image; worst-case
    * transient buffers stay ~128 MB even at RGBA16): a 200-byte
    * payload can DECLARE 65535x65535 dims, and allocating on the
    * declaration would let one hostile/corrupt crawl image OOM an
    * executor (an Error, which the tolerant feature path's Exception
    * catch could not contain). Fails loudly like every other scope
    * edge; every decoder checks before allocating, and the
    * DECOMPRESSORS (zlib, the two LZW flavors) are bounded by the
    * dims-derived expected size too — a compression bomb behind small
    * declared dims fails at the bound, not at the allocator. */
  private[expressions] val MaxPixels = 1 << 24
  private[expressions] def checkDims(w: Int, h: Int, what: String): Unit =
    if (w.toLong * h > MaxPixels)
      fail(s"$what ${w}x$h exceeds the $MaxPixels-pixel decode ceiling")

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) |
      ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
  private def le32(b: Array[Byte], p: Int): Int =
    ((b(p + 3) & 0xFF) << 24) | ((b(p + 2) & 0xFF) << 16) |
      ((b(p + 1) & 0xFF) << 8) | (b(p) & 0xFF)
  private def le16(b: Array[Byte], p: Int): Int =
    ((b(p + 1) & 0xFF) << 8) | (b(p) & 0xFF)

  private[expressions] def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A

  private[expressions] def isBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  private def luma(r: Int, g: Int, b: Int): Byte =
    ((77 * r + 150 * g + 29 * b + 128) >> 8).toByte

  /** Undo the PNG per-row filters (RFC 2083 section 6): `data` is
    * h x (1 filter byte + rowLen filtered bytes), bpp = bytes per
    * complete pixel (>= 1). Shared by [[ParsePdf]]'s /Predictor
    * 10-15 branch — one unfilter, two grammars. */
  private[expressions] def unfilterRows(data: Array[Byte], rowLen: Int,
      bpp: Int): Array[Byte] = {
    if (rowLen <= 0 || data.length % (rowLen + 1) != 0)
      fail(s"PNG row shape mismatch (len ${data.length}, row $rowLen+1)")
    val rows = data.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    var r = 0
    while (r < rows) {
      val ft = data(r * (rowLen + 1)) & 0xFF
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val x = data(src + i) & 0xFF
        val a = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
        val b = if (r > 0) out(dst + i - rowLen) & 0xFF else 0
        val c = if (r > 0 && i >= bpp) out(dst + i - rowLen - bpp) & 0xFF else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case other => fail(s"PNG row filter $other is not a filter type")
        }
        out(dst + i) = (v & 0xFF).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  private def decodePng(b: Array[Byte]): Raster = {
    // chunk walk with CRC validation — a bit flip in a 100 TB corpus
    // should surface, not silently skew the hash
    var p = 8
    var w = 0; var h = 0; var depth = 0; var colorType = 0
    var interlaced = false
    var sawIhdr = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream(b.length)
    var done = false
    while (!done) {
      if (p + 8 > b.length) fail("PNG truncated at chunk header")
      val len = be32(b, p)
      if (len < 0 || p + 12 + len > b.length)
        fail(s"PNG chunk length $len overruns the payload")
      val ctype = new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(b, p + 4, 4 + len)
      if (crc.getValue.toInt != be32(b, p + 8 + len))
        fail(s"PNG $ctype chunk fails its CRC")
      ctype match {
        case "IHDR" =>
          if (len != 13) fail(s"PNG IHDR length $len")
          w = be32(b, p + 8); h = be32(b, p + 12)
          depth = b(p + 16) & 0xFF; colorType = b(p + 17) & 0xFF
          interlaced = (b(p + 20) & 0xFF) match {
            case 0 => false
            case 1 => true
            case other => fail(s"PNG interlace method $other")
          }
          if (w <= 0 || h <= 0) fail(s"PNG dimensions ${w}x$h")
          checkDims(w, h, "PNG dimensions")
          if ((b(p + 18) & 0xFF) != 0) fail("PNG compression method != 0")
          if ((b(p + 19) & 0xFF) != 0) fail("PNG filter method != 0")
          sawIhdr = true
        case "PLTE" => palette = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + len)
        case "IDAT" => idat.write(b, p + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks (tRNS/gAMA/tEXt/...) don't move luma
      }
      p += 12 + len
    }
    if (!sawIhdr) fail("PNG has no IHDR")
    val channels = colorType match {
      case 0 => 1 case 2 => 3 case 3 => 1 case 4 => 2 case 6 => 4
      case other => fail(s"PNG color type $other")
    }
    val okDepth = colorType match {
      case 0 => Set(1, 2, 4, 8, 16) case 3 => Set(1, 2, 4, 8)
      case _ => Set(8, 16)
    }
    if (!okDepth(depth)) fail(s"PNG bit depth $depth for color type $colorType")
    if (colorType == 3 && palette == null) fail("PNG palette image has no PLTE")
    val bitsPerPx = channels * depth
    val bpp = math.max(1, bitsPerPx / 8)
    // the inflate bound: exact filtered-row total the validated dims
    // imply (sequential: h rows; Adam7: the per-pass sum) — a zlib
    // bomb behind a small declared image fails loudly HERE instead of
    // allocating its whole expansion (checkDims alone cannot catch it:
    // the declared dims are small, the stream is not)
    val expectedRaw: Long =
      if (!interlaced) h.toLong * (((w.toLong * bitsPerPx + 7) / 8) + 1)
      else (0 until 7).map { pass =>
        val wp = if (w > Adam7XStart(pass))
          (w - Adam7XStart(pass) + Adam7XStep(pass) - 1) / Adam7XStep(pass) else 0
        val hp = if (h > Adam7YStart(pass))
          (h - Adam7YStart(pass) + Adam7YStep(pass) - 1) / Adam7YStep(pass) else 0
        if (wp > 0 && hp > 0) hp.toLong * (((wp.toLong * bitsPerPx + 7) / 8) + 1)
        else 0L
      }.sum
    // <= MaxPixels * 9 (RGBA16 + filter bytes), so the toInt is safe
    val raw = ParsePdf.inflate(idat.toByteArray, expectedRaw.toInt)
    val maxSub = (1 << depth) - 1
    val out = new Array[Byte](w * h)
    // one per-pixel extractor for both the sequential and the Adam7
    // layouts: `px` holds unfiltered rows of some sub-image, `rowOff`
    // the row's base, `x` the pixel's index WITHIN that row
    def lumaAt(px: Array[Byte], rowOff: Int, x: Int): Byte =
      if (depth == 16) {
        // MSB byte of each sample — the 8-bit projection
        val s = rowOff + x * channels * 2
        colorType match {
          case 0 | 4 => px(s)
          case _ => luma(px(s) & 0xFF, px(s + 2) & 0xFF, px(s + 4) & 0xFF)
        }
      } else if (depth == 8) {
        val s = rowOff + x * channels
        colorType match {
          case 0 | 4 => px(s)
          case 2 | 6 => luma(px(s) & 0xFF, px(s + 1) & 0xFF, px(s + 2) & 0xFF)
          case 3 =>
            val i = (px(s) & 0xFF) * 3
            if (i + 2 >= palette.length) fail("PNG palette index out of range")
            luma(palette(i) & 0xFF, palette(i + 1) & 0xFF, palette(i + 2) & 0xFF)
        }
      } else {
        // sub-byte gray/palette: MSB-first bit packing
        val bitPos = x * depth
        val v = (px(rowOff + (bitPos >> 3)) >> (8 - depth - (bitPos & 7))) & maxSub
        if (colorType == 0) ((v * 255) / maxSub).toByte
        else {
          val i = v * 3
          if (i + 2 >= palette.length) fail("PNG palette index out of range")
          luma(palette(i) & 0xFF, palette(i + 1) & 0xFF, palette(i + 2) & 0xFF)
        }
      }
    if (!interlaced) {
      val rowLen = ((w.toLong * bitsPerPx + 7) / 8).toInt
      val px = unfilterRows(raw, rowLen, bpp)
      if (px.length != rowLen * h) fail("PNG pixel data does not match IHDR dims")
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = lumaAt(px, y * rowLen, x)
          x += 1
        }
        y += 1
      }
    } else {
      // Adam7 (PNG spec §8.2): seven sub-images, each its own run of
      // filtered scanlines; empty passes contribute NO bytes at all
      var off = 0
      var pass = 0
      while (pass < 7) {
        val x0 = Adam7XStart(pass); val xs = Adam7XStep(pass)
        val y0 = Adam7YStart(pass); val ys = Adam7YStep(pass)
        val wp = if (w > x0) (w - x0 + xs - 1) / xs else 0
        val hp = if (h > y0) (h - y0 + ys - 1) / ys else 0
        if (wp > 0 && hp > 0) {
          val rowLenP = ((wp.toLong * bitsPerPx + 7) / 8).toInt
          val need = hp * (rowLenP + 1)
          if (off + need > raw.length)
            fail(s"PNG Adam7 pass ${pass + 1} truncated")
          val px = unfilterRows(
            java.util.Arrays.copyOfRange(raw, off, off + need), rowLenP, bpp)
          off += need
          var py = 0
          while (py < hp) {
            var pxx = 0
            while (pxx < wp) {
              out((y0 + py * ys) * w + (x0 + pxx * xs)) =
                lumaAt(px, py * rowLenP, pxx)
              pxx += 1
            }
            py += 1
          }
        }
        pass += 1
      }
      if (off != raw.length)
        fail(s"PNG Adam7 passes leave ${raw.length - off} unread bytes")
    }
    Raster(w, h, out)
  }

  // Adam7 pass geometry (PNG spec §8.2): start/step per axis
  private val Adam7XStart = Array(0, 4, 0, 2, 0, 1, 0)
  private val Adam7YStart = Array(0, 0, 4, 0, 2, 0, 1)
  private val Adam7XStep = Array(8, 8, 4, 4, 2, 2, 1)
  private val Adam7YStep = Array(8, 8, 8, 4, 4, 2, 2)

  private def decodeBmp(b: Array[Byte]): Raster = {
    if (b.length < 54) fail("BMP shorter than its headers")
    val dataOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) fail(s"BMP DIB header size $dibSize (BITMAPCOREHEADER era) is out of scope")
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h == 0) fail(s"BMP dimensions ${w}x$hRaw")
    checkDims(w, h, "BMP dimensions")
    if (compression != 0 && compression != 1 && compression != 2)
      fail(s"BMP compression $compression (BI_RGB/BI_RLE8/BI_RLE4 only) is out of scope")
    if (compression == 1 && bpp != 8) fail(s"BI_RLE8 with $bpp bpp")
    if (compression == 2 && bpp != 4) fail(s"BI_RLE4 with $bpp bpp")
    if (compression != 0 && topDown)
      fail("RLE BMP cannot be top-down (negative height)")
    // le32 fields are SIGNED ints off the wire: a negative dataOff or
    // a huge dibSize/clrUsed would pass the bound checks by overflow
    // or sign and surface as a raw ArrayIndexOutOfBounds instead of
    // the labeled loud failure — validate ranges first, widen to Long
    if (dataOff < 54 || dataOff > b.length) fail(s"BMP pixel data offset $dataOff")
    if (dibSize > b.length - 14) fail(s"BMP DIB header size $dibSize overruns the payload")
    val palette: Array[Byte] =
      if (bpp == 1 || bpp == 4 || bpp == 8) {
        val cap = 1 << bpp
        val clrUsed = if (dibSize >= 36 && 14 + 36 <= b.length) le32(b, 46) else 0
        if (clrUsed < 0 || clrUsed > cap)
          fail(s"BMP palette size $clrUsed ($bpp-bpp allows at most $cap)")
        val n = if (clrUsed > 0) clrUsed else cap
        val at = 14 + dibSize
        if (at.toLong + n.toLong * 4 > b.length) fail("BMP palette overruns the payload")
        java.util.Arrays.copyOfRange(b, at, at + n * 4) // BGRA quads
      } else null
    def palLuma(i: Int): Byte = {
      val q = i * 4
      if (q + 2 >= palette.length) fail("BMP palette index out of range")
      luma(palette(q + 2) & 0xFF, palette(q + 1) & 0xFF, palette(q) & 0xFF)
    }
    val out = new Array[Byte](w * h)
    if (compression != 0) {
      // BI_RLE8 / BI_RLE4 (bottom-up by construction): (count, value)
      // runs — RLE4 alternates the value's two nibbles — and 00-escapes
      // for end-of-line, end-of-bitmap, delta skip (skipped pixels stay
      // index 0), and absolute mode padded to 2-byte boundaries. Runs
      // past a row end or rows past the bitmap are loud, not clamped.
      val is4 = compression == 2
      val idx = new Array[Byte](w * h) // top-down row-major indexes
      def set(x: Int, yUp: Int, v: Int): Unit =
        idx((h - 1 - yUp) * w + x) = v.toByte
      var p = dataOff; var x = 0; var yUp = 0; var done = false
      while (!done) {
        if (p + 2 > b.length) fail("BMP RLE stream truncated")
        val n = b(p) & 0xFF; val v = b(p + 1) & 0xFF; p += 2
        if (n > 0) {
          if (x + n > w || yUp >= h) fail("BMP RLE run past the row end")
          var i = 0
          while (i < n) {
            set(x + i, yUp, if (!is4) v else if (i % 2 == 0) v >> 4 else v & 0xF)
            i += 1
          }
          x += n
        } else v match {
          case 0 =>
            x = 0; yUp += 1
            if (yUp > h) fail("BMP RLE rows overflow the bitmap")
          case 1 => done = true
          case 2 =>
            if (p + 2 > b.length) fail("BMP RLE stream truncated")
            x += b(p) & 0xFF; yUp += b(p + 1) & 0xFF; p += 2
            if (x > w || yUp > h) fail("BMP RLE delta out of range")
          case cnt => // absolute mode
            if (x + cnt > w || yUp >= h) fail("BMP RLE run past the row end")
            val raw = if (is4) (cnt + 1) / 2 else cnt
            val padded = (raw + 1) & ~1
            if (p + padded > b.length) fail("BMP RLE stream truncated")
            var i = 0
            while (i < cnt) {
              val bv = b(p + (if (is4) i / 2 else i)) & 0xFF
              set(x + i, yUp, if (!is4) bv else if (i % 2 == 0) bv >> 4 else bv & 0xF)
              i += 1
            }
            x += cnt; p += padded
        }
      }
      var i = 0
      while (i < w * h) { out(i) = palLuma(idx(i) & 0xFF); i += 1 }
      return Raster(w, h, out)
    }
    val rowLen = ((w * bpp + 31) / 32) * 4 // 4-byte aligned rows
    if (dataOff.toLong + rowLen.toLong * h > b.length) fail("BMP pixel data truncated")
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowLen
      var x = 0
      while (x < w) {
        val l: Byte = bpp match {
          case 24 =>
            val s = srcRow + x * 3
            luma(b(s + 2) & 0xFF, b(s + 1) & 0xFF, b(s) & 0xFF) // BGR
          case 32 =>
            val s = srcRow + x * 4
            luma(b(s + 2) & 0xFF, b(s + 1) & 0xFF, b(s) & 0xFF)
          case 8 => palLuma(b(srcRow + x) & 0xFF)
          case 4 => // MSB-first nibbles
            val bv = b(srcRow + (x >> 1)) & 0xFF
            palLuma(if ((x & 1) == 0) bv >> 4 else bv & 0xF)
          case 1 => // MSB-first bits
            palLuma((b(srcRow + (x >> 3)) >> (7 - (x & 7))) & 1)
          case other => fail(s"BMP bpp $other (1/4/8/24/32 only)")
        }
        out(y * w + x) = l
        x += 1
      }
      y += 1
    }
    Raster(w, h, out)
  }

  private[expressions] def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** GIF LZW (the 87a/89a appendix): LSB-first bit packing across
    * data sub-blocks, variable code width from minCodeSize+1 to 12,
    * clear = 2^min resets the table, end-of-information stops. The
    * PDF LZWDecode in [[ParsePdf]] is the MSB-first cousin with
    * different clear/EOD codes and EarlyChange — close enough to
    * confuse, different enough that sharing one decoder would bury
    * both specs' semantics in flags. */
  private def gifLzw(data: Array[Byte], minCode: Int,
      expected: Int): Array[Byte] = {
    if (minCode < 2 || minCode > 8) fail(s"GIF LZW min code size $minCode")
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(expected)
    // table entries as (prefix index, final byte); roots are -1-prefixed
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = 0
    def reset(): Unit = {
      next = eoi + 1
      var i = 0
      while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    }
    reset()
    var width = minCode + 1
    var acc = 0L
    var bits = 0
    var p = 0
    var prev = -1
    val stack = new Array[Byte](4096)
    def emit(code: Int): Byte = {
      var sp = 0
      var c = code
      while (c >= 0) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = stack(sp - 1)
      while (sp > 0) { sp -= 1; out.write(stack(sp)) }
      // bomb bound: `expected` is the frame's validated pixel count,
      // not a buffer hint — an LZW stream expanding past it fails here
      // (transient overshoot <= one 4 KB table entry), never after
      // allocating an unbounded expansion the dims said nothing about
      if (out.size > expected)
        fail(s"GIF LZW emits more than the declared $expected pixels")
      first
    }
    var done = false
    while (!done) {
      while (bits < width && p < data.length) {
        acc |= (data(p) & 0xFFL) << bits
        bits += 8
        p += 1
      }
      if (bits < width) fail("GIF LZW stream ends without end-of-information")
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width
      bits -= width
      if (code == clear) {
        reset(); width = minCode + 1; prev = -1
      } else if (code == eoi) done = true
      else {
        if (code > next || (code == next && prev < 0))
          fail(s"GIF LZW code $code beyond table size $next")
        val first =
          if (code < next) emit(code)
          else { // the KwKwK case: prev + first-of-prev
            val f = emit(prev)
            out.write(f)
            f
          }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    out.toByteArray
  }

  /** The first image frame of a GIF: logical screen + global/local
    * palette, LZW-compressed indexes, Adam-style 4-pass INTERLACE
    * honored (GIF interlace is cheap, unlike PNG's 7-pass Adam7),
    * extensions skipped by sub-block framing. Animation frames past
    * the first are ignored — the perceptual identity of a GIF is its
    * first frame. */
  private def decodeGif(b: Array[Byte]): Raster = {
    if (b.length < 13) fail("GIF shorter than its headers")
    var p = 6
    val sw = le16(b, p); val sh = le16(b, p + 2)
    val packed = b(p + 4) & 0xFF
    p += 7
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (p + 3 * n > b.length) fail("GIF global color table truncated")
      gct = java.util.Arrays.copyOfRange(b, p, p + 3 * n)
      p += 3 * n
    }
    if (sw <= 0 || sh <= 0) fail(s"GIF screen ${sw}x$sh")
    while (p < b.length) {
      (b(p) & 0xFF) match {
        case 0x21 => // extension: label + sub-blocks to a 0 terminator
          p += 2
          while (p < b.length && b(p) != 0) p += 1 + (b(p) & 0xFF)
          if (p >= b.length) fail("GIF extension runs past end of file")
          p += 1
        case 0x2C =>
          if (p + 10 > b.length) fail("GIF image descriptor truncated")
          val w = le16(b, p + 5); val h = le16(b, p + 7)
          val ipacked = b(p + 9) & 0xFF
          val interlaced = (ipacked & 0x40) != 0
          p += 10
          var pal = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            if (p + 3 * n > b.length) fail("GIF local color table truncated")
            pal = java.util.Arrays.copyOfRange(b, p, p + 3 * n)
            p += 3 * n
          }
          if (pal == null) fail("GIF image has no color table")
          if (w <= 0 || h <= 0) fail(s"GIF frame ${w}x$h")
          checkDims(w, h, "GIF frame")
          if (p >= b.length) fail("GIF image data truncated")
          val minCode = b(p) & 0xFF
          p += 1
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream(b.length - p)
          while (p < b.length && b(p) != 0) {
            val n = b(p) & 0xFF
            if (p + 1 + n > b.length) fail("GIF data sub-block truncated")
            data.write(b, p + 1, n)
            p += 1 + n
          }
          if (p >= b.length) fail("GIF image data has no block terminator")
          val idx = gifLzw(data.toByteArray, minCode, w * h)
          if (idx.length < w * h)
            fail(s"GIF frame decodes ${idx.length} of ${w * h} pixels")
          val out = new Array[Byte](w * h)
          // interlace pass order: rows 0,8,16.. / 4,12.. / 2,6.. / 1,3..
          val rowOrder: Seq[Int] =
            if (!interlaced) 0 until h
            else (0 until h by 8) ++ (4 until h by 8) ++
              (2 until h by 4) ++ (1 until h by 2)
          rowOrder.zipWithIndex.foreach { case (y, src) =>
            var x = 0
            while (x < w) {
              val i = (idx(src * w + x) & 0xFF) * 3
              if (i + 2 >= pal.length) fail("GIF palette index out of range")
              out(y * w + x) =
                luma(pal(i) & 0xFF, pal(i + 1) & 0xFF, pal(i + 2) & 0xFF)
              x += 1
            }
          }
          return Raster(w, h, out)
        case 0x3B => fail("GIF trailer reached with no image frame")
        case other => fail(f"GIF unknown block 0x$other%02X")
      }
    }
    fail("GIF ends with no image frame")
  }

  /** Animation frame ceiling: frame-N decode serves near-dup coverage
    * (an animated re-encode of a static image, a banner's first
    * seconds), not playback — past this the edge is loud. */
  val MaxFrames = 8

  /** Frame `n` of an ANIMATED payload, composed on the logical-screen
    * canvas per the format's disposal/blend rules — the
    * animation-aware twin of [[decodeLuma]]:
    *
    *  - GIF: frames 0..n drawn at their rects (local palettes,
    *    transparent-index pixels leave the underlying canvas), with
    *    inter-frame disposal 2 (restore rect to the background color)
    *    and 3 (restore to the previous canvas) applied; the canvas
    *    starts as the logical screen's background color.
    *  - APNG: acTL/fcTL/fdAT per the spec — each frame's independent
    *    zlib stream re-wrapped as a standalone PNG through the full
    *    [[decodePng]] machinery (CRCs recomputed, IHDR patched to the
    *    frame rect), dispose 1 clears the rect to black, dispose 2
    *    restores the previous canvas; blend OVER is accepted only for
    *    alpha-less color types (where it equals SOURCE) — real alpha
    *    compositing and tRNS-keyed blending are loud edges, matching
    *    [[decodeLuma]]'s "tRNS does not move luma" stance.
    *  - Animated WebP: VP8X/ANIM/ANMF composition with VP8L frame
    *    payloads ([[WebpDecode.decodeAnimFrame]]) — dispose-to-
    *    background rects, blend-over accepted only for fully opaque
    *    frames; lossy VP8 frames stay the named loud edge.
    *  - Any single-frame format decodes frame 0 only; n past the
    *    payload's frame count or [[MaxFrames]] is loud.
    *
    * NOTE the GIF frame-0 semantics deliberately differ from
    * [[decodeLuma]]: the single-frame decoder returns the first
    * frame's RECT (its own dims — the hash-pinned legacy behavior),
    * while frame composition is canvas-based (screen dims), which is
    * what lets an animated re-encode hash against its static twin
    * when the first frame covers the screen. */
  def decodeFrame(b: Array[Byte], n: Int): Raster = {
    if (n < 0) fail("animation frame index must be >= 0")
    if (n >= MaxFrames)
      fail(s"animation frame $n is out of scope (first $MaxFrames frames only)")
    if (isGif(b)) decodeGifFrame(b, n)
    else if (isPng(b) && hasChunk(b, "acTL")) decodeApngFrame(b, n)
    else if (WebpDecode.isWebp(b) && WebpDecode.isAnimated(b))
      WebpDecode.decodeAnimFrame(b, n)
    else if (n == 0) decodeLuma(b).getOrElse(
      fail("payload is none of PNG/BMP/GIF/JPEG/TIFF/WebP"))
    else fail(s"frame $n of a single-frame payload")
  }

  private def hasChunk(b: Array[Byte], name: String): Boolean = {
    var p = 8
    while (p + 8 <= b.length) {
      val len = be32(b, p)
      if (len < 0 || p + 12 + len > b.length) return false
      if (new String(b, p + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII) == name) return true
      p += 12 + len
    }
    false
  }

  private def decodeGifFrame(b: Array[Byte], n: Int): Raster = {
    if (b.length < 13) fail("GIF shorter than its headers")
    var p = 6
    val sw = le16(b, p); val sh = le16(b, p + 2)
    val packed = b(p + 4) & 0xFF
    val bgIndex = b(p + 5) & 0xFF
    p += 7
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val k = 2 << (packed & 7)
      if (p + 3 * k > b.length) fail("GIF global color table truncated")
      gct = java.util.Arrays.copyOfRange(b, p, p + 3 * k)
      p += 3 * k
    }
    if (sw <= 0 || sh <= 0) fail(s"GIF screen ${sw}x$sh")
    checkDims(sw, sh, "GIF screen")
    val bg: Byte =
      if (gct != null && bgIndex * 3 + 2 < gct.length)
        luma(gct(bgIndex * 3) & 0xFF, gct(bgIndex * 3 + 1) & 0xFF,
          gct(bgIndex * 3 + 2) & 0xFF)
      else 0
    val canvas = Array.fill[Byte](sw * sh)(bg)
    var frame = 0
    // pending GCE state for the NEXT image descriptor
    var disposal = 0
    var transIdx = -1
    while (p < b.length) {
      (b(p) & 0xFF) match {
        case 0x21 =>
          val label = if (p + 1 < b.length) b(p + 1) & 0xFF else -1
          if (label == 0xF9 && p + 7 < b.length && (b(p + 2) & 0xFF) >= 4) {
            val gpacked = b(p + 3) & 0xFF
            disposal = (gpacked >> 2) & 7
            transIdx = if ((gpacked & 1) != 0) b(p + 6) & 0xFF else -1
          }
          p += 2
          while (p < b.length && b(p) != 0) p += 1 + (b(p) & 0xFF)
          if (p >= b.length) fail("GIF extension runs past end of file")
          p += 1
        case 0x2C =>
          if (p + 10 > b.length) fail("GIF image descriptor truncated")
          val fx = le16(b, p + 1); val fy = le16(b, p + 3)
          val w = le16(b, p + 5); val h = le16(b, p + 7)
          val ipacked = b(p + 9) & 0xFF
          val interlaced = (ipacked & 0x40) != 0
          p += 10
          var pal = gct
          if ((ipacked & 0x80) != 0) {
            val k = 2 << (ipacked & 7)
            if (p + 3 * k > b.length) fail("GIF local color table truncated")
            pal = java.util.Arrays.copyOfRange(b, p, p + 3 * k)
            p += 3 * k
          }
          if (pal == null) fail("GIF image has no color table")
          if (w <= 0 || h <= 0 || fx + w > sw || fy + h > sh)
            fail(s"GIF frame rect ${w}x$h+$fx+$fy outside the ${sw}x$sh screen")
          if (p >= b.length) fail("GIF image data truncated")
          val minCode = b(p) & 0xFF
          p += 1
          val data = new java.io.ByteArrayOutputStream(b.length - p)
          while (p < b.length && b(p) != 0) {
            val k = b(p) & 0xFF
            if (p + 1 + k > b.length) fail("GIF data sub-block truncated")
            data.write(b, p + 1, k)
            p += 1 + k
          }
          if (p >= b.length) fail("GIF image data has no block terminator")
          p += 1
          val idx = gifLzw(data.toByteArray, minCode, w * h)
          if (idx.length < w * h)
            fail(s"GIF frame decodes ${idx.length} of ${w * h} pixels")
          val prev = if (disposal == 3) canvas.clone() else null
          val rowOrder: Seq[Int] =
            if (!interlaced) 0 until h
            else (0 until h by 8) ++ (4 until h by 8) ++
              (2 until h by 4) ++ (1 until h by 2)
          rowOrder.zipWithIndex.foreach { case (y, src) =>
            var x = 0
            while (x < w) {
              val v = idx(src * w + x) & 0xFF
              if (v != transIdx) {
                val i = v * 3
                if (i + 2 >= pal.length) fail("GIF palette index out of range")
                canvas((fy + y) * sw + (fx + x)) =
                  luma(pal(i) & 0xFF, pal(i + 1) & 0xFF, pal(i + 2) & 0xFF)
              }
              x += 1
            }
          }
          if (frame == n) return Raster(sw, sh, canvas)
          // disposal BETWEEN frames (this frame is not the target)
          disposal match {
            case 2 =>
              var y = fy
              while (y < fy + h) {
                java.util.Arrays.fill(canvas, y * sw + fx, y * sw + fx + w, bg)
                y += 1
              }
            case 3 => System.arraycopy(prev, 0, canvas, 0, canvas.length)
            case _ => ()
          }
          disposal = 0
          transIdx = -1
          frame += 1
        case 0x3B =>
          fail(s"GIF has $frame frames, frame $n requested")
        case other => fail(f"GIF unknown block 0x$other%02X")
      }
    }
    fail(s"GIF ends after $frame frames, frame $n requested")
  }

  private def decodeApngFrame(b: Array[Byte], n: Int): Raster = {
    // chunk walk: IHDR bytes (for re-wrapping), PLTE, tRNS presence,
    // acTL, and the fcTL/data sequence — CRC-validated like decodePng
    var p = 8
    var ihdr: Array[Byte] = null
    var plte: Array[Byte] = null
    var hasTrns = false
    var numFrames = -1
    // frames in stream order: (fcTL body, data streams)
    final case class Fc(w: Int, h: Int, x: Int, y: Int, dispose: Int,
      blend: Int, data: java.io.ByteArrayOutputStream)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Fc]
    var idatIsFrame = false
    var sawIdat = false
    var done = false
    while (!done) {
      if (p + 8 > b.length) fail("PNG truncated at chunk header")
      val len = be32(b, p)
      if (len < 0 || p + 12 + len > b.length)
        fail(s"PNG chunk length $len overruns the payload")
      val ctype = new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(b, p + 4, 4 + len)
      if (crc.getValue.toInt != be32(b, p + 8 + len))
        fail(s"PNG $ctype chunk fails its CRC")
      ctype match {
        case "IHDR" => ihdr = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + len)
        case "PLTE" => plte = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + len)
        case "tRNS" => hasTrns = true
        case "acTL" =>
          if (len < 8) fail("APNG acTL too short")
          numFrames = be32(b, p + 8)
        case "fcTL" =>
          if (len < 26) fail("APNG fcTL too short")
          frames += Fc(be32(b, p + 12), be32(b, p + 16),
            be32(b, p + 20), be32(b, p + 24),
            b(p + 8 + 24) & 0xFF, b(p + 8 + 25) & 0xFF,
            new java.io.ByteArrayOutputStream())
          if (!sawIdat) idatIsFrame = true
        case "IDAT" =>
          sawIdat = true
          if (idatIsFrame && frames.nonEmpty)
            frames.head.data.write(b, p + 8, len)
        case "fdAT" =>
          if (len < 4) fail("APNG fdAT too short")
          if (frames.isEmpty) fail("APNG fdAT before any fcTL")
          frames.last.data.write(b, p + 12, len - 4) // past sequence_number
        case "IEND" => done = true
        case _ => ()
      }
      p += 12 + len
    }
    if (ihdr == null) fail("PNG has no IHDR")
    if (numFrames < 0) fail("APNG has no acTL")
    if (n >= frames.length)
      fail(s"APNG has ${frames.length} frames, frame $n requested")
    val sw = be32(ihdr, 0); val sh = be32(ihdr, 4)
    checkDims(sw, sh, "APNG screen")
    val colorType = ihdr(9) & 0xFF
    val canvas = new Array[Byte](sw * sh) // starts black (transparent)
    var k = 0
    while (k <= n) {
      val f = frames(k)
      if (f.blend == 1 && (colorType == 4 || colorType == 6 || hasTrns))
        fail("APNG blend-over with an alpha channel (or tRNS) is out of scope")
      if (f.w <= 0 || f.h <= 0 || f.x < 0 || f.y < 0 ||
          f.x + f.w > sw || f.y + f.h > sh)
        fail(s"APNG frame rect ${f.w}x${f.h}+${f.x}+${f.y} outside ${sw}x$sh")
      // re-wrap the frame's independent zlib stream as a standalone
      // PNG and run the FULL single-image machinery on it
      val sub = wrapPng(ihdr, f.w, f.h, plte, f.data.toByteArray)
      val r = decodePng(sub)
      val prev = if (k < n && f.dispose == 2) canvas.clone() else null
      var y = 0
      while (y < f.h) {
        System.arraycopy(r.luma, y * f.w, canvas, (f.y + y) * sw + f.x, f.w)
        y += 1
      }
      if (k < n) f.dispose match {
        case 1 =>
          var yy = f.y
          while (yy < f.y + f.h) {
            java.util.Arrays.fill(canvas, yy * sw + f.x, yy * sw + f.x + f.w,
              0.toByte)
            yy += 1
          }
        case 2 => System.arraycopy(prev, 0, canvas, 0, canvas.length)
        case _ => ()
      }
      k += 1
    }
    Raster(sw, sh, canvas)
  }

  /** A standalone PNG from an APNG frame's parts: the original IHDR
    * patched to the frame rect, the shared PLTE, the frame's zlib
    * stream as one IDAT — CRCs recomputed so [[decodePng]]'s
    * validation applies to the synthesized container too. */
  private def wrapPng(ihdr: Array[Byte], w: Int, h: Int,
      plte: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 128)
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    def chunk(name: String, body: Array[Byte]): Unit = {
      def be(v: Int): Unit = { out.write(v >>> 24); out.write((v >> 16) & 0xFF)
        out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
      be(body.length)
      val nb = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(nb); out.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(nb); crc.update(body)
      be(crc.getValue.toInt)
    }
    val hdr = ihdr.clone()
    hdr(0) = (w >>> 24).toByte; hdr(1) = ((w >> 16) & 0xFF).toByte
    hdr(2) = ((w >> 8) & 0xFF).toByte; hdr(3) = (w & 0xFF).toByte
    hdr(4) = (h >>> 24).toByte; hdr(5) = ((h >> 16) & 0xFF).toByte
    hdr(6) = ((h >> 8) & 0xFF).toByte; hdr(7) = (h & 0xFF).toByte
    chunk("IHDR", hdr)
    if (plte != null) chunk("PLTE", plte)
    chunk("IDAT", data)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Apply an EXIF orientation (1-8) so the raster reads in DISPLAY
    * order: 2 mirror-H, 3 rotate 180, 4 mirror-V, 5 transpose,
    * 6 rotate 90 CW, 7 transverse, 8 rotate 270 CW (values outside
    * 1-8 are ignored — a corrupt tag must not scramble pixels). The
    * phone-photo near-dup case: the same shot stored upright and
    * stored rotated-with-orientation-tag must hash together. */
  private[graft] def orient(r: Raster, o: Long): Raster = {
    if (o <= 1 || o > 8) return r
    val swap = o >= 5
    val w = if (swap) r.h else r.w
    val h = if (swap) r.w else r.h
    // each transform is affine in (x, y): sx = a0 + ax*x + ay*y,
    // sy = b0 + bx*x + by*y — resolved ONCE, so the per-pixel loop is
    // pure index math (no per-pixel dispatch or tuple allocation)
    val (a0, ax, ay, b0, bx, by) = o.toInt match {
      case 2 => (r.w - 1, -1, 0, 0, 0, 1) // mirror horizontal
      case 3 => (r.w - 1, -1, 0, r.h - 1, 0, -1) // rotate 180
      case 4 => (0, 1, 0, r.h - 1, 0, -1) // mirror vertical
      case 5 => (0, 0, 1, 0, 1, 0) // transpose
      case 6 => (0, 0, 1, r.h - 1, -1, 0) // rotate 90 CW (stored 90 CCW)
      case 7 => (r.w - 1, 0, -1, r.h - 1, -1, 0) // transverse
      case _ => (r.w - 1, 0, -1, 0, 1, 0) // 8: rotate 270 CW
    }
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) =
          r.luma((b0 + bx * x + by * y) * r.w + (a0 + ax * x + ay * y))
        x += 1
      }
      y += 1
    }
    Raster(w, h, out)
  }

  private[expressions] def isTiff(b: Array[Byte]): Boolean =
    b.length >= 8 && ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  /** PackBits (the TIFF appendix / Macintosh RLE): n in 0..127 copies
    * n+1 literals, n in -127..-1 repeats the next byte 1-n times,
    * -128 is a no-op. */
  private def unpackBits(src: Array[Byte], expect: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(expect)
    var p = 0
    while (p < src.length && out.size < expect) {
      val n = src(p)
      p += 1
      if (n >= 0) {
        if (p + n + 1 > src.length) fail("PackBits literal run truncated")
        out.write(src, p, n + 1)
        p += n + 1
      } else if (n != -128) {
        if (p >= src.length) fail("PackBits repeat run truncated")
        var k = 1 - n
        while (k > 0) { out.write(src(p)); k -= 1 }
        p += 1
      }
    }
    out.toByteArray
  }

  /** Baseline TIFF (the classic scanned-document / raster-archive
    * format): the first IFD's image as strips OR tiles (TIFF 6.0 §15
    * — row-major tile grid, edge tiles padded, per-tile predictor) —
    * uncompressed, LZW (TIFF's early-change variant, the SAME decoder
    * as PDF's /LZWDecode), or PackBits — 8-bit samples, gray (both
    * photometrics), RGB(A), and palette, with horizontal-differencing
    * predictor 2, in chunky or PLANAR (PlanarConfiguration 2,
    * plane-ordered strips) sample layout; 16-bit samples as the
    * high-byte projection; and SUB-BYTE (1/2/4-bit) single-sample
    * gray/palette as MSB-first packed rows on byte boundaries, gray
    * scaled by 255/(2^bits-1). Tiled-planar, sub-byte predictor-2 /
    * multi-sample, 16-bit palette, and the CCITT/JPEG-in-TIFF
    * compressions are loud scope edges. */
  private def decodeTiff(b: Array[Byte]): Raster = {
    val le = b(0) == 'I'
    def u16(i: Int): Int =
      if (le) (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
      else ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    def u32(i: Int): Long =
      if (le) (b(i) & 0xFFL) | (b(i + 1) & 0xFFL) << 8 |
        (b(i + 2) & 0xFFL) << 16 | (b(i + 3) & 0xFFL) << 24
      else (b(i) & 0xFFL) << 24 | (b(i + 1) & 0xFFL) << 16 |
        (b(i + 2) & 0xFFL) << 8 | (b(i + 3) & 0xFFL)
    val ifd = u32(4).toInt
    if (ifd + 2 > b.length) fail("TIFF IFD offset past end of file")
    val n = u16(ifd)
    // tag -> (type, count, value-field offset)
    var tags = Map.empty[Int, (Int, Long, Int)]
    var k = 0
    while (k < n) {
      val e = ifd + 2 + 12 * k
      if (e + 12 > b.length) fail("TIFF IFD entry truncated")
      tags += (u16(e) -> ((u16(e + 2), u32(e + 4), e + 8)))
      k += 1
    }
    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1 case 3 | 8 => 2 case 4 | 9 | 11 => 4
      case 5 | 10 | 12 => 8 case _ => fail(s"TIFF field type $t")
    }
    def values(tag: Int): Option[Array[Long]] = tags.get(tag).map {
      case (t, count, vf) =>
        val sz = typeSize(t)
        val at = if (sz * count <= 4) vf else u32(vf).toInt
        if (at < 0 || at + sz * count > b.length)
          fail(s"TIFF tag $tag values overrun the payload")
        Array.tabulate(count.toInt) { i =>
          t match {
            case 1 => (b(at + i) & 0xFF).toLong
            case 3 => u16(at + 2 * i).toLong
            case 4 => u32(at + 4 * i)
            case other => fail(s"TIFF tag $tag has unexpected type $other")
          }
        }
    }
    def scalar(tag: Int, default: Long = -1): Long =
      values(tag).map(_.head).getOrElse {
        if (default >= 0) default else fail(s"TIFF is missing required tag $tag")
      }
    val w = scalar(256).toInt
    val h = scalar(257).toInt
    if (w <= 0 || h <= 0) fail(s"TIFF dimensions ${w}x$h")
    checkDims(w, h, "TIFF dimensions")
    val spp = scalar(277, default = 1).toInt
    val bits = values(258).getOrElse(Array(1L))
    if (!bits.forall(_ == bits.head))
      fail(s"TIFF mixed bits-per-sample ${bits.mkString("/")}")
    // bytes per sample: 8- and 16-bit samples decode (16-bit takes the
    // high byte per the file byte order — the 8-bit projection, the
    // PNG depth-16 rule); sub-byte depths (1/2/4-bit fax-and-icon
    // TIFFs) decode as MSB-first packed samples, single-sample
    // gray/palette only, rows padded to byte boundaries per TIFF 6.0
    val bitsN = bits.head.toInt
    val packed = bitsN == 1 || bitsN == 2 || bitsN == 4
    val bps = bitsN match {
      case 1 | 2 | 4 | 8 => 1
      case 16 => 2
      case o => fail(s"TIFF bits-per-sample $o (1/2/4/8/16 only)")
    }
    // planar configuration 2 = one PLANE per sample; with a single
    // sample the layouts coincide, so only multi-sample planar takes
    // the separate-plane path
    val planar = scalar(284, default = 1).toInt == 2 && spp > 1
    val tiled = tags.contains(322) || tags.contains(323)
    if (tiled && planar)
      fail("tiled planar-configuration-2 TIFF is out of scope")
    val photometric = scalar(262).toInt
    if (bps == 2 && photometric == 3)
      fail("16-bit palette TIFF is out of scope")
    val compression = scalar(259, default = 1).toInt
    val predictor = scalar(317, default = 1).toInt
    if (predictor != 1 && predictor != 2)
      fail(s"TIFF predictor $predictor")
    if (packed) {
      if (spp != 1)
        fail(s"sub-byte TIFF with $spp samples per pixel is out of scope")
      if (predictor != 1)
        fail("sub-byte TIFF horizontal differencing is out of scope")
    }
    val rowLen = if (packed) (w * bitsN + 7) / 8 else w * spp * bps
    // one SEGMENT decompress for strips and tiles alike: codec switch,
    // the bomb bound at the segment's declared ceiling, short decodes
    // loud, horizontal differencing per row at the given SAMPLE stride
    // (spp for chunky/tiled, 1 for a planar plane — byte offsets are
    // derived inside per bps, so 16-bit rows accumulate against the
    // previous PIXEL, not two pixels back)
    def segment(seg: Int, expect: Int, cap: Int, segRowLen: Int,
        stride: Int, offsets: Array[Long], counts: Array[Long]): Array[Byte] = {
      val at = offsets(seg).toInt
      val cnt = counts(seg).toInt
      if (at < 0 || cnt < 0 || at + cnt > b.length) fail("TIFF segment truncated")
      val raw = java.util.Arrays.copyOfRange(b, at, at + cnt)
      val data = compression match {
        case 1 => raw
        case 5 => // TIFF LZW = PDF LZWDecode with early change
          try ParsePdf.lzwDecode(raw, earlyChange = 1, maxOut = cap)
          catch {
            case e: IllegalArgumentException =>
              fail(s"TIFF LZW segment: ${e.getMessage}")
          }
        case 32773 => unpackBits(raw, expect)
        // CCITT G3/G4 (2/3/4): out of scope for the same reason as
        // lossy VP8 and arithmetic JPEG — the T.4/T.6 terminating and
        // make-up code tables (~200 normative codewords) are spec
        // DATA, not derivable; no spec copy or reference decoder is
        // available in this zero-egress build to source or validate
        // them, and inventing them would decode every real fax file
        // silently wrong
        case 2 | 3 | 4 =>
          fail(s"TIFF compression $compression (CCITT) is out of scope: " +
            "the T.4/T.6 code tables are normative spec data " +
            "unavailable in this build")
        case other =>
          fail(s"TIFF compression $other is out of scope (1/5/32773)")
      }
      if (data.length < expect) fail(s"TIFF segment decodes short " +
        s"(${data.length} of $expect bytes)")
      if (predictor == 2) {
        // horizontal differencing per row at the sample stride; 16-bit
        // samples difference as 16-bit VALUES in the file byte order
        // (byte-level stride-2 adds would drop the carries)
        var r = 0
        val rows = expect / segRowLen
        while (r < rows) {
          if (bps == 1) {
            var i = r * segRowLen + stride
            val end = (r + 1) * segRowLen
            while (i < end) { data(i) = (data(i) + data(i - stride)).toByte; i += 1 }
          } else {
            def v16(i: Int): Int =
              if (le) (data(i) & 0xFF) | ((data(i + 1) & 0xFF) << 8)
              else ((data(i) & 0xFF) << 8) | (data(i + 1) & 0xFF)
            var i = r * segRowLen + stride * 2
            val end = (r + 1) * segRowLen
            while (i < end) {
              val v = (v16(i) + v16(i - stride * 2)) & 0xFFFF
              if (le) { data(i) = (v & 0xFF).toByte; data(i + 1) = (v >> 8).toByte }
              else { data(i) = (v >> 8).toByte; data(i + 1) = (v & 0xFF).toByte }
              i += 2
            }
          }
          r += 1
        }
      }
      data
    }
    val colorMap: Array[Long] =
      if (photometric == 3)
        values(320).getOrElse(fail("palette TIFF has no ColorMap"))
      else null
    val px = new Array[Byte](rowLen * h)
    if (tiled) {
      // tiles (TIFF 6.0 section 15): the image as a grid of tw x th
      // tiles in row-major tile order, edge tiles PADDED to full
      // size; each tile its own compressed segment, predictor per
      // tile row
      val tw = scalar(322).toInt
      val th = scalar(323).toInt
      if (tw <= 0 || th <= 0 || tw % 16 != 0 || th % 16 != 0)
        fail(s"TIFF tile size ${tw}x$th (16-multiples per the spec)")
      checkDims(tw, th, "TIFF tile size")
      val offsets = values(324).getOrElse(fail("tiled TIFF has no tile offsets"))
      val counts = values(325).getOrElse(fail("tiled TIFF has no tile byte counts"))
      if (offsets.length != counts.length) fail("TIFF tile tables disagree")
      val across = (w + tw - 1) / tw
      val down = (h + th - 1) / th
      if (offsets.length < across * down)
        fail(s"TIFF tile tables cover ${offsets.length} of ${across * down} tiles")
      // tile widths are 16-multiples, so a packed tile's column start
      // (x0 * bits) always lands on a byte boundary — the byte-wise
      // row copy stays exact at every sub-byte depth
      val tileRowLen = if (packed) tw * bitsN / 8 else tw * spp * bps
      val expect = tileRowLen * th
      var t = 0
      while (t < across * down) {
        val data = segment(t, expect, expect, tileRowLen, spp, offsets, counts)
        val x0 = (t % across) * tw
        val y0 = (t / across) * th
        val copyCols =
          if (packed) (math.min(tw, w - x0) * bitsN + 7) / 8
          else math.min(tw, w - x0) * spp * bps
        val colOff = if (packed) x0 * bitsN / 8 else x0 * spp * bps
        var r = 0
        while (r < th && y0 + r < h) {
          System.arraycopy(data, r * tileRowLen,
            px, (y0 + r) * rowLen + colOff, copyCols)
          r += 1
        }
        t += 1
      }
    } else {
      // strips; clamped BEFORE toInt: the TIFF 6.0 "effectively
      // infinite" convention writes RowsPerStrip = 2^32-1 for
      // single-strip files, which a bare toInt turns into -1
      val rowsPerStrip = math.min(scalar(278, default = h.toLong), h.toLong).toInt
      val offsets = values(273).getOrElse(fail("TIFF has no strip offsets"))
      val counts = values(279).getOrElse(fail("TIFF has no strip byte counts"))
      if (offsets.length != counts.length) fail("TIFF strip tables disagree")
      val stripsPerPlane = (h + rowsPerStrip - 1) / rowsPerStrip
      if (planar) {
        // planar configuration 2 (TIFF 6.0 PlanarConfiguration): all
        // strips of sample 0, then sample 1, ... - each plane strip
        // holds w (not w*spp) bytes per row with sample-stride-1
        // differencing; samples interleave into the chunky layout the
        // pixel loop below reads
        if (offsets.length < spp * stripsPerPlane)
          fail(s"TIFF planar strip tables cover ${offsets.length} of " +
            s"${spp * stripsPerPlane} strips")
        var s = 0
        while (s < spp) {
          var strip = 0
          while (strip < stripsPerPlane) {
            val rowsHere = math.min(rowsPerStrip, h - strip * rowsPerStrip)
            val data = segment(s * stripsPerPlane + strip, w * bps * rowsHere,
              w * bps * rowsPerStrip, w * bps, 1, offsets, counts)
            var r = 0
            while (r < rowsHere) {
              val y = strip * rowsPerStrip + r
              var x = 0
              while (x < w) {
                var bb = 0
                while (bb < bps) {
                  px(y * rowLen + (x * spp + s) * bps + bb) =
                    data(r * w * bps + x * bps + bb)
                  bb += 1
                }
                x += 1
              }
              r += 1
            }
            strip += 1
          }
          s += 1
        }
      } else {
        var strip = 0
        while (strip < stripsPerPlane) {
          val rowsHere = math.min(rowsPerStrip, h - strip * rowsPerStrip)
          val data = segment(strip, rowLen * rowsHere,
            rowLen * rowsPerStrip, rowLen, spp, offsets, counts)
          System.arraycopy(data, 0, px, strip * rowsPerStrip * rowLen,
            rowLen * rowsHere)
          strip += 1
        }
      }
    }
    val out = new Array[Byte](w * h)
    if (packed) {
      // MSB-first sub-byte samples; gray scales by 255/(2^bits - 1) so
      // full-scale is exactly 255 at every depth (255 / 85 / 17 are
      // integral), palette values index the ColorMap unscaled
      val mask = (1 << bitsN) - 1
      val scale = 255 / mask
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val bit = x * bitsN
          val v = ((px(y * rowLen + (bit >> 3)) & 0xFF) >>
            (8 - bitsN - (bit & 7))) & mask
          out(y * w + x) = photometric match {
            case 0 => (255 - v * scale).toByte // WhiteIsZero
            case 1 => (v * scale).toByte
            case 3 =>
              val m = colorMap.length / 3
              if (v >= m) fail("TIFF palette index out of range")
              luma((colorMap(v) >> 8).toInt & 0xFF,
                (colorMap(m + v) >> 8).toInt & 0xFF,
                (colorMap(2 * m + v) >> 8).toInt & 0xFF)
            case other => fail(s"TIFF photometric $other is out of scope")
          }
          x += 1
        }
        y += 1
      }
      return Raster(w, h, out)
    }
    // the sample's HIGH byte (16-bit takes the MSB per byte order —
    // the 8-bit projection)
    def hi(off: Int): Int =
      if (bps == 1) px(off) & 0xFF
      else px(off + (if (le) 1 else 0)) & 0xFF
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val s = y * rowLen + x * spp * bps
        out(y * w + x) = photometric match {
          case 0 => (255 - hi(s)).toByte // WhiteIsZero
          case 1 => hi(s).toByte
          case 2 => // RGB(A): extra samples ignored
            if (spp < 3) fail("RGB TIFF with fewer than 3 samples")
            luma(hi(s), hi(s + bps), hi(s + 2 * bps))
          case 3 =>
            val i = px(s) & 0xFF
            val m = colorMap.length / 3
            if (i >= m) fail("TIFF palette index out of range")
            // ColorMap entries are 16-bit; take the high byte
            luma((colorMap(i) >> 8).toInt & 0xFF,
              (colorMap(m + i) >> 8).toInt & 0xFF,
              (colorMap(2 * m + i) >> 8).toInt & 0xFF)
          case other => fail(s"TIFF photometric $other is out of scope")
        }
        x += 1
      }
      y += 1
    }
    Raster(w, h, out)
  }

  /** None = not a PNG/BMP/GIF/JPEG/TIFF/WebP magic; loud on
    * structural defects inside a recognized format. JPEGs come back
    * in DISPLAY orientation: the EXIF orientation tag, when present,
    * is applied ([[orient]]) — a rotated-with-tag duplicate then
    * hashes with its upright twin. WebP routes to [[WebpDecode]]
    * (VP8L lossless; lossy VP8 and animation are its loud edges). */
  def decodeLuma(b: Array[Byte]): Option[Raster] =
    if (isPng(b)) Some(decodePng(b))
    else if (isBmp(b)) Some(decodeBmp(b))
    else if (isGif(b)) Some(decodeGif(b))
    else if (JpegDecode.isJpeg(b)) {
      val raw = JpegDecode.decodeLuma(b)
      val o = ExifMeta.decode(b) match {
        case Some((_, _, orientTag, _, _)) if orientTag != null => orientTag.longValue
        case _ => 1L
      }
      Some(orient(raw, o))
    } else if (isTiff(b)) Some(decodeTiff(b))
    else if (WebpDecode.isWebp(b)) Some(WebpDecode.decodeLuma(b))
    else None

  /** Tolerant twin for feature extraction: any failure (fake header,
    * exotic variant) is None, never an exception. */
  def tryDecodeLuma(b: Array[Byte]): Option[Raster] =
    try decodeLuma(b) catch { case _: Exception => None }

  /** Box-average downscale (exact integer mean per target cell,
    * half-up rounding); sources smaller than the target replicate
    * pixels. Deterministic — no float resampling kernels. */
  private[graft] def resample(r: Raster, n: Int): Array[Int] = {
    val out = new Array[Int](n * n)
    var ty = 0
    while (ty < n) {
      val y0 = ty * r.h / n
      val y1 = math.max(y0 + 1, (ty + 1) * r.h / n)
      var tx = 0
      while (tx < n) {
        val x0 = tx * r.w / n
        val x1 = math.max(x0 + 1, (tx + 1) * r.w / n)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += r.luma(y * r.w + x) & 0xFF; x += 1 }
          y += 1
        }
        val cnt = (y1 - y0).toLong * (x1 - x0)
        out(ty * n + tx) = ((2 * sum + cnt) / (2 * cnt)).toInt
        tx += 1
      }
      ty += 1
    }
    out
  }

  private val N = 32
  private val cosTable: Array[Array[Double]] = {
    // orthonormal DCT-II basis, u rows 0..7 over x 0..31
    // StrictMath: Math.cos is only 1-ulp-specified and may differ by
    // intrinsic across JVMs/architectures — a coefficient sitting at
    // the median threshold would flip a hash bit between hosts. The
    // table builds once, so the strict variant costs nothing.
    Array.tabulate(8, N) { (u, x) =>
      val alpha = if (u == 0) StrictMath.sqrt(1.0 / N) else StrictMath.sqrt(2.0 / N)
      alpha * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * N))
    }
  }

  /** 64-bit perceptual hash: 32x32 box-downscale, 2D DCT-II, the 8x8
    * low-frequency block thresholded at its own median (bit u*8+v set
    * iff F(u,v) > median — ties below, so exactly <= 32 bits set). */
  def phash64(r: Raster): Long = {
    val p = resample(r, N)
    // separable: rows first (8 needed freqs x 32 rows), then columns
    val tmp = Array.ofDim[Double](N, 8)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < N) { s += p(y * N + x) * cosTable(u)(x); x += 1 }
        tmp(y)(u) = s
        u += 1
      }
      y += 1
    }
    val f = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < N) { s += tmp(yy)(u) * cosTable(v)(yy); yy += 1 }
        f(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val sorted = f.clone()
    java.util.Arrays.sort(sorted)
    val med = (sorted(31) + sorted(32)) / 2.0
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (f(i) > med) bits |= 1L << i
      i += 1
    }
    bits
  }
}

/** Frame-N perceptual hash for ANIMATED payloads —
  * [[PixelDecode.phash64]] over [[PixelDecode.decodeFrame]]'s
  * composed canvas: the animated-re-encode near-dup case (a banner
  * gif of a static image hashes with its still twin; frame sampling
  * across the first [[PixelDecode.MaxFrames]]). Null for a frame
  * past the payload's count when `tolerant`; loud otherwise. */
case class PixelFramePhash(child: Expression, frame: Int,
    tolerant: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullable: Boolean = tolerant

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"PixelFramePhash needs a binary payload, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (tolerant)
      try PixelDecode.phash64(PixelDecode.decodeFrame(b, frame))
      catch { case _: Exception => null }
    else PixelDecode.phash64(PixelDecode.decodeFrame(b, frame))
  }

  override protected def withNewChildInternal(c: Expression): PixelFramePhash =
    copy(child = c)
}

object PixelFramePhash {
  def apply(payload: Column, frame: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(PixelFramePhash(
      org.apache.spark.sql.graft.ColumnBridge.expression(payload), frame))
}

/** The perceptual hash as a column expression: decoded-pixel
  * [[PixelDecode.phash64]] over a PNG/BMP payload. A payload that is
  * neither fails loudly — this operator is for image columns, and a
  * wrong-format row in one is a pipeline bug, not tag soup. */
case class PixelPhash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"PixelPhash needs a binary payload, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    PixelDecode.phash64(PixelDecode.decodeLuma(b).getOrElse(
      throw new IllegalArgumentException(
        "PixelPhash: payload is none of PNG/BMP/GIF/JPEG/TIFF/WebP")))
  }

  override protected def withNewChildInternal(c: Expression): PixelPhash =
    copy(child = c)
}

object PixelPhash {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PixelPhash(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))
}

/** Format + decoded dimensions + perceptual hash + exact raster
  * digest in ONE decode — the crawl image pipeline needs all of them
  * per kept image, and separate expressions would decode the payload
  * once each. `px_md5` digests the decoded LUMA raster (dims
  * prefixed), so byte-different re-encodings of the same pixels —
  * the recompressed-duplicate mass — group EXACTLY, while `ph`
  * carries the near-dup ring ([[graft.operators.HammingPairs]]).
  * Default policy is loud like [[PixelPhash]] (an image column
  * carrying tag soup is a pipeline bug); `tolerant = true` returns
  * NULL on any decode failure instead — the crawl-extraction case,
  * where the payload is an untrusted data URI or a mislabeled
  * response body and a junk image must drop, not fail the crawl. */
case class PixelMeta(child: Expression, tolerant: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = new StructType()
    .add("fmt", StringType, nullable = false)
    .add("width", IntegerType, nullable = false)
    .add("height", IntegerType, nullable = false)
    .add("ph", LongType, nullable = false)
    .add("px_md5", StringType, nullable = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"PixelMeta needs a binary payload, got ${child.dataType.catalogString}")

  override def nullable: Boolean = tolerant || child.nullable

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      val fmt =
        if (PixelDecode.isPng(b)) "png"
        else if (PixelDecode.isBmp(b)) "bmp"
        else if (PixelDecode.isGif(b)) "gif"
        else if (JpegDecode.isJpeg(b)) "jpeg"
        else if (PixelDecode.isTiff(b)) "tiff"
        else if (WebpDecode.isWebp(b)) "webp"
        else throw new IllegalArgumentException(
          "PixelMeta: payload is none of PNG/BMP/GIF/JPEG/TIFF/WebP")
      val r = PixelDecode.decodeLuma(b).get
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(s"${r.w}x${r.h}:".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      md.update(r.luma)
      org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(fmt),
        r.w, r.h, PixelDecode.phash64(r),
        org.apache.spark.unsafe.types.UTF8String.fromString(
          md.digest().map("%02x".format(_)).mkString))
    } catch {
      case e: Exception if tolerant => null // junk drops, the crawl survives
    }
  }

  override protected def withNewChildInternal(c: Expression): PixelMeta =
    copy(child = c)
}

object PixelMeta {
  def apply(payload: Column): Column = apply(payload, tolerant = false)
  def apply(payload: Column, tolerant: Boolean): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PixelMeta(org.apache.spark.sql.graft.ColumnBridge.expression(payload),
        tolerant))
}
