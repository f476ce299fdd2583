package graft.functions.expressions

/** From-scratch BASELINE JPEG decode to luma (ISO/IEC 10918-1 — the
  * public JPEG spec): marker walk, DQT/DHT/SOF0/SOS/DRI, canonical
  * Huffman decode over the byte-stuffed entropy stream, DC prediction
  * + AC run-length per 8x8 block, dequantization in zigzag order, a
  * deterministic double-precision 8x8 IDCT, restart-marker handling.
  * Crawl images are overwhelmingly JPEG, so without this the pixel
  * seam ([[PixelDecode]]) covers the formats a crawl rarely carries.
  *
  * Only the LUMA plane is kept: JFIF's Y component IS BT.601 luma, so
  * no chroma upsampling is ever needed — but interleaved scans still
  * DECODE the chroma blocks (the entropy stream has no skip). Scope,
  * loud outside it: baseline + extended-sequential Huffman (SOF0/1);
  * progressive (SOF2), arithmetic coding, lossless, hierarchical and
  * 12-bit precision fail by name. Four-component (Adobe CMYK) fails —
  * its "luma" is not Y. Unlike PNG there is no bit-exact decode
  * contract across implementations (IDCT rounding is
  * implementation-defined within spec accuracy bounds), so the spec
  * cross-validates against an independent decoder with tolerance and
  * pins THIS decoder's determinism separately. */
object JpegDecode {

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"JPEG decode: $what")

  private[expressions] def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
      (b(2) & 0xFF) == 0xFF

  /** Zigzag order: index = scan position, value = (row*8 + col). */
  private val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var x = 0; var y = 0
    var up = true
    var k = 0
    while (k < 64) {
      z(k) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      k += 1
    }
    z
  }

  private val IdctCos: Array[Array[Double]] =
    // StrictMath for the same cross-host bit-determinism reason as
    // PixelDecode's DCT table (one-time build)
    Array.tabulate(8, 8) { (u, x) =>
      val c = if (u == 0) StrictMath.sqrt(0.125) else 0.5
      c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
    }

  /** Canonical Huffman table: per code length 1..16, the first code
    * value and the symbol slice. */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) maxCode(l) = -1
        else {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = in.bit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | in.bit()
        l += 1
      }
      if (l > 16) fail("Huffman code longer than 16 bits")
      symbols(valPtr(l) + code - minCode(l))
    }
  }

  /** MSB-first bit reader over the entropy segment, undoing FF00 byte
    * stuffing; restart markers are consumed by [[restart]]. */
  private final class BitReader(b: Array[Byte], var p: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (p >= b.length) fail("entropy stream ends mid-symbol")
        var v = b(p) & 0xFF
        p += 1
        if (v == 0xFF) {
          if (p >= b.length) fail("entropy stream ends at a marker byte")
          val m = b(p) & 0xFF
          if (m == 0x00) p += 1 // stuffed FF
          else if (m == 0xD9)
            // a refill that reaches EOI means a block still wanted a
            // whole symbol: the scan is TRUNCATED (legitimate pad bits
            // live inside the last data byte, before the marker) —
            // loud, never zero-filled coefficients
            fail("entropy stream truncated (EOI before the last MCU)")
          else fail(f"unexpected marker 0xFF$m%02X inside the scan")
        }
        acc = v
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Align to a byte and consume an expected RSTn marker. */
    def restart(n: Int): Unit = {
      nbits = 0
      // tolerate pad bits then require FF Dn
      if (p + 1 >= b.length) fail("entropy stream ends at a restart boundary")
      if ((b(p) & 0xFF) != 0xFF || (b(p + 1) & 0xFF) != (0xD0 + n))
        fail(f"expected restart marker RST$n at offset $p")
      p += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  def decodeLuma(b: Array[Byte]): PixelDecode.Raster = {
    if (!isJpeg(b)) fail("not a JPEG (no SOI)")
    var p = 2
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var w = 0; var h = 0
    var nComp = 0
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compQ: Array[Int] = null; var compId: Array[Int] = null
    var restartInterval = 0
    def u16(i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    var sos = -1
    var compDc: Array[Int] = null; var compAc: Array[Int] = null
    while (sos < 0) {
      if (p + 4 > b.length) fail("marker stream truncated")
      if ((b(p) & 0xFF) != 0xFF) fail(f"expected a marker at offset $p")
      val m = b(p + 1) & 0xFF
      val len = u16(p + 2)
      if (p + 2 + len > b.length) fail(f"marker 0xFF$m%02X overruns the payload")
      m match {
        case 0xC0 | 0xC1 => // baseline / extended sequential
          if ((b(p + 4) & 0xFF) != 8) fail("12-bit precision is out of scope")
          h = u16(p + 5); w = u16(p + 7)
          nComp = b(p + 9) & 0xFF
          if (w <= 0 || h <= 0) fail(s"JPEG dimensions ${w}x$h")
          PixelDecode.checkDims(w, h, "JPEG dimensions")
          if (nComp != 1 && nComp != 3)
            fail(s"$nComp-component JPEG (CMYK?) is out of scope")
          compH = new Array[Int](nComp); compV = new Array[Int](nComp)
          compQ = new Array[Int](nComp); compId = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = b(p + 10 + 3 * c) & 0xFF
            val hv = b(p + 11 + 3 * c) & 0xFF
            compH(c) = hv >> 4; compV(c) = hv & 0xF
            if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4)
              fail(s"sampling factors ${compH(c)}x${compV(c)}")
            compQ(c) = b(p + 12 + 3 * c) & 0xFF
            c += 1
          }
        case 0xC2 => fail("progressive JPEG (SOF2) is out of scope")
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
          fail(f"SOF marker 0xFF$m%02X (non-baseline) is out of scope")
        case 0xC4 => // DHT
          var q = p + 4
          while (q < p + 2 + len) {
            val tc = (b(q) >> 4) & 0xF
            val th = b(q) & 0xF
            if (th > 3) fail(s"Huffman table id $th")
            val counts = Array.tabulate(16)(i => b(q + 1 + i) & 0xFF)
            val total = counts.sum
            val symbols = Array.tabulate(total)(i => b(q + 17 + i) & 0xFF)
            val t = new Huff(counts, symbols)
            if (tc == 0) dcT(th) = t
            else if (tc == 1) acT(th) = t
            else fail(s"Huffman table class $tc")
            q += 17 + total
          }
        case 0xDB => // DQT
          var q = p + 4
          while (q < p + 2 + len) {
            val pq = (b(q) >> 4) & 0xF
            val tq = b(q) & 0xF
            if (tq > 3) fail(s"quant table id $tq")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(i) = if (pq == 0) b(q + 1 + i) & 0xFF else u16(q + 1 + 2 * i)
              i += 1
            }
            qt(tq) = t
            q += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xDD => restartInterval = u16(p + 4)
        case 0xDA => // SOS
          val ns = b(p + 4) & 0xFF
          if (ns != nComp) fail("SOS component count != SOF (multi-scan?)")
          compDc = new Array[Int](nComp); compAc = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val id = b(p + 5 + 2 * c) & 0xFF
            val k = compId.indexOf(id)
            if (k < 0) fail(s"SOS names unknown component $id")
            compDc(k) = (b(p + 6 + 2 * c) >> 4) & 0xF
            compAc(k) = b(p + 6 + 2 * c) & 0xF
            c += 1
          }
          sos = p + 2 + len
        case x if x >= 0xE0 && x <= 0xEF => () // APPn
        case 0xFE => () // COM
        case other => fail(f"marker 0xFF$other%02X is out of scope")
      }
      p += 2 + len
    }
    if (w == 0) fail("SOS before SOF")
    if (nComp == 1) {
      // a single-component scan is NON-INTERLEAVED (ISO 10918-1
      // A.2.2): one 8x8 block per MCU over a ceil(w/8) x ceil(h/8)
      // grid, the SOF sampling factors notwithstanding — a grayscale
      // file declaring 2x2 factors (libjpeg color->gray keeps them)
      // would otherwise desynchronize the entropy stream
      compH(0) = 1; compV(0) = 1
    }
    val hmax = compH.max; val vmax = compV.max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // keep only component 0 (Y = luma); its plane in MCU-padded dims
    val yW = mcusX * compH(0) * 8
    val yPlane = new Array[Byte](yW * mcusY * compV(0) * 8)
    val in = new BitReader(b, sos)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    def decodeBlock(c: Int, outX: Int, outY: Int): Unit = {
      val q = qt(compQ(c))
      if (q == null) fail(s"component $c references an undeclared quant table")
      val dt = dcT(compDc(c)); val at = acT(compAc(c))
      if (dt == null || at == null)
        fail(s"component $c references an undeclared Huffman table")
      java.util.Arrays.fill(coef, 0)
      val s = dt.decode(in)
      if (s > 11) fail(s"DC category $s")
      pred(c) += extend(in.receive(s), s)
      coef(0) = pred(c) * q(0)
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = at.decode(in)
        val r = rs >> 4; val ssss = rs & 0xF
        if (ssss == 0) {
          if (r == 15) k += 16 // ZRL
          else done = true // EOB
        } else {
          k += r
          if (k > 63) fail("AC run past the block end")
          coef(Zigzag(k)) = extend(in.receive(ssss), ssss) * q(k)
          k += 1
        }
      }
      if (c == 0) {
        // IDCT only for the luma plane; chroma blocks decode (the
        // stream interleaves them) but never transform
        var x = 0
        while (x < 8) { // columns first
          var u = 0
          while (u < 8) {
            var s2 = 0.0
            var v = 0
            while (v < 8) { s2 += coef(v * 8 + u) * IdctCos(v)(x); v += 1 }
            tmp(x)(u) = s2
            u += 1
          }
          x += 1
        }
        var y = 0
        while (y < 8) {
          var x2 = 0
          while (x2 < 8) {
            var s2 = 0.0
            var u = 0
            while (u < 8) { s2 += tmp(y)(u) * IdctCos(u)(x2); u += 1 }
            val v = math.round(s2).toInt + 128
            val px = outX + x2; val py = outY + y
            yPlane(py * yW + px) =
              (if (v < 0) 0 else if (v > 255) 255 else v).toByte
            x2 += 1
          }
          y += 1
        }
      }
    }
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          in.restart(((mcu / restartInterval) - 1) % 8)
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < nComp) {
          var by = 0
          while (by < compV(c)) {
            var bx = 0
            while (bx < compH(c)) {
              decodeBlock(c,
                (mx * compH(c) + bx) * 8, (my * compV(c) + by) * 8)
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // crop the MCU padding
    val out = new Array[Byte](w * h)
    // Y samples per image pixel: Y is full-resolution when h1=hmax;
    // when Y itself is subsampled (rare), nearest-sample lookup
    val sx = compH(0).toDouble / hmax
    val sy = compV(0).toDouble / vmax
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val yy = math.min((y * sy).toInt, mcusY * compV(0) * 8 - 1)
        val xx = math.min((x * sx).toInt, yW - 1)
        out(y * w + x) = yPlane(yy * yW + xx)
        x += 1
      }
      y += 1
    }
    PixelDecode.Raster(w, h, out)
  }
}
