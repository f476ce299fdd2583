package graft.functions.expressions

import graft.functions.expressions.PixelDecode.Raster

/** From-scratch WebP LOSSLESS (VP8L) decode — the crawl image format
  * [[PixelDecode]] was missing (double-digit share of modern web
  * images). Implements the public "WebP Lossless Bitstream
  * Specification" end to end: the RIFF/WEBP container walk, the
  * LSB-first bit stream, canonical prefix codes (RFC 1951 convention
  * — code bits MSB-first over the LSB-first stream), simple and
  * normal code forms with the 19-symbol code-length code, color
  * cache, meta prefix (entropy image) grouping, LZ77 with both the
  * 120-entry 2D distance map and linear distances, and all four
  * transforms (predictor with the 14 modes, cross-color,
  * subtract-green, color indexing with sub-byte bundling) applied in
  * reverse read order.
  *
  * Scope edges fail LOUDLY by name, the [[PixelDecode]] policy:
  * lossy VP8 key frames (the header parses exactly and the failure
  * names the geometry; the pixel half is blocked on RFC 6386's
  * normative probability tables — see [[vp8KeyHeader]] for the
  * precise constraint), truncated or over-long streams. The container
  * walk skips VP8X/ALPH/EXIF/ICCP metadata chunks to find the VP8L
  * payload, so extended-format lossless files decode too. ANIMATED
  * files stay loud on the single-frame path and compose through
  * [[decodeAnimFrame]] (VP8L frames only — a lossy frame fails
  * through the same named edge).
  */
object WebpDecode {

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"webp decode: $what")

  private[expressions] def isWebp(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'

  /** LSB-first bit reader over the VP8L payload; reading past the end
    * is a loud truncation, never silent zeros. */
  private final class Br(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var acc = 0L
    private var nbits = 0
    def bit(): Int = bits(1)
    def bits(n: Int): Int = {
      while (nbits < n) {
        if (pos >= end) fail("truncated VP8L stream")
        acc |= (b(pos) & 0xFFL) << nbits
        nbits += 8
        pos += 1
      }
      val v = (acc & ((1L << n) - 1)).toInt
      acc >>>= n
      nbits -= n
      v
    }
  }

  /** Canonical prefix decoder (RFC 1951 assignment; bits read
    * MSB-of-code-first). A code with exactly one used symbol is the
    * 0-bit always-that-symbol code — the spec's single-symbol case,
    * shared by the simple form and degenerate normal codes. */
  private final class Huff(lengths: Array[Int]) {
    private val maxLen = lengths.max
    private val only = {
      val nz = lengths.indices.filter(lengths(_) > 0)
      if (nz.isEmpty) fail("prefix code with no symbols")
      if (nz.length == 1) nz.head else -1
    }
    // first canonical code and symbol table per length
    private val first = new Array[Int](maxLen + 2)
    private val offs = new Array[Int](maxLen + 2)
    private val syms: Array[Int] = if (only >= 0) null else {
      val count = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) count(l) += 1)
      var code = 0
      var total = 0
      for (len <- 1 to maxLen) {
        code = (code + count(len - 1)) << 1
        first(len) = code
        offs(len) = total
        total += count(len)
      }
      // completeness (Kraft equality): an under/over-subscribed code
      // would decode garbage silently — fail at build time instead
      val kraft = (1 to maxLen).map(l => count(l).toLong << (maxLen - l)).sum
      if (kraft != (1L << maxLen)) fail("incomplete prefix code")
      val out = new Array[Int](total)
      val next = offs.clone()
      lengths.indices.foreach { s =>
        val l = lengths(s)
        if (l > 0) { out(next(l)) = s; next(l) += 1 }
      }
      out
    }
    private val countAt = {
      val c = new Array[Int](maxLen + 1)
      if (syms != null) lengths.foreach(l => if (l > 0) c(l) += 1)
      c
    }
    def read(br: Br): Int = {
      if (only >= 0) return only
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.bit()
        len += 1
        if (countAt(len) > 0 && code - first(len) < countAt(len) && code >= first(len))
          return syms(offs(len) + code - first(len))
      }
      fail("prefix code walked past its longest length")
    }
  }

  // code-length-code symbol order (spec: "Decoding the code lengths")
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code, simple or normal form. */
  private def readCode(br: Br, alphabetSize: Int): Huff = {
    val lengths = new Array[Int](alphabetSize)
    if (br.bit() == 1) { // simple: 1 or 2 symbols, spelled inline
      val numSymbols = br.bit() + 1
      val first8 = br.bit()
      val s0 = br.bits(if (first8 == 1) 8 else 1)
      if (s0 >= alphabetSize) fail(s"simple-code symbol $s0 outside alphabet")
      lengths(s0) = 1
      if (numSymbols == 2) {
        val s1 = br.bits(8)
        if (s1 >= alphabetSize || s1 == s0) fail(s"simple-code symbol $s1 invalid")
        lengths(s1) = 1
      }
      new Huff(lengths)
    } else { // normal: code lengths themselves prefix-coded
      val numCl = br.bits(4) + 4
      val clLen = new Array[Int](19)
      (0 until numCl).foreach(i => clLen(ClOrder(i)) = br.bits(3))
      val cl = new Huff(clLen)
      // optional cap on how many symbol lengths are READ (the rest 0)
      var maxSymbol =
        if (br.bit() == 1) {
          val nbits = 2 + 2 * br.bits(3)
          2 + br.bits(nbits)
        } else alphabetSize
      var symbol = 0
      var prevLen = 8 // the spec's default repeat-16 seed
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val c = cl.read(br)
        if (c < 16) {
          lengths(symbol) = c
          symbol += 1
          if (c != 0) prevLen = c
        } else {
          val (repeat, len) = c match {
            case 16 => (3 + br.bits(2), prevLen)
            case 17 => (3 + br.bits(3), 0)
            case _ => (11 + br.bits(7), 0)
          }
          var r = repeat
          while (r > 0 && symbol < alphabetSize) {
            lengths(symbol) = len
            symbol += 1
            r -= 1
          }
        }
      }
      new Huff(lengths)
    }
  }

  /** LZ77 length/distance prefix decoding (spec: 24 length and 40
    * distance prefix codes, exponential extra bits). */
  private def prefixValue(br: Br, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  /** The 2D distance map: dist codes 1..120 address a close pixel
    * neighborhood; codes > 120 are scan-line distances offset by 120.
    * The spec's table is exactly the 120 offsets {(x,0): 1<=x<=8} ∪
    * {(x,y): 1<=y<=7, -7<=x<=8} sorted by squared distance, ties
    * broken by LARGER dy first, then positive dx before negative —
    * generated here instead of transcribed (the spec prints the same
    * list; PixelSpec pins representative entries). Offsets point
    * BACKWARD: dist = dy*width + dx, clamped to >= 1. */
  private val DistMap: Array[(Int, Int)] = {
    val cands = (1 to 8).map(x => (x, 0)) ++
      (for { y <- 1 to 7; x <- -7 to 8 } yield (x, y))
    cands.sortBy { case (x, y) => (x * x + y * y, -y, -x) }.toArray
  }

  private def sub(size: Int, bits: Int): Int = (size + (1 << bits) - 1) >> bits

  /** One entropy-coded image: color cache + (main image only) meta
    * prefix groups + the literal/LZ77/cache decode loop. Returns
    * ARGB pixels in row-major order. */
  private def decodeImage(br: Br, w: Int, h: Int, allowMeta: Boolean): Array[Int] = {
    val cacheBits = if (br.bit() == 1) {
      val cb = br.bits(4)
      if (cb < 1 || cb > 11) fail(s"color cache bits $cb (1..11)")
      cb
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    var metaIdx: Array[Int] = null
    var metaBits = 0
    var metaW = 0
    var numGroups = 1
    if (allowMeta && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      metaW = sub(w, metaBits)
      val ent = decodeImage(br, metaW, sub(h, metaBits), allowMeta = false)
      metaIdx = ent.map(p => (p >>> 8) & 0xFFFF) // (red << 8) | green
      numGroups = metaIdx.max + 1
    }
    val alphabets = Array(256 + 24 + cacheSize, 256, 256, 256, 40)
    val groups = Array.fill(numGroups)(alphabets.map(a => readCode(br, a)))
    val n = w * h
    val px = new Array[Int](n)
    def insert(p: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
    var pos = 0
    while (pos < n) {
      val g =
        if (metaIdx == null) groups(0)
        else {
          val x = pos % w; val y = pos / w
          groups(metaIdx((y >> metaBits) * metaW + (x >> metaBits)))
        }
      val s = g(0).read(br)
      if (s < 256) { // literal: green, then red / blue / alpha
        val r = g(1).read(br)
        val b2 = g(2).read(br)
        val a = g(3).read(br)
        val p = (a << 24) | (r << 16) | (s << 8) | b2
        px(pos) = p
        insert(p)
        pos += 1
      } else if (s < 256 + 24) { // LZ77 backward reference
        val len = prefixValue(br, s - 256)
        val dval = prefixValue(br, g(4).read(br))
        val dist =
          if (dval > 120) dval - 120
          else {
            val (dx, dy) = DistMap(dval - 1)
            math.max(1, dy * w + dx)
          }
        if (dist > pos) fail("LZ77 reference before image start")
        if (pos + len > n) fail("LZ77 copy past image end")
        var i = 0
        while (i < len) {
          val p = px(pos - dist)
          px(pos) = p
          insert(p)
          pos += 1
          i += 1
        }
      } else { // color cache hit
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize) fail("color cache index without a cache")
        px(pos) = cache(idx)
        pos += 1
      }
    }
    px
  }

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a+b)/2 without unpacking: borrow-safe SWAR form
    (((a ^ b) & 0xFEFEFEFE) >>> 1) + (a & b)
  }

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel modular add
    val rb = ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
    val ag = ((a >>> 8) & 0x00FF00FF) + ((b >>> 8) & 0x00FF00FF)
    ((ag & 0x00FF00FF) << 8) | rb
  }

  /** Inverse predictor transform (spec modes 0..13); the image is one
    * contiguous array, so the top-right of a rightmost pixel wraps to
    * the current row's first pixel — decoded already, per the spec's
    * addressing. Row 0 predicts L, column 0 predicts T, (0,0)
    * predicts opaque black, regardless of the block mode. */
  private def inversePredictor(px: Array[Int], w: Int, h: Int,
      bits: Int, data: Array[Int], tw: Int): Unit = {
    def sel(l: Int, t: Int, tl: Int): Int = {
      var pl = 0; var pt = 0
      var sh = 0
      while (sh < 32) {
        val lc = (l >>> sh) & 0xFF; val tc = (t >>> sh) & 0xFF
        val tlc = (tl >>> sh) & 0xFF
        pl += math.abs(tc - tlc) // |p - L| per channel
        pt += math.abs(lc - tlc) // |p - T|
        sh += 8
      }
      if (pt <= pl) t else l
    }
    def casFull(l: Int, t: Int, tl: Int): Int = {
      var out = 0
      var sh = 0
      while (sh < 32) {
        val v = clip255(((l >>> sh) & 0xFF) + ((t >>> sh) & 0xFF) - ((tl >>> sh) & 0xFF))
        out |= v << sh
        sh += 8
      }
      out
    }
    def casHalf(m: Int, tl: Int): Int = {
      var out = 0
      var sh = 0
      while (sh < 32) {
        val a = (m >>> sh) & 0xFF
        val v = clip255(a + (a - ((tl >>> sh) & 0xFF)) / 2)
        out |= v << sh
        sh += 8
      }
      out
    }
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xFF000000
          else if (y == 0) px(pos - 1)
          else if (x == 0) px(pos - w)
          else {
            val l = px(pos - 1); val t = px(pos - w)
            val tl = px(pos - w - 1); val tr = px(pos - w + 1)
            ((data((y >> bits) * tw + (x >> bits)) >>> 8) & 0xFF) match {
              case 0 => 0xFF000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => sel(l, t, tl)
              case 12 => casFull(l, t, tl)
              case 13 => casHalf(avg2(l, t), tl)
              case m => fail(s"predictor mode $m")
            }
          }
        px(pos) = addPixels(px(pos), pred)
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  /** Inverse cross-color transform: per-block signed deltas
    * green→red, green→blue, red→blue ((int8·int8) >> 5), element
    * channels per the spec (green_to_red in blue, green_to_blue in
    * green, red_to_blue in red). */
  private def inverseColor(px: Array[Int], w: Int, h: Int,
      bits: Int, data: Array[Int], tw: Int): Unit = {
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = data((y >> bits) * tw + (x >> bits))
        val g2r = (cte & 0xFF).toByte
        val g2b = ((cte >>> 8) & 0xFF).toByte
        val r2b = ((cte >>> 16) & 0xFF).toByte
        val p = px(pos)
        val gByte = ((p >>> 8) & 0xFF).toByte
        val r = ((p >>> 16) & 0xFF) + ((g2r * gByte) >> 5)
        val r8 = r & 0xFF
        val b = (p & 0xFF) + ((g2b * gByte) >> 5) + ((r2b * r8.toByte) >> 5)
        px(pos) = (p & 0xFF00FF00) | (r8 << 16) | (b & 0xFF)
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val gByte = (p >>> 8) & 0xFF
      px(i) = (p & 0xFF00FF00) |
        ((((p >>> 16) & 0xFF) + gByte) & 0xFF) << 16 |
        (((p & 0xFF) + gByte) & 0xFF)
      i += 1
    }
  }

  /** One read transform: (type, block/pack bits, sub-image data, its
    * width, the IMAGE width this transform operates at). */
  private final case class Xform(kind: Int, bits: Int, data: Array[Int],
      dataW: Int, imgW: Int)

  /** The VP8L payload at b[off, off+len). */
  private def decodeVp8l(b: Array[Byte], off: Int, len: Int): Raster = {
    val (px, w, h) = vp8lPixels(b, off, len)
    val luma = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      luma(i) = ((77 * ((p >>> 16) & 0xFF) + 150 * ((p >>> 8) & 0xFF) +
        29 * (p & 0xFF) + 128) >> 8).toByte
      i += 1
    }
    Raster(w, h, luma)
  }

  /** The VP8L bitstream to its ARGB pixels (alpha kept — the
    * animation compositor inspects it for the blend-mode guard). */
  private def vp8lPixels(b: Array[Byte], off: Int,
      len: Int): (Array[Int], Int, Int) = {
    if (len < 5 || (b(off) & 0xFF) != 0x2F) fail("bad VP8L signature byte")
    val br = new Br(b, off + 1, off + len)
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bit() // alpha-is-used hint — informative only
    val version = br.bits(3)
    if (version != 0) fail(s"VP8L version $version")
    PixelDecode.checkDims(w, h, "WebP dimensions")
    var curW = w
    var seen = Set.empty[Int]
    var xforms = List.empty[Xform] // head = last read → inverse order
    var more = br.bit() == 1
    while (more) {
      val t = br.bits(2)
      if (seen(t)) fail(s"transform $t appears twice")
      seen += t
      t match {
        case 0 | 1 => // predictor / cross-color: block-coded sub-image
          val bits = br.bits(3) + 2
          val tw = sub(curW, bits)
          val data = decodeImage(br, tw, sub(h, bits), allowMeta = false)
          xforms ::= Xform(t, bits, data, tw, curW)
        case 2 =>
          xforms ::= Xform(2, 0, null, 0, curW)
        case _ => // color indexing: palette + sub-byte bundling
          val n = br.bits(8) + 1
          val packBits =
            if (n > 16) 0 else if (n > 4) 1 else if (n > 2) 2 else 3
          val raw = decodeImage(br, n, 1, allowMeta = false)
          // palette entries are component-wise delta-coded
          val pal = new Array[Int](n)
          var i = 0
          var prev = 0
          while (i < n) {
            prev = addPixels(prev, raw(i))
            pal(i) = prev
            i += 1
          }
          xforms ::= Xform(3, packBits, pal, n, curW)
          curW = sub(curW, packBits)
      }
      more = br.bit() == 1
    }
    var px = decodeImage(br, curW, h, allowMeta = true)
    var imgW = curW
    xforms.foreach { xf =>
      xf.kind match {
        case 0 => inversePredictor(px, imgW, h, xf.bits, xf.data, xf.dataW)
        case 1 => inverseColor(px, imgW, h, xf.bits, xf.data, xf.dataW)
        case 2 => inverseSubtractGreen(px)
        case _ =>
          // expand bundled indices back to the pre-transform width
          val outW = xf.imgW
          val idxBits = 8 >> xf.bits
          val idxMask = (1 << idxBits) - 1
          val out = new Array[Int](outW * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < outW) {
              val packed = (px(y * imgW + (x >> xf.bits)) >>> 8) & 0xFF
              val shift = (x & ((1 << xf.bits) - 1)) * idxBits
              val idx = (packed >> shift) & idxMask
              out(y * outW + x) = if (idx < xf.dataW) xf.data(idx) else 0
              x += 1
            }
            y += 1
          }
          px = out
          imgW = outW
      }
    }
    if (imgW != w) fail("color-indexing transform missing its expansion")
    (px, w, h)
  }

  /** RIFF container walk to the VP8L chunk; lossy and animated
    * payloads are loud scope edges, metadata chunks are skipped. */
  def decodeLuma(b: Array[Byte]): Raster = {
    def le32(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
    var p = 12
    while (p + 8 <= b.length) {
      val fourcc = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(p + 4)
      // Long-widened extent: a declared size near Int.MaxValue would
      // overflow Int arithmetic past the bounds check and advance p
      // negative — the walk must fail by name, not throw raw
      val next = p.toLong + 8L + size.toLong + (size & 1).toLong
      if (size < 0 || p.toLong + 8L + size.toLong > b.length)
        fail(s"$fourcc chunk overruns the payload")
      fourcc match {
        case "VP8L" => return decodeVp8l(b, p + 8, size)
        case "VP8 " => failVp8(b, p + 8, size)
        case "ANIM" | "ANMF" => fail("animated WebP is out of scope")
        case _ => () // VP8X / ALPH / EXIF / XMP / ICCP ride along
      }
      p = next.toInt // RIFF pads odd chunks; next ≤ len+1 after the check
    }
    fail("WebP has no VP8L chunk")
  }

  /** True when the RIFF payload carries an ANIM chunk — the animated
    * extended-format shape [[decodeAnimFrame]] composes and
    * [[decodeLuma]] refuses. Tolerant walk: junk is simply not
    * animated (the caller's single-frame path raises the loud edge). */
  def isAnimated(b: Array[Byte]): Boolean = {
    def le32(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
    var p = 12
    while (p + 8 <= b.length) {
      val fourcc = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(p + 4)
      val next = p.toLong + 8L + size.toLong + (size & 1).toLong
      if (size < 0 || p.toLong + 8L + size.toLong > b.length) return false
      if (fourcc == "ANIM" || fourcc == "ANMF") return true
      p = next.toInt
    }
    false
  }

  /** Frame `n` of an ANIMATED WebP, composed on the VP8X canvas per
    * the extended-format rules: the canvas starts at the ANIM
    * background color's luma (alpha ignored — the library's "alpha
    * does not move luma" stance), each ANMF frame rect draws at its
    * even (2×) offsets, disposal bit 0 restores the rect to the
    * background before the next frame, and blend mode 0 (alpha over)
    * is accepted only for fully opaque frames — where it equals
    * SOURCE — matching the APNG compositor. Lossy VP8 frames fail
    * through the named [[vp8KeyHeader]] edge. */
  def decodeAnimFrame(b: Array[Byte], n: Int): Raster = {
    def le32(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
    def le24(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16)
    final case class Fr(x: Int, y: Int, w: Int, h: Int, dispose: Boolean,
      blendOver: Boolean, off: Int, end: Int)
    var cw = -1; var ch = -1
    var bg = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Fr]
    var p = 12
    while (p + 8 <= b.length) {
      val fourcc = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(p + 4)
      val next = p.toLong + 8L + size.toLong + (size & 1).toLong
      if (size < 0 || p.toLong + 8L + size.toLong > b.length)
        fail(s"$fourcc chunk overruns the payload")
      fourcc match {
        case "VP8X" =>
          if (size < 10) fail("VP8X chunk too short")
          cw = le24(p + 12) + 1
          ch = le24(p + 15) + 1
        case "ANIM" =>
          if (size < 6) fail("ANIM chunk too short")
          // background color rides B, G, R, A
          bg = (77 * (b(p + 10) & 0xFF) + 150 * (b(p + 9) & 0xFF) +
            29 * (b(p + 8) & 0xFF) + 128) >> 8
        case "ANMF" =>
          if (size < 16) fail("ANMF chunk too short")
          val flags = b(p + 23) & 0xFF
          frames += Fr(le24(p + 8) * 2, le24(p + 11) * 2,
            le24(p + 14) + 1, le24(p + 17) + 1,
            (flags & 1) != 0, (flags & 2) == 0,
            p + 24, p + 8 + size)
        case _ => () // ALPH / EXIF / XMP / ICCP ride along
      }
      p = next.toInt
    }
    if (cw < 0) fail("animated WebP has no VP8X canvas")
    if (frames.isEmpty) fail("animated WebP has no ANMF frames")
    if (n >= frames.length)
      fail(s"animated WebP has ${frames.length} frames, frame $n requested")
    PixelDecode.checkDims(cw, ch, "WebP canvas")
    val canvas = Array.fill[Byte](cw * ch)(bg.toByte)
    var i = 0
    while (i <= n) {
      val f = frames(i)
      if (f.x + f.w > cw || f.y + f.h > ch)
        fail("ANMF frame rect exceeds the canvas")
      var q = f.off
      var drawn = false
      while (!drawn && q + 8 <= f.end) {
        val cc = new String(b, q, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val sz = le32(q + 4)
        val nx = q.toLong + 8L + sz.toLong + (sz & 1).toLong
        if (sz < 0 || q.toLong + 8L + sz.toLong > f.end)
          fail(s"$cc subchunk overruns its ANMF frame")
        cc match {
          case "VP8L" =>
            val (px, w, h) = vp8lPixels(b, q + 8, sz)
            if (w != f.w || h != f.h)
              fail("ANMF frame dims disagree with its VP8L payload")
            if (f.blendOver && px.exists(v => (v >>> 24) != 0xFF))
              fail("ANMF alpha blending is out of scope (non-opaque frame under blend)")
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = px(y * w + x)
                canvas((f.y + y) * cw + f.x + x) =
                  ((77 * ((v >>> 16) & 0xFF) + 150 * ((v >>> 8) & 0xFF) +
                    29 * (v & 0xFF) + 128) >> 8).toByte
                x += 1
              }
              y += 1
            }
            drawn = true
          case "VP8 " => failVp8(b, q + 8, sz)
          case _ => () // ALPH rides along (lossy-alpha sidecar)
        }
        q = nx.toInt
      }
      if (!drawn) fail("ANMF frame has no VP8L payload")
      if (f.dispose && i < n) {
        var y = 0
        while (y < f.h) {
          var x = 0
          while (x < f.w) {
            canvas((f.y + y) * cw + f.x + x) = bg.toByte
            x += 1
          }
          y += 1
        }
      }
      i += 1
    }
    Raster(cw, ch, canvas)
  }

  /** Lossy VP8 key-frame HEADER parse (RFC 6386 §9.1) — the
    * spec-derivable half of lossy decode: frame tag (type, version,
    * show flag, first-partition size), the 0x9d012a start code, and
    * the 14-bit width/height with their scaling fields. The parse is
    * exact and spec-pinned; the failure it raises names the parsed
    * geometry so a crawl log shows WHAT was dropped, not just that
    * something was.
    *
    * Why the PIXEL half is out of scope in this build, stated
    * precisely: past the header, VP8 entropy decoding is an
    * arithmetic (boolean) coder whose default probability tables —
    * `default_coeff_probs[4][8][3][11]`, `coeff_update_probs` of the
    * same shape, `kf_bmode_prob[10][10][9]`, and the
    * `dc_qlookup`/`ac_qlookup` quantizer tables, ~2,300 normative
    * constants — are DATA in RFC 6386, not derivable algorithms (the
    * contrast with progressive JPEG, where every constant derives
    * from formulas). This zero-egress build has no copy of the spec
    * or libvpx/libwebp to take them from, and no reference decoder to
    * validate against; inventing them from memory would yield a
    * decoder that round-trips its own encoder perfectly while
    * silently corrupting every real-world file — unverifiable wrong
    * pixels poisoning px_md5/phash dedup downstream, strictly worse
    * than this loud edge. */
  private[expressions] def vp8KeyHeader(b: Array[Byte], off: Int,
      size: Int): (Int, Int) = {
    if (size < 10 || off + 10 > b.length) fail("VP8 chunk truncated")
    val tag = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16)
    if ((tag & 1) != 0) fail("VP8 interframe without a key frame")
    val version = (tag >> 1) & 7
    if (version > 3) fail(s"VP8 version $version (spec allows 0-3)")
    if (!((b(off + 3) & 0xFF) == 0x9d && (b(off + 4) & 0xFF) == 0x01 &&
        (b(off + 5) & 0xFF) == 0x2a)) fail("VP8 key frame start code missing")
    val w16 = (b(off + 6) & 0xFF) | ((b(off + 7) & 0xFF) << 8)
    val h16 = (b(off + 8) & 0xFF) | ((b(off + 9) & 0xFF) << 8)
    (w16 & 0x3FFF, h16 & 0x3FFF)
  }

  private def failVp8(b: Array[Byte], off: Int, size: Int): Nothing = {
    val (w, h) = vp8KeyHeader(b, off, size)
    fail(s"lossy VP8 key frame ${w}x$h: pixel decode needs the RFC 6386 " +
      "default probability tables (normative data unavailable in this " +
      "zero-egress build; see vp8KeyHeader)")
  }
}
