package graft.functions.expressions

/** From-scratch JPEG decode to luma (ISO/IEC 10918-1 — the public
  * JPEG spec): BASELINE/extended-sequential Huffman (SOF0/1) and
  * PROGRESSIVE (SOF2 — spectral selection + successive approximation,
  * the mode a large share of real web JPEGs ship). The decoder is
  * coefficient-buffered: every scan (sequential's single full-band
  * scan, progressive's DC first/refine and per-component AC
  * first/refine scans with EOB-run coding) accumulates into
  * per-component DCT coefficient planes, and one dequant + IDCT pass
  * at EOI produces the luma raster.
  *
  * Mechanics: marker walk (DQT 8/16-bit, DHT canonical tables —
  * redefinable between scans, DRI, SOS with Ss/Se/Ah/Al), canonical
  * Huffman over the byte-stuffed entropy stream, restart markers
  * resetting DC predictors and EOB runs, interleaved MCU geometry
  * for multi-component scans and the per-component block grid for
  * non-interleaved ones (ISO A.2.2), AC refinement correction bits
  * per G.1.2.3. For 1/3-component images only the LUMA plane
  * transforms (JFIF Y IS BT.601 luma) — chroma scans still decode
  * (their coefficient HISTORY drives refinement-bit consumption),
  * they just never IDCT. FOUR-component (CMYK/YCCK) images transform
  * all four planes: the Adobe APP14 tag selects the transform (2 =
  * YCCK rides YCbCr on the CMY channels) and signals the inverted-ink
  * storage convention; luma comes from the naive CMYK composite
  * (255-C)(255-K)/255 per RGB channel.
  *
  * 12-BIT precision (extended sequential / progressive) decodes as
  * the high-8-bit projection (level shift 2048, clamp 0..4095, >> 4 —
  * the 16-bit TIFF / PNG depth-16 rule; no new tables are involved,
  * the file's own DHT/DQT segments carry everything).
  *
  * Scope, loud outside it: arithmetic coding (the QM-coder's Qe state
  * table is normative spec DATA unavailable in this zero-egress build
  * — the lossy-VP8 blocker class), lossless, hierarchical. The
  * coefficient planes cost 256 B per 8x8 block; [[PixelDecode.MaxPixels]]
  * bounds them. There is no bit-exact decode contract across
  * implementations (IDCT rounding is implementation-defined within
  * spec accuracy bounds), so the spec cross-validates against an
  * independent decoder with tolerance and pins THIS decoder's
  * determinism separately (StrictMath IDCT tables). */
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
    // StrictMath for cross-host bit-determinism (one-time build)
    Array.tabulate(8, 8) { (u, x) =>
      val c = if (u == 0) StrictMath.sqrt(0.125) else 0.5
      c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
    }

  /** Canonical Huffman table (F.2.2.3 decode tables). */
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

  /** MSB-first bit reader over one scan's entropy segment, undoing
    * FF00 byte stuffing. Stops AT any real marker: `atMarker` lets the
    * scan loop detect the end (the next SOS/EOI) and [[restart]]
    * consumes RSTn. */
  private final class BitReader(b: Array[Byte], var p: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (p >= b.length) fail("entropy stream ends mid-symbol")
        val v = b(p) & 0xFF
        if (v == 0xFF) {
          if (p + 1 >= b.length) fail("entropy stream ends at a marker byte")
          val m = b(p + 1) & 0xFF
          if (m == 0x00) p += 2 // stuffed FF = a literal FF data byte
          else
            // a refill that reaches a real marker means a block still
            // wanted a symbol: the scan is TRUNCATED (pad bits live
            // inside the last data byte, before the marker) — loud
            fail(f"entropy stream truncated (marker 0xFF$m%02X mid-block)")
          acc = 0xFF
        } else {
          acc = v
          p += 1
        }
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
    /** Byte-align and consume an expected RSTn marker. */
    def restart(n: Int): Unit = {
      nbits = 0
      if (p + 1 >= b.length) fail("entropy stream ends at a restart boundary")
      if ((b(p) & 0xFF) != 0xFF || (b(p + 1) & 0xFF) != (0xD0 + n))
        fail(f"expected restart marker RST$n at offset $p")
      p += 2
    }
    /** Byte-align; the scan is done — `p` must sit at a marker. */
    def finishScan(): Int = {
      nbits = 0
      while (p + 1 < b.length && (b(p) & 0xFF) == 0xFF &&
        (b(p + 1) & 0xFF) >= 0xD0 && (b(p + 1) & 0xFF) <= 0xD7)
        p += 2 // a trailing restart marker some writers emit
      p
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final class Component(val id: Int, val h: Int, val v: Int,
      val tq: Int, val padW: Int, val padH: Int,
      val unpadW: Int, val unpadH: Int) {
    val coef = new Array[Int](padW * padH * 64)
    var dcTab = 0
    var acTab = 0
  }

  def decodeLuma(b: Array[Byte]): PixelDecode.Raster = {
    if (!isJpeg(b)) fail("not a JPEG (no SOI)")
    var p = 2
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var w = 0; var h = 0
    var progressive = false
    var comps: Array[Component] = null
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0
    var restartInterval = 0
    // Adobe APP14 color-transform tag: -1 = marker absent (bare CMYK
    // for 4 components), 0 = untransformed, 2 = YCCK. Adobe-written
    // CMYK stores INVERTED ink values — the marker's presence is the
    // inversion signal (the libjpeg-era convention every reader uses).
    var adobeTransform = -1
    var prec12 = false
    def u16(i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    var eoi = false
    while (!eoi) {
      if (p + 2 > b.length) fail("marker stream truncated")
      if ((b(p) & 0xFF) != 0xFF) fail(f"expected a marker at offset $p")
      val m = b(p + 1) & 0xFF
      if (m == 0xD9) { eoi = true; p += 2 }
      else {
        if (p + 4 > b.length) fail("marker stream truncated")
        val len = u16(p + 2)
        if (p + 2 + len > b.length) fail(f"marker 0xFF$m%02X overruns the payload")
        m match {
          case 0xC0 | 0xC1 | 0xC2 =>
            progressive = m == 0xC2
            // 12-bit precision (extended sequential / progressive)
            // needs no new tables — samples level-shift by 2048,
            // clamp to 0..4095, and project their high 8 bits
            val prec = b(p + 4) & 0xFF
            if (prec != 8 && prec != 12)
              fail(s"$prec-bit precision is out of scope (8/12 only)")
            prec12 = prec == 12
            h = u16(p + 5); w = u16(p + 7)
            val nComp = b(p + 9) & 0xFF
            if (w <= 0 || h <= 0) fail(s"JPEG dimensions ${w}x$h")
            PixelDecode.checkDims(w, h, "JPEG dimensions")
            if (nComp != 1 && nComp != 3 && nComp != 4)
              fail(s"$nComp-component JPEG is out of scope")
            val hs = new Array[Int](nComp); val vs = new Array[Int](nComp)
            val ids = new Array[Int](nComp); val tqs = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              ids(c) = b(p + 10 + 3 * c) & 0xFF
              val hv = b(p + 11 + 3 * c) & 0xFF
              hs(c) = hv >> 4; vs(c) = hv & 0xF
              if (hs(c) < 1 || hs(c) > 4 || vs(c) < 1 || vs(c) > 4)
                fail(s"sampling factors ${hs(c)}x${vs(c)}")
              tqs(c) = b(p + 12 + 3 * c) & 0xFF
              c += 1
            }
            if (nComp == 1) {
              // a single-component image is non-interleaved everywhere
              // (A.2.2): sampling factors do not apply
              hs(0) = 1; vs(0) = 1
            }
            hmax = hs.max; vmax = vs.max
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            comps = Array.tabulate(nComp) { c =>
              val sx = (w * hs(c) + hmax - 1) / hmax // comp samples
              val sy = (h * vs(c) + vmax - 1) / vmax
              new Component(ids(c), hs(c), vs(c), tqs(c),
                mcusX * hs(c), mcusY * vs(c),
                (sx + 7) / 8, (sy + 7) / 8)
            }
          // Arithmetic-coded SOFs (C9-CB): out of scope for the same
          // reason as lossy VP8 — the QM-coder's probability
          // estimation state machine (ISO 10918-1 Table D.3: ~113 rows
          // of Qe values with next-state and switch columns) is
          // normative DATA, not a derivable algorithm; this zero-
          // egress build has no spec copy to take it from and no
          // reference decoder to validate against, and inventing it
          // would decode every real file silently wrong. Huffman JPEG
          // needs no such table (its only constants arrive in the
          // file's own DHT segments).
          case 0xC9 | 0xCA | 0xCB =>
            fail(f"SOF marker 0xFF$m%02X (arithmetic coding) is out of scope: " +
              "the QM-coder Qe state table is normative spec data " +
              "unavailable in this build")
          case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xCD | 0xCE | 0xCF =>
            fail(f"SOF marker 0xFF$m%02X (lossless/differential/hierarchical) is out of scope")
          case 0xC4 => // DHT (redefinable between scans)
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
          case 0xDA => // SOS: decode one scan, leave p at the next marker
            if (comps == null) fail("SOS before SOF")
            val ns = b(p + 4) & 0xFF
            if (ns < 1 || ns > comps.length) fail(s"SOS with $ns components")
            val scanComps = new Array[Component](ns)
            var c = 0
            while (c < ns) {
              val id = b(p + 5 + 2 * c) & 0xFF
              val comp = comps.find(_.id == id)
                .getOrElse(fail(s"SOS names unknown component $id"))
              comp.dcTab = (b(p + 6 + 2 * c) >> 4) & 0xF
              comp.acTab = b(p + 6 + 2 * c) & 0xF
              scanComps(c) = comp
              c += 1
            }
            val ss = b(p + 5 + 2 * ns) & 0xFF
            val se = b(p + 6 + 2 * ns) & 0xFF
            val ah = (b(p + 7 + 2 * ns) >> 4) & 0xF
            val al = b(p + 7 + 2 * ns) & 0xF
            if (ss > 63 || se > 63 || se < ss)
              fail(s"SOS spectral band $ss..$se") // a corrupt band end
              // would otherwise write coefficients into NEIGHBORING
              // blocks' planes — silent pixel corruption
            if (!progressive && (ss != 0 || se != 63 || ah != 0 || al != 0))
              fail("sequential scan with progressive parameters")
            if (progressive && ss == 0 && se != 0)
              fail("progressive scan mixes DC and AC bands")
            if (progressive && ss > 0 && ns != 1)
              fail("progressive AC scan must be non-interleaved")
            p = decodeScan(b, p + 2 + len, scanComps, ss, se, ah, al,
              dcT, acT, qt, restartInterval, mcusX, mcusY,
              interleaved = ns > 1,
              // ISO 10918-1 F.1.2.1.2: DIFF spans +/-32767 at 12-bit
              // precision (SSSS up to 15); 8-bit stays capped at 11
              maxDcCat = if (prec12) 15 else 11)
          case 0xEE => // APP14: Adobe tag — the CMYK transform signal
            if (len >= 14 && b(p + 4) == 'A' && b(p + 5) == 'd' &&
                b(p + 6) == 'o' && b(p + 7) == 'b' && b(p + 8) == 'e')
              // the transform byte sits at a FIXED offset (data byte 11
              // after the tag: version 2 + flags0 2 + flags1 2, then the
              // transform), NOT at the segment end — writers may append
              // extra data past the 14 defined bytes
              adobeTransform = b(p + 15) & 0xFF
          case x if x >= 0xE0 && x <= 0xED || x == 0xEF => () // APPn
          case 0xFE => () // COM
          case other => fail(f"marker 0xFF$other%02X is out of scope")
        }
        if (m != 0xDA) p += 2 + len
      }
    }
    if (comps == null) fail("no SOF before EOI")
    // dequant + IDCT one component's coefficient buffer to a padded
    // sample plane (width padW * 8)
    def idctPlane(c0: Component): Array[Byte] = {
      val q = qt(c0.tq)
      if (q == null) fail("component references an undeclared quant table")
      val pw = c0.padW * 8
      val plane = new Array[Byte](pw * c0.padH * 8)
      val tmp = Array.ofDim[Double](8, 8)
      val dq = new Array[Int](64)
      var blk = 0
      val nBlocks = c0.padW * c0.padH
      while (blk < nBlocks) {
        val base = blk * 64
        var k = 0
        while (k < 64) { dq(Zigzag(k)) = c0.coef(base + k) * q(k); k += 1 }
        var x = 0
        while (x < 8) { // columns of the row transform
          var u = 0
          while (u < 8) {
            var s2 = 0.0
            var v = 0
            while (v < 8) { s2 += dq(v * 8 + u) * IdctCos(v)(x); v += 1 }
            tmp(x)(u) = s2
            u += 1
          }
          x += 1
        }
        val outX = (blk % c0.padW) * 8
        val outY = (blk / c0.padW) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            var s2 = 0.0
            var u = 0
            while (u < 8) { s2 += tmp(yy)(u) * IdctCos(u)(xx); u += 1 }
            // level shift and clamp at the declared precision; 12-bit
            // samples project their HIGH 8 bits (the 8-bit projection,
            // the 16-bit TIFF / PNG depth-16 rule)
            val v = math.round(s2).toInt + (if (prec12) 2048 else 128)
            val hi = if (prec12) 4095 else 255
            val c2 = if (v < 0) 0 else if (v > hi) hi else v
            plane((outY + yy) * pw + outX + xx) =
              (if (prec12) c2 >> 4 else c2).toByte
            xx += 1
          }
          yy += 1
        }
        blk += 1
      }
      plane
    }
    val out = new Array[Byte](w * h)
    if (comps.length < 4) {
      // YCbCr / grayscale: JPEG's Y component IS the BT.601 luma, so
      // only the first plane needs the IDCT; crop the MCU padding,
      // nearest-sample if Y itself is subsampled
      val y0 = comps(0)
      val yW = y0.padW * 8
      val yPlane = idctPlane(y0)
      val sx = y0.h.toDouble / hmax
      val sy = y0.v.toDouble / vmax
      var yy = 0
      while (yy < h) {
        var xx = 0
        while (xx < w) {
          val yq = math.min((yy * sy).toInt, y0.padH * 8 - 1)
          val xq = math.min((xx * sx).toInt, yW - 1)
          out(yy * w + xx) = yPlane(yq * yW + xq)
          xx += 1
        }
        yy += 1
      }
    } else {
      // CMYK (Adobe or bare): all four planes IDCT + upsample, then
      // ink -> RGB -> luma. With the Adobe marker present the stored
      // samples are INVERTED ink (s = 255 - ink), so 255-C and 255-K
      // are the stored bytes directly; APP14 transform 2 (YCCK) first
      // undoes the YCbCr transform on the CMY channels. R = (255-C) *
      // (255-K) / 255 (rounded), the naive CMYK composite.
      val planes = comps.map(idctPlane)
      val inverted = adobeTransform >= 0
      var yy = 0
      while (yy < h) {
        var xx = 0
        while (xx < w) {
          val s = new Array[Int](4)
          var ci = 0
          while (ci < 4) {
            val c0 = comps(ci)
            val pw = c0.padW * 8
            val yq = math.min((yy * c0.v.toDouble / vmax).toInt, c0.padH * 8 - 1)
            val xq = math.min((xx * c0.h.toDouble / hmax).toInt, pw - 1)
            s(ci) = planes(ci)(yq * pw + xq) & 0xFF
            ci += 1
          }
          var (c, m, y2) = (s(0), s(1), s(2))
          if (adobeTransform == 2) { // YCCK: CMY channels ride YCbCr
            val cb = s(1) - 128.0
            val cr = s(2) - 128.0
            def clamp(d: Double): Int = {
              val r2 = math.round(d).toInt
              if (r2 < 0) 0 else if (r2 > 255) 255 else r2
            }
            c = clamp(s(0) + 1.402 * cr)
            m = clamp(s(0) - 0.344136 * cb - 0.714136 * cr)
            y2 = clamp(s(0) + 1.772 * cb)
          }
          val kEnc = if (inverted) s(3) else 255 - s(3) // = 255 - K
          def chan(v: Int): Int = {
            val enc = if (inverted) v else 255 - v // = 255 - ink
            (enc * kEnc + 128) / 255
          }
          val (r, g, b2) = (chan(c), chan(m), chan(y2))
          out(yy * w + xx) = ((77 * r + 150 * g + 29 * b2 + 128) >> 8).toByte
          xx += 1
        }
        yy += 1
      }
    }
    PixelDecode.Raster(w, h, out)
  }

  /** Decode one scan's entropy data; returns the offset of the marker
    * that follows it. Handles sequential full-band scans, progressive
    * DC first/refine (interleaved or not) and progressive AC
    * first/refine (always one component), with restart markers
    * resetting predictors and the EOB run. */
  private def decodeScan(b: Array[Byte], at: Int,
      scanComps: Array[Component], ss: Int, se: Int, ah: Int, al: Int,
      dcT: Array[Huff], acT: Array[Huff], qt: Array[Array[Int]],
      restartInterval: Int, mcusX: Int, mcusY: Int,
      interleaved: Boolean, maxDcCat: Int): Int = {
    val in = new BitReader(b, at)
    val pred = new Array[Int](scanComps.length)
    var eobrun = 0
    def dcTable(c: Component): Huff = {
      val t = dcT(c.dcTab)
      if (t == null) fail(s"scan references undeclared DC table ${c.dcTab}")
      t
    }
    def acTable(c: Component): Huff = {
      val t = acT(c.acTab)
      if (t == null) fail(s"scan references undeclared AC table ${c.acTab}")
      t
    }
    // --- per-block decoders over coef(base + zigzagPos) ---
    def sequentialBlock(ci: Int, c: Component, base: Int): Unit = {
      val s = dcTable(c).decode(in)
      if (s > maxDcCat) fail(s"DC category $s")
      pred(ci) += extend(in.receive(s), s)
      c.coef(base) = pred(ci)
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = acTable(c).decode(in)
        val r = rs >> 4; val sss = rs & 0xF
        if (sss == 0) {
          if (r == 15) k += 16 else done = true
        } else {
          k += r
          if (k > 63) fail("AC run past the block end")
          c.coef(base + k) = extend(in.receive(sss), sss)
          k += 1
        }
      }
    }
    def dcFirst(ci: Int, c: Component, base: Int): Unit = {
      val s = dcTable(c).decode(in)
      if (s > maxDcCat) fail(s"DC category $s")
      pred(ci) += extend(in.receive(s), s)
      c.coef(base) = pred(ci) << al
    }
    def dcRefine(c: Component, base: Int): Unit =
      if (in.bit() == 1) c.coef(base) |= 1 << al
    def acFirst(c: Component, base: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      var done = false
      while (!done && k <= se) {
        val rs = acTable(c).decode(in)
        val r = rs >> 4; val s = rs & 0xF
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += in.receive(r)
            done = true
          }
        } else {
          k += r
          if (k > se) fail("AC run past the band end")
          c.coef(base + k) = extend(in.receive(s), s) << al
          k += 1
        }
      }
    }
    def acRefine(c: Component, base: Int): Unit = {
      // G.1.2.3: correction bits for history-nonzero positions; new
      // coefficients are +-1<<al placed at zero-history positions
      val plus = 1 << al
      def correct(k: Int): Unit = {
        val v = c.coef(base + k)
        if (in.bit() == 1 && (v & plus) == 0)
          c.coef(base + k) = if (v > 0) v + plus else v - plus
      }
      var k = ss
      if (eobrun > 0) {
        while (k <= se) { if (c.coef(base + k) != 0) correct(k); k += 1 }
        eobrun -= 1
        return
      }
      while (k <= se) {
        val rs = acTable(c).decode(in)
        var r = rs >> 4; val s = rs & 0xF
        var newVal = 0
        if (s == 0) {
          if (r != 15) {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += in.receive(r)
            // refine the rest of the band, then the EOB run covers
            // the FOLLOWING blocks
            while (k <= se) { if (c.coef(base + k) != 0) correct(k); k += 1 }
            return
          }
          // ZRL: skip 16 zero-history positions (refining along the way)
        } else {
          if (s != 1) fail("AC refinement with magnitude category > 1")
          newVal = if (in.bit() == 1) plus else -plus
        }
        // advance past r zero-history positions, refining nonzero ones
        var placing = true
        while (placing && k <= se) {
          if (c.coef(base + k) != 0) correct(k)
          else {
            if (r == 0) {
              if (newVal != 0) { c.coef(base + k) = newVal }
              placing = false
            } else r -= 1
          }
          k += 1
        }
        if (placing && newVal != 0) fail("AC refinement places past the band end")
      }
    }
    // --- the MCU walk ---
    val isDc = ss == 0
    val totalMcus =
      if (interleaved) mcusX * mcusY
      else scanComps(0).unpadW * scanComps(0).unpadH
    var mcu = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        in.restart(((mcu / restartInterval) - 1) % 8)
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }
      if (interleaved) {
        val mx = mcu % mcusX; val my = mcu / mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              val blk = (my * c.v + by) * c.padW + (mx * c.h + bx)
              val base = blk * 64
              if (ah == 0 && !isDc) fail("interleaved AC scan")
              if (ss == 0 && se == 63) sequentialBlock(ci, c, base)
              else if (ah == 0) dcFirst(ci, c, base)
              else dcRefine(c, base)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
      } else {
        val c = scanComps(0)
        val bx = mcu % c.unpadW; val by = mcu / c.unpadW
        val base = (by * c.padW + bx) * 64
        if (ss == 0 && se == 63) sequentialBlock(0, c, base)
        else if (isDc && ah == 0) dcFirst(0, c, base)
        else if (isDc) dcRefine(c, base)
        else if (ah == 0) acFirst(c, base)
        else acRefine(c, base)
      }
      mcu += 1
    }
    in.finishScan()
  }
}
