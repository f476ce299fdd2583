package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio/video payload metadata from the CONTAINER HEADER alone — the
  * WAV/MP4 sibling of [[ImageHeaderMeta]]: a RIFF/WAVE chunk walk
  * (fmt / data, odd-size pad bytes per the RIFF spec) and an ISO BMFF
  * box walk (ftyp → moov → mvhd, 32- and 64-bit box sizes, mvhd
  * versions 0 and 1). Pure byte parsing of the public container
  * formats — no media libraries, no sample decode, which is how a
  * 100 TB crawl pipeline sniffs duration/rate (the sample decoder
  * stays the documented mapInPandas seam). Unknown, truncated, and
  * out-of-scope containers (non-PCM WAVE tags) yield null — opaque
  * payloads are the normal case, and this walk feeds the shared
  * header-meta captioner whose contract is stub fallback, so nothing
  * here may throw on real-world payload shapes. */
case class MediaHeaderMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = new StructType()
    .add("container", StringType)
    .add("channels", LongType)
    .add("sample_rate", LongType)
    .add("bits", LongType)
    .add("duration_ms", LongType)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"MediaHeaderMeta wants binary or base64 string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes: Array[Byte] = input match {
      case b: Array[Byte] => b
      case s: UTF8String =>
        try java.util.Base64.getMimeDecoder.decode(s.toString)
        catch { case _: IllegalArgumentException => return null }
      case _ => return null
    }
    MediaHeader.decode(bytes) match {
      case Some(m) => InternalRow(UTF8String.fromString(m.container),
        m.channels, m.sampleRate, m.bits, m.durationMs)
      case None => null
    }
  }

  override protected def withNewChildInternal(c: Expression): MediaHeaderMeta =
    copy(child = c)
}

object MediaHeaderMeta {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(MediaHeaderMeta(
      org.apache.spark.sql.graft.ColumnBridge.expression(payload)))
}

/** PCM sample statistics decoded from a WAV payload's data chunk —
  * the step past [[MediaHeaderMeta]]'s header sniff that makes the
  * audio channel real: peak / RMS level and zero-crossing count, the
  * cheap audio-quality gates a curation pipeline runs (silence and
  * clipping detection) before any model touches the samples.
  *
  * Scope = integer PCM (format tag 1, 8/16/24-bit) located by its own
  * RIFF chunk walk; anything else (ISO BMFF, float WAV, truncated
  * data) yields null — opaque payloads are the normal case, exactly
  * like the header walk. Only COMPLETE frames are decoded (a trailing
  * partial frame is ignored, the libsndfile convention).
  *
  * All aggregation is INTEGER (max |v|, Σv², crossing count of
  * channel 0); the only float math is the final normalization by
  * 2^(bits-1) — one conversion, one division, one sqrt in a fixed
  * order, so a SQL oracle reproduces the doubles bit-for-bit.
  * Per-row narrow work, no shuffle: the 100 TB shape. */
case class WavSampleStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = new StructType()
    .add("n_frames", LongType)
    .add("peak", DoubleType)
    .add("rms", DoubleType)
    .add("zcross", LongType)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"WavSampleStats wants binary or base64 string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes: Array[Byte] = input match {
      case b: Array[Byte] => b
      case s: UTF8String =>
        try java.util.Base64.getMimeDecoder.decode(s.toString)
        catch { case _: IllegalArgumentException => return null }
      case _ => return null
    }
    MediaHeader.pcmStats(bytes) match {
      case Some((frames, peak, rms, zcross)) =>
        InternalRow(frames, peak, rms, zcross)
      case None => null
    }
  }

  override protected def withNewChildInternal(c: Expression): WavSampleStats =
    copy(child = c)
}

object WavSampleStats {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(WavSampleStats(
      org.apache.spark.sql.graft.ColumnBridge.expression(payload)))
}

object MediaHeader {

  /** Parsed header fields; the per-container-null fields use boxed
    * nulls so the struct row carries real SQL NULLs. */
  final case class Media(container: String, channels: java.lang.Long,
      sampleRate: java.lang.Long, bits: java.lang.Long,
      durationMs: java.lang.Long)

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"media parse: $what")

  def decode(b: Array[Byte]): Option[Media] = {
    def u16le(i: Int): Long = ((b(i) & 0xFF) | (b(i + 1) & 0xFF) << 8).toLong
    def u32le(i: Int): Long = (b(i) & 0xFF).toLong | (b(i + 1) & 0xFF).toLong << 8 |
      (b(i + 2) & 0xFF).toLong << 16 | (b(i + 3) & 0xFF).toLong << 24
    def u32be(i: Int): Long = (b(i) & 0xFF).toLong << 24 | (b(i + 1) & 0xFF).toLong << 16 |
      (b(i + 2) & 0xFF).toLong << 8 | (b(i + 3) & 0xFF).toLong
    def u64be(i: Int): Long = u32be(i) << 32 | u32be(i + 4)
    def tag(i: Int): String =
      if (i + 4 <= b.length)
        new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      else ""
    if (b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE") {
      // RIFF chunk walk: 4cc + u32le size + data, odd sizes padded
      var p = 12
      var fmt = -1
      var fmtSize = -1L
      var dataSize = -1L
      while (p + 8 <= b.length && (fmt < 0 || dataSize < 0)) {
        val id = tag(p)
        val size = u32le(p + 4)
        // a declared size past the buffer = truncated/corrupt: null,
        // never metadata computed from bytes that are not there
        if (p + 8 + size > b.length) return None
        if (id == "fmt ") { fmt = p + 8; fmtSize = size }
        else if (id == "data") dataSize = size
        p += 8 + size.toInt + (size % 2).toInt // pad byte after odd sizes
      }
      // a fmt chunk declaring < 16 bytes cannot hold the PCM header —
      // reading on would take channels/rate from the NEXT chunk's bytes
      if (fmt < 0 || fmtSize < 16 || dataSize < 0 || fmt + 16 > b.length)
        return None
      val audioFormat = u16le(fmt)
      // non-PCM (float, A-law, WAVE_FORMAT_EXTENSIBLE, …) is out of
      // decode scope — treated as an opaque payload (None), NOT a loud
      // failure: this walk feeds the shared header-meta captioner,
      // whose contract is stub fallback for anything it can't caption
      if (audioFormat != 1) return None
      val channels = u16le(fmt + 2)
      val rate = u32le(fmt + 4)
      val blockAlign = u16le(fmt + 12)
      val bits = u16le(fmt + 14)
      if (channels == 0 || rate == 0 || blockAlign == 0) return None
      val durMs = dataSize / blockAlign * 1000L / rate
      Some(Media("wav", channels, rate, bits, durMs))
    } else if (b.length >= 12 && tag(4) == "ftyp") {
      decodeBmff(b)
    } else if (isEbml(b)) {
      decodeWebm(b)
    } else decodeMp3(b)
  }

  /** MP3: skip an ID3v2 tag if present (syncsafe size, ID3v2 §3.1),
    * then read the first MPEG audio frame header. Scope = MPEG-1
    * Layer III (what music/podcast corpora overwhelmingly carry);
    * MPEG-2/2.5, Layers I/II, free-format and bad bitrate/rate
    * indices yield None like every other out-of-scope container.
    * Duration: a VBR file's first frame carries its total FRAME COUNT
    * in a Xing/Info header (after the MPEG-1 side info — 17 bytes
    * mono, 32 stereo) or a Fraunhofer VBRI header (fixed 32-byte
    * offset); duration = frames x 1152 samples / rate. Without one,
    * the CBR estimate — audio bytes x 8 / bitrate — is the standard
    * header-only sniff (a VBR file without a Xing header misestimates
    * in every tool that doesn't scan frames). */
  private def decodeMp3(b: Array[Byte]): Option[Media] = {
    var p = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe 28-bit body size (high bit of each byte must be 0;
      // sign-extension makes the OR negative if any is set);
      // +10 header, +10 more if the footer flag is set
      if ((b(6) | b(7) | b(8) | b(9)) < 0) return None
      val body = (b(6) & 0x7F) << 21 | (b(7) & 0x7F) << 14 |
        (b(8) & 0x7F) << 7 | (b(9) & 0x7F)
      p = 10 + body + (if ((b(5) & 0x10) != 0) 10 else 0)
    }
    if (p + 4 > b.length) return None
    if ((b(p) & 0xFF) != 0xFF || (b(p + 1) & 0xE0) != 0xE0) return None
    val version = (b(p + 1) >> 3) & 3
    val layer = (b(p + 1) >> 1) & 3
    if (version != 3 || layer != 1) return None // MPEG-1 Layer III only
    val bitrateIdx = (b(p + 2) >> 4) & 0xF
    val rateIdx = (b(p + 2) >> 2) & 3
    if (bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return None
    val kbps = Array(0L, 32L, 40L, 48L, 56L, 64L, 80L, 96L, 112L,
      128L, 160L, 192L, 224L, 256L, 320L)(bitrateIdx)
    val rate = Array(44100L, 48000L, 32000L)(rateIdx)
    val mode = (b(p + 3) >> 6) & 3
    val channels = if (mode == 3) 1L else 2L
    def be32u(i: Int): Long = (b(i) & 0xFF).toLong << 24 |
      (b(i + 1) & 0xFF).toLong << 16 | (b(i + 2) & 0xFF).toLong << 8 |
      (b(i + 3) & 0xFF).toLong
    def tagAt(i: Int, t: String): Boolean = i + 4 <= b.length &&
      new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1) == t
    // Xing/Info sits after the side info (MPEG-1: 17 bytes mono, 32
    // stereo); flags bit 0 = the frame-count field is present
    val side = if (mode == 3) 17 else 32
    val xingAt = p + 4 + side
    val vbriAt = p + 4 + 32 // VBRI: fixed offset, frames at tag + 14
    val vbrFrames: Option[Long] =
      if ((tagAt(xingAt, "Xing") || tagAt(xingAt, "Info")) &&
        xingAt + 12 <= b.length && (be32u(xingAt + 4) & 1L) == 1L)
        Some(be32u(xingAt + 8))
      else if (tagAt(vbriAt, "VBRI") && vbriAt + 18 <= b.length)
        Some(be32u(vbriAt + 14))
      else None
    // MPEG-1 Layer III: 1152 samples per frame
    val durMs = vbrFrames match {
      case Some(n) => n * 1152L * 1000L / rate
      case None => (b.length - p).toLong * 8L / kbps
    }
    Some(Media("mp3", channels, rate, null, durMs))
  }

  /** [[WavSampleStats]]'s decode: (frames, peak, rms, zcross) from an
    * integer-PCM WAV, or None out of scope. Integer aggregation; see
    * the expression Scaladoc for the oracle-parity argument. */
  private[graft] def pcmStats(b: Array[Byte])
      : Option[(Long, Double, Double, Long)] = {
    def u16le(i: Int): Long = ((b(i) & 0xFF) | (b(i + 1) & 0xFF) << 8).toLong
    def u32le(i: Int): Long = (b(i) & 0xFF).toLong | (b(i + 1) & 0xFF).toLong << 8 |
      (b(i + 2) & 0xFF).toLong << 16 | (b(i + 3) & 0xFF).toLong << 24
    def tag(i: Int): String =
      if (i + 4 <= b.length)
        new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      else ""
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var p = 12
    var fmt = -1
    var fmtSize = -1L
    var data = -1
    var dataSize = -1L
    while (p + 8 <= b.length && (fmt < 0 || data < 0)) {
      val id = tag(p)
      val size = u32le(p + 4)
      if (p + 8 + size > b.length) return None
      if (id == "fmt ") { fmt = p + 8; fmtSize = size }
      else if (id == "data") { data = p + 8; dataSize = size }
      p += 8 + size.toInt + (size % 2).toInt
    }
    if (fmt < 0 || fmtSize < 16 || data < 0 || fmt + 16 > b.length) return None
    if (u16le(fmt) != 1) return None // integer PCM only
    val channels = u16le(fmt + 2).toInt
    val bits = u16le(fmt + 14).toInt
    if (channels < 1 || (bits != 8 && bits != 16 && bits != 24)) return None
    val bps = bits / 8
    val blockAlign = channels * bps
    val frames = dataSize / blockAlign
    val nSamples = frames * channels
    if (nSamples == 0) return None
    // sample k (interleaved), two's-complement LE; 8-bit is unsigned
    def sample(k: Long): Long = {
      val j = data + k * bps
      bps match {
        case 1 => (b(j.toInt) & 0xFF).toLong - 128L
        case 2 =>
          val raw = (b(j.toInt) & 0xFF).toLong | (b(j.toInt + 1) & 0xFF).toLong << 8
          if (raw >= 32768L) raw - 65536L else raw
        case _ =>
          val raw = (b(j.toInt) & 0xFF).toLong |
            (b(j.toInt + 1) & 0xFF).toLong << 8 |
            (b(j.toInt + 2) & 0xFF).toLong << 16
          if (raw >= 8388608L) raw - 16777216L else raw
      }
    }
    var maxAbs = 0L
    var ssq = 0L
    var k = 0L
    while (k < nSamples) {
      val v = sample(k)
      val a = math.abs(v)
      if (a > maxAbs) maxAbs = a
      ssq += v * v
      k += 1
    }
    var zcross = 0L
    var f = 1L
    while (f < frames) {
      if ((sample((f - 1) * channels) < 0) != (sample(f * channels) < 0))
        zcross += 1
      f += 1
    }
    val full = (1L << (bits - 1)).toDouble
    Some((frames, maxAbs.toDouble / full,
      math.sqrt(ssq.toDouble / nSamples) / full, zcross))
  }

  private def u32beAt(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFF).toLong << 24 | (b(i + 1) & 0xFF).toLong << 16 |
      (b(i + 2) & 0xFF).toLong << 8 | (b(i + 3) & 0xFF).toLong

  // ISO BMFF box walk (ISO 14496-12 §8.2.2): returns the wanted
  // box's (body start, box END), so callers never re-derive the
  // header shape (32-bit / largesize / to-EOF). Shared by the mvhd
  // duration sniff and the sample-table walk.
  private def boxWalk(b: Array[Byte], from: Int, until: Int,
      want: String): Option[(Int, Int)] = {
    def tag(i: Int): String =
      if (i + 4 <= b.length)
        new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      else ""
    var p = from
    while (p + 8 <= until) {
      val sz32 = u32beAt(b, p)
      val typ = tag(p + 4)
      val (size, hdr) =
        if (sz32 == 1L && p + 16 <= until)
          (u32beAt(b, p + 8) << 32 | u32beAt(b, p + 12), 16)
        else if (sz32 == 0L) ((until - p).toLong, 8) // box runs to EOF
        else (sz32, 8)
      if (size < hdr || p + size > until) return None // corrupt extent
      if (typ == want) return Some((p + hdr, p + size.toInt))
      p += size.toInt
    }
    None
  }

  private def decodeBmff(b: Array[Byte]): Option[Media] = {
    def u32be(i: Int): Long = u32beAt(b, i)
    def u64be(i: Int): Long = u32be(i) << 32 | u32be(i + 4)
    def walk(from: Int, until: Int, want: String): Option[(Int, Int)] =
      boxWalk(b, from, until, want)
      val (moov, moovEnd) = walk(0, b.length, "moov").getOrElse(return None)
      val (mvhd, _) = walk(moov, moovEnd, "mvhd").getOrElse(return None)
      if (mvhd + 4 > b.length) return None
      val version = b(mvhd) & 0xFF
      val (timescale, duration) = version match {
        case 0 if mvhd + 20 <= b.length => (u32be(mvhd + 12), u32be(mvhd + 16))
        case 1 if mvhd + 32 <= b.length => (u32be(mvhd + 20), u64be(mvhd + 24))
        case _ => return None
      }
      if (timescale == 0) return None
      // the all-ones sentinel means "duration unknown" (common in
      // fragmented MP4s); huge genuine durations would overflow the
      // *1000 — both surface as a null duration, not garbage
      val durMs: java.lang.Long =
        if ((version == 0 && duration == 0xFFFFFFFFL) || duration == -1L ||
            duration < 0L || duration > Long.MaxValue / 1000L) null
        else java.lang.Long.valueOf(duration * 1000L / timescale)
      Some(Media("mp4", null, null, null, durMs))
  }

  /** Sanity ceiling on the expanded sample count: 2^20 samples from a
    * header walk means a corrupt table, not a real track. */
  private val MaxSamples = 1 << 20

  /** The REAL MP4 frame extraction: walk the first track's sample
    * tables — stsz (sizes), stsc (samples per chunk), stco (chunk
    * FILE offsets), stts (decode deltas) — through the shared
    * [[boxWalk]], expand them to per-sample (offset, size, start
    * time) the standard way (stsc runs keyed by first_chunk, offsets
    * accumulated within each chunk from its stco base). A movie whose
    * sample tables are EMPTY (the fragmented-MP4 layout: moov carries
    * mvex/trex defaults, media rides moof+mdat pairs) walks the
    * fragments instead — tfhd base-data-offset / default-base-is-moof
    * addressing, tfdt v0/v1 decode times, trun data offsets with
    * per-sample or defaulted sizes and durations (tfhd then trex).
    * Offsets are ABSOLUTE payload offsets (one contract across the
    * plain, fragmented, and [[webmSamples]] walks — callers slice the
    * payload itself). Every sample must land inside its media extent —
    * a table pointing outside is corrupt, and None (the
    * opaque-payload convention of this walk family) is the only
    * honest answer. */
  private[graft] def mp4Samples(b: Array[Byte])
      : Option[Array[(Long, Long, Long)]] =
    // the table reads below bound every COUNT against the payload, but
    // a crafted box whose extent ends mid-field would still index past
    // the array — this walk's contract is None for corrupt containers,
    // never a raw exception out of an ingest expression
    try mp4SamplesWalk(b)
    catch { case _: ArrayIndexOutOfBoundsException => None }

  private def mp4SamplesWalk(b: Array[Byte])
      : Option[Array[(Long, Long, Long)]] = {
    def tag(i: Int): String =
      if (i + 4 <= b.length)
        new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      else ""
    if (b.length < 12 || tag(4) != "ftyp") return None
    def u32(i: Int): Long = u32beAt(b, i)
    val (moov, moovEnd) = boxWalk(b, 0, b.length, "moov").getOrElse(return None)
    val stblOpt = for {
      (trak, trakEnd) <- boxWalk(b, moov, moovEnd, "trak")
      (mdia, mdiaEnd) <- boxWalk(b, trak, trakEnd, "mdia")
      (minf, minfEnd) <- boxWalk(b, mdia, mdiaEnd, "minf")
      st <- boxWalk(b, minf, minfEnd, "stbl")
    } yield st
    // a movie with no usable sample tables is the FRAGMENTED layout —
    // media rides moof+mdat pairs; a PRESENT-but-corrupt table stays
    // None through the checks below, never silently retried
    val (stbl, stblEnd) = stblOpt match {
      case Some(st) => st
      case None => return fragmentWalk(b, moov, moovEnd)
    }
    val (mdat, mdatEnd) = boxWalk(b, 0, b.length, "mdat").getOrElse(return None)
    def full(name: String): Option[Int] = // full-box body PAST version/flags
      boxWalk(b, stbl, stblEnd, name).collect {
        case (at, end) if at + 4 <= end => at + 4
      }
    val stts = full("stts").getOrElse(return None)
    val stsc = full("stsc").getOrElse(return None)
    val stsz = full("stsz").getOrElse(return None)
    val stco = full("stco").getOrElse(return None)
    // stsz: fixed sample_size or a per-sample table
    val fixedSize = u32(stsz)
    val nSamples = u32(stsz + 4)
    if (nSamples < 0 || nSamples > MaxSamples) return None
    if (nSamples == 0) return fragmentWalk(b, moov, moovEnd)
    val n = nSamples.toInt
    def sizeOf(i: Int): Long =
      if (fixedSize != 0L) fixedSize else u32(stsz + 8 + 4 * i)
    if (fixedSize == 0L && stsz + 8 + 4L * n > b.length) return None
    // stts: (count, delta) runs → per-sample start times
    val sttsCount = u32(stts).toInt
    if (sttsCount < 0 || stts + 4 + 8L * sttsCount > b.length) return None
    val times = new Array[Long](n)
    var ti = 0
    var t = 0L
    var run = 0
    while (run < sttsCount && ti < n) {
      val cnt = u32(stts + 4 + 8 * run)
      val delta = u32(stts + 8 + 8 * run)
      var k = 0L
      while (k < cnt && ti < n) {
        times(ti) = t
        t += delta
        ti += 1
        k += 1
      }
      run += 1
    }
    if (ti < n) return None // stts covers fewer samples than stsz declares
    // stsc: runs of samples-per-chunk keyed by first_chunk
    val stscCount = u32(stsc).toInt
    if (stscCount <= 0 || stsc + 4 + 12L * stscCount > b.length) return None
    val stcoCount = u32(stco).toInt
    if (stcoCount <= 0 || stco + 4 + 4L * stcoCount > b.length) return None
    val out = new Array[(Long, Long, Long)](n)
    var sample = 0
    var chunk = 0
    var scRun = 0
    while (chunk < stcoCount && sample < n) {
      // advance to the stsc run governing chunk+1
      while (scRun + 1 < stscCount &&
        u32(stsc + 4 + 12 * (scRun + 1)) <= chunk + 1) scRun += 1
      val spc = u32(stsc + 8 + 12 * scRun)
      var off = u32(stco + 4 + 4 * chunk)
      var k = 0L
      while (k < spc && sample < n) {
        val sz = sizeOf(sample)
        if (off < mdat || off + sz > mdatEnd) return None // outside media data
        out(sample) = (off, sz, times(sample))
        off += sz
        sample += 1
        k += 1
      }
      chunk += 1
    }
    if (sample < n) return None // chunks cover fewer samples than declared
    Some(out)
  }

  /** The fragmented-MP4 half of [[mp4Samples]]: trex defaults from
    * moov>mvex, then every top-level moof's first traf — tfhd (track
    * id, optional base-data-offset / default size+duration,
    * default-base-is-moof), tfdt (v0 u32 / v1 u64 base decode time),
    * and each trun in order (optional s32 data offset from the base,
    * per-sample size/duration/flags/cts fields skipped or read per
    * the flag word; size falls back tfhd default then trex, duration
    * likewise). Samples must stay inside the payload; None on any
    * corrupt extent — the family convention. */
  private def fragmentWalk(b: Array[Byte], moov: Int, moovEnd: Int)
      : Option[Array[(Long, Long, Long)]] = {
    def u32(i: Int): Long = u32beAt(b, i)
    def u64(i: Int): Long = u32(i) << 32 | u32(i + 4)
    // trex defaults (optional box)
    var trexDur = -1L
    var trexSize = -1L
    for {
      (mvex, mvexEnd) <- boxWalk(b, moov, moovEnd, "mvex")
      (trex, trexEnd) <- boxWalk(b, mvex, mvexEnd, "trex")
      if trex + 24 <= trexEnd
    } {
      trexDur = u32(trex + 12)
      trexSize = u32(trex + 16)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var p = 0
    var sawMoof = false
    def tag(i: Int): String =
      if (i + 4 <= b.length)
        new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      else ""
    while (p + 8 <= b.length) {
      val sz32 = u32(p)
      val typ = tag(p + 4)
      val (size, hdr) =
        if (sz32 == 1L && p + 16 <= b.length) (u64(p + 8), 16)
        else if (sz32 == 0L) ((b.length - p).toLong, 8)
        else (sz32, 8)
      if (size < hdr || p + size > b.length) return None
      if (typ == "moof") {
        sawMoof = true
        val moofStart = p
        val (traf, trafEnd) = boxWalk(b, p + hdr, (p + size).toInt, "traf")
          .getOrElse(return None)
        val (tfhd, tfhdEnd) = boxWalk(b, traf, trafEnd, "tfhd")
          .getOrElse(return None)
        if (tfhd + 8 > tfhdEnd) return None
        val tfFlags = (u32(tfhd) & 0xFFFFFFL).toInt
        var q = tfhd + 8 // past version/flags + track_ID
        var baseOff = -1L
        if ((tfFlags & 0x01) != 0) { // base-data-offset
          if (q + 8 > tfhdEnd) return None
          baseOff = u64(q); q += 8
        }
        if ((tfFlags & 0x02) != 0) q += 4 // sample-description-index
        var defDur = trexDur
        if ((tfFlags & 0x08) != 0) {
          if (q + 4 > tfhdEnd) return None
          defDur = u32(q); q += 4
        }
        var defSize = trexSize
        if ((tfFlags & 0x10) != 0) {
          if (q + 4 > tfhdEnd) return None
          defSize = u32(q); q += 4
        }
        if (baseOff < 0) baseOff = moofStart.toLong // default-base-is-moof
          // (0x20000) and the spec default for a first traf coincide
        var t = 0L
        boxWalk(b, traf, trafEnd, "tfdt").foreach { case (tfdt, tfdtEnd) =>
          val v = b(tfdt) & 0xFF
          t = if (v == 1) { if (tfdt + 12 > tfdtEnd) return None; u64(tfdt + 4) }
          else { if (tfdt + 8 > tfdtEnd) return None; u32(tfdt + 4) }
        }
        // every trun in this traf, in order
        var r = traf
        var pos = -1L
        while (r < trafEnd) {
          boxWalk(b, r, trafEnd, "trun") match {
            case None => r = trafEnd
            case Some((trun, trunEnd)) =>
              if (trun + 8 > trunEnd) return None
              val trFlags = (u32(trun) & 0xFFFFFFL).toInt
              val cnt = u32(trun + 4)
              if (cnt < 0 || out.length + cnt > MaxSamples) return None
              var s = trun + 8
              if ((trFlags & 0x01) != 0) { // data offset (signed 32)
                if (s + 4 > trunEnd) return None
                pos = baseOff + u32(s).toInt // sign via toInt
                s += 4
              } else if (pos < 0) pos = baseOff
              if ((trFlags & 0x04) != 0) s += 4 // first-sample-flags
              var k = 0L
              while (k < cnt) {
                var dur = defDur
                if ((trFlags & 0x100) != 0) {
                  if (s + 4 > trunEnd) return None
                  dur = u32(s); s += 4
                }
                var sz = defSize
                if ((trFlags & 0x200) != 0) {
                  if (s + 4 > trunEnd) return None
                  sz = u32(s); s += 4
                }
                if ((trFlags & 0x400) != 0) s += 4 // per-sample flags
                if ((trFlags & 0x800) != 0) s += 4 // composition offset
                if (sz < 0 || dur < 0) return None // no default to fall to
                if (pos < 0 || pos + sz > b.length) return None
                out += ((pos, sz, t))
                pos += sz
                t += dur
                k += 1
              }
              r = trunEnd
          }
        }
      }
      p = (p + size).toInt
    }
    if (!sawMoof) return None
    Some(out.toArray)
  }

  // ---- Matroska / WebM (EBML) ----------------------------------------

  private def isEbml(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3

  /** EBML variable-length integer at `p`: (value, encoded length).
    * `keepMarker` = element IDs (stored form, marker bit kept); sizes
    * and in-block track numbers strip it. None on truncation or a
    * zero lead byte (reserved). */
  private def ebmlVint(b: Array[Byte], p: Int, until: Int,
      keepMarker: Boolean): Option[(Long, Int)] = {
    if (p >= until) return None
    val first = b(p) & 0xFF
    if (first == 0) return None
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (p + len > until) return None
    var v =
      if (keepMarker) first.toLong
      else (first & ((1 << (8 - len)) - 1)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(p + i) & 0xFF); i += 1 }
    Some((v, len))
  }

  /** One EBML element at `p`: (id, body start, body end, next element
    * start). An unknown-size element (all size bits set — streamed
    * Segments/Clusters in the wild) extends to `until`. */
  private def ebmlElem(b: Array[Byte], p: Int, until: Int)
      : Option[(Long, Int, Int, Int)] = {
    val (id, idLen) = ebmlVint(b, p, until, keepMarker = true).getOrElse(return None)
    val (size, szLen) = ebmlVint(b, p + idLen, until, keepMarker = false)
      .getOrElse(return None)
    val bodyAt = p + idLen + szLen
    val unknown = size == (1L << (7 * szLen)) - 1
    val end = if (unknown) until else bodyAt + size
    if (end < bodyAt || end > until) return None
    Some((id, bodyAt, end.toInt, end.toInt))
  }

  private def ebmlUint(b: Array[Byte], from: Int, end: Int): Long = {
    var v = 0L
    var i = from
    while (i < end) { v = (v << 8) | (b(i) & 0xFF); i += 1 }
    v
  }

  /** WebM/Matroska sample addressing — [[mp4Samples]]' EBML twin: walk
    * Segment → Tracks (first TrackEntry's number) → Clusters in
    * stream order, decode every SimpleBlock / BlockGroup>Block for
    * the first track: cluster-relative SIGNED 16-bit timestamps added
    * to the Cluster's Timestamp, and ALL FOUR lacing modes (none,
    * Xiph 255-run sizes, EBML signed-delta sizes, fixed equal split —
    * every size spec-derivable arithmetic). Laced frames share the
    * block's timestamp (no DefaultDuration in scope — the spec pin
    * states it). Output (off, len, t): `off` is the frame's ABSOLUTE
    * payload offset — Matroska has no mdat-like contiguous media
    * body, so callers slice the payload itself, which is exactly what
    * "the container addresses these bytes" means here. Corrupt
    * elements (overrun extents, foreign track, bad lace sums,
    * sample-count ceiling) → None, the walk family's convention. */
  private[graft] def webmSamples(b: Array[Byte])
      : Option[Array[(Long, Long, Long)]] =
    try webmWalk(b)
    catch { case _: ArrayIndexOutOfBoundsException => None }

  private def webmWalk(b: Array[Byte]): Option[Array[(Long, Long, Long)]] = {
    if (!isEbml(b)) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var trackNum = -1L
    // top level: EBML header element, then the Segment
    var p = 0
    var segAt = -1
    var segEnd = -1
    while (p < b.length && segAt < 0) {
      val (id, bodyAt, end, next) = ebmlElem(b, p, b.length).getOrElse(return None)
      if (id == 0x18538067L) { segAt = bodyAt; segEnd = end }
      p = next
    }
    if (segAt < 0) return None
    // pass 1: the first TrackEntry's TrackNumber (Tracks may follow
    // Clusters in a streamed file, so the block pass below is separate)
    p = segAt
    while (p < segEnd && trackNum < 0) {
      val (id, bodyAt, end, next) = ebmlElem(b, p, segEnd).getOrElse(return None)
      if (id == 0x1654AE6BL) {
        var q = bodyAt
        while (q < end && trackNum < 0) {
          val (tid, tAt, tEnd, tNext) = ebmlElem(b, q, end).getOrElse(return None)
          if (tid == 0xAEL) {
            var r = tAt
            while (r < tEnd && trackNum < 0) {
              val (eid, eAt, eEnd, eNext) = ebmlElem(b, r, tEnd).getOrElse(return None)
              if (eid == 0xD7L) trackNum = ebmlUint(b, eAt, eEnd)
              r = eNext
            }
          }
          q = tNext
        }
      }
      p = next
    }
    if (trackNum <= 0) return None
    // one block: lacing expansion; frames append to `out`
    def block(at: Int, end: Int, clusterT: Long): Boolean = {
      val (tn, tnLen) = ebmlVint(b, at, end, keepMarker = false)
        .getOrElse(return false)
      if (tn != trackNum) return true // foreign track rides along, skipped
      var q = at + tnLen
      if (q + 3 > end) return false
      val rel = (((b(q) & 0xFF) << 8) | (b(q + 1) & 0xFF)).toShort.toLong
      val flags = b(q + 2) & 0xFF
      q += 3
      val t = clusterT + rel
      val lacing = (flags >> 1) & 3
      if (lacing == 0) {
        if (end - q < 0) return false
        out += ((q.toLong, (end - q).toLong, t))
        return out.length <= MaxSamples
      }
      if (q >= end) return false
      val nFrames = (b(q) & 0xFF) + 1
      q += 1
      val sizes = new Array[Long](nFrames)
      lacing match {
        case 1 => // Xiph: 255-run coded sizes for all but the last
          var i = 0
          while (i < nFrames - 1) {
            var s = 0L
            var more = true
            while (more) {
              if (q >= end) return false
              val v = b(q) & 0xFF
              s += v
              q += 1
              more = v == 255
            }
            sizes(i) = s
            i += 1
          }
        case 3 => // EBML: first absolute, then signed deltas
          val (first, fLen) = ebmlVint(b, q, end, keepMarker = false)
            .getOrElse(return false)
          sizes(0) = first
          q += fLen
          var i = 1
          while (i < nFrames - 1) {
            val (raw, rLen) = ebmlVint(b, q, end, keepMarker = false)
              .getOrElse(return false)
            // signed vint: value minus (2^(7*len-1) - 1)
            sizes(i) = sizes(i - 1) + (raw - ((1L << (7 * rLen - 1)) - 1))
            q += rLen
            i += 1
          }
        case _ => // fixed: equal split of the remainder
          val rem = end - q
          if (nFrames == 0 || rem % nFrames != 0) return false
          java.util.Arrays.fill(sizes, (rem / nFrames).toLong)
      }
      // last frame (Xiph/EBML) = the remainder after the coded sizes
      if (lacing != 2) {
        val coded = sizes.take(nFrames - 1).sum
        val rem = (end - q) - coded
        if (rem < 0) return false
        sizes(nFrames - 1) = rem
      }
      var i = 0
      var off = q.toLong
      while (i < nFrames) {
        if (sizes(i) < 0 || off + sizes(i) > end) return false
        out += ((off, sizes(i), t))
        off += sizes(i)
        i += 1
      }
      out.length <= MaxSamples
    }
    // pass 2: clusters in stream order
    p = segAt
    while (p < segEnd) {
      val (id, bodyAt, end, next) = ebmlElem(b, p, segEnd).getOrElse(return None)
      if (id == 0x1F43B675L) {
        var clusterT = 0L
        var q = bodyAt
        while (q < end) {
          val (cid, cAt, cEnd, cNext) = ebmlElem(b, q, end).getOrElse(return None)
          cid match {
            case 0xE7L => clusterT = ebmlUint(b, cAt, cEnd)
            case 0xA3L => if (!block(cAt, cEnd, clusterT)) return None
            case 0xA0L => // BlockGroup: find the Block child
              var r = cAt
              while (r < cEnd) {
                val (gid, gAt, gEnd, gNext) = ebmlElem(b, r, cEnd)
                  .getOrElse(return None)
                if (gid == 0xA1L && !block(gAt, gEnd, clusterT)) return None
                r = gNext
              }
            case _ => () // Void / unknown children ride along
          }
          q = cNext
        }
      }
      p = next
    }
    Some(out.toArray)
  }

  /** The header-sniff twin for WebM — Segment>Info's TimestampScale
    * (default 10⁶ ns) and float Duration to milliseconds; stream
    * parameters stay null like the BMFF sniff (they live per-track). */
  private[graft] def decodeWebm(b: Array[Byte]): Option[Media] = {
    if (!isEbml(b)) return None
    try {
      var p = 0
      var segAt = -1
      var segEnd = -1
      while (p < b.length && segAt < 0) {
        val (id, bodyAt, end, next) = ebmlElem(b, p, b.length).getOrElse(return None)
        if (id == 0x18538067L) { segAt = bodyAt; segEnd = end }
        p = next
      }
      if (segAt < 0) return None
      var scale = 1000000L
      var duration: java.lang.Double = null
      p = segAt
      while (p < segEnd) {
        val (id, bodyAt, end, next) = ebmlElem(b, p, segEnd).getOrElse(return None)
        if (id == 0x1549A966L) {
          var q = bodyAt
          while (q < end) {
            val (iid, iAt, iEnd, iNext) = ebmlElem(b, q, end).getOrElse(return None)
            if (iid == 0x2AD7B1L) scale = ebmlUint(b, iAt, iEnd)
            else if (iid == 0x4489L) {
              val len = iEnd - iAt
              if (len == 4)
                duration = java.lang.Float.intBitsToFloat(
                  ebmlUint(b, iAt, iEnd).toInt).toDouble
              else if (len == 8)
                duration = java.lang.Double.longBitsToDouble(ebmlUint(b, iAt, iEnd))
            }
            q = iNext
          }
        }
        p = next
      }
      if (scale <= 0) return None
      val durMs: java.lang.Long =
        if (duration == null || duration.isNaN || duration < 0) null
        else java.lang.Long.valueOf((duration * scale / 1e6).toLong)
      Some(Media("webm", null, null, null, durMs))
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }
}

/** Per-sample (offset, size, start time) from an MP4's sample tables
  * or movie fragments — [[MediaHeader.mp4Samples]] as a column: array
  * of structs with ABSOLUTE payload offsets (the one contract shared
  * with [[WebmSamples]]), so `substr(payload, off+1, len)` slices the
  * REAL frame bytes the container addresses. Null for non-BMFF
  * payloads, movies with neither sample tables nor fragments, or
  * tables that don't cover their declared samples — the
  * opaque-payload convention of the media walk family. */
case class Mp4Samples(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(new StructType()
    .add("off", LongType, nullable = false)
    .add("len", LongType, nullable = false)
    .add("t", LongType, nullable = false), containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"Mp4Samples needs a binary payload, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    MediaHeader.mp4Samples(input.asInstanceOf[Array[Byte]]) match {
      case Some(samples) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          samples.map { case (off, len, t) => InternalRow(off, len, t) })
      case None => null
    }

  override protected def withNewChildInternal(c: Expression): Mp4Samples =
    copy(child = c)
}

object Mp4Samples {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(Mp4Samples(
      org.apache.spark.sql.graft.ColumnBridge.expression(payload)))
}

/** [[Mp4Samples]]' WebM/Matroska twin — per-frame (offset, size,
  * timestamp) from the EBML Cluster/SimpleBlock walk
  * ([[MediaHeader.webmSamples]]). Offsets are ABSOLUTE payload
  * offsets (Matroska has no contiguous media body — the frame bytes
  * live inside each block), so callers slice the payload column
  * itself. Null for non-EBML payloads or corrupt elements. */
case class WebmSamples(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(new StructType()
    .add("off", LongType, nullable = false)
    .add("len", LongType, nullable = false)
    .add("t", LongType, nullable = false), containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"WebmSamples needs a binary payload, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    MediaHeader.webmSamples(input.asInstanceOf[Array[Byte]]) match {
      case Some(samples) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          samples.map { case (off, len, t) => InternalRow(off, len, t) })
      case None => null
    }

  override protected def withNewChildInternal(c: Expression): WebmSamples =
    copy(child = c)
}

object WebmSamples {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(WebmSamples(
      org.apache.spark.sql.graft.ColumnBridge.expression(payload)))
}

/** Deterministic REAL-container media payload for a text column — the
  * WAV/MP4/MP3 counterpart of [[SynthPdf]]: every field derives from
  * the text's md5 alone, so a SQL oracle recomputes the PARSED
  * metadata without touching the bytes. md5-byte-0 routes the
  * container: ≡2 (mod 3) ships MP3 (CBR MPEG-1 Layer III frames,
  * every third one behind a real ID3v2.3 tag the walk must skip);
  * otherwise even ships RIFF/WAVE with a real PCM fmt chunk and a
  * data chunk whose byte count backs the duration; odd ships VIDEO —
  * md5-byte-11 splits it between ISO BMFF (ftyp + moov/mvhd + mdat)
  * with the duration as mvhd metadata, and WebM (EBML header +
  * Segment with Info/Tracks/Clusters) whose SimpleBlocks carry the
  * SAME SQL-replayable sample plan across two cluster bases. A
  * deterministic share inserts an extra LIST chunk / free box / Void
  * element (the walk must skip, not assume fixed offsets) and flips
  * mvhd to version 1 (the 64-bit layout). */
case class SynthMedia(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthMedia needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthMedia.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthMedia =
    copy(child = c)
}

object SynthMedia {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthMedia(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  val Rates: Seq[Long] = Seq(8000L, 16000L, 22050L, 44100L, 48000L)
  val Bits: Seq[Long] = Seq(8L, 16L, 24L)
  val Timescales: Seq[Long] = Seq(600L, 1000L, 90000L)
  val Mp3Kbps: Seq[Long] = Seq(64L, 128L, 192L, 256L, 320L)
  val Mp3Rates: Seq[Long] = Seq(44100L, 48000L, 32000L)

  private[graft] def build(text: String): Array[Byte] = {
    val m = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    def u8(k: Int): Int = m(k) & 0xFF
    // h32 = md5 bytes 4..7 big-endian = SQL ('0x'||substr(md5(t),9,8))
    val h32 = (u8(4).toLong << 24) | (u8(5).toLong << 16) |
      (u8(6).toLong << 8) | u8(7).toLong
    val extra = u8(8) % 3 == 0
    val out = new java.io.ByteArrayOutputStream(1536)
    def le16(v: Long): Unit = { out.write(v.toInt & 0xFF); out.write((v >> 8).toInt & 0xFF) }
    def le32(v: Long): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    def be32(v: Long): Unit = {
      out.write((v >> 24).toInt & 0xFF); out.write((v >> 16).toInt & 0xFF)
      out.write((v >> 8).toInt & 0xFF); out.write(v.toInt & 0xFF)
    }
    def be64(v: Long): Unit = { be32(v >>> 32); be32(v & 0xFFFFFFFFL) }
    def cc(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    if (u8(0) % 3 == 2) {
      // ---- MP3: [ID3v2.3 tag] + MPEG-1 Layer III frames, first one
      // optionally a Xing or VBRI frame (the VBR share) ----
      val kbps = Mp3Kbps((u8(2) % 5).toInt)
      val rate = Mp3Rates((u8(3) % 3).toInt)
      val channels = 1L + u8(1) % 2
      val nFrames = 4 + (h32 % 8).toInt
      val frameSize = (144000L * kbps / rate).toInt // padding bit 0
      if (extra) {
        // ID3v2.3: "ID3" ver flags + SYNCSAFE body size, body skipped
        cc("ID3"); out.write(3); out.write(0); out.write(0)
        val body = "graft-synthetic-tag-" // 20 bytes
        out.write(0); out.write(0); out.write(0); out.write(body.length)
        cc(body)
      }
      val bitrateIdx = Mp3Kbps.indexOf(kbps) match {
        // MPEG-1 Layer III bitrate table indices for 64/128/192/256/320
        case 0 => 5; case 1 => 9; case 2 => 11; case 3 => 13; case _ => 14
      }
      val rateIdx = (u8(3) % 3)
      val mode = if (channels == 1) 3 else 0
      // VBR share (byte 10 mod 3): 1 = Xing frame first, 2 = VBRI
      // frame first, else plain CBR. The DECLARED frame count is
      // decoupled from the byte length (40 + h32 % 64), so a decode
      // that ignored the VBR header and fell back to the byte
      // estimate would hash-mismatch — the header path is proven,
      // not just present.
      val vbrShare = u8(10) % 3
      val vFrames = 40L + h32 % 64L
      def frameHeader(): Unit = {
        out.write(0xFF); out.write(0xFB) // sync + MPEG-1 + Layer III + no CRC
        out.write((bitrateIdx << 4) | (rateIdx << 2)) // padding 0, private 0
        out.write(mode << 6)
      }
      if (vbrShare != 0) {
        frameHeader()
        val sideInfo = if (mode == 3) 17 else 32
        val tagAt = if (vbrShare == 1) 4 + sideInfo else 4 + 32
        var i = 4
        while (i < tagAt) { out.write(0); i += 1 } // zeroed side info
        if (vbrShare == 1) {
          cc("Xing"); be32(1L) // flags: frames field present
          be32(vFrames)
          i = tagAt + 12
        } else {
          cc("VBRI")
          out.write(0); out.write(1) // version 1 (BE)
          out.write(0); out.write(0) // delay
          out.write(0); out.write(0) // quality
          be32(frameSize.toLong * (1 + nFrames)) // total bytes (informative)
          be32(vFrames) // tag + 14, where the walk reads it
          i = tagAt + 18
        }
        while (i < frameSize) { out.write((u8(9) + i) & 0x7F); i += 1 }
      }
      var f = 0
      while (f < nFrames) {
        frameHeader()
        var i = 4
        while (i < frameSize) { out.write((u8(9) + f + i) & 0x7F); i += 1 }
        f += 1
      }
    } else if (u8(0) % 2 == 0) {
      // ---- RIFF/WAVE, PCM ----
      val channels = 1L + u8(1) % 2
      val rate = Rates((u8(2) % 5).toInt)
      val bits = Bits((u8(3) % 3).toInt)
      val blockAlign = channels * bits / 8
      val dataSize = 256 + h32 % 1024
      val listBody = "INFOgraft-synthetic-" // 20 bytes, even
      val listSize = if (extra) 8 + listBody.length else 0
      val riffSize = 4 + (8 + 16) + listSize + (8 + dataSize + dataSize % 2)
      cc("RIFF"); le32(riffSize); cc("WAVE")
      cc("fmt "); le32(16)
      le16(1); le16(channels); le32(rate)
      le32(rate * blockAlign); le16(blockAlign); le16(bits)
      if (extra) { cc("LIST"); le32(listBody.length.toLong); cc(listBody) }
      cc("data"); le32(dataSize)
      var i = 0L
      while (i < dataSize) { out.write((u8(9) + i).toInt & 0xFF); i += 1 }
      if (dataSize % 2 == 1) out.write(0) // RIFF pad
    } else if (u8(11) % 2 == 1) {
      // ---- WebM (Matroska/EBML): the crawl's OTHER video container.
      // Same SQL-replayable sample plan as the BMFF share (ns, sizes,
      // per-sample delta, the 2-byte gap before chunk 2's content), so
      // the mm_frames oracle is share-agnostic; the frames ride REAL
      // SimpleBlocks across two Clusters (cluster-relative signed
      // timestamps — the walker must ADD the cluster base), and the
      // Info carries TimestampScale 1e6 + an integral float Duration
      // so mm_media's duration replays exactly ----
      val duration = 1000L + h32 % 1000000L
      val textBytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val avail = textBytes.length
      val ns = math.min(4 + (h32 % 5).toInt, (avail - 2) / 11)
      val delta = 50L + u8(10) % 100
      def sizeOf(i: Int): Long = 3 + (h32 + 7L * i) % 9
      def offOf(i: Int): Long =
        (if (i >= (ns + 1) / 2) 2L else 0L) + (0 until i).map(sizeOf).sum
      val c1 = (ns + 1) / 2
      def vint2(v: Int): Array[Byte] = // 2-byte EBML size (marker 0x40)
        Array[Byte]((0x40 | (v >> 8)).toByte, (v & 0xFF).toByte)
      def elem(id: Array[Byte], body: Array[Byte]): Array[Byte] =
        id ++ vint2(body.length) ++ body
      def be16b(v: Long) = Array[Byte](((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
      val ebmlHdr = elem(id(0x1A, 0x45, 0xDF, 0xA3),
        elem(id(0x42, 0x82), "webm".getBytes("ISO-8859-1")))
      val info = elem(id(0x15, 0x49, 0xA9, 0x66),
        elem(id(0x2A, 0xD7, 0xB1), Array[Byte](0x0F, 0x42, 0x40)) ++ // 1e6 ns
          elem(id(0x44, 0x89), { // Duration: 8-byte float (integral)
            val bits = java.lang.Double.doubleToLongBits(duration.toDouble)
            (0 to 7).map(i => ((bits >> (8 * (7 - i))) & 0xFF).toByte).toArray
          }))
      val tracks = elem(id(0x16, 0x54, 0xAE, 0x6B),
        elem(id(0xAE),
          elem(id(0xD7), Array[Byte](1)) ++ // TrackNumber 1
            elem(id(0x83), Array[Byte](1)))) // TrackType video
      def cluster(baseT: Long, from: Int, cnt: Int): Array[Byte] = {
        val blocks = (from until from + cnt).flatMap { i =>
          val fr = java.util.Arrays.copyOfRange(textBytes,
            offOf(i).toInt, (offOf(i) + sizeOf(i)).toInt)
          elem(id(0xA3), // SimpleBlock: track vint, rel ts, flags, frame
            Array[Byte](0x81.toByte) ++ be16b(delta * i - baseT) ++
              Array[Byte](0x80.toByte) ++ fr)
        }.toArray
        elem(id(0x1F, 0x43, 0xB6, 0x75),
          elem(id(0xE7), be16b(baseT)) ++ blocks)
      }
      val clusters =
        if (ns == 0) Array.empty[Byte]
        else cluster(0L, 0, c1) ++
          (if (ns - c1 > 0) cluster(delta * c1, c1, ns - c1)
           else Array.empty[Byte])
      val voidEl = if (extra) elem(id(0xEC), Array[Byte](0, 0, 0)) else
        Array.empty[Byte] // the walk must skip unknown/Void elements
      val segment = elem(id(0x18, 0x53, 0x80, 0x67),
        voidEl ++ info ++ tracks ++ clusters)
      out.write(ebmlHdr); out.write(segment)
    } else if (u8(12) % 2 == 1) {
      // ---- FRAGMENTED MP4 (CMAF/DASH layout): ftyp + moov(mvhd +
      // trak with EMPTY sample tables + mvex/trex defaults) + one
      // moof+mdat pair per chunk of the SAME sample plan. Fragment 1
      // exercises default-base-is-moof addressing, a tfhd default
      // duration, and per-sample trun sizes; fragment 2 exercises an
      // explicit 64-bit base-data-offset, a v1 tfdt, per-sample trun
      // durations, and the trex duration fallback is covered by
      // fragment 2's tfhd carrying NO default. Frame bytes are the
      // same text slices, so the mm_frames oracle is share-blind. ----
      val timescale = Timescales((u8(2) % 3).toInt)
      val duration = 1000L + h32 % 1000000L
      val v1 = u8(9) % 2 == 1
      val textBytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val avail = textBytes.length
      val ns = math.min(4 + (h32 % 5).toInt, (avail - 2) / 11)
      val delta = 50L + u8(10) % 100
      def sizeOf(i: Int): Long = 3 + (h32 + 7L * i) % 9
      def offOf(i: Int): Long =
        (if (i >= (ns + 1) / 2) 2L else 0L) + (0 until i).map(sizeOf).sum
      val c1 = (ns + 1) / 2
      val c2 = ns - c1
      val mvhdBody = if (v1) 4 + 8 + 8 + 4 + 8 else 4 + 4 + 4 + 4 + 4
      val mvhdSize = 8 + mvhdBody
      val stblSize = 8 + 16 + 16 + 20 + 16 // empty stts/stsc/stsz/stco
      val trakSize = 8 + 8 + 8 + stblSize
      val mvexSize = 8 + 32
      val moovSize = 8 + mvhdSize + trakSize + mvexSize
      be32(24); cc("ftyp"); cc("isom"); be32(0x200)
      cc("isom"); cc("cmfc")
      be32(moovSize.toLong); cc("moov")
      be32(mvhdSize.toLong); cc("mvhd")
      if (v1) {
        out.write(1); out.write(0); out.write(0); out.write(0)
        be64(0); be64(0); be32(timescale); be64(duration)
      } else {
        be32(0); be32(0); be32(0); be32(timescale); be32(duration)
      }
      be32(trakSize.toLong); cc("trak")
      be32(trakSize.toLong - 8); cc("mdia")
      be32(trakSize.toLong - 16); cc("minf")
      be32(stblSize.toLong); cc("stbl")
      be32(16); cc("stts"); be32(0); be32(0)
      be32(16); cc("stsc"); be32(0); be32(0)
      be32(20); cc("stsz"); be32(0); be32(0); be32(0)
      be32(16); cc("stco"); be32(0); be32(0)
      be32(mvexSize.toLong); cc("mvex")
      be32(32); cc("trex"); be32(0)
      be32(1); be32(1); be32(delta); be32(0); be32(0) // defaults: dur, size 0
      if (ns > 0) {
        // fragment 1: default-base-is-moof + tfhd default duration
        val traf1 = 8 + 20 + 16 + (20 + 4 * c1)
        val moof1 = 8 + 16 + traf1
        be32(moof1.toLong); cc("moof")
        be32(16); cc("mfhd"); be32(0); be32(1)
        be32(traf1.toLong); cc("traf")
        be32(20); cc("tfhd"); be32(0x020008); be32(1); be32(delta)
        be32(16); cc("tfdt"); be32(0); be32(0) // v0, base time 0
        be32(20L + 4 * c1); cc("trun"); be32(0x000201)
        be32(c1.toLong); be32(moof1.toLong + 8) // data offset: past mdat hdr
        (0 until c1).foreach(i => be32(sizeOf(i)))
        val mdat1 = 8 + (0 until c1).map(sizeOf).sum
        be32(mdat1); cc("mdat")
        (0 until c1).foreach(i => out.write(textBytes,
          offOf(i).toInt, sizeOf(i).toInt))
        if (c2 > 0) {
          // fragment 2: explicit base-data-offset + v1 tfdt +
          // per-sample trun durations; size default falls to trun
          val traf2 = 8 + 24 + 20 + (20 + 8 * c2)
          val moof2 = 8 + 16 + traf2
          val frag2At = 24 + moovSize + moof1 + mdat1
          val mdat2BodyAt = frag2At + moof2 + 8
          be32(moof2.toLong); cc("moof")
          be32(16); cc("mfhd"); be32(0); be32(2)
          be32(traf2.toLong); cc("traf")
          be32(24); cc("tfhd"); be32(0x000001); be32(1)
          be64(mdat2BodyAt.toLong) // base-data-offset
          be32(20); cc("tfdt"); out.write(1); out.write(0); out.write(0)
          out.write(0); be64(delta * c1) // v1 base decode time
          be32(20L + 8 * c2); cc("trun"); be32(0x000301)
          be32(c2.toLong); be32(0) // data offset 0 from the base
          (c1 until ns).foreach { i => be32(delta); be32(sizeOf(i)) }
          val mdat2 = 8 + (c1 until ns).map(sizeOf).sum
          be32(mdat2); cc("mdat")
          (c1 until ns).foreach(i => out.write(textBytes,
            offOf(i).toInt, sizeOf(i).toInt))
        }
      }
    } else {
      // ---- ISO BMFF: ftyp + [free] + moov(mvhd [+free] + trak(mdia/
      // minf/stbl sample tables)) + mdat(= the TEXT bytes) — the
      // sample tables address REAL slices of the text, so the
      // mm_frames oracle recomputes every offset/size/time from
      // md5(text) + octet_length(text) alone while the Spark side
      // walks the container ----
      val timescale = Timescales((u8(2) % 3).toInt)
      val duration = 1000L + h32 % 1000000L
      val v1 = u8(9) % 2 == 1
      val textBytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val avail = textBytes.length
      // sample plan, every term SQL-replayable: up to 8 samples of
      // 3..11 bytes, clamped so the slices (plus the 2-byte chunk-2
      // gap that proves stco is READ, not recomputed) fit the text
      val ns = math.min(4 + (h32 % 5).toInt, (avail - 2) / 11)
      val delta = 50L + u8(10) % 100 // stts decode delta per sample
      def sizeOf(i: Int): Long = 3 + (h32 + 7L * i) % 9
      val c1 = (ns + 1) / 2 // samples in chunk 1; the rest in chunk 2
      val c2 = ns - c1
      val numChunks = if (c2 > 0) 2 else 1
      val sttsSize = 24
      val stscSize = 16 + 12 * numChunks
      val stszSize = 20 + 4 * ns
      val stcoSize = 16 + 4 * numChunks
      val stblSize = 8 + sttsSize + stscSize + stszSize + stcoSize
      val trakSize = if (ns > 0) 8 + 8 + 8 + stblSize else 0 // trak>mdia>minf>stbl
      val mvhdBody = if (v1) 4 + 8 + 8 + 4 + 8 else 4 + 4 + 4 + 4 + 4
      val mvhdSize = 8 + mvhdBody
      val freeInMoov = if (extra) 12 else 0
      val moovSize = 8 + freeInMoov + mvhdSize + trakSize
      val mdatBody = 24 + (if (extra) 16 else 0) + moovSize + 8
      be32(24); cc("ftyp"); cc("isom"); be32(0x200)
      cc("isom"); cc("mp42")
      if (extra) { be32(16); cc("free"); be32(0); be32(0) }
      be32(moovSize.toLong); cc("moov")
      if (extra) { be32(12); cc("free"); be32(0) } // the walk must skip it
      be32(mvhdSize.toLong); cc("mvhd")
      if (v1) {
        out.write(1); out.write(0); out.write(0); out.write(0)
        be64(0); be64(0); be32(timescale); be64(duration)
      } else {
        be32(0); be32(0); be32(0); be32(timescale); be32(duration)
      }
      if (ns > 0) {
        be32(trakSize.toLong); cc("trak")
        be32(trakSize.toLong - 8); cc("mdia")
        be32(trakSize.toLong - 16); cc("minf")
        be32(stblSize.toLong); cc("stbl")
        be32(sttsSize.toLong); cc("stts"); be32(0)
        be32(1); be32(ns.toLong); be32(delta)
        be32(stscSize.toLong); cc("stsc"); be32(0)
        be32(numChunks.toLong)
        be32(1); be32(c1.toLong); be32(1)
        if (c2 > 0) { be32(2); be32(c2.toLong); be32(1) }
        be32(stszSize.toLong); cc("stsz"); be32(0)
        be32(0) // per-sample sizes follow
        be32(ns.toLong)
        (0 until ns).foreach(i => be32(sizeOf(i)))
        be32(stcoSize.toLong); cc("stco"); be32(0)
        be32(numChunks.toLong)
        be32(mdatBody.toLong)
        if (c2 > 0)
          be32(mdatBody.toLong + (0 until c1).map(sizeOf).sum + 2)
      }
      be32(8L + avail); cc("mdat")
      out.write(textBytes)
    }
    out.toByteArray
  }
}
