package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** EXIF metadata from a JPEG's APP1 segment — the camera-provenance
  * walk an image-curation pipeline runs before anything touches
  * pixels: maker/model (dataset provenance), orientation (a display
  * transform the pixel path must know about), capture timestamp, and
  * whether a GPS IFD is present AT ALL (location EXIF is PII — the
  * gate's question is "does this image carry coordinates", answered
  * without parsing them).
  *
  * A from-scratch TIFF/EXIF walk (the public EXIF 2.3 / TIFF 6.0
  * layout): the APP1 `Exif\0\0` payload is a TIFF file — `II`
  * (little) or `MM` (big) byte order, magic 42, IFD0 as a table of
  * 12-byte entries (tag, type, count, value-or-offset; values wider
  * than 4 bytes live at an offset from the TIFF start). Extracted:
  * Make (0x010F), Model (0x0110), Orientation (0x0112, SHORT 1-8),
  * DateTime (0x0132), GPS-IFD pointer presence (0x8825).
  *
  * Null policy mirrors [[MediaHeaderMeta]]: this is metadata
  * SNIFFING, not content decode — non-JPEG payloads, JPEGs with no
  * Exif APP1, and malformed TIFF structures all yield null rather
  * than failing an ingest over a corrupt vanity field. Missing
  * individual tags yield null FIELDS. */
case class ExifMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = new StructType()
    .add("make", StringType)
    .add("model", StringType)
    .add("orientation", LongType)
    .add("taken_at", StringType)
    .add("has_gps", BooleanType)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ExifMeta needs a binary payload, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ExifMeta.decode(input.asInstanceOf[Array[Byte]]) match {
      case Some((make, model, orient, dt, gps)) => InternalRow(
        if (make == null) null else UTF8String.fromString(make),
        if (model == null) null else UTF8String.fromString(model),
        orient, if (dt == null) null else UTF8String.fromString(dt), gps)
      case None => null
    }

  override protected def withNewChildInternal(c: Expression): ExifMeta =
    copy(child = c)
}

object ExifMeta {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ExifMeta(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  /** (make, model, orientation, datetime, hasGps); None = no usable
    * EXIF. Nulls inside = the individual tag is absent. */
  private[graft] def decode(b: Array[Byte])
      : Option[(String, String, java.lang.Long, String, Boolean)] = {
    try {
      if (!JpegDecode.isJpeg(b)) return None
      // marker walk to APP1 "Exif\0\0" (stop at SOS: EXIF precedes it)
      var p = 2
      var tiff = -1
      var tiffLen = 0
      while (tiff < 0) {
        if (p + 4 > b.length) return None
        if ((b(p) & 0xFF) != 0xFF) return None
        val m = b(p + 1) & 0xFF
        if (m == 0xDA || m == 0xD9) return None // into the scan: no EXIF
        val len = ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
        if (p + 2 + len > b.length) return None
        if (m == 0xE1 && len >= 14 &&
          b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' &&
          b(p + 7) == 'f' && b(p + 8) == 0 && b(p + 9) == 0) {
          tiff = p + 10
          tiffLen = len - 8
        } else p += 2 + len
      }
      val le = (b(tiff) & 0xFF, b(tiff + 1) & 0xFF) match {
        case (0x49, 0x49) => true // "II"
        case (0x4D, 0x4D) => false // "MM"
        case _ => return None
      }
      def u16(i: Int): Int =
        if (le) (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
        else ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
      def u32(i: Int): Long =
        if (le) (b(i) & 0xFFL) | (b(i + 1) & 0xFFL) << 8 |
          (b(i + 2) & 0xFFL) << 16 | (b(i + 3) & 0xFFL) << 24
        else (b(i) & 0xFFL) << 24 | (b(i + 1) & 0xFFL) << 16 |
          (b(i + 2) & 0xFFL) << 8 | (b(i + 3) & 0xFFL)
      if (u16(tiff + 2) != 42) return None
      val ifd0 = tiff + u32(tiff + 4).toInt
      if (ifd0 + 2 > tiff + tiffLen || ifd0 + 2 > b.length) return None
      val n = u16(ifd0)
      var make: String = null; var model: String = null
      var orient: java.lang.Long = null; var dt: String = null
      var gps = false
      var k = 0
      while (k < n) {
        val e = ifd0 + 2 + 12 * k
        if (e + 12 > b.length) return None
        val tag = u16(e)
        val typ = u16(e + 2)
        val count = u32(e + 4)
        def ascii(): String =
          if (typ != 2 || count < 1 || count > 4096) null
          else {
            val at = if (count <= 4) e + 8 else tiff + u32(e + 8).toInt
            if (at < 0 || at + count > b.length) null
            else {
              val s = new String(b, at, count.toInt - 1, // drop the NUL
                java.nio.charset.StandardCharsets.US_ASCII)
              if (s.isEmpty) null else s
            }
          }
        tag match {
          case 0x010F => make = ascii()
          case 0x0110 => model = ascii()
          case 0x0112 if typ == 3 && count == 1 =>
            orient = java.lang.Long.valueOf(u16(e + 8).toLong)
          case 0x0132 => dt = ascii()
          case 0x8825 => gps = true // a GPS IFD pointer exists
          case _ => ()
        }
        k += 1
      }
      Some((make, model, orient, dt, gps))
    } catch { case _: Exception => None }
  }
}

/** Deterministic EXIF JPEG for a text column — the fixture generator
  * behind the mm_exif oracle: SOI + an APP1 TIFF whose every field
  * derives from the text's md5 (make/model from hex prefixes,
  * orientation = 1 + byte mod 8, a capture timestamp built
  * digit-by-digit, a GPS IFD on a deterministic third) and whose
  * BYTE ORDER routes half the documents through `II` and half
  * through `MM` — the oracle is endianness-transparent, so both
  * TIFF walks are hash-checked. Make rides at an OFFSET (count > 4)
  * and a short model can ride inline; both value layouts decode. */
case class SynthExif(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthExif needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthExif.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthExif =
    copy(child = c)
}

object SynthExif {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthExif(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  private[graft] def build(text: String): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map("%02x".format(_)).mkString
    def u8(k: Int): Int = d(k) & 0xFF
    val le = u8(6) % 2 == 0 // byte-order share
    val make = s"Cam-${hex.substring(0, 6)}" // 10 chars -> offset value
    val model = s"M${hex.charAt(6)}" // 2 chars (+NUL = 3) -> inline
    val orient = 1L + u8(7) % 8
    val taken = f"20${10 + u8(8) % 15}%02d:${1 + u8(9) % 12}%02d:" +
      f"${1 + u8(10) % 28}%02d ${u8(11) % 24}%02d:${u8(12) % 60}%02d:${u8(13) % 60}%02d"
    val hasGps = u8(14) % 3 == 0
    // --- TIFF body (offsets from the TIFF start) ---
    val bo = new java.io.ByteArrayOutputStream(256)
    def p16(v: Int): Unit =
      if (le) { bo.write(v & 0xFF); bo.write((v >> 8) & 0xFF) }
      else { bo.write((v >> 8) & 0xFF); bo.write(v & 0xFF) }
    def p32(v: Long): Unit =
      if (le) { p16((v & 0xFFFF).toInt); p16(((v >> 16) & 0xFFFF).toInt) }
      else { p16(((v >> 16) & 0xFFFF).toInt); p16((v & 0xFFFF).toInt) }
    bo.write(if (le) 'I' else 'M'); bo.write(if (le) 'I' else 'M')
    p16(42); p32(8) // IFD0 at offset 8
    val nEntries = if (hasGps) 5 else 4
    // data area starts after: 8 header + 2 count + 12n + 4 next
    val dataAt = 8 + 2 + 12 * nEntries + 4
    val makeBytes = make.getBytes("US-ASCII") :+ 0.toByte // NUL-terminated
    val takenBytes = taken.getBytes("US-ASCII") :+ 0.toByte
    p16(nEntries)
    def entry(tag: Int, typ: Int, count: Long)(value: => Unit): Unit = {
      p16(tag); p16(typ); p32(count)
      val before = bo.size()
      value
      while (bo.size() < before + 4) bo.write(0) // pad the value field
    }
    entry(0x010F, 2, makeBytes.length) { p32(dataAt) } // offset form
    entry(0x0110, 2, 3) { // inline form: "Mx\0" + pad
      bo.write(model.charAt(0)); bo.write(model.charAt(1)); bo.write(0)
    }
    entry(0x0112, 3, 1) { p16(orient.toInt) }
    entry(0x0132, 2, takenBytes.length) { p32(dataAt + makeBytes.length) }
    if (hasGps) // a minimal GPS IFD after the data area
      entry(0x8825, 4, 1) { p32(dataAt + makeBytes.length + takenBytes.length) }
    p32(0) // no next IFD
    bo.write(makeBytes); bo.write(takenBytes)
    if (hasGps) { p16(0); p32(0) } // an empty GPS IFD (0 entries)
    val tiffBytes = bo.toByteArray
    // --- JPEG envelope: SOI + APP1(Exif) + EOI ---
    val out = new java.io.ByteArrayOutputStream(tiffBytes.length + 32)
    out.write(0xFF); out.write(0xD8)
    val app1Len = 2 + 6 + tiffBytes.length
    out.write(0xFF); out.write(0xE1)
    out.write((app1Len >> 8) & 0xFF); out.write(app1Len & 0xFF)
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(tiffBytes)
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }
}
