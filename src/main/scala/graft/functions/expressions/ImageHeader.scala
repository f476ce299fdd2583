package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** payload (binary, or a base64 string) → struct(format, width,
  * height) from the CONTAINER HEADER alone — PNG IHDR, GIF logical
  * screen descriptor, BMP info header, JPEG SOFn marker walk — or null
  * for anything else. Pure byte parsing of the public container
  * formats: no image libraries, no pixel decode, which is exactly how
  * a 100 TB crawl pipeline sniffs dimensions (reading 4 KB of header
  * beats decoding 4 MB of pixels, and the pixel decoder stays the
  * documented mapInPandas seam). Null — not a loud failure — because
  * unknown containers AND non-base64 strings are the NORMAL case for
  * opaque payloads; callers choose their fallback (Spark's own
  * `unbase64` throws on malformed input, so the tolerant decode lives
  * here). */
case class ImageHeaderMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = new StructType()
    .add("format", StringType)
    .add("width", LongType)
    .add("height", LongType)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ImageHeaderMeta wants binary or base64 string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes: Array[Byte] = input match {
      case b: Array[Byte] => b
      case s: UTF8String =>
        try java.util.Base64.getMimeDecoder.decode(s.toString)
        catch { case _: IllegalArgumentException => return null }
      case _ => return null
    }
    ImageHeader.decode(bytes) match {
      case Some((f, w, h)) =>
        InternalRow(UTF8String.fromString(f), w, h)
      case None => null
    }
  }

  override protected def withNewChildInternal(c: Expression): ImageHeaderMeta =
    copy(child = c)
}

object ImageHeaderMeta {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(ImageHeaderMeta(
      org.apache.spark.sql.graft.ColumnBridge.expression(payload)))
}

object ImageHeader {

  /** (format, width, height) or None. */
  def decode(b: Array[Byte]): Option[(String, Long, Long)] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be16(i: Int): Long = (u8(i) << 8 | u8(i + 1)).toLong
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3))
    def le16(i: Int): Long = (u8(i) | u8(i + 1) << 8).toLong
    def le32(i: Int): Long =
      (u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24))
    if (b.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G' && u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A &&
        u8(7) == 0x0A &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      // The DIB header size at 14 picks the layout: 12 =
      // BITMAPCOREHEADER (OS/2) with uint16 width/height at 18/20;
      // >= 40 = BITMAPINFOHEADER+ with int32 width at 18, int32
      // height at 22 (negative height = top-down row order —
      // magnitude is the size). Anything else → content-hash stub.
      val dib = le32(14)
      if (dib == 12) Some(("bmp", le16(18), le16(20)))
      else if (dib >= 40) Some(("bmp", le32(18), math.abs(le32(22).toInt).toLong))
      else None
    }
    else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // JPEG: walk FF-marker segments to the first SOFn frame header
      // (C0-CF except C4 DHT / C8 JPG / CC DAC): len(2) precision(1)
      // height(2 BE) width(2 BE)
      var p = 2
      var out: Option[(String, Long, Long)] = None
      var corrupt = false
      while (out.isEmpty && !corrupt && p + 3 < b.length) {
        if (u8(p) != 0xFF) corrupt = true
        else {
          val m = u8(p + 1)
          if (m == 0xFF) p += 1 // fill byte
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) p += 2 // standalone
          else {
            val segLen = be16(p + 2).toInt
            if (segLen < 2 || p + 2 + segLen > b.length) corrupt = true
            else if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 &&
                m != 0xCC) {
              if (segLen >= 7)
                out = Some(("jpeg", be16(p + 7), be16(p + 5)))
              else corrupt = true
            } else if (m == 0xDA) corrupt = true // scan data before SOF
            else p += 2 + segLen
          }
        }
      }
      out
    } else None
  }
}
