package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass parser for the GFT document container — the library's
  * binary-ingest seam, the analog of the reference's PDF/PPTX readers
  * that pull per-page text blocks AND positioned images out of one
  * binary payload (embed_pdf vector_db.py:247-343, embed_pptx
  * :344-418).
  *
  * GFT layout (ASCII container; record stream, no padding):
  *   "PG" <len:4 digits> <text: len bytes>          — a page's text
  *   "IM" <id: 8 hex>    <x0 y0 x1 y1: 4×4 digits>  — an image on the
  *                                                    preceding page,
  *                                                    with its bbox
  *
  * The parser walks the byte stream sequentially — lengths, ids, and
  * bboxes are READ from the payload, not recomputed — and emits one
  * struct per record:
  *   (page_num, content_type, content_id, content_raw, x0, y0, x1, y1)
  * Text rows carry the page's byte range as (0, off, 0, off+len),
  * tracking the cumulative parsed offset. Malformed input fails loudly
  * (truncated record / unknown tag) rather than yielding partial rows.
  */
case class ParseGft(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(new StructType()
    .add("page_num", LongType)
    .add("content_type", StringType)
    .add("content_id", StringType)
    .add("content_raw", StringType)
    .add("x0", DoubleType).add("y0", DoubleType)
    .add("x1", DoubleType).add("y1", DoubleType))

  private val TextBlock = UTF8String.fromString("text_block")
  private val Image = UTF8String.fromString("image")

  override def nullSafeEval(input: Any): Any = {
    // true BYTE offsets: the container is a byte stream and the PG
    // length field counts octets, so walking UTF-16 code units would
    // desync the framing on any supplementary character. Tags, length
    // digits, ids, and coords are ASCII by format definition.
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val out = ArrayBuffer.empty[Any]
    var pos = 0
    var page = -1L
    var off = 0L
    def fail(what: String) =
      throw new IllegalArgumentException(s"GFT parse: $what at byte $pos")
    def ascii(start: Int, len: Int): String =
      new String(bytes, start, len, java.nio.charset.StandardCharsets.US_ASCII)
    while (pos < n) {
      if (pos + 2 > n) fail("truncated tag")
      ascii(pos, 2) match {
        case "PG" =>
          if (pos + 6 > n) fail("truncated page length")
          val len = ascii(pos + 2, 4).toInt
          if (pos + 6 + len > n) fail(s"truncated page body ($len bytes)")
          val content = UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, pos + 6, pos + 6 + len))
          page += 1
          out += InternalRow(page, TextBlock,
            UTF8String.fromString(page.toString), content,
            0.0, off.toDouble, 0.0, (off + len).toDouble)
          off += len
          pos += 6 + len
        case "IM" =>
          if (pos + 26 > n) fail("truncated image record")
          if (page < 0) fail("image record before any page")
          val id = UTF8String.fromString(ascii(pos + 2, 8))
          def coord(i: Int): Double = ascii(pos + 10 + 4 * i, 4).toDouble
          out += InternalRow(page, Image, id, id,
            coord(0), coord(1), coord(2), coord(3))
          pos += 26
        case other => fail(s"unknown tag '$other'")
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): ParseGft =
    copy(child = c)
}

object ParseGft {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParseGft(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))
}
