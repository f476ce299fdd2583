package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parser for WARC payloads (ISO 28500, the CommonCrawl container —
  * what a 100 TB crawl ingest actually reads): one row per record
  * with its type, target URI, and block; `application/http` response
  * blocks are opened one level further (status line, Content-Type
  * header, body bytes) so the markup parsers consume the body
  * directly. A `.warc.gz` inflates through [[Inflate]] first — the
  * standard layout is one gzip MEMBER per record, which the
  * multi-member inflate concatenates back to a plain WARC.
  *
  * WARC files are machine-written: malformed input (bad magic,
  * missing Content-Length, truncated block) fails LOUDLY like the
  * OPC parsers — tag-soup tolerance belongs to the HTML inside, not
  * the container. Record headers are case-insensitive per the spec;
  * the two CRLFs after each block are consumed tolerantly (some
  * writers emit one).
  *
  * Output: (rec_type, target_uri, status, mime, body) — status/uri
  * null where the record type carries none; mime = the HTTP
  * Content-Type for opened responses, else the record's block
  * Content-Type. */
case class ParseWarc(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(new StructType()
    .add("rec_type", StringType)
    .add("target_uri", StringType)
    .add("status", LongType)
    .add("mime", StringType)
    .add("body", BinaryType))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ParseWarc needs a binary payload, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ParseWarc.parse(input.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(c: Expression): ParseWarc =
    copy(child = c)
}

object ParseWarc {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParseWarc(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"WARC parse: $what")

  /** Header lines as a lowercase-keyed map; returns (headers, offset
    * past the blank line). Header values are ISO-8859-1-decoded (the
    * HTTP convention; URIs are ASCII). */
  private def headersAt(b: Array[Byte], from: Int, what: String)
      : (Map[String, String], Int) = {
    val h = scala.collection.mutable.HashMap.empty[String, String]
    var p = from
    var done = false
    while (!done) {
      var e = p
      while (e < b.length && b(e) != '\n') e += 1
      if (e >= b.length) fail(s"unterminated $what headers")
      val lineEnd = if (e > p && b(e - 1) == '\r') e - 1 else e
      if (lineEnd == p) { done = true; p = e + 1 }
      else {
        val line = new String(b, p, lineEnd - p,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val colon = line.indexOf(':')
        if (colon > 0)
          h.put(line.substring(0, colon).trim
            .toLowerCase(java.util.Locale.ROOT),
            line.substring(colon + 1).trim)
        // a continuation/garbage line without a colon is skipped —
        // header folding is obsolete and rare
        p = e + 1
      }
    }
    (h.toMap, p)
  }

  private[graft] def parse(b: Array[Byte]): Array[Any] = {
    val out = ArrayBuffer.empty[Any]
    var p = 0
    // leading CRLFs between records (and a BOM-less clean start)
    def skipCrlf(): Unit =
      while (p < b.length && (b(p) == '\r' || b(p) == '\n')) p += 1
    skipCrlf()
    while (p < b.length) {
      if (!(p + 5 <= b.length &&
          new String(b, p, 5, java.nio.charset.StandardCharsets.ISO_8859_1) == "WARC/"))
        fail(f"record at offset $p does not start with WARC/ magic")
      val (hdr, bodyAt) = headersAt(b, p, "WARC")
      val len = hdr.getOrElse("content-length",
        fail(s"record at offset $p has no Content-Length")).toLong
      if (bodyAt + len > b.length)
        fail(s"record at offset $p declares $len block bytes past end of file")
      val block = java.util.Arrays.copyOfRange(b, bodyAt, (bodyAt + len).toInt)
      val recType = hdr.getOrElse("warc-type", "unknown")
      val uri = hdr.get("warc-target-uri").orNull
      val blockType = hdr.getOrElse("content-type", "")
      // open application/http responses one level: status + headers
      val isHttp = blockType.startsWith("application/http") &&
        block.length >= 5 && new String(block, 0, 5,
          java.nio.charset.StandardCharsets.ISO_8859_1) == "HTTP/"
      // no type patterns in the destructure: `x: Any` never matches
      // the null status of a non-HTTP record
      val (status, mime, body) =
        if (!isHttp) (null: Any, blockType, block)
        else {
          var e = 0
          while (e < block.length && block(e) != '\n') e += 1
          val statusLine = new String(block, 0, e,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val code = """HTTP/\S+\s+(\d{3})""".r.findFirstMatchIn(statusLine)
            .map(_.group(1).toLong)
            .getOrElse(fail(s"unparseable HTTP status line '$statusLine'"))
          val (hh, hb) = headersAt(block, e + 1, "HTTP")
          (code, hh.getOrElse("content-type", ""),
            java.util.Arrays.copyOfRange(block, hb, block.length))
        }
      out += InternalRow(
        UTF8String.fromString(recType),
        if (uri == null) null else UTF8String.fromString(uri),
        status,
        UTF8String.fromString(mime),
        body)
      p = bodyAt + len.toInt
      skipCrlf() // the record-terminating CRLFCRLF, tolerantly
    }
    out.toArray
  }
}
