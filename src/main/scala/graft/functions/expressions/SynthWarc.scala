package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic `.warc.gz` / `.warc.zst` for a text column — the
  * fixture generator behind the vs_parse_warc oracle: a
  * CommonCrawl-shaped capture with THREE records (warcinfo → request
  * → response), each its own gzip MEMBER or zstd FRAME by a
  * deterministic codec share (the standard per-record layouts —
  * [[Inflate]]'s multi-member / concatenated-frame inflate reassembles the
  * plain WARC either way). The response block is a real HTTP/1.1
  * message whose body is the [[SynthHtml]] page for the text; the
  * target URI derives from the text's md5 so the oracle recomputes
  * it. */
case class SynthWarc(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SynthWarc needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SynthWarc.build(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): SynthWarc =
    copy(child = c)
}

object SynthWarc {
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SynthWarc(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** The capture's CANONICAL page URL (what
    * [[graft.operators.Dedup.canonicalUrl]] recovers from [[rawUriOf]]). */
  private[graft] def uriOf(md5Prefix8: String): String =
    s"http://example.com/${md5Prefix8}"

  /** The MESSY form a real crawler records — uppercase scheme/host,
    * default port, doubled slash, trailing slash, tracking params,
    * fragment. WARC-Target-URI carries this so the crawl-pipeline
    * composition exercises every canonicalization rule on data that
    * flowed through the container (not a synthetic url column). */
  private[graft] def rawUriOf(md5Prefix8: String): String =
    s"HTTP://Example.COM:80//${md5Prefix8}/?utm_source=feed&fbclid=xyz#top"

  private[graft] def build(text: String): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val md5p = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(utf8)).map("%02x".format(_)).mkString.take(8)
    val uri = rawUriOf(md5p)
    def record(headers: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
      val head = ("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" })
        .mkString("", "\r\n", "\r\n") +
        s"Content-Length: ${block.length}\r\n\r\n"
      head.getBytes(iso) ++ block ++ "\r\n\r\n".getBytes(iso)
    }
    val info = record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:md5:$md5p-info>",
      "Content-Type" -> "application/warc-fields"),
      "software: graft-synth\r\n".getBytes(iso))
    val request = record(Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> s"<urn:md5:$md5p-req>",
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=request"),
      s"GET /$md5p HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(iso))
    val page = SynthHtml.build(text)
    // the header declares the page's ACTUAL charset (SynthHtml's
    // share route) — the transport layer a real crawl capture carries
    val cs = SynthHtml.charsetNameOf(SynthHtml.shareOf(text))
    val http = (s"HTTP/1.1 200 OK\r\n" +
      s"Content-Type: text/html; charset=$cs\r\n" +
      s"Content-Length: ${page.length}\r\n\r\n").getBytes(iso) ++ page
    val response = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:md5:$md5p-resp>",
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"), http)
    // codec share (md5 SECOND byte high nibble mod 2 — independent of
    // the charset share): half the captures ship as the standard
    // `.warc.gz` (one gzip member per record), half as `.warc.zst`
    // (one zstd frame per record). Transparent to the parse output —
    // [[Inflate]] reassembles both — so the oracle is share-free; the
    // share exists so the driver gate exercises BOTH decoders.
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(utf8))
    if (((d(1) >> 4) & 0xF) % 2 == 0)
      Inflate.gzip(info) ++ Inflate.gzip(request) ++ Inflate.gzip(response)
    else
      Inflate.zstd(info) ++ Inflate.zstd(request) ++ Inflate.zstd(response)
  }
}
