package graft.functions.expressions

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** Charset detection + decode for MARKUP payloads — the WHATWG
  * "determine the encoding" sniff (HTML spec section 13.2.3.1-2), the
  * missing piece between raw crawl bytes and the tolerant extractor:
  * a meaningful share of real crawl HTML is windows-1252 / Shift_JIS /
  * GBK / EUC-KR, and decoding those as UTF-8 silently replaces every
  * non-ASCII character. Precedence, per the spec:
  *
  *  1. a byte-order mark (UTF-8 / UTF-16LE / UTF-16BE) wins over
  *     everything, including the transport layer;
  *  2. the TRANSPORT hint — an HTTP `Content-Type` value (or a bare
  *     charset name); the WARC path carries this from the capture's
  *     HTTP headers ([[ParseWarc]]);
  *  3. a PRESCAN of the first 1024 bytes for `<meta charset=...>`,
  *     `<meta http-equiv="Content-Type" content="...; charset=...">`
  *     or an XML declaration's `encoding=` (the ASCII-superset scan —
  *     every supported charset is ASCII-transparent in the range the
  *     scan reads);
  *  4. UTF-8 (the modern-web default; this library has no locale to
  *     key the spec's locale-default table off).
  *
  * Spec-mandated label fixups: a META claim of UTF-16 is read as
  * UTF-8 (the claim was found by an ASCII scan, so the bytes are not
  * UTF-16 — spec 13.2.3.2 step 2; the TRANSPORT layer's utf-16 claim
  * is honored as declared, since a BOM-less UTF-16 page with the
  * right Content-Type is real), and `x-user-defined` maps to
  * windows-1252. An unrecognized label falls through to the next
  * stage rather than failing — mislabeled pages are common and a
  * tolerant parse beats dropping the page.
  *
  * Decoding always REPLACES malformed sequences (never throws): a
  * wrong sniff degrades to replacement characters exactly like the
  * pre-charset-aware behavior, it cannot reject a document. */
object CharsetSniff {

  private val Utf8Bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)

  /** `charset=` in a Content-Type-ish string, or a bare label. */
  private val CharsetParam =
    """(?i)charset\s*=\s*["']?\s*([\w.:+\-]+)""".r
  private val MetaCharset =
    """(?i)<meta[^>]*charset\s*=\s*["']?\s*([\w.:+\-]+)""".r
  private val XmlEncoding =
    """(?i)<\?xml[^>]*encoding\s*=\s*["']([\w.:+\-]+)""".r

  /** Resolve a sniffed label to a JDK charset; None = unknown label
    * (fall through). `fromPrescan` applies the spec's meta-only
    * fixup: a UTF-16 claim FOUND BY the ASCII-level prescan cannot be
    * true (the scan read ASCII bytes) and reads as UTF-8 — but the
    * TRANSPORT layer's utf-16 claim is honored as declared (a BOM-less
    * UTF-16 page served with the right Content-Type is real).
    * x-user-defined maps to windows-1252 in both. */
  private[expressions] def resolve(label: String,
      fromPrescan: Boolean = false): Option[Charset] = {
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
    if (l.isEmpty) None
    else if (fromPrescan && (l.startsWith("utf-16") || l.startsWith("utf16")))
      Some(StandardCharsets.UTF_8)
    else if (l == "x-user-defined") Some(Charset.forName("windows-1252"))
    else
      try if (Charset.isSupported(l)) Some(Charset.forName(l)) else None
      catch { case _: Exception => None }
  }

  /** Charset from a transport hint: a full `Content-Type` value
    * (`text/html; charset=shift_jis`) or a bare charset label. A mime
    * with no charset parameter is no hint. */
  private[expressions] def fromTransport(hint: String): Option[Charset] =
    if (hint == null || hint.trim.isEmpty) None
    else CharsetParam.findFirstMatchIn(hint).map(_.group(1)) match {
      case Some(label) => resolve(label)
      case None if !hint.contains('/') => resolve(hint)
      case None => None
    }

  /** Prescan the first 1024 bytes (ISO-8859-1-viewed — the scan only
    * reads ASCII positions) for a meta/XML encoding declaration. */
  private[expressions] def prescan(b: Array[Byte]): Option[Charset] = {
    val head = new String(b, 0, math.min(b.length, 1024),
      StandardCharsets.ISO_8859_1)
    MetaCharset.findFirstMatchIn(head).map(_.group(1))
      .flatMap(resolve(_, fromPrescan = true))
      .orElse(XmlEncoding.findFirstMatchIn(head).map(_.group(1))
        .flatMap(resolve(_, fromPrescan = true)))
  }

  private def startsWith(b: Array[Byte], prefix: Array[Byte]): Boolean =
    b.length >= prefix.length &&
      prefix.indices.forall(i => b(i) == prefix(i))

  private def replacing(cs: Charset, b: Array[Byte], from: Int): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(b, from, b.length - from)).toString
  }

  /** Sniff + decode; `transportHint` may be null (no transport layer,
    * e.g. a file read). The BOM, when present, is consumed — it is an
    * encoding signature, not content. */
  def decode(b: Array[Byte], transportHint: String): String = {
    if (startsWith(b, Utf8Bom))
      replacing(StandardCharsets.UTF_8, b, 3)
    else if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      replacing(StandardCharsets.UTF_16BE, b, 2)
    else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE)
      replacing(StandardCharsets.UTF_16LE, b, 2)
    else {
      val cs = fromTransport(transportHint)
        .orElse(prescan(b))
        .getOrElse(StandardCharsets.UTF_8)
      replacing(cs, b, 0)
    }
  }
}
