package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass parser for REAL PDF payloads — the production half of
  * the binary-ingest seam [[ParseGft]] stubs with a synthetic
  * container (reference: embed_pdf, vector_db.py:247-343, which walks
  * pages for text blocks with bboxes and embedded images by xref).
  *
  * This is a from-scratch reader of the public PDF grammar
  * (ISO 32000), deliberately scoped to the "simple document" subset a
  * text-extraction pipeline actually meets, with LOUD failures outside
  * it:
  *
  *  - objects are recovered by a linear `N G obj … endobj` scan (no
  *    xref table needed — damaged/streamless xrefs are the most common
  *    real-world breakage; the trailer is still used to FIND the
  *    catalog when present), then /Type /ObjStm object streams expand
  *    inline — the PDF 1.5+ layout where writers pack the catalog,
  *    pages and fonts into one compressed container (§7.5.7);
  *  - streams decode raw or through a declared filter CHAIN of
  *    /FlateDecode (java.util.zip), /LZWDecode (both /EarlyChange
  *    timings), /ASCII85Decode, /ASCIIHexDecode, /RunLengthDecode —
  *    all from-scratch readers of the public ISO 32000 §7.4
  *    algorithms, zero new dependencies; /DecodeParms /Predictor row
  *    filtering is undone (PNG 10-15 per RFC 2083, TIFF 2 at 8-bit);
  *    any other filter or predictor shape fails loudly by name;
  *  - encrypted documents (standard security handler §7.6.3) decrypt
  *    when the USER password is empty — the owner-locked shape almost
  *    every encrypted crawl PDF has — or matches the caller-supplied
  *    `password` (tried after empty; Latin-1 §7.6.3.3 padding for
  *    /R ≤ 4, UTF-8 for /V 5): /V 1/2 RC4 40-128, /V 4 with
  *    /CFM /V2 (RC4) or /AESV2 (AES-128-CBC via javax.crypto), and
  *    /V 5 AES-256 (/R 5 legacy SHA-256 and /R 6 ISO 32000-2 hardened
  *    hash, /UE key unwrap, /Perms round-trip check); any other
  *    user password fails loudly against /U rather than emitting
  *    garbage;
  *  - page order comes from walking /Root → /Pages → /Kids (the
  *    document's declared order, not file order);
  *  - content streams are tokenized per the real syntax: literal
  *    strings with the full escape set (\n \r \t \b \f \( \) \\,
  *    octal, line continuations), hex strings, names, arrays,
  *    numbers; text shows via Tj / ' / " / TJ inside BT…ET blocks
  *    with Tm/Td/TD/T* line tracking, one output row per BT…ET block
  *    (content_id = per-page block index, PyMuPDF's get_text("blocks")
  *    numbering); string bytes decode as Latin-1 for standard simple
  *    fonts, and composite Identity-H fonts (what real writers emit
  *    for non-Latin and subset-embedded text) decode their 2-byte
  *    CIDs through the font's embedded /ToUnicode CMap
  *    (bfchar/bfrange, §9.10.3) selected per text run via Tf, or —
  *    when no /ToUnicode ships — through the embedded TrueType
  *    program's own cmap table inverted (CID → GID via /CIDToGIDMap,
  *    GID → Unicode via [[TrueTypeCmap]]); Identity-V decodes the
  *    same way (vertical mode shapes layout, not content); the
  *    predefined UCS2 registry family (UniJIS-UCS2-H/V + HW, UniGB/
  *    UniCNS/UniKS-UCS2) decodes codes as UTF-16BE (their codes ARE
  *    UCS-2 — what CJK crawl PDFs carry), the BYTE-ORIENTED registry
  *    family (GBK-EUC, 90ms-RKSJ, ETen-B5, EUC, KSC/KSCms-UHC, …)
  *    decodes codes as their legacy charset's bytes through the JDK
  *    charsets — same no-registry-files trick — and embedded
  *    CMap-stream encodings resolve cidchar/cidrange (+Identity
  *    usecmap base) through the font's own tables; the pre-Unicode
  *    JIS orderings (H/V/Add/Ext via x-JIS0208, 83pv/90pv-RKSJ via
  *    Shift-JIS) decode too, and the raw 94×94 Korean/Chinese
  *    orderings (KSC-H/V, GB-H/V) offset-decode through EUC-KR /
  *    EUC-CN (codes = EUC bytes minus the high bit); Johab and the
  *    post-2000 ordering names fail loudly;
  *  - the block bbox anchors at the block's first text origin with a
  *    deterministic Helvetica-ish extent estimate (x1 = x0 +
  *    0.5·size·chars, y1 = y0 + size) — real layout analysis is a
  *    rasterizer's job, the anchor is exact;
  *  - images: `/Name Do` resolves through /Resources → /XObject to a
  *    /Subtype /Image object; content_id is the image's OBJECT NUMBER
  *    (the reference's xref id), content_raw the base64 of the
  *    embedded stream bytes (DCT streams ARE the JPEG file), and the
  *    bbox is the unit square through the current CTM (q/Q stack +
  *    `cm` composition tracked exactly).
  *
  * Output schema = [[ParseGft]]'s:
  * (page_num, content_type, content_id, content_raw, x0, y0, x1, y1).
  */
case class ParsePdf(child: Expression, password: String = "")
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(new StructType()
    .add("page_num", LongType)
    .add("content_type", StringType)
    .add("content_id", StringType)
    .add("content_raw", StringType)
    .add("x0", DoubleType).add("y0", DoubleType)
    .add("x1", DoubleType).add("y1", DoubleType))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ParsePdf needs a binary payload, got ${child.dataType.catalogString}")

  private val TextBlock = UTF8String.fromString("text_block")
  private val Image = UTF8String.fromString("image")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val doc = ParsePdf.parseObjects(bytes, password)
    val pages = ParsePdf.pageOrder(doc)
    val out = ArrayBuffer.empty[Any]
    // per-DOCUMENT font-table memo: pages routinely share fonts, and
    // the embedded-font fallback inflates + inverts a whole TrueType
    // program — O(font) once, not O(pages × font)
    val fontCache =
      new java.util.HashMap[Integer, (ParsePdf.FontMode, ParsePdf.FontWidths)]()
    pages.zipWithIndex.foreach { case (pageObj, pageIdx) =>
      val pageDict = doc(pageObj)._1
      val content = ParsePdf.contentsOf(doc, pageDict)
      val xobjects = ParsePdf.xobjectsOf(doc, pageDict)
      val fonts = ParsePdf.fontsOf(doc, pageDict, fontCache)
      var blockIdx = 0
      ParsePdf.interpret(content, xobjects, fonts, doc,
        onText = (text, x0, y0, x1, y1) => {
          val t = text.trim
          if (t.nonEmpty) {
            out += InternalRow(pageIdx.toLong, TextBlock,
              UTF8String.fromString(blockIdx.toString),
              UTF8String.fromString(t), x0, y0, x1, y1)
            blockIdx += 1
          }
        },
        onImage = (objNum, raw, x0, y0, x1, y1) => {
          out += InternalRow(pageIdx.toLong, Image,
            UTF8String.fromString(objNum.toString),
            UTF8String.fromString(
              java.util.Base64.getEncoder.encodeToString(raw)),
            x0, y0, x1, y1)
        })
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): ParsePdf =
    copy(child = c)
}

object ParsePdf {
  def apply(payload: Column): Column = apply(payload, "")

  /** Column form with a candidate USER password for encrypted
    * documents (the "enterprise dump with a known password" shape):
    * the empty password is always tried first, then this one. */
  def apply(payload: Column, password: String): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParsePdf(org.apache.spark.sql.graft.ColumnBridge.expression(payload),
        password))

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"PDF parse: $what")

  /** Latin-1 view of the byte range (PDF's structural tokens are all
    * Latin-1-safe; string CONTENT decoding also uses Latin-1 per the
    * simple-font scope note). */
  private def latin1(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** objNum → (dictionary source, optional raw stream bytes). Linear
    * recovery scan; stream extents come from /Length when it is a
    * direct integer, else from the next `endstream`. */
  private[expressions] def parseObjects(bytes: Array[Byte],
      password: String = "")
      : Map[Int, (String, Option[Array[Byte]])] = {
    val src = latin1(bytes, 0, bytes.length)
    // offset-based Matcher.find — no per-object tail copies (a 10 MB /
    // 5k-object file would otherwise allocate the remaining file once
    // PER object)
    val objM = java.util.regex.Pattern
      .compile("""(\d+)\s+\d+\s+obj\b""", java.util.regex.Pattern.DOTALL)
      .matcher(src)
    val out = scala.collection.mutable.Map.empty[Int, (String, Option[Array[Byte]])]
    var searchFrom = 0
    while (searchFrom < src.length && objM.find(searchFrom)) {
      val objNum = objM.group(1).toInt
      val bodyStart = objM.end
      val streamKw = src.indexOf("stream", bodyStart)
      val endobj = src.indexOf("endobj", bodyStart)
      if (endobj < 0) fail(s"object $objNum has no endobj")
      if (streamKw >= 0 && streamKw < endobj) {
        val dict = src.substring(bodyStart, streamKw)
        // data begins after the EOL that must follow `stream`
        var dataStart = streamKw + "stream".length
        if (dataStart < src.length && src.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < src.length && src.charAt(dataStart) == '\n') dataStart += 1
        // possessive (\d++): an INDIRECT length (`/Length 123 0 R`)
        // must not backtrack into a bogus direct match (123 → 12
        // would silently truncate the stream); it falls through to
        // the endstream scan instead
        val len = """/Length\s+(\d++)(?!\s+\d+\s+R)""".r
          .findFirstMatchIn(dict).map(_.group(1).toInt)
        val dataEnd = len match {
          case Some(l) if dataStart + l <= bytes.length => dataStart + l
          case _ =>
            val e = src.indexOf("endstream", dataStart)
            if (e < 0) fail(s"object $objNum stream has no endstream")
            // strip the EOL preceding endstream
            var ee = e
            if (ee > dataStart && src.charAt(ee - 1) == '\n') ee -= 1
            if (ee > dataStart && src.charAt(ee - 1) == '\r') ee -= 1
            ee
        }
        out(objNum) = (dict,
          Some(java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)))
        searchFrom = math.max(src.indexOf("endobj", dataEnd), dataEnd) + 1
      } else {
        out(objNum) = (src.substring(bodyStart, endobj), None)
        searchFrom = endobj + "endobj".length
      }
    }
    if (out.isEmpty) fail("no objects found (not a PDF or fully unsupported layout)")
    expandObjectStreams(decryptIfNeeded(src, out.toMap, password))
  }

  /** Inline the objects packed in /Type /ObjStm containers (ISO 32000
    * §7.5.7 — where PDF 1.5+ writers put most non-stream objects, so a
    * linear scan alone would miss the catalog, pages, fonts): the
    * decoded stream holds /N whitespace-separated (objnum, offset)
    * pairs, then the object bodies from /First on. Contained objects
    * are dict/array/primitive only (the spec forbids streams inside),
    * and a top-level object with the same number WINS (incremental
    * updates supersede packed objects). Runs after decryption —
    * /ObjStm containers are encrypted like any stream, their contents
    * are not re-encrypted. */
  private def expandObjectStreams(
      doc: Map[Int, (String, Option[Array[Byte]])])
      : Map[Int, (String, Option[Array[Byte]])] = {
    val containers = doc.toSeq.filter { case (_, (dict, data)) =>
      data.isDefined && dict.contains("/ObjStm") &&
        """/Type\s*/ObjStm""".r.findFirstIn(dict).isDefined
    }.sortBy(_._1)
    if (containers.isEmpty) return doc
    val packed = scala.collection.mutable.Map.empty[Int, (String, Option[Array[Byte]])]
    containers.foreach { case (num, (dict, _)) =>
      val n = """/N\s+(\d+)""".r.findFirstMatchIn(dict)
        .map(_.group(1).toInt).getOrElse(fail(s"ObjStm $num has no /N"))
      val first = """/First\s+(\d+)""".r.findFirstMatchIn(dict)
        .map(_.group(1).toInt).getOrElse(fail(s"ObjStm $num has no /First"))
      val body = streamOf(doc, num)
      val text = latin1(body, 0, body.length)
      val header = text.take(first)
      val nums = """\d+""".r.findAllIn(header).map(_.toInt).toSeq
      if (nums.length < 2 * n)
        fail(s"ObjStm $num header has ${nums.length} ints for /N $n pairs")
      val pairs = nums.take(2 * n).grouped(2).map(p => (p(0), p(1))).toSeq
      pairs.zipWithIndex.foreach { case ((objNum, off), i) =>
        val start = first + off
        val end =
          if (i + 1 < pairs.length) first + pairs(i + 1)._2 else text.length
        if (start > end || end > text.length)
          fail(s"ObjStm $num offsets out of order at object $objNum")
        packed(objNum) = (text.substring(start, end), None)
      }
    }
    // top-level definitions win over packed ones
    packed.toMap ++ doc
  }

  // ─────────── standard security handler (ISO 32000 §7.6.3) ───────────

  /** The 32-byte password pad (§7.6.3.3 Table 3). */
  private val PdfPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(s"SHA-$bits")
    parts.foreach(d.update)
    d.digest()
  }

  /** ISO 32000-2 Algorithm 2.B — the R6 hardened hash for the USER
    * password (no udata in the user form): iterate SHA-256/384/512
    * over AES-128-CBC encryptions of 64 repetitions of pwd ‖ K until
    * ≥ 64 rounds AND the last cipher byte ≤ round − 32. The 64×
    * repetition keeps the block length a multiple of 16 for any
    * password length. */
  private def hardenedHash(pwd: Array[Byte], salt: Array[Byte]): Array[Byte] = {
    var k = sha(256, pwd, salt) // SHA-256(pwd ‖ salt)
    var round = 0
    var e: Array[Byte] = Array.emptyByteArray
    while (round < 64 || (e(e.length - 1) & 0xFF) > round - 32) {
      val unit = pwd ++ k // (pwd ‖ K ‖ udata) with no udata
      val k1 = new Array[Byte](unit.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(unit, 0, k1, i * unit.length, unit.length); i += 1 }
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      e = c.doFinal(k1)
      var s = 0; var j = 0
      while (j < 16) { s += e(j) & 0xFF; j += 1 }
      k = sha(s % 3 match { case 0 => 256; case 1 => 384; case _ => 512 }, e)
      round += 1
    }
    k.take(32)
  }

  /** RC4 (public stream cipher, symmetric — decrypt == encrypt). */
  private[expressions] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xFF
      j = (j + s(i)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  /** The dict text with everything below the top nesting level of its
    * first `<< >>` blanked to spaces — nested subdictionary bodies and
    * literal/hex string CONTENTS (value-opening delimiters kept) — so
    * a key lookup can never match bytes inside a string value (e.g. a
    * '/U' sequence among the /O entry's random bytes) or a
    * subdictionary entry (e.g. the /CF crypt filter's /Length, which
    * is a key size in BYTES, not the top-level bits value). Offsets
    * align with the input, so values are parsed from the original. */
  private[graft] def topLevelView(s: String): String = {
    val out = new Array[Char](s.length)
    java.util.Arrays.fill(out, ' ')
    var i = 0
    var depth = 0
    def keep(p: Int): Unit = if (depth == 1) out(p) = s.charAt(p)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') {
        keep(i); i += 1
        var d = 1
        while (i < s.length && d > 0) {
          val ch = s.charAt(i)
          if (ch == '\\') i += 1
          else if (ch == '(') d += 1
          else if (ch == ')') { d -= 1; if (d == 0) keep(i) }
          i += 1
        }
      } else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') {
        depth += 1; i += 2
      } else if (c == '>' && i + 1 < s.length && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
      } else if (c == '<') {
        keep(i); i += 1
        while (i < s.length && s.charAt(i) != '>') i += 1
        if (i < s.length) { keep(i); i += 1 }
      } else {
        keep(i); i += 1
      }
    }
    new String(out)
  }

  /** A PDF string VALUE's bytes from a dict: hex `<…>` or literal
    * `(…)` with the escape set — the /O and /U entries arrive in
    * either form depending on the writer. The KEY is located in the
    * top-level view (never inside another value or a subdict); the
    * value bytes are parsed from the original text. */
  private def stringValueOf(dict: String, key: String): Option[Array[Byte]] = {
    val view = topLevelView(dict)
    // the first occurrence of `key` NOT a prefix of a longer name
    // (/O must not match inside /OE) and followed by a string value
    var at = view.indexOf(key)
    while (at >= 0 && at + key.length < view.length &&
        (view.charAt(at + key.length).isLetterOrDigit ||
          view.charAt(at + key.length) == '/'))
      at = view.indexOf(key, at + 1)
    if (at < 0) return None
    var p = at + key.length
    while (p < dict.length && dict.charAt(p).isWhitespace) p += 1
    if (p >= dict.length) return None
    dict.charAt(p) match {
      case '<' =>
        val e = dict.indexOf('>', p)
        if (e < 0) fail(s"unterminated hex string after $key")
        val hex0 = dict.substring(p + 1, e).filterNot(_.isWhitespace)
        val hex = if (hex0.length % 2 == 1) hex0 + "0" else hex0
        Some(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      case '(' =>
        val out = new java.io.ByteArrayOutputStream()
        var depth = 1
        p += 1
        while (p < dict.length && depth > 0) {
          dict.charAt(p) match {
            case '\\' if p + 1 < dict.length =>
              p += 1
              dict.charAt(p) match {
                case 'n' => out.write('\n')
                case 'r' => out.write('\r')
                case 't' => out.write('\t')
                case 'b' => out.write('\b')
                case 'f' => out.write('\f')
                case c @ ('(' | ')' | '\\') => out.write(c)
                case c if c >= '0' && c <= '7' =>
                  var oct = c - '0'
                  var n = 1
                  while (n < 3 && p + 1 < dict.length &&
                      dict.charAt(p + 1) >= '0' && dict.charAt(p + 1) <= '7') {
                    p += 1; oct = oct * 8 + (dict.charAt(p) - '0'); n += 1
                  }
                  out.write(oct & 0xFF)
                case c => out.write(c) // spec: lone backslash drops
              }
            case '(' => depth += 1; out.write('(')
            case ')' =>
              depth -= 1
              if (depth > 0) out.write(')')
            case c => out.write(c)
          }
          p += 1
        }
        if (depth != 0) fail(s"unterminated literal string after $key")
        Some(out.toByteArray)
      case _ => None
    }
  }

  /** Decrypt every stream in an encrypted document (standard security
    * handler): the EMPTY user password — the owner-locked-but-openable
    * shape almost every encrypted PDF in a crawl has — is tried first,
    * then the caller's `password`. /V 1/2 = RC4 (40–128 bit), /V 4
    * with /CFM /V2 = RC4 or /AESV2 = AES-128-CBC, /V 5 = AES-256 with
    * /R 5 (SHA-256) or /R 6 (hardened-hash) key derivation and the
    * /UE unwrap (javax.crypto, JDK-only). A user password matching
    * neither candidate fails loudly against /U (algorithm 4/5, or 11
    * for /V 5) — there is no text to extract without the password,
    * and guessing silently would emit garbage.
    * Scope: strings inside object DICTS stay encrypted (this reader
    * extracts text from content/CMap STREAMS only); object generation
    * assumed 0 (the linear-recovery scanner's existing rule). */
  private def decryptIfNeeded(src: String,
      doc: Map[Int, (String, Option[Array[Byte]])],
      password: String)
      : Map[Int, (String, Option[Array[Byte]])] = {
    // last match wins — incremental updates append a newer trailer
    val encRef = """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(src)
      .toSeq.lastOption.map(_.group(1).toInt)
    if (encRef.isEmpty) return doc
    val encNum = encRef.get
    val (enc, _) = doc.getOrElse(encNum, fail(s"missing /Encrypt object $encNum"))
    // scalar lookups go through the top-level view: a /CF crypt-filter
    // subdict carries its own /Length (key BYTES, e.g. 16) that a flat
    // regex could hit before the top-level bits value (e.g. 128)
    val encTop = topLevelView(enc)
    """/Filter\s*/(\w+)""".r.findFirstMatchIn(encTop).map(_.group(1)) match {
      case Some("Standard") => ()
      case f => fail(s"unsupported security handler /${f.getOrElse("?")}")
    }
    def intOf(key: String, dflt: Int): Int =
      (java.util.regex.Pattern.quote(key) + """\s+(-?\d+)""").r
        .findFirstMatchIn(encTop).map(_.group(1).toInt).getOrElse(dflt)
    val v = intOf("/V", 0)
    val r = intOf("/R", 2)
    val lengthBits = intOf("/Length", 40)
    val p = intOf("/P", -1)
    val aes = v match {
      case 1 | 2 => false
      case 4 =>
        """/CFM\s*/(\w+)""".r.findFirstMatchIn(enc).map(_.group(1)) match {
          case Some("AESV2") => true
          case Some("V2") => false
          case m => fail(s"unsupported crypt filter method /${m.getOrElse("?")}")
        }
      case 5 =>
        """/CFM\s*/(\w+)""".r.findFirstMatchIn(enc).map(_.group(1)) match {
          case Some("AESV3") | None => true
          case Some(m) => fail(s"unsupported crypt filter method /$m for /V 5")
        }
      case other => fail(s"unsupported encryption version /V $other (R $r)")
    }
    val o = stringValueOf(enc, "/O").getOrElse(fail("/Encrypt has no /O"))
    val u = stringValueOf(enc, "/U").getOrElse(fail("/Encrypt has no /U"))
    // hoisted above key derivation: /EncryptMetadata false changes the
    // FILE KEY for R >= 4 (Algorithm 2 step f), not just stream exemption
    val metaPlain =
      """/EncryptMetadata\s+false""".r.findFirstIn(encTop).isDefined
    val fileKey: Array[Byte] = if (v == 5) {
      // AES-256 (ISO 32000-2 §7.6.4): /U = hash(32) ‖ validation
      // salt(8) ‖ key salt(8); Algorithm 11 validates the empty user
      // password, Algorithm 2.A step f unwraps /UE into the file key.
      // R5 is the deprecated single-SHA-256 form, R6 the hardened hash.
      if (r != 5 && r != 6) fail(s"unsupported revision /R $r for /V 5")
      if (u.length < 48) fail(s"/V 5 /U entry is ${u.length} bytes (need 48)")
      val vSalt = u.slice(32, 40)
      val kSalt = u.slice(40, 48)
      // candidate order: the empty password first (the owner-locked
      // crawl shape), then the caller's password — UTF-8 per ISO
      // 32000-2 (SASLprep is the identity on the ASCII passwords in
      // scope here)
      val cands = Array.emptyByteArray +:
        (if (password.nonEmpty)
          Seq(password.getBytes(java.nio.charset.StandardCharsets.UTF_8))
         else Seq.empty)
      val pwd = cands.find { c =>
        val hash = if (r == 5) sha(256, c, vSalt) else hardenedHash(c, vSalt)
        java.util.Arrays.equals(hash, u.take(32))
      }.getOrElse(fail(if (password.isEmpty)
        "encrypted PDF: non-empty user password (cannot decrypt)"
      else "encrypted PDF: the supplied user password does not match /U"))
      val ue = stringValueOf(enc, "/UE").getOrElse(fail("/V 5 /Encrypt has no /UE"))
      if (ue.length != 32) fail(s"/V 5 /UE entry is ${ue.length} bytes (need 32)")
      val inter = if (r == 5) sha(256, pwd, kSalt) else hardenedHash(pwd, kSalt)
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(inter, "AES"),
        new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
      val k = c.doFinal(ue)
      // /Perms proves the unwrapped key end-to-end: AES-ECB plaintext
      // carries /P little-endian in bytes 0-3 and "adb" in bytes 9-11
      stringValueOf(enc, "/Perms").foreach { pm =>
        if (pm.length != 16) fail(s"/V 5 /Perms entry is ${pm.length} bytes (need 16)")
        val e = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
        e.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(k, "AES"))
        val perms = e.doFinal(pm)
        if (perms(9) != 'a'.toByte || perms(10) != 'd'.toByte ||
            perms(11) != 'b'.toByte)
          fail("/V 5 /Perms does not decrypt to the adb marker (wrong key)")
        val pGot = (perms(0) & 0xFF) | ((perms(1) & 0xFF) << 8) |
          ((perms(2) & 0xFF) << 16) | ((perms(3) & 0xFF) << 24)
        if (pGot != p) fail(s"/V 5 /Perms encodes /P $pGot but the dict says $p")
      }
      k
    } else {
      val id = """/ID\s*\[\s*<([0-9A-Fa-f]+)>""".r.findFirstMatchIn(src)
        .map(_.group(1)).map(h => h.grouped(2)
          .map(Integer.parseInt(_, 16).toByte).toArray)
        .getOrElse(fail("encrypted PDF without a hex /ID (key underivable)"))
      val keyLen = if (v == 1) 5 else math.max(5, math.min(16, lengthBits / 8))
      // Algorithm 2 over the padded password (§7.6.3.3 Table 3 — the
      // bare pad constant for the empty password, else password bytes
      // in Latin-1 with the pad appended, truncated to 32); step f:
      // when /R >= 4 and /EncryptMetadata is false, 0xFFFFFFFF joins
      // the MD5 input after /ID — omitting it derives the wrong key
      // for owner-locked R4 documents with plaintext metadata and
      // misreports them as password-protected
      val pLe = Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte,
        (p >> 24).toByte)
      def keyFor(pwdPad: Array[Byte]): Array[Byte] = {
        var h =
          if (r >= 4 && metaPlain)
            md5(pwdPad, o.take(32), pLe, id, Array[Byte](-1, -1, -1, -1))
          else md5(pwdPad, o.take(32), pLe, id)
        if (r >= 3) {
          var i = 0
          while (i < 50) { h = md5(h.take(keyLen)); i += 1 }
        }
        h.take(keyLen)
      }
      // Algorithm 4 (R2) / 5 (R≥3): does this key open the document?
      // (both sides of the check hash the PAD CONSTANT, never the
      // candidate password — only the key derivation varies)
      def uOk(key: Array[Byte]): Boolean =
        if (r == 2) java.util.Arrays.equals(rc4(key, PdfPad), u.take(32))
        else {
          var t = md5(PdfPad, id)
          var i = 0
          while (i < 20) {
            t = rc4(key.map(b => (b ^ i).toByte), t)
            i += 1
          }
          java.util.Arrays.equals(t.take(16), u.take(16))
        }
      val cands = PdfPad +:
        (if (password.nonEmpty)
          Seq((password.getBytes(
            java.nio.charset.StandardCharsets.ISO_8859_1) ++ PdfPad).take(32))
         else Seq.empty)
      cands.map(keyFor).find(uOk).getOrElse(fail(if (password.isEmpty)
        "encrypted PDF: non-empty user password (cannot decrypt)"
      else "encrypted PDF: the supplied user password does not match /U"))
    }
    def objKey(num: Int): Array[Byte] =
      if (v == 5) fileKey // AES-256 uses the file key directly (§7.6.4)
      else {
        val ext = Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte,
          0, 0) // generation 0, low 2 bytes
        val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) // "sAlT"
                   else Array.emptyByteArray
        md5(fileKey, ext, salt).take(math.min(fileKey.length + 5, 16))
      }
    def decryptBytes(num: Int, data: Array[Byte]): Array[Byte] =
      if (!aes) rc4(objKey(num), data)
      else {
        if (data.length < 16 || (data.length - 16) % 16 != 0)
          fail(s"AES stream in object $num is not IV + whole blocks")
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(objKey(num), "AES"),
          new javax.crypto.spec.IvParameterSpec(data.take(16)))
        val plain = c.doFinal(data, 16, data.length - 16)
        val padN = plain.last & 0xFF
        if (padN < 1 || padN > 16 || padN > plain.length)
          fail(s"AES stream in object $num has corrupt padding")
        plain.dropRight(padN)
      }
    // §7.5.8.2: cross-reference streams are NEVER encrypted (the xref
    // must be readable before the /Encrypt dict is found); likewise
    // /Metadata streams when /EncryptMetadata is false (hoisted above).
    def exempt(dict: String): Boolean =
      """/Type\s*/XRef\b""".r.findFirstIn(dict).isDefined ||
        (metaPlain && """/Type\s*/Metadata\b""".r.findFirstIn(dict).isDefined)
    doc.map {
      case (num, (dict, Some(data))) if num != encNum && !exempt(dict) =>
        num -> (dict, Some(decryptBytes(num, data)))
      case other => other
    }
  }

  /** The stream's filter NAMES — handles the direct form
    * (`/Filter /FlateDecode`), the ARRAY form
    * (`/Filter [/FlateDecode]`, what real writers emit even for a
    * single filter), and an INDIRECT reference (`/Filter 7 0 R`,
    * spec-legal) resolved through the object map; any shape this
    * cannot name would otherwise return compressed bytes RAW and emit
    * garbage silently — the one failure mode worse than failing. */
  private def filtersOf(doc: Map[Int, (String, Option[Array[Byte]])],
      dict: String): Seq[String] = {
    val resolved = """/Filter\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(dict) match {
      case Some(m) =>
        doc.get(m.group(1).toInt).map(_._1)
          .getOrElse(fail(s"missing indirect /Filter object ${m.group(1)}"))
      case None =>
        """/Filter\s*(\[[^\]]*\]|/\w+)""".r.findFirstMatchIn(dict)
          .map(_.group(1)).getOrElse("")
    }
    """/(\w+)""".r.findAllMatchIn(resolved).map(_.group(1)).toSeq
  }

  /** The decodable filter set: the standard non-image codecs a text
    * pipeline meets (ISO 32000 §7.4). Image codecs (DCT/JPX/CCITT/JBIG2)
    * stay opaque by design — their streams ARE the embedded files. */
  private val Decodable: Set[String] = Set("FlateDecode", "LZWDecode",
    "ASCII85Decode", "ASCIIHexDecode", "RunLengthDecode")

  /** Per-filter /DecodeParms dict text, POSITIONALLY aligned with the
    * filter chain (ISO 32000 §7.4.1 Table 5; None = null/absent
    * entry). The array form maps index-for-index; the single-dict
    * form binds to the chain's ONE predictor-capable (Flate/LZW)
    * stage — with two such stages the binding is ambiguous, and this
    * fails loudly by object number instead of guessing (a wrong guess
    * corrupts silently whenever the row-shape check happens to pass).
    * The key is located in [[topLevelView]] (offset-aligned) so a
    * nested dict's own /DecodeParms can never bind here. */
  private[graft] def decodeParmsOf(dict: String, filters: Seq[String],
      objNum: Int): Seq[Option[String]] = {
    val none: Seq[Option[String]] = Seq.fill(filters.length)(None)
    val view = topLevelView(dict)
    val at = """/DecodeParms(?![A-Za-z])""".r.findFirstMatchIn(view)
      .map(_.start).getOrElse(return none)
    var p = at + "/DecodeParms".length
    while (p < dict.length && dict.charAt(p).isWhitespace) p += 1
    if (p >= dict.length) return none
    // one balanced << … >> starting at q0 → (its text, end offset)
    def dictAt(q0: Int): (String, Int) = {
      var q = q0 + 2
      var depth = 1
      while (q < dict.length && depth > 0) {
        if (dict.startsWith("<<", q)) { depth += 1; q += 2 }
        else if (dict.startsWith(">>", q)) { depth -= 1; q += 2 }
        else q += 1
      }
      if (depth != 0) fail(s"unterminated /DecodeParms dict in object $objNum")
      (dict.substring(q0, q), q)
    }
    def bindSingle(d: String): Seq[Option[String]] = {
      val capable = filters.zipWithIndex.collect {
        case (f, i) if f == "FlateDecode" || f == "LZWDecode" => i
      }
      capable match {
        case Seq(i) => none.updated(i, Some(d))
        case Seq()  => none // parms for a stage with no predictor semantics
        case _ => fail(s"single /DecodeParms dict over ${capable.length} " +
          s"Flate/LZW stages in object $objNum (ambiguous binding)")
      }
    }
    if (dict.startsWith("null", p)) none
    else if (dict.startsWith("<<", p)) bindSingle(dictAt(p)._1)
    else if (dict.charAt(p) == '[') {
      val out = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
      var q = p + 1
      var done = false
      while (!done) {
        while (q < dict.length && dict.charAt(q).isWhitespace) q += 1
        if (q >= dict.length)
          fail(s"unterminated /DecodeParms array in object $objNum")
        else if (dict.charAt(q) == ']') done = true
        else if (dict.startsWith("null", q)) { out += None; q += 4 }
        else if (dict.startsWith("<<", q)) {
          val (d, e) = dictAt(q); out += Some(d); q = e
        } else fail(s"unsupported /DecodeParms array element in object $objNum")
      }
      filters.indices.map(i => out.lift(i).flatten)
    } else fail(s"indirect or malformed /DecodeParms in object $objNum")
  }

  /** Apply a filter CHAIN in declaration order. Each stage reads ITS
    * OWN /DecodeParms entry ([[decodeParmsOf]]) — /Predictor row
    * filtering (PNG predictors 10-15 and TIFF 2, what real writers
    * wrap xref streams and rasters in) and LZW /EarlyChange are undone
    * right after the one Flate/LZW stage they belong to, never
    * re-applied after every stage of a multi-stage chain; predictor
    * shapes this cannot undo fail loudly rather than emitting
    * scrambled text. */
  private def applyFilters(raw: Array[Byte], filters: Seq[String],
      dict: String, objNum: Int): Array[Byte] = {
    val parms = decodeParmsOf(dict, filters, objNum)
    filters.zip(parms).foldLeft(raw) { case (data, (f, pd)) =>
      def parm(key: String, dflt: Int): Int =
        pd.flatMap(d => ("/" + key + """\s+(\d+)""").r.findFirstMatchIn(d)
          .map(_.group(1).toInt)).getOrElse(dflt)
      def postPredict(out: Array[Byte]): Array[Byte] = {
        val predictor = parm("Predictor", 1)
        if (predictor <= 1) out
        else unpredict(out, predictor, parm("Colors", 1),
          parm("BitsPerComponent", 8), parm("Columns", 1), objNum)
      }
      f match {
        case "FlateDecode" => postPredict(inflate(data))
        case "LZWDecode" => postPredict(lzwDecode(data, parm("EarlyChange", 1)))
        case "ASCII85Decode" => ascii85Decode(data)
        case "ASCIIHexDecode" => asciiHexDecode(data)
        case "RunLengthDecode" => runLengthDecode(data)
        case other => fail(s"unsupported stream filter /$other in object $objNum")
      }
    }
  }

  /** Undo /Predictor row filtering (ISO 32000 §7.4.4.4): 2 = TIFF
    * horizontal differencing (8-bit components), 10-15 = PNG per-row
    * filters (RFC 2083 §6 — None/Sub/Up/Average/Paeth; the leading
    * filter-type byte of each row picks the filter, so all five decode
    * regardless of the declared predictor number). */
  private[expressions] def unpredict(data: Array[Byte], predictor: Int,
      colors: Int, bpc: Int, columns: Int, objNum: Int): Array[Byte] = {
    if (predictor == 2) {
      if (bpc != 8)
        fail(s"TIFF predictor with /BitsPerComponent $bpc in object $objNum")
      val out = data.clone()
      val rowLen = colors * columns
      if (rowLen <= 0 || out.length % rowLen != 0)
        fail(s"TIFF predictor row shape mismatch in object $objNum")
      var r = 0
      while (r * rowLen < out.length) {
        var i = r * rowLen + colors
        val end = (r + 1) * rowLen
        while (i < end) {
          out(i) = (out(i) + out(i - colors)).toByte; i += 1
        }
        r += 1
      }
      out
    } else if (predictor >= 10 && predictor <= 15) {
      // the row unfilter itself lives in PixelDecode (RFC 2083 §6 is
      // one algorithm whether the rows come from a PDF stream or a
      // PNG file); only the shape derivation is PDF-specific
      val bpp = math.max(1, (colors * bpc + 7) / 8)
      val rowLen = (colors.toLong * bpc * columns + 7).toInt / 8
      try PixelDecode.unfilterRows(data, rowLen, bpp)
      catch {
        case e: IllegalArgumentException =>
          fail(s"PNG predictor in object $objNum: ${e.getMessage}")
      }
    } else fail(s"unsupported /Predictor $predictor in object $objNum")
  }

  /** Decoded stream bytes of an object: raw, or through the declared
    * filter chain ([[Decodable]]); any other filter fails loudly by
    * name. */
  private def streamOf(doc: Map[Int, (String, Option[Array[Byte]])],
      objNum: Int): Array[Byte] = {
    val (dict, data) = doc.getOrElse(objNum, fail(s"missing object $objNum"))
    val raw = data.getOrElse(fail(s"object $objNum has no stream"))
    applyFilters(raw, filtersOf(doc, dict), dict, objNum)
  }

  /** `maxOut` bounds the DECODED size where the caller has already
    * validated the shape the output must fit (PNG: the filtered-row
    * total from IHDR dims): a ~1000x zlib bomb otherwise allocates GBs
    * BEFORE any shape check can see it — an OutOfMemoryError the
    * tolerant feature paths' Exception catch cannot contain. Checked
    * inside the drain loop, so the transient overshoot is one 8 KB
    * buffer, never the bomb. */
  private[expressions] def inflate(data: Array[Byte],
      maxOut: Int = Int.MaxValue): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, math.min(maxOut.toLong, data.length * 4L).toInt))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) fail("truncated Flate stream")
        out.write(buf, 0, n)
        if (out.size > maxOut)
          fail(s"Flate stream exceeds its declared decoded size ($maxOut)")
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        fail(s"corrupt Flate stream: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
  }

  /** PDF LZWDecode (ISO 32000 §7.4.4): MSB-first variable-width codes
    * (9→12 bits), 256 = clear, 257 = EOD, table grows from 258, with
    * the spec-default EarlyChange=1 (the ENCODER bumps the width one
    * code early — when ITS table reaches 512/1024/2048; the decoder's
    * table lags the encoder's by exactly one entry, so it must bump at
    * 511/1023/2047 — the `512 - earlyChange` decoder threshold PDFBox
    * and pdf.js use). `earlyChange` comes from /DecodeParms
    * /EarlyChange (default 1 per §7.4.4.3). */
  private[graft] def lzwDecode(data: Array[Byte], earlyChange: Int = 1,
      maxOut: Int = Int.MaxValue): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, math.min(maxOut.toLong, data.length * 3L).toInt))
    val table = ArrayBuffer.tabulate(256)(i => Array(i.toByte))
    table += Array.emptyByteArray // 256 clear
    table += Array.emptyByteArray // 257 eod
    var width = 9
    var bitBuf = 0L
    var bitCnt = 0
    var prev: Array[Byte] = null
    var pos = 0
    var done = false
    while (!done) {
      while (bitCnt < width && pos < data.length) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xFF); bitCnt += 8; pos += 1
      }
      if (bitCnt < width) {
        if (prev != null) fail("LZW stream ended without EOD")
        done = true
      } else {
        val code = ((bitBuf >>> (bitCnt - width)) & ((1L << width) - 1)).toInt
        bitCnt -= width
        if (code == 257) done = true
        else if (code == 256) {
          table.remove(258, table.length - 258)
          width = 9; prev = null
        } else {
          val entry =
            if (code < table.length && code != 256 && code != 257) table(code)
            else if (code == table.length && prev != null) prev :+ prev(0)
            else fail(s"corrupt LZW stream: code $code outside table")
          out.write(entry, 0, entry.length)
          // same bomb bound as inflate: checked per code, so the
          // transient overshoot is one table entry (<= 4 KB)
          if (out.size > maxOut)
            fail(s"LZW stream exceeds its declared decoded size ($maxOut)")
          if (prev != null) table += (prev :+ entry(0))
          prev = entry
          // Widen in lockstep with the encoder: the decoder's table is
          // one entry BEHIND (it adds prev+head(entry) only after
          // decoding the next code), so the EarlyChange=1 threshold
          // lands at 2^w-1 where the encoder's lands at 2^w.
          if (table.length >= (1 << width) - earlyChange && width < 12)
            width += 1
        }
      }
    }
    out.toByteArray
  }

  /** ASCII85Decode (ISO 32000 §7.4.3): 5 chars ('!'..'u', offset 33)
    * → 4 bytes base-85; 'z' = four zero bytes (group start only);
    * whitespace skipped; `~>` terminates; a partial group of n chars
    * yields n-1 bytes (padded with 'u'). */
  private[expressions] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length))
    val group = new Array[Int](5)
    var gLen = 0
    def flush(chars: Int): Unit = {
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < chars) group(k) else 84); k += 1 }
      val nOut = chars - 1
      var shift = 24
      k = 0
      while (k < nOut) {
        out.write(((v >>> shift) & 0xFF).toInt); shift -= 8; k += 1
      }
    }
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val ch = (data(i) & 0xFF).toChar
      if (ch == '~') done = true // `~>` terminator
      else if (ch == 'z') {
        if (gLen != 0) fail("ASCII85: 'z' inside a group")
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (ch >= '!' && ch <= 'u') {
        group(gLen) = ch - '!'; gLen += 1
        if (gLen == 5) { flush(5); gLen = 0 }
      } else if (!(ch == ' ' || ch == '\n' || ch == '\r' || ch == '\t' ||
          ch == '\f' || ch == 0.toChar))
        fail(s"ASCII85: invalid character '$ch'")
      i += 1
    }
    if (gLen == 1) fail("ASCII85: a final group of one character is invalid")
    if (gLen > 1) flush(gLen)
    out.toByteArray
  }

  /** ASCIIHexDecode (ISO 32000 §7.4.2): hex pairs, whitespace skipped,
    * `>` terminates, an odd final digit pads with 0. */
  private[expressions] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(32, data.length / 2))
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val ch = (data(i) & 0xFF).toChar
      val v =
        if (ch >= '0' && ch <= '9') ch - '0'
        else if (ch >= 'a' && ch <= 'f') ch - 'a' + 10
        else if (ch >= 'A' && ch <= 'F') ch - 'A' + 10
        else if (ch == '>') { done = true; -1 }
        else if (ch == ' ' || ch == '\n' || ch == '\r' || ch == '\t' ||
          ch == '\f' || ch == 0.toChar) -1
        else fail(s"ASCIIHex: invalid character '$ch'")
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd final digit
    out.toByteArray
  }

  /** RunLengthDecode (ISO 32000 §7.4.5): length byte L ≤ 127 copies
    * the next L+1 bytes literally; L ≥ 129 repeats the next byte
    * 257−L times; 128 = EOD. */
  private[expressions] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 2))
    var i = 0
    var done = false
    while (!done) {
      if (i >= data.length) fail("RunLength stream ended without EOD")
      val l = data(i) & 0xFF
      i += 1
      if (l == 128) done = true
      else if (l <= 127) {
        if (i + l + 1 > data.length) fail("RunLength literal run truncated")
        out.write(data, i, l + 1); i += l + 1
      } else {
        if (i >= data.length) fail("RunLength repeat run truncated")
        var k = 257 - l
        while (k > 0) { out.write(data(i)); k -= 1 }
        i += 1
      }
    }
    out.toByteArray
  }

  /** The raw embedded bytes of an image object (base64'd by the
    * caller): DCT streams are the JPEG file itself, Flate images
    * deliver the decoded raster — either way, the reference's
    * extract-and-base64 shape. */
  private def imageBytes(doc: Map[Int, (String, Option[Array[Byte]])],
      objNum: Int): Array[Byte] = {
    val (dict, data) = doc(objNum)
    val raw = data.getOrElse(fail(s"image object $objNum has no stream"))
    // every LEADING decodable transport filter unwraps (real-world
    // Flate- or ASCII-wrapped JPEGs declare e.g. [/ASCII85Decode
    // /DCTDecode]); the first unknown codec's stream IS the embedded
    // image file, shipped as-is (the reference's extract-and-base64
    // contract) — image bytes are opaque to this pipeline, so image
    // codecs pass through rather than failing the whole page
    val fs = filtersOf(doc, dict)
    try applyFilters(raw, fs.takeWhile(Decodable), dict, objNum)
    catch {
      // predictor shapes we can't undo (e.g. 16-bit TIFF differencing)
      // must not abort the DOCUMENT: the raster is opaque to this
      // pipeline, so ship the inflated-but-still-predicted bytes —
      // text/content streams keep the loud failure (applyFilters above)
      case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.toLowerCase.contains("predictor") =>
        applyFilters(raw, fs.takeWhile(Decodable),
          """/Predictor\s+\d+""".r.replaceAllIn(dict, "/Predictor 1"), objNum)
    }
  }

  private def ref(dict: String, key: String): Option[Int] =
    (java.util.regex.Pattern.quote(key) + """\s+(\d+)\s+\d+\s+R""").r
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  /** Page objects in the document's declared order: trailer /Root →
    * /Pages → recursive /Kids walk; a catalog-less file falls back to
    * /Type /Page objects in object-number order (the recovery rule). */
  private[expressions] def pageOrder(
      doc: Map[Int, (String, Option[Array[Byte]])]): Seq[Int] = {
    def kidsOf(num: Int, depth: Int): Seq[Int] = {
      if (depth > 64) fail("pages tree too deep (cycle?)")
      val dict = doc.get(num).map(_._1).getOrElse(fail(s"missing pages object $num"))
      if (dict.contains("/Type") && dict.contains("/Page") &&
          !dict.contains("/Pages")) Seq(num)
      else {
        val kids = """/Kids\s*\[([^\]]*)\]""".r.findFirstMatchIn(dict)
          .map(_.group(1)).getOrElse(fail(s"pages node $num has no /Kids"))
        """(\d+)\s+\d+\s+R""".r.findAllMatchIn(kids).map(_.group(1).toInt).toSeq
          .flatMap(kidsOf(_, depth + 1))
      }
    }
    // deterministic catalog choice: an incrementally-updated file can
    // carry TWO /Catalog objects under different object numbers, and
    // unordered Map iteration would pick one nondeterministically —
    // the HIGHEST object number wins (last-update-wins, the same rule
    // incremental xref updates follow for same-number objects)
    val root = doc.toSeq.sortBy(-_._1).iterator.map(_._2._1)
      .flatMap(d => if (d.contains("/Catalog")) ref(d, "/Pages") else None)
      .toSeq.headOption
    root match {
      case Some(pagesObj) => kidsOf(pagesObj, 0)
      case None =>
        val pages = doc.toSeq
          .filter { case (_, (d, _)) =>
            d.contains("/Type") && d.contains("/Page") && !d.contains("/Pages") }
          .map(_._1).sorted
        if (pages.isEmpty) fail("no /Catalog and no /Type /Page objects")
        pages
    }
  }

  /** Concatenated decoded content of the page's /Contents (single ref
    * or array of refs — multiple streams form ONE token stream). */
  private def contentsOf(doc: Map[Int, (String, Option[Array[Byte]])],
      pageDict: String): Array[Byte] = {
    val nums = """/Contents\s*\[([^\]]*)\]""".r.findFirstMatchIn(pageDict) match {
      case Some(m) =>
        """(\d+)\s+\d+\s+R""".r.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq
      case None => ref(pageDict, "/Contents").toSeq
    }
    if (nums.isEmpty) Array.emptyByteArray
    else nums.map(streamOf(doc, _)).reduce(_ ++ Array[Byte]('\n') ++ _)
  }

  /** The page's effective /Resources source text: inline dict on the
    * page, an indirect `/Resources N 0 R` ref, or — per the
    * inheritance rule (ISO 32000 §7.7.3.4) — the nearest ancestor
    * /Pages node's, found by walking /Parent. A document with no
    * /Resources anywhere falls back to the page dict itself (the
    * historical recovery behavior: inline tables still match). */
  private def resourcesOf(doc: Map[Int, (String, Option[Array[Byte]])],
      pageDict: String): String = {
    // A DANGLING ref (truncated file, lost incremental update) is
    // tolerated as "no resources here" rather than aborting the whole
    // document: simple text still extracts without a font table, and
    // the CID edges downstream stay loud when 2-byte strings actually
    // need a font this never found.
    def own(dict: String): Option[String] =
      if (!dict.contains("/Resources")) None
      else ref(dict, "/Resources") match {
        case Some(n) => doc.get(n).map(_._1)
        case None => Some(dict)
      }
    var cur = pageDict
    var res = own(cur)
    var depth = 0
    while (res.isEmpty && depth < 64) {
      ref(cur, "/Parent").flatMap(p => doc.get(p).map(_._1)) match {
        case Some(parent) =>
          cur = parent
          res = own(cur)
          depth += 1
        case None => depth = 64
      }
    }
    res.getOrElse(pageDict)
  }

  /** A named resource SUBDICT's text (`/Font`, `/XObject`): the inline
    * `<< … >>` form, or an indirect `N 0 R` reference resolved through
    * the object map (what real writers emit for shared font tables). */
  private def resourceDict(doc: Map[Int, (String, Option[Array[Byte]])],
      resSrc: String, key: String): String =
    (java.util.regex.Pattern.quote(key) + """\s*<<([^>]*)>>""").r
      .findFirstMatchIn(resSrc).map(_.group(1))
      .orElse(ref(resSrc, key).flatMap(n => doc.get(n).map(_._1)))
      .getOrElse("") // dangling ref tolerated: see resourcesOf

  /** /Resources → /XObject name → object-number map. */
  private def xobjectsOf(doc: Map[Int, (String, Option[Array[Byte]])],
      pageDict: String): Map[String, Int] = {
    val xo = resourceDict(doc, resourcesOf(doc, pageDict), "/XObject")
    """/(\w+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(xo)
      .map(m => m.group(1) -> m.group(2).toInt).toMap
  }

  /** /Resources → /Font name → [[FontMode]]: [[SimpleFont]] reads
    * string bytes as Latin-1 (the historical scope), [[DiffFont]]
    * overlays a /Differences glyph-name remap on that base, and
    * [[CidFont]] decodes composite Identity 2-byte CIDs through the
    * /ToUnicode CMap — or, without one, through the embedded TrueType
    * program's inverted cmap ([[cidMapFromEmbeddedFont]]). Predefined
    * registry CMaps decode WITHOUT Adobe's registry files: the
    * UCS2/UTF16 family's codes are UTF-16BE ([[Ucs2Font]]) and the
    * byte-oriented family's codes are legacy-charset bytes
    * ([[CharsetFont]] — GBK/Shift-JIS/Big5/EUC/raw-JIS through the
    * JDK charsets, incl. the pre-Unicode H/V/Add/Ext + 83pv/90pv
    * orderings). Loud outside that: an Identity font with NEITHER
    * table has no recoverable text, and the charset-less raw
    * KS X 1001 / GB 2312 orderings stay out of scope. */
  private def fontsOf(doc: Map[Int, (String, Option[Array[Byte]])],
      pageDict: String,
      cache: java.util.HashMap[Integer, (FontMode, FontWidths)])
      : Map[String, (FontMode, FontWidths)] = {
    val fo = resourceDict(doc, resourcesOf(doc, pageDict), "/Font")
    """/(\w+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(fo).map { m =>
      val objNum = m.group(2).toInt
      val cached = cache.get(objNum)
      m.group(1) -> (if (cached != null) cached
      else {
        val fdict = doc.get(objNum).map(_._1)
          .getOrElse(fail(s"missing font object $objNum"))
        val v = (cidMapOf(doc, fdict, objNum), widthsOf(doc, fdict))
        cache.put(objNum, v)
        v
      })
    }.toMap
  }

  private def cidMapOf(doc: Map[Int, (String, Option[Array[Byte]])],
      fdict: String, objNum: Int): FontMode = {
    // an inline `/Encoding << … >>` dict contains `/Type /Encoding`,
    // which the bare-name scan would misread as `/Encoding /Type…` —
    // dict form short-circuits to the /Differences path
    val encName =
      if ("""/Encoding\s*<<""".r.findFirstIn(fdict).isDefined) None
      else """/Encoding\s*/([\w-]+)""".r.findFirstMatchIn(fdict).map(_.group(1))
    encName match {
      // Identity-V is the same identity CID mapping in vertical
      // writing mode (ISO 32000 §9.7.5.2) — CONTENT decodes
      // identically; the writing direction only shapes glyph
      // placement, which the block bbox already only estimates
      case Some("Identity-H") | Some("Identity-V") =>
        ref(fdict, "/ToUnicode") match {
          case Some(tu) => CidFont(parseToUnicode(latin1full(streamOf(doc, tu))))
          case None => CidFont(cidMapFromEmbeddedFont(doc, fdict, objNum))
        }
      // the predefined UCS2 registry family (UniJIS-UCS2-H etc., ISO
      // 32000 §9.7.5.2 Table 118): the character CODES of these CMaps
      // ARE UCS-2 code points, so text recovers without the Adobe
      // registry files — the codes decode as UTF-16BE directly. An
      // explicit /ToUnicode still wins (it overrides any encoding).
      // This is the CMap family CJK crawl PDFs overwhelmingly carry;
      // the byte-oriented orderings (GBK-EUC-H, 90ms-RKSJ-…) would
      // need the registry tables and stay loud below.
      case Some(e) if Ucs2CMaps(e) =>
        ref(fdict, "/ToUnicode") match {
          case Some(tu) => CidFont(parseToUnicode(latin1full(streamOf(doc, tu))))
          case None => Ucs2Font
        }
      // the byte-oriented registry family (GBK-EUC-H, 90ms-RKSJ-H,
      // ETen-B5-H, ...): their character codes ARE legacy-charset
      // bytes, so the string bytes decode through the JDK charset —
      // no Adobe registry files needed (see [[CharsetFont]]). An
      // explicit /ToUnicode still wins.
      case Some(e) if ByteCMaps.contains(e) =>
        ref(fdict, "/ToUnicode") match {
          case Some(tu) => CidFont(parseToUnicode(latin1full(streamOf(doc, tu))))
          case None => CharsetFont(ByteCMaps(e))
        }
      // the raw 94x94 orderings (KSC-H/V, GB-H/V): codes = EUC bytes
      // minus the high bit — offset-decode through EUC-KR / EUC-CN
      case Some(e) if EucRawCMaps.contains(e) =>
        ref(fdict, "/ToUnicode") match {
          case Some(tu) => CidFont(parseToUnicode(latin1full(streamOf(doc, tu))))
          case None => EucRawFont(EucRawCMaps(e))
        }
      // a Type0 font with ANY other predefined CMap name is out of
      // scope LOUDLY — a contains("-") style fallback would silently
      // read Johab/UniJIS2004-class orderings as Latin-1 mojibake
      case Some(e) if isType0(fdict) =>
        fail(s"unsupported composite-font CMap /$e in font $objNum")
      case Some(_) => SimpleFont // /WinAnsiEncoding etc.: Latin-1 scope
      case None if isType0(fdict) =>
        // a Type0 /Encoding that is not a name must be an EMBEDDED
        // CMap stream (ISO 32000 §9.7.5.3); reading its bytes as
        // Latin-1 would be silent mojibake, so resolve it for real —
        // or fail loudly when there is nothing usable
        ref(fdict, "/Encoding") match {
          case Some(en) if doc.get(en).exists(_._2.isDefined) =>
            embeddedCMapFont(doc, fdict, en, objNum)
          case _ => fail(s"Type0 font $objNum has no usable /Encoding " +
            "(predefined name or embedded CMap stream)")
        }
      case None =>
        // a DICT-form or indirect /Encoding may carry /Differences —
        // the per-code glyph-name remap TeX-class and older-Office
        // writers emit constantly; decoding those bytes as Latin-1
        // would be silent mojibake
        encodingDictOf(doc, fdict) match {
          case Some(enc) if enc.contains("/Differences") =>
            val m = diffTable(doc, enc, objNum)
            if (m.isEmpty) SimpleFont else DiffFont(m)
          case _ => SimpleFont
        }
    }
  }

  private val Ucs2CMaps: Set[String] = Set(
    "UniJIS-UCS2-H", "UniJIS-UCS2-V", "UniJIS-UCS2-HW-H", "UniJIS-UCS2-HW-V",
    "UniGB-UCS2-H", "UniGB-UCS2-V", "UniCNS-UCS2-H", "UniCNS-UCS2-V",
    "UniKS-UCS2-H", "UniKS-UCS2-V",
    // the UTF16 successors: same 2-byte code units plus surrogate
    // pairs, which the UTF-16BE decode already validates
    "UniJIS-UTF16-H", "UniJIS-UTF16-V", "UniGB-UTF16-H", "UniGB-UTF16-V",
    "UniCNS-UTF16-H", "UniCNS-UTF16-V", "UniKS-UTF16-H", "UniKS-UTF16-V")

  /** Byte-oriented predefined registry CMaps (ISO 32000 §9.7.5.2
    * Table 118) → the JDK charset whose byte sequences ARE their
    * character codes. The per-collection mapping follows the public
    * Adobe CMap documentation: GB-EUC/GBK-EUC ride GBK (a byte-level
    * superset of EUC-CN), GBK2K is GB18030, the RKSJ family is
    * Shift-JIS with the 90ms (Microsoft) flavor = windows-31j, EUC is
    * EUC-JP, ETen-B5/B5pc ride Big5 (+ HKscs = Big5-HKSCS), KSC-EUC is
    * EUC-KR and KSCms-UHC is the Windows 949 extension.
    *
    * Round 14 closes the pre-Unicode ISO-2022 tail (the rarest CJK
    * crawl PDFs): the dash-less JIS orderings H / V (and their Add /
    * Ext NEC-row variants) carry RAW 2-byte JIS X 0208 codes, which
    * the JDK's auxiliary `x-JIS0208` charset decodes directly (probed
    * at first use — absence fails by name, never mojibake); the
    * 83pv / 90pv Mac flavors are Shift-JIS-coded, so they ride the
    * base charset (their Apple-gaiji rows REPORT-fail loudly, never
    * silently substitute). Round 15 closes the Korean/Chinese raw
    * orderings the same way: KSC-H/V and GB-H/V carry raw 94×94
    * KS X 1001 / GB 2312 codes = the EUC bytes minus the high bit —
    * [[EucRawFont]] offsets and decodes EUC-KR / EUC-CN
    * ([[EucRawCMaps]]). What remains loud: Johab, UniJIS2004, and
    * the other post-2000 ordering names. */
  private val ByteCMaps: Map[String, String] = {
    def hv(base: String, cs: String): Seq[(String, String)] =
      Seq(s"$base-H" -> cs, s"$base-V" -> cs)
    (hv("GB-EUC", "GBK") ++ hv("GBKp-EUC", "GBK") ++ hv("GBK-EUC", "GBK") ++
      hv("GBK2K", "GB18030") ++
      hv("RKSJ", "Shift_JIS") ++ hv("Add-RKSJ", "Shift_JIS") ++
      hv("Ext-RKSJ", "Shift_JIS") ++
      hv("90ms-RKSJ", "windows-31j") ++ hv("90msp-RKSJ", "windows-31j") ++
      hv("EUC", "EUC-JP") ++
      hv("ETen-B5", "Big5") ++ hv("B5pc", "Big5") ++
      hv("HKscs-B5", "Big5-HKSCS") ++
      hv("KSC-EUC", "EUC-KR") ++ hv("KSCms-UHC", "x-windows-949") ++
      hv("KSCms-UHC-HW", "x-windows-949") ++
      Seq("H" -> "x-JIS0208", "V" -> "x-JIS0208") ++
      hv("Add", "x-JIS0208") ++ hv("Ext", "x-JIS0208") ++
      Seq("83pv-RKSJ-H" -> "Shift_JIS", "90pv-RKSJ-H" -> "Shift_JIS")).toMap
  }

  /** The raw 94×94 orderings → the EUC charset their codes offset
    * into (see [[EucRawFont]]). */
  private val EucRawCMaps: Map[String, String] = Map(
    "KSC-H" -> "EUC-KR", "KSC-V" -> "EUC-KR",
    "GB-H" -> "EUC-CN", "GB-V" -> "EUC-CN")

  private def isType0(fdict: String): Boolean =
    """/Subtype\s*/Type0\b""".r.findFirstIn(fdict).isDefined

  /** A Type0 font whose /Encoding is an EMBEDDED CMap stream: parse
    * the CMap body (codespacerange / cidchar / cidrange / usecmap —
    * the Adobe CMap grammar subset §9.7.5.3 writers emit) and compose
    * code → CID → Unicode. Scope: 2-byte code space only (the shape
    * every embedded encoding CMap in the wild uses — a mixed-width
    * space fails loudly, never mis-splits the string bytes), usecmap
    * base Identity-H/V or none. With /ToUnicode present the CMap only
    * validates the code width — ToUnicode maps CODES directly. */
  private def embeddedCMapFont(doc: Map[Int, (String, Option[Array[Byte]])],
      fdict: String, encObj: Int, objNum: Int): FontMode = {
    val src = latin1full(streamOf(doc, encObj))
    // every codespacerange endpoint must be 2 bytes (4 hex digits)
    """begincodespacerange([\s\S]*?)endcodespacerange""".r
      .findAllMatchIn(src).foreach { m =>
        """<([0-9A-Fa-f]+)>""".r.findAllMatchIn(m.group(1)).foreach { h =>
          if (h.group(1).length != 4)
            fail(s"embedded CMap of font $objNum declares a " +
              s"${h.group(1).length / 2}-byte code range (2-byte scope)")
        }
      }
    ref(fdict, "/ToUnicode") match {
      case Some(tu) => CidFont(parseToUnicode(latin1full(streamOf(doc, tu))))
      case None =>
        val identityBase =
          """/(Identity-[HV])\s+usecmap""".r.findFirstIn(src).isDefined
        """/([\w-]+)\s+usecmap""".r.findFirstMatchIn(src).foreach { m =>
          if (!m.group(1).startsWith("Identity-"))
            fail(s"embedded CMap of font $objNum uses base /${m.group(1)} " +
              "(only Identity-H/V bases are in scope)")
        }
        val code2cid = scala.collection.mutable.HashMap.empty[Int, Int]
        """begincidchar([\s\S]*?)endcidchar""".r.findAllMatchIn(src)
          .foreach { m =>
            """<([0-9A-Fa-f]{4})>\s+(\d+)""".r.findAllMatchIn(m.group(1))
              .foreach { e =>
                code2cid(Integer.parseInt(e.group(1), 16)) = e.group(2).toInt
              }
          }
        """begincidrange([\s\S]*?)endcidrange""".r.findAllMatchIn(src)
          .foreach { m =>
            """<([0-9A-Fa-f]{4})>\s*<([0-9A-Fa-f]{4})>\s+(\d+)""".r
              .findAllMatchIn(m.group(1)).foreach { e =>
                val lo = Integer.parseInt(e.group(1), 16)
                val hi = Integer.parseInt(e.group(2), 16)
                if (hi < lo)
                  fail(s"embedded CMap cidrange <${e.group(1)}> > <${e.group(2)}>")
                val cid0 = e.group(3).toInt
                var c = lo
                while (c <= hi) { code2cid(c) = cid0 + (c - lo); c += 1 }
              }
          }
        if (!identityBase && code2cid.isEmpty)
          fail(s"embedded CMap of font $objNum maps no codes and has no " +
            "identity base (text unrecoverable)")
        val cid2text = cidMapFromEmbeddedFont(doc, fdict, objNum)
        val explicit = code2cid.iterator.map { case (c, cid) =>
          c -> cid2text.getOrElse(cid, fail(f"embedded CMap maps code " +
            f"0x$c%04X to CID $cid, which the font's tables cannot read"))
        }.toMap
        CidFont(if (identityBase) cid2text ++ explicit else explicit)
    }
  }

  /** The /Encoding DICTIONARY of a simple font — the inline `<< … >>`
    * form or an indirect reference; None when /Encoding is absent or a
    * bare name. */
  private def encodingDictOf(doc: Map[Int, (String, Option[Array[Byte]])],
      fdict: String): Option[String] =
    """/Encoding\s*<<""".r.findFirstMatchIn(fdict)
      .map(m => balancedDict(fdict, m.end - 2))
      .orElse(ref(fdict, "/Encoding").flatMap(n => doc.get(n).map(_._1)))

  /** The `<< … >>` substring starting at `from` (which must point at
    * the opening `<<`), tracking nesting and SKIPPING string values —
    * a '>>' inside a literal or hex string must not close the dict
    * (the same hazard class [[topLevelView]] handles for /Encrypt). */
  private def balancedDict(s: String, from: Int): String = {
    var i = from + 2
    var depth = 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '(') { // literal string: nesting + escapes
        i += 1
        var d = 1
        while (i < s.length && d > 0) {
          val ch = s.charAt(i)
          if (ch == '\\') i += 1
          else if (ch == '(') d += 1
          else if (ch == ')') d -= 1
          i += 1
        }
      } else if (s.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (s.startsWith(">>", i)) { depth -= 1; i += 2 }
      else if (c == '<') { // hex string: skip to its '>'
        while (i < s.length && s.charAt(i) != '>') i += 1
        i += 1
      } else i += 1
    }
    if (depth != 0) fail("unterminated /Encoding dictionary")
    s.substring(from, i)
  }

  /** /Differences array → byte code → text (ISO 32000 §9.6.5.1: an
    * integer sets the next code, each following name claims a code).
    * The array may itself be an indirect reference (any dict value
    * can be). Names resolve through [[glyphText]] — loud on names
    * outside the implemented Adobe-Glyph-List subset and on
    * non-integer codes, never silent garbage. */
  private def diffTable(doc: Map[Int, (String, Option[Array[Byte]])],
      enc: String, objNum: Int): Map[Int, String] = {
    val body = """/Differences\s*\[([^\]]*)\]""".r.findFirstMatchIn(enc)
      .map(_.group(1))
      .orElse(ref(enc, "/Differences").map { n =>
        val a = doc.get(n).map(_._1)
          .getOrElse(fail(s"missing /Differences object $n"))
        val lo = a.indexOf('['); val hi = a.lastIndexOf(']')
        if (lo < 0 || hi <= lo)
          fail(s"malformed indirect /Differences array in font $objNum")
        a.substring(lo + 1, hi)
      })
      .getOrElse(fail(s"malformed /Differences array in font $objNum"))
    val out = Map.newBuilder[Int, String]
    var code = -1
    """([-+.0-9]+)|/([^\s/\[\]<>()]+)""".r.findAllMatchIn(body).foreach { m =>
      if (m.group(1) != null) {
        // a real or signed number would otherwise SPLIT into bogus
        // integer codes and silently build a wrong table
        if (!m.group(1).forall(_.isDigit))
          fail(s"non-integer /Differences code ${m.group(1)} in font $objNum")
        code = m.group(1).toInt
      } else {
        if (code < 0 || code > 255)
          fail(s"/Differences name /${m.group(2)} outside byte range in font $objNum")
        out += code -> glyphText(m.group(2))
        code += 1
      }
    }
    out.result()
  }

  /** Identity-H WITHOUT /ToUnicode: the font's own embedded TrueType
    * program is the remaining Unicode evidence — CID → GID through
    * /CIDToGIDMap (/Identity, the spec default, or the 2-byte-BE
    * stream form; ISO 32000 §9.7.4.3) and GID → Unicode through the
    * font's `cmap` table inverted ([[TrueTypeCmap]]) — the
    * PyMuPDF-class extractor fallback (reference vector_db.py:247's
    * scope). Loud when nothing embedded can carry the mapping: silent
    * recovery here would mojibake every CID run the font feeds. */
  private def cidMapFromEmbeddedFont(
      doc: Map[Int, (String, Option[Array[Byte]])], fdict: String,
      objNum: Int): Map[Int, String] = {
    def noWay(what: String): Nothing = fail(
      s"Identity font $objNum has no /ToUnicode CMap and $what (text unrecoverable)")
    val desc = """/DescendantFonts\s*\[\s*(\d+)\s+\d+\s+R""".r
      .findFirstMatchIn(fdict).map(_.group(1).toInt)
      .orElse(ref(fdict, "/DescendantFonts").flatMap(n => // indirect array
        doc.get(n).map(_._1).flatMap(a =>
          """(\d+)\s+\d+\s+R""".r.findFirstMatchIn(a).map(_.group(1).toInt))))
      .getOrElse(noWay("no /DescendantFonts"))
    val ddict = doc.get(desc).map(_._1)
      .getOrElse(fail(s"missing descendant font object $desc"))
    val fdescDict = ref(ddict, "/FontDescriptor")
      .flatMap(n => doc.get(n).map(_._1))
      .getOrElse(noWay(s"descendant font $desc has no /FontDescriptor"))
    val fontFile = ref(fdescDict, "/FontFile2")
      .getOrElse(noWay("no embedded /FontFile2"))
    val g2u = TrueTypeCmap.glyphToUnicode(streamOf(doc, fontFile))
    """/CIDToGIDMap\s*/(\w+)""".r.findFirstMatchIn(ddict)
      .map(_.group(1)) match {
      case Some("Identity") => g2u // CID == GID
      case Some(other) =>
        fail(s"unsupported /CIDToGIDMap /$other in descendant font $desc")
      case None => ref(ddict, "/CIDToGIDMap") match {
        case Some(mapObj) => // stream form: big-endian uint16 GID per CID
          val tbl = streamOf(doc, mapObj)
          (0 until tbl.length / 2).flatMap { cid =>
            val gid = ((tbl(2 * cid) & 0xFF) << 8) | (tbl(2 * cid + 1) & 0xFF)
            g2u.get(gid).map(cid -> _)
          }.toMap
        case None => g2u // absent → /Identity, the spec default
      }
    }
  }

  private def latin1full(b: Array[Byte]): String = latin1(b, 0, b.length)

  /** How the current font turns string-token bytes into text. */
  private[expressions] sealed trait FontMode
  /** Latin-1 bytes — the standard simple-font scope. */
  private[expressions] case object SimpleFont extends FontMode
  /** Composite Identity font: 2-byte CIDs through `map`. */
  private[expressions] final case class CidFont(map: Map[Int, String])
      extends FontMode
  /** Predefined UCS2/UTF16 registry CMap (UniJIS-UCS2-H family):
    * 2-byte codes ARE UCS-2/UTF-16BE code units — decode directly
    * (the UTF16 names add surrogate pairs, which the decode already
    * validates and keeps). */
  private[expressions] case object Ucs2Font extends FontMode
  /** Predefined BYTE-ORIENTED registry CMap (GBK-EUC-H, 90ms-RKSJ-H,
    * ETen-B5-H, ...): the character CODES of these CMaps are exactly
    * the bytes of a legacy CJK charset (GBK / Shift-JIS / Big5 / ...,
    * including their mixed 1-/2-byte code spaces), so text recovers by
    * decoding the string bytes with that JDK charset — the same
    * no-registry-files trick as [[Ucs2Font]]: what the parse needs is
    * code → TEXT, never code → CID → glyph. */
  private[expressions] final case class CharsetFont(charset: String)
      extends FontMode
  /** Raw ISO-2022-style 94×94 registry CMap (KSC-H/V, GB-H/V): the
    * character codes are raw KS X 1001 / GB 2312 row-column byte
    * pairs (each byte 0x21–0x7E) — exactly the EUC encoding minus
    * the high bit. Text recovers by OR-ing 0x80 onto each byte and
    * decoding EUC-KR / EUC-CN: the same no-registry-files trick as
    * the JIS H/V orderings, whose x-JIS0208 charset happens to take
    * the raw form directly where Korean/Chinese have no raw-code JDK
    * charset. 2-byte-only code space, validated before the offset. */
  private[expressions] final case class EucRawFont(charset: String)
      extends FontMode
  /** Simple font with /Differences: remapped bytes read through `map`,
    * the rest stay Latin-1 (the base-encoding scope). */
  private[expressions] final case class DiffFont(map: Map[Int, String])
      extends FontMode

  /** How the current font measures string-token codes, in 1000-unit
    * glyph space (round 16, VERDICT r15 stretch 9: the block extent
    * uses the font's DECLARED metrics when the file carries them).
    * Fonts without metrics keep the historical 0.5 em/char estimate —
    * byte-identical to the old bbox on every metrics-less document. */
  private[graft] sealed trait FontWidths
  /** No declared metrics: 0.5 em per DECODED char (the historical
    * Helvetica-ish estimate). */
  private[graft] case object EstimateWidths extends FontWidths
  /** Simple-font /FirstChar + /Widths (+ /MissingWidth outside the
    * declared range; absent → the 500-unit estimate, so undeclared
    * codes degrade to the historical extent, never to zero width). */
  private[graft] final case class SimpleWidths(first: Int,
      w: Array[Double], missing: Double) extends FontWidths {
    def of(code: Int): Double = {
      val i = code - first
      if (i >= 0 && i < w.length) w(i) else missing
    }
  }
  /** Composite-font /W (+ /DW default, ISO 32000 §9.7.4.3: 1000). */
  private[graft] final case class CidWidths(m: Map[Int, Double],
      dw: Double) extends FontWidths {
    def of(cid: Int): Double = m.getOrElse(cid, dw)
  }

  /** Parse a font dict's declared width metrics. Simple fonts:
    * /FirstChar + /Widths (direct array or indirect); Type0: the
    * descendant font's /W runs — both forms, `c [w…]` and
    * `c1 c2 w` — and /DW. Anything undeclared → [[EstimateWidths]]. */
  private[graft] def widthsOf(doc: Map[Int, (String, Option[Array[Byte]])],
      fdict: String): FontWidths = {
    // bracket-DEPTH scan, not a [^\]]* regex: /W nests runs like
    // `[ 1 [600 650] 10 12 700 ]`, where the first `]` is interior
    def balancedArray(src: String, from: Int): Option[String] = {
      val open = src.indexOf('[', from)
      if (open < 0) None
      else {
        var depth = 0
        var i = open
        while (i < src.length) {
          src.charAt(i) match {
            case '[' => depth += 1
            case ']' =>
              depth -= 1
              if (depth == 0) return Some(src.substring(open + 1, i))
            case _ => ()
          }
          i += 1
        }
        None
      }
    }
    def arrayOf(dict: String, key: String): Option[String] = {
      val q = java.util.regex.Pattern.quote(key)
      (q + """\s*\[""").r.findFirstMatchIn(dict)
        .flatMap(m => balancedArray(dict, m.start))
        .orElse(ref(dict, key).flatMap(n => doc.get(n)).flatMap {
          case (src, _) => balancedArray(src, 0).orElse(Some(src))
        })
    }
    // inline `[N 0 R]` first; else an INDIRECT array object whose
    // source carries the descendant ref (the cidMapFromEmbeddedFont
    // resolution order — the indirect object is the ARRAY, never the
    // descendant dict itself)
    val desc = """/DescendantFonts\s*\[\s*(\d+)\s+\d+\s+R""".r
      .findFirstMatchIn(fdict).map(_.group(1).toInt)
      .orElse(ref(fdict, "/DescendantFonts").flatMap(n =>
        doc.get(n).map(_._1).flatMap(a =>
          """(\d+)\s+\d+\s+R""".r.findFirstMatchIn(a).map(_.group(1).toInt))))
      .flatMap(n => doc.get(n)).map(_._1)
    desc match {
      case Some(dd) =>
        val dw = """/DW\s+(\d+(?:\.\d+)?)""".r.findFirstMatchIn(dd)
          .map(_.group(1).toDouble).getOrElse(1000.0)
        arrayOf(dd, "/W") match {
          case None => if (dw == 1000.0) EstimateWidths else CidWidths(Map.empty, dw)
          case Some(src) =>
            // tokens: numbers and bracketed runs; two grammar forms.
            // Tokenize EVERY non-space run and validate — a
            // keep-only-what-matches regex would silently drop the R
            // of an indirect ref (so '/W [1 3 0 R]' reparses as range
            // form c1=1,c2=3,w=0: zero-width glyphs, silent bbox
            // corruption). An unrecognized token is a /W form this
            // parser does not serve — fail loudly (r16 advice).
            val toks = """\[|\]|[^\s\[\]]+""".r.findAllIn(src).toArray
            val num = """-?\d+(?:\.\d+)?""".r
            toks.find(t => t != "[" && t != "]" && !num.matches(t))
              .foreach(t => fail(
                s"unsupported token '$t' in a composite font's /W array " +
                  "(indirect refs / names inside /W are out of scope)"))
            val m = Map.newBuilder[Int, Double]
            var i = 0
            while (i < toks.length) {
              if (toks(i) == "[" || toks(i) == "]") i += 1
              else if (i + 1 < toks.length && toks(i + 1) == "[") {
                val c = toks(i).toDouble.toInt
                var j = i + 2
                var k = 0
                while (j < toks.length && toks(j) != "]") {
                  m += (c + k) -> toks(j).toDouble
                  k += 1; j += 1
                }
                i = j + 1
              } else if (i + 2 < toks.length && toks(i + 1) != "[" &&
                  toks(i + 2) != "[") {
                val c1 = toks(i).toDouble.toInt
                val c2 = toks(i + 1).toDouble.toInt
                val w = toks(i + 2).toDouble
                var c = c1
                while (c <= c2) { m += c -> w; c += 1 }
                i += 3
              } else fail("malformed /W array in a composite font")
            }
            CidWidths(m.result(), dw)
        }
      case None =>
        (for {
          src <- arrayOf(fdict, "/Widths")
          fm <- """/FirstChar\s+(\d+)""".r.findFirstMatchIn(fdict)
        } yield {
          val w = """-?\d+(?:\.\d+)?""".r.findAllIn(src)
            .map(_.toDouble).toArray
          val missing = ref(fdict, "/FontDescriptor")
            .flatMap(n => doc.get(n)).map(_._1)
            .flatMap(d => """/MissingWidth\s+(\d+(?:\.\d+)?)""".r
              .findFirstMatchIn(d).map(_.group(1).toDouble))
            .getOrElse(500.0)
          SimpleWidths(fm.group(1).toInt, w, missing): FontWidths
        }).getOrElse(EstimateWidths)
    }
  }

  /** Strict legacy-charset decode shared by [[CharsetFont]] and
    * [[EucRawFont]]: REPORT error actions — malformed or unmappable
    * bytes are unrecoverable text, loud, never silent U+FFFD. */
  private def decodeCharsetStrict(bytes: Array[Byte], cs: String): String = {
    val dec = java.nio.charset.Charset.forName(cs).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch {
      case e: java.nio.charset.CharacterCodingException =>
        fail(s"string bytes are not valid $cs under the font's " +
          s"byte-oriented registry CMap (${e.getClass.getSimpleName})")
    }
  }

  /** Glyph name → text: the AGL `uniXXXX`/`uXXXXXX` rules plus the
    * Adobe-Glyph-List subset covering Standard/WinAnsi/Latin-1 names
    * (the names real /Differences arrays carry). Unknown names fail
    * loudly — emitting the name's bytes would be silent mojibake. */
  private[expressions] def glyphText(name: String): String = {
    def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
    if (name.length >= 7 && name.startsWith("uni") &&
        (name.length - 3) % 4 == 0 && name.drop(3).forall(isHex)) {
      // uniXXXX[XXXX…]: UTF-16 code units. AGL excludes the surrogate
      // range from uniXXXX names — an unpaired half would silently
      // become U+FFFD downstream, the mojibake this path forbids
      val units = name.drop(3).grouped(4).map(Integer.parseInt(_, 16)).toSeq
      if (units.exists(u => u >= 0xD800 && u <= 0xDFFF))
        fail(s"glyph name /$name encodes surrogate code units")
      units.map(_.toChar).mkString
    } else if (name.length >= 5 && name.length <= 7 && name.startsWith("u") &&
        name.drop(1).forall(isHex)) {
      val cp = Integer.parseInt(name.drop(1), 16)
      if (cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF))
        fail(s"glyph name /$name encodes no valid code point")
      new String(Character.toChars(cp))
    } else Agl.getOrElse(name,
      fail(s"glyph name /$name has no known Unicode mapping"))
  }

  /** The Adobe Glyph List subset for the Standard / WinAnsi / Latin-1
    * name space (AGL is public, Adobe Type Tools). ASCII names are
    * generated (their names ARE conventions over the char), the rest
    * enumerated. */
  private val Agl: Map[String, String] = {
    val ascii = Seq(
      "space" -> 0x20, "exclam" -> 0x21, "quotedbl" -> 0x22,
      "numbersign" -> 0x23, "dollar" -> 0x24, "percent" -> 0x25,
      "ampersand" -> 0x26, "quotesingle" -> 0x27, "parenleft" -> 0x28,
      "parenright" -> 0x29, "asterisk" -> 0x2A, "plus" -> 0x2B,
      "comma" -> 0x2C, "hyphen" -> 0x2D, "period" -> 0x2E, "slash" -> 0x2F,
      "zero" -> 0x30, "one" -> 0x31, "two" -> 0x32, "three" -> 0x33,
      "four" -> 0x34, "five" -> 0x35, "six" -> 0x36, "seven" -> 0x37,
      "eight" -> 0x38, "nine" -> 0x39, "colon" -> 0x3A, "semicolon" -> 0x3B,
      "less" -> 0x3C, "equal" -> 0x3D, "greater" -> 0x3E, "question" -> 0x3F,
      "at" -> 0x40, "bracketleft" -> 0x5B, "backslash" -> 0x5C,
      "bracketright" -> 0x5D, "asciicircum" -> 0x5E, "underscore" -> 0x5F,
      "grave" -> 0x60, "braceleft" -> 0x7B, "bar" -> 0x7C,
      "braceright" -> 0x7D, "asciitilde" -> 0x7E) ++
      (0 until 26).map(i => ('A' + i).toChar.toString -> (0x41 + i)) ++
      (0 until 26).map(i => ('a' + i).toChar.toString -> (0x61 + i))
    val latin1Sup = Seq(
      "exclamdown" -> 0xA1, "cent" -> 0xA2, "sterling" -> 0xA3,
      "currency" -> 0xA4, "yen" -> 0xA5, "brokenbar" -> 0xA6,
      "section" -> 0xA7, "dieresis" -> 0xA8, "copyright" -> 0xA9,
      "ordfeminine" -> 0xAA, "guillemotleft" -> 0xAB, "logicalnot" -> 0xAC,
      "registered" -> 0xAE, "macron" -> 0xAF, "degree" -> 0xB0,
      "plusminus" -> 0xB1, "twosuperior" -> 0xB2, "threesuperior" -> 0xB3,
      "acute" -> 0xB4, "mu" -> 0xB5, "paragraph" -> 0xB6,
      "periodcentered" -> 0xB7, "cedilla" -> 0xB8, "onesuperior" -> 0xB9,
      "ordmasculine" -> 0xBA, "guillemotright" -> 0xBB, "onequarter" -> 0xBC,
      "onehalf" -> 0xBD, "threequarters" -> 0xBE, "questiondown" -> 0xBF,
      "Agrave" -> 0xC0, "Aacute" -> 0xC1, "Acircumflex" -> 0xC2,
      "Atilde" -> 0xC3, "Adieresis" -> 0xC4, "Aring" -> 0xC5, "AE" -> 0xC6,
      "Ccedilla" -> 0xC7, "Egrave" -> 0xC8, "Eacute" -> 0xC9,
      "Ecircumflex" -> 0xCA, "Edieresis" -> 0xCB, "Igrave" -> 0xCC,
      "Iacute" -> 0xCD, "Icircumflex" -> 0xCE, "Idieresis" -> 0xCF,
      "Eth" -> 0xD0, "Ntilde" -> 0xD1, "Ograve" -> 0xD2, "Oacute" -> 0xD3,
      "Ocircumflex" -> 0xD4, "Otilde" -> 0xD5, "Odieresis" -> 0xD6,
      "multiply" -> 0xD7, "Oslash" -> 0xD8, "Ugrave" -> 0xD9,
      "Uacute" -> 0xDA, "Ucircumflex" -> 0xDB, "Udieresis" -> 0xDC,
      "Yacute" -> 0xDD, "Thorn" -> 0xDE, "germandbls" -> 0xDF,
      "agrave" -> 0xE0, "aacute" -> 0xE1, "acircumflex" -> 0xE2,
      "atilde" -> 0xE3, "adieresis" -> 0xE4, "aring" -> 0xE5, "ae" -> 0xE6,
      "ccedilla" -> 0xE7, "egrave" -> 0xE8, "eacute" -> 0xE9,
      "ecircumflex" -> 0xEA, "edieresis" -> 0xEB, "igrave" -> 0xEC,
      "iacute" -> 0xED, "icircumflex" -> 0xEE, "idieresis" -> 0xEF,
      "eth" -> 0xF0, "ntilde" -> 0xF1, "ograve" -> 0xF2, "oacute" -> 0xF3,
      "ocircumflex" -> 0xF4, "otilde" -> 0xF5, "odieresis" -> 0xF6,
      "divide" -> 0xF7, "oslash" -> 0xF8, "ugrave" -> 0xF9,
      "uacute" -> 0xFA, "ucircumflex" -> 0xFB, "udieresis" -> 0xFC,
      "yacute" -> 0xFD, "thorn" -> 0xFE, "ydieresis" -> 0xFF)
    val typographic = Seq(
      "quoteleft" -> 0x2018, "quoteright" -> 0x2019,
      "quotesinglbase" -> 0x201A, "quotedblleft" -> 0x201C,
      "quotedblright" -> 0x201D, "quotedblbase" -> 0x201E,
      "endash" -> 0x2013, "emdash" -> 0x2014, "bullet" -> 0x2022,
      "ellipsis" -> 0x2026, "dagger" -> 0x2020, "daggerdbl" -> 0x2021,
      "perthousand" -> 0x2030, "guilsinglleft" -> 0x2039,
      "guilsinglright" -> 0x203A, "florin" -> 0x0192,
      "fraction" -> 0x2044, "minus" -> 0x2212, "Euro" -> 0x20AC,
      "trademark" -> 0x2122, "OE" -> 0x0152, "oe" -> 0x0153,
      "Scaron" -> 0x0160, "scaron" -> 0x0161, "Ydieresis" -> 0x0178,
      "Zcaron" -> 0x017D, "zcaron" -> 0x017E, "circumflex" -> 0x02C6,
      "tilde" -> 0x02DC, "breve" -> 0x02D8, "dotaccent" -> 0x02D9,
      "ring" -> 0x02DA, "ogonek" -> 0x02DB, "hungarumlaut" -> 0x02DD,
      "caron" -> 0x02C7, "dotlessi" -> 0x0131, "Lslash" -> 0x0141,
      "lslash" -> 0x0142, "fi" -> 0xFB01, "fl" -> 0xFB02)
    (ascii ++ latin1Sup ++ typographic)
      .map { case (n, cp) => n -> new String(Character.toChars(cp)) }.toMap
  }

  /** A /ToUnicode CMap's code → text mapping (ISO 32000 §9.10.3 /
    * Adobe CMap grammar, the bfchar/bfrange subset every PDF writer
    * emits): `beginbfchar <src> <dstUtf16> … endbfchar` and
    * `beginbfrange <lo> <hi> <dstStart>|[<dst>…] endbfrange`; range
    * increments apply to the LAST UTF-16 code unit (the spec rule). */
  private[expressions] def parseToUnicode(src: String): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    def utf16(hex: String): String = {
      if (hex.length % 4 != 0)
        fail(s"CMap destination <$hex> is not whole UTF-16 code units")
      new String(hex.grouped(2).map(h =>
        Integer.parseInt(h, 16).toByte).toArray, "UTF-16BE")
    }
    val hx = """<([0-9A-Fa-f]+)>"""
    (hx + """\s*""" + hx).r.findAllMatchIn(
      """beginbfchar([\s\S]*?)endbfchar""".r.findAllMatchIn(src)
        .map(_.group(1)).mkString("\n")).foreach { m =>
      out += Integer.parseInt(m.group(1), 16) -> utf16(m.group(2))
    }
    (hx + """\s*""" + hx + """\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)""").r
      .findAllMatchIn(
        """beginbfrange([\s\S]*?)endbfrange""".r.findAllMatchIn(src)
          .map(_.group(1)).mkString("\n")).foreach { m =>
      val lo = Integer.parseInt(m.group(1), 16)
      val hi = Integer.parseInt(m.group(2), 16)
      if (hi < lo) fail(s"CMap bfrange <${m.group(1)}> > <${m.group(2)}>")
      val dst = m.group(3)
      if (dst.startsWith("[")) {
        val items = hx.r.findAllMatchIn(dst).map(_.group(1)).toSeq
        if (items.length != hi - lo + 1)
          fail(s"CMap bfrange array has ${items.length} entries for ${hi - lo + 1} codes")
        items.zipWithIndex.foreach { case (h, k) =>
          out += (lo + k) -> utf16(h) }
      } else {
        val base = utf16(dst.substring(1, dst.length - 1)).toCharArray
        var code = lo
        while (code <= hi) {
          val cs = base.clone()
          cs(cs.length - 1) = (cs(cs.length - 1) + (code - lo)).toChar
          out += code -> new String(cs)
          code += 1
        }
      }
    }
    out.result()
  }

  /** Minimal content-stream interpreter: tokens per the real grammar,
    * graphics state = the CTM under a q/Q stack and `cm` composition,
    * text state = Tm/Td/TD/T* line tracking inside BT…ET. Emits one
    * text block per BT…ET and one image per `Do` of an /Image
    * XObject. */
  private def interpret(content: Array[Byte], xobjects: Map[String, Int],
      fonts: Map[String, (FontMode, FontWidths)],
      doc: Map[Int, (String, Option[Array[Byte]])],
      onText: (String, Double, Double, Double, Double) => Unit,
      onImage: (Int, Array[Byte], Double, Double, Double, Double) => Unit): Unit = {
    val toks = tokenize(content)
    // 2D affine as (a, b, c, d, e, f); PDF row-vector convention
    type Mat = (Double, Double, Double, Double, Double, Double)
    val id: Mat = (1, 0, 0, 1, 0, 0)
    def mul(m: Mat, n: Mat): Mat = (
      m._1 * n._1 + m._2 * n._3, m._1 * n._2 + m._2 * n._4,
      m._3 * n._1 + m._4 * n._3, m._3 * n._2 + m._4 * n._4,
      m._5 * n._1 + m._6 * n._3 + n._5, m._5 * n._2 + m._6 * n._4 + n._6)
    var ctm: Mat = id
    val gsStack = scala.collection.mutable.Stack.empty[Mat]
    var inText = false
    var tm: Mat = id   // text line matrix (leading tracked via TL)
    var leading = 0.0
    var fontSize = 12.0
    // current font's byte → text mode (simple Latin-1 / CID / diff)
    var curFont: FontMode = SimpleFont
    var curWidths: FontWidths = EstimateWidths
    var blockText = new StringBuilder
    var blockWidth = 0.0
    var blockAnchor: Option[(Double, Double)] = None
    val operands = ArrayBuffer.empty[PdfTok]
    def num(t: PdfTok): Double = t match {
      case PdfNum(v) => v
      case other => fail(s"expected number operand, got $other")
    }
    def show(raw: String): Unit = {
      // string tokens carry one BYTE per char; composite Identity
      // fonts remap 2-byte CIDs through the font's decode table,
      // /Differences fonts overlay named bytes, simple fonts read
      // the bytes as Latin-1 (the token form)
      val s = curFont match {
        case SimpleFont => raw
        case DiffFont(m) =>
          raw.flatMap(c => m.getOrElse(c.toInt, c.toString))
        case CidFont(cmap) =>
          if (raw.length % 2 != 0)
            fail("odd-length string shown with a 2-byte CID font")
          raw.grouped(2).map { p =>
            val code = ((p(0) & 0xFF) << 8) | (p(1) & 0xFF)
            cmap.getOrElse(code,
              fail(f"CID 0x$code%04X has no Unicode mapping in the " +
                "font's /ToUnicode CMap or embedded cmap"))
          }.mkString
        case CharsetFont(cs) =>
          // the token carries one byte per char; those bytes ARE the
          // CMap's legacy-charset codes (mixed 1-/2-byte sequences —
          // the charset's own code space does the splitting). A
          // malformed sequence is unrecoverable text: loud, never
          // silent replacement-char mojibake.
          val bytes = new Array[Byte](raw.length)
          var bi = 0
          while (bi < raw.length) { bytes(bi) = raw.charAt(bi).toByte; bi += 1 }
          decodeCharsetStrict(bytes, cs)
        case EucRawFont(cs) =>
          // raw 94x94 codes: validate the 0x21-0x7E 2-byte space,
          // OR 0x80 onto each byte, decode the EUC charset strictly
          if (raw.length % 2 != 0)
            fail("odd-length string shown with a 2-byte raw-ordering font")
          val bytes = new Array[Byte](raw.length)
          var bi = 0
          while (bi < raw.length) {
            val v = raw.charAt(bi).toInt & 0xFF
            if (v < 0x21 || v > 0x7E)
              fail(f"byte 0x$v%02X outside the 94x94 raw code space " +
                s"of the $cs-backed ordering")
            bytes(bi) = (v | 0x80).toByte
            bi += 1
          }
          decodeCharsetStrict(bytes, cs)
        case Ucs2Font =>
          if (raw.length % 2 != 0)
            fail("odd-length string shown with a 2-byte UCS2 font")
          val chars = new Array[Char](raw.length / 2)
          var k = 0
          while (k < chars.length) {
            chars(k) = (((raw(2 * k) & 0xFF) << 8) |
              (raw(2 * k + 1) & 0xFF)).toChar
            k += 1
          }
          // UTF-16 pairing check: a lone surrogate would become U+FFFD
          // mojibake downstream — loud instead
          k = 0
          while (k < chars.length) {
            if (Character.isHighSurrogate(chars(k))) {
              if (k + 1 >= chars.length || !Character.isLowSurrogate(chars(k + 1)))
                fail(f"UCS2 string carries an unpaired high surrogate 0x${chars(k).toInt}%04X")
              k += 2
            } else if (Character.isLowSurrogate(chars(k)))
              fail(f"UCS2 string carries an unpaired low surrogate 0x${chars(k).toInt}%04X")
            else k += 1
          }
          new String(chars)
      }
      if (blockAnchor.isEmpty) {
        val dev = mul(tm, ctm)
        blockAnchor = Some((dev._5, dev._6))
      }
      blockText.append(s)
      // extent advance for this segment: the font's DECLARED metrics
      // when the file carries them (simple /Widths over byte codes,
      // composite /W over 2-byte CIDs — the curFont/curWidths pairing
      // guards a mismatched declaration), else the historical 0.5 em
      // per DECODED char. TJ kerning adjustments are deliberately
      // ignored both ways: the block bbox is metrics, not layout.
      blockWidth += ((curFont, curWidths) match {
        case (SimpleFont | DiffFont(_), sw: SimpleWidths) =>
          var acc = 0.0
          var i = 0
          while (i < raw.length) { acc += sw.of(raw.charAt(i).toInt & 0xFF); i += 1 }
          acc / 1000.0 * fontSize
        case (CidFont(_), cw: CidWidths) =>
          var acc = 0.0
          var i = 0
          while (i + 1 < raw.length) {
            acc += cw.of(((raw.charAt(i) & 0xFF) << 8) | (raw.charAt(i + 1) & 0xFF))
            i += 2
          }
          acc / 1000.0 * fontSize
        case _ => 0.5 * fontSize * s.length
      })
    }
    def newline(): Unit = if (blockText.nonEmpty) blockText.append('\n')
    def flushBlock(): Unit = {
      val t = blockText.toString
      if (t.trim.nonEmpty) {
        val (x0, y0) = blockAnchor.getOrElse((0.0, 0.0))
        // anchor exact; extent from accumulated per-segment advances
        // (declared metrics where present — see show())
        onText(t, x0, y0, x0 + blockWidth, y0 + fontSize)
      }
      blockText = new StringBuilder
      blockWidth = 0.0
      blockAnchor = None
    }
    toks.foreach {
      case op: PdfOp => op.name match {
        case "q" => gsStack.push(ctm); operands.clear()
        case "Q" => if (gsStack.nonEmpty) ctm = gsStack.pop(); operands.clear()
        case "cm" =>
          if (operands.length < 6) fail("cm needs 6 operands")
          val o = operands.takeRight(6).map(num)
          ctm = mul((o(0), o(1), o(2), o(3), o(4), o(5)), ctm)
          operands.clear()
        case "BT" =>
          inText = true; tm = id; leading = 0.0; operands.clear()
        case "ET" =>
          flushBlock(); inText = false; operands.clear()
        case "Tf" =>
          if (operands.nonEmpty) fontSize = num(operands.last)
          if (operands.length >= 2) operands(operands.length - 2) match {
            case PdfName(fname) =>
              // a name the Resources table doesn't carry keeps the
              // prior decode mode (the recovery rule: damaged
              // resources shouldn't kill a simple-font page)
              fonts.get(fname).foreach { case (fm, fw) =>
                curFont = fm; curWidths = fw
              }
            case _ => ()
          }
          operands.clear()
        case "Tm" =>
          if (operands.length < 6) fail("Tm needs 6 operands")
          val o = operands.takeRight(6).map(num)
          tm = (o(0), o(1), o(2), o(3), o(4), o(5))
          operands.clear()
        case "Td" | "TD" =>
          if (operands.length < 2) fail(s"${op.name} needs 2 operands")
          val ty = num(operands.last); val tx = num(operands(operands.length - 2))
          if (op.name == "TD") leading = -ty
          tm = mul((1, 0, 0, 1, tx, ty), tm)
          if (inText) newline()
          operands.clear()
        case "TL" =>
          if (operands.nonEmpty) leading = num(operands.last)
          operands.clear()
        case "T*" =>
          tm = mul((1, 0, 0, 1, 0, -leading), tm)
          if (inText) newline()
          operands.clear()
        case "Tj" =>
          operands.lastOption match {
            case Some(PdfStr(s)) => show(s)
            case other => fail(s"Tj needs a string, got $other")
          }
          operands.clear()
        case "'" | "\"" =>
          tm = mul((1, 0, 0, 1, 0, -leading), tm)
          newline()
          operands.lastOption match {
            case Some(PdfStr(s)) => show(s)
            case other => fail(s"${op.name} needs a string, got $other")
          }
          operands.clear()
        case "TJ" =>
          operands.lastOption match {
            case Some(PdfArr(items)) =>
              items.foreach { case PdfStr(s) => show(s); case _ => () }
            case other => fail(s"TJ needs an array, got $other")
          }
          operands.clear()
        case "Do" =>
          operands.lastOption match {
            case Some(PdfName(n)) =>
              xobjects.get(n).foreach { objNum =>
                val dict = doc.get(objNum).map(_._1).getOrElse("")
                if (dict.contains("/Image")) {
                  // unit square through the CTM
                  val corners = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0))
                    .map { case (x, y) =>
                      (x * ctm._1 + y * ctm._3 + ctm._5,
                        x * ctm._2 + y * ctm._4 + ctm._6) }
                  onImage(objNum, imageBytes(doc, objNum),
                    corners.map(_._1).min, corners.map(_._2).min,
                    corners.map(_._1).max, corners.map(_._2).max)
                }
              }
            case other => fail(s"Do needs a name, got $other")
          }
          operands.clear()
        case _ => operands.clear() // any other operator consumes its operands
      }
      case t => operands += t
    }
  }

  private sealed trait PdfTok
  private case class PdfNum(v: Double) extends PdfTok
  private case class PdfStr(s: String) extends PdfTok
  private case class PdfName(s: String) extends PdfTok
  private case class PdfArr(items: Seq[PdfTok]) extends PdfTok
  private case class PdfOp(name: String) extends PdfTok

  private def tokenize(content: Array[Byte]): Seq[PdfTok] = {
    val out = ArrayBuffer.empty[PdfTok]
    val stack = scala.collection.mutable.Stack.empty[ArrayBuffer[PdfTok]]
    var cur = out
    val n = content.length
    var i = 0
    def c(j: Int): Char = (content(j) & 0xFF).toChar
    def isWs(ch: Char) = ch == ' ' || ch == '\n' || ch == '\r' ||
      ch == '\t' || ch == '\f' || ch == 0.toChar
    def isDelim(ch: Char) = "()<>[]{}/%".contains(ch)
    while (i < n) {
      val ch = c(i)
      if (isWs(ch)) i += 1
      else if (ch == '%') { while (i < n && c(i) != '\n' && c(i) != '\r') i += 1 }
      else if (ch == '[') { stack.push(cur); cur = ArrayBuffer.empty; i += 1 }
      else if (ch == ']') {
        val items = cur
        cur = if (stack.nonEmpty) stack.pop() else out
        cur += PdfArr(items.toSeq)
        i += 1
      }
      else if (ch == '(') {
        val sb = new StringBuilder
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val x = c(i)
          if (x == '\\' && i + 1 < n) {
            val e = c(i + 1)
            e match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case '(' => sb.append('('); i += 2
              case ')' => sb.append(')'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case '\r' => i += 2; if (i < n && c(i) == '\n') i += 1 // continuation
              case '\n' => i += 2
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0; i += 1
                while (k < 3 && i < n && c(i) >= '0' && c(i) <= '7') {
                  v = v * 8 + (c(i) - '0'); i += 1; k += 1
                }
                sb.append(v.toChar)
              case other => sb.append(other); i += 2
            }
          } else if (x == '(') { depth += 1; sb.append(x); i += 1 }
          else if (x == ')') {
            depth -= 1
            if (depth > 0) sb.append(x)
            i += 1
          }
          else { sb.append(x); i += 1 }
        }
        if (depth != 0) fail("unterminated literal string")
        cur += PdfStr(sb.toString)
      }
      else if (ch == '<' && i + 1 < n && c(i + 1) == '<') {
        // inline dictionary (e.g. BDC property lists): skip balanced
        var depth = 1
        i += 2
        while (i < n && depth > 0) {
          if (c(i) == '<' && i + 1 < n && c(i + 1) == '<') { depth += 1; i += 2 }
          else if (c(i) == '>' && i + 1 < n && c(i + 1) == '>') { depth -= 1; i += 2 }
          else i += 1
        }
      }
      else if (ch == '<') {
        val sb = new StringBuilder
        i += 1
        val hex = new StringBuilder
        while (i < n && c(i) != '>') {
          if (!isWs(c(i))) hex.append(c(i))
          i += 1
        }
        if (i >= n) fail("unterminated hex string")
        i += 1
        val h = if (hex.length % 2 == 1) hex.append('0').toString else hex.toString
        var k = 0
        while (k + 1 < h.length + 1 && k + 2 <= h.length) {
          sb.append(Integer.parseInt(h.substring(k, k + 2), 16).toChar)
          k += 2
        }
        cur += PdfStr(sb.toString)
      }
      else if (ch == '/') {
        val start = i + 1
        i += 1
        while (i < n && !isWs(c(i)) && !isDelim(c(i))) i += 1
        cur += PdfName(latin1(content, start, i))
      }
      else if (ch == '+' || ch == '-' || ch == '.' || (ch >= '0' && ch <= '9')) {
        val start = i
        i += 1
        while (i < n && (c(i) == '.' || (c(i) >= '0' && c(i) <= '9'))) i += 1
        cur += PdfNum(latin1(content, start, i).toDouble)
      }
      else {
        val start = i
        while (i < n && !isWs(c(i)) && !isDelim(c(i))) i += 1
        if (i == start) fail(s"unexpected byte '${ch}' in content stream")
        val op = latin1(content, start, i)
        if (op == "ID") {
          // inline image payload (BI <dict> ID <binary> EI, §8.9.7):
          // raster bytes are opaque to text extraction — skip to the
          // whitespace-delimited EI terminator (one whitespace byte
          // separates ID from the data). The BI dict tokens already
          // emitted are inert names/numbers the interpreter discards;
          // a payload that happens to contain ws+EI+ws ends the skip
          // early, and the stray remainder then fails tokenization
          // LOUDLY rather than polluting extracted text.
          if (i < n && isWs(c(i))) i += 1
          var end = -1
          var j = i
          while (end < 0 && j + 2 < n) {
            if (isWs(c(j)) && c(j + 1) == 'E' && c(j + 2) == 'I' &&
                (j + 3 >= n || isWs(c(j + 3)) || isDelim(c(j + 3))))
              end = j
            j += 1
          }
          if (end < 0) fail("inline image without an EI terminator")
          i = end + 3
        } else cur += PdfOp(op)
      }
    }
    out.toSeq
  }
}
