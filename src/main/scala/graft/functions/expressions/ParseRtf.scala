package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parser for REAL RTF payloads — the last common office format the
  * seam was missing (legacy Word exports, WordPad, email attachments).
  * A from-scratch reader of the public RTF 1.9 grammar: control
  * words, group nesting, destination skipping — no library, like
  * every parser here.
  *
  *  - document text accumulates into PARAGRAPHS (`\par` breaks;
  *    `\line` → newline, `\tab` → TAB inside one), one row per
  *    non-empty paragraph with its document-order ordinal as
  *    content_id (empty ones still claim theirs — the DOCX
  *    discipline); a final unterminated paragraph flushes at EOF;
  *  - non-text DESTINATIONS skip whole: `\fonttbl`, `\colortbl`,
  *    `\stylesheet`, `\info`, `\header*`/`\footer*`, field
  *    instructions, and every `{\*\...}` optional destination —
  *    their text is formatting metadata, not content;
  *  - `\pict` emits an IMAGE row: the hex payload decodes to bytes
  *    (base64'd), content_id = the picture ordinal offset by 1000
  *    (RTF pictures carry no ids), bbox = (0, 0, \picw, \pich);
  *  - escapes: `\'xx` is a cp1252-ish byte (decoded ISO-8859-1 —
  *    the 0x80–0x9F window is out of scope and decodes as Latin-1),
  *    `\uN` is a signed 16-bit code unit whose ANSI fallback (the
  *    next `\ucN` characters, default 1) is consumed, `\{ \} \\`
  *    are literals, `\~` is a non-breaking space;
  *  - a raw CR/LF in the source is ignored (RTF writers wrap lines
  *    freely — spec §"Contents of an RTF File").
  *
  * The container check is loud (must open with `{\rtf` — RTF is
  * machine-written) but the body is tolerant: unknown control words
  * skip (with their delimiter space), stray closers are ignored —
  * decades of writer dialects demand it. Output schema =
  * [[ParseGft]]'s; page_num 0 (flow format, no pages until layout). */
case class ParseRtf(child: Expression)
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
      s"ParseRtf needs a binary payload, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ParseRtf.parse(input.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(c: Expression): ParseRtf =
    copy(child = c)
}

object ParseRtf {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParseRtf(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  private val TextBlock = UTF8String.fromString("text_block")
  private val Image = UTF8String.fromString("image")

  /** Destinations whose content is never document text. */
  private val Skipped: Set[String] = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "header", "headerl",
    "headerr", "headerf", "footer", "footerl", "footerr", "footerf",
    "field", "fldinst", "themedata", "datastore", "xmlnstbl",
    "listtable", "listoverridetable", "revtbl",
    // Word writes every picture TWICE ({\*\shppict png}{\nonshppict wmf});
    // the fallback copy must not double the image rows
    "nonshppict")

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"RTF parse: $what")

  private final case class Frame(skip: Boolean, pict: Boolean, uc: Int)

  private[graft] def parse(bytes: Array[Byte]): Array[Any] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("{\\rtf"))
      fail("payload does not open with {\\rtf (not an RTF?)")
    val out = ArrayBuffer.empty[Any]
    val para = new StringBuilder
    var pIdx = 0
    var picIdx = 0
    // current group state rides a stack; the destination-skip and the
    // \ucN fallback count are GROUP-scoped per the spec
    var stack = List(Frame(skip = false, pict = false, uc = 1))
    var picw = 0.0
    var pich = 0.0
    val picHex = new StringBuilder
    def flushPara(): Unit = {
      if (para.nonEmpty)
        out += InternalRow(0L, TextBlock,
          UTF8String.fromString(pIdx.toString),
          UTF8String.fromString(para.result()), 0.0, 0.0, 0.0, 0.0)
      para.clear()
      pIdx += 1 // empty paragraphs still claim their ordinal
    }
    def flushPict(): Unit = {
      val hex = picHex.result()
      if (hex.isEmpty) { picw = 0.0; pich = 0.0; return } // \bin blob skipped
      val data = new Array[Byte](hex.length / 2)
      var k = 0
      while (k < data.length) {
        data(k) = ((Character.digit(hex.charAt(2 * k), 16) << 4) |
          Character.digit(hex.charAt(2 * k + 1), 16)).toByte
        k += 1
      }
      out += InternalRow(0L, Image,
        UTF8String.fromString((1000 + picIdx).toString),
        UTF8String.fromString(
          java.util.Base64.getEncoder.encodeToString(data)),
        0.0, 0.0, picw, pich)
      picIdx += 1
      picHex.clear(); picw = 0.0; pich = 0.0
    }
    val n = s.length
    var p = 0
    var justOpened = false // a control word right after '{' can name a destination
    while (p < n) {
      val c = s.charAt(p)
      val top = stack.head
      c match {
        case '{' =>
          stack ::= top.copy(pict = false)
          justOpened = true
          p += 1
        case '}' =>
          if (top.pict) flushPict()
          if (stack.tail.nonEmpty) stack = stack.tail // stray '}' ignored
          justOpened = false
          p += 1
        case '\r' | '\n' => p += 1
        case '\\' if p + 1 < n =>
          val opened = justOpened
          justOpened = false
          val c1 = s.charAt(p + 1)
          if (c1 == '{' || c1 == '}' || c1 == '\\') {
            if (!top.skip) para.append(c1)
            p += 2
          } else if (c1 == '~') {
            if (!top.skip) para.append(' ')
            p += 2
          } else if (c1 == '\'') {
            if (p + 3 < n) {
              val b = (Character.digit(s.charAt(p + 2), 16) << 4) |
                Character.digit(s.charAt(p + 3), 16)
              if (b >= 0 && !top.skip) para.append(b.toChar)
              p += 4
            } else p = n
          } else if (c1 == '*' && opened) {
            justOpened = true // the named destination follows
            // {\*\dest ...}: optional destination — skip the group
            stack = top.copy(skip = true) :: stack.tail
            p += 2
          } else if (c1.isLetter) {
            var q = p + 1
            while (q < n && s.charAt(q).isLetter) q += 1
            val word = s.substring(p + 1, q)
            var param = 0L
            var hasParam = false
            if (q < n && (s.charAt(q) == '-' || s.charAt(q).isDigit)) {
              val neg = s.charAt(q) == '-'
              if (neg) q += 1
              val d0 = q
              while (q < n && s.charAt(q).isDigit) q += 1
              if (q > d0) {
                hasParam = true
                param = s.substring(d0, q).toLong
                if (neg) param = -param
              }
            }
            if (q < n && s.charAt(q) == ' ') q += 1 // the delimiter space
            word match {
              case _ if opened && Skipped(word) =>
                stack = top.copy(skip = true) :: stack.tail
              case "shppict" =>
                // {\*\shppict ...} is an optional destination this
                // reader UNDERSTANDS (Word's primary picture): undo
                // the \* skip unless an ancestor is itself skipped
                stack = stack.head.copy(
                  skip = stack.tail.headOption.exists(_.skip)) :: stack.tail
              case "pict" =>
                // a pict inside an already-skipped destination (the
                // \nonshppict WMF fallback) must not arm collection
                stack = top.copy(skip = true, pict = !top.skip) :: stack.tail
              case "picw" if stack.head.pict => picw = param.toDouble
              case "pich" if stack.head.pict => pich = param.toDouble
              case "par" => if (!stack.head.skip) flushPara()
              // table cells: \cell (and the nested-table twins) end a
              // text run exactly like \par — each cell lands as its
              // own ordinal row (cell-aware ids); without this, two
              // adjacent cells' words would CONCATENATE ("alphabeta").
              // \row closes the row; a well-formed writer emitted
              // \cell before it, so the flush is usually a no-op that
              // just claims the ordinal for an empty trailing cell.
              case "cell" | "nestcell" | "row" | "nestrow" =>
                if (!stack.head.skip) flushPara()
              case "line" => if (!stack.head.skip) para.append('\n')
              case "tab" => if (!stack.head.skip) para.append('\t')
              // the symbol words a real Word export leans on — dropping
              // them as "unknown" would silently delete punctuation
              case "emdash" => if (!stack.head.skip) para.append('\u2014')
              case "endash" => if (!stack.head.skip) para.append('\u2013')
              case "lquote" => if (!stack.head.skip) para.append('\u2018')
              case "rquote" => if (!stack.head.skip) para.append('\u2019')
              case "ldblquote" => if (!stack.head.skip) para.append('\u201C')
              case "rdblquote" => if (!stack.head.skip) para.append('\u201D')
              case "bullet" => if (!stack.head.skip) para.append('\u2022')
              case "enspace" | "emspace" | "qmspace" =>
                if (!stack.head.skip) para.append(' ')
              // \binN: the next N bytes are RAW BINARY (a non-hex pict
              // payload) — they must not reach the tokenizer, where a
              // 0x7D byte would pop the group and garble the document
              case "bin" if hasParam && param > 0 =>
                q = math.min(n.toLong, q + param).toInt
              case "uc" => stack = stack.head.copy(
                uc = math.max(0, param.toInt)) :: stack.tail
              case "u" =>
                if (!stack.head.skip)
                  para.append((param & 0xFFFF).toChar) // signed 16-bit unit
                // consume the ANSI fallback: uc characters, where an
                // \'xx escape counts as ONE character
                var left = stack.head.uc
                while (left > 0 && q < n) {
                  if (s.charAt(q) == '\\' && q + 3 < n && s.charAt(q + 1) == '\'')
                    q += 4
                  else q += 1
                  left -= 1
                }
              case _ => () // unknown control word: skipped, spec rule
            }
            p = q
          } else p += 2 // \<symbol>: unknown control symbol, skipped
        case _ =>
          if (stack.head.pict) {
            if (Character.digit(c, 16) >= 0) picHex.append(c)
          } else if (!stack.head.skip) {
            para.append(c) // plain spaces ARE content
          }
          justOpened = false
          p += 1
      }
    }
    flushPara() // an unterminated final paragraph still lands
    out.toArray
  }
}
