package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parser for REAL HTML payloads — the most common input of a
  * crawl-scale training-data pipeline (CommonCrawl-class corpora are
  * HTML first, PDF second), and the reference seam's first MARKUP
  * format (vector_db.py:180 routes only .pdf/.pptx; the binary-ingest
  * seam here is format-agnostic by design).
  *
  * A from-scratch TOLERANT tokenizer, not an XML parser — real crawl
  * HTML is tag soup and a loud parse would reject half the corpus, so
  * unlike the OPC formats this parser never throws: it extracts what
  * the markup structure supports and drops what it cannot read.
  *
  *  - `script`/`style`/`noscript`/`template` subtrees are dropped
  *    whole (raw-text scan to the matching close tag — a `<` inside
  *    JavaScript never opens a tag, HTML spec §13.2.5.*).
  *  - comments, DOCTYPE and processing instructions are skipped;
  *    unterminated ones run to end-of-input (quirks behavior).
  *  - void elements (img, br, hr, meta, …) never open a scope; an end
  *    tag with no matching open element is ignored; a new `p`/`li`/
  *    `td`/`th`/`tr`/`dt`/`dd`/`option` implicitly closes a same-name
  *    open element (the tag-soup rule that makes unclosed `<p>` legal).
  *  - text accumulates into BLOCK-LEVEL RUNS: inline tags (`a`,
  *    `span`, `b`, …) do not break a run, block boundaries flush it;
  *    whitespace is collapsed (`\s+` → one space, trimmed) — HTML
  *    source whitespace is not content. `br` contributes a break that
  *    collapses like any whitespace. Entities (named core set +
  *    `&#NNN;`/`&#xHH;`) are decoded in text and attribute values;
  *    an unknown entity stays verbatim rather than failing the page.
  *  - content_id is the run's DOM PATH with sibling ordinals
  *    (`/html[1]/body[1]/main[1]/p[3]`) — the stable document-derived
  *    identity a re-crawl can diff against.
  *  - content_type separates MAIN CONTENT (`text_block`) from
  *    BOILERPLATE (`boilerplate`): runs inside `head` (incl. `title`),
  *    `nav`, `header`, `footer`, or `aside` subtrees — the
  *    main-content-extraction split a curation gate needs
  *    ([[graft.operators.DocParse.boilerplateRatio]]).
  *  - `img` emits an image row at the element's own path: content_raw
  *    is the base64 payload of a `data:` URI (or the raw src string
  *    for a remote reference — fetch is out of scope), bbox =
  *    (0, 0, width, height) from the attributes when numeric.
  *
  * Output schema = [[ParseGft]]'s; page_num is 0 throughout (HTML has
  * no pages). Payload bytes decode through the WHATWG encoding sniff
  * ([[CharsetSniff]]: BOM, then the optional TRANSPORT hint — an HTTP
  * Content-Type, the WARC path carries it — then the meta prescan,
  * then UTF-8), always with replacement: a wrong or missing charset
  * degrades to replacement characters rather than failing the page. */
case class ParseHtml(payload: Expression, hint: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(payload, hint)
  override def nullable: Boolean = payload.nullable
  override def foldable: Boolean = children.forall(_.foldable)

  override def dataType: DataType = ArrayType(new StructType()
    .add("page_num", LongType)
    .add("content_type", StringType)
    .add("content_id", StringType)
    .add("content_raw", StringType)
    .add("x0", DoubleType).add("y0", DoubleType)
    .add("x1", DoubleType).add("y1", DoubleType))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (payload.dataType == BinaryType && hint.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "ParseHtml needs (binary payload, string charset hint), got " +
        s"(${payload.dataType.catalogString}, ${hint.dataType.catalogString})")

  override def eval(input: InternalRow): Any = {
    val p = payload.eval(input)
    if (p == null) null
    else {
      val h = hint.eval(input)
      new GenericArrayData(ParseHtml.parse(CharsetSniff.decode(
        p.asInstanceOf[Array[Byte]],
        if (h == null) null else h.toString)))
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ParseHtml =
    copy(payload = c(0), hint = c(1))
}

object ParseHtml {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParseHtml(org.apache.spark.sql.graft.ColumnBridge.expression(payload),
        org.apache.spark.sql.catalyst.expressions.Literal(null, StringType)))

  /** With a transport-layer charset hint (an HTTP Content-Type value
    * or bare charset label; null/absent values fall through the
    * sniff). */
  def apply(payload: Column, hint: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ParseHtml(org.apache.spark.sql.graft.ColumnBridge.expression(payload),
        org.apache.spark.sql.graft.ColumnBridge.expression(hint)))

  /** Elements that flush text runs and own them (CSS block-ish set). */
  private val Block: Set[String] = Set(
    "html", "head", "body", "title", "main", "section", "article", "nav",
    "aside", "header", "footer", "div", "p", "h1", "h2", "h3", "h4", "h5",
    "h6", "ul", "ol", "li", "dl", "dt", "dd", "table", "thead", "tbody",
    "tfoot", "tr", "td", "th", "caption", "blockquote", "pre", "figure",
    "figcaption", "form", "fieldset", "address", "details", "summary")

  /** Never open a scope (HTML spec §13.1.2 void elements). */
  private val Void: Set[String] = Set("area", "base", "br", "col", "embed",
    "hr", "img", "input", "link", "meta", "param", "source", "track", "wbr")

  /** Content dropped whole — raw-text scan to the close tag. */
  private val Dropped: Set[String] =
    Set("script", "style", "noscript", "template")

  /** Subtree roots whose text is boilerplate, not main content. */
  private val Boiler: Set[String] =
    Set("head", "nav", "header", "footer", "aside")

  /** A same-name open element is implicitly closed by the next start
    * tag (the common tag-soup shapes; full spec scope lists differ
    * per element, same-name is the 99% case). */
  private val ImplicitClose: Set[String] =
    Set("p", "li", "td", "th", "tr", "dt", "dd", "option")

  /** The HTML 4.01 named entity tables (the public spec's three
    * sets — Latin-1 block, "special", and the common symbols), not
    * just the XML five: real stylesheet-generated pages (the DocBook
    * manual WildInputSpec feeds through) write `&copy;`/`&mdash;`
    * freely, and an undecoded name pollutes the text stream every
    * downstream tokenizer sees. The Latin-1 block is generated from
    * the spec's name order (exactly codepoints 160..255); `nbsp`
    * then OVERRIDES to a plain space — the existing normalization
    * (a U+00A0 would split tokens differently than the whitespace
    * tokenizer expects). Unknown names still stay verbatim. */
  private val Entities: Map[String, String] = {
    val latin1 = ("nbsp iexcl cent pound curren yen brvbar sect uml copy " +
      "ordf laquo not shy reg macr deg plusmn sup2 sup3 acute micro para " +
      "middot cedil sup1 ordm raquo frac14 frac12 frac34 iquest Agrave " +
      "Aacute Acirc Atilde Auml Aring AElig Ccedil Egrave Eacute Ecirc " +
      "Euml Igrave Iacute Icirc Iuml ETH Ntilde Ograve Oacute Ocirc " +
      "Otilde Ouml times Oslash Ugrave Uacute Ucirc Uuml Yacute THORN " +
      "szlig agrave aacute acirc atilde auml aring aelig ccedil egrave " +
      "eacute ecirc euml igrave iacute icirc iuml eth ntilde ograve " +
      "oacute ocirc otilde ouml divide oslash ugrave uacute ucirc uuml " +
      "yacute thorn yuml").split(" ").zipWithIndex
      .map { case (n, i) => n -> (160 + i).toChar.toString }.toMap
    val special = Map(
      "quot" -> "\"", "amp" -> "&", "lt" -> "<", "gt" -> ">",
      "apos" -> "'", "OElig" -> "Œ", "oelig" -> "œ",
      "Scaron" -> "Š", "scaron" -> "š", "Yuml" -> "Ÿ",
      "circ" -> "ˆ", "tilde" -> "˜", "ensp" -> " ",
      "emsp" -> " ", "thinsp" -> " ", "ndash" -> "–",
      "mdash" -> "—", "lsquo" -> "‘", "rsquo" -> "’",
      "sbquo" -> "‚", "ldquo" -> "“", "rdquo" -> "”",
      "bdquo" -> "„", "dagger" -> "†", "Dagger" -> "‡",
      "permil" -> "‰", "lsaquo" -> "‹", "rsaquo" -> "›",
      "euro" -> "€")
    val symbols = Map(
      "bull" -> "•", "hellip" -> "…", "prime" -> "′",
      "Prime" -> "″", "trade" -> "™", "minus" -> "−",
      "larr" -> "←", "uarr" -> "↑", "rarr" -> "→",
      "darr" -> "↓", "harr" -> "↔", "infin" -> "∞",
      "ne" -> "≠", "le" -> "≤", "ge" -> "≥",
      "asymp" -> "≈", "radic" -> "√", "sdot" -> "⋅")
    latin1 ++ special ++ symbols ++ Map("nbsp" -> " ")
  }

  private val TextBlock = UTF8String.fromString("text_block")
  private val Boilerplate = UTF8String.fromString("boilerplate")
  private val Image = UTF8String.fromString("image")

  /** Decode character references; unknown names stay verbatim. */
  private[graft] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        // a reference longer than &#x10FFFF; is no reference at all
        if (semi < 0 || semi - i > 10) { sb.append('&'); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (name.startsWith("#x") || name.startsWith("#X"))
              try Some(new String(Character.toChars(
                Integer.parseInt(name.substring(2), 16))))
              catch { case _: Exception => None }
            else if (name.startsWith("#"))
              try Some(new String(Character.toChars(
                Integer.parseInt(name.substring(1)))))
              catch { case _: Exception => None }
            else Entities.get(name)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append('&'); i += 1
          }
        }
      }
    }
    sb.result()
  }

  private def collapseWs(s: String): String =
    s.replaceAll("\\s+", " ").trim

  /** One open element: its full path, per-child-name ordinal counts,
    * and whether it sits inside a boilerplate subtree. */
  private final class Frame(val name: String, val path: String,
      val boiler: Boolean) {
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    def childOrdinal(child: String): Int = {
      val k = counts.getOrElse(child, 0) + 1
      counts.update(child, k)
      k
    }
  }

  private[graft] def parse(html: String): Array[Any] = {
    val out = ArrayBuffer.empty[Any]
    val root = new Frame("", "", boiler = false)
    var stack = List(root)
    val run = new StringBuilder
    var runPath: String = null
    var runBoiler = false

    def flushRun(): Unit = {
      val text = collapseWs(run.result())
      if (text.nonEmpty) {
        out += InternalRow(0L,
          if (runBoiler) Boilerplate else TextBlock,
          UTF8String.fromString(if (runPath == null) "/" else runPath),
          UTF8String.fromString(text), 0.0, 0.0, 0.0, 0.0)
      }
      run.clear()
      runPath = null
      runBoiler = false
    }
    def appendText(t: String): Unit = {
      if (runPath == null && t.exists(!_.isWhitespace)) {
        // the run is owned by the nearest open BLOCK element
        val owner = stack.find(f => Block(f.name))
        runPath = owner.map(_.path).filter(_.nonEmpty).orNull
        runBoiler = owner.exists(_.boiler)
      }
      run.append(t)
    }
    def push(name: String): Unit = {
      if (Block(name)) flushRun()
      val parent = stack.head
      val k = parent.childOrdinal(name)
      stack ::= new Frame(name, s"${parent.path}/$name[$k]",
        parent.boiler || Boiler(name))
    }
    def popTo(name: String): Unit =
      if (stack.exists(f => f.name == name)) {
        var done = false
        while (!done) {
          val top = stack.head
          if (Block(top.name)) flushRun()
          stack = stack.tail
          done = top.name == name
        }
      } // else: stray end tag, ignored

    val n = html.length
    var p = 0
    while (p < n) {
      val lt = html.indexOf('<', p)
      if (lt < 0) { appendText(decodeEntities(html.substring(p))); p = n }
      else {
        if (lt > p) appendText(decodeEntities(html.substring(p, lt)))
        if (lt + 1 >= n) p = n // a trailing lone '<' is text-ish; drop
        else html.charAt(lt + 1) match {
          case '!' =>
            if (html.startsWith("<!--", lt)) {
              val end = html.indexOf("-->", lt + 4)
              p = if (end < 0) n else end + 3
            } else {
              val end = html.indexOf('>', lt + 2) // DOCTYPE, CDATA-ish
              p = if (end < 0) n else end + 1
            }
          case '?' =>
            val end = html.indexOf('>', lt + 2)
            p = if (end < 0) n else end + 1
          case '/' =>
            var q = lt + 2
            while (q < n && (html.charAt(q).isLetterOrDigit)) q += 1
            val name = html.substring(lt + 2, q).toLowerCase(java.util.Locale.ROOT)
            val end = html.indexOf('>', q)
            if (name.nonEmpty) popTo(name)
            p = if (end < 0) n else end + 1
          case c if c.isLetter =>
            var q = lt + 1
            while (q < n && html.charAt(q).isLetterOrDigit) q += 1
            val name = html.substring(lt + 1, q).toLowerCase(java.util.Locale.ROOT)
            // attributes: name, name=bare, name='v', name="v"
            val attrs = scala.collection.mutable.HashMap.empty[String, String]
            var selfClose = false
            var open = true
            while (open && q < n) {
              while (q < n && html.charAt(q).isWhitespace) q += 1
              if (q < n && html.charAt(q) == '>') { q += 1; open = false }
              else if (q < n && html.charAt(q) == '/') {
                q += 1
                if (q < n && html.charAt(q) == '>') { selfClose = true; q += 1; open = false }
              } else if (q < n) {
                val a0 = q
                while (q < n && !html.charAt(q).isWhitespace &&
                  html.charAt(q) != '=' && html.charAt(q) != '>' &&
                  html.charAt(q) != '/') q += 1
                val aname = html.substring(a0, q).toLowerCase(java.util.Locale.ROOT)
                while (q < n && html.charAt(q).isWhitespace) q += 1
                var value = ""
                if (q < n && html.charAt(q) == '=') {
                  q += 1
                  while (q < n && html.charAt(q).isWhitespace) q += 1
                  if (q < n && (html.charAt(q) == '"' || html.charAt(q) == '\'')) {
                    val quote = html.charAt(q)
                    val vEnd = html.indexOf(quote, q + 1)
                    if (vEnd < 0) { value = html.substring(q + 1); q = n }
                    else { value = html.substring(q + 1, vEnd); q = vEnd + 1 }
                  } else {
                    val v0 = q
                    while (q < n && !html.charAt(q).isWhitespace &&
                      html.charAt(q) != '>') q += 1
                    value = html.substring(v0, q)
                  }
                }
                if (aname.nonEmpty && !attrs.contains(aname))
                  attrs.update(aname, decodeEntities(value))
              }
            }
            p = q
            if (name.isEmpty) () // "<3" and friends: not a tag, dropped
            else if (Dropped(name)) {
              if (!selfClose) {
                // raw text: scan for the case-insensitive close tag
                val close = "</" + name
                var r = p
                var found = -1
                while (found < 0 && r >= 0 && r < n) {
                  r = html.indexOf('<', r)
                  if (r < 0) found = -2
                  else if (r + close.length <= n &&
                    html.substring(r, r + close.length)
                      .equalsIgnoreCase(close)) found = r
                  else r += 1
                }
                if (found < 0) p = n
                else {
                  val end = html.indexOf('>', found)
                  p = if (end < 0) n else end + 1
                }
              }
            } else if (name == "br") {
              appendText("\n")
              stack.head.childOrdinal(name)
            } else if (name == "img") {
              val parent = stack.head
              val k = parent.childOrdinal(name)
              val src = attrs.getOrElse("src", "")
              val b64 = {
                val m = "^data:[^,]*;base64,(.*)$".r.findFirstMatchIn(src)
                m.map(_.group(1)).getOrElse(src)
              }
              def dim(a: String): Double =
                attrs.get(a).flatMap(v =>
                  try Some(v.trim.toDouble) catch { case _: Exception => None })
                  .getOrElse(0.0)
              if (b64.nonEmpty)
                out += InternalRow(0L, Image,
                  UTF8String.fromString(s"${parent.path}/img[$k]"),
                  UTF8String.fromString(b64),
                  0.0, 0.0, dim("width"), dim("height"))
            } else if (Void(name)) {
              stack.head.childOrdinal(name)
            } else if (selfClose) {
              // non-void self-close: counts for ordinals, no scope
              if (Block(name)) flushRun()
              stack.head.childOrdinal(name)
            } else {
              if (ImplicitClose(name) && stack.head.name == name)
                popTo(name)
              push(name)
            }
          case _ =>
            appendText("<") // "< 5" — a lone '<' is content
            p = lt + 1
        }
      }
    }
    flushRun()
    out.toArray
  }
}
