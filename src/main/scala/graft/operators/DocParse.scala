package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.expressions.ParseGft

/** Binary-payload ingestion — the reference's one ingest shape this
  * library was missing: a single binary document (PDF/PPTX there)
  * parsed into per-page text blocks plus positioned image records
  * (embed_pdf vector_db.py:247-343, embed_pptx :344-418).
  *
  * The container here is GFT (see [[graft.functions.expressions.ParseGft]]):
  * this environment has no PDF parser, so payloads are synthesized
  * deterministically from the documents table — but the PARSE side is
  * real: [[ParseGft]] walks the byte stream and reads every length,
  * image id, and bbox out of the payload. Swapping GFT for PDF means
  * swapping that one expression; the plumbing (explode into records,
  * per-channel embedding, store append) is format-agnostic.
  *
  * Scale shape: synth+parse+explode are narrow per-row transforms —
  * the corpus is scanned once, no shuffle until a downstream sink.
  */
object DocParse {

  val PageSize = 200

  /** Deterministic GFT payload for a text column: non-overlapping
    * [[PageSize]]-char pages, and every third page carries an image
    * record whose id is the page's md5 prefix and whose bbox derives
    * from the page index (the stand-in for real figure positions).
    * The PG length field is the page's OCTET length — the container is
    * a byte stream and [[ParseGft]] walks bytes, so the framing stays
    * correct for non-ASCII text too. Empty text yields an empty payload
    * (zero records, matching the oracle's range(0, 0)); without the
    * guard, `sequence(0, -1)` is a DESCENDING [0, -1] whose i = -1
    * page produces unparseable negative coordinates. */
  def synthPayload(text: Column): Column = {
    val nPages = floor((length(text) - 1) / PageSize).cast("int")
    val body = concat_ws("", transform(sequence(lit(0), nPages), { i =>
      val pg = substr(text, i * lit(PageSize) + lit(1), lit(PageSize))
      val coords = concat(
        lpad(((i * 37) % 500).cast("string"), 4, "0"),
        lpad(((i * 53) % 700).cast("string"), 4, "0"),
        lpad(((i * 37) % 500 + 100 + (i * 7) % 200).cast("string"), 4, "0"),
        lpad(((i * 53) % 700 + 80 + (i * 11) % 160).cast("string"), 4, "0"))
      concat(
        lit("PG"), lpad(octet_length(pg).cast("string"), 4, "0"), pg,
        when(i % 3 === 0,
          concat(lit("IM"), substring(md5(pg), 1, 8), coords))
          .otherwise(lit("")))
    }))
    when(length(text) > 0, body).otherwise(lit(""))
  }

  /** The vs_parse query: synthesize payloads, parse them back, one row
    * per parsed record with its positional bbox as scalar columns. */
  def parse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id", explode(ParseGft(synthPayload($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"page_num", $"content_type")
  }

  /** vs_parse_pdf — the REAL-format twin of [[parse]]: synthesize a
    * structurally valid PDF per document
    * ([[graft.functions.expressions.SynthPdf]] — catalog/pages tree,
    * ALTERNATING Flate/raw content streams, image XObjects placed by
    * `cm`/`Do`, correct xref) and parse it back with the from-scratch
    * PDF reader ([[graft.functions.expressions.ParsePdf]]): text
    * blocks with their Tm anchors, images by object number with their
    * CTM bboxes, Flate decoded through java.util.zip. The oracle
    * recomputes every output field from the text alone, so the whole
    * grammar → bytes → grammar round trip is hash-checked. */
  def parsePdf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        explode(graft.functions.expressions.ParsePdf(
          graft.functions.expressions.SynthPdf($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"page_num", $"content_type")
  }

  /** vs_parse_pptx — as [[parsePdf]] for the OPC format: a valid PPTX
    * package per document ([[graft.functions.expressions.SynthPptx]] —
    * content types, presentation + rels with the declared slide order,
    * DrawingML slides, media parts) parsed back shape-by-shape
    * ([[graft.functions.expressions.ParsePptx]]): text shapes with EMU
    * bboxes, pictures resolved through the slide rels to their media
    * bytes. Zip + DOM are both JDK-only, so unlike the PDF subset this
    * covers the real format end-to-end. */
  def parsePptx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        explode(graft.functions.expressions.ParsePptx(
          graft.functions.expressions.SynthPptx($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"page_num", $"content_type")
  }

  /** vs_parse_docx — the third real container through the seam: a
    * valid DOCX per document ([[graft.functions.expressions.SynthDocx]]
    * — content types, package + document rels, WordprocessingML body,
    * inline pictures, media parts) parsed back paragraph-by-paragraph
    * ([[graft.functions.expressions.ParseDocx]]): `w:p` runs with
    * ordinal content ids, inline drawings resolved through the
    * document rels to their media bytes with wp:extent EMU bboxes.
    * page_num is 0 throughout — WordprocessingML has no pages until
    * render-time layout. */
  def parseDocx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        explode(graft.functions.expressions.ParseDocx(
          graft.functions.expressions.SynthDocx($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"content_type", $"content_id")
  }

  /** vs_parse_html — the first MARKUP format through the seam, and
    * the #1 real-corpus input of a crawl-scale pipeline: a full page
    * per document ([[graft.functions.expressions.SynthHtml]] — head
    * boilerplate, nav bar, main-content paragraphs with inline
    * data-URI images, footer, deliberate tag soup) parsed back by the
    * tolerant extractor ([[graft.functions.expressions.ParseHtml]]):
    * block-level text runs with DOM-path content ids, main content
    * split from boilerplate by content_type, images with their
    * width/height bboxes. page_num is 0 throughout — HTML has no
    * pages. */
  def parseHtml(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        explode(graft.functions.expressions.ParseHtml(
          graft.functions.expressions.SynthHtml($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"content_type", $"content_id")
  }

  /** vs_parse_xlsx — the fourth OPC container through the seam
    * ([[graft.functions.expressions.SynthXlsx]] → workbook with a
    * Data sheet of shared-string/number/inline-string cells plus a
    * Meta sheet; [[graft.functions.expressions.ParseXlsx]] walks the
    * workbook's declared sheet order and emits one row per cell with
    * its `Sheet!A1` id and 1-based column/row in x0/y0). page_num =
    * the sheet ordinal. */
  def parseXlsx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        explode(graft.functions.expressions.ParseXlsx(
          graft.functions.expressions.SynthXlsx($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"page_num", $"content_id")
  }

  /** vs_parse_md — Markdown through the seam (README/docs corpora;
    * [[graft.functions.expressions.SynthMd]] → title heading,
    * paragraph/fenced-code blocks with inline data-URI images, a
    * quote and a list; [[graft.functions.expressions.ParseMd]] reads
    * the blocks back with kind-ordinal content ids, code bodies
    * VERBATIM). page_num is 0 — Markdown has no pages. */
  def parseMd(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        explode(graft.functions.expressions.ParseMd(
          graft.functions.expressions.SynthMd($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"content_type", $"content_id")
  }

  /** vs_parse_odt — OpenDocument Text (ISO 26300, the LibreOffice
    * default) through the seam: the fifth zip+XML container via the
    * shared machinery ([[graft.functions.expressions.SynthOdt]] —
    * stored mimetype, manifest, content.xml, image parts;
    * [[graft.functions.expressions.ParseOdt]] — text:p/text:h
    * paragraphs with ordinal ids, draw:image parts through
    * xlink:href with svg dims). page_num 0 — ODF text has no pages
    * until layout, like WordprocessingML. */
  def parseOdt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        explode(graft.functions.expressions.ParseOdt(
          graft.functions.expressions.SynthOdt($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"content_type", $"content_id")
  }

  /** vs_parse_rtf — RTF through the seam (legacy Word exports,
    * WordPad, email attachments — the last common office format):
    * [[graft.functions.expressions.SynthRtf]] writes a valid RTF 1
    * document with real non-text destinations (fonttbl, an optional
    * `{\*\generator}`, info) and [[graft.functions.expressions.ParseRtf]]
    * reads it back — `\par` paragraphs with ordinal ids, `\pict`
    * image rows with `\picw`/`\pich` bboxes, the full escape set
    * (`\'xx`, `\uN` with `\ucN` fallback consumption). page_num 0 —
    * flow format. */
  def parseRtf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        explode(graft.functions.expressions.ParseRtf(
          graft.functions.expressions.SynthRtf($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"content_type", $"content_id")
  }

  /** vs_parse_epub — the BOOK container through the seam: a valid
    * EPUB per document ([[graft.functions.expressions.SynthEpub]] —
    * OCF zip with a stored mimetype, container.xml → OPF manifest +
    * spine, XHTML chapters declared in REVERSE order so only the
    * spine yields the reading order, image parts) parsed back
    * chapter-by-chapter ([[graft.functions.expressions.ParseEpub]]):
    * page_num = the spine ordinal, content_id = `href#dom-path`,
    * chapter titles tagged boilerplate, in-container images resolved
    * to their part bytes. Books are the third pillar of a pretraining
    * mix (web + books + code) — this is the web-crawl seam's book
    * twin. */
  def parseEpub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        explode(graft.functions.expressions.ParseEpub(
          graft.functions.expressions.SynthEpub($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"page_num", $"content_type", $"content_id")
  }

  /** vs_parse_jsonl — the corpus EXCHANGE format through the seam
    * ([[graft.functions.JsonlCodec]]): one C4-shaped record per
    * chunk, codec both ways in PURE built-in functions — the whole
    * query is one whole-stage-codegen span, the contrast case to the
    * byte-walking containers. content_id = the record url. */
  def parseJsonl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id", explode(graft.functions.JsonlCodec.parse(
        graft.functions.JsonlCodec.synth($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"content_id")
  }

  /** vs_parse_csv — the other line-framed exchange format
    * ([[graft.functions.CsvCodec]]): header + one `id,url,text`
    * record per chunk, real CSV quoting both ways via
    * `to_csv`/`from_csv` — built-ins only, like the jsonl twin. */
  def parseCsv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id", explode(graft.functions.CsvCodec.parse(
        graft.functions.CsvCodec.synth($"text"))).as("r"))
      .select($"doc_id", $"r.page_num", $"r.content_type", $"r.content_id",
        $"r.content_raw", $"r.x0", $"r.y0", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"content_id")
  }

  /** vs_parse_warc — the crawl CONTAINER end-to-end: a per-document
    * `.warc.gz` ([[graft.functions.expressions.SynthWarc]]: warcinfo
    * → request → response records, one gzip member each) inflated
    * ([[graft.functions.expressions.Inflate]] multi-member), the WARC
    * records walked ([[graft.functions.expressions.ParseWarc]]), the
    * HTTP response opened, and its HTML body parsed by the tolerant
    * extractor — the full CommonCrawl ingest chain, hash-checked:
    * the oracle recomputes the inner page rows plus the derived
    * target URI and status. Narrow per-row work throughout. */
  def parseWarc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        explode(graft.functions.expressions.ParseWarc(
          graft.functions.expressions.Inflate(
            graft.functions.expressions.SynthWarc($"text")))).as("w"))
      .filter($"w.rec_type" === "response")
      // the capture's HTTP Content-Type rides into the decode as the
      // transport-layer charset hint (BOM still outranks it)
      .select($"doc_id", $"w.target_uri", $"w.status",
        explode(graft.functions.expressions.ParseHtml(
          $"w.body", $"w.mime")).as("r"))
      .select($"doc_id", $"target_uri", $"status", $"r.content_type",
        $"r.content_id", $"r.content_raw", $"r.x1", $"r.y1")
      .orderBy($"doc_id", $"content_type", $"content_id")
  }

  /** WARC payloads → (doc_name = target URI, payload = HTML body,
    * charset_hint = the capture's HTTP Content-Type) for the html
    * ingest path: the bridge Serve uses to vectorize a
    * `.warc`/`.warc.gz` file — one crawl file fans out to its HTML
    * captures, each ingesting like a standalone page.
    * [[records]] picks the charset_hint column up automatically. */
  def warcHtml(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(explode(graft.functions.expressions.ParseWarc(
        graft.functions.expressions.Inflate($"payload"))).as("w"))
      .filter($"w.rec_type" === "response" &&
        $"w.mime".startsWith("text/html") && $"w.target_uri".isNotNull)
      .select($"w.target_uri".as("doc_name"), $"w.body".as("payload"),
        $"w.mime".as("charset_hint"))
  }

  /** vs_html_quality — the markup-ingest quality signal as its own
    * query: per document, main-content vs boilerplate char counts and
    * the chrome share ([[boilerplateRatio]]'s formula), from the same
    * tolerant parse. One narrow parse pass + one per-doc groupBy (no
    * pre-sort — the parse feeds the aggregate directly). */
  def htmlQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        explode(graft.functions.expressions.ParseHtml(
          graft.functions.expressions.SynthHtml($"text"))).as("r"))
      .filter($"r.content_type".isin("text_block", "boilerplate"))
      .groupBy($"doc_id")
      .agg(
        coalesce(sum(when($"r.content_type" === "text_block",
          length($"r.content_raw"))), lit(0L)).as("main_chars"),
        coalesce(sum(when($"r.content_type" === "boilerplate",
          length($"r.content_raw"))), lit(0L)).as("boiler_chars"))
      .withColumn("boilerplate_ratio",
        round($"boiler_chars".cast("double") /
          ($"boiler_chars" + $"main_chars"), 4))
      .orderBy($"doc_id")
  }

  /** Per-document boilerplate share from a [[parseHtml]]-shaped frame:
    * boilerplate chars / all text chars — the main-content-extraction
    * signal a curation gate consumes (a page that is mostly chrome is
    * not training data). One narrow aggregation, no shuffle beyond the
    * per-doc groupBy. */
  def boilerplateRatio(parsed: DataFrame): DataFrame = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.filter($"content_type".isin("text_block", "boilerplate"))
      .groupBy($"doc_id")
      .agg(round(
        coalesce(sum(when($"content_type" === "boilerplate",
          length($"content_raw"))), lit(0L)).cast("double") /
          sum(length($"content_raw")), 4).as("boilerplate_ratio"))
  }

  /** Payloads → VectorRecord rows for [[GraftVectorDB.ingestRecords]]:
    * text blocks embed in the text space, image records in the image
    * space, bbox carried from the payload. `payloads` needs
    * (doc_name, payload); `format` selects the container parser AND
    * tags doc_type — "gft" (string payloads, the synthetic container),
    * "pdf", "pptx", or "docx" (binary payloads, the real formats). The
    * downstream plumbing (explode → per-channel embedding → store
    * append) is format-agnostic, which is the whole point of the
    * seam. */
  def records(payloads: DataFrame, format: String = "gft",
      pdfPassword: String = ""): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    import graft.functions.expressions.{Inflate, ParseDocx, ParseHtml, ParsePdf, ParsePptx, ParseXlsx}
    // gzip is transparent for every BINARY container (crawl dumps
    // ship .html.gz) — magic-sniffed pass-through, so plain payloads
    // cost one 2-byte check. file_hash stays the hash of the bytes AS
    // STORED (the dedup identity is the file, not its inflation).
    val p = Inflate($"payload")
    // markup decodes charset-aware: a `charset_hint` column (the
    // warcHtml bridge emits the capture's HTTP Content-Type) is the
    // transport layer of the sniff; absent, BOM/meta prescan decide
    val htmlHint: Column =
      if (payloads.columns.contains("charset_hint")) $"charset_hint"
      else lit(null).cast("string")
    val parsed = format match {
      case "gft" => ParseGft($"payload") // string container, never gzipped
      case "pdf" => ParsePdf(p, pdfPassword)
      case "pptx" => ParsePptx(p)
      case "docx" => ParseDocx(p)
      case "html" => ParseHtml(p, htmlHint)
      case "xlsx" => ParseXlsx(p)
      case "md" => graft.functions.expressions.ParseMd(p)
      case "epub" => graft.functions.expressions.ParseEpub(p)
      case "odt" => graft.functions.expressions.ParseOdt(p)
      case "rtf" => graft.functions.expressions.ParseRtf(p)
      case "jsonl" => graft.functions.JsonlCodec.parse(p)
      case "csv" => graft.functions.CsvCodec.parse(p)
      case "image" =>
        // a STANDALONE image file (png/jpg/gif/bmp — what an image
        // corpus folder holds): one image row, payload base64'd like
        // every in-document picture, bbox = the container's declared
        // dims (an unrecognized header keeps the row with a 0x0 bbox
        // — the embedding and phash still see the bytes)
        val m = graft.functions.expressions.ImageHeaderMeta(p)
        array(struct(
          lit(0L).as("page_num"), lit("image").as("content_type"),
          lit("0").as("content_id"), base64(p).as("content_raw"),
          lit(0.0).as("x0"), lit(0.0).as("y0"),
          coalesce(m.getField("width").cast("double"), lit(0.0)).as("x1"),
          coalesce(m.getField("height").cast("double"), lit(0.0)).as("y1")))
      case other => throw new IllegalArgumentException(
        s"DocParse.records: unknown container format '$other' (gft|pdf|pptx|docx|html|xlsx|md|epub|odt|rtf|jsonl|csv|image)")
    }
    payloads
      .select($"doc_name", md5($"payload".cast("binary")).as("file_hash"),
        timestamp_micros(lit(0L)).as("ts"),
        explode(parsed).as("r"))
      // html boilerplate rows never embed — main-content extraction
      // IS the point of parsing markup for a training corpus
      .filter($"r.content_type" =!= "boilerplate")
      .select(
        $"doc_name", lit(format).as("doc_type"), $"r.page_num",
        when($"r.content_type" === "image", lit(graft.model.ContentTypes.Image))
          .otherwise(lit(graft.model.ContentTypes.TextChunk)).as("content_type"),
        $"r.content_id", $"r.content_raw",
        when($"r.content_type" === "image", VectorStore.embedImage($"r.content_raw"))
          .otherwise(VectorStore.embedText($"r.content_raw")).as("embedding"),
        $"file_hash", $"ts",
        array($"r.x0", $"r.y0", $"r.x1", $"r.y1").as("bbox"))
  }
}
