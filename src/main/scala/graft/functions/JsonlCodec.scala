package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** JSONL (one JSON object per line) — the corpus EXCHANGE format:
  * C4/RefinedWeb-class web dumps, LAION-style caption sets, and most
  * published training corpora ship as `.jsonl(.gz)` with a `url` +
  * `text` field per record.
  *
  * Unlike the binary containers this needs NO custom expression: the
  * whole codec is built-in Spark functions (`split` → `filter` →
  * `transform` with the element index → `from_json`), so both
  * directions stay inside whole-stage codegen and Catalyst sees
  * every field reference. That is the preference order the library
  * is built on — compose built-ins first, drop to a native
  * expression only when the format genuinely needs imperative
  * byte-walking (zip/PDF/WARC do; line-framed JSON does not).
  *
  * Record schema: `{"url": string, "text": string}` — the C4 shape.
  * A line that is not valid JSON, or lacks a non-empty `text`, drops
  * (tolerant, like the markup parsers: crawl dumps carry junk lines;
  * a corrupt RECORD is not a corrupt FILE). The output rows use
  * [[graft.functions.expressions.ParseGft]]'s schema so
  * `DocParse.records` fans them into the format-agnostic ingest
  * plumbing: content_id = the record's url (its stable identity in a
  * crawl dump), falling back to the line ordinal. */
/** Shared machinery of the line-framed codecs ([[JsonlCodec]],
  * [[CsvCodec]]): the physical-line split (CRLF-tolerant — RFC 4180
  * and most Windows exports end lines with \r\n, and a preserved
  * trailing \r would silently corrupt the last field of every
  * record), the ParseGft record-struct shape, the url/line-ordinal
  * content id, and the drop rule for textless records. One
  * definition, so the two codecs cannot diverge. */
private[functions] object LineFramed {

  private[functions] val PageSize = 200 // = DocParse.PageSize (no cyclic dep)

  /** Record url for chunk i of a synth payload — the vs_parse_warc
    * URI convention, fragment-numbered per record. */
  private[functions] def chunkUrl(text: Column, i: Column): Column =
    concat(lit("http://example.com/"), substring(md5(text), 1, 8),
      lit("#"), i.cast("string"))

  /** Non-blank physical lines of a payload, split on \r?\n. */
  private[functions] def lines(payload: Column): Column =
    filter(split(decode(payload, "UTF-8"), "\r?\n"),
      l => length(trim(l)) > 0)

  /** One ParseGft-schema row from a parsed record's (url, text);
    * content_id falls back to the line ordinal. */
  private[functions] def row(url: Column, text: Column, i: Column): Column =
    struct(
      lit(0L).as("page_num"),
      lit("text_block").as("content_type"),
      coalesce(url, concat(lit("line-"), i.cast("string"))).as("content_id"),
      text.as("content_raw"),
      lit(0.0).as("x0"), lit(0.0).as("y0"),
      lit(0.0).as("x1"), lit(0.0).as("y1"))

  /** Keep rows with non-empty text (a corrupt or textless RECORD is
    * not a corrupt file); `fromOrdinal` drops leading rows (the CSV
    * header). */
  private[functions] def keep(rows: Column, fromOrdinal: Int): Column =
    filter(rows, (r, i) => i >= fromOrdinal &&
      r.getField("content_raw").isNotNull &&
        length(r.getField("content_raw")) > 0)
}

object JsonlCodec {
  import LineFramed._

  private val RecordSchema = new StructType()
    .add("url", StringType).add("text", StringType)

  /** Deterministic JSONL payload for a text column — the fixture
    * generator behind the vs_parse_jsonl oracle: one record per
    * [[PageSize]]-char chunk, `url` =
    * `http://example.com/<md5(text) prefix>#<i>` (the vs_parse_warc
    * URI convention, fragment-numbered per record). Built with
    * `to_json`, so JSON string escaping is the real encoder's.
    * Empty text → an empty payload (zero records). */
  def synth(text: Column): Column = {
    val nChunks = floor((length(text) - 1) / PageSize).cast("int")
    val body = concat_ws("\n", transform(sequence(lit(0), nChunks), { i =>
      to_json(struct(
        chunkUrl(text, i).as("url"),
        substr(text, i * lit(PageSize) + lit(1), lit(PageSize)).as("text")))
    }))
    encode(when(length(text) > 0, body).otherwise(lit("")), "UTF-8")
  }

  /** Payload → array of ParseGft-schema record structs, pure
    * built-ins end to end. */
  def parse(payload: Column): Column = {
    val rows = transform(lines(payload), (l, i) => {
      val rec = from_json(l, RecordSchema)
      row(rec.getField("url"), rec.getField("text"), i)
    })
    keep(rows, fromOrdinal = 0)
  }
}

/** CSV — the other line-framed exchange format (annotation exports,
  * label sheets, spreadsheet dumps). Same built-ins-only discipline
  * as [[JsonlCodec]]: `split` → `transform`+index → `from_csv`, both
  * directions codegen-friendly; the header line is skipped by
  * ordinal, quoted fields (embedded commas/quotes) go through the
  * real CSV escape rules on both sides (`to_csv`/`from_csv`).
  *
  * Record schema: `id,url,text` — the annotation-export shape.
  * Lines whose `text` is missing/empty drop (tolerant, like every
  * line-framed format); content_id = the record's url, line-ordinal
  * fallback. Output rows use ParseGft's schema for
  * `DocParse.records`. */
object CsvCodec {
  import LineFramed._

  private val RecordSchema = new StructType()
    .add("id", LongType).add("url", StringType).add("text", StringType)

  /** Two deliberate departures from Spark's CSV dialect, both ways:
    * field whitespace stays VERBATIM (the univocity defaults trim
    * unquoted fields — a chunk boundary lands mid-text all the time,
    * and the default silently alters content), and quotes escape by
    * DOUBLING (`""`) per RFC 4180 instead of Spark's backslash
    * dialect — what Excel and every exporter actually write, and
    * what keeps a single-line record's quote count even (the
    * multi-line fragment-drop rule in [[parse]] counts on it). */
  private val CsvOpts = Map(
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false",
    "escape" -> "\"")

  /** Deterministic CSV payload for a text column: a header line plus
    * one `to_csv` record per [[PageSize]]-char chunk (id = chunk
    * ordinal, url = the jsonl convention). Real quoting: chunks with
    * commas/quotes are escaped by `to_csv` and must round-trip. */
  def synth(text: Column): Column = {
    val nChunks = floor((length(text) - 1) / PageSize).cast("int")
    val body = concat_ws("\n", transform(sequence(lit(0), nChunks), { i =>
      to_csv(struct(
        i.cast("long").as("id"),
        chunkUrl(text, i).as("url"),
        substr(text, i * lit(PageSize) + lit(1), lit(PageSize)).as("text")),
        CsvOpts.asJava)
    }))
    encode(when(length(text) > 0,
      concat(lit("id,url,text\n"), body)).otherwise(lit("")), "UTF-8")
  }

  /** Payload → array of ParseGft-schema record structs. Embedded
    * NEWLINES inside quoted fields are out of scope — the trade that
    * keeps the codec a narrow per-row expression instead of a
    * stateful scan — and the out-of-scope records DROP rather than
    * truncate: each physical-line fragment of a multi-line record
    * carries an UNBALANCED quote count, and unbalanced lines are
    * rejected before from_csv (which would otherwise silently keep
    * the pre-newline prefix as field text). */
  def parse(payload: Column): Column = {
    val balanced = filter(lines(payload),
      l => (length(l) - length(regexp_replace(l, "\"", ""))) % 2 === 0)
    val rows = transform(balanced, (l, i) => {
      val rec = from_csv(l, RecordSchema,
        CsvOpts + ("mode" -> "PERMISSIVE"))
      row(rec.getField("url"), rec.getField("text"), i)
    })
    // element 0 is the header row: its "text" cell is the literal
    // string "text" only in the header position, so drop by ordinal,
    // not by content
    keep(rows, fromOrdinal = 1)
  }
}
