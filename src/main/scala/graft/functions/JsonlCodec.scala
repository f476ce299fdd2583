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
object JsonlCodec {

  private val PageSize = 200 // = DocParse.PageSize (no cyclic dep)

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
        concat(lit("http://example.com/"), substring(md5(text), 1, 8),
          lit("#"), i.cast("string")).as("url"),
        substr(text, i * lit(PageSize) + lit(1), lit(PageSize)).as("text")))
    }))
    encode(when(length(text) > 0, body).otherwise(lit("")), "UTF-8")
  }

  /** Payload → array of ParseGft-schema record structs, pure
    * built-ins end to end. */
  def parse(payload: Column): Column = {
    val lines = filter(split(decode(payload, "UTF-8"), "\n"),
      l => length(trim(l)) > 0)
    val rows = transform(lines, (l, i) => {
      val rec = from_json(l, RecordSchema)
      struct(
        lit(0L).as("page_num"),
        lit("text_block").as("content_type"),
        coalesce(rec.getField("url"),
          concat(lit("line-"), i.cast("string"))).as("content_id"),
        rec.getField("text").as("content_raw"),
        lit(0.0).as("x0"), lit(0.0).as("y0"),
        lit(0.0).as("x1"), lit(0.0).as("y1"))
    })
    filter(rows, r =>
      r.getField("content_raw").isNotNull &&
        length(r.getField("content_raw")) > 0)
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

  private val PageSize = 200 // = DocParse.PageSize (no cyclic dep)

  private val RecordSchema = new StructType()
    .add("id", LongType).add("url", StringType).add("text", StringType)

  /** Both directions must keep field whitespace VERBATIM: the
    * univocity defaults trim unquoted fields (writing trims
    * leading/trailing, and a chunk boundary lands mid-text all the
    * time), which would silently alter content. */
  private val CsvOpts = Map(
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false")

  /** Deterministic CSV payload for a text column: a header line plus
    * one `to_csv` record per [[PageSize]]-char chunk (id = chunk
    * ordinal, url = the jsonl convention). Real quoting: chunks with
    * commas/quotes are escaped by `to_csv` and must round-trip. */
  def synth(text: Column): Column = {
    val nChunks = floor((length(text) - 1) / PageSize).cast("int")
    val body = concat_ws("\n", transform(sequence(lit(0), nChunks), { i =>
      to_csv(struct(
        i.cast("long").as("id"),
        concat(lit("http://example.com/"), substring(md5(text), 1, 8),
          lit("#"), i.cast("string")).as("url"),
        substr(text, i * lit(PageSize) + lit(1), lit(PageSize)).as("text")),
        CsvOpts.asJava)
    }))
    encode(when(length(text) > 0,
      concat(lit("id,url,text\n"), body)).otherwise(lit("")), "UTF-8")
  }

  /** Payload → array of ParseGft-schema record structs. NOTE: the
    * line split means embedded NEWLINES inside quoted fields are out
    * of scope (loudly visible: such a record fails `from_csv` and
    * drops) — the trade that keeps the codec a narrow per-row
    * expression instead of a stateful scan. */
  def parse(payload: Column): Column = {
    val lines = filter(split(decode(payload, "UTF-8"), "\n"),
      l => length(trim(l)) > 0)
    val rows = transform(lines, (l, i) => {
      val rec = from_csv(l, RecordSchema,
        CsvOpts + ("mode" -> "PERMISSIVE"))
      struct(
        lit(0L).as("page_num"),
        lit("text_block").as("content_type"),
        coalesce(rec.getField("url"),
          concat(lit("line-"), i.cast("string"))).as("content_id"),
        rec.getField("text").as("content_raw"),
        lit(0.0).as("x0"), lit(0.0).as("y0"),
        lit(0.0).as("x1"), lit(0.0).as("y1"))
    })
    // element 0 is the header row: its "text" cell is the literal
    // string "text" only in the header position, so drop by ordinal,
    // not by content
    filter(rows, (r, i) => i > 0 &&
      r.getField("content_raw").isNotNull &&
        length(r.getField("content_raw")) > 0)
  }
}
