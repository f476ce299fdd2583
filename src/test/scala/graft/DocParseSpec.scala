package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.ContentTypes
import graft.operators.{DocParse, GraftVectorDB}

/** The binary-ingest seam end-to-end: GFT payloads → ParseGft →
  * VectorRecord rows → store → search (the reference's
  * embed_pdf/embed_pptx flow, vector_db.py:247-418). */
class DocParseSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("parsed pages reassemble to the original document text") {
    val reassembled = DocParse.parse(spark, sf)
      .filter($"content_type" === "text_block")
      .groupBy($"doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct($"page_num", $"content_raw"))),
        r => r.getField("content_raw")), "").as("rt"))
    val docs = Tables.load(spark, sf, "documents").select($"doc_id", $"text")
    val mismatches = reassembled.join(docs, "doc_id")
      .filter($"rt" =!= $"text").count()
    assert(mismatches == 0)
  }

  test("image records carry bboxes read from the payload") {
    val img = DocParse.parse(spark, sf).filter($"content_type" === "image")
    assert(img.count() > 0)
    val bad = img.filter(
      $"x1" - $"x0" < 100 || $"x1" - $"x0" > 300 ||
      $"y1" - $"y0" < 80 || $"y1" - $"y0" > 240 ||
      $"page_num" % 3 =!= 0).count()
    assert(bad == 0, "bbox extents must match the synthesized figure geometry")
  }

  test("empty text yields an empty payload and zero records") {
    val rows = Seq(("", 0L), ("short page", 1L)).toDF("text", "doc_id")
    val parsed = rows.select($"doc_id",
      DocParse.synthPayload($"text").as("p"))
      .select($"doc_id", $"p",
        size(graft.functions.expressions.ParseGft($"p")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(parsed(0L) == ("", 0), "empty doc must parse to zero records")
    assert(parsed(1L)._2 == 2, "one page + its page-0 image record")
  }

  test("byte-true framing survives non-BMP characters") {
    // U+1F600 is 4 UTF-8 bytes / 2 UTF-16 code units: a code-unit
    // walker desyncs on it, a byte walker must round-trip it
    val text = "emoji 😀 page body"
    val parsed = Seq(text).toDF("text")
      .select(explode(graft.functions.expressions.ParseGft(
        DocParse.synthPayload($"text"))).as("r"))
      .filter($"r.content_type" === "text_block")
      .select($"r.content_raw").as[String].collect()
    assert(parsed.mkString("") == text)
  }

  test("GFT payloads ingest as store records and search end-to-end") {
    val dir = "target/vdb_parse"
    val f = new java.io.File(s"$dir/vector_store")
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete()
    }
    if (f.exists()) rm(f)

    val db = new GraftVectorDB(spark, dir)
    val payloads = Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 50)
      .select(concat(lit("bin/doc_"), $"doc_id", lit(".gft")).as("doc_name"),
        DocParse.synthPayload($"text").as("payload"))
    val n = db.ingestRecords(DocParse.records(payloads))
    assert(n > 0)
    assert(db.store.filter($"content_type" === ContentTypes.Image).count() > 0)

    val hits = db.search("fast query join table", topN = 5).collect()
    assert(hits.length == 5)
    assert(hits.forall(_.getAs[String]("content_type") === ContentTypes.TextChunk))

    val multi = db.searchMultimodal("fast query join table", topN = 3).collect()
    assert(multi.exists(_.getAs[String]("channel") == "image"),
      "parsed image records must be searchable through the image space")
  }
}
