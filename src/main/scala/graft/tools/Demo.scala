package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.GraftVectorDB

/** The README quick-start flow, runnable end-to-end:
  * ingest → dedup-skip re-ingest → text search → multimodal search. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val dir = if (args.length > 1) args(1) else "target/demo_store"
    val spark = GraftSession.local(4, "graft-demo")
    val db = new GraftVectorDB(spark, dir)
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Tables.load(spark, sf, "documents")
    // text channel from most files; the tail is reserved for the
    // image-batch demo below (file-level dedup would otherwise skip
    // it — same semantics as the reference's file_already_processed)
    val textDocs = docs.filter(col("doc_id") < 450)
    println(s"[demo] ingested ${db.ingest(textDocs)} records")
    println(s"[demo] re-ingest appended ${db.ingest(textDocs)} (expect 0)")
    println("[demo] search('fast query join table'):")
    db.search("fast query join table", topN = 5).show(20, 60)
    println("[demo] multimodal search:")
    db.searchMultimodal("fast query join table", topN = 3).show(20, 60)
    val (response, _) = db.answer("fast query join table")
    println(s"[demo] answer: $response")
    // image channel: fabricate an image batch + caption rows,
    // re-embedded into the image space via toImageChannel
    val img = GraftVectorDB.toImageChannel(
      GraftVectorDB.pipeline(docs.filter(col("doc_id") >= 450))
        .filter(col("page_num") === 0))
    val n = db.ingestRecords(img.unionByName(GraftVectorDB.captionRows(img)))
    println(s"[demo] appended $n image+caption records")
    println("[demo] multimodal search with image channel:")
    db.searchMultimodal("captioned content", topN = 3).show(20, 60)
    println(s"[demo] ANN index over ${db.buildAnnIndex()} rows; probe search:")
    db.searchAnn("fast query join table", topN = 5).show(20, 60)
    println(s"[demo] image ANN index over ${db.buildAnnIndex(channel = "image")} rows:")
    db.searchAnnImage("captioned content", topN = 3).show(20, 60)
    println("[demo] location-filtered ANN search (get_search_range over the index):")
    db.searchAnn("fast query join table", topN = 3,
      location = Some("corpus/src1/")).show(20, 60)
    println("[demo] IVF+PQ search (ADC shortlist + exact re-rank):")
    db.searchAnnPq("fast query join table", topN = 3).show(20, 60)
    import spark.implicits._
    val queries = Seq((0L, "fast query join table"), (1L, "slow merge sort line"),
      (2L, "hash vector stream")).toDF("q_id", "q_text")
    println("[demo] batch search - 3 queries, ONE store scan:")
    db.searchAll(queries, topN = 3).show(20, 60)
    println("[demo] batch ANN - 3 queries, ONE pruned scan:")
    db.searchAllAnn(queries, topN = 3).show(20, 60)
    println("[demo] batch IVF+PQ - 3 queries, two scans total:")
    db.searchAllAnnPq(queries, topN = 3).show(20, 60)
    println("[demo] batch multimodal - 3 queries, both channels, two scans:")
    db.searchAllMultimodal(queries, topN = 2).show(20, 60)
    // per-query scope: each query carries its own folder prefix (null =
    // unscoped) - get_search_range per tenant in one batch
    val someDoc = db.store.select($"doc_name").head().getString(0)
    val folder = someDoc.substring(0, someDoc.lastIndexOf('/') + 1)
    val scoped = Seq((0L, "fast query join table", folder),
      (1L, "slow merge sort line", null.asInstanceOf[String]))
      .toDF("q_id", "q_text", "q_loc")
    println(s"[demo] per-query q_loc batch (q0 scoped to $folder, q1 unscoped):")
    db.searchAllAnn(scoped, topN = 3).show(20, 60)
    // hybrid retrieval: BM25 postings sidecar + ANN, fused by RRF —
    // the exact-keyword recall path beside pure similarity
    println(s"[demo] lexical sidecar over ${db.indexLexical()} chunks; hybrid search:")
    db.searchHybrid("fast query join table", topN = 5).show(20, 60)
    println("[demo] batch hybrid - 3 queries, constant scans:")
    db.searchAllHybrid(queries, topN = 3).show(20, 60)
    val (hybridResp, _) = db.answerHybrid("fast query join table")
    println(s"[demo] answerHybrid: $hybridResp")
    println(f"[demo] drift gauge: ${db.annAppendFraction("text")}%.2fx appended, " +
      s"needsRebuild=${db.annIndexNeedsRebuild("text")}")
    println(f"[demo] occupancy gauge: skew ${db.annCellSkew("text")}%.1fx, " +
      s"skewed=${db.annIndexSkewed("text")}; splitHotCells -> " +
      s"${db.splitHotCells("text")}")
    println(s"[demo] compactAnnIndex rewrote ${db.compactAnnIndex("text")} rows")
    println(s"[demo] maintain('text') -> ${db.maintain("text")} (compacted, rebuilt)")
    // takedown: delete the current top hit, show it vanish from serving
    val victim = db.search("fast query join table", 1)
      .head().getAs[String]("doc_name")
    println(s"[demo] delete('$victim') removed ${db.delete(Seq(victim))} rows")
    println("[demo] post-delete search (victim absent from exact AND ANN paths):")
    db.search("fast query join table", topN = 3).show(20, 60)
    db.searchAnn("fast query join table", topN = 3).show(20, 60)
    // consistent copy: snapshot the live files, restore into a fresh
    // root, and serve from the copy
    val manifest = db.snapshot()
    println(s"[demo] snapshot manifest: $manifest")
    val copyDir = dir + "_copy"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(copyDir))
    val copy = db.restore(copyDir)
    println("[demo] restored copy serves identically:")
    copy.searchAnn("fast query join table", topN = 3).show(20, 60)
    // round 9: REAL document formats through the binary seam — a valid
    // PDF (Flate streams, xref) and PPTX (OPC zip + DrawingML) built
    // from corpus text, parsed back by the from-scratch readers, and
    // ingested as first-class store rows
    import org.apache.spark.sql.functions.concat
    import graft.functions.expressions.{SynthPdf, SynthPptx}
    val binDocs = docs.filter(col("doc_id") >= 480 && col("doc_id") < 490)
    val pdfPayloads = binDocs.select(
      concat(lit("bin/doc_"), col("doc_id"), lit(".pdf")).as("doc_name"),
      SynthPdf(col("text")).as("payload"))
    val pptxPayloads = binDocs.select(
      concat(lit("bin/doc_"), col("doc_id"), lit(".pptx")).as("doc_name"),
      SynthPptx(col("text")).as("payload"))
    val nPdf = db.ingestRecords(graft.operators.DocParse.records(pdfPayloads, "pdf"))
    val nPptx = db.ingestRecords(graft.operators.DocParse.records(pptxPayloads, "pptx"))
    println(s"[demo] real-format ingest: $nPdf rows from 10 PDFs, " +
      s"$nPptx from 10 PPTX decks")
    db.store.filter(col("doc_type").isin("pdf", "pptx"))
      .select("doc_name", "doc_type", "page_num", "content_type")
      .show(6, 60)
    // round 9: hybrid serving over the PQ index — RRF fuses ranks, so
    // the codes-only vector path drops in with no recalibration
    println("[demo] PQ-fused hybrid search (vector = codes-only path):")
    db.searchHybrid("fast query join table", topN = 3, vector = "pq").show(20, 60)
    spark.stop()
  }
}
