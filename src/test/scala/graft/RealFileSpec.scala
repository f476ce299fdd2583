package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.ContentTypes
import graft.operators.{DocParse, GraftVectorDB}

/** The first NON-SYNTHETIC inputs through the binary-ingest seam: the
  * reference repo's own data files — a genuine Word-written PDF 1.7
  * (Microsoft_FY25Q3_PressRelease.pdf, 250 KB, 10 pages) and a genuine
  * PowerPoint deck (Microsoft_FY25Q3_Results.pptx, 2.6 MB) — the exact
  * inputs the reference pipeline processes (vector_db.py:247-418).
  * Every prior ParsePdf/ParsePptx input was written by SynthPdf/
  * SynthPptx or a hand fixture; real-writer diversity (Word's
  * Identity-H subset fonts + /ToUnicode CMaps, real byte-offset xref
  * + /ObjStm packing, PowerPoint's DrawingML and PNG encoder) is the
  * input class a synth twin cannot represent.
  *
  * Measured content shape (pinned below as the regression fence):
  *  - the PDF is PURE TEXT — 10 pages, 1318 BT…ET text blocks, zero
  *    /XObject images (its only /Image tokens are ProcSet names);
  *  - the DECK is PURE PICTURES — every one of its 21 slides is a
  *    single full-slide 1920x1080 RGBA PNG, zero <a:t> runs (verified
  *    against the raw OPC parts). Between them the pair exercises
  *    both halves of the record seam, and the deck's 21
  *    PowerPoint-written PNGs are the first real-writer inputs
  *    through the from-scratch PNG decoder.
  *
  * The files are read ONCE on the driver and shipped as a 1-row
  * binary payload frame — the shape a production folder ingest
  * produces (Serve routes file bytes the same way).
  */
class RealFileSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dataDir = "/root/reference/rag_search/data"
  private val pdfPath = s"$dataDir/Microsoft_FY25Q3_PressRelease.pdf"
  private val pptxPath = s"$dataDir/Microsoft_FY25Q3_Results.pptx"

  private def payloadDf(path: String, name: String): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    Seq((name, bytes)).toDF("doc_name", "payload")
  }

  // the exact-count pins below (1318 blocks, 21 PNGs, x1 ≤ 612) are
  // measurements of THESE file bytes: a refreshed reference file would
  // fail them looking like a parser regression. Pin the input hashes
  // and assume() on them, so content drift SKIPS with a "fixture
  // changed" note instead (r16 advice).
  private val pdfMd5 = "2597793c7d2b1d4cdd63caaef334eeb0"
  private val pptxMd5 = "3b49474499bf08c9736d8ad6d050a294"

  private def md5Of(path: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      .map("%02x".format(_)).mkString

  private def fixtureIntact(path: String, want: String): Boolean =
    new java.io.File(path).isFile && md5Of(path) == want

  private def hasRealFiles: Boolean =
    fixtureIntact(pdfPath, pdfMd5) && fixtureIntact(pptxPath, pptxMd5)

  test("real Word PDF: ParsePdf extracts all 10 pages of the press release") {
    assume(hasRealFiles, "reference data files absent or fixture changed (md5 mismatch)")
    val recs = DocParse.records(payloadDf(pdfPath, "press_release.pdf"), "pdf")
      .collect()
    val text = recs.filter(_.getAs[String]("content_type") == ContentTypes.TextChunk)
    val imgs = recs.filter(_.getAs[String]("content_type") == ContentTypes.Image)
    assert(text.nonEmpty, "no text blocks from the real PDF")
    val joined = text.map(_.getAs[String]("content_raw")).mkString(" ")
    // content sanity: the release's own words must survive the font
    // decode (Word writes Identity-H subset fonts with /ToUnicode —
    // a broken CMap walk would yield mojibake here, not these words)
    for (w <- Seq("Microsoft Cloud", "revenue", "quarter", "Azure",
        "operating income", "diluted"))
      assert(joined.toLowerCase.contains(w.toLowerCase),
        s"expected phrase '$w' missing from decoded text")
    // every declared page (/Count 10) carries text
    val pages = text.map(_.getAs[Long]("page_num")).distinct.sorted
    assert(pages.sameElements(0L until 10L),
      s"pages with text: ${pages.mkString(",")}")
    // stability pins (real-writer regression fence), measured at the
    // first successful ingest: one row per BT…ET block, and the
    // document genuinely has no images (its /Image tokens are all
    // ProcSet names — verified against the raw bytes)
    assert(text.length == 1318, s"text blocks: ${text.length}")
    assert(imgs.isEmpty, s"images: ${imgs.length}")
    // bboxes are real page coordinates: anchors inside the Letter
    // media box, and — because extents now come from the file's OWN
    // /W metrics (round 16) — every block's x1 fits the 612 pt page
    // width (the 0.5 em estimate overflowed it on long lines)
    assert(text.forall { r =>
      val bb = r.getAs[scala.collection.Seq[Double]]("bbox")
      bb(0) >= 0 && bb(2) > bb(0) && bb(2) <= 612.0 &&
        bb(3) > bb(1) && bb(3) <= 800
    })
  }

  test("real PowerPoint deck: ParsePptx extracts all 21 full-slide pictures; the real PNGs pixel-decode") {
    assume(hasRealFiles, "reference data files absent or fixture changed (md5 mismatch)")
    val recs = DocParse.records(payloadDf(pptxPath, "results.pptx"), "pptx")
      .collect()
    val text = recs.filter(_.getAs[String]("content_type") == ContentTypes.TextChunk)
    val imgs = recs.filter(_.getAs[String]("content_type") == ContentTypes.Image)
    // the deck IS picture-per-slide: zero text runs in the OPC parts
    assert(text.isEmpty, s"text records: ${text.length}")
    assert(imgs.length == 21, s"image records: ${imgs.length}")
    assert(imgs.map(_.getAs[Long]("page_num")).distinct.length == 21,
      "one picture per slide")
    // the 21 PowerPoint-written PNGs decode through the from-scratch
    // pixel seam: real-writer zlib streams, filter schedules, RGBA
    import graft.functions.expressions.PixelDecode
    imgs.foreach { r =>
      val b = java.util.Base64.getDecoder.decode(r.getAs[String]("content_raw"))
      val raster = PixelDecode.decodeLuma(b)
        .getOrElse(fail(s"slide ${r.getAs[Long]("page_num")} PNG did not decode"))
      assert(raster.w == 1920 && raster.h == 1080,
        s"slide ${r.getAs[Long]("page_num")}: ${raster.w}x${raster.h}")
      // a real slide is not a constant raster
      assert(raster.luma.distinct.length > 16)
    }
    // distinct slides hash apart (the 64-bit pHash has real content
    // to separate; identical hashes would mean a decode collapse)
    val hashes = imgs.map { r =>
      val b = java.util.Base64.getDecoder.decode(r.getAs[String]("content_raw"))
      PixelDecode.phash64(PixelDecode.decodeLuma(b).get)
    }
    assert(hashes.distinct.length >= 15,
      s"only ${hashes.distinct.length} distinct pHashes across 21 slides")
  }

  test("real files ingest into one store; location-scoped search serves PDF hits; captions serve the deck") {
    assume(hasRealFiles, "reference data files absent or fixture changed (md5 mismatch)")
    val dir = "target/vdb_realfiles"
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rm))
      x.delete()
    }
    rm(new java.io.File(dir))
    val db = new GraftVectorDB(spark, dir)
    val pdfRecs = DocParse.records(
      payloadDf(pdfPath, "data/press_release.pdf"), "pdf")
    val pptxRecs = DocParse.records(
      payloadDf(pptxPath, "data/results.pptx"), "pptx")
    val n1 = db.ingestRecords(pdfRecs)
    // the deck's picture rows PLUS their caption rows in ONE batch
    // (the Demo.scala idiom — dedup is per FILE hash, so captions
    // must ride with their images); the reference captions every
    // extracted image and embeds the caption in the text space
    // (vector_db.py:547-596); header-meta reads the real PNG headers,
    // so the captions carry the true 1920x1080 dims
    val n2 = db.ingestRecords(
      pptxRecs.unionByName(GraftVectorDB.captionRows(pptxRecs)))
    assert(n1 == 1318 && n2 == 42, s"ingested $n1/$n2")
    // re-ingest is a no-op (content-hash dedup)
    assert(db.ingestRecords(DocParse.records(
      payloadDf(pdfPath, "data/press_release.pdf"), "pdf")) == 0L)
    // the reference lifecycle: a location-scoped query answered from
    // the PDF's own text (vector_db.py:163-229, get_search_range)
    val hits = db.search("Microsoft cloud revenue growth", topN = 5,
      location = Some("data/press_release.pdf")).collect()
    assert(hits.length == 5)
    assert(hits.forall(_.getAs[String]("doc_name") == "data/press_release.pdf"))
    // the deck serves through its caption rows in the text channel
    // (the cross-modal path run_search takes for image results)
    val deckHits = db.search("a 1920x1080 png image", topN = 5,
      location = Some("data/results.pptx")).collect()
    assert(deckHits.nonEmpty)
    assert(deckHits.forall(
      _.getAs[String]("content_type") == ContentTypes.ImageCaption))
    assert(deckHits.head.getAs[String]("content_raw")
      .contains("1920x1080 png image"))
  }

  test("the reference's literal app lifecycle: initialize -> embed its data folder -> search over HTTP") {
    assume(hasRealFiles, "reference data files absent or fixture changed (md5 mismatch)")
    // exactly what `python app.py` + the reference frontend does with
    // rag_search/data: POST /initialize, /embed the folder (both real
    // files sweep in), /search a question the press release answers
    val server = graft.tools.Serve.start(spark, 0)
    val port = server.getAddress.getPort
    val client = java.net.http.HttpClient.newHttpClient()
    def post(path: String, body: String): (Int, String) = {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    try {
      val dir = "target/vdb_realfiles_serve"
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rm))
        x.delete()
      }
      rm(new java.io.File(dir))
      val (c1, b1) = post("/initialize", s"""{"save_dir":"$dir"}""")
      assert(c1 == 200 && b1.contains("initialized successfully"), b1)
      val (c2, b2) = post("/embed",
        s"""{"path":"$dataDir","is_folder":true}""")
      // 1339 = the PDF's 1318 text blocks + the deck's 21 pictures:
      // the folder sweep found BOTH real files and the counts match
      // the direct-parse pins above
      assert(c2 == 200 && b2.contains("\"records\":1339"), b2)
      val (c3, b3) = post("/search",
        """{"query":{"text":"Microsoft cloud revenue growth"},"top_n":5}""")
      assert(c3 == 200 && b3.contains("\"rnk\":1"), b3)
      assert(b3.contains("PressRelease.pdf"), b3.take(400))
      // run_search's full contract rides the body: a generated
      // response and a source list naming the real file
      assert(b3.contains("\"response\"") && b3.contains("\"sources\""), b3.take(200))
    } finally server.stop(0)
  }
}
