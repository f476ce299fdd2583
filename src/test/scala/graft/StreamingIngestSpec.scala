package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraftVectorDB

/** Streaming corpus ingest into the vector store: a file-stream source
  * drains through foreachBatch into the same pipeline + content-hash
  * dedup as batch ingest — and a re-run over the same files (fresh
  * checkpoint, so the source replays everything) appends nothing. */
class StreamingIngestSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming ingest matches batch pipeline and is replay-idempotent") {
    val base = "target/stream_ingest"
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete()
    }
    rm(new java.io.File(base))
    val srcDir = Paths.get(s"$base/src")
    Files.createDirectories(srcDir)
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      srcDir.resolve("batch0.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val db = new GraftVectorDB(spark, s"$base/db")

    val q1 = db.ingestStream(
      spark.readStream.schema(schema).parquet(srcDir.toString), s"$base/ckpt1")
    q1.awaitTermination()

    val expected = GraftVectorDB.pipeline(
      Tables.load(spark, sf, "documents")).count()
    assert(db.store.count() == expected)

    // fresh checkpoint → the source replays every file; the content-hash
    // anti-join must still append zero rows
    val q2 = db.ingestStream(
      spark.readStream.schema(schema).parquet(srcDir.toString), s"$base/ckpt2")
    q2.awaitTermination()
    assert(db.store.count() == expected, "replay must not double-ingest")
  }

  test("markup ingest is a stateless stream transform: streaming == batch") {
    import spark.implicits._
    import graft.functions.expressions.{Inflate, SynthHtml}
    import graft.operators.DocParse
    val base = "target/stream_parse_html"
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete()
    }
    rm(new java.io.File(base))
    val src = Paths.get(s"$base/src")
    Files.createDirectories(src)
    val payloads = Seq(
      ("a.html", SynthHtml.build("streamed page one " * 20)),
      ("b.html.gz", Inflate.gzip(SynthHtml.build("gz streamed page two " * 20))))
    payloads.toDF("doc_name", "payload").coalesce(1).write
      .mode("overwrite").parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    // the SAME records() plan — every parser is a stateless narrow
    // expression, so a nightly crawl drop streams through unchanged
    val q = DocParse.records(
      spark.readStream.schema(schema).parquet(src.toString), "html")
      .writeStream.format("memory").queryName("mem_parse_html")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("doc_name"), r.getAs[String]("content_id"),
        r.getAs[String]("content_raw"), r.getAs[String]("file_hash"))
    val streamed = spark.table("mem_parse_html").collect().map(key).sorted
    val batch = DocParse.records(
      payloads.toDF("doc_name", "payload"), "html").collect().map(key).sorted
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("epub and jsonl ingest stream unchanged (stateless parsers, batch parity)") {
    import spark.implicits._
    import graft.functions.expressions.{Inflate, SynthEpub}
    import graft.operators.DocParse
    val cases = Seq(
      ("epub", Seq(("b1.epub", SynthEpub.build("streamed book one " * 20)))),
      ("jsonl", Seq(("d1.jsonl.gz", Inflate.gzip(Seq(
        """{"url":"http://s/1","text":"streamed record one"}""",
        """{"url":"http://s/2","text":"streamed record two"}""")
        .mkString("\n").getBytes("UTF-8"))))))
    cases.foreach { case (fmt, payloads) =>
      val base = s"target/stream_parse_$fmt"
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(new java.io.File(base))
      val src = Paths.get(s"$base/src")
      Files.createDirectories(src)
      payloads.toDF("doc_name", "payload").coalesce(1).write
        .mode("overwrite").parquet(src.toString)
      val schema = spark.read.parquet(src.toString).schema
      val q = DocParse.records(
        spark.readStream.schema(schema).parquet(src.toString), fmt)
        .writeStream.format("memory").queryName(s"mem_parse_$fmt")
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[String]("doc_name"), r.getAs[String]("content_id"),
          r.getAs[String]("content_raw"), r.getAs[String]("file_hash"))
      val streamed = spark.table(s"mem_parse_$fmt").collect().map(key).sorted
      val batch = DocParse.records(
        payloads.toDF("doc_name", "payload"), fmt).collect().map(key).sorted
      assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq, fmt)
    }
  }

  test("streaming ingest keeps the ANN index fresh (indexChannels)") {
    import spark.implicits._
    val base = "target/stream_ingest_idx"
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete()
    }
    rm(new java.io.File(base))
    val srcDir = Paths.get(s"$base/src")
    Files.createDirectories(srcDir)
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val db = new GraftVectorDB(spark, s"$base/db")

    // bootstrap: batch-ingest the corpus and build the index
    db.ingest(Tables.load(spark, sf, "documents"))
    db.buildAnnIndex(cells = 8)
    val indexedBefore = spark.read.parquet(db.annPath("text")).count()

    // stream a NEW doc with indexChannels — it must land in store AND
    // index. The file-stream source lists FLAT files (no recursion),
    // so the batch is staged as a directory and its part file moved in.
    val staged = Paths.get(s"$base/staged")
    Seq((777777L, "xylophone quibble zephyr minutiae", "en", "srcB", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(staged.toString)
    val part = new java.io.File(staged.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, srcDir.resolve("batch1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = db.ingestStream(
      spark.readStream.schema(schema).parquet(srcDir.toString),
      s"$base/ckpt", indexChannels = Seq("text"))
    q.awaitTermination()

    assert(spark.read.parquet(db.annPath("text")).count() == indexedBefore + 1)
    // servable through the warm ANN path without a rebuild
    val hit = db.searchAnn("xylophone quibble zephyr minutiae", topN = 1, nProbe = 8)
      .collect().head
    assert(hit.getAs[String]("doc_name") == "corpus/srcB/doc_777777.txt")
  }

  test("ingestStream autoRebuildAt: drift past the bound triggers an in-stream rebuild") {
    import spark.implicits._
    val base = "target/stream_ingest_rebuild"
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete()
    }
    rm(new java.io.File(base))
    val srcDir = Paths.get(s"$base/src")
    Files.createDirectories(srcDir)
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val db = new GraftVectorDB(spark, s"$base/db")
    val docs = Tables.load(spark, sf, "documents")

    // bootstrap with a SMALL corpus so a single streamed batch can
    // exceed the appended-fraction bound
    db.ingest(docs.filter($"doc_id" < 20))
    db.buildAnnIndex(cells = 4)
    assert(db.annAppendFraction("text") == 0.0)
    val builtRows = spark.read.parquet(db.annPath("text")).count()

    // stream a batch LARGER than the built corpus with the policy armed
    val staged = Paths.get(s"$base/staged")
    docs.filter($"doc_id" >= 300 && $"doc_id" < 400)
      .coalesce(1).write.parquet(staged.toString)
    val part = new java.io.File(staged.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, srcDir.resolve("batch1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = db.ingestStream(
      spark.readStream.schema(schema).parquet(srcDir.toString),
      s"$base/ckpt", indexChannels = Seq("text"), autoRebuildAt = 1.0)
    q.awaitTermination()

    // the rebuild ran inside the stream: the appended fraction reset
    // and the index re-routed at the SCALE-ADAPTIVE cell count (the
    // corpus ~6x'ed, so the geometry must grow with it — round 7)
    assert(db.annAppendFraction("text") == 0.0,
      "_APPENDED must reset through the auto-rebuild")
    val idxRows = spark.read.parquet(db.annPath("text")).count()
    assert(idxRows > builtRows, "streamed rows must be in the rebuilt index")
    assert(idxRows == db.store.count(), "rebuilt index must cover the whole store")
    val cellsNow = db.annCellHistogram("text").size
    assert(cellsNow > 4,
      s"a ~6x-grown corpus must rebuild to more than its 4 built cells (got $cellsNow)")
    // recall recovered: the streamed docs route with FRESHLY-FIT cells,
    // so the warm partial-probe path finds them, and full probe equals
    // the exact scan — serving keeps working from the same session
    // (the rename swap + generation bump refresh the cached frame)
    val streamed = db.store
      .filter($"doc_name".rlike("doc_3[0-9][0-9]\\.txt") && $"page_num" === 0)
      .select($"doc_name", $"content_raw").head()
    val streamedText = streamed.getString(1)
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("rnk"), r.getAs[Double]("sim_r"),
        r.getAs[String]("doc_name"), r.getAs[String]("content_id"))).toSeq
    assert(key(db.searchAnn(streamedText, 5, nProbe = cellsNow).collect()) ==
      key(db.search(streamedText, 5).collect()),
      "full probe must equal the exact scan after the auto-rebuild")
    assert(db.searchAnn(streamedText, 1, nProbe = 1).collect()
      .head.getAs[String]("doc_name") == streamed.getString(0),
      "the streamed doc's own cell must rank first at nProbe = 1 post-refit")
  }
}
