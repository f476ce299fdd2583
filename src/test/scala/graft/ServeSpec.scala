package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HTTP serving veneer (graft.tools.Serve) — the app.py analog:
  * endpoint contract, error shapes, and a REAL .pdf file ingested
  * over the wire and served back by search. */
class ServeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def rmRf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRf))
    f.delete()
  }

  test("initialize → embed (corpus parquet + real pdf file) → search; app.py error contract") {
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
      // the reference's pre-initialization guard, same code + shape
      val (c0, b0) = post("/search", """{"query":{"text":"x"}}""")
      assert(c0 == 400 && b0.contains("not initialized"), b0)
      val dir = "target/vdb_serve_spec"
      rmRf(new java.io.File(dir))
      val (c1, b1) = post("/initialize", s"""{"save_dir":"$dir"}""")
      assert(c1 == 200 && b1.contains("initialized successfully"), b1)
      // bulk corpus ingest: a parquet dataset path
      val (c2, b2) = post("/embed",
        s"""{"path":"$sf/documents.parquet","is_folder":false}""")
      assert(c2 == 200 && b2.contains("corpus table"), b2)
      // a REAL .pdf file over the wire, through the real parser
      val tmp = java.nio.file.Files.createTempDirectory("serve_pdf")
      val text = Tables.load(spark, sf, "documents")
        .orderBy($"doc_id").select($"text").first().getString(0)
      val pdfBytes = Seq(text).toDF("t")
        .select(graft.functions.expressions.SynthPdf($"t").as("p"))
        .first().getAs[Array[Byte]]("p")
      val pdfPath = tmp.resolve("report.pdf")
      java.nio.file.Files.write(pdfPath, pdfBytes)
      val (c3, b3) = post("/embed",
        s"""{"path":"$pdfPath","is_folder":false}""")
      assert(c3 == 200 && b3.contains("report.pdf") &&
        b3.contains("\"records\""), b3)
      // folder form sweeps supported files
      val (c3b, b3b) = post("/embed", s"""{"path":"$tmp","is_folder":true}""")
      assert(c3b == 200, b3b) // re-embed dedups to 0 fresh records, still 200
      // search serves rows with the serving surface's columns
      val (c4, b4) = post("/search",
        """{"query":{"text":"fast query join table"},"top_n":3}""")
      assert(c4 == 200 && b4.contains("\"rnk\":1") &&
        b4.contains("doc_name"), b4)
      // the pdf's content is findable scoped to its own path
      val (c4b, b4b) = post("/search",
        s"""{"query":{"text":"${text.split("\\s+").take(4).mkString(" ")}"},
           |"search_location":"$pdfPath","top_n":3}""".stripMargin)
      assert(c4b == 200 && b4b.contains("report.pdf"), b4b)
      // image queries: one result list per base64 item; bad base64 is
      // the reference's 400
      val okB64 = java.util.Base64.getEncoder.encodeToString("img".getBytes)
      val (c5, b5) = post("/search",
        s"""{"query":{"text":"x","image":["$okB64"]}}""")
      assert(c5 == 200 && b5.contains("\"image\":[["), b5)
      val (c6, b6) = post("/search", """{"query":{"text":"x","image":["%%%"]}}""")
      assert(c6 == 400 && b6.contains("invalid image format"), b6)
      // missing query text, unsupported file type, bad JSON
      val (c7, b7) = post("/search", """{"query":{}}""")
      assert(c7 == 400 && b7.contains("required"), b7)
      val (c8, b8) = post("/embed", """{"path":"build.sbt","is_folder":false}""")
      assert(c8 == 400 && b8.contains("unsupported file type"), b8)
      val (c9, b9) = post("/search", """{"query":{""")
      assert(c9 == 400 && b9.contains("bad JSON"), b9)
    } finally server.stop(0)
  }
}
