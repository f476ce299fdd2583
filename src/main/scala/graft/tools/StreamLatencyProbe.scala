package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Micro-batch LATENCY evidence for the streaming gates (VERDICT r16
  * item #10: "parity specs but no latency artifact"): drives the
  * curation gate (plain + watermark-bounded) and the crawl/image
  * gates from a [[MemoryStream]] at sf1 document rates, measures
  * per-micro-batch wall (p50/p95/max over timed batches), and logs
  * the state-store row counts so the bounded-state claims carry
  * numbers. One JSON line → BENCH_stream_r{N}.json.
  *
  * Run: SPARK_GRAFT_SF_DIR=data/sf1 sbt "runMain graft.tools.StreamLatencyProbe"
  */
object StreamLatencyProbe {
  private case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: org.apache.spark.sql.SparkSession = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-stream-latency")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .collect()
      .map(r => Doc(r.getAs[Number](0).longValue, r.getString(1),
        r.getString(2), r.getString(3), r.getAs[Number](4).longValue)).toSeq
    println(s"[stream] corpus: ${docs.size} docs")

    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, (p * s.size).toInt))
    }

    /** Feed `batches` through a started query; return per-batch wall
      * (first `warm` batches untimed) + last state row count. */
    def drive[T](name: String, src: MemoryStream[T],
        q: org.apache.spark.sql.streaming.StreamingQuery,
        batches: Seq[Seq[T]], warm: Int): (String, Seq[Double], Long) = {
      val walls = batches.zipWithIndex.map { case (b, i) =>
        val t0 = System.nanoTime()
        src.addData(b)
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e6
      }
      val state = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      q.stop()
      val timed = walls.drop(warm)
      println(f"[stream] $name%-22s batches=${timed.size}%3d " +
        f"p50=${pct(timed, 0.5)}%7.1f ms  p95=${pct(timed, 0.95)}%7.1f ms  " +
        f"max=${timed.max}%7.1f ms  state_rows=$state")
      (name, timed, state)
    }

    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Double], Long)]

    // ---- curation gate, plain (global dedup state) ----
    {
      val src = MemoryStream[Doc]
      val q = graft.streaming.DocStreams.curateGate(src.toDF())
        .writeStream.outputMode("append").format("memory")
        .queryName("lat_gate_plain").start()
      results += drive("curate_gate", src, q,
        docs.grouped(1000).toSeq, warm = 2)
    }

    // ---- curation gate, watermark-bounded (production shape) ----
    {
      val src = MemoryStream[Doc]
      // event time advances ~1 minute per 1000 docs; the 10-minute
      // horizon keeps ~10 micro-batches of hashes in state
      val arrival = src.toDF().withColumn("arrival",
        timestamp_seconds(lit(1700000000L) + col("doc_id") / lit(16)))
      val q = graft.streaming.DocStreams.curateGateBounded(
          arrival, "arrival", "10 minutes")
        .writeStream.outputMode("append").format("memory")
        .queryName("lat_gate_bounded").start()
      results += drive("curate_gate_bounded", src, q,
        docs.sortBy(_.doc_id).grouped(1000).toSeq, warm = 2)
    }

    // ---- crawl text gate over real capture payloads ----
    {
      val subset = docs.take(5000)
      val src = MemoryStream[(Long, String)]
      val caps = src.toDF().toDF("doc_id", "text")
        .select($"doc_id",
          graft.functions.expressions.SynthWarc($"text").as("payload"))
      val q = graft.operators.CrawlPipeline.crawlGate(caps)
        .writeStream.outputMode("append").format("memory")
        .queryName("lat_crawl_gate").start()
      results += drive("crawl_gate", src, q,
        subset.map(d => (d.doc_id, d.text)).grouped(250).toSeq, warm = 2)
    }

    // ---- crawl image gate (decompress + WARC walk + decode in-stream) ----
    {
      val subset = docs.take(2500)
      val src = MemoryStream[(Long, String)]
      val caps = src.toDF().toDF("doc_id", "text")
        .select($"doc_id",
          graft.functions.expressions.SynthWarcImg($"text").as("payload"))
      val q = graft.operators.CrawlPipeline.imageGate(caps)
        .writeStream.outputMode("append").format("memory")
        .queryName("lat_image_gate").start()
      results += drive("image_gate", src, q,
        subset.map(d => (d.doc_id, d.text)).grouped(250).toSeq, warm = 2)
    }

    val json = results.map { case (n, timed, state) =>
      s"""{"gate":"$n","batches":${timed.size},""" +
        s""""p50_ms":${pct(timed, 0.5)},"p95_ms":${pct(timed, 0.95)},""" +
        s""""max_ms":${timed.max},"state_rows":$state}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"stream_latency","gates":$json,"sf":"$sfDir"}""")
    spark.stop()
  }
}
