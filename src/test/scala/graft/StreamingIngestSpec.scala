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
}
