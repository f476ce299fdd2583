package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraftVectorDB

/** Single-writer lease (round-8): the store's rename/stamp mutation
  * protocols assume one writer — `_LOCK` turns that convention into a
  * loud failure for a second live writer, with stale-lease takeover
  * for crashed holders. */
class WriterLeaseSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dbDir = "target/vdb_lease_spec"

  private def rmRf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRf))
    f.delete()
  }

  private def plantLease(ageMs: Long): Unit = {
    new java.io.File(dbDir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dbDir, "_LOCK"),
      s"dead-writer-0000\t${System.currentTimeMillis() - ageMs}".getBytes("UTF-8"))
  }

  private def docs = Tables.load(spark, sf, "documents")
    .filter(col("doc_id") < 8)

  test("a second writer fails loudly while a live lease is held") {
    rmRf(new java.io.File(dbDir))
    plantLease(ageMs = 0)
    val d = new GraftVectorDB(spark, dbDir)
    val e = intercept[IllegalStateException] { d.ingest(docs) }
    assert(e.getMessage.contains("another writer"))
    // nothing was written under the foreign lease
    assert(!new java.io.File(dbDir, "vector_store").exists())
  }

  test("a crashed holder's stale lease is reclaimed, then released") {
    rmRf(new java.io.File(dbDir))
    plantLease(ageMs = GraftVectorDB.LeaseStaleMs + 60000)
    val d = new GraftVectorDB(spark, dbDir)
    assert(d.ingest(docs) > 0)
    assert(!new java.io.File(dbDir, "_LOCK").exists(),
      "the lease must be released after the mutation")
  }

  test("nested mutations share one lease and release it exactly once") {
    rmRf(new java.io.File(dbDir))
    val d = new GraftVectorDB(spark, dbDir)
    assert(d.ingest(docs) > 0)
    d.buildAnnIndex(cells = 4)
    // ingestRecords -> appendAnnIndex nests; maintainStore -> compact nests
    val more = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") >= 8 && col("doc_id") < 12)
    assert(d.ingestRecords(GraftVectorDB.pipeline(more),
      indexChannels = Seq("text")) > 0)
    d.maintainStore(targetFiles = 1)
    assert(!new java.io.File(dbDir, "_LOCK").exists())
    // and the store still serves
    assert(d.search("fast query join table", 5).collect().nonEmpty)
  }

  test("a failed mutation still releases the lease") {
    rmRf(new java.io.File(dbDir))
    val d = new GraftVectorDB(spark, dbDir)
    assert(d.ingest(docs) > 0)
    intercept[Exception] {
      // appending to a never-built index fails its require
      d.appendAnnIndex(GraftVectorDB.pipeline(docs))
    }
    assert(!new java.io.File(dbDir, "_LOCK").exists(),
      "a throwing mutation must not strand the lease")
  }
}
