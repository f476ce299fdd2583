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
    val docs = Tables.load(spark, sf, "documents")
    println(s"[demo] ingested ${db.ingest(docs)} records")
    println(s"[demo] re-ingest appended ${db.ingest(docs)} (expect 0)")
    println("[demo] search('fast query join table'):")
    db.search("fast query join table", topN = 5).show(20, 60)
    println("[demo] multimodal search:")
    db.searchMultimodal("fast query join table", topN = 3).show(20, 60)
    spark.stop()
  }
}
