package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraftVectorDB

/** Recall drift under index appends — the measurement behind
  * [[GraftVectorDB.AppendRebuildFraction]]: appended rows route with
  * BUILD-time centroids, so as the appended fraction grows the cell
  * geometry stops reflecting the data and partial-probe recall can
  * degrade. This spec grows an index to ~1× and ~5× its built size via
  * the real ingest-with-indexChannels path and measures recall@5
  * (searchAnn partial probe vs the exact scan) at each point, then
  * checks the rebuild policy trips exactly where the bound says.
  * Deterministic end to end (hash embeddings, driver-Lloyd fits), so
  * the measured floors are stable pins, not flaky estimates. */
class AnnAppendDriftSpec extends AnyFunSuite {
  import SparkTestSession._

  private val queries = Seq(
    "fast query join table", "slow merge sort line", "hash vector stream",
    "data table row group", "the big filter window")

  test("append drift: recall measured at ~1x and ~5x appends; rebuild policy trips past the bound") {
    import spark.implicits._
    val dir = "target/vdb_drift"
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rm))
      x.delete()
    }
    rm(new java.io.File(dir))
    val db = new GraftVectorDB(spark, dir)
    val docs = Tables.load(spark, sf, "documents")
    assert(db.ingest(docs.filter($"doc_id" < 250)) > 0)
    db.buildAnnIndex(cells = 8)
    assert(db.annAppendFraction("text") == 0.0)
    assert(!db.annIndexNeedsRebuild("text"))

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("doc_name"), r.getAs[String]("content_id"))
    def recall(nProbe: Int): Double = queries.map { q =>
      val exact = db.search(q, topN = 5).collect().map(key).toSet
      val ann = db.searchAnn(q, topN = 5, nProbe = nProbe).collect().map(key).toSet
      (ann & exact).size.toDouble / exact.size
    }.sum / queries.size

    val r0 = recall(nProbe = 4)
    // ~1×: a second same-sized slice flows through the REAL path —
    // ingest routes the fresh rows into the index via indexChannels
    assert(db.ingest(docs.filter($"doc_id" >= 250)
      .withColumn("text", concat($"text", lit(" drift batch one"))),
      indexChannels = Seq("text")) > 0)
    val f1 = db.annAppendFraction("text")
    val r1 = recall(nProbe = 4)
    // ~5×: four more slices with fresh hashes
    (2 to 5).foreach { k =>
      assert(db.ingest(docs
        .withColumn("doc_id", $"doc_id" + k * 100000L)
        .withColumn("text", concat($"text", lit(s" drift batch $k"))),
        indexChannels = Seq("text")) > 0)
    }
    val f5 = db.annAppendFraction("text")
    val r5 = recall(nProbe = 4)
    info(f"recall@5 (nProbe 4/8): built $r0%.2f -> ${f1}%.2fx appended $r1%.2f " +
      f"-> ${f5}%.2fx appended $r5%.2f")

    // the policy: below the bound the flag stays down, past it it trips
    // — wired into appendAnnIndex (it warns on the same predicate)
    assert(f1 > 0.8 && f1 < 1.2, s"one same-sized slice should land near 1x, got $f1")
    assert(db.annIndexNeedsRebuild("text") == (f5 > GraftVectorDB.AppendRebuildFraction))
    assert(f5 > 4.0, s"five slices should exceed 4x, got $f5")
    assert(db.annIndexNeedsRebuild("text"))

    // measured drift bound: at ≤1× appended, partial-probe recall holds
    // within 0.15 of the built index's own recall on this worst-case
    // (deliberately unclustered) space — the basis for
    // AppendRebuildFraction = 1.0; past it we only require the index
    // still SERVES (full probe stays exact by construction)
    assert(r1 >= r0 - 0.15, f"recall collapsed at ~1x append: $r0%.2f -> $r1%.2f")
    // measured on this corpus: 0.96 -> 0.96 -> 0.96 even at ~9× —
    // same-DISTRIBUTION appends barely drift (cells stay balanced), so
    // the 1× policy bound is the conservative guard for the case the
    // corpus cannot exhibit here: distribution SHIFT in the appends
    assert(r5 >= 0.7, f"recall collapsed under heavy append: $r5%.2f")
    val exactFull = db.search(queries.head, topN = 5).collect().map(key).toSeq
    val annFull = db.searchAnn(queries.head, topN = 5, nProbe = 8).collect().map(key).toSeq
    assert(annFull == exactFull, "full probe must stay exact at any drift")

    // rebuild resets the gauge
    db.buildAnnIndex(cells = 8)
    assert(db.annAppendFraction("text") == 0.0)
    assert(!db.annIndexNeedsRebuild("text"))
  }
}
