package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraftVectorDB

/** Scale-adaptive rebuild geometry — the IVF twin of the round-6
  * adaptive embed-LSH fix: a drift-triggered rebuild derives its cell
  * count from the LIVE index size (footer-stats row count against the
  * `_BUILT` anchor) instead of pinning the built cell count forever.
  * Uniform corpus growth never trips the 4× skew gauge (all cells grow
  * together), so without this a store that 10×es under streaming
  * ingest keeps its original cells and every probe scan slows
  * linearly. */
class AdaptiveCellsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val queries = Seq(
    "fast query join table", "slow merge sort line", "hash vector stream",
    "data table row group", "the big filter window")

  private def rmRf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRf))
    f.delete()
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[String]("doc_name"), r.getAs[String]("content_id"))

  test("a ~10x-grown store rebuilds to proportionally more cells; serving stays exact and recall holds") {
    import spark.implicits._
    val dir = "target/vdb_adaptive_cells"
    rmRf(new java.io.File(dir))
    val db = new GraftVectorDB(spark, dir)
    val docs = Tables.load(spark, sf, "documents")
    assert(db.ingest(docs.filter($"doc_id" < 50)) > 0)
    db.buildAnnIndex(cells = 8)
    val cells0 = db.annCellHistogram("text").size
    val rows0 = db.annCellHistogram("text").values.sum
    assert(db.adaptiveCells("text") == math.max(cells0, 8),
      "at the built size the adaptive count IS the built count")

    // grow ~10x through the real append path (fresh hashes per batch);
    // growth is UNIFORM — same distribution — so the skew gauge stays
    // silent and only the adaptive rebuild can restore occupancy
    (1 to 9).foreach { k =>
      assert(db.ingest(docs.filter($"doc_id" < 50)
        .withColumn("doc_id", $"doc_id" + k * 100000L)
        .withColumn("text", concat($"text", lit(s" uniform growth $k"))),
        indexChannels = Seq("text")) > 0)
    }
    val rows1 = db.annCellHistogram("text").values.sum
    assert(rows1 >= 9L * rows0, s"growth did not land in the index: $rows0 -> $rows1")
    assert(db.annAppendFraction("text") > 1.0, "the drift policy must trip")
    assert(!db.annIndexSkewed("text"),
      "uniform growth must NOT trip the skew gauge - that is the point")

    // maintain = rebuild-if-drifted: the rebuild must scale the geometry
    val (_, rebuilt) = db.maintain("text")
    assert(rebuilt, "maintain must rebuild past the drift bound")
    val cells1 = db.annCellHistogram("text").size
    assert(cells1 >= 4 * cells0,
      s"a ~10x-grown store must rebuild to proportionally more cells " +
        s"(got $cells0 -> $cells1)")
    assert(cells1 <= GraftVectorDB.MaxAdaptiveCells)
    // per-cell occupancy back near the build-time anchor (rows0/cells0),
    // not 10x it — the property the fixed geometry loses
    val meanOcc = rows1.toDouble / cells1
    val anchor = rows0.toDouble / cells0
    assert(meanOcc <= 2.0 * anchor,
      f"mean occupancy $meanOcc%.1f must hold near the anchor $anchor%.1f")
    assert(db.annAppendFraction("text") == 0.0, "_APPENDED resets at rebuild")

    // serving: full probe == exact, and default-probe recall holds
    val q = queries.head
    assert(db.searchAnn(q, 5, nProbe = cells1).collect().map(key).toSeq ==
      db.search(q, 5).collect().map(key).toSeq,
      "full probe must reproduce the exact search after the adaptive rebuild")
    val recall = queries.map { t =>
      val exact = db.search(t, 5).collect().map(key).toSet
      val ann = db.searchAnn(t, 5).collect().map(key).toSet
      (ann & exact).size.toDouble / exact.size
    }.sum / queries.size
    assert(recall >= 0.9, f"recall@5 at default nProbe fell to $recall%.2f")

    // a second maintain right after: nothing drifted, no rebuild, and
    // the adaptive count is stable (no geometry creep on no-op runs)
    val (_, rebuilt2) = db.maintain("text")
    assert(!rebuilt2)
    assert(db.annCellHistogram("text").size == cells1)
  }
}
