package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraftVectorDB

/** Cell-occupancy skew: routing centroids never refit between
  * rebuilds, so a hot key range concentrates appends into one cell and
  * its probe scan comes to dominate p99. The gauge must trip on a
  * planted hot cell, the split must rebalance it WITHOUT a rebuild,
  * and search results must be invariant through the whole lifecycle. */
class AnnSkewSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dbDir = "target/vdb_skew_spec"
  private val q = "fast query join table"

  private lazy val db = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val root = new java.io.File(dbDir)
    if (root.exists()) rm(root)
    val d = new GraftVectorDB(spark, dbDir)
    val docs = Tables.load(spark, sf, "documents")
    assert(d.ingest(docs.filter(col("doc_id") < 50)) > 0)
    d.buildAnnIndex(cells = 8)
    d
  }

  private def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
    (r.getAs[Long]("rnk"), r.getAs[Double]("sim_r"),
      r.getAs[String]("doc_name"), r.getAs[String]("content_id"))).toSeq

  test("planted hot cell trips the gauge; split rebalances; results invariant") {
    import spark.implicits._
    assert(!db.annIndexSkewed("text"), "fresh build must start balanced")
    // plant: two distinct sub-populations, both a small perturbation of
    // one EXISTING row's embedding, so they route into that row's cell
    // (the hot key range an append-heavy workload creates) while being
    // separable by the 2-means refit
    val base = db.store.select($"embedding").head().getSeq[Double](0).toArray
    val hotDocs = (0 until 600).map(i =>
      (800000L + i, s"hot range doc $i", "en", "srcH")).toSeq
      .toDF("doc_id", "text", "lang", "source")
    // a tight but SPREAD cluster (two lobes ±0.02 on dim 0, per-doc
    // jitter on dim 1): distinct vectors, so recursive bisection can
    // actually rebalance — coincident points cannot be separated by
    // any split and would pin the floor at the duplicate-group size
    val hot = GraftVectorDB.pipeline(hotDocs).filter($"page_num" === 0)
      .withColumn("embedding", {
        val sign = when(xxhash64($"doc_name") % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
        val jitter = (pmod(xxhash64($"doc_name", lit(7)), lit(1000)).cast("double")
          / 1000 - 0.5) * 0.01
        transform(typedLit(base.toSeq), (x, i) =>
          when(i === 0, x + sign * 0.02)
            .when(i === 1, x + jitter)
            .otherwise(x))
      })
    // through the real ingest path (store + index append), so the
    // store ≡ index contract holds and exact-vs-ANN parity is sound
    assert(db.ingestRecords(hot, indexChannels = Seq("text")) == 600)
    // the plant landed in ONE cell (else it is not a skew test)
    val hotCells = spark.read.parquet(db.annPath("text"))
      .filter($"doc_name".startsWith("corpus/srcH/"))
      .select($"cell").distinct().collect().map(_.getInt(0))
    assert(hotCells.length == 1, s"plant scattered across ${hotCells.toSeq}")
    // gauge trips: footer-stats histogram, no data scan
    val histBefore = db.annCellHistogram("text")
    val skewBefore = db.annCellSkew("text")
    assert(skewBefore > GraftVectorDB.CellSkewRatio,
      s"planted skew $skewBefore must exceed ${GraftVectorDB.CellSkewRatio}")
    assert(db.annIndexSkewed("text"))
    assert(histBefore.values.sum ==
      spark.read.parquet(db.annPath("text")).count(),
      "histogram must account for every row")
    // full-probe ANN == exact search, before and after the split
    val probeAll = 32 // >= live cell count throughout
    val exactBefore = key(db.search(q, 5).collect())
    assert(key(db.searchAnn(q, 5, nProbe = probeAll).collect()) == exactBefore)
    val split = db.splitHotCells("text")
    assert(split.contains(hotCells.head),
      s"must split the planted hot cell ${hotCells.head}, got $split")
    // rebalanced: the two sub-populations separate, so the hottest
    // cell drops to ~half the plant
    val skewAfter = db.annCellSkew("text")
    assert(skewAfter < skewBefore / 1.5,
      s"split must rebalance: $skewBefore -> $skewAfter")
    // the routing table dropped the hot cell and gained two fresh ids
    val hist = db.annCellHistogram("text")
    assert(!hist.contains(hotCells.head), "source cell dir must be reclaimed")
    assert(hist.keys.count(_ > histBefore.keys.max) >= 2,
      "fresh sub-cells must exist (2 per split round)")
    // results invariant through the split (both serving channels)
    assert(key(db.searchAnn(q, 5, nProbe = probeAll).collect()) ==
      key(db.search(q, 5).collect()))
    val rows = spark.read.parquet(db.annPath("text")).count().toInt
    assert(key(db.searchAnnPq(q, 5, probeAll, rows).collect()) ==
      key(db.search(q, 5).collect()))
    // a hot-range query probes its own sub-cells: top hits are the
    // planted docs, identical to the exact scan
    val hotQ = db.store.filter($"doc_name".startsWith("corpus/srcH/"))
      .select($"content_raw").head().getString(0)
    assert(key(db.searchAnn(hotQ, 5, nProbe = probeAll).collect()) ==
      key(db.search(hotQ, 5).collect()))
    // appends keep routing correctly with the amended table
    val fresh = Seq((900000L, "post split appended doc fast join", "en", "srcP"))
      .toDF("doc_id", "text", "lang", "source")
    assert(db.appendAnnIndex(GraftVectorDB.pipeline(fresh)) > 0)
    assert(db.searchAnn("post split appended doc fast join", 3,
      nProbe = probeAll).collect()
      .exists(_.getAs[String]("doc_name") == "corpus/srcP/doc_900000.txt"))
    // and a fresh session resolves the amended routing from disk
    val db2 = new GraftVectorDB(spark.newSession(), dbDir)
    assert(key(db2.searchAnn(q, 5, nProbe = probeAll).collect()) ==
      key(db.search(q, 5).collect()))
  }

  test("maintenance entry reclaims an interrupted split's staged dirs") {
    import spark.implicits._
    val idxDir = new java.io.File(db.annPath("text"))
    // fabricate the pre-commit crash state: a staged cell dir whose id
    // the routing table does not reference
    val donor = idxDir.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).head
    val staged = new java.io.File(idxDir, "cell=777")
    staged.mkdir()
    donor.listFiles().filter(_.getName.endsWith(".parquet")).take(1).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(staged, f.getName).toPath)
    }
    val before = key(db.searchAnn(q, 5, nProbe = 32).collect())
    // the unreferenced dir is invisible to probes even before reclaim
    assert(before == key(db.search(q, 5).collect()))
    db.splitHotCells("text") // entry runs recovery + reclaim
    assert(!staged.exists(), "staged dir of an interrupted split must be reclaimed")
    assert(key(db.searchAnn(q, 5, nProbe = 32).collect()) == before)
  }

  test("maintain(): rebuild-if-drifted, else compact-if-fragmented with the split knob") {
    // the suite's plant appended ~6× the built corpus, so the drift
    // policy has tripped — maintain must act on it
    assert(db.annIndexNeedsRebuild("text"))
    val (compacted, rebuilt) = db.maintain("text")
    assert(rebuilt, "a drifted index must rebuild")
    assert(compacted == 0, "a rebuild subsumes compaction")
    assert(db.annAppendFraction("text") == 0.0, "_APPENDED must reset")
    // the rebuilt index covers the whole store (empty cells of the
    // refit simply write no dir — the histogram counts rows, not slots)
    assert(db.annCellHistogram("text").values.sum == db.store.count())
    // serving stays exact through the rebuild
    assert(key(db.searchAnn(q, 5, nProbe = 32).collect()) ==
      key(db.search(q, 5).collect()))
    // a second maintain has nothing to rebuild: the compaction path
    // runs instead (the rebuild's shuffle wrote several files per
    // cell, so there IS fragmentation to collapse) — and once it has,
    // a third pass is a no-op
    val (_, r2) = db.maintain("text")
    assert(!r2, "a fresh rebuild must not re-trigger")
    val (c3, r3) = db.maintain("text")
    assert(!r3 && c3 == 0, "a compacted index needs no further rewrite")
    assert(key(db.searchAnn(q, 5, nProbe = 32).collect()) ==
      key(db.search(q, 5).collect()))
  }
}
