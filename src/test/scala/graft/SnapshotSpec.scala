package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraftVectorDB

/** Snapshot manifest (round-7 stretch): `snapshot()` commits a
  * versioned file list of the LIVE store + index state — the contract
  * an external copier replays for a consistent cross-system copy that
  * cannot straddle a rewrite or pick up crash residue. */
class SnapshotSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dbDir = "target/vdb_snapshot_spec"
  private val q = "fast query join table"

  private def rmRf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRf))
    f.delete()
  }

  private lazy val db = {
    rmRf(new java.io.File(dbDir))
    val d = new GraftVectorDB(spark, dbDir)
    val docs = Tables.load(spark, sf, "documents")
    assert(d.ingest(docs.filter(col("doc_id") < 60)) > 0)
    d.buildAnnIndex(cells = 8)
    d
  }

  private def manifestLines(path: String): Seq[(String, Long)] =
    scala.io.Source.fromFile(path.stripPrefix("file:")).getLines()
      .filter(_.nonEmpty).map { l =>
        val Array(p, len) = l.split("\t"); (p, len.toLong)
      }.toSeq

  test("the manifest lists exactly the live files - lengths right, residue excluded") {
    // plant crash residue of every staging protocol: none may be listed
    val part = new java.io.File(s"${db.storePath}/content_type=text_chunk")
    new java.io.File(part, ".delete_tmp_junk").mkdir()
    val ghost = new java.io.File(dbDir, ".ann_build_tmp_ghost")
    ghost.mkdir()
    new java.io.File(ghost, "part-0.parquet").createNewFile()
    val mPath = db.snapshot()
    val listed = manifestLines(mPath)
    assert(listed.nonEmpty)
    assert(listed.forall { case (p, _) => !p.split("/").exists(_.startsWith(".")) },
      "staging/crash residue must never be listed")
    // every listed file exists with the listed length; every live
    // (non-dot) file under the data roots is listed
    listed.foreach { case (p, len) =>
      val f = new java.io.File(dbDir, p)
      assert(f.isFile, s"listed but missing: $p")
      assert(f.length == len, s"length drift for $p")
    }
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.getName.startsWith(".")) Nil
      else if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else Seq(f)
    val live = (walk(new java.io.File(db.storePath)) ++
        walk(new java.io.File(db.annPath("text"))))
      .map(_.getPath.stripPrefix(s"$dbDir/")).toSet
    assert(listed.map(_._1).toSet == live,
      "the manifest must list exactly the live files")
    new java.io.File(part, ".delete_tmp_junk").delete()
    rmRf(ghost)
  }

  test("a copy restored from the manifest serves identically") {
    val mPath = db.snapshot()
    val copyDir = "target/vdb_snapshot_copy"
    rmRf(new java.io.File(copyDir))
    manifestLines(mPath).foreach { case (p, _) =>
      val src = java.nio.file.Paths.get(dbDir, p)
      val dst = java.nio.file.Paths.get(copyDir, p)
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.copy(src, dst)
    }
    val copy = new GraftVectorDB(spark, copyDir)
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("rnk"), r.getAs[Double]("sim_r"),
        r.getAs[String]("doc_name"), r.getAs[String]("content_id"))).toSeq
    assert(key(copy.search(q, 5).collect()) == key(db.search(q, 5).collect()))
    assert(key(copy.searchAnn(q, 5, nProbe = 4).collect()) ==
      key(db.searchAnn(q, 5, nProbe = 4).collect()))
    // serving metadata rode along: drift counters agree
    assert(copy.annAppendFraction("text") == db.annAppendFraction("text"))
  }

  test("restore() replays the manifest and the copy serves identically") {
    // the sidecars are live state too: both must ride the manifest —
    // a copy without neardup/ silently re-admits near-dups, one
    // without lexical/ loses hybrid search
    db.indexLexical()
    db.indexNearDup(Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 60))
    db.snapshot()
    val copyDir = "target/vdb_snapshot_restore"
    rmRf(new java.io.File(copyDir))
    val copy = db.restore(copyDir)
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("rnk"), r.getAs[Double]("sim_r"),
        r.getAs[String]("doc_name"), r.getAs[String]("content_id"))).toSeq
    assert(key(copy.search(q, 5).collect()) == key(db.search(q, 5).collect()))
    assert(key(copy.searchAnn(q, 5, nProbe = 4).collect()) ==
      key(db.searchAnn(q, 5, nProbe = 4).collect()))
    def hkey(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("rnk"), r.getAs[Double]("rrf_r"),
        r.getAs[String]("doc_name"), r.getAs[String]("content_id"))).toSeq
    assert(copy.lexicalIndexed && copy.nearDupIndexed)
    assert(hkey(copy.searchHybrid(q, 5).collect()) ==
      hkey(db.searchHybrid(q, 5).collect()))
    assert(copy.annAppendFraction("text") == db.annAppendFraction("text"))
    // the copy is itself snapshot-consistent (manifest rode along) and
    // refuses to be restored over
    assert(new java.io.File(copyDir, "_snapshots").listFiles()
      .exists(_.getName.startsWith("manifest.v")))
    intercept[IllegalArgumentException] { db.restore(copyDir) }
    rmRf(new java.io.File(copyDir))
  }

  test("restore() replays the manifest as ONE Spark job on the distributed path") {
    db.snapshot()
    val copyDir = "target/vdb_snapshot_restore_dist"
    rmRf(new java.io.File(copyDir))
    // force the distributed path (the spec store is under the serial
    // threshold) and pin the job count: the whole byte replay is one
    // parallelize().foreach, NOT a per-file driver loop
    var jobs = 0
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val copy = try {
      val c = db.restore(copyDir, serialThreshold = 1)
      org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark)
      jobs = n.get()
      c
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 1, s"distributed restore must be ONE job, saw $jobs")
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[String]("doc_name"), r.getAs[Long]("content_id"))).toSeq
    assert(key(copy.search(q, 5).collect()) == key(db.search(q, 5).collect()))
    assert(key(copy.searchAnn(q, 5, nProbe = 4).collect()) ==
      key(db.searchAnn(q, 5, nProbe = 4).collect()))
    rmRf(new java.io.File(copyDir))
  }

  test("restore() fails loudly on a stale manifest instead of a silent partial copy") {
    val mPath = db.snapshot()
    // simulate later maintenance reclaiming a listed file after the
    // manifest was taken: restore must say 'take a fresh snapshot', not
    // produce a copy missing data
    val victimRel = manifestLines(mPath)
      .collectFirst { case (p, _) if p.endsWith(".parquet") => p }.get
    val victim = new java.io.File(dbDir, victimRel)
    val bytes = java.nio.file.Files.readAllBytes(victim.toPath)
    victim.delete()
    val copyDir = "target/vdb_snapshot_stale"
    rmRf(new java.io.File(copyDir))
    val e = intercept[java.io.IOException] { db.restore(copyDir) }
    assert(e.getMessage.contains("fresh snapshot"))
    java.nio.file.Files.write(victim.toPath, bytes)
    rmRf(new java.io.File(copyDir))
  }

  test("versions supersede: a second snapshot leaves exactly one manifest") {
    val p1 = db.snapshot()
    val p2 = db.snapshot()
    assert(p2 != p1)
    val snaps = new java.io.File(dbDir, "_snapshots").listFiles()
      .map(_.getName).filter(_.startsWith("manifest.v"))
    assert(snaps.length == 1, s"superseded manifests must be reclaimed: ${snaps.toSeq}")
    // maintainStore's exit stamps one too (the wired-in path)
    db.maintainStore(targetFiles = 1000)
    assert(new java.io.File(dbDir, "_snapshots").listFiles()
      .count(_.getName.startsWith("manifest.v")) == 1)
  }
}
