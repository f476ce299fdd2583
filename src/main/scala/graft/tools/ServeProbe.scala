package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.GraftVectorDB

/** Serving-path scaling probe (round-7 sf10 spot check): builds the
  * store + text ANN index from a ScaleGen corpus and times the paths a
  * deployed store actually serves — warm single-query searchAnn /
  * searchAnnPq (min of 3) and a 64-query searchAllAnn batch — plus the
  * one-time ingest/build costs. Run at sf1 and sf10 for the
  * decade-over-decade ratio the sf0.1→sf1 curve cannot give. */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("data/sf1")
    val dbDir = if (args.length > 1) args(1) else s"target/serve_probe_db"
    val spark = graft.GraftSession.local(32, "serve-probe")
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(dbDir))
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[serveprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def timeMin(tag: String, n: Int)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[serveprobe] $tag: ${ts.min}%.3f s (min of $n)")
    }
    val db = new GraftVectorDB(spark, dbDir)
    val docs = graft.Tables.load(spark, dir, "documents")
    println(s"[serveprobe] corpus ${docs.count()} docs ($dir)")
    time("ingest")(db.ingest(docs))
    val rows = db.store.count()
    println(s"[serveprobe] store rows $rows")
    // first-build sizing at the same anchor the adaptive rebuild holds
    // (~2k rows/cell), inside the sample-fit cap
    val cells = math.max(32,
      math.min(GraftVectorDB.MaxAdaptiveCells, (rows / 2000).toInt))
    time(s"buildAnnIndex($cells cells)")(db.buildAnnIndex(cells))
    val qs = Seq("fast query join table", "slow merge sort line",
      "hash vector stream")
    db.searchAnn(qs.head, 5).collect() // warm the serving cache
    timeMin("warm searchAnn", 3)(db.searchAnn(qs(1), 5).collect())
    timeMin("warm searchAnnPq", 3)(db.searchAnnPq(qs(2), 5).collect())
    val batch = (0 until 64).map(i => (i.toLong, s"${qs(i % 3)} v$i"))
      .toDF("q_id", "q_text")
    timeMin("searchAllAnn x64", 2)(db.searchAllAnn(batch, 5).collect())
    timeMin("searchAllAnnPq x64", 2)(db.searchAllAnnPq(batch, 5).collect())
    spark.stop()
  }
}
