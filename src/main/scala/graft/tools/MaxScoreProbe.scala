package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.GraftVectorDB

/** MaxScore real-scale engagement probe (round-11, closing VERDICT-r10
  * item #8): on a Zipfian stop-worded ScaleGen corpus big enough that
  * a common term's posting list clears the economic floor
  * ([[GraftVectorDB.LexMaxScoreMinCommonRows]], 2²⁰ rows), measure
  * whether the DEFAULT serving path actually engages the pruned plan,
  * whether it wins wall-clock against the forced full scan, and that
  * the two return IDENTICAL rows (exactness is the whole point of
  * MaxScore — Turtle & Flood 1995). Emits one JSON line for the round
  * artifact.
  *
  * Corpus: `SPARK_GRAFT_STOPWORD_LAYER=1 SPARK_GRAFT_TABLES=documents
  * runMain graft.tools.ScaleGen /root/testdata/sf0.1 data/sf10sw`
  * with `SPARK_GRAFT_REPLICAS=100`. The store+sidecar build is reused
  * across runs when the dbDir already holds a lexical index. */
object MaxScoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("data/sf10sw")
    val dbDir = if (args.length > 1) args(1) else "target/maxscore_probe_db"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "maxscore-probe")
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[T](tag: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[maxscore-probe] $tag: $s%.2f s")
      (r, s)
    }
    def timeMin(tag: String, n: Int)(f: => Unit): Double = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[maxscore-probe] $tag: ${ts.min}%.3f s (min of $n)")
      ts.min
    }
    val db = new GraftVectorDB(spark, dbDir)
    val built = new java.io.File(s"$dbDir/lexical/termstats").exists()
    val (ingestSec, indexSec) =
      if (built) { println(s"[maxscore-probe] reusing $dbDir"); (0.0, 0.0) }
      else {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(new java.io.File(dbDir))
        val docs = graft.Tables.load(spark, dir, "documents")
        println(s"[maxscore-probe] corpus ${docs.count()} docs ($dir)")
        val (_, a) = time("ingest")(db.ingest(docs))
        val (_, b) = time("indexLexical")(db.indexLexical())
        (a, b)
      }
    val nChunks = db.store.count()
    val ts = spark.read.parquet(s"$dbDir/lexical/termstats")
      .groupBy($"term").agg(sum($"df").as("df"))
    val common = ts.orderBy($"df".desc).take(1).head
    val rare = ts.filter($"df".between(GraftVectorDB.HybridPool, 64))
      .orderBy($"df".desc, $"term").take(1).head
    val floor = GraftVectorDB.LexMaxScoreMinCommonRows
    println(s"[maxscore-probe] chunks=$nChunks common='${common.getString(0)}' " +
      s"df=${common.getLong(1)} rare='${rare.getString(0)}' df=${rare.getLong(1)} " +
      s"floor=$floor")
    val pool = GraftVectorDB.HybridPool
    val msQ = Seq((0L, Seq(rare.getString(0), common.getString(0)),
      Option.empty[String]))
    // ENGAGEMENT: the default path's plan differs from the forced-full
    // plan exactly when the economic gate opened the pruned path
    val dflt = db.lexAllScanPlan(msQ, pool, None).get
    val full = db.lexAllScanPlan(msQ, pool, None, forceFull = true).get
    val engaged =
      dflt.queryExecution.analyzed.canonicalized !=
        full.queryExecution.analyzed.canonicalized
    println(s"[maxscore-probe] default-path engaged: $engaged")
    // warm both paths once, then min-of-3 each (plan CONSTRUCTION is
    // part of pruned serving — stats read + rare job A run eagerly —
    // so the timed unit is plan+collect end to end)
    def runDefault(): Array[org.apache.spark.sql.Row] =
      db.lexAllScanPlan(msQ, pool, None).get.collect()
    def runFull(): Array[org.apache.spark.sql.Row] =
      db.lexAllScanPlan(msQ, pool, None, forceFull = true).get.collect()
    def runForced(): Array[org.apache.spark.sql.Row] =
      db.lexAllScanPlan(msQ, pool, None, forceFull = false,
        forceMaxScore = true).get.collect()
    val gotDefault = runDefault()
    val gotFull = runFull()
    val gotForced = runForced()
    // PARITY: identical rows, identical order (same 6dp grid + total
    // tie-break contract the spec pins at test scale — asserted here
    // at 10x-corpus scale)
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    require(key(gotDefault) == key(gotFull),
      "default path diverges from the full scan")
    require(key(gotForced) == key(gotFull),
      "forced MaxScore diverges from the full scan")
    println(s"[maxscore-probe] parity: default==full==forced " +
      s"(${gotFull.length} rows)")
    val tDefault = timeMin("default (engaged) path", 3)(runDefault())
    val tForced = timeMin("forced MaxScore", 3)(runForced())
    val tFull = timeMin("forced full scan", 3)(runFull())
    println(s"""{"metric":"maxscore_probe","sf_dir":"$dir",""" +
      s""""chunks":$nChunks,"common_term":"${common.getString(0)}",""" +
      s""""common_df":${common.getLong(1)},"floor":$floor,""" +
      s""""engaged":$engaged,"parity":true,""" +
      f""""default_sec":$tDefault%.3f,"maxscore_sec":$tForced%.3f,""" +
      f""""full_sec":$tFull%.3f,"ingest_sec":$ingestSec%.1f,""" +
      f""""index_sec":$indexSec%.1f}""")
    spark.stop()
  }
}
