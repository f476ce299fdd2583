package graft.tools

import graft.GraftSession
import graft.operators.Dedup

/** Times the pinned vs adaptive embed-LSH geometry at a given sf dir —
  * the measurement tool behind the round-6 scale-adaptive sizing
  * (SURVEY §8: fixed 8×12-bit planes scaled 7.7× for 10× data from
  * bucket occupancy; the adaptive config holds occupancy at the
  * calibration anchor). */
object GeomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "geom-probe")
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, parquet reader)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n pairs)")
    }
    val n = graft.Tables.load(spark, dir, "embeddings").count()
    val planes = Dedup.adaptivePlanes(n)
    val tables = Dedup.adaptiveTables(planes)
    println(s"corpus $n vectors -> adaptive ${tables}x$planes " +
      s"(pinned ${Dedup.EmbedLshTables}x${Dedup.EmbedLshPlanes})")
    println(s"candidates pinned=${Dedup.candidateCount(spark, dir,
      Dedup.EmbedLshTables, Dedup.EmbedLshPlanes)} " +
      s"adaptive=${Dedup.candidateCount(spark, dir, tables, planes)}")
    // two passes each, report min (first pass absorbs cold cache)
    for (p <- 1 to 2) {
      time(s"pinned   p$p")(Dedup.embedPairs(spark, dir).count())
      time(s"adaptive p$p")(Dedup.embedPairsAdaptive(spark, dir).count())
    }
    spark.stop()
  }
}
