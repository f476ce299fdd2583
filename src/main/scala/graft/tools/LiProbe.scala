package graft.tools

import graft.{GraftSession, SparkEntry}

/** Where does vs_rerank_li's wall time go? Times the full query
  * repeatedly in one session (run 1 pays codegen; the steady state is
  * the real per-query cost) against the stage-1-only pool twin
  * (vs_knn is that shape). Usage: runMain graft.tools.LiProbe [sfDir]. */
object LiProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-li-probe")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[liprobe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    (1 to 3).foreach { i =>
      time(s"vs_knn #$i") { SparkEntry.queries("vs_knn")(spark, sf).count() }
    }
    (1 to 3).foreach { i =>
      time(s"vs_rerank_li #$i") { SparkEntry.queries("vs_rerank_li")(spark, sf).count() }
    }
    spark.stop()
  }
}
