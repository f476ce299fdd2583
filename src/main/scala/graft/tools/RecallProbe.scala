package graft.tools

import org.apache.spark.sql.DataFrame
import graft.GraftSession
import graft.operators.{AnnIndex, KnnSearch}

/** Prints measured recall@5 of the approximate indexes vs ann-brute —
  * the calibration tool behind AnnIndexSpec's bounds. */
object RecallProbe {
  private def hits(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "recall-probe")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = hits(KnnSearch.knn(spark, sf))
      val lsh = hits(AnnIndex.lsh(spark, sf))
      println(f"$sf lsh=${(lsh & exact).size.toDouble / exact.size}%.3f")
      for {
        cells <- Seq(16, 32, 64)
        nProbe <- Seq(cells / 4, cells * 3 / 8, cells / 2, cells * 5 / 8, cells * 3 / 4)
      } {
        val ivf = hits(AnnIndex.ivf(spark, sf, cells, nProbe))
        println(f"$sf ivf cells=$cells nProbe=$nProbe (${nProbe.toDouble/cells}%.2f) " +
          f"recall=${(ivf & exact).size.toDouble / exact.size}%.3f")
      }
    }
    spark.stop()
  }
}
