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
      val ivf = hits(AnnIndex.ivf(spark, sf))
      println(f"$sf ivf cells=${AnnIndex.IvfCells} nProbe=${AnnIndex.NProbe} " +
        f"recall=${(ivf & exact).size.toDouble / exact.size}%.3f")
      val pq = hits(AnnIndex.pq(spark, sf))
      println(f"$sf pq M=${AnnIndex.PqSub} K=${AnnIndex.PqK} " +
        f"shortlist=${AnnIndex.PqShortlist} " +
        f"recall=${(pq & exact).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
