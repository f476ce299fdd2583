package graft.tools

import org.apache.spark.sql.DataFrame
import graft.GraftSession
import graft.operators.{AnnIndex, KnnSearch}

/** Prints measured recall@5 of the approximate indexes vs ann-brute —
  * the calibration tool behind AnnIndexSpec's bounds.
  *
  * No args: the operator-gate scales (sf0.001/sf0.01), full battery.
  * With sf-dir args (e.g. `data/sf1 data/sf10`): the decade
  * measurement — exact, flat IVF, and the IMI second routing level in
  * BOTH its operator config (fixed K=8) and a scale-sized config
  * (K = ⌈√(n/occupancy)⌉ at the adaptive-cells anchor, probe budget
  * held at the flat config's probed FRACTION), so the "second routing
  * level" claim carries sf1→sf10 numbers beside the IVF ones. */
object RecallProbe {
  private def hits(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val full = args.isEmpty
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8), "recall-probe")
    for (sf <- dirs) {
      val (exact, tEx) = timed(hits(KnnSearch.knn(spark, sf)))
      def recall(s: Set[(Long, Long)]) = (s & exact).size.toDouble / exact.size
      println(f"$sf exact ${tEx}%.1fs")
      if (full) {
        val lsh = hits(AnnIndex.lsh(spark, sf))
        println(f"$sf lsh=${recall(lsh)}%.3f")
      }
      val (ivf, tIvf) = timed(hits(AnnIndex.ivf(spark, sf)))
      println(f"$sf ivf cells=${AnnIndex.IvfCells} nProbe=${AnnIndex.NProbe} " +
        f"recall=${recall(ivf)}%.3f ${tIvf}%.1fs")
      val (imiF, tImiF) = timed(hits(AnnIndex.imi(spark, sf)))
      println(f"$sf imi K=${AnnIndex.ImiK} cells=${AnnIndex.ImiK * AnnIndex.ImiK} " +
        f"nProbe=${AnnIndex.ImiNProbe} recall=${recall(imiF)}%.3f ${tImiF}%.1fs")
      if (!full) {
        // scale-sized IMI: cells at the adaptive occupancy anchor,
        // probe budget held at the operator config's probed fraction
        val n = graft.Tables.load(spark, sf, "embeddings").count()
        val k1 = math.max(AnnIndex.ImiK,
          math.ceil(math.sqrt(n / 2048.0)).toInt)
        val frac = AnnIndex.ImiNProbe.toDouble / (AnnIndex.ImiK * AnnIndex.ImiK)
        val np = math.max(1, math.ceil(frac * k1 * k1).toInt)
        val (imiS, tImiS) = timed(hits(AnnIndex.imi(spark, sf, k1, np)))
        println(f"$sf imi-scaled K=$k1 cells=${k1 * k1} nProbe=$np " +
          f"recall=${recall(imiS)}%.3f ${tImiS}%.1fs")
      }
      if (full) {
        val pq = hits(AnnIndex.pq(spark, sf))
        println(f"$sf pq M=${AnnIndex.PqSub} K=${AnnIndex.PqK} " +
          f"shortlist=${AnnIndex.PqShortlist} " +
          f"recall=${recall(pq)}%.3f")
      }
    }
    spark.stop()
  }
}
