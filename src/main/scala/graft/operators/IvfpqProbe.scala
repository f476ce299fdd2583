package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Stage-timing diagnostic for the `ann_ivfpq_exh` audit harness (the
  * one sf1 regression flagged by the round-6 verdict): times the
  * exhaustive [[AnnIndex.ivfpq]] end-to-end, then its phases in
  * isolation — the ADC scoring pass + corpus-sized `rankTopK`
  * shortlist, the shortlist⋈corpus re-rank join — and the
  * re-rank-direct variant that skips the no-op shortlist stage (an
  * exhaustive shortlist excludes nothing). */
object IvfpqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "ivfpq-probe")
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val n = Tables.load(spark, dir, "embeddings").count().toInt
    println(s"corpus $n vectors")
    for (p <- 1 to 2) {
      time(s"p$p full ivfpq_exh (current)") {
        AnnIndex.ivfpq(spark, dir, AnnIndex.IvfCells, AnnIndex.IvfCells, n).count()
      }
      // phases, rebuilt from the same internals the operator uses
      val v = AnnIndex.vecs(spark, dir)
      val sample = time(s"p$p sample")(AnnIndex.sampleVectors(v, $"vec_id"))
      val books = AnnIndex.pqCodebooksFromSample(sample)
      val centroids = AnnIndex.centroidsFromSample(spark, sample, AnnIndex.IvfCells)
      val assigned = AnnIndex.assignWithCentroids(v, centroids)
      val corpus = assigned.filter($"vec_id" >= 10)
        .select($"vec_id", $"v", $"nrm", $"cell",
          AnnIndex.encodeCodes(books).as("codes"))
        .persist()
      val q = assigned.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"),
          AnnIndex.adcTables(books, $"v").as("dt"))
      val qCells = AnnIndex.probeCells(
          q.select($"q_id", $"qv", $"qnrm"), centroids, AnnIndex.IvfCells)
        .join(broadcast(q.select($"q_id", $"dt")), "q_id")
      val adc = corpus.join(broadcast(qCells.select($"q_id", $"dt", $"cell")), "cell")
        .select($"q_id", $"vec_id".as("n_id"),
          (books.indices.map(i => element_at(element_at($"dt", i + 1),
            element_at($"codes", i + 1) + 1)).reduce(_ + _) / $"nrm").as("sim_r"))
      time(s"p$p ADC pairs only (no rank)")(adc.count())
      val shortlisted = KnnSearch.rankTopK(adc, n).select($"q_id", $"n_id")
      time(s"p$p ADC + rankTopK(n) shortlist")(shortlisted.count())
      time(s"p$p full exact join after shortlist") {
        val exact = corpus.select($"vec_id".as("n_id"), $"v", $"nrm")
          .join(shortlisted, "n_id")
          .join(broadcast(q.select($"q_id", $"qv", $"qnrm")), "q_id")
          .select($"q_id", $"n_id",
            round(cosine($"qv", $"v", $"qnrm", $"nrm"), 4).as("sim_r"))
        KnnSearch.rankTopK(exact, AnnIndex.TopK).count()
      }
      time(s"p$p re-rank direct (skip no-op shortlist)") {
        val exact = corpus.select($"vec_id".as("n_id"), $"v", $"nrm", $"cell")
          .join(broadcast(qCells.select($"q_id", $"cell")), "cell")
          .join(broadcast(q.select($"q_id", $"qv", $"qnrm")), "q_id")
          .select($"q_id", $"n_id",
            round(cosine($"qv", $"v", $"qnrm", $"nrm"), 4).as("sim_r"))
        KnnSearch.rankTopK(exact, AnnIndex.TopK).count()
      }
      corpus.unpersist(blocking = false)
    }
    spark.stop()
  }
}
