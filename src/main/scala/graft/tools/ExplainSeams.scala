package graft.tools

/** Formatted plans for the operators whose PUBLIC query form ends in a
  * materialize (localCheckpoint) — the driver-query plan then shows
  * only `Scan ExistingRDD`, so plan claims about their internals must
  * be made on the pre-materialize seam frames the specs also pin.
  * Plan-only: nothing is executed except where a seam is eagerly
  * collected by construction. */
object ExplainSeams {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.local(4, "graft-explain-seams")
    spark.sparkContext.setLogLevel("WARN")
    def show(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    val names = args.toSet
    def want(n: String) = names.isEmpty || names.contains(n)
    if (want("tx_ppl")) show("tx_ppl",
      graft.operators.TextAnalysis.pplScored(spark, sf,
        graft.operators.TextAnalysis.PplGateV)._1)
    if (want("vs_hybrid")) show("vs_hybrid",
      graft.operators.HybridSearch.hybridRanked(spark, sf)._1)
    if (want("dd_minhash")) show("dd_minhash",
      graft.operators.Dedup.incrementalPairsPlan(spark, sf))
    spark.stop()
  }
}
