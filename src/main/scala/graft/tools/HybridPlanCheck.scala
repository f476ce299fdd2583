package graft.tools
object HybridPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "hybrid-plan-check")
    spark.sparkContext.setLogLevel("WARN")
    val (ranked, _) = graft.operators.HybridSearch.hybridRanked(spark, "/root/testdata/sf0.01")
    ranked.collect()
    val plan = ranked.queryExecution.executedPlan.toString
    println("[hp] ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).size)
    println("[hp] Scan parquet:   " + "Scan parquet".r.findAllIn(plan).size)
    println("[hp] tokens calls:   " + "(?i)tokens".r.findAllIn(plan).size)
    spark.stop()
  }
}
