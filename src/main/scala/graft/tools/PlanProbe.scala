package graft.tools

/** Prints the FINAL (post-AQE) physical plan of mm_interleave so the
  * scan-once claim rests on the executed plan, not intent. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-plan-probe")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.operators.CrawlPipeline.interleaveDocs(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("[plan] ReusedExchange nodes: " +
      "ReusedExchange".r.findAllIn(plan).size)
    println("[plan] Scan parquet nodes:   " +
      "Scan parquet".r.findAllIn(plan).size)
    println("[plan] ShuffleQueryStage:    " +
      "ShuffleQueryStage".r.findAllIn(plan).size)
    println("[plan] SynthWarcImg nodes:   " +
      "synthwarcimg".r.findAllIn(plan.toLowerCase).size)
    println("[plan] ParseWarc nodes:      " +
      "parsewarc".r.findAllIn(plan.toLowerCase).size)
    println(plan.linesIterator.take(200).mkString("\n"))
    spark.stop()
  }
}
