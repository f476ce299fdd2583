package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump formatted physical plans for named queries (plan hygiene:
  * broadcasts present, filters pushed to scans, codegen spans). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "graft-explain")
    val sf = "/root/testdata/sf0.001"
    val names = args.filter(SparkEntry.queries.contains)
    val targets = if (names.nonEmpty) names.toSeq else SparkEntry.queries.keys.toSeq.sorted
    targets.foreach { n =>
      println(s"========== $n ==========")
      println(SparkEntry.queries(n)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
