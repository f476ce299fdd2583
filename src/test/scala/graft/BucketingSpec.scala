package graft

import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing: when both fact tables are written
  * bucketed on their join keys, the sort-merge join runs with NO
  * shuffle exchange — the layout the 100 TB orders⋈lineitem join
  * relies on. */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("bucketed orders⋈lineitem plans without Exchange") {
    val restoreAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val restoreBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf, "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
      Tables.load(spark, sf, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
      val joined = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == Tables.load(spark, sf, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", restoreAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restoreBc)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }
}
