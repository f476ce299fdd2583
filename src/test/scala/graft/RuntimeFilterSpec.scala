package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runtime filters (Spark's Bloom-filter join pruning): a selective
  * dim-side predicate injects a bloom filter into the fact scan, so
  * the fact table is pruned before the join — the 100 TB mechanism for
  * "only read the lineitems of matching orders". */
class RuntimeFilterSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("selective join injects a bloom runtime filter into the fact side") {
    val restore = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.load(spark, sf, "lineitem")
      val ord = Tables.load(spark, sf, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      val joined = li.join(ord, $"l_orderkey" === $"o_orderkey")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"expected a bloom runtime filter in:\n$optimized")
      assert(joined.count() > 0)
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
