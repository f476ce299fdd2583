package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.ColumnBridge

/** The native expressions are reachable from SQL once registered
  * (via `withExtensions(new GraftExtensions)` on a fresh session, or
  * ColumnBridge.register on a live one). */
class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  ColumnBridge.register(spark, GraftExtensions.functions)

  test("dot_product from SQL") {
    val v = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
  }

  test("simhash60 and hashing_counts from SQL") {
    val r = spark.sql(
      """SELECT simhash60(array('spark', 'query')) AS f,
        |       hashing_counts(array('spark', 'spark', 'row'), 8) AS c""".stripMargin)
      .head()
    assert(r.getLong(0) > 0L)
    assert(r.getSeq[Double](1).sum == 3.0)
  }

  test("top_k_by_score from SQL matches Column-API ranking") {
    spark.range(100).selectExpr("id % 3 AS g", "CAST(id AS DOUBLE) AS s", "id")
      .createOrReplaceTempView("tk")
    val top = spark.sql(
      """SELECT g, top_k_by_score(s, id, 2) AS top FROM tk GROUP BY g ORDER BY g""")
      .collect()
    assert(top.length == 3)
    val g0 = top(0).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1))
    assert(g0 == Seq(99L, 96L))
  }
}
