package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; suites run
  * sequentially under sbt's default test execution). */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}

/** Every inventory query runs and returns rows at sf0.001. */
class QueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle query has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }
}

/** The materialize/release lifecycle actually frees storage: a loop
  * that materializes passes and releases the superseded ones must not
  * accumulate persisted RDDs (the leak dd_cluster had before
  * Tables.release — localCheckpoint blocks live outside the
  * CacheManager, so Dataset.unpersist can't touch them). */
class MaterializeReleaseSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("release frees a materialized frame's blocks; loops stay bounded") {
    val sc = spark.sparkContext
    def persisted = sc.getPersistentRDDs.size
    val before = persisted
    var frame = Tables.materialize((1 to 100).toDF("x"))
    assert(persisted > before, "materialize must pin blocks")
    for (_ <- 1 to 5) {
      val next = Tables.materialize(frame.withColumn("x", $"x" + 1))
      Tables.release(frame)
      frame = next
      assert(persisted <= before + 2,
        s"loop must pin at most current+next, saw ${persisted - before}")
    }
    assert(frame.agg(org.apache.spark.sql.functions.sum($"x")).head.getLong(0)
      == (1 to 100).map(_ + 5L).sum)
    Tables.release(frame)
    assert(persisted == before, "all materialized blocks must be freed")
  }
}
