package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Source-format coverage and skew-mitigation semantics. */
class SourcesAndSkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("documents round-trip through json, orc, csv") {
    val docs = Tables.load(spark, sf, "documents")
    for (fmt <- Seq("json", "orc", "csv")) {
      val p = s"target/src_roundtrip_$fmt"
      docs.write.mode("overwrite").format(fmt).option("header", "true").save(p)
      val back = spark.read.format(fmt).option("header", "true")
        .schema(docs.schema).load(p)
      assert(back.count() == docs.count(), s"$fmt row count")
      assert(back.exceptAll(docs).count() == 0, s"$fmt content drift")
    }
  }

  test("salted join returns exactly the plain join's rows") {
    val events = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"))
    val users = events.select(col("user_id")).distinct()
      .withColumn("tag", concat(lit("u"), col("user_id")))
    val plain = events.join(users, "user_id")
      .select("event_id", "user_id", "tag")
    val salted = Skew.saltedJoin(events, users, "user_id", salts = 4)
      .select("event_id", "user_id", "tag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }
}
