package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Relational}

/** LSH exactness and sketch error bounds, proven in-Spark. */
class DedupExactnessSpec extends AnyFunSuite {
  import SparkTestSession._

  test("minhash LSH output == exact all-pairs jaccard at the threshold") {
    import spark.implicits._
    val sets = Tables.load(spark, sf, "documents")
      .select($"doc_id", array_distinct(shingles(tokens($"text"), 2)).as("s"))
    val a = sets.select($"doc_id".as("a_id"), $"s".as("sa"))
    val b = sets.select($"doc_id".as("b_id"), $"s".as("sb"))
    val exact = a.crossJoin(b).filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        round(size(array_intersect($"sa", $"sb")).cast("double") /
          size(array_union($"sa", $"sb")), 4).as("j_r"))
      .filter($"j_r" >= Dedup.JaccardThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact,
      s"missed: ${exact -- lsh}; spurious: ${lsh -- exact}")
  }

  test("approx sketches within tolerance of exact counterparts") {
    import spark.implicits._
    val approx = Relational.approxStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.load(spark, sf, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("u"),
        expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (u, p50)) =>
      val (au, ap50) = approx(k)
      assert(math.abs(au - u).toDouble / u <= 0.05, s"$k HLL error > 5%")
      assert(math.abs(ap50 - p50) / math.max(math.abs(p50), 1e-9) <= 0.05,
        s"$k approx p50 error > 5%")
    }
  }
}
