package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.KnnSearch
import graft.functions.VectorFunctions._

/** The r17 annBrute mapPartitions kernel must be ROW-IDENTICAL to the
  * declarative crossJoin + round + TopKByScore formulation it replaced
  * (which the DuckDB oracle mirrors): same rounded scores, same ranks,
  * same tie-breaks. Also pins the kernel's local round4 against
  * Spark's Round expression on every corpus cosine, including the
  * cheap-reject margin's correctness. */
class AnnBruteKernelSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def vecs = {
    Tables.spread(Tables.load(spark, sf, "embeddings"))
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", l2Norm($"v"))
  }

  test("kernel output row-identical to the crossJoin reference formulation") {
    val v = vecs
    val q = v.select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val pairs = v.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("n_id"),
        round(cosine($"qv", $"v", $"qnrm", $"nrm"), 4).as("sim_r"))
    val reference = KnnSearch.rankTopK(pairs, 3).orderBy($"q_id", $"rnk")
      .collect().map(_.toSeq)
    val kernel = KnnSearch.annBrute(spark, sf).collect().map(_.toSeq)
    assert(kernel.length == reference.length)
    kernel.zip(reference).foreach { case (a, b) => assert(a == b) }
  }

  test("round4 bit-identical to Spark's Round on every corpus cosine") {
    val v = vecs
    val q = v.select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val both = v.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select(cosine($"qv", $"v", $"qnrm", $"nrm").as("raw"),
        round(cosine($"qv", $"v", $"qnrm", $"nrm"), 4).as("r"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val raw = r.getDouble(0)
      val viaColumn = r.getDouble(1)
      val viaLocal = KnnSearch.round4(raw)
      assert(java.lang.Double.doubleToLongBits(viaColumn) ==
        java.lang.Double.doubleToLongBits(viaLocal),
        s"round4($raw): column=$viaColumn local=$viaLocal")
    }
  }
}
