package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KnnSearch

/** The KnnJoin logical operator resolves through the injected rule and
  * produces exactly the Column-API pipeline's results. */
class KnnJoinPlanSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark => base}

  private lazy val spark =
    ColumnBridge.sessionWithExtensions(base, new GraftExtensions()(_))

  test("KnnJoinPlan == Column-API knn") {
    import spark.implicits._
    val v = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", graft.functions.VectorFunctions.toDouble($"embedding").as("v"))
      .withColumn("nrm", graft.functions.VectorFunctions.l2Norm($"v"))
    val corpus = v.filter($"vec_id" >= 10)
      .select($"vec_id".as("n_id"), $"v".as("cv"), $"nrm".as("cnrm"))
    val queries = v.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))

    val viaPlan = KnnSearch.knnJoin(corpus, queries, 5)
      .orderBy($"q_id", $"rnk").collect().toSeq
    val viaColumns = KnnSearch.knn(spark, sf).collect().toSeq
    assert(viaPlan.map(_.toSeq) == viaColumns.map(_.toSeq))
  }
}
