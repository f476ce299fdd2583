package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorFunctions._

/** Brute-force cosine top-k search — the reference's return_similar /
  * run_search surface (vector_db.py:615-759), re-shaped for scale.
  *
  * Layout: the query side is small (a user's search batch) and gets
  * `broadcast()`; the corpus side streams through the scan once with a
  * per-pair cosine expression — no shuffle of corpus rows to form
  * pairs. Ranking shuffles only (q_id, n_id, sim) tuples, which is
  * |corpus|·|queries| rows locally but at cluster scale is cut to k per
  * partition by the partial top-k aggregation path (see TopK notes in
  * SURVEY §5).
  *
  * Scores: double-precision cosine rounded to 4dp *before* ranking,
  * ties broken by neighbor id — deterministic and oracle-stable.
  */
object KnnSearch {

  /** (vec_id, v, nrm) with double vectors + precomputed norms. */
  private def vecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "embeddings"))
      .select($"vec_id", $"label", toDouble($"embedding").as("v"))
      .withColumn("nrm", l2Norm($"v"))
  }

  /** Rank pairs into per-query top-k via the partial aggregate
    * ([[graft.functions.expressions.TopKByScore]]) — each partition
    * contributes at most k candidates per query to the shuffle,
    * instead of the window-ranking form that exchanges every pair. */
  private[operators] def rankTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs.groupBy(col("q_id"))
      .agg(graft.functions.expressions.TopKByScore(col("sim_r"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("n_id"), col("col.score").as("sim_r"))

  /** KNN join through the logical operator ([[graft.plans.KnnJoinPlan]]
    * + the ResolveKnnJoin expansion rule) — requires a session built
    * `withExtensions(new GraftExtensions)`. Same contract and output
    * as the Column-API path. */
  def knnJoin(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    try {
      val df = ColumnBridge.ofRows(corpus.sparkSession,
        graft.plans.KnnJoinPlan(ColumnBridge.plan(corpus), ColumnBridge.plan(queries), k))
      df.queryExecution.analyzed // force analysis so a missing extension fails HERE
      df
    } catch {
      case e: Throwable if String.valueOf(e.getMessage).contains("KnnJoinPlan") =>
        throw new IllegalStateException(
          "knnJoin needs the graft extensions: build the session with " +
            ".withExtensions(new graft.GraftExtensions) or " +
            "spark.sql.extensions=graft.GraftExtensions", e)
    }
  }

  private def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    rankTopK(
      corpus.crossJoin(broadcast(queries))
        .select(col("q_id"), col("vec_id").as("n_id"),
          round(cosine(col("qv"), col("v"), col("qnrm"), col("nrm")), 4).as("sim_r")),
      k)

  private def queriesOf(v: DataFrame, n: Int): DataFrame =
    v.filter(col("vec_id") < n)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))

  /** Text-vs-text search: first 10 vectors as the query batch, the rest
    * as corpus (return_similar, vector_db.py:684-696). */
  def knn(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    topK(v.filter(col("vec_id") >= 10), queriesOf(v, 10), 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Search restricted by a metadata predicate — the reference's
    * search_location folder filter (get_search_range,
    * vector_db.py:673-682). The filter is applied *before* the join so
    * it pushes into the parquet scan. */
  def knnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    topK(v.filter(col("vec_id") >= 10 && col("label") === 3), queriesOf(v, 10), 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Multimodal combined search: two stores (label partitions standing
    * in for the text/image stores), per-channel top-k, unioned with the
    * channel tag — run_search's text_image mode concatenating
    * text-vs-text and text-vs-image results (vector_db.py:656-671). */
  def searchMulti(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val q = queriesOf(v, 10)
    val text = topK(v.filter(col("vec_id") >= 10 && col("label") < 5), q, 3)
      .withColumn("channel", lit("text"))
    val image = topK(v.filter(col("vec_id") >= 10 && col("label") >= 5), q, 3)
      .withColumn("channel", lit("image"))
    text.unionByName(image)
      .select(col("q_id"), col("channel"), col("rnk"), col("n_id"), col("sim_r"))
      .orderBy(col("q_id"), col("channel"), col("rnk"))
  }

  /** Source manifest for hits: join hit ids back to document metadata —
    * generate_source_list (vector_db.py:903-916). The top-k result is
    * tiny, so it broadcasts into the documents join. */
  def sources(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hits = knn(spark, dir)
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source", $"lang")
    docs.join(broadcast(hits), docs("doc_id") === hits("n_id"))
      .select($"q_id", $"rnk", $"n_id", $"source", $"lang")
      .orderBy($"q_id", $"rnk")
  }

  /** Exact all-pairs cosine top-3 (self-excluded) — the brute-force ANN
    * baseline and the heavyweight bench workload. */
  def annBrute(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = vecs(spark, dir)
    val q = v.select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val pairs = v.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("n_id"),
        round(cosine($"qv", $"v", $"qnrm", $"nrm"), 4).as("sim_r"))
    rankTopK(pairs, 3).orderBy($"q_id", $"rnk")
  }
}
