package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Semantic invariants beyond row counts. */
class OperatorInvariantsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("vs_embed vectors are unit-norm after rounding") {
    val sq = VectorStore.embed(spark, sf)
      .groupBy("doc_id").agg(sum(col("val") * col("val")).as("n2"))
      .agg(min("n2"), max("n2")).head()
    assert(math.abs(sq.getDouble(0) - 1.0) < 1e-3 &&
      math.abs(sq.getDouble(1) - 1.0) < 1e-3)
  }

  test("vs_knn ranks are dense 1..5 per query and sims descend") {
    val rows = KnnSearch.knn(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { hits =>
      assert(hits.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to 5L))
      val sims = hits.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("sim_r"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("vs_knn_filtered respects the metadata predicate") {
    val hits = KnnSearch.knnFiltered(spark, sf)
    val emb = Tables.load(spark, sf, "embeddings").select("vec_id", "label")
    val bad = hits.join(emb, hits("n_id") === emb("vec_id"))
      .filter(col("label") =!= 3).count()
    assert(bad == 0)
  }

  test("dd_minhash results all meet the jaccard threshold") {
    val mins = Dedup.minhashLsh(spark, sf).agg(min("j_r")).head().getDouble(0)
    assert(mins >= Dedup.JaccardThreshold)
  }

  test("dd_simhash hamming bounded and symmetric-free (a < b)") {
    val rows = Dedup.simhashPairs(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("hamming") <= Dedup.HammingMax))
    assert(rows.forall(r => r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
  }

  test("sessionize covers every event exactly once") {
    val total = Relational.sessionize(spark, sf).agg(sum("n_events")).head().getLong(0)
    val events = Tables.load(spark, sf, "events").count()
    assert(total == events)
  }

  test("asof match is never later than the event") {
    val bad = Relational.asofJoin(spark, sf)
      .join(Tables.load(spark, sf, "events").select("event_id", "ts"), "event_id")
      .filter(col("o_orderdate") > col("ts")).count()
    assert(bad == 0)
  }

  test("chunks reassemble to full documents (stride < size overlap)") {
    val c = VectorStore.chunk(spark, sf)
    // every doc's chunk 0 starts the text; lengths bounded by ChunkSize
    assert(c.filter(col("chunk_len") > VectorStore.ChunkSize).count() == 0)
    val docs = Tables.load(spark, sf, "documents").count()
    assert(c.filter(col("chunk_id") === 0).count() == docs)
  }
}
