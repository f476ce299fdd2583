package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HybridSearch

/** Invariants of the hybrid BM25+vector RRF fusion (the value-level
  * ground truth is the vs_hybrid DuckDB oracle; these pin the fusion
  * algebra and the scale-shape of the plan). */
class HybridSearchSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val out = HybridSearch.hybrid(spark, sf).collect()

  test("every query returns a full fused top-5 with positive RRF scores") {
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == HybridSearch.NQueries)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to 5L),
        s"query $q ranks")
      assert(rows.forall(_.getAs[Double]("rrf_r") > 0))
    }
  }

  test("RRF scores are bounded by the dual-rank-1 maximum and non-increasing") {
    val maxRrf = BigDecimal(2.0 / (HybridSearch.RrfK + 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("rrf_r"))
      assert(byRank.head <= maxRrf)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "fused scores must be non-increasing in rank")
    }
  }

  test("a doc in both channel pools outranks the same single-channel rank") {
    // algebraic property of RRF: 1/(60+r) + 1/(60+r') > 1/(60+r) —
    // verify on the data that at least one fused hit carries
    // contributions from both channels (the corpus is embedded from
    // the same text the lexical channel scores, so overlap exists)
    val both = out.count(_.getAs[Double]("rrf_r") > 1.0 / (HybridSearch.RrfK + 1))
    assert(both > 0, "no fused hit combined both channels")
  }

  test("plan shape: query terms broadcast into the corpus term table, no shuffled cross") {
    val (ranked, persisted) = HybridSearch.hybridRanked(spark, sf)
    try {
      val plan = ranked.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        "the query-term and df joins must broadcast")
      assert(!plan.contains("CartesianProduct"),
        "no shuffled cartesian product anywhere in the hybrid plan")
    } finally persisted.foreach(_.unpersist(blocking = false))
  }

  test("plan shape: df is a partial-agg, never a Window over a corpus term partition") {
    // the r16 plan computed document frequency as count().over(
    // Window.partitionBy(term)) on the pruned (doc, term) frame — a
    // stop-word query term concentrated its every row on one task.
    // The r17 shape partial-aggs groupBy(term) (hot key absorbed
    // map-side) and broadcasts the vocab-sized df back; the only
    // windows left are the per-query rank windows over ≤ 2·pool rows.
    val (ranked, persisted) = HybridSearch.hybridRanked(spark, sf)
    try {
      val exec = ranked.queryExecution.executedPlan
      val windows = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      windows.foreach { w =>
        val parts = w.partitionSpec.map(_.toString.toLowerCase)
        assert(!parts.exists(_.contains("term")),
          s"window partitioned by a corpus term key: $w")
        assert(parts.exists(p => p.contains("q_id")),
          s"every remaining window must be a bounded per-query rank: $w")
      }
      // the df branch and the contrib branch share ONE tf shuffle:
      // Catalyst/AQE must reuse the exchange, or the corpus pays a
      // second scan+tokenize pass. Under AQE the reuse node appears
      // in the FINAL adaptive plan, so execute before inspecting.
      ranked.collect()
      val finalPlan = ranked.queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(finalPlan).size
      assert(finalPlan.contains("ReusedExchange") ||
          finalPlan.contains("ReusedQueryStage") || scans <= 2,
        s"tf exchange not reused between the df aggregate and the " +
          s"contribution join — the corpus would be scanned twice " +
          s"($scans parquet scans):\n$finalPlan")
    } finally persisted.foreach(_.unpersist(blocking = false))
  }
}
