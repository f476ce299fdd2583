package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnIndex, KnnSearch}

/** Recall of the approximate indexes against the exact brute-force
  * top-k on the same query/corpus split (the correctness story for the
  * [rows-only] inventory entries). */
class AnnIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def hitSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet

  lazy val exact = hitSet(KnnSearch.knn(spark, sf))

  test("ann_ivf recall@5 >= 0.9 vs brute force") {
    val ivf = hitSet(AnnIndex.ivf(spark, sf))
    val recall = (ivf & exact).size.toDouble / exact.size
    info(s"ivf recall@5 = $recall")
    // measured 0.92–0.98 (tools/RecallProbe): MLlib KMeans' seeded
    // random init samples per-partition, so centroids — and recall —
    // vary slightly with core count; the bound holds across configs
    assert(recall >= 0.9)
  }

  test("ann_lsh recall@5 >= 0.9 vs brute force, neighbors from corpus") {
    val rows = AnnIndex.lsh(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_id") >= 10))
    val recall = (rows.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet & exact).size.toDouble / exact.size
    info(s"lsh recall@5 = $recall")
    assert(recall >= 0.9) // measured 0.94, fully deterministic (md5 planes)
  }

  test("ann_pq recall@5 >= 0.9 vs brute force") {
    val pq = hitSet(AnnIndex.pq(spark, sf))
    val recall = (pq & exact).size.toDouble / exact.size
    info(s"pq recall@5 = $recall")
    // grid-probed: 0.96 at sf0.001, 0.98 at sf0.01 (M=16, K=16, shortlist=100)
    assert(recall >= 0.9)
  }

  test("ann_imi recall@5 >= 0.9 vs brute force") {
    val imi = hitSet(AnnIndex.imi(spark, sf))
    val recall = (imi & exact).size.toDouble / exact.size
    info(s"imi recall@5 = $recall")
    // 64 product cells, 40 probed (~62% — the flat-IVF operating
    // fraction on this worst-case unclustered corpus); deterministic
    // (driver Lloyd from the hash-uniform sample, no MLlib RNG)
    assert(recall >= 0.9)
  }

  test("ann_imi routing: every vector's cell is its argmin half-space pair") {
    // exhaustive config == brute force is the oracle's hash check;
    // here pin the product-structure invariant instead: probing all
    // k1² cells yields exactly the brute top-5
    val exh = hitSet(AnnIndex.imi(spark, sf, AnnIndex.ImiK, AnnIndex.ImiK * AnnIndex.ImiK))
    assert(exh == exact)
  }

  test("ann_ivfpq (composed) recall@5 >= 0.9 vs brute force") {
    val ivfpq = hitSet(AnnIndex.ivfpq(spark, sf))
    val recall = (ivfpq & exact).size.toDouble / exact.size
    info(s"ivfpq recall@5 = $recall")
    // the composition's misses are (IVF probe misses) ∪ (ADC shortlist
    // misses): both components measure ≥ 0.94 alone on this worst-case
    // unclustered corpus, and the shortlist pass only sees probed-cell
    // candidates, so the composed recall stays above the same bar
    assert(recall >= 0.9)
  }
}
