package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Approximate nearest-neighbor indexes — the scale path for the
  * brute-force search in [[KnnSearch]] (BASELINE.json's north star:
  * MLlib for batch index build, not online serving).
  *
  * Both operators are [rows-only] in the oracle (approximate results
  * have no SQL ground truth); the spec suite asserts recall against
  * ann_brute instead.
  *
  *  - IVF: KMeans centroids (MLlib, fixed seed) partition the corpus;
  *    a query probes its nProbe nearest centroids and scans only those
  *    cells — at 100 TB the corpus is written partitioned/bucketed by
  *    cell id, so a probe is a partition-pruned scan, not a shuffle.
  *  - RP-LSH: deterministic hash-derived hyperplanes give each vector
  *    a sign signature; candidates co-locate by signature bucket via
  *    an equi-join, exactly like the MinHash band join in [[Dedup]].
  */
object AnnIndex {

  val IvfCells = 16
  val NProbe = 4
  /** 4 planes → 16 buckets: sized so buckets stay populated at the test
    * scale; at corpus scale raise planes (buckets ≈ n / desired cell). */
  val LshPlanes = 4
  val TopK = 5

  private def vecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "embeddings"))
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", l2Norm($"v"))
  }

  /** IVF search: build centroids with MLlib KMeans, assign cells,
    * probe the query's nearest cells. */
  def ivf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = vecs(spark, dir)
    // persist across KMeans iterations: the lineage includes a
    // repartition + parquet scan that would otherwise re-run per pass
    val feat = v.withColumn("features", array_to_vector($"v")).persist()
    val model = new KMeans().setK(IvfCells).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("features").fit(feat)
    val assigned = model.transform(feat)
      .select($"vec_id", $"v", $"nrm", $"prediction".as("cell"))
    feat.unpersist(blocking = false)
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c, i) => (i, c.toArray)
    }.toSeq.toDF("cell", "cv")
    // queries probe their NProbe nearest cells
    val q = assigned.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val qCells = q.crossJoin(broadcast(centroids))
      .select($"q_id", $"qv", $"qnrm", $"cell",
        dot($"qv", $"cv").as("cdist"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cdist".desc, $"cell")))
      .filter($"crnk" <= NProbe)
      .select($"q_id", $"qv", $"qnrm", $"cell")
    // scan only the probed cells (partition-pruned at scale)
    val cand = assigned.filter($"vec_id" >= 10)
      .join(qCells, "cell")
    KnnSearch.rankTopK(
      cand.select($"q_id", $"vec_id".as("n_id"),
        round(cosine($"qv", $"v", $"qnrm", $"nrm"), 4).as("sim_r")), TopK)
      .orderBy($"q_id", $"rnk")
  }

  /** Deterministic pseudo-random hyperplane component: md5-derived in
    * [-1, 1), so index build is reproducible with no RNG state. */
  private def planeComponent(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$p:$d".getBytes("UTF-8"))
    val x = java.nio.ByteBuffer.wrap(md).getInt(0)
    (x.toDouble / Int.MaxValue.toDouble)
  }

  /** RP-LSH search: sign-signature buckets + in-bucket brute force. */
  def lsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planes = (0 until LshPlanes).map(p =>
      (0 until 64).map(d => planeComponent(p, d)).toArray)
    // signature = concatenated signs of <v, plane_p>
    val sigCol = concat((0 until LshPlanes).map { p =>
      val dotP = aggregate(
        zip_with(col("v"), typedLit(planes(p).toSeq), (x, w) => x * w),
        lit(0.0), _ + _)
      when(dotP >= 0, "1").otherwise("0")
    }: _*)
    val v = vecs(spark, dir).withColumn("sig", sigCol)
    val q = v.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"), $"sig")
    val cand = v.filter($"vec_id" >= 10).join(q, "sig")
    KnnSearch.rankTopK(
      cand.select($"q_id", $"vec_id".as("n_id"),
        round(cosine($"qv", $"v", $"qnrm", $"nrm"), 4).as("sim_r")), TopK)
      .orderBy($"q_id", $"rnk")
  }
}
