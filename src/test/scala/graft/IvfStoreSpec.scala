package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions._
import graft.operators.AnnIndex

/** The IVF layout claim, demonstrated: a corpus written partitioned by
  * cell id turns a probe into a partition-PRUNED scan — the `cell IN
  * (probes)` predicate reaches the file index, and only the probed
  * cells' files are listed. This is what makes IVF a 100 TB design:
  * the non-probed (cells - nProbe)/cells of the corpus is never read. */
class IvfStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val storeDir = "target/ivf_store_spec"

  test("probe of a cell-partitioned store is partition-pruned at the scan") {
    val restoreAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val centroids = AnnIndex.buildIvfStore(spark, sf, storeDir)
      val q = Tables.load(spark, sf, "embeddings")
        .filter($"vec_id" === 0)
        .select($"vec_id".as("q_id"), toDouble($"embedding").as("qv"))
        .withColumn("qnrm", l2Norm($"qv"))
      val nProbe = 4
      val res = AnnIndex.probeIvfStore(spark, storeDir, centroids, q, nProbe, k = 5)
      val rows = res.orderBy($"rnk").collect()
      assert(rows.length == 5)
      // the query's own cell is among its top-dot probes → finds itself
      assert(rows.head.getAs[Long]("n_id") == 0L)
      assert(rows.head.getAs[Double]("sim_r") == 1.0)

      val scan = res.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains(storeDir)) => f
      }.head
      assert(scan.partitionFilters.nonEmpty,
        s"cell predicate must prune partitions:\n${res.queryExecution.executedPlan}")
      val selected = scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters)
      val cellsRead = selected.map(_.values.getInt(0)).toSet
      assert(cellsRead.size == nProbe,
        s"expected $nProbe probed cells, scan reads $cellsRead")
      val allFiles = spark.read.parquet(storeDir).inputFiles.length
      val readFiles = selected.map(_.files.size).sum
      assert(readFiles < allFiles,
        s"pruned scan must read fewer files ($readFiles) than the store holds ($allFiles)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", restoreAqe)
  }

  test("a persisted store reopens: fresh-read centroids probe identically") {
    val built = AnnIndex.buildIvfStore(spark, sf, storeDir)
    val reopened = AnnIndex.openIvfStore(spark, storeDir)
    // the routing table is invisible to corpus reads (underscore path)
    assert(!spark.read.parquet(storeDir).columns.contains("cv"))
    val q = Tables.load(spark, sf, "embeddings")
      .filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), toDouble($"embedding").as("qv"))
      .withColumn("qnrm", l2Norm($"qv"))
    def run(c: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      AnnIndex.probeIvfStore(spark, storeDir, c, q, nProbe = 8, k = 5)
        .select($"q_id", $"rnk", $"n_id", $"sim_r")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(run(reopened) == run(built))
  }

  test("incremental append: O(|new|) ingest, old files untouched, routed cells") {
    val appendDir = "target/ivf_store_append_spec"
    val all = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", toDouble($"embedding").as("v"))
      .withColumn("nrm", l2Norm($"v"))
    // fit a routing table (buildIvfStore's own), then lay out a store
    // holding only the first 400 vectors with that table
    val centroids = AnnIndex.buildIvfStore(spark, sf, "target/ivf_append_fit")
    AnnIndex.assignWithCentroids(all.filter($"vec_id" < 400), centroids)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cell").parquet(appendDir)
    centroids.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$appendDir/_centroids")
    val filesBefore = spark.read.parquet(appendDir).inputFiles.toSet
    assert(spark.read.parquet(appendDir).count() == 400L)

    AnnIndex.appendIvfStore(spark, appendDir, all.filter($"vec_id" >= 400))

    // every pre-append file survives in place (no rewrite), rows add up
    val filesAfter = spark.read.parquet(appendDir).inputFiles.toSet
    assert(filesBefore.subsetOf(filesAfter), "append must not rewrite existing files")
    assert(spark.read.parquet(appendDir).count() == all.count())

    // appended rows landed in the cells the store's routing table assigns
    val expected = AnnIndex.assignWithCentroids(all, AnnIndex.openIvfStore(spark, appendDir))
      .select($"vec_id", $"cell").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"))).toMap
    val stored = spark.read.parquet(appendDir).select($"vec_id", $"cell").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"))).toMap
    assert(stored == expected, "appended rows must land in the routed cells")

    // and the appended store probes end-to-end
    val q = all.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val got = AnnIndex.probeIvfStore(spark, appendDir,
      AnnIndex.openIvfStore(spark, appendDir), q, nProbe = 8, k = 5).collect()
    assert(got.length == 15)
  }
}
