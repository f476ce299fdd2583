package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions.zValue16

/** Z-order clustering as a data-skipping layout: events written sorted
  * by the interleaved z-value of (user_id, value-bucket) give every
  * output file a bounded min/max box in BOTH dimensions, so a
  * predicate on EITHER column overlaps few files — where a linear sort
  * on user_id alone leaves the value dimension unclustered (every file
  * spans the full value range → zero skipping for value predicates). */
class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Range-partition on the layout key with an explicit partition count:
    * AQE coalesces plain orderBy shuffles at toy scale to ONE partition
    * (= one output file, where no layout can show pruning), but leaves
    * user-specified repartition counts alone — so each of the 16 files
    * covers a contiguous key range regardless of data size. */
  private def writeSorted(df: DataFrame, sort: Seq[org.apache.spark.sql.Column],
      path: String): Unit =
    df.repartitionByRange(16, sort: _*)
      .sortWithinPartitions(sort: _*)
      .write.mode("overwrite")
      .parquet(path)

  /** Fraction of files whose [min,max] value-bucket box overlaps
    * bucket ∈ [100, 150) — the files a stats-pruned scan must read. */
  private def overlapFraction(path: String): Double = {
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min($"vbucket").as("lo"), max($"vbucket").as("hi"))
      .collect()
    stats.count(r => r.getAs[Int]("hi") >= 100 && r.getAs[Int]("lo") < 150)
      .toDouble / stats.length
  }

  test("z-ordered files prune a value predicate; linear-by-user files cannot") {
    val events = Tables.load(spark, sf, "events")
      .select($"user_id".cast("int").as("uid"),
        floor($"value").cast("int").as("vbucket"), $"event_id")
    val linear = "target/zorder_linear"
    val zorder = "target/zorder_z"
    writeSorted(events, Seq($"uid"), linear)
    writeSorted(events.withColumn("z", zValue16($"uid", $"vbucket")),
      Seq($"z"), zorder)

    val linFrac = overlapFraction(linear)
    val zFrac = overlapFraction(zorder)
    info(f"files overlapping vbucket∈[100,150): linear=$linFrac%.2f z-order=$zFrac%.2f")
    // linear-by-uid leaves value unclustered: (almost) every file overlaps
    assert(linFrac > 0.9, s"expected no value clustering under linear sort, got $linFrac")
    // z-order bounds both dims per file: most files prune away
    assert(zFrac <= 0.5, s"z-order must let a stats scan skip most files, got $zFrac")
    // layout changes nothing about the data itself
    assert(spark.read.parquet(zorder).count() == events.count())
  }
}
