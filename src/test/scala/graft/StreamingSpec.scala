package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Streaming/batch parity: the streaming operators over a bounded
  * file source must agree with their batch twins. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The file-stream source wants a directory; stage the single events
    * file into one. */
  private lazy val streamDir: String = {
    val dir = java.nio.file.Paths.get("target", "stream_src")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf, "events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir.toAbsolutePath.toString
  }

  test("windowed aggregation: streaming == batch") {
    val q = EventStreams.windowAggStream(Tables.loadEventsStream(spark, streamDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("st_window_test").start()
    try {
      q.processAllAvailable()
      val got = spark.table("st_window_test")
        .select("hour", "event_type", "n", "sum_value")
      val want = EventStreams.windowAggBatch(spark, sf)
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("stream-static enrichment: streaming == batch") {
    val q = EventStreams.enrichStream(
        Tables.loadEventsStream(spark, streamDir),
        Tables.load(spark, sf, "customer"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("st_enrich_test").start()
    try {
      q.processAllAvailable()
      val got = spark.table("st_enrich_test")
        .select("c_mktsegment", "day", "n", "sum_value")
      val want = EventStreams.enrichBatch(spark, sf)
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("streaming dedup emits one row per (user, type, minute)") {
    val q = EventStreams.dedupStream(Tables.loadEventsStream(spark, streamDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("st_dedup_test").start()
    try {
      q.processAllAvailable()
      val got = spark.table("st_dedup_test")
      val dups = got.groupBy("user_id", "event_type", "minute")
        .count().filter(col("count") > 1).count()
      assert(dups == 0)
      assert(got.count() == EventStreams.dedupBatch(spark, sf).count())
    } finally q.stop()
  }
}
