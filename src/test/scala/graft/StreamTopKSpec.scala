package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Streaming per-hour top-k (flatMapGroupsWithState custom state — the
  * shape stacked streaming aggregations can't express) agrees with the
  * batch ranker. Emission is timeout-driven: an hour's top-k appears
  * once the watermark clears its window end, so with one bounded
  * micro-batch the emitted hours are exactly those at least
  * (watermark delay + window) behind the stream's max event time; the
  * trailing hours stay open — correct streaming semantics, asserted as
  * subset/superset like StatefulSessionSpec. */
class StreamTopKSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val streamDir: String = {
    val dir = java.nio.file.Paths.get("target", "stream_src_topk")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf, "events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir.toAbsolutePath.toString
  }

  test("streaming hourly top-3 == batch top-3 for every watermark-closed hour") {
    val q = EventStreams.topkStream(Tables.loadEventsStream(spark, streamDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("st_topk_test").start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[java.sql.Timestamp]("hour"), r.getAs[Long]("rnk"),
          r.getAs[String]("event_type"), r.getAs[Long]("n"))
      val got = spark.table("st_topk_test").collect().map(key).toSet
      val batch = EventStreams.topkBatch(spark, sf).collect().map(key)
      val all = batch.toSet
      assert(got.nonEmpty, "no hour closed — watermark never fired a timeout")
      // every emitted row is exactly a batch row (counts are final at
      // emission: the single micro-batch held all the hour's events)
      assert((got -- all).isEmpty, s"streaming emitted non-batch rows: ${got -- all}")
      // every hour the watermark provably closed must have been emitted:
      // watermark = max(hour) - 1h delay; timeout at hour + 1h window
      val maxHour = batch.map(_._1.getTime).max
      val closed = all.filter { case (h, _, _, _) =>
        h.getTime + 3600L * 1000 < maxHour - 3600L * 1000
      }
      assert((closed -- got).isEmpty, s"missing closed hours: ${closed -- got}")
    } finally q.stop()
  }
}
