package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Stream-stream join: error events joined to click events of the same
  * user within the trailing hour, both sides watermarked — the
  * streaming twin of the bucketed range join (ol_range's pre-agg
  * pairs). With a bounded source, the emitted pairs must equal the
  * batch join exactly. */
class StreamStreamJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val streamDir: String = {
    val dir = java.nio.file.Paths.get("target", "stream_src")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf, "events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir.toAbsolutePath.toString
  }

  test("stream-stream range join emits exactly the batch pairs") {
    val q = EventStreams.rangeJoinStream(
        Tables.loadEventsStream(spark, streamDir),
        Tables.loadEventsStream(spark, streamDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_join_test").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_join_test")
        .select("error_id", "click_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSet

      val ev = Tables.load(spark, sf, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      val want = errors.join(clicks,
          errors("user_id") === clicks("c_user") &&
            clicks("click_ts") > errors("ts") - expr("INTERVAL 1 HOUR") &&
            clicks("click_ts") <= errors("ts"))
        .select("error_id", "click_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSet

      assert(got == want,
        s"missing: ${(want -- got).size}; spurious: ${(got -- want).size}")
    } finally q.stop()
  }
}
