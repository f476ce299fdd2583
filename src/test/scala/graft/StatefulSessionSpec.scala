package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import graft.streaming.EventStreams

/** flatMapGroupsWithState sessionization agrees with the batch
  * sessionizer. With a single bounded micro-batch, the streaming
  * operator emits every session except each user's final (still-open)
  * one — so emitted sessions must be exactly the batch sessions minus
  * the last session per user. */
class StatefulSessionSpec extends AnyFunSuite {
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

  test("streaming sessions == batch sessions minus each user's open one") {
    val q = EventStreams.sessionizeStream(Tables.loadEventsStream(spark, streamDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("st_sessionize_test").start()
    try {
      q.processAllAvailable()
      val got = spark.table("st_sessionize_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("t_start"),
          r.getAs[java.sql.Timestamp]("t_end"), r.getAs[Long]("n_events"))).toSet

      val batch = Relational.sessionize(spark, sf).collect()
      val lastPerUser = batch.groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rows) => (u, rows.map(_.getAs[Long]("session_id")).max) }
        .toSet
      val expected = batch.filterNot(r => lastPerUser.contains(
          (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"))))
        .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("t_start"),
          r.getAs[java.sql.Timestamp]("t_end"), r.getAs[Long]("n_events"))).toSet

      assert(got.nonEmpty)
      // every emitted session is a real batch session...
      val all = batch.map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("t_start"),
        r.getAs[java.sql.Timestamp]("t_end"), r.getAs[Long]("n_events"))).toSet
      assert((got -- all).isEmpty, s"streaming emitted non-batch sessions: ${got -- all}")
      // ...and every closed (non-final) batch session was emitted.
      // Final sessions may also appear when the trailing watermark
      // advance fires their event-time timeout — that's correct too.
      assert((expected -- got).isEmpty, s"missing sessions: ${expected -- got}")
    } finally q.stop()
  }
}
