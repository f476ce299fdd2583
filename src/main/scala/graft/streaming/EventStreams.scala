package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

case class SessionEvent(user_id: Long, ts: Timestamp, event_id: Long)
case class UserSession(user_id: Long, t_start: Timestamp, t_end: Timestamp, n_events: Long)
case class HourEvent(hour: Timestamp, event_type: String)
case class HourTopK(hour: Timestamp, rnk: Long, event_type: String, n: Long)

/** Structured-Streaming event operators, each with a batch-parity
  * form. The batch form is the oracle-checked query; the streaming
  * form applies the identical transform to an unbounded source with a
  * watermark — Spark's unified Dataset API makes them the same plan
  * shape, which the spec suite asserts by running the streaming
  * version over the same rows via a memory sink.
  */
object EventStreams {

  /** Stream-static enrichment (batch parity): events joined to the
    * customer dim, aggregated per segment/day. The dim broadcasts; in
    * the streaming form the same join is a stream-static join re-read
    * per micro-batch. */
  def enrichBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_mktsegment")
    Tables.load(spark, dir, "events")
      .join(broadcast(cust), $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy($"c_mktsegment", $"day")
  }

  /** Streaming twin of [[enrichBatch]]: stream-static join + windowed
    * aggregation. */
  def enrichStream(events: DataFrame, customer: DataFrame): DataFrame = {
    val cust = customer.select(col("c_custkey"), col("c_mktsegment"))
    events
      .join(cust, col("user_id") === col("c_custkey"))
      .withWatermark("ts", "1 hour")
      .groupBy(col("c_mktsegment"), window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("c_mktsegment"), col("w.start").as("day"), col("n"), col("sum_value"))
  }

  /** Tumbling 1h windowed aggregation (batch parity). */
  def windowAggBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy($"hour", $"event_type")
  }

  /** Streaming twin of [[windowAggBatch]]: watermark + tumbling window.
    * Aggregation state is bounded by the watermark horizon; at scale
    * the shuffle keys on (window, event_type), same as batch. */
  def windowAggStream(events: DataFrame): DataFrame = {
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Dedup-within-minute (batch parity): first event id per
    * (user, type, minute) plus the duplicate count. */
  def dedupBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"user_id", $"event_type",
        date_trunc("minute", $"ts").as("minute"))
      .agg(min($"event_id").as("first_event"), count(lit(1)).as("n_dups"))
      .orderBy($"user_id", $"event_type", $"minute")
  }

  /** Stream-stream join: error events matched to same-user click
    * events in the trailing hour. Both sides carry watermarks and the
    * join has two-sided time bounds, so each side's buffered state is
    * evicted once the other's watermark passes — bounded memory on an
    * unbounded stream, the canonical streaming range-join shape
    * (streaming twin of [[graft.operators.Relational.rangeJoin]]'s
    * pair generation). */
  def rangeJoinStream(errorsSrc: DataFrame, clicksSrc: DataFrame): DataFrame = {
    val errors = errorsSrc.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
      .withWatermark("ts", "10 minutes")
    val clicks = clicksSrc.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    errors.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") > col("ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("ts"))
      .select(col("error_id"), col("user_id"), col("ts"), col("click_ts"))
  }

  /** Stateful streaming sessionization via flatMapGroupsWithState —
    * the custom-state twin of [[graft.operators.Relational.sessionize]].
    * Each user's state holds the open session; a gap > `gapHours`
    * closes it (emitted on the next event or on event-time timeout).
    * State is per-key and bounded: one open session per user,
    * expiring at watermark + gap. */
  def sessionizeStream(events: DataFrame, gapHours: Int = 6): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapHours * 3600L * 1000000L

    def micros(t: Timestamp): Long = (t.getTime / 1000) * 1000000L + t.getNanos / 1000
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }

    events.select($"user_id", $"ts", $"event_id").as[SessionEvent]
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SessionEvent], state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (s, e, n) = state.get
            state.remove()
            Iterator.single(UserSession(uid, toTs(s), toTs(e), n))
          } else {
            val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var open: Option[(Long, Long, Long)] = state.getOption
            val closed = Seq.newBuilder[UserSession]
            sorted.foreach { ev =>
              val t = micros(ev.ts)
              open match {
                case Some((s, e, n)) if t - e <= gapUs =>
                  open = Some((s, t, n + 1))
                case Some((s, e, n)) =>
                  closed += UserSession(uid, toTs(s), toTs(e), n)
                  open = Some((t, t, 1L))
                case None =>
                  open = Some((t, t, 1L))
              }
            }
            open.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st._2 / 1000 + gapUs / 1000,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Per-hour top-k event types by count (batch parity form). */
  def topkBatch(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    Tables.load(spark, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"hour").orderBy($"n".desc, $"event_type")).cast("long"))
      .filter($"rnk" <= k)
      .select($"hour", $"rnk", $"event_type", $"n")
      .orderBy($"hour", $"rnk")
  }

  /** Streaming top-k per window — the shape Structured Streaming
    * cannot express declaratively (count-per-type then rank-per-window
    * is two STACKED stateful aggregations, unsupported). Custom state
    * sidesteps the limitation: each open hour's per-type counts live
    * in a `flatMapGroupsWithState` map keyed by the hour, and the
    * ranked top-k is emitted EXACTLY ONCE, when the event-time timeout
    * fires (the watermark has passed the hour, so counts are final).
    * State is bounded by open-windows × event-type cardinality and
    * removed at emission — the memory contract an unbounded stream
    * needs. Batch parity with [[topkBatch]] is spec-verified. */
  def topkStream(events: DataFrame, k: Int = 3): Dataset[HourTopK] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .as[HourEvent]
      .withWatermark("hour", "1 hour")
      .groupByKey(_.hour)
      .flatMapGroupsWithState[Map[String, Long], HourTopK](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (hour: Timestamp, evs: Iterator[HourEvent], state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.get
            state.remove()
            counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
              .zipWithIndex.map { case ((t, n), i) =>
                HourTopK(hour, (i + 1).toLong, t, n)
              }.iterator
          } else {
            val counts = evs.foldLeft(
              state.getOption.getOrElse(Map.empty[String, Long])) { (acc, e) =>
              acc + (e.event_type -> (acc.getOrElse(e.event_type, 0L) + 1L))
            }
            state.update(counts)
            // fire once the watermark clears this hour's window end
            state.setTimeoutTimestamp(math.max(hour.getTime + 3600L * 1000,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming twin of [[dedupBatch]]'s keep-one semantics:
    * dropDuplicates keyed on (user, type, minute) with state expiry at
    * the watermark — the canonical streaming exact-dedup. */
  def dedupStream(events: DataFrame): DataFrame = {
    events
      .withColumn("minute", date_trunc("minute", col("ts")))
      .withWatermark("minute", "1 hour")
      .dropDuplicates(Seq("user_id", "event_type", "minute"))
      .select(col("user_id"), col("event_type"), col("minute"), col("event_id"))
  }
}
