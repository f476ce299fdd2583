package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Structured-Streaming event operators, each with a batch-parity
  * form. The batch form is the oracle-checked query; the streaming
  * form applies the identical transform to an unbounded source with a
  * watermark — Spark's unified Dataset API makes them the same plan
  * shape, which the spec suite asserts by running the streaming
  * version over the same rows via a memory sink.
  */
object EventStreams {

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
