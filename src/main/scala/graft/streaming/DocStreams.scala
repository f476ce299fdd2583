package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming curation — the documents-side twin of [[EventStreams]]:
  * the corpus arrives as an unbounded file stream (nightly crawl
  * drops, not a static table) and flows through the SAME gate the
  * batch pipeline runs.
  *
  * The lambda split, stated explicitly: the STATELESS half of the
  * curation gate (lang-id + quality floor, one narrow pass shared
  * verbatim with `TextAnalysis.curate` via `scoreDocs`) and EXACT
  * content-hash dedup run in-stream; near-dup LSH stays a batch
  * compaction job over the accumulated store — banding needs the
  * corpus-wide shingle frames, which no bounded stream state can hold.
  * Cross-restart / cross-batch dedup is the store's content-hash
  * anti-join (StreamingIngestSpec proves replay-idempotence); the
  * in-stream `dropDuplicates` here only collapses duplicates within
  * the stream itself.
  */
object DocStreams {

  /** File-stream source over a directory of documents parquet (schema
    * inferred from a batch read, as the file source requires). */
  def loadDocumentsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema).parquet(dir)
  }

  /** The curation gate as a stream transform: score (shared with
    * batch), language + quality floor, first-wins content-hash dedup.
    * Works unchanged on a batch frame — [[curateBatch]] IS this
    * function applied to a static read (the parity the spec pins).
    *
    * STATE CONTRACT: `dropDuplicates` without a watermark keys state
    * on every hash ever seen — global exact dedup inherently holds the
    * distinct-hash set somewhere, and on a months-long query that
    * somewhere must not be the state store. Production bounds it by
    * splitting the horizon: [[curateGateBounded]] dedups in-state only
    * within a watermark window, and anything older is caught by the
    * store's content-hash anti-join at ingest
    * (GraftVectorDB.ingestRecords / StreamingIngestSpec). */
  def curateGate(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    scoredGated(docs)
      // project BEFORE the stateful dedup: the state store then keys
      // and carries exactly the output row (and the streaming planner
      // requires the dedup child schema to be the final one)
      .select($"file_hash", $"lang_pred", $"n_tokens", $"quality_r")
      .dropDuplicates("file_hash")
  }

  /** Bounded-state variant: `arrivalCol` (an event-time timestamp on
    * the incoming frame) is watermarked to `horizon`, and
    * `dropDuplicatesWithinWatermark` evicts dedup state older than the
    * horizon — the long-running-query shape; cross-horizon duplicates
    * are the store anti-join's job. */
  def curateGateBounded(docs: DataFrame, arrivalCol: String,
      horizon: String): DataFrame = {
    import docs.sparkSession.implicits._
    scoredGated(docs)
      .select($"file_hash", $"lang_pred", $"n_tokens", $"quality_r",
        col(arrivalCol).as("arrival"))
      .withWatermark("arrival", horizon)
      .dropDuplicatesWithinWatermark("file_hash")
      .select($"file_hash", $"lang_pred", $"n_tokens", $"quality_r")
  }

  private def scoredGated(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    TextAnalysis.scoreDocs(docs)
      .withColumn("file_hash", md5($"text"))
      .filter($"lang_pred".isin("en", "es") && $"quality_r" >= 0.25)
  }

  /** Batch twin on the same table, for stream-parity checks. */
  def curateBatch(spark: SparkSession, dir: String): DataFrame =
    curateGate(graft.Tables.load(spark, dir, "documents"))
}
