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
    * function applied to a static read (the parity the spec pins). */
  def curateGate(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    TextAnalysis.scoreDocs(docs)
      .withColumn("file_hash", md5($"text"))
      .filter($"lang_pred".isin("en", "es") && $"quality_r" >= 0.25)
      // project BEFORE the stateful dedup: the state store then keys
      // and carries exactly the output row (and the streaming planner
      // requires the dedup child schema to be the final one)
      .select($"file_hash", $"lang_pred", $"n_tokens", $"quality_r")
      .dropDuplicates("file_hash")
  }

  /** Batch twin on the same table, for stream-parity checks. */
  def curateBatch(spark: SparkSession, dir: String): DataFrame =
    curateGate(graft.Tables.load(spark, dir, "documents"))
}
