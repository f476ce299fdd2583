package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** The reference's VectorDatabase ingest pipeline, batch-native.
  *
  * The reference walks files one at a time, appending pandas rows
  * (vector_db.py:163-229); here ingestion is a single declarative plan
  * over the corpus table: chunk → hash → dedup → tokenize → embed.
  * Every step is a narrow per-row transform (no shuffle) except the
  * dedup groupBy, so the pipeline scans 100 TB exactly once.
  */
object VectorStore {

  val ChunkSize = 256
  val ChunkStride = 200
  val EmbedDim = 64
  /** The image channel's own space is deliberately a DIFFERENT dim so
    * cross-space cosine is a type error, not a silent wrong answer. */
  val ImageEmbedDim = 48

  /** Fixed-size overlapping chunking — the analog of the reference's
    * per-page text blocks (embed_pdf, vector_db.py:254-280). The chunk
    * count derives from the text itself, so the operator composes with
    * any upstream source. */
  def chunk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        posexplode(transform(
          sequence(lit(0), expr(s"int((length(text) - 1) div $ChunkStride)")),
          i => substr($"text", i * lit(ChunkStride) + lit(1), lit(ChunkSize)))))
      .toDF("doc_id", "chunk_id", "chunk_text")
      .select($"doc_id", $"chunk_id".cast("long").as("chunk_id"),
        $"chunk_text", length($"chunk_text").cast("long").as("chunk_len"))
      .orderBy($"doc_id", $"chunk_id")
  }

  /** Content hash + duplicate flag (get_file_hash /
    * file_already_processed, vector_db.py:420-434). */
  def fileHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"file_hash").orderBy($"doc_id")
    Tables.load(spark, dir, "documents")
      .select($"doc_id", md5($"text").as("file_hash"))
      .withColumn("is_dup", row_number().over(w) > 1)
      .orderBy($"doc_id")
  }

  /** Ingest-time exact dedup: first doc per content hash wins —
    * the set-semantics version of the reference's skip-if-processed
    * loop (vector_db.py:187-193). */
  def dedupIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .groupBy(md5($"text").as("file_hash"))
      .agg(min($"doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keeper_doc_id")
  }

  /** Tokenization stats — the embedding preprocessor. */
  def tokenize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", tokens($"text").as("toks"))
      .select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        size(array_distinct($"toks")).cast("long").as("n_distinct"),
        element_at($"toks", 1).as("first_token"),
        element_at($"toks", -1).as("last_token"))
      .orderBy($"doc_id")
  }

  /** Deterministic hashing-trick embedding, dim=64, L2-normalized —
    * the batch stand-in for the reference's model embedders
    * (bge_text_embedder, vector_db.py:464-471: encode + normalize).
    * Bucket counting is a native single-pass Expression
    * ([[graft.functions.expressions.HashingCounts]]); the Column-HOF
    * formulation re-evaluated the md5 bucket array once per output
    * dim. md5-reproducible, so the oracle recomputes it exactly. */
  def embedText(text: Column): Column =
    graft.functions.expressions.HashingCounts.normalized(tokens(text), EmbedDim)

  /** The image-space embedder — a second, independent hash family
    * (salted tokens, [[ImageEmbedDim]] dims) standing in for the
    * reference's CLIP image space (clip_base_image_embedder,
    * vector_db.py:473-490). Image-channel content embeds with THIS,
    * and text queries against the image store go through it too — the
    * analog of the CLIP *text* encoder that projects a text query into
    * the image space (clip_base_text_embedder, :492-508). */
  def embedImage(content: Column): Column =
    graft.functions.expressions.HashingCounts.normalized(
      transform(tokens(content), t => concat(lit("img:"), t)), ImageEmbedDim)

  /** Driver-local twins of [[embedText]]/[[embedImage]] for the ANN
    * serving path: the same tokens → first-md5-byte bucket → count →
    * L2-normalize-round(6) arithmetic in plain Scala, bit-identical to
    * the HashingCounts Expression (HALF_UP BigDecimal rounding, UTF-8
    * md5 bytes), so embedding ONE query costs zero Spark jobs.
    * Parity with the distributed form is pinned in
    * NativeExpressionPropsSpec. */
  def embedTextLocal(text: String): Array[Double] =
    hashEmbedLocal(text, identity, EmbedDim)

  def embedImageLocal(content: String): Array[Double] =
    hashEmbedLocal(content, "img:" + _, ImageEmbedDim)

  /** Driver-local twin of `TextFunctions.tokens` = `split(trim(c),
    * "\s+")`: SQL trim strips SPACES only (not Java trim's ≤U+0020
    * range) and SQL split keeps trailing empty strings (Java limit
    * -1). Serving paths that tokenize a query driver-side (the lexical
    * channel of `searchHybrid`) must agree with the distributed
    * tokenizer exactly or postings lookups silently miss. */
  private[graft] def tokensLocal(text: String): Array[String] = {
    val trimmed = {
      var a = 0; var b = text.length
      while (a < b && text.charAt(a) == ' ') a += 1
      while (b > a && text.charAt(b - 1) == ' ') b -= 1
      text.substring(a, b)
    }
    trimmed.split("\\s+", -1)
  }

  private def hashEmbedLocal(text: String, salt: String => String, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Double](dim)
    tokensLocal(text).foreach { t =>
      val b0 = md.digest(salt(t).getBytes("UTF-8"))(0) & 0xFF
      counts(b0 % dim) += 1.0
    }
    var sq = 0.0
    var j = 0
    while (j < dim) { sq += counts(j) * counts(j); j += 1 }
    val nrm = math.sqrt(sq)
    j = 0
    while (j < dim) {
      counts(j) = BigDecimal(counts(j) / nrm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      j += 1
    }
    counts
  }

  /** Embeddings exploded to (doc_id, dim, val) rows — scalar columns
    * hash-compare across engines more robustly than list columns. */
  def embed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id", posexplode(embedText($"text")))
      .toDF("doc_id", "dim", "val")
      .select($"doc_id", $"dim".cast("long").as("dim"), $"val")
      .orderBy($"doc_id", $"dim")
  }
}
