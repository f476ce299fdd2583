package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** A corpus-FITTED linear text encoder for the channel registry — the
  * proof that [[GraftVectorDB.ChannelDef]]'s two-function seam carries
  * genuinely LEARNED, non-hash-family embeddings end to end. The
  * reference's encoders (bge/clip, vector_db.py:464-545) are neural
  * models; this environment has no model runtime, so the smallest
  * honest learned model stands in: a TF-IDF bag-of-words projection
  * whose parameters (vocabulary + idf weights) are FIT from data by
  * [[fit]], then applied identically in-plan (`encode`, codegen'd
  * Column HOFs) and driver-side (`encodeLocal`, the one-job warm
  * serving path). A real ONNX/neural encoder drops into the same two
  * functions; everything downstream (ingest, index build/append,
  * exact/ANN/PQ search, batch twins, delete, maintenance) is already
  * channel-generic.
  *
  * Both forms round to 6dp after L2-normalization — the library's
  * embedder parity grid — and ChannelRegistrySpec asserts them
  * bit-identical over corpus samples. */
object TfidfEncoder {

  /** Shared vocabulary/idf fit — ONE aggregation job picking the
    * `dim` highest-document-frequency tokens (ties broken
    * lexicographically, so the fit is deterministic) with smoothed
    * idf ln((N+1)/(df+1)). The one definition [[TfidfEncoder]] and
    * [[LsaEncoder]] both fit with — the tie-break/empty-token/idf
    * semantics must not drift between them. */
  private[operators] def fitVocabIdf(texts: DataFrame, textCol: String,
      dim: Int, what: String,
      requireFull: Boolean = true): (Long, Array[String], Array[Double]) = {
    val spark = texts.sparkSession
    import spark.implicits._
    val n = texts.count()
    val top = texts.select(explode(array_distinct(tokens(col(textCol)))).as("t"))
      .filter($"t" =!= "")
      .groupBy($"t").agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"t".asc).limit(dim)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // requireFull = false (the adaptive fit): the limit ITSELF clamps
    // to whatever vocabulary exists — no separate corpus-wide distinct
    // count, no approximate-count overshoot hazard
    require(!requireFull || top.length == dim,
      s"$what: corpus has only ${top.length} distinct tokens (< $dim)")
    (n, top.map(_._1),
      top.map { case (_, df) => math.log((n + 1.0) / (df + 1.0)) })
  }

  /** The raw (pre-normalization) tf-idf vector as a Column HOF — the
    * in-plan twin both fitted encoders project from. */
  private[operators] def rawTfidf(c: Column, vocabLit: Column,
      idfLit: Column, dim: Int): Column = {
    val tks = tokens(c)
    transform(sequence(lit(0), lit(dim - 1)), i =>
      size(filter(tks, t => t === element_at(vocabLit, i + 1))).cast("double")
        * element_at(idfLit, i + 1))
  }

  /** Learn a `dim`-term model over `texts(textCol)` ([[fitVocabIdf]]);
    * the returned ChannelDef embeds the parameters as plan literals
    * (a ~dim-entry broadcast, not a join). */
  def fit(texts: DataFrame, textCol: String, name: String,
      contentTypes: Seq[String], dim: Int = 64): GraftVectorDB.ChannelDef = {
    val (_, vocab, idf) = fitVocabIdf(texts, textCol, dim, "TfidfEncoder.fit")
    val vocabLit = typedLit(vocab.toSeq)
    val idfLit = typedLit(idf.toSeq)
    def encode(c: Column): Column = {
      val raw = rawTfidf(c, vocabLit, idfLit, dim)
      val nrm = sqrt(aggregate(raw, lit(0.0), (a, x) => a + x * x))
      transform(raw, x => round(x / greatest(nrm, lit(1e-12)), 6))
    }
    def encodeLocal(s: String): Array[Double] = {
      // TextFunctions.tokens twin: SQL trim strips SPACES only and SQL
      // split keeps trailing empties (the VectorStore.hashEmbedLocal
      // convention)
      val trimmed = {
        var a = 0; var b = s.length
        while (a < b && s.charAt(a) == ' ') a += 1
        while (b > a && s.charAt(b - 1) == ' ') b -= 1
        s.substring(a, b)
      }
      val tks = trimmed.split("\\s+", -1)
      val raw = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var c = 0
        tks.foreach(t => if (t == vocab(i)) c += 1)
        raw(i) = c.toDouble * idf(i)
        i += 1
      }
      var sq = 0.0
      i = 0
      while (i < dim) { sq += raw(i) * raw(i); i += 1 }
      val nrm = math.max(math.sqrt(sq), 1e-12)
      i = 0
      while (i < dim) {
        raw(i) = BigDecimal(raw(i) / nrm)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        i += 1
      }
      raw
    }
    GraftVectorDB.ChannelDef(name, contentTypes, encode, encodeLocal, dim)
  }
}
