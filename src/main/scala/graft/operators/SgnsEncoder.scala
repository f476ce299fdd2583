package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A corpus-FITTED **neural** text encoder for the channel registry —
  * word2vec skip-gram with negative sampling (SGNS; Mikolov et al.
  * 2013, public), the training objective the reference's
  * `bge_text_embedder`-class sentence encoders descend from
  * (vector_db.py:451-545). Where [[LsaEncoder]] factorizes the
  * term–DOCUMENT matrix (topical similarity), SGNS trains a one-
  * hidden-layer network by SGD over sliding token WINDOWS, so two
  * words that never co-occur in any document still embed close when
  * they appear in the same local contexts — paradigmatic (synonym)
  * similarity, the property ChannelRegistrySpec's held-out pair set
  * measures. A document embeds as the idf-weighted sum of its word
  * vectors, L2-normalized — i.e. the SAME linear-projection serving
  * shape as LSA ([[ProjectionEncoder]]: projᵀ·tfidf), so the in-plan /
  * driver bit-parity discipline is inherited, and a real ONNX/neural
  * sentence encoder still drops into the same two ChannelDef
  * functions.
  *
  * Fit shape (100 TB-safe, the [[LsaEncoder]] discipline): vocabulary
  * + idf from ONE distributed aggregation ([[TfidfEncoder
  * .fitVocabIdf]]), then ONE bounded hash-ordered sample
  * (≤ [[AnnIndex.SampleTarget]] docs) collected to the driver, where
  * the SGD loop runs SEQUENTIALLY with a seeded SplittableRandom —
  * refits are bit-stable by construction (fixed visit order, fixed
  * PRNG stream, no hogwild races). The corpus-sized work is the
  * vocabulary pass; the training loop is O(sample · window ·
  * negatives · dim), driver-bounded like the IVF/PQ Lloyd fits. */
object SgnsEncoder {

  /** Train an SGNS channel over `texts(textCol)`.
    *
    * @param dim       word-vector / embedding width
    * @param vocabSize df-top vocabulary size (negative table + vectors
    *                  are vocabSize × dim driver state)
    * @param window    one-sided context width (word2vec -window)
    * @param negatives negative samples per positive pair (-negative)
    * @param epochs    full passes over the sample (-iter)
    * @param seed      PRNG seed: init + negative draws + window jitter
    */
  def fit(texts: DataFrame, textCol: String, name: String,
      contentTypes: Seq[String], dim: Int = 64, vocabSize: Int = 256,
      window: Int = 4, negatives: Int = 5, epochs: Int = 8,
      seed: Long = 42L): GraftVectorDB.ChannelDef = {
    val spark = texts.sparkSession
    import spark.implicits._
    val t = texts.select(col(textCol).as("t")).filter($"t".isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (vocab, idf, sample) =
      try {
        val (_, v, w) = TfidfEncoder.fitVocabIdf(t, "t", vocabSize, "SgnsEncoder.fit")
        val s: Array[String] = t
          .select(xxhash64($"t").as("k"), $"t")
          .orderBy($"k", $"t").limit(AnnIndex.SampleTarget.toInt)
          .collect().map(_.getString(1))
        (v, w, s)
      } finally t.unpersist(blocking = false)
    val vIdx = vocab.zipWithIndex.toMap
    // vocab-indexed token streams (out-of-vocabulary tokens DROP, the
    // word2vec convention — windows close over the kept tokens)
    val streams: Array[Array[Int]] = sample.map(s =>
      VectorStore.tokensLocal(s).flatMap(vIdx.get).toArray)
    // unigram^0.75 negative-sampling table (word2vec's smoothing)
    val counts = new Array[Long](vocabSize)
    streams.foreach(_.foreach(counts(_) += 1))
    val cum = new Array[Double](vocabSize)
    var acc = 0.0
    var i = 0
    while (i < vocabSize) {
      acc += math.pow(counts(i).toDouble, 0.75); cum(i) = acc; i += 1
    }
    require(acc > 0, "SgnsEncoder.fit: sample contains no vocabulary tokens")
    val rng = new java.util.SplittableRandom(seed)
    def drawNeg(): Int = {
      val x = rng.nextDouble() * acc
      // binary search the cumulative table
      var lo = 0; var hi = vocabSize - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cum(mid) < x) lo = mid + 1 else hi = mid
      }
      lo
    }
    // init: input vectors uniform in [-0.5/dim, 0.5/dim) (word2vec),
    // output vectors zero — both from the SAME seeded stream, in a
    // fixed word-major order, so refits are bit-identical
    val syn0 = Array.tabulate(vocabSize)(_ =>
      Array.fill(dim)((rng.nextDouble() - 0.5) / dim))
    val syn1 = Array.fill(vocabSize)(new Array[Double](dim))
    val totalPos = streams.iterator.map(_.length.toLong).sum * epochs
    require(totalPos > 0, "SgnsEncoder.fit: sample has no trainable tokens")
    val lr0 = 0.025
    var seen = 0L
    def sigmoid(x: Double): Double =
      if (x > 8) 1.0 else if (x < -8) 0.0 else 1.0 / (1.0 + math.exp(-x))
    var e = 0
    while (e < epochs) {
      var d = 0
      while (d < streams.length) {
        val toks = streams(d)
        var p = 0
        while (p < toks.length) {
          val lr = math.max(lr0 * (1.0 - seen.toDouble / totalPos), lr0 * 1e-3)
          // dynamic window (word2vec's b): uniform in [1, window]
          val b = 1 + rng.nextInt(window)
          val wIn = toks(p)
          val v = syn0(wIn)
          var c = math.max(0, p - b)
          val hiC = math.min(toks.length - 1, p + b)
          while (c <= hiC) {
            if (c != p) {
              val grad = new Array[Double](dim)
              var k = 0
              while (k <= negatives) {
                val (target, label) =
                  if (k == 0) (toks(c), 1.0)
                  else {
                    var n = drawNeg()
                    // a negative equal to the positive is skipped by
                    // REDRAWING once (deterministic); a second collision
                    // trains as-is — word2vec.c's pragmatic rule
                    if (n == toks(c)) n = drawNeg()
                    (n, 0.0)
                  }
                if (k == 0 || target != toks(c)) {
                  val u = syn1(target)
                  var dot = 0.0
                  var j = 0
                  while (j < dim) { dot += v(j) * u(j); j += 1 }
                  val g = (label - sigmoid(dot)) * lr
                  j = 0
                  while (j < dim) {
                    grad(j) += g * u(j)
                    u(j) += g * v(j)
                    j += 1
                  }
                }
                k += 1
              }
              var j = 0
              while (j < dim) { v(j) += grad(j); j += 1 }
            }
            c += 1
          }
          seen += 1
          p += 1
        }
        d += 1
      }
      e += 1
    }
    // projection row d = component d of every word vector: the
    // document embedding projᵀ·tfidf is the idf-weighted word-vector
    // sum, served by the shared ProjectionEncoder arithmetic
    val proj: Array[Array[Double]] =
      Array.tabulate(dim)(d => Array.tabulate(vocabSize)(w => syn0(w)(d)))
    ProjectionEncoder.channel(name, contentTypes, vocab, idf, proj, dim)
  }
}
