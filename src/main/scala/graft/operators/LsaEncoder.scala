package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** A corpus-FITTED **dense semantic** text encoder for the channel
  * registry — LSA (latent semantic analysis, Deerwester et al. 1990,
  * public): truncated SVD of the TF-IDF term–document matrix, so a
  * document embeds as the k-dim latent projection of its term vector.
  * This is one genuine step past [[TfidfEncoder]] toward the
  * reference's neural encoders (bge/clip, vector_db.py:464-545):
  * where TF-IDF gives two documents with DISJOINT vocabulary cosine
  * exactly 0, LSA places them near each other when their terms
  * CO-OCCUR across the fit corpus — a learned, dense, semantic space,
  * with parameters (vocabulary, idf, projection) estimated from data.
  * An ONNX/neural encoder remains the production step when a model
  * runtime exists; it drops into the same two ChannelDef functions.
  *
  * Fit shape (100 TB-safe): a narrow null-filtered text projection is
  * persisted once and backs the count, the vocabulary aggregation
  * (the [[TfidfEncoder.fitVocabIdf]] shared definition — deterministic
  * ties), and ONE bounded hash-ordered sample job
  * (≤ [[AnnIndex.SampleTarget]] docs — the index-build sampling
  * idiom); the sample feeds a driver-local V×V Gram matrix, and the
  * projection is the Gram's top-k eigenbasis via breeze's LAPACK
  * `eigSym` — deterministic (no ARPACK restarts), with each
  * eigenvector sign-CANONICALIZED (largest-|entry| component made
  * positive, first index on ties) so refits are bit-stable.
  *
  * Serving: `encode` (Column HOFs — term counts × idf, then k
  * zip_with/aggregate dot products against the projection literals)
  * and `encodeLocal` (the same arithmetic in the same fold order, so
  * the two are bit-identical on the 6dp grid). At V beyond ~1k the
  * per-term `filter` passes want the HashingCounts-style fused native
  * expression — the documented seam, not a semantics change. */
object LsaEncoder {

  /** Fit an LSA channel: `vocabSize` df-top terms, `dim` latent
    * components (dim ≤ vocabSize). */
  def fit(texts: DataFrame, textCol: String, name: String,
      contentTypes: Seq[String], dim: Int = 64,
      vocabSize: Int = 256): GraftVectorDB.ChannelDef = {
    val spark = texts.sparkSession
    import spark.implicits._
    require(dim <= vocabSize,
      s"LsaEncoder.fit: dim $dim exceeds vocabSize $vocabSize")
    // one NARROW null-filtered projection backs all three fit passes
    // (count, vocabulary, sample) — a derived corpus frame must not
    // re-execute its upstream per pass, and a null text must not NPE
    // the driver Gram loop
    val t = texts.select(col(textCol).as("t")).filter($"t".isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (vocab, idf, sample) =
      try {
        val (_, v, w) = TfidfEncoder.fitVocabIdf(t, "t", vocabSize, "LsaEncoder.fit")
        // bounded deterministic sample: the SampleTarget texts with the
        // smallest xxhash64, re-sorted by key (the sampleVectors contract)
        val s: Array[String] = t
          .select(xxhash64($"t").as("k"), $"t")
          .orderBy($"k", $"t").limit(AnnIndex.SampleTarget.toInt)
          .collect().map(_.getString(1))
        (v, w, s)
      } finally t.unpersist(blocking = false)
    val vIdx = vocab.zipWithIndex.toMap
    // driver Gram accumulation over the sample's tf-idf vectors
    val gram = Array.ofDim[Double](vocabSize, vocabSize)
    sample.foreach { s =>
      val raw = tfidfLocal(s, vocab, vIdx, idf)
      var i = 0
      while (i < vocabSize) {
        val ri = raw(i)
        if (ri != 0.0) {
          var j = i
          while (j < vocabSize) {
            gram(i)(j) += ri * raw(j); j += 1
          }
        }
        i += 1
      }
    }
    var i = 0
    while (i < vocabSize) {
      var j = 0
      while (j < i) { gram(i)(j) = gram(j)(i); j += 1 }
      i += 1
    }
    // top-k eigenbasis of the Gram = the right singular basis of the
    // sampled term-document matrix (LAPACK dsyevd via breeze: exact,
    // deterministic; eigenvalues ascend, so take the LAST k columns)
    val eig = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix(vocabSize, vocabSize, gram.flatten))
    val proj: Array[Array[Double]] = Array.tabulate(dim) { d =>
      val colIdx = vocabSize - 1 - d // descending eigenvalue order
      val v = Array.tabulate(vocabSize)(r => eig.eigenvectors(r, colIdx))
      // sign canonicalization: refits must be bit-stable
      var best = 0
      var k = 1
      while (k < vocabSize) {
        if (math.abs(v(k)) > math.abs(v(best))) best = k
        k += 1
      }
      if (v(best) < 0) v.map(x => -x) else v
    }
    val vocabLit = typedLit(vocab.toSeq)
    val idfLit = typedLit(idf.toSeq)
    val projLit = typedLit(proj.map(_.toSeq).toSeq)
    def encode(c: Column): Column = {
      val raw = TfidfEncoder.rawTfidf(c, vocabLit, idfLit, vocabSize)
      val lat = transform(sequence(lit(0), lit(dim - 1)), d =>
        aggregate(zip_with(raw, element_at(projLit, d + 1), (x, p) => x * p),
          lit(0.0), (a, x) => a + x))
      val nrm = sqrt(aggregate(lat, lit(0.0), (a, x) => a + x * x))
      transform(lat, x => round(x / greatest(nrm, lit(1e-12)), 6))
    }
    def encodeLocal(s: String): Array[Double] = {
      val raw = tfidfLocal(s, vocab, vIdx, idf)
      val lat = new Array[Double](dim)
      var d = 0
      while (d < dim) {
        // the EXACT fold order of the Column aggregate: ((0 + x₀p₀) +
        // x₁p₁) + … — bit-identity depends on it
        var acc = 0.0
        var i = 0
        while (i < vocabSize) { acc += raw(i) * proj(d)(i); i += 1 }
        lat(d) = acc
        d += 1
      }
      var sq = 0.0
      d = 0
      while (d < dim) { sq += lat(d) * lat(d); d += 1 }
      val nrm = math.max(math.sqrt(sq), 1e-12)
      d = 0
      while (d < dim) {
        lat(d) = BigDecimal(lat(d) / nrm)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        d += 1
      }
      lat
    }
    GraftVectorDB.ChannelDef(name, contentTypes, encode, encodeLocal, dim)
  }

  /** The driver twin of the Column tf-idf vector — tokenization is
    * THE shared [[VectorStore.tokensLocal]] (one definition of the
    * SQL trim/split semantics, not a third hand-maintained copy). */
  private def tfidfLocal(s: String, vocab: Array[String],
      vIdx: Map[String, Int], idf: Array[Double]): Array[Double] = {
    val raw = new Array[Double](vocab.length)
    VectorStore.tokensLocal(s).foreach { t =>
      vIdx.get(t).foreach(i => raw(i) += 1.0)
    }
    var i = 0
    while (i < vocab.length) { raw(i) *= idf(i); i += 1 }
    raw
  }
}
