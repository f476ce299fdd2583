package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * runtime exists; it drops into the same two ChannelDef functions
  * (as does [[SgnsEncoder]], the trained-in-repo neural step).
  *
  * Fit shape (100 TB-safe): a narrow null-filtered text projection is
  * persisted once and backs the count, the vocabulary aggregation
  * (the [[TfidfEncoder.fitVocabIdf]] shared definition — deterministic
  * ties), and ONE bounded hash-ordered sample job
  * (≤ [[AnnIndex.SampleTarget]] docs — the index-build sampling
  * idiom). Up to [[DriverGramVocab]] terms the sample feeds a
  * driver-local V×V Gram whose top-k eigenbasis (LAPACK `eigSym` via
  * breeze — deterministic, no ARPACK restarts) is the projection.
  * PAST that bound the V² Gram never materializes ANYWHERE: the DUAL
  * fit eigendecomposes the n×n sample kernel K = X·Xᵀ instead
  * (n ≤ SampleTarget — BOUNDED driver state regardless of V) and maps
  * each kernel eigenvector u back to the term space as v = Xᵀu/√λ,
  * which is exactly the corresponding eigenvector of the V×V Gram
  * (XᵀX·v = λ·v) — the same truncated SVD, O(n²) memory instead of
  * O(V²), the round-9 "distribute the Gram past the driver bound"
  * item answered by REMOVING the V² object rather than sharding it.
  * Both paths sign-CANONICALIZE each component (largest-|entry| made
  * positive, first index on ties) so refits are bit-stable and the
  * two paths agree on the same data.
  *
  * Serving is the shared [[ProjectionEncoder]] pair: a fused native
  * expression in-plan (O(len + nnz·dim) per doc — V-independent) and
  * the bit-identical driver fold. [[fitAdaptive]] derives V from the
  * corpus row count (footer-stat metadata, the dd_embed_lsha idiom):
  * Heaps'-law-shaped 8·√N growth clamped to [256, 65536] and to the
  * corpus's actual distinct-token count. */
object LsaEncoder {

  /** Past this vocabulary size the primal fit's V×V driver Gram
    * (8·V² bytes — 128 MB at 4096, 2 GB at 16384) gives way to the
    * dual n×n kernel fit (n ≤ [[AnnIndex.SampleTarget]], ≤ 32 MB
    * always). */
  val DriverGramVocab = 1024

  /** Footer-stat-adaptive vocabulary target for a corpus of `n` docs:
    * vocabulary grows sublinearly with corpus size (Heaps' law), so
    * 8·√N — 4096 at ~262 k docs, the 65536 cap from ~67 M docs on. */
  def adaptiveVocab(n: Long): Int =
    math.max(256, math.min(65536, 8 * math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Fit an LSA channel: `vocabSize` df-top terms, `dim` latent
    * components (dim ≤ vocabSize; the dual path additionally needs
    * dim ≤ sample rank, enforced loudly). */
  def fit(texts: DataFrame, textCol: String, name: String,
      contentTypes: Seq[String], dim: Int = 64,
      vocabSize: Int = 256): GraftVectorDB.ChannelDef =
    fitPath(texts, textCol, name, contentTypes, dim, vocabSize,
      forceDual = false)

  /** [[fit]] with the vocabulary sized from corpus statistics:
    * [[adaptiveVocab]] of the row count, clamped to the corpus's
    * distinct-token count (a corpus with 3 k distinct tokens cannot
    * carry a 4096-term vocabulary). */
  def fitAdaptive(texts: DataFrame, textCol: String, name: String,
      contentTypes: Seq[String], dim: Int = 64): GraftVectorDB.ChannelDef = {
    // no separate distinct-token pass: the vocabulary aggregation's
    // own `limit` clamps the target to whatever vocabulary exists
    // (fitVocabIdf requireFull = false), so the adaptive fit costs the
    // same corpus passes as the fixed-V fit
    fitPath(texts, textCol, name, contentTypes, dim,
      adaptiveVocab(texts.count()), forceDual = false, requireFull = false)
  }

  private[graft] def fitPath(texts: DataFrame, textCol: String,
      name: String, contentTypes: Seq[String], dim: Int, vocabSize: Int,
      forceDual: Boolean, requireFull: Boolean = true): GraftVectorDB.ChannelDef = {
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
        val (_, v, w) = TfidfEncoder.fitVocabIdf(t, "t", vocabSize,
          "LsaEncoder.fit", requireFull)
        // bounded deterministic sample: the SampleTarget texts with the
        // smallest xxhash64, re-sorted by key (the sampleVectors contract)
        val s: Array[String] = t
          .select(xxhash64($"t").as("k"), $"t")
          .orderBy($"k", $"t").limit(AnnIndex.SampleTarget.toInt)
          .collect().map(_.getString(1))
        (v, w, s)
      } finally t.unpersist(blocking = false)
    // the CLAMPED vocabulary (adaptive fits on small-vocab corpora)
    val vEff = vocab.length
    require(dim <= vEff,
      s"LsaEncoder.fit: dim $dim exceeds the corpus's $vEff distinct tokens")
    val vIdx = vocab.zipWithIndex.toMap
    val proj =
      if (vEff <= DriverGramVocab && !forceDual)
        primalProj(sample, vocab, vIdx, idf, dim, vEff)
      else dualProj(sample, vocab, vIdx, idf, dim, vEff)
    ProjectionEncoder.channel(name, contentTypes, vocab, idf, proj, dim)
  }

  /** The small-V fit: accumulate the V×V Gram XᵀX on the driver, take
    * its top-k eigenbasis (LAPACK dsyevd — eigenvalues ascend, so the
    * LAST k columns). */
  private[operators] def primalProj(sample: Array[String], vocab: Array[String],
      vIdx: Map[String, Int], idf: Array[Double], dim: Int,
      vocabSize: Int): Array[Array[Double]] = {
    val gram = Array.ofDim[Double](vocabSize, vocabSize)
    sample.foreach { s =>
      val raw = ProjectionEncoder.tfidfLocal(s, vocab, vIdx, idf)
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
    val eig = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix(vocabSize, vocabSize, gram.flatten))
    Array.tabulate(dim) { d =>
      val colIdx = vocabSize - 1 - d // descending eigenvalue order
      canonicalize(Array.tabulate(vocabSize)(r => eig.eigenvectors(r, colIdx)))
    }
  }

  /** The large-V fit: eigendecompose the n×n sample kernel K = X·Xᵀ
    * (sparse dot products over sorted term indices), then map each
    * top eigenpair (λ, u) to the term space as v = Xᵀu/√λ — the V×V
    * Gram's eigenvector with the same eigenvalue, never materializing
    * anything V×V. All loops sequential in sample order → bit-stable
    * refits. */
  private[operators] def dualProj(sample: Array[String], vocab: Array[String],
      vIdx: Map[String, Int], idf: Array[Double], dim: Int,
      vocabSize: Int): Array[Array[Double]] = {
    val n = sample.length
    require(dim <= n,
      s"LsaEncoder.fit (dual): dim $dim exceeds the $n-doc sample")
    // sparse per-doc tf-idf: ascending term indices + weights
    val docIdx = new Array[Array[Int]](n)
    val docVal = new Array[Array[Double]](n)
    var a = 0
    while (a < n) {
      val raw = ProjectionEncoder.tfidfLocal(sample(a), vocab, vIdx, idf)
      var nnz = 0
      var i = 0
      while (i < vocabSize) { if (raw(i) != 0.0) nnz += 1; i += 1 }
      val ix = new Array[Int](nnz)
      val vx = new Array[Double](nnz)
      var k = 0
      i = 0
      while (i < vocabSize) {
        if (raw(i) != 0.0) { ix(k) = i; vx(k) = raw(i); k += 1 }
        i += 1
      }
      docIdx(a) = ix; docVal(a) = vx
      a += 1
    }
    val kern = Array.ofDim[Double](n, n)
    a = 0
    while (a < n) {
      var b = a
      while (b < n) {
        // two-pointer sparse dot over the sorted index arrays
        val ia = docIdx(a); val va = docVal(a)
        val ib = docIdx(b); val vb = docVal(b)
        var p = 0; var q = 0
        var dot = 0.0
        while (p < ia.length && q < ib.length) {
          if (ia(p) == ib(q)) { dot += va(p) * vb(q); p += 1; q += 1 }
          else if (ia(p) < ib(q)) p += 1
          else q += 1
        }
        kern(a)(b) = dot; kern(b)(a) = dot
        b += 1
      }
      a += 1
    }
    val eig = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix(n, n, kern.flatten))
    Array.tabulate(dim) { d =>
      val colIdx = n - 1 - d // descending eigenvalue order
      val lambda = eig.eigenvalues(colIdx)
      // a non-positive (to numerical tolerance) eigenvalue means the
      // sample's rank is below the requested dim: the component is
      // meaningless noise — fail loudly, don't serve garbage geometry
      require(lambda > 1e-9 * math.max(1.0, eig.eigenvalues(n - 1)),
        s"LsaEncoder.fit (dual): sample rank < dim (component $d has " +
          f"eigenvalue $lambda%.3g)")
      val scale = 1.0 / math.sqrt(lambda)
      val v = new Array[Double](vocabSize)
      var doc = 0
      while (doc < n) {
        val u = eig.eigenvectors(doc, colIdx)
        if (u != 0.0) {
          val ix = docIdx(doc); val vx = docVal(doc)
          var k = 0
          while (k < ix.length) { v(ix(k)) += u * vx(k); k += 1 }
        }
        doc += 1
      }
      var i = 0
      while (i < vocabSize) { v(i) *= scale; i += 1 }
      canonicalize(v)
    }
  }

  /** Sign canonicalization — largest-|entry| component made positive,
    * first index on ties: refits (and the two fit paths) must be
    * bit-stable. */
  private def canonicalize(v: Array[Double]): Array[Double] = {
    var best = 0
    var k = 1
    while (k < v.length) {
      if (math.abs(v(k)) > math.abs(v(best))) best = k
      k += 1
    }
    if (v(best) < 0) v.map(x => -x) else v
  }
}
