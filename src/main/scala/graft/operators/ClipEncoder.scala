package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.expressions.{ClipImageEncode, ClipImageModel, ImageHeaderMeta}

/** A corpus-FITTED **cross-modal** channel for the registry — the
  * two-tower shape of the reference's CLIP pair
  * (`clip_base_image_embedder` / `clip_base_text_embedder`,
  * vector_db.py:473-508): ONE shared d-dim space that image payloads
  * and text queries both embed into, so a text query scores images
  * directly (run_image_search, vector_db.py:738-759) instead of
  * detouring through caption rows in the text channel. This replaces
  * the image channel's salted hash family ([[VectorStore.embedImage]] —
  * deterministic but UNLEARNED: a payload's base64 tokens carry no
  * relation to what the image is) with a model whose parameters are
  * estimated from (image, caption) pairs:
  *
  *  - **text tower**: LSA over the caption corpus — vocabulary + idf
  *    from one distributed aggregation ([[TfidfEncoder.fitVocabIdf]]),
  *    latent basis from the bounded-sample Gram/kernel eigendecomposition
  *    ([[LsaEncoder]]'s primal/dual dispatch), served by the shared
  *    fused [[graft.functions.expressions.ProjectTfidf]] expression;
  *  - **image tower**: a small NEURAL network (one tanh hidden layer,
  *    trained by seeded sequential SGD — the [[SgnsEncoder]] bit-
  *    stability discipline) from byte-level payload features
  *    ([[ClipImageModel.features]]: real container-header fields +
  *    byte-distribution statistics, no image libs) DISTILLED onto the
  *    matching caption's text-tower embedding. Alignment is therefore
  *    learned, not assumed: a payload lands near the text of what it
  *    is because the network was fit to put it there.
  *
  * A real CLIP checkpoint drops into the same two ChannelDef functions
  * when a model runtime exists; everything downstream (ingest, index
  * build/append, exact/ANN/PQ search, delete, maintenance) is already
  * channel-generic.
  *
  * Fit shape (100 TB-safe): captions derive IN-PLAN from the payload
  * column (narrow, no shuffle), the vocabulary pass is the one
  * distributed aggregation every fitted channel pays, and ONE bounded
  * hash-ordered sample (≤ [[AnnIndex.SampleTarget]] pairs) feeds the
  * driver-side eigenbasis + SGD. Serving is per-row narrow work:
  * O(payload) features + a fixed-size forward pass for images,
  * the V-independent fused projection for text. */
object ClipEncoder {

  /** Fit a cross-modal channel over `images(payloadCol)` (base64
    * container payloads; rows whose header no parser reads are
    * excluded from the fit — they stay servable through the text
    * tower's deterministic fallback).
    *
    * @param dim       shared embedding width (≤ caption vocabulary)
    * @param vocabSize caption-vocabulary target (df-top, clamped to
    *                  what exists — caption vocabularies are small)
    * @param hidden    image-tower hidden width
    * @param epochs    SGD passes over the sample
    * @param seed      PRNG seed: init order + stream fixed → bit-stable
    */
  def fit(images: DataFrame, payloadCol: String, name: String,
      contentTypes: Seq[String], dim: Int = 48, vocabSize: Int = 512,
      hidden: Int = 48, epochs: Int = 60,
      seed: Long = 42L): GraftVectorDB.ChannelDef = {
    val spark = images.sparkSession
    import spark.implicits._
    val p = images.select(col(payloadCol).cast("string").as("p"))
      .filter($"p".isNotNull)
      .filter(ImageHeaderMeta($"p").isNotNull)
      .select($"p",
        GraftVectorDB.captionColumn("header-meta", $"p", md5($"p")).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (vocab, idf, sample) =
      try {
        val (_, v, w) = TfidfEncoder.fitVocabIdf(p, "c", vocabSize,
          "ClipEncoder.fit", requireFull = false)
        // bounded deterministic sample — the index-build idiom: the
        // SampleTarget pairs with the smallest payload hash
        val s: Array[(String, String)] = p
          .select(xxhash64($"p").as("k"), $"p", $"c")
          .orderBy($"k", $"p").limit(AnnIndex.SampleTarget.toInt)
          .collect().map(r => (r.getString(1), r.getString(2)))
        (v, w, s)
      } finally p.unpersist(blocking = false)
    require(sample.nonEmpty,
      "ClipEncoder.fit: no readable image payloads to fit on")
    val vEff = vocab.length
    require(dim <= vEff,
      s"ClipEncoder.fit: dim $dim exceeds the caption corpus's $vEff distinct tokens")
    val vIdx = vocab.zipWithIndex.toMap
    val captions = sample.map(_._2)
    val projT =
      if (vEff <= LsaEncoder.DriverGramVocab)
        LsaEncoder.primalProj(captions, vocab, vIdx, idf, dim, vEff)
      else LsaEncoder.dualProj(captions, vocab, vIdx, idf, dim, vEff)
    // the text tower IS a fitted projection channel — the shared
    // serving pair (fused in-plan expression + bit-identical local fold)
    val textDef = ProjectionEncoder.channel(name, contentTypes, vocab, idf,
      projT, dim)
    // distillation targets: each sampled image's caption, embedded by
    // the text tower it will be served against (unit-norm, 6dp grid)
    val targets: Array[Array[Double]] = captions.map(textDef.encodeLocal)
    val feats: Array[Array[Double]] = sample.map { case (payload, _) =>
      ClipImageModel.sniff(payload) match {
        case Some((bytes, f, w, h)) => ClipImageModel.features(bytes, f, w, h)
        case None => throw new IllegalStateException(
          "ClipEncoder.fit: sampled payload lost its header between passes")
      }
    }
    val model = trainImageTower(feats, targets, dim, hidden, epochs, seed)
    // ONE image decode per row: ClipImageEncode itself returns null on
    // payloads without a readable image header, so coalesce routes
    // text rows to the text tower without a second header walk (the
    // when(ImageHeaderMeta…) guard decoded every payload twice)
    def encode(c: Column): Column =
      coalesce(ClipImageEncode(c, model), textDef.encode(c))
    def encodeLocal(s: String): Array[Double] =
      ClipImageModel.sniff(s) match {
        case Some((bytes, f, w, h)) => model.embed(bytes, f, w, h)
        case None => textDef.encodeLocal(s)
      }
    GraftVectorDB.ChannelDef(name, contentTypes, encode, encodeLocal, dim)
  }

  /** Seeded sequential SGD on the one-hidden-layer tower — MSE of the
    * RAW output against the unit-norm caption targets (serving
    * normalizes, so fitting the direction is what matters; MSE to a
    * unit target fits direction and discourages collapse). Fixed init
    * order, fixed visit order, no parallelism → bit-stable refits. */
  private[operators] def trainImageTower(feats: Array[Array[Double]],
      targets: Array[Array[Double]], dim: Int, hidden: Int, epochs: Int,
      seed: Long): ClipImageModel = {
    val p = ClipImageModel.P
    val rng = new java.util.SplittableRandom(seed)
    // Xavier-uniform init, drawn in a fixed row-major order
    val s1 = math.sqrt(6.0 / (p + hidden))
    val w1 = Array.tabulate(hidden)(_ =>
      Array.fill(p)((rng.nextDouble() * 2 - 1) * s1))
    val b1 = new Array[Double](hidden)
    val s2 = math.sqrt(6.0 / (hidden + dim))
    val w2 = Array.tabulate(dim)(_ =>
      Array.fill(hidden)((rng.nextDouble() * 2 - 1) * s2))
    val b2 = new Array[Double](dim)
    val n = feats.length
    val total = n.toLong * epochs
    val lr0 = 0.05
    var seen = 0L
    var e = 0
    while (e < epochs) {
      var a = 0
      while (a < n) {
        val lr = math.max(lr0 * (1.0 - seen.toDouble / total), lr0 * 1e-2)
        val x = feats(a)
        val z = targets(a)
        // forward
        val hid = new Array[Double](hidden)
        var j = 0
        while (j < hidden) {
          var acc = b1(j)
          val row = w1(j)
          var i = 0
          while (i < p) { acc += row(i) * x(i); i += 1 }
          hid(j) = math.tanh(acc)
          j += 1
        }
        val out = new Array[Double](dim)
        var d = 0
        while (d < dim) {
          var acc = b2(d)
          val row = w2(d)
          j = 0
          while (j < hidden) { acc += row(j) * hid(j); j += 1 }
          out(d) = acc
          d += 1
        }
        // backward: dL/dout = (out - z), hidden grads through tanh'
        val dHid = new Array[Double](hidden)
        d = 0
        while (d < dim) {
          val g = (out(d) - z(d)) * lr
          if (g != 0.0) {
            val row = w2(d)
            j = 0
            while (j < hidden) {
              dHid(j) += (out(d) - z(d)) * row(j)
              row(j) -= g * hid(j)
              j += 1
            }
            b2(d) -= g
          }
          d += 1
        }
        j = 0
        while (j < hidden) {
          val g = dHid(j) * (1.0 - hid(j) * hid(j)) * lr
          if (g != 0.0) {
            val row = w1(j)
            var i = 0
            while (i < p) { row(i) -= g * x(i); i += 1 }
            b1(j) -= g
          }
          j += 1
        }
        seen += 1
        a += 1
      }
      e += 1
    }
    ClipImageModel(w1, b1, w2, b2)
  }
}
