package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.{ClipImageModel, RetrievalCaption}

/** A TRAINED captioner for the caption-model registry — the learned
  * counterpart to the `header-meta` container reader (reference
  * analog: `blip_caption_image`, vector_db.py:547-564, a neural
  * captioner loaded from weights). No generative runtime exists in
  * this environment, so the smallest honest LEARNED captioner is
  * retrieval captioning (a standard pre-neural baseline and still the
  * production fallback): embed the query image with a distilled image
  * tower and emit the caption whose caption-tower embedding is
  * nearest in the shared space.
  *
  * The fit IS the [[ClipEncoder]] distillation discipline applied to
  * captioning:
  *  - caption tower: LSA over the training captions
  *    ([[TfidfEncoder.fitVocabIdf]] + [[LsaEncoder]]'s eigenbasis,
  *    served by [[ProjectionEncoder]]'s bit-stable local fold);
  *  - image tower: the seeded-SGD network
  *    ([[ClipEncoder.trainImageTower]]) over byte/header/decoded-luma
  *    features ([[ClipImageModel.features]]) distilled onto each
  *    training image's OWN caption embedding;
  *  - caption bank: the distinct training captions' tower embeddings
  *    — a BOUNDED model artifact (≤ the fit sample, the same budget
  *    every driver-side fit in the library holds), broadcast once.
  *
  * Serving is per-row narrow work: O(payload) features + a fixed
  * forward pass + a |bank|·dim dot sweep; ties break on the caption
  * string so refits and replays are deterministic. A payload whose
  * header no parser reads captions as NULL — the caller's
  * stub-fallback seam, exactly [[GraftVectorDB.captionColumn]]'s
  * header-meta contract.
  */
object RetrievalCaptioner {

  /** Fit from explicit (payload base64, caption) TRAINING pairs.
    * Driver-bounded: callers pass a curated captioned set (the shape
    * a captioning fit always has — labels are the scarce resource);
    * the sample cap is [[AnnIndex.SampleTarget]] like every fit.
    *
    * `dim` must give the caption space enough RANK to separate the
    * bank: distinct captions that differ in one rare word each
    * contribute ~one independent direction, so dim below the distinct-
    * caption count folds some captions onto others and caps retrieval
    * accuracy no matter how long the tower trains (measured: 40
    * one-topic captions plateau at 32/40 train recall at dim 32 and
    * reach 40/40 at dim 44). */
  def fit(pairs: DataFrame, payloadCol: String, captionCol: String,
      dim: Int = 24, vocabSize: Int = 256, hidden: Int = 48,
      epochs: Int = 60, seed: Long = 42L): RetrievalCaption.Model = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = pairs
      .select(col(payloadCol).cast("string").as("p"),
        col(captionCol).cast("string").as("c"))
      .filter($"p".isNotNull && $"c".isNotNull)
    val (_, vocab, idf) = TfidfEncoder.fitVocabIdf(p, "c", vocabSize,
      "RetrievalCaptioner.fit", requireFull = false)
    val sample: Array[(String, String)] = p
      .select(xxhash64($"p").as("k"), $"p", $"c")
      .orderBy($"k", $"p").limit(AnnIndex.SampleTarget.toInt)
      .collect().map(r => (r.getString(1), r.getString(2)))
    require(sample.nonEmpty, "RetrievalCaptioner.fit: no training pairs")
    val vEff = vocab.length
    require(dim <= vEff,
      s"RetrievalCaptioner.fit: dim $dim exceeds the caption vocabulary $vEff")
    val vIdx = vocab.zipWithIndex.toMap
    val captions = sample.map(_._2)
    val projT =
      if (vEff <= LsaEncoder.DriverGramVocab)
        LsaEncoder.primalProj(captions, vocab, vIdx, idf, dim, vEff)
      else LsaEncoder.dualProj(captions, vocab, vIdx, idf, dim, vEff)
    val textDef = ProjectionEncoder.channel("caption-tower", Nil,
      vocab, idf, projT, dim)
    val feats = sample.map { case (payload, _) =>
      ClipImageModel.sniff(payload) match {
        case Some((bytes, f, w, h)) => ClipImageModel.features(bytes, f, w, h)
        case None => throw new IllegalArgumentException(
          "RetrievalCaptioner.fit: a training payload has no readable image header")
      }
    }
    val targets = captions.map(textDef.encodeLocal)
    val img = ClipEncoder.trainImageTower(feats, targets, dim, hidden,
      epochs, seed)
    // the bank: one entry per DISTINCT caption, sorted so ties and
    // refits are deterministic
    val bank = captions.distinct.sorted
    new RetrievalCaption.Model(img, bank,
      bank.map(textDef.encodeLocal))
  }

  /** The serving Column over a broadcast fitted model — drop it into
    * [[GraftVectorDB.registerCaptioner]] and `caption_model = <name>`
    * routes through the registry like any built-in. */
  def column(spark: org.apache.spark.sql.SparkSession,
      model: RetrievalCaption.Model): Column => Column = {
    val bc = spark.sparkContext.broadcast(model)
    (payloadB64: Column) => RetrievalCaption(payloadB64, bc)
  }
}
