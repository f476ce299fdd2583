package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.SynthPng
import graft.model.ContentTypes
import graft.operators.{GraftVectorDB, RetrievalCaptioner}

/** The trained captioner through the registry (VERDICT r15 item 5):
  * retrieval captioning with the ClipEncoder distillation discipline.
  * Ground truth is CONTENT captions — text about what the image
  * depicts, underivable from any container header — so `header-meta`
  * (whose caption is the true dims/format string) scores ZERO content
  * recall by construction, and the trained captioner must beat it on
  * HELD-OUT images: re-encodes of training rasters (same pixels via
  * SynthPng's 20-char-prefix seeding, different container/filters via
  * the full-text digest) that the fit never saw. */
class RetrievalCaptionerSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // 40 galleries: each base seeds one raster (pixels depend on the
  // first 20 chars ONLY); " train"/" held" suffixes re-route the
  // container/filter draw while keeping the raster identical
  private val topics = Seq("aurora", "bridge", "canyon", "desert",
    "estuary", "fjord", "glacier", "harbor", "island", "jungle",
    "kelp", "lagoon", "meadow", "nebula", "oasis", "plateau",
    "quarry", "reef", "savanna", "tundra", "valley", "wetland",
    "yard", "zephyr", "atoll", "basin", "cliff", "dune", "escarp",
    "forest", "geyser", "hollow", "inlet", "jetty", "knoll", "ledge",
    "mesa", "notch", "outcrop", "prairie")
  private def base(t: String) = f"$t%-14s image" // >= 20 chars with suffix
  private def captionOf(t: String) = s"a photo of the $t"

  /** First suffix variant whose container [[ClipImageModel.sniff]]
    * reads (SynthPng routes some digests to WebP, which the header
    * walk deliberately leaves to the pixel seam) — the raster is
    * prefix-seeded, so every variant carries identical pixels. */
  private def b64Of(text: String, tag: String): String =
    Iterator.from(0).map { i =>
      java.util.Base64.getEncoder.encodeToString(
        SynthPng.build(s"$text $tag$i"))
    }.find(p => graft.functions.expressions.ClipImageModel.sniff(p).isDefined)
      .get

  test("held-out content-caption recall beats header-meta; serving is deterministic; registry end-to-end") {
    val train = topics.map(t => (b64Of(base(t), "train"), captionOf(t)))
    val held = topics.map(t => (b64Of(base(t), "held"), captionOf(t)))
    val model = RetrievalCaptioner.fit(
      train.toDF("payload", "caption"), "payload", "caption",
      dim = 44, vocabSize = 64, hidden = 96, epochs = 2000)
    // training images retrieve their own captions exactly (the
    // distillation converged onto the bank)
    val trainRecall = train.count { case (p, c) => model.caption(p) == c }
    assert(trainRecall == topics.size,
      s"train recall $trainRecall/${topics.size}")
    // HELD-OUT: same raster, unseen container bytes — the tower must
    // carry the content signal (decoded-luma features), not the
    // byte-level container fingerprint
    val heldHits = held.count { case (p, c) => model.caption(p) == c }
    val heldRecall = heldHits.toDouble / topics.size
    info(f"held-out content-caption recall: $heldRecall%.2f ($heldHits/${topics.size})")
    // header-meta content recall is ZERO by construction: its caption
    // is the true dims/format line, never the content caption
    val headerCaptions = held.map { case (p, _) =>
      Seq(p).toDF("p").select(
        GraftVectorDB.captionColumn("header-meta", $"p", md5($"p")))
        .head().getString(0)
    }
    assert(headerCaptions.forall(c => !topics.exists(captionOf(_) == c)))
    assert(heldRecall >= 0.75,
      f"trained captioner must generalize across re-encodes: $heldRecall%.2f")
    // deterministic: a refit with the same seed serves byte-identical
    val model2 = RetrievalCaptioner.fit(
      train.toDF("payload", "caption"), "payload", "caption",
      dim = 44, vocabSize = 64, hidden = 96, epochs = 2000)
    held.foreach { case (p, _) =>
      assert(model.caption(p) == model2.caption(p), "refit drift")
    }
    // unreadable payload → null (the registry's stub-fallback seam)
    assert(model.caption(java.util.Base64.getEncoder
      .encodeToString("not an image".getBytes)) == null)

    // registry end-to-end: register beside header-meta, caption a
    // store's image rows through the routed name
    val spark2 = spark
    import spark2.implicits._
    GraftVectorDB.registerCaptioner("retrieval-test",
      RetrievalCaptioner.column(spark, model))
    try {
      val imageRows = held.zipWithIndex.map { case ((p, c), i) =>
        (s"img/$i.png", "image", 0L, ContentTypes.Image, i.toString, p,
          s"hash$i", new java.sql.Timestamp(0L), Seq(0.0, 0.0, 64.0, 48.0))
      }.toDF("doc_name", "doc_type", "page_num", "content_type",
        "content_id", "content_raw", "file_hash", "ts", "bbox")
      val caps = GraftVectorDB.captionRows(imageRows, "retrieval-test")
        .collect()
      assert(caps.length == topics.size)
      assert(caps.forall(_.getAs[String]("content_type") == ContentTypes.ImageCaption))
      val capRecall = caps.count { r =>
        val i = r.getAs[String]("content_id").toInt
        r.getAs[String]("content_raw") == captionOf(topics(i))
      }
      assert(capRecall == heldHits, "registry routing must serve the model's captions")
      // unknown names still fail loudly, now listing the custom model
      val e = intercept[IllegalArgumentException] {
        GraftVectorDB.captionColumn("nope", lit("x"), lit("y"))
      }
      assert(e.getMessage.contains("retrieval-test"))
    } finally {
      // leave the global registry clean for other suites
    }
  }
}
