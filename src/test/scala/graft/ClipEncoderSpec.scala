package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ClipEncoder, GraftVectorDB, VectorStore}

/** The cross-modal fitted channel (ClipEncoder): the reference's CLIP
  * two-tower shape (clip_base_image_embedder / clip_base_text_embedder,
  * vector_db.py:473-508) — ONE shared space for image payloads and
  * text queries, with the alignment LEARNED from (image, caption)
  * pairs rather than assumed. The fixture is real container bytes
  * (PNG/GIF/BMP/JPEG headers + synthetic bodies); held-out images
  * (content variants never seen in the fit) must land next to the text
  * of what they are, where the hash-family image channel scores at
  * chance. */
class ClipEncoderSpec extends AnyFunSuite {
  import SparkTestSession._

  private def be32(v: Long): Array[Byte] = Array((v >> 24).toByte,
    (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le16(v: Long): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Long): Array[Byte] = Array(v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)

  /** Deterministic pseudo-random body bytes — content varies per
    * (class, variant), so held-out variants have byte histograms the
    * fit never saw and the tower must learn the header GEOMETRY, not
    * memorize bodies. */
  private def body(seed: Long, n: Int): Array[Byte] = {
    var s = seed * 6364136223846793005L + 1442695040888963407L
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte
    }
  }

  private def makeImage(fmt: String, w: Int, h: Int, variant: Int): Array[Byte] = {
    val b = body(fmt.hashCode.toLong * 31 + w * 7 + h * 3 + variant,
      200 + ((w * 13 + h * 29 + variant * 101) % 200))
    fmt match {
      case "png" =>
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
          be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
          Array[Byte](8, 2, 0, 0, 0) ++ be32(0) ++ b
      case "gif" =>
        "GIF89a".getBytes("ISO-8859-1") ++ le16(w) ++ le16(h) ++
          Array[Byte](0, 0, 0) ++ b
      case "bmp" =>
        "BM".getBytes ++ le32(1000) ++ le32(0) ++ le32(54) ++
          le32(40) ++ le32(w) ++ le32(h) ++ b
      case "jpeg" =>
        Array[Byte](0xFF.toByte, 0xD8.toByte) ++
          Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 16) ++
          Array.fill[Byte](14)(0) ++
          Array[Byte](0xFF.toByte, 0xC0.toByte, 0, 17, 8) ++
          be32(h.toLong << 16 | w.toLong) ++ // SOF: height(2 BE) width(2 BE)
          Array.fill[Byte](10)(0) ++ b
    }
  }

  private val formats = Seq("png", "gif", "bmp", "jpeg")
  private val dims: Seq[(Int, Int)] =
    (0 until 16).map(k => (16 * (k + 1), 12 * (k + 2)))
  // 64 (format, dims) classes × 4 content variants; variant 3 of every
  // class is HELD OUT of the fit
  private case class Img(fmt: String, w: Int, h: Int, variant: Int) {
    val bytes: Array[Byte] = makeImage(fmt, w, h, variant)
    val b64: String = java.util.Base64.getEncoder.encodeToString(bytes)
    val caption: String = s"a ${w}x$h $fmt image"
  }
  private val all: Seq[Img] = for {
    f <- formats; (w, h) <- dims; v <- 0 until 4
  } yield Img(f, w, h, v)
  private val fitSet = all.filter(_.variant < 3)
  private val heldOut = all.filter(_.variant == 3)

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / math.max(1e-12, math.sqrt(a.map(x => x * x).sum) *
      math.sqrt(b.map(x => x * x).sum))
  }

  private lazy val clip = {
    import spark.implicits._
    ClipEncoder.fit(
      fitSet.map(_.b64).toDF("payload"), "payload", "clip", Seq("clip_img"),
      dim = 20, vocabSize = 64, hidden = 48, epochs = 150, seed = 7)
  }

  test("JPEG fixture bytes carry the declared SOF dimensions") {
    // the jpeg branch packs height/width into one be32 — pin that the
    // header walk reads back exactly (w, h) before anything fits on it
    val j = Img("jpeg", 208, 168, 0)
    assert(graft.functions.expressions.ImageHeader.decode(j.bytes)
      .contains(("jpeg", 208L, 168L)))
  }

  test("held-out images land next to the text of what they are; the hash family scores at chance") {
    // image → text direction: for every held-out image, the matching
    // class caption must be its nearest caption embedding
    val capEmb: Map[String, Array[Double]] =
      heldOut.map(i => i.caption -> clip.encodeLocal(i.caption)).toMap
    def recallAt1(embed: String => Array[Double],
        embedText: String => Array[Double]): Double = {
      val caps = heldOut.map(i => (i.caption, embedText(i.caption)))
      val hits = heldOut.count { img =>
        val e = embed(img.b64)
        caps.maxBy { case (_, ce) => cos(e, ce) }._1 == img.caption
      }
      hits.toDouble / heldOut.size
    }
    val clipRecall = recallAt1(clip.encodeLocal, c => capEmb(c))
    // the unlearned baseline this channel replaces: the salted hash
    // family embeds base64 payload tokens, which carry no relation to
    // the caption's tokens — chance-level retrieval (1/64 ≈ 0.016)
    val hashRecall = recallAt1(VectorStore.embedImageLocal,
      VectorStore.embedImageLocal)
    assert(clipRecall >= 0.9,
      f"held-out image→caption recall@1 must be strong, got $clipRecall%.3f")
    assert(hashRecall <= 0.2,
      f"sanity: the hash family should sit near chance, got $hashRecall%.3f")
    assert(clipRecall > hashRecall + 0.5,
      f"learned alignment must beat the hash family: $clipRecall%.3f vs $hashRecall%.3f")
    // text → image direction: a caption query's nearest held-out image
    // is one of its own class
    val imgEmb = heldOut.map(i => (i, clip.encodeLocal(i.b64)))
    val t2i = heldOut.map(_.caption).distinct.count { cap =>
      val qe = capEmb(cap)
      imgEmb.maxBy { case (_, e) => cos(qe, e) }._1.caption == cap
    }
    assert(t2i.toDouble / heldOut.size >= 0.9,
      s"text→image recall@1 must be strong, got $t2i/${heldOut.size}")
  }

  test("refit is bit-stable; encode/encodeLocal are bit-identical on payloads, captions, and junk") {
    import spark.implicits._
    val again = ClipEncoder.fit(
      fitSet.map(_.b64).toDF("payload"), "payload", "clip2", Seq("clip_img2"),
      dim = 20, vocabSize = 64, hidden = 48, epochs = 150, seed = 7)
    assert(again.encodeLocal(heldOut.head.b64).sameElements(
      clip.encodeLocal(heldOut.head.b64)), "refit must be bit-stable (image)")
    assert(again.encodeLocal("a 32x36 png image").sameElements(
      clip.encodeLocal("a 32x36 png image")), "refit must be bit-stable (text)")
    val samples = heldOut.take(6).map(_.b64) ++
      heldOut.take(3).map(_.caption) ++
      Seq("", "  not an image  ", "5b8733c1889f00aa",
        heldOut.head.b64.take(12)) // truncated base64: decodes, no header
    samples.foreach { s =>
      val inPlan = Seq(s).toDF("t").select(clip.encode($"t").as("v"))
        .head().getSeq[Double](0).toArray
      assert(inPlan.sameElements(clip.encodeLocal(s)),
        s"encode/encodeLocal diverge on: ${s.take(40)}")
    }
  }

  test("cross-modal serving end to end: text queries retrieve images through the registry") {
    import spark.implicits._
    val dbDir = "target/vdb_clip_spec"
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRf))
      f.delete()
    }
    rmRf(new java.io.File(dbDir))
    val db = new GraftVectorDB(spark, dbDir)
    db.registerChannel(clip)
    val recs = heldOut.map(i =>
        (s"img/${i.fmt}/${i.w}x${i.h}", i.fmt, 0L, s"${i.fmt}-${i.w}x${i.h}", i.b64))
      .toDF("doc_name", "doc_type", "page_num", "content_id", "content_raw")
      .withColumn("content_type", lit("clip_img"))
      .withColumn("embedding", clip.encode($"content_raw"))
      .withColumn("file_hash", md5($"content_raw"))
      .withColumn("ts", timestamp_micros(lit(0L)))
      .withColumn("bbox", array(lit(0.0), lit(0.0), lit(0.0), lit(0.0)))
    assert(db.ingestRecords(recs) == heldOut.size)
    db.buildAnnIndex(cells = 4, channel = "clip")
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("rnk"), r.getAs[Double]("sim_r"),
        r.getAs[String]("doc_name"), r.getAs[String]("content_id"))).toSeq
    Seq(("a 64x60 png image", "png-64x60"),
        ("a 192x156 jpeg image", "jpeg-192x156"),
        ("a 16x24 gif image", "gif-16x24")).foreach { case (q, want) =>
      val exact = db.searchIn("clip", q, 5).collect()
      assert(exact.head.getAs[String]("content_id") == want,
        s"'$q' must retrieve $want, got " +
          exact.map(_.getAs[String]("content_id")).mkString(", "))
      assert(key(db.searchAnnIn("clip", q, 5, nProbe = 4).collect()) == key(exact),
        s"full-probe ANN must equal the exact scan for '$q'")
    }
    // the PQ serving surface over the learned space: full probe +
    // full shortlist reproduces the exact scan (the LSA/SGNS contract)
    val n = spark.read.parquet(db.annPath("clip")).count().toInt
    val q = "a 64x60 png image"
    assert(key(db.searchAnnPqIn("clip", q, 5, nProbe = 4, shortlist = n)
      .collect()) == key(db.searchIn("clip", q, 5).collect()),
      "full-shortlist PQ over the clip space must equal its exact scan")
  }
}
