package graft.tools

import org.apache.spark.sql.functions._

/** Cross-modal channel scale probe (round 11): fit [[graft.operators
  * .ClipEncoder]] on a synthetic image corpus (REAL container headers
  * over an 8×8 dims grid × 3 formats, pseudo-random bodies) three
  * orders of magnitude past the spec plant, then time a warm
  * full-corpus in-plan encode pass through the fused ClipImageEncode
  * expression and measure held-out cross-modal recall@1 on images with
  * bodies the fit never saw. Prints one JSON line — the scale evidence
  * the fitted-channel entries carry (the EncoderProbe idiom). */
object ClipProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "clip-probe")
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[T](tag: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[clip-probe] $tag: $s%.2f s")
      (r, s)
    }
    val imgs = spark.range(n).map(id => ClipProbe.payload(id)).toDF("payload")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[clip-probe] corpus ${imgs.count()} synthetic images " +
      "(png/gif/bmp over an 8x8 dims grid)")
    // dim 64 ≥ the caption space's ~67 informative directions (64 dims
    // tokens + 3 formats), so class separation survives the latent cut
    val (clip, fitSec) = time("ClipEncoder.fit(dim=64)")(
      graft.operators.ClipEncoder.fit(imgs, "payload", "clip", Seq("image"),
        dim = 64, vocabSize = 128))
    // warm full-corpus in-plan encode — the image-ingest cost at scale
    imgs.limit(100).select(clip.encode($"payload")).collect()
    val (_, encSec) = time("full-corpus in-plan encode") {
      imgs.select(clip.encode($"payload").as("v"))
        .select(sum(element_at($"v", 1))).head().getDouble(0)
    }
    // held-out cross-modal recall@1: 64 UNSEEN images (ids past the
    // corpus → unseen bodies, the spec's discipline) against the 64
    // distinct captions of their grid row
    val held = (0L until 64L).map(k => n + k * 65L) // spread across the grid
    val caps = held.map(id => ClipProbe.caption(id))
    val capEmb = caps.map(clip.encodeLocal)
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val hits = held.zipWithIndex.count { case (id, i) =>
      val e = clip.encodeLocal(ClipProbe.payload(id))
      capEmb.indices.maxBy(j => cos(e, capEmb(j))) == i
    }
    val recall = hits.toDouble / held.size
    println(f"[clip-probe] held-out cross-modal recall@1 = $recall%.3f")
    println(s"""{"metric":"clip_probe","images":$n,""" +
      f""""fit_sec":$fitSec%.2f,"encode_sec":$encSec%.2f,""" +
      f""""images_per_sec":${n / encSec}%.0f,"heldout_recall_at_1":$recall%.3f}""")
    spark.stop()
  }

  /** Deterministic synthetic image: format id%3, dims from an 8×8
    * grid, 256 pseudo-random body bytes seeded by id. */
  def payload(id: Long): String =
    java.util.Base64.getEncoder.encodeToString(bytes(id))

  def caption(id: Long): String = {
    val (w, h) = dims(id)
    val fmt = Seq("png", "gif", "bmp")((id % 3).toInt)
    s"a ${w}x$h $fmt image"
  }

  private def dims(id: Long): (Long, Long) =
    (16L * (1 + id % 8), 12L * (2 + (id / 8) % 8))

  private def bytes(id: Long): Array[Byte] = {
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def le16(v: Long) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    val (w, h) = dims(id)
    var s = id * 6364136223846793005L + 1442695040888963407L
    val body = Array.fill(256) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte
    }
    (id % 3) match {
      case 0 =>
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
          be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
          Array[Byte](8, 2, 0, 0, 0) ++ be32(0) ++ body
      case 1 =>
        "GIF89a".getBytes("ISO-8859-1") ++ le16(w) ++ le16(h) ++
          Array[Byte](0, 0, 0) ++ body
      case _ =>
        "BM".getBytes ++ le32(1000) ++ le32(0) ++ le32(54) ++
          le32(40) ++ le32(w) ++ le32(h) ++ body
    }
  }
}
