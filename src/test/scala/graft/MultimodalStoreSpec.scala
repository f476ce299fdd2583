package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.ContentTypes
import graft.operators.GraftVectorDB

/** The image channel end-to-end: image records + their caption rows
  * ingest together; multimodal search hits the image store and the
  * captions surface through the text channel — the reference's
  * caption-into-text-store flow (vector_db.py:310-341). */
class MultimodalStoreSpec extends AnyFunSuite {
  import SparkTestSession._

  test("image + caption rows flow through multimodal search") {
    val dir = "target/vdb_mm"
    val f = new java.io.File(s"$dir/vector_store")
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete()
    }
    if (f.exists()) rm(f)

    val db = new GraftVectorDB(spark, dir)
    val docs = Tables.load(spark, sf, "documents")
    assert(db.ingest(docs.filter(col("doc_id") < 100)) > 0)

    // fabricate an image batch from disjoint docs: same record schema,
    // re-embedded into the image space; captions ride along in the same
    // append so the shared file_hash isn't seen as already-processed
    val img = GraftVectorDB.toImageChannel(
      GraftVectorDB.pipeline(docs.filter(col("doc_id") >= 400))
        .filter(col("page_num") === 0))
    val appended = db.ingestRecords(img.unionByName(GraftVectorDB.captionRows(img)))
    assert(appended > 0)

    val multi = db.searchMultimodal("captioned content", topN = 3).collect()
    assert(multi.exists(_.getAs[String]("channel") == "image"),
      "image channel must return hits")
    val text = db.search("captioned content", topN = 5).collect()
    assert(text.exists(_.getAs[String]("content_type") == ContentTypes.ImageCaption),
      "caption rows must be searchable in the text channel")

    // image-vs-image mode: the query encodes straight into the image
    // space, so an image row's own content ranks first with sim 1.0
    val probe = db.store.filter(col("content_type") === ContentTypes.Image)
      .select("content_raw").head().getString(0)
    val byImage = db.searchImage(probe, topN = 3).collect()
    assert(byImage.nonEmpty)
    assert(byImage.forall(_.getAs[String]("content_type") == ContentTypes.Image))
    assert(byImage.head.getAs[Double]("sim_r") == 1.0,
      "self-query must rank first at sim 1.0")

    // image-channel ANN index: full probe reproduces the exact image
    // scan verbatim (the text-channel twin is covered in
    // GraftVectorDBSpec); partial probe still finds the self-hit
    val cells = 4
    assert(db.buildAnnIndex(cells, channel = "image") ==
      db.store.filter(col("content_type") === ContentTypes.Image).count())
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("rnk"), r.getAs[Double]("sim_r"), r.getAs[String]("doc_name")))
    assert(key(db.searchAnnImage(probe, topN = 3, nProbe = cells).collect())
      .sameElements(key(byImage)))
    val pruned = db.searchAnnImage(probe, topN = 3, nProbe = 1).collect()
    assert(pruned.head.getAs[Double]("sim_r") == 1.0,
      "the self-hit's cell is the query's own nearest cell")

    // IVF+PQ on the 48-dim image space: the codebooks adapt to the
    // channel dim (12 subspaces of 4), and the exhaustive config
    // (every cell probed, channel-sized shortlist) reproduces the
    // exact image scan verbatim — the dim-generic twin of
    // GraftVectorDBSpec's 64-dim text-channel proof
    val imgRows = spark.read.parquet(db.annPath("image")).count().toInt
    assert(key(db.searchAnnPqImage(probe, topN = 3, nProbe = cells,
        shortlist = imgRows).collect())
      .sameElements(key(byImage)))

    // location-filtered ANN parity on the IMAGE channel: full probe +
    // get_search_range scope reproduces the filtered exact image scan
    // (the text-channel twin lives in GraftVectorDBSpec)
    val someDoc = db.store.filter(col("content_type") === ContentTypes.Image)
      .select("doc_name").head().getString(0)
    val locPrefix = someDoc.substring(0, someDoc.lastIndexOf('/') + 1)
    val exactLoc = key(db.searchImage(probe, topN = 3,
      location = Some(locPrefix)).collect())
    assert(exactLoc.nonEmpty)
    assert(key(db.searchAnnImage(probe, topN = 3, nProbe = cells,
        location = Some(locPrefix)).collect()).sameElements(exactLoc))
    assert(key(db.searchAnnPqImage(probe, topN = 3, nProbe = cells,
        shortlist = imgRows, location = Some(locPrefix)).collect())
      .sameElements(exactLoc))

    // batch image search: searchAll on the image channel == N × searchImage,
    // and searchAllAnn's image twin == N × searchAnnImage
    import spark.implicits._
    val probes = db.store.filter(col("content_raw").isNotNull)
      .filter(col("content_type") === ContentTypes.Image)
      .select("content_raw").limit(2).collect().map(_.getString(0))
    val queries = probes.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toSeq.toDF("q_id", "q_text")
    def key2(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("rnk"), r.getAs[Double]("sim_r"),
        r.getAs[String]("doc_name"), r.getAs[String]("content_id"))
    val batch = db.searchAll(queries, topN = 3, channel = "image")
      .collect().groupBy(_.getAs[Long]("q_id"))
    val batchAnn = db.searchAllAnn(queries, topN = 3, nProbe = cells,
      channel = "image").collect().groupBy(_.getAs[Long]("q_id"))
    probes.zipWithIndex.foreach { case (t, i) =>
      assert(batch(i.toLong).map(key2).toSeq ==
        db.searchImage(t, topN = 3).collect().map(key2).toSeq)
      assert(batchAnn(i.toLong).map(key2).toSeq ==
        db.searchAnnImage(t, topN = 3, nProbe = cells).collect().map(key2).toSeq)
    }
  }

  test("searchAllMultimodal: N queries, both channels, 2 scans, parity with N x searchMultimodal") {
    import spark.implicits._
    val db = new GraftVectorDB(spark, "target/vdb_mm") // store from the suite's first test
    val texts = Seq("captioned content", "fast query join table", "hash vector stream")
    val queries = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("q_id", "q_text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("channel"), r.getAs[Long]("rnk"), r.getAs[Double]("sim_r"),
        r.getAs[String]("doc_name"), r.getAs[String]("content_id"))
    val batch = db.searchAllMultimodal(queries, topN = 3)
      .collect().groupBy(_.getAs[Long]("q_id"))
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(batch(i.toLong).map(key).toSeq ==
        db.searchMultimodal(t, topN = 3).collect().map(key).toSeq,
        s"batch multimodal results for '$t' must match searchMultimodal")
    }
    // both channels actually answered
    assert(batch.values.flatten.map(_.getAs[String]("channel")).toSet ==
      Set("text", "image"))
    // exactly TWO store scans for the whole batch (one per channel) —
    // N × searchMultimodal would run 2N
    val restoreAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = db.searchAllMultimodal(queries, topN = 3)
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("vector_store")) => f
      }
      assert(scans.size == 2,
        s"batch multimodal must scan the store twice (once per channel), found ${scans.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", restoreAqe)
    // the location scope composes across both channels
    val loc = Some("corpus/src1/")
    val fb = db.searchAllMultimodal(queries, topN = 3, location = loc)
      .collect().groupBy(_.getAs[Long]("q_id"))
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(fb.getOrElse(i.toLong, Array.empty).map(key).toSeq ==
        db.searchMultimodal(t, topN = 3, location = loc).collect().map(key).toSeq)
    }
    // ANN twins: full probe on both channels reproduces the exact
    // multimodal results
    db.buildAnnIndex(cells = 8, channel = "text")
    db.buildAnnIndex(cells = 4, channel = "image")
    val probeAll = 32
    texts.take(2).foreach { t =>
      assert(db.searchMultimodalAnn(t, topN = 3, nProbe = probeAll)
        .collect().map(key).toSeq ==
        db.searchMultimodal(t, topN = 3).collect().map(key).toSeq,
        s"full-probe multimodal ANN must equal the exact union for '$t'")
    }
    val ba = db.searchAllMultimodalAnn(queries, topN = 3, nProbe = probeAll)
      .collect().groupBy(_.getAs[Long]("q_id"))
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(ba(i.toLong).map(key).toSeq ==
        db.searchMultimodal(t, topN = 3).collect().map(key).toSeq,
        s"batch multimodal ANN (full probe) must equal the exact union for '$t'")
    }
  }

  test("ImageHeader reads real PNG/GIF/BMP/JPEG container headers; opaque bytes give None") {
    import graft.functions.expressions.ImageHeader
    def be32(v: Long): Array[Byte] = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def le16(v: Long): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Long): Array[Byte] = Array(v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
    assert(ImageHeader.decode(png).contains(("png", 640L, 480L)))
    val gif = "GIF89a".getBytes("ISO-8859-1") ++ le16(320) ++ le16(200) ++
      Array[Byte](0, 0, 0)
    assert(ImageHeader.decode(gif).contains(("gif", 320L, 200L)))
    val bmp = "BM".getBytes ++ le32(1000) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(800) ++ le32(-600) // negative = top-down
    assert(ImageHeader.decode(bmp).contains(("bmp", 800L, 600L)))
    // BITMAPCOREHEADER (OS/2): DIB size 12 at offset 14, then uint16
    // width/height — int32 reads would merge adjacent fields
    val bmpCore = "BM".getBytes ++ le32(1000) ++ le32(0) ++ le32(26) ++
      le32(12) ++ le16(640) ++ le16(350) ++ le16(1) ++ le16(24) ++
      Array.fill[Byte](4)(0)
    assert(ImageHeader.decode(bmpCore).contains(("bmp", 640L, 350L)))
    // an unknown DIB layout (size 16, OS/2 v2 truncated): stub, not a
    // misparse of merged fields
    val bmpOdd = "BM".getBytes ++ le32(1000) ++ le32(0) ++ le32(30) ++
      le32(16) ++ le32(640) ++ le32(350) ++ Array.fill[Byte](4)(0)
    assert(ImageHeader.decode(bmpOdd).isEmpty)
    // JPEG: APP0 segment then SOF0 — the walk must skip to the frame
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 16) ++ Array.fill[Byte](14)(0) ++
      Array[Byte](0xFF.toByte, 0xC0.toByte, 0, 17, 8) ++
      Array[Byte](0x04, 0x38) ++ /* height 1080 */ Array[Byte](0x07, 0x80.toByte) ++
      Array.fill[Byte](10)(0)
    assert(ImageHeader.decode(jpeg).contains(("jpeg", 1920L, 1080L)))
    // opaque bytes (the synthetic corpora's md5 payloads): None, not a
    // loud failure — unknown containers are the normal case
    assert(ImageHeader.decode("5b8733c1889f00aa".getBytes).isEmpty)
    assert(ImageHeader.decode(Array[Byte](0xFF.toByte, 0xD8.toByte, 0x00, 0x01)).isEmpty)
  }

  test("caption models route like the reference: header-meta captions real images, validation is loud, custom registers") {
    import spark.implicits._
    val pngB64 = {
      def be32(v: Long): Array[Byte] = Array((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
        be32(13) ++ "IHDR".getBytes ++ be32(64) ++ be32(48) ++
        Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
      java.util.Base64.getEncoder.encodeToString(png)
    }
    val wavB64 = {
      def le16(v: Long) = Array(v.toByte, (v >> 8).toByte)
      def le32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
        (v >> 24).toByte)
      def cc(s: String) = s.getBytes("ISO-8859-1")
      // 2ch 16-bit 22050 Hz, exactly one second of data → "a 1.0s wav clip"
      val wav = cc("RIFF") ++ le32(36 + 88200) ++ cc("WAVE") ++
        cc("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(22050) ++
        le32(22050 * 4) ++ le16(4) ++ le16(16) ++
        cc("data") ++ le32(88200) ++ Array.fill[Byte](88200)(3)
      java.util.Base64.getEncoder.encodeToString(wav)
    }
    val rows = Seq(
      ("doc/a", "png", 0L, "img", pngB64, "aabbccddeeff0011"),
      ("doc/b", "bin", 0L, "img", "5b8733c1889f00aa5b8733c1889f00aa", "ffee00112233aabb"),
      ("doc/c", "wav", 0L, "aud", wavB64, "0099887766554433"))
      .toDF("doc_name", "doc_type", "page_num", "content_id", "content_raw", "file_hash")
      .withColumn("content_type", lit(ContentTypes.Image))
      .withColumn("ts", timestamp_micros(lit(0L)))
      .withColumn("bbox", array(lit(0.0), lit(0.0), lit(0.0), lit(0.0)))
    val caps = GraftVectorDB.captionRows(rows).collect()
      .map(r => r.getAs[String]("doc_name") -> r.getAs[String]("content_raw")).toMap
    assert(caps("doc/a") == "a 64x48 png image", caps.toString)
    assert(caps("doc/b") == "captioned content ffee0011",
      "opaque payloads must keep the content-hash caption (byte-compat)")
    assert(caps("doc/c") == "a 1.0s wav clip",
      "media containers must caption from THEIR header walk: " + caps)
    // the stub model reproduces the historical caption on ALL rows
    val stub = GraftVectorDB.captionRows(rows, model = "content-hash").collect()
      .map(_.getAs[String]("content_raw")).toSet
    assert(stub == Set("captioned content aabbccdd", "captioned content ffee0011",
      "captioned content 00998877"))
    // the reference's constructor validation: unknown model fails
    // loudly naming the valid list (vector_db.py:43-52)
    val e = intercept[IllegalArgumentException](
      GraftVectorDB.captionRows(rows, model = "local-blip-3"))
    assert(e.getMessage.contains("captioning_model must be one of") &&
      e.getMessage.contains("header-meta"), e.getMessage)
    // the custom seam: a registered Column function routes by name —
    // where a real blip/gpt-4v UDF plugs in
    GraftVectorDB.registerCaptioner("test-upper",
      p => concat(lit("CAP:"), upper(substring(p, 1, 4))))
    val custom = GraftVectorDB.captionRows(rows, model = "test-upper")
      .collect().map(_.getAs[String]("content_raw")).toSet
    assert(custom.forall(_.startsWith("CAP:")), custom.toString)
    // caption rows embed in the TEXT channel space (cross-modal bridge)
    val emb = GraftVectorDB.captionRows(rows).select($"content_raw", $"embedding")
      .collect()
    emb.foreach { r =>
      assert(r.getSeq[Double](1).toArray.sameElements(
        graft.operators.VectorStore.embedTextLocal(r.getString(0))))
    }
  }

  test("MediaHeader walks real WAV chunks and MP4 boxes; scope edges are loud or null") {
    import graft.functions.expressions.{MediaHeader, SynthMedia}
    def le16(v: Long) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    def cc(s: String) = s.getBytes("ISO-8859-1")
    // WAV with an ODD-size junk chunk BEFORE fmt: the walk must apply
    // the RIFF pad byte or every later offset is off by one
    val fmtBody = le16(1) ++ le16(2) ++ le32(22050) ++ le32(22050 * 4) ++
      le16(4) ++ le16(16)
    val wav = cc("RIFF") ++ le32(999) ++ cc("WAVE") ++
      cc("junk") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) ++ // 3 + pad
      cc("fmt ") ++ le32(16) ++ fmtBody ++
      cc("data") ++ le32(400) ++ Array.fill[Byte](400)(7)
    val w = MediaHeader.decode(wav).get
    assert((w.container, w.channels, w.sampleRate, w.bits, w.durationMs) ==
      ("wav", 2L, 22050L, 16L, 400L / 4 * 1000 / 22050))
    // MP4 with a 64-bit (largesize) free box before moov, mvhd v1
    val mvhd = be32(40) ++ cc("mvhd") ++
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(90000) ++ be64(123456)
    val mp4 = be32(24) ++ cc("ftyp") ++ cc("isom") ++ be32(0x200) ++
      cc("isom") ++ cc("mp42") ++
      be32(1) ++ cc("free") ++ be64(20) ++ be32(0) ++ // largesize box
      be32(8 + 40) ++ cc("moov") ++ mvhd
    val v = MediaHeader.decode(mp4).get
    assert((v.container, v.durationMs) == ("mp4", 123456L * 1000 / 90000))
    assert(v.channels == null && v.sampleRate == null && v.bits == null)
    // non-PCM WAVE: structurally valid but out of decode scope →
    // None (the captioner's stub-fallback contract — never a throw on
    // a real-world payload shape)
    val alaw = cc("RIFF") ++ le32(100) ++ cc("WAVE") ++
      cc("fmt ") ++ le32(16) ++ (le16(6) ++ fmtBody.drop(2)) ++
      cc("data") ++ le32(4) ++ Array.fill[Byte](4)(0)
    assert(MediaHeader.decode(alaw).isEmpty)
    // opaque bytes and truncated containers: None, the normal case —
    // including a data chunk whose DECLARED size runs past the buffer
    assert(MediaHeader.decode("not media at all".getBytes).isEmpty)
    assert(MediaHeader.decode(wav.take(30)).isEmpty)
    assert(MediaHeader.decode(mp4.take(30)).isEmpty)
    assert(MediaHeader.decode(wav.dropRight(24)).isEmpty,
      "a truncated data chunk must yield null, not a duration from missing bytes")
    // the mvhd all-ones sentinel = unknown duration → null field
    val mvhdU = be32(28) ++ cc("mvhd") ++ Array[Byte](0, 0, 0, 0) ++
      be32(0) ++ be32(0) ++ be32(600) ++ be32(0xFFFFFFFFL)
    val mp4U = be32(24) ++ cc("ftyp") ++ cc("isom") ++ be32(0x200) ++
      cc("isom") ++ cc("mp42") ++ be32(8 + 28) ++ cc("moov") ++ mvhdU
    val u = MediaHeader.decode(mp4U).get
    assert(u.container == "mp4" && u.durationMs == null, u.toString)
    // a size-0 (runs-to-EOF) moov still resolves its mvhd
    val mvhd0 = be32(28) ++ cc("mvhd") ++ Array[Byte](0, 0, 0, 0) ++
      be32(0) ++ be32(0) ++ be32(1000) ++ be32(5000)
    val mp4EofMoov = be32(24) ++ cc("ftyp") ++ cc("isom") ++ be32(0x200) ++
      cc("isom") ++ cc("mp42") ++ be32(0) ++ cc("moov") ++ mvhd0
    assert(MediaHeader.decode(mp4EofMoov).get.durationMs == 5000L)
    // SynthMedia round-trip across the share space: every combination
    // of container x extra-chunk x mvhd-version occurs in a small draw
    // and parses back to the md5-derived fields
    val texts = (0 until 200).map(i => s"media fixture text number $i")
    var seen = Set.empty[(String, Boolean, Boolean)]
    var seenVbr = Set.empty[Int]
    texts.foreach { t =>
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      def u8(k: Int) = m(k) & 0xFF
      val h32 = (u8(4).toLong << 24) | (u8(5).toLong << 16) |
        (u8(6).toLong << 8) | u8(7).toLong
      val parsed = MediaHeader.decode(SynthMedia.build(t)).get
      if (u8(0) % 3 == 2) {
        val ch = 1L + u8(1) % 2
        val kbps = SynthMedia.Mp3Kbps(u8(2) % 5)
        val rate = SynthMedia.Mp3Rates(u8(3) % 3)
        val audio = (4 + h32 % 8) * (144000L * kbps / rate)
        // the VBR shares declare 40 + h32 % 64 frames in a Xing/VBRI
        // header — deliberately unrelated to the byte length, so a
        // decode that fell back to the CBR estimate would mismatch
        val vbr = u8(10) % 3
        seenVbr += vbr
        val expDur =
          if (vbr == 0) audio * 8 / kbps
          else (40L + h32 % 64L) * 1152L * 1000L / rate
        assert(parsed == MediaHeader.Media("mp3", ch, rate, null, expDur),
          s"mp3 mismatch for: $t (vbr share $vbr)")
      } else if (u8(0) % 2 == 0) {
        val ch = 1L + u8(1) % 2
        val rate = SynthMedia.Rates(u8(2) % 5)
        val bits = SynthMedia.Bits(u8(3) % 3)
        val data = 256 + h32 % 1024
        assert(parsed == MediaHeader.Media("wav", ch, rate, bits,
          data / (ch * bits / 8) * 1000 / rate), s"wav mismatch for: $t")
      } else if (u8(11) % 2 == 1) {
        // webm: TimestampScale 1e6 ns, integral float Duration → ms
        val dur = 1000L + h32 % 1000000L
        assert(parsed == MediaHeader.Media("webm", null, null, null, dur),
          s"webm mismatch for: $t")
      } else {
        val ts = SynthMedia.Timescales(u8(2) % 3)
        val dur = 1000L + h32 % 1000000L
        assert(parsed == MediaHeader.Media("mp4", null, null, null,
          dur * 1000 / ts), s"mp4 mismatch for: $t")
      }
      seen += ((parsed.container, u8(8) % 3 == 0, u8(9) % 2 == 1))
    }
    assert(seen.size == 16, s"share space not covered: $seen")
    assert(seenVbr == Set(0, 1, 2), s"mp3 vbr shares not covered: $seenVbr")
  }


  test("MP4 sample tables: stsz/stsc/stco/stts walk addresses the real mdat slices") {
    import graft.functions.expressions.{MediaHeader, SynthMedia}
    // synth shares: the walk's output must equal the SQL-replayable
    // sample plan (sizes, chunk-2 gap via stco, stts times)
    val all = (0 until 400).map(i => s"sample walk fixture number $i")
      .filter { t =>
        val m = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        (m(0) & 0xFF) % 3 != 2 && (m(0) & 0xFF) % 2 == 1 &&
          (m(11) & 0xFF) % 2 == 0 // the BMFF half of the video share
      }
    def isFrag(t: String): Boolean = {
      val m = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      (m(12) & 0xFF) % 2 == 1
    }
    val texts = all.filterNot(isFrag)
    val fragTexts = all.filter(isFrag)
    assert(texts.size > 10, "plain mp4 share underdrawn")
    assert(fragTexts.size > 10, "fragmented share underdrawn")
    var sawTwoChunks = false
    def checkShare(share: Seq[String], frag: Boolean): Unit = share.foreach { t =>
      val m = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      def u8(k: Int) = m(k) & 0xFF
      val h32 = (u8(4).toLong << 24) | (u8(5).toLong << 16) |
        (u8(6).toLong << 8) | u8(7).toLong
      val tb = t.getBytes("UTF-8")
      val avail = tb.length
      val ns = math.min(4 + (h32 % 5).toInt, (avail - 2) / 11)
      val delta = 50L + u8(10) % 100
      def sizeOf(i: Int): Long = 3 + (h32 + 7L * i) % 9
      def planOff(i: Int): Long =
        (if (i >= (ns + 1) / 2) 2L else 0L) + (0 until i).map(sizeOf).sum
      val c1 = (ns + 1) / 2
      val payload = SynthMedia.build(t)
      val got = MediaHeader.mp4Samples(payload).get.toSeq
      assert(got.length == ns, s"sample count for: $t (frag=$frag)")
      // absolute offsets: the addressed payload bytes ARE the text
      // slices the plan cut, and sizes/times replay the plan
      got.zipWithIndex.foreach { case ((off, len, time), i) =>
        assert(len == sizeOf(i) && time == delta * i,
          s"plan mismatch $i for: $t (frag=$frag)")
        val fromPayload = java.util.Arrays.copyOfRange(
          payload, off.toInt, (off + len).toInt)
        val fromText = java.util.Arrays.copyOfRange(
          tb, planOff(i).toInt, (planOff(i) + sizeOf(i)).toInt)
        assert(java.util.Arrays.equals(fromPayload, fromText),
          s"frame bytes $i for: $t (frag=$frag)")
      }
      if (ns > c1) sawTwoChunks = true
    }
    checkShare(texts, frag = false)
    checkShare(fragTexts, frag = true) // moof/traf/trun + trex fallback
    assert(sawTwoChunks, "two-chunk share (the stco gap proof) undrawn")
    // fixed-size stsz + multi-run stts: hand-built container
    val o = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = (0 to 3).foreach(i => o.write(((v >> (8 * (3 - i))) & 0xFF).toInt))
    def cc(s: String): Unit = o.write(s.getBytes("ISO-8859-1"))
    be32(16); cc("ftyp"); cc("isom"); be32(0)
    val stbl = 8 + 32 + 28 + 20 + 20 // stts(2 runs) + stsc + stsz(fixed) + stco
    be32(8L + 8 + 8 + 8 + stbl); cc("moov") // moov > trak > mdia > minf > stbl
    be32(8L + 8 + 8 + stbl); cc("trak")
    be32(8L + 8 + stbl); cc("mdia")
    be32(8L + stbl); cc("minf")
    be32(stbl.toLong); cc("stbl")
    be32(32); cc("stts"); be32(0); be32(2)
    be32(1); be32(10) // sample 0 at t=0, delta 10
    be32(2); be32(7) // samples 1-2 at deltas 7
    be32(28); cc("stsc"); be32(0); be32(1); be32(1); be32(3); be32(1)
    be32(20); cc("stsz"); be32(0); be32(4); be32(3) // FIXED size 4, 3 samples
    be32(20); cc("stco"); be32(0); be32(1)
    val mdatBody = 16 + (8 + 8 + 8 + 8 + stbl) + 8
    be32(mdatBody.toLong + 1) // chunk starts 1 byte INTO the mdat body
    be32(8L + 14); cc("mdat"); cc("abcdefghijklmn")
    val fixed = MediaHeader.mp4Samples(o.toByteArray).get.toSeq
    val base = mdatBody.toLong // absolute-offset contract
    assert(fixed == Seq((base + 1, 4L, 0L), (base + 5, 4L, 10L),
      (base + 9, 4L, 17L)), fixed.toString)
    // corrupt tables → None: a sample pointing past the mdat extent
    val bytes = o.toByteArray
    val stcoValueAt = bytes.length - (8 + 14) - 4 // last 4 bytes before mdat box
    bytes(stcoValueAt + 3) = (bytes(stcoValueAt + 3) + 10).toByte
    assert(MediaHeader.mp4Samples(bytes).isEmpty,
      "an offset outside mdat must be None, never a garbage slice")
    // non-BMFF / WAV payloads → None
    assert(MediaHeader.mp4Samples("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(MediaHeader.mp4Samples("not media".getBytes).isEmpty)
    // crafted fragments → None: a trun whose samples overrun the
    // payload, and an empty-table movie with no moof at all
    val of = new java.io.ByteArrayOutputStream()
    def fbe32(v: Long): Unit =
      (0 to 3).foreach(i => of.write(((v >> (8 * (3 - i))) & 0xFF).toInt))
    def fcc(s: String): Unit = of.write(s.getBytes("ISO-8859-1"))
    fbe32(16); fcc("ftyp"); fcc("isom"); fbe32(0)
    fbe32(8); fcc("moov") // empty moov: no tables -> fragment path
    val noMoof = of.toByteArray
    assert(MediaHeader.mp4Samples(noMoof).isEmpty,
      "no tables and no fragments must be None")
    val traf = 8 + 16 + 24 // tfhd + trun
    val moofSz = 8 + traf
    fbe32(moofSz.toLong); fcc("moof")
    fbe32(traf.toLong); fcc("traf")
    fbe32(16); fcc("tfhd"); fbe32(0x020000); fbe32(1)
    fbe32(24); fcc("trun"); fbe32(0x000201)
    fbe32(2); fbe32(moofSz.toLong + 8) // 2 samples...
    fbe32(4) // ...but only one size fits the box -> corrupt extent
    assert(MediaHeader.mp4Samples(of.toByteArray).isEmpty,
      "a trun run past its box must be None, never garbage slices")
  }

  test("WebM sample walk: clusters, relative timestamps, all lacings, corrupt -> None") {
    import graft.functions.expressions.{MediaHeader, SynthMedia}
    // synth share round-trip: the EBML walk must reproduce the SAME
    // sample plan as the BMFF share (sizes, the chunk-2 content gap,
    // per-sample times across TWO cluster bases), with the frame
    // bytes sitting at the returned ABSOLUTE payload offsets
    val texts = (0 until 400).map(i => s"webm walk fixture number $i")
      .filter { t =>
        val m = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        (m(0) & 0xFF) % 3 != 2 && (m(0) & 0xFF) % 2 == 1 &&
          (m(11) & 0xFF) % 2 == 1
      }
    assert(texts.size > 20, "webm share underdrawn")
    var sawTwoClusters = false
    texts.foreach { t =>
      val m = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      def u8(k: Int) = m(k) & 0xFF
      val h32 = (u8(4).toLong << 24) | (u8(5).toLong << 16) |
        (u8(6).toLong << 8) | u8(7).toLong
      val tb = t.getBytes("UTF-8")
      val ns = math.min(4 + (h32 % 5).toInt, (tb.length - 2) / 11)
      val delta = 50L + u8(10) % 100
      def sizeOf(i: Int): Long = 3 + (h32 + 7L * i) % 9
      def planOff(i: Int): Long =
        (if (i >= (ns + 1) / 2) 2L else 0L) + (0 until i).map(sizeOf).sum
      val payload = SynthMedia.build(t)
      val got = MediaHeader.webmSamples(payload).get.toSeq
      assert(got.length == ns, s"sample count for: $t")
      got.zipWithIndex.foreach { case ((off, len, time), i) =>
        assert(len == sizeOf(i) && time == delta * i, s"plan mismatch $i for: $t")
        // the addressed payload slice IS the text slice the plan cut
        val fromPayload = java.util.Arrays.copyOfRange(
          payload, off.toInt, (off + len).toInt)
        val fromText = java.util.Arrays.copyOfRange(
          tb, planOff(i).toInt, (planOff(i) + sizeOf(i)).toInt)
        assert(java.util.Arrays.equals(fromPayload, fromText),
          s"frame bytes $i for: $t")
      }
      if (ns > (ns + 1) / 2) sawTwoClusters = true
    }
    assert(sawTwoClusters, "two-cluster share (the cluster-base proof) undrawn")
    // ---- hand fixtures: lacing forms + BlockGroup + corruption ----
    def vint2(v: Int) = Array[Byte]((0x40 | (v >> 8)).toByte, (v & 0xFF).toByte)
    def el(idBytes: Int*)(body: Array[Byte]): Array[Byte] =
      idBytes.map(_.toByte).toArray ++ vint2(body.length) ++ body
    def doc(clusterBody: Array[Byte]): Array[Byte] =
      el(0x1A, 0x45, 0xDF, 0xA3)("webm".getBytes("ISO-8859-1")) ++
        el(0x18, 0x53, 0x80, 0x67)(
          el(0x16, 0x54, 0xAE, 0x6B)(el(0xAE)(
            el(0xD7)(Array[Byte](1)))) ++
            el(0x1F, 0x43, 0xB6, 0x75)(
              el(0xE7)(Array[Byte](0, 100)) ++ clusterBody))
    def walk(b: Array[Byte]) = MediaHeader.webmSamples(b).map(_.toSeq)
    // Xiph lacing: frames of 3, 255+2 (=257), remainder 4 — the size
    // runs must terminate on the first byte < 255
    val xiphData = Array.fill[Byte](3 + 257 + 4)(7)
    val xiphFixed = doc(el(0xA3)( // track, rel=10, lacing 01, count-1=2
      Array[Byte](0x81.toByte, 0, 10, 0x02, 2, 3, 0xFF.toByte, 2) ++ xiphData))
    val xr = walk(xiphFixed).get
    assert(xr.map(s => (s._2, s._3)) == Seq((3L, 110L), (257L, 110L), (4L, 110L)), xr)
    // frames are contiguous after the lace header
    assert(xr(1)._1 == xr(0)._1 + 3 && xr(2)._1 == xr(1)._1 + 257)
    // EBML lacing: sizes 5, then delta -2 (=3), remainder 6
    val ebmlData = Array.fill[Byte](5 + 3 + 6)(9)
    // signed delta -2 as a 1-byte vint: value = -2 + 63 = 61 -> 0x80|61
    val ebmlLace = doc(el(0xA3)(
      Array[Byte](0x81.toByte, 0, 20, 0x06, 2, 0x85.toByte, (0x80 | 61).toByte)
        ++ ebmlData))
    val er = walk(ebmlLace).get
    assert(er.map(s => (s._2, s._3)) == Seq((5L, 120L), (3L, 120L), (6L, 120L)), er)
    // fixed lacing: 3 equal frames of 4
    val fixedLace = doc(el(0xA3)(
      Array[Byte](0x81.toByte, 0, 30, 0x04, 2) ++ Array.fill[Byte](12)(5)))
    val fr = walk(fixedLace).get
    assert(fr.map(s => (s._2, s._3)) == Seq((4L, 130L), (4L, 130L), (4L, 130L)), fr)
    // BlockGroup > Block: same shape, negative relative timestamp
    val group = doc(el(0xA0)(el(0xA1)(
      Array[Byte](0x81.toByte, 0xFF.toByte, 0x9C.toByte, 0x00) ++ // rel = -100
        Array.fill[Byte](5)(3))))
    val gr = walk(group).get
    assert(gr == Seq((gr.head._1, 5L, 0L)), gr) // 100 + (-100)
    // a foreign track's block is skipped, not an error
    val foreign = doc(el(0xA3)(
      Array[Byte](0x82.toByte, 0, 1, 0x00) ++ Array.fill[Byte](4)(1)))
    assert(walk(foreign).get.isEmpty)
    // corruption -> None: fixed lacing with a non-divisible remainder,
    // a block overrunning its element, no Tracks at all
    val badFixed = doc(el(0xA3)(
      Array[Byte](0x81.toByte, 0, 0, 0x04, 2) ++ Array.fill[Byte](11)(5)))
    assert(walk(badFixed).isEmpty)
    val badXiph = doc(el(0xA3)(
      Array[Byte](0x81.toByte, 0, 0, 0x02, 2, 50, 50) ++ Array.fill[Byte](10)(1)))
    assert(walk(badXiph).isEmpty) // coded sizes exceed the block extent
    val noTracks = el(0x1A, 0x45, 0xDF, 0xA3)("webm".getBytes("ISO-8859-1")) ++
      el(0x18, 0x53, 0x80, 0x67)(el(0x1F, 0x43, 0xB6, 0x75)(Array.empty[Byte]))
    assert(walk(noTracks).isEmpty)
    assert(walk("not ebml at all".getBytes).isEmpty)
  }

  test("mm_frames digests BYTE slices: non-ASCII text addresses UTF-8 bytes, not chars") {
    import graft.operators.Multimodal
    // the driver corpus is ASCII (pinned here as the oracle's
    // validity condition: DuckDB's char substr only equals the byte
    // slice when 1 char = 1 byte), but the sample tables address
    // BYTES of the UTF-8 mdat — a multi-byte doc must digest the byte
    // slice the stsz/stco entries actually cover
    val texts = (0 until 400).map(i => s"café №$i — протокол видео fixture $i")
      .filter { t =>
        val m = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        (m(0) & 0xFF) % 3 != 2 && (m(0) & 0xFF) % 2 == 1
      }.take(8)
    assert(texts.nonEmpty, "non-ASCII mp4 share underdrawn")
    assert(texts.forall(t => t.getBytes("UTF-8").length > t.length),
      "fixture must be multi-byte")
    val dir = "target/mm_frames_bytes"
    val f = new java.io.File(dir)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm); x.delete()
    }
    if (f.exists()) rm(f)
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val out = Multimodal.frames(spark, dir).collect()
    assert(out.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id").toInt)
      val tb = t.getBytes("UTF-8")
      // recompute the sample plan (the oracle's md5 arithmetic) and
      // hash the BYTE slice it addresses
      val m = java.security.MessageDigest.getInstance("MD5").digest(tb)
      def u8(k: Int) = m(k) & 0xFF
      val h32 = (u8(4).toLong << 24) | (u8(5).toLong << 16) |
        (u8(6).toLong << 8) | u8(7).toLong
      val ns = math.min(4 + (h32 % 5).toInt, (tb.length - 2) / 11)
      val i = r.getAs[Long]("frame_no").toInt
      def sizeOf(k: Int): Long = 3 + (h32 + 7L * k) % 9
      val gap = if (i >= (ns + 1) / 2) 2L else 0L
      val off = (gap + (0 until i).map(sizeOf).sum).toInt
      val len = sizeOf(i).toInt
      val want = md.digest(java.util.Arrays.copyOfRange(tb, off, off + len))
        .map("%02x".format(_)).mkString
      md.reset()
      assert(r.getAs[String]("frame_md5") == want,
        s"doc ${r.getAs[Long]("doc_id")} frame $i must digest the byte slice")
    }
    // the pin is meaningful: at least one frame's char-based slice
    // disagrees with its byte slice on this corpus
    val divergent = out.exists { r =>
      val t = texts(r.getAs[Long]("doc_id").toInt)
      val tb = t.getBytes("UTF-8")
      val md2 = java.security.MessageDigest.getInstance("MD5")
      val charMd5s = (0 until t.length).flatMap { o =>
        (1 to math.min(12, t.length - o)).map { l =>
          md2.digest(t.substring(o, o + l).getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
        }
      }.toSet
      !charMd5s.contains(r.getAs[String]("frame_md5"))
    }
    assert(divergent, "corpus must exercise a byte-slice that no char slice produces")
  }

  test("EXIF: both byte orders, inline+offset values, nulls for absent tags/EXIF/non-JPEG") {
    import graft.functions.expressions.{ExifMeta, SynthExif}
    // the synth share space: both byte orders and both gps branches
    // occur, and decode() reproduces the md5-derived fields
    val texts = (0 until 40).map(i => s"exif fixture $i")
    var orders = Set.empty[Boolean]
    var gpsSeen = Set.empty[Boolean]
    texts.foreach { t =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      orders += (d(6) & 0xFF) % 2 == 0
      val got = ExifMeta.decode(SynthExif.build(t)).get
      assert(got._1 == s"Cam-${hex.substring(0, 6)}", t)
      assert(got._2 == s"M${hex.charAt(6)}", t)
      assert(got._3 == 1L + (d(7) & 0xFF) % 8, t)
      assert(got._5 == ((d(14) & 0xFF) % 3 == 0), t)
      gpsSeen += got._5
    }
    assert(orders == Set(true, false), "both TIFF byte orders must occur")
    assert(gpsSeen == Set(true, false), "both gps branches must occur")
    // hand-built MM (big-endian) TIFF with ONLY an orientation tag:
    // absent tags are null FIELDS, not a null row
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val tiff = "MM".getBytes ++ be16(42) ++ be32(8) ++
      be16(1) ++ // one entry
      be16(0x0112) ++ be16(3) ++ be32(1) ++ be16(6) ++ be16(0) ++
      be32(0) // no next IFD
    val app1len = 2 + 6 + tiff.length
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte,
      (app1len >> 8).toByte, app1len.toByte) ++
      "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff ++
      Array[Byte](0xFF.toByte, 0xD9.toByte)
    val m = ExifMeta.decode(jpeg).get
    assert(m == ((null, null, 6L, null, false)), m.toString)
    // a JPEG with no APP1 and a non-JPEG payload: null rows
    assert(ExifMeta.decode(Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xD9.toByte)).isEmpty)
    assert(ExifMeta.decode("not a jpeg".getBytes).isEmpty)
    // a corrupt TIFF (bad magic) inside a declared Exif APP1: null
    val bad = jpeg.clone(); bad(13) = 0x99.toByte // the 42 magic
    assert(ExifMeta.decode(bad).isEmpty)
  }

  test("MP3 VBR: Xing/Info and VBRI frame counts decide duration; flagless Xing falls back") {
    import graft.functions.expressions.MediaHeader
    // stereo 128 kbps @ 44100: side info 32 bytes, frame 417 bytes
    def vbrFrame(tag: String, flags: Int, frames: Int): Array[Byte] = {
      val f = Array.fill[Byte](417)(0x11)
      f(0) = 0xFF.toByte; f(1) = 0xFB.toByte; f(2) = 0x90.toByte; f(3) = 0x00
      java.util.Arrays.fill(f, 4, 36, 0.toByte) // zero side info
      tag.getBytes.copyToArray(f, 36)
      def be32(at: Int, v: Int): Unit = {
        f(at) = (v >> 24).toByte; f(at + 1) = (v >> 16).toByte
        f(at + 2) = (v >> 8).toByte; f(at + 3) = v.toByte
      }
      if (tag == "VBRI") be32(36 + 14, frames)
      else { be32(40, flags); be32(44, frames) }
      f
    }
    def audioFrames(n: Int) = Array.fill[Byte](417 * n)(0x22)
    // Xing: 100 declared frames -> 100 * 1152 * 1000 / 44100
    val xing = vbrFrame("Xing", 1, 100) ++ audioFrames(3)
    assert(MediaHeader.decode(xing).get.durationMs == 100L * 1152 * 1000 / 44100)
    // Info (the LAME CBR alias) uses the same structure
    val info = vbrFrame("Info", 1, 250) ++ audioFrames(3)
    assert(MediaHeader.decode(info).get.durationMs == 250L * 1152 * 1000 / 44100)
    // VBRI at its fixed 4+32 offset
    val vbri = vbrFrame("VBRI", 0, 77) ++ audioFrames(3)
    assert(MediaHeader.decode(vbri).get.durationMs == 77L * 1152 * 1000 / 44100)
    // a Xing header WITHOUT the frames flag carries no count: CBR path
    val flagless = vbrFrame("Xing", 0, 999) ++ audioFrames(3)
    assert(MediaHeader.decode(flagless).get.durationMs ==
      flagless.length.toLong * 8 / 128)
    // mono side info is 17 bytes: a Xing tag at the STEREO offset is
    // just audio bytes there, not a header
    val mono = vbrFrame("Xing", 1, 100) ++ audioFrames(1)
    mono(3) = 0xC0.toByte // mode = single channel
    assert(MediaHeader.decode(mono).get.durationMs ==
      mono.length.toLong * 8 / 128)
  }

  test("MP3: ID3v2 skip, frame header fields, scope edges null") {
    import graft.functions.expressions.MediaHeader
    // 128 kbps (idx 9), 44100 (idx 0), stereo, one frame of 417 bytes
    def frame(b2: Int = 0xFB, b3: Int = 0x90, b4: Int = 0x00,
        size: Int = 417): Array[Byte] =
      Array(0xFF.toByte, b2.toByte, b3.toByte, b4.toByte) ++
        Array.fill[Byte](size - 4)(0x11)
    val bare = frame() ++ frame() ++ frame()
    val m = MediaHeader.decode(bare).get
    assert((m.container, m.channels, m.sampleRate, m.bits) ==
      ("mp3", 2L, 44100L, null))
    assert(m.durationMs == bare.length.toLong * 8 / 128)
    // an ID3v2.3 tag (syncsafe size 200) is skipped, not parsed as audio
    val id3 = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 1, 72) ++
      Array.fill[Byte](200)(0x41) // 1*128 + 72 = 200 body bytes
    val tagged = id3 ++ bare
    val t = MediaHeader.decode(tagged).get
    assert(t.sampleRate == 44100L && t.durationMs == bare.length.toLong * 8 / 128)
    // mono mode bits -> 1 channel
    assert(MediaHeader.decode(frame(b4 = 0xC0)).get.channels == 1L)
    // out of scope: MPEG-2 (version bits), Layer II, free/bad bitrate,
    // reserved rate index, tag with no frames, truncated tag
    assert(MediaHeader.decode(frame(b2 = 0xF3)).isEmpty) // MPEG-2
    assert(MediaHeader.decode(frame(b2 = 0xFD)).isEmpty) // Layer II
    assert(MediaHeader.decode(frame(b3 = 0x00)).isEmpty) // free bitrate
    assert(MediaHeader.decode(frame(b3 = 0xF0)).isEmpty) // bad bitrate
    assert(MediaHeader.decode(frame(b3 = 0x9C)).isEmpty) // reserved rate
    assert(MediaHeader.decode(id3).isEmpty)
    assert(MediaHeader.decode(id3.take(50)).isEmpty)
  }

  test("WavSampleStats decodes PCM frames exactly; scope edges yield null") {
    import graft.functions.expressions.{MediaHeader, SynthMedia}
    def le16(v: Long) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    def cc(s: String) = s.getBytes("ISO-8859-1")
    def wav16(samples: Seq[Int], channels: Int): Array[Byte] = {
      val data = samples.flatMap(s => le16(s & 0xFFFF)).toArray
      cc("RIFF") ++ le32(36L + data.length) ++ cc("WAVE") ++
        cc("fmt ") ++ le32(16) ++ (le16(1) ++ le16(channels) ++ le32(8000) ++
          le32(8000L * channels * 2) ++ le16(channels * 2) ++ le16(16)) ++
        cc("data") ++ le32(data.length) ++ data
    }
    // mono: known peak / rms / zero crossings, hand-computed
    val mono = Seq(0, 100, -100, 32767, -32768)
    val Some((f1, peak1, rms1, zc1)) = MediaHeader.pcmStats(wav16(mono, 1))
    assert(f1 == 5L)
    assert(peak1 == 32768.0 / 32768.0)
    val ssq = mono.map(v => v.toLong * v).sum
    assert(rms1 == math.sqrt(ssq.toDouble / 5) / 32768.0)
    // 0 -> 100: no; 100 -> -100: yes; -100 -> 32767: yes; -> -32768: yes
    assert(zc1 == 3L)
    // stereo: zcross follows CHANNEL 0 only; a trailing partial frame
    // (odd sample count) is ignored, libsndfile-style
    val stereo = Seq(10, -5, -10, -5, 10) // frames (10,-5) (-10,-5); 10 dropped
    val Some((f2, _, _, zc2)) = MediaHeader.pcmStats(wav16(stereo, 2))
    assert(f2 == 2L && zc2 == 1L, s"$f2 $zc2")
    // 8-bit is unsigned around 128
    val w8 = cc("RIFF") ++ le32(30) ++ cc("WAVE") ++
      cc("fmt ") ++ le32(16) ++ (le16(1) ++ le16(1) ++ le32(8000) ++
        le32(8000) ++ le16(1) ++ le16(8)) ++
      cc("data") ++ le32(2) ++ Array[Byte](0, -1) // 0 -> -128, 255 -> 127
    val Some((f3, peak3, _, zc3)) = MediaHeader.pcmStats(w8)
    assert(f3 == 2L && peak3 == 1.0 && zc3 == 1L)
    // out of scope: mp4 container, float wav, truncated data -> None
    val mp4Text = (0 until 50).map(i => s"mp4 share fixture $i").find { t =>
      val b0 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))(0) & 0xFF
      b0 % 2 == 1 && b0 % 3 != 2
    }.get
    assert(MediaHeader.pcmStats(SynthMedia.build(mp4Text)).isEmpty)
    val floatWav = cc("RIFF") ++ le32(30) ++ cc("WAVE") ++
      cc("fmt ") ++ le32(16) ++ (le16(3) ++ le16(1) ++ le32(8000) ++
        le32(32000) ++ le16(4) ++ le16(32)) ++
      cc("data") ++ le32(4) ++ Array.fill[Byte](4)(0)
    assert(MediaHeader.pcmStats(floatWav).isEmpty)
    assert(MediaHeader.pcmStats(wav16(mono, 1).dropRight(4)).isEmpty)
    // the SynthMedia wav share agrees with an independent re-decode
    // (wav = even md5 byte 0 AND not the mp3 share, byte0 % 3 == 2)
    val t = (0 until 50).map(i => s"pcm stats fixture $i").find { t =>
      val b0 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))(0) & 0xFF
      b0 % 2 == 0 && b0 % 3 != 2
    }.get
    val m = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8"))
    def u8(k: Int) = m(k) & 0xFF
    val h32 = (u8(4).toLong << 24) | (u8(5).toLong << 16) |
      (u8(6).toLong << 8) | u8(7).toLong
    val ch = 1 + u8(1) % 2
    val bits = SynthMedia.Bits(u8(3) % 3).toInt
    val frames = (256 + h32 % 1024) / (ch * bits / 8)
    val Some((fS, _, _, _)) = MediaHeader.pcmStats(SynthMedia.build(t))
    assert(fS == frames, s"$fS vs $frames")
  }
}
