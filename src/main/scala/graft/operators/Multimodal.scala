package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Multimodal-column plumbing: payloads as opaque `binary` columns with
  * typed metadata, mirroring the reference's base64 image blobs riding
  * next to text rows (vector_db.py:283-308). [[meta]]'s decoded
  * dimensions remain a clearly-marked deterministic stub
  * (hash-derived); everything else here is a REAL byte walk —
  * RIFF/BMFF/MP3 headers, PCM sample stats, EXIF IFDs, MP4 sample
  * tables ([[frames]]), and actual pixel decodes behind the
  * perceptual hashes — each oracle-verified or spec-pinned.
  */
object Multimodal {

  /** Typed metadata over binary payloads: byte length, magic prefix,
    * content digest, modality tag, and STUBBED decoded dimensions
    * (deterministic hash-derived fakes standing in for a real decoder
    * running under mapInPandas/mapPartitions at the same schema). */
  def meta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", encode($"text", "utf-8").as("payload"), $"text")
      .select($"doc_id",
        length($"payload").cast("long").as("byte_len"),
        lower(hex(expr("substring(payload, 1, 4)"))).as("magic"),
        md5($"payload").as("content_md5"),
        // modality router (kind) + stub decode: dimensions derived from
        // the content hash — NOT a real decoder, but schema-faithful.
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(length($"payload").cast("long"), lit(3L)) + 1).cast("int")).as("kind"),
        (lit(64L) + pmod(hash32($"text"), lit(1856L))).as("width"),
        (lit(64L) + pmod(hash32(reverse($"text")), lit(1056L))).as("height"))
      .orderBy($"doc_id")
  }

  /** Audio/video container metadata over REAL synthesized headers —
    * where [[meta]]'s decoded dimensions are declared stubs, this path
    * is an actual parse: [[graft.functions.expressions.SynthMedia]]
    * emits RIFF/WAVE (PCM fmt + data chunks, duration backed by the
    * data byte count) or ISO BMFF (ftyp → moov/mvhd v0 and v1) from
    * text-md5-derived fields, and [[graft.functions.expressions
    * .MediaHeaderMeta]] walks the chunks/boxes back. Every field is
    * recomputable from `text` alone, so the DuckDB oracle checks the
    * real header walk, not a hash stub. Per-row narrow work — the
    * 100 TB shape of a metadata-sniff stage. */
  def media(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        graft.functions.expressions.MediaHeaderMeta(
          graft.functions.expressions.SynthMedia($"text")).as("m"))
      .select($"doc_id", $"m.container", $"m.channels",
        $"m.sample_rate", $"m.bits", $"m.duration_ms")
      .orderBy($"doc_id")
  }

  /** mm_audio — PCM sample statistics decoded from the WAV payloads'
    * data chunks ([[graft.functions.expressions.WavSampleStats]]):
    * frame count, normalized peak and RMS level, channel-0 zero
    * crossings — the silence/clipping gates an audio curation pass
    * runs. MP4 payloads yield null stats and drop out, exactly the
    * production split (header sniff routes, sample decode runs on
    * the audio share only). Integer aggregation inside the
    * expression keeps the oracle's float math bit-reproducible. */
  def audio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        graft.functions.expressions.WavSampleStats(
          graft.functions.expressions.SynthMedia($"text")).as("s"))
      .filter($"s".isNotNull)
      .select($"doc_id", $"s.n_frames",
        round($"s.peak", 6).as("peak"), round($"s.rms", 6).as("rms"),
        $"s.zcross")
      .orderBy($"doc_id")
  }

  /** mm_exif — camera-provenance metadata from the JPEG APP1 EXIF
    * walk ([[graft.functions.expressions.ExifMeta]]): make/model,
    * orientation, capture timestamp, GPS-IFD presence (the PII gate's
    * question). [[graft.functions.expressions.SynthExif]] derives
    * every field from the text md5 and routes HALF the documents
    * through each TIFF byte order (`II`/`MM`), so the oracle — which
    * is endianness-transparent — hash-checks both walks, offset AND
    * inline value layouts. Per-row narrow work, the metadata-sniff
    * shape. */
  def exif(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", graft.functions.expressions.ExifMeta(
        graft.functions.expressions.SynthExif($"text")).as("x"))
      .select($"doc_id", $"x.make", $"x.model", $"x.orientation",
        $"x.taken_at", $"x.has_gps")
      .orderBy($"doc_id")
  }

  /** Target bounding box for [[resize]]. */
  val ResizeBox = 512L

  /** Aspect-preserving resize planning over the decoded dimensions —
    * the transform step of an image-normalization pipeline. All math
    * is integer (floor division), so the plan is bit-identical across
    * engines; the actual pixel resample is the same stubbed decoder
    * seam as [[meta]] (a mapPartitions batch op in a real deployment,
    * same schema either way). */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    meta(spark, dir).select($"doc_id", $"width", $"height")
      .withColumn("new_width", expr(
        s"""CASE WHEN width <= $ResizeBox AND height <= $ResizeBox THEN width
           | WHEN width >= height THEN $ResizeBox
           | ELSE (width * $ResizeBox) div height END""".stripMargin))
      .withColumn("new_height", expr(
        s"""CASE WHEN width <= $ResizeBox AND height <= $ResizeBox THEN height
           | WHEN width >= height THEN (height * $ResizeBox) div width
           | ELSE $ResizeBox END""".stripMargin))
      .withColumn("downscaled", $"width" > ResizeBox || $"height" > ResizeBox)
      .orderBy($"doc_id")
  }

  /** Perceptual-hash near-duplicate detection over the payload — the
    * image-dedup step of a multimodal pipeline. A [[PhashBits]]-bit
    * block hash is computed from a fixed spatial grid wrapped
    * cyclically over the payload (the real deployment swaps the block
    * digest for a DCT of decoded pixels at the same seam), and
    * near-dup pairs within hamming [[PhashMaxHamming]] come from the
    * occupancy-safe [[HammingPairs]] stage: distinct-hash collapse,
    * a corpus-sized band-geometry ladder, and the hot-bucket
    * sub-band split — exact at every geometry, so the DuckDB oracle
    * pins the pair set regardless of which rung the corpus size
    * selects. Block offsets are a FIXED grid wrapped cyclically
    * over the payload: fixed (not length-proportional) because a fixed
    * grid is stable under small same-length edits — what makes the
    * hash perceptual — and wrapped so every bit is content-derived for
    * payloads shorter than the grid (unwrapped trailing blocks would
    * hash '' and hand all short payloads 20+ identical constant bits:
    * confirmed false near-dup pairs plus one degenerate band bucket
    * holding every short row). Real fixed-size pixel payloads populate
    * the grid directly. */
  val PhashBits = 32
  val PhashMaxHamming = 3
  val PhashBlock = 8

  /** Packed [[PhashBits]]-bit perceptual hash: bit i = parity of the
    * md5-derived digest of the [[PhashBlock]]-byte block at grid
    * offset i·[[PhashBlock]] mod len. Pure codegen'd bit math. */
  private def phashValue(text: org.apache.spark.sql.Column) =
    (0 until PhashBits).map { i =>
      val start = pmod(lit(i * PhashBlock), length(text)) + 1
      pmod(hash32(substr(text, start.cast("int"), lit(PhashBlock))), lit(2L)) *
        lit(1L << i)
    }.reduce(_ + _)

  def phash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // footer-stats row count drives the geometry rung — no data scan
    val n = Tables.load(spark, dir, "documents").count()
    val hashed = Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id", phashValue($"text").as("ph"))
    HammingPairs.pairs(hashed, "doc_id", n, PhashBits, PhashMaxHamming)
      .orderBy($"a_id", $"b_id")
  }

  /** The PIXEL-level twin of [[phash]] — mm_phash_px: a real PNG per
    * document ([[graft.functions.expressions.SynthPng]] — content
    * seeded by the text's 20-char prefix, encoding routed across
    * gray/RGB/palette color types and rotating row filters), decoded
    * to luma and hashed by the 32x32-DCT perceptual hash
    * ([[graft.functions.expressions.PixelPhash]]). Near-dup pairs
    * within hamming [[PxMaxHamming]] over the [[PxBits]]-bit hash via
    * the occupancy-safe [[HammingPairs]] stage — distinct-hash
    * collapse (byte-identical crawl duplicates never enter the join),
    * corpus-sized geometry ladder, hot-bucket sub-band split; exact
    * at every rung. Rows-only by design (a 2D DCT over decoded
    * pixels has no SQL ground truth); PixelSpec carries the burden:
    * decoder fixtures per format/filter/color type, encode-variant
    * hash identity, resized near-dup recall, and pair-set equality of
    * the full pairing stage against an exhaustive hamming scan
    * (HammingPairsSpec forces every rung and the hot path besides). */
  val PxBits = 64
  val PxMaxHamming = 7

  def phashPx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.expressions.{PixelPhash, SynthPng}
    val n = Tables.load(spark, dir, "documents").count() // footer stats
    // HammingPairs materializes the (doc_id, ph) frame itself, so the
    // decode + DCT runs ONCE regardless of how many ways the pairing
    // stage scans it
    val hashed = Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id", PixelPhash(SynthPng($"text")).as("ph"))
    HammingPairs.pairs(hashed, "doc_id", n, PxBits, PxMaxHamming)
      .orderBy($"a_id", $"b_id")
  }

  /** mm_frames — REAL MP4 frame extraction: [[graft.functions.expressions.SynthMedia]]'s
    * BMFF share now carries a full trak with sample tables
    * (stts/stsc/stsz/stco) whose entries address slices of the mdat
    * body (= the text bytes), and [[graft.functions.expressions.Mp4Samples]]
    * walks them back — chunk offsets from stco (a deliberate 2-byte
    * gap before chunk 2 proves the offsets are READ, not recomputed),
    * per-sample sizes from stsz, decode times from stts. Each frame's
    * payload slice is digested; the DuckDB oracle recomputes every
    * offset/size/time from md5(text) + octet_length(text) alone, so a
    * wrong walk hash-mismatches. WAV/MP3 payloads yield null samples
    * and drop out — the same container-routing split as [[audio]].
    * Pure per-row expansion, no shuffle: the 100 TB shape. */
  def frames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.expressions.{Mp4Samples, SynthMedia, WebmSamples}
    // container routing behind ONE slicing contract: the BMFF walk
    // (plain sample tables AND moof/traf fragments) and the EBML walk
    // both return ABSOLUTE payload offsets, so every container's
    // frames slice the payload itself — byte-based (binary substr):
    // the tables address BYTES, and the DuckDB oracle's char substr
    // over the text agrees because the frame contents are text slices
    // and the corpus is ASCII (MultimodalStoreSpec pins the non-ASCII
    // byte path)
    Tables.load(spark, dir, "documents")
      .select($"doc_id", SynthMedia($"text").as("p"))
      .withColumn("s", coalesce(Mp4Samples($"p"), WebmSamples($"p")))
      .filter($"s".isNotNull)
      .select($"doc_id", $"p", posexplode($"s").as(Seq("frame_no", "f")))
      .select($"doc_id", $"frame_no".cast("long").as("frame_no"),
        md5($"p".substr($"f.off".cast("int") + 1, $"f.len".cast("int")))
          .as("frame_md5"),
        $"f.len".as("frame_len"),
        $"f.t".as("frame_t"))
      .orderBy($"doc_id", $"frame_no")
  }
}
