package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Transparent decompression for binary payloads, by MAGIC sniff:
  *  - gzip (1f 8b): java.util.zip.GZIPInputStream, multi-member
  *    streams included — the pigz/concatenated-dump and per-record
  *    `.warc.gz` shapes;
  *  - zstd (28 b5 2f fd): the modern corpus-dump codec
  *    (RefinedWeb-class `.jsonl.zst`/`.warc.zst` mirrors), decoded
  *    through the zstd-jni Spark already bundles for shuffle
  *    compression (no new dependency); default (non-continuous)
  *    stream mode reads concatenated frames whole like gzip members
  *    AND keeps truncation loud — continuous mode would swallow it;
  *  - xz (fd '7zXZ' 00): the `.jsonl.xz` mirror shape (The Pile era),
  *    via org.tukaani.xz already on Spark's classpath (XZInputStream
  *    reads concatenated streams + padding per the .xz spec);
  *  - bzip2 ('BZh' + level digit): classic archive dumps (Wikipedia,
  *    early CommonCrawl), via commons-compress (Spark classpath),
  *    decompressConcatenated like the others;
  *  - lz4 FRAMES (04 22 4d 18) and the snappy FRAMING format
  *    (ff 06 00 00 'sNaPpY'): the Hadoop-era dump codecs, via
  *    commons-compress, concatenated lz4 frames read whole; the RAW
  *    lz4-block / snappy-block forms have no magic and stay out of
  *    the sniff (they are container-internal formats);
  *  - everything else passes through untouched.
  * Crawl dumps ship `.html.gz`/`.json.zst`; sniffing the magic beats
  * trusting file extensions, and the pass-through makes it safe to
  * wrap EVERY ingest payload. A corrupt compressed body fails loudly
  * (a truncated member is data loss, not a pass-through case). */
case class Inflate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"Inflate needs a binary payload, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Inflate.maybeInflate(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(c: Expression): Inflate =
    copy(child = c)
}

object Inflate {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      Inflate(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  private[graft] def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0x1f && (b(1) & 0xFF) == 0x8b

  /** Zstandard frame magic, RFC 8878 section 3.1.1 (little-endian
    * 0xFD2FB528 on the wire: 28 b5 2f fd). */
  private[graft] def isZstd(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xFF) == 0x28 && (b(1) & 0xFF) == 0xB5 &&
      (b(2) & 0xFF) == 0x2F && (b(3) & 0xFF) == 0xFD

  /** .xz stream header magic (xz file format spec section 2.1.1.1):
    * fd '7' 'z' 'X' 'Z' 00. */
  private[graft] def isXz(b: Array[Byte]): Boolean =
    b.length >= 6 && (b(0) & 0xFF) == 0xFD && b(1) == '7' && b(2) == 'z' &&
      b(3) == 'X' && b(4) == 'Z' && b(5) == 0

  /** bzip2 magic: 'B' 'Z' 'h' + block-size digit '1'..'9'. */
  private[graft] def isBzip2(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'B' && b(1) == 'Z' && b(2) == 'h' &&
      b(3) >= '1' && b(3) <= '9'

  /** LZ4 FRAME magic (lz4 frame format spec: little-endian 0x184D2204
    * on the wire: 04 22 4d 18) — the `.lz4` CLI/Hadoop dump shape,
    * not the raw block format (which has no magic to sniff). */
  private[graft] def isLz4(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xFF) == 0x04 && (b(1) & 0xFF) == 0x22 &&
      (b(2) & 0xFF) == 0x4D && (b(3) & 0xFF) == 0x18

  /** Snappy FRAMING format stream identifier (the `.sz` container:
    * chunk type 0xFF, length 6, then "sNaPpY") — raw snappy blocks
    * have no magic and stay out of the sniff. */
  private[graft] def isSnappy(b: Array[Byte]): Boolean =
    b.length >= 10 && (b(0) & 0xFF) == 0xFF && b(1) == 6 && b(2) == 0 &&
      b(3) == 0 && b(4) == 's' && b(5) == 'N' && b(6) == 'a' &&
      b(7) == 'P' && b(8) == 'p' && b(9) == 'Y'

  private def drain(in: java.io.InputStream, sizeHint: Int,
      what: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, sizeHint))
    val buf = new Array[Byte](8192)
    try {
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch {
      case e: java.io.IOException => throw new IllegalArgumentException(
        s"inflate: corrupt $what payload (${e.getMessage})")
    } finally in.close()
    out.toByteArray
  }

  private[graft] def maybeInflate(b: Array[Byte]): Array[Byte] =
    if (isGzip(b))
      drain(new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b)), b.length * 4, "gzip")
    else if (isZstd(b))
      // default (non-continuous) mode reads ACROSS concatenated
      // frames — the dump shape, zstd's gzip-member twin — and still
      // fails loudly on a truncated frame (continuous mode would
      // swallow the truncation: it exists for not-yet-complete
      // socket streams, not for at-rest payloads)
      drain(new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(b)), b.length * 4, "zstd")
    else if (isXz(b))
      // XZInputStream (not SingleXZInputStream): reads concatenated
      // streams + stream padding whole, the multi-member convention
      // shared with the other three codecs
      drain(new org.tukaani.xz.XZInputStream(
        new java.io.ByteArrayInputStream(b)), b.length * 4, "xz")
    else if (isBzip2(b))
      drain(new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
        new java.io.ByteArrayInputStream(b), true), b.length * 4, "bzip2")
    else if (isLz4(b))
      // decompressConcatenated = true: multi-frame dumps read whole,
      // the same member convention as the other codecs
      drain(new org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorInputStream(
        new java.io.ByteArrayInputStream(b), true), b.length * 4, "lz4")
    else if (isSnappy(b))
      drain(new org.apache.commons.compress.compressors.snappy.FramedSnappyCompressorInputStream(
        new java.io.ByteArrayInputStream(b)), b.length * 4, "snappy")
    else b

  private[graft] def gzip(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(b)
    gz.close()
    bo.toByteArray
  }

  private[graft] def zstd(b: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(b)

  // test/synth-side encoders. Fast presets on purpose: the ENCODE only
  // exists to exercise the decode path, and LZMA2's default level 6
  // costs ~10 ms per synthetic capture — measured as the dominant
  // term of the mm_crawl gate before the preset drop. The decoders
  // are preset-agnostic.
  private[graft] def xz(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val x = new org.tukaani.xz.XZOutputStream(bo,
      new org.tukaani.xz.LZMA2Options(0))
    x.write(b); x.finish(); x.close()
    bo.toByteArray
  }

  private[graft] def bzip2(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val z = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(bo, 1) // 100k blocks: synth-speed
    z.write(b); z.close()
    bo.toByteArray
  }

  private[graft] def lz4(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val z = new org.apache.commons.compress.compressors.lz4
      .FramedLZ4CompressorOutputStream(bo)
    z.write(b); z.close()
    bo.toByteArray
  }

  private[graft] def snappy(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val z = new org.apache.commons.compress.compressors.snappy
      .FramedSnappyCompressorOutputStream(bo)
    z.write(b); z.close()
    bo.toByteArray
  }
}
