package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Transparent gzip for binary payloads: bytes with the 1f 8b magic
  * inflate (java.util.zip.GZIPInputStream, multi-member streams
  * included — the pigz/concatenated-dump shape), everything else
  * passes through untouched. Crawl dumps ship `.html.gz`/`.json.gz`;
  * sniffing the magic beats trusting file extensions, and the
  * pass-through makes it safe to wrap EVERY ingest payload. A
  * corrupt gzip body fails loudly (a truncated member is data loss,
  * not a pass-through case). */
case class Gunzip(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"Gunzip needs a binary payload, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Gunzip.maybeInflate(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(c: Expression): Gunzip =
    copy(child = c)
}

object Gunzip {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      Gunzip(org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  private[graft] def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0x1f && (b(1) & 0xFF) == 0x8b

  private[graft] def maybeInflate(b: Array[Byte]): Array[Byte] =
    if (!isGzip(b)) b
    else {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 4))
      val buf = new Array[Byte](8192)
      try {
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) out.write(buf, 0, n)
          n = in.read(buf)
        }
      } catch {
        case e: java.io.IOException => throw new IllegalArgumentException(
          s"gunzip: corrupt gzip payload (${e.getMessage})")
      } finally in.close()
      out.toByteArray
    }

  private[graft] def gzip(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(b)
    gz.close()
    bo.toByteArray
  }
}
