package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The header-meta caption in ONE pass: base64-decode the payload once
  * and try the image then the media container walk ([[ImageHeader]] /
  * [[MediaHeader]]) — "a WxH FMT image" or "a X.Xs FMT clip", null for
  * anything neither walk reads (the caller's stub-fallback seam).
  * Composing the two `*HeaderMeta` expressions under a `when` instead
  * would decode and walk the payload once per BRANCH (CodegenFallback
  * expressions get no common-subexpression elimination), doubling the
  * caption hot path's per-row work. */
case class HeaderCaption(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"HeaderCaption wants binary or base64 string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes: Array[Byte] = input match {
      case b: Array[Byte] => b
      case s: UTF8String =>
        try java.util.Base64.getMimeDecoder.decode(s.toString)
        catch { case _: IllegalArgumentException => return null }
      case _ => return null
    }
    ImageHeader.decode(bytes) match {
      case Some((f, w, h)) =>
        UTF8String.fromString(s"a ${w}x$h $f image")
      case None => MediaHeader.decode(bytes) match {
        case Some(m) if m.durationMs != null =>
          // one decimal place, HALF_UP — the decimal(12,1) cast grid
          val secs = BigDecimal(m.durationMs.toDouble / 1000.0)
            .setScale(1, BigDecimal.RoundingMode.HALF_UP)
          UTF8String.fromString(s"a ${secs}s ${m.container} clip")
        case _ => null // unknown duration or opaque: the stub's case
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): HeaderCaption =
    copy(child = c)
}

object HeaderCaption {
  def apply(payload: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(HeaderCaption(
      org.apache.spark.sql.graft.ColumnBridge.expression(payload)))
}
