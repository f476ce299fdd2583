package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Serving side of [[graft.operators.BpeTokenizer]]: text → array of
  * subword tokens under the trained merge table. One narrow per-row
  * expression; the merge list is a few KB of plan literal (unlike the
  * projection models, nothing here warrants a broadcast). The word
  * split is the shared `tokensLocal` semantics, and the merge loop is
  * THE model's `tokenizeWord` — one definition, so in-plan and
  * driver-local tokenization cannot drift. */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"BpeTokenize needs a string column, got ${child.dataType.catalogString}")

  @transient private lazy val model =
    graft.operators.BpeTokenizer.Model(merges)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(model
      .tokenizeLocal(input.asInstanceOf[UTF8String].toString)
      .map(UTF8String.fromString).toArray[Any])

  override protected def withNewChildInternal(c: Expression): BpeTokenize =
    copy(child = c)
}

object BpeTokenize {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(BpeTokenize(
      org.apache.spark.sql.graft.ColumnBridge.expression(text), merges))
}
