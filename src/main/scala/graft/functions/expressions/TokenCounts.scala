package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row token counts: array<string> → array<struct<token, tf>>,
  * one struct per distinct token (ordering: sorted by token bytes).
  * The NARROW replacement for the explode + (doc, token) groupBy
  * corpus shuffle wherever only per-document counts are needed
  * (tx_tfidf, tx_dsir).
  *
  * A native expression on purpose: the HOF formulation (array_sort +
  * a start-index filter + a transform reading the starts array)
  * re-evaluates its sub-arrays PER LAMBDA ELEMENT in the interpreted
  * path — higher-order functions are CodegenFallback and get no
  * common-subexpression elimination — which turned an O(n log n)
  * encode into O(n³ log n) per row (measured: a 50 k-doc pass that
  * should take ~2 s had burnt 60+ CPU-minutes before being killed).
  * Here the sort + single run-length scan happen once per row in
  * plain JVM code.
  *
  * Null array → null; null ELEMENTS are dropped (SQL tokens() never
  * yields them). Counts are longs. */
case class TokenCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(new StructType()
    .add("token", StringType)
    .add("tf", LongType))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"TokenCounts needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) toks.add(arr.getUTF8String(i))
      i += 1
    }
    java.util.Collections.sort(toks)
    val m = toks.size()
    val out = new java.util.ArrayList[InternalRow](m)
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && toks.get(j) == toks.get(i)) j += 1
      out.add(InternalRow(toks.get(i), (j - i).toLong))
      i = j
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): TokenCounts =
    copy(child = c)
}

object TokenCounts {
  def apply(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(TokenCounts(
      org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))
}
