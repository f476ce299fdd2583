package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Serving side of [[graft.operators.LangIdClassifier]] — one narrow
  * per-row evaluation of the trained hashed-char-n-gram softmax
  * classifier: featurize the text (the EXACT train-time extractor,
  * [[graft.operators.LangIdClassifier.featureIndices]]) and emit the
  * argmax language label. The weight matrix ships in the expression
  * tree like [[ProjectTfidf]]'s projection (classes × dim doubles,
  * ≤ a few hundred KB — a bounded task-binary payload, never a
  * shuffle). O(len · |ngrams|) per row, vocabulary-free by
  * construction: hashing needs no dictionary lookup at serve time. */
case class LangIdPredict(child: Expression, langs: Seq[String],
    dim: Int, w: Seq[Seq[Double]], b: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"LangIdPredict needs a string column, got ${child.dataType.catalogString}")

  @transient private lazy val wArr: Array[Array[Double]] =
    w.map(_.toArray).toArray
  @transient private lazy val bArr: Array[Double] = b.toArray
  @transient private lazy val labels: Array[UTF8String] =
    langs.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val k = graft.operators.LangIdClassifier.predictIndex(
      input.asInstanceOf[UTF8String].toString, dim, wArr, bArr)
    labels(k)
  }

  override protected def withNewChildInternal(c: Expression): LangIdPredict =
    copy(child = c)
}

object LangIdPredict {
  def apply(text: Column, langs: Seq[String], dim: Int,
      w: Seq[Seq[Double]], b: Seq[Double]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(LangIdPredict(
      org.apache.spark.sql.graft.ColumnBridge.expression(text),
      langs, dim, w, b))
}

/** [[LangIdPredict]]'s score-shaped sibling: the softmax PROBABILITY
  * of one class instead of the argmax label — what a quality gate
  * thresholds (the margin matters, the winner alone does not). Same
  * featurizer, same plan economics. */
case class LangIdProb(child: Expression, cls: Int,
    dim: Int, w: Seq[Seq[Double]], b: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"LangIdProb needs a string column, got ${child.dataType.catalogString}")

  @transient private lazy val wArr: Array[Array[Double]] =
    w.map(_.toArray).toArray
  @transient private lazy val bArr: Array[Double] = b.toArray

  override def nullSafeEval(input: Any): Any =
    graft.operators.LangIdClassifier.classProb(
      input.asInstanceOf[UTF8String].toString, cls, dim, wArr, bArr)

  override protected def withNewChildInternal(c: Expression): LangIdProb =
    copy(child = c)
}

object LangIdProb {
  def apply(text: Column, cls: Int, dim: Int,
      w: Seq[Seq[Double]], b: Seq[Double]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(LangIdProb(
      org.apache.spark.sql.graft.ColumnBridge.expression(text),
      cls, dim, w, b))
}
