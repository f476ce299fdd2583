package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Serving expression for [[graft.operators.RetrievalCaptioner]]:
  * base64 payload → image-tower embedding → nearest caption-tower
  * embedding's caption (cosine over unit vectors = dot product; ties
  * break toward the earlier bank entry, and the bank is sorted at fit
  * time, so serving is deterministic). Unreadable payloads → null
  * (the registry's stub-fallback seam). */
case class RetrievalCaption(child: Expression,
    model: Broadcast[RetrievalCaption.Model])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  @transient private lazy val m: RetrievalCaption.Model = model.value

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    m.caption(s) match {
      case null => null
      case c => UTF8String.fromString(c)
    }
  }

  override protected def withNewChildInternal(c: Expression): RetrievalCaption =
    copy(child = c)
}

object RetrievalCaption {
  /** The fitted artifact: image tower + the bounded caption bank
    * (sorted captions + their unit caption-tower embeddings). */
  final class Model(val img: ClipImageModel, val captions: Array[String],
      val vecs: Array[Array[Double]]) extends Serializable {
    require(captions.length == vecs.length && captions.nonEmpty,
      "caption bank shape mismatch")

    /** Nearest-caption retrieval; null when the payload's header no
      * parser reads (the caller coalesces to its stub). */
    def caption(payloadB64: String): String =
      ClipImageModel.sniff(payloadB64) match {
        case None => null
        case Some((bytes, f, w, h)) =>
          val q = img.embed(bytes, f, w, h)
          var best = 0
          var bestDot = Double.NegativeInfinity
          var i = 0
          while (i < vecs.length) {
            val v = vecs(i)
            var acc = 0.0
            var d = 0
            while (d < v.length) { acc += v(d) * q(d); d += 1 }
            if (acc > bestDot) { bestDot = acc; best = i }
            i += 1
          }
          captions(best)
      }
  }

  def apply(payloadB64: Column, model: Broadcast[Model]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(RetrievalCaption(
      org.apache.spark.sql.graft.ColumnBridge.expression(payloadB64), model))
}
