package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** tokens: array<string> → the L2-normalized, 6dp-rounded linear
  * projection of the document's tf-idf vector — the fused in-plan form
  * of every fitted projection channel's embedding (LSA / SGNS serving,
  * `graft.operators.ProjectionEncoder`).
  *
  * This replaces the O(V·len) per-term `filter` HOF passes plus the
  * O(V·dim) interpreted zip_with/aggregate folds (the seam the round-9
  * survey documented as untenable past V ≈ 1k) with one hash-map count
  * pass O(len) and a SPARSE projection O(nnz·dim) — the arithmetic is
  * the EXACT encodeLocal fold (ascending vocab index, ((0+x₀p₀)+x₁p₁)+…
  * with exact-zero terms skipped, which is bit-identical because
  * adding ±0.0 to a running double sum never changes it here), so the
  * in-plan / driver 6dp bit-parity contract is preserved and
  * spec-asserted per channel.
  *
  * `proj` is stored TERM-major (`proj(termIdx)(d)`) so the sparse loop
  * walks one contiguous row per present term. */
case class ProjectTfidf(child: Expression, vocab: Seq[String],
    idf: Seq[Double], projByTerm: Seq[Seq[Double]], dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType)

  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.length * 2)
    vocab.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), i)
    }
    m
  }
  @transient private lazy val idfArr: Array[Double] = idf.toArray
  @transient private lazy val projArr: Array[Array[Double]] =
    projByTerm.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // Present-term vocab indices, duplicates = term frequency. O(len)
    // space — never a V-sized buffer, so serving cost is V-independent.
    val hits = new Array[Int](math.max(n, 1))
    var nh = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val idx = index.get(t)
        if (idx != null) { hits(nh) = idx.intValue; nh += 1 }
      }
      i += 1
    }
    // Ascending vocab index = the encodeLocal fold order (bit-parity).
    java.util.Arrays.sort(hits, 0, nh)
    val lat = new Array[Double](dim)
    i = 0
    while (i < nh) {
      val idx = hits(i)
      var c = 1
      while (i + 1 < nh && hits(i + 1) == idx) { c += 1; i += 1 }
      val x = c.toDouble * idfArr(idx)
      if (x != 0.0) {
        val row = projArr(idx)
        var d = 0
        while (d < dim) { lat(d) += x * row(d); d += 1 }
      }
      i += 1
    }
    var sq = 0.0
    var d = 0
    while (d < dim) { sq += lat(d) * lat(d); d += 1 }
    val nrm = math.max(math.sqrt(sq), 1e-12)
    d = 0
    while (d < dim) {
      // identical to Spark's round(double, 6): HALF_UP on BigDecimal
      lat(d) = BigDecimal(lat(d) / nrm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      d += 1
    }
    new GenericArrayData(lat)
  }

  override protected def withNewChildInternal(c: Expression): ProjectTfidf =
    copy(child = c)
}

object ProjectTfidf {
  /** `proj` rows are latent dims (dim × V, the fit's natural shape);
    * transposed here once to term-major for the sparse serving loop. */
  def apply(tokens: Column, vocab: Array[String], idf: Array[Double],
      proj: Array[Array[Double]], dim: Int): Column = {
    val byTerm: Seq[Seq[Double]] =
      vocab.indices.map(i => proj.map(_(i)).toSeq)
    org.apache.spark.sql.graft.ColumnBridge.column(ProjectTfidf(
      org.apache.spark.sql.graft.ColumnBridge.expression(tokens),
      vocab.toSeq, idf.toSeq, byTerm, dim))
  }
}
