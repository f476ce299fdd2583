package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float|double>` columns using
  * higher-order functions (`zip_with`/`aggregate`/`transform`) — these
  * evaluate inside whole-stage codegen with no serialization, unlike a
  * Scala UDF taking Seq[Float].
  *
  * Replaces the reference's sklearn cosine_similarity matrix call
  * (vector_db.py:684-696) with a per-pair expression Catalyst can
  * pipeline into joins and window operators.
  *
  * All math is double-precision (floats are upcast exactly), and the
  * left-fold in `dot` is sequential, so scores are deterministic.
  */
object VectorFunctions {

  /** Exact float→double upcast of an embedding column. */
  def toDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Dot product of two double-array columns — a native codegen'd
    * Expression (see [[expressions.DotProduct]]); the HOF formulation
    * `aggregate(zip_with(a,b,*),0,+)` evaluates interpreted and is
    * 10-50× slower on all-pairs joins. Same left-to-right summation
    * order, so results are bit-identical. */
  def dot(a: Column, b: Column): Column = expressions.DotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; pass precomputed norms to amortize over many
    * pairs (the kNN operators precompute one norm per row). */
  def cosine(a: Column, b: Column, aNorm: Column, bNorm: Column): Column =
    dot(a, b) / (aNorm * bNorm)

  /** L2-normalize, rounded to 6dp for cross-engine stability. */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => round(x / n, 6))
  }

  /** 32-bit Z-value: interleaves the low 16 bits of two non-negative
    * int columns (a in even positions, b in odd). Sorting a write by
    * this key clusters BOTH dimensions into each output file, so
    * min/max file stats prune range queries on either column — the
    * multi-dimensional layout a single-column sort can't give
    * (ZOrderSpec measures the skipping). Pure bit-op Columns: stays
    * in whole-stage codegen. */
  def zValue16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
}
