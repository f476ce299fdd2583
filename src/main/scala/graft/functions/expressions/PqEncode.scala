package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** One-pass PQ encoder: `array<double>` vector → the `books.length`
  * sub-quantizer codes (argmin L2 per subspace as
  * `argmax(<sub,c> − |c|²/2)`, ties to the lowest code).
  *
  * The Column formulation ([[graft.operators.AnnIndex.encodeSub]]'s
  * old body) expanded to M×K (= 256) `slice` + dot + constant
  * expressions per row — every codebook entry re-sliced the subvector
  * into a fresh array before its dot, and the argmax ran through
  * `array_position(array(...), array_max(...))` over a 16-element
  * array built per subspace per row. This expression is the same
  * arithmetic as ONE fused primitive loop — no allocations beyond the
  * output codes — and participates in whole-stage codegen, keeping
  * the index-build encode pass (every store build, append, and
  * ann_pq/ann_ivfpq query) inside a single JIT stage.
  *
  * Bit-parity contract with the replaced form (what the `_exh` hash
  * checks and NativeExpressionPropsSpec pin): per-entry score
  * accumulates dims in order then subtracts the driver-precomputed
  * `|c|²/2` (identical Scala arithmetic on identical doubles); the
  * first maximal score wins (strict `>` scan ≡ array_position's first
  * occurrence of the max); a vector shorter than `(m+1)·subDim`
  * contributes only its available dims (≡ slice/dot truncation).
  *
  * NaN exclusion: the parity contract covers finite inputs only. The
  * old `array_max`/`array_position` form treats NaN as the maximum
  * (a NaN score would win its subspace's argmax), while this `s >
  * best` scan never selects a NaN score — a vector containing NaN can
  * encode differently between the two forms. Unreachable here (the
  * deterministic hash embedders never produce NaN, and no finite
  * vector yields a NaN dot against finite codebooks), and the fused
  * behavior — ignore NaN-scoring entries rather than crown them — is
  * the one a real encoder would want if NaN inputs ever became legal.
  */
case class PqEncode(child: Expression,
    books: Array[Array[Array[Double]]], subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  /** −offset per codebook entry, same arithmetic as the old
    * `lit(c.map(x => x * x).sum / 2)` constants. */
  private lazy val chalf: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum / 2))

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Int](books.length)
    var mi = 0
    while (mi < books.length) {
      val book = books(mi)
      val half = chalf(mi)
      val base = mi * subDim
      val lim = math.min(subDim, math.max(0, n - base))
      var bestK = 0
      var best = Double.NegativeInfinity
      var k = 0
      while (k < book.length) {
        val c = book(k)
        var acc = 0.0
        var d = 0
        while (d < lim) { acc += v.getDouble(base + d) * c(d); d += 1 }
        val s = acc - half(k)
        if (s > best) { best = s; bestK = k }
        k += 1
      }
      out(mi) = bestK
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    val chalfRef = ctx.addReferenceObj("pqChalf", chalf, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val book = ctx.freshName("book")
      val half = ctx.freshName("half")
      val base = ctx.freshName("base")
      val lim = ctx.freshName("lim")
      val bestK = ctx.freshName("bestK")
      val best = ctx.freshName("best")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |int[] $out = new int[${books.length}];
         |for (int $mi = 0; $mi < ${books.length}; $mi++) {
         |  double[][] $book = $booksRef[$mi];
         |  double[] $half = $chalfRef[$mi];
         |  int $base = $mi * $subDim;
         |  int $lim = java.lang.Math.min($subDim, java.lang.Math.max(0, $n - $base));
         |  int $bestK = 0;
         |  double $best = Double.NEGATIVE_INFINITY;
         |  for (int $k = 0; $k < $book.length; $k++) {
         |    double[] $c = $book[$k];
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $lim; $d++) {
         |      $acc += $a.getDouble($base + $d) * $c[$d];
         |    }
         |    double $s = $acc - $half[$k];
         |    if ($s > $best) { $best = $s; $bestK = $k; }
         |  }
         |  $out[$mi] = $bestK;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(v: Column, books: Array[Array[Array[Double]]], subDim: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      PqEncode(org.apache.spark.sql.graft.ColumnBridge.expression(v), books, subDim))
}
