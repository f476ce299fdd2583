package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass RP-LSH signature: `array<double>` vector → one
  * `tables`-element array of `planes`-char '0'/'1' strings (the
  * per-table sign signatures the embedding-dedup bucket join keys on).
  *
  * The Column formulation ([[graft.operators.Dedup.embedPairsOf]]'s
  * old body) expanded to tables × planes separate
  * `when(DotProduct(v, typedLit(plane)) >= 0, 1)` expressions, each
  * carrying its own 64-double literal — at the PINNED 8×12 geometry
  * (96 exprs) that stays inside whole-stage codegen, but the
  * scale-adaptive geometry grows planes with log₂(n) and the generated
  * projection blows past the JIT/codegen method limits, falling back
  * to interpreted evaluation: measured 2× WORSE wall at sf1 despite
  * 5.6× fewer candidate pairs. This expression is the same arithmetic
  * as one fused primitive loop over a plane matrix held as a reference
  * object — generated code size is CONSTANT in the geometry.
  *
  * Bit-parity contract with the replaced form (the dd_embed_lsh oracle
  * hash-checks it end-to-end): per-plane dot accumulates dims in order
  * over the min(|v|, |plane|) prefix (identical Scala arithmetic on
  * identical doubles — [[DotProduct]]'s exact loop), sign `>= 0` maps
  * to '1' else '0', and table t's string is its planes in order —
  * byte-identical to `concat_ws("", bits.cast("string"))`. Finite
  * inputs only (a NaN dot maps to '0' both here and in the old form:
  * `NaN >= 0` is false in both).
  */
case class RpSignature(child: Expression,
    planes: Array[Array[Array[Double]]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[UTF8String](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      val bytes = new Array[Byte](table.length)
      var p = 0
      while (p < table.length) {
        val plane = table(p)
        val lim = math.min(n, plane.length)
        var acc = 0.0
        var d = 0
        while (d < lim) { acc += v.getDouble(d) * plane(d); d += 1 }
        bytes(p) = if (acc >= 0) '1' else '0'
        p += 1
      }
      out(t) = UTF8String.fromBytes(bytes)
      t += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("rpPlanes", planes, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val table = ctx.freshName("table")
      val bytes = ctx.freshName("bytes")
      val p = ctx.freshName("p")
      val plane = ctx.freshName("plane")
      val lim = ctx.freshName("lim")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |org.apache.spark.unsafe.types.UTF8String[] $out =
         |  new org.apache.spark.unsafe.types.UTF8String[${planes.length}];
         |for (int $t = 0; $t < ${planes.length}; $t++) {
         |  double[][] $table = $planesRef[$t];
         |  byte[] $bytes = new byte[$table.length];
         |  for (int $p = 0; $p < $table.length; $p++) {
         |    double[] $plane = $table[$p];
         |    int $lim = java.lang.Math.min($n, $plane.length);
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $lim; $d++) {
         |      $acc += $a.getDouble($d) * $plane[$d];
         |    }
         |    $bytes[$p] = ($acc >= 0) ? (byte) '1' : (byte) '0';
         |  }
         |  $out[$t] = org.apache.spark.unsafe.types.UTF8String.fromBytes($bytes);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RpSignature =
    copy(child = newChild)
}

object RpSignature {
  def apply(v: Column, planes: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      RpSignature(org.apache.spark.sql.graft.ColumnBridge.expression(v), planes))
}
