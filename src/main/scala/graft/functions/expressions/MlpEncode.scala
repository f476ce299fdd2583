package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** A file-loadable feed-forward text encoder — the EXTERNAL-MODEL
  * seam of the channel registry (reference analog: the BGE/CLIP
  * checkpoints `vector_db.py:451-545` loads from disk). The in-repo
  * trained encoders (LSA/SGNS/CLIP-shape) prove the ChannelDef
  * plumbing with fits derived from the corpus; THIS class carries a
  * model whose weights arrive as a FILE a user exported from
  * somewhere else — the production hand-off a real deployment needs.
  *
  * Architecture (the GEM1 format, [[graft.operators.ExternalModelEncoder]]):
  * hashed bag-of-tokens features (FNV-1a 64 over the token bytes,
  * mixed with the file's seed, modulo the file's feature width) into
  * N dense layers (none/relu/tanh activations), L2-normalized and
  * rounded to 6dp — the library's embedder parity grid. The weights
  * are spec data read from the file; NOTHING here is fit in-repo.
  *
  * Serving forms, all sharing ONE forward implementation so they are
  * bit-identical by construction:
  *  - [[MlpEncode]]: the in-plan Column over a token array (torrent
  *    broadcast, the [[ProjectTfidf]] discipline);
  *  - [[MlpModel.embed]]: the driver-local form (one-job warm path);
  *  - [[graft.operators.ExternalModelEncoder.embedBatch]]: the
  *    mapPartitions BATCH-INFERENCE form — the seam where a real
  *    ONNX/torch session drops in.
  */
final class MlpModel(val featDim: Int, val seed: Long,
    val layers: Array[MlpModel.Layer]) extends Serializable {
  require(layers.nonEmpty, "GEM model needs at least one layer")
  require(layers.head.inDim == featDim,
    s"first layer expects ${layers.head.inDim} inputs, featurizer yields $featDim")
  for (i <- 1 until layers.length)
    require(layers(i).inDim == layers(i - 1).outDim,
      s"layer $i expects ${layers(i).inDim} inputs, layer ${i - 1} yields ${layers(i - 1).outDim}")

  /** Output embedding width. */
  def dim: Int = layers.last.outDim

  /** FNV-1a 64 over UTF-8 bytes, seed-mixed — the documented GEM1
    * featurizer hash (deterministic across JVMs, no library deps). */
  def bucket(token: String): Int = {
    val bytes = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    val m = (h % featDim).toInt
    if (m < 0) m + featDim else m
  }

  /** Raw hashed-count feature vector for a token multiset. */
  def featurize(tokens: Iterator[String]): Array[Double] = {
    val f = new Array[Double](featDim)
    tokens.foreach(t => f(bucket(t)) += 1.0)
    f
  }

  /** One forward pass (raw, pre-normalization). Fixed fold order —
    * ((0 + x₀w₀) + x₁w₁) + … — so every serving form is bit-identical. */
  def forward(feat: Array[Double]): Array[Double] = {
    var x = feat
    var li = 0
    while (li < layers.length) {
      val l = layers(li)
      val y = new Array[Double](l.outDim)
      var o = 0
      while (o < l.outDim) {
        val w = l.w(o)
        var acc = 0.0
        var i = 0
        while (i < x.length) { acc += x(i) * w(i); i += 1 }
        acc += l.b(o)
        y(o) = l.act match {
          case 0 => acc
          case 1 => if (acc > 0) acc else 0.0
          case 2 => StrictMath.tanh(acc)
        }
        o += 1
      }
      x = y
      li += 1
    }
    x
  }

  /** Normalize + 6dp round — the embedder parity grid. */
  def finish(raw: Array[Double]): Array[Double] = {
    var sq = 0.0
    var i = 0
    while (i < raw.length) { sq += raw(i) * raw(i); i += 1 }
    val nrm = math.max(math.sqrt(sq), 1e-12)
    val out = new Array[Double](raw.length)
    i = 0
    while (i < raw.length) {
      out(i) = BigDecimal(raw(i) / nrm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      i += 1
    }
    out
  }

  /** Driver-local embed (the one-job warm serving form). */
  def embed(text: String): Array[Double] = {
    val toks = {
      var a = 0; var b = text.length
      while (a < b && text.charAt(a) == ' ') a += 1
      while (b > a && text.charAt(b - 1) == ' ') b -= 1
      text.substring(a, b).split("\\s+", -1)
    }
    finish(forward(featurize(toks.iterator)))
  }

  /** BATCH inference — one call per `batchSize` inputs. Here it is a
    * loop over [[forward]]; a real runtime bridge replaces exactly
    * this method with its session call (inputs arrive batched, shapes
    * [batch, featDim] → [batch, dim]) and NOTHING else changes. */
  def forwardBatch(feats: Array[Array[Double]]): Array[Array[Double]] =
    feats.map(f => finish(forward(f)))
}

object MlpModel {
  /** One dense layer: `w` is outDim rows × inDim columns,
    * `act` ∈ {0 none, 1 relu, 2 tanh}. */
  final class Layer(val outDim: Int, val inDim: Int, val act: Int,
      val w: Array[Array[Double]], val b: Array[Double]) extends Serializable {
    require(act >= 0 && act <= 2, s"unknown activation code $act")
    require(w.length == outDim && w.forall(_.length == inDim) && b.length == outDim,
      "layer shape mismatch")
  }
}

/** In-plan serving column for a broadcast [[MlpModel]] over a token
  * array (the [[ProjectTfidf]] broadcast discipline — the model ships
  * once per executor, never with the plan). */
case class MlpEncode(child: Expression, model: Broadcast[MlpModel])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType)

  @transient private lazy val m: MlpModel = model.value

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val f = new Array[Double](m.featDim)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) f(m.bucket(arr.getUTF8String(i).toString)) += 1.0
      i += 1
    }
    new GenericArrayData(m.finish(m.forward(f)))
  }

  override protected def withNewChildInternal(c: Expression): MlpEncode =
    copy(child = c)
}

object MlpEncode {
  def apply(tokens: Column, model: Broadcast[MlpModel]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(MlpEncode(
      org.apache.spark.sql.graft.ColumnBridge.expression(tokens), model))
}
