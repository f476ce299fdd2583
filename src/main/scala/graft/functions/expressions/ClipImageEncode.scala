package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The IMAGE tower of a fitted cross-modal channel
  * ([[graft.operators.ClipEncoder]]): payload bytes → a fixed
  * byte-level feature vector ([[ClipImageModel.features]]: container
  * header fields + byte-distribution statistics — no image libraries,
  * no pixel decode) → a small fitted MLP forward pass → L2-normalize →
  * round(6) — the library's embedder parity grid. The arithmetic is ONE
  * shared definition ([[ClipImageModel.embed]]) called from both this
  * in-plan Expression and the driver-local serving twin, so the
  * Column/local bit-parity contract every registry channel carries
  * holds by construction.
  *
  * Non-image inputs (strings that don't decode to a known container)
  * yield null — the channel's `encode` composes this under a
  * `when(ImageHeaderMeta(c).isNotNull, …)` branch whose OTHERWISE arm
  * is the text tower, so null never reaches the store. Per-row narrow
  * work (O(len) over the payload + O(p·h + h·d) forward), no shuffle:
  * the 100 TB shape of an embedding stage. */
case class ClipImageEncode(child: Expression,
    w1: Seq[Seq[Double]], b1: Seq[Double],
    w2: Seq[Seq[Double]], b2: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ClipImageEncode wants binary or base64 string, got ${child.dataType.catalogString}")

  @transient private lazy val model = ClipImageModel(
    w1.map(_.toArray).toArray, b1.toArray,
    w2.map(_.toArray).toArray, b2.toArray)

  override def nullSafeEval(input: Any): Any = {
    val bytes: Array[Byte] = input match {
      case b: Array[Byte] => b
      case s: UTF8String =>
        try java.util.Base64.getMimeDecoder.decode(s.toString)
        catch { case _: IllegalArgumentException => return null }
      case _ => return null
    }
    ImageHeader.decode(bytes) match {
      case Some((f, w, h)) => new GenericArrayData(model.embed(bytes, f, w, h))
      case None => null
    }
  }

  override protected def withNewChildInternal(c: Expression): ClipImageEncode =
    copy(child = c)
}

object ClipImageEncode {
  def apply(payload: Column, m: ClipImageModel): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(ClipImageEncode(
      org.apache.spark.sql.graft.ColumnBridge.expression(payload),
      m.w1.map(_.toSeq).toSeq, m.b1.toSeq,
      m.w2.map(_.toSeq).toSeq, m.b2.toSeq))
}

/** A fitted image tower: x(P) → tanh(w1·x + b1)(H) → (w2·a + b2)(dim),
  * L2-normalized and 6dp-rounded. `w1` is H rows × P columns, `w2` is
  * dim rows × H columns. Plain driver state (a few hundred KB), carried
  * into the plan as Expression literals — a broadcast, never a join. */
final case class ClipImageModel(w1: Array[Array[Double]], b1: Array[Double],
    w2: Array[Array[Double]], b2: Array[Double]) {

  def dim: Int = b2.length

  /** Forward pass + the shared normalize/round grid. Fold orders are
    * fixed (ascending feature/hidden index) — refits and the in-plan /
    * local twins are bit-identical because they all run THIS method. */
  def embed(bytes: Array[Byte], fmt: String, w: Long, h: Long): Array[Double] = {
    val x = ClipImageModel.features(bytes, fmt, w, h)
    val hid = new Array[Double](b1.length)
    var j = 0
    while (j < b1.length) {
      var acc = b1(j)
      val row = w1(j)
      var i = 0
      while (i < x.length) { acc += row(i) * x(i); i += 1 }
      hid(j) = math.tanh(acc)
      j += 1
    }
    val out = new Array[Double](b2.length)
    var d = 0
    while (d < b2.length) {
      var acc = b2(d)
      val row = w2(d)
      j = 0
      while (j < hid.length) { acc += row(j) * hid(j); j += 1 }
      out(d) = acc
      d += 1
    }
    var sq = 0.0
    d = 0
    while (d < out.length) { sq += out(d) * out(d); d += 1 }
    val nrm = math.max(math.sqrt(sq), 1e-12)
    d = 0
    while (d < out.length) {
      // identical to Spark's round(double, 6): HALF_UP on BigDecimal
      out(d) = BigDecimal(out(d) / nrm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      d += 1
    }
    out
  }
}

object ClipImageModel {

  /** Container formats the feature map one-hots — exactly the set
    * [[ImageHeader.decode]] can produce. */
  val Formats: Seq[String] = Seq("png", "gif", "bmp", "jpeg")

  /** Byte-histogram bins (256 values / 8 per bin). */
  val HistBins = 32

  /** Hashed-geometry buckets (the feature-hashing trick, Weinberger
    * et al. 2009, public): header (width, height) as a categorical —
    * the caption's "WxH" token IS categorical, so the tower gets the
    * geometry both ways, continuous (interpolates) and hashed
    * (discriminates exact dims). A-priori fixed map, no fit state. */
  val PairBuckets = 64
  val SideBuckets = 16

  /** Feature width: format one-hot + log-scale geometry (width,
    * height, aspect, byte length) + hashed (w,h)/w/h one-hots + byte
    * histogram + byte mean/stddev. */
  val P: Int = Formats.length + 4 + PairBuckets + 2 * SideBuckets + HistBins + 2

  /** The fixed byte-level feature map — header fields the container
    * declares plus CONTENT statistics: when the payload really
    * decodes (the full [[PixelDecode.tryDecodeLuma]] scope — PNG,
    * BMP, GIF, JPEG including progressive, TIFF, WebP VP8L) the
    * histogram/mean/stddev run over the decoded LUMA pixels, so a
    * recompressed duplicate maps to near-identical features;
    * everything else (fake headers, exotic variants) falls back to
    * the container bytes, keeping the map total. NOTE: each decoder
    * added to tryDecodeLuma silently shifts feature semantics for
    * payloads that previously fell back to bytes — stored models
    * trained before a scope change are invalidated and must refit
    * (the store's model rows carry no feature-version pin by
    * design: refit is cheap, silent drift is not). The decode is per-row work in the
    * embedding path by DESIGN — content features are the point; the
    * dimension cap in the decoders bounds the worst case. Everything
    * is scaled to O(1) so the MLP trains on comparable magnitudes;
    * all loops are sequential, so the map is deterministic. */
  def features(bytes: Array[Byte], fmt: String, w: Long, h: Long): Array[Double] = {
    val content = PixelDecode.tryDecodeLuma(bytes).map(_.luma).getOrElse(bytes)
    val x = new Array[Double](P)
    val fi = Formats.indexOf(fmt)
    if (fi >= 0) x(fi) = 1.0
    val base = Formats.length
    x(base) = log2(w + 1.0) / 16.0
    x(base + 1) = log2(h + 1.0) / 16.0
    x(base + 2) = w.toDouble / math.max(1.0, (w + h).toDouble)
    x(base + 3) = log2(bytes.length + 1.0) / 24.0
    val hashed = base + 4
    // Knuth multiplicative mixing before the modulus: raw header dims
    // are typically multiples of 8/16, which would alias a plain mod
    x(hashed + (((w * 40503L + h * 9973L) * 2654435761L >>> 33)
      % PairBuckets).toInt) = 1.0
    x(hashed + PairBuckets +
      ((w * 2654435761L >>> 33) % SideBuckets).toInt) = 1.0
    x(hashed + PairBuckets + SideBuckets +
      ((h * 2654435761L >>> 33) % SideBuckets).toInt) = 1.0
    val hist = hashed + PairBuckets + 2 * SideBuckets
    var sum = 0.0
    var sumSq = 0.0
    var i = 0
    while (i < content.length) {
      val v = content(i) & 0xFF
      x(hist + (v >> 3)) += 1.0
      sum += v
      sumSq += v.toDouble * v
      i += 1
    }
    val n = math.max(1, content.length).toDouble
    i = 0
    while (i < HistBins) { x(hist + i) /= n; i += 1 }
    val mean = sum / n
    x(hist + HistBins) = mean / 255.0
    x(hist + HistBins + 1) =
      math.sqrt(math.max(0.0, sumSq / n - mean * mean)) / 255.0
    x
  }

  private def log2(v: Double): Double = math.log(v) / math.log(2.0)

  /** The tolerant payload sniff shared by the Column branch
    * ([[ImageHeaderMeta]] + [[ClipImageEncode]], both of which decode
    * this way) and the driver-local serving twin: base64 (MIME-tolerant,
    * Spark's own `unbase64` throws where queries are the normal case)
    * then the container-header walk. None → the input is text for the
    * channel's text tower. */
  def sniff(s: String): Option[(Array[Byte], String, Long, Long)] = {
    val bytes =
      try java.util.Base64.getMimeDecoder.decode(s)
      catch { case _: IllegalArgumentException => return None }
    ImageHeader.decode(bytes).map { case (f, w, h) => (bytes, f, w, h) }
  }
}
