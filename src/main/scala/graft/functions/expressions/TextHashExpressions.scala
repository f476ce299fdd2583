package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native forms of the md5-derived text hashes.
  *
  * The Column-API formulations (`transform(sequence(0,63), i ->
  * size(filter(bs, b = i)))`, per-bit vote folds, per-seed minhash
  * transforms) are semantically right but evaluate interpreted AND
  * re-evaluate their array inputs per outer element — Catalyst's
  * CollapseProject inlines a once-referenced alias regardless of how
  * many times the runtime lambda loop will evaluate it, turning O(n)
  * into O(dim·n) with an interpreted md5 in the middle. These
  * expressions do one pass per row in plain Java.
  *
  * Bit-compatibility contract (checked by the DuckDB oracles):
  *  - bucket(t)   = first md5 byte unsigned  % dim
  *                  == conv(substr(md5(t),1,2),16,10) % dim
  *  - hash32(s)   = first 4 md5 bytes as big-endian unsigned
  *                  == conv(substr(md5(s),1,8),16,10)
  *  - simhash bit i reads hex digit i/4, bit (3 - i%4), over the
  *    first 15 hex digits (60 bits) of md5(token).
  */
private[expressions] object Md5 {
  // MessageDigest.getInstance walks the provider registry per call —
  // measurable at millions of calls/task. One instance per task thread,
  // reset by digest() itself.
  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  def digest(s: UTF8String): Array[Byte] = local.get().digest(s.getBytes)

  /** First 4 digest bytes as a big-endian unsigned 32-bit value —
    * the oracle's `('0x'||substr(md5(x),1,8))::BIGINT`. */
  def hash32(s: UTF8String): Long = {
    val d = digest(s)
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }
}

/** tokens: array<string> → array<double> of length `dim`: per-bucket
  * token counts (the hashing-trick embedder's raw vector). With
  * `normalized=true`, L2-normalizes and rounds to 6dp in the same
  * pass — equivalent to round(x/sqrt(Σx²),6) but without the Column
  * formulation's per-element norm re-evaluation. */
case class HashingCounts(child: Expression, dim: Int, normalized: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Double](dim)
    var i = 0
    while (i < arr.numElements()) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val b0 = Md5.digest(t)(0) & 0xFF
        counts(b0 % dim) += 1.0
      }
      i += 1
    }
    if (normalized) {
      var sq = 0.0
      var j = 0
      while (j < dim) { sq += counts(j) * counts(j); j += 1 }
      val nrm = math.sqrt(sq)
      j = 0
      while (j < dim) {
        // identical to Spark's round(double, 6): HALF_UP on BigDecimal
        counts(j) = BigDecimal(counts(j) / nrm)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        j += 1
      }
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(c: Expression): HashingCounts =
    copy(child = c)
}

object HashingCounts {
  def apply(tokens: Column, dim: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(HashingCounts(org.apache.spark.sql.graft.ColumnBridge.expression(tokens), dim))
  def normalized(tokens: Column, dim: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(HashingCounts(
      org.apache.spark.sql.graft.ColumnBridge.expression(tokens), dim, normalized = true))
}

/** tokens: array<string> → 60-bit SimHash fingerprint as long. */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {


  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](60)
    var i = 0
    while (i < arr.numElements()) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val d = Md5.digest(t)
        var bit = 0
        while (bit < 60) {
          val digit = bit / 4 // hex digit index 0..14
          val byte0 = d(digit / 2) & 0xFF
          val nibble = if (digit % 2 == 0) byte0 >>> 4 else byte0 & 0xF
          votes(bit) += (((nibble >>> (3 - bit % 4)) & 1) * 2) - 1
          bit += 1
        }
      }
      i += 1
    }
    var f = 0L
    var bit = 0
    while (bit < 60) { // MSB-first: acc*2 + sign(vote)
      f = f * 2 + (if (votes(bit) > 0) 1L else 0L)
      bit += 1
    }
    f
  }

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

object SimHash60 {
  def apply(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(SimHash60(org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))
}

/** shingles: array<string> → array<long> of `seeds` minhash values.
  *
  * One md5 digest per shingle (not per seed×shingle): the base hash
  * h = hash32(shingle) is permuted through `seeds` universal affine
  * hashes sig[k] = min over shingles of (a_k·h + b_k) mod P, with
  * P = 4294967311 (the smallest prime > 2^32) and a_k ∈ [1, 2^31)
  * so the product stays inside a signed 64-bit long. a_k/b_k are
  * md5-derived, so the signature is fully deterministic with no RNG
  * state. The LSH band join only needs sig equality — the exact-
  * Jaccard verifier downstream is what the oracle checks — so the
  * scheme is free to favor the 30× cheaper digest count
  * (DedupExactnessSpec proves recall is unchanged on this corpus). */
case class MinHashSignature(child: Expression, seeds: Int)
    extends UnaryExpression with CodegenFallback {

  import MinHashSignature.Prime

  @transient private lazy val (as, bs) = MinHashSignature.coefficients(seeds)

  override def dataType: DataType = ArrayType(LongType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill[Long](seeds)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = Md5.hash32(s)
        var k = 0
        while (k < seeds) {
          val m = (as(k) * h + bs(k)) % Prime
          if (m < sig(k)) sig(k) = m
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

object MinHashSignature {
  /** Smallest prime above 2^32 — the classic universal-hash modulus. */
  val Prime = 4294967311L

  /** md5-derived affine coefficients: a_k ∈ [1, 2^31), b_k ∈ [0, P). */
  private[expressions] def coefficients(seeds: Int): (Array[Long], Array[Long]) = {
    val as = new Array[Long](seeds)
    val bs = new Array[Long](seeds)
    var k = 0
    while (k < seeds) {
      as(k) = 1L + Md5.hash32(UTF8String.fromString(s"mha:$k")) % ((1L << 31) - 1)
      bs(k) = Md5.hash32(UTF8String.fromString(s"mhb:$k")) % Prime
      k += 1
    }
    (as, bs)
  }

  def apply(shingles: Column, seeds: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashSignature(org.apache.spark.sql.graft.ColumnBridge.expression(shingles), seeds))
}
