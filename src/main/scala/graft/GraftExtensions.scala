package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import graft.functions.expressions._

/** Session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT dot_product(a, b) ...")` works the
  * same as the Column API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectResolutionRule(_ => new graft.plans.ResolveKnnJoin)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intArg(e: Expression): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }

  /** (identifier, doc, builder) triples — the injectFunction payload. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("hashing_counts"),
      info("hashing_counts", "hashing_counts(tokens, dim) - hashing-trick bucket counts"),
      (args: Seq[Expression]) => HashingCounts(args.head, intArg(args(1)))),
    (FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(tokens) - 60-bit simhash fingerprint"),
      (args: Seq[Expression]) => SimHash60(args.head)),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, seeds) - minhash signature array"),
      (args: Seq[Expression]) => MinHashSignature(args.head, intArg(args(1)))),
    (FunctionIdentifier("top_k_by_score"),
      info("top_k_by_score", "top_k_by_score(score, id, k) - bounded top-k aggregate"),
      (args: Seq[Expression]) =>
        TopKByScore(args(0), args(1), intArg(args(2))): AggregateFunction))
}
