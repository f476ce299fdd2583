package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedGenerator}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.functions.expressions.{DotProduct, TopKByScore}

/** `KNN JOIN` as a first-class logical operator.
  *
  * The node declares *what* to compute — per-query top-k cosine
  * neighbors over a corpus — and the injected resolution rule expands
  * it into the engine's canonical physical recipe (broadcast the query
  * side, codegen'd DotProduct per pair, map-side bounded TopKByScore,
  * explode to ranked rows). Operator authors get one logical concept;
  * Catalyst still sees only standard nodes afterwards, so every
  * existing optimization (pushdown through the join, AQE, broadcast
  * planning) applies unchanged.
  *
  * Contract: `corpus` exposes (n_id: long, cv: array<double>,
  * cnrm: double); `queries` exposes (q_id: long, qv: array<double>,
  * qnrm: double). Output: (q_id, rnk, n_id, sim_r).
  */
case class KnnJoinPlan(corpus: LogicalPlan, queries: LogicalPlan, k: Int)
    extends BinaryNode {
  override def left: LogicalPlan = corpus
  override def right: LogicalPlan = queries
  // resolved by expansion — the node never survives analysis
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Seq(
    AttributeReference("q_id", LongType)(),
    AttributeReference("rnk", LongType)(),
    AttributeReference("n_id", LongType)(),
    AttributeReference("sim_r", org.apache.spark.sql.types.DoubleType)())
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): KnnJoinPlan =
    copy(corpus = newLeft, queries = newRight)
}

/** Expands [[KnnJoinPlan]] during analysis; the partially-unresolved
  * expansion is finished by the analyzer's own fixed-point loop. */
class ResolveKnnJoin extends Rule[LogicalPlan] {

  private def ua(name: String) = UnresolvedAttribute(name)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case KnnJoinPlan(corpus, queries, k) if corpus.resolved && queries.resolved =>
      val joined = Join(corpus, queries, Cross, None,
        JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
      val sim = Alias(Round(
        Divide(DotProduct(ua("qv"), ua("cv")), Multiply(ua("qnrm"), ua("cnrm"))),
        Literal(4)), "sim_r")()
      val pairs = Project(Seq(ua("q_id"), ua("n_id"), sim), joined)
      val agg = Aggregate(Seq(ua("q_id")),
        Seq(ua("q_id"),
          Alias(TopKByScore(ua("sim_r"), ua("n_id"), k).toAggregateExpression(),
            "top")()),
        pairs)
      val gen = Generate(
        UnresolvedGenerator(FunctionIdentifier("posexplode"), Seq(ua("top"))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Nil, child = agg)
      Project(Seq(
        ua("q_id"),
        Alias(Cast(Add(ua("pos"), Literal(1)), LongType), "rnk")(),
        Alias(ua("col.id"), "n_id")(),
        Alias(ua("col.score"), "sim_r")()), gen)
  }
}
