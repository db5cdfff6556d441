package graft.opt

import graft.core.{Cardinality, JoinOperator}
import graft.pipeline.{CardinalityEstimator, CompleteOptimizationAlgorithm,
  OptState}
import graft.plans.{JoinNode, JoinTree, PhysicalOperatorAssignment, ScanNode}
import graft.qal.QueryFacade

/** Per-operator physical cost model: what C_out cannot express — the cost
  * of a join depends on WHICH operator executes it. Unit-less textbook
  * terms over estimated cardinalities (comparable only within this model,
  * same caveat as the reference's cost convention, _qep.py:416-424):
  * hash join pays build+probe, sort-merge pays the sorts, broadcast pays a
  * replication penalty on the build side, nested-loop pays the product.
  */
object OperatorCostModel {

  private def log2(x: Double): Double = math.log(math.max(x, 2.0)) / math.log(2.0)

  /** Local cost of joining inputs of `cl`/`cr` rows with `op`. Shuffled
    * operators pay for exchanging BOTH sides — avoiding the big-side
    * exchange is exactly why broadcast wins for small build sides. */
  def joinCost(op: JoinOperator, cl: Double, cr: Double): Double = op match {
    case JoinOperator.HashJoin => 2.0 * cl + 2.5 * cr
    case JoinOperator.SortMergeJoin => cl * log2(cl) + cr * log2(cr)
    case JoinOperator.BroadcastHashJoin |
         JoinOperator.IndexNestedLoopJoin => cl + 8.0 * cr
    case JoinOperator.NestedLoopJoin => cl * cr
  }

  private def cardOf(t: JoinTree[Cardinality]): Double =
    math.max(if (t.annotation.isValid) t.annotation.value else 1.0, 1.0)

  /** Total plan cost: per-join operator costs + C_out term. */
  def cost(tree: JoinTree[Cardinality],
      ops: PhysicalOperatorAssignment): Double = tree match {
    case _: ScanNode[Cardinality] => 0.0
    case j @ JoinNode(o, i, a) =>
      val local = joinCost(
        ops.operatorFor(j.tableSet).getOrElse(JoinOperator.HashJoin),
        cardOf(o), cardOf(i))
      local + math.max(a.value, 0.0) + cost(o, ops) + cost(i, ops)
  }
}

/** BAO-style plan selection (reference example-07-plan-selection.py): span
  * a candidate space by restricting physical operators, cost every
  * candidate, keep the cheapest. Because [[OperatorCostModel]] costs are
  * local to each join, the argmin decomposes per join — every join gets
  * its individually cheapest operator rather than one global hint, which
  * covers the example's whole candidate space in linear time.
  */
final class BaoStylePlanSelection(estimator: CardinalityEstimator,
    joinOrder: graft.pipeline.JoinOrderOptimization = new UESJoinOrderOptimizer,
    candidates: Seq[JoinOperator] = Seq(JoinOperator.HashJoin,
      JoinOperator.SortMergeJoin, JoinOperator.BroadcastHashJoin))
    extends CompleteOptimizationAlgorithm {

  def describe: String =
    s"""{"name":"bao-style-selection","candidates":[${
      candidates.map(c => s""""${c.name}"""").mkString(",")}]}"""

  def optimizeQuery(q: QueryFacade, graph: JoinGraph): OptState =
    joinOrder.optimizeJoinOrder(q, graph) match {
      case None => OptState()
      case Some(tree0) =>
        def annotate(t: JoinTree[Cardinality]): JoinTree[Cardinality] = t match {
          case ScanNode(tr, _) =>
            ScanNode(tr, estimator.calculateEstimate(graph, Set(tr.identifier)))
          case j @ JoinNode(o, i, _) =>
            JoinNode(annotate(o), annotate(i),
              estimator.calculateEstimate(graph, j.tableSet))
        }
        val tree = annotate(tree0)
        def cardOf(t: JoinTree[Cardinality]): Double =
          math.max(if (t.annotation.isValid) t.annotation.value else 1.0, 1.0)
        def assign(t: JoinTree[Cardinality],
            asg: PhysicalOperatorAssignment): PhysicalOperatorAssignment =
          t match {
            case _: ScanNode[Cardinality] => asg
            case j @ JoinNode(o, i, _) =>
              val best = candidates.minBy(op =>
                (OperatorCostModel.joinCost(op, cardOf(o), cardOf(i)), op.name))
              assign(i, assign(o, asg)).withJoin(j.tableSet, best)
          }
        OptState(Some(tree), assign(tree, PhysicalOperatorAssignment()))
    }
}
