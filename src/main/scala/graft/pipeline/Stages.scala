package graft.pipeline

import org.apache.spark.sql.DataFrame
import graft.core.Cardinality
import graft.opt.JoinGraph
import graft.plans.{JoinTree, PhysicalOperatorAssignment, PlanParameterization}
import graft.qal.QueryFacade

/** Optimization-stage contracts — ports of the reference's stage traits
  * (/root/reference/postbound/_stages.py:411-906). Each stage sees the
  * query façade + join graph and produces its slice of the final plan.
  */
trait OptimizationStage {
  /** Reproducibility metadata, exported with benchmark results (reference
    * convention: describe() JSON, /root/reference/postbound/bench.py:1236). */
  def describe: String
}

/** Stage 1: join ordering (reference: JoinOrderOptimization,
  * _stages.py:411-459). None = leave order to Spark. */
trait JoinOrderOptimization extends OptimizationStage {
  def optimizeJoinOrder(q: QueryFacade, graph: JoinGraph): Option[JoinTree[Cardinality]]
}

/** Stage 2: physical operator selection (reference:
  * PhysicalOperatorSelection, _stages.py:480-531). */
trait PhysicalOperatorSelection extends OptimizationStage {
  def selectPhysicalOperators(q: QueryFacade, graph: JoinGraph,
      joinOrder: Option[JoinTree[Cardinality]]): PhysicalOperatorAssignment
}

/** Stage 3: plan parameterization — per-intermediate cardinalities, worker
  * counts, session settings (reference: ParameterGeneration,
  * _stages.py:532-591). */
trait ParameterGeneration extends OptimizationStage {
  def generatePlanParameters(q: QueryFacade, graph: JoinGraph,
      joinOrder: Option[JoinTree[Cardinality]],
      operators: PhysicalOperatorAssignment): PlanParameterization
}

/** Cardinality estimation for the textbook pipeline (reference:
  * CardinalityEstimator, _stages.py:641-660). */
trait CardinalityEstimator extends OptimizationStage {
  def calculateEstimate(graph: JoinGraph, tables: Set[String]): Cardinality
}

/** Cost model (reference: CostModel, _stages.py:786-814; children of the
  * plan are assumed already estimated). */
trait CostModel extends OptimizationStage {
  def estimateCost(graph: JoinGraph, plan: JoinTree[Cardinality]): Double
}

/** Plan enumerator (reference: PlanEnumerator, _stages.py:849-906). */
trait PlanEnumerator extends OptimizationStage {
  def generateExecutionPlan(q: QueryFacade, graph: JoinGraph,
      cost: CostModel, card: CardinalityEstimator): JoinTree[Cardinality]
}

/** Validation pre-check gating which queries a pipeline accepts (reference:
  * OptimizationPreCheck, validation.py:219). */
trait OptimizationPreCheck {
  def check(q: QueryFacade, graph: JoinGraph): Either[String, Unit]
}

/** Reference EquiJoinPreCheck (validation.py:464): conjunctive equi-joins,
  * connected graph, >= 2 tables. */
object EquiJoinPreCheck extends OptimizationPreCheck {
  def check(q: QueryFacade, graph: JoinGraph): Either[String, Unit] =
    if (graph.tables.size < 2) Left("fewer than 2 tables")
    else if (graph.edges.isEmpty) Left("no join edges")
    else if (!graph.isConnected) Left("join graph not connected")
    else if (graph.edges.exists(_.equiColumns.isEmpty)) Left("non-equi join edge")
    else Right(())
}
