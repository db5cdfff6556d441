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

/** Online-learning contract for stages that improve from executed queries
  * (reference: the `learn_from_feedback` / `uses_online_learning` pair on
  * OptimizationStage, _stages.py:46-120 "Online Training"; the bench loop
  * calls it after every query execution, bench.py:1014). A stage mixes
  * this in and the pipeline's own [[MultiStageOptimizationPipeline
  * .learnFromFeedback]] fans the executed plan out to it.
  */
trait OnlineLearningStage {
  def usesOnlineLearning: Boolean = true
  /** @param result   the pipeline's decisions for the query
    * @param executed the executed DataFrame (SQLMetrics populated — the
    *                 caller must have run an action on it first)
    * @param execTimeMs wall-clock of the execution, the reference's
    *                 exec_time feedback signal */
  def learnFromFeedback(result: OptimizationResult,
      executed: DataFrame, execTimeMs: Double): Unit
}

/** Validation pre-check gating which queries a pipeline accepts (reference:
  * OptimizationPreCheck, validation.py:219). */
trait OptimizationPreCheck {
  def check(q: QueryFacade, graph: JoinGraph): Either[String, Unit]
}

/** Reference EquiJoinPreCheck (validation.py:464): conjunctive equi-joins,
  * connected graph, >= 2 tables. A pure theta edge between tables that are
  * ALSO reachable through equi edges does not disqualify the query — it is
  * applied as a residual predicate while the equi-subgraph drives ordering
  * (JOB-style self-join workloads need exactly this: `l1.line < l2.line`
  * alongside the shared `*.l_orderkey = o_orderkey` edges). Only a query
  * whose CONNECTIVITY depends on a non-equi edge is rejected. */
object EquiJoinPreCheck extends OptimizationPreCheck {
  def check(q: QueryFacade, graph: JoinGraph): Either[String, Unit] =
    if (graph.tables.size < 2) Left("fewer than 2 tables")
    else if (graph.edges.isEmpty) Left("no join edges")
    else if (!graph.isConnected) Left("join graph not connected")
    else if (!graph.isEquiConnected)
      Left("connectivity requires a non-equi join edge")
    else Right(())
}

/** Concrete feature-gate prechecks, ports of the reference's validation
  * checks (validation.py:419-695: set-operation / subquery / join-type
  * gates) over the analyzed Catalyst plan. A failed gate routes the query
  * to native execution, never to an error — same contract as the
  * reference's pipelines.
  */
object PreChecks {
  import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
  import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
  import org.apache.spark.sql.catalyst.plans.logical.{Except, Intersect, Join,
    Union}

  /** No UNION/INTERSECT/EXCEPT anywhere in the plan. */
  object NoSetOperations extends OptimizationPreCheck {
    def check(q: QueryFacade, graph: JoinGraph): Either[String, Unit] =
      q.analyzed.collectFirst {
        case u: Union => "UNION"
        case _: Intersect => "INTERSECT"
        case _: Except => "EXCEPT"
      }.toLeft(()).left.map(op => s"set operation present: $op")
  }

  /** No scalar/EXISTS/IN subquery expressions anywhere. */
  object NoSubqueries extends OptimizationPreCheck {
    def check(q: QueryFacade, graph: JoinGraph): Either[String, Unit] = {
      val has = q.analyzed.exists(_.expressions.exists(_.exists {
        case _: SubqueryExpression => true
        case _ => false
      }))
      if (has) Left("subquery expression present") else Right(())
    }
  }

  /** Inner/cross joins only — the UES assumption (outer joins constrain
    * reordering). */
  object InnerJoinsOnly extends OptimizationPreCheck {
    def check(q: QueryFacade, graph: JoinGraph): Either[String, Unit] =
      q.analyzed.collectFirst {
        case j: Join if j.joinType != Inner && j.joinType != Cross =>
          j.joinType.sql
      }.toLeft(()).left.map(t => s"non-inner join: $t")
  }

  /** Conjunction of checks; first failure wins (reference compound check,
    * validation.py:219). */
  final case class AllOf(checks: OptimizationPreCheck*)
      extends OptimizationPreCheck {
    def check(q: QueryFacade, graph: JoinGraph): Either[String, Unit] =
      checks.foldLeft[Either[String, Unit]](Right(())) {
        (acc, c) => acc.flatMap(_ => c.check(q, graph))
      }
  }

  /** The full UES gate: structural equi-join check + feature gates. */
  val ues: OptimizationPreCheck =
    AllOf(NoSetOperations, NoSubqueries, InnerJoinsOnly, EquiJoinPreCheck)
}
