package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Cardinality
import graft.enforce.{CardinalityInjection, PlanEnforcer}
import graft.opt.JoinGraph
import graft.plans.{JoinTree, PhysicalOperatorAssignment, PlanParameterization}
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

/** The result of optimizing one query: the enforced DataFrame plus the
  * decisions each stage made (for introspection / export, mirroring the
  * reference's OptimizedSqlQuery + describe() export).
  */
final case class OptimizationResult(
    df: DataFrame,
    joinOrder: Option[JoinTree[Cardinality]],
    operators: PhysicalOperatorAssignment,
    parameters: PlanParameterization,
    usedNativeFallback: Boolean,
    describe: String)

/** Multi-stage optimization pipeline: join ordering -> operator selection ->
  * parameterization -> enforcement. Port of MultiStageOptimizationPipeline
  * (/root/reference/postbound/_pipelines.py:671-1067). Queries that fail the
  * pre-check (or have no join block) fall back to native Spark execution —
  * same contract as the reference, where plan gaps are filled by the target
  * DBMS optimizer (_pipelines.py:97-100).
  */
final class MultiStageOptimizationPipeline(
    val spark: SparkSession,
    val joinOrder: Option[JoinOrderOptimization] = None,
    operators: Option[PhysicalOperatorSelection] = None,
    parameters: Option[ParameterGeneration] = None,
    preCheck: OptimizationPreCheck = EquiJoinPreCheck,
    stats: EmulatedStatistics = null) {

  private lazy val statistics =
    Option(stats).getOrElse(new EmulatedStatistics(spark))

  def optimizeQuery(sql: String): OptimizationResult = {
    val q = QueryFacade(spark, sql)
    q.joinBlock match {
      case None => native(q, "no join block")
      case Some(block) =>
        val graph = new JoinGraph(block, statistics)
        preCheck.check(q, graph) match {
          case Left(reason) => native(q, reason)
          case Right(()) =>
            val order = joinOrder.flatMap(_.optimizeJoinOrder(q, graph))
            val ops = operators
              .map(_.selectPhysicalOperators(q, graph, order))
              .getOrElse(PhysicalOperatorAssignment())
            val params = parameters
              .map(_.generatePlanParameters(q, graph, order, ops))
              .getOrElse(PlanParameterization())
            order match {
              case Some(tree) =>
                val df = withConfigs(params.sessionConfigs) {
                  val enforced = PlanEnforcer.enforce(q, graph, tree, ops)
                  CardinalityInjection.inject(spark, enforced, graph,
                    params.cardinalityHints)
                }
                OptimizationResult(df, order, ops, params, usedNativeFallback = false,
                  describe = describeStages)
              case None => native(q, "no join order produced")
            }
        }
    }
  }

  /** Convenience: just the resulting DataFrame. */
  def optimize(sql: String): DataFrame = optimizeQuery(sql).df

  /** Post-execution feedback hook (reference: the pipeline-level
    * `learn_from_feedback` the bench loop calls after every query,
    * bench.py:1014): fans the executed plan + the pipeline's own decisions
    * out to every stage that mixes in [[OnlineLearningStage]]. No-op for
    * pipelines whose stages don't learn.
    */
  def learnFromFeedback(result: OptimizationResult, executed: DataFrame,
      execTimeMs: Double): Unit =
    onlineLearners.foreach(_.learnFromFeedback(result, executed, execTimeMs))

  /** The stages of this pipeline that opt into online learning. */
  def onlineLearners: Seq[OnlineLearningStage] =
    Seq(joinOrder, operators, parameters).flatten.collect {
      case s: OnlineLearningStage if s.usesOnlineLearning => s
    }

  private def native(q: QueryFacade, reason: String): OptimizationResult =
    OptimizationResult(q.df, None, PhysicalOperatorAssignment(),
      PlanParameterization(), usedNativeFallback = true,
      describe = s"""{"fallback":"native","reason":"$reason"}""")

  private def withConfigs[T](configs: Map[String, String])(body: => T): T = {
    val saved = configs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try { configs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  def describeStages: String = {
    val parts = Seq(
      joinOrder.map(s => s""""join_ordering":${s.describe}"""),
      operators.map(s => s""""operator_selection":${s.describe}"""),
      parameters.map(s => s""""parameterization":${s.describe}""")).flatten
    parts.mkString("{", ",", "}")
  }
}

/** Mutable-through-the-chain optimization state for incremental pipelines. */
final case class OptState(
    joinOrder: Option[JoinTree[Cardinality]] = None,
    operators: PhysicalOperatorAssignment = PhysicalOperatorAssignment(),
    parameters: PlanParameterization = PlanParameterization())

/** One link of an incremental chain (reference: IncrementalOptimizationStep,
  * /root/reference/postbound/_stages.py:906-946). */
trait IncrementalOptimizationStep {
  def describe: String
  def refine(q: QueryFacade, graph: JoinGraph, state: OptState): OptState
}

object IncrementalOptimizationStep {
  def fromJoinOrder(s: JoinOrderOptimization): IncrementalOptimizationStep =
    new IncrementalOptimizationStep {
      def describe: String = s.describe
      def refine(q: QueryFacade, graph: JoinGraph, st: OptState): OptState =
        st.copy(joinOrder = s.optimizeJoinOrder(q, graph).orElse(st.joinOrder))
    }
  def fromOperators(s: PhysicalOperatorSelection): IncrementalOptimizationStep =
    new IncrementalOptimizationStep {
      def describe: String = s.describe
      def refine(q: QueryFacade, graph: JoinGraph, st: OptState): OptState =
        st.copy(operators = s.selectPhysicalOperators(q, graph, st.joinOrder))
    }
  def fromParameters(s: ParameterGeneration): IncrementalOptimizationStep =
    new IncrementalOptimizationStep {
      def describe: String = s.describe
      def refine(q: QueryFacade, graph: JoinGraph, st: OptState): OptState =
        st.copy(parameters =
          s.generatePlanParameters(q, graph, st.joinOrder, st.operators))
    }
}

/** Chain-of-steps pipeline: each step refines the accumulated state
  * (reference: IncrementalOptimizationPipeline, _pipelines.py:1069).
  */
final class IncrementalOptimizationPipeline(
    val spark: SparkSession,
    steps: Seq[IncrementalOptimizationStep],
    preCheck: OptimizationPreCheck = EquiJoinPreCheck,
    stats: EmulatedStatistics = null) {

  private lazy val statistics =
    Option(stats).getOrElse(new EmulatedStatistics(spark))

  def optimizeQuery(sql: String): OptimizationResult = {
    val q = QueryFacade(spark, sql)
    val fallback = OptimizationResult(q.df, None, PhysicalOperatorAssignment(),
      PlanParameterization(), usedNativeFallback = true,
      describe = """{"fallback":"native"}""")
    q.joinBlock match {
      case None => fallback
      case Some(block) =>
        val graph = new JoinGraph(block, statistics)
        preCheck.check(q, graph) match {
          case Left(_) => fallback
          case Right(()) =>
            val st = steps.foldLeft(OptState())((s, step) => step.refine(q, graph, s))
            st.joinOrder match {
              case Some(tree) =>
                val df = CardinalityInjection.inject(spark,
                  PlanEnforcer.enforce(q, graph, tree, st.operators), graph,
                  st.parameters.cardinalityHints)
                OptimizationResult(df, st.joinOrder, st.operators, st.parameters,
                  usedNativeFallback = false,
                  describe = steps.map(_.describe).mkString("[", ",", "]"))
              case None => fallback
            }
        }
    }
  }

  def optimize(sql: String): DataFrame = optimizeQuery(sql).df
}

/** A complete algorithm produces the whole plan in one shot (reference:
  * CompleteOptimizationAlgorithm + IntegratedOptimizationPipeline,
  * _stages.py:377-408 / _pipelines.py:320). */
trait CompleteOptimizationAlgorithm {
  def describe: String
  def optimizeQuery(q: QueryFacade, graph: JoinGraph): OptState
}

final class IntegratedOptimizationPipeline(
    val spark: SparkSession,
    algorithm: CompleteOptimizationAlgorithm,
    preCheck: OptimizationPreCheck = EquiJoinPreCheck,
    stats: EmulatedStatistics = null) {

  private lazy val statistics =
    Option(stats).getOrElse(new EmulatedStatistics(spark))

  def optimize(sql: String): DataFrame = {
    val q = QueryFacade(spark, sql)
    q.joinBlock match {
      case None => q.df
      case Some(block) =>
        val graph = new JoinGraph(block, statistics)
        preCheck.check(q, graph) match {
          case Left(_) => q.df
          case Right(()) =>
            val st = algorithm.optimizeQuery(q, graph)
            st.joinOrder match {
              case Some(tree) => PlanEnforcer.enforce(q, graph, tree, st.operators)
              case None => q.df
            }
        }
    }
  }
}

/** Textbook pipeline: a plan enumerator drives cost model + cardinality
  * estimator (reference: TextBookOptimizationPipeline,
  * /root/reference/postbound/_pipelines.py:475-670).
  */
final class TextBookOptimizationPipeline(
    val spark: SparkSession,
    enumerator: PlanEnumerator,
    costModel: CostModel,
    cardinalityEstimator: CardinalityEstimator,
    operators: Option[PhysicalOperatorSelection] = None,
    preCheck: OptimizationPreCheck = EquiJoinPreCheck,
    stats: EmulatedStatistics = null) {

  private lazy val statistics =
    Option(stats).getOrElse(new EmulatedStatistics(spark))

  def optimizeQuery(sql: String): OptimizationResult = {
    val q = QueryFacade(spark, sql)
    q.joinBlock match {
      case None =>
        OptimizationResult(q.df, None, PhysicalOperatorAssignment(),
          PlanParameterization(), usedNativeFallback = true,
          describe = """{"fallback":"native","reason":"no join block"}""")
      case Some(block) =>
        val graph = new JoinGraph(block, statistics)
        preCheck.check(q, graph) match {
          case Left(reason) =>
            OptimizationResult(q.df, None, PhysicalOperatorAssignment(),
              PlanParameterization(), usedNativeFallback = true,
              describe = s"""{"fallback":"native","reason":"$reason"}""")
          case Right(()) =>
            val tree = enumerator.generateExecutionPlan(q, graph, costModel,
              cardinalityEstimator)
            val ops = operators
              .map(_.selectPhysicalOperators(q, graph, Some(tree)))
              .getOrElse(PhysicalOperatorAssignment())
            val df = PlanEnforcer.enforce(q, graph, tree, ops)
            OptimizationResult(df, Some(tree), ops, PlanParameterization(),
              usedNativeFallback = false,
              describe = s"""{"enumerator":${enumerator.describe},"cost":${costModel.describe},"cardinality":${cardinalityEstimator.describe}}""")
        }
    }
  }

  def optimize(sql: String): DataFrame = optimizeQuery(sql).df
}
