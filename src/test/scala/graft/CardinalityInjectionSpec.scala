package graft

import graft.core.Cardinality
import graft.enforce.{CardinalityInjection, PlanEnforcer, StatsOverride}
import graft.opt._
import graft.pipeline._
import graft.plans.{JoinTree, PhysicalOperatorAssignment, QueryPlanOps}
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

/** Cardinality injection (the Rows-hint analog): injected per-intermediate
  * row counts must actually be consulted by Spark's join selection — tiny
  * injected cardinalities flip joins to broadcast, huge ones keep them
  * shuffled — while results stay identical to native execution.
  */
class CardinalityInjectionSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  private val threeTable =
    """SELECT count(*) AS n FROM customer, orders, lineitem
       WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey"""

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def enforced(hints: Map[Set[String], Cardinality]) = {
    Tables.registerAll(spark, sfDir)
    val q = QueryFacade(spark, threeTable)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val order = Seq("lineitem", "orders", "customer")
    val tree = JoinTree.leftDeep(order.map(t =>
      q.joinBlock.get.tables.find(_.identifier == t).get))
    val df = PlanEnforcer.enforce(q, graph, tree)
    CardinalityInjection.inject(spark, df, graph, hints)
  }

  test("tiny injected intermediate cardinality flips the join to broadcast") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "1024") {
      val plain = enforced(Map.empty)
      assert(!QueryPlanOps(plain).joinOperators.exists(_.contains("Broadcast")),
        QueryPlanOps(plain).joinOperators.toString)
      val injected = enforced(
        Map(Set("lineitem", "orders") -> Cardinality.of(3)))
      assert(QueryPlanOps(injected).joinOperators
        .exists(_.contains("BroadcastHashJoin")),
        QueryPlanOps(injected).joinOperators.toString)
      // plan steering must never change answers
      assert(sameResults(injected, spark.sql(threeTable)))
    }
  }

  test("huge injected cardinality keeps the join un-broadcast") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "1024") {
      val injected = enforced(
        Map(Set("lineitem", "orders") -> Cardinality.of(500L * 1000 * 1000)))
      assert(!QueryPlanOps(injected).joinOperators.exists(_.contains("Broadcast")))
    }
  }

  test("single-table hints wrap the scan side and steer its join") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "1024") {
      val injected = enforced(Map(Set("customer") -> Cardinality.of(1)))
      assert(QueryPlanOps(injected).joinOperators
        .exists(_.contains("BroadcastHashJoin")))
      assert(injected.queryExecution.optimizedPlan.collect {
        case so: StatsOverride => so
      }.exists(_.tableSet === Set("customer")))
      assert(sameResults(injected, spark.sql(threeTable)))
    }
  }

  test("unknown/infinite cardinalities are ignored") {
    val df = enforced(Map(
      Set("lineitem", "orders") -> Cardinality.unknown,
      Set("customer") -> Cardinality.infinite))
    assert(df.queryExecution.optimizedPlan.collect {
      case so: StatsOverride => so
    }.isEmpty)
  }

  test("pipeline wires estimator-driven hints end to end") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "1024") {
      Tables.registerAll(spark, sfDir)
      val pipeline = new MultiStageOptimizationPipeline(spark,
        joinOrder = Some(new UESJoinOrderOptimizer),
        parameters = Some(new CardinalityHintGeneration(
          new PreComputedCardinalities(
            Map(Set("lineitem", "orders") -> Cardinality.of(2))))),
        stats = stats)
      val res = pipeline.optimizeQuery(threeTable)
      assert(!res.usedNativeFallback)
      assert(res.parameters.cardinalityHints.nonEmpty)
      assert(res.df.queryExecution.optimizedPlan.collect {
        case so: StatsOverride => so
      }.nonEmpty)
      assert(sameResults(res.df, spark.sql(threeTable)))
    }
  }
}
