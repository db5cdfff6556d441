package graft

import graft.opt._
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

/** GOO + IKKBZ heuristic enumerators: plan-shape invariants and cost
  * quality against the exact DP optimum on fixture join graphs. */
class HeuristicsSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  private def graphFor(sql: String): (QueryFacade, JoinGraph) = {
    Tables.registerAll(spark, sfDir)
    val q = QueryFacade(spark, sql)
    (q, new JoinGraph(q.joinBlock.get, stats))
  }

  private val chainSql =
    """SELECT count(*) AS n FROM region, nation, supplier, customer
       WHERE r_regionkey = n_regionkey AND n_nationkey = s_nationkey
         AND n_nationkey = c_nationkey"""

  private val flagshipSql =
    """SELECT n_name, count(*) AS c
       FROM customer, orders, lineitem, nation
       WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
         AND c_nationkey = n_nationkey GROUP BY n_name"""

  test("GOO covers all tables and stays within 2x of the DP optimum") {
    for (sql <- Seq(chainSql, flagshipSql)) {
      val (q, graph) = graphFor(sql)
      val cost = new CoutCostModel
      val card = new BasicCardinalityEstimator
      val goo = new GreedyOperatorOrdering()
        .generateExecutionPlan(q, graph, cost, card)
      val dp = new DynamicProgrammingEnumerator()
        .generateExecutionPlan(q, graph, cost, card)
      assert(goo.tableSet === graph.tables.toSet)
      // greedy never beats exact DP, and on these shapes stays close
      assert(cost.estimateCost(graph, goo) >= cost.estimateCost(graph, dp))
      assert(cost.estimateCost(graph, goo) <=
        2.0 * math.max(cost.estimateCost(graph, dp), 1.0))
    }
  }

  test("GOO avoids cross products on connected graphs") {
    val (q, graph) = graphFor(chainSql)
    val tree = new GreedyOperatorOrdering().generateExecutionPlan(q, graph,
      new CoutCostModel, new BasicCardinalityEstimator)
    // every intermediate must be internally connected via some edge subset
    tree.intermediates.foreach { ts =>
      val reachable = scala.collection.mutable.Set(ts.head)
      var grew = true
      while (grew) {
        grew = false
        graph.edges.filter(_.tables.subsetOf(ts)).foreach { e =>
          if (e.tables.exists(reachable.contains) &&
              !e.tables.subsetOf(reachable)) {
            reachable ++= e.tables; grew = true
          }
        }
      }
      assert(reachable.toSet === ts, s"cross product inside $ts")
    }
  }

  test("IKKBZ produces a left-deep cross-product-free order matching DP-linear on a chain") {
    val (q, graph) = graphFor(chainSql)
    val cost = new CoutCostModel
    val card = new BasicCardinalityEstimator
    val ik = new IkkbzEnumerator().generateExecutionPlan(q, graph, cost, card)
    assert(ik.isLeftDeep)
    assert(ik.tableSet === graph.tables.toSet)
    // every prefix of a left-deep order must be connected (no cross joins)
    ik.intermediates.foreach { ts =>
      assert(graph.edges.exists(e => e.tables.subsetOf(ts)),
        s"prefix $ts is a cross product")
    }
    // IKKBZ is optimal for left-deep trees under ASI costs on acyclic
    // graphs; the DP restricted to linear shapes is the exact optimum
    val dpLinear = new DynamicProgrammingEnumerator(linearOnly = true)
      .generateExecutionPlan(q, graph, cost, card)
    assert(cost.estimateCost(graph, ik) <=
      1.5 * math.max(cost.estimateCost(graph, dpLinear), 1.0))
  }

  test("IKKBZ handles the cyclic flagship graph via its spanning-tree relaxation") {
    val (q, graph) = graphFor(flagshipSql)
    val cost = new CoutCostModel
    val card = new BasicCardinalityEstimator
    val ik = new IkkbzEnumerator().generateExecutionPlan(q, graph, cost, card)
    assert(ik.isLeftDeep)
    assert(ik.tableSet === graph.tables.toSet)
  }

  test("heuristic plans execute to the same results through the enforcer") {
    Tables.registerAll(spark, sfDir)
    for (enum <- Seq(new GreedyOperatorOrdering, new IkkbzEnumerator)) {
      val pipeline = new graft.pipeline.TextBookOptimizationPipeline(spark,
        enum, new CoutCostModel, new BasicCardinalityEstimator, stats = stats)
      val res = pipeline.optimizeQuery(flagshipSql)
      assert(!res.usedNativeFallback)
      assert(sameResults(res.df, spark.sql(flagshipSql)))
    }
  }
}
