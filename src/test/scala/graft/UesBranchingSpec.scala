package graft

import graft.opt.{JoinGraph, UESJoinOrderOptimizer, UESOperatorSelection}
import graft.enforce.PlanEnforcer
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

class UesBranchingSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  // lineitem is n:m against the customer-orders chain; part and supplier
  // are pk-side partners that only touch lineitem
  private val sql =
    """SELECT c_mktsegment, count(*) AS n
       FROM customer, orders, lineitem, part, supplier
       WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
         AND l_partkey = p_partkey AND l_suppkey = s_suppkey
       GROUP BY c_mktsegment"""

  test("branching folds pk partners into a bushy sub-branch") {
    Tables.registerAll(spark, sfDir)
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)

    val linear = new UESJoinOrderOptimizer().optimizeJoinOrder(q, graph).get
    assert(linear.isLeftDeep)

    val bushy = new UESJoinOrderOptimizer(subqueryBranching = true)
      .optimizeJoinOrder(q, graph).get
    assert(bushy.tables.map(_.identifier).toSet ===
      Set("customer", "orders", "lineitem", "part", "supplier"))
    assert(bushy.isBushy, s"expected bushy tree, got ${bushy.render}")

    // the branching policy FIRED here: pk partners sit off the left
    // spine (this is the structural count the bench artifact reports as
    // job_branching_fired), and since the branch fragment routes through
    // the shared bound model, branching must only TIGHTEN the root bound
    def joins(t: graft.plans.JoinTree[graft.core.Cardinality]): Int = t match {
      case graft.plans.JoinNode(o, i, _) => 1 + joins(o) + joins(i)
      case _ => 0
    }
    def spine(t: graft.plans.JoinTree[graft.core.Cardinality]): Int = t match {
      case graft.plans.JoinNode(o, _, _) => 1 + spine(o)
      case _ => 0
    }
    assert(joins(bushy) - spine(bushy) >= 1,
      s"no pk partner folded off the spine: ${bushy.render}")
    assert(joins(linear) - spine(linear) === 0)
    assert(bushy.annotation.value <= linear.annotation.value,
      s"branching loosened the root bound: bushy=${bushy.annotation.value} " +
        s"linear=${linear.annotation.value}")

    // both shapes must produce identical, correct results
    for (tree <- Seq(linear, bushy)) {
      val ops = new UESOperatorSelection()
        .selectPhysicalOperators(q, graph, Some(tree))
      val df = PlanEnforcer.enforce(q, graph, tree, ops)
      assert(sameResults(df, spark.sql(sql)), tree.render)
    }
  }

  test("branching is a no-op when no pk partners exist") {
    Tables.registerAll(spark, sfDir)
    val simple = """SELECT count(*) AS n FROM customer, orders
                    WHERE c_custkey = o_custkey"""
    val q = QueryFacade(spark, simple)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val tree = new UESJoinOrderOptimizer(subqueryBranching = true)
      .optimizeJoinOrder(q, graph).get
    assert(tree.isLeftDeep)
  }
}
