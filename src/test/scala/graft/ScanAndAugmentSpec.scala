package graft

import graft.core.ScanOperator
import graft.enforce.PlanEnforcer
import graft.opt.JoinGraph
import graft.plans.PhysicalOperatorAssignment
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

class ScanAndAugmentSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  test("scan-operator hints warn where Spark has no analog") {
    Tables.registerAll(spark, sfDir)
    val q = QueryFacade(spark,
      """SELECT count(*) AS n FROM customer, orders
         WHERE c_custkey = o_custkey AND c_acctbal > 0""")
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val ops = PhysicalOperatorAssignment(scanOperators = Map(
      "customer" -> ScanOperator.IndexScan, // has a filter to push: fine
      "orders" -> ScanOperator.BitmapScan)) // no Spark analog: warns
    val warnings = PlanEnforcer.scanWarnings(graph, ops)
    assert(warnings.exists(_.contains("BitmapScan")))
    assert(!warnings.exists(_.startsWith("customer")))
  }

  test("equivalence-class augmentation adds the transitive edge") {
    Tables.registerAll(spark, sfDir)
    // customer-orders-lineitem chain on one equivalence class:
    // c_custkey = o_custkey, o_custkey = l_suppkey (synthetic but legal)
    val q = QueryFacade(spark,
      """SELECT count(*) AS n FROM customer, orders, lineitem
         WHERE c_custkey = o_custkey AND o_custkey = l_suppkey""")
    val graph = new JoinGraph(q.joinBlock.get, stats)
    assert(graph.edges.size === 2)
    val augmented = graph.augmentedEdges
    assert(augmented.size === 3)
    val added = augmented.filterNot(graph.edges.contains)
    assert(added.head.tables === Set("customer", "lineitem"))
  }
}
