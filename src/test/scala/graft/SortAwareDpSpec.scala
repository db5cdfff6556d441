package graft

import graft.core.JoinOperator
import graft.enforce.PlanEnforcer
import graft.opt.{BasicCardinalityEstimator, JoinGraph, SortAwareDynProg}
import graft.plans.QueryPlanOps
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

class SortAwareDpSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  private def planFor(sql: String, hashCost: Double = 2.0) = {
    Tables.registerAll(spark, sfDir)
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val (tree, ops) = new SortAwareDynProg(hashCost).plan(q, graph,
      new BasicCardinalityEstimator)
    (q, graph, tree, ops)
  }

  private val sharedKeySql =
    """SELECT n_name, count(*) AS c FROM nation, supplier, customer
       WHERE n_nationkey = s_nationkey AND n_nationkey = c_nationkey
       GROUP BY n_name"""

  test("default cost regime: hash joins win over cold sorts") {
    val (q, graph, tree, ops) = planFor(sharedKeySql)
    assert(ops.joinOperators.values.toSet === Set(JoinOperator.HashJoin),
      s"got ${ops.joinOperators}")
    val df = PlanEnforcer.enforce(q, graph, tree, ops)
    assert(sameResults(df, spark.sql(sharedKeySql)))
  }

  test("expensive-hash regime: shared-key chain becomes a merge cascade") {
    // supplier and customer both join nation on the same equivalence
    // class: the second merge join reuses the delivered order (no re-sort)
    val (q, graph, tree, ops) = planFor(sharedKeySql, hashCost = 1000.0)
    assert(ops.joinOperators.values.toSet === Set(JoinOperator.SortMergeJoin),
      s"expected merge cascade, got ${ops.joinOperators}")
    val df = PlanEnforcer.enforce(q, graph, tree, ops)
    assert(sameResults(df, spark.sql(sharedKeySql)))
    val joins = QueryPlanOps(df).joinOperators
    assert(joins.count(_.contains("SortMergeJoin")) === 2, joins.toString)
  }

  test("merge cascade physically re-sorts only the base inputs") {
    val sql = """SELECT count(*) AS c FROM nation, supplier, customer
                 WHERE n_nationkey = s_nationkey AND n_nationkey = c_nationkey"""
    val (q, graph, tree, ops) = planFor(sql, hashCost = 1000.0)
    val df = PlanEnforcer.enforce(q, graph, tree, ops)
    df.collect()
    // 3 base inputs need sorting; the intermediate must NOT be re-sorted
    val sorts = QueryPlanOps(df).physicalPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(sorts.size <= 3, s"intermediate re-sorted: ${sorts.size} sorts")
  }
}
