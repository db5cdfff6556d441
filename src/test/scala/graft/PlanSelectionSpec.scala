package graft

import graft.bench.Workload
import graft.core.JoinOperator
import graft.opt._
import graft.pipeline.IntegratedOptimizationPipeline
import graft.stats.EmulatedStatistics

/** BAO-style plan selection end to end (reference example-07): candidate
  * operator spaces costed per join with the operator cost model, winner
  * enforced through the integrated pipeline — answers never change.
  * Plus the workload train/test split algebra of example-05.
  */
class PlanSelectionSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  test("operator cost model prefers broadcast for tiny build sides") {
    import OperatorCostModel.joinCost
    // tiny right side: broadcast beats shuffled hash and sort-merge
    assert(joinCost(JoinOperator.BroadcastHashJoin, 1e9, 10) <
      joinCost(JoinOperator.HashJoin, 1e9, 10))
    // large both sides: broadcast's replication penalty loses
    assert(joinCost(JoinOperator.HashJoin, 1e9, 1e9) <
      joinCost(JoinOperator.BroadcastHashJoin, 1e9, 1e9))
    // nested loop never wins beyond trivial inputs
    assert(joinCost(JoinOperator.NestedLoopJoin, 1e4, 1e4) >
      joinCost(JoinOperator.SortMergeJoin, 1e4, 1e4))
  }

  test("BAO-style selection picks per-join operators and keeps answers") {
    Tables.registerAll(spark, sfDir)
    val sql = """SELECT n_name, count(*) AS c
                 FROM customer, orders, lineitem, nation
                 WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
                   AND c_nationkey = n_nationkey GROUP BY n_name"""
    val algo = new BaoStylePlanSelection(new StatisticalCardinalityEstimator)
    val pipeline = new IntegratedOptimizationPipeline(spark, algo, stats = stats)
    val df = pipeline.optimize(sql)
    assert(sameResults(df, spark.sql(sql)))
    // the selection actually assigned operators per join
    val q = graft.qal.QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val st = algo.optimizeQuery(q, graph)
    assert(st.joinOrder.isDefined)
    assert(st.operators.joinOperators.size === 3)
  }

  test("workload split algebra: pickRandomN and minus partition the set") {
    val wl = Workload.inline("w",
      (1 to 10).map(i => s"q$i" -> s"SELECT $i AS x"): _*)
    val train = wl.pickRandomN(3, seed = 7L)
    val test = wl.minus(train)
    assert(train.size === 3)
    assert(test.size === 7)
    assert((train.labels.toSet & test.labels.toSet).isEmpty)
    assert(train.labels.toSet ++ test.labels.toSet === wl.labels.toSet)
    // deterministic per seed
    assert(wl.pickRandomN(3, seed = 7L).labels === train.labels)
  }
}
