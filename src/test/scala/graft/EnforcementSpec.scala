package graft

import graft.core.JoinOperator
import graft.enforce.PlanEnforcer
import graft.opt._
import graft.pipeline._
import graft.plans.{JoinTree, PhysicalOperatorAssignment, QueryPlanOps}
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

/** Plan-shape assertions: forced join operators and join orders must appear
  * in the executed physical plan, and enforced plans must return the same
  * results as native execution (the reference's core invariant).
  */
class EnforcementSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  private val twoTable =
    """SELECT s_name, n_name FROM supplier, nation
       WHERE s_nationkey = n_nationkey ORDER BY s_name"""

  private def enforceTwoTable(op: JoinOperator) = {
    Tables.registerAll(spark, sfDir)
    val q = QueryFacade(spark, twoTable)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val tree = JoinTree.leftDeep(q.joinBlock.get.tables)
    PlanEnforcer.enforce(q, graph, tree,
      PhysicalOperatorAssignment().withJoin(Set("supplier", "nation"), op))
  }

  test("forced sort-merge join appears in the physical plan") {
    val df = enforceTwoTable(JoinOperator.SortMergeJoin)
    assert(QueryPlanOps(df).joinOperators.exists(_.contains("SortMergeJoin")))
    assert(sameResults(df, spark.sql(twoTable)))
  }

  test("forced broadcast join appears in the physical plan") {
    val df = enforceTwoTable(JoinOperator.BroadcastHashJoin)
    assert(QueryPlanOps(df).joinOperators.exists(_.contains("BroadcastHashJoin")))
    assert(sameResults(df, spark.sql(twoTable)))
  }

  test("forced shuffle-hash join appears in the physical plan") {
    val df = enforceTwoTable(JoinOperator.HashJoin)
    assert(QueryPlanOps(df).joinOperators.exists(_.contains("ShuffledHashJoin")))
    assert(sameResults(df, spark.sql(twoTable)))
  }

  test("SQL hint comments steer the physical strategy (Hint clause analog)") {
    // the reference carries raw hint text in a Hint clause
    // (qal/_qal.py:5061) for pg_hint_plan; Spark's native /*+ */ comment
    // hints are the same surface and flow through untouched
    Tables.registerAll(spark, sfDir)
    val merged = spark.sql(
      """SELECT /*+ MERGE(supplier) */ s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey""")
    assert(QueryPlanOps(merged).joinOperators.exists(_.contains("SortMergeJoin")))
    val bcast = spark.sql(
      """SELECT /*+ BROADCAST(nation) */ s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey""")
    assert(QueryPlanOps(bcast).joinOperators.exists(_.contains("BroadcastHashJoin")))
    assert(sameResults(merged, bcast))
  }

  test("join tree reconstructs from the executed plan with actual rows") {
    Tables.registerAll(spark, sfDir)
    val sql = """SELECT count(*) AS n FROM region, nation, supplier
                 WHERE r_regionkey = n_regionkey AND n_nationkey = s_nationkey"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val order = Seq("supplier", "nation", "region")
    val tree = JoinTree.leftDeep(order.map(t =>
      q.joinBlock.get.tables.find(_.identifier == t).get))
    val df = PlanEnforcer.enforce(q, graph, tree,
      PhysicalOperatorAssignment(defaultJoin = Some(JoinOperator.HashJoin)))
    df.collect()
    val rebuilt = QueryPlanOps(df).joinTree.get
    assert(rebuilt.tables.map(_.identifier) === order)
    assert(rebuilt.isLeftDeep)
    // the root join's actual output rows were captured from metrics
    assert(rebuilt.annotation.isValid && rebuilt.annotation.value > 0)
    val summary = QueryPlanOps(df).planSummary
    assert(summary("shape") === "left-deep")
    assert(summary("joins") === "2")
  }

  test("forced join order is preserved in the scan order") {
    Tables.registerAll(spark, sfDir)
    val sql = """SELECT count(*) AS n FROM region, nation, supplier
                 WHERE r_regionkey = n_regionkey AND n_nationkey = s_nationkey"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val order = Seq("supplier", "nation", "region")
    val tree = JoinTree.leftDeep(order.map(t =>
      q.joinBlock.get.tables.find(_.identifier == t).get))
    val df = PlanEnforcer.enforce(q, graph, tree,
      PhysicalOperatorAssignment(defaultJoin = Some(JoinOperator.HashJoin)))
    assert(QueryPlanOps(df).scanOrder === order)
    assert(sameResults(df, spark.sql(sql)))
  }

  test("compiled plans apply the full derived-predicate closure under " +
      "every join order") {
    // the r15 contract (JoinGraph.derivedFilters scaladoc): a constant
    // filter on one equivalence-class member must reach EVERY member's
    // compiled scan — including 2-hop members, under a join order
    // where Catalyst's one-round-per-node inference provably cannot
    // push it (the sw11 class: (db⋈dc) joined before da arrives).
    Tables.registerAll(spark, sfDir)
    import spark.implicits._
    Seq(1, 2, 3, 4).toDF("a_k").createOrReplaceTempView("da")
    Seq(1, 2, 3, 4, 4).toDF("b_k").createOrReplaceTempView("db")
    (1 to 4).flatMap(k => Seq.fill(k)(k)).toDF("c_k")
      .createOrReplaceTempView("dc")
    val sql = """SELECT count(*) AS n FROM da, db, dc
                 WHERE a_k = b_k AND b_k = c_k AND a_k < 3"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    // worst-case order for Catalyst inference: dc deepest, da last
    val order = Seq("dc", "db", "da")
    val tree = JoinTree.leftDeep(order.map(t =>
      q.joinBlock.get.tables.find(_.identifier == t).get))
    val df = PlanEnforcer.enforce(q, graph, tree,
      PhysicalOperatorAssignment(defaultJoin = Some(JoinOperator.HashJoin)))
    assert(sameResults(df, spark.sql(sql)))
    // every scan carries the closure constant: da its own a_k < 3, db
    // the derived b_k < 3, dc the derived c_k < 3 — asserted on the
    // ANALYZED plan (the compiled shape): the optimizer may then fold
    // a Filter-over-LocalRelation away entirely, which is downstream
    // of the contract under test
    val analyzed = df.queryExecution.analyzed
    val filterStrings = analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.toString
    }
    for (col <- Seq("a_k", "b_k", "c_k"))
      assert(filterStrings.exists(s => s.contains(col) && s.contains("< 3")),
        s"closure constant on $col missing from the compiled plan: " +
          filterStrings.mkString(" | "))
  }

  test("UES pipeline produces a left-deep tree with finite bounds") {
    Tables.registerAll(spark, sfDir)
    val sql = """SELECT n_name, count(*) AS c
                 FROM customer, orders, lineitem, nation
                 WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
                   AND c_nationkey = n_nationkey GROUP BY n_name"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val tree = new UESJoinOrderOptimizer().optimizeJoinOrder(q, graph).get
    assert(tree.isLeftDeep)
    assert(tree.tables.size === 4)
    assert(tree.intermediates.forall(_.nonEmpty))
    val pipeline = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer),
      operators = Some(new UESOperatorSelection),
      stats = stats)
    val res = pipeline.optimizeQuery(sql)
    assert(!res.usedNativeFallback)
    assert(sameResults(res.df, spark.sql(sql)))
  }

  test("DP and exhaustive enumerators agree on the optimal cost") {
    Tables.registerAll(spark, sfDir)
    val sql = """SELECT count(*) AS n FROM nation, supplier, region
                 WHERE n_nationkey = s_nationkey AND n_regionkey = r_regionkey"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val cost = new CoutCostModel
    val card = new BasicCardinalityEstimator
    val dp = new DynamicProgrammingEnumerator()
      .generateExecutionPlan(q, graph, cost, card)
    val ex = new ExhaustivePlanEnumerator()
      .generateExecutionPlan(q, graph, cost, card)
    assert(cost.estimateCost(graph, dp) === cost.estimateCost(graph, ex))
  }

  test("pre-check rejects disconnected and non-equi queries") {
    Tables.registerAll(spark, sfDir)
    val cross = QueryFacade(spark,
      "SELECT count(*) AS n FROM region, nation WHERE r_regionkey < n_regionkey")
    val graph = new JoinGraph(cross.joinBlock.get, stats)
    assert(EquiJoinPreCheck.check(cross, graph).isLeft)
  }

  test("pipeline falls back to native execution for unsupported queries") {
    Tables.registerAll(spark, sfDir)
    val pipeline = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer), stats = stats)
    val res = pipeline.optimizeQuery("SELECT count(*) AS n FROM customer")
    assert(res.usedNativeFallback)
    assert(res.df.collect().head.getLong(0) > 0)
  }
}
