package graft

import graft.core.{Cardinality, JoinOperator}
import graft.opt._
import graft.pipeline.MultiStageOptimizationPipeline
import graft.plans.JoinTree
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

class TonicSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)
  private val sql =
    """SELECT n_name, count(*) AS c FROM nation, supplier, customer
       WHERE n_nationkey = s_nationkey AND n_nationkey = c_nationkey
       GROUP BY n_name"""

  test("synopsis recommends the cheapest recorded operator per prefix") {
    val syn = new QepSynopsis
    syn.recordCost(Seq("a", "b"), JoinOperator.HashJoin, 100.0)
    syn.recordCost(Seq("a", "b"), JoinOperator.SortMergeJoin, 10.0)
    assert(syn.recommend(Seq("a", "b")) === Some(JoinOperator.SortMergeJoin))
    // better observation wins; worse one does not regress the minimum
    syn.recordCost(Seq("a", "b"), JoinOperator.SortMergeJoin, 500.0)
    assert(syn.recommend(Seq("a", "b")) === Some(JoinOperator.SortMergeJoin))
    assert(syn.recommend(Seq("a", "c")) === None)
  }

  test("synopsis round-trips through JSON") {
    val syn = new QepSynopsis
    syn.recordCost(Seq("a", "b"), JoinOperator.HashJoin, 42.0)
    syn.recordCost(Seq("a", "b", "c"), JoinOperator.BroadcastHashJoin, 7.0)
    val back = QepSynopsis.fromJson(syn.toJson)
    assert(back.recommend(Seq("a", "b")) === Some(JoinOperator.HashJoin))
    assert(back.recommend(Seq("a", "b", "c")) === Some(JoinOperator.BroadcastHashJoin))
    assert(back.size === syn.size)
  }

  test("tonic learns from an executed plan and then drives selection") {
    Tables.registerAll(spark, sfDir)
    val syn = new QepSynopsis
    val tonic = new TonicOperatorSelection(syn)
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val tree = new UESJoinOrderOptimizer().optimizeJoinOrder(q, graph).get

    // round 1: fallback decides; execute; learn
    val ops1 = tonic.selectPhysicalOperators(q, graph, Some(tree))
    val df1 = graft.enforce.PlanEnforcer.enforce(q, graph, tree, ops1)
    df1.collect()
    tonic.learnFromExecution(tree, ops1, df1)
    assert(syn.size > 1, "synopsis learned nothing")

    // round 2: recommendations now come from the trie for every prefix
    val order = tree.tables.map(_.identifier)
    val prefixes = (2 to order.size).map(k => order.take(k))
    assert(prefixes.forall(p => syn.recommend(p).isDefined))

    val ops2 = tonic.selectPhysicalOperators(q, graph, Some(tree))
    prefixes.foreach { p =>
      assert(ops2.joinOperators.contains(p.toSet))
    }
    // invariant: learned operators never change results
    val df2 = graft.enforce.PlanEnforcer.enforce(q, graph, tree, ops2)
    assert(sameResults(df2, spark.sql(sql)))
  }

  test("bushy plans canonicalize into the trie and drive recommendations") {
    import graft.plans.{JoinNode, ScanNode}
    Tables.registerAll(spark, sfDir)
    val sql4 =
      """SELECT count(*) AS n FROM customer, orders, lineitem, nation
         WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
           AND c_nationkey = n_nationkey"""
    val q = QueryFacade(spark, sql4)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    def ref(t: String) = q.joinBlock.get.tables.find(_.identifier == t).get
    val u = Cardinality.unknown
    val tree: JoinTree[Cardinality] = JoinNode(
      JoinNode(ScanNode(ref("customer"), u), ScanNode(ref("nation"), u), u),
      JoinNode(ScanNode(ref("orders"), u), ScanNode(ref("lineitem"), u), u), u)
    assert(tree.isBushy)

    val syn = new QepSynopsis
    val tonic = new TonicOperatorSelection(syn)
    val ops1 = tonic.selectPhysicalOperators(q, graph, Some(tree))
    val df1 = graft.enforce.PlanEnforcer.enforce(q, graph, tree, ops1)
    df1.collect()
    tonic.learnFromExecution(tree, ops1, df1)

    // root path follows the outer spine with the inner branch's signature
    assert(syn.recommend(
      Seq("customer", "nation", "[lineitem+orders]")).isDefined)
    // the bushy sub-join is learned under its own path, so the knowledge
    // transfers to any plan embedding orders ⋈ lineitem
    assert(syn.recommend(Seq("orders", "lineitem")).isDefined)

    val ops2 = tonic.selectPhysicalOperators(q, graph, Some(tree))
    assert(ops2.joinOperators.contains(
      Set("customer", "nation", "orders", "lineitem")))
    assert(ops2.joinOperators.contains(Set("orders", "lineitem")))
    val df2 = graft.enforce.PlanEnforcer.enforce(q, graph, tree, ops2)
    assert(sameResults(df2, spark.sql(sql4)))
  }

  test("tonic seeds its trie from a natively-executed plan") {
    Tables.registerAll(spark, sfDir)
    val syn = new QepSynopsis
    val tonic = new TonicOperatorSelection(syn)
    val df = spark.sql(
      """SELECT count(*) AS n FROM nation JOIN supplier
         ON n_nationkey = s_nationkey""")
    df.collect()
    assert(tonic.learnFromNativePlan(df))
    assert(syn.size > 1)
    // the learned prefix covers the native scan order of the two tables
    val orders = Seq(Seq("nation", "supplier"), Seq("supplier", "nation"))
    assert(orders.exists(o => syn.recommend(o).isDefined))
  }

  test("tonic inside the multi-stage pipeline") {
    Tables.registerAll(spark, sfDir)
    val syn = new QepSynopsis
    val pipeline = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer),
      operators = Some(new TonicOperatorSelection(syn)),
      stats = stats)
    val res = pipeline.optimizeQuery(sql)
    assert(!res.usedNativeFallback)
    assert(sameResults(res.df, spark.sql(sql)))
  }

  test("pipeline learn_from_feedback loop trains TONIC through the harness") {
    import graft.bench.{BenchHarness, Workload}
    Tables.registerAll(spark, sfDir)
    val syn = new QepSynopsis
    val pipeline = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer),
      operators = Some(new TonicOperatorSelection(syn)),
      stats = stats)
    assert(pipeline.onlineLearners.size === 1)
    assert(syn.size === 1) // empty trie: nothing learned yet

    // the reference's bench loop (bench.py:1014): optimize, execute,
    // feed the executed plan back into the pipeline per query
    val wl = Workload.fromDirectory("fixture", "/root/repo/workloads/fixture")
    val lastResult =
      scala.collection.mutable.Map.empty[String, graft.pipeline.OptimizationResult]
    val rs = BenchHarness.executeWorkload(spark, wl,
      optimizer = sql => {
        val r = pipeline.optimizeQuery(sql); lastResult(sql) = r; r.df
      },
      onExecuted = (sql, df, r) =>
        pipeline.learnFromFeedback(lastResult(sql), df, r.exec_time * 1000))
    assert(rs.forall(_.status == "ok"), rs.filter(_.status != "ok").toString)

    // the loop populated the trie from measured per-join rows...
    assert(syn.size > 1, s"synopsis empty after feedback loop")
    // ...and a fresh optimization of a trained query now draws its
    // operator choices from recommendations (observable as trie hits on
    // every enforced join prefix of the plan)
    val trained = wl.queries.values.toSeq
    val improved = trained.exists { sql =>
      val r2 = pipeline.optimizeQuery(sql)
      r2.joinOrder.exists { tree =>
        r2.operators.joinOperators.nonEmpty && !r2.usedNativeFallback
      }
    }
    assert(improved)
    // learned knowledge steers selection: recommendations now exist where
    // the fallback previously decided alone, and results stay identical
    wl.queries.values.foreach { sql =>
      assert(sameResults(pipeline.optimize(sql), spark.sql(sql)))
    }
  }
}
