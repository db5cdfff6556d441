package graft

import graft.opt.JoinGraph
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

class QalSpec extends SparkSpec {

  private def facade(sql: String): QueryFacade = {
    Tables.registerAll(spark, sfDir)
    QueryFacade(spark, sql)
  }

  private val flagship =
    """SELECT n_name, count(*) AS c FROM customer, orders, lineitem, nation
       WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
         AND c_nationkey = n_nationkey
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name"""

  test("flagship decomposes into 4 tables, 3 join edges, 1 filter") {
    val q = facade(flagship)
    assert(q.joinBlock.isDefined)
    assert(q.tables.map(_.identifier).toSet ===
      Set("customer", "orders", "lineitem", "nation"))
    assert(q.joinPredicates.size === 3)
    assert(q.filterPredicates.size === 1)
    assert(q.filterPredicates.head.tables === Set("orders"))
  }

  test("join edges carry equi-columns with table provenance") {
    val q = facade(flagship)
    val cols = q.joinPredicates.flatMap(_.equiColumns(q.joinBlock.get.attrToTable))
    assert(cols.size === 3)
    val rendered = cols.map { case (a, b) => s"$a=$b" }.toSet
    assert(rendered.contains("customer.c_custkey=orders.o_custkey"))
  }

  test("aliased tables resolve to alias identifiers") {
    val q = facade(
      "SELECT * FROM customer c1, customer c2 WHERE c1.c_custkey = c2.c_custkey")
    assert(q.tables.map(_.identifier).toSet === Set("c1", "c2"))
    assert(q.joinPredicates.size === 1)
  }

  test("explicit JOIN ... ON decomposes like the implicit form") {
    // reference: explicit_to_implicit transform (transform.py:172) — here
    // the facade normalizes both forms into the same join-block shape
    val q = facade(
      """SELECT n_name, count(*) AS c
         FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN nation ON c_nationkey = n_nationkey
         WHERE o_totalprice > 1000
         GROUP BY n_name""")
    assert(q.joinBlock.isDefined)
    assert(q.tables.map(_.identifier).toSet ===
      Set("customer", "orders", "nation"))
    assert(q.joinPredicates.size === 2)
    assert(q.filterPredicates.map(_.tables) === Seq(Set("orders")))
    // and it optimizes + enforces end to end
    val pipeline = new graft.pipeline.MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new graft.opt.UESJoinOrderOptimizer),
      stats = new EmulatedStatistics(spark))
    val res = pipeline.optimizeQuery(q.sql)
    assert(!res.usedNativeFallback)
    assert(sameResults(res.df, spark.sql(q.sql)))
  }

  test("queries without joins have no join block") {
    val q = facade("SELECT count(*) FROM customer")
    assert(q.joinBlock.isEmpty)
  }

  test("equivalence classes merge transitive equi-join columns") {
    val q = facade(
      """SELECT count(*) FROM customer, orders, lineitem
         WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey""")
    val graph = new JoinGraph(q.joinBlock.get, new EmulatedStatistics(spark))
    val classes = graph.equivalenceClasses
    assert(classes.size === 2)
    assert(classes.forall(_.size === 2))
  }

  test("join graph classifies pk/fk joins via ndv heuristic") {
    val q = facade(flagship)
    val graph = new JoinGraph(q.joinBlock.get, new EmulatedStatistics(spark))
    val co = graph.edges.find(_.connects("customer", "orders")).get
    assert(graph.isPkFkJoin(co))
    assert(graph.pkSideOf(co) === Some("customer"))
    assert(graph.isConnected)
  }
}
