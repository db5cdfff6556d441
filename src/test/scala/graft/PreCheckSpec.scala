package graft

import graft.opt.JoinGraph
import graft.pipeline.{EquiJoinPreCheck, MultiStageOptimizationPipeline, PreChecks}
import graft.opt.UESJoinOrderOptimizer
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

/** Feature-gate prechecks (reference validation.py:419-695): queries with
  * unsupported features must be routed to native execution, not errored.
  */
class PreCheckSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  // the checks under test only consult the query facade; any structural
  // graph works for the second argument
  private lazy val someGraph: JoinGraph = {
    Tables.registerAll(spark, sfDir)
    new JoinGraph(QueryFacade(spark,
      """SELECT count(*) AS n FROM nation, region
         WHERE n_regionkey = r_regionkey""").joinBlock.get, stats)
  }

  private def q(sql: String) = { Tables.registerAll(spark, sfDir); QueryFacade(spark, sql) }

  test("set operations are gated") {
    val bad = q("""SELECT n_name FROM nation, region
                   WHERE n_regionkey = r_regionkey
                   UNION SELECT r_name FROM region""")
    assert(PreChecks.NoSetOperations.check(bad, someGraph).isLeft)
    val ok = q("""SELECT n_name FROM nation, region
                  WHERE n_regionkey = r_regionkey""")
    assert(PreChecks.NoSetOperations.check(ok, someGraph).isRight)
  }

  test("subquery expressions are gated") {
    val bad = q("""SELECT c_name FROM customer
                   WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")
    assert(PreChecks.NoSubqueries.check(bad, someGraph).isLeft)
    assert(PreChecks.NoSubqueries.check(
      q("SELECT c_name FROM customer"), someGraph).isRight)
  }

  test("outer joins are gated, inner and cross pass") {
    val bad = q("""SELECT n_name FROM nation LEFT JOIN supplier
                   ON n_nationkey = s_nationkey""")
    assert(PreChecks.InnerJoinsOnly.check(bad, someGraph).isLeft)
    val ok = q("""SELECT count(*) AS n FROM nation CROSS JOIN region""")
    assert(PreChecks.InnerJoinsOnly.check(ok, someGraph).isRight)
  }

  test("compound gate short-circuits with the first failure") {
    val bad = q("""SELECT n_name FROM nation LEFT JOIN supplier
                   ON n_nationkey = s_nationkey""")
    val r = PreChecks.AllOf(PreChecks.InnerJoinsOnly, EquiJoinPreCheck)
      .check(bad, someGraph)
    assert(r === Left("non-inner join: LEFT OUTER"))
  }

  test("gated queries fall back to native execution with correct results") {
    val sql = """SELECT c_mktsegment, count(*) AS n FROM customer, orders
                 WHERE c_custkey = o_custkey
                   AND c_acctbal > (SELECT avg(c_acctbal) FROM customer)
                 GROUP BY c_mktsegment"""
    val pipeline = new MultiStageOptimizationPipeline(spark,
      joinOrder = Some(new UESJoinOrderOptimizer),
      preCheck = PreChecks.ues, stats = stats)
    val res = pipeline.optimizeQuery(sql)
    assert(res.usedNativeFallback)
    assert(sameResults(res.df, spark.sql(sql)))
  }
}
