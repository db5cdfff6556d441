package graft

import graft.opt.{JoinGraph, StatisticalCardinalityEstimator}
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

/** The probe-free estimator (histograms/MCV/ndv) must land within a small
  * q-error of the true cardinalities on well-behaved filters — it trades
  * the exact-probe COUNT jobs for estimates computed from base statistics.
  */
class StatisticalEstimatorSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  private def qerror(est: Double, actual: Double): Double = {
    val e = math.max(est, 1.0); val a = math.max(actual, 1.0)
    math.max(e / a, a / e)
  }

  test("range filter estimate tracks the exact count (histogram path)") {
    Tables.registerAll(spark, sfDir)
    val sql = """SELECT count(*) AS n FROM lineitem, orders
                 WHERE l_orderkey = o_orderkey AND l_quantity < 25"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val est = new StatisticalCardinalityEstimator()
      .calculateEstimate(graph, Set("lineitem", "orders")).value
    val actual = spark.sql(sql).head().getLong(0).toDouble
    assert(qerror(est, actual) < 3.0, s"est=$est actual=$actual")
  }

  test("equality filter estimate tracks the exact count (MCV path)") {
    Tables.registerAll(spark, sfDir)
    val sql = """SELECT count(*) AS n FROM customer, nation
                 WHERE c_nationkey = n_nationkey
                   AND c_mktsegment = 'BUILDING'"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val est = new StatisticalCardinalityEstimator()
      .calculateEstimate(graph, Set("customer", "nation")).value
    val actual = spark.sql(sql).head().getLong(0).toDouble
    assert(qerror(est, actual) < 3.0, s"est=$est actual=$actual")
  }

  test("cardinality profiler reports per-intermediate q-errors") {
    import graft.opt.{CardinalityProfiler, StatisticalCardinalityEstimator,
      UESJoinOrderOptimizer}
    Tables.registerAll(spark, sfDir)
    val sql = """SELECT count(*) AS n FROM nation, supplier, region
                 WHERE n_nationkey = s_nationkey AND n_regionkey = r_regionkey"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val tree = new UESJoinOrderOptimizer().optimizeJoinOrder(q, graph).get
    val rows = CardinalityProfiler.profile(graph, tree,
      new StatisticalCardinalityEstimator)
    // 3 base tables + 2 intermediates, q-errors well-formed, full-set
    // actual equals the query's own count
    assert(rows.size === 5)
    assert(rows.forall(_.qerror >= 1.0))
    val full = rows.find(_.tables.toSet == Set("nation", "supplier", "region")).get
    assert(full.actual === spark.sql(sql).head().getLong(0))
    val df = CardinalityProfiler.profileDf(spark, graph, tree,
      new StatisticalCardinalityEstimator)
    assert(df.columns.toSeq === Seq("tables", "estimated", "actual", "qerror"))
  }

  test("timestamp range filters use the seconds-scaled histogram") {
    Tables.registerAll(spark, sfDir)
    val sql = """SELECT count(*) AS n FROM orders, customer
                 WHERE o_custkey = c_custkey
                   AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"""
    val q = QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    val est = new StatisticalCardinalityEstimator()
      .calculateEstimate(graph, Set("orders", "customer")).value
    val actual = spark.sql(sql).head().getLong(0).toDouble
    assert(qerror(est, actual) < 3.0, s"est=$est actual=$actual")
  }
}
