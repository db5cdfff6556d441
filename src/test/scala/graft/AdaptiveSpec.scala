package graft

import graft.opt._
import graft.stats.EmulatedStatistics

/** Runtime-feedback re-optimization: harvested SQLMetric actuals must be
  * the true cardinalities, and the re-optimized plan must keep answers. */
class AdaptiveSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)

  private val sql =
    """SELECT n_name, count(*) AS c
       FROM customer, orders, nation
       WHERE c_custkey = o_custkey AND c_nationkey = n_nationkey
       GROUP BY n_name"""

  test("harvest reads actual per-intermediate cardinalities for free") {
    Tables.registerAll(spark, sfDir)
    val df = spark.sql(sql)
    df.collect()
    val observed = AdaptiveReoptimization.harvest(df)
    assert(observed.nonEmpty, "no cardinalities harvested")
    val full = observed.keys.maxBy(_.size)
    assert(full === Set("customer", "orders", "nation"))
    val exact = spark.sql(
      """SELECT count(*) FROM customer, orders, nation
         WHERE c_custkey = o_custkey AND c_nationkey = n_nationkey""")
      .collect().head.getLong(0)
    assert(observed(full).value === exact.toDouble,
      s"harvested ${observed(full)} vs exact $exact")
  }

  test("re-optimization with observed actuals keeps answers") {
    Tables.registerAll(spark, sfDir)
    val re = AdaptiveReoptimization.reoptimize(spark, sql, stats)
    assert(sameResults(re, spark.sql(sql)))
  }

  test("observed actuals dominate a deliberately distorted estimator") {
    Tables.registerAll(spark, sfDir)
    val df = spark.sql(sql)
    df.collect()
    val observed = AdaptiveReoptimization.harvest(df)
    // a 100x-distorting fallback: any intermediate it decides is wrong
    val distorted = new CardinalityDistortion(
      new PreciseCardinalities, factor = 100.0)
    val est = new PreComputedCardinalities(observed, distorted)
    val q = qal.QueryFacade(spark, sql)
    val graph = new JoinGraph(q.joinBlock.get, stats)
    // every observed set must answer from the harvest, not the fallback
    observed.foreach { case (ts, card) =>
      assert(est.calculateEstimate(graph, ts) === card)
    }
  }
}
