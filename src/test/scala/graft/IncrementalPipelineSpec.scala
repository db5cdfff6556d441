package graft

import graft.opt._
import graft.pipeline._
import graft.qal.QueryFacade
import graft.stats.EmulatedStatistics

class IncrementalPipelineSpec extends SparkSpec {

  private lazy val stats = new EmulatedStatistics(spark)
  private val sql =
    """SELECT n_name, count(*) AS c FROM nation, supplier, customer
       WHERE n_nationkey = s_nationkey AND n_nationkey = c_nationkey
       GROUP BY n_name"""

  test("incremental chain: order -> operators -> parameters") {
    Tables.registerAll(spark, sfDir)
    val pipeline = new IncrementalOptimizationPipeline(spark, Seq(
      IncrementalOptimizationStep.fromJoinOrder(new UESJoinOrderOptimizer),
      IncrementalOptimizationStep.fromOperators(new UESOperatorSelection),
      IncrementalOptimizationStep.fromParameters(new BoundsParameterGeneration)),
      stats = stats)
    val res = pipeline.optimizeQuery(sql)
    assert(!res.usedNativeFallback)
    assert(res.joinOrder.isDefined)
    assert(res.parameters.cardinalityHints.nonEmpty)
    // the chain's hints are actually spliced in as stats overrides
    assert(res.df.queryExecution.optimizedPlan.collect {
      case so: graft.enforce.StatsOverride => so
    }.nonEmpty)
    assert(sameResults(res.df, spark.sql(sql)))
  }

  test("integrated pipeline drives a complete algorithm") {
    Tables.registerAll(spark, sfDir)
    val algo = new CompleteOptimizationAlgorithm {
      def describe: String = """{"name":"ues-complete"}"""
      def optimizeQuery(q: QueryFacade, graph: JoinGraph): OptState = {
        val order = new UESJoinOrderOptimizer().optimizeJoinOrder(q, graph)
        OptState(order,
          new UESOperatorSelection().selectPhysicalOperators(q, graph, order))
      }
    }
    val df = new IntegratedOptimizationPipeline(spark, algo, stats = stats)
      .optimize(sql)
    assert(sameResults(df, spark.sql(sql)))
  }
}
