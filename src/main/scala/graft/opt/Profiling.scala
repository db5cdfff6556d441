package graft.opt

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Cardinality
import graft.pipeline.CardinalityEstimator
import graft.plans.JoinTree

/** Estimate-vs-actual cardinality profiling — the reference's research
  * loop (actual_plan_cost / star_query_cardinality,
  * /root/reference/postbound/opt/_analysis.py:30-673): for every
  * intermediate a join order materializes, compare an estimator's number
  * against the true COUNT(*) and report the q-error. The actual counts are
  * independent Spark jobs (embarrassingly parallel, memoized by the stats
  * cache), so profiling a workload is a bounded, one-off cost that tells
  * you WHERE an estimator loses the plan before you pay for a bad join
  * order at full scale.
  */
object CardinalityProfiler {

  final case class ProfileRow(tables: Seq[String], estimated: Double,
      actual: Long, qerror: Double)

  def profile(graph: JoinGraph, tree: JoinTree[Cardinality],
      estimator: CardinalityEstimator,
      includeBaseTables: Boolean = true): Seq[ProfileRow] = {
    val singles =
      if (includeBaseTables) graph.tables.map(t => Set(t)) else Seq.empty
    (singles ++ tree.intermediates).distinct.map { ts =>
      val est = math.max(estimator.calculateEstimate(graph, ts).value, 1.0)
      val actual = graph.stats.rowCount(QueryFragment.fragmentPlan(graph, ts))
      val a = math.max(actual.toDouble, 1.0)
      ProfileRow(ts.toSeq.sorted, est, actual, math.max(est / a, a / est))
    }
  }

  /** The profile as a DataFrame (for export next to benchmark results). */
  def profileDf(spark: SparkSession, graph: JoinGraph,
      tree: JoinTree[Cardinality],
      estimator: CardinalityEstimator): DataFrame = {
    import spark.implicits._
    profile(graph, tree, estimator)
      .map(r => (r.tables.mkString(","), r.estimated, r.actual, r.qerror))
      .toDF("tables", "estimated", "actual", "qerror")
  }
}
